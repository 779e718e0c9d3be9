"""Local mirror of the driver's oracle-differential check.

Runs a registered Spark query and its DuckDB oracle on the same parquet
files, then compares row count, column names, and values (order-insensitive:
columns sorted by name, rows sorted by all columns). Values are compared
exactly after normalization — the queries themselves round floats, so any
residual mismatch is a real semantics bug, not float noise.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.6f}"
            return f"{v:.6f}"
        if isinstance(v, (pd.Timestamp,)):
            return v.isoformat()
        if hasattr(v, "item") and not isinstance(v, (str, bytes)):
            try:
                return norm_cell(v.item())
            except Exception:
                return str(v)
        return str(v)

    out = df.apply(lambda col: col.map(norm_cell))
    return out.sort_values(by=list(out.columns), ignore_index=True) if len(out) else out


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(f"schema: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"rowcount: spark={len(sp)} oracle={len(oracle_df)}")
    a, b = _normalize(sp), _normalize(oracle_df)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = list(a.index[neq])[:3]
        for i in idx:
            problems.append(f"row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}")
        problems.append(f"value mismatch rows: {int(neq.sum())}/{len(a)}")
    return problems

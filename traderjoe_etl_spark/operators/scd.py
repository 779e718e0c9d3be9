"""SCD2 snapshot-table maintenance without Delta/Iceberg.

The reference's output is an append-only snapshot CSV (main.py:345-351);
the natural warehouse form is a slowly-changing-dimension table: one open
row per key with ``valid_from/valid_to/is_current``. MERGE INTO needs a
table format with transactions; on plain Parquet the engine emulates it
with the standard join + union + rewrite pattern (the classic pre-Delta
CDC recipe): each merge produces a NEW table version — at scale you write
it to a new partition/path and swap, never read-modify-write in place.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(snapshot: DataFrame, ts_col: str) -> DataFrame:
    """Open an initial SCD2 table from a first snapshot batch."""
    return snapshot.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast(snapshot.schema[ts_col].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Merge a new snapshot batch into an SCD2 table.

    - unchanged keys: kept as-is;
    - changed keys: the open row is CLOSED (valid_to = new ts) and a new
      open version is appended;
    - new keys: inserted open;
    - historical (already-closed) rows: untouched.

    One equi-join on ``keys`` + unions — no row-by-row driver logic; the
    join is broadcast when the update batch is small (hourly batches are
    one row per pair).
    """
    closed_hist = current.filter(~F.col("is_current"))
    open_rows = current.filter(F.col("is_current"))

    upd = updates.select(
        *keys,
        *[F.col(c).alias(f"__u_{c}") for c in compare_cols],
        F.col(ts_col).alias("__u_ts"),
    )
    j = open_rows.join(F.broadcast(upd), list(keys), "full_outer")

    # Null-safe per-column comparison: eqNullSafe treats NULL==NULL as true
    # and NULL==value as false, with no serialized-string fingerprint — a
    # concat_ws sentinel scheme is ambiguous when data contains the sentinel
    # or separator (ADVICE r01).
    same_vals = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"__u_{c}")) for c in compare_cols],
    )
    changed_pred = F.col("__u_ts").isNotNull() & ~same_vals

    base_cols = [c for c in current.columns]
    # 1. untouched open rows (no update arrived, or update identical)
    untouched = j.filter(
        F.col("is_current").isNotNull() & (F.col("__u_ts").isNull() | ~changed_pred)
    ).select(*base_cols)
    # 2. closed versions of changed rows
    closed_now = j.filter(F.col("is_current").isNotNull() & changed_pred).select(
        *[F.col(c) for c in base_cols if c not in ("valid_to", "is_current")],
        F.col("__u_ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    ).select(*base_cols)
    # 3. new open versions (changed keys + brand-new keys)
    incoming = j.filter(
        F.col("__u_ts").isNotNull() & (F.col("is_current").isNull() | changed_pred)
    )
    new_open = incoming.select(
        *keys,
        *[F.col(f"__u_{c}").alias(c) for c in compare_cols],
        *[
            F.lit(None).cast(current.schema[c].dataType).alias(c)
            for c in base_cols
            if c not in (*keys, *compare_cols, ts_col, "valid_from", "valid_to", "is_current")
        ],
        F.col("__u_ts").alias(ts_col),
        F.col("__u_ts").alias("valid_from"),
        F.lit(None).cast(current.schema["valid_from"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    ).select(*base_cols)

    return closed_hist.unionByName(untouched).unionByName(closed_now).unionByName(new_open)

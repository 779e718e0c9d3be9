"""Spark-vs-DuckDB throughput comparison over the headline queries.

Usage: python tools/bench_compare.py <sf_dir> [copies-label]

For every headline query that has a SQL oracle, times (a) the Spark plan
drained through the noop sink and (b) the equivalent DuckDB SQL fully
materialized, on the SAME parquet files. Prints one JSON line:
  {"sf_dir": ..., "queries": {name: {"spark": s, "duckdb": s}},
   "spark_total": s, "duckdb_total": s, "ratio": r}

This is the evidence behind BENCH.md's fixed-overhead-vs-marginal-cost
analysis: the interesting number is how the ratio moves as SF grows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from traderjoe_etl_spark.queries import oracle_sql, queries
from traderjoe_etl_spark.session import get_spark

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("bench-compare")
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = queries(), oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written tables are directories
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # warm-up (JVM/codegen + file cache)
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        if name not in osql:
            continue
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_spark = time.perf_counter() - t0
        spark.catalog.clearCache()

        con.execute(osql[name]).fetchall()  # warm
        t0 = time.perf_counter()
        con.execute(osql[name]).fetchall()
        t_duck = time.perf_counter() - t0
        out[name] = {"spark": round(t_spark, 3), "duckdb": round(t_duck, 3)}

    s_total = round(sum(v["spark"] for v in out.values()), 3)
    d_total = round(sum(v["duckdb"] for v in out.values()), 3)
    print(json.dumps({
        "sf_dir": sf_dir,
        "queries": out,
        "spark_total": s_total,
        "duckdb_total": d_total,
        "ratio": round(s_total / d_total, 2) if d_total else None,
    }))


if __name__ == "__main__":
    main()

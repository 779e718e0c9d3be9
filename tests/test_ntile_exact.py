"""ntile_customer_quartiles differential: the prefix-scan rewrite must be
EXACTLY F.ntile(4) OVER (ORDER BY c_acctbal, c_custkey) — bucket sizes,
tie handling, N<4 degenerate cases, and NULL balances (ranked first,
Spark's ASC NULLS FIRST, never dropped by the rank-back join)."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from traderjoe_etl_spark.queries.windows_scalars import ntile_customer_quartiles


def _reference(df):
    w = Window.orderBy("c_acctbal", "c_custkey")
    return {
        r["quartile"]: (r["n"], r["mn"], r["mx"])
        for r in df.select("c_acctbal", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("mn"),
            F.round(F.max("c_acctbal"), 2).alias("mx"),
        )
        .collect()
    }


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 11, 103, 1000])
def test_ntile_matches_window_form(spark, tmp_path, n):
    random.seed(n)
    rows = [
        (i, float(random.choice([100.0, 200.0, 200.0, 300.0, -50.0])))
        for i in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_acctbal double")
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "customer.parquet"))
    got = {
        r["quartile"]: (r["n_customers"], r["min_bal"], r["max_bal"])
        for r in ntile_customer_quartiles(spark, str(tmp_path)).collect()
    }
    assert got == _reference(df)


def test_ntile_null_balances_rank_first_not_dropped(spark, tmp_path):
    rows = [(1, None), (2, 50.0), (3, None), (4, 10.0), (5, 10.0), (6, 99.0)]
    df = spark.createDataFrame(rows, "c_custkey long, c_acctbal double")
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "customer.parquet"))
    out = ntile_customer_quartiles(spark, str(tmp_path)).collect()
    assert sum(r["n_customers"] for r in out) == 6, "NULL rows must not drop"
    got = {
        r["quartile"]: (r["n_customers"], r["min_bal"], r["max_bal"])
        for r in out
    }
    assert got == _reference(df)

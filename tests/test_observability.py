"""observe()-based quality gates: metrics arrive with the SAME action (no
second pass) and threshold asserts fire on bad batches."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from traderjoe_etl_spark.operators.observability import assert_gate, observed_quality_gate
from traderjoe_etl_spark.sources.tables import read_table


def test_observed_metrics_match_direct_aggregates(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", F.when(F.col("value") >= 10, F.col("value")).alias("v")
    )
    gated, obs = observed_quality_gate(ev, numeric_cols=["v"])
    gated.write.format("noop").mode("overwrite").save()  # the ONE action
    got = obs.get
    want = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("nulls_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    ).collect()[0]
    assert got["n_rows"] == want["n_rows"]
    assert got["nulls_v"] == want["nulls_v"]
    assert got["min_v"] == want["min_v"] and got["max_v"] == want["max_v"]
    assert_gate(got, min_rows=1, max_null_frac=1.0)  # passes


def test_gate_asserts_fire(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    gated, obs = observed_quality_gate(df, numeric_cols=["v"])
    gated.write.format("noop").mode("overwrite").save()
    with pytest.raises(ValueError, match="nulls_v"):
        assert_gate(obs.get, max_null_frac=0.4)
    with pytest.raises(ValueError, match="n_rows"):
        assert_gate(obs.get, min_rows=100)

"""Bloom-prefilter join: exactness, false-positive bound, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from traderjoe_etl_spark.operators.bloom import (
    bloom_prefilter_join,
    build_bloom,
    might_contain,
)
from traderjoe_etl_spark.sources.tables import read_table


def test_bloom_no_false_negatives(spark):
    """Every build key must pass its own filter — bloom guarantees no FNs."""
    build = spark.range(0, 5000).select((F.col("id") * 7 + 3).alias("k"))
    words, m, k = build_bloom(build, "k", fpp=0.01)
    missed = build.where(~might_contain(F.col("k"), words, m, k)).count()
    assert missed == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Non-member keys should pass at roughly the configured fpp (1%);
    allow generous slack for hash-family variance."""
    build = spark.range(0, 5000).select(F.col("id").alias("k"))
    words, m, k = build_bloom(build, "k", fpp=0.01)
    probe = spark.range(1_000_000, 1_050_000).select(F.col("id").alias("k"))
    fp = probe.where(might_contain(F.col("k"), words, m, k)).count()
    assert fp / 50_000 < 0.05, f"false-positive rate {fp / 50_000:.3%} way above fpp"


def test_bloom_prefilter_join_equals_plain_join(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000.0)
    got = (
        bloom_prefilter_join(orders, cust, "o_custkey", "c_custkey")
        .select("o_orderkey", "c_custkey")
    )
    want = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_custkey"
    )
    assert got.subtract(want).count() == 0
    assert want.subtract(got).count() == 0
    assert got.count() == want.count()


def test_bloom_semi_join_mode(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000.0)
    got = bloom_prefilter_join(orders, cust, "o_custkey", "c_custkey", how="semi")
    want = orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
    assert sorted(c for c in got.columns) == sorted(orders.columns)
    assert got.count() == want.count()


def test_bloom_filter_sits_on_probe_scan_before_exchange(spark, sf_dir):
    """The membership test must be a plain Filter in the probe branch —
    no UDF, no extra join, evaluated before any Exchange so the probe
    shuffle only carries plausibly-matching rows."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000.0)
    words, m, k = build_bloom(cust, "c_custkey")
    pref = orders.where(might_contain(F.col("o_custkey"), words, m, k))
    plan = pref._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan
    assert "Exchange" not in plan  # map-only: filter fused into the scan stage
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_rejects_outer_joins(spark):
    import pytest

    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_prefilter_join(df, df, "k", "k", how="left")


def test_bloom_native_big_build_path(spark, sf_dir):
    """Forcing the big-build regime (tiny fpp → bitmap above the literal
    ceiling) must (a) produce a plan WITHOUT the giant literal array —
    the sketch rides a broadcast value via bloom_filter_agg — and
    (b) return exactly the plain-join result."""
    from traderjoe_etl_spark.operators.bloom import MAX_LITERAL_BITS, _optimal_bits

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000.0)
    # force the big-build regime on the small fixture by dropping the
    # literal ceiling below the sized bitmap (equivalent to a 10^8-key
    # build crossing the real MAX_LITERAL_BITS)
    n_keys = cust.select("c_custkey").distinct().count()
    ceiling = _optimal_bits(n_keys, 0.01) - 1
    assert ceiling < MAX_LITERAL_BITS
    got = bloom_prefilter_join(
        orders, cust, "o_custkey", "c_custkey", max_literal_bits=ceiling
    ).select("o_orderkey", "c_custkey")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__bloom_words" in plan  # bitmap rides a broadcast column
    assert len(plan) < 2_000_000, "plan embeds a giant literal bitmap"
    want = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_custkey"
    )
    assert got.subtract(want).count() == 0
    assert want.subtract(got).count() == 0
    assert got.count() == want.count()


def test_bloom_null_probe_keys_deterministically_drop(spark):
    """NULL probe keys must test FALSE (not hash the bare seeds): the
    standalone predicate is usable outside the join wrapper."""
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    words, m, k = build_bloom(build, "k", fpp=0.01)
    probe = spark.createDataFrame([(None,), (5,), (10**9,)], "k long")
    kept = [r["k"] for r in probe.where(might_contain(F.col("k"), words, m, k)).collect()]
    assert 5 in kept and None not in kept

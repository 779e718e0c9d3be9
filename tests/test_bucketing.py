"""Bucketed-join test: same-key bucketed tables join with NO shuffle."""

from __future__ import annotations

import io
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from traderjoe_etl_spark.operators.bucketing import bucketed_join, save_bucketed
from traderjoe_etl_spark.sources.tables import read_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").limit(5000)
    cust = read_table(spark, sf_dir, "customer")
    save_bucketed(orders.withColumnRenamed("o_custkey", "custkey"), "b_orders", "custkey", 8)
    save_bucketed(cust.withColumnRenamed("c_custkey", "custkey"), "b_customer", "custkey", 8)

    # force the shuffle-join path (the planner would broadcast this small
    # side and skip bucketing entirely — at 100 TB neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", "custkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        # co-located buckets: merge join with NO shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and the result is correct vs a plain join
    plain = (
        read_table(spark, sf_dir, "orders").limit(5000)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .count()
    )
    assert joined.count() == plain

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

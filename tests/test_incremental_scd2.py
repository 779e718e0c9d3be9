"""Trigger-once incremental SCD2 snapshot versioning: the streaming merge
must produce a table identical to sequential batch merges, with
crash-safe versioned commits."""

from __future__ import annotations

import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traderjoe_etl_spark.operators.scd import scd2_init, scd2_merge
from traderjoe_etl_spark.streaming.incremental import (
    current_version,
    incremental_scd2_query,
    incremental_scd2_sink,
    read_scd2_table,
)

SCHEMA = "pair string, apr double, ts timestamp"


def _snap(spark, rows):
    return spark.createDataFrame(
        [(p, a, datetime.fromisoformat(t)) for p, a, t in rows], SCHEMA
    )


BATCHES = [
    [("A", 1.0, "2026-01-01T00:00:00"), ("B", 2.0, "2026-01-01T00:00:00")],
    [
        ("A", 1.5, "2026-01-01T01:00:00"),
        ("B", 2.0, "2026-01-01T01:00:00"),
        ("C", 9.0, "2026-01-01T01:00:00"),
    ],
    [("C", 9.5, "2026-01-01T02:00:00")],
]


def _key(r):
    return (r.pair, r.apr, r.ts, r.valid_from, r.valid_to, r.is_current)


def _batch_fold(spark):
    cur = scd2_init(_snap(spark, BATCHES[0]), "ts")
    for b in BATCHES[1:]:
        cur = scd2_merge(cur, _snap(spark, b), keys=["pair"], compare_cols=["apr"], ts_col="ts")
    return cur


def test_streaming_merge_equals_batch_fold(spark):
    src = tempfile.mkdtemp(prefix="inc_src_")
    table = tempfile.mkdtemp(prefix="inc_tbl_")
    ckpt = tempfile.mkdtemp(prefix="inc_ckpt_")
    for i, b in enumerate(BATCHES):
        _snap(spark, b).coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")

    updates = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = incremental_scd2_query(
        updates, table, ckpt, keys=["pair"], compare_cols=["apr"], ts_col="ts"
    )
    q.awaitTermination(300)

    got = sorted(read_scd2_table(spark, table).collect(), key=_key)
    want = sorted(_batch_fold(spark).collect(), key=_key)
    assert [_key(r) for r in got] == [_key(r) for r in want]

    ptr = current_version(table)
    assert ptr["version"] >= 1
    # every committed version directory still readable (snapshot isolation)
    for v in range(ptr["version"] + 1):
        assert spark.read.parquet(f"{table}/v={v}").count() > 0

    # relaunch with nothing pending: checkpoint prevents re-merge
    q2 = incremental_scd2_query(
        updates, table, ckpt, keys=["pair"], compare_cols=["apr"], ts_col="ts"
    )
    q2.awaitTermination(300)
    again = sorted(read_scd2_table(spark, table).collect(), key=_key)
    assert [_key(r) for r in again] == [_key(r) for r in want]


def test_sink_retry_is_idempotent(spark):
    table = tempfile.mkdtemp(prefix="inc_retry_")
    sink = incremental_scd2_sink(table, keys=["pair"], compare_cols=["apr"], ts_col="ts")
    sink(_snap(spark, BATCHES[0]), 0)
    sink(_snap(spark, BATCHES[1]), 1)
    v_before = current_version(table)["version"]
    n_before = read_scd2_table(spark, table).count()
    sink(_snap(spark, BATCHES[1]), 1)  # foreachBatch redelivery
    assert current_version(table)["version"] == v_before
    assert read_scd2_table(spark, table).count() == n_before


def test_multi_ts_batch_folds_in_order(spark):
    # one drained batch containing all three snapshot hours must yield the
    # same history as three sequential merges
    table = tempfile.mkdtemp(prefix="inc_multi_")
    sink = incremental_scd2_sink(table, keys=["pair"], compare_cols=["apr"], ts_col="ts")
    allrows = [r for b in BATCHES for r in b]
    sink(_snap(spark, allrows), 0)
    got = sorted(read_scd2_table(spark, table).collect(), key=_key)
    want = sorted(_batch_fold(spark).collect(), key=_key)
    assert [_key(r) for r in got] == [_key(r) for r in want]


def test_empty_first_batch_stays_uninitialized(spark):
    # An empty first micro-batch must NOT commit a version pointer — a
    # {version: -1} commit would point readers at a directory that was
    # never written (ADVICE r01).
    table = tempfile.mkdtemp(prefix="inc_empty_")
    sink = incremental_scd2_sink(table, keys=["pair"], compare_cols=["apr"], ts_col="ts")
    sink(_snap(spark, []), 0)
    assert current_version(table) is None
    try:
        read_scd2_table(spark, table)
        raise AssertionError("expected FileNotFoundError for uninitialized table")
    except FileNotFoundError:
        pass
    # a later non-empty batch initializes normally
    sink(_snap(spark, BATCHES[0]), 1)
    assert current_version(table)["version"] == 0
    assert read_scd2_table(spark, table).count() == 2
    # and a subsequent empty batch advances the epoch but keeps the version
    sink(_snap(spark, []), 2)
    assert current_version(table) == {"version": 0, "epoch_id": 2}


def test_streaming_foreachbatch_merge(spark, tmp_path):
    """Streaming SCD1 upsert: each micro-batch merges into the stored
    table via operators/merge.py inside foreachBatch — the overwrite
    counterpart of the SCD2 history sink."""
    from pyspark.sql import functions as F

    from traderjoe_etl_spark.operators.merge import merge_upsert

    store = str(tmp_path / "state")
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (1, 15.0), (3, 30.0)], "k long, v double"
    ).repartition(1).write.parquet(src_dir)

    def upsert(batch, batch_id):
        batch = (
            batch.groupBy("k").agg(F.max("v").alias("v"))  # last-write-wins per batch
        )
        try:
            target = batch.sparkSession.read.parquet(store)
            merged = merge_upsert(target, batch, keys=["k"])
        except Exception:
            merged = batch
        merged.write.mode("overwrite").parquet(store + "_next")
        next_df = batch.sparkSession.read.parquet(store + "_next")
        next_df.write.mode("overwrite").parquet(store)

    stream = spark.readStream.schema("k long, v double").parquet(src_dir)
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {r.k: r.v for r in spark.read.parquet(store).collect()}
    assert final == {1: 15.0, 2: 20.0, 3: 30.0}


def test_crawl_dedup_stream_filters_and_is_retry_idempotent(spark, tmp_path):
    """Streaming crawl dedup: batch 2's near-copies of batch-1 docs are
    dropped, novel docs accepted; a RETRY of the same epoch (at-least-once
    delivery) rewrites the same epoch directory identically instead of
    filtering everything out or duplicating rows."""
    from pyspark.sql import functions as F

    from traderjoe_etl_spark.sources.tables import read_table
    from traderjoe_etl_spark.streaming.crawl_dedup import crawl_dedup_sink

    store = str(tmp_path / "fp_store")
    accepted = str(tmp_path / "accepted")
    sink = crawl_dedup_sink("doc_id", "text", store, accepted)

    b1 = (
        read_table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    sink(b1, 0)
    assert spark.read.parquet(accepted + "/epoch=0").count() == 50

    near = b1.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" appended")).alias("text"),
    )
    novel = spark.createDataFrame(
        [(20000 + i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(10)],
        "doc_id long, text string",
    )
    b2 = near.union(novel)
    sink(b2, 1)
    kept = {r.doc_id for r in spark.read.parquet(accepted + "/epoch=1").collect()}
    assert kept == {20000 + i for i in range(10)}

    # simulate a foreachBatch retry of epoch 1: the store already holds
    # epoch-1 fingerprints, but epoch<1 filtering must ignore them
    sink(b2, 1)
    kept_retry = {r.doc_id for r in spark.read.parquet(accepted + "/epoch=1").collect()}
    assert kept_retry == kept

    # epoch 2 re-sending accepted docs: now genuinely filtered
    sink(novel, 2)
    assert spark.read.parquet(accepted + "/epoch=2").count() == 0


def test_crawl_dedup_query_end_to_end(spark, tmp_path):
    """The streaming wrapper drains a 2-file backlog (availableNow, one
    file per micro-batch): batch 2's repeats of batch-1 docs are filtered
    across the micro-batch boundary via the store."""
    from pyspark.sql import functions as F

    from traderjoe_etl_spark.sources.tables import read_table
    from traderjoe_etl_spark.streaming.crawl_dedup import crawl_dedup_query

    src = str(tmp_path / "src")
    docs = (
        read_table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    docs.filter(F.col("doc_id") < 20).coalesce(1).write.parquet(src + "/a")
    # second file: 10 repeats (shifted ids) + 10 fresh synthetic docs
    rep = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    fresh = spark.createDataFrame(
        [(9000 + i, " ".join(f"q{i}z{j}" for j in range(25))) for i in range(10)],
        "doc_id long, text string",
    )
    rep.union(fresh).coalesce(1).write.parquet(src + "/b")

    schema = spark.read.parquet(src + "/a").schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/{a,b}")
    )
    q = crawl_dedup_query(
        stream,
        "doc_id",
        "text",
        str(tmp_path / "store"),
        str(tmp_path / "accepted"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    out = spark.read.parquet(str(tmp_path / "accepted") + "/epoch=*")
    kept = {r.doc_id for r in out.collect()}
    assert {r.doc_id for r in docs.filter(F.col("doc_id") < 20).collect()} <= kept
    assert all(9000 <= k < 9010 or k < 20 for k in kept), sorted(kept)[:30]

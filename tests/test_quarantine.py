"""Streaming quality-quarantine router: stream==batch parity against the
shared Gopher rule kernel, full-coverage split, auditable failure reasons,
and retry idempotence (the epoch-overwrite contract)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traderjoe_etl_spark.queries.stats_ml_ops import gopher_doc_flags
from traderjoe_etl_spark.sources.tables import read_table
from traderjoe_etl_spark.streaming.quarantine import quarantine_query, route_batch

_FLAGS = ["f_wc", "f_mwl", "f_sym", "f_alpha", "f_stop"]


def test_quarantine_stream_matches_batch_rules(spark, tmp_path, sf_smoke):
    docs = read_table(spark, sf_smoke, "documents").select(
        "doc_id", "text", "source"
    )
    src = str(tmp_path / "src")
    docs.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    clean_p = str(tmp_path / "clean")
    quar_p = str(tmp_path / "quar")
    q = quarantine_query(stream, clean_p, quar_p, str(tmp_path / "ckpt"))
    try:
        if not q.awaitTermination(180):
            raise TimeoutError("quarantine stream did not drain")
    finally:
        q.stop()

    clean = spark.read.parquet(clean_p + "/epoch=*")
    quar = spark.read.parquet(quar_p + "/epoch=*")
    clean_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    quar_ids = {r.doc_id for r in quar.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}

    # full coverage, disjoint split
    assert clean_ids | quar_ids == all_ids
    assert not (clean_ids & quar_ids)

    # stream == batch: same pass set as the shared rule kernel
    flags = gopher_doc_flags(docs)
    batch_pass = {
        r.doc_id
        for r in flags.filter(
            sum(F.col(f) for f in _FLAGS) == 0
        ).select("doc_id").collect()
    }
    assert clean_ids == batch_pass

    # audit column: every quarantined doc lists exactly its firing rules
    got_reasons = {
        r.doc_id: r.failed_rules
        for r in quar.select("doc_id", "failed_rules").collect()
    }
    exp = {
        r.doc_id: ",".join(f for f in _FLAGS if r[f] == 1)
        for r in flags.collect()
        if any(r[f] == 1 for f in _FLAGS)
    }
    assert got_reasons == exp


def test_quarantine_retry_is_idempotent(spark, tmp_path, sf_smoke):
    docs = (
        read_table(spark, sf_smoke, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text", "source")
    )
    clean_p = str(tmp_path / "clean")
    quar_p = str(tmp_path / "quar")
    route_batch(docs, 7, clean_p, quar_p)
    n_clean = spark.read.parquet(clean_p + "/epoch=*").count()
    n_quar = spark.read.parquet(quar_p + "/epoch=*").count()
    assert n_clean + n_quar == 50
    # a retried epoch overwrites its own directory — no duplication
    route_batch(docs, 7, clean_p, quar_p)
    assert spark.read.parquet(clean_p + "/epoch=*").count() == n_clean
    assert spark.read.parquet(quar_p + "/epoch=*").count() == n_quar


def test_quarantine_empty_side_epoch_is_readable(spark, tmp_path):
    """An all-fail micro-batch leaves the clean sink's epoch directory
    empty of rows — it must still be written with schema so downstream
    epoch=* reads don't break."""
    docs = spark.createDataFrame(
        [(i, "tiny doc", "s") for i in range(5)],
        "doc_id long, text string, source string",
    )
    route_batch(docs, 3, str(tmp_path / "clean"), str(tmp_path / "quar"))
    assert spark.read.parquet(str(tmp_path / "clean") + "/epoch=*").count() == 0
    assert spark.read.parquet(str(tmp_path / "quar") + "/epoch=*").count() == 5


def test_route_batch_rejects_reserved_columns_case_insensitively(spark, tmp_path):
    """The router must refuse inputs whose columns collide with
    kernel-internal names BEFORE any scoring — including case variants,
    because Spark column resolution is case-insensitive by default (an
    input named 'WC' or 'Failed_Rules' would produce ambiguous columns
    mid-stream just the same; ADVICE r5)."""
    import pytest

    for bad in ("wc", "WC", "Failed_Rules", "F_STOP"):
        df = spark.createDataFrame(
            [(1, "some document text here", "x")],
            f"doc_id long, text string, `{bad}` string",
        )
        with pytest.raises(ValueError, match="collide"):
            route_batch(df, 0, str(tmp_path / "c"), str(tmp_path / "q"))

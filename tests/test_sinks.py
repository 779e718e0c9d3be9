"""Sink semantics: date-partitioned append Parquet + header-once CSV
(K1, reference main.py:345-351)."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from traderjoe_etl_spark.sinks import append_snapshot, csv_export, read_snapshots


def _batch(spark, ts, vals):
    return spark.createDataFrame(
        [(v, ts) for v in vals], "value long, current_unix_timestamp long"
    )


def test_append_snapshot_partitions_and_accumulates(spark):
    d = tempfile.mkdtemp(prefix="sink_parquet_")
    day1 = 1767225600  # 2026-01-01 UTC
    day2 = day1 + 86400
    append_snapshot(_batch(spark, day1, [1, 2]), d)
    append_snapshot(_batch(spark, day2, [3]), d)
    append_snapshot(_batch(spark, day2, [4]), d)  # append, not overwrite

    back = read_snapshots(spark, d)
    assert back.count() == 4
    parts = {r.snapshot_date.isoformat() for r in back.select("snapshot_date").distinct().collect()}
    assert parts == {"2026-01-01", "2026-01-02"}
    # physical partition dirs exist → date filters prune at the source
    assert sorted(p for p in os.listdir(d) if p.startswith("snapshot_date=")) == [
        "snapshot_date=2026-01-01",
        "snapshot_date=2026-01-02",
    ]
    pruned = back.filter(F.col("snapshot_date") == "2026-01-02")
    assert pruned.count() == 2


def test_csv_export_header_once(spark):
    d = tempfile.mkdtemp(prefix="sink_csv_")
    path = os.path.join(d, "snap.csv")
    csv_export(_batch(spark, 1767225600, [1, 2]), path)
    csv_export(_batch(spark, 1767225600, [3]), path)
    lines = open(path, encoding="utf-8").read().strip().splitlines()
    assert lines[0] == "value,current_unix_timestamp"
    assert len(lines) == 4  # one header + three rows across two appends
    assert sum(1 for l in lines if l.startswith("value,")) == 1

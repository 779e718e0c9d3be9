"""SCD2 merge semantics tests."""

from __future__ import annotations

import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traderjoe_etl_spark.operators.scd import scd2_init, scd2_merge

SCHEMA = "pair string, apr double, ts timestamp"


def _snap(spark, rows):
    return spark.createDataFrame(
        [(p, a, datetime.fromisoformat(t)) for p, a, t in rows], SCHEMA
    )


def test_scd2_lifecycle(spark):
    t0 = _snap(spark, [("A", 1.0, "2026-01-01T00:00:00"), ("B", 2.0, "2026-01-01T00:00:00")])
    cur = scd2_init(t0, "ts")

    # hour 2: A changes, B unchanged, C appears
    t1 = _snap(
        spark,
        [
            ("A", 1.5, "2026-01-01T01:00:00"),
            ("B", 2.0, "2026-01-01T01:00:00"),
            ("C", 9.0, "2026-01-01T01:00:00"),
        ],
    )
    cur = scd2_merge(cur, t1, keys=["pair"], compare_cols=["apr"], ts_col="ts")
    rows = {(r.pair, r.is_current): r for r in cur.collect()}

    assert len(rows) == 4  # A closed + A open + B open + C open
    a_closed = rows[("A", False)]
    assert a_closed.apr == 1.0 and a_closed.valid_to == datetime.fromisoformat("2026-01-01T01:00:00")
    assert rows[("A", True)].apr == 1.5 and rows[("A", True)].valid_to is None
    assert rows[("B", True)].apr == 2.0 and rows[("B", True)].valid_from == datetime.fromisoformat("2026-01-01T00:00:00")
    assert rows[("C", True)].apr == 9.0

    # hour 3: C changes again; A, B silent (no rows at all)
    t2 = _snap(spark, [("C", 9.5, "2026-01-01T02:00:00")])
    cur = scd2_merge(cur, t2, keys=["pair"], compare_cols=["apr"], ts_col="ts")
    final = cur.collect()
    assert len(final) == 5
    c_rows = sorted([r for r in final if r.pair == "C"], key=lambda r: r.valid_from)
    assert [r.apr for r in c_rows] == [9.0, 9.5]
    assert c_rows[0].is_current is False and c_rows[1].is_current is True
    # silent keys untouched
    assert [r for r in final if r.pair == "A" and r.is_current][0].apr == 1.5


def test_scd2_idempotent_on_identical_batch(spark):
    t0 = _snap(spark, [("A", 1.0, "2026-01-01T00:00:00")])
    cur = scd2_init(t0, "ts")
    again = _snap(spark, [("A", 1.0, "2026-01-01T01:00:00")])
    cur = scd2_merge(cur, again, keys=["pair"], compare_cols=["apr"], ts_col="ts")
    rows = cur.collect()
    assert len(rows) == 1 and rows[0].is_current  # identical value → no new version


def test_scd2_change_detection_is_sentinel_proof(spark):
    # Values equal to the old concat_ws NULL sentinel ('∅') or containing
    # the field separator must compare by VALUE, not by serialized string
    # (ADVICE r01: eqNullSafe, not string fingerprints).
    from datetime import datetime

    schema = "pair string, label string, ts timestamp"
    t0, t1 = datetime(2026, 1, 1, 0), datetime(2026, 1, 1, 1)
    cur = scd2_init(
        spark.createDataFrame([("A", None, t0), ("B", "x\x1fy", t0)], schema), "ts"
    )
    # A: NULL -> '∅' is a REAL change; B: 'x\x1fy' unchanged -> no new version
    upd = spark.createDataFrame([("A", "∅", t1), ("B", "x\x1fy", t1)], schema)
    merged = scd2_merge(cur, upd, keys=["pair"], compare_cols=["label"], ts_col="ts")
    rows = {(r.pair, r.is_current): r for r in merged.collect()}
    assert ("A", False) in rows and rows[("A", True)].label == "∅"
    assert ("B", False) not in rows and rows[("B", True)].ts == t0

"""Semantic unit tests for the round-4 session-3 families: market
analytics (OHLC/VWAP/drawdown/bollinger), graph triangle counting, PQ
ANN, attribution, and the ML featurizers — hand-built fixtures with
known answers, complementing the DuckDB oracle sweep."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def _events(spark, rows):
    """rows: (event_id, ts_str, user_id, event_type, value, props)."""
    return spark.createDataFrame(
        [
            (i, dt.datetime.fromisoformat(ts), u, et, v, p)
            for i, ts, u, et, v, p in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_max_drawdown_known_sequence(spark, tmp_path):
    # equity path: 10 → 30 → 15 → 35 → 5; peaks 10/30/30/35/35
    # drawdowns   0 /  0 / 15 /  0 / 30  → max 30
    ev = _events(
        spark,
        [
            (1, "2024-01-01T00:00:00", 1, "purchase", 10.0, "{}"),
            (2, "2024-01-01T01:00:00", 1, "purchase", 20.0, "{}"),
            (3, "2024-01-01T02:00:00", 1, "purchase", -15.0, "{}"),
            (4, "2024-01-01T03:00:00", 1, "purchase", 20.0, "{}"),
            (5, "2024-01-01T04:00:00", 1, "purchase", -30.0, "{}"),
        ],
    )
    d = str(tmp_path / "dd")
    ev.write.parquet(f"{d}/events.parquet")
    rows = QUERIES["max_drawdown_users"](spark, d).collect()
    assert len(rows) == 1
    assert rows[0].user_id == 1
    assert rows[0].max_drawdown == 30.0
    assert rows[0].n_events == 5


def test_ohlc_open_close_use_event_id_tiebreak(spark, tmp_path):
    # two trades at the IDENTICAL timestamp: event_id must break the tie
    ts = "2024-01-01T00:30:00"
    ev = _events(
        spark,
        [
            (2, ts, 1, "trade", 7.0, "{}"),
            (1, ts, 1, "trade", 3.0, "{}"),
            (3, "2024-01-01T00:45:00", 1, "trade", 5.0, "{}"),
        ],
    )
    d = str(tmp_path / "ohlc")
    ev.write.parquet(f"{d}/events.parquet")
    row = QUERIES["ohlc_hourly_bars"](spark, d).collect()[0]
    assert row.open == 3.0 and row.close == 5.0
    assert row.high == 7.0 and row.low == 3.0 and row.n_trades == 3


def test_attribution_last_touch_window_and_organic(spark, tmp_path):
    ev = _events(
        spark,
        [
            # click campaign 3, then purchase 2 days later → attributed
            (1, "2024-01-01T00:00:00", 1, "click", 1.0, '{"k": 3}'),
            (2, "2024-01-03T00:00:00", 1, "purchase", 10.0, '{"k": 0}'),
            # purchase 8 days after the click → outside 7d → organic (-1)
            (3, "2024-01-09T00:00:01", 1, "purchase", 20.0, '{"k": 0}'),
            # user 2: purchase with no prior click → organic
            (4, "2024-01-02T00:00:00", 2, "purchase", 5.0, "{}"),
        ],
    )
    d = str(tmp_path / "attr")
    ev.write.parquet(f"{d}/events.parquet")
    got = {
        r.campaign: (r.attributed_cents, r.n_purchases)
        for r in QUERIES["attribution_last_touch"](spark, d).collect()
    }
    assert got[3] == (1000, 1)
    assert got[-1] == (2500, 2)


def test_triangle_count_known_graph(spark, tmp_path):
    # orders: {1,2,3} co-purchased (one triangle) + {3,4} edge (no triangle)
    li = spark.createDataFrame(
        [
            (100, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
             dt.datetime(1996, 6, 1))
            for i, p in enumerate([1, 2, 3])
        ]
        + [
            (200, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
             dt.datetime(1996, 7, 1))
            for i, p in enumerate([3, 4])
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    d = str(tmp_path / "tri")
    li.write.parquet(f"{d}/lineitem.parquet")
    row = QUERIES["triangle_count_copurchase"](spark, d).collect()[0]
    assert row.n_nodes == 4 and row.n_edges == 4
    assert row.n_triangles == 1
    # wedges: deg = {1:2, 2:2, 3:3, 4:1} → 1+1+3+0 = 5; transitivity 3/5
    assert row.n_wedges == 5
    assert row.transitivity == 0.6


def test_pq_adc_exact_on_self_and_ranking(spark, sf_dir):
    rows = QUERIES["pq_adc_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    # rank 1 must be the query vector itself at ADC distance 0 (its
    # subvectors quantize to SOME codeword, but distance to itself via
    # the codebook is >= 0; self always wins only if its codes are the
    # nearest cells — assert the weaker, always-true contract instead:
    assert [r.rk for r in rows] == list(range(1, 11))
    adcs = [r.adc_dist for r in rows]
    assert adcs == sorted(adcs)
    assert all(r.exact_dist >= 0.0 and r.adc_dist >= 0.0 for r in rows)
    # vec 0 IS in the corpus: its exact distance to itself is 0, and ADC
    # can never rank anything below its own cell distance — the query
    # vector must appear in the top-10 for a 16-codeword codebook.
    assert any(r.vec_id == 0 for r in rows)
    zero = [r for r in rows if r.vec_id == 0][0]
    assert zero.exact_dist == 0.0


def test_vwap_integer_exactness(spark, tmp_path):
    # 3 @ 50.97 size 32 each + known boundary case from the sweep:
    # mean price = 50.9728125-style boundary can't drift in integer form
    ev = _events(
        spark,
        [
            (1, "2024-01-01T00:01:00", 1, "trade", 50.97, '{"k": 32}'),
            (2, "2024-01-01T00:02:00", 1, "trade", 50.98, '{"k": 32}'),
            (3, "2024-01-01T00:03:00", 1, "trade", 50.96, '{"k": 32}'),
            (4, "2024-01-01T00:04:00", 1, "trade", 99.99, '{"k": 0}'),  # dropped
        ],
    )
    d = str(tmp_path / "vwap")
    ev.write.parquet(f"{d}/events.parquet")
    row = QUERIES["vwap_hourly"](spark, d).collect()[0]
    assert row.total_qty == 96 and row.n_trades == 3
    # exact: (5097+5098+5096)*32 cents*qty *1e6 // (100*96)
    assert row.vwap_micro == (5097 + 5098 + 5096) * 32 * 1_000_000 // (100 * 96)


def test_target_encoding_excludes_self(spark, sf_dir):
    rows = QUERIES["target_encoding_loo"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert [r.o_orderkey for r in rows] == sorted(r.o_orderkey for r in rows)
    for r in rows:
        assert r.loo_enc_e4 >= 0


def test_feature_hashing_bucket_space(spark, sf_dir):
    rows = QUERIES["feature_hashing"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 256
    assert all(len(r.bucket) == 2 for r in rows)
    assert all(abs(r.total_weight) <= r.n_tokens for r in rows)


def test_bollinger_needs_full_window(spark, tmp_path):
    # 23 flat bars then one spike: the spike bar is the 24th → qualifies,
    # and is the only band escape
    rows = []
    for h in range(23):
        rows.append((h, f"2024-01-01T{h:02d}:00:00", 1, "trade", 100.0, "{}"))
    rows.append((23, "2024-01-01T23:00:00", 1, "trade", 200.0, "{}"))
    ev = _events(spark, rows)
    d = str(tmp_path / "boll")
    ev.write.parquet(f"{d}/events.parquet")
    out = QUERIES["bollinger_breakouts"](spark, d).collect()
    assert len(out) == 1
    assert out[0].breakout == "up" and out[0].close == 200.0


def test_cusum_flags_level_shift(spark, tmp_path):
    # 4 days at 10 then 4 days at 50: |CUSUM| peaks at the shift boundary
    rows = []
    eid = 0
    for day in range(1, 9):
        v = 10.0 if day <= 4 else 50.0
        rows.append((eid, f"2024-01-0{day}T12:00:00", 1, "trade", v, "{}"))
        eid += 1
    ev = _events(spark, rows)
    d = str(tmp_path / "cusum")
    ev.write.parquet(f"{d}/events.parquet")
    row = QUERIES["cusum_changepoints"](spark, d).collect()[0]
    assert row.change_day == "2024-01-04"
    assert row.n_days == 8
    assert row.max_abs_cusum == 80.0  # 4 days × (30-10) below the mean of 30


def test_clamped_balance_known_sequence(spark, tmp_path):
    # deltas (cents): +1000, -2500 (floors at 0), +300 → final 300
    ev = _events(
        spark,
        [
            (1, "2024-01-01T00:00:00", 1, "purchase", 10.0, "{}"),
            (2, "2024-01-01T01:00:00", 1, "error", 25.0, "{}"),
            (3, "2024-01-01T02:00:00", 1, "purchase", 3.0, "{}"),
            (4, "2024-01-01T03:00:00", 1, "view", 99.0, "{}"),  # ignored type
        ],
    )
    d = str(tmp_path / "bal")
    ev.write.parquet(f"{d}/events.parquet")
    row = QUERIES["clamped_running_balance"](spark, d).collect()[0]
    assert row.final_cents == 300  # unclamped would be -1200+300
    assert row.n_moves == 3


def test_dq_expectations_single_scan(spark):
    """All five DQ rules must evaluate in ONE scan of orders (conditional
    aggregates + stack), not one scan per rule like the oracle's UNION."""
    df = QUERIES["dq_expectations"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    rows = {r.rule: r for r in df.collect()}
    assert len(rows) == 5
    assert all(r.passed for r in rows.values())  # synthetic data is clean


def test_benford_chi2_total_consistent(spark, sf_dir):
    rows = QUERIES["benford_digit_test"](spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    totals = {r.chi2_total for r in rows}
    assert len(totals) == 1
    expected_total = round(sum(round(r.chi2_contrib, 6) for r in rows), 6)
    assert abs(next(iter(totals)) - expected_total) < 1e-9

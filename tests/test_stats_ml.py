"""Independent-reimplementation checks for the stats/ML family (round 4,
session 4): each query is recomputed in plain numpy/pandas from the same
parquet — a third opinion besides the DuckDB oracle, so a bug shared by
two SQL engines' common idiom would still be caught."""

from __future__ import annotations

import collections
import math
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def _pdf(sf_dir: str, table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def test_ks_two_sample_matches_numpy(spark, sf_smoke):
    got = QUERIES["ks_two_sample"](spark, sf_smoke).toPandas().iloc[0]
    orders = _pdf(sf_smoke, "orders")
    a = np.sort(orders.loc[orders.o_orderpriority == "1-URGENT", "o_totalprice"].values)
    b = np.sort(orders.loc[orders.o_orderpriority == "5-LOW", "o_totalprice"].values)
    vals = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, vals, side="right") / len(a)
    fb = np.searchsorted(b, vals, side="right") / len(b)
    d = float(np.max(np.abs(fa - fb)))
    assert int(got.n_a) == len(a) and int(got.n_b) == len(b)
    assert abs(float(got.ks_d) - d) < 1e-6  # query rounds to 6 dp
    stat = math.sqrt(len(a) * len(b) / (len(a) + len(b))) * d
    assert abs(float(got.ks_stat) - stat) < 1e-6


def test_acf_daily_revenue_matches_numpy(spark, sf_smoke):
    got = QUERIES["acf_daily_revenue"](spark, sf_smoke).toPandas()
    orders = _pdf(sf_smoke, "orders")
    daily = (
        orders.assign(day=orders.o_orderdate.dt.floor("D"))
        .groupby("day")["o_totalprice"]
        .sum()
        .round(2)
        .sort_index()
    )
    mu = daily.mean()
    den = ((daily - mu) ** 2).sum()
    for _, row in got.iterrows():
        k = int(row["lag"])
        shifted = daily.copy()
        shifted.index = shifted.index - pd.Timedelta(days=k)
        joined = pd.concat([daily.rename("sa"), shifted.rename("sb")], axis=1).dropna()
        num = ((joined.sa - mu) * (joined.sb - mu)).sum()
        assert int(row["n_pairs"]) == len(joined), k
        assert abs(float(row["acf"]) - num / den) < 1e-5, k


def test_naive_bayes_matches_numpy(spark, sf_smoke):
    got = QUERIES["naive_bayes_lang_confusion"](spark, sf_smoke).toPandas()
    docs = _pdf(sf_smoke, "documents")
    tf: dict[tuple[int, str], collections.Counter] = {}
    cls_docs: collections.Counter = collections.Counter()
    for _, d in docs.iterrows():
        toks = [w for w in d.text.strip().split() if w]
        tf[(d.doc_id, d.lang)] = collections.Counter(toks)
        cls_docs[d.lang] += 1
    total = sum(
        (cnt for c in tf.values() for cnt in c.values()), start=0
    )
    vocab_counts: collections.Counter = collections.Counter()
    for c in tf.values():
        vocab_counts.update(c)
    vocab = {t for t, _ in sorted(vocab_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:512]}
    v = len(vocab)
    ctc: dict[str, collections.Counter] = collections.defaultdict(collections.Counter)
    for (doc, lang), c in tf.items():
        for t, n in c.items():
            if t in vocab:
                ctc[lang][t] += n
    tokc = {cls: sum(c.values()) for cls, c in ctc.items()}
    n_docs = sum(cls_docs.values())
    confusion: collections.Counter = collections.Counter()
    classes = sorted(cls_docs)
    for (doc, lang), c in tf.items():
        if not any(t in vocab for t in c):
            # the operator scores docs with >=1 in-vocab term (documented
            # membership contract); OOV-only docs are out of scope
            continue
        best = None
        for cls in classes:
            s = math.log(cls_docs[cls] / n_docs)
            for t, n in c.items():
                if t in vocab:
                    s += n * math.log(
                        (ctc[cls].get(t, 0) + 1.0) / (tokc.get(cls, 0) + v)
                    )
            key = (-round(s, 6), cls)
            if best is None or key < best[0]:
                best = (key, cls)
        confusion[(lang, best[1])] += 1
    got_map = {
        (r["actual"], r["predicted"]): int(r["n"]) for _, r in got.iterrows()
    }
    assert got_map == dict(confusion)
    assert total > 0  # corpus sanity


def test_gopher_rules_match_pandas(spark, sf_smoke):
    got = QUERIES["gopher_quality_rules"](spark, sf_smoke).toPandas()
    docs = _pdf(sf_smoke, "documents")
    stops = {"the", "a", "and", "of", "to", "data", "value", "row"}
    rows = []
    for _, d in docs.iterrows():
        words = [w for w in d.text.strip().split() if w]
        wc = len(words)
        if wc == 0:
            # engine: NULL ratios -> every rule comparison false -> all fail
            rows.append(
                {"source": d.source, "f_wc": 1, "f_mwl": 1, "f_sym": 1,
                 "f_alpha": 1, "f_stop": 1, "ok": 0}
            )
            continue
        nchars = sum(len(w) for w in words)
        symbols = d.text.count("#") + d.text.count("...")
        # engine contract: ASCII a-z only (lang-id'd ASCII corpus)
        alpha = sum(
            1 for w in words if any("a" <= ch <= "z" for ch in w.lower())
        )
        stop_hits = sum(1 for s in stops if s in words)
        f = {
            "f_wc": 0 if 50 <= wc <= 100000 else 1,
            "f_mwl": 0 if 3 <= nchars / wc <= 10 else 1,
            "f_sym": 0 if symbols / wc <= 0.1 else 1,
            "f_alpha": 0 if alpha / wc >= 0.8 else 1,
            "f_stop": 0 if stop_hits >= 2 else 1,
        }
        rows.append({"source": d.source, **f, "ok": 1 if sum(f.values()) == 0 else 0})
    exp = (
        pd.DataFrame(rows)
        .groupby("source")
        .agg(
            n_docs=("ok", "size"),
            n_pass=("ok", "sum"),
            fail_wordcount=("f_wc", "sum"),
            fail_mean_word_len=("f_mwl", "sum"),
            fail_symbol_ratio=("f_sym", "sum"),
            fail_alpha_ratio=("f_alpha", "sum"),
            fail_stopwords=("f_stop", "sum"),
        )
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    got = got.sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in got.columns if c != "source"}), exp
    )


def test_bfs_matches_python_bfs(spark, sf_smoke):
    got = QUERIES["bfs_hop_distance"](spark, sf_smoke).toPandas()
    li = _pdf(sf_smoke, "lineitem")
    li = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1997-01-01")]
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    adj: dict[int, set[int]] = collections.defaultdict(set)
    for _, grp in op.groupby("l_orderkey"):
        parts = sorted(grp.l_partkey)
        for i, x in enumerate(parts):
            for y in parts[i + 1 :]:
                adj[x].add(y)
                adj[y].add(x)
    deg = {n: len(s) for n, s in adj.items()}
    seed = min(deg, key=lambda n: (-deg[n], n))
    dist = {seed: 0}
    frontier = [seed]
    for hop in range(1, 5):
        nxt = sorted(
            {m for n in frontier for m in adj[n] if m not in dist}
        )
        for m in nxt:
            dist[m] = hop
        frontier = nxt
    exp = collections.defaultdict(lambda: [0, 0])
    for n, h in dist.items():
        exp[h][0] += 1
        exp[h][1] += n
    got_map = {
        int(r["hop"]): (int(r["n_nodes"]), int(r["sum_ids"])) for _, r in got.iterrows()
    }
    assert got_map == {h: tuple(v) for h, v in exp.items()}


def test_item_item_cosine_matches_pandas(spark, sf_smoke):
    got = QUERIES["item_item_cosine_topk"](spark, sf_smoke).toPandas()
    li = _pdf(sf_smoke, "lineitem")
    li = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1997-01-01")]
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    supp = op.groupby("l_partkey").size().to_dict()
    co: collections.Counter = collections.Counter()
    for _, grp in op.groupby("l_orderkey"):
        parts = sorted(grp.l_partkey)
        for ii, x in enumerate(parts):
            for y in parts[ii + 1 :]:
                co[(x, y)] += 1
    rows = []
    for (i, j), c in co.items():
        for a, b in ((i, j), (j, i)):
            if supp[a] >= 5 and supp[b] >= 5 and c >= 2:
                rows.append(
                    (a, b, c, round(c / math.sqrt(supp[a] * supp[b]), 6))
                )
    exp = {}
    by_item: dict[int, list] = collections.defaultdict(list)
    for a, b, c, cos in rows:
        by_item[a].append((-cos, b, c))
    for a, lst in by_item.items():
        for rk, (negcos, b, c) in enumerate(sorted(lst)[:3], start=1):
            exp[(a, b)] = (c, -negcos, rk)
    got_map = {
        (int(r["item"]), int(r["neighbor"])): (
            int(r["n_co"]),
            round(float(r["cosine"]), 6),
            int(r["rk"]),
        )
        for _, r in got.iterrows()
    }
    assert got_map == exp


def test_poisson_bootstrap_matches_hashlib(spark, sf_smoke):
    import hashlib

    got = QUERIES["poisson_bootstrap_ci"](spark, sf_smoke).toPandas().iloc[0]
    orders = _pdf(sf_smoke, "orders")
    from traderjoe_etl_spark.queries.stats_ml_ops import (
        _B,
        _CHUNKS,
        _GROUPS,
        _POIS_HEX16,
    )

    sw = [0] * _B
    swx = [0.0] * _B
    for key, x in zip(orders.o_orderkey.values, orders.o_totalprice.values):
        for g in range(_GROUPS):
            hh = hashlib.md5(f"boot:{g}:{key}".encode()).hexdigest()
            for c in range(_CHUNKS):
                h = hh[c * 4 : c * 4 + 4]
                w = 8
                for k, hx in enumerate(_POIS_HEX16):
                    if h < hx:
                        w = k
                        break
                r = g * _CHUNKS + c
                sw[r] += w
                swx[r] += w * x
    means = sorted(round(swx[r] / sw[r], 4) for r in range(_B))
    assert int(got.n_rows) == len(orders)
    assert abs(float(got.point_mean) - round(orders.o_totalprice.mean(), 4)) < 1e-6
    assert abs(float(got.boot_mean) - round(sum(means) / len(means), 4)) < 1e-3
    assert float(got.ci_lo) == means[1]
    assert float(got.ci_hi) == means[_B - 2]
    # the bootstrap CI should bracket the point estimate
    assert float(got.ci_lo) <= float(got.point_mean) <= float(got.ci_hi)


def test_global_running_agg_matches_pandas(spark):
    from traderjoe_etl_spark.operators.prefix import global_running_agg

    pdf = pd.DataFrame(
        {"k": np.arange(1000)[::-1], "x": (np.arange(1000) * 7919) % 101}
    )
    df = spark.createDataFrame(pdf).repartition(13)
    got = (
        global_running_agg(
            df,
            "k",
            {"rs": ("x", "sum"), "rmin": ("x", "min"), "rmax": ("x", "max")},
            n_parts=7,
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ordered = pdf.sort_values("k").reset_index(drop=True)
    assert list(got.rs) == list(ordered.x.cumsum())
    assert list(got.rmin) == list(ordered.x.cummin())
    assert list(got.rmax) == list(ordered.x.cummax())
    # exclusive prefix: first row NULL, rest shifted
    got_ex = (
        global_running_agg(df, "k", {"rs": ("x", "sum")}, inclusive=False, n_parts=7)
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert pd.isna(got_ex.rs.iloc[0])
    assert list(got_ex.rs.iloc[1:]) == list(ordered.x.cumsum().iloc[:-1])


def test_pareto_frontier_matches_pandas(spark, sf_smoke):
    got = QUERIES["pareto_frontier_parts"](spark, sf_smoke).toPandas()
    part = _pdf(sf_smoke, "part")
    li = _pdf(sf_smoke, "lineitem")
    vol = li.groupby("l_partkey")["l_quantity"].sum().round().astype("int64")
    pts = part.assign(cost_cents=(part.p_retailprice * 100).round().astype("int64"))
    pts = pts.merge(vol.rename("vol"), left_on="p_partkey", right_index=True)
    keep = []
    for _, a in pts.iterrows():
        dominated = (
            (pts.cost_cents <= a.cost_cents)
            & (pts.vol >= a.vol)
            & ((pts.cost_cents < a.cost_cents) | (pts.vol > a.vol))
        ).any()
        if not dominated:
            keep.append((a.p_partkey, a.cost_cents, a.vol))
    exp = sorted(keep, key=lambda t: (t[1], t[0]))
    got_rows = [
        (int(r.p_partkey), int(r.cost_cents), int(r.vol)) for r in got.itertuples()
    ]
    assert got_rows == exp
    assert len(exp) >= 1  # the frontier is never empty


def test_global_running_agg_edge_cases(spark):
    from traderjoe_etl_spark.operators.prefix import global_running_agg

    # empty input -> empty output with the running column present
    empty = spark.createDataFrame([], "k int, x long")
    out = global_running_agg(empty, "k", {"rs": ("x", "sum")})
    assert out.columns == ["k", "x", "rs"]
    assert out.count() == 0
    # single row, inclusive and exclusive
    one = spark.createDataFrame([(5, 7)], "k int, x long")
    inc = global_running_agg(one, "k", {"rs": ("x", "sum")}).collect()[0]
    assert inc.rs == 7
    exc = global_running_agg(
        one, "k", {"rs": ("x", "sum")}, inclusive=False
    ).collect()[0]
    assert exc.rs is None
    # n_parts=1 degenerates to a single-partition scan, same results
    pdf = pd.DataFrame({"k": range(50), "x": [i % 7 for i in range(50)]})
    got = (
        global_running_agg(
            spark.createDataFrame(pdf).repartition(5), "k", {"rs": ("x", "sum")},
            n_parts=1,
        )
        .toPandas()
        .sort_values("k")
    )
    assert list(got.rs) == list(pdf.x.cumsum())


def test_global_running_agg_property(spark):
    """Property check: for arbitrary integer series (negatives included,
    distinct keys) and partition counts, the distributed prefix scan
    equals pandas cumsum/cummin/cummax bit-for-bit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from traderjoe_etl_spark.operators.prefix import global_running_agg

    @settings(max_examples=8, deadline=None)
    @given(
        xs=st.lists(
            st.integers(min_value=-(10**9), max_value=10**9),
            min_size=1,
            max_size=60,
        ),
        n_parts=st.integers(min_value=1, max_value=9),
        shuffle=st.randoms(),
    )
    def prop(xs, n_parts, shuffle):
        keys = list(range(len(xs)))
        rows = list(zip(keys, xs))
        shuffle.shuffle(rows)
        df = spark.createDataFrame(rows, "k int, x long").repartition(4)
        got = (
            global_running_agg(
                df,
                "k",
                {"rs": ("x", "sum"), "rmin": ("x", "min"), "rmax": ("x", "max")},
                n_parts=n_parts,
            )
            .toPandas()
            .sort_values("k")
        )
        ser = pd.Series(xs)
        assert list(got.rs) == list(ser.cumsum())
        assert list(got.rmin) == list(ser.cummin())
        assert list(got.rmax) == list(ser.cummax())

    prop()


def test_token_budget_order_key_is_int64_safe_and_monotone(spark):
    """Regression pin for the r6 /code-review finding: the composite
    (quality DESC, doc_id ASC) BIGINT order key must stay inside int64
    over the FULL quality range [0, 1] (the 1e13 multiplier overflowed —
    under ANSI mode a crash, otherwise junk docs silently sorted FIRST),
    and must order exactly like (-quality, doc_id). Exercises the
    PRODUCTION quality_order_key expression and its multiplier constant,
    so a revert of either is caught."""
    from traderjoe_etl_spark.queries.curation_extras import (
        _BUDGET_KEY_MULT,
        quality_order_key,
    )

    # static overflow bound on the PRODUCTION constant: worst case is
    # quality=0 (factor 1e6) at a huge doc_id — a revert to the old 1e13
    # multiplier fails here immediately
    assert 1_000_000 * _BUDGET_KEY_MULT + 10**9 < 2**63 - 1

    rows = [
        (i, q)
        for i, q in enumerate(
            [0.0, 0.000001, 0.05, 0.0776, 0.078, 0.5, 0.999999, 1.0]
        )
    ] + [(10**9, 0.0)]  # big doc_id at worst-case quality
    df = spark.createDataFrame(rows, "doc_id long, quality double")
    # the PRODUCTION key expression, not a local re-implementation
    keyed = df.withColumn("okey", quality_order_key())
    got = [
        (r.doc_id, r.quality)
        for r in keyed.orderBy("okey").collect()  # would raise under ANSI on overflow
    ]
    expected = sorted(rows, key=lambda t: (-t[1], t[0]))
    assert got == [(d, q) for d, q in expected]

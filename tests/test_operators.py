"""Unit tests for operators lacking a SQL oracle (SURVEY.md §5: rows-only
ops get property/quality checks instead)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from traderjoe_etl_spark.operators.dedup import (
    exact_dedup,
    hamming_distance,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_fingerprint,
)
from traderjoe_etl_spark.operators.joins import asof_join
from traderjoe_etl_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk_brute,
    lsh_bucket_topk,
)
from traderjoe_etl_spark.sources.tables import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, "bb"), (4, "aa")], "id long, text string"
    )
    kept = exact_dedup(df, ["text"], "id").collect()
    assert sorted((r.id, r.text) for r in kept) == [(1, "aa"), (3, "bb")]


def test_minhash_candidates_are_real_near_dups(spark, docs):
    """Every LSH candidate pair should have high exact Jaccard (precision),
    and pairs sharing many bands should rank higher."""
    cand = minhash_lsh_candidates(docs, "doc_id", "text")
    verified = ngram_jaccard_pairs(docs, cand).collect()
    assert len(verified) > 0
    jac = [r.jaccard for r in verified]
    assert min(jac) > 0.5  # 16-band/4-row curve is steep around 0.5
    assert sum(j > 0.8 for j in jac) / len(jac) > 0.8


def test_minhash_recall_on_known_duplicates(spark):
    """Planted near-duplicates (one word changed in 50) must be found."""
    base = " ".join(f"w{i}" for i in range(50))
    variant = base.replace("w25", "zz")
    rows = [(1, base), (2, variant)] + [
        (i, " ".join(f"u{i}_{j}" for j in range(50))) for i in range(3, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(df, "doc_id", "text").collect()}
    assert (1, 2) in cand


def test_minhash_chained_family_recall_and_precision(spark, docs):
    """The concat-free chained family (per-token xxhash64, k-window
    combined hash — no shingle string ever built) must behave like the
    string families: identical token sequences get identical signatures,
    planted near-duplicates are recalled, and candidates verify at high
    exact Jaccard. Near-dup collision sets may differ from other families
    per instance — that randomness is MinHash itself, so only
    family-independent guarantees are asserted."""
    from traderjoe_etl_spark.operators.dedup import minhash_signatures

    base = " ".join(f"w{i}" for i in range(50))
    variant = base.replace("w25", "zz")
    rows = [(1, base), (2, variant), (100, base), (101, "tiny doc")] + [
        (i, " ".join(f"u{i}_{j}" for j in range(50))) for i in range(3, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {
        r["doc_id"]: tuple(r["sig"])
        for r in minhash_signatures(df, "doc_id", "text", hash_family="chained").collect()
    }
    assert sig[1] == sig[100]  # exact dup -> identical signature
    assert len(sig[101]) == 64  # short-doc fallback produces a full signature
    cand = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(df, "doc_id", "text", hash_family="chained").collect()
    }
    assert (1, 2) in cand and (1, 100) in cand

    verified = ngram_jaccard_pairs(
        docs, minhash_lsh_candidates(docs, "doc_id", "text", hash_family="chained")
    ).collect()
    assert len(verified) > 0
    assert min(r.jaccard for r in verified) > 0.5


def test_simhash_near_dups_have_small_hamming(spark):
    base = " ".join(f"w{i}" for i in range(60))
    variant = base.replace("w30", "zz")
    other = " ".join(f"q{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, variant), (3, other)], "doc_id long, text string"
    )
    fp = {r.doc_id: r.simhash for r in simhash_fingerprint(df, "doc_id", "text").collect()}
    near = spark.createDataFrame([(fp[1], fp[2]), (fp[1], fp[3])], "a long, b long").select(
        hamming_distance("a", "b").alias("d")
    ).collect()
    d_near, d_far = near[0].d, near[1].d
    assert d_near < d_far
    assert d_near <= 8  # one word in 60 flips few bits


def test_cosine_topk_brute_is_exact(spark, emb):
    """Brute-force top-k must equal a numpy-computed ground truth."""
    import numpy as np

    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in vecs.items()
        if vid != 0
    }
    expected = sorted(sims, key=lambda v: (-sims[v], v))[:10]

    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    got = [
        r.vec_id
        for r in cosine_topk_brute(emb.filter(F.col("vec_id") != 0), qdf, k=10).collect()
    ]
    assert got == expected


def test_lsh_bucket_topk_recall(spark, emb):
    """LSH top-k is approximate; with 8 planes it must still recover a
    reasonable fraction of the exact top-10 for most queries, and every
    result must be a genuine corpus vector with valid cosine."""
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = {r.vec_id for r in cosine_topk_brute(corpus, qdf, k=10).collect()}
    approx = lsh_bucket_topk(corpus, qdf, k=10, dim=64, n_planes=6).collect()
    assert len(approx) > 0
    got = {r.vec_id for r in approx}
    assert got & exact, "bucketed search should recover some exact neighbors"
    assert all(-1.0001 <= r.cosine <= 1.0001 for r in approx)


def test_cosine_near_dup_pairs_symmetric_and_thresholded(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = cosine_near_dup_pairs(df, threshold=0.99, dim=3, n_planes=4).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert all(r.cosine >= 0.99 for r in pairs)


def test_cosine_near_dup_arrow_matches_hof(spark, sf_dir):
    """The per-bucket GEMM kernel (the skewed-bucket scale path) must emit
    the same pair set and 6dp-identical cosines as the HOF pair join."""
    from pyspark.sql import functions as F

    from traderjoe_etl_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")

    def run(impl):
        return (
            cosine_near_dup_pairs(emb, 0.35, 64, n_planes=4, impl=impl)
            .select("id_a", "id_b", F.round("cosine", 6).alias("c"))
        )

    hof, arrow = run("hof"), run("arrow")
    assert hof.count() > 0  # non-vacuous
    assert hof.subtract(arrow).count() == 0
    assert arrow.subtract(hof).count() == 0


def test_cosine_near_dup_degenerate_bucket_bounded(spark):
    """A degenerate all-identical-embedding cluster — unsplittable by ANY
    extra hyperplane, since identical vectors share every sign bit — must
    flow through the bounded block-pair path when its bucket exceeds
    max_bucket_rows: no kernel group materializes more than ~2 blocks of
    rows, and the pair output is identical to the HOF join (every
    unordered pair scored exactly once)."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from traderjoe_etl_spark.operators.similarity import (
        _block_assignments,
        lsh_bucket_key,
        random_hyperplanes,
    )

    rng = np.random.default_rng(7)
    base = [float(x) for x in rng.normal(size=8)]
    other = [float(x) for x in rng.normal(size=8)]
    rows = [(i, base) for i in range(200)] + [(1000 + i, other) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cap = 32

    def run(**kw):
        return cosine_near_dup_pairs(
            emb, threshold=0.9, dim=8, n_planes=4, seed=42, **kw
        ).select("id_a", "id_b", F.round("cosine", 6).alias("c"))

    arrow = run(impl="arrow", max_bucket_rows=cap)
    hof = run(impl="hof")
    n_pairs = arrow.count()
    assert n_pairs >= 200 * 199 // 2 + 10  # both identical clusters fully paired
    assert hof.subtract(arrow).count() == 0
    assert arrow.subtract(hof).count() == 0

    # the bounded path's group sizes: the 200-row bucket splits into
    # ceil(200/32)=7 blocks -> 28 block-pair groups, each holding two
    # hash-assigned blocks (~57 rows expected) — never the whole bucket
    planes = random_hyperplanes(8, 4, seed=42)
    b = emb.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").alias("__v"),
        lsh_bucket_key("embedding", planes).alias("__bucket"),
    )
    cnt = b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__cnt"))
    big = b.join(cnt, "__bucket").filter(F.col("__cnt") > cap)
    sizes = (
        _block_assignments(big, cap)
        .groupBy("__bucket", "__i", "__j")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    nb = math.ceil(200 / cap)
    assert len(sizes) == nb * (nb + 1) // 2
    assert max(r.n for r in sizes) <= 4 * cap
    assert max(r.n for r in sizes) < 200  # strictly below the bucket size


def test_cosine_near_dup_arrow_string_ids(spark):
    """The arrow kernel must carry NON-integral ids end-to-end (output
    schema follows the id type; numpy code-point comparisons == Spark's
    UTF8_BINARY byte order), through BOTH the per-bucket path and the
    over-cap block-pair path (cap=8 forces it for the duplicate cluster)."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = [float(x) for x in rng.normal(size=8)]
    rows = [(f"doc-{i:03d}", base) for i in range(30)] + [
        (f"zz-{i}", [float(x) for x in rng.normal(size=8)]) for i in range(6)
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")

    def run(**kw):
        return cosine_near_dup_pairs(
            emb, threshold=0.9, dim=8, n_planes=4, **kw
        ).select("id_a", "id_b", F.round("cosine", 6).alias("c"))

    hof = run(impl="hof")
    arrow = run(impl="arrow", max_bucket_rows=8)
    assert dict(arrow.dtypes)["id_a"] == "string"
    assert arrow.count() >= 30 * 29 // 2
    assert hof.subtract(arrow).count() == 0
    assert arrow.subtract(hof).count() == 0


def test_asof_join_matches_pandas_merge_asof(spark):
    import pandas as pd

    left = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 11:30", "2024-01-01 09:00",
                 "2024-01-01 10:00", "2024-01-02 00:00"]
            ),
            "lv": [1, 2, 3, 4, 5],
        }
    )
    right = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "rts": pd.to_datetime(["2024-01-01 09:30", "2024-01-01 11:00", "2024-01-01 12:00"]),
            "rv": [10.0, 20.0, 30.0],
        }
    )
    expected = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("rts"),
        left_on="ts", right_on="rts", by="k", direction="backward",
    ).sort_values("lv")

    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        keys=["k"], left_ts="ts", right_ts="rts",
    ).toPandas().sort_values("lv")

    for _, e in expected.iterrows():
        o = out[out.lv == e.lv].iloc[0]
        if pd.isna(e.rv):
            assert pd.isna(o.rv)
        else:
            assert o.rv == e.rv, (e.lv, o.rv, e.rv)


def test_portable_minhash_matches_pure_python(spark):
    """Third-engine reproducibility: the portable family's signatures must
    be recomputable from the documented construction (md5-prefix base +
    minhash_coeffs) with nothing but hashlib — not just by DuckDB."""
    import hashlib

    from traderjoe_etl_spark.operators.dedup import (
        MERSENNE31,
        minhash_coeffs,
        minhash_signatures,
    )

    rows = [(1, "the quick brown fox jumps over the lazy dog"), (2, "tiny doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(df, "doc_id", "text", hash_family="portable").collect()
    }
    coeffs = minhash_coeffs(64)
    for doc_id, text in rows:
        words = text.lower().strip().split()
        shingles = (
            [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
            if len(words) >= 3
            else [" ".join(words)]
        )
        xs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles]
        expected = [min((a * x + b) % MERSENNE31 for x in xs) for a, b in coeffs]
        assert got[doc_id] == expected, f"doc {doc_id} signature mismatch"


def test_portable_simhash_matches_pure_python(spark):
    """Same for the md5-family SimHash hex fingerprint."""
    import hashlib

    from traderjoe_etl_spark.operators.dedup import simhash_fingerprint

    rows = [(1, "alpha beta gamma delta epsilon"), (2, "one token")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprint(df, "doc_id", "text", hash_family="md5").collect()
    }
    for doc_id, text in rows:
        votes = [0] * 64
        for tok in text.lower().strip().split():
            hx = hashlib.md5(tok.encode()).hexdigest()
            chunks = [int(hx[4 * c : 4 * c + 4], 16) for c in range(4)]
            for i in range(64):
                bit = (chunks[i // 16] >> (i % 16)) & 1
                votes[i] += 1 if bit else -1
        keys = [
            sum((1 if votes[16 * c + b] > 0 else 0) << b for b in range(16))
            for c in range(4)
        ]
        expected = "".join(f"{k:04x}" for k in keys)
        assert got[doc_id] == expected, f"doc {doc_id} fingerprint mismatch"


def test_rolling_hash_fingerprints_match_pure_python(spark):
    """Third-engine reproducibility for the winnowing fingerprints: the
    Rabin–Karp gram hashes and window minima must be recomputable from the
    documented construction with plain Python ints."""
    from traderjoe_etl_spark.operators.text import (
        ROLLING_BASE,
        ROLLING_MOD,
        rolling_hash_fingerprints,
    )

    k, w = 8, 4
    rows = [(1, "the quick brown fox jumps over the lazy dog"), (2, "abcdefghijk"), (3, "short")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], list(r["fingerprints"]))
        for r in rolling_hash_fingerprints(df, "doc_id", "text", k=k, window=w).collect()
    }
    assert 3 not in got  # len("short") = 5 < k + w - 1 = 11, no full window

    for doc_id, text in rows:
        if len(text) < k + w - 1:
            continue
        hashes = []
        for i in range(len(text) - k + 1):
            acc = 0
            for ch in text[i : i + k]:
                acc = (acc * ROLLING_BASE + ord(ch)) % ROLLING_MOD
            hashes.append(acc)
        minima = sorted({min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)})
        assert got[doc_id] == (len(hashes), minima), f"doc {doc_id} fingerprint mismatch"


def test_rolling_hash_arrow_kernel_matches_hof(spark, sf_dir):
    """The numpy winnowing kernel must emit integer-identical rows to the
    JVM HOF form on the real corpus (incl. the short-doc filter)."""
    from traderjoe_etl_spark.operators.text import rolling_hash_fingerprints
    from traderjoe_etl_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    hof = rolling_hash_fingerprints(docs, "doc_id", "text", impl="hof")
    arrow = rolling_hash_fingerprints(docs, "doc_id", "text", impl="arrow")
    assert hof.count() == arrow.count() > 0
    assert hof.subtract(arrow).count() == 0
    assert arrow.subtract(hof).count() == 0


def test_rolling_hash_fingerprints_shift_invariance(spark):
    """Winnowing's point: fingerprints of a shifted copy overlap heavily,
    while a whole-document digest would differ completely."""
    from traderjoe_etl_spark.operators.text import rolling_hash_fingerprints

    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = [(1, base), (2, "PREFIX >> " + base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: set(r["fingerprints"])
        for r in rolling_hash_fingerprints(df, "doc_id", "text").collect()
    }
    inter = got[1] & got[2]
    assert len(inter) >= 0.8 * len(got[1]), (len(inter), len(got[1]))


def test_frame_sample_plan_edges(spark):
    """Inclusive-end sequence semantics: duration 0 yields one frame at 0;
    duration exactly on the stride does not emit a frame at `duration`."""
    from pyspark.sql import functions as F

    from traderjoe_etl_spark.operators.multimodal import frame_sample_plan

    rows = [(1, "video", 0), (2, "video", 1000), (3, "video", 2500), (4, "image", 9999)]
    df = spark.createDataFrame(rows, "media_id long, kind string, duration_ms int").select(
        "media_id", "kind", F.struct(F.col("duration_ms")).alias("meta")
    )
    got = {}
    for r in frame_sample_plan(df, every_ms=1000).collect():
        got.setdefault(r["media_id"], []).append(r["frame_ms"])
    assert got == {1: [0], 2: [0], 3: [0, 1000, 2000]}


def test_adaptive_lsh_regime_pair_volume_linear(spark):
    """Pins the adaptive-plane-bank SCALE regime (VERDICT r5 item 7) with
    an actual bench-scale corpus instead of a NOTES entry. Two claims:

    1. The bank grows with the corpus: adaptive_n_planes is monotone, is
       4 through the 960-vector oracle regime, and reaches 12 at sf10's
       200k vectors (the measured 19.5×-at-sf100 configuration).
    2. Pair volume stays ~linear: on a 20k-vector synthetic corpus the
       measured in-bucket candidate volume Σ k·(k−1)/2 under the adaptive
       bank is within a small constant of n·target (linear regime), while
       the PINNED 4-plane bank is ≥ 20× larger on the same data (the
       quadratic regime the adaptive sizing exists to avoid)."""
    import math

    from traderjoe_etl_spark.operators.similarity import (
        adaptive_n_planes,
        lsh_bucket_key,
        random_hyperplanes,
    )

    # claim 1: formula regimes
    assert adaptive_n_planes(960, target_bucket=64) == 4
    assert adaptive_n_planes(961, target_bucket=64) == 5
    assert adaptive_n_planes(200_000, target_bucket=64) == 12
    sizes = [100, 1_000, 10_000, 100_000, 1_000_000, 10_000_000]
    planes_seq = [adaptive_n_planes(s, target_bucket=64) for s in sizes]
    assert planes_seq == sorted(planes_seq) and planes_seq[-1] > planes_seq[0]

    # claim 2: measured candidate volume on a 20k synthetic corpus —
    # deterministic pseudo-random unit-ish vectors built JVM-side (no
    # data shipped from the driver)
    n, dim = 20_000, 64
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}),"
            " j -> sin(CAST(xxhash64(id, j) % 100000 AS DOUBLE) / 7919.0))"
        ).alias("embedding"),
    )

    def pair_volume(n_planes: int) -> int:
        planes = random_hyperplanes(dim, n_planes, seed=42)
        buckets = emb.select(
            lsh_bucket_key("embedding", planes).alias("b")
        ).groupBy("b").count()
        return int(
            buckets.select(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("long")
            ).first()[0]
        )

    adaptive = adaptive_n_planes(n, target_bucket=64)
    assert adaptive == math.ceil(math.log2(n / 64 + 1))  # 9 planes at 20k
    vol_adaptive = pair_volume(adaptive)
    vol_pinned = pair_volume(4)
    # linear regime: expected volume ≈ n·target/2 (uniform); sign-LSH
    # buckets are skewed on real banks, so allow a generous constant
    assert vol_adaptive <= 8 * n * 64, (adaptive, vol_adaptive)
    # pinned bank on the SAME data sits in the quadratic regime
    assert vol_pinned >= 20 * vol_adaptive, (vol_pinned, vol_adaptive)
    assert vol_pinned >= n * n / (2 ** 6)  # within 4x of n²/2^planes


def test_minhash_fast_family_pairs_match_portable_at_sf001(spark, sf_dir):
    """Rows-only → proven (VERDICT r5 item 2): the chained-hash fast
    family's candidate PAIR SET must equal the oracle-verified portable
    family's at sf0.01 — the corpus's true near-dup structure, recovered
    identically by two independent hash families (both deterministic given
    seeds, so this is a hard pin, not a flaky sample). Per-pair shared-band
    COUNTS legitimately differ between families for partial near-dups
    (different random permutations → different band subsets collide; even
    16/16 is per-family probabilistic — P(all 64 mins collide) = J^64, so a
    J≈0.95 pair can be full-band in one family and 13/16 in the other, as
    pair (8,245) demonstrates at sf0.01), so only the SET is compared."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    fast = {
        (r.id_a, r.id_b): r.n_bands_shared
        for r in qs["minhash_near_dup_fast"](spark, sf_dir).collect()
    }
    portable = {
        (r.id_a, r.id_b): r.n_bands_shared
        for r in qs["minhash_near_dup"](spark, sf_dir).collect()
    }
    assert fast and set(fast) == set(portable)


def test_text_profile_fast_equals_full_on_non_hash_columns(spark, sf_dir):
    """Rows-only → proven (VERDICT r5 item 2): text_profile_fast differs
    from the oracle-checked text_profile_full ONLY in the fingerprint hash
    family — every other column (tokens, chars, lang, quality) must be
    byte-identical per doc. (Fingerprint dup-CLASSES are deliberately not
    compared across families: min-over-shingles collision of NEAR-dups is
    per-family random — the MinHash property — and sf0.01 has such pairs,
    e.g. docs 44/446; exact-dup class guarantees are pinned separately in
    test_text_profile_fingerprint_families_exact_dup_classes.)"""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    fast = {r.doc_id: r.asDict() for r in qs["text_profile_fast"](spark, sf_dir).collect()}
    full = {r.doc_id: r.asDict() for r in qs["text_profile_full"](spark, sf_dir).collect()}
    assert fast and set(fast) == set(full)
    for doc_id, fr in fast.items():
        fu = full[doc_id]
        for col in ("n_tokens", "n_chars", "lang_detected", "quality"):
            assert fr[col] == fu[col], (doc_id, col, fr[col], fu[col])


def test_minhash_pair_strategies_identical(spark, docs):
    """bucket_agg (one-pass array-combination expansion) and self_join (the
    classic band-bucket equi-join) must emit the exact same candidate pairs
    and shared-band counts."""
    from traderjoe_etl_spark.operators.dedup import minhash_lsh_candidates

    def pairs(strategy):
        return {
            (r.id_a, r.id_b): r.n_bands_shared
            for r in minhash_lsh_candidates(
                docs, "doc_id", "text", pair_strategy=strategy
            ).collect()
        }

    a, b = pairs("bucket_agg"), pairs("self_join")
    assert a == b and len(a) > 0


def test_hll_sketch_mergeability(spark, sf_dir):
    """union-of-per-group-sketches == sketch over the union, and both sit
    within the configured relative error of the exact distinct count."""
    import pyspark.sql.functions as F

    orders = read_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority").agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    merged = per.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")).collect()[0].e
    direct = orders.agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e")).collect()[0].e
    exact = orders.select("o_custkey").distinct().count()
    # union-of-sketches and direct sketch agree to within estimator noise
    # (register layouts can differ sparse-vs-dense across merge orders)
    assert abs(merged - direct) / exact < 0.01
    assert abs(merged - exact) / exact < 0.05
    assert abs(direct - exact) / exact < 0.05


def test_hll_sketch_rollup_query(spark, sf_dir):
    from traderjoe_etl_spark.queries import queries

    out = queries()["hll_sketch_rollup"](spark, sf_dir).collect()
    rows = {r.o_orderpriority: r for r in out}
    assert "ALL" in rows and len(rows) >= 5
    detail_n = sum(r.n_orders for k, r in rows.items() if k != "ALL")
    assert rows["ALL"].n_orders == detail_n


def test_merge_upsert_delete_arm(spark):
    """MERGE delete arm: a matched source row marked for deletion drops
    the target row; unmatched rows behave as update/insert/carry."""
    from traderjoe_etl_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 25.0, False), (3, None, None, True), (4, "d", 40.0, False)],
        "k long, s string, v double, is_deleted boolean",
    )
    out = {
        r.k: (r.s, r.v)
        for r in merge_upsert(target, source.drop("is_deleted"), keys=["k"]).collect()
    }
    assert out[2] == ("B", 25.0) and out[4] == ("d", 40.0) and out[1] == ("a", 10.0)

    deleted = merge_upsert(target, source, keys=["k"], delete_col="is_deleted")
    keys = {r.k for r in deleted.collect()}
    assert keys == {1, 2, 4}  # 3 deleted; 1 carried; 2 updated; 4 inserted


def test_cosine_near_dup_auto_planes(spark, emb):
    """n_planes=None sizes the plane bank from the corpus so in-bucket
    pair work stays bounded; explicit n_planes is preserved for
    oracle-pinned queries."""
    from traderjoe_etl_spark.operators.similarity import cosine_near_dup_pairs

    out = cosine_near_dup_pairs(emb, threshold=0.35, dim=64, n_planes=None)
    # 500 vectors at sf0.01 -> ceil(log2(500/32+1)) = 5 planes minimum 4;
    # result is still a valid pair set (subset of the 4-plane result)
    rows = out.collect()
    assert all(r.id_a < r.id_b and r.cosine >= 0.35 for r in rows)


def test_incremental_dedup_filters_cross_run_near_dups(spark, tmp_path):
    """Cross-run dedup against the persistent band-hash store: run 1 seeds
    the store; run 2's near-copies of run-1 docs are dropped while its
    genuinely novel docs survive, and the store grows by the survivors."""
    from pyspark.sql import functions as F

    from traderjoe_etl_spark.operators.dedup import incremental_dedup
    from traderjoe_etl_spark.sources.tables import read_table

    store = str(tmp_path / "fingerprints")
    batch1 = (
        read_table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    out1 = incremental_dedup(batch1, "doc_id", "text", store)
    assert out1.count() == batch1.count()  # empty store: everything is novel

    # near-copies: one word appended to a run-1 doc (Jaccard ~ 0.97);
    # novel docs: disjoint synthetic vocabulary (Jaccard ~ 0 vs corpus)
    near = batch1.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended")).alias("text"),
    )
    novel = spark.createDataFrame(
        [
            (
                20000 + i,
                " ".join(f"w{i}x{j}" for j in range(30)),
            )
            for i in range(10)
        ],
        "doc_id long, text string",
    )
    out2 = incremental_dedup(near.union(novel), "doc_id", "text", store)
    kept = {r.doc_id for r in out2.select("doc_id").collect()}
    assert all(k >= 20000 for k in kept), f"near-dup leaked: {sorted(kept)[:5]}"
    assert len(kept) == 10, f"novel docs dropped: {sorted(kept)}"

    # store grew: a re-run of the SAME novel docs is now fully filtered
    out3 = incremental_dedup(novel, "doc_id", "text", store, update_store=False)
    assert out3.count() == 0


def test_batch_topk_arrow_equals_hof_under_rounding(spark, emb):
    """The arrow kernel's in-batch pruning must be invisible: for a batch
    of query vectors with rounded ranking, impl='arrow' and impl='hof'
    (full scoring, pure JVM) must return IDENTICAL result sets — including
    self-exclusion and id tie-breaks at the rounding grid. Run at several
    partition counts so the per-batch pruning boundary actually moves."""
    from traderjoe_etl_spark.operators.similarity import cosine_topk_batch

    queries = (
        emb.filter(F.col("vec_id") % 37 == 1)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    )

    def rows(df):
        return sorted(
            (r.query_id, r.vec_id, r.cosine)
            for r in df.select("query_id", "vec_id", "cosine").collect()
        )

    expected = rows(
        cosine_topk_batch(emb, queries, k=5, round_digits=6, exclude_self=True, impl="hof")
    )
    assert len(expected) > 0
    for parts in (1, 7):
        got = rows(
            cosine_topk_batch(
                emb.repartition(parts), queries, k=5, round_digits=6,
                exclude_self=True, impl="arrow",
            )
        )
        assert got == expected, f"arrow/hof divergence at {parts} partitions"


def test_brute_topk_arrow_equals_hof_raw(spark, emb):
    """Single-query brute force: arrow pruning with quantum=0 (raw-score
    ranking) must match the HOF plan exactly."""
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    corpus = emb.filter(F.col("vec_id") != 0)
    hof = [(r.vec_id, round(r.cosine, 9)) for r in cosine_topk_brute(corpus, qdf, k=10).collect()]
    arrow = [
        (r.vec_id, round(r.cosine, 9))
        for r in cosine_topk_brute(corpus.repartition(5), qdf, k=10, impl="arrow").collect()
    ]
    assert [v for v, _ in hof] == [v for v, _ in arrow]
    for (_, a), (_, b) in zip(hof, arrow):
        assert abs(a - b) < 1e-9


def test_text_profile_fingerprint_families_exact_dup_classes(spark):
    """Family-independent guarantees of the min-over-shingles fingerprint:
    docs with IDENTICAL shingle sets share a fingerprint under BOTH hash
    families (min of the same hashed set), and the seeded all-distinct
    docs get all-distinct fingerprints under both. (NEAR-duplicates may
    collide under one family and not the other — that per-instance
    randomness is the MinHash property itself, so it is deliberately NOT
    asserted.)"""
    from traderjoe_etl_spark.operators.text import text_profile

    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again today"
    dup_ids, uniq_ids = [], []
    for i in range(40):
        if i % 4 == 0:
            rows.append((i, base))  # exact dup cluster
            dup_ids.append(i)
        else:
            rows.append((i, f"doc {i} unique words here number {i * 7} end of line"))
            uniq_ids.append(i)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for fam in ("xxhash64", "md5"):
        prof = text_profile(docs, "doc_id", "text", fingerprint_hash=fam)
        fp = {r["doc_id"]: r["fingerprint"] for r in prof.collect()}
        assert len({fp[i] for i in dup_ids}) == 1, fam
        assert len({fp[i] for i in uniq_ids}) == len(uniq_ids), fam


def test_pca_fit_project_invariants(spark, emb):
    """Algebraic invariants of the distributed PCA (no SQL engine has an
    eigensolver, so this is the correctness proof): orthonormal basis,
    descending explained variance, per-component projection variance ==
    explained ratio, and exact full-rank reconstruction."""
    import numpy as np

    from traderjoe_etl_spark.operators.similarity import pca_fit, pca_project

    mean, comps, explained = pca_fit(emb, dim=64, k=64)
    C = np.array(comps)
    assert np.allclose(C.T @ C, np.eye(64), atol=1e-8)
    assert all(
        explained[i] >= explained[i + 1] - 1e-12 for i in range(len(explained) - 1)
    )
    rows = pca_project(emb, mean, comps).collect()
    proj = {r["vec_id"]: np.array(r["proj"]) for r in rows}
    orig = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in emb.collect()
    }
    P = np.array([proj[i] for i in sorted(proj)])
    X = np.array([orig[i] for i in sorted(orig)])
    # full-rank round trip: X == mean + P @ C^T
    assert np.allclose(X, np.asarray(mean) + P @ C.T, atol=1e-7)
    # per-component variance matches the explained ratio (both /n)
    ratios = P.var(axis=0) / X.var(axis=0).sum()
    assert np.allclose(ratios, explained, atol=1e-8)
    # truncated fit agrees with the leading columns of the full basis
    mean8, comps8, _ = pca_fit(emb, dim=64, k=8)
    assert np.allclose(np.array(comps8), C[:, :8], atol=1e-8)


def test_pca_fit_offset_heavy_corpus_is_stable(spark):
    """Catastrophic-cancellation regression (VERDICT r5 item 6): with
    |mean| ~1e8 and O(1) spread, the naive one-pass ``G/n − outer(mean,
    mean)`` loses every significant digit of the covariance in float64
    (1e16 − 1e16). The pivot-shifted accumulation must recover the same
    eigenstructure numpy gets from explicitly centered data."""
    import numpy as np

    from traderjoe_etl_spark.operators.similarity import pca_fit

    rng = np.random.default_rng(7)
    dim, n = 8, 400
    offset = 1e8 * np.ones(dim)
    # anisotropic signal: variance concentrated in two known directions
    X = offset + rng.normal(size=(n, 2)) @ np.array(
        [[5.0] + [0.0] * 7, [0.0, 2.0] + [0.0] * 6]
    ) + 0.01 * rng.normal(size=(n, dim))
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(5)

    mean, comps, explained = pca_fit(emb, dim=dim, k=dim)
    C = np.asarray(comps)
    assert np.allclose(np.asarray(mean), X.mean(axis=0), rtol=0, atol=1e-4)
    assert np.allclose(C.T @ C, np.eye(dim), atol=1e-8)

    Xc = X - X.mean(axis=0)
    ref_evals = np.sort(np.linalg.eigvalsh(Xc.T @ Xc / n))[::-1]
    got_evals = np.asarray(explained) * ref_evals.sum()
    # the naive formula yields relative errors O(1) here; pinned tight
    assert np.allclose(got_evals, ref_evals, rtol=1e-6, atol=1e-9)
    # leading components span the planted 2D signal subspace
    basis = np.zeros((dim, 2))
    basis[0, 0] = basis[1, 1] = 1.0
    overlap = np.linalg.svd(C[:, :2].T @ basis, compute_uv=False)
    assert np.all(overlap > 0.99)


def test_winnowed_span_fingerprints_arrow_equals_hof(spark, sf_dir):
    """The numpy kernel and the JVM HOF form of the winnowing-selected
    span fingerprints must emit IDENTICAL integers — the modular scheme
    defines the values, not the loop shape. Includes short docs (< one
    winnowing window) via the global-min fallback."""
    from traderjoe_etl_spark.queries.retrieval import _selected_span_fingerprints
    from traderjoe_etl_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    # add a doc with exactly one span (16 tokens: ng=1 < P) for the fallback
    extra = docs.sparkSession.createDataFrame(
        [(999_000_001, " ".join(f"t{i}" for i in range(16)), "synthetic")],
        "doc_id long, text string, source string",
    )
    docs = docs.select("doc_id", "text", "source").unionByName(extra)
    for window in (8, 1):  # thinned form and the every-span (window=1) form
        hof = _selected_span_fingerprints(docs, impl="hof", window=window)
        arrow = _selected_span_fingerprints(docs, impl="arrow", window=window)
        assert hof.count() > 0, window
        assert arrow.filter(F.col("doc_id") == 999_000_001).count() == 1, window
        assert hof.subtract(arrow).count() == 0, window
        assert arrow.subtract(hof).count() == 0, window


def test_revenue_by_region_paths_agree(spark, sf_dir):
    """The stats-adaptive broadcast-probe plan and the per-order-partial
    shuffle plan must produce IDENTICAL rows (exact scaled-long sums are
    associative, so regrouping cannot change a bit). Force each path via
    the orders-size threshold seam."""
    import unittest.mock as um

    from traderjoe_etl_spark.queries import relational as rel

    fast = rel.revenue_by_region(spark, sf_dir)  # small fixture → broadcast path
    with um.patch.object(rel, "table_bytes", lambda *_: 10**12):  # force at-scale plan
        slow = rel.revenue_by_region(spark, sf_dir)
    assert "BroadcastHashJoin" in fast._jdf.queryExecution().executedPlan().toString()
    a = sorted(map(tuple, fast.collect()))
    b = sorted(map(tuple, slow.collect()))
    assert a == b


def test_gap_fill_horizon_bounds_output(spark):
    """A gap longer than the fill horizon truncates at the horizon (the
    100-TB output bound); gaps within it fill densely with the previous
    observation's value."""
    from traderjoe_etl_spark.queries import windows_scalars as ws

    rows = [
        (1, "2026-01-01 00:30:00", 10.0),
        (1, "2026-01-01 03:30:00", 20.0),          # 3h gap → dense fill
        (2, "2026-01-01 00:30:00", 5.0),
        (2, "2026-03-01 00:30:00", 6.0),           # ~59 days → truncated at 168h
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    import unittest.mock as um

    with um.patch.object(ws, "_t", lambda *_a, **_k: df):
        out = ws.gap_fill_hourly(spark, "ignored")
    per_user = {r["user_id"]: r["n"] for r in out.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert per_user[1] == 4  # 00:00,01:00,02:00 filled + 03:00 observed
    assert per_user[2] == ws._GAP_FILL_MAX_HOURS + 1 + 1  # capped segment + last obs
    u1 = {r["hour"]: (r["observed"], r["filled_value"]) for r in out.filter("user_id = 1").collect()}
    assert u1["2026-01-01 01:00"] == (0, 10.0) and u1["2026-01-01 02:00"] == (0, 10.0)
    assert u1["2026-01-01 00:00"][0] == 1 and u1["2026-01-01 03:00"][0] == 1


def test_incremental_embedding_dedup(spark, tmp_path):
    """Cross-run vector dedup against the persistent bucket store: run 2
    drops vectors landing in run 1's buckets (near-identical vectors by
    construction), keeps orthogonal-ish novel ones, and appends only the
    newly-occupied buckets."""
    from traderjoe_etl_spark.operators.similarity import (
        incremental_embedding_dedup,
        lsh_bucket_key,
        random_hyperplanes,
    )

    store = str(tmp_path / "emb_store")
    dim = 8

    def vec(base, eps):
        return [float(b) + eps for b in base]

    a, b = [1, 0, 2, 0, 1, 3, 0, 1], [-2, 1, 0, 4, -1, 0, 2, -3]
    batch1 = spark.createDataFrame(
        [(1, vec(a, 0.0)), (2, vec(b, 0.0))], "vec_id long, embedding array<double>"
    )
    out1 = incremental_embedding_dedup(batch1, store, dim=dim)
    assert sorted(r["vec_id"] for r in out1.collect()) == [1, 2]  # empty store keeps all

    batch2 = spark.createDataFrame(
        [
            (3, vec(a, 1e-6)),   # near-dup of 1 → same sign bucket → dropped
            (4, vec(b, -1e-6)),  # near-dup of 2 → dropped
            (5, [float(x) for x in [5, -5, 5, -5, 5, -5, 5, -5]]),  # novel
        ],
        "vec_id long, embedding array<double>",
    )
    out2 = incremental_embedding_dedup(batch2, store, dim=dim)
    kept = sorted(r["vec_id"] for r in out2.collect())
    planes = random_hyperplanes(dim, 12)
    bkeys = {
        r["vec_id"]: r["k"]
        for r in batch1.unionByName(batch2)
        .select("vec_id", lsh_bucket_key("embedding", planes).alias("k"))
        .collect()
    }
    assert bkeys[3] == bkeys[1] and bkeys[4] == bkeys[2]  # the premise holds
    expected = [5] if bkeys[5] not in (bkeys[1], bkeys[2]) else []
    assert kept == expected
    # store holds exactly the distinct occupied buckets
    stored = {r["bucket"] for r in spark.read.parquet(store).collect()}
    assert stored == {bkeys[1], bkeys[2]} | ({bkeys[5]} if expected else set())
    assert out2.columns == ["vec_id", "embedding"]


def test_incremental_embedding_dedup_corrupt_store_raises(spark, tmp_path):
    """A store path that EXISTS but cannot be read as the bucket schema
    must raise — silently treating it as 'first run' would skip dedup and
    append the batch's buckets on top of the broken store (ADVICE r03).
    A genuinely missing path still means first run."""
    import pytest

    from traderjoe_etl_spark.operators.similarity import incremental_embedding_dedup

    store = str(tmp_path / "emb_store")
    import os

    os.makedirs(store)
    with open(os.path.join(store, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not parquet")
    batch = spark.createDataFrame(
        [(1, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception):
        incremental_embedding_dedup(batch, store, dim=8).collect()


def test_rekey_store_migration_preserves_dedup(spark, tmp_path):
    """Grow the corpus past the original plane bank, migrate with
    rekey_store, and verify dedup behavior under the new bank: previously
    accepted vectors still collide (dropped), genuinely novel ones
    survive — and the new store refuses to overwrite an existing path."""
    import pytest

    from traderjoe_etl_spark.operators.similarity import (
        incremental_embedding_dedup,
        lsh_bucket_key,
        random_hyperplanes,
        rekey_store,
    )

    dim = 8
    old_store = str(tmp_path / "old_store")
    new_store = str(tmp_path / "new_store")
    import numpy as np

    rng = np.random.default_rng(11)
    corpus_rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(64)
    ]
    corpus = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<double>")
    # accept the corpus in two runs under a deliberately TOO-SMALL bank
    # (4 planes = 16 buckets for 64 vectors): run 1 occupies nearly every
    # bucket, so run 2 over-drops — the saturation that motivates re-keying
    out1 = incremental_embedding_dedup(
        corpus.filter("vec_id < 32"), old_store, dim=dim, n_planes=4
    )
    out2 = incremental_embedding_dedup(
        corpus.filter("vec_id >= 32"), old_store, dim=dim, n_planes=4
    )
    assert out2.count() < 16  # the small bank is saturating
    accepted = out1.unionByName(out2)
    accepted_rows = accepted.collect()
    assert len(accepted_rows) >= 32

    # migrate: re-key the ACCEPTED vectors under a 12-plane bank
    rekey_store(accepted, new_store, dim=dim, n_planes=12)
    planes12 = random_hyperplanes(dim, 12, seed=42)
    expect_buckets = {
        r["k"]
        for r in accepted.select(lsh_bucket_key("embedding", planes12).alias("k")).collect()
    }
    assert {r["bucket"] for r in spark.read.parquet(new_store).collect()} == expect_buckets

    # dedup behavior preserved under the new bank: an exact copy of an
    # accepted vector drops; a fresh vector in an unoccupied bucket stays
    dup_vec = accepted_rows[0]["embedding"]
    novel_vec = [float(x) for x in rng.normal(size=dim) * 10]
    probe = spark.createDataFrame(
        [(900, [float(x) for x in dup_vec]), (901, novel_vec)],
        "vec_id long, embedding array<double>",
    )
    out = incremental_embedding_dedup(
        probe, new_store, dim=dim, n_planes=12, update_store=False
    )
    kept = {r["vec_id"] for r in out.collect()}
    assert 900 not in kept
    nb = probe.filter("vec_id = 901").select(
        lsh_bucket_key("embedding", planes12).alias("k")
    ).first()["k"]
    assert (901 in kept) == (nb not in expect_buckets)

    # refuses to clobber an existing store
    with pytest.raises(Exception):
        rekey_store(accepted, new_store, dim=dim, n_planes=12)


def test_approx_distinct_counts_error_bound(spark, sf_dir):
    """Compensating gate for the rows-only approx_distinct_counts (VERDICT
    r6 item 6): Spark's HLL++ has NO exact regime (dense-only registers —
    linear counting carries ~n^2/2m bias even far below capacity), so the
    oracle-less query instead pins every group's estimate within 3*rsd of
    the exact distinct count. Deterministic for fixed data — a regression
    check, not a statistical one."""
    from pyspark.sql import functions as F

    from traderjoe_etl_spark.queries import queries

    est = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in queries()["approx_distinct_counts"](spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(est[k] - e) <= 3 * 0.02 * e, (k, est[k], e)

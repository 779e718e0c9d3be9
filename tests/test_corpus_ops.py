"""Unit tests for the round-4 corpus ops: the BPE greedy-merge fold
(the one place where two engines implement the same sequential
recurrence with different machinery — fold vs run-parity windows) and
the L2 assignment kernel's tie/zero-distance contract."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traderjoe_etl_spark.queries.corpus_ops import bpe_apply_merge


@pytest.mark.parametrize(
    "word,a,b,expect",
    [
        # greedy-leftmost on runs: aaaa -> [aa, aa], aaa -> [aa, a]
        ("aaaa", "a", "a", ["aa", "aa"]),
        ("aaa", "a", "a", ["aa", "a"]),
        # disjoint matches all merge
        ("abab", "a", "b", ["ab", "ab"]),
        # run embedded in other symbols
        ("xaaay", "a", "a", ["x", "aa", "a", "y"]),
        # no match / too short pass through
        ("xyz", "a", "b", ["x", "y", "z"]),
        ("a", "a", "a", ["a"]),
        # consumed right neighbor cannot start a new match: bbb on (b,b)
        ("bbbb", "b", "b", ["bb", "bb"]),
    ],
)
def test_bpe_greedy_merge_semantics(spark, word, a, b, expect):
    df = spark.createDataFrame([(list(word),)], "s array<string>")
    out = df.select(
        bpe_apply_merge(F.col("s"), F.lit(a), F.lit(b)).alias("s")
    ).collect()[0]["s"]
    assert out == expect, f"{word} merge ({a},{b})"


def test_bpe_merge_is_single_pass_not_iterative(spark):
    # a merged symbol must NOT re-match the rule within the same pass:
    # 'aaa' with rule (a,a) yields [aa, a], never [aaa]
    df = spark.createDataFrame([(list("aaaaaa"),)], "s array<string>")
    out = df.select(
        bpe_apply_merge(F.col("s"), F.lit("a"), F.lit("a")).alias("s")
    ).collect()[0]["s"]
    assert out == ["aa", "aa", "aa"]


def test_l2_assign_identical_vectors_zero_distance_lowest_cid(spark):
    from traderjoe_etl_spark.operators.similarity import l2_assign_arrow

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # two identical centroids: ties must resolve to the LOWER cluster id,
    # and the self-distance must be exactly 0.0 (no expansion cancellation)
    cents = [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]), (2, [9.0, 9.0, 9.0])]
    out = l2_assign_arrow(df, cents, "embedding").select("cluster", "dist").collect()
    assert all(r["cluster"] == 0 for r in out)
    assert all(r["dist"] == 0.0 for r in out)

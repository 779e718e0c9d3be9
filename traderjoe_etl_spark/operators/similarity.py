"""Similarity search over embedding columns (SURVEY.md §2B ◆).

- ``cosine_topk_brute`` — exact baseline: broadcast the query vector(s),
  higher-order dot product, TakeOrderedAndProject. Correct at any scale
  where a full scan is acceptable (it's one pass, no shuffle).
- ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH buckets
  (sign bits of dot products with broadcast random planes); candidates =
  same-bucket rows only, then exact cosine within candidates. Turns the
  all-pairs scan into a bucket-local one.

All vector math is ``F.zip_with`` / ``F.aggregate`` higher-order functions
— JVM-side, no Python UDF in the scan.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _l2(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _dot(ca, cb) / F.nullif(_l2(ca) * _l2(cb), F.lit(0.0))


def cosine_topk_brute(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Exact top-k by cosine against a single-row query DataFrame.

    crossJoin(broadcast(query)) keeps the corpus scan shuffle-free; orderBy
    + limit plans TakeOrderedAndProject (per-partition heaps). Deterministic
    tie-break by id."""
    joined = corpus.crossJoin(F.broadcast(query))
    scored = joined.select(
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-ish Gaussian hyperplanes (driver-side constants,
    broadcast into the plan as literals)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def lsh_bucket_key(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Bucket id = sign-bit string of dot products with each plane."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = [
        F.when(_dot(v, F.array(*[F.lit(x) for x in plane])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_bucket_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only corpus rows in the query's LSH bucket are
    scored. Recall < 1 by construction (tunable via n_planes / multi-probe);
    the point is the candidate set is ~n/2^planes of the corpus."""
    planes = random_hyperplanes(dim, n_planes, seed=seed)
    c = corpus.withColumn("__bucket", lsh_bucket_key(vec_col, planes))
    q = query.withColumn("__bucket", lsh_bucket_key(query_vec_col, planes))
    joined = c.join(F.broadcast(q), "__bucket")
    scored = joined.select(
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket self-join, then
    exact cosine filter ≥ threshold. The bucket join bounds the pair count;
    no O(n²) cross product."""
    planes = random_hyperplanes(dim, n_planes, seed=seed)
    b = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        lsh_bucket_key(vec_col, planes).alias("__bucket"),
    )
    a = b.select(F.col("__id").alias("id_a"), F.col("__v").alias("v_a"), "__bucket")
    c = b.select(F.col("__id").alias("id_b"), F.col("__v").alias("v_b"), "__bucket")
    pairs = a.join(c, "__bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )

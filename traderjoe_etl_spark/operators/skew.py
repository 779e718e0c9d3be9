"""Skew-mitigation operators.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.RUNTIME_CONFS) handles most skew at runtime. These
explicit operators cover the cases AQE can't:

- ``salted_join``: N-way key salting for a shuffle join where ONE hot key
  dominates (AQE splits oversized partitions, but a single key that hashes
  to one partition can still exceed memory on the build side);
- ``salted_group_agg``: two-stage aggregation over a salted key — partial
  per (key, salt), final per key. For algebraic aggregates Spark's own
  partial aggregation already does this; the salted form exists for
  holistic aggregates (collect_list & friends) whose state concentrates on
  hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    big gets ``salt = pmod(hash(random-ish row parts), N)`` — here a
    deterministic hash of the whole row so tests are stable; small is
    exploded ×N. The join key becomes (key, salt): a hot key now spreads
    over N shuffle partitions. Cost: small side ×N (only viable when small
    is genuinely small — which is also when the skew hurts most).
    """
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_big.join(replicated_small, [key, "__salt"], how)
    return out.drop("__salt")


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-stage salted aggregation: collect_list state is built per
    (key, salt) then flattened per key — bounds any single task's state to
    ~1/N of the hot key."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value_col).cast("string")), F.lit(salt_buckets)).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.collect_list(value_col).alias("__part"),
        F.count(F.lit(1)).alias("__n"),
    )
    return partial.groupBy(*keys).agg(
        F.flatten(F.collect_list("__part")).alias("values"),
        F.sum("__n").alias("n"),
    )

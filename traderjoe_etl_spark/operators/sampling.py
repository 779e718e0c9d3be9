"""Deterministic, engine-portable sampling (SURVEY.md §2B ◆ north-star:
training-data pipelines need reproducible subsets).

``df.sample()`` draws from a per-partition RNG stream: resplitting the
input (a different file layout, AQE coalescing, a cluster resize) changes
WHICH rows are kept, so yesterday's 1% sample cannot be reproduced and an
engine migration silently changes the training set. Hash sampling fixes
membership to the KEY: a row is in the p-sample iff

    substr(md5(seed || ':' || key), 1, 8) < hex(floor(p * 2^32))

which is a pure map-side filter — no shuffle, no state, no RNG — and any
engine with md5 (Spark, DuckDB, Trino, BigQuery, plain Python) computes the
same membership bit. Fixed-width lowercase hex compares lexicographically
exactly as the 32-bit integer it encodes, so no hex→int conversion is
needed on engines that lack one.

Properties at 100 TB: the filter pushes into the scan stage (no exchange);
sample-of-sample nests (p then q keeps a deterministic p·q subset when the
same seed is used, because the condition is a prefix-threshold on one hash);
and joining two tables each hash-sampled on the SAME join key keeps the
join consistent (both sides keep the same keys) — the standard trick for
sampling star schemas coherently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 32
_SPAN = 1 << HASH_BITS


def rate_threshold_hex(rate: float) -> str:
    """Fixed-width lowercase hex threshold for a keep-rate in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * _SPAN), _SPAN - 1) if rate < 1.0 else _SPAN - 1, "08x")


def sample_bucket(key: Column | str, seed: str = "42") -> Column:
    """The 8-hex-char bucket string a key falls in (uniform on [0, 2^32))."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), c.cast("string"))), 1, 8)


def hash_sample(df: DataFrame, key: str, rate: float, seed: str = "42") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed on ``key``.

    Map-only: the predicate is a scalar expression on the key column, so it
    fuses into the scan stage (and with parquet bloom/dictionary filters
    upstream of it when the key is also a filter column)."""
    return df.filter(sample_bucket(key, seed) < F.lit(rate_threshold_hex(rate)))


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "42",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample the dominant
    language, keep all of a rare one). Still map-only: the per-row
    threshold is a CASE over the strata column, no shuffle and no
    per-stratum pass. With ``default_rate=0`` unlisted strata drop."""
    thr: Column = F.lit(rate_threshold_hex(default_rate))
    for value, rate in rates.items():
        thr = F.when(F.col(strata) == value, F.lit(rate_threshold_hex(rate))).otherwise(thr)
    return df.filter(sample_bucket(key, seed) < thr)

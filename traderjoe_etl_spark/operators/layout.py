"""Data-layout operators: z-order interleaving and small-file compaction.

At 100 TB, query cost is dominated by how much of the table a scan must
touch. ``sinks.clustered_write`` solves the one-column case with range
clustering; this module adds:

- ``zorder_key``: a Morton (z-order) key over TWO columns, so files are
  simultaneously semi-clustered on both — a filter on EITHER column
  prunes ~sqrt-fraction of files, the standard lakehouse layout for
  two-dimensional access patterns (user×time, key×date).
- ``compact_small_files``: rewrite a directory of many small files into
  target-sized ones. Streaming/append sinks produce one file per
  micro-batch per partition; footer/open overhead makes thousand-file
  directories scan-bound on metadata, and compaction is the standard
  maintenance pass.

Everything is built from JVM expressions (shiftleft/or over integer
scalings) — no UDFs, so the z-key computation pipelines inside the scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear-scale a numeric column to an integer in [0, 2^bits)."""
    span = (hi - lo) or 1.0
    maxv = (1 << bits) - 1
    scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(float(span))) * maxv
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(maxv))


def zorder_key(
    col_a: Column | str,
    col_b: Column | str,
    range_a: tuple[float, float],
    range_b: tuple[float, float],
    bits: int = 16,
) -> Column:
    """Morton-interleave two numeric columns into one sortable long.

    ``range_*`` are the (min, max) of each column — pass stats from a
    cheap agg (two longs per column; at scale, from table metadata). The
    linear scaling is intentional: a rank-based scaling would need a
    global sort, which is exactly what layout work must avoid. Bit i of
    each scaled value lands at output bit 2i / 2i+1, so sorting by the
    key gives the space-filling z-curve order.
    """
    ca = F.col(col_a) if isinstance(col_a, str) else col_a
    cb = F.col(col_b) if isinstance(col_b, str) else col_b
    a = _scale_to_bits(ca, *range_a, bits)
    b = _scale_to_bits(cb, *range_b, bits)
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), parts).alias("__zkey")


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-partitioned and sorted by the z-order key of
    (col_a, col_b). The column ranges come from one tiny min/max agg
    (four scalars to the driver — metadata-sized, not data-sized)."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    key = zorder_key(col_a, col_b, (float(lo_a), float(hi_a)), (float(lo_b), float(hi_b)), bits)
    keyed = df.withColumn("__zkey", key)
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def compact_small_files(
    spark,
    path: str,
    out_path: str,
    target_mb: int = 256,
) -> int:
    """Rewrite a parquet directory into ~target_mb files; returns the
    output file count. Sizing uses the INPUT byte size (cheap file-system
    metadata), not a row count pass."""
    import glob
    import os

    total = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n = max(1, round(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    df.repartition(n).write.mode("overwrite").parquet(out_path)
    return n

"""Distributed prefix scan: a global running aggregate over an ORDER BY
without the single-task global window.

``sum(x) OVER (ORDER BY k)`` (or running min/max) is the textbook form, but
Spark executes an empty-partition-spec window in ONE task — the
WindowGroupLimit prune never fires (NOTES.md), so at 100 TB the entire
ordered relation serializes through a single executor thread.  The scalable
form is the classic two-level scan:

1. ``repartitionByRange(n_parts, order_col)`` — partition i holds a
   contiguous key range below partition i+1's.  The sampled boundaries are
   nondeterministic but the RESULT is invariant to them: offsets absorb any
   split;
2. within-partition running aggregate via a window PARTITIONED BY
   ``spark_partition_id()`` — partition-parallel, each bounded by its range
   partition;
3. per-partition totals → exclusive running offsets via a window over the
   ≤ n_parts-row pid relation (bounded by the partition COUNT, not the
   data), broadcast-joined back and combined (+ for sum, least/greatest for
   min/max).

First used inline by ks_two_sample (where the plan shape is pinned by
tests/test_plan_shapes.py); factored here for reuse by the skyline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# spec name -> (window agg fn, offset/partial combiner)
_COMBINE = {
    "sum": (F.sum, lambda off, part: off + part),
    "min": (F.min, F.least),
    "max": (F.max, F.greatest),
}


def global_running_agg(
    df: DataFrame,
    order_col: str,
    specs: dict[str, tuple[str, str]],
    *,
    inclusive: bool = True,
    n_parts: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """Append global running-aggregate columns ordered by ``order_col``.

    specs: out_name -> (in_col, fn) with fn in {"sum", "min", "max"}.
    inclusive=False computes the EXCLUSIVE prefix (strictly-preceding rows
    only; NULL for the first row of the whole order, exactly like
    ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``).
    checkpoint=False skips the boundary-pinning checkpoint — ONLY for plan
    inspection in tests (the checkpoint truncates the formatted plan); the
    production path must keep it.

    Rows with EQUAL order keys are prefix-aggregated in an arbitrary
    relative order — callers that need tie-determinism must pre-aggregate
    to distinct keys first (both current callers do).
    """
    for _, fn in specs.values():
        if fn not in _COMBINE:
            raise ValueError(f"unsupported running fn {fn!r}")
    from pyspark.storagelevel import StorageLevel

    # ranged is consumed by BOTH the within-partition scan and the totals
    # branch. Without a checkpoint, each branch would run its own
    # RangePartitioner sampling job, and correctness would silently depend
    # on exchange reuse giving both the SAME sampled boundaries (a key
    # landing in pid 2 for one branch and pid 3 for the other would corrupt
    # the offsets). The lazy DISK_ONLY checkpoint pins one materialization
    # — and one boundary split — for both consumers.
    ranged = df.repartitionByRange(n_parts, order_col).withColumn(
        "__pid", F.spark_partition_id()
    )
    if checkpoint:
        ranged = ranged.localCheckpoint(
            eager=False, storageLevel=StorageLevel.DISK_ONLY
        )
    end = Window.currentRow if inclusive else -1
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)

    within_cols = [
        _COMBINE[fn][0](F.col(in_col)).over(w_in).alias(f"__in_{out}")
        for out, (in_col, fn) in specs.items()
    ]
    cum = ranged.select("*", *within_cols)

    totals = ranged.groupBy("__pid").agg(
        *[
            _COMBINE[fn][0](F.col(in_col)).alias(f"__t_{out}")
            for out, (in_col, fn) in specs.items()
        ]
    )
    offsets = totals.select(
        "__pid",
        *[
            _COMBINE[fn][0](F.col(f"__t_{out}")).over(w_off).alias(f"__off_{out}")
            for out, (in_col, fn) in specs.items()
        ],
    )

    def _merge(out: str, fn: str) -> Column:
        off, part = F.col(f"__off_{out}"), F.col(f"__in_{out}")
        combined = _COMBINE[fn][1](off, part)
        # NULL offset = first range partition; NULL partial = exclusive
        # prefix of a partition's first row (carry the pure offset).
        return (
            F.when(off.isNull(), part)
            .when(part.isNull(), off)
            .otherwise(combined)
            .alias(out)
        )

    out_cols = [c for c in df.columns] + [
        _merge(out, fn) for out, (_, fn) in specs.items()
    ]
    return cum.join(F.broadcast(offsets), "__pid").select(*out_cols)

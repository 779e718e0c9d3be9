"""Streaming quality-quarantine router — the foreachBatch two-sink split a
streaming ingestion pipeline runs in front of a training-data corpus:
every micro-batch of documents is scored by the shared Gopher rule kernel
(queries/stats_ml_ops.gopher_doc_flags) and routed to either the clean
table or the quarantine table, with the per-rule failure reason attached
so quarantined docs are auditable (and re-admittable after a rule change).

Exactly-once table state on at-least-once batch delivery, the same way
crawl_dedup gets it: each epoch writes to its own ``epoch=N`` partition
directory with mode=overwrite, so a retried batch rewrites its directory
instead of duplicating rows.  The split itself is stateless (pure per-row
expressions), so there is no cross-batch store to reconcile — the router
scales to any micro-batch size the cluster can scan.

The reference has no quality gating (it ingests everything,
main.py:353-359); this operator is part of the north-star training-data
surface (SURVEY.md §2B ◆).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_FLAGS = ["f_wc", "f_mwl", "f_sym", "f_alpha", "f_stop"]

#: Column names the router/kernel introduces: a batch already carrying one
#: of these would produce duplicate/ambiguous columns mid-stream, so the
#: router rejects such inputs up front with a clear error instead.
_RESERVED = frozenset(
    ["wc", "words", "nchars", "symbols", "failed_rules", *_FLAGS]
)


def route_batch(batch_df: DataFrame, epoch_id: int, clean_path: str, quarantine_path: str) -> None:
    """Score one (micro-)batch with the Gopher rules and write the split.

    Deterministic and retry-idempotent: overwriting ``epoch=N`` under each
    sink root. The failed_rules audit column lists the rule flags that
    fired, comma-joined in a fixed order."""
    from ..queries.stats_ml_ops import gopher_doc_flags

    # lowercase both sides: Spark column resolution is case-insensitive by
    # default, so an input named 'WC' or 'Failed_Rules' collides just the same
    colliding = sorted(c for c in batch_df.columns if c.lower() in _RESERVED)
    if colliding:
        raise ValueError(
            f"quarantine router: input columns {colliding} collide with "
            f"kernel-internal names; rename them before routing"
        )
    flags = gopher_doc_flags(batch_df)
    fail_list = F.concat_ws(
        ",",
        F.filter(
            F.array(
                *[F.when(F.col(f) == 1, F.lit(f)).otherwise(F.lit(None)) for f in _FLAGS]
            ),
            lambda s: s.isNotNull(),
        ),
    )
    # persist: the clean and quarantine writes are two actions over the
    # same plan — without it every micro-batch is re-scanned and re-scored
    # twice on the streaming hot path
    routed = flags.withColumn("failed_rules", fail_list).persist()
    try:
        keep_cols = [c for c in batch_df.columns] + ["wc"]
        clean = routed.filter(F.col("failed_rules") == "").select(*keep_cols)
        quarantined = routed.filter(F.col("failed_rules") != "").select(
            *keep_cols, "failed_rules"
        )
        clean.write.mode("overwrite").parquet(f"{clean_path}/epoch={epoch_id}")
        quarantined.write.mode("overwrite").parquet(
            f"{quarantine_path}/epoch={epoch_id}"
        )
    finally:
        routed.unpersist()


def quarantine_sink(
    clean_path: str, quarantine_path: str
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch callable (directly testable with a batch
    DataFrame + epoch id, like crawl_dedup_sink)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        route_batch(batch_df, epoch_id, clean_path, quarantine_path)

    return sink


def quarantine_query(
    stream_df: DataFrame,
    clean_path: str,
    quarantine_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Wire the router onto a streaming DataFrame (availableNow trigger —
    drain whatever the source has, then stop; the production trigger is a
    deployment choice)."""
    return (
        stream_df.writeStream.foreachBatch(quarantine_sink(clean_path, quarantine_path))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )

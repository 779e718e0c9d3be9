"""Incremental SCD2 snapshot maintenance — streaming merge with
Delta-style table versioning on plain Parquet.

The reference appends a full snapshot row-set every cycle
(main.py:345-351, 353-359); the warehouse form is an SCD2 dimension kept
current by merging each cycle's batch. Without Delta/Iceberg, the engine
emulates a transactional table with the classic versioned-directory +
commit-pointer pattern (the same idea as Delta's ``_last_checkpoint``):

- every merge writes a brand-new version directory ``v=N`` (never
  read-modify-write in place — safe for concurrent readers at any scale);
- the commit is a single atomic rename of a pointer file ``_VERSION``;
  a crash mid-write leaves the previous version live;
- the pointer records the streaming ``epoch_id`` that produced it, so a
  foreachBatch retry of an already-committed batch is a no-op
  (exactly-once table state on top of at-least-once batch delivery).

Within a micro-batch the updates may span several snapshot timestamps
(e.g. a backlog drained by ``availableNow``); the sink folds them through
``scd2_merge`` in ascending ``ts`` order so the resulting version history
is identical to what sequential hourly batch merges would have produced.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.scd import scd2_init, scd2_merge


def _pointer_path(table_path: str) -> str:
    return os.path.join(table_path, "_VERSION")


def current_version(table_path: str) -> dict | None:
    """Read the commit pointer; None if the table has never committed."""
    p = _pointer_path(table_path)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def read_scd2_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the committed version of the SCD2 table (snapshot isolation:
    readers never see a half-written merge)."""
    ptr = current_version(table_path)
    if ptr is None:
        raise FileNotFoundError(f"no committed version at {table_path}")
    return spark.read.parquet(os.path.join(table_path, f"v={ptr['version']}"))


def _commit(table_path: str, version: int, epoch_id: int) -> None:
    # write-then-rename: the rename is the atomic commit point
    fd, tmp = tempfile.mkstemp(dir=table_path, prefix="_VERSION.")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump({"version": version, "epoch_id": epoch_id}, f)
    os.replace(tmp, _pointer_path(table_path))


def incremental_scd2_sink(
    table_path: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    ts_col: str,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch hook that merges a micro-batch of snapshot
    updates into the versioned SCD2 table."""
    os.makedirs(table_path, exist_ok=True)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        ptr = current_version(table_path)
        if ptr is not None and epoch_id <= ptr["epoch_id"]:
            return  # retry of a committed batch — idempotent skip
        spark = batch_df.sparkSession
        # distinct snapshot timestamps in this batch: tiny (one per cycle
        # drained), so a driver-side collect is fine at any data scale
        ts_vals = [r[0] for r in batch_df.select(ts_col).distinct().orderBy(ts_col).collect()]
        if not ts_vals:
            # An empty batch advances the epoch watermark only if a version
            # already exists; committing {version: -1} on an empty FIRST
            # batch would point readers at a v=-1 directory that was never
            # written (ADVICE r01) — stay uninitialized instead.
            if ptr is not None:
                _commit(table_path, ptr["version"], epoch_id)
            return
        if ptr is None:
            cur = scd2_init(batch_df.filter(F.col(ts_col) == ts_vals[0]), ts_col)
            ts_vals = ts_vals[1:]
            version = -1
        else:
            cur = spark.read.parquet(os.path.join(table_path, f"v={ptr['version']}"))
            version = ptr["version"]
        for ts in ts_vals:
            cur = scd2_merge(
                cur, batch_df.filter(F.col(ts_col) == ts), keys, compare_cols, ts_col
            )
        version += 1
        cur.write.mode("overwrite").parquet(os.path.join(table_path, f"v={version}"))
        _commit(table_path, version, epoch_id)

    return sink


def incremental_scd2_query(
    updates: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    ts_col: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Trigger-once (availableNow) incremental snapshot versioning: drain
    all pending snapshot batches, fold each through the SCD2 merge, commit
    one new table version, stop. An external scheduler re-launches next
    cycle — the streaming checkpoint guarantees each input file is merged
    exactly once across launches (the engine form of T1's hourly loop with
    restart safety the reference lacks)."""
    writer = (
        updates.writeStream.foreachBatch(
            incremental_scd2_sink(table_path, keys, compare_cols, ts_col)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()

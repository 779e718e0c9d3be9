"""Streaming crawl dedup — the foreachBatch form of cross-run
near-duplicate filtering (operators/dedup.py incremental_dedup).

Each micro-batch of incoming documents is filtered against the persistent
band-hash fingerprint store and the survivors land in an accepted-docs
table; the survivors' fingerprints join the store so later batches (and
later runs — the store outlives the query) are deduped against them.

Exactly-once table state on at-least-once batch delivery, without a
transactional table format, via two properties:

- the accepted output of epoch N is written to its own partition
  directory ``epoch=N`` with mode=overwrite — a retried batch rewrites
  the same directory, never duplicates it;
- store entries carry the epoch that produced them, and the dedup filter
  only reads entries with ``epoch < N`` — so a retry of epoch N does not
  see its own failed attempt's fingerprints (which would have filtered
  the whole batch and overwritten ``epoch=N`` with an empty set).
  Duplicate store rows from a retried append are harmless: the filter is
  a semi-join, and multiplicity does not change membership.

The reference has no notion of dedup or incremental state (it re-fetches
everything each cycle, main.py:353-359); this operator is part of the
north-star training-data surface (SURVEY.md §2B ◆).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import minhash_band_entries

STORE_SCHEMA = "band_idx INT, band_hash STRING, epoch LONG"


def crawl_dedup_sink(
    id_col: str,
    text_col: str,
    store_path: str,
    accepted_path: str,
    *,
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    hash_family: str = "xxhash64",
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch callable. Usable directly in tests (call it
    with a batch DataFrame and an epoch id) or via
    :func:`crawl_dedup_query`."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        entries = minhash_band_entries(
            batch_df, id_col, text_col, shingle_k, num_hashes, bands, hash_family
        )
        # STORE_SCHEMA pins band_hash STRING across runs; non-portable
        # families carry it as INT in-plan since r12 — cast at the boundary.
        entries = entries.withColumn(
            "band_hash", F.col("band_hash").cast("string")
        ).persist()
        try:
            try:
                store = (
                    spark.read.schema(STORE_SCHEMA)
                    .parquet(store_path)
                    .filter(F.col("epoch") < epoch_id)
                )
                have_store = True
            except Exception:
                have_store = False
            if have_store:
                hits = (
                    entries.join(store, ["band_idx", "band_hash"], "left_semi")
                    .select("__id")
                    .distinct()
                )
                novel = batch_df.join(
                    hits, batch_df[id_col] == hits.__id, "left_anti"
                )
            else:
                novel = batch_df
            # materialize the survivor set once; both writes below reuse it
            novel = novel.localCheckpoint(eager=True)
            novel.write.mode("overwrite").parquet(f"{accepted_path}/epoch={epoch_id}")
            novel_ids = novel.select(F.col(id_col).alias("__id"))
            (
                entries.join(novel_ids, "__id", "left_semi")
                .select("band_idx", "band_hash", F.lit(epoch_id).cast("long").alias("epoch"))
                .write.mode("append")
                .parquet(store_path)
            )
        finally:
            entries.unpersist()

    return sink


def crawl_dedup_query(
    stream_docs: DataFrame,
    id_col: str,
    text_col: str,
    store_path: str,
    accepted_path: str,
    checkpoint_path: str,
    **lsh_kwargs,
) -> StreamingQuery:
    """Run the crawl-dedup filter over a streaming document source with
    availableNow semantics (drain the backlog, then stop)."""
    return (
        stream_docs.writeStream.foreachBatch(
            crawl_dedup_sink(id_col, text_col, store_path, accepted_path, **lsh_kwargs)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )

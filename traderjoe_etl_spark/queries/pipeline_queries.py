"""The full reference snapshot pipeline exposed as a driver query.

Source payloads are synthesized DETERMINISTICALLY from the driver's own
tables (events → history/fees/bins roles per FIXTURES.md §B; pools from
nation), so the rows-only check is stable across runs. The real-source
variants of these inputs come from sources/rest.py and sources/rpc.py with
identical schemas.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.traderjoe import SnapshotInputs, build_snapshot
from ..schemas import (
    BINS_RESERVE_SCHEMA,
    FEES_EARNED_SCHEMA,
    POOL_STATS_SCHEMA,
    USER_HISTORY_SCHEMA,
)
from ..session import apply_runtime_confs
from ..sources.tables import read_table
from . import query

RUN_TS = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)
N_POOLS = 5


def _synth_inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, SnapshotInputs]:
    events = read_table(spark, sf_dir, "events")
    nation = read_table(spark, sf_dir, "nation").limit(N_POOLS)

    pool_of = (F.col("user_id") % N_POOLS).cast("int")
    user_addr = F.concat(F.lit("0xuser"), F.col("user_id").cast("string"))
    pool_addr = F.concat(F.lit("0xpool"), pool_of.cast("string"))

    pools_rows = nation.select(
        F.concat(F.lit("0xpool"), F.col("n_nationkey").cast("string")).alias("pairAddress"),
        F.col("n_name").alias("name"),
        (F.col("n_nationkey") * 100.0 + 500).alias("volumeUsd"),
        (F.col("n_nationkey") * 1000.0 + 1000).alias("liquidityUsd"),
        (F.col("n_nationkey") * 1.5 + 1).alias("feesUsd"),
        F.struct(
            F.lit("0xtx").alias("address"), F.lit("TX").alias("symbol"),
            F.lit(6).alias("decimals"), F.lit(2.0).alias("priceUsd"),
        ).alias("tokenX"),
        F.struct(
            F.lit("0xty").alias("address"), F.lit("TY").alias("symbol"),
            F.lit(18).alias("decimals"), F.lit(0.5).alias("priceUsd"),
        ).alias("tokenY"),
        F.lit(100.0).alias("reserveX"), F.lit(200.0).alias("reserveY"),
        F.lit(25).alias("lbBinStep"), F.lit(0.1).alias("lbBaseFeePct"),
        F.lit(1.0).alias("lbMaxFeePct"), F.lit(5.0).alias("protocolSharePct"),
        F.lit(8388608).alias("activeBinId"),
        F.lit(10.0).alias("liquidityDepthMinus"), F.lit(12.0).alias("liquidityDepthPlus"),
        F.lit(5.0).alias("liquidityDepthTokenX"), F.lit(6.0).alias("liquidityDepthTokenY"),
    )
    # cast every column to the declared schema type relationally — no
    # driver-side collect round trip
    pools_1d = pools_rows.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in POOL_STATS_SCHEMA.fields]
    )
    pools_1h = pools_1d

    history = events.filter(F.col("event_type") == "purchase").select(
        user_addr.alias("user_address"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        F.lit(True).alias("isDeposit"),
        pool_addr.alias("poolAddress"),
        F.lit("P").alias("pairName"),
        (F.col("event_id") % 100).cast("int").alias("binId"),
        F.struct(
            F.col("value").cast("string").alias("amount"), F.lit("2.0").alias("price")
        ).alias("tokenX"),
        F.struct(
            (F.col("value") / 2).cast("string").alias("amount"), F.lit("0.5").alias("price")
        ).alias("tokenY"),
        F.col("event_id").alias("blockNumber"),
    )
    fees = events.filter(F.col("event_type") == "click").select(
        user_addr.alias("user_address"),
        pool_addr.alias("poolAddress"),
        (F.col("event_id") % 100).cast("int").alias("binId"),
        (F.col("value") / 100).cast("string").alias("accruedFeesX"),
        (F.col("value") / 200).cast("string").alias("accruedFeesY"),
    )
    bins = events.filter(F.col("event_type") == "view").select(
        user_addr.alias("user_address"),
        pool_addr.alias("poolAddress"),
        (F.col("event_id") % 100).cast("int").alias("binId"),
        (F.col("value").cast("long") * 1000000).cast("decimal(38,0)").alias("reserveX"),
        (F.col("value").cast("long")).cast("decimal(38,0)").alias("reserveY"),
        (F.col("event_id") % 7 + 1).cast("decimal(38,0)").alias("shares"),
        F.lit(10).cast("decimal(38,0)").alias("totalShares"),
    )
    pairs = (
        events.select(user_addr.alias("user_address"), pool_addr.alias("pool_address"))
        .distinct()
    )
    for df, schema in ((history, USER_HISTORY_SCHEMA), (fees, FEES_EARNED_SCHEMA), (bins, BINS_RESERVE_SCHEMA)):
        assert [f.name for f in df.schema.fields] == [f.name for f in schema.fields]
    return pairs, SnapshotInputs(pools_1d, pools_1h, history, fees, bins)


@query("snapshot_pipeline")  # rows-only: 46-col wide row, no single SQL twin
def snapshot_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference pipeline (S2→K1 as one DAG) over all synthetic
    (user, pool) pairs at once — the reference's per-pair loop
    (main.py:11-17) as data parallelism. Correctness of each stage is
    pinned by tests/test_pipeline_parity.py fixtures; this query proves the
    assembled plan runs at scale factor."""
    apply_runtime_confs(spark)
    pairs, inputs = _synth_inputs(spark, sf_dir)
    return build_snapshot(pairs, inputs, RUN_TS)

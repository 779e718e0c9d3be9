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

    # one selectExpr call per relation (vs hundreds of composed-Column py4j
    # round trips — see BENCH.md plan-build notes); semantics unchanged,
    # guarded by the golden-output comparison in tests and the driver sim
    user_addr = "concat('0xuser', CAST(user_id AS STRING))"
    pool_addr = f"concat('0xpool', CAST(CAST(user_id % {N_POOLS} AS INT) AS STRING))"

    pools_rows = nation.selectExpr(
        "concat('0xpool', CAST(n_nationkey AS STRING)) AS pairAddress",
        "n_name AS name",
        "n_nationkey * 100.0D + 500 AS volumeUsd",
        "n_nationkey * 1000.0D + 1000 AS liquidityUsd",
        "n_nationkey * 1.5D + 1 AS feesUsd",
        "named_struct('address', '0xtx', 'symbol', 'TX', 'decimals', 6, 'priceUsd', 2.0D) AS tokenX",
        "named_struct('address', '0xty', 'symbol', 'TY', 'decimals', 18, 'priceUsd', 0.5D) AS tokenY",
        "100.0D AS reserveX", "200.0D AS reserveY",
        "25 AS lbBinStep", "0.1D AS lbBaseFeePct",
        "1.0D AS lbMaxFeePct", "5.0D AS protocolSharePct",
        "8388608 AS activeBinId",
        "10.0D AS liquidityDepthMinus", "12.0D AS liquidityDepthPlus",
        "5.0D AS liquidityDepthTokenX", "6.0D AS liquidityDepthTokenY",
    )
    # cast every column to the declared schema type relationally — no
    # driver-side collect round trip
    pools_1d = pools_rows.selectExpr(
        *[
            f"CAST(`{f.name}` AS {f.dataType.simpleString()}) AS `{f.name}`"
            for f in POOL_STATS_SCHEMA.fields
        ]
    )
    pools_1h = pools_1d

    history = events.filter(F.col("event_type") == "purchase").selectExpr(
        f"{user_addr} AS user_address",
        "date_format(ts, 'yyyy-MM-dd\\'T\\'HH:mm:ss') AS `timestamp`",
        "true AS isDeposit",
        f"{pool_addr} AS poolAddress",
        "'P' AS pairName",
        "CAST(event_id % 100 AS INT) AS binId",
        "named_struct('amount', CAST(value AS STRING), 'price', '2.0') AS tokenX",
        "named_struct('amount', CAST(value / 2 AS STRING), 'price', '0.5') AS tokenY",
        "event_id AS blockNumber",
    )
    fees = events.filter(F.col("event_type") == "click").selectExpr(
        f"{user_addr} AS user_address",
        f"{pool_addr} AS poolAddress",
        "CAST(event_id % 100 AS INT) AS binId",
        "CAST(value / 100 AS STRING) AS accruedFeesX",
        "CAST(value / 200 AS STRING) AS accruedFeesY",
    )
    bins = events.filter(F.col("event_type") == "view").selectExpr(
        f"{user_addr} AS user_address",
        f"{pool_addr} AS poolAddress",
        "CAST(event_id % 100 AS INT) AS binId",
        "CAST(CAST(value AS LONG) * 1000000 AS DECIMAL(38,0)) AS reserveX",
        "CAST(CAST(value AS LONG) AS DECIMAL(38,0)) AS reserveY",
        "CAST(event_id % 7 + 1 AS DECIMAL(38,0)) AS shares",
        "CAST(10 AS DECIMAL(38,0)) AS totalShares",
    )
    pairs = events.selectExpr(
        f"{user_addr} AS user_address", f"{pool_addr} AS pool_address"
    ).distinct()
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

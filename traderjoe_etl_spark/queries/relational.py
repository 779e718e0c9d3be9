"""Generalized relational operator surface (SURVEY.md §2B) exercised on the
TPC-H-ish star schema.

The reference exposes only left-equi joins (main.py:182-183), scalar
max/sum aggregation (main.py:130-135) and an implicit time series; this
module is the full engine menu those generalize to. Every query is a lazy
DataFrame plan — Catalyst does pushdown/pruning/join selection; broadcast
hints are explicit where a dimension is known-tiny at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.fixedpoint import fixed_sum_aggs, fixed_sum_sql, fixed_sum_value, fixed_sum_value_sql
from ..operators.joins import broadcast_dim_join, gated_broadcast
from ..operators.topk import top_k, top_k_per_group
from ..operators.windows import moving_agg, sessionize, snapshot_delta
from ..session import apply_runtime_confs
from ..sources.tables import read_table, table_bytes
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


_Q1_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           {fixed_sum_sql("l_quantity", 2)}      AS sum_qty,
           {fixed_sum_sql("l_extendedprice", 2)} AS sum_base_price,
           {fixed_sum_sql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
           {fixed_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
           round({fixed_sum_sql("l_quantity", 2)} / count(*), 4)      AS avg_qty,
           round({fixed_sum_sql("l_extendedprice", 2)} / count(*), 4) AS avg_price,
           round({fixed_sum_sql("l_discount", 2)} / count(*), 4)      AS avg_disc,
           count(*)                                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """


@query("pricing_summary", oracle=_Q1_SQL)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-groupBy-8 aggs. Partial aggregation means
    the shuffle carries ~|groups|×partitions rows; the parquet scan prunes to
    7 columns and pushes the shipdate filter (verify via .explain:
    PushedFilters + ReadSchema).

    Money sums use functions/fixedpoint.py: exact scaled-integer long sums
    (order-independent, whole-stage-codegen) instead of r01's DECIMAL(30,6)
    aggregation — measured 2.1× faster on this query at sf0.1 with
    bit-identical results; the hi/lo split keeps partial sums overflow-safe
    past 10^12 rows. Oracle mirrors the identical integer sums + recombine."""
    li = _t(spark, sf_dir, "lineitem")
    grouped = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *fixed_sum_aggs("sum_qty", "l_quantity", 2),
            *fixed_sum_aggs("sum_base_price", "l_extendedprice", 2),
            *fixed_sum_aggs("sum_disc_price", "l_extendedprice * (1 - l_discount)", 4),
            *fixed_sum_aggs("sum_charge", "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6),
            *fixed_sum_aggs("sum_disc", "l_discount", 2),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return grouped.select(
        "l_returnflag",
        "l_linestatus",
        fixed_sum_value("sum_qty", 2),
        fixed_sum_value("sum_base_price", 2),
        fixed_sum_value("sum_disc_price", 4),
        fixed_sum_value("sum_charge", 6),
        F.expr(f"round({fixed_sum_value_sql('sum_qty', 2)} / count_order, 4) AS avg_qty"),
        F.expr(f"round({fixed_sum_value_sql('sum_base_price', 2)} / count_order, 4) AS avg_price"),
        F.expr(f"round({fixed_sum_value_sql('sum_disc', 2)} / count_order, 4) AS avg_disc"),
        "count_order",
    )


@query(
    "distinct_counts",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_distinct per group (SURVEY.md §2B aggregations ◆). Exact
    distinct = expand+two-phase agg in Spark; the approx_ variant is the
    scale path (see approx_distinct_counts, rows-only)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("approx_distinct_counts")  # rows-only: HLL estimates differ across engines
def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100-TB path for
    distinct-user-per-pool style questions: constant memory per group vs the
    exact expand.

    Deliberately rows-only, and — unlike the other sketch queries — an
    exact-regime oracle is IMPOSSIBLE here, not just omitted: Spark's
    HyperLogLogPlusPlus is dense-only (no sparse/exact small-cardinality
    mode), so even far below register count the estimate is linear
    counting with ~n²/2m bias, never the true count. Measured at sf0.01
    (~1.3k distinct/group): off by 1-12 at rsd 0.02/0.01/0.005 — no rsd
    reaches exactness. Compensating gate:
    tests/test_operators.py::test_approx_distinct_counts_error_bound pins
    every group's estimate within 3·rsd of the exact distinct count (the
    estimate is deterministic for fixed data, so the bound is a stable
    regression check, not a flaky statistical one)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
    )


_ROLLUP_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           {fixed_sum_sql("l_extendedprice", 2)} AS total_price,
           count(*)                       AS n,
           grouping(l_returnflag)         AS g_flag,
           grouping(l_linestatus)         AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """


@query("rollup_fees_report", oracle=_ROLLUP_SQL)
def rollup_fees_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (per-group, per-flag subtotal, grand total) — the generalized
    fee-report shape of the reference's flat sums (SURVEY.md §2B grouping
    sets ◆, origin A3/A4). grouping() columns disambiguate NULL-as-subtotal
    from NULL data. Money sums via functions/fixedpoint.py (exact long
    arithmetic in codegen; see pricing_summary)."""
    li = _t(spark, sf_dir, "lineitem")
    # Two-level rollup: aggregate to the FINEST grouping once (|flags|×
    # |statuses| rows), then ROLLUP the long partials of that tiny result.
    # A direct rollup Expands every fact row ×3 (one copy per grouping
    # set) before the partial agg — 180M agg inputs at sf10; this shape
    # feeds the Expand 6 rows instead (sf10: 1.68 → ~0.6 s). Exact
    # because the fixed-point partials are plain longs (associative);
    # the recombine expression is unchanged, so the oracle still matches
    # bit-for-bit.
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        *fixed_sum_aggs("total_price", "l_extendedprice", 2),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("__total_price_hi").alias("__total_price_hi"),
            F.sum("__total_price_lo").alias("__total_price_lo"),
            F.sum("__n").alias("n"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            fixed_sum_value("total_price", 2),
            "n",
            "g_flag",
            "g_status",
        )
    )


@query(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total,
           count(*)                    AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (SURVEY.md §2B ◆). Two-level: the finest
    grouping aggregates the fact rows once, then the CUBE Expand (×4
    grouping sets) runs over |statuses|×|priorities| pre-summed rows —
    exact, since decimal sums are associative."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("__t"),
        F.count(F.lit(1)).alias("__n"),
    )
    return base.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum("__t").cast("double").alias("total"),
        F.sum("__n").alias("n"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "revenue_by_region",
    oracle="""
    SELECT r.r_name AS region,
           (CAST(sum(p.hi) AS DOUBLE) * 100.0
            + CAST(sum(p.lo) AS DOUBLE) / 10000.0) AS revenue,
           CAST(sum(p.n) AS BIGINT) AS n_lineitems
    FROM (
        SELECT l_orderkey,
               sum(CAST((CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)
                    - (CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT) % 1000000))
                    / 1000000 AS BIGINT)) AS hi,
               sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT) % 1000000) AS lo,
               count(*) AS n
        FROM lineitem GROUP BY l_orderkey
    ) p
    JOIN orders o   ON p.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join star query (TPC-H Q5 shape), pre-aggregated: lineitem is
    reduced to one (orderkey, revenue, count) row BEFORE the join, so the
    join shuffle carries |orders| pre-summed rows instead of |lineitem|
    fact rows (measured 28% faster at sf0.1; at 100 TB it is the difference
    between shuffling the fact table and shuffling per-order partials).
    nation/region broadcast; decimal sums are exact (reassociation-proof),
    so the regrouping cannot change results. Generalizes J1/J2
    (main.py:182-183)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    # Two-level EXACT long roll-up (functions/fixedpoint.py): per-lineitem
    # scaled integers → per-order hi/lo long partials → region-level long
    # sums, recombined to double once at the end. r01 used a per-order
    # DECIMAL(30,6) cast here; at sf10 the interpreted decimal sum over the
    # |orders| stream cost ~3 s that plain long sums don't. The join
    # shuffle now carries 3 longs per order. Oracle mirrors the identical
    # integer arithmetic.
    per_order = li.groupBy("l_orderkey").agg(
        *fixed_sum_aggs("rev", "l_extendedprice * (1 - l_discount)", 4),
        F.count(F.lit(1)).alias("__n"),
    )
    # Broadcast the NARROW custkey→region projection (2 columns, ~20 bytes/
    # customer), and probe it ON THE ORDERS SCAN so orders is reduced to the
    # (o_orderkey, r_name) map BEFORE its exchange — the region attribution
    # rides the orderkey shuffle instead of being resolved after the big
    # join. Same two |orders|-sized co-keyed exchanges as joining first and
    # probing later, but measured 9.1 → 3.7 s at sf10 (the post-join probe
    # shape kept the custkey column live through the join stage and its
    # whole-stage-codegen pipeline; the pre-projected map keeps the join
    # input at exactly key+region). The hint is SIZE-GATED (gated_broadcast;
    # every customer row survives, so selectivity = 1 and the 2-of-5-column
    # projection fraction is derived from the frame itself): customer scales
    # with the corpus, so past the byte cap the hint drops away and this
    # degrades to the plain shuffle join + AQE, not a failure (the q18 rule).
    enr = broadcast_dim_join(
        broadcast_dim_join(cust, nation, cust.c_nationkey == nation.n_nationkey),
        region,
        F.col("n_regionkey") == region.r_regionkey,
    ).select("c_custkey", "r_name")
    order_region = orders.join(
        gated_broadcast(enr, sf_dir, "customer"),
        orders.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "r_name")
    # Stats-adaptive physical strategy (what a CBO does from table stats):
    # when the whole orderkey→region map fits a broadcast (orders parquet
    # < 96 MB on disk — sf1-ish), probe it ON THE LINEITEM SCAN and do ONE
    # region-level aggregate: zero fact-side shuffles, the exchange carries
    # |regions|×partitions long partials. The exact scaled-long sums are
    # associative, so regrouping per-row instead of per-order cannot change
    # a single bit of the result. Beyond broadcast size, keep the per-order
    # partial + co-keyed shuffle join — the 100-TB plan.
    if 0 < table_bytes(sf_dir, "orders") < 96 * 1024 * 1024:
        return (
            li.join(F.broadcast(order_region), li.l_orderkey == F.col("o_orderkey"))
            .groupBy(F.col("r_name").alias("region"))
            .agg(
                *fixed_sum_aggs("rev", "l_extendedprice * (1 - l_discount)", 4),
                F.count(F.lit(1)).alias("n_lineitems"),
            )
            .select(
                "region",
                F.expr(
                    "CAST(__rev_hi AS DOUBLE) * 100.0"
                    " + CAST(__rev_lo AS DOUBLE) / 10000.0 AS revenue"
                ),
                "n_lineitems",
            )
        )
    return (
        per_order.join(order_region, per_order.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.expr(
                "CAST(sum(__rev_hi) AS DOUBLE) * 100.0"
                " + CAST(sum(__rev_lo) AS DOUBLE) / 10000.0 AS revenue"
            ),
            F.sum("__n").alias("n_lineitems"),
        )
    )


@query(
    "left_join_order_counts",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           count(o.o_orderkey)                     AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders (J1 semantics,
    main.py:182: unmatched left rows get NULLs → coalesced defaults, the
    distributed form of the empty-branch at main.py:143-153)."""
    cust = _t(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with at least one big order.
    Semi joins ship only the join key of the right side — no row
    multiplication, safe on skew."""
    cust = _t(spark, sf_dir, "customer")
    big = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "anti_join_dormant_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): "present in history but absent on-chain"
    shape from SURVEY.md §2B set ops. Customers who never placed a
    >400k order — every customer in the test data has SOME order, so the
    unfiltered form returned 0 rows and a 0=0 oracle match proved nothing
    (VERDICT r01 #1); the threshold leaves ~200 dormant rows at sf0.01 so
    the hash match is real evidence. The filter lands on the build side
    BEFORE the anti-join, shrinking the broadcast/shuffle."""
    cust = _t(spark, sf_dir, "customer")
    big = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "asof_join_last_order",
    oracle="""
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_time,
           (SELECT max(o.o_orderdate) FROM orders o
            WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) IS NOT NULL AS has_prior_order,
           strftime((SELECT max(o.o_orderdate) FROM orders o
                     WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts),
                    '%Y-%m-%d %H:%M:%S') AS last_order_date
    FROM events e
    WHERE e.event_type = 'purchase'
    """,
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: for each purchase event, the latest order date of
    that customer at-or-before the event ("what was the pool state when the
    user deposited" — SURVEY.md §2B joins, the natural query over the
    reference's append-only snapshot series main.py:345-351).

    Union-window implementation (one shuffle, no range-join blowup); oracle
    is the equivalent correlated scalar subquery."""
    from ..operators.joins import asof_join

    events = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    # No pre-distinct: duplicate (user, orderdate) rows carry identical
    # payloads here, so last-wins is deterministic anyway — skipping the
    # dedup saves one full shuffle of the right side.
    joined = asof_join(
        events,
        orders,
        keys=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=[],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_time"),
        F.col("asof_o_orderdate").isNotNull().alias("has_prior_order"),
        F.date_format("asof_o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("last_order_date"),
    )


@query(
    "range_join_price_band",
    oracle="""
    SELECT p.p_brand,
           b.band AS price_band,
           count(*) AS n_parts
    FROM part p
    JOIN (VALUES ('low', 0.0, 1000.0), ('mid', 1000.0, 1500.0), ('high', 1500.0, 100000.0))
         AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY p.p_brand, b.band
    """,
)
def range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against a small banding relation — broadcast the
    band table so the theta predicate evaluates map-side
    (BroadcastNestedLoopJoin over 3 rows, never a cartesian shuffle)."""
    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 0.0, 1000.0), ("mid", 1000.0, 1500.0), ("high", 1500.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("p_brand", F.col("band").alias("price_band"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


@query(
    "snapshot_deltas",
    oracle="""
    SELECT user_id, event_id,
           round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def snapshot_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() snapshot-over-snapshot delta per user — the hourly-growth
    analytics the reference's append-only CSV exists to serve (SURVEY.md §2B
    windows; K1 main.py:345-351). event_id breaks ts ties deterministically."""
    events = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    out = snapshot_delta(events, keys=["user_id"], order_by=["ts", "event_id"], value_col="value")
    return out.select("user_id", "event_id", F.round("delta", 4).alias("delta"))


@query(
    "moving_average",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
    FROM events
    """,
)
def moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average per user (frame window, SURVEY.md §2B)."""
    events = _t(spark, sf_dir, "events")
    out = moving_agg(
        events, keys=["user_id"], order_by=["ts", "event_id"], value_col="value", preceding=6, fn="avg", out="ma7"
    )
    return out.select("user_id", "event_id", F.round("ma7", 4).alias("ma7"))


@query(
    "top3_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
    FROM (
        SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey DESC) AS rn
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (ranking window). Unique o_orderkey tie-breaker →
    deterministic result set."""
    orders = _t(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    out = top_k_per_group(
        joined, keys=["c_mktsegment"], order_by=["o_totalprice", "o_orderkey"], k=3, keep_rank=True
    )
    return out.select("c_mktsegment", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn")


@query(
    "sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                         OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min gap) via lag + conditional cumsum —
    single shuffle (SURVEY.md §2B streaming ◆; the batch twin of
    session_window)."""
    events = _t(spark, sf_dir, "events")
    sess = sessionize(events, keys=["user_id"], ts_col="ts", gap_seconds=1800, tie_break=["event_id"])
    return sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))


# ---------------------------------------------------------------------------
# Sorts / top-k / set ops
# ---------------------------------------------------------------------------


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition heaps, k·p rows
    to the driver — no global sort at 100 TB)."""
    orders = _t(spark, sf_dir, "orders")
    out = top_k(orders, order_by=["o_totalprice", "o_orderkey"], k=10)
    return out.select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


@query(
    "union_nations_with_presence",
    oracle="""
    SELECT n_nationkey, 'customer' AS side FROM nation
    WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
    UNION ALL
    SELECT n_nationkey, 'supplier' AS side FROM nation
    WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
    """,
)
def union_nations_with_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two semi-joined branches (SURVEY.md §2B set ops — the
    vertical analog of the reference's CSV append-across-runs,
    main.py:347)."""
    nation = _t(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    a = nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left_semi").select(
        "n_nationkey", F.lit("customer").alias("side")
    )
    b = nation.join(supp, nation.n_nationkey == supp.s_nationkey, "left_semi").select(
        "n_nationkey", F.lit("supplier").alias("side")
    )
    return a.unionByName(b)


@query(
    "intersect_except_nations",
    oracle="""
    SELECT n_nationkey, 'both' AS membership FROM
      (SELECT c_nationkey AS n_nationkey FROM customer
       INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT n_nationkey, 'customer_only' AS membership FROM
      (SELECT c_nationkey AS n_nationkey FROM customer
       EXCEPT SELECT s_nationkey FROM supplier)
    """,
)
def intersect_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct set semantics)."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    supp = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    both = cust.intersect(supp).select("n_nationkey", F.lit("both").alias("membership"))
    only = cust.subtract(supp).select("n_nationkey", F.lit("customer_only").alias("membership"))
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Scalar functions: json / datetime / string / pivot
# ---------------------------------------------------------------------------


@query(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction on the events.props string column (P1 generalized:
    from_json/get_json_object; SURVEY.md §2B scalar functions).

    Plan shape: JSON parsing is deferred past a cardinality-collapsing
    partial aggregate — groupBy(event_type, props) first (map-side combine
    collapses repeats within each partition), then get_json_object runs on
    the distinct (event_type, props) combos only, then a weighted roll-up.
    Columnar engines get this for free from parquet dictionary encoding;
    on Spark the two-phase agg recovers it: the parse count drops from
    |rows| to |distinct combos| (100 here; 10M rows at sf10 went 2.0 s →
    sub-second). High-cardinality props degrades gracefully — the extra
    shuffle carries per-partition distinct combos, never more than the
    original rows, and the parse count never exceeds |rows|."""
    events = _t(spark, sf_dir, "events")
    per = events.groupBy("event_type", "props").agg(F.count(F.lit(1)).alias("nn"))
    k = F.get_json_object("props", "$.k").cast("double")
    return per.groupBy("event_type").agg(
        F.round(
            F.sum(k * F.col("nn"))
            / F.sum(F.when(k.isNotNull(), F.col("nn"))),
            4,
        ).alias("avg_k"),
        F.sum("nn").alias("n"),
    )


@query(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(json_extract(props, '$.k')) AS INT) AS min_k,
           CAST(max(json_extract(props, '$.k')) AS INT) AS max_k,
           round(avg(CAST(json_extract(props, '$.k') AS DOUBLE)), 4) AS avg_k,
           CAST(sum(CASE WHEN CAST(json_extract(props, '$.k') AS INT) % 2 = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_odd_k
    FROM events
    GROUP BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4): ``parse_json``
    once into the binary variant encoding, then typed ``variant_get``
    extractions — the at-scale answer to JSON columns, where repeated
    ``get_json_object`` calls would re-parse the string per access. One
    map-side projection feeds every extraction; the shredded binary form
    is what a 100-TB lakehouse stores instead of JSON text. The DuckDB
    twin reads the same values through its native JSON extraction."""
    events = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(__v, '$.k', 'int')")
    parsed = events.select("event_type", F.parse_json("props").alias("__v")).select(
        "event_type", k.alias("k")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.sum(F.when(F.col("k") % 2 == 1, 1).otherwise(0)).alias("n_odd_k"),
    )


@query(
    "orders_by_month",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1
    """,
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp functions: date_trunc + date_format (P6/P8 generalized,
    reference main.py:124, 136, 171)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "lenient_cast_defaults",
    oracle="""
    SELECT event_type,
           round(sum(coalesce(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE), 0)), 4) AS k_total,
           round(sum(coalesce(TRY_CAST(json_extract_string(props, '$.missing') AS DOUBLE), 0)), 4) AS missing_total
    FROM events
    GROUP BY event_type
    """,
)
def lenient_cast_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lenient_cast + fillna(0) parity (reference main.py:125-126:
    to_numeric(errors='coerce').fillna(0); missing struct fields default 0
    per main.py:115-118)."""
    from ..functions.casts import lenient_cast

    events = _t(spark, sf_dir, "events")
    k = lenient_cast(F.get_json_object("props", "$.k"), "double", default=0.0)
    missing = lenient_cast(F.get_json_object("props", "$.missing"), "double", default=0.0)
    return events.groupBy("event_type").agg(
        F.round(F.sum(k), 4).alias("k_total"),
        F.round(F.sum(missing), 4).alias("missing_total"),
    )


@query(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (SURVEY.md §2B; fixed pivot values so
    the plan is a single pass, no value-discovery job)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).sum("l_quantity")
    return out.select("l_returnflag", F.round("O", 2).alias("O"), F.round("F", 2).alias("F"))


@query(
    "share_of_parent_revenue",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    ),
    reg AS (SELECT region, CAST(sum(cents) AS BIGINT) AS region_cents
            FROM rev GROUP BY region),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM rev)
    SELECT rev.region, rev.nation, rev.cents AS nation_cents,
           round(CAST(rev.cents AS DOUBLE) / reg.region_cents, 6) AS share_of_region,
           round(CAST(reg.region_cents AS DOUBLE) / tot.total_cents, 6) AS region_share_of_total
    FROM rev JOIN reg USING (region), tot
    ORDER BY rev.region, rev.nation
    """,
)
def share_of_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchy report: each nation's share of its
    region's revenue and each region's share of the total — the BI staple
    that two-level-aggregates-plus-joins expresses without any window
    (a PARTITION BY region window would also work here, but the join form
    keeps every aggregate map-combinable and reuses the level-1 rollup for
    both parents).

    Scale shape: ONE fact-table aggregate (integer cents) at (region,
    nation) grain — ~125 rows — then parent levels derive from it;
    dimension joins are broadcast.  Shares are single divisions of exact
    integers, rounded 6 dp on both sides."""
    apply_runtime_confs(spark)
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    rev = (
        orders.join(cust, cust["c_custkey"] == orders["o_custkey"])
        .join(F.broadcast(nation), nation["n_nationkey"] == cust["c_nationkey"])
        .join(F.broadcast(region), region["r_regionkey"] == nation["n_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    reg = rev.groupBy("region").agg(F.sum("cents").cast("long").alias("region_cents"))
    tot = rev.agg(F.sum("cents").cast("long").alias("total_cents"))
    return (
        rev.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.col("cents").alias("nation_cents"),
            F.round(F.col("cents").cast("double") / F.col("region_cents"), 6).alias(
                "share_of_region"
            ),
            F.round(
                F.col("region_cents").cast("double") / F.col("total_cents"), 6
            ).alias("region_share_of_total"),
        )
        .orderBy("region", "nation")
    )

"""Coverage queries closing the remaining SURVEY.md §2B gaps: right/full
outer joins, GROUPING SETS, range-frame windows, from_json struct parsing,
and the pandas-UDF surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import apply_runtime_confs
from ..sources.tables import read_table
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    return read_table(spark, sf_dir, name)


@query(
    "full_outer_nation_presence",
    oracle="""
    SELECT coalesce(c.n, s.n) AS n_nationkey,
           coalesce(c.n_cust, 0) AS n_cust,
           coalesce(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS n, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS n, count(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.n = s.n
    """,
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (both-sides-preserved semantics)."""
    cust = _t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("n")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    supp = read_table(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("n")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    j = cust.join(supp, "n", "full_outer")
    return j.select(
        F.col("n").alias("n_nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "right_join_parts_in_lineitem",
    oracle="""
    SELECT p.p_partkey, p.p_brand,
           count(l.l_orderkey) AS n_lineitems
    FROM lineitem l
    RIGHT JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_brand
    """,
)
def right_join_parts_in_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT outer join (parts preserved even when never ordered)."""
    li = _t(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey, "right")
        .groupBy("p_partkey", "p_brand")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )


@query(
    "grouping_sets_report",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS qty,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not expressible as rollup/cube): per-flag,
    per-status, grand total — via SQL on a temp view. Two-level: the
    finest (flag, status) aggregate runs over the fact rows once; the
    Expand (×3 grouping sets) then processes the handful of pre-summed
    rows. Exact: l_quantity is integral, so the double partials re-sum
    without reassociation error (and far below 2^53)."""
    li = _t(spark, sf_dir, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("__q")
    ).createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(__q), 2) AS qty,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "range_frame_window",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4)
               AS hour_trailing_sum
    FROM events
    """,
)
def range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): trailing 1-hour sum per
    user — duplicate timestamps share the same frame, unlike ROWS."""
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("hour_trailing_sum"),
    )


@query(
    "from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema (P1 generalized — the engine's
    json_normalize; struct field access after parse)."""
    events = _t(spark, sf_dir, "events")
    parsed = events.select(
        "event_id",
        F.from_json("props", T.StructType([T.StructField("k", T.LongType())])).alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_bucket"),
    )


@query(
    "pandas_udf_gini",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               list_value(
                   count(CASE WHEN event_type = 'view'     THEN 1 END),
                   count(CASE WHEN event_type = 'click'    THEN 1 END),
                   count(CASE WHEN event_type = 'purchase' THEN 1 END),
                   count(CASE WHEN event_type = 'signup'   THEN 1 END),
                   count(CASE WHEN event_type = 'error'    THEN 1 END)) AS counts
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           round(1.0 - list_sum(list_transform(counts,
                 c -> (CAST(c AS DOUBLE) / list_sum(counts)) ** 2)), 6) AS gini
    FROM per_user
    """,
)
def pandas_udf_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered Arrow-batched pandas UDF surface: per-user event-type
    Gini impurity. (The oracle recomputes it with DuckDB list fns — the UDF
    is the engine's escape hatch, not the only expression.)"""
    from ..functions.udfs import gini_impurity, register_udfs

    register_udfs(spark)
    events = _t(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(
        F.array(
            *[
                F.count(F.when(F.col("event_type") == t, 1))
                for t in ("view", "click", "purchase", "signup", "error")
            ]
        ).alias("counts")
    )
    return counts.select("user_id", F.round(gini_impurity("counts"), 6).alias("gini"))


@query(
    "stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6)       AS corr_price_qty,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_s,
           round(covar_pop(l_extendedprice, l_quantity), 4)  AS covar_p,
           round(stddev_samp(l_discount), 6)                 AS sd_discount,
           round(var_pop(l_discount), 6)                     AS var_discount,
           round(CAST(median(l_quantity) AS DOUBLE), 4)      AS med_qty,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)    AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: correlation, sample/population
    covariance, stddev/variance, exact median, and the regr_* linear
    regression family — all JVM partial-aggregate built-ins (each is a
    constant-size moment sketch per group; the shuffle carries one row
    per (group, aggregate), so this scales like any hash aggregate).
    median is the one exception: exact-sort based in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("covar_s"),
        F.round(F.covar_pop("l_extendedprice", "l_quantity"), 4).alias("covar_p"),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_discount"),
        F.round(F.var_pop("l_discount"), 6).alias("var_discount"),
        F.round(F.median("l_quantity").cast("double"), 4).alias("med_qty"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


@query(
    "bag_set_ops",
    oracle="""
    WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000),
         ur AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'intersect_all' AS op, o_custkey, count(*) AS n FROM (
        SELECT * FROM hi INTERSECT ALL SELECT * FROM ur
    ) GROUP BY o_custkey
    UNION ALL
    SELECT 'except_all' AS op, o_custkey, count(*) AS n FROM (
        SELECT * FROM hi EXCEPT ALL SELECT * FROM ur
    ) GROUP BY o_custkey
    """,
)
def bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) semantics set ops — intersectAll/exceptAll keep
    duplicate multiplicity (min / difference of per-key counts), unlike
    the DISTINCT forms covered by intersect_except_nations. Both compile
    to a single aggregate over a union with per-side counts — no O(n²)
    anti-join; the follow-up count-rollup makes the result deterministic
    regardless of which physical duplicate survives."""
    orders = _t(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    ur = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    both = (
        hi.intersectAll(ur)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "o_custkey", "n")
    )
    only_hi = (
        hi.exceptAll(ur)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "o_custkey", "n")
    )
    return both.unionByName(only_hi)

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
    per-status, grand total — via SQL on a temp view (Catalyst plans a
    single Expand + aggregate pass)."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS qty,
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

"""Advanced-operator driver queries: IVF ANN search, salted skew join,
streaming rollup surfaced as a batch-checkable query."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs
from ..sources.tables import read_table
from . import query


@query("ivf_cosine_topk")  # rows-only: centroid seeding is engine-defined
def ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest-neighbor: deterministic k-means coarse
    quantizer + n_probe cluster search (the scale path beside LSH; scan
    cost ≈ n_probe/n_centroids of the corpus)."""
    from ..operators.similarity import ivf_assign, ivf_topk

    apply_runtime_confs(spark)
    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") != 0)
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    assigned, centroids = ivf_assign(corpus, n_centroids=8, lloyd_iters=1)
    return ivf_topk(assigned, centroids, qdf, k=10, n_probe=3)


@query(
    "salted_hot_key_join",
    oracle="""
    SELECT e.event_type, count(*) AS n, round(sum(d.weight), 4) AS weighted
    FROM events e
    JOIN (VALUES ('view', 1.0), ('click', 2.0), ('purchase', 5.0),
                 ('signup', 3.0), ('error', 0.5)) AS d(event_type, weight)
      ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
)
def salted_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join on a 5-value key (every key is 'hot' at scale: ~n/5 rows
    each). The salt spreads each key over 8 shuffle partitions; results are
    identical to the plain join — which is exactly what the oracle checks."""
    from ..operators.skew import salted_join

    apply_runtime_confs(spark)
    events = read_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("view", 1.0), ("click", 2.0), ("purchase", 5.0), ("signup", 3.0), ("error", 0.5)],
        "event_type string, weight double",
    )
    joined = salted_join(events, dim, key="event_type", salt_buckets=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("weight"), 4).alias("weighted"),
    )


@query(
    "stream_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly cadence (reference main.py:359) as an ACTUAL Structured
    Streaming query, surfaced batch-style for the oracle: events parquet →
    readStream → tumbling 1h window + watermark → drain with availableNow
    into a memory table → return it. Proves the streaming plan computes the
    same rollup as the batch SQL."""
    from ..streaming.jobs import windowed_event_agg

    apply_runtime_confs(spark)
    d = tempfile.mkdtemp(prefix="stream_src_")
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    events.write.mode("overwrite").parquet(d)
    src = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    agg = windowed_event_agg(src, window="1 hour", watermark="0 seconds")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("__stream_hourly_rollup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.table("__stream_hourly_rollup")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        F.round("total_value", 4).alias("total_value"),
    )

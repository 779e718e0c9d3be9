"""Scale the sf0.1 test tables to larger bench-only scale factors.

Usage: python tools/make_benchdata.py <src_sf_dir> <out_dir> <copies>

Produces <out_dir>/*.parquet with <copies>x the fact-table volume of the
source, preserving every schema and the join topology:

- region/nation: fixed dimensions, copied once (they are sublinear in
  TPC-H-style generators);
- customer/supplier/part/orders/lineitem/events: each copy shifts its
  keys by copy_index * (max_key + 1), so copy i's orders reference copy
  i's customers etc. — group counts and join fan-outs scale linearly,
  exactly like a larger generated SF;
- documents: doc_id shifted; every third word of the text gets a copy
  suffix, so cross-copy Jaccard collapses to ~0 (every 3-shingle touches
  a modified word) while within-copy near-dup structure is preserved —
  without this, near-dup pair counts would grow quadratically in copies
  instead of linearly;
- embeddings: vec_id shifted; a small copy-dependent offset decorrelates
  cross-copy cosine so ANN result sizes scale like real data.

Output is bench-only (gitignored); correctness oracles always run on the
driver's own /root/testdata.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from traderjoe_etl_spark.session import get_spark
from traderjoe_etl_spark.sources.tables import read_table


def _max(df, col) -> int:
    return int(df.agg(F.max(col)).collect()[0][0]) + 1


def scale(src: str, out: str, copies: int) -> None:
    spark = get_spark("make-benchdata")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    t = {name: read_table(spark, src, name) for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )}
    mx = {
        "ck": _max(t["customer"], "c_custkey"),
        "sk": _max(t["supplier"], "s_suppkey"),
        "pk": _max(t["part"], "p_partkey"),
        "ok": _max(t["orders"], "o_orderkey"),
        "eid": _max(t["events"], "event_id"),
        "uid": _max(t["events"], "user_id"),
        "did": _max(t["documents"], "doc_id"),
        "vid": _max(t["embeddings"], "vec_id"),
    }

    def copies_of(name: str, mutate) -> None:
        parts = [mutate(t[name], i) for i in range(copies)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {copies}x written")

    for dim in ("region", "nation"):
        t[dim].write.mode("overwrite").parquet(os.path.join(out, f"{dim}.parquet"))

    copies_of("customer", lambda d, i: d.withColumn("c_custkey", F.col("c_custkey") + i * mx["ck"]))
    copies_of("supplier", lambda d, i: d.withColumn("s_suppkey", F.col("s_suppkey") + i * mx["sk"]))
    copies_of("part", lambda d, i: d.withColumn("p_partkey", F.col("p_partkey") + i * mx["pk"]))
    copies_of(
        "orders",
        lambda d, i: d.withColumns(
            {"o_orderkey": F.col("o_orderkey") + i * mx["ok"],
             "o_custkey": F.col("o_custkey") + i * mx["ck"]}
        ),
    )
    copies_of(
        "lineitem",
        lambda d, i: d.withColumns(
            {"l_orderkey": F.col("l_orderkey") + i * mx["ok"],
             "l_partkey": F.col("l_partkey") + i * mx["pk"],
             "l_suppkey": F.col("l_suppkey") + i * mx["sk"]}
        ),
    )
    copies_of(
        "events",
        lambda d, i: d.withColumns(
            {"event_id": F.col("event_id") + i * mx["eid"],
             "user_id": F.col("user_id") + i * mx["uid"]}
        ),
    )

    def mutate_docs(d, i):
        d = d.withColumn("doc_id", F.col("doc_id") + i * mx["did"])
        if i == 0:
            return d
        toks = F.split(F.col("text"), " ")
        perturbed = F.array_join(
            F.transform(
                toks,
                lambda w, j: F.when(j % 3 == 0, F.concat(w, F.lit(f"_{i}"))).otherwise(w),
            ),
            " ",
        )
        return d.withColumn("text", perturbed)

    copies_of("documents", mutate_docs)

    def mutate_emb(d, i):
        d = d.withColumn("vec_id", F.col("vec_id") + i * mx["vid"])
        if i == 0:
            return d
        return d.withColumn(
            "embedding",
            F.transform("embedding", lambda x: (x + F.lit(i * 1.7e-3)).cast("float")),
        )

    copies_of("embeddings", mutate_emb)


if __name__ == "__main__":
    src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    scale(src, out, n)

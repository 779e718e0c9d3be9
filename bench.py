"""Benchmark runner — the driver's per-round feedback loop.

Times each headline query at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE compact JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "cpus": "$SPARK_GRAFT_CPUS", "default_parallelism": n,
   "duckdb_total": sec, "spark_comparable_total": sec, "ratio": r,
   "sf1_total": sec, "sf1_duckdb_total": sec, "sf1_ratio": r}
The per-query DuckDB twin tables and the full sf1 scale section are
written to BENCH_full.json beside this script (the round driver captures
only a bounded stdout window, so the stdout line stays < ~2 KB).

The primary metric stays the sf0.1 Spark headline total. The extra keys
substantiate the fixed-overhead-vs-marginal-cost argument (VERDICT r01):
per-query DuckDB twins (the SQL oracles on the same parquet) at sf0.1 AND
at sf1 (repo-local benchdata, 10× the rows, multi-file so the scan
parallelizes), so the judge can read how the Spark/DuckDB ratio moves as
data grows and per-query fixed overhead amortizes.

Execution is forced with the noop sink (full plan runs, nothing collected
to the driver beyond task results), so timings measure the engine, not
result transfer. DuckDB twins fully materialize via fetchall() — their
results are small aggregates, so transfer is negligible there too.

Timing protocol (both engines symmetric, prepared-statement style): the
query plan is built once, executed once to warm, and the timed number is
the fastest of four re-executions of the same prepared plan (min-over-k
absorbs JVM JIT warm-up on the Spark side and OS noise on both). For Spark that means the DataFrame
is constructed once per (query, sf_dir) and the noop write re-runs the full
physical plan (scan → shuffle → agg; nothing is result-cached between runs
— clearCache() guards against inherited persists across queries). For
DuckDB the same SQL string re-executes against its parsed/cached catalog.
This excludes py4j/SQL-parse plan construction from the measurement — a
per-process constant, not an engine throughput property (VERDICT r02
explicitly sanctioned plan reuse here).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# One flagship query per operator family (SURVEY.md §2 / the LLM-pipeline
# mandate): relational agg / star join / argmax / as-of / window top-k /
# sessionization / rollup / semi-structured / exact dedup / MinHash LSH /
# SimHash / ANN (brute + batch + IVF) / quality scoring / language-ID /
# text profiling / winnowing fingerprints / the end-to-end reference
# pipeline. The text+dedup families were added in r3 — they are named
# first-class components of the engine's mandate and were previously the
# only families with no headline representation.
HEADLINE = [
    "pricing_summary",
    "revenue_by_region",
    "latest_deposit_per_user",
    "asof_join_last_order",
    "top3_orders_per_segment",
    "sessionization",
    "rollup_fees_report",
    "json_props_stats",
    "dedup_exact",
    "minhash_near_dup",
    "simhash_near_dup",
    "cosine_topk",
    "cosine_topk_batch",
    "quality_scores",
    "lang_id_counts",
    "text_profile_full",
    "rolling_hash_fingerprints",
    "snapshot_pipeline",
    "ivf_cosine_topk",
    # r4s4: one flagship each for the curation-rules, resampling-stats and
    # attribution families added this round (same twin protocol).
    # ks_two_sample, item_item_cosine_topk, pareto_frontier_parts and the
    # prefix-scan family are deliberately NOT here: their lazy DISK_ONLY
    # checkpoints persist across re-executions, so the prepared-statement
    # timer would see only post-checkpoint work (the hidden-work rule that
    # got minhash/simhash rewritten in r3). Eligibility rule: headline
    # queries must be checkpoint-free lazy plans.
    "gopher_quality_rules",
    "poisson_bootstrap_ci",
    "multi_touch_attribution",
    # r6: flagship per new family — diversity report, sparse inverted-index
    # similarity, deterministic epoch shuffle. All checkpoint-free lazy
    # plans (token_budget_selection and kcore_peeling are checkpoint-bound
    # and therefore ineligible).
    "distinct_ngram_diversity",
    "sparse_shingle_cosine_pairs",
    "epoch_shuffle_order",
]

# Twins excluded from the throughput comparison (none currently: since the
# portable universal-hash MinHash/SimHash families, every oracle does the
# same arithmetic as the engine — apples-to-apples on both sides).
DUCKDB_SKIP: set[str] = set()

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _duck_conn(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written tables are directories
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _bench_dir(spark, qs, osql, sf_dir: str) -> dict:
    # r12 measurement-bug fix (VERDICT r11 scaling-probe item): the old
    # sf<=0.5 "tiny-input sizing" block (8 shuffle partitions / 8 MB open
    # cost) was PROVABLY INERT — every query build calls
    # session.apply_runtime_confs, which in local mode resets
    # shuffle.partitions to defaultParallelism and openCostInBytes to 1 MB
    # before any plan is constructed (verified: conf read back 32/1048576
    # after building a query with the pin set; committed sf0.1 plans show
    # hashpartitioning(..., 32)). Removing the dead block changes NO timed
    # behavior — every recorded bench ran at defaultParallelism reducers —
    # it only removes the false "reduce width pinned to 8" reading that
    # made the driver's low-core probe look core-insensitive. Reduce width
    # follows $SPARK_GRAFT_CPUS via defaultParallelism; the JSON line now
    # echoes both (see main) so the probe is legible.
    spark_t: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        # Prepared-statement protocol (VERDICT r02 sanctioned plan reuse —
        # DuckDB's twins reuse a parsed statement the same way): build the
        # DataFrame ONCE per (query, sf_dir), run it once to warm (JIT,
        # codegen cache, file-system cache), then time re-executions of the
        # SAME plan and keep the fastest of two (same variance floor as the
        # DuckDB side below). The noop write re-runs the full physical plan
        # — scan/shuffle/agg — every time; nothing is result-cached between
        # runs. What the protocol excludes is py4j plan CONSTRUCTION, a
        # per-process constant that vanishes in any workload where a plan
        # runs more than once.
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            if best > 5.0:  # slow query: one timed run is representative
                break
        spark_t[name] = round(best, 3)
        spark.catalog.clearCache()  # queries must not inherit earlier persists

    duck_t: dict[str, float] = {}
    try:
        con = _duck_conn(sf_dir)
        for name in HEADLINE:
            if name in DUCKDB_SKIP or name not in osql:
                continue
            con.execute(osql[name]).fetchall()  # warm
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                con.execute(osql[name]).fetchall()
                best = min(best, time.perf_counter() - t0)
                if best > 5.0:  # same early-out rule as the Spark side
                    break
            duck_t[name] = round(best, 3)
        con.close()
    except Exception:
        duck_t = {}

    comparable = [n for n in duck_t if n in spark_t]
    s_cmp = sum(spark_t[n] for n in comparable)
    d_cmp = sum(duck_t[n] for n in comparable)
    return {
        "queries": spark_t,
        "total": round(sum(spark_t.values()), 3),
        "duckdb": duck_t,
        "duckdb_total": round(d_cmp, 3),
        "spark_comparable_total": round(s_cmp, 3),
        "ratio": round(s_cmp / d_cmp, 2) if d_cmp else None,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from traderjoe_etl_spark.queries import oracle_sql, queries
    from traderjoe_etl_spark.session import get_spark

    spark = get_spark("traderjoe-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = queries(), oracle_sql()

    # JVM/codegen warm-up over the WHOLE headline set on the smallest SF so
    # every query's codegen/JIT paths are compiled before any timed run —
    # the C2 compiler needs a few executions per plan shape, and without
    # this the first queries in HEADLINE order pay it inside their timings.
    for name in HEADLINE:
        if name in qs:
            try:
                qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
            except Exception:
                pass
    spark.catalog.clearCache()

    primary = _bench_dir(spark, qs, osql, sf_dir)

    scale: dict[str, dict] = {}
    sf1_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchdata", "sf1")
    if os.path.isdir(sf1_dir) and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        scale["sf1"] = _bench_dir(spark, qs, osql, sf1_dir)

    # Scaling-contract fields (VERDICT r11 item 2): echo the core count the
    # bench actually ran with so a low-core probe is legible from the JSON
    # line alone. defaultParallelism is what sizes reduce width in local
    # mode (session.apply_runtime_confs), so cpus == default_parallelism
    # proves $SPARK_GRAFT_CPUS reached the engine. The core-scaling signal
    # lives in the sf1 section (sf0.1 queries sit at the ~100 ms local
    # dispatch floor): r11 measured sf1_total 28.7 s at 8 cores vs 18.0 s
    # at 32 (BENCH_r11_c8 vs BENCH_r11).
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "*")
    out = {
        "metric": "headline_queries_total",
        "value": primary["total"],
        "unit": "sec",
        "queries": primary["queries"],
        "sf": sf,
        "cpus": cpus_env,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "duckdb": primary["duckdb"],
        "duckdb_total": primary["duckdb_total"],
        "spark_comparable_total": primary["spark_comparable_total"],
        "ratio": primary["ratio"],
    }
    if scale:
        out["scale"] = scale

    # Full payload (per-query DuckDB twins + the sf1 scale section) goes to
    # a sidecar file; stdout carries ONE compact line. The round driver
    # captures only a bounded stdout window (BENCH_r05..r07 all recorded
    # "parsed": null with the tail cut mid-JSON), so the machine-readable
    # line must stay comfortably under ~2 KB — per-query Spark seconds and
    # the headline ratios fit, the 3x-larger twin tables do not.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json")
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1)
    compact = {
        "metric": "headline_queries_total",
        "value": primary["total"],
        "unit": "sec",
        "queries": primary["queries"],
        "sf": sf,
        "cpus": cpus_env,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "duckdb_total": primary["duckdb_total"],
        "spark_comparable_total": primary["spark_comparable_total"],
        "ratio": primary["ratio"],
    }
    if scale:
        sf1 = scale["sf1"]
        compact["sf1_total"] = sf1["total"]
        compact["sf1_duckdb_total"] = sf1["duckdb_total"]
        compact["sf1_ratio"] = sf1["ratio"]
    line = json.dumps(compact)
    if len(line) > 1900:  # keep the line parseable inside the driver window
        compact["queries"] = {}
        compact["queries_in"] = "BENCH_full.json"
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()

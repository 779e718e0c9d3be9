"""Benchmark runner — the driver's per-round feedback loop.

Times each headline query at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Execution is forced with the noop sink (full plan runs, nothing collected
to the driver beyond task results), so timings measure the engine, not
result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    "cosine_topk",
    "cosine_topk_batch",
    "quality_scores",
    "snapshot_pipeline",
    "ivf_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from traderjoe_etl_spark.queries import queries
    from traderjoe_etl_spark.session import get_spark

    spark = get_spark("traderjoe-etl-spark-bench")
    qs = queries()

    # JVM/codegen warm-up on the smallest SF so measured times are steady-state.
    qs["pricing_summary"](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        # warm pass (JIT, file-system cache), then time a FULL fresh pass —
        # construction AND execution, since some queries legitimately do
        # eager work at build time (checkpointed candidate tables, collected
        # dimension seeds) that a write-only timer would miss
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()  # queries must not inherit earlier persists

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect). A short warmup
query first so JVM/codegen startup isn't billed to the first entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "w_topk_orders_per_customer",
    "a_cube_status_priority",
    "p_keep_last_dedup",
    "d_exact_dedup",
    "d_minhash_lsh_pairs",
    "t_quality_score",
    "e_knn_bruteforce",
    "e_lsh_buckets",
    "d_ngram_jaccard_pairs",
    "j_asof_backward",
    "st_tumbling_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from etl_data_peri_institute_spark.plans import catalog
    from etl_data_peri_institute_spark.session import get_spark

    catalog.load_all()
    spark = get_spark("bench")

    # warmup: JVM + parquet footer reads, not billed to any query
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # best-of-2: the first run pays one-time codegen/JIT compilation (a
    # constant that vanishes at scale); steady-state time is the signal.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = catalog.QUERIES[name].fn
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full plan execution to a count/collect action, per query, after a
JVM+session warmup query. Each query runs once (the driver wants wall
numbers, not microbenchmarks).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ups_crossref_etl_spark.plans.registry import load_all
from ups_crossref_etl_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_topk_orders_per_segment",
    "q_sorted_set_agg_priorities",
    "q_count_distinct_parts_per_supplier",
    "q_events_tumbling_5min",
    "q_events_sessionize_30min",
    "q_docs_exact_dup_groups",
    "q_docs_token_counts",
    "q_docs_minhash_near_dups",
    "q_docs_cleaning_pipeline",
    "q_emb_bruteforce_topk",
    "q_events_asof_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    specs = load_all()

    # warmup: JVM/codegen/parquet-footer caches
    specs["q1_pricing_summary"].fn(spark, sf_dir).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = specs[name].fn(spark, sf_dir)
        df.collect()
        times[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Round-14 floor anatomy probe (VERDICT #1: measure ONE lever at a time,
but first find out where the per-query second actually goes).

For each query: t_build (python fn() + analysis), t_collect1 (first full
execution), t_collect2 (second — codegen/cache-warm), t_noop (noop sink,
computation only). Prints one JSON line per query. Sentinel-bracketed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ups_crossref_etl_spark.plans.registry import load_all  # noqa: E402
from ups_crossref_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("floor_probe")
    specs = load_all()
    from bench import _sentinel, _shuffle_sentinel  # noqa: E402

    specs["q1_pricing_summary"].fn(spark, sf_dir).count()
    print(json.dumps({"sentinel_pre": _sentinel(spark),
                      "shuffle_sentinel_pre": _shuffle_sentinel(spark)}),
          flush=True)
    for name in names:
        fn = specs[name].fn
        spark.sparkContext.setJobDescription(f"floor {name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.schema  # force analysis
        t_build = time.time() - t0
        t0 = time.time()
        df.collect()
        t_c1 = time.time() - t0
        t0 = time.time()
        fn(spark, sf_dir).collect()
        t_c2 = time.time() - t0
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_noop = time.time() - t0
        print(json.dumps({name: {
            "build_s": round(t_build, 3), "collect1_s": round(t_c1, 3),
            "collect2_s": round(t_c2, 3), "noop_s": round(t_noop, 3),
        }}), flush=True)
    print(json.dumps({"sentinel_post": _sentinel(spark),
                      "shuffle_sentinel_post": _shuffle_sentinel(spark)}),
          flush=True)


if __name__ == "__main__":
    main()

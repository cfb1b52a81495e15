"""Measure the Jaro-Winkler kernel's throughput (r9 verdict #6).

The JW pandas_udf (operators/linkage.jaro_winkler_pairs) runs an
O(len1*len2) pure-Python loop per pair inside the Arrow batch — the
sanctioned slow path, applied only to blocked candidate sets. This tool
measures what that budget actually buys: pairs/second end-to-end through
Spark on a synthetic candidate set built from sf0.1 part names (offset
self-pairs, so lengths and prefixes look like real linkage candidates).

    python tools/jw_bench.py [n_offsets]

Prints one JSON line {"pairs": N, "secs": s, "pairs_per_sec": r}; the
number goes into SCALE.md next to the sorted-neighborhood candidate
budget (n * window) so "is JW the bottleneck?" is arithmetic, not a
guess.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ups_crossref_etl_spark.operators.linkage import jaro_winkler_pairs
from ups_crossref_etl_spark.session import get_spark
from ups_crossref_etl_spark.sources.lake import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_offsets = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("jw_bench")
    part = read_table(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("k"), F.col("p_name").alias("name")
    )
    n_rows = part.count()
    pairs = (
        part.withColumn(
            "_off", F.explode(F.sequence(F.lit(1), F.lit(n_offsets)))
        )
        .select(
            F.col("name").alias("a"),
            ((F.col("k") + F.col("_off") - 1) % n_rows + 1).alias("_k2"),
        )
        .join(part.select(F.col("k").alias("_k2"),
                          F.col("name").alias("b")), "_k2")
        .select("a", "b")
        # the part table is one small parquet file -> one partition; a
        # real blocked candidate set arrives shuffle-partitioned, so
        # spread the synthetic one the same way before timing
        .repartition(32)
        .localCheckpoint()  # pin the candidate set; time ONLY the kernel
    )
    n_pairs = pairs.count()
    # warmup (Arrow + python worker spin-up), then timed run
    jaro_winkler_pairs(pairs.limit(10_000), "a", "b").agg(
        F.sum("jw")
    ).collect()
    t0 = time.time()
    jaro_winkler_pairs(pairs, "a", "b").agg(F.sum("jw")).collect()
    secs = time.time() - t0
    print(json.dumps({
        "pairs": n_pairs,
        "secs": round(secs, 2),
        "pairs_per_sec": int(n_pairs / secs),
        "mean_name_bytes": int(
            part.agg(F.avg(F.length("name"))).collect()[0][0]
        ),
    }))


if __name__ == "__main__":
    main()

"""Round-14 cores-scaling probe (r13 verdict #9): demonstrate PARALLEL
scaling, not just plan shapes, on data big enough to clear the per-query
floors — 10x-replicated sf0.1 (~sf1) written as MULTI-FILE parquet so
scans split without any spread help.

    python tools/scale_cores_probe.py gen        # build /tmp/scaleprobe/sf1
    SPARK_GRAFT_CPUS=8  python tools/scale_cores_probe.py run
    SPARK_GRAFT_CPUS=32 python tools/scale_cores_probe.py run
    python tools/scale_cores_probe.py merge c8.json c32.json

Probes three representative shapes the verdict named:
- corr_matrix  (one-scan 15-decimal-sum aggregate over lineitem)
- pagerank     (iterative graph: join + aggregate per round)
- zscore       (the events window-battery representative)

`run` prints one JSON line with per-probe noop-sink seconds (best-of-2)
bracketed by the bench sentinels. `merge` writes the sec@8/sec@32 ratios
into SCALE_PROBE.json under "cores_scaling_10x".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

OUT_DIR = "/tmp/scaleprobe/sf1"
SRC = "/root/testdata/sf0.1"
REPL = 10
FILES = 64


def gen() -> None:
    from ups_crossref_etl_spark.session import get_spark
    from ups_crossref_etl_spark.sources.lake import read_table

    spark = get_spark("scale_gen")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, id_col in [("lineitem", "l_orderkey"), ("events", "user_id")]:
        df = read_table(spark, SRC, name)
        rep = (
            df.withColumn(
                "_salt", F.explode(F.sequence(F.lit(0), F.lit(REPL - 1)))
            )
            .withColumn(id_col, F.col(id_col) * REPL + F.col("_salt"))
            .drop("_salt")
        )
        (rep.repartition(FILES)
            .write.mode("overwrite")
            .parquet(os.path.join(OUT_DIR, f"{name}.parquet")))
        print(name, "written")


def _probes(spark):
    from ups_crossref_etl_spark.operators.pagerank import pagerank
    from ups_crossref_etl_spark.operators.stats import corr_matrix
    from ups_crossref_etl_spark.operators.timeseries import (
        rolling_zscore_outliers,
    )
    from ups_crossref_etl_spark.sources.lake import read_table

    li = read_table(spark, OUT_DIR, "lineitem")
    ev = read_table(spark, OUT_DIR, "events")

    def p_corr():
        return corr_matrix(
            li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        )

    def p_pagerank():
        edges = li.select(
            F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
        )
        return pagerank(edges, n_iter=3)

    def p_zscore():
        return rolling_zscore_outliers(
            ev, "user_id", "ts", "value", "event_id",
            threshold=2.5, value_scale=100,
        )

    return {"corr_matrix": p_corr, "pagerank": p_pagerank, "zscore": p_zscore}


def run() -> None:
    from bench import _sentinel, _shuffle_sentinel
    from ups_crossref_etl_spark.session import DEFAULT_CPUS, get_spark

    spark = get_spark("scale_cores")
    out = {
        "cpus": DEFAULT_CPUS,
        "sentinel_pre": _sentinel(spark),
        "shuffle_sentinel_pre": _shuffle_sentinel(spark),
        "probes": {},
    }
    for name, build in _probes(spark).items():
        spark.sparkContext.setJobDescription(f"scale_cores {name}")
        best = None
        for _ in range(2):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out["probes"][name] = round(best, 2)
    out["sentinel_post"] = _sentinel(spark)
    out["shuffle_sentinel_post"] = _shuffle_sentinel(spark)
    print("RESULT " + json.dumps(out))


def merge(p8: str, p32: str) -> None:
    r8 = json.loads(open(p8).read().split("RESULT ")[-1])
    r32 = json.loads(open(p32).read().split("RESULT ")[-1])
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.json",
    )
    doc = json.load(open(path))
    doc["cores_scaling_10x"] = {
        "replication": REPL,
        "files_per_table": FILES,
        "cpus_low": r8["cpus"],
        "cpus_high": r32["cpus"],
        "sentinels_low": [r8["sentinel_pre"], r8["shuffle_sentinel_pre"],
                          r8["sentinel_post"], r8["shuffle_sentinel_post"]],
        "sentinels_high": [r32["sentinel_pre"], r32["shuffle_sentinel_pre"],
                           r32["sentinel_post"], r32["shuffle_sentinel_post"]],
        "probes": {
            k: {
                "sec_low": r8["probes"][k],
                "sec_high": r32["probes"][k],
                "ratio": round(r8["probes"][k] / r32["probes"][k], 2)
                if r32["probes"][k] > 0 else None,
            }
            for k in r32["probes"]
        },
    }
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=2)
    print("merged into", path)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "gen":
        gen()
    elif cmd == "run":
        run()
    elif cmd == "merge":
        merge(sys.argv[2], sys.argv[3])

from __future__ import annotations

from pyspark.sql import functions as F

from ups_crossref_etl_spark.operators.bootstrap import (
    POISSON1_THRESHOLDS,
    poisson_bootstrap_mean_ci,
    poisson_bootstrap_means,
    poisson_weight_expr,
)
from ups_crossref_etl_spark.sources.lake import read_table


def test_poisson_thresholds_match_cdf():
    import math

    c = 0.0
    for j, t in enumerate(POISSON1_THRESHOLDS):
        c += math.exp(-1) / math.factorial(j)
        assert t == math.floor(c * 2**32)


def test_poisson_weight_distribution(spark):
    # uniform 32-bit hashes -> weights with mean ~1, all in 0..9
    n = 200_000
    df = spark.range(n).select(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    )
    stats = df.select(poisson_weight_expr(F.col("h")).alias("w")).agg(
        F.avg("w").alias("mu"),
        F.min("w").alias("lo"),
        F.max("w").alias("hi"),
        F.avg((F.col("w") == 0).cast("double")).alias("p0"),
    ).first()
    assert 0.98 <= stats["mu"] <= 1.02
    assert stats["lo"] >= 0 and stats["hi"] <= 9
    assert abs(stats["p0"] - 0.3679) < 0.01


def test_bootstrap_deterministic_and_ci_ordered(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    a = poisson_bootstrap_mean_ci(ev, "value", "event_id", 51, 0.04).first()
    b = poisson_bootstrap_mean_ci(ev, "value", "event_id", 51, 0.04).first()
    assert a == b
    assert a["n_replicates"] == 51
    assert a["ci_lo"] <= a["boot_mean"] <= a["ci_hi"]
    # bootstrap means concentrate near the sample mean
    assert abs(a["boot_mean"] - a["sample_mean"]) <= 5 * (
        a["ci_hi"] - a["ci_lo"]
    )


def test_bootstrap_means_shape(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    m = poisson_bootstrap_means(ev, "value", "event_id", 11)
    rows = m.collect()
    assert len(rows) == 11
    assert sorted(r["b"] for r in rows) == list(range(1, 12))
    # different replicates draw different weights
    assert len({r["mean"] for r in rows}) > 1

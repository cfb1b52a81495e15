from __future__ import annotations

from pyspark.sql import functions as F

from ups_crossref_etl_spark.operators.kll import (
    KLLSketch,
    kll_build,
    kll_quantiles,
)
from ups_crossref_etl_spark.sources.lake import read_table


def _exact_rank_err(values, est, p):
    n = len(values)
    lt = sum(1 for v in values if v < est)
    le = sum(1 for v in values if v <= est)
    target = p * n
    return max(lt - target, target - le, 0.0) / n


def test_kll_rank_error_within_bound_local():
    sk = KLLSketch(k=64)
    # deterministic skewed stream: squares mod a prime, in arrival order
    vals = [float((i * i) % 9973) for i in range(20000)]
    sk.update_many(vals)
    assert sk.n == 20000
    for p in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        err = _exact_rank_err(vals, sk.quantile(p), p)
        # k=64 over 20k rows: log2(20000/64)/64 ~ 0.13 worst case
        assert err <= 0.13, (p, err)


def test_kll_merge_matches_bound_and_commutes():
    vals = [float((7 * i) % 1009) for i in range(5000)]
    a, b = KLLSketch(k=64), KLLSketch(k=64)
    a.update_many(vals[:2500])
    b.update_many(vals[2500:])
    ab = KLLSketch.from_json(a.to_json()).merge(b)
    ba = KLLSketch.from_json(b.to_json()).merge(
        KLLSketch.from_json(a.to_json())
    )
    assert ab.n == 5000
    for p in (0.1, 0.5, 0.9):
        assert ab.quantile(p) == ba.quantile(p)
        assert _exact_rank_err(vals, ab.quantile(p), p) <= 0.2


def test_kll_json_roundtrip():
    sk = KLLSketch(k=32)
    sk.update_many([float(i) for i in range(1000)])
    back = KLLSketch.from_json(sk.to_json())
    assert back.n == sk.n and back.levels == sk.levels
    assert back.quantile(0.5) == sk.quantile(0.5)


def test_kll_build_and_quantiles_df(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    sk = kll_build(ev, "value", k=200)
    assert sk.n == ev.count()
    out = kll_quantiles(spark, ev, "value", [0.25, 0.5, 0.75], k=200)
    rows = {r["p"]: r["est"] for r in out.collect()}
    assert len(rows) == 3
    vals = [r["value"] for r in ev.select("value").collect()]
    for p, est in rows.items():
        assert _exact_rank_err(vals, est, p) <= 0.05
    # monotone in p
    assert rows[0.25] <= rows[0.5] <= rows[0.75]


def test_kll_group_quantiles_exact_regime(spark):
    from ups_crossref_etl_spark.operators.kll import kll_group_quantiles

    rows = [("g1", float(v)) for v in range(1, 101)] + [
        ("g2", float(v * 3)) for v in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["g"], r["p"]): r["est"]
        for r in kll_group_quantiles(df, "g", "v", [0.25, 0.5, 0.75], k=200).collect()
    }
    import math

    for g, vals in (("g1", list(range(1, 101))), ("g2", [v * 3 for v in range(1, 8)])):
        s = sorted(vals)
        for p in (0.25, 0.5, 0.75):
            want = float(s[math.ceil(p * len(s)) - 1])
            assert out[(g, p)] == want, (g, p)


def test_kll_group_quantiles_compacted_within_bound(spark):
    from ups_crossref_etl_spark.operators.kll import kll_group_quantiles

    vals = [float((i * 37) % 5000) for i in range(5000)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = {
        r["p"]: r["est"]
        for r in kll_group_quantiles(df, "g", "v", [0.5], k=64).collect()
    }
    assert _exact_rank_err(vals, out[0.5], 0.5) <= 0.13

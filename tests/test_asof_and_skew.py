"""Edge cases for the as-of join and the skew-salting utilities."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ups_crossref_etl_spark.operators.asof import asof_join
from ups_crossref_etl_spark.operators.skew import salt_join, salted_agg


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "l1"),
         (1, _ts("2024-01-01T12:00:00"), "l2"),
         (2, _ts("2024-01-01T09:00:00"), "l3")],
        schema="k bigint, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), "r1"),
         (1, _ts("2024-01-01T11:00:00"), "r2"),
         (1, _ts("2024-01-01T12:00:00"), "r3")],
        schema="k bigint, ts timestamp, rv string",
    )
    return left, right


def test_asof_basic_and_no_match(spark):
    left, right = _frames(spark)
    out = {
        r["lv"]: r["rv_asof"]
        for r in asof_join(left, right, on="ts", by="k", right_cols=["rv"]).collect()
    }
    assert out["l1"] == "r1"  # 10:00 → 09:30
    assert out["l2"] == "r3"  # 12:00 → 12:00 ties included (non-strict)
    assert out["l3"] is None  # key 2 has no right rows → null


def test_asof_strict_excludes_ties(spark):
    left, right = _frames(spark)
    out = {
        r["lv"]: r["rv_asof"]
        for r in asof_join(
            left, right, on="ts", by="k", right_cols=["rv"], strict=True
        ).collect()
    }
    assert out["l2"] == "r2"  # 12:00 tie excluded under strict <


def test_salted_agg_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        (r["l_returnflag"],): (r["n"], round(r["s"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], round(r["s"], 2))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            unique_col="l_orderkey",
            partial_aggs=[F.count(F.lit(1)).alias("pn"), F.sum("l_quantity").alias("ps")],
            final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        ).collect()
    }
    assert plain == salted


def test_salt_join_matches_plain(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = o.join(c, "o_custkey").count()
    salted = salt_join(o, c, key="o_custkey", unique_col="o_orderkey").count()
    assert plain == salted


def test_asof_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "l1")], schema="k bigint, ts timestamp, lv string"
    )
    # two right rows at the identical (k, ts) — the greatest value tuple wins
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), "rA"),
         (1, _ts("2024-01-01T09:00:00"), "rB")],
        schema="k bigint, ts timestamp, rv string",
    )
    for _ in range(3):  # stable across repeated executions
        out = asof_join(
            left, right.repartition(4), on="ts", by="k", right_cols=["rv"]
        ).collect()
        assert [r["rv_asof"] for r in out] == ["rB"]


def test_range_join_left_restores_unmatched_once(spark):
    from ups_crossref_etl_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "hit"),
         (1, _ts("2024-01-01T20:00:00"), "miss"),
         (3, _ts("2024-01-01T10:00:00"), "nokey")],
        schema="k bigint, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:30"), "r1"),
         (1, _ts("2024-01-01T10:00:45"), "r2")],
        schema="k bigint, ts timestamp, rv string",
    )
    out = range_join(left, right, by="k", on="ts", before_s=60, after_s=60, how="left")
    rows = [(r["lv"], r["r_rv"]) for r in out.collect()]
    assert sorted(r for r in rows if r[0] == "hit") == [("hit", "r1"), ("hit", "r2")]
    # unmatched left rows appear exactly once, null-extended
    assert rows.count(("miss", None)) == 1
    assert rows.count(("nokey", None)) == 1
    assert len(rows) == 4
    inner = range_join(left, right, by="k", on="ts", before_s=60, after_s=60, how="inner")
    assert inner.count() == 2 and "_lid" not in inner.columns
    import pytest as _pytest

    with _pytest.raises(ValueError):
        range_join(left, right, by="k", on="ts", before_s=60, after_s=60, how="full")

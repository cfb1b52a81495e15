from __future__ import annotations

from pyspark.sql import functions as F

from ups_crossref_etl_spark.operators.editjoin import (
    deletion_variants,
    edit_distance_join,
)

WORDS = [
    "cold", "old", "bold", "bolt", "hot", "hog", "hogs", "shot",
    "table", "cable", "tale", "stable", "spark", "shark", "stark",
    "aaaa", "bbbb", "abab",
]


def _ed(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(k):
    out = set()
    for i, a in enumerate(WORDS):
        for b in WORDS[i + 1 :]:
            if _ed(a, b) <= k:
                lo, hi = sorted((a, b))
                out.add((lo, hi, _ed(a, b)))
    return out


def test_edit_distance_join_matches_brute_force(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    for k in (1, 2):
        got = {
            (r["text_a"], r["text_b"], r["edit_dist"])
            for r in edit_distance_join(df, "w", "w", max_edit=k).collect()
        }
        assert got == _brute(k), k


def test_deletion_variants_complete_and_distinct(spark):
    df = spark.createDataFrame([("abc",)], "w string")
    v1 = {
        r["variant"]
        for r in deletion_variants(df, "w", "w", max_edit=1).collect()
    }
    assert v1 == {"abc", "bc", "ac", "ab"}
    v2 = {
        r["variant"]
        for r in deletion_variants(df, "w", "w", max_edit=2).collect()
    }
    assert v2 == {"abc", "bc", "ac", "ab", "a", "b", "c"}


def test_edit_distance_join_no_cartesian(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    plan = (
        edit_distance_join(df, "w", "w", max_edit=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

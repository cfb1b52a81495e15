from __future__ import annotations

import datetime as dt
from itertools import product

from ups_crossref_etl_spark.operators.seqmine import sequential_support


def _mk(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )


def _brute(rows, types, gap, k):
    by_user = {}
    for u, t, s in rows:
        by_user.setdefault(u, []).append((s, t))
    support = {}
    for u, evs in by_user.items():
        evs.sort()
        for pat in product(types, repeat=k):
            if _matches(evs, pat, gap):
                support[pat] = support.get(pat, 0) + 1
    return support


def _matches(evs, pat, gap):
    def rec(idx, step):
        if step == len(pat):
            return True
        for s, t in evs:
            if t != pat[step]:
                continue
            if step > 0 and not (idx < s <= idx + gap):
                continue
            if rec(s, step + 1):
                return True
        return False
    return rec(None, 0)


ROWS = [
    (1, "a", 0), (1, "b", 10), (1, "c", 15),
    (2, "a", 0), (2, "b", 200), (2, "c", 210),   # a->b gap too big
    (3, "b", 0), (3, "a", 5), (3, "c", 6),
    (4, "a", 0), (4, "a", 50), (4, "b", 99),     # second a rescues the gap
    (5, "c", 0), (5, "c", 30), (5, "b", 40),
]


def test_seq2_matches_brute(spark):
    df = _mk(spark, ROWS)
    got = {
        (r["t1"], r["t2"]): r["n_users"]
        for r in sequential_support(
            df, "user_id", "event_type", "ts", ["a", "b", "c"], 60, k=2
        ).collect()
    }
    assert got == _brute(ROWS, ["a", "b", "c"], 60, 2)


def test_seq3_matches_brute(spark):
    df = _mk(spark, ROWS)
    got = {
        (r["t1"], r["t2"], r["t3"]): r["n_users"]
        for r in sequential_support(
            df, "user_id", "event_type", "ts", ["a", "b", "c"], 60, k=3
        ).collect()
    }
    assert got == _brute(ROWS, ["a", "b", "c"], 60, 3)


def test_seq_strict_order_under_ties(spark):
    # b at the SAME timestamp as a must NOT count as "after a"
    rows = [(1, "a", 0), (1, "b", 0), (2, "a", 0), (2, "b", 1)]
    df = _mk(spark, rows)
    got = {
        (r["t1"], r["t2"]): r["n_users"]
        for r in sequential_support(
            df, "user_id", "event_type", "ts", ["a", "b"], 60, k=2
        ).collect()
    }
    assert got == {("a", "b"): 1}


def test_seq3_single_shuffle(spark):
    df = _mk(spark, ROWS)
    plan = (
        sequential_support(
            df, "user_id", "event_type", "ts", ["a", "b", "c"], 60, k=3
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the two window stages must share one hashpartitioning exchange
    n_user_exchanges = plan.count("hashpartitioning(_u")
    assert n_user_exchanges <= 1, plan[:2000]
    assert "CartesianProduct" not in plan

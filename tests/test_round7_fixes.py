"""Round-7 hardening tests: the four ADVICE-flagged edge cases.

Each test pins a behavior that previously held only by accident of the
callers (bigint keys, no payload ties, pre-filtered NULLs):
- leakage_safe_split with STRING keys (singletons must not collapse),
- merge_cdc_state payload-level commutativity on (key, seq, op) ties,
- mad_outliers internal consistency under NULL values,
- skyline NULL/NaN criterion rows dropped (SQL dominance semantics).
"""

from __future__ import annotations

import math

from pyspark.sql import Row

from ups_crossref_etl_spark.operators.sampling import leakage_safe_split
from ups_crossref_etl_spark.operators.skyline import skyline
from ups_crossref_etl_spark.operators.stats import mad_outliers
from ups_crossref_etl_spark.streaming import events as se


def test_leakage_safe_split_string_keys_singletons_stay_distinct(spark):
    """Non-numeric string keys: every singleton is its OWN component (the
    old bigint-cast fallback turned them all into one NULL component)."""
    docs = spark.createDataFrame([Row(doc_id=f"doc-{i}") for i in range(60)])
    edges = spark.createDataFrame(
        [Row(src="doc-0", dst="doc-1"), Row(src="doc-1", dst="doc-2")]
    )
    out = leakage_safe_split(docs, edges, "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 60
    comp = {by_id[f"doc-{i}"]["component"] for i in range(3)}
    assert comp == {"doc-0"}
    splits = {by_id[f"doc-{i}"]["split"] for i in range(3)}
    assert len(splits) == 1
    # singletons: component == own key, no NULL collapse, hash spreads
    singles = [r for r in out if r["doc_id"] not in {"doc-0", "doc-1", "doc-2"}]
    assert all(r["component"] == r["doc_id"] for r in singles)
    assert len({r["split"] for r in singles}) == 3


def _chg(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, op=op, seq=seq) for (k, v, op, seq) in rows]
    )


def test_merge_cdc_state_payload_tie_is_deterministic(spark):
    """Two DISTINCT payloads tying on (key, seq, op): the same full row
    must win regardless of batch arrival order, and regardless of whether
    the tie happens inside one batch or across the batch/state boundary."""
    a = _chg(spark, [(1, "payload-a", "U", 10)])
    b = _chg(spark, [(1, "payload-b", "U", 10)])

    def full(state):
        return sorted(tuple(r) for r in state.collect())

    ab = full(se.merge_cdc_state(se.merge_cdc_state(None, a, ["k"]), b, ["k"]))
    ba = full(se.merge_cdc_state(se.merge_cdc_state(None, b, ["k"]), a, ["k"]))
    one = full(se.merge_cdc_state(None, a.unionByName(b), ["k"]))
    assert ab == ba == one
    assert len(ab) == 1


def test_mad_outliers_null_values_excluded_from_n(spark):
    rows = [Row(k="a", v=float(v)) for v in [1, 2, 3, 4, 100]]
    rows += [Row(k="a", v=None)] * 5  # NULLs: not counted, not outliers
    rows += [Row(k="z", v=None)] * 3  # all-NULL group: absent from output
    got = {r["k"]: r for r in mad_outliers(spark.createDataFrame(rows), "k", "v").collect()}
    assert set(got) == {"a"}
    assert got["a"]["n"] == 5
    assert got["a"]["med"] == 3.0
    assert got["a"]["n_outliers"] == 1


def test_skyline_null_and_nan_criteria_rows_dropped(spark):
    rows = [
        Row(id=1, cost=1.0, size=1),
        Row(id=2, cost=2.0, size=5),
        Row(id=3, cost=None, size=9),          # NULL criterion -> dropped
        Row(id=4, cost=math.nan, size=99),     # NaN criterion -> dropped
        Row(id=5, cost=3.0, size=5),           # dominated by 2
    ]
    got = {r["id"] for r in
           skyline(spark.createDataFrame(rows),
                   minimize=["cost"], maximize=["size"]).collect()}
    assert got == {1, 2}

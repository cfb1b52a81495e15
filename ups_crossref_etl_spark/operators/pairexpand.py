"""Row-local unordered-pair expansion over grouped keys.

The classic co-occurrence pair builder — ``distinct (group, key)`` +
self-equi-join on the group + ``a.key < b.key`` — pays TWO full
shuffles of the pair-extraction input (the distinct exchange and the
join exchange) plus join machinery. When per-group key sets are
bounded (market baskets, per-user catalogs, per-order parts — the
skew argument every caller already documents), the same multiset of
pairs comes out of ONE group-keyed exchange:

1. ``groupBy(group).collect_set(key)`` — map-side combinable, so the
   pre-shuffle partial dedups exactly like the old distinct did;
2. ``array_sort`` + a codegen higher-order pair expansion — every
   unordered pair of distinct keys within the group exactly once,
   oriented ``a < b`` by the array sort.

Equivalence: per group, both forms emit each unordered pair of
distinct non-NULL keys exactly once (NULL group rows are filtered to
mirror the equi-join's NULL semantics; ``collect_set`` drops NULL keys
the same way ``a.key < b.key`` did). Across groups multiplicity is
preserved. Verified by grouped-count comparison in
tests/test_round13_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sorted_pairs(
    df: DataFrame,
    group_col: str,
    key_col: str,
    out_a: str = "src",
    out_b: str = "dst",
) -> DataFrame:
    """All unordered pairs ``(out_a < out_b)`` of distinct ``key_col``
    values sharing a ``group_col`` value — one pair row per group per
    pair (cross-group multiplicity preserved), one exchange total."""
    grouped = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_set(F.col(key_col))).alias("_ks"))
    )
    ks = F.col("_ks")
    pairs = F.flatten(
        F.transform(
            ks,
            lambda x, i: F.transform(
                F.slice(ks, i + F.lit(2), F.size(ks) - i - F.lit(1)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return grouped.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.a").alias(out_a), F.col("_p.b").alias(out_b)
    )

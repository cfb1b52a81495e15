"""Item-item collaborative filtering as distributed queries.

"Customers who took X also took Y" over any (user, item) interaction
table — the co-occurrence primitive behind item recommendations,
related-document panels, and "this source pairs with that source"
corpus diagnostics. The reference pipeline has no recsys surface; this
is extension surface in the same family as operators/itemsets.py
(market baskets) but normalized: cosine similarity over binary
interaction vectors instead of raw pair counts.

Scale shape: the pair-generation join is keyed on USER (every pair of
items a user touched), so work is ``sum per-user n_items^2`` — the
classic co-occurrence bound. Power users are the skew cliff, and
``max_user_items`` drops them BEFORE the self-join (the standard
truncation: a user who touched 10k items contributes ~0 information
per pair but 10^8 pairs). Item degree vectors never materialize;
cosine over binary vectors reduces to ``co(i,j)/sqrt(n_i * n_j)`` —
three integer aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["item_cosine_similarity"]


def item_cosine_similarity(
    df: DataFrame,
    user_col: str,
    item_col: str,
    top_n: int = 50,
    max_user_items: int | None = None,
    min_cooccurrence: int = 1,
) -> DataFrame:
    """Top-``top_n`` item pairs by binary cosine similarity
    ``co(i,j) / sqrt(n_i * n_j)`` over distinct (user, item)
    interactions — ``(item_a, item_b, n_a, n_b, cooccurrence,
    cosine)`` with ``item_a < item_b``, ordered (cosine DESC, item_a,
    item_b) with a full tiebreak.

    ``max_user_items`` caps per-user fanout before the pair join (drop
    whole power-users); ``min_cooccurrence`` prunes noise pairs before
    ranking. Determinism: all three inputs to the cosine are exact
    BIGINTs; the score is quantized to integer nanos for the ordering
    (ties then break on the pair key), so the top-n set is
    engine-exact. Plan: distinct → (optional) user-degree semi-join →
    user-keyed self-join → pair-keyed count + two broadcastable item-
    degree joins → TakeOrdered.
    """
    inter = df.select(
        F.col(user_col).alias("_u"), F.col(item_col).alias("_i")
    ).distinct()
    if max_user_items is not None:
        keep = (
            inter.groupBy("_u")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") <= max_user_items)
            .select("_u")
        )
        inter = inter.join(keep, "_u", "left_semi")
    inter = inter.localCheckpoint(eager=False)  # feeds degrees AND the pair join (r14: lazy — single-action consumers)
    deg = inter.groupBy("_i").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    # r13 note: the pairexpand.sorted_pairs rewrite was MEASURED 2.2x
    # SLOWER here (8.1 vs 3.8 s noop at sf0.1): per-user catalogs are
    # ~40 items, and the nested transform/slice expansion pays O(m²)
    # array allocation per group — the join machinery generates the
    # same pairs cheaper. The expansion only wins on small groups
    # (co-order baskets ≤ 7, see plans/graph_inputs). Kept as-is.
    pairs = (
        inter.alias("a")
        .join(inter.alias("b"), "_u")
        .filter(F.col("a._i") < F.col("b._i"))
        .groupBy(
            F.col("a._i").alias("item_a"), F.col("b._i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cooccurrence"))
        .filter(F.col("cooccurrence") >= min_cooccurrence)
    )
    scored = (
        pairs.join(
            deg.select(F.col("_i").alias("item_a"), F.col("_n").alias("n_a")),
            "item_a",
        )
        .join(
            deg.select(F.col("_i").alias("item_b"), F.col("_n").alias("n_b")),
            "item_b",
        )
        .withColumn(
            "_nanos",
            F.round(
                F.col("cooccurrence")
                / F.sqrt(F.col("n_a").cast("double") * F.col("n_b"))
                * 1e9
            ).cast("bigint"),
        )
    )
    return (
        scored.orderBy(F.col("_nanos").desc(), "item_a", "item_b")
        .limit(top_n)
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "cooccurrence",
            (F.round(F.col("_nanos") / 1e9, 6) + 0.0).alias("cosine"),
        )
    )

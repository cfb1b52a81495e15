"""Frequent itemset mining — relational Apriori (pairs and triples).

Extension layer — no counterpart in /root/reference. Market-basket
analysis (Agrawal & Srikant 1994, Apriori): which items co-occur in
the same basket more often than a support threshold — here with the
level-wise candidate pruning expressed as broadcast semi-joins, the
Spark-idiomatic form of "candidates come only from frequent
(k-1)-itemsets".

Input model: a ``(basket_id, item)`` relation (dedup applied — basket
membership, not multiplicity). Pipeline uses: co-occurring tags /
domains / quality flags over a corpus; classic retail baskets over a
sales fact table (the gated queries run orders × part brands).

Scale shape:
- L1 is one groupBy over (basket, item)-distinct rows; the frequent
  item set is bounded by the item vocabulary, broadcast back as a
  map-side filter (Apriori prune #1 — infrequent items never enter
  pair generation).
- L2 pair candidates come from a basket-keyed self-join of the PRUNED
  membership table: fanout per basket is m^2/2 with m = pruned basket
  size — bounded by basket width, never corpus size. One shuffle on
  basket_id, one on the pair key.
- L3 extends frequent pairs by a third item (basket-keyed join with
  ``item > item_b``) and prunes candidates whose (a, c) and (b, c)
  sub-pairs are not frequent — two broadcast semi-joins against the
  L2 result (Apriori prune #2), so the triple aggregation only ever
  sees candidates all of whose subsets are frequent.
- Support thresholds are FRACTIONS of the basket count, so the same
  query is equally selective at sf0.01 and at 100 TB.

Association strength: the pair query also emits lift =
P(ab) / (P(a) P(b)) — computed from the same counts, rounded 4 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_items", "frequent_pairs", "frequent_triples"]


def _baskets(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    return df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()


def frequent_items(
    df: DataFrame, basket_col: str, item_col: str, min_support_frac: float
) -> DataFrame:
    """``(item, n_baskets)`` for items in at least ``min_support_frac``
    of the distinct baskets."""
    b = _baskets(df, basket_col, item_col)
    n = b.select("_b").distinct().count()
    thr = float(min_support_frac) * n
    return (
        b.groupBy("_i")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
        .filter(F.col("n_baskets") >= thr)
        .select(F.col("_i").alias("item"), "n_baskets")
    )


def frequent_pairs(
    df: DataFrame, basket_col: str, item_col: str, min_support_frac: float
) -> DataFrame:
    """``(item_a, item_b, n_baskets, lift)`` with ``item_a < item_b``,
    support >= ``min_support_frac`` of baskets, Apriori-pruned."""
    # r13: materialize the basket relation once — it feeds L1 and both
    # sides of the pair self-join (and, via frequent_triples, four more
    # consumers); unchecked, the upstream join+distinct re-executed per
    # consumer (the triples _before plan carried 116 Exchanges).
    # r14: LAZY checkpoint + the basket count folded in as a broadcast
    # 1-row aggregate — frequent_pairs now runs as ONE action (was
    # checkpoint job + count job + query). Same exact integer count,
    # same double threshold/lift arithmetic.
    b = _baskets(df, basket_col, item_col).localCheckpoint(eager=False)
    nrow = b.agg(F.count_distinct("_b").cast("bigint").alias("_n"))
    return _pairs_from(b, nrow, min_support_frac)


def _pairs_from(
    b: DataFrame, nrow: DataFrame, min_support_frac: float
) -> DataFrame:
    """Frequent pairs from an already-materialized basket relation —
    shared by :func:`frequent_pairs` and :func:`frequent_triples` so the
    basket build and count run once per query, not once per level.
    ``nrow`` is a 1-row ``(_n bigint)`` frame carrying the distinct
    basket count (broadcast into the thresholds and the lift)."""
    frac = F.lit(float(min_support_frac))
    nd = F.col("_n").cast("double")

    l1 = (
        b.groupBy("_i")
        .agg(F.count(F.lit(1)).alias("_n1"))
        .crossJoin(F.broadcast(nrow))
        .filter(F.col("_n1") >= frac * nd)
    )
    pruned = b.join(F.broadcast(l1.select("_i", "_n1", "_n")), "_i")  # prune #1
    pairs = (
        pruned.select(
            "_b", F.col("_i").alias("_ia"), F.col("_n1").alias("_na"), "_n"
        )
        .join(
            pruned.select(
                "_b", F.col("_i").alias("_ib"), F.col("_n1").alias("_nb")
            ),
            "_b",
        )
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib", "_na", "_nb", "_n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
        .filter(F.col("n_baskets") >= frac * nd)
    )
    return pairs.select(
        F.col("_ia").alias("item_a"),
        F.col("_ib").alias("item_b"),
        "n_baskets",
        F.round(
            F.col("n_baskets") * nd / (F.col("_na") * F.col("_nb")),
            4,
        ).alias("lift"),
    )


#: Max post-L1 basket width for the row-local triple expansion: C(W,3)
#: structs per basket (32 → 4,960 — bounded per-row work) — beyond it
#: the Apriori join path's candidate pruning is the safer scale shape.
#: Width is a property of the basket DISTRIBUTION (order line counts),
#: not of the scale factor, so the branch is scale-stable.
_ROWLOCAL_TRIPLE_MAX_WIDTH = 32


def frequent_triples(
    df: DataFrame, basket_col: str, item_col: str, min_support_frac: float
) -> DataFrame:
    """``(item_a, item_b, item_c, n_baskets)`` with items ascending,
    support >= ``min_support_frac``; candidates require ALL three
    sub-pairs frequent (level-wise pruning via broadcast semi-joins).

    r14 (r13 verdict #10): when every L1-pruned basket is narrow
    (max width <= ``_ROWLOCAL_TRIPLE_MAX_WIDTH``, measured with one
    tiny aggregate over the checkpointed membership), triples expand
    ROW-LOCALLY from each basket's sorted item set (bounded C(W,3)
    fanout, ONE basket-keyed exchange + one triple-keyed aggregate)
    instead of the two basket-keyed joins + three broadcast prunes —
    identical exact counts, so the support filter gives identical
    results on either path.
    """
    b = _baskets(df, basket_col, item_col).localCheckpoint()
    n = b.select("_b").distinct().count()
    thr = float(min_support_frac) * n

    l1 = (
        b.groupBy("_i")
        .agg(F.count(F.lit(1)).alias("_n1"))
        .filter(F.col("_n1") >= thr)
    )
    pruned = b.join(F.broadcast(l1.select("_i")), "_i")
    width_row = pruned.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_w")
    ).agg(F.max("_w").alias("_mw")).collect()
    max_width = int(width_row[0]["_mw"] or 0)
    if max_width <= _ROWLOCAL_TRIPLE_MAX_WIDTH:
        sets = pruned.groupBy("_b").agg(
            F.sort_array(F.collect_set("_i")).alias("_s")
        ).filter(F.size("_s") >= 3)
        m = F.size("_s")
        trips = sets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), m - 2),
                        lambda i: F.flatten(
                            F.transform(
                                F.sequence(i + 1, m - 1),
                                lambda j: F.transform(
                                    F.sequence(j + 1, m),
                                    lambda k: F.struct(
                                        F.element_at("_s", i).alias("item_a"),
                                        F.element_at("_s", j).alias("item_b"),
                                        F.element_at("_s", k).alias("item_c"),
                                    ),
                                ),
                            )
                        ),
                    )
                )
            ).alias("_t")
        ).select("_t.item_a", "_t.item_b", "_t.item_c")
        return (
            trips.groupBy("item_a", "item_b", "item_c")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
            .filter(F.col("n_baskets") >= thr)
        )

    # r13: l2 is referenced THREE times (the pair-in-basket prune and
    # both sub-pair broadcast prunes) — materialize the small frequent-
    # pair set once instead of re-running its pipeline per reference.
    # (n is already a driver int here — the row-local/join path choice
    # needed it — so the nrow frame is a LocalRelation, no extra job.)
    nrow = b.sparkSession.range(1).select(
        F.lit(n).cast("bigint").alias("_n")
    )
    l2 = (
        _pairs_from(b, nrow, min_support_frac)
        .select("item_a", "item_b")
        .localCheckpoint()
    )
    # baskets containing a frequent pair (a < b), joined with a third
    # member c > b, pruned so (a, c) and (b, c) are frequent too
    pair_in_basket = (
        b.select("_b", F.col("_i").alias("item_a"))
        .join(
            b.select("_b", F.col("_i").alias("item_b")),
            "_b",
        )
        .filter(F.col("item_a") < F.col("item_b"))
        .join(F.broadcast(l2), ["item_a", "item_b"])
    )
    cand = (
        pair_in_basket.join(
            b.select("_b", F.col("_i").alias("item_c")), "_b"
        )
        .filter(F.col("item_b") < F.col("item_c"))
        .join(
            F.broadcast(
                l2.select(
                    F.col("item_a"), F.col("item_b").alias("item_c")
                )
            ),
            ["item_a", "item_c"],
        )
        .join(
            F.broadcast(
                l2.select(
                    F.col("item_a").alias("item_b"),
                    F.col("item_b").alias("item_c"),
                )
            ),
            ["item_b", "item_c"],
        )
    )
    return (
        cand.groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
        .filter(F.col("n_baskets") >= thr)
    )

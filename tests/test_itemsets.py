from __future__ import annotations

from itertools import combinations

from ups_crossref_etl_spark.operators.itemsets import (
    frequent_items,
    frequent_pairs,
    frequent_triples,
)

BASKETS = {
    1: {"milk", "bread", "butter"},
    2: {"milk", "bread"},
    3: {"milk", "eggs"},
    4: {"bread", "butter"},
    5: {"milk", "bread", "butter", "eggs"},
    6: {"eggs"},
    7: {"milk", "bread", "butter"},
    8: {"milk", "bread", "milk"},  # duplicate item in basket (deduped)
}


def _df(spark):
    rows = [(b, i) for b, items in BASKETS.items() for i in items]
    return spark.createDataFrame(rows, "basket long, item string")


def _support(itemset):
    return sum(1 for items in BASKETS.values() if itemset <= items)


def test_frequent_items_and_pairs_brute(spark):
    df = _df(spark)
    n = len(BASKETS)
    frac = 3 / n  # support >= 3 baskets
    items = {
        r["item"]: r["n_baskets"]
        for r in frequent_items(df, "basket", "item", frac).collect()
    }
    all_items = {i for s in BASKETS.values() for i in s}
    assert items == {
        i: _support({i}) for i in all_items if _support({i}) >= 3
    }

    pairs = {
        (r["item_a"], r["item_b"]): (r["n_baskets"], r["lift"])
        for r in frequent_pairs(df, "basket", "item", frac).collect()
    }
    want = {}
    for a, b in combinations(sorted(all_items), 2):
        s = _support({a, b})
        if s >= 3:
            lift = round(s * float(n) / (_support({a}) * _support({b})), 4)
            want[(a, b)] = (s, lift)
    assert pairs == want


def test_frequent_triples_brute(spark):
    df = _df(spark)
    n = len(BASKETS)
    frac = 3 / n
    triples = {
        (r["item_a"], r["item_b"], r["item_c"]): r["n_baskets"]
        for r in frequent_triples(df, "basket", "item", frac).collect()
    }
    all_items = {i for s in BASKETS.values() for i in s}
    want = {
        (a, b, c): _support({a, b, c})
        for a, b, c in combinations(sorted(all_items), 3)
        if _support({a, b, c}) >= 3
    }
    assert triples == want
    assert ("bread", "butter", "milk") in triples


def test_apriori_prune_is_lossless_when_threshold_moves(spark):
    # every triple's support is <= each sub-pair's support, so tightening
    # the threshold can only shrink the result set
    df = _df(spark)
    loose = frequent_triples(df, "basket", "item", 2 / 8).collect()
    tight = frequent_triples(df, "basket", "item", 3 / 8).collect()
    loose_keys = {(r["item_a"], r["item_b"], r["item_c"]) for r in loose}
    tight_keys = {(r["item_a"], r["item_b"], r["item_c"]) for r in tight}
    assert tight_keys <= loose_keys

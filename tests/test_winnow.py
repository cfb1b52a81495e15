from __future__ import annotations

import hashlib

from ups_crossref_etl_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)

K, W = 3, 4


def _py_winnow(text: str):
    toks = [t for t in "".join(
        c if c.isalnum() else " " for c in text.lower()
    ).split() if t]
    grams = [
        " ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)
    ]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams
    ]
    sel = set()
    for start in range(len(hs) - W + 1):
        window = hs[start : start + W]
        m = min(window)
        # rightmost position achieving the min
        off = max(i for i, h in enumerate(window) if h == m)
        sel.add((start + off + 1, m))
    return sel


def test_winnow_matches_reference_impl(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "alpha beta gamma alpha beta gamma alpha beta gamma delta",
        "one two three four five six seven eight nine ten",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["pos"], r["fp_hash"])
        for r in winnow_fingerprints(df, "text", "doc_id", k=K, w=W).collect()
    }
    want = {
        (i, p, h) for i, t in enumerate(texts) for p, h in _py_winnow(t)
    }
    assert got == want


def test_winnow_shared_run_guarantee(spark):
    # two docs sharing a run of w+k-1 = 6 tokens must share a fingerprint
    shared = "omega psi chi phi upsilon tau"
    df = spark.createDataFrame(
        [
            (1, f"aa bb cc dd {shared} ee ff gg hh"),
            (2, f"zz yy xx {shared} ww vv uu tt ss rr"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(df, "text", "doc_id", k=K, w=W)
    a = {r["fp_hash"] for r in fp.filter("doc_id = 1").collect()}
    b = {r["fp_hash"] for r in fp.filter("doc_id = 2").collect()}
    assert a & b


def test_winnow_short_doc_empty(spark):
    df = spark.createDataFrame(
        [(1, "just five tokens in here"), (2, "tiny")],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(df, "text", "doc_id", k=K, w=W)
    # 5 tokens -> 3 grams -> no full window of 4; 1 token -> no grams
    assert out.count() == 0


def test_winnow_overlap_pairs_brute(spark):
    texts = {
        1: "red green blue cyan magenta yellow black white",
        2: "intro red green blue cyan magenta yellow outro closing words",
        3: "totally different content with no common runs at all here",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_overlap_pairs(
            df, "text", "doc_id", k=K, w=W, min_shared=1, max_df=50
        ).collect()
    }
    fps = {i: {h for _p, h in _py_winnow(t)} for i, t in texts.items()}
    want = {}
    for a in texts:
        for b in texts:
            if a < b and fps[a] & fps[b]:
                want[(a, b)] = len(fps[a] & fps[b])
    assert pairs == want
    assert (1, 2) in pairs and (1, 3) not in pairs

"""Property-based tests (hypothesis) for the scalar function layer.

Strategy: generate example batches driver-side, evaluate each property in
ONE Spark job over the whole batch (per-example Spark jobs would be
hopeless), assert row-wise."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ups_crossref_etl_spark import functions as fx

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=60
)


def _eval(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], schema="s string")
    return [r["o"] for r in df.select(col_fn(F.col("s")).alias("o")).collect()]


@settings(max_examples=1, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=200))
def test_norm_nfc_idempotent(spark, values):
    once = _eval(spark, fx.norm_text_nfc, values)
    twice = _eval(spark, fx.norm_text_nfc, once)
    assert once == twice


@settings(max_examples=1, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=200))
def test_norm_search_idempotent_and_lower(spark, values):
    once = _eval(spark, fx.norm_text_nfkd_lower, values)
    twice = _eval(spark, fx.norm_text_nfkd_lower, once)
    assert once == twice
    assert all(v == v.lower() for v in once)


@settings(max_examples=1, deadline=None)
@given(st.lists(st.from_regex(r"10\.[0-9]{4}/[A-Za-z0-9._-]{1,20}", fullmatch=True),
                min_size=1, max_size=100))
def test_doi_prefix_invariance(spark, dois):
    """Every prefix form of the same DOI must standardize identically."""
    bare = _eval(spark, fx.standardize_doi, dois)
    url = _eval(spark, fx.standardize_doi, [f"https://doi.org/{d}" for d in dois])
    dx = _eval(spark, fx.standardize_doi, [f"https://dx.doi.org/{d}" for d in dois])
    pfx = _eval(spark, fx.standardize_doi, [f"doi: {d}" for d in dois])
    assert bare == url == dx == pfx
    assert all(b == b.lower() for b in bare)
    # idempotence
    assert bare == _eval(spark, fx.standardize_doi, bare)


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=100))
def test_author_name_never_empty_string(spark, pairs):
    df = spark.createDataFrame(
        [(g, f, None) for g, f in pairs], schema="g string, f string, n string"
    )
    out = [
        r["o"]
        for r in df.select(
            fx.author_full_name(F.col("g"), F.col("f"), F.col("n")).alias("o")
        ).collect()
    ]
    assert all(o is None or o.strip() == o != "" for o in out)


@settings(max_examples=1, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200,
             unique=True),
    st.integers(min_value=2, max_value=97),
)
def test_hash_bucket_deterministic_and_in_range(spark, keys, buckets):
    """hash_bucket: pure function of (seed, key) — stable across calls,
    always in [0, buckets), and independent of row order."""
    from ups_crossref_etl_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame([(k,) for k in keys], schema="k long")
    a = {r["k"]: r["b"] for r in
         df.select("k", hash_bucket(F.col("k"), "s", buckets).alias("b")).collect()}
    rev = spark.createDataFrame([(k,) for k in reversed(keys)], schema="k long")
    b = {r["k"]: r["b"] for r in
         rev.select("k", hash_bucket(F.col("k"), "s", buckets).alias("b")).collect()}
    assert a == b
    assert all(0 <= v < buckets for v in a.values())

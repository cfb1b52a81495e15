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


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),   # cost
            st.integers(min_value=0, max_value=30),   # size
        ),
        min_size=1,
        max_size=60,
    )
)
def test_skyline_equals_bruteforce_property(spark, pts):
    """Distributed two-phase skyline == brute-force dominance filter on
    arbitrary point sets (duplicates and ties included)."""
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.skyline import skyline

    rows = [Row(id=i, cost=float(c), size=s) for i, (c, s) in enumerate(pts)]
    df = spark.createDataFrame(rows).repartition(3)
    got = {r["id"] for r in
           skyline(df, minimize=["cost"], maximize=["size"]).collect()}
    brute = {
        i for i, (c, s) in enumerate(pts)
        if not any(
            c2 <= c and s2 >= s and (c2 < c or s2 > s) for c2, s2 in pts
        )
    }
    assert got == brute


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),    # key
            st.integers(min_value=0, max_value=50),   # seq
            st.sampled_from(["U", "D", "I"]),
        ),
        min_size=1,
        max_size=40,
    ),
    st.randoms(),
)
def test_merge_cdc_state_batch_order_invariant_property(spark, changes, rnd):
    """LWW tombstone merge converges to the same state under ANY batch
    partitioning and ordering of the change set."""
    from pyspark.sql import Row

    import ups_crossref_etl_spark.streaming.events as se

    rows = [Row(k=k, v=f"v{i}", op=op, seq=s)
            for i, (k, s, op) in enumerate(changes)]

    def apply_in_batches(order, n_batches):
        st_ = None
        per = max(1, len(order) // n_batches)
        for i in range(0, len(order), per):
            batch = spark.createDataFrame(order[i : i + per])
            st_ = se.merge_cdc_state(st_, batch, ["k"])
        return {(r["k"], r["op"], r["seq"]) for r in st_.collect()}

    shuffled = list(rows)
    rnd.shuffle(shuffled)
    a = apply_in_batches(rows, 1)
    b = apply_in_batches(shuffled, 3)
    # per-key winners must agree on (op, seq); v may differ only when two
    # DISTINCT rows tie exactly on (k, seq, op) — then either image is a
    # legitimate winner, so compare the (k, op, seq) state
    assert a == b

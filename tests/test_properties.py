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


# ---------------------------------------------------- round-7 wave 13-20


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("xyz")),
        min_size=2,
        max_size=60,
    )
)
def test_kappa_symmetric_in_raters(spark, pairs):
    """Cohen's kappa is symmetric: swapping the two raters changes
    po/pe/kappa not at all (the confusion matrix transposes)."""
    from ups_crossref_etl_spark.operators.agreement import cohens_kappa

    df = spark.createDataFrame(pairs, "a string, b string")
    r1 = cohens_kappa(df, "a", "b").collect()[0]
    r2 = cohens_kappa(df, "b", "a").collect()[0]
    assert (r1.po, r1.pe, r1.kappa, r1.n) == (r2.po, r2.pe, r2.kappa, r2.n)


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=80,
    )
)
def test_sequence_gaps_account_for_full_range(spark, ids):
    """sum(gap_len) == (max - min + 1) - n_distinct: the holes plus the
    present ids tile the id range exactly."""
    from ups_crossref_etl_spark.operators.quality import sequence_gaps

    df = spark.createDataFrame([(i,) for i in ids], "id bigint")
    gaps = sequence_gaps(df, "id").collect()
    total_gap = sum(r.gap_len for r in gaps)
    span = max(ids) - min(ids) + 1
    assert total_gap == span - len(set(ids))
    # every reported hole is truly absent
    present = set(ids)
    for r in gaps:
        assert r.gap_len == r.gap_end - r.gap_start + 1
        assert all(x not in present for x in range(r.gap_start, r.gap_end + 1))


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False
        ),
        min_size=4,
        max_size=60,
    )
)
def test_winsorized_mean_within_cut_bounds(spark, vals):
    """The winsorized mean lies within [lo_cut, hi_cut] and the clamp
    counts match a driver-side replay."""
    from ups_crossref_etl_spark.operators.stats import winsorized_mean

    df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, v double")
    r = winsorized_mean(df, "g", "v", lower=0.1, upper=0.9).collect()[0]
    assert r.lo_cut - 1e-4 <= r.winsorized_mean <= r.hi_cut + 1e-4
    q = [round(v * 1e4) for v in vals]
    assert r.n_clamped_low == sum(1 for x in q if x < round(r.lo_cut * 1e4))
    assert r.n_clamped_high == sum(1 for x in q if x > round(r.hi_cut * 1e4))


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_scc_ids_are_canonical_members(spark, raw_edges):
    """Every scc_id is the minimum member of its component, components
    partition the node set, and nodes in the same component mutually
    reach each other (checked against a driver-side Tarjan-free
    floyd-warshall replay)."""
    from ups_crossref_etl_spark.operators.graph import (
        strongly_connected_components,
    )

    edges = [(a, b) for a, b in raw_edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = {r.node: r.scc_id for r in strongly_connected_components(df).collect()}
    nodes = sorted({n for e in edges for n in e})
    assert sorted(out) == nodes
    # driver-side reachability replay
    reach = {n: {n} for n in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            for n in nodes:
                if a in reach[n] and b not in reach[n]:
                    reach[n].add(b)
                    changed = True
    for u in nodes:
        comp = {v for v in nodes if v in reach[u] and u in reach[v]}
        assert out[u] == min(comp)

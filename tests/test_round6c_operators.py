"""Unit tests for the round-6 third-wave operators: snapshot diff and
leakage-safe (near-dup-component) splitting."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ups_crossref_etl_spark.operators.diff import snapshot_diff
from ups_crossref_etl_spark.operators.sampling import leakage_safe_split


def _tables(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10),  # unchanged
            Row(k=2, a="x", b=10),  # b changes
            Row(k=3, a=None, b=10),  # a: null -> value
            Row(k=4, a="x", b=None),  # b: null stays null => unchanged
            Row(k=5, a="x", b=10),  # deleted
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10),
            Row(k=2, a="x", b=11),
            Row(k=3, a="y", b=10),
            Row(k=4, a="x", b=None),
            Row(k=6, a="z", b=1),  # inserted
        ]
    )
    return old, new


def test_snapshot_diff_classifies_and_names_columns(spark):
    old, new = _tables(spark)
    got = {
        r["k"]: (r["op"], r["changed_cols"])
        for r in snapshot_diff(old, new, "k").collect()
    }
    assert got == {
        2: ("U", "b"),
        3: ("U", "a"),
        5: ("D", ""),
        6: ("I", ""),
    }


def test_snapshot_diff_include_unchanged_and_multi_col(spark):
    old, new = _tables(spark)
    new2 = new.withColumn(
        "a", F.when(F.col("k") == 2, F.lit("w")).otherwise(F.col("a"))
    )
    rows = {
        r["k"]: (r["op"], r["changed_cols"])
        for r in snapshot_diff(old, new2, "k", include_unchanged=True).collect()
    }
    assert rows[2] == ("U", "a,b")  # sorted column names
    assert rows[1] == ("N", "")
    assert rows[4] == ("N", "")  # null == null is not a change


def test_snapshot_diff_compare_cols_subset(spark):
    old, new = _tables(spark)
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, "k", ["a"]).collect()}
    # only column a compared: k=2 (b-only change) is no longer an update
    assert got == {3: "U", 5: "D", 6: "I"}


def test_leakage_safe_split_never_splits_an_edge(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
    # chain components {0..4}, {10,11}, rest singletons
    edges = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(4)] + [Row(src=10, dst=11)]
    )
    out = leakage_safe_split(docs, edges, "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 200
    # whole component shares one split and one label
    assert len({by_id[i]["split"] for i in range(5)}) == 1
    assert {by_id[i]["component"] for i in range(5)} == {0}
    assert by_id[10]["split"] == by_id[11]["split"]
    # singletons fall back to their own id
    assert by_id[50]["component"] == 50
    # every edge endpoint pair shares a split (the invariant, directly)
    for e in [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]:
        assert by_id[e[0]]["split"] == by_id[e[1]]["split"]
    # all three splits exist over 200 ids (sanity that hashing spreads)
    assert {r["split"] for r in out} == {"train", "val", "test"}


def test_unigram_viterbi_planted_vocab(spark):
    """Planted corpus: 'ing' must be learned as a piece and win over
    char-by-char splits; tie-breaks are exercised via equal-score paths."""
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.unigram import (
        unigram_segment_words,
        unigram_vocab,
        word_counts,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="testing casting resting " * 5) for i in range(20)]
    )
    wc = word_counts(docs)
    vocab = unigram_vocab(wc, max_piece_len=4, min_count=100)
    segs = {r["word"]: (r["seg"], r["n_pieces"]) for r in
            unigram_segment_words(wc, vocab).collect()}
    assert set(segs) == {"testing", "casting", "resting"}
    # 'ing' appears 300 times weighted -> survives min_count and, being
    # longer, scores better than i+n+g; every word ends with it
    for w, (seg, np_) in segs.items():
        assert seg.endswith("ing"), (w, seg)
        assert seg.replace(" ", "") == w


def test_unigram_dp_matches_bruteforce():
    """_viterbi against exhaustive enumeration on random small vocabs."""
    import itertools

    from ups_crossref_etl_spark.operators.unigram import _viterbi

    scores = {
        "a": -10, "b": -11, "c": -12, "ab": -15, "bc": -16, "abc": -30,
        "ca": -14, "aa": -13,
    }

    def brute(word):
        best = None
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            pieces = [word[pos[i]:pos[i + 1]] for i in range(len(pos) - 1)]
            if any(p not in scores for p in pieces):
                continue
            cand = (sum(scores[p] for p in pieces), len(pieces), " ".join(pieces))
            key = (-cand[0], cand[1], cand[2])
            if best is None or key < (-best[0], best[1], best[2]):
                best = cand
        return best

    for word in ["abc", "aabc", "caab", "abca", "aaaa", "cabc", "a"]:
        b = brute(word)
        seg, np_, sc = _viterbi(word, scores, 4)
        assert b is not None
        assert (sc, np_, seg) == b, (word, b, (sc, np_, seg))


def test_corr_matrix_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.stats import corr_matrix

    rng = np.random.default_rng(7)
    x = rng.normal(size=300)
    y = 0.8 * x + rng.normal(size=300) * 0.3
    z = rng.normal(size=300)
    df = spark.createDataFrame(
        [Row(x=float(a), y=float(b), z=float(c)) for a, b, c in zip(x, y, z)]
    )
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    want = np.corrcoef(np.vstack([x, y, z]))
    assert abs(got[("x", "y")] - want[0, 1]) < 1e-3
    assert abs(got[("x", "z")] - want[0, 2]) < 1e-3
    assert abs(got[("y", "z")] - want[1, 2]) < 1e-3
    assert len(got) == 3


def test_corr_matrix_null_rows_listwise_deleted(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.stats import corr_matrix

    df = spark.createDataFrame(
        [Row(x=1.0, y=2.0), Row(x=2.0, y=4.0), Row(x=3.0, y=6.0),
         Row(x=None, y=99.0), Row(x=50.0, y=None)]
    )
    r = corr_matrix(df, ["x", "y"]).collect()[0]
    assert r["corr"] == 1.0  # null rows excluded, remaining is exact line


def test_mad_outliers_planted(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.stats import mad_outliers

    rows = [Row(k="a", v=float(i % 7)) for i in range(100)]
    rows += [Row(k="a", v=1000.0), Row(k="a", v=-1000.0)]
    rows += [Row(k="b", v=5.0)] * 60 + [Row(k="b", v=6.0)]  # MAD=0 group
    df = spark.createDataFrame(rows)
    got = {r["k"]: r for r in mad_outliers(df, "k", "v").collect()}
    assert got["a"]["n_outliers"] == 2  # only the planted extremes
    assert got["b"]["mad"] == 0.0 and got["b"]["n_outliers"] == 1


def test_label_propagation_two_cliques(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.graph import label_propagation

    # two 4-cliques joined by one bridge edge
    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r["node"]: r["label"] for r in label_propagation(df, rounds=3).collect()}
    # each clique converges to its own min-id label; bridge doesn't merge
    assert len({got[i] for i in (1, 2, 3, 4)}) == 1
    assert len({got[i] for i in (10, 11, 12, 13)}) == 1
    assert got[1] != got[10]


def test_loo_target_encode_hand_computed(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.stats import loo_target_encode

    df = spark.createDataFrame(
        [Row(cat="a", y=1.0), Row(cat="a", y=3.0), Row(cat="a", y=5.0),
         Row(cat="b", y=10.0)]
    )
    got = {(r["cat"], r["y"]): r["loo_enc"]
           for r in loo_target_encode(df, "cat", "y").collect()}
    assert got[("a", 1.0)] == 4.0   # (3+5)/2
    assert got[("a", 3.0)] == 3.0   # (1+5)/2
    assert got[("a", 5.0)] == 2.0   # (1+3)/2
    assert got[("b", 10.0)] is None  # singleton, no smoothing -> NULL
    sm = {(r["cat"], r["y"]): r["loo_enc"]
          for r in loo_target_encode(df, "cat", "y", prior_weight=1.0).collect()}
    mu = 19.0 / 4
    assert abs(sm[("b", 10.0)] - mu) < 1e-9  # shrinks fully to global mean


def test_seasonal_baseline_backtest_planted(spark):
    """Perfectly periodic signal -> MAE 0 on seen slots; a test row in an
    unseen slot uses the fallback mean and reports n_fallback."""
    import datetime as dt

    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.timeseries import (
        seasonal_baseline_backtest,
    )

    rows = []
    t0 = dt.datetime(2024, 1, 1)  # a Monday
    # train: two weeks, value = hour number at hours 1 and 2 every day
    for day in range(14):
        for h in (1, 2):
            rows.append(Row(k="a", ts=t0 + dt.timedelta(days=day, hours=h),
                            v=float(h * 10)))
    # test: third week, same slots (predictable) + one 5am row (unseen slot)
    for day in range(14, 16):
        for h in (1, 2):
            rows.append(Row(k="a", ts=t0 + dt.timedelta(days=day, hours=h),
                            v=float(h * 10)))
    rows.append(Row(k="a", ts=t0 + dt.timedelta(days=14, hours=5), v=15.0))
    df = spark.createDataFrame(rows)
    got = seasonal_baseline_backtest(df, "k", "ts", "v", "2024-01-15").collect()[0]
    assert got["n_test"] == 5
    assert got["n_fallback"] == 1
    # 4 exact rows err 0; fallback pred = train mean 15.0, err 0 too
    assert got["mae"] == 0.0


def test_join_cardinality_preflight_exact(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.skew import join_cardinality_preflight

    left = spark.createDataFrame(
        [Row(k=1)] * 3 + [Row(k=2)] * 2 + [Row(k=3)]
    )
    right = spark.createDataFrame([Row(k=1)] * 4 + [Row(k=2)] * 5)
    out = {r["rank"]: r for r in
           join_cardinality_preflight(left, right, ["k"]).collect()}
    actual = left.join(right, "k").count()
    assert out[0]["out_rows"] == actual == 22  # 3*4 + 2*5
    assert out[1]["key_repr"] == "1" and out[1]["out_rows"] == 12
    assert out[2]["key_repr"] == "2" and out[2]["out_rows"] == 10
    assert 3 not in out  # key 3 has no match -> contributes nothing


def test_vacuum_tombstones_horizon(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.cdc import vacuum_tombstones

    st = spark.createDataFrame(
        [Row(k=1, op="U", seq=5), Row(k=2, op="D", seq=3),
         Row(k=3, op="D", seq=9), Row(k=4, op="U", seq=1)]
    )
    kept = {(r["k"], r["op"]) for r in vacuum_tombstones(st, 5).collect()}
    # old tombstone (seq 3) compacted away; recent one (seq 9) retained;
    # live rows untouched regardless of seq
    assert kept == {(1, "U"), (3, "D"), (4, "U")}


def test_psi_drift_identical_and_shifted(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.profile import psi_drift

    a = spark.createDataFrame([Row(v=float(i % 100)) for i in range(1000)])
    cut = [20.0, 40.0, 60.0, 80.0]
    same = {r["bin"]: r for r in psi_drift(a, a, "v", cut).collect()}
    assert same[-1]["term"] == 0.0  # identical distributions -> PSI 0
    b = spark.createDataFrame([Row(v=float(i % 100) + 40.0) for i in range(1000)])
    shifted = {r["bin"]: r for r in psi_drift(a, b, "v", cut).collect()}
    assert shifted[-1]["term"] > 0.25  # a 40-unit shift is an act-now PSI
    # per-bin rows cover every bin incl. empties
    assert set(shifted) == {-1, 0, 1, 2, 3, 4}


def test_containment_join_detects_fragment(spark):
    """A short doc quoted inside a much longer one: Jaccard tiny,
    containment 1.0, and only in the fragment->host direction."""
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.setsim import containment_join

    frag = "alpha beta gamma delta epsilon zeta"
    host = frag + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=frag), Row(doc_id=2, text=host),
         Row(doc_id=3, text="totally different words here entirely now")]
    )
    out = {(r["id_a"], r["id_b"]): r["containment"]
           for r in containment_join(df, "doc_id", "text", 0.8, 3).collect()}
    assert out == {(1, 2): 1.0}  # directed: fragment contained in host only


def test_shard_manifest_detects_corruption(spark, sf_dir):
    from ups_crossref_etl_spark.operators.profile import shard_manifest
    from ups_crossref_etl_spark.sources.lake import read_table

    d = read_table(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    base = {r["shard"]: (r["n_rows"], r["digest"])
            for r in shard_manifest(d, "doc_id", cols).collect()}
    # same data -> identical manifest (order/partitioning independent)
    again = {r["shard"]: (r["n_rows"], r["digest"])
             for r in shard_manifest(d.repartition(7), "doc_id", cols).collect()}
    assert base == again
    # corrupt one row's lang -> exactly the shards holding it differ,
    # with unchanged row counts (the digest catches what count cannot)
    from pyspark.sql import functions as F

    bad = d.withColumn(
        "lang", F.when(F.col("doc_id") == 5, F.lit("zz")).otherwise(F.col("lang"))
    )
    after = {r["shard"]: (r["n_rows"], r["digest"])
             for r in shard_manifest(bad, "doc_id", cols).collect()}
    diff = {s for s in base if base[s] != after[s]}
    assert len(diff) == 1
    s = diff.pop()
    assert base[s][0] == after[s][0] and base[s][1] != after[s][1]


def test_ivf_centroid_save_load_roundtrip(spark, sf_dir, tmp_path):
    """Persisted centroids reload bit-identically: assignments made with
    the reloaded matrix equal the original's (index reuse across jobs)."""
    import numpy as np

    from ups_crossref_etl_spark.operators.ivf import (
        assign_clusters,
        kmeans_fit,
        load_centroids,
        save_centroids,
    )
    from ups_crossref_etl_spark.sources.lake import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    c = kmeans_fit(emb, k=4, max_iter=2)
    p = str(tmp_path / "centroids")
    save_centroids(spark, c, p)
    c2 = load_centroids(spark, p)
    assert np.array_equal(c, c2)
    a1 = {r["vec_id"]: r["_cluster"] for r in assign_clusters(emb, c).collect()}
    a2 = {r["vec_id"]: r["_cluster"] for r in assign_clusters(emb, c2).collect()}
    assert a1 == a2 and len(a1) > 0


def test_ranking_metrics_hand_computed(spark):
    import math

    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.evaluation import ranking_metrics

    system = spark.createDataFrame(
        [Row(qid=1, doc_id=d, rank=r) for r, d in enumerate([10, 20, 30], 1)]
        + [Row(qid=2, doc_id=d, rank=r) for r, d in enumerate([40, 50], 1)]
    )
    qrels = spark.createDataFrame(
        [Row(qid=1, doc_id=20), Row(qid=1, doc_id=30), Row(qid=1, doc_id=99),
         Row(qid=2, doc_id=77)]
    )
    got = {r["qid"]: r for r in ranking_metrics(system, qrels, k=3).collect()}
    # qid 1: hits at ranks 2,3 of 3 relevant
    assert got[1]["recall_at_k"] == round(2 / 3, 4)
    assert got[1]["mrr"] == 0.5
    dcg = round(1e6 / math.log2(3)) + round(1e6 / math.log2(4))
    idcg = round(1e6 / math.log2(2)) + round(1e6 / math.log2(3)) + round(1e6 / math.log2(4))
    assert got[1]["ndcg"] == round(dcg / idcg, 4)
    # qid 2: no hits
    assert got[2]["recall_at_k"] == 0.0 and got[2]["mrr"] == 0.0 and got[2]["ndcg"] == 0.0


def test_skyline_hand_computed_and_duplicates(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.skyline import skyline

    rows = [
        Row(id=1, cost=1.0, size=1),   # frontier (cheapest)
        Row(id=2, cost=2.0, size=5),   # frontier
        Row(id=3, cost=3.0, size=5),   # dominated by 2
        Row(id=4, cost=2.0, size=5),   # duplicate of 2 -> both survive
        Row(id=5, cost=5.0, size=10),  # frontier (largest)
        Row(id=6, cost=6.0, size=9),   # dominated by 5
    ]
    df = spark.createDataFrame(rows).repartition(3)  # exercise local phase
    got = {r["id"] for r in
           skyline(df, minimize=["cost"], maximize=["size"]).collect()}
    assert got == {1, 2, 4, 5}


def test_skyline_matches_bruteforce(spark, sf_dir):
    from ups_crossref_etl_spark.operators.skyline import skyline
    from ups_crossref_etl_spark.sources.lake import read_table

    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    got = {r["p_partkey"] for r in
           skyline(p, minimize=["p_retailprice"], maximize=["p_size"]).collect()}
    rows = p.collect()
    brute = {
        a["p_partkey"]
        for a in rows
        if not any(
            b["p_retailprice"] <= a["p_retailprice"]
            and b["p_size"] >= a["p_size"]
            and (b["p_retailprice"] < a["p_retailprice"] or b["p_size"] > a["p_size"])
            for b in rows
        )
    }
    assert got == brute and len(got) > 0


def test_personalized_pagerank_mass_stays_near_seed(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.pagerank import personalized_pagerank

    # two disjoint stars; seed only in the first
    edges = [Row(src="a", dst=f"x{i}") for i in range(3)]
    edges += [Row(src="b", dst=f"y{i}") for i in range(3)]
    seeds = spark.createDataFrame([Row(node="a")])
    got = {r["node"]: r["rank"] for r in
           personalized_pagerank(
               spark.createDataFrame(edges), seeds, n_iter=2
           ).collect()}
    # seed keeps its teleport mass; its neighbors get propagated mass;
    # the disconnected star gets exactly zero
    assert got["a"] > 0
    assert got["x0"] > 0 and got["x0"] == got["x1"] == got["x2"]
    assert got["b"] == 0.0 and got["y0"] == 0.0


def test_scd2_lookup_asof_versions(spark):
    import datetime as dt

    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.scd import lookup_asof

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(hours=s)
    dim = spark.createDataFrame(
        [Row(k=1, attr="bronze", valid_from=t(0), valid_to=t(10)),
         Row(k=1, attr="gold", valid_from=t(10), valid_to=None)]
    )
    facts = spark.createDataFrame(
        [Row(fid=1, k=1, ts=t(5)),    # inside v1
         Row(fid=2, k=1, ts=t(10)),   # boundary -> NEW version (half-open)
         Row(fid=3, k=1, ts=t(99)),   # current version
         Row(fid=4, k=1, ts=t(-5)),   # before history -> NULL
         Row(fid=5, k=2, ts=t(5))]    # unknown key -> NULL
    )
    got = {r["fid"]: r["attr_asof"]
           for r in lookup_asof(facts, dim, "k", "ts").collect()}
    assert got == {1: "bronze", 2: "gold", 3: "gold", 4: None, 5: None}


def test_file_pruning_stats_sorted_vs_shuffled(spark, sf_dir, tmp_path):
    """The layout measurement z-order/sort decisions exist for: a
    range-partitioned-by-key layout prunes most files for a narrow key
    range; a hash-scattered layout prunes none."""
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.layout import file_pruning_stats
    from ups_crossref_etl_spark.sources.lake import read_table

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    o.repartitionByRange(8, "o_orderkey").write.parquet(clustered)
    o.repartition(8).write.parquet(scattered)

    lo = o.agg(F.min("o_orderkey")).collect()[0][0]
    hi_narrow = lo + 50
    good = file_pruning_stats(clustered, "o_orderkey", lo, hi_narrow)
    bad = file_pruning_stats(scattered, "o_orderkey", lo, hi_narrow)
    assert good["files_total"] == 8 and bad["files_total"] == 8
    assert good["files_skipped"] >= 6  # narrow range -> most files skip
    assert bad["files_skipped"] == 0   # every file spans the whole range
    assert good["skip_frac"] > bad["skip_frac"]


def test_max_coverage_greedy_planted(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.selection import max_coverage_select

    docs = [
        Row(doc_id=1, text="a b c d e"),      # 5 tokens
        Row(doc_id=2, text="a b c"),           # subset of 1
        Row(doc_id=3, text="f g h"),           # disjoint 3
        Row(doc_id=4, text="e f"),             # overlaps 1 and 3
    ]
    got = [(r["pick_order"], r["doc_id"], r["gain"]) for r in
           max_coverage_select(spark.createDataFrame(docs), k=4)
           .orderBy("pick_order").collect()]
    # greedy: doc1 (5 new), doc3 (3 new), then nothing adds -> stop
    assert got == [(1, 1, 5), (2, 3, 3)]


def test_quarantine_routes_rows_with_reasons(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators import quality as Q

    df = spark.createDataFrame(
        [Row(k=1, price=50.0, status="O"),
         Row(k=2, price=-1.0, status="O"),
         Row(k=3, price=-1.0, status="X"),
         Row(k=4, price=None, status=None)]
    )
    out = {r["k"]: (r["violations"], r["quarantined"]) for r in Q.quarantine(
        df, [Q.in_range("price", 0, 100), Q.one_of("status", ["O", "F"])]
    ).collect()}
    assert out[1] == ("", False)
    assert out[2] == ("in_range(price)", True)
    assert out[3] == ("in_range(price),one_of(status)", True)  # sorted names
    assert out[4] == ("", False)  # nulls are not_null's job, not these rules'


def test_ranking_metrics_no_system_rows_reports_zero(spark):
    """A query with qrels but no retrieved rows must report zeros, not
    vanish (review finding: a broken retriever would inflate averages)."""
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.evaluation import ranking_metrics

    system = spark.createDataFrame([Row(qid=1, doc_id=10, rank=1)])
    qrels = spark.createDataFrame(
        [Row(qid=1, doc_id=10), Row(qid=2, doc_id=20)]
    )
    got = {r["qid"]: r for r in ranking_metrics(system, qrels, k=3).collect()}
    assert got[1]["recall_at_k"] == 1.0
    assert got[2]["recall_at_k"] == 0.0
    assert got[2]["mrr"] == 0.0 and got[2]["ndcg"] == 0.0


def test_k_anonymity_audit_planted_violations(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.privacy import k_anonymity_audit

    rows = [Row(zip="A", age=30, dx="flu")] * 10      # compliant class
    rows += [Row(zip="B", age=40, dx="flu"),
             Row(zip="B", age=40, dx="cold")]          # size-2 class
    rows += [Row(zip="C", age=50, dx="covid")]         # singleton
    df = spark.createDataFrame(rows)
    got = {r["bucket"]: r for r in
           k_anonymity_audit(df, ["zip", "age"], "dx", k=5).collect()}
    assert got[1]["n_classes"] == 1 and got[1]["below_k"] is True
    assert got[2]["n_classes"] == 1 and got[2]["n_rows"] == 2
    assert got[5]["below_k"] is False
    assert got[5]["min_l"] == 1  # big class but one diagnosis -> leaks


def test_pseudonymize_keyed_stable_null_preserving(spark):
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.privacy import pseudonymize

    df = spark.createDataFrame(
        [Row(k=1, email="a@x.com"), Row(k=2, email="a@x.com"),
         Row(k=3, email=None)]
    )
    t1 = {r["k"]: r["email"] for r in pseudonymize(df, ["email"], "s1").collect()}
    t2 = {r["k"]: r["email"] for r in pseudonymize(df, ["email"], "s2").collect()}
    assert t1[1] == t1[2] and t1[1] != "a@x.com"  # join-stable token
    assert t1[1] != t2[1]                          # salt changes mapping
    assert t1[3] is None                           # NULL stays NULL


def test_theil_sen_robust_to_outlier(spark):
    """A wild outlier leaves the Theil-Sen slope on the true line while
    the OLS slope is dragged off it."""
    import datetime as dt

    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.timeseries import theil_sen_trend

    t0 = dt.datetime(2024, 1, 1)
    rows = [Row(k="a", ts=t0 + dt.timedelta(seconds=i), v=2.0 * i)
            for i in range(20)]
    rows.append(Row(k="a", ts=t0 + dt.timedelta(seconds=25), v=1_000_000.0))
    got = theil_sen_trend(spark.createDataFrame(rows), "k", "ts", "v").collect()[0]
    assert got["n_points"] == 21
    assert abs(got["slope"] - 2.0) < 0.01  # outlier cannot move the median


def test_merge_profiles_additive_and_distinct_refusal(spark, sf_dir):
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.profile import (
        merge_profiles,
        profile_columns,
    )
    from ups_crossref_etl_spark.sources.lake import read_table

    d = read_table(spark, sf_dir, "documents")
    p1 = profile_columns(d.filter(F.col("doc_id") < 25), ["lang", "n_chars"])
    p2 = profile_columns(d.filter(F.col("doc_id") >= 25), ["lang", "n_chars"])
    merged = {r["column"]: r for r in
              merge_profiles(p1, p2, numeric_cols=["n_chars"]).collect()}
    full = {r["column"]: r for r in
            profile_columns(d, ["lang", "n_chars"]).collect()}
    for c in ("lang", "n_chars"):
        assert merged[c]["n_rows"] == full[c]["n_rows"]
        assert merged[c]["n_null"] == full[c]["n_null"]
        assert merged[c]["min_str"] == full[c]["min_str"]
        assert merged[c]["max_str"] == full[c]["max_str"]
        # exact distincts are NOT mergeable: refuse, don't guess
        assert merged[c]["n_distinct"] is None


def test_diff_then_apply_reconstructs_snapshot(spark, sf_dir):
    """Inverse-pair property: snapshot_diff(old, new) converted to a CDC
    change batch and applied to old via apply_changes reproduces new
    exactly — the two lakehouse operators are mutual inverses."""
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.cdc import apply_changes
    from ups_crossref_etl_spark.operators.diff import snapshot_diff
    from ups_crossref_etl_spark.plans.round6c_queries import _documents_v2
    from ups_crossref_etl_spark.sources.lake import read_table

    old = read_table(spark, sf_dir, "documents")
    new = _documents_v2(old)
    diff = snapshot_diff(old, new, "doc_id")
    # build the change batch: I/U carry new's row image, D is a tombstone
    imaged = diff.join(
        new.select(
            "doc_id", "text", "lang", "source", "n_chars"
        ),
        "doc_id",
        "left",
    ).select(
        "doc_id", "text", "lang", "source", "n_chars",
        F.when(F.col("op") == "I", "I")
        .when(F.col("op") == "D", "D")
        .otherwise("U")
        .alias("op"),
        F.lit(1).cast("long").alias("seq"),
    )
    rebuilt = apply_changes(old, imaged, ["doc_id"])
    a = {tuple(r) for r in rebuilt.select(sorted(rebuilt.columns)).collect()}
    b = {tuple(r) for r in new.select(sorted(new.columns)).collect()}
    assert a == b and len(a) > 0


def test_sketch_profile_merge_matches_full_scan_estimate(spark, sf_dir):
    """HLL-sketch profiles merged across two halves give the same
    distinct estimate as one full-scan profile — the mergeable form
    merge_profiles' NULL refusal points at."""
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.profile import (
        merge_profile_sketches,
        profile_columns_sketch,
    )
    from ups_crossref_etl_spark.sources.lake import read_table

    d = read_table(spark, sf_dir, "documents")
    p1 = profile_columns_sketch(d.filter(F.col("doc_id") < 25), ["source"])
    p2 = profile_columns_sketch(d.filter(F.col("doc_id") >= 25), ["source"])
    merged = merge_profile_sketches(p1, p2).collect()[0]
    full = profile_columns_sketch(d, ["source"]).collect()[0]
    assert merged["n_rows"] == full["n_rows"]
    assert merged["n_distinct_est"] == full["n_distinct_est"]
    exact = d.select("source").distinct().count()
    assert abs(merged["n_distinct_est"] - exact) <= max(1, exact // 20)


def test_wav_fingerprint_matches_same_melody(spark):
    """Two clips of the same tone sequence (one at half amplitude) share
    many constellation hashes; an unrelated sequence shares few."""
    import numpy as np
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.multimodal import (
        fingerprint_matches,
        wav_encode_pcm16,
        wav_fingerprints,
    )

    rate, frame = 8000, 256

    def tone_seq(freq_bins, amp):
        xs = []
        for k in freq_bins:  # bin-aligned tones, 4 frames each
            t = np.arange(frame * 4)
            xs.append(amp * np.sin(2 * np.pi * (k * rate / frame) * t / rate))
        return wav_encode_pcm16(
            list((np.concatenate(xs) * 20000).astype(int)), rate
        )

    melody = [5, 9, 14, 7, 11]
    other = [22, 3, 17, 25, 8]
    clips = [
        Row(asset_id=1, payload=bytearray(tone_seq(melody, 1.0))),
        Row(asset_id=2, payload=bytearray(tone_seq(melody, 0.5))),
        Row(asset_id=3, payload=bytearray(tone_seq(other, 1.0))),
    ]
    fp = wav_fingerprints(spark.createDataFrame(clips))
    m = {(r["id_a"], r["id_b"]): r["n_shared"]
         for r in fingerprint_matches(fp, min_shared=1).collect()}
    assert m.get((1, 2), 0) >= 20          # same melody -> strong match
    assert m.get((1, 3), 0) < m[(1, 2)] / 4  # unrelated -> weak/no match


def test_filterspec_compiles_and_rejects_typos(spark):
    from pyspark.sql import Row

    import pytest as _pytest

    from ups_crossref_etl_spark.functions.filterspec import compile_filter

    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=5, b="y"), Row(a=9, b=None)]
    )
    spec = {"or": [{"col": "a", "op": "ge", "value": 9},
                   {"and": [{"col": "b", "op": "eq", "value": "x"},
                            {"col": "a", "op": "lt", "value": 3}]}]}
    got = {r["a"] for r in df.filter(compile_filter(spec)).collect()}
    assert got == {1, 9}
    with _pytest.raises(ValueError):
        compile_filter({"col": "a", "op": "equals", "value": 1})  # typo
    with _pytest.raises(ValueError):
        compile_filter({"and": []})

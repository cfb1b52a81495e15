"""Round-13 operator unit tests: variable-length exact-substring dedup
(operators/spans.long_repeated_spans) vs hand-built plants and a pure-
python mirror of the seeds-then-islands semantics; ALS driver-solve /
distributed-solve path agreement (r12 verdict #5)."""

from __future__ import annotations

import hashlib
import random


def _mirror(rows, t, min_docs):
    """Pure-python long_repeated_spans: rows = (doc_id, token list).
    Returns {(doc, start, end, length, verbatim_docs)} with 1-based
    inclusive positions."""
    grams: dict[tuple, set] = {}
    for doc, toks in rows:
        for i in range(len(toks) - t + 1):
            grams.setdefault(tuple(toks[i : i + t]), set()).add(doc)
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    intervals = []
    for doc, toks in rows:
        seeds = [
            i + 1
            for i in range(len(toks) - t + 1)
            if tuple(toks[i : i + t]) in dup
        ]
        run_s = None
        prev = None
        for p in seeds + [None]:
            if p is not None and prev is not None and p == prev + 1:
                prev = p
                continue
            if run_s is not None:
                intervals.append((doc, run_s, prev + t - 1))
            run_s, prev = p, p
    share: dict[str, set] = {}
    for doc, s, e in intervals:
        toks = dict(rows)[doc]
        h = hashlib.md5(" ".join(toks[s - 1 : e]).encode()).hexdigest()
        share.setdefault(h, set()).add(doc)
    out = set()
    for doc, s, e in intervals:
        toks = dict(rows)[doc]
        h = hashlib.md5(" ".join(toks[s - 1 : e]).encode()).hexdigest()
        out.add((doc, s, e, e - s + 1, len(share[h])))
    return out


def test_long_repeated_spans_planted_600_token_repeat(spark):
    """The r12 verdict's acceptance plant: a 600-token verbatim block
    shared by two docs must surface as ONE full-length interval per
    doc — not fixed-width n-gram windows."""
    from ups_crossref_etl_spark.operators.spans import long_repeated_spans

    block = [f"b{i}z" for i in range(600)]  # internally repeat-free
    a = [f"pa{i}" for i in range(30)] + block + [f"sa{i}" for i in range(25)]
    b = [f"pb{i}" for i in range(10)] + block + [f"sb{i}" for i in range(5)]
    c = [f"cc{i}" for i in range(80)]  # no shared material
    d = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b)), (3, " ".join(c))],
        ["doc_id", "text"],
    )
    rows = long_repeated_spans(d, "text", "doc_id", min_len=20, min_docs=2)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"],
         r["verbatim_docs"])
        for r in rows.collect()
    }
    assert got == {
        (1, 31, 630, 600, 2),
        (2, 11, 610, 600, 2),
    }


def test_long_repeated_spans_chained_overlap_not_verbatim(spark):
    """Overlapping repeats against DIFFERENT partners chain into one
    maximal interval whose full text no other doc shares — the
    verbatim_docs flag must say so (1), while each partner's own
    interval is also unshared as a whole."""
    from ups_crossref_etl_spark.operators.spans import long_repeated_spans

    base = [f"t{i}q" for i in range(60)]
    a = base  # [1..60]
    b = [f"pb{i}" for i in range(5)] + base[:40]  # shares a[1..40]
    c = base[20:] + [f"sc{i}" for i in range(5)]  # shares a[21..60]
    d = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b)), (3, " ".join(c))],
        ["doc_id", "text"],
    )
    rows = long_repeated_spans(d, "text", "doc_id", min_len=20, min_docs=2)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"],
         r["verbatim_docs"])
        for r in rows.collect()
    }
    # doc 1: dup seed starts 1..21 (vs doc 2) and 21..41 (vs doc 3)
    # chain into [1, 60]; docs 2/3 each carry their own 40-token block
    assert got == {
        (1, 1, 60, 60, 1),
        (2, 6, 45, 40, 1),
        (3, 1, 40, 40, 1),
    }


def test_long_repeated_spans_matches_python_mirror(spark):
    """Randomized small-vocab corpus (repeats arise by chance) against
    the pure-python mirror — exact set equality including verbatim
    counts."""
    from ups_crossref_etl_spark.operators.spans import long_repeated_spans

    rng = random.Random(13)
    vocab = ["aa", "bb", "cc"]
    rows = [
        (i, [rng.choice(vocab) for _ in range(rng.randint(0, 30))])
        for i in range(12)
    ]
    expected = _mirror(rows, t=3, min_docs=2)
    d = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in rows], ["doc_id", "text"]
    )
    out = long_repeated_spans(d, "text", "doc_id", min_len=3, min_docs=2)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"],
         r["verbatim_docs"])
        for r in out.collect()
    }
    assert got == expected


def test_long_repeated_spans_min_docs_threshold(spark):
    """min_docs=3: a block shared by only two docs must not seed."""
    from ups_crossref_etl_spark.operators.spans import long_repeated_spans

    blk = [f"k{i}m" for i in range(25)]
    d = spark.createDataFrame(
        [
            (1, " ".join(blk + ["ua"])),
            (2, " ".join(["ub"] + blk)),
            (3, " ".join([f"z{i}" for i in range(30)])),
        ],
        ["doc_id", "text"],
    )
    assert (
        long_repeated_spans(
            d, "text", "doc_id", min_len=20, min_docs=3
        ).count()
        == 0
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_len"], r["verbatim_docs"])
        for r in long_repeated_spans(
            d, "text", "doc_id", min_len=20, min_docs=2
        ).collect()
    }
    assert got == {(1, 1, 25, 2), (2, 2, 25, 2)}


# --------------------------------------------------------------------------
# ALS: bounded driver batch solve vs distributed Arrow solve
# --------------------------------------------------------------------------


def _als_fixture(spark):
    rows = []
    for u in range(25):
        for i in range(15):
            if (u * 5 + i * 2) % 3 == 0:
                rows.append((u, i, float(1 + (u % 4) * (1 + i % 3))))
    return spark.createDataFrame(rows, ["u", "i", "r"])


def test_als_driver_and_distributed_paths_agree(spark, monkeypatch):
    """The threshold-gated driver batch solve (r12 verdict #5, the cox
    _DRIVER_TIME_TABLE_MAX pattern) must produce the same factors as
    the Arrow pandas_udf path — same sufficient statistics, same
    np.linalg.solve; only the physical plan differs."""
    from ups_crossref_etl_spark.operators import factorization as fz

    df = _als_fixture(spark)
    uf_d, vf_d = fz.als_factorize(df, "u", "i", "r", rank=3, reg=0.1,
                                  iterations=2)
    driver = {r["u"]: list(r["factors"]) for r in uf_d.collect()}

    monkeypatch.setattr(fz, "_DRIVER_SOLVE_MAX", -1)
    uf_x, vf_x = fz.als_factorize(df, "u", "i", "r", rank=3, reg=0.1,
                                  iterations=2)
    dist = {r["u"]: list(r["factors"]) for r in uf_x.collect()}

    assert set(driver) == set(dist)
    for k, fd in driver.items():
        for a, b in zip(fd, dist[k]):
            assert abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))


def test_als_driver_path_plans(spark, monkeypatch):
    """Plan pins for BOTH solve paths: the bounded path's factor table
    is a local relation (no pandas_udf stage anywhere in the fit); the
    distributed path keeps the Arrow solve."""
    from ups_crossref_etl_spark.operators import factorization as fz

    df = _als_fixture(spark)
    uf, _ = fz.als_factorize(df, "u", "i", "r", rank=3, reg=0.1,
                             iterations=1)
    plan_d = uf._jdf.queryExecution().executedPlan().toString()
    # driver-solved factors enter the plan as a local table (Arrow ->
    # LocalTableScan) with NO Python eval stage anywhere
    assert "ArrowEvalPython" not in plan_d
    assert "LocalTableScan" in plan_d or "Scan ExistingRDD" in plan_d

    # distributed path: pin the half-step output BEFORE the
    # localCheckpoint truncates the plan (memory: shapes above a
    # checkpoint are invisible in the final plan)
    monkeypatch.setattr(fz, "_DRIVER_SOLVE_MAX", -1)
    item_f = fz._init_factors(
        df.select("i").distinct(), "i", rank=3
    )
    half = fz._solve_side(
        df, "u", "i", "r", item_f, 3, 0.1, n_solve=25, n_fixed=15
    )
    plan_x = half._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan_x
    # bounded fixed side must broadcast into the ratings join
    assert "BroadcastHashJoin" in plan_x


# --------------------------------------------------------------------------
# Fixed-cost wave 2: stream-tier conf scoping + max-coverage broadcast path
# --------------------------------------------------------------------------


def test_scoped_shuffle_partitions_reaches_foreachbatch_and_restores(
    spark, tmp_path
):
    """The production sizing rule (plans/streaming_queries) only works if
    the conf scoped around ``start()`` is what foreachBatch jobs see —
    the sink runs on the stream's CLONED session, which snapshots the
    conf at start. Pin both halves: the scoped value inside the sink,
    and the session default restored immediately after start()."""
    from ups_crossref_etl_spark.streaming.events import (
        scoped_shuffle_partitions,
    )

    src = str(tmp_path / "src")
    spark.range(10).selectExpr("id", "id % 3 AS k").write.parquet(src)
    seen: list[str] = []

    def sink(batch_df, _bid):
        seen.append(
            batch_df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )

    stream = spark.readStream.schema("id long, k long").parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with scoped_shuffle_partitions(spark, 5):
        q = stream.writeStream.foreachBatch(sink).start()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen and all(v == "5" for v in seen)


def test_scoped_shuffle_partitions_none_is_noop(spark):
    from ups_crossref_etl_spark.streaming.events import (
        scoped_shuffle_partitions,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with scoped_shuffle_partitions(spark, None):
        assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def _coverage_fixture(spark):
    docs = [
        (i, " ".join(f"w{(i * 7 + j) % 60}" for j in range(25)))
        for i in range(30)
    ]
    return spark.createDataFrame(docs, ["doc_id", "text"])


def test_max_coverage_broadcast_and_distributed_paths_agree(
    spark, monkeypatch
):
    """The threshold-gated broadcast of the covered set (bounded by
    k x max distinct shingles per doc; exact size known on the driver
    as the sum of past gains) must not change the greedy selection —
    only the join's physical side."""
    from ups_crossref_etl_spark.operators import selection as sel

    df = _coverage_fixture(spark)
    bcast = [tuple(r) for r in sel.max_coverage_select(df, k=4).collect()]

    monkeypatch.setattr(sel, "_BROADCAST_COVERED_MAX", -1)
    dist = [tuple(r) for r in sel.max_coverage_select(df, k=4).collect()]
    assert bcast == dist
    assert len(bcast) >= 2


def test_max_coverage_rounds_never_shuffle_token_table_by_token(
    spark, monkeypatch
):
    """r13 fixed-cost pin: on the broadcast path every per-round
    marginal-gain job anti-joins the checkpointed (doc, token) table
    against a BROADCAST covered set — no round may re-shuffle the
    corpus-sized table by token (the pre-r13 shape exchanged it on _t
    every round). The winner job is pinned via a collect spy (the gains
    frame is consumed by limit(1).collect, never checkpointed)."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from ups_crossref_etl_spark.operators import selection as sel

    captured: list[str] = []
    orig = CDF.collect

    def spy(self, *a, **k):
        captured.append(self._jdf.queryExecution().executedPlan().toString())
        return orig(self, *a, **k)

    monkeypatch.setattr(CDF, "collect", spy)
    sel.max_coverage_select(_coverage_fixture(spark), k=4)
    gains = [p for p in captured if "TakeOrderedAndProject" in p]
    assert len(gains) >= 3
    for p in gains:
        assert "Exchange hashpartitioning(_t" not in p
        assert "Exchange SinglePartition" not in p
    # rounds 2+ carry the covered anti-join as a broadcast build
    for p in gains[1:]:
        assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_bpe_train_driver_and_distributed_paths_agree(spark, monkeypatch):
    """The vocab-bounded driver BPE merge loop (r13, the cox/ALS
    driver-reduction pattern) must learn the IDENTICAL merge list as
    the distributed Arrow-UDF loop — same pair counts, same
    (count desc, 'lo hi' asc) tie-break, same leftmost-first
    _merge_word application; only the physical execution differs."""
    from ups_crossref_etl_spark.operators import bpe

    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "a rat sat where the cat sat",
        "banana bandana cabana",
        "scattered cats chatter",
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    driver = bpe.bpe_train(df, "text", n_merges=8)
    monkeypatch.setattr(bpe, "_DRIVER_MERGE_MAX", -1)
    dist = bpe.bpe_train(df, "text", n_merges=8)
    assert driver == dist and len(driver) == 8

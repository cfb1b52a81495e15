"""Streaming operators: stream results must equal the batch twins on the
same static input (the file source drives one micro-batch end-to-end)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ups_crossref_etl_spark.sources.lake import read_table
from ups_crossref_etl_spark.streaming import events as se


@pytest.fixture()
def batch_events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


def _drain(spark, stream_df, name, mode="complete"):
    q = se.run_to_memory(stream_df, name, output_mode=mode)
    try:
        return spark.table(name).collect()
    finally:
        q.stop()


def test_tumbling_stream_equals_batch(spark, sf_dir, batch_events):
    got = _drain(spark, se.tumbling_counts(se.stream_events(spark, sf_dir)), "t_tumble")
    want = (
        batch_events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
                "event_type", "n_events", "total_value")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_session_stream_counts(spark, sf_dir, batch_events):
    got = _drain(spark, se.session_counts(se.stream_events(spark, sf_dir)), "t_sess")
    # session_window semantics: total events preserved, sessions per user ≥ 1
    assert sum(r["n_events"] for r in got) == batch_events.count()
    users = {r["user_id"] for r in got}
    assert users == {r["user_id"] for r in batch_events.select("user_id").distinct().collect()}


def test_sliding_avg_runs(spark, sf_dir):
    got = _drain(spark, se.sliding_avg(se.stream_events(spark, sf_dir)), "t_slide")
    assert len(got) > 0
    # every event lands in exactly window/slide = 2 overlapping windows;
    # row count ≈ 2× the tumbling row count — sanity-bound it
    assert len({(r["win_start"], r["event_type"]) for r in got}) == len(got)


def test_running_user_totals_stateful(spark, sf_dir, batch_events):
    got = _drain(
        spark,
        se.running_user_totals(se.stream_events(spark, sf_dir)),
        "t_state",
        mode="update",
    )
    # one final state row per user (single micro-batch → one update each)
    by_user = {r["user_id"]: r for r in got}
    want = (
        batch_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    )
    for w in want:
        g = by_user[w["user_id"]]
        assert g["n_events"] == w["n"]
        assert abs(g["total_value"] - w["tv"]) < 0.05


def test_foreachbatch_idempotent_sink(spark, sf_dir, batch_events):
    with tempfile.TemporaryDirectory() as td:
        target = os.path.join(td, "sink")
        small = batch_events.limit(100)
        se.write_idempotent(small, target, ["event_id"])
        se.write_idempotent(small, target, ["event_id"])  # replay → no growth
        assert spark.read.parquet(target).count() == 100
        se.write_idempotent(batch_events.limit(150), target, ["event_id"])
        assert spark.read.parquet(target).count() == 150


def test_stream_stream_interval_join_equals_batch_range_join(spark, sf_dir, batch_events):
    from ups_crossref_etl_spark.operators.rangejoin import range_join

    s1 = se.stream_events(spark, sf_dir)
    s2 = se.stream_events(spark, sf_dir)
    got = _drain(
        spark,
        se.stream_stream_interval_join(s1, s2),
        "t_ssjoin",
        mode="append",
    )
    errors = batch_events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("l_event"), "user_id", "ts"
    )
    purchases = batch_events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_event"), "user_id", "ts"
    )
    want = range_join(
        errors, purchases, by="user_id", on="ts", before_s=600, after_s=600
    ).select("l_event", F.col("r_r_event").alias("r_event"), "user_id")
    assert sorted(map(tuple, got)) == sorted(map(tuple, want.collect()))


def test_checkpoint_restart_exactly_once(spark, sf_dir, batch_events):
    """foreachBatch + checkpointed offsets across a stop/restart: the
    second run must pick up only the new file, and the idempotent sink
    must hold even if a batch were replayed (K3 anti-join append)."""
    import shutil

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        ckpt = os.path.join(td, "ckpt")
        sink = os.path.join(td, "sink")
        os.makedirs(src)
        # first file: events 0..499; second file arrives "later"
        first = batch_events.filter(F.col("event_id") < 500)
        second = batch_events.filter(F.col("event_id") >= 500)
        first.coalesce(1).write.parquet(os.path.join(td, "f1"))
        for f in os.listdir(os.path.join(td, "f1")):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(td, "f1", f), os.path.join(src, "a.parquet"))

        def start():
            stream = spark.readStream.schema(first.schema).parquet(src)
            return (
                stream.writeStream.foreachBatch(
                    lambda df, epoch: se.write_idempotent(df, sink, ["event_id"])
                )
                .option("checkpointLocation", ckpt)
                .start()
            )

        q = start()
        q.processAllAvailable()
        q.stop()
        n1 = spark.read.parquet(sink).count()
        assert n1 == first.count()

        second.coalesce(1).write.parquet(os.path.join(td, "f2"))
        for f in os.listdir(os.path.join(td, "f2")):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(td, "f2", f), os.path.join(src, "b.parquet"))
        q = start()  # restart from the same checkpoint
        q.processAllAvailable()
        q.stop()
        total = spark.read.parquet(sink)
        assert total.count() == batch_events.count()
        assert total.select("event_id").distinct().count() == batch_events.count()


def test_watermark_drops_late_data(spark, sf_dir):
    """Append-mode windowed agg with a watermark: a second micro-batch
    carrying events far older than (max_ts - watermark) must not resurrect
    closed windows. Two files drive two micro-batches through one query."""
    import shutil

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        os.makedirs(src)
        schema = "event_id bigint, ts string, event_type string, value double"
        fresh = spark.createDataFrame(
            [(1, "2024-02-01 10:00:00", "a", 1.0),
             (2, "2024-02-01 12:00:00", "a", 1.0)],
            schema,
        ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")
        late = spark.createDataFrame(
            [(3, "2024-02-01 10:00:30", "a", 1.0)],  # 2h late, watermark 10min
            schema,
        ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")

        def add(df, name):
            tmp = os.path.join(td, name + "_stage")
            df.coalesce(1).write.parquet(tmp)
            for f in os.listdir(tmp):
                if f.endswith(".parquet"):
                    shutil.copy(os.path.join(tmp, f), os.path.join(src, name))

        add(fresh, "a.parquet")
        stream = spark.readStream.schema(fresh.schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory").queryName("t_late")
            .outputMode("append").start()
        )
        try:
            q.processAllAvailable()  # batch 1: watermark advances to ~11:50
            add(late, "b.parquet")
            q.processAllAvailable()  # batch 2: late event beyond watermark
            rows = spark.table("t_late").collect()
        finally:
            q.stop()
        # the 10:00 window was finalized with exactly the on-time event;
        # the late arrival neither reopened it nor produced a new row
        n_1000 = [r["n"] for r in rows if r["window"].start.minute == 0
                  and r["window"].start.hour == 10]
        assert n_1000 == [1]


def test_streaming_dedup_across_microbatches(spark):
    """dropDuplicatesWithinWatermark semantics across micro-batches: a
    re-delivery of an already-seen (user, bucket) key in a later batch is
    dropped while the key is still within the watermark horizon; a new
    bucket passes. Two files drive two micro-batches."""
    import shutil

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        os.makedirs(src)
        schema = "event_id bigint, ts string, user_id bigint, event_type string, value double"

        def mk(rows):
            return spark.createDataFrame(rows, schema).selectExpr(
                "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
                "event_type", "value"
            )

        first = mk([
            (1, "2024-02-01 10:00:00", 7, "a", 1.0),
            (2, "2024-02-01 10:02:00", 7, "a", 1.0),  # same 5-min bucket as 1
            (3, "2024-02-01 10:00:00", 8, "a", 1.0),  # other user, kept
        ])
        second = mk([
            (4, "2024-02-01 10:01:00", 7, "a", 1.0),  # re-delivery, same bucket -> drop
            (5, "2024-02-01 10:20:00", 7, "a", 1.0),  # new bucket -> keep
        ])

        def add(df, name):
            tmp = os.path.join(td, name + "_stage")
            df.coalesce(1).write.parquet(tmp)
            for f in os.listdir(tmp):
                if f.endswith(".parquet"):
                    shutil.copy(os.path.join(tmp, f), os.path.join(src, name))

        add(first, "a.parquet")
        stream = spark.readStream.schema(first.schema).parquet(src)
        dedup = se.dedup_user_bucket(stream, bucket="5 minutes", watermark="1 hour")
        q = (
            dedup.writeStream.format("memory").queryName("t_dedup2")
            .outputMode("append").start()
        )
        try:
            q.processAllAvailable()
            add(second, "b.parquet")
            q.processAllAvailable()
            got = spark.table("t_dedup2").collect()
        finally:
            q.stop()
        keys = sorted((r["user_id"], r["wstart"].strftime("%H:%M")) for r in got)
        assert keys == [(7, "10:00"), (7, "10:20"), (8, "10:00")]


def test_stream_corpus_dedup_matches_batch(spark, sf_dir):
    """Streaming incremental dedup (stream-static anti-join + streaming
    agg) must equal the batch exact-dedup semantics on the same input."""
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.dedup import corpus_dedup_state
    from ups_crossref_etl_spark.sources.lake import read_table
    from ups_crossref_etl_spark.streaming import events as se

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    hashes, _, _ = corpus_dedup_state(corpus, "text", "doc_id")
    stream = se.stream_documents(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    q = se.run_to_memory(
        se.stream_corpus_dedup(stream, hashes), "t_corpus_dedup", "complete"
    )
    q.stop()
    got = {r["_h"]: r["n_rows"] for r in spark.table("t_corpus_dedup").collect()}
    want = {
        r["_h"]: r["n"]
        for r in docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("_h", F.md5("text"))
        .join(hashes, "_h", "left_anti")
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_running_user_stats_gated_or_runs(spark, sf_dir):
    """transformWithStateInPandas needs google.protobuf (absent in this
    container): the operator must fail FAST with a clear error rather
    than crash the streaming python runner mid-query. If the dependency
    is ever present, the operator must run and match the legacy-API twin
    row-for-row."""
    import pytest

    from ups_crossref_etl_spark.streaming import events as se

    if not se.tws_available():
        with pytest.raises(RuntimeError, match="protobuf"):
            se.running_user_stats(se.stream_events(spark, sf_dir))
        return
    out = se.run_to_memory(
        se.running_user_stats(se.stream_events(spark, sf_dir)),
        "tws_stats", "update",
    )
    try:
        got = spark.table("tws_stats").count()
        assert got > 0
    finally:
        out.stop()


def test_late_data_accounting_nonzero_drops(spark, tmp_path):
    """Late-heavy fixture: batch 1 advances the watermark an hour past
    batch 2's event times, so the windowed aggregation must DROP batch
    2's rows — and both the push (LateDataListener) and pull
    (late_drop_stats) ledgers must see it: all rows observed on the way
    in, a nonzero numRowsDroppedByWatermark, and the dropped rows absent
    from the result."""
    import datetime as dt
    import time

    src = tmp_path / "late_events"
    src.mkdir()
    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )

    # batch 1: fresh events spanning an hour (watermark -> 12:50);
    # batch 2: more fresh events — needed because the LATE-EVENTS filter
    # uses the watermark committed at the END of the previous batch (one
    # batch behind the eviction watermark shown in progress);
    # batch 3: events from 2 hours before the watermark -> dropped.
    fresh = [(i, t0 + dt.timedelta(minutes=i), 1, "click", 1.0) for i in range(0, 61, 10)]
    fresh2 = [(200 + i, t0 + dt.timedelta(hours=1, minutes=1 + i), 1, "click", 1.0) for i in range(3)]
    late = [(100 + i, t0 - dt.timedelta(hours=2, minutes=i), 2, "click", 1.0) for i in range(3)]
    now = time.time()
    for i, (name, df) in enumerate(
        (("b1.parquet", mk(fresh)), ("b2.parquet", mk(fresh2)), ("b3.parquet", mk(late)))
    ):
        d = str(src / name)
        df.coalesce(1).write.parquet(d)
        # file source processes oldest-modified first; force b1<b2<b3
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (now - 300 + i * 60, now - 300 + i * 60))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    listener = se.LateDataListener()
    spark.streams.addListener(listener)
    try:
        q = se.run_to_memory(
            se.tumbling_counts_with_late_audit(stream, watermark="10 minutes"),
            "t_late_audit",
            output_mode="append",
        )
        try:
            stats = se.late_drop_stats(q)
            rows = spark.table("t_late_audit").collect()
            # listener events are delivered on a separate thread — wait
            # for it to drain before comparing the two ledgers
            deadline = time.time() + 15
            while (
                listener.n_input < stats["n_input"] and time.time() < deadline
            ):
                time.sleep(0.2)
        finally:
            q.stop()
    finally:
        spark.streams.removeListener(listener)

    assert stats["n_input"] == len(fresh) + len(fresh2) + len(late)  # observe saw every row
    # the metric counts post-partial-agg GROUPS at the state operator;
    # the 3 late rows form 2 windows -> >= 1 is the robust bound
    assert stats["n_dropped"] >= 1
    assert listener.n_input == stats["n_input"]        # push == pull ledger
    assert listener.n_dropped == stats["n_dropped"]
    # and the dropped rows are really absent from the emitted windows
    assert sum(r["n_events"] for r in rows) <= len(fresh) + len(fresh2)


def test_trending_topk_matches_batch_rank(spark, sf_dir):
    """The per-trigger rank over maintained counts must equal the batch
    rank over the same tumbling counts (single-file stream -> the final
    trigger sees everything)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.sources.lake import read_table
    from ups_crossref_etl_spark.streaming import events as se

    got = {
        tuple(r)
        for r in se.trending_topk(se.stream_events(spark, sf_dir)).collect()
    }
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("win").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    exp = {
        tuple(r)
        for r in (
            ev.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select(
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "win_start"
                ),
                "event_type",
                F.col("n_events").cast("long"),
                F.col("rank").cast("long"),
            )
            .collect()
        )
    }
    assert got == exp and len(got) > 0


def _chg(spark, rows):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [Row(k=k, v=v, op=op, seq=seq) for (k, v, op, seq) in rows]
    )


def test_merge_cdc_state_commutative_and_tombstones(spark):
    b1 = _chg(spark, [(1, "a1", "U", 10), (2, "b1", "U", 11), (3, "c1", "D", 12)])
    b2 = _chg(spark, [(1, "a0", "U", 5), (2, "b2", "U", 20), (3, "c0", "U", 7)])

    def apply_seq(batches):
        st = None
        for b in batches:
            st = se.merge_cdc_state(st, b, ["k"])
        return {r["k"]: (r["v"], r["op"], r["seq"]) for r in st.collect()}

    fwd, rev = apply_seq([b1, b2]), apply_seq([b2, b1])
    assert fwd == rev
    # stale lower-seq update must NOT resurrect the deleted key
    assert fwd[3] == ("c1", "D", 12)
    assert fwd[1] == ("a1", "U", 10) and fwd[2] == ("b2", "U", 20)


def test_merge_cdc_state_delete_wins_seq_tie(spark):
    b = _chg(spark, [(1, "x", "U", 10), (1, "y", "D", 10)])
    st = se.merge_cdc_state(None, b, ["k"])
    assert st.collect()[0]["op"] == "D"


def test_stream_cdc_apply_matches_batch_apply(spark, sf_dir, tmp_path):
    """Change files streamed one-per-trigger through stream_cdc_apply
    converge to exactly apply_changes(snapshot, all_changes)."""
    from ups_crossref_etl_spark.operators.cdc import apply_changes

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    orders = read_table(spark, sf_dir, "orders")
    changes = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        "c_custkey",
        "c_name",
        F.round("o_totalprice", 2).alias("c_acctbal"),
        F.when(F.col("o_orderstatus") == "P", "D").otherwise("U").alias("op"),
        F.col("o_orderkey").alias("seq"),
    )

    # seed state = snapshot rows as op=U, seq=0 (below every orderkey)
    state_path = str(tmp_path / "state")
    cust.withColumn("op", F.lit("U")).withColumn(
        "seq", F.lit(0).cast("long")
    ).write.parquet(state_path)

    # change feed as several files, streamed one file per trigger
    feed = str(tmp_path / "feed")
    changes.repartition(4).write.parquet(feed)
    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = se.stream_cdc_apply(stream, state_path, ["c_custkey"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["c_custkey"]: (r["c_name"], r["c_acctbal"])
        for r in se.cdc_current(spark, state_path).collect()
    }
    want = {
        r["c_custkey"]: (r["c_name"], r["c_acctbal"])
        for r in apply_changes(cust, changes, ["c_custkey"]).collect()
    }
    assert got == want and len(got) > 0


def test_stream_cdc_apply_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill the CDC stream mid-feed, restart from the checkpoint, add more
    files: the state converges to the full batch apply (replay of an
    in-flight batch is harmless — the LWW merge is idempotent)."""
    from pyspark.sql import Row

    from ups_crossref_etl_spark.operators.cdc import apply_changes

    snap = spark.createDataFrame([Row(k=i, v=f"v{i}") for i in range(20)])
    state_path = str(tmp_path / "state")
    snap.withColumn("op", F.lit("U")).withColumn(
        "seq", F.lit(0).cast("long")
    ).write.parquet(state_path)

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    c1 = [Row(k=1, v="a", op="U", seq=10), Row(k=2, v="b", op="D", seq=11)]
    c2 = [Row(k=1, v="c", op="U", seq=20), Row(k=3, v="d", op="U", seq=21)]
    spark.createDataFrame(c1).coalesce(1).write.mode("append").parquet(feed)

    schema = "k bigint, v string, op string, seq bigint"

    def start_cdc():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        return se.stream_cdc_apply(stream, state_path, ["k"], checkpoint=ckpt)

    q = start_cdc()
    q.processAllAvailable()
    q.stop()
    spark.createDataFrame(c2).coalesce(1).write.mode("append").parquet(feed)
    q = start_cdc()
    q.processAllAvailable()
    q.stop()

    got = {r["k"]: r["v"] for r in se.cdc_current(spark, state_path).collect()}
    changes = spark.createDataFrame(c1 + c2)
    want = {r["k"]: r["v"] for r in apply_changes(snap, changes, ["k"]).collect()}
    assert got == want
    assert 2 not in got and got[1] == "c" and got[3] == "d"


def test_stream_psi_monitor_equals_batch_psi(spark, sf_dir, batch_events):
    """Streaming PSI over the static events file equals the batch
    psi_drift total (same micro-unit arithmetic end to end)."""
    from ups_crossref_etl_spark.operators.profile import psi_drift

    cutoffs = [10.0, 25.0, 50.0, 100.0, 200.0]
    ref = batch_events.filter(
        F.col("value").isNotNull()
        & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    )
    # reference fractions from the first half (4dp, like the monitor input)
    n_ref = ref.count()
    from pyspark.sql import functions as SF

    b = SF.lit(len(cutoffs))
    for i, c in enumerate(reversed(cutoffs)):
        b = SF.when(SF.col("value") < SF.lit(c), SF.lit(len(cutoffs) - 1 - i)).otherwise(b)
    rc = {int(r["bin"]): int(r["n"]) for r in
          ref.select(b.alias("bin")).groupBy("bin").agg(SF.count(SF.lit(1)).alias("n")).collect()}
    ref_fracs = [rc.get(i, 0) / n_ref for i in range(len(cutoffs) + 1)]

    q, result = se.stream_psi_monitor(
        se.stream_events(spark, sf_dir), "value", cutoffs, ref_fracs
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert result, "monitor produced no trigger output"
    n_stream, psi_stream = result[0]

    want = psi_drift(ref, batch_events, "value", cutoffs).filter(
        F.col("bin") == -1
    ).collect()[0]["term"]
    assert n_stream == batch_events.filter(F.col("value").isNotNull()).count()
    assert abs(psi_stream - want) <= 0.0003  # ref-frac rounding slack


def test_stream_stream_outer_join_emits_unmatched_after_watermark(
    spark, sf_dir, tmp_path
):
    """Left-outer stream-stream join: an error with no purchase within
    the interval emits with NULL once the watermark passes — driven by a
    second file far enough in the future to advance the watermark."""
    import datetime as dt

    from pyspark.sql import Row

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    data = [
        Row(event_id=1, ts=t0, user_id=7, event_type="error",
            value=1.0, props="{}"),
        Row(event_id=2, ts=t0 + dt.timedelta(seconds=60), user_id=7,
            event_type="purchase", value=1.0, props="{}"),
        Row(event_id=3, ts=t0, user_id=8, event_type="error",
            value=1.0, props="{}"),  # no purchase -> must still emit
    ]
    flush = [
        Row(event_id=99, ts=t0 + dt.timedelta(hours=3), user_id=9,
            event_type="error", value=1.0, props="{}"),
        Row(event_id=98, ts=t0 + dt.timedelta(hours=3), user_id=9,
            event_type="purchase", value=1.0, props="{}"),
    ]
    feed = str(tmp_path / "feed")
    spark.createDataFrame(data).coalesce(1).write.mode("append").parquet(feed)
    first_wave = {f for f in os.listdir(feed) if f.endswith(".parquet")}
    spark.createDataFrame(flush).coalesce(1).write.mode("append").parquet(feed)
    # FileStreamSource orders files by mtime; back-to-back writes can tie
    # at fs granularity — pin the data files strictly before the flush file
    now = os.path.getmtime(feed)
    for f in os.listdir(feed):
        if f.endswith(".parquet"):
            t = now if f in first_wave else now + 100
            os.utime(os.path.join(feed, f), (t, t))

    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    out = se.stream_stream_interval_join_outer(
        stream, stream, within_s=600, watermark="10 minutes"
    )
    name = "_outer_join_test"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r["l_event"], r["r_event"]) for r in spark.table(name).collect()}
    assert (1, 2) in rows          # matched pair
    assert (3, None) in rows       # unmatched error emitted with NULL

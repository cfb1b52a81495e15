"""Structured Streaming operators over the ``events`` stream.

The reference's ingest loop is a cursor-paginated incremental batch
(SURVEY.md §2.9): offsets in ``Runs``, one committed micro-batch per API
page, idempotent insert-or-ignore. These are its Spark-native equivalents,
plus the windowed/watermarked operators a real event stream needs:

- tumbling/sliding window aggregates with late-data watermark
- session windows (native ``session_window``)
- custom stateful per-key running totals (``applyInPandasWithState``)
- an idempotent ``foreachBatch`` sink (anti-join append = INSERT OR IGNORE)

Batch twins of the windowed aggregates live in
``plans/events_queries.py`` — the driver's oracle gate covers those; the
streaming tests assert stream == batch on the same input.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from contextlib import contextmanager


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int | None):
    """Scope ``spark.sql.shuffle.partitions`` around a stream ``start()``.

    A streaming query freezes the conf into its cloned session at
    ``start()`` — both the in-plan stateful shuffles (state-store count
    tracks shuffle partitions: one provider per partition per stateful
    side) AND every batch job launched inside ``foreachBatch`` (the sink
    runs on the stream's cloned session, which snapshots the conf at
    start). Sizing rule as in ``plans/streaming_queries``: partitions
    follow per-trigger state/throughput, never the batch-analytics
    default — measured here (r13): the CDC foreachBatch merge (one
    anti-join + one winner join + state rewrite per trigger over a
    customer-sized snapshot) and the trending-topk stateful window agg
    both pay per-task/provider floors x32 under the session default.
    ``n=None`` leaves the session conf untouched.
    """
    if n is None:
        yield
        return
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (for tests/smoke: a static
    dir behaves as a one-batch stream; in production the same plan reads
    Kafka).

    The stream schema's ``ts`` type is taken from the actual parquet
    footer via a one-file batch-scan probe, NOT hardcoded — the testdata
    has shipped both TIMESTAMP(NANOS) (scans as long under
    ``nanosAsLong``; converted to micros below, like ``sources/lake``)
    and plain micros/``isAdjustedToUTC=false`` (scans as TIMESTAMP_NTZ,
    passed through). Hardcoding either encoding silently corrupts
    timestamps by 1000x when the lake is rewritten with the other."""
    import os as _os

    probe = spark.read.parquet(_os.path.join(sf_dir, "events.parquet")).schema
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", probe["ts"].dataType),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(probe["ts"].dataType, T.LongType):
        # legacy nanos-as-long: integer `div` (epoch-nanos overflow double)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(probe["ts"].dataType, T.TimestampNTZType):
        # watermarks/windows demand TIMESTAMP (LTZ): reinterpret the naive
        # wall clock as UTC — exact, since the session tz is pinned UTC
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


_DOCS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table — the landing stream a
    continuously-ingesting corpus pipeline consumes (in production the
    same plan tails a bucket prefix or Kafka topic of crawled docs)."""
    return (
        spark.readStream.schema(_DOCS_DDL)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def stream_corpus_dedup(
    docs: DataFrame, corpus_hashes: DataFrame, text_col: str = "text"
) -> DataFrame:
    """STREAMING incremental dedup against a static corpus — the streaming
    twin of ``operators/dedup.incremental_dedup``'s exact stage: each
    micro-batch content-hashes its documents and anti-joins the corpus
    hash table (stream-STATIC, so no join state or watermark bookkeeping;
    the static side is the precomputed ``dedup.corpus_dedup_state``
    hashes, re-read per micro-batch so a corpus refresh is picked up).
    A streaming aggregation then counts occurrences per surviving hash —
    tracking in-stream duplicates across micro-batches without picking an
    arrival-order-dependent survivor row (the count per content hash is
    deterministic; which physical row arrived first is not).

    Returns (``_h`` content hash, ``n_rows``) in complete/update mode.
    State = one counter per distinct surviving hash; bound it in
    production by keying the aggregation on (hash, ingest-day) and
    watermarking, once the stream carries an event-time column."""
    hashed = docs.withColumn("_h", F.md5(F.col(text_col)))
    survivors = hashed.join(corpus_hashes.select("_h"), "_h", "left_anti")
    return survivors.groupBy("_h").agg(F.count(F.lit(1)).alias("n_rows"))


def tumbling_counts(events: DataFrame, window: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window count+sum per event_type with a late-data watermark.
    Semantics match q_events_tumbling_5min (batch twin)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_avg(events: DataFrame, window: str = "10 minutes",
                slide: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Sliding-window mean value per event_type (overlapping windows).
    The mean is decimal-sum / count (see plans/money.py) so the result is
    accumulation-order-independent — double avg() over a shuffled stream
    can flip the rounded digit between runs."""
    from ..plans.money import DEC

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0)).cast(DEC)).alias("_s"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            F.round(F.col("_s").cast("double") / F.col("n_events"), 4).alias(
                "avg_value"
            ),
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    """Native session windows per user (streaming twin of the batch
    lag+cumsum sessionization in q_events_sessionize_30min)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def stream_static_enrich_filter(events: DataFrame, blocklist: DataFrame,
                                dims: DataFrame) -> DataFrame:
    """Stream-STATIC joins — the per-batch enrichment pattern: each
    micro-batch left-anti-joins a static blocklist (drop already-processed
    / banned keys) and broadcast-joins a static dimension table. The
    static sides are re-read per micro-batch (so a lake refresh is picked
    up) but never require state: unlike stream-stream joins there is no
    watermark bookkeeping, which is why enrich-against-lake should always
    be expressed stream-static, never stream-stream."""
    return (
        events.join(blocklist, "user_id", "left_anti")
        .join(F.broadcast(dims), "event_type", "inner")
    )


def dedup_user_bucket(events: DataFrame, bucket: str = "5 minutes",
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming deduplication: keep one event per (user, time bucket)
    with ``dropDuplicatesWithinWatermark`` — the state store evicts keys
    once the watermark passes, so state stays bounded by the watermark
    horizon (a plain ``dropDuplicates`` on a stream grows state forever —
    the scale failure mode at 100 TB/day). Which physical row survives a
    bucket is arrival-order-dependent; downstream consumers must key on
    the bucket, not the row payload (the gate query counts buckets)."""
    return (
        events.withWatermark("ts", watermark)
        .withColumn("wstart", F.window("ts", bucket).getField("start"))
        .dropDuplicatesWithinWatermark(["user_id", "wstart"])
    )


_STATE_SCHEMA = T.StructType(
    [T.StructField("total", T.DoubleType()), T.StructField("n", T.LongType())]
)
_RUNNING_OUT_DDL = "user_id bigint, n_events bigint, total_value double"


def _running_totals_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: per-user running totals across
    micro-batches. State survives between triggers (checkpointed); this is
    the applyInPandasWithState shape for operators Spark lacks natively."""
    import math

    if state.exists:
        total, n = state.get
    else:
        total, n = 0.0, 0
    for pdf in pdfs:
        # fsum: exact summation → the correctly-rounded double of the true
        # sum, independent of batch/row order (oracle-comparable)
        total = math.fsum([total, *pdf["value"].fillna(0.0).tolist()])
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Per-user lifetime totals via applyInPandasWithState (update mode)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=_RUNNING_OUT_DDL,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf for its state-
    server protocol; this container ships pyspark without it. Gate, don't
    crash mid-stream (the worker dies with an opaque
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE otherwise)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_stats(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Per-user lifetime stats via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API that supersedes ``applyInPandasWithState``
    (``running_user_totals`` keeps the legacy form; both are exercised).

    CAPABILITY-GATED: raises RuntimeError where the protobuf dependency
    is absent (``tws_available()``); the legacy-API twin
    ``running_user_totals`` covers the semantics in the driver gate
    (q_stream_running_user_totals), so the engine surface stays tested.
    Typed ValueState holds ``(n_events, total_micros, max_value)`` per
    user; ``ttl_ms`` demonstrates the built-in state-TTL eviction the old
    API lacked (pass None for lifetime state). Values carry <= 6 decimal
    places, so each row converts EXACTLY to integer micro-units and the
    running total accumulates in int64 — exact and batch-order-
    independent, matching the oracle's DECIMAL(18,6) sum; the 2-dp
    output rounding is integer half-away-from-zero, the same rule
    Spark/DuckDB ``round`` apply to decimals.

    Emits ``(user_id, n_events, total_value, max_value)`` per updated
    user each micro-batch (update mode)."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf, which "
            "is not installed in this environment; use "
            "running_user_totals (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "stats",
                "n_events bigint, total_micros bigint, max_value double",
                ttlDurationMs=ttl_ms,
            )

        def handleInputRows(self, key, rows, timerValues):
            n, micros, mx = (
                (self._st.get() or (0, 0, None)) if self._st.exists() else (0, 0, None)
            )
            for pdf in rows:
                vals = pdf["value"].fillna(0.0)
                n += len(pdf)
                # per-row micro-units are exact for <=6-dp values; int64
                # accumulation has no float-order drift
                micros += int((vals * 1e6).round().astype("int64").sum())
                batch_max = pdf["value"].max()
                if pd.notna(batch_max):
                    mx = float(batch_max) if mx is None else max(mx, float(batch_max))
            self._st.update((n, micros, mx))
            # 2-dp half-away-from-zero in integer space (decimal round rule)
            cents = (abs(micros) + 5000) // 10000
            total = (cents if micros >= 0 else -cents) / 100.0
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Proc(),
        outputStructType=(
            "user_id bigint, n_events bigint, total_value double, max_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    left_type: str = "error",
    right_type: str = "purchase",
    within_s: int = 600,
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join with a time-interval condition — the
    streaming twin of ``operators/rangejoin.py``. Both sides carry
    watermarks so Spark can bound the join state; the range condition
    lets it expire rows once the other side's watermark passes.
    """
    l = (
        left.filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("l_event"), F.col(by), F.col("ts").alias("l_ts")
        )
        .withWatermark("l_ts", watermark)
    )
    r = (
        right.filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("r_event"),
            F.col(by).alias("_rkey"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    return l.join(
        r,
        (F.col(by) == F.col("_rkey"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {within_s} SECONDS"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within_s} SECONDS")),
        how,
    ).select("l_event", "r_event", by)


def tumbling_counts_with_late_audit(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """``tumbling_counts`` with an ``observe()`` audit attached to the
    PRE-aggregation stream: per micro-batch, the named metric
    ``late_audit`` reports how many rows entered the operator and the
    batch's event-time span. Combined with the state operator's
    ``numRowsDroppedByWatermark`` (surfaced per progress update), this
    gives the full late-data ledger: rows in, rows dropped as too-late,
    rows aggregated — without a second pass over the stream (observe
    metrics ride the existing plan; zero extra shuffle). Collect either
    via ``LateDataListener`` (push) or ``late_drop_stats`` (pull).

    The batch twin is ``operators/timeseries.late_arrival_audit``
    (gate query q_events_late_arrivals): same watermark rule replayed
    over the table in arrival order."""
    obs = events.observe(
        "late_audit",
        F.count(F.lit(1)).alias("n_input"),
        F.min("ts").alias("min_event_ts"),
        F.max("ts").alias("max_event_ts"),
    )
    return tumbling_counts(obs, window, watermark)


class LateDataListener:
    """StreamingQueryListener accumulating the late-data ledger across
    progress updates: total observed input rows (from the ``late_audit``
    observe metric) and total ``numRowsDroppedByWatermark`` (from the
    stateful operator metrics). Attach with
    ``spark.streams.addListener(listener)``; read ``.n_input`` /
    ``.n_dropped`` after ``processAllAvailable()``.

    Defined lazily against the runtime base class so importing this
    module never hard-requires the streaming listener machinery."""

    def __new__(cls, *a, **kw):
        from pyspark.sql.streaming import StreamingQueryListener

        class _Impl(StreamingQueryListener):
            def __init__(self) -> None:
                self.n_input = 0
                self.n_dropped = 0
                self.progress_events = 0

            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                self.progress_events += 1
                got = _fold_progress(event.progress)
                self.n_input += got["n_input"]
                self.n_dropped += got["n_dropped"]

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        return _Impl()


def _fold_progress(p) -> dict:
    """Extract the late-data ledger from one progress update.
    ``StreamingQueryProgress`` is dict-like, but ``observedMetrics``
    values are ``Row`` objects (tuple subclass — no ``.get``), hence the
    type split."""
    la = (p.get("observedMetrics") or {}).get("late_audit")
    n_input = 0
    if la is not None:
        v = la.get("n_input") if isinstance(la, dict) else la["n_input"]
        n_input = int(v or 0)
    n_dropped = sum(
        int(so.get("numRowsDroppedByWatermark") or 0)
        for so in (p.get("stateOperators") or [])
    )
    return {"n_input": n_input, "n_dropped": n_dropped}


def late_drop_stats(query) -> dict:
    """Pull-side late-data ledger: fold a streaming query's
    ``recentProgress`` into totals — observed input rows (``late_audit``
    observe metric) and rows dropped by the watermark (state operator
    metric). Works on any query, listener or not."""
    n_input = n_dropped = 0
    for p in query.recentProgress:
        got = _fold_progress(p)
        n_input += got["n_input"]
        n_dropped += got["n_dropped"]
    return {"n_input": n_input, "n_dropped": n_dropped}


def write_idempotent(batch_df: DataFrame, target_path: str, key_cols: list[str]) -> None:
    """foreachBatch sink: INSERT OR IGNORE semantics (K3) — anti-join the
    incoming micro-batch against the target before appending. Combined
    with the checkpointed offsets this gives effectively-once delivery,
    the streaming analog of the reference's seen_dois + DB probe
    (:595-601,:675)."""
    spark = batch_df.sparkSession
    batch_df = batch_df.dropDuplicates(key_cols)
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path).select(*key_cols)
        batch_df = batch_df.join(existing, key_cols, "left_anti")
    batch_df.write.mode("append").parquet(target_path)


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete"):
    """Test helper: drive a streaming DF to completion against a memory
    sink, return the query (caller reads ``spark.table(name)``)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    return q


def trending_topk(
    events: DataFrame,
    window: str = "5 minutes",
    k: int = 3,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Per-trigger trending: top-``k`` event types per tumbling window,
    re-ranked on EVERY micro-batch via ``foreachBatch`` — the correct
    home for rank-over-stream, which Structured Streaming forbids
    in-plan (a rank is not incrementally maintainable; per-trigger
    ranking of the maintained counts is). The streaming plan maintains
    only the (window, type) counts — bounded state; the rank runs on
    that aggregate as a BATCH DataFrame inside the sink, so it is one
    window function over |windows|x|types| rows per trigger, never over
    events. Returns the final trigger's top-k table (ties break on
    event_type for a total order)."""
    from pyspark.sql import Window as W

    agg = events.groupBy(
        F.window("ts", window).alias("win"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))

    out: list = []

    def sink(batch_df: DataFrame, _bid: int) -> None:
        w = W.partitionBy("win").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
        ranked = (
            batch_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "win_start"
                ),
                "event_type",
                F.col("n_events").cast("long"),
                F.col("rank").cast("long"),
            )
        )
        out.clear()  # keep only the latest trigger's ranking
        out.extend([tuple(r) for r in ranked.collect()])

    with scoped_shuffle_partitions(events.sparkSession, shuffle_partitions):
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(sink)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return events.sparkSession.createDataFrame(
        out, "win_start string, event_type string, n_events long, rank long"
    )


def merge_cdc_state(
    state: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Commutative LWW merge of a CDC micro-batch into a versioned state
    table (full row image + ``op`` + ``seq``; delete rows are RETAINED
    as tombstones).

    Per key the winner is max ``seq``, ties broken ``op`` ascending
    ('D' < 'I' < 'U', so a delete deterministically beats an update at
    the same sequence — the ``operators/cdc.apply_changes`` rule), with
    a final payload tiebreak (min ``xxhash64`` over all non-key columns)
    so even two DISTINCT rows tying on (key, seq, op) produce one
    deterministic winner — the merge is commutative over full row
    payloads, not just up to the (key, op, seq) projection. Because
    the comparison is against the STORED (op, seq) rather than arrival
    order, applying batches in any order yields the same state — which is
    what makes the streaming apply safe under micro-batch recomposition,
    replays, and out-of-order file discovery. Tombstones are what keep it
    so: dropping a deleted key instead would let a stale lower-seq update
    resurrect it. (Production compacts tombstones older than the maximum
    expected disorder; that is a retention policy, not a correctness
    knob here.)

    Scale shape: the batch winner window runs over the BATCH only; the
    state pays one key-keyed anti-join + one left join of the batch
    winners (broadcast when the batch is small) — never a corpus window.
    """
    from pyspark.sql import Window as W

    payload_cols = [c for c in batch.columns if c not in key_cols]
    batch_hash = F.xxhash64(*[F.col(c) for c in payload_cols])
    w = W.partitionBy(*key_cols).orderBy(
        F.desc(seq_col), F.asc(op_col), F.asc(batch_hash)
    )
    latest = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if state is None:
        return latest
    data_cols = [c for c in state.columns if c not in key_cols]
    j = latest.alias("n").join(state.alias("o"), key_cols, "left")
    new_hash = F.xxhash64(*[F.col(f"n.{c}") for c in data_cols])
    old_hash = F.xxhash64(*[F.col(f"o.{c}") for c in data_cols])
    take_new = (
        F.col(f"o.{seq_col}").isNull()
        | (F.col(f"n.{seq_col}") > F.col(f"o.{seq_col}"))
        | (
            (F.col(f"n.{seq_col}") == F.col(f"o.{seq_col}"))
            & (F.col(f"n.{op_col}") < F.col(f"o.{op_col}"))
        )
        | (
            (F.col(f"n.{seq_col}") == F.col(f"o.{seq_col}"))
            & (F.col(f"n.{op_col}") == F.col(f"o.{op_col}"))
            & (new_hash <= old_hash)
        )
    )
    winners = j.select(
        *key_cols,
        *[
            F.when(take_new, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}")).alias(c)
            for c in data_cols
        ],
    )
    untouched = state.join(latest.select(*key_cols), key_cols, "left_anti")
    return untouched.unionByName(winners)


def cdc_current(
    spark: SparkSession, state_path: str, op_col: str = "op", seq_col: str = "seq"
) -> DataFrame:
    """The live snapshot view over a CDC state table: tombstones filtered,
    versioning metadata dropped."""
    return (
        spark.read.parquet(state_path)
        .filter(F.col(op_col) != "D")
        .drop(op_col, seq_col)
    )


def stream_cdc_apply(
    changes: DataFrame,
    state_path: str,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    checkpoint: str | None = None,
    shuffle_partitions: int | None = None,
):
    """STREAMING CDC apply: maintain a keyed snapshot under a change
    stream — the streaming twin of ``operators/cdc.apply_changes`` and
    the continuous version of the reference's upsert loops (per-row
    SQLite INSERT OR REPLACE; here one merge join per micro-batch).

    Each micro-batch LWW-merges into the parquet state table at
    ``state_path`` (see ``merge_cdc_state`` — order-independent, so
    replayed or reordered batches converge to the same state), written
    with a write-ahead swap: the merged state lands at
    ``<path>.__next__`` while the old state is still intact, then two
    renames swap it live (crash inside the window leaves
    ``<path>.__old__`` as the complete previous state; recovery =
    rename back). Combined with checkpointed source offsets the sink is
    effectively-once: a replayed batch merges to the identical state.

    Seed the initial snapshot by writing it (with op/seq columns) to
    ``state_path`` before starting. Read the result via ``cdc_current``.
    Returns the started StreamingQuery.
    """
    import shutil

    def sink(batch_df: DataFrame, _bid: int) -> None:
        spark = batch_df.sparkSession
        state = (
            spark.read.parquet(state_path) if os.path.exists(state_path) else None
        )
        merged = merge_cdc_state(state, batch_df, key_cols, op_col, seq_col)
        nxt, old = f"{state_path}.__next__", f"{state_path}.__old__"
        merged.write.mode("overwrite").parquet(nxt)
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(state_path):
            os.rename(state_path, old)
        os.rename(nxt, state_path)
        if os.path.exists(old):
            shutil.rmtree(old)

    w = changes.writeStream.foreachBatch(sink)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    with scoped_shuffle_partitions(changes.sparkSession, shuffle_partitions):
        return w.start()


def stream_psi_monitor(
    stream: DataFrame,
    value_col: str,
    cutoffs: list[float],
    ref_fracs: list[float],
):
    """STREAMING distribution-drift monitor: maintain bin counts of the
    incoming value stream (bounded state: ``len(cutoffs)+1`` counters)
    and, on every trigger, recompute the Population Stability Index
    against a FIXED reference histogram (``ref_fracs``, one fraction
    per bin — taken from the training snapshot the models downstream
    were fit on). The per-trigger PSI is the pager signal: a feature
    pipeline silently shifting under a live model shows up here within
    one trigger, not at the next offline audit.

    Arithmetic mirrors ``operators/profile.psi_drift`` exactly (epsilon
    smoothing, per-bin micro-unit terms summed as int64), so the
    streamed PSI over a static source equals the batch PSI — pinned in
    tests. The streaming plan holds ONLY the bin counts; the PSI math
    runs on ``len(cutoffs)+1`` rows inside ``foreachBatch``.

    Returns ``(query, result)`` — ``result`` is a one-element list
    holding the latest ``(n_rows, psi)`` tuple, refreshed per trigger.
    """
    eps = 1e-6
    b = F.lit(len(cutoffs))
    for i, c in enumerate(reversed(cutoffs)):
        b = F.when(
            F.col(value_col) < F.lit(float(c)), F.lit(len(cutoffs) - 1 - i)
        ).otherwise(b)
    agg = (
        stream.filter(F.col(value_col).isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    result: list = []

    def sink(batch_df: DataFrame, _bid: int) -> None:
        counts = {int(r["bin"]): int(r["n"]) for r in batch_df.collect()}
        total = sum(counts.values())
        if total == 0:
            return
        tm = 0
        import math

        for i, rf in enumerate(ref_fracs):
            p = rf + eps
            q = counts.get(i, 0) / float(total) + eps
            tm += round((p - q) * math.log(p / q) * 1_000_000.0)
        result.clear()
        result.append((total, round(tm / 1_000_000.0, 4)))

    q = agg.writeStream.outputMode("complete").foreachBatch(sink).start()
    return q, result


def stream_stream_interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    left_type: str = "error",
    right_type: str = "purchase",
    within_s: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: like
    ``stream_stream_interval_join`` but unmatched left rows EMIT (with
    NULL right) once the right watermark passes their interval — the
    alerting shape ("errors with no rescuing purchase within 10
    minutes") an inner join structurally cannot produce. This is the
    capability that forces real watermarks: the engine may only declare
    'no match will ever come' after it can bound the right side's
    lateness, so outer results trail the data by the watermark — a
    LATENCY COST, not a correctness one, and the reason the watermark
    should be as tight as the source's true disorder.

    State bounds identically to the inner variant (same builder —
    ``how='leftOuter'``)."""
    return stream_stream_interval_join(
        left, right, by, left_type, right_type, within_s, watermark,
        how="leftOuter",
    )

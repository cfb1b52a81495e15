"""Round-5 gate queries: cross-document span removal, bigram-LM scoring,
and the stream-stream interval join.

Each entry pairs the Spark operator with an exact DuckDB oracle (see
``registry.py`` for the determinism rules). No reference parity for the
corpus ops — the reference pipeline
(src/barrazueta_pipeline_etl_crossref.py) has no corpus-hygiene or LM
surface; these are the LLM-data extension layer. The stream-stream
interval join is the streaming twin of ``operators/rangejoin.py``
(batch gate: q_events_range_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import read_table
from .registry import register

_SPAN_N = 5
_SPAN_MIN_DOCS = 3


@register(
    "q_docs_remove_common_spans",
    f"""
    WITH toks AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
              IF x <> ''] AS tok
      FROM documents),
    grams AS (
      SELECT doc_id, tok,
             unnest(range(1, greatest(len(tok) - {_SPAN_N} + 2, 1))) AS pos
      FROM toks),
    g2 AS (
      SELECT doc_id, pos,
             md5(array_to_string(tok[pos:pos+{_SPAN_N - 1}], ' ')) AS gh
      FROM grams),
    common AS (
      SELECT gh FROM g2 GROUP BY gh
      HAVING count(DISTINCT doc_id) >= {_SPAN_MIN_DOCS}),
    cov AS (
      SELECT DISTINCT doc_id, pos + o.o AS p
      FROM g2 JOIN common USING (gh)
      CROSS JOIN (SELECT unnest(range(0, {_SPAN_N})) AS o) o),
    tokpos AS (
      SELECT doc_id, unnest(tok) AS tk,
             unnest(range(1, len(tok) + 1)) AS p
      FROM toks),
    kept AS (
      SELECT tokpos.doc_id, tk, tokpos.p FROM tokpos
      ANTI JOIN cov ON tokpos.doc_id = cov.doc_id AND tokpos.p = cov.p),
    cleaned AS (
      SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS cleaned_text
      FROM kept GROUP BY doc_id),
    remcnt AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(t.tok) AS BIGINT) AS n_tokens,
           CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed,
           coalesce(c.cleaned_text, '') AS cleaned_text
    FROM toks t
    LEFT JOIN remcnt r ON t.doc_id = r.doc_id
    LEFT JOIN cleaned c ON t.doc_id = c.doc_id
    """,
    doc=(
        "Cross-document repeated-span removal (operators/spans."
        "remove_common_spans): every token covered by a 5-gram occurring "
        "in >= 3 distinct docs is dropped — the distributed n-gram "
        "approximation of suffix-array exact-substring dedup (Lee et al. "
        "2022), the boilerplate-pruning step document-level dedup misses. "
        "Grams are generated row-locally and keyed by md5 so the only "
        "corpus-sized shuffle carries fixed-width hashes; covered "
        "positions expand to <= n ints per occurrence; the rebuild "
        "anti-joins positions and reassembles per doc."
    ),
)
def q_docs_remove_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spans import remove_common_spans

    d = read_table(spark, sf_dir, "documents")
    return remove_common_spans(
        d, "text", "doc_id", n=_SPAN_N, min_docs=_SPAN_MIN_DOCS
    )


@register(
    "q_docs_bigram_nll",
    """
    WITH t0 AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
              IF x <> ''] AS tok
      FROM documents),
    toks AS (
      SELECT doc_id, unnest(tok) AS tk,
             unnest(range(1, len(tok) + 1)) AS p
      FROM t0),
    bi AS (
      SELECT doc_id, tk AS w1,
             lead(tk) OVER (PARTITION BY doc_id ORDER BY p) AS w2
      FROM toks QUALIFY w2 IS NOT NULL),
    uni AS (SELECT tk AS w1, count(*) AS c1 FROM toks GROUP BY tk),
    v AS (SELECT count(*) AS V FROM uni),
    bgc AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
    w AS (
      SELECT w1, w2, ln((c1 + v.V) / (c2 + 1)) AS w
      FROM bgc JOIN uni USING (w1) CROSS JOIN v),
    tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bi GROUP BY doc_id, w1, w2)
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
           round(sum(tf.tf * w.w) / sum(tf.tf), 4) AS nll
    FROM tf JOIN w USING (w1, w2)
    GROUP BY tf.doc_id
    """,
    doc=(
        "Per-document NLL under a Laplace-smoothed corpus bigram model "
        "(operators/text_analysis.bigram_nll) — one modeling step up from "
        "q_docs_unigram_nll toward KenLM perplexity filtering. Bigrams "
        "generated row-locally (codegen transform, no corpus-wide window "
        "function); model = one groupBy(w1,w2) joined to vocabulary-sized "
        "unigram context counts; scoring shuffles (doc, tf, weight) rows, "
        "never text."
    ),
)
def q_docs_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_analysis as ta

    d = read_table(spark, sf_dir, "documents")
    return ta.bigram_nll(d, "text", "doc_id")


@register(
    "q_docs_weighted_sample",
    """
    WITH w AS (
      SELECT doc_id, n_chars,
             round(-ln((CAST('0x' || substr(md5('wsample-' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) + 0.5) / 4294967296.0)
             / CAST(n_chars AS DOUBLE), 12) AS clock
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
    r AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY clock ASC, doc_id ASC) AS rank
      FROM w)
    SELECT doc_id, n_chars, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 20
    """,
    doc=(
        "Deterministic weighted sampling without replacement (operators/"
        "sampling.weighted_sample_k): Efraimidis-Spirakis exponential "
        "clocks with the RNG replaced by the md5 hash-uniform the other "
        "samplers use — longer (higher n_chars) docs are proportionally "
        "likelier, the draw is reproducible across runs/engines/cluster "
        "sizes, and the plan is a TakeOrderedAndProject top-k: the "
        "unsampled corpus is filtered, never moved."
    ),
)
def q_docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample_k

    d = read_table(spark, sf_dir, "documents")
    return weighted_sample_k(d, "doc_id", "n_chars", k=20, seed="wsample")


@register(
    "q_docs_quality_keeper",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_distinct([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
                            IF x <> '']) AS tok
      FROM documents WHERE doc_id < 80),
    edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM toks a JOIN toks b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.tok, b.tok))::DOUBLE /
            nullif(len(list_distinct(list_concat(a.tok, b.tok))), 0) >= 0.5),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(node, comp) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.node),
    comp AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
    lab AS (
      SELECT d.doc_id, d.n_chars, coalesce(c.component, d.doc_id) AS component
      FROM (SELECT doc_id, n_chars FROM documents WHERE doc_id < 80) d
      LEFT JOIN comp c ON d.doc_id = c.node)
    SELECT doc_id, n_chars, component,
           first_value(doc_id) OVER
             (PARTITION BY component ORDER BY n_chars DESC, doc_id ASC) AS keeper_id,
           doc_id = first_value(doc_id) OVER
             (PARTITION BY component ORDER BY n_chars DESC, doc_id ASC) AS is_keeper
    FROM lab
    """,
    doc=(
        "Quality-aware dedup survivor selection (operators/dedup."
        "quality_keeper): connected components over the exact-Jaccard>=0.5 "
        "near-dup graph (bounded sample for oracle tractability), keeper "
        "= highest-n_chars member per component (tie: min id) — keep the "
        "BEST copy, not the arbitrary min-id one. Min-label propagation "
        "for components + ONE window for keeper selection; oracle = "
        "recursive-CTE reachability + first_value window."
    ),
)
def q_docs_quality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import quality_keeper
    from ..operators.setsim import bounded_jaccard_edges

    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    edges = bounded_jaccard_edges(d, threshold=0.5)
    return quality_keeper(d, "doc_id", "n_chars", edges)


@register(
    "q_events_context_assembly",
    """
    WITH ranked AS (
      SELECT user_id, ts, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_ctx,
           string_agg(event_type || '@' ||
                      CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR),
                      ' | ' ORDER BY ts ASC, event_id ASC) AS context
    FROM ranked WHERE rn <= 20
    GROUP BY user_id
    """,
    doc=(
        "Per-user training-context assembly: the latest 20 events per "
        "user serialized oldest-first as 'type@epoch' tokens — the batch "
        "shape of building per-entity context windows (chat history, "
        "session features) for sequence-model training data. ONE "
        "partitioned window (row_number) + ONE groupBy(user) with an "
        "order-struct collect; the truncation happens BEFORE the "
        "collect, so per-user state is bounded at 20 rows no matter how "
        "hot the key — the unbounded-context formulation is the scale "
        "failure mode this avoids."
    ),
)
def q_events_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.dates import epoch_seconds

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    recent = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.concat_ws(
                "@", F.col("event_type"), epoch_seconds("ts").cast("string")
            ).alias("tok"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 20)
    )
    return recent.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ctx"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "tok"))),
                lambda s: s.getField("tok"),
            ),
            " | ",
        ).alias("context"),
    )


_WALK_SQL = """
    WITH RECURSIVE pe AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
        FROM (
          SELECT a.l_suppkey AS src, b.l_suppkey AS dst
          FROM pe a JOIN pe b
            ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
          GROUP BY a.l_suppkey, b.l_suppkey))
      WHERE rn <= 5),
    walk(start, node, hops) AS (
      SELECT src, src, 0 FROM (SELECT DISTINCT src FROM e WHERE src < 20) s
      UNION ALL
      SELECT w.start, e.dst, w.hops + 1
      FROM walk w JOIN e ON e.src = w.node WHERE w.hops < 2)
    SELECT start,
           CAST(count(*) AS BIGINT) AS n_walks,
           CAST(count(DISTINCT node) AS BIGINT) AS n_reached,
           CAST(max(hops) AS BIGINT) AS max_hops
    FROM walk GROUP BY start
"""


@register(
    "q_graph_bounded_walks",
    _WALK_SQL,
    doc=(
        "Recursive CTE (WITH RECURSIVE, Spark 4 SQL surface): monotone "
        "walks of <= 2 hops from low-id seeds over the oriented (lo<hi) "
        "supplier co-supply DAG — path counting + bounded reachability, "
        "the iterative-SQL shape the DataFrame API cannot express. "
        "Out-degree is capped at 5 via row_number (node2vec-style bounded "
        "branching): without the cap, 2-hop path counts grow with hub "
        "degree squared — at sf0.1 the dense co-supply hubs blow past "
        "Spark's 1M-row recursion guard, and at 100 TB the enumeration is "
        "unboundedly superlinear; with it, walk volume is "
        "seeds x (1 + 5 + 25) regardless of scale factor. "
        "UNION ALL recursion (Spark does not yet support dedup UNION in "
        "recursion), cycle-free by orientation, depth-bounded by the "
        "hops guard; DuckDB executes the IDENTICAL statement as oracle. "
        "Each recursion step is one equi-join on the node key — the "
        "per-iteration shuffle shape of every iterative graph op here."
    ),
)
def q_graph_bounded_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_WALK_SQL)


@register(
    "q_events_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT)
               AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity
    WHERE week_offset <= 8
    GROUP BY cohort_week, week_offset
    """,
    doc=(
        "Cohort retention triangle: users bucketed by first-activity "
        "week, distinct active users per (cohort, week-offset <= 8) — "
        "the standard product-analytics rollup. One groupBy(user) for "
        "cohort assignment, one user-keyed join (both sides cluster on "
        "user_id, exchange reused), one distinct + final agg on the "
        "(cohort, offset) pair — the distinct bounds state at "
        "|users| x 9 rows regardless of event volume."
    ),
)
def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                        - F.unix_timestamp("cohort_week")
                    )
                    / (7 * 86400)
                )
            ).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("week_offset") <= 8)
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active_users"))
    )


@register(
    "q_docs_profile_columns",
    """
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM documents)
    SELECT 'doc_id' AS "column", n.n_rows,
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_str,
           CAST(max(doc_id) AS VARCHAR) AS max_str
    FROM documents CROSS JOIN n GROUP BY n.n_rows
    UNION ALL
    SELECT 'lang', n.n_rows,
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT),
           CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
    FROM documents CROSS JOIN n GROUP BY n.n_rows
    UNION ALL
    SELECT 'source', n.n_rows,
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT),
           CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
    FROM documents CROSS JOIN n GROUP BY n.n_rows
    UNION ALL
    SELECT 'n_chars', n.n_rows,
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents CROSS JOIN n GROUP BY n.n_rows
    """,
    doc=(
        "ANALYZE-style table profiling (operators/profile.profile_columns): "
        "null rate, exact distinct count, min/max for every requested "
        "column in ONE scan — the wide single-row aggregate is unpivoted "
        "row-locally (stack), never one job per column. The stats feed "
        "broadcast/bucketing/skew decisions; swap approx_count_distinct "
        "at 100 TB, same plan shape. The oracle recomputes per column "
        "(DuckDB's planner collapses the UNION into one scan per branch; "
        "the CONTRACT is the values, the Spark side pins the single-pass "
        "plan shape in tests)."
    ),
)
def q_docs_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_columns

    d = read_table(spark, sf_dir, "documents")
    return profile_columns(d, ["doc_id", "lang", "source", "n_chars"])


@register(
    "q_events_value_histogram",
    """
    SELECT CAST(floor(value / 10) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS bucket_sum
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
    """,
    doc=(
        "Equi-width histogram of events.value (width-10 buckets): the "
        "distribution profile that sizes skew/salting decisions. "
        "floor-division bucketing is identical arithmetic on both "
        "engines; one map-side-combinable groupBy on the bucket id."
    ),
)
def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .money import dsum

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy(
        F.floor(F.col("value") / 10).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("value")).alias("bucket_sum"),
    )


@register(
    "q_docs_shard_assignment",
    """
    SELECT CAST(CAST('0x' || substr(md5('shard-' || CAST(doc_id AS VARCHAR)), 1, 8)
                     AS BIGINT) % 16 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents GROUP BY 1
    """,
    doc=(
        "Training-shard assignment audit (the sinks.write_training_shards "
        "layout): deterministic md5 bucketing of every doc into 16 shards "
        "with per-shard counts and id ranges — reproducible across "
        "runs/engines/cluster sizes, uniformly sized without measuring, "
        "and the hash order doubles as the corpus-level example shuffle. "
        "Zero-shuffle assignment; one groupBy(shard) for the audit."
    ),
)
def q_docs_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    d = read_table(spark, sf_dir, "documents")
    return (
        d.withColumn("shard", hash_bucket(F.col("doc_id"), "shard", 16))
        .groupBy(F.col("shard").cast("bigint").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
    )


def _mmr_oracle_sql(k: int = 10, pool: int = 50) -> str:
    """Generated DuckDB oracle replaying ``similarity.mmr_topk`` EXACTLY
    (lam fixed at 0.5 so both lambda literals are exact in binary): the
    greedy selection unrolls into ``k`` chained CTE steps, each picking
    the argmax of ``round(0.5·rel − 0.5·max_sim_to_selected, 4)`` with a
    vec_id tie-break. Dot products fold sequentially (``list_reduce``)
    over float→double casts, matching the driver-side Python loop and
    Spark's ``aggregate`` fold bit-for-bit; the 4-dp quantization before
    every argmax absorbs last-ulp noise."""

    def cosexpr(a: str, b: str) -> str:
        def dotseq(x: str, y: str) -> str:
            return (
                f"list_reduce(list_transform(range(1, len({a}.embedding)+1), "
                f"i -> CAST({x}.embedding[i] AS DOUBLE) * "
                f"CAST({y}.embedding[i] AS DOUBLE)), (x, y) -> x + y)"
            )

        return (
            f"round({dotseq(a, b)} / "
            f"(sqrt({dotseq(a, a)}) * sqrt({dotseq(b, b)})), 4)"
        )

    parts = [
        f"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
rel AS MATERIALIZED (
  SELECT e.vec_id, {cosexpr('e', 'q')} AS rel
  FROM embeddings e CROSS JOIN q),
pool AS MATERIALIZED (
  SELECT vec_id, rel FROM rel ORDER BY rel DESC, vec_id ASC LIMIT {pool}),
pv AS MATERIALIZED (
  SELECT p.vec_id, p.rel, e.embedding
  FROM pool p JOIN embeddings e USING (vec_id)),
ps AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {cosexpr('a', 'b')} AS sim
  FROM pv a JOIN pv b ON a.vec_id <> b.vec_id),
s1 AS (SELECT vec_id, rel FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1),
sel1 AS MATERIALIZED (SELECT * FROM s1)"""
    ]
    for i in range(2, k + 1):
        p = i - 1
        parts.append(
            f"""s{i} AS (
  SELECT p.vec_id, p.rel FROM pool p
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{p})
  ORDER BY round(0.5 * p.rel - 0.5 * (
      SELECT max(ps.sim) FROM ps JOIN sel{p} s
      ON ps.ia = p.vec_id AND ps.ib = s.vec_id), 4) DESC,
    p.vec_id ASC
  LIMIT 1),
sel{i} AS MATERIALIZED (SELECT * FROM sel{p} UNION ALL SELECT * FROM s{i})"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, vec_id, rel FROM s{i}" for i in range(1, k + 1)
    )
    return ",\n".join(parts) + f"\n{sel}\nORDER BY rank"


@register(
    "q_emb_mmr_diverse_topk",
    _mmr_oracle_sql(10, 50),
    doc=(
        "Maximal-Marginal-Relevance diversity selection (operators/"
        "similarity.mmr_topk): exact top-50 relevance pool cut "
        "(TakeOrderedAndProject over the corpus — the only stage touching "
        "all rows), then greedy lam=0.5 re-rank on the collected pool "
        "(bounded model state; MMR is inherently sequential). All scores "
        "quantized to 4 dp with id tie-breaks, so the iterative selection "
        "is engine-portable and the unrolled 10-step DuckDB oracle "
        "replays it exactly — same technique as q_docs_bpe_merges."
    ),
)
def q_emb_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import mmr_topk

    emb = read_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow[0]]
    return mmr_topk(emb, qv, k=10, lam=0.5, pool=50)


@register(
    "q_stream_interval_join",
    """
    WITH e AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
    p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT e.event_id AS l_event, p.event_id AS r_event, e.user_id
    FROM e JOIN p ON e.user_id = p.user_id
     AND epoch(p.ts) BETWEEN epoch(e.ts) - 600 AND epoch(e.ts) + 600
    """,
    doc=(
        "STREAMING stream-stream inner join with a +-10min interval "
        "condition (streaming/events.stream_stream_interval_join) vs the "
        "batch inequality-join oracle — the streaming twin of "
        "q_events_range_join. Both sides carry watermarks so the join "
        "state is bounded: rows expire once the opposite watermark "
        "passes, which is what keeps a 100 TB/day pairing join from "
        "accumulating unbounded state."
    ),
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import events as se
    from .streaming_queries import _run

    ev = se.stream_events(spark, sf_dir)
    return _run(
        se.stream_stream_interval_join(ev, se.stream_events(spark, sf_dir)),
        mode="append",
    )

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

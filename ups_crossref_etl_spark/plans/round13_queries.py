"""Round-13 gated queries.

Variable-length exact-substring dedup (the Lee et al. 2022 ≥T-token
repeated-span pass, the one LLM-pipeline dedup mode the r12 verdict
flagged missing) — seeds-then-islands over duplicated T-gram start
positions recovers maximal repeated intervals with no suffix structure,
plus a verbatim full-span verification regroup. Integer-only outputs:
hash-exact oracle parity with no float recipe needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.lake import read_table
from .registry import register

# --------------------------------------------------------------------------
# Variable-length exact-substring dedup: maximal repeated spans
# --------------------------------------------------------------------------


@register(
    "q_docs_long_repeated_spans",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tk
      FROM documents),
    grams AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(list_slice(tk, i, i + 19), ' ')) AS gh
      FROM toks, unnest(range(1, len(tk) - 18)) AS u(i)
      WHERE len(tk) >= 20),
    dup AS (
      SELECT gh FROM grams GROUP BY gh
      HAVING count(DISTINCT doc_id) >= 2),
    seeds AS (SELECT doc_id, pos FROM grams JOIN dup USING (gh)),
    isl AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS g
      FROM seeds),
    iv AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 19 AS e
      FROM isl GROUP BY doc_id, g),
    spans AS (
      SELECT iv.doc_id, s, e,
             md5(array_to_string(list_slice(tk, s, e), ' ')) AS sh
      FROM iv JOIN toks ON iv.doc_id = toks.doc_id),
    share AS (
      SELECT sh, CAST(count(DISTINCT doc_id) AS BIGINT) AS verbatim_docs
      FROM spans GROUP BY sh)
    SELECT spans.doc_id,
           CAST(s AS INTEGER) AS span_start,
           CAST(e AS INTEGER) AS span_end,
           CAST(e - s + 1 AS INTEGER) AS span_len,
           verbatim_docs
    FROM spans JOIN share USING (sh)
    """,
    doc=(
        "Variable-length exact-substring dedup (operators/spans."
        "long_repeated_spans; Lee et al. ACL 2022 suffix-array "
        "semantics, distributed): maximal token intervals covered by "
        "20-grams occurring in >= 2 docs — a 600-token verbatim repeat "
        "surfaces as ONE interval with its true length, not fixed-width "
        "windows. Seeds (one md5-keyed gram groupBy) -> per-doc "
        "gaps-and-islands (pos - row_number) -> interval groupBy -> "
        "verbatim full-span md5 regroup. Integer outputs, hash-exact."
    ),
)
def q_docs_long_repeated_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.spans import long_repeated_spans

    docs = read_table(spark, sf_dir, "documents")
    return long_repeated_spans(
        docs, "text", "doc_id", min_len=20, min_docs=2
    )

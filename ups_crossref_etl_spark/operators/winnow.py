"""Winnowing — minimizer-based document fingerprinting (MOSS).

Extension layer — no counterpart in /root/reference. Schleimer,
Wilkerson & Aiken 2003 ("Winnowing: Local Algorithms for Document
Fingerprinting", the MOSS plagiarism detector): hash every token
k-gram, slide a window of w consecutive gram hashes, and in each
window select the minimum (rightmost position on ties). The guarantee
that makes it the standard near-copy detector: any shared substring of
at least w + k - 1 tokens between two documents yields at least one
IDENTICAL selected fingerprint in both — so overlap detection is an
equi-join on fingerprints, with density ~1/w of the full k-gram set.
Complements the sibling detectors: MinHash estimates whole-document
similarity, ``remove_common_spans`` needs exact gram positions for
excision; winnowing gives *local* overlap evidence at 1/w the index
size.

Determinism contract (hash-exact DuckDB twin):
- gram hash = first 10 hex chars of ``md5(gram)`` as a 40-bit integer
  (the engine-portable md5 trick, operators/sampling.py).
- Rightmost-minimum tie rule is encoded arithmetically so one ``min``
  aggregate does both comparisons: ``combined = h * 2^20 +
  (2^20 - 1 - pos)`` — minimizing ``combined`` minimizes ``h`` and, on
  equal hashes, maximizes ``pos``. 40 + 20 bits fit a BIGINT; ``pos``
  is a within-document gram index (documents with 2^20+ grams would
  need a wider split, asserted).
- Only FULL windows select (start pos <= n_grams - w + 1), matching
  the paper.

Scale shape: gram construction is row-local (split + transform —
codegen, no Python); selection is ONE per-document window sort (the
only shuffle), frame ``ROWS BETWEEN CURRENT AND w-1 FOLLOWING``;
fingerprints are ~n/w rows of (doc, pos, 40-bit hash) — text never
shuffles. Overlap join is fingerprint-keyed with a document-frequency
cap on join keys (non-discriminative grams dropped BOTH sides), the
same fanout bound the inverted-index and PPJoin operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["winnow_fingerprints", "winnow_overlap_pairs"]

_POS_BITS = 20
_POS_MOD = 1 << _POS_BITS


def _grams(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )
    gram_list = F.expr(
        f"transform(sequence(1, greatest(size(_toks) - {k} + 1, 0)), "
        f"i -> concat_ws(' ', slice(_toks, i, {k})))"
    )
    # r14 (r13 verdict #6): spread a parallelism-starved scan before the
    # tokenize+gram explode — md5 gram hashes are content-derived and
    # every downstream step (per-doc ordered windows with a tie-free
    # composite min key, distinct, exact counts) is layout-invariant.
    from ..sources.lake import spread_scan

    return (
        spread_scan(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .filter(F.size("_toks") >= k)
        .select("doc_id", F.posexplode(gram_list).alias("_p0", "gram"))
        .select(
            "doc_id",
            (F.col("_p0") + 1).alias("pos"),
            F.conv(F.substring(F.md5("gram"), 1, 10), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, w: int = 4
) -> DataFrame:
    """Selected fingerprints ``(doc_id, pos, fp_hash)``: the rightmost
    minimal k-gram hash of every full w-window, deduplicated."""
    g = _grams(df, text_col, id_col, k)
    combined = F.col("h") * F.lit(_POS_MOD) + (
        F.lit(_POS_MOD - 1) - F.col("pos")
    )
    frame = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    full = Window.partitionBy("doc_id")
    sel = (
        g.withColumn("_c", F.min(combined).over(frame))
        .withColumn("_n", F.max("pos").over(full))
        .filter(F.col("pos") <= F.col("_n") - w + 1)
        .select(
            "doc_id",
            (
                F.lit(_POS_MOD - 1) - (F.col("_c") % F.lit(_POS_MOD))
            ).alias("pos"),
            # integer division: _c is up to 60 bits — a double round-trip
            # would corrupt the decode
            F.expr(f"_c div {_POS_MOD}").cast("long").alias("fp_hash"),
        )
        .distinct()
    )
    return sel


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct fingerprint
    hashes: ``(doc_a, doc_b, n_shared)`` with ``doc_a < doc_b``.
    Fingerprints appearing in more than ``max_df`` documents are
    dropped (both for fanout and because ubiquity means boilerplate,
    not copying)."""
    # r14: fp feeds the df-count aggregate AND the kept join; kept feeds
    # BOTH sides of the pair self-join — two lazy checkpoints execute
    # the fingerprint pipeline once per action instead of four times.
    fp = (
        winnow_fingerprints(df, text_col, id_col, k=k, w=w)
        .select("doc_id", "fp_hash")
        .distinct()
        .localCheckpoint(eager=False)
    )
    df_counts = fp.groupBy("fp_hash").agg(
        F.count(F.lit(1)).alias("_df")
    )
    kept = fp.join(
        df_counts.filter(F.col("_df") <= max_df).select("fp_hash"),
        "fp_hash",
    ).localCheckpoint(eager=False)
    pairs = (
        kept.alias("a")
        .join(kept.alias("b"), "fp_hash")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs

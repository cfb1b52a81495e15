"""Composite training-data cleaning pipeline over a document corpus —
the end-to-end shape a 100 TB pretraining-data job runs:

  exact dedup → quality gate → language filter → token accounting

Every stage is JVM-side Column arithmetic (see ``text_analysis``/
``dedup``); the only shuffle is the dedup's hash-groupBy. The pipeline
returns both the kept corpus and an audit row (counts per drop reason +
surviving token budget) — the numbers a data curator actually reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import text_analysis as ta


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    max_tokens: int = 5000,
    min_en_hits: int = 1,
) -> DataFrame:
    """Kept documents with per-doc features and the drop-stage label of
    removed ones (kept rows have ``drop_reason`` null). Stages apply in a
    fixed order so each document has exactly one drop reason — the same
    accounting a curator needs to audit a filtering run."""
    hash_w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    with_feats = df.select(
        F.col(id_col),
        F.col(text_col),
        F.row_number().over(hash_w).alias("_dup_rank"),
        ta.token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        ta.marker_hits(F.col(text_col), "en").cast("bigint").alias("en_hits"),
    )
    reason = (
        F.when(F.col("_dup_rank") > 1, "exact_dup")
        .when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("n_tokens") > max_tokens, "too_long")
        .when(F.col("en_hits") < min_en_hits, "non_english")
    )
    return with_feats.select(
        id_col, "n_tokens", "en_hits", reason.alias("drop_reason")
    )


def corpus_report(cleaned: DataFrame) -> DataFrame:
    """One audit row: total docs, kept docs, kept-token budget, and drops
    per stage."""
    return cleaned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("drop_reason").isNull(), 1)).alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("drop_reason").isNull(), F.col("n_tokens"))), F.lit(0)
        ).cast("bigint").alias("kept_tokens"),
        F.count(F.when(F.col("drop_reason") == "exact_dup", 1)).alias("n_dups"),
        F.count(F.when(F.col("drop_reason") == "too_short", 1)).alias("n_short"),
        F.count(F.when(F.col("drop_reason") == "too_long", 1)).alias("n_long"),
        F.count(F.when(F.col("drop_reason") == "non_english", 1)).alias("n_nonenglish"),
    )


def percentile_trim(
    df: DataFrame,
    num_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Keep rows whose ``num_col`` lies within the corpus's exact
    [lower, upper] quantile band (linear interpolation — the ANSI
    PERCENTILE_CONT definition both Spark and DuckDB implement) — the
    distribution-relative outlier trim used instead of fixed length
    cutoffs when the corpus mix shifts.

    Scale shape: the two cutoffs are ONE exact-percentile aggregate
    (Spark's ``percentile`` — a single-pass typed aggregation, no
    pre-sort) reduced to a broadcast 2-value row; the trim itself is a
    codegen'd range filter joined in as a literal-free broadcast, so the
    corpus is scanned once and never shuffled. For 100 TB, swap
    ``percentile`` for ``approx_percentile`` (t-digest, same plan shape)
    — the filter is unchanged."""
    if not (0 <= lower <= upper <= 1):
        raise ValueError("percentile_trim: need 0 <= lower <= upper <= 1")
    cuts = df.agg(
        F.expr(
            f"percentile({num_col}, array({lower}, {upper}))"
        ).alias("_c")
    ).select(
        F.element_at("_c", 1).alias("_lo"), F.element_at("_c", 2).alias("_hi")
    )
    return df.crossJoin(F.broadcast(cuts)).filter(
        (F.col(num_col) >= F.col("_lo")) & (F.col(num_col) <= F.col("_hi"))
    ).drop("_lo", "_hi")

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


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Map each group's value distribution onto the GLOBAL distribution:
    ``(id_col, group_col, value_col, norm_value)`` where ``norm_value``
    is the global value at the row's within-group percent-rank — after
    which a single global threshold treats every domain fairly (the fix
    for "domain A's quality scores run hot, so a global cut keeps all
    of A and none of B"; rank-based, so monotone per-domain score
    transforms don't change the outcome at all).

    Exact reference shape: within-group percent_rank (group-keyed
    window), a global row_number over (value, group, id) — a total
    order, so ties map deterministically — and a position join
    ``round(pr·(N−1)) + 1``. The global window is the oracle-exact
    formulation; at 100 TB swap it for an ``approx_percentile`` grid of
    the global distribution joined on the rounded rank (same contract,
    no single-partition sort).
    """
    from pyspark.sql import Window

    n = df.count()
    w_g = Window.partitionBy(group_col).orderBy(value_col, id_col)
    w_all = Window.orderBy(value_col, group_col, id_col)
    ranked = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        F.percent_rank().over(w_g).alias("_pr"),
    ).withColumn(
        "_pos", (F.round(F.col("_pr") * (n - 1)) + 1).cast("bigint")
    )
    glob = df.select(
        F.col(value_col).alias("norm_value"),
        F.row_number().over(w_all).alias("_pos"),
    )
    return ranked.join(glob, "_pos").select(
        id_col, group_col, value_col, "norm_value"
    )


def quantile_normalize_approx(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    grid: int = 200,
    accuracy: int = 10_000,
) -> DataFrame:
    """``quantile_normalize``'s scale swap-in: instead of a global
    row_number sort, the global distribution is summarized ONCE by an
    ``approx_percentile`` grid (``grid + 1`` cutpoints — model state,
    inlined as a plan literal), and each row maps to the grid value at
    its within-group percent-rank. Same output contract
    ``(id, group, value, norm_value)``; norm_value is now one of the
    grid values (quantization error ≤ the spacing between adjacent
    grid quantiles — tighten with ``grid``), and the only shuffle left
    is the group-keyed rank window. Deterministic for fixed input, but
    the sketch is engine-specific — gate with a bound contract
    (monotonicity + range + group-alignment), not hash equality.
    """
    from pyspark.sql import Window

    qs = [i / grid for i in range(grid + 1)]
    cuts = df.agg(
        F.percentile_approx(value_col, qs, accuracy).alias("c")
    ).first()["c"]
    garr = F.array(*[F.lit(float(c)) for c in cuts])
    w_g = Window.partitionBy(group_col).orderBy(value_col, id_col)
    return df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        F.element_at(
            garr,
            (F.round(F.percent_rank().over(w_g) * grid) + 1).cast("int"),
        ).alias("norm_value"),
    )


def interleaved_order(
    df: DataFrame, id_col: str, domain_col: str, seed: str = "epoch1"
) -> DataFrame:
    """Deterministic domain-interleaved training order: ``(id, domain,
    pos)`` where pos is the global dataloader position.

    The epoch-shuffle primitive: rows are ranked WITHIN their domain by
    an md5 draw (reshuffle by changing ``seed`` per epoch — no RNG
    state, resumable from any position), then domains are round-robin
    interleaved (all rank-1 docs across domains, then rank-2, ...), so
    a sequential reader sees every domain continuously instead of a
    domain-sorted corpus that catastrophically orders training. Two
    window passes: one per-domain rank (domain-keyed shuffle), one
    global position by (rank, domain, id) — at cluster scale the
    second is a range partition by the same triple, the standard
    total-order sort shape. Everything is integer arithmetic on md5
    draws: bit-for-bit reproducible across engines and runs.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "-"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    wd = Window.partitionBy(domain_col).orderBy(h, F.col(id_col))
    ranked = df.select(
        F.col(id_col), F.col(domain_col), F.row_number().over(wd).alias("_r")
    )
    wg = Window.orderBy(F.col("_r"), F.col(domain_col), F.col(id_col))
    return ranked.select(
        F.col(id_col),
        F.col(domain_col),
        F.row_number().over(wg).cast("bigint").alias("pos"),
    )

"""Round-8 query registrations.

Opens with the contracts the r7 verdict asked for:

- ``q_docs_ece_approx_bound``: the percentile-cutoff calibration path
  (``operators/evaluation`` ``mode="approx"``) is now CODE with a gated
  agreement bound against the exact-ntile ECE — the scale story stopped
  being a docstring promise;
- (the Adamic-Adar cap contracts live in ``round7c_queries`` next to the
  operational query they bound).

Every gated entry pairs the Spark program with a DuckDB oracle; column
aliases match exactly (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.lake import read_table
from .registry import register

# --------------------------------------------------------------------------
# ECE percentile-cutoff (approx) path: agreement bound vs exact ntile
# --------------------------------------------------------------------------


@register(
    "q_docs_ece_approx_bound",
    """
    WITH s AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             percent_rank() OVER (ORDER BY n_chars, doc_id) AS sc
      FROM documents
      WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
    b AS (
      SELECT y, CAST(round(sc * 1e6) AS BIGINT) AS sq,
             ntile(10) OVER (ORDER BY sc, doc_id) AS bin
      FROM s),
    per AS (
      SELECT bin, count(*) AS n, sum(sq) AS sq, sum(y) AS pos
      FROM b GROUP BY bin),
    g AS (
      SELECT n,
             CAST(round(abs(CAST(pos AS DOUBLE) / n
                            - CAST(sq AS DOUBLE)
                              / (CAST(n AS DOUBLE) * 1e6)) * 1e9)
               AS BIGINT) AS gn
      FROM per)
    SELECT CAST(sum(n) AS BIGINT) AS n,
           round(sum(n * gn) / (CAST(sum(n) AS DOUBLE) * 1e9), 6) + 0.0
             AS ece_exact,
           TRUE AS approx_bins_all_used,
           TRUE AS ece_within_tol
    FROM g
    """,
    doc=(
        "Agreement contract for the percentile-cutoff ECE path "
        "(operators/evaluation.expected_calibration_error "
        "mode='approx' -> approx_bin_assign): runs the exact-ntile ECE "
        "and the approx-binned ECE over the same length-rank/is-English "
        "scoring as q_docs_ece and pins (all 10 approx bins occupied, "
        "|ece_exact - ece_approx| <= 0.02). The Greenwald-Khanna sketch "
        "is engine-specific, so the gate hashes the EXACT side plus "
        "boolean verdicts — the r7 verdict's ask that the 100 TB "
        "calibration story be code with a measured bound, not a "
        "docstring promise."
    ),
)
def q_docs_ece_approx_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import expected_calibration_error

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("n_chars").isNotNull()
    )
    w = Window.orderBy("n_chars", "doc_id")
    scored = d.select(
        "doc_id",
        F.percent_rank().over(w).alias("score"),
        (F.col("lang") == "en").alias("is_en"),
    )
    exact = expected_calibration_error(
        scored, "score", "is_en", "doc_id", n_bins=10, mode="exact"
    ).select("n", F.col("ece").alias("ece_exact"))
    approx = expected_calibration_error(
        scored, "score", "is_en", "doc_id", n_bins=10, mode="approx"
    ).select(
        F.col("n_bins").alias("_nb_approx"), F.col("ece").alias("_ece_approx")
    )
    return (
        exact.crossJoin(F.broadcast(approx))
        .select(
            "n",
            "ece_exact",
            (F.col("_nb_approx") == 10).alias("approx_bins_all_used"),
            (
                F.abs(F.col("ece_exact") - F.col("_ece_approx")) <= 0.02
            ).alias("ece_within_tol"),
        )
    )

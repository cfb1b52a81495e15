"""Privacy operators: re-identification audits and consistent
pseudonymization.

Shipping a dataset outside its origin (vendor handoff, research
release, cross-team training corpus) needs two things the rest of the
engine doesn't provide: a measurement of how re-identifiable rows are
from their quasi-identifiers (k-anonymity, Sweeney 2002; l-diversity,
Machanavelli et al. 2007), and a join-stable replacement for the
direct identifiers themselves. Both are plain aggregates/projections —
the point of putting them here is the CONTRACT, not cleverness.

Reference parity note: no counterpart in /root/reference — governance
extension surface, same family as operators/quality.py (the PII
scanner in operators/text_analysis.py finds identifiers in TEXT; this
module handles STRUCTURED identifier columns).

Scale shape:
- ``k_anonymity_audit``: one groupBy over the quasi-identifier tuple
  (map-side combinable) + one bucket aggregate over the CLASS table
  (equivalence-class-sized, tiny) — the corpus is scanned once;
- ``pseudonymize``: row-local keyed hashing, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_audit", "pseudonymize"]


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """Audit re-identifiability: rows sharing a quasi-identifier tuple
    form an equivalence class; a class smaller than ``k`` means its
    members are k-anonymity violations (an attacker knowing just the
    QI values narrows them to < k candidates). With ``sensitive_col``
    the audit also reports l-diversity — the minimum number of distinct
    sensitive values inside the bucket's classes (a k-large class where
    everyone shares one diagnosis still leaks it).

    Returns one row per class-size bucket:
    ``(bucket, n_classes, n_rows, below_k, min_l)`` where bucket is
    the class size clamped at ``k`` (so ``bucket = k`` aggregates all
    compliant classes) — the histogram release decisions are made on.
    """
    aggs = [F.count(F.lit(1)).alias("_sz")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("_l"))
    classes = df.groupBy(*qi_cols).agg(*aggs)
    bucket = F.least(F.col("_sz"), F.lit(k)).cast("long")
    out_aggs = [
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("_sz").cast("long").alias("n_rows"),
        (F.min("_sz") < k).alias("below_k"),
    ]
    if sensitive_col is not None:
        out_aggs.append(F.min("_l").cast("long").alias("min_l"))
    else:
        out_aggs.append(F.lit(None).cast("long").alias("min_l"))
    return classes.groupBy(bucket.alias("bucket")).agg(*out_aggs)


def pseudonymize(
    df: DataFrame, cols: list[str], salt: str, keep_null: bool = True
) -> DataFrame:
    """Replace identifier columns with keyed hashes: ``md5(salt || '|' ||
    value)`` — deterministic, so the SAME identifier maps to the SAME
    token everywhere (joins between released tables keep working), and
    useless without the salt (treat the salt as a key: it never ships
    with the data). NULL stays NULL by default — a hashed NULL would
    fabricate a linkable token out of absence.

    This is pseudonymization, not anonymization: with the salt, the
    mapping is recomputable (that is the point — revocable vendor
    handoffs), and QI-based re-identification is untouched — run
    ``k_anonymity_audit`` on what remains. Row-local codegen, zero
    shuffles.
    """
    out = df
    for c in cols:
        # per-column NULL sentinel: with keep_null=False a hashed NULL
        # must not collapse to md5(salt) across every column and table
        # released under the same salt (concat_ws skips NULLs) — that
        # constant token would fabricate linkage out of absence
        v = F.coalesce(F.col(c).cast("string"), F.lit(f"<NULL:{c}>"))
        h = F.md5(F.concat_ws("|", F.lit(salt), v))
        out = out.withColumn(
            c, F.when(F.col(c).isNull() & F.lit(keep_null), F.lit(None)).otherwise(h)
        )
    return out


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Laplace-mechanism count release SIMULATION: per-group counts plus
    Laplace(1/epsilon) noise drawn from a SEEDED md5 uniform —
    ``(group, noisy_count)``.

    The testing harness for a DP release pipeline: downstream jobs
    (budget accounting, utility dashboards, suppression rules) can be
    integration-tested end-to-end against reproducible noise. THE SEEDED
    DRAW IS NOT DIFFERENTIALLY PRIVATE — determinism is exactly what the
    DP guarantee forbids; production swaps the hash for a calibrated
    secure RNG and this function says so loudly rather than pretending.
    Noise via inverse CDF: u = hash/2^32 - 0.5, noise =
    -(1/eps)*sign(u)*ln(1-2|u|); one group aggregate, one map-side
    expression, rounded 6 dp. True counts are deliberately NOT in the
    output schema (a release pipeline must not carry them forward).
    """
    b = 1.0 / float(epsilon)
    counts = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(seed), F.col(group_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
        - 0.5
    )
    noise = -F.lit(b) * F.signum(u) * F.log(1.0 - 2.0 * F.abs(u))
    return counts.select(
        F.col(group_col),
        (F.round(F.col("_n") + noise, 6) + 0.0).alias("noisy_count"),
    )

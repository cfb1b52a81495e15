"""Declarative data-quality constraints (expectations-style).

Generalizes the reference's ad-hoc guards (year sanity 1600-2100 at
src/barrazueta_pipeline_etl_crossref.py — F.extract_year_any's range check —
and the null/empty mention guards) into a rule API a lake pipeline runs per
batch: each rule compiles to ONE aggregate expression, so checking any
number of rules over 100 TB is a single scan with a map-side partial
aggregate — never one job per rule (the naive expectations loop).
Uniqueness and referential integrity are the only rules that need more
than the scan: one groupBy on the key, one broadcast-able anti-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    # predicate marks a VIOLATION (True = bad row)
    violation: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo=None, hi=None) -> Rule:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    # nulls are not range violations — that's not_null's job
    return Rule(f"in_range({col})", F.col(col).isNotNull() & cond)


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches({col})",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def one_of(col: str, allowed: list) -> Rule:
    return Rule(
        f"one_of({col})",
        F.col(col).isNotNull() & ~F.col(col).isin(allowed),
    )


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """All scan-level rules in ONE pass: returns (rule, n_violations,
    n_rows) — a conditional-count aggregate per rule, map-side combined."""
    aggs = [
        F.sum(F.when(r.violation, 1).otherwise(0)).alias(r.name) for r in rules
    ] + [F.count(F.lit(1)).alias("_n")]
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(r.name).alias("rule"), F.col(r.name).alias("n_violations"))
            for r in rules
        ]
    )
    return row.select(F.explode(pairs).alias("p"), F.col("_n").alias("n_rows")).select(
        "p.rule", "p.n_violations", "n_rows"
    )


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """(rule, n_violations, n_rows) for key uniqueness: violations = rows
    beyond the first per key. One shuffle on the key."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.sum(F.col("_c") - 1).alias("n_violations"),
            F.sum("_c").alias("n_rows"),
        )
    )
    return dup.select(
        F.lit(f"unique({','.join(cols)})").alias("rule"),
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        "n_rows",
    )


def check_foreign_key(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Orphan count: NON-NULL child keys with no parent (a null FK is
    not an orphan — flag nulls with ``not_null`` if they are illegal).
    Anti-join — broadcast when the parent key set is dimension-sized,
    shuffle otherwise (Catalyst picks; both sides project to single key
    columns first)."""
    orphans = (
        child.select(F.col(child_col).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .join(
            parent.select(F.col(parent_col).alias("_k")).distinct(), "_k", "left_anti"
        )
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(f"fk({child_col}->{parent_col})").alias("rule"),
        "n_violations",
        F.lit(None).cast("bigint").alias("n_rows"),
    )


def quarantine(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """The actionable half of ``check``: route ROWS, not just count
    them. Every row gains ``violations`` (comma-joined names of the
    rules it breaks, sorted; empty string when clean) and
    ``quarantined`` (boolean) — the writer then splits the clean stream
    from the quarantine table in one pass (``partitionBy('quarantined')``
    or two filtered writes) instead of re-scanning per rule. Keeping
    violators WITH their reasons is the operational contract: a
    quarantine table nobody can triage is a dead letter queue.

    Row-local codegen (a when-chain per rule + array_join) — zero
    shuffles added to whatever write follows.
    """
    names = F.filter(
        F.array(
            *[
                F.when(r.violation, F.lit(r.name)).otherwise(F.lit(None))
                for r in sorted(rules, key=lambda r: r.name)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("violations", F.array_join(names, ",")).withColumn(
        "quarantined", F.col("violations") != F.lit("")
    )


#: P[first significant digit = d] under Benford's law, d = 1..9 —
#: log10(1 + 1/d), frozen as repr literals so the Spark expression and
#: every oracle SQL string share bit-identical constants.
BENFORD_P = [
    0.3010299956639812,
    0.17609125905568124,
    0.12493873660829992,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061322,
    0.05799194697768673,
    0.05115252244738129,
    0.04575749056067514,
]


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution of ``value_col`` vs
    Benford's law: ``(digit, n_obs, obs_frac, exp_frac, chi2_term)``,
    one row per digit 1-9. A forensic data-quality screen: fabricated,
    truncated, or unit-mixed numeric columns show first-digit
    distributions far from log10(1 + 1/d), and the per-digit chi-square
    terms localize which digit bucket deviates.

    Rows with NULL or ``abs(value) < 1`` are excluded — the digit is
    extracted on the INTEGER path (first char of floor(abs(v)) as
    BIGINT), which is engine-exact, unlike a floor(log10(v)) float
    round-trip that can misbucket at power-of-ten boundaries. Sub-unit
    columns should be rescaled by the caller (Benford is scale-
    sensitive by nature).

    Scale: one map-side digit extraction + a 9-key aggregate; the
    expected-count terms are computed from frozen literal constants
    (``BENFORD_P``) after the single shuffle.
    """
    digits = (
        df.filter(
            F.col(value_col).isNotNull() & (F.abs(F.col(value_col)) >= 1)
        )
        .select(
            F.substring(
                F.floor(F.abs(F.col(value_col))).cast("bigint").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    total = digits.agg(F.sum("n_obs").alias("_n"))
    exp = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_P]), F.col("digit")
    )
    n_d = F.col("_n").cast("double")
    obs_d = F.col("n_obs").cast("double")
    return (
        digits.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            (F.round(obs_d / n_d, 6) + F.lit(0.0)).alias("obs_frac"),
            F.round(exp, 6).alias("exp_frac"),
            (
                F.round(
                    F.pow(obs_d - n_d * exp, F.lit(2.0)) / (n_d * exp), 4
                )
                + F.lit(0.0)
            ).alias("chi2_term"),
        )
    )


def sequence_gaps(df: DataFrame, id_col: str) -> DataFrame:
    """Missing ranges in an integer key sequence — the completeness
    audit for "ids should be dense" tables (batch counters, page
    numbers, partition indexes): each output row is one HOLE
    ``(gap_start, gap_end, gap_len)`` between consecutive present ids,
    ordered by gap_start. Duplicates and NULLs are ignored; a table
    with no holes returns 0 rows.

    Classic gaps-and-islands: one distinct + one lag() window over the
    distinct-id table (NOT the raw rows — dedup first so the window is
    id-cardinality-sized), all integer arithmetic.
    """
    ids = (
        df.select(F.col(id_col).cast("bigint").alias("_id"))
        .filter(F.col("_id").isNotNull())
        .distinct()
    )
    w = Window.orderBy("_id")
    lagged = ids.withColumn("_prev", F.lag("_id").over(w))
    return (
        lagged.filter(
            F.col("_prev").isNotNull() & (F.col("_id") - F.col("_prev") > 1)
        )
        .select(
            (F.col("_prev") + 1).cast("bigint").alias("gap_start"),
            (F.col("_id") - 1).cast("bigint").alias("gap_end"),
            (F.col("_id") - F.col("_prev") - 1).cast("bigint").alias("gap_len"),
        )
        .orderBy("gap_start")
    )

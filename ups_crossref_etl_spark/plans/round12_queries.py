"""Round-12 gated queries.

Survival completions (Schoenfeld PH diagnostic, Aalen-Johansen
competing-risks CIF), corpus-linguistics completions (Heaps' law fit,
Monroe log-odds keyness), and rank-test completions (Brunner-Munzel,
Quade) — each with a token-mirrored DuckDB oracle per the repo's
float-parity recipe (integer micro/pico quantization before any
aggregate; one-shot double expressions mirrored token-for-token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import read_table
from .registry import register

# --------------------------------------------------------------------------
# Schoenfeld residuals: the proportional-hazards diagnostic
# --------------------------------------------------------------------------


@register(
    "q_events_schoenfeld",
    """
    WITH e AS (
      SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
      FROM events),
    entry AS (SELECT u, min(us) AS st FROM e WHERE t = 'signup'
              GROUP BY u),
    fe AS (
      SELECT e.u, min(e.us) AS pt
      FROM e JOIN entry USING (u)
      WHERE e.t = 'purchase' AND e.us > entry.st
      GROUP BY e.u),
    dur AS (
      SELECT entry.u,
             CASE WHEN pt IS NOT NULL AND pt <= st + 604800000000
                  THEN 1 ELSE 0 END AS ev,
             CASE WHEN pt IS NOT NULL AND pt <= st + 604800000000
                  THEN (pt - st) // 3600000000 ELSE 168 END AS t
      FROM entry LEFT JOIN fe USING (u)),
    x AS (
      SELECT u, ev, CAST(t AS DOUBLE) AS t,
             CAST(u % 21 AS DOUBLE) / 10.0 - 1.0 AS xv
      FROM dur),
    per AS (
      SELECT t,
             CAST(sum(CAST(round(exp(0.1 * xv) * 1e6) AS BIGINT))
                  AS BIGINT) AS s0q,
             CAST(sum(CAST(round(exp(0.1 * xv) * xv * 1e6) AS BIGINT))
                  AS BIGINT) AS s1q,
             CAST(sum(ev) AS BIGINT) AS dd,
             CAST(sum(CAST(round(ev * xv * 1e6) AS BIGINT))
                  AS BIGINT) AS sxq
      FROM x GROUP BY t),
    sfx AS (
      SELECT t, dd, sxq,
             sum(s0q) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                            AND UNBOUNDED FOLLOWING) AS s0s,
             sum(s1q) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                            AND UNBOUNDED FOLLOWING) AS s1s
      FROM per)
    SELECT t, dd AS n_events,
           round(CAST(sxq AS DOUBLE) / 1e6
                 - CAST(dd AS DOUBLE)
                   * (CAST(s1s AS DOUBLE) / CAST(s0s AS DOUBLE)), 6)
             + 0.0 AS residual
    FROM sfx WHERE dd > 0 AND s0s > 0 ORDER BY t
    """,
    doc=(
        "Schoenfeld residuals at FIXED beta = 0.1 (operators/survival."
        "schoenfeld_residuals, Schoenfeld 1982; Grambsch & Therneau "
        "1994): per event time r(t) = sum_events x - d_t*s1(t)/s0(t) "
        "with micro-quantized risk-set suffix sums — THE proportional-"
        "hazards diagnostic a real analysis runs after cox_ph (a time "
        "trend in r(t) means the hazard ratio drifts and the single-"
        "beta readout is mis-specified). Fixed beta keeps it an exact "
        "HASH gate (the cox_baseline contract); the covariate is the "
        "same deterministic (u %% 21)/10 - 1 grid. One per-time "
        "aggregate + ONE ranged prefix pass with three parallel "
        "(signed) integer weights."
    ),
)
def q_events_schoenfeld(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.survival import duration_table, schoenfeld_residuals

    ev = read_table(spark, sf_dir, "events")
    dur = duration_table(
        ev, "user_id", "event_type", "ts",
        entry_type="signup", event_type="purchase",
        horizon_seconds=604800, bucket_seconds=3600,
    ).select(
        "ev",
        F.col("t").cast("double").alias("t"),
        ((F.col("_u") % 21).cast("double") / 10.0 - 1.0).alias("xv"),
    )
    return schoenfeld_residuals(dur, "t", "ev", "xv", beta=0.1)


# --------------------------------------------------------------------------
# Competing-risks cumulative incidence (Aalen-Johansen)
# --------------------------------------------------------------------------


@register(
    "q_events_competing_risks",
    """
    WITH e AS (
      SELECT user_id AS u, event_type AS ty, epoch_us(ts) AS us
      FROM events),
    entry AS (SELECT u, min(us) AS st FROM e WHERE ty = 'signup'
              GROUP BY u),
    f1 AS (
      SELECT e.u, min(e.us) AS pt1
      FROM e JOIN entry USING (u)
      WHERE e.ty = 'purchase' AND e.us > entry.st GROUP BY e.u),
    f2 AS (
      SELECT e.u, min(e.us) AS pt2
      FROM e JOIN entry USING (u)
      WHERE e.ty = 'error' AND e.us > entry.st GROUP BY e.u),
    dur AS (
      SELECT w.u,
             CASE WHEN wt IS NOT NULL AND h1 = wt THEN 1
                  WHEN wt IS NOT NULL AND h2 = wt THEN 2
                  ELSE 0 END AS cause,
             CASE WHEN wt IS NOT NULL
                  THEN (wt - st) // 3600000000 ELSE 168 END AS t
      FROM (
        SELECT entry.u, entry.st,
               CASE WHEN pt1 IS NOT NULL
                         AND pt1 <= st + 604800000000
                    THEN pt1 END AS h1,
               CASE WHEN pt2 IS NOT NULL
                         AND pt2 <= st + 604800000000
                    THEN pt2 END AS h2,
               least(CASE WHEN pt1 IS NOT NULL
                               AND pt1 <= st + 604800000000
                          THEN pt1 END,
                     CASE WHEN pt2 IS NOT NULL
                               AND pt2 <= st + 604800000000
                          THEN pt2 END) AS wt
        FROM entry LEFT JOIN f1 USING (u) LEFT JOIN f2 USING (u)
      ) w),
    agg AS (
      SELECT CAST(t AS BIGINT) AS t,
             CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d2,
             CAST(count(*) AS BIGINT) AS leaving
      FROM dur GROUP BY t),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dur),
    km AS (
      SELECT t, d1, d2, d1 + d2 AS d,
             (SELECT n FROM tot)
               - coalesce(sum(leaving)
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n_risk
      FROM agg),
    st AS (
      SELECT t, d1, d2, d, n_risk,
             coalesce(sum(CASE WHEN d = n_risk
                      THEN CAST(0.0 AS DECIMAL(38,12))
                      ELSE CAST(ln(1.0 - d / CAST(n_risk AS DOUBLE))
                           AS DECIMAL(38,12)) END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING),
               CAST(0 AS DECIMAL(38,12))) AS lnpre,
             coalesce(sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS zpre
      FROM km),
    terms AS (
      SELECT t, d1, d2, d, n_risk,
             CAST(round(CASE WHEN zpre > 0 THEN 0.0
                             ELSE exp(CAST(lnpre AS DOUBLE)) END
                        * CAST(d1 AS DOUBLE)
                        / CAST(n_risk AS DOUBLE) * 1e12)
                  AS BIGINT) AS t1,
             CAST(round(CASE WHEN zpre > 0 THEN 0.0
                             ELSE exp(CAST(lnpre AS DOUBLE)) END
                        * CAST(d2 AS DOUBLE)
                        / CAST(n_risk AS DOUBLE) * 1e12)
                  AS BIGINT) AS t2
      FROM st),
    cum AS (
      SELECT t, d1, d2, d, n_risk,
             sum(CAST(t1 AS DECIMAL(38,0)))
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS c1,
             sum(CAST(t2 AS DECIMAL(38,0)))
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS c2
      FROM terms)
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
           d1 AS n_events_a, d2 AS n_events_b,
           round(CAST(c1 AS DOUBLE) / 1e12, 6) + 0.0 AS cif_a,
           round(CAST(c2 AS DOUBLE) / 1e12, 6) + 0.0 AS cif_b
    FROM cum WHERE d > 0 ORDER BY t
    """,
    doc=(
        "Aalen-Johansen cumulative incidence under COMPETING risks "
        "(operators/survival.competing_risks_cif, Aalen & Johansen "
        "1978): purchase vs error race after signup — CIF_k(t) = "
        "sum_{t_i<=t} S(t_i-)*d_ki/n_i with the ALL-CAUSE KM survival, "
        "the estimator 1-KM_k gets wrong (treating the competing event "
        "as censoring overstates every cause). Tie at the same "
        "microsecond goes to the earlier type in the list, both "
        "engines. KM decimal ln-sum recipe with pico-quantized CIF "
        "increments; windows run over the bounded (<= 168-row) bucket "
        "table, the kaplan_meier precedent."
    ),
)
def q_events_competing_risks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.survival import competing_risks_cif

    ev = read_table(spark, sf_dir, "events")
    return competing_risks_cif(
        ev, "user_id", "event_type", "ts",
        entry_type="signup", event_types=["purchase", "error"],
        horizon_seconds=604800, bucket_seconds=3600,
    )

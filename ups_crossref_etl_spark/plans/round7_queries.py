"""Round-7 query registrations.

New surface this round:
- heavy-key-capped Theil–Sen (``operators/timeseries.theil_sen_trend``
  with ``max_points_per_key``): the measured escape hatch for the per-key
  quadratic — deterministic stride subsampling in time order, pinned both
  as an exact-reproducibility gate and as a slope-agreement bound against
  the uncapped estimator;
- training-shard write → compact → re-read content-identity audit
  (``sources/sinks.write_training_shards`` + ``compact_small_files``):
  the sink path that was pytest-only now has a gated end-to-end proof
  that compaction preserves corpus content exactly.

Every gated entry pairs the Spark program with a DuckDB oracle; column
aliases match exactly (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import read_table
from .registry import register

# --------------------------------------------------------------------------
# Theil–Sen heavy-key cap
# --------------------------------------------------------------------------

# Shared oracle CTE chain: points -> deterministic stride subsample at 40
# points/key -> integer nano-slope pairs -> exact median. Mirrors
# theil_sen_trend(max_points_per_key=40) clause for clause (floor(epoch())
# = unix_timestamp truncation; (rn-1) % ceil(n_k/40) = the stride rule;
# bigint nano-slopes make even-count median interpolation exact).
_CAPPED_CTES = """
    pts AS (
      SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
             CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL),
    ranked AS (
      SELECT k, t, v,
             row_number() OVER (PARTITION BY k ORDER BY t, v) AS rn,
             count(*) OVER (PARTITION BY k) AS n_k
      FROM pts),
    capped AS (
      SELECT k, t, v FROM ranked
      WHERE (rn - 1) % CAST(ceil(n_k / 40.0) AS BIGINT) = 0),
    cpairs AS (
      SELECT a.k,
             CAST(round((b.v - a.v) / CAST(b.t - a.t AS DOUBLE) * 1e9)
                  AS BIGINT) AS s
      FROM capped a JOIN capped b ON a.k = b.k AND b.t > a.t),
    cmed AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
             round(median(s) / 1e9, 6) + 0.0 AS slope
      FROM cpairs GROUP BY k),
    ccnt AS (SELECT k, CAST(count(*) AS BIGINT) AS n_points
             FROM capped GROUP BY k)
"""


@register(
    "q_events_theil_sen_capped",
    f"""
    WITH {_CAPPED_CTES}
    SELECT cmed.k AS user_id, ccnt.n_points, cmed.n_pairs, cmed.slope
    FROM cmed JOIN ccnt USING (k)
    """,
    doc=(
        "Heavy-key-capped Theil-Sen (operators/timeseries.theil_sen_trend "
        "with max_points_per_key=40): keys over the cap are stride-"
        "subsampled in (t, v) order — keep every ceil(n/40)-th point — "
        "bounding the per-key pair count at ~cap^2/2 no matter how hot "
        "the key. The stride rule is a pure function of the sorted "
        "history, so the capped estimator is EXACTLY reproducible: this "
        "gate hash-matches slopes against the same subsample in SQL "
        "(at sf0.01 every user exceeds 40 points, so the cap is "
        "exercised on 100% of keys, not asserted in a docstring)."
    ),
)
def q_events_theil_sen_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import theil_sen_trend

    e = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return theil_sen_trend(e, "user_id", "ts", "value", max_points_per_key=40)


@register(
    "q_events_theil_sen_cap_agreement",
    f"""
    WITH {_CAPPED_CTES},
    fpairs AS (
      SELECT a.k,
             CAST(round((b.v - a.v) / CAST(b.t - a.t AS DOUBLE) * 1e9)
                  AS BIGINT) AS s
      FROM pts a JOIN pts b ON a.k = b.k AND b.t > a.t),
    fmed AS (
      SELECT k, round(median(s) / 1e9, 6) + 0.0 AS slope_full
      FROM fpairs GROUP BY k),
    fcnt AS (SELECT k, CAST(count(*) AS BIGINT) AS n_full FROM pts GROUP BY k),
    j AS (
      SELECT fmed.k, slope_full, cmed.slope AS slope_capped,
             fcnt.n_full, ccnt.n_points AS n_capped
      FROM fmed JOIN cmed ON fmed.k = cmed.k
      JOIN fcnt ON fmed.k = fcnt.k JOIN ccnt ON fmed.k = ccnt.k)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN n_capped < n_full THEN 1 ELSE 0 END)
                AS BIGINT) AS n_capped_users,
           round(max(abs(slope_full - slope_capped)), 6) + 0.0
             AS max_abs_diff,
           max(abs(slope_full - slope_capped)) <= 0.00005 AS within_tol
    FROM j
    """,
    doc=(
        "Slope-agreement bound for the Theil-Sen heavy-key cap: runs the "
        "UNCAPPED estimator and the 40-point stride-capped one over the "
        "same events, joins per user, and pins (n_users, how many keys "
        "the cap actually cut, the max absolute slope divergence, and a "
        "5e-5 value-units/sec tolerance verdict). Both estimator chains "
        "are deterministic, so the gate is hash-exact — the cap's "
        "accuracy cost is MEASURED by the oracle (1.6e-5 at sf0.01), "
        "not asserted. This is the contract that makes the per-key "
        "quadratic safe at 100 TB: the operational path caps, the bound "
        "query proves the cap barely moves the estimate."
    ),
)
def q_events_theil_sen_cap_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.timeseries import theil_sen_trend

    e = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    full = theil_sen_trend(e, "user_id", "ts", "value").select(
        "user_id",
        F.col("n_points").alias("n_full"),
        F.col("slope").alias("slope_full"),
    )
    capped = theil_sen_trend(
        e, "user_id", "ts", "value", max_points_per_key=40
    ).select(
        "user_id",
        F.col("n_points").alias("n_capped"),
        F.col("slope").alias("slope_capped"),
    )
    d = F.abs(F.col("slope_full") - F.col("slope_capped"))
    return (
        full.join(capped, "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(
                F.when(F.col("n_capped") < F.col("n_full"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_capped_users"),
            (F.round(F.max(d), 6) + F.lit(0.0)).alias("max_abs_diff"),
            (F.max(d) <= 0.00005).alias("within_tol"),
        )
    )


# --------------------------------------------------------------------------
# Training-shard export → compaction → content-identity audit
# --------------------------------------------------------------------------


@register(
    "q_docs_shards_compaction_identity",
    """
    WITH sh AS (
      SELECT CAST('0x' || substr(md5('shard-' || CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 16 AS shard,
             CAST('0x' || substr(md5(
               CAST(doc_id AS VARCHAR) || '|' ||
               coalesce(lang, '<NULL>') || '|' ||
               coalesce(source, '<NULL>') || '|' ||
               coalesce(CAST(n_chars AS VARCHAR), '<NULL>')), 1, 15)
               AS BIGINT) AS h
      FROM documents)
    SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS digest,
           TRUE AS compacted,
           TRUE AS layout_matches_assignment
    FROM sh GROUP BY shard
    """,
    doc=(
        "End-to-end sink audit (sources/sinks.write_training_shards + "
        "compact_small_files): export the corpus as 16 hash-assigned "
        "hive-partitioned shards in THREE append passes (simulating "
        "incremental landing — 3 small files per shard dir), compact the "
        "directory, re-read it, and re-derive the shard manifest from "
        "the files on disk. The oracle is the manifest computed straight "
        "from the source table, so a hash match PROVES compaction was "
        "content-preserving row for row and column for column; "
        "`compacted` pins that the file count actually dropped and "
        "hive partitioning survived, `layout_matches_assignment` pins "
        "that every re-read row sits in the shard directory its key "
        "hashes to. The previously pytest-only sink pair is now gated."
    ),
)
def q_docs_shards_compaction_identity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.profile import shard_manifest
    from ..operators.sampling import hash_bucket
    from ..sources.sinks import compact_small_files, write_training_shards

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    tmp = tempfile.mkdtemp(prefix="shards_gate_")
    path = f"{tmp}/shards"
    try:
        # three append passes = the incremental-landing small-files shape
        for r in range(3):
            write_training_shards(
                docs.filter(F.col("doc_id") % 3 == r),
                path,
                "doc_id",
                num_shards=16,
                mode="append",
            )
        stats = compact_small_files(spark, path, target_file_mb=128)
        reread = spark.read.parquet(path)
        n_misplaced = (
            reread.withColumn(
                "_expect", hash_bucket(F.col("doc_id"), "shard", 16)
            )
            .filter(F.col("shard").cast("long") != F.col("_expect"))
            .count()
        )
        man = shard_manifest(
            reread.drop("shard"),
            "doc_id",
            ["doc_id", "lang", "source", "n_chars"],
        ).collect()
        compacted = (
            not stats["skipped"]
            and stats["files_after"] < stats["files_before"]
            and stats["partition_cols"] == ["shard"]
            and stats["rows"] == docs.count()
        )
        return spark.createDataFrame(
            [
                (r["shard"], r["n_rows"], r["digest"], compacted, n_misplaced == 0)
                for r in man
            ],
            "shard long, n_rows long, digest long, compacted boolean, "
            "layout_matches_assignment boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Distribution-drift tests: KS (numeric) and chi-square (categorical)
# --------------------------------------------------------------------------


@register(
    "q_events_ks_drift",
    """
    WITH base AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v,
             CAST(user_id % 2 AS INT) AS b
      FROM events
      WHERE value IS NOT NULL AND user_id IS NOT NULL),
    cells AS (
      SELECT g, v, sum(1 - b) AS ca, sum(b) AS cb
      FROM base GROUP BY g, v),
    stepped AS (
      SELECT g,
             sum(ca) OVER (PARTITION BY g ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum_a,
             sum(cb) OVER (PARTITION BY g ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum_b,
             sum(ca) OVER (PARTITION BY g) AS na,
             sum(cb) OVER (PARTITION BY g) AS nb
      FROM cells)
    SELECT g AS event_type,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           round(max(abs(CAST(cum_a AS DOUBLE) / na
                         - CAST(cum_b AS DOUBLE) / nb)), 4) + 0.0 AS ks_stat
    FROM stepped WHERE na > 0 AND nb > 0
    GROUP BY g
    """,
    doc=(
        "Per-event-type two-sample Kolmogorov-Smirnov drift statistic "
        "(operators/stats.ks_drift) between even and odd user cohorts: "
        "D = max |ECDF_a - ECDF_b|. Binning-free numeric drift — the "
        "companion to PSI (q_events_psi_drift) which needs bucket edges. "
        "One groupBy to distinct (group, value) cells + ONE per-group "
        "window builds both ECDFs; the window partition holds a group's "
        "distinct values, never raw rows."
    ),
)
def q_events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import ks_drift

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return ks_drift(ev, "event_type", "value", F.col("user_id") % 2)


@register(
    "q_events_chisq_drift",
    """
    WITH base AS (
      SELECT event_type AS c, CAST(user_id % 2 AS INT) AS b
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
    cells AS (
      SELECT c, CAST(sum(1 - b) AS BIGINT) AS oa,
             CAST(sum(b) AS BIGINT) AS ob
      FROM base GROUP BY c),
    tot AS (
      SELECT CAST(sum(oa) AS BIGINT) AS na, CAST(sum(ob) AS BIGINT) AS nb,
             CAST(count(*) AS BIGINT) AS k
      FROM cells),
    terms AS (
      SELECT na, nb, k,
             CAST(da * da / (t * r * nad) + db * db / (t * r * nbd)
                  AS DECIMAL(38,12)) AS term
      FROM (
        SELECT na, nb, k,
               CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
               CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) AS t,
               CAST(oa AS DOUBLE) + CAST(ob AS DOUBLE) AS r,
               CAST(oa AS DOUBLE) * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                 - (CAST(oa AS DOUBLE) + CAST(ob AS DOUBLE))
                   * CAST(na AS DOUBLE) AS da,
               CAST(ob AS DOUBLE) * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                 - (CAST(oa AS DOUBLE) + CAST(ob AS DOUBLE))
                   * CAST(nb AS DOUBLE) AS db
        FROM cells CROSS JOIN tot))
    SELECT na AS n_a, nb AS n_b, k AS n_cats,
           CAST(k - 1 AS BIGINT) AS dof,
           round(CAST(sum(term) AS DOUBLE), 4) + 0.0 AS chi2
    FROM terms GROUP BY na, nb, k
    """,
    doc=(
        "Chi-square homogeneity test (operators/stats.chisq_drift) on the "
        "event-type mix of even vs odd user cohorts — the categorical "
        "twin of the KS gate. Per-cell terms in the margin form "
        "(o*T - r*c)^2/(T*r*c) as deterministic doubles, accumulated in "
        "DECIMAL(38,12) so the sum is order-independent; one K-row "
        "shuffle after the category aggregate."
    ),
)
def q_events_chisq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import chisq_drift

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return chisq_drift(ev, "event_type", F.col("user_id") % 2)


# --------------------------------------------------------------------------
# Mann–Kendall trend test (capped) + per-key autocorrelation
# --------------------------------------------------------------------------


@register(
    "q_events_mann_kendall",
    f"""
    WITH {_CAPPED_CTES},
    s AS (
      SELECT a.k, CAST(sum(sign(b.v - a.v)) AS BIGINT) AS s_stat
      FROM capped a JOIN capped b ON a.k = b.k AND b.t > a.t
      GROUP BY a.k),
    tg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS t_g
      FROM capped GROUP BY k, v),
    agg AS (
      SELECT k, CAST(sum(t_g) AS BIGINT) AS n,
             CAST(sum(t_g * (t_g - 1) * (2 * t_g + 5)) AS BIGINT) AS tie_term
      FROM tg GROUP BY k),
    vs AS (
      SELECT s.k, s.s_stat, agg.n,
             (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
              * (2 * CAST(n AS DOUBLE) + 5)
              - CAST(tie_term AS DOUBLE)) / 18.0 AS var_s
      FROM s JOIN agg ON s.k = agg.k)
    SELECT k AS user_id, n AS n_points, s_stat,
           round(CASE WHEN var_s <= 0 THEN 0.0
                      WHEN s_stat > 0
                        THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(var_s)
                      WHEN s_stat < 0
                        THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(var_s)
                      ELSE 0.0 END, 4) + 0.0 AS z
    FROM vs
    """,
    doc=(
        "Per-user Mann-Kendall trend test (operators/timeseries."
        "mann_kendall, max_points_per_key=40): S = sum of pairwise value "
        "signs over the time-ordered capped series, tie-corrected "
        "variance, continuity-corrected z. The significance companion to "
        "the Theil-Sen slope gates — same deterministic stride cap, same "
        "key-clustered pair join, S stays an exact integer so only z "
        "touches floats. At sf0.01 every user exceeds the cap, so the "
        "capped path is exercised on 100% of keys."
    ),
)
def q_events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import mann_kendall

    ev = read_table(spark, sf_dir, "events")
    return mann_kendall(
        ev, "user_id", "ts", "value", max_points_per_key=40
    )


@register(
    "q_events_acf",
    """
    WITH pts AS (
      SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
             CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL),
    ranked AS (
      SELECT k, v,
             row_number() OVER (PARTITION BY k ORDER BY t, v) AS rn
      FROM pts),
    st AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS mean
      FROM ranked GROUP BY k),
    c AS (
      SELECT r.k, r.rn, (r.v - st.mean) AS cv
      FROM ranked r JOIN st ON r.k = st.k),
    den AS (
      SELECT k, sum(CAST(cv * cv AS DECIMAL(38,12))) AS den
      FROM c GROUP BY k),
    num AS (
      SELECT a.k, b.rn - a.rn AS lag,
             sum(CAST(a.cv * b.cv AS DECIMAL(38,12))) AS num
      FROM c a JOIN c b ON a.k = b.k AND b.rn > a.rn AND b.rn - a.rn <= 3
      GROUP BY a.k, b.rn - a.rn)
    SELECT num.k AS user_id, CAST(lag AS BIGINT) AS lag, st.n AS n_points,
           round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) + 0.0
             AS acf_val
    FROM num JOIN den ON num.k = den.k JOIN st ON num.k = st.k
    WHERE den > 0
    """,
    doc=(
        "Per-user sample autocorrelation at lags 1-3 (operators/"
        "timeseries.acf): r_L = sum (x_t - mean)(x_t+L - mean) / "
        "sum (x_t - mean)^2 over the time-ordered series. The "
        "seasonality/memory detector for per-entity telemetry. One "
        "ranking window + ONE range self-join (fanout max_lag per point, "
        "never quadratic) + two key-keyed aggregates; means from exact "
        "DECIMAL sums, per-row products decimal-accumulated so both "
        "engines sum order-independently."
    ),
)
def q_events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import acf

    ev = read_table(spark, sf_dir, "events")
    return acf(ev, "user_id", "ts", "value", max_lag=3)

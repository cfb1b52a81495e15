"""Round-11 query registrations.

Opens with the r10 verdict's #1 ask: ``tfidf_knn_graph`` — the last
measured-superlinear default path in the repo (SCALE_PROBE ``tfidf_knn``
slope 1.5 at 10× under the old RELATIVE df cap) — gets the
capped+exact+cap-agreement treatment that closed clustering-coefficient
in round 10: the operational gate (``q_docs_tfidf_knn``, round6_queries)
now runs an ABSOLUTE posting-list cap, the uncapped semantics are gated
on a bounded sub-corpus by the exact twin here, and the truncation cost
is MEASURED by an edge-set-Jaccard agreement contract, not asserted.

Then the round's other gates: the multi-covariate Cox bound contract
(vector-β Newton over per-time sufficient d-vectors/d×d matrices — the
r10 verdict's #4), and re-verification entries for the operators whose
midrank cumsum moved onto the range-partitioned primitive.

Every gated entry pairs the Spark program with a DuckDB oracle; column
aliases match exactly (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import read_table
from .registry import register

# --------------------------------------------------------------------------
# TF-IDF KNN: bounded exact twin + cap-agreement (the transitivity triple)
# --------------------------------------------------------------------------

#: Node bound for the exact/uncapped twin: doc_id < 120 is a ≤120-doc
#: sub-corpus at ANY scale factor — uncapped pair volume bounded by
#: construction (≤ 120·119/2 pairs).
_TFIDF_DOC_BOUND = 120
#: Absolute df cap for the cap-agreement contract on the bounded
#: sub-corpus: trigram df there tops out at 4 (measured at sf0.001/0.01/
#: 0.1), and 36–89 tokens exceed df=2, so the cap is genuinely
#: exercised — aggressively so, which is the point: the gate measures a
#: harsh cap's cost instead of showcasing a vacuous one.
_TFIDF_AGREE_CAP = 2
#: Edge-set Jaccard floor for the agreement gate. Measured capped-vs-
#: uncapped directed-edge Jaccard on the bounded sub-corpus: 0.68 / 0.79
#: / 0.73 at sf0.001 / 0.01 / 0.1 — 0.6 keeps margin at every SF.
_TFIDF_AGREE_FLOOR = 0.6


def _tfidf_knn_sql(where: str, cap: int | None, k: int = 5) -> str:
    """TF-IDF KNN oracle, parameterized like round10's _transitivity_sql:
    a documents row filter for the bounded twin and an ABSOLUTE df cap
    (``HAVING count(*) <= cap``; None → uncapped). Mirrors
    operators/retrieval.tfidf_knn_graph token-for-token: trigram
    shingles, sklearn smooth-idf, 4-dp cosine, neighbor-id tiebreak."""
    capsql = f"HAVING count(*) <= {cap}" if cap is not None else ""
    return f"""
    WITH dw AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ws
      FROM documents {where}),
    toks AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i+1]
                                        || ' ' || ws[i+2])) AS tok
      FROM dw),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    n AS (SELECT count(*) AS n FROM dw),
    dfreq AS (
      SELECT tok, count(*) AS df FROM tf GROUP BY 1
      {capsql}),
    w AS (
      SELECT tf.doc_id, tf.tok,
             tf.tf * (ln((1.0 + n.n) / (1.0 + dfreq.df)) + 1.0) AS w
      FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
      FROM w a JOIN w b USING (tok)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    cosp AS (
      SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 4) AS cos
      FROM dots JOIN nrm na ON na.doc_id = dots.id_a
                JOIN nrm nb ON nb.doc_id = dots.id_b),
    mir AS (
      SELECT id_a, id_b, cos FROM cosp
      UNION ALL SELECT id_b, id_a, cos FROM cosp),
    rk AS (
      SELECT id_a, id_b, cos,
             row_number() OVER (PARTITION BY id_a
                                ORDER BY cos DESC, id_b) AS rank
      FROM mir)
    SELECT id_a AS doc_id, id_b AS neighbor_id, cos,
           CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= {k}
    """


@register(
    "q_docs_tfidf_knn_exact",
    _tfidf_knn_sql(f"WHERE doc_id < {_TFIDF_DOC_BOUND}", None),
    doc=(
        "UNCAPPED TF-IDF KNN on the bounded doc_id < 120 sub-corpus "
        "(<= 120 documents at ANY scale factor, pair volume bounded by "
        "construction) — the exact-semantics twin of the absolute-"
        "capped operational q_docs_tfidf_knn, mirroring "
        "q_graph_transitivity_exact: the full smooth-idf cosine "
        "arithmetic with NO posting list dropped, hash-gated "
        "row-for-row against the oracle."
    ),
)
def q_docs_tfidf_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import tfidf_knn_graph

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _TFIDF_DOC_BOUND
    )
    return tfidf_knn_graph(
        docs, "text", "doc_id", k=5, max_df=None, ngram=3
    )


@register(
    "q_docs_tfidf_knn_cap_agreement",
    f"""
    WITH fulle AS ({_tfidf_knn_sql(
        f"WHERE doc_id < {_TFIDF_DOC_BOUND}", None)}),
    cape AS ({_tfidf_knn_sql(
        f"WHERE doc_id < {_TFIDF_DOC_BOUND}", _TFIDF_AGREE_CAP)}),
    fe AS (SELECT doc_id, neighbor_id FROM fulle),
    ce AS (SELECT doc_id, neighbor_id FROM cape),
    inter AS (
      SELECT CAST(count(*) AS BIGINT) AS n_shared
      FROM fe JOIN ce USING (doc_id, neighbor_id)),
    cnts AS (
      SELECT CAST((SELECT count(*) FROM fe) AS BIGINT) AS n_exact_edges,
             CAST((SELECT count(*) FROM ce) AS BIGINT) AS n_capped_edges)
    SELECT n_exact_edges, n_capped_edges, n_shared AS n_shared_edges,
           round(CAST(n_shared AS DOUBLE)
                 / CAST(n_exact_edges + n_capped_edges - n_shared
                        AS DOUBLE), 6) + 0.0 AS edge_jaccard,
           CAST(n_shared AS DOUBLE)
             / CAST(n_exact_edges + n_capped_edges - n_shared AS DOUBLE)
             >= {_TFIDF_AGREE_FLOOR} AS agree_ok
    FROM cnts CROSS JOIN inter
    """,
    doc=(
        "Cap-agreement contract for the TF-IDF posting-list cap (the "
        "transitivity cap-agreement pattern): on the bounded doc_id < "
        "120 sub-corpus — where the uncapped path is tractable at any "
        "scale — build the KNN edge set UNCAPPED and with an ABSOLUTE "
        "df cap of 2 (trigram df there tops out at 4 and 36-89 tokens "
        "exceed the cap, so it is genuinely — aggressively — "
        "exercised) and bound the directed-edge-set Jaccard at 0.6 "
        "(measured 0.68-0.79 across sf0.001/0.01/0.1). Both edge sets "
        "are deterministic (4-dp cosine, neighbor-id tiebreak), so the "
        "gate is hash-exact: the cap's accuracy cost on the "
        "operational q_docs_tfidf_knn path is MEASURED by the oracle, "
        "not asserted in a docstring."
    ),
)
def q_docs_tfidf_knn_cap_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.retrieval import tfidf_knn_graph

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _TFIDF_DOC_BOUND
    )
    # each edge set feeds THREE actions (two counts + the shared-edge
    # join); checkpoint the k-bounded edge lists so each tfidf pipeline
    # (tokenize -> df -> weights -> knn self-join) executes exactly once
    # (r13: previously the full pipeline ran 2x and the capped 2x)
    full = tfidf_knn_graph(
        docs, "text", "doc_id", k=5, max_df=None, ngram=3
    ).select("doc_id", "neighbor_id").localCheckpoint()
    capped = tfidf_knn_graph(
        docs, "text", "doc_id", k=5, max_df=_TFIDF_AGREE_CAP, ngram=3
    ).select("doc_id", "neighbor_id").localCheckpoint()
    n_full = full.count()
    n_cap = capped.count()
    n_shared = full.join(capped, ["doc_id", "neighbor_id"]).count()
    union = n_full + n_cap - n_shared
    jac = n_shared / union if union else 0.0
    return spark.range(1).select(
        F.lit(n_full).cast("bigint").alias("n_exact_edges"),
        F.lit(n_cap).cast("bigint").alias("n_capped_edges"),
        F.lit(n_shared).cast("bigint").alias("n_shared_edges"),
        (F.round(F.lit(jac), 6) + 0.0).alias("edge_jaccard"),
        F.lit(bool(jac >= _TFIDF_AGREE_FLOOR)).alias("agree_ok"),
    )


# --------------------------------------------------------------------------
# Multi-covariate Cox proportional hazards (bound contract)
# --------------------------------------------------------------------------


@register(
    "q_events_cox_multi_bound",
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
                  THEN 1 ELSE 0 END AS ev
      FROM entry LEFT JOIN fe USING (u)),
    xs AS (
      SELECT DISTINCT user_id AS u FROM events WHERE value IS NOT NULL),
    sub AS (SELECT dur.* FROM dur JOIN xs USING (u))
    SELECT CAST(count(*) AS BIGINT) AS n_subjects,
           CAST(sum(ev) AS BIGINT) AS n_events,
           true AS nll_nonincreasing,
           true AS beats_null,
           true AS beats_single,
           true AS beta_bounded,
           true AS stepped
    FROM sub
    """,
    doc=(
        "Quality contract for the MULTI-covariate distributed Cox fit "
        "(operators/survival.cox_ph_multi — the r10 verdict's #4: the "
        "vector-beta completion of the scalar cox_ph, per-time "
        "sufficient statistics as d-vectors / d x d matrices, one "
        "driver np.linalg.solve per Newton step): signup->purchase "
        "hazard regressed JOINTLY on each user's standardized mean "
        "event value and standardized event count. Iterative float "
        "state, so the gate pins the deterministic guarantees (the "
        "ALS/IRLS/cox_bound pattern): nll path non-increasing "
        "(asserted from the actual path), fitted nll <= the beta=0 "
        "null, fitted nll <= the SINGLE-covariate fit's nll + 1e-6 "
        "(the nested model must not beat its superset — measured "
        "margins 0.14 nats at sf0.01, 12.5 at sf0.1), |beta| sane, "
        ">= 1 accepted step; exact side = subject/event counts from "
        "the same duration construction as q_events_cox_bound. Scale "
        "shape per Newton step: one map-side-combinable per-leaving-"
        "time aggregate of 1 + d + d(d+1)/2 + 1 + d micro-quantized "
        "integer columns + the PREPARTITIONED range prefix pass "
        "(boundaries frozen once per fit, r11) + one time-table "
        "reduction; the driver holds a d-vector and a d x d Hessian."
    ),
)
def q_events_cox_multi_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.survival import cox_ph_nested, duration_table

    ev = read_table(spark, sf_dir, "events")
    dur = duration_table(
        ev, "user_id", "event_type", "ts",
        entry_type="signup", event_type="purchase",
        horizon_seconds=604800, bucket_seconds=3600,
    )
    xs = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.col("user_id").alias("_u"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("_x1raw"),
            F.count(F.lit(1)).cast("double").alias("_x2raw"),
        )
    )
    # ONE materialization of the duration+covariate lineage (round 12):
    # the moments collect, the fits' prepared base, and the final
    # subject/event reduction all previously recomputed the full
    # events-table lineage (two user-keyed aggregates + join) — three
    # corpus passes for one 150k-row subject table
    sub = dur.join(xs, "_u").localCheckpoint()
    mom = sub.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.avg("_x1raw").alias("_m1"),
        F.stddev_pop("_x1raw").alias("_s1"),
        F.avg("_x2raw").alias("_m2"),
        F.stddev_pop("_x2raw").alias("_s2"),
    ).collect()[0]
    s1 = float(mom["_s1"] or 0.0)
    s2 = float(mom["_s2"] or 0.0)
    z1 = (F.col("_x1raw") - F.lit(float(mom["_m1"] or 0.0))) / F.lit(
        s1 if s1 > 0 else 1.0
    )
    z2 = (F.col("_x2raw") - F.lit(float(mom["_m2"] or 0.0))) / F.lit(
        s2 if s2 > 0 else 1.0
    )
    d = sub.select("ev", "t", z1.alias("_z1"), z2.alias("_z2"))
    # descent, not convergence (the cox_bound precedent): 2-3 Newton
    # iterations at a loose tol — the contract booleans need one
    # accepted step and a superset-beats-subset comparison, not
    # 6-digit convergence through quantization-plateau noise. Both
    # fits share ONE prepared (range-partitioned, checkpointed)
    # subject table via cox_ph_nested (round 12, r11 verdict #3): the
    # old independent cox_ph re-materialized the whole duration
    # lineage and re-partitioned it purely to feed beats_single.
    # size the fit's partitioning to the KNOWN subject count (mom
    # already counted it): ~100k subjects per partition — a 1.5k-row
    # table on 32 shuffle partitions spent its whole budget on
    # empty-task stage scheduling (round 12; ~3 stage barriers per
    # Newton stats pass)
    fits = cox_ph_nested(
        d, "t", "ev", ["_z1", "_z2"], ["_z1"],
        iterations=3, tol=1e-4, nested_iterations=2,
        n_partitions=max(1, int(mom["_n"] or 0) // 100_000),
    )
    multi = fits["full"]
    single = fits["nested"]
    path = multi["nll_path"]
    mono = all(a >= b - 1e-9 for a, b in zip(path, path[1:]))
    return sub.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subjects"),
        F.sum("ev").cast("bigint").alias("n_events"),
    ).select(
        "n_subjects",
        "n_events",
        F.lit(bool(mono)).alias("nll_nonincreasing"),
        F.lit(bool(path[-1] <= path[0] + 1e-6)).alias("beats_null"),
        F.lit(bool(path[-1] <= single["nll_path"][-1] + 1e-6)).alias(
            "beats_single"
        ),
        F.lit(
            bool(max(abs(b) for b in multi["beta"]) < 50.0)
        ).alias("beta_bounded"),
        F.lit(bool(multi["iterations_run"] >= 1)).alias("stepped"),
    )


# --------------------------------------------------------------------------
# Round-11b wave: reliability / partial association / outlier screen /
# binary blocks / ordered trend / FDR adjust / survival completions
# --------------------------------------------------------------------------


@register(
    "q_lineitem_cronbach_alpha",
    """
    WITH q AS (
      SELECT CAST(round(l_quantity * 1000000) AS BIGINT) AS q0,
             CAST(round(l_extendedprice / 1000.0 * 1000000) AS BIGINT)
               AS q1,
             CAST(round(l_discount * 100 * 1000000) AS BIGINT) AS q2,
             CAST(round(l_tax * 100 * 1000000) AS BIGINT) AS q3
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
    w AS (SELECT q0, q1, q2, q3, q0 + q1 + q2 + q3 AS qt FROM q),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(q0 AS HUGEINT)) AS s0, sum(CAST(q0 AS HUGEINT) * q0) AS ss0,
             sum(CAST(q1 AS HUGEINT)) AS s1, sum(CAST(q1 AS HUGEINT) * q1) AS ss1,
             sum(CAST(q2 AS HUGEINT)) AS s2, sum(CAST(q2 AS HUGEINT) * q2) AS ss2,
             sum(CAST(q3 AS HUGEINT)) AS s3, sum(CAST(q3 AS HUGEINT) * q3) AS ss3,
             sum(CAST(qt AS HUGEINT)) AS st, sum(CAST(qt AS HUGEINT) * qt) AS sst
      FROM w),
    v AS (
      SELECT n,
             (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 1e12
             + (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 1e12
             + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 1e12
             + (CAST(ss3 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 1e12
               AS iv,
             (CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 1e12
               AS tv
      FROM agg)
    SELECT n, CAST(4 AS BIGINT) AS k_items,
           round(iv, 6) + 0.0 AS sum_item_var,
           round(tv, 6) + 0.0 AS total_var,
           CASE WHEN n >= 2 AND tv > 0.0
                THEN round(4.0 / 3.0 * (1.0 - iv / tv), 6)
           END + 0.0 AS alpha
    FROM v
    """,
    doc=(
        "Cronbach's alpha internal-consistency reliability "
        "(operators/stats.cronbach_alpha, Cronbach 1951) over a "
        "4-item lineitem numeric battery (quantity, price/1000, "
        "discount*100, tax*100): alpha = k/(k-1) * (1 - sum item "
        "variance / total variance) — the 'do these signals measure "
        "one construct?' screen before compositing sub-scores. "
        "Micro-quantized items, DECIMAL(38,0) (oracle: HUGEINT) "
        "integer moment sums, one map-side-combinable global "
        "aggregate of 2k+2 columns; every variance a one-shot double "
        "mirrored token-for-token."
    ),
)
def q_lineitem_cronbach_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.stats import cronbach_alpha

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("i0"),
        (F.col("l_extendedprice").cast("double") / 1000.0).alias("i1"),
        (F.col("l_discount").cast("double") * 100.0).alias("i2"),
        (F.col("l_tax").cast("double") * 100.0).alias("i3"),
    )
    return cronbach_alpha(li, ["i0", "i1", "i2", "i3"])


@register(
    "q_lineitem_partial_corr",
    """
    WITH q AS (
      SELECT CAST(round(l_quantity * 1000000) AS BIGINT) AS x,
             CAST(round(l_extendedprice / 1000.0 * 1000000) AS BIGINT)
               AS y,
             CAST(round(l_discount * 100 * 1000000) AS BIGINT) AS z
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(z AS HUGEINT)) AS sz,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(z AS HUGEINT) * z) AS szz,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * z) AS sxz,
             sum(CAST(y AS HUGEINT) * z) AS syz
      FROM q),
    r AS (
      SELECT n,
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
        (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
        (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
      FROM agg)
    SELECT n,
           round(rxy, 6) + 0.0 AS r_xy,
           round(rxz, 6) + 0.0 AS r_xz,
           round(ryz, 6) + 0.0 AS r_yz,
           CASE WHEN n >= 3
                 AND (1.0 - rxz * rxz) * (1.0 - ryz * ryz) > 0.0
                THEN round((rxy - rxz * ryz)
                           / sqrt((1.0 - rxz * rxz)
                                * (1.0 - ryz * ryz)), 6)
           END + 0.0 AS partial_r
    FROM r
    """,
    doc=(
        "First-order partial correlation (operators/stats.partial_corr): "
        "quantity vs extended price CONTROLLING for discount — does "
        "the raw association survive removing the confounder? One "
        "map-side-combinable aggregate of 10 DECIMAL(38,0) (oracle: "
        "HUGEINT) sufficient statistics over micro-quantized values "
        "(the ols_xy trick widened to 3 variables); every r and the "
        "partial are one-shot doubles mirrored token-for-token."
    ),
)
def q_lineitem_partial_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.stats import partial_corr

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("x"),
        (F.col("l_extendedprice").cast("double") / 1000.0).alias("y"),
        (F.col("l_discount").cast("double") * 100.0).alias("z"),
    )
    return partial_corr(li, "x", "y", "z")


@register(
    "q_events_grubbs",
    """
    WITH b AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL),
    mo AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(v AS DECIMAL(38,12))) AS s1,
             sum(CAST(CAST(v AS DECIMAL(38,12))
                      * CAST(v AS DECIMAL(38,12)) AS DECIMAL(38,12)))
               AS s2
      FROM b GROUP BY g),
    mm AS (
      SELECT g, n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CASE WHEN n > 1 THEN
               sqrt((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                       / CAST(n AS DOUBLE))
                    / CAST(n - 1 AS DOUBLE)) END AS sd
      FROM mo),
    dev AS (
      SELECT b.g, max(CAST(round(abs(b.v - mm.mean) * 1000000)
                           AS BIGINT)) AS maxdev,
             max(mm.n) AS n, max(mm.mean) AS mean, max(mm.sd) AS sd
      FROM b JOIN mm USING (g) GROUP BY b.g)
    SELECT g AS event_type, n,
           round(mean, 6) + 0.0 AS mean,
           round(sd, 6) + 0.0 AS sd,
           CASE WHEN n >= 3 AND sd > 0.0
                THEN round(CAST(maxdev AS DOUBLE) / 1e6 / sd, 6)
           END + 0.0 AS g_stat
    FROM dev
    """,
    doc=(
        "Grubbs' maximum-normed-residual outlier statistic per event "
        "type (operators/stats.grubbs_test, Grubbs 1950): G = "
        "max|x - mean| / sd — the classical single-outlier screen "
        "beside the robust mad_outliers. Two group-keyed aggregates "
        "(exact DECIMAL moments, then an integer micro-quantized MAX "
        "deviation — order-free) joined on the broadcast group table; "
        "G is a one-shot double."
    ),
)
def q_events_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import grubbs_test

    ev = read_table(spark, sf_dir, "events")
    return grubbs_test(ev, "event_type", "value")


@register(
    "q_events_cochran_q",
    """
    WITH b AS (
      SELECT CAST(user_id AS VARCHAR) AS s, event_type AS t,
             CASE WHEN coalesce(value, 0) > 100 THEN 1 ELSE 0 END AS y
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    cell AS (SELECT s, t, max(y) AS y FROM b GROUP BY s, t),
    kk AS (SELECT count(DISTINCT t) AS k FROM b),
    rows_ AS (
      SELECT s, count(*) AS nt, CAST(sum(y) AS BIGINT) AS li
      FROM cell GROUP BY s),
    comp AS (SELECT s, li FROM rows_ WHERE nt = (SELECT k FROM kk)),
    gj AS (
      SELECT cell.t, CAST(sum(cell.y) AS BIGINT) AS gj
      FROM cell JOIN comp USING (s) GROUP BY cell.t),
    top AS (
      SELECT CAST(count(*) AS BIGINT) AS k_treatments,
             CAST(sum(gj) AS BIGINT) AS tt,
             CAST(sum(gj * gj) AS BIGINT) AS g2
      FROM gj),
    bot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_subjects,
             CAST(sum(li * li) AS BIGINT) AS l2
      FROM comp)
    SELECT n_subjects, k_treatments,
           CASE WHEN n_subjects >= 2 AND k_treatments >= 2
                 AND CAST(k_treatments AS DOUBLE) * CAST(tt AS DOUBLE)
                     - CAST(l2 AS DOUBLE) > 0.0
                THEN round(
                  (CAST(k_treatments AS DOUBLE) - 1.0)
                  * (CAST(k_treatments AS DOUBLE) * CAST(g2 AS DOUBLE)
                     - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE))
                  / (CAST(k_treatments AS DOUBLE) * CAST(tt AS DOUBLE)
                     - CAST(l2 AS DOUBLE)), 6)
           END + 0.0 AS q_stat
    FROM top CROSS JOIN bot
    """,
    doc=(
        "Cochran's Q test (operators/stats.cochran_q): do the event "
        "types have equal 'high-value interaction' (value > 100) "
        "rates across users measured under ALL types (complete "
        "blocks)? The k-treatment generalization of McNemar and the "
        "binary sibling of friedman_test; every term is an exact "
        "integer aggregate, the statistic one double ratio. Keyed "
        "aggregates only — no windows, no driver state."
    ),
)
def q_events_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import cochran_q

    ev = read_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("s"),
        F.col("event_type").alias("t"),
        (F.coalesce(F.col("value"), F.lit(0.0)) > 100.0).alias("y"),
    )
    return cochran_q(ev, "s", "t", "y")


@register(
    "q_events_page_trend",
    """
    WITH b AS (
      SELECT CAST(user_id AS VARCHAR) AS bk,
             CASE WHEN EXTRACT(hour FROM ts) < 8 THEN 'night'
                  WHEN EXTRACT(hour FROM ts) < 16 THEN 'day'
                  ELSE 'evening' END AS t,
             CAST(value AS DOUBLE) AS v
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL),
    cell AS (
      SELECT bk, t,
             CAST(sum(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS m
      FROM b GROUP BY bk, t),
    comp AS (
      SELECT bk FROM cell GROUP BY bk HAVING count(*) = 3),
    cc AS (SELECT cell.* FROM cell JOIN comp USING (bk)),
    rk AS (
      SELECT bk, t,
             CAST(rank() OVER (PARTITION BY bk ORDER BY m) AS DOUBLE)
             + (CAST(count(*) OVER (PARTITION BY bk, m) AS DOUBLE)
                - 1.0) / 2.0 AS r
      FROM cc),
    ordw AS (
      SELECT * FROM (VALUES ('night', 1), ('day', 2), ('evening', 3))
        AS o(t, j)),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks FROM comp),
    l AS (
      SELECT sum(CAST(ordw.j AS DOUBLE) * rk.r) AS lv
      FROM rk JOIN ordw USING (t))
    SELECT nb.n_blocks, CAST(3 AS BIGINT) AS k_treatments,
           round(l.lv, 2) + 0.0 AS l_stat,
           CASE WHEN nb.n_blocks >= 2 THEN
             round((l.lv - CAST(nb.n_blocks AS DOUBLE) * 3.0 * 16.0
                            / 4.0)
                   / sqrt(CAST(nb.n_blocks AS DOUBLE) * 9.0 * 4.0 * 8.0
                          / 144.0), 6)
           END + 0.0 AS z
    FROM nb CROSS JOIN l
    """,
    doc=(
        "Page's L trend test (operators/stats.page_trend, Page 1963): "
        "is per-user mean event value MONOTONE across the hypothesized "
        "night < day < evening ordering, rather than merely unequal "
        "(friedman_test)? L = sum j*R_j over complete blocks with the "
        "normal approximation E[L] = n*k(k+1)^2/4, Var = "
        "n*k^2(k+1)(k^2-1)/144 (k=3: 12n, sqrt(2n)). Exact DECIMAL "
        "cell means, within-block 3-row midrank windows, keyed "
        "aggregates; the ordinal weights join from a broadcast "
        "3-row literal."
    ),
)
def q_events_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import page_trend

    # ts IS NOT NULL matches the oracle predicate: without it a NULL
    # timestamp falls through F.when to the 'evening' bucket on the
    # Spark side only (ADVICE r11)
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        F.col("user_id").cast("string").alias("bk"),
        F.when(F.hour("ts") < 8, F.lit("night"))
        .when(F.hour("ts") < 16, F.lit("day"))
        .otherwise(F.lit("evening"))
        .alias("t"),
        F.col("value").cast("double").alias("v"),
    ).filter(F.col("v").isNotNull() & F.col("bk").isNotNull())
    return page_trend(ev, "bk", "t", "v", ["night", "day", "evening"])


@register(
    "q_events_bh_adjust",
    """
    WITH cells AS (
      SELECT event_type || ':' || CAST(EXTRACT(hour FROM ts) AS VARCHAR)
               AS k,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1),
    mo AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
             sqrt((CAST(sum(c * c) AS DOUBLE)
                   - CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE))
                  / CAST(count(*) AS DOUBLE)) AS sd
      FROM cells),
    ps AS (
      SELECT k, round(exp(-abs((CAST(c AS DOUBLE) - mo.mu)
                               / CASE WHEN mo.sd > 0.0 THEN mo.sd
                                      ELSE 1.0 END)), 9) + 0.0 AS p,
             mo.m AS m
      FROM cells CROSS JOIN mo),
    r AS (
      SELECT k, p, m,
             CAST(row_number() OVER (ORDER BY p, k) AS BIGINT) AS rk
      FROM ps),
    c AS (
      SELECT k, p, rk,
             CAST(round(p * CAST(m AS DOUBLE) / CAST(rk AS DOUBLE)
                        * 1e9) AS BIGINT) AS cq
      FROM r),
    s AS (
      SELECT k, p, rk,
             min(cq) OVER (ORDER BY rk ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING) AS sq
      FROM c)
    SELECT k AS cell, round(p, 6) + 0.0 AS p_value, rk AS rank,
           round(CAST(least(sq, 1000000000) AS DOUBLE) / 1e9, 6) + 0.0
             AS q_value
    FROM s
    """,
    doc=(
        "Benjamini-Hochberg FDR adjustment (operators/stats.bh_adjust, "
        "Benjamini & Hochberg 1995) over per-(event_type, hour) cell "
        "'p-values' (a deterministic exp(-|z|) transform of the cell "
        "count z-score — the gate exercises the ADJUSTMENT machinery; "
        "real p's come from the battery's tests): q_(i) = min_{j>=i} "
        "p_(j)*m/j capped at 1 — THE multiplicity correction before "
        "reading thousands of per-segment readouts as discoveries. "
        "Distributed with NO global per-row window: ranks from a "
        "range-partitioned exclusive count over the distinct-p table "
        "+ p-partitioned row_number, and the step-up sweep is a "
        "range-partitioned SUFFIX MIN over integer nanos "
        "(stats._ranged_suffix_min — per-partition running min + an "
        "exact partition-minima fold). Oracle sweeps identical "
        "integers with a plain window."
    ),
)
def q_events_bh_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import bh_adjust

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    cells = ev.groupBy(
        F.concat_ws(
            ":", F.col("event_type"), F.hour("ts").cast("string")
        ).alias("cell")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    mo = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("_m"),
        F.sum("c").cast("bigint").alias("_s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("_ss"),
    ).collect()[0]
    m = int(mo["_m"])
    mu = float(mo["_s"]) / m
    var = (float(mo["_ss"]) - float(mo["_s"]) ** 2 / m) / m
    sd = var**0.5 if var > 0 else 1.0
    ps = cells.select(
        "cell",
        (
            F.round(
                F.exp(
                    -F.abs(
                        (F.col("c").cast("double") - F.lit(mu))
                        / F.lit(sd if sd > 0 else 1.0)
                    )
                ),
                9,
            )
            + 0.0
        ).alias("p"),
    )
    return bh_adjust(ps, "cell", "p")


@register(
    "q_events_greenwood",
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
    agg AS (
      SELECT CAST(t AS BIGINT) AS t,
             CAST(sum(ev) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS leaving
      FROM dur GROUP BY t),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dur),
    km AS (
      SELECT t, n_events,
             (SELECT n FROM tot)
               - coalesce(sum(leaving)
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n_risk
      FROM agg),
    st AS (
      SELECT t, n_risk, n_events,
             sum(CASE WHEN n_events = n_risk
                      THEN CAST(0.0 AS DECIMAL(38,12))
                      ELSE CAST(ln(1.0 - n_events
                                   / CAST(n_risk AS DOUBLE))
                           AS DECIMAL(38,12)) END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnsum,
             sum(CASE WHEN n_events = n_risk
                      THEN CAST(0 AS DECIMAL(38,0))
                      ELSE CAST(CAST(round(
                             CAST(n_events AS DOUBLE)
                             / (CAST(n_risk AS DOUBLE)
                                * (CAST(n_risk AS DOUBLE)
                                   - CAST(n_events AS DOUBLE)))
                             * 1e12) AS BIGINT) AS DECIMAL(38,0)) END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS gwsum,
             sum(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS zeros
      FROM km),
    fin AS (
      SELECT t, n_risk, n_events,
             CASE WHEN zeros > 0 THEN 0.0
                  ELSE exp(CAST(lnsum AS DOUBLE)) END AS s,
             CASE WHEN zeros = 0 THEN
               exp(CAST(lnsum AS DOUBLE))
               * sqrt(CAST(gwsum AS DOUBLE) / 1e12) END AS se
      FROM st WHERE n_events > 0)
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, n_events,
           round(s, 6) + 0.0 AS survival,
           round(se, 6) + 0.0 AS se,
           CASE WHEN se IS NOT NULL THEN
             round(greatest(s - 1.96 * se, 0.0), 6) + 0.0 END AS lo,
           CASE WHEN se IS NOT NULL THEN
             round(least(s + 1.96 * se, 1.0), 6) + 0.0 END AS hi
    FROM fin
    """,
    doc=(
        "Kaplan-Meier curve WITH Greenwood 95% confidence bands "
        "(operators/survival.greenwood_bands, Greenwood 1926): "
        "Var[S] = S^2 * sum d/(n(n-d)), bands S +/- 1.96se clamped to "
        "[0,1] — the uncertainty the bare KM gate hides. Same recipe "
        "as q_events_kaplan_meier plus a second DECIMAL cumulative "
        "sum of pico-quantized Greenwood terms; se NULL from the "
        "first risk-set-exhausting bucket."
    ),
)
def q_events_greenwood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.survival import greenwood_bands

    ev = read_table(spark, sf_dir, "events")
    return greenwood_bands(
        ev, "user_id", "event_type", "ts",
        entry_type="signup", event_type="purchase",
        horizon_seconds=604800, bucket_seconds=3600,
    )


@register(
    "q_events_cox_baseline",
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
             CAST(sum(ev) AS BIGINT) AS dd
      FROM x GROUP BY t),
    sfx AS (
      SELECT t, dd,
             sum(s0q) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                            AND UNBOUNDED FOLLOWING) AS s0s
      FROM per),
    evt AS (
      SELECT t, dd AS n_events, s0s,
             CAST(round(CAST(dd AS DOUBLE)
                        / (CAST(s0s AS DOUBLE) / 1e6) * 1e9)
                  AS BIGINT) AS hq
      FROM sfx WHERE dd > 0),
    cum AS (
      SELECT t, n_events, s0s,
             sum(hq) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
               AS hcum
      FROM evt)
    SELECT t, n_events,
           round(CAST(s0s AS DOUBLE) / 1e6, 6) + 0.0 AS s0,
           round(CAST(hcum AS DOUBLE) / 1e9, 6) + 0.0 AS h0
    FROM cum ORDER BY t
    """,
    doc=(
        "Breslow baseline cumulative hazard at a FIXED beta = 0.1 "
        "(operators/survival.cox_baseline_hazard): H0(t) = "
        "sum_{t_i<=t} d_i / S0(t_i) with S0 the micro-quantized "
        "risk-set suffix sum — what turns a cox_ph fit into absolute "
        "risk curves, and (because beta is an input) the exact HASH "
        "gate for the Cox risk-set suffix machinery that the "
        "iterative bound gates can only boolean-check. Covariate is "
        "the deterministic (u %% 21)/10 - 1 grid; per-time aggregate "
        "+ two range-partitioned prefix passes, no unpartitioned "
        "window."
    ),
)
def q_events_cox_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.survival import cox_baseline_hazard, duration_table

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
    return cox_baseline_hazard(dur, "t", "ev", "xv", beta=0.1)


# --------------------------------------------------------------------------
# Round-11c wave: corpus diagnostics + effect size + survival discrimination
# --------------------------------------------------------------------------


@register(
    "q_docs_zipf_fit",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text),
                                                   '[^a-z0-9]+'),
                                x -> x <> '')) AS token
      FROM documents),
    tf AS (
      SELECT token, CAST(count(*) AS BIGINT) AS f
      FROM toks GROUP BY token HAVING count(*) >= 2),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS v, CAST(sum(f) AS BIGINT) AS tt
      FROM tf),
    rk AS (
      SELECT token, f,
             CAST(row_number() OVER (ORDER BY f DESC, token) AS BIGINT)
               AS rank
      FROM tf),
    q AS (
      SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT)
               AS x,
             CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT)
               AS y
      FROM rk),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM q),
    fit AS (
      SELECT n,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM agg)
    SELECT tot.v AS vocab_size, tot.tt AS total_tokens,
           round(cov / dx, 6) + 0.0 AS slope,
           round((syd - cov / dx * sxd) / CAST(n AS DOUBLE)
                 / 1000000.0, 6) + 0.0 AS intercept,
           CASE WHEN dy > 0 THEN round(cov * cov / (dx * dy), 4)
           END + 0.0 AS r2
    FROM fit CROSS JOIN tot
    """,
    doc=(
        "Zipf's-law fit of the corpus unigram distribution "
        "(operators/text_analysis.zipf_fit): log-log OLS of "
        "ln(frequency) on ln(rank) over the min_count>=2 vocabulary — "
        "natural text sits near slope -1; a far-off slope or low r2 "
        "flags templated/synthetic corpora before they pollute a "
        "training mix. Ranks with NO global per-row window (ranged "
        "exclusive count over distinct frequencies + tie row_number); "
        "the fit reuses ols_xy's micro-quantized sufficient-statistics "
        "aggregate, mirrored token-for-token in the oracle."
    ),
)
def q_docs_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import zipf_fit

    docs = read_table(spark, sf_dir, "documents")
    return zipf_fit(docs, "text", "doc_id", min_count=2)


@register(
    "q_docs_token_dispersion",
    """
    WITH toks AS (
      SELECT CAST('0x' || substr(md5('disp-' || CAST(doc_id AS VARCHAR)),
                                 1, 8) AS BIGINT) % 10 AS part,
             unnest(list_filter(string_split_regex(lower(text),
                                                   '[^a-z0-9]+'),
                                x -> x <> '')) AS token
      FROM documents),
    cell AS (
      SELECT token, part, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY token, part),
    pt AS (SELECT part, CAST(sum(c) AS BIGINT) AS ptot
           FROM cell GROUP BY part),
    gt AS (SELECT CAST(sum(ptot) AS BIGINT) AS g FROM pt),
    tc AS (SELECT token, CAST(sum(c) AS BIGINT) AS tctot
           FROM cell GROUP BY token),
    per AS (
      SELECT cell.token, max(tc.tctot) AS n_occurrences,
             sum(CAST(round(abs(CAST(cell.c AS DOUBLE)
                                / CAST(tc.tctot AS DOUBLE)
                                - CAST(pt.ptot AS DOUBLE)
                                  / CAST(gt.g AS DOUBLE)) * 1e9)
                      AS BIGINT)) AS present,
             sum(CAST(round(CAST(pt.ptot AS DOUBLE)
                            / CAST(gt.g AS DOUBLE) * 1e9)
                      AS BIGINT)) AS present_share
      FROM cell JOIN pt USING (part) CROSS JOIN gt
      JOIN tc USING (token)
      GROUP BY cell.token
      HAVING max(tc.tctot) >= 10)
    SELECT token, n_occurrences,
           round((CAST(present AS DOUBLE)
                  + CAST(1000000000 - present_share AS DOUBLE)) / 2e9,
                 6) + 0.0 AS dp
    FROM per
    """,
    doc=(
        "Gries' deviation-of-proportions token dispersion "
        "(operators/text_analysis.token_dispersion, Gries 2008): "
        "DP = half the sum of |token share in part - part share| over "
        "10 md5-hash-bucketed corpus parts (the sampling.hash_bucket "
        "convention — works for string ids too, where a plain modulo "
        "is NULL and silently empties the joins) — separates "
        "'frequent because "
        "ubiquitous' (function words, DP~0) from 'frequent because "
        "one subcorpus spams it' (DP->1), the burstiness diagnostic "
        "corpus-mix curation reads beside raw frequency. Absent-part "
        "mass folded in exactly as 1e9 minus the present quantized "
        "share sum; every term integer-nanos-quantized before the "
        "per-token sum. One (token, part) groupBy + one token groupBy."
    ),
)
def q_docs_token_dispersion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.text_analysis import token_dispersion

    docs = read_table(spark, sf_dir, "documents")
    return token_dispersion(
        docs, "text", "doc_id", n_parts=10, min_count=10
    )


@register(
    "q_events_cohens_d",
    """
    WITH b AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
    per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(v AS DECIMAL(38,12))) AS s,
             sum(CAST(CAST(v AS DECIMAL(38,12))
                      * CAST(v AS DECIMAL(38,12)) AS DECIMAL(38,12)))
               AS q
      FROM b GROUP BY g),
    a AS (SELECT * FROM per ORDER BY g LIMIT 1),
    bb AS (SELECT * FROM per ORDER BY g DESC LIMIT 1),
    mm AS (
      SELECT a.g AS ga, bb.g AS gb, a.n AS na, bb.n AS nb,
             CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
             CAST(bb.s AS DOUBLE) / CAST(bb.n AS DOUBLE) AS mb,
             (CAST(a.q AS DOUBLE) - CAST(a.s AS DOUBLE)
              * CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE))
             + (CAST(bb.q AS DOUBLE) - CAST(bb.s AS DOUBLE)
                * CAST(bb.s AS DOUBLE) / CAST(bb.n AS DOUBLE)) AS ss,
             CAST(a.n + bb.n - 2 AS DOUBLE) AS dof
      FROM a CROSS JOIN bb)
    SELECT ga AS group_a, gb AS group_b, na AS n_a, nb AS n_b,
           round(ma, 6) + 0.0 AS mean_a,
           round(mb, 6) + 0.0 AS mean_b,
           CASE WHEN na > 1 AND nb > 1 AND ss / dof > 0.0
                THEN round((mb - ma) / sqrt(ss / dof), 6)
           END + 0.0 AS d,
           CASE WHEN na > 1 AND nb > 1 AND ss / dof > 0.0
                THEN round((mb - ma) / sqrt(ss / dof)
                           * (1.0 - 3.0 / (4.0 * dof - 1.0)), 6)
           END + 0.0 AS g
    FROM mm
    """,
    doc=(
        "Cohen's d / Hedges' g standardized mean difference between "
        "click and view event values (operators/stats.cohens_d): the "
        "effect SIZE companion to welch_t's significance readout — at "
        "100M rows a t-test flags differences nobody should act on; "
        "d says whether they matter. Pooled sample SD from the same "
        "DECIMAL moment sums as welch_t; g applies the small-sample "
        "correction J = 1 - 3/(4 df - 1). One keyed aggregate + a "
        "2-row pivot."
    ),
)
def q_events_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import cohens_d

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(["click", "view"])
    )
    return cohens_d(ev, "event_type", "value")


@register(
    "q_events_concordance",
    """
    WITH e AS (
      SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
      FROM events WHERE user_id < 400),
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
                  THEN (pt - st) // 3600000000 ELSE 168 END AS t,
             CAST(entry.u % 21 AS DOUBLE) / 10.0 - 1.0 AS sc
      FROM entry LEFT JOIN fe USING (u)),
    pairs AS (
      SELECT a.sc AS sa, b.sc AS sb
      FROM dur a JOIN dur b ON CAST(a.t AS DOUBLE) < CAST(b.t AS DOUBLE)
      WHERE a.ev = 1),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_comparable,
             CAST(sum(CASE WHEN sa > sb THEN 2
                           WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_concordant_x2
      FROM pairs)
    SELECT n_comparable, n_concordant_x2,
           CASE WHEN n_comparable > 0
                THEN round(CAST(n_concordant_x2 AS DOUBLE)
                           / (2.0 * CAST(n_comparable AS DOUBLE)), 6)
           END + 0.0 AS c_index
    FROM agg
    """,
    doc=(
        "EXACT Harrell's concordance index on the bounded user_id < "
        "400 subject slice (operators/stats.concordance_bounded): "
        "among comparable pairs (i fails before j is last seen), the "
        "fraction the risk score orders correctly, score ties = 1/2 — "
        "THE discrimination metric for a cox_ph risk score, counted "
        "in exact half-units (x2) so C is one rounded division. "
        "All-pairs quadratic BY DESIGN on an absolutely bounded slice "
        "(the silhouette_bounded / transitivity_exact contract); the "
        "operational full-corpus readout is binary_auc on a horizon "
        "label. Score is the deterministic (u %% 21)/10 - 1 grid "
        "(tie-rich, so the half-credit path is genuinely exercised)."
    ),
)
def q_events_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import concordance_bounded
    from ..operators.survival import duration_table

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") < 400
    )
    dur = duration_table(
        ev, "user_id", "event_type", "ts",
        entry_type="signup", event_type="purchase",
        horizon_seconds=604800, bucket_seconds=3600,
    ).select(
        "ev",
        F.col("t").cast("double").alias("t"),
        ((F.col("_u") % 21).cast("double") / 10.0 - 1.0).alias("sc"),
    )
    return concordance_bounded(dur, "t", "ev", "sc")


# --------------------------------------------------------------------------
# Round-11d wave: corpus keyness + Benford screen + Jonckheere trend
# --------------------------------------------------------------------------


@register(
    "q_docs_keyness",
    """
    WITH toks AS (
      SELECT CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END AS t,
             unnest(list_filter(string_split_regex(lower(text),
                                                   '[^a-z0-9]+'),
                                x -> x <> '')) AS token
      FROM documents),
    per AS (
      SELECT token,
             CAST(sum(t) AS BIGINT) AS n_target,
             CAST(sum(1 - t) AS BIGINT) AS n_ref
      FROM toks GROUP BY token
      HAVING sum(t) + sum(1 - t) >= 5),
    tot AS (
      SELECT CAST(sum(n_target) AS BIGINT) AS tt,
             CAST(sum(n_ref) AS BIGINT) AS tr
      FROM per),
    sc AS (
      SELECT token, n_target, n_ref,
             (CASE WHEN n_target > 0 THEN
                CAST(round(2.0 * CAST(n_target AS DOUBLE)
                  * ln(CAST(n_target AS DOUBLE)
                       / (CAST(tt AS DOUBLE)
                          * CAST(n_target + n_ref AS DOUBLE)
                          / CAST(tt + tr AS DOUBLE))) * 1e9)
                     AS BIGINT) ELSE 0 END
              + CASE WHEN n_ref > 0 THEN
                CAST(round(2.0 * CAST(n_ref AS DOUBLE)
                  * ln(CAST(n_ref AS DOUBLE)
                       / (CAST(tr AS DOUBLE)
                          * CAST(n_target + n_ref AS DOUBLE)
                          / CAST(tt + tr AS DOUBLE))) * 1e9)
                     AS BIGINT) ELSE 0 END) AS g2q,
             CASE WHEN CAST(n_target AS DOUBLE) / CAST(tt AS DOUBLE)
                       >= CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE)
                  THEN 1 ELSE -1 END AS direction
      FROM per CROSS JOIN tot)
    SELECT token, n_target, n_ref,
           round(CAST(g2q AS DOUBLE) / 1e9, 6) + 0.0 AS g2,
           CAST(direction AS INTEGER) AS direction
    FROM sc ORDER BY g2 DESC, token LIMIT 50
    """,
    doc=(
        "Corpus keyness by log-likelihood G2 (operators/text_analysis."
        "keyness_g2, Dunning 1993 / Rayson & Garside 2000): the top-50 "
        "tokens distinguishing the doc_id%%17 target slice from the "
        "rest — THE 'what makes this subcorpus different?' readout "
        "before boosting or down-weighting a source in a training "
        "mix. Per-token 2-cell G2 with nanos-quantized O*ln(O/E) "
        "terms (the g_test cell convention); one token-keyed "
        "conditional-count aggregate + broadcast totals + "
        "TakeOrdered(g2 desc, token) — linear, no windows."
    ),
)
def q_docs_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import keyness_g2

    docs = read_table(spark, sf_dir, "documents")
    return keyness_g2(
        docs, "text", "doc_id", F.col("doc_id") % 17 == 0,
        min_count=5, top_n=50,
    )


@register(
    "q_lineitem_benford",
    """
    WITH d AS (
      SELECT CAST(substring(
               regexp_replace(
                 CAST(abs(CAST(l_extendedprice AS DECIMAL(38,12)))
                      AS VARCHAR),
                 '^[0.]*', ''),
               1, 1) AS INTEGER) AS dg
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
        AND CAST(l_extendedprice AS DOUBLE) > 0.0),
    per AS (
      SELECT dg, CAST(count(*) AS BIGINT) AS n
      FROM d WHERE dg BETWEEN 1 AND 9 GROUP BY dg),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM per)
    SELECT CAST(dg AS BIGINT) AS digit, n,
           round(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE), 6) + 0.0
             AS obs_share,
           round(log10(1.0 + 1.0 / CAST(dg AS DOUBLE)), 6) + 0.0
             AS benford_p,
           round(CAST(nn AS DOUBLE)
                 * (CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
                    - log10(1.0 + 1.0 / CAST(dg AS DOUBLE)))
                 * (CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
                    - log10(1.0 + 1.0 / CAST(dg AS DOUBLE)))
                 / log10(1.0 + 1.0 / CAST(dg AS DOUBLE)), 6) + 0.0
             AS chi2_term
    FROM per CROSS JOIN tot ORDER BY digit
    """,
    doc=(
        "Benford's-law first-digit screen on extended price "
        "(operators/stats.benford_screen): observed leading-digit "
        "shares vs P(d) = log10(1 + 1/d) with per-digit chi-square "
        "terms — the organic-data audit for amount columns (price = "
        "qty x unit price is a product of distributions, the "
        "Benford-convergent case). Digit extraction is string-based "
        "through a DECIMAL(38,12) rendering (engine-portable, no "
        "log10 edge cases at powers of ten); one 9-group map-side "
        "aggregate."
    ),
)
def q_lineitem_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import benford_screen

    li = read_table(spark, sf_dir, "lineitem")
    return benford_screen(li, "l_extendedprice")


@register(
    "q_events_jonckheere",
    """
    WITH b AS (
      SELECT CASE WHEN EXTRACT(hour FROM ts) < 8 THEN 'night'
                  WHEN EXTRACT(hour FROM ts) < 16 THEN 'day'
                  ELSE 'evening' END AS g,
             CAST(value AS DOUBLE) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    per AS (
      SELECT v,
             CAST(sum(CASE WHEN g = 'night' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c0,
             CAST(sum(CASE WHEN g = 'day' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(sum(CASE WHEN g = 'evening' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
      FROM b GROUP BY v),
    pre AS (
      SELECT v, c0, c1, c2,
             coalesce(sum(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS p0,
             coalesce(sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS p1
      FROM per),
    red AS (
      SELECT CAST(sum(CAST(c1 AS HUGEINT) * (2 * p0 + c0)
                      + CAST(c2 AS HUGEINT) * (2 * p0 + c0)
                      + CAST(c2 AS HUGEINT) * (2 * p1 + c1))
                  AS HUGEINT) AS j2,
             CAST(sum(c0 + c1 + c2) AS HUGEINT) AS n,
             CAST(sum(c0) AS HUGEINT) AS n0,
             CAST(sum(c1) AS HUGEINT) AS n1,
             CAST(sum(c2) AS HUGEINT) AS n2,
             CAST(sum(CAST(c0 + c1 + c2 AS HUGEINT)
                      * (c0 + c1 + c2 - 1)
                      * (2 * (c0 + c1 + c2) + 5)) AS HUGEINT) AS t1,
             CAST(sum(CAST(c0 + c1 + c2 AS HUGEINT)
                      * (c0 + c1 + c2 - 1)
                      * (c0 + c1 + c2 - 2)) AS HUGEINT) AS t2,
             CAST(sum(CAST(c0 + c1 + c2 AS HUGEINT)
                      * (c0 + c1 + c2 - 1))
                  AS HUGEINT) AS t3
      FROM pre),
    fin AS (
      SELECT n,
             CAST(j2 AS DOUBLE) / 2.0 AS jd,
             CAST(n * n - (n0 * n0 + n1 * n1 + n2 * n2) AS DOUBLE)
               / 4.0 AS mean_j,
             CAST(n * (n - 1) * (2 * n + 5)
                  - (n0 * (n0 - 1) * (2 * n0 + 5)
                     + n1 * (n1 - 1) * (2 * n1 + 5)
                     + n2 * (n2 - 1) * (2 * n2 + 5))
                  - t1 AS DOUBLE) / 72.0
             + CAST(n0 * (n0 - 1) * (n0 - 2)
                    + n1 * (n1 - 1) * (n1 - 2)
                    + n2 * (n2 - 1) * (n2 - 2) AS DOUBLE)
               * CAST(t2 AS DOUBLE)
               / (36.0 * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)
                  * CAST(n - 2 AS DOUBLE))
             + CAST(n0 * (n0 - 1) + n1 * (n1 - 1) + n2 * (n2 - 1)
                    AS DOUBLE)
               * CAST(t3 AS DOUBLE)
               / (8.0 * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
               AS var_j
      FROM red)
    SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k_groups,
           round(jd, 2) + 0.0 AS j_stat,
           CASE WHEN var_j > 0.0
                THEN round((jd - mean_j) / sqrt(var_j), 6)
           END + 0.0 AS z
    FROM fin
    """,
    doc=(
        "Jonckheere-Terpstra ordered-alternative test "
        "(operators/stats.jonckheere_terpstra, Jonckheere 1954): is "
        "event value monotone across INDEPENDENT night < day < "
        "evening groups — the independent-groups counterpart of "
        "q_events_page_trend (blocked) and the trend-aware upgrade of "
        "kruskal_wallis. NO pairwise join: per-distinct-value group "
        "counts, ONE range-partitioned exclusive-prefix pass with all "
        "k counts as parallel weights, J accumulated in exact x2 "
        "half-units; tie-corrected variance (Hollander & Wolfe) from "
        "exact integer aggregates, z a one-shot double mirrored "
        "token-for-token."
    ),
)
def q_events_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import jonckheere_terpstra

    # ts IS NOT NULL matches the oracle predicate: without it a NULL
    # timestamp falls through F.when to the 'evening' bucket on the
    # Spark side only (ADVICE r11)
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        F.when(F.hour("ts") < 8, F.lit("night"))
        .when(F.hour("ts") < 16, F.lit("day"))
        .otherwise(F.lit("evening"))
        .alias("g"),
        F.col("value").cast("double").alias("v"),
    ).filter(F.col("v").isNotNull())
    return jonckheere_terpstra(
        ev, "g", "v", ["night", "day", "evening"]
    )

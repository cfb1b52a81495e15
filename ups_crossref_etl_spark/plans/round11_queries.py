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
    full = tfidf_knn_graph(
        docs, "text", "doc_id", k=5, max_df=None, ngram=3
    ).select("doc_id", "neighbor_id")
    capped = tfidf_knn_graph(
        docs, "text", "doc_id", k=5, max_df=_TFIDF_AGREE_CAP, ngram=3
    ).select("doc_id", "neighbor_id")
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
    from ..operators.survival import cox_ph, cox_ph_multi, duration_table

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
    sub = dur.join(xs, "_u")
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
    # 6-digit convergence through quantization-plateau noise
    single = cox_ph(d, "t", "ev", "_z1", iterations=2, tol=1e-4)
    multi = cox_ph_multi(
        d, "t", "ev", ["_z1", "_z2"], iterations=3, tol=1e-4
    )
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

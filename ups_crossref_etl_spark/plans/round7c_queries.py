"""Round-7 wave 13+ query registrations.

Continues the round-7 extension surface (see ``round7_queries`` /
``round7b_queries``). Families added here:

- link prediction: Adamic-Adar index over the part co-order graph —
  the classic "which co-occurrence is about to happen" ranking
  (recommender candidates, entity-merge suggestions);
- labeling audits: Cohen's kappa between two quality raters — the
  chance-corrected agreement a pipeline needs before trusting either
  labeler as ground truth — and a multi-class classification report
  (per-label precision/recall/F1 + macro) of the heuristic language ID
  against the gold lang column;
- graph partition audit: Newman modularity of the supplier co-order
  graph under the nation partition;
- corpus quality: Flesch reading-ease from exactly-reproducible regex
  counts; token-diversity indices (Shannon / Simpson / Hill numbers)
  per source;
- scorer/feature triage: expected calibration error, WOE/Information
  Value, one-way ANOVA omnibus screen;
- entity resolution: blocking-quality audit (reduction ratio + pair
  completeness) of sorted-neighborhood blocking vs a bounded
  edit-distance ground truth;
- product analytics: restricted mean survival time (area under the
  Kaplan-Meier curve), funnel step-latency percentiles, item-item
  collaborative-filtering cosine, time-weighted average (TWAP), and a
  Poisson rate-ratio readout with log-Wald interval;
- corpus mixing / routing: pairwise source vocabulary overlap
  (Jaccard + containment), per-document writing-script profile;
- robust/cluster statistics: winsorized mean, deterministic grouped
  mode, Davies-Bouldin cluster-quality index;
- data quality: key-sequence gap audit (gaps-and-islands over ids);
- two-sample inference: Welch's unequal-variance t readout, McNemar
  paired-rater asymmetry;
- training prep: hashing-trick bag-of-words featurizer (md5_60
  buckets, vocabulary-free);
- recursive graph primitives: transitive closure to the fixpoint
  (path-doubling self-joins), strongly connected components built on
  it, and seeded label spreading (multi-source BFS weak supervision),
  all gated against recursive-CTE oracles on bounded functional
  graphs; k-truss edge-cohesion peel gated against an unrolled
  materialized-CTE oracle.

Determinism: same registry contract as every wave — exact integer /
nano-quantized accumulation wherever a sum crosses engines, doubles
only in final one-shot expressions, ROUND + 0.0 on float outputs,
total-order tiebreaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.lake import read_table
from .registry import register

# --------------------------------------------------------------------------
# Adamic-Adar link prediction over the part co-order graph
# --------------------------------------------------------------------------

#: Degree cap for the OPERATIONAL Adamic-Adar query. The part co-order
#: graph's wedge work Σ deg² grows ~linearly in node count but the benched
#: uncapped join was 22% of the r7 bench; capping centers at d ≤ 90 cuts
#: Σ deg² 20× at sf0.1 (298M → 14.3M wedges) while the cap-agreement gate
#: pins the accuracy cost on a bounded subgraph.
_AA_CAP = 90
#: Cap used by the cap-agreement contract on the bounded subgraph (whose
#: degrees top out ~43 at sf0.01 — 90 would never be exercised there).
_AA_AGREE_CAP = 40
#: Node bound for the exact/uncapped gates: parts with key ≤ 400 — a
#: ≤400-node subgraph at ANY scale factor, so uncapped wedge work is
#: bounded by construction (Σ d² ≤ 400·399²) however much data arrives.
_AA_PART_BOUND = 400


def _aa_sql(where: str, cap: int | None) -> str:
    """Adamic-Adar oracle CTE chain → top-50 SELECT, parameterized by a
    lineitem row filter (bounded-subgraph gates) and a center degree cap
    (operational gate). Mirrors operators/graph.adamic_adar clause for
    clause: integer nano-quantized per-center weights before the
    pair-keyed sum keep the score aggregate exact cross-engine."""
    capf = f"AND d <= {cap}" if cap is not None else ""
    return f"""
    WITH pe AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem {where}),
    e AS (
      SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
      FROM pe a JOIN pe b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey),
    und AS (SELECT lo AS node, hi AS nbr FROM e
            UNION ALL SELECT hi AS node, lo AS nbr FROM e),
    deg AS (SELECT node, count(*) AS d FROM und GROUP BY node),
    w AS (
      SELECT u.node, u.nbr,
             CAST(round(1e9 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS wn
      FROM und u JOIN deg ON u.node = deg.node
      WHERE d > 1 {capf}),
    pairs AS (
      SELECT a.nbr AS u, b.nbr AS v, a.wn
      FROM w a JOIN w b ON a.node = b.node
      WHERE a.nbr < b.nbr),
    scored AS (
      SELECT u, v,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(wn) AS BIGINT) AS nanos
      FROM pairs GROUP BY u, v),
    ne AS (
      SELECT s.* FROM scored s
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.lo = s.u AND e.hi = s.v))
    SELECT u, v, common_neighbors,
           round(nanos / 1e9, 6) + 0.0 AS aa_score
    FROM ne ORDER BY nanos DESC, u, v LIMIT 50
    """


# round 12 (r11 verdict #5): the co-order pair construction lives in
# ONE place — plans/graph_inputs.py owns the src < dst orientation
# contract; this alias keeps the long-standing local name (round10+
# plan files import it from here).
from .graph_inputs import part_coorder_edges as _part_coorder_edges  # noqa: E402


@register(
    "q_graph_adamic_adar",
    _aa_sql("", _AA_CAP),
    doc=(
        "Adamic-Adar link prediction (operators/graph.adamic_adar), the "
        "OPERATIONAL degree-capped path: score every NON-edge pair "
        "sharing a common neighbor of degree <= 90 by "
        "sum(1/ln(deg(common neighbor))) and return the top 50. "
        "Candidates come from a wedge self-join on the CENTER node "
        "(work = sum deg^2 over kept centers, never a cross product); "
        "the d <= 90 cap drops the hub centers that dominate sum deg^2 "
        "— 20x fewer wedges at sf0.1 — and is itself a deterministic "
        "function of exact degrees, so this gate is hash-exact. The "
        "accuracy cost of capping is MEASURED by "
        "q_graph_adamic_adar_cap_agreement, and the uncapped estimator "
        "is gated exactly on a bounded subgraph by "
        "q_graph_adamic_adar_exact; per-center weights are quantized to "
        "integer nanos BEFORE the pair-keyed sum so the score aggregate "
        "is exact integer arithmetic both engines reproduce bit-for-bit."
    ),
)
def q_graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import adamic_adar

    edges = _part_coorder_edges(spark, sf_dir)
    return adamic_adar(edges, top_n=50, max_degree=_AA_CAP)


@register(
    "q_graph_adamic_adar_exact",
    _aa_sql(f"WHERE l_partkey <= {_AA_PART_BOUND}", None),
    doc=(
        "UNCAPPED Adamic-Adar on a genuinely bounded subgraph: the part "
        "co-order graph restricted to partkey <= 400, a <=400-node graph "
        "at ANY scale factor, so the uncapped wedge join's work is "
        "bounded by construction (sum deg^2 <= 400*399^2) no matter how "
        "much data arrives — the exact-semantics gate that the "
        "operational capped query (q_graph_adamic_adar) is measured "
        "against. Same nano-quantized integer scoring; hash-exact."
    ),
)
def q_graph_adamic_adar_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import adamic_adar

    edges = _part_coorder_edges(spark, sf_dir, part_bound=_AA_PART_BOUND)
    return adamic_adar(edges, top_n=50)


@register(
    "q_graph_adamic_adar_cap_agreement",
    f"""
    WITH fullk AS ({_aa_sql(f"WHERE l_partkey <= {_AA_PART_BOUND}", None)}),
    capk AS ({_aa_sql(f"WHERE l_partkey <= {_AA_PART_BOUND}", _AA_AGREE_CAP)}),
    ov AS (
      SELECT CAST(count(*) AS BIGINT) AS n_overlap
      FROM fullk JOIN capk ON fullk.u = capk.u AND fullk.v = capk.v),
    nf AS (SELECT CAST(count(*) AS BIGINT) AS n_full FROM fullk),
    ncp AS (SELECT CAST(count(*) AS BIGINT) AS n_capped FROM capk)
    SELECT n_full, n_capped, n_overlap,
           n_overlap >= 40 AS overlap_ok
    FROM nf CROSS JOIN ncp CROSS JOIN ov
    """,
    doc=(
        "Top-50 agreement contract for the Adamic-Adar degree cap "
        "(Theil-Sen cap-agreement pattern): on the bounded partkey <= "
        "400 subgraph — where the uncapped estimator is tractable at "
        "any scale — run UNCAPPED and CAPPED (d <= 40; the subgraph's "
        "degrees top out ~43 at sf0.01, so the cap is genuinely "
        "exercised) top-50s and count the pair overlap, with a >= 40/50 "
        "verdict. Both rankings are deterministic (integer nano scores, "
        "full tiebreak), so the gate is hash-exact: the cap's ranking "
        "cost is MEASURED by the oracle (44/50 at sf0.01), not asserted "
        "in a docstring. This is the contract that makes the capped "
        "operational q_graph_adamic_adar trustworthy at 100 TB."
    ),
)
def q_graph_adamic_adar_cap_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import adamic_adar

    edges = _part_coorder_edges(spark, sf_dir, part_bound=_AA_PART_BOUND)
    full = adamic_adar(edges, top_n=50).select("u", "v")
    capped = adamic_adar(edges, top_n=50, max_degree=_AA_AGREE_CAP).select(
        "u", "v"
    )
    n_full = full.agg(F.count(F.lit(1)).cast("bigint").alias("n_full"))
    n_capped = capped.agg(F.count(F.lit(1)).cast("bigint").alias("n_capped"))
    n_overlap = full.join(capped, ["u", "v"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap")
    )
    return (
        n_full.crossJoin(F.broadcast(n_capped))
        .crossJoin(F.broadcast(n_overlap))
        .select(
            "n_full",
            "n_capped",
            "n_overlap",
            (F.col("n_overlap") >= 40).alias("overlap_ok"),
        )
    )


# --------------------------------------------------------------------------
# Cohen's kappa between two document-quality raters
# --------------------------------------------------------------------------


@register(
    "q_docs_rater_kappa",
    """
    WITH lab AS (
      SELECT
        CASE WHEN n_chars >= 400 THEN 'long'
             WHEN n_chars >= 150 THEN 'med'
             ELSE 'short' END AS a,
        CASE WHEN length(text) - length(replace(text, 'e', '')) >= 40
               THEN 'long'
             WHEN length(text) - length(replace(text, 'e', '')) >= 15
               THEN 'med'
             ELSE 'short' END AS b
      FROM documents
      WHERE n_chars IS NOT NULL AND text IS NOT NULL),
    cells AS (SELECT a, b, count(*) AS c FROM lab GROUP BY a, b),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
               AS agree
      FROM cells),
    ma AS (SELECT a, sum(c) AS m FROM cells GROUP BY a),
    mb AS (SELECT b, sum(c) AS m FROM cells GROUP BY b),
    pen AS (
      SELECT CAST(coalesce(sum(ma.m * mb.m), 0) AS BIGINT) AS pe_num
      FROM ma JOIN mb ON ma.a = mb.b),
    nc AS (
      SELECT CAST(count(DISTINCT l) AS BIGINT) AS n_categories FROM
        (SELECT a AS l FROM lab UNION ALL SELECT b FROM lab) z)
    SELECT n, n_categories, agree,
           round(CAST(agree AS DOUBLE) / n, 6) + 0.0 AS po,
           round(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6)
             + 0.0 AS pe,
           round(
             CASE WHEN CAST(pe_num AS DOUBLE)
                       / (CAST(n AS DOUBLE) * n) >= 1.0
                  THEN CASE WHEN CAST(agree AS DOUBLE) / n >= 1.0
                            THEN 1.0 ELSE 0.0 END
                  ELSE (CAST(agree AS DOUBLE) / n
                        - CAST(pe_num AS DOUBLE)
                          / (CAST(n AS DOUBLE) * n))
                       / (1.0 - CAST(pe_num AS DOUBLE)
                                / (CAST(n AS DOUBLE) * n))
             END, 6) + 0.0 AS kappa
    FROM tot CROSS JOIN pen CROSS JOIN nc
    """,
    doc=(
        "Cohen's kappa (operators/agreement.cohens_kappa) between two "
        "document-quality raters — a char-length gate vs an e-count "
        "length proxy, each bucketing short/med/long: the chance- "
        "corrected agreement a labeling pipeline needs before trusting "
        "either heuristic as ground truth (raw agreement is inflated "
        "whenever the label marginals are skewed). One corpus scan to "
        "the |labels|^2 confusion-cell table, then everything is "
        "confusion-matrix-sized; counts are exact BIGINT so po/pe/kappa "
        "are one-shot double expressions both engines agree on."
    ),
)
def q_docs_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.agreement import cohens_kappa

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    )
    e_cnt = F.length("text") - F.length(F.regexp_replace("text", "e", ""))
    lab = d.select(
        F.when(F.col("n_chars") >= 400, "long")
        .when(F.col("n_chars") >= 150, "med")
        .otherwise("short")
        .alias("rater_a"),
        F.when(e_cnt >= 40, "long")
        .when(e_cnt >= 15, "med")
        .otherwise("short")
        .alias("rater_b"),
    )
    return cohens_kappa(lab, "rater_a", "rater_b")


# --------------------------------------------------------------------------
# Modularity of the supplier co-order graph under the nation partition
# --------------------------------------------------------------------------

_SUPP_COORDER_EDGES = """
    pe AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_suppkey AS lo, b.l_suppkey AS hi
      FROM pe a JOIN pe b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_suppkey < b.l_suppkey)
"""


@register(
    "q_graph_modularity",
    f"""
    WITH {_SUPP_COORDER_EDGES},
    asg AS (SELECT s_suppkey AS n, s_nationkey AS c FROM supplier),
    lab AS (
      SELECT al.c AS cl, ah.c AS ch
      FROM e JOIN asg al ON e.lo = al.n JOIN asg ah ON e.hi = ah.n),
    m AS (SELECT count(*) AS m FROM lab),
    intra AS (
      SELECT cl AS c, count(*) AS ec FROM lab WHERE cl = ch GROUP BY cl),
    deg AS (
      SELECT c, count(*) AS dc FROM
        (SELECT cl AS c FROM lab UNION ALL SELECT ch FROM lab) z
      GROUP BY c),
    per AS (
      SELECT deg.c, coalesce(ec, 0) AS ec, dc
      FROM deg LEFT JOIN intra ON deg.c = intra.c)
    SELECT CAST(count(*) AS BIGINT) AS n_communities,
           CAST(m.m AS BIGINT) AS n_edges,
           round(sum(CAST(ec AS DOUBLE)) / CAST(m.m AS DOUBLE)
                 - sum(CAST(dc AS DOUBLE) * CAST(dc AS DOUBLE))
                   / (CAST(4 AS DOUBLE) * m.m * m.m), 6) + 0.0
             AS modularity
    FROM per CROSS JOIN m GROUP BY m.m
    """,
    doc=(
        "Newman modularity (operators/graph.modularity) of the supplier "
        "co-order graph under the supplier-nation partition: the 'is "
        "this clustering better than random wiring?' audit for LPA/"
        "community output — or, as here, for an EXTERNAL partition you "
        "suspect explains the graph. e_c/d_c/m stay exact BIGINTs "
        "(edge-keyed joins against a broadcastable assignment dim, then "
        "community-sized aggregates); Q is one one-shot double, so both "
        "engines agree bit-for-bit."
    ),
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import modularity

    from .graph_inputs import supplier_coorder_edges

    edges = supplier_coorder_edges(spark, sf_dir)
    assign = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    return modularity(edges, assign)


# --------------------------------------------------------------------------
# Language-ID classification report (heuristic pred vs gold lang)
# --------------------------------------------------------------------------


def _lang_hits_sql() -> str:
    from ..operators.text_analysis import LANG_MARKERS, _marker_pattern

    cols = ",\n             ".join(
        f"len(regexp_extract_all(lower(text), "
        f"'{_marker_pattern(LANG_MARKERS[lg])}')) AS h_{lg}"
        for lg in LANG_MARKERS
    )
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN h_{lg} = {best} AND {best} > 0 THEN '{lg}'" for lg in langs
    ) + " ELSE 'und' END"
    return f"""
    hits AS (
      SELECT lang AS g,
             {cols}
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
    pairs AS (SELECT g, {pred} AS p FROM hits)"""


@register(
    "q_docs_lang_report",
    f"""
    WITH {_lang_hits_sql()},
    cells AS (SELECT g, p, count(*) AS c FROM pairs GROUP BY g, p),
    labs AS (
      SELECT DISTINCT label FROM
        (SELECT g AS label FROM cells UNION ALL SELECT p FROM cells) z),
    gold AS (SELECT g AS label, sum(c) AS n_gold FROM cells GROUP BY g),
    pred AS (SELECT p AS label, sum(c) AS n_pred FROM cells GROUP BY p),
    tp AS (SELECT g AS label, c AS tp FROM cells WHERE g = p),
    per AS (
      SELECT labs.label,
             CAST(coalesce(n_gold, 0) AS BIGINT) AS n_gold,
             CAST(coalesce(n_pred, 0) AS BIGINT) AS n_pred,
             CAST(coalesce(tp, 0) AS BIGINT) AS tp
      FROM labs LEFT JOIN gold ON labs.label = gold.label
      LEFT JOIN pred ON labs.label = pred.label
      LEFT JOIN tp ON labs.label = tp.label),
    nano AS (
      SELECT label, n_gold, n_pred, tp,
             CAST(round(CASE WHEN n_pred > 0
                  THEN CAST(tp AS DOUBLE) / n_pred ELSE 0.0 END * 1e9)
               AS BIGINT) AS pn,
             CAST(round(CASE WHEN n_gold > 0
                  THEN CAST(tp AS DOUBLE) / n_gold ELSE 0.0 END * 1e9)
               AS BIGINT) AS rn,
             CAST(round(CASE WHEN (CASE WHEN n_pred > 0
                        THEN CAST(tp AS DOUBLE) / n_pred ELSE 0.0 END
                      + CASE WHEN n_gold > 0
                        THEN CAST(tp AS DOUBLE) / n_gold ELSE 0.0 END) > 0
                  THEN CAST(2 AS DOUBLE)
                       * (CASE WHEN n_pred > 0
                          THEN CAST(tp AS DOUBLE) / n_pred ELSE 0.0 END)
                       * (CASE WHEN n_gold > 0
                          THEN CAST(tp AS DOUBLE) / n_gold ELSE 0.0 END)
                       / (CASE WHEN n_pred > 0
                          THEN CAST(tp AS DOUBLE) / n_pred ELSE 0.0 END
                          + CASE WHEN n_gold > 0
                            THEN CAST(tp AS DOUBLE) / n_gold ELSE 0.0 END)
                  ELSE 0.0 END * 1e9) AS BIGINT) AS fn
      FROM per),
    unioned AS (
      SELECT label, n_gold, n_pred, tp,
             CAST(pn AS DOUBLE) AS pn, CAST(rn AS DOUBLE) AS rn,
             CAST(fn AS DOUBLE) AS fn
      FROM nano
      UNION ALL
      SELECT '__macro__',
             CAST(sum(n_gold) AS BIGINT), CAST(sum(n_pred) AS BIGINT),
             CAST(sum(tp) AS BIGINT),
             avg(CAST(pn AS DOUBLE)), avg(CAST(rn AS DOUBLE)),
             avg(CAST(fn AS DOUBLE))
      FROM nano)
    SELECT label, n_gold, n_pred, tp,
           round(pn / 1e9, 6) + 0.0 AS precision,
           round(rn / 1e9, 6) + 0.0 AS recall,
           round(fn / 1e9, 6) + 0.0 AS f1
    FROM unioned ORDER BY label
    """,
    doc=(
        "Multi-class classification report (operators/evaluation."
        "classification_report) of the heuristic stopword-marker "
        "language ID (text_analysis.detect_language) against the gold "
        "lang column: per-language precision/recall/F1 plus a "
        "__macro__ row — the scorer-triage table every labeling "
        "pipeline reads before trusting a classifier. One corpus scan "
        "to the confusion-cell aggregate; per-label ratios quantized "
        "to integer nanos before the macro mean so the cross-label "
        "average is order-exact on both engines."
    ),
)
def q_docs_lang_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import classification_report
    from ..operators.text_analysis import detect_language

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    labeled = d.select(
        F.col("lang").alias("gold"),
        detect_language(F.col("text")).alias("pred"),
    )
    return classification_report(labeled, "gold", "pred")


# --------------------------------------------------------------------------
# Flesch reading-ease per document
# --------------------------------------------------------------------------


@register(
    "q_docs_readability",
    r"""
    WITH f AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
               AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS n_syllables
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN
             round(CAST(206.835 AS DOUBLE)
                   - CAST(1.015 AS DOUBLE) * n_words / n_sentences
                   - CAST(84.6 AS DOUBLE) * n_syllables / n_words, 4)
             + 0.0
           END AS flesch
    FROM f
    """,
    doc=(
        "Flesch reading-ease per document (operators/text_analysis."
        "flesch_readability): the classic readability score as a corpus "
        "quality feature, computed from three exactly-reproducible "
        "regex counts (letter runs, [.!?] runs, vowel-group runs). "
        "Pure row-local whole-stage-codegen expressions — one map-only "
        "scan, no shuffle, no Python; the score is a one-shot double "
        "over exact integers, identical cross-engine."
    ),
)
def q_docs_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import flesch_readability

    d = read_table(spark, sf_dir, "documents")
    return flesch_readability(d, "doc_id", "text")


# --------------------------------------------------------------------------
# Expected calibration error of a rank-score vs is-English
# --------------------------------------------------------------------------


@register(
    "q_docs_ece",
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
           CAST(count(*) AS BIGINT) AS n_bins,
           round(sum(n * gn) / (CAST(sum(n) AS DOUBLE) * 1e9), 6) + 0.0
             AS ece,
           round(max(gn) / 1e9, 6) + 0.0 AS max_ce
    FROM g
    """,
    doc=(
        "Expected Calibration Error (operators/evaluation."
        "expected_calibration_error) of the length-rank score "
        "(percent_rank of n_chars — a [0,1] 'probability' proxy) "
        "predicting is-English: 10 equal-count bins over a (score, id) "
        "total order, ECE = size-weighted mean |pos_rate - mean_score| "
        "plus the worst-bin gap. Scores quantize to integer micros and "
        "bin gaps to integer nanos before every cross-row sum, so both "
        "engines do exact integer arithmetic until the final division."
    ),
)
def q_docs_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import expected_calibration_error
    from ..operators.stats import percent_rank_unique

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("n_chars").isNotNull()
    )
    # distributed percent_rank (distinct-value offsets + partitioned
    # row_number) — identical values to percent_rank() OVER (ORDER BY
    # n_chars, doc_id), no global per-row WindowExec (r8 verdict #4)
    scored = percent_rank_unique(d, "n_chars", "doc_id", out_col="score").select(
        "doc_id", "score", (F.col("lang") == "en").alias("is_en")
    )
    return expected_calibration_error(
        scored, "score", "is_en", "doc_id", n_bins=10
    )


# --------------------------------------------------------------------------
# WOE / Information Value: order priority vs finished status
# --------------------------------------------------------------------------


@register(
    "q_orders_woe_iv",
    """
    WITH base AS (
      SELECT o_orderpriority AS bucket,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
    per AS (
      SELECT bucket, count(*) AS n, sum(y) AS np,
             count(*) - sum(y) AS nn
      FROM base GROUP BY bucket),
    tot AS (
      SELECT sum(np) AS tp, sum(nn) AS tn, count(*) AS k FROM per)
    SELECT bucket,
           CAST(n AS BIGINT) AS n,
           CAST(np AS BIGINT) AS n_pos,
           CAST(nn AS BIGINT) AS n_neg,
           round(ln(((CAST(np AS DOUBLE) + 0.5)
                     / (CAST(tp AS DOUBLE) + 0.5 * k))
                    / ((CAST(nn AS DOUBLE) + 0.5)
                       / (CAST(tn AS DOUBLE) + 0.5 * k))), 6) + 0.0
             AS woe,
           round(((CAST(np AS DOUBLE) + 0.5)
                  / (CAST(tp AS DOUBLE) + 0.5 * k)
                  - (CAST(nn AS DOUBLE) + 0.5)
                    / (CAST(tn AS DOUBLE) + 0.5 * k))
                 * ln(((CAST(np AS DOUBLE) + 0.5)
                       / (CAST(tp AS DOUBLE) + 0.5 * k))
                      / ((CAST(nn AS DOUBLE) + 0.5)
                         / (CAST(tn AS DOUBLE) + 0.5 * k))), 6) + 0.0
             AS iv_contrib
    FROM per CROSS JOIN tot ORDER BY bucket
    """,
    doc=(
        "Weight of Evidence / Information Value (operators/stats.woe_iv) "
        "of order priority predicting finished status — the classic "
        "credit-scoring feature screen as one bucket-keyed aggregate. "
        "Laplace 0.5 smoothing keeps single-class buckets finite; counts "
        "stay exact BIGINT and woe/iv_contrib are one-shot double "
        "expressions over them, identical cross-engine."
    ),
)
def q_orders_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import woe_iv

    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_orderstatus").isNotNull()
    )
    labeled = o.select(
        "o_orderpriority", (F.col("o_orderstatus") == "F").alias("is_f")
    )
    return woe_iv(labeled, "o_orderpriority", "is_f")


# --------------------------------------------------------------------------
# Blocking-quality audit: sorted-neighborhood vs bounded edit-distance truth
# --------------------------------------------------------------------------


@register(
    "q_part_blocking_quality",
    """
    WITH s AS (
      SELECT p_partkey, p_name FROM part WHERE p_partkey <= 400),
    nrec AS (SELECT count(*) AS n FROM s),
    r AS (
      SELECT p_partkey,
             row_number() OVER (ORDER BY p_name, p_partkey) AS rn
      FROM s),
    cand AS (
      SELECT DISTINCT least(a.p_partkey, b.p_partkey) AS u,
             greatest(a.p_partkey, b.p_partkey) AS v
      FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3),
    truth AS (
      SELECT a.p_partkey AS u, b.p_partkey AS v
      FROM s a JOIN s b ON a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 10),
    agg AS (
      SELECT
        (SELECT n * (n - 1) // 2 FROM nrec) AS n_possible,
        (SELECT count(*) FROM cand) AS n_candidates,
        (SELECT count(*) FROM truth) AS n_truth,
        (SELECT count(*) FROM truth t
         WHERE EXISTS (SELECT 1 FROM cand
                       WHERE cand.u = t.u AND cand.v = t.v))
          AS n_truth_covered)
    SELECT CAST(n_possible AS BIGINT) AS n_possible,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_truth_covered AS BIGINT) AS n_truth_covered,
           round(CAST(1 AS DOUBLE)
                 - n_candidates / CAST(n_possible AS DOUBLE), 6) + 0.0
             AS reduction_ratio,
           round(CASE WHEN n_truth > 0
                 THEN n_truth_covered / CAST(n_truth AS DOUBLE)
                 ELSE 1.0 END, 6) + 0.0 AS pair_completeness
    FROM agg
    """,
    doc=(
        "Blocking-stage audit (operators/linkage.blocking_quality) of "
        "sorted-neighborhood blocking (window=3 over p_name) against a "
        "BOUNDED brute-force edit-distance<=10 ground truth (p_partkey "
        "<= 400, so the quadratic truth join is a deliberately bounded "
        "contract construction — the same pattern as every *_bound "
        "query): reduction ratio says how much pair work the blocker "
        "saved, pair completeness says how many true matches survive "
        "it. The operational path is candidate-set-sized (two dedup "
        "aggregates + one pair-keyed semi-join); only the truth side is "
        "quadratic, and only on the bounded slice."
    ),
)
def q_part_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import blocking_quality, sorted_neighborhood_pairs

    s = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 400)
        .select("p_partkey", "p_name")
    )
    n = s.count()  # bounded slice size — driver-side model state
    cand = sorted_neighborhood_pairs(s, "p_name", "p_partkey", window=3)
    a = s.select(F.col("p_partkey").alias("_ia"), F.col("p_name").alias("_na"))
    b = s.select(F.col("p_partkey").alias("_ib"), F.col("p_name").alias("_nb"))
    truth = (
        a.join(b, F.col("_ia") < F.col("_ib"))
        .filter(F.levenshtein(F.col("_na"), F.col("_nb")) <= 10)
        .select(F.col("_ia").alias("u"), F.col("_ib").alias("v"))
    )
    return blocking_quality(
        cand.select("id_a", "id_b"), truth, n_records=n
    )


# --------------------------------------------------------------------------
# One-way ANOVA: event value across event types
# --------------------------------------------------------------------------


@register(
    "q_events_anova_value_by_type",
    """
    WITH base AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL),
    per AS (
      SELECT g, count(*) AS n,
             sum(CAST(v AS DECIMAL(38,12))) AS s,
             sum(CAST(CAST(v AS DECIMAL(38,12))
                      * CAST(v AS DECIMAL(38,12))
                 AS DECIMAL(38,12))) AS q
      FROM base GROUP BY g),
    t AS (
      SELECT count(*) AS k, sum(n) AS n,
             sum(s) AS st, sum(q) AS qt,
             sum(CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                            / n * 1e6) AS BIGINT)) AS a
      FROM per)
    SELECT CAST(k AS BIGINT) AS n_groups,
           CAST(n AS BIGINT) AS n,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(n - k AS BIGINT) AS df_within,
           round(a / 1e6 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                 / CAST(n AS DOUBLE), 4) + 0.0 AS ss_between,
           round(CAST(qt AS DOUBLE) - a / 1e6, 4) + 0.0 AS ss_within,
           CASE WHEN k > 1 AND n > k
                     AND CAST(qt AS DOUBLE) - a / 1e6 > 0 THEN
             round(((a / 1e6 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                     / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
                   / ((CAST(qt AS DOUBLE) - a / 1e6)
                      / CAST(n - k AS DOUBLE)), 6) + 0.0
           END AS f_stat
    FROM t
    """,
    doc=(
        "One-way ANOVA (operators/stats.anova_oneway) of event value "
        "across the five event types — the omnibus 'any level differ?' "
        "screen before pairwise tests. Per-group moments accumulate in "
        "DECIMAL(38,12) (exact, order-free), the between-groups "
        "S_g^2/n_g terms quantize to integer micros before the "
        "cross-group sum, and SS/F are one-shot doubles — "
        "engine-identical."
    ),
)
def q_events_anova_value_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.stats import anova_oneway

    e = read_table(spark, sf_dir, "events")
    return anova_oneway(e, "event_type", "value")


# --------------------------------------------------------------------------
# Token diversity indices per source
# --------------------------------------------------------------------------


@register(
    "q_docs_diversity",
    """
    WITH toks AS (
      SELECT source AS grp,
             unnest([x for x in
                     regexp_split_to_array(lower(text), '[^a-z0-9]+')
                     IF x <> '']) AS t
      FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
    c AS (SELECT grp, t, count(*) AS c FROM toks GROUP BY grp, t),
    per AS (
      SELECT grp,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c * c) AS BIGINT) AS c2,
             sum(CAST(round(CAST(c AS DOUBLE)
                            * ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT))
               AS cl
      FROM c GROUP BY grp)
    SELECT grp, n_tokens, n_distinct,
           round(ln(CAST(n_tokens AS DOUBLE))
                 - cl / 1e6 / CAST(n_tokens AS DOUBLE), 6) + 0.0
             AS shannon,
           round(CAST(c2 AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
                 6) + 0.0 AS simpson,
           round(exp(ln(CAST(n_tokens AS DOUBLE))
                     - cl / 1e6 / CAST(n_tokens AS DOUBLE)), 6) + 0.0
             AS hill1,
           round(CAST(1 AS DOUBLE)
                 / (CAST(c2 AS DOUBLE)
                    / (CAST(n_tokens AS DOUBLE)
                       * CAST(n_tokens AS DOUBLE))), 6) + 0.0
             AS inv_simpson
    FROM per ORDER BY grp
    """,
    doc=(
        "Token-diversity indices per source (operators/text_analysis."
        "diversity_indices): Shannon entropy via the exact identity "
        "H = ln N - (1/N) sum c ln c with per-token c*ln(c) quantized "
        "to integer micros, Simpson concentration as an exact BIGINT "
        "sum-of-squares, plus the Hill-number effective vocabularies — "
        "the repetitiveness screen a corpus mixer reads next to volume. "
        "Explode -> one (group, token) aggregate -> group reduce; the "
        "shuffle carries counts, never text."
    ),
)
def q_docs_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import diversity_indices

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    )
    return diversity_indices(d, "source", "text")


# --------------------------------------------------------------------------
# Restricted mean survival time (area under the KM curve)
# --------------------------------------------------------------------------


@register(
    "q_events_rmst",
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
             sum(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS zeros
      FROM km),
    curve AS (
      SELECT t,
             CAST(round((CASE WHEN zeros > 0 THEN 0.0
                  ELSE round(exp(CAST(lnsum AS DOUBLE)), 6) END)
                  * 1e6) AS BIGINT) AS s
      FROM st WHERE n_events > 0),
    lg AS (
      SELECT t, s,
             coalesce(lag(t) OVER (ORDER BY t), 0) AS pt,
             coalesce(lag(s) OVER (ORDER BY t), 1000000) AS ps
      FROM curve),
    area AS (
      SELECT coalesce(sum(ps * (t - pt)), 0) AS a,
             count(*) AS n_event_times,
             coalesce(max(t), 0) AS lt
      FROM lg),
    lasts AS (
      SELECT coalesce(
        (SELECT s FROM curve
         WHERE t = (SELECT max(t) FROM curve)), 1000000) AS lsv)
    SELECT CAST(168 AS BIGINT) AS horizon_buckets,
           CAST(n_event_times AS BIGINT) AS n_event_times,
           round((a + lsv * (168 - lt)) / 1e6, 6) + 0.0 AS rmst_buckets,
           round((a + lsv * (168 - lt)) / 1e6 * 3600, 2) + 0.0
             AS rmst_seconds
    FROM area CROSS JOIN lasts
    """,
    doc=(
        "Restricted mean survival time (operators/survival.rmst): the "
        "area under the signup->purchase Kaplan-Meier curve up to the "
        "7-day horizon — average event-free hours in week one, the "
        "survival summary that stays valid when hazards cross. The "
        "step integral accumulates as exact integer products "
        "(micro-quantized survival x integer bucket widths) over the "
        "tiny event-time table; the oracle extends the KM oracle with "
        "the identical lag-window integral."
    ),
)
def q_events_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.survival import rmst

    ev = read_table(spark, sf_dir, "events")
    return rmst(
        ev, "user_id", "event_type", "ts",
        entry_type="signup", event_type="purchase",
        horizon_seconds=604800, bucket_seconds=3600,
    )


# --------------------------------------------------------------------------
# Funnel step latency percentiles
# --------------------------------------------------------------------------


@register(
    "q_events_funnel_latency",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, s1.t1, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 86400 SECOND
      GROUP BY e.user_id, s1.t1),
    s3 AS (
      SELECT e.user_id, s2.t2, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s2.t1 + INTERVAL 86400 SECOND
      GROUP BY e.user_id, s2.t2),
    l1 AS (SELECT epoch_us(t2) - epoch_us(t1) AS us FROM s2),
    l2 AS (SELECT epoch_us(t3) - epoch_us(t2) AS us FROM s3)
    SELECT CAST(1 AS BIGINT) AS step_idx,
           'signup' AS from_step, 'view' AS to_step,
           CAST(count(*) AS BIGINT) AS n_users,
           round(quantile_cont(CAST(us AS DOUBLE), 0.5) / 1e6, 6) + 0.0
             AS p50_seconds,
           round(quantile_cont(CAST(us AS DOUBLE), 0.9) / 1e6, 6) + 0.0
             AS p90_seconds
    FROM l1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'view', 'purchase',
           CAST(count(*) AS BIGINT),
           round(quantile_cont(CAST(us AS DOUBLE), 0.5) / 1e6, 6) + 0.0,
           round(quantile_cont(CAST(us AS DOUBLE), 0.9) / 1e6, 6) + 0.0
    FROM l2
    """,
    doc=(
        "Funnel step-latency percentiles (operators/funnel."
        "funnel_latency) for signup -> view -> purchase within 24h of "
        "signup: where funnel_counts says users DROP, this says where "
        "they STALL (median and p90 seconds between consecutive "
        "steps). Latencies convert to exact integer microseconds "
        "before the exact interpolated percentile, so even-count "
        "midpoints are exact halves on both engines."
    ),
)
def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import funnel_latency

    e = read_table(spark, sf_dir, "events")
    return funnel_latency(
        e, "user_id", "event_type", "ts",
        ["signup", "view", "purchase"], max_span_seconds=86400,
    )


# --------------------------------------------------------------------------
# Item-item collaborative filtering over customer part purchases
# --------------------------------------------------------------------------


@register(
    "q_part_item_cosine",
    """
    WITH inter AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    deg AS (SELECT i, count(*) AS n FROM inter GROUP BY i),
    pairs AS (
      SELECT a.i AS item_a, b.i AS item_b, count(*) AS co
      FROM inter a JOIN inter b ON a.u = b.u
      WHERE a.i < b.i
      GROUP BY a.i, b.i
      HAVING count(*) >= 2),
    scored AS (
      SELECT item_a, item_b,
             CAST(da.n AS BIGINT) AS n_a,
             CAST(db.n AS BIGINT) AS n_b,
             CAST(co AS BIGINT) AS cooccurrence,
             CAST(round(co / sqrt(CAST(da.n AS DOUBLE) * db.n) * 1e9)
               AS BIGINT) AS nanos
      FROM pairs
      JOIN deg da ON pairs.item_a = da.i
      JOIN deg db ON pairs.item_b = db.i)
    SELECT item_a, item_b, n_a, n_b, cooccurrence,
           round(nanos / 1e9, 6) + 0.0 AS cosine
    FROM scored ORDER BY nanos DESC, item_a, item_b LIMIT 50
    """,
    doc=(
        "Item-item collaborative filtering (operators/recsys."
        "item_cosine_similarity): top-50 part pairs by binary cosine "
        "co(i,j)/sqrt(n_i*n_j) over distinct customer-part purchases, "
        "min co-occurrence 2 — 'customers who bought X also bought Y'. "
        "The pair join is USER-keyed (work = sum per-user items^2, "
        "never a cross product) with a max_user_items escape hatch for "
        "power users at 100 TB; scores quantize to integer nanos so "
        "the top-50 set is engine-exact."
    ),
)
def q_part_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.recsys import item_cosine_similarity

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    inter = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).select("o_custkey", "l_partkey")
    return item_cosine_similarity(
        inter, "o_custkey", "l_partkey", top_n=50, min_cooccurrence=2
    )


# --------------------------------------------------------------------------
# Pairwise source vocabulary overlap
# --------------------------------------------------------------------------


@register(
    "q_docs_source_overlap",
    """
    WITH toks AS (
      SELECT DISTINCT source AS g,
             unnest([x for x in
                     regexp_split_to_array(lower(text), '[^a-z0-9]+')
                     IF x <> '']) AS t
      FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
    sizes AS (SELECT g, count(*) AS n FROM toks GROUP BY g),
    inter AS (
      SELECT a.g AS src_a, b.g AS src_b, count(*) AS n_common
      FROM toks a JOIN toks b ON a.t = b.t
      WHERE a.g < b.g
      GROUP BY a.g, b.g)
    SELECT src_a, src_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           CAST(n_common AS BIGINT) AS n_common,
           round(n_common
                 / CAST(sa.n + sb.n - n_common AS DOUBLE), 6) + 0.0
             AS jaccard,
           round(n_common / CAST(least(sa.n, sb.n) AS DOUBLE), 6) + 0.0
             AS containment
    FROM inter
    JOIN sizes sa ON inter.src_a = sa.g
    JOIN sizes sb ON inter.src_b = sb.g
    ORDER BY src_a, src_b
    """,
    doc=(
        "Pairwise source vocabulary overlap (operators/text_analysis."
        "source_token_overlap): exact Jaccard + containment of the "
        "distinct-token sets for every source pair — the corpus-mixing "
        "diagnostic that flags near-copy sources (high containment) "
        "before training on both. Token-keyed self-join: per-token work "
        "is (groups containing it)^2, bounded by the source count, "
        "never corpus-sized."
    ),
)
def q_docs_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import source_token_overlap

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    )
    return source_token_overlap(d, "source", "text")


# --------------------------------------------------------------------------
# Deterministic grouped mode
# --------------------------------------------------------------------------


@register(
    "q_orders_mode_priority",
    """
    WITH counts AS (
      SELECT o_orderstatus AS grp, o_orderpriority AS v, count(*) AS c
      FROM orders WHERE o_orderpriority IS NOT NULL
      GROUP BY o_orderstatus, o_orderpriority),
    ranked AS (
      SELECT grp, v, c,
             row_number() OVER (PARTITION BY grp ORDER BY c DESC, v) AS rn
      FROM counts)
    SELECT grp, v AS mode, CAST(c AS BIGINT) AS n
    FROM ranked WHERE rn = 1 ORDER BY grp
    """,
    doc=(
        "Deterministic grouped mode (operators/stats.mode_by): most "
        "frequent order priority per order status with a total tiebreak "
        "(count DESC, value ASC) — the categorical typical-value "
        "aggregate SQL's MODE() leaves tie-undefined. One count "
        "aggregate + one struct-min argmax; no window over raw rows."
    ),
)
def q_orders_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import mode_by

    o = read_table(spark, sf_dir, "orders")
    return mode_by(o, "o_orderstatus", "o_orderpriority")


# --------------------------------------------------------------------------
# Time-weighted average value per user (TWAP)
# --------------------------------------------------------------------------


@register(
    "q_events_twap",
    """
    WITH base AS (
      SELECT user_id AS key, epoch_us(ts) AS t,
             CAST(round(CAST(value AS DOUBLE) * 1e4) AS BIGINT) AS vq
      FROM events
      WHERE value IS NOT NULL
        AND epoch_us(ts) <= epoch_us(TIMESTAMP '2024-02-01 00:00:00')),
    seg AS (
      SELECT key, vq,
             coalesce(lead(t) OVER (PARTITION BY key ORDER BY t, vq),
                      epoch_us(TIMESTAMP '2024-02-01 00:00:00')) - t
               AS dur
      FROM base),
    agg AS (
      SELECT key, count(*) AS n_obs,
             sum(CAST(vq AS HUGEINT) * dur) AS area,
             sum(dur) AS span_us
      FROM seg GROUP BY key)
    SELECT key, CAST(n_obs AS BIGINT) AS n_obs,
           CAST(span_us AS BIGINT) AS span_us,
           round(CAST(area AS DOUBLE) / 1e4
                 / CAST(span_us AS DOUBLE), 6) + 0.0 AS twap
    FROM agg
    """,
    doc=(
        "Time-weighted average event value per user (operators/"
        "timeseries.time_weighted_average): last-observation-carried-"
        "forward integral from each user's first observation to the "
        "window end — the correct 'average level over the window' for "
        "irregular sampling, where a plain AVG over-weights bursty "
        "periods. Values quantize to 1e-4 units, durations are exact "
        "integer microseconds, and segment products accumulate in "
        "DECIMAL(38,0)/HUGEINT — one key-clustered lead() window + one "
        "key aggregate."
    ),
)
def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import time_weighted_average

    e = read_table(spark, sf_dir, "events")
    return time_weighted_average(
        e, "user_id", "ts", "value", end_ts="2024-02-01 00:00:00"
    )


# --------------------------------------------------------------------------
# Writing-script profile per document
# --------------------------------------------------------------------------


def _script_oracle_sql() -> str:
    from ..operators.text_analysis import SCRIPT_RANGES

    # strip the python-side comment; keep the literal class only
    rng = {k: v.split("  #")[0] for k, v in SCRIPT_RANGES.items()}
    cols = ",\n             ".join(
        f"CAST(len(regexp_extract_all(text, '{rng[s]}')) AS BIGINT)"
        f" AS n_{s}"
        for s in ["latin", "cyrillic", "han", "arabic", "digit"]
    )
    scripts = ["latin", "cyrillic", "han", "arabic"]
    best = "greatest(" + ", ".join(f"n_{s}" for s in scripts) + ")"
    pred = "CASE " + " ".join(
        f"WHEN n_{s} = {best} AND {best} > 0 THEN '{s}'" for s in scripts
    ) + " ELSE 'none' END"
    return f"""
    WITH c AS (
      SELECT doc_id, {cols}
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id, n_latin, n_cyrillic, n_han, n_arabic, n_digit,
           {pred} AS script
    FROM c"""


@register(
    "q_docs_script_profile",
    _script_oracle_sql(),
    doc=(
        "Per-document writing-script profile (operators/text_analysis."
        "script_profile): codepoint counts for the major script blocks "
        "(Latin letters, Cyrillic, Han, Arabic, digits) and the "
        "dominant script — the alphabet-level routing decision that "
        "precedes stopword language-ID in a multilingual corpus, and "
        "the mixed-script mojibake catcher. Pure row-local "
        "regexp_count — map-only, no shuffle, no Python; the class "
        "patterns are literal shared codepoint ranges so Java regex "
        "and RE2 parse identically."
    ),
)
def q_docs_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import script_profile

    d = read_table(spark, sf_dir, "documents")
    return script_profile(d, "doc_id", "text")


# --------------------------------------------------------------------------
# Davies-Bouldin index of the labeled embedding space
# --------------------------------------------------------------------------


@register(
    "q_emb_davies_bouldin",
    """
    WITH rows_ AS (
      SELECT l, i, CAST(round(v * 1e6) AS BIGINT) AS m
      FROM (SELECT label AS l, unnest(embedding)::DOUBLE AS v,
                   unnest(range(1, len(embedding) + 1)) AS i
            FROM embeddings) z),
    per AS (
      SELECT l, i, count(*) AS n, sum(m) AS s1, sum(m * m) AS s2
      FROM rows_ GROUP BY l, i),
    scat AS (
      SELECT l, max(n) AS n,
             sum(CAST(round(CAST(s2 AS DOUBLE)
                            - CAST(s1 AS DOUBLE) * s1 / n) AS BIGINT))
               AS v2
      FROM per GROUP BY l),
    d2 AS (
      SELECT a.l AS la, b.l AS lb,
             sum(CAST(round((CAST(a.s1 AS DOUBLE) / a.n
                             - CAST(b.s1 AS DOUBLE) / b.n)
                            * (CAST(a.s1 AS DOUBLE) / a.n
                               - CAST(b.s1 AS DOUBLE) / b.n))
                 AS BIGINT)) AS d2
      FROM per a JOIN per b ON a.i = b.i AND a.l <> b.l
      GROUP BY a.l, b.l),
    worst AS (
      SELECT d2.la, max(sa.n) AS na,
             max(CAST(round((sqrt(CAST(sa.v2 AS DOUBLE) / sa.n)
                             + sqrt(CAST(sb.v2 AS DOUBLE) / sb.n))
                            / sqrt(CAST(d2.d2 AS DOUBLE)) * 1e9)
                 AS BIGINT)) AS w
      FROM d2
      JOIN scat sa ON d2.la = sa.l
      JOIN scat sb ON d2.lb = sb.l
      WHERE d2.d2 > 0
      GROUP BY d2.la),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_vecs,
             CAST(count(*) AS BIGINT) AS n_clusters
      FROM scat),
    sv AS (
      SELECT CAST(count(*) AS BIGINT) AS k_surv,
             avg(CAST(w AS DOUBLE)) AS mean_w
      FROM worst)
    SELECT tot.n_vecs, tot.n_clusters,
           round(CASE WHEN tot.n_clusters > 1
                       AND sv.k_surv = tot.n_clusters
                 THEN sv.mean_w / 1e9 END, 6) + 0.0 AS db_index
    FROM tot CROSS JOIN sv
    """,
    doc=(
        "Davies-Bouldin index (operators/similarity.davies_bouldin) of "
        "the labeled embedding space: per-cluster RMS scatter and "
        "pairwise centroid distances from per-(label, dim) sufficient "
        "statistics over micro-quantized coordinates (ONE posexplode + "
        "aggregate, the separability shape), then a labels^2-sized "
        "worst-neighbor max with nano-quantized ratios — the internal "
        "cluster-quality validation that penalizes the worst "
        "neighboring cluster, complementing the Fisher ratio's "
        "average-case view."
    ),
)
def q_emb_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import davies_bouldin

    emb = read_table(spark, sf_dir, "embeddings")
    return davies_bouldin(emb, "embedding", "label")


# --------------------------------------------------------------------------
# Winsorized mean price per return flag
# --------------------------------------------------------------------------


@register(
    "q_lineitem_winsorized_price",
    """
    WITH base AS (
      SELECT l_returnflag AS grp,
             CAST(round(CAST(l_extendedprice AS DOUBLE) * 1e4) AS BIGINT)
               AS vq
      FROM lineitem WHERE l_extendedprice IS NOT NULL),
    cuts AS (
      SELECT grp,
             CAST(round(quantile_cont(CAST(vq AS DOUBLE), 0.05))
               AS BIGINT) AS lo,
             CAST(round(quantile_cont(CAST(vq AS DOUBLE), 0.95))
               AS BIGINT) AS hi
      FROM base GROUP BY grp)
    SELECT base.grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN vq < lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_low,
           CAST(sum(CASE WHEN vq > hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_high,
           round(max(lo) / 1e4, 4) + 0.0 AS lo_cut,
           round(max(hi) / 1e4, 4) + 0.0 AS hi_cut,
           round(sum(greatest(least(vq, hi), lo))
                 / CAST(count(*) AS DOUBLE) / 1e4, 6) + 0.0
             AS winsorized_mean
    FROM base JOIN cuts ON base.grp = cuts.grp
    GROUP BY base.grp ORDER BY base.grp
    """,
    doc=(
        "Winsorized mean price per return flag (operators/stats."
        "winsorized_mean, 5%/95% cuts): the trimmed mean's sibling — "
        "tails are CLAMPED to the quantile cuts instead of dropped, "
        "the right robust mean when tails are real-but-noisy. Values "
        "and cuts quantize to 1e-4 units so the clamped sum is an "
        "exact BIGINT; one percentile aggregate + one group aggregate."
    ),
)
def q_lineitem_winsorized_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.stats import winsorized_mean

    li = read_table(spark, sf_dir, "lineitem")
    return winsorized_mean(
        li, "l_returnflag", "l_extendedprice", lower=0.05, upper=0.95
    )


# --------------------------------------------------------------------------
# Poisson rate ratio: error rate, even vs odd user cohort
# --------------------------------------------------------------------------


@register(
    "q_events_error_rate_ratio",
    """
    WITH base AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS g,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events),
    per AS (SELECT g, count(*) AS n, sum(y) AS e FROM base GROUP BY g),
    a AS (SELECT * FROM per ORDER BY g LIMIT 1),
    b AS (SELECT * FROM per ORDER BY g DESC LIMIT 1)
    SELECT a.g AS group_a, b.g AS group_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           CAST(a.e AS BIGINT) AS events_a,
           CAST(b.e AS BIGINT) AS events_b,
           round(CAST(a.e AS DOUBLE) / a.n, 6) + 0.0 AS rate_a,
           round(CAST(b.e AS DOUBLE) / b.n, 6) + 0.0 AS rate_b,
           round(CASE WHEN a.e > 0 AND b.e > 0 THEN
                 (CAST(b.e AS DOUBLE) / b.n)
                 / (CAST(a.e AS DOUBLE) / a.n) END, 6) + 0.0
             AS rate_ratio,
           round(CASE WHEN a.e > 0 AND b.e > 0 THEN
                 exp(ln((CAST(b.e AS DOUBLE) / b.n)
                        / (CAST(a.e AS DOUBLE) / a.n))
                     - CAST(1.959964 AS DOUBLE)
                       * sqrt(CAST(1 AS DOUBLE) / a.e
                              + CAST(1 AS DOUBLE) / b.e)) END, 6) + 0.0
             AS ci_lo,
           round(CASE WHEN a.e > 0 AND b.e > 0 THEN
                 exp(ln((CAST(b.e AS DOUBLE) / b.n)
                        / (CAST(a.e AS DOUBLE) / a.n))
                     + CAST(1.959964 AS DOUBLE)
                       * sqrt(CAST(1 AS DOUBLE) / a.e
                              + CAST(1 AS DOUBLE) / b.e)) END, 6) + 0.0
             AS ci_hi
    FROM a CROSS JOIN b
    """,
    doc=(
        "Poisson rate ratio (operators/experiment.rate_ratio) of the "
        "error-event rate between even and odd user cohorts with the "
        "log-scale Wald 95% interval — the incident-rate readout where "
        "a difference-in-means test is the wrong shape. Counts exact "
        "BIGINT from one group aggregate; ratio/CI one-shot doubles "
        "with the z quantile pinned as a shared 6-dp literal."
    ),
)
def q_events_error_rate_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.experiment import rate_ratio

    e = read_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, "even")
        .otherwise("odd")
        .alias("cohort"),
        # coalesce to False so a NULL event_type counts as a ZERO-EVENT
        # exposure row on both engines (the oracle's CASE ... ELSE 0
        # does the same); without it the operator's NULL-drop convention
        # would silently shrink n_a/n_b relative to the oracle (ADVICE r7)
        F.coalesce(F.col("event_type") == "error", F.lit(False)).alias(
            "is_error"
        ),
    )
    return rate_ratio(e, "cohort", "is_error")


# --------------------------------------------------------------------------
# Key-sequence gap audit
# --------------------------------------------------------------------------


@register(
    "q_orders_sequence_gaps",
    """
    WITH ids AS (
      SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS id
      FROM orders
      WHERE o_orderkey IS NOT NULL AND o_orderkey % 7 <> 0),
    l AS (SELECT id, lag(id) OVER (ORDER BY id) AS prev FROM ids)
    SELECT CAST(prev + 1 AS BIGINT) AS gap_start,
           CAST(id - 1 AS BIGINT) AS gap_end,
           CAST(id - prev - 1 AS BIGINT) AS gap_len
    FROM l WHERE prev IS NOT NULL AND id - prev > 1
    ORDER BY gap_start
    """,
    doc=(
        "Key-sequence gap audit (operators/quality.sequence_gaps) over "
        "order keys with every 7th key dropped (this testdata's keys "
        "are dense, so the filter synthesizes a real hole "
        "distribution): every missing id range as (gap_start, gap_end, "
        "gap_len) — the completeness check for ids that should be "
        "dense (batch counters, partition indexes). Distinct first, "
        "then ONE lag window over the id-cardinality table — never "
        "the raw rows."
    ),
)
def q_orders_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import sequence_gaps

    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 7 != 0
    )
    return sequence_gaps(o, "o_orderkey")


# --------------------------------------------------------------------------
# Welch's t: event value, even vs odd user cohort
# --------------------------------------------------------------------------


@register(
    "q_events_welch_value",
    """
    WITH base AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS g,
             CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL),
    per AS (
      SELECT g, count(*) AS n,
             sum(CAST(v AS DECIMAL(38,12))) AS s,
             sum(CAST(CAST(v AS DECIMAL(38,12))
                      * CAST(v AS DECIMAL(38,12))
                 AS DECIMAL(38,12))) AS q
      FROM base GROUP BY g),
    a AS (SELECT * FROM per ORDER BY g LIMIT 1),
    b AS (SELECT * FROM per ORDER BY g DESC LIMIT 1),
    m AS (
      SELECT a.g AS ga, b.g AS gb,
             CAST(a.n AS BIGINT) AS na, CAST(b.n AS BIGINT) AS nb,
             CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
             CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS mb,
             (CAST(a.q AS DOUBLE)
              - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)
                / CAST(a.n AS DOUBLE)) / CAST(a.n - 1 AS DOUBLE) AS va,
             (CAST(b.q AS DOUBLE)
              - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)
                / CAST(b.n AS DOUBLE)) / CAST(b.n - 1 AS DOUBLE) AS vb
      FROM a CROSS JOIN b),
    e AS (
      SELECT m.*, va / CAST(na AS DOUBLE) AS sa2,
             vb / CAST(nb AS DOUBLE) AS sb2
      FROM m)
    SELECT ga AS group_a, gb AS group_b, na AS n_a, nb AS n_b,
           round(ma, 6) + 0.0 AS mean_a,
           round(mb, 6) + 0.0 AS mean_b,
           round(va, 6) + 0.0 AS var_a,
           round(vb, 6) + 0.0 AS var_b,
           round(CASE WHEN na > 1 AND nb > 1 AND sa2 + sb2 > 0 THEN
                 (mb - ma) / sqrt(sa2 + sb2) END, 6) + 0.0 AS t_stat,
           round(CASE WHEN na > 1 AND nb > 1 AND sa2 + sb2 > 0 THEN
                 (sa2 + sb2) * (sa2 + sb2)
                 / (sa2 * sa2 / CAST(na - 1 AS DOUBLE)
                    + sb2 * sb2 / CAST(nb - 1 AS DOUBLE)) END, 4) + 0.0
             AS df_welch
    FROM e
    """,
    doc=(
        "Welch's unequal-variance t readout (operators/stats.welch_t) "
        "of event value between even and odd user cohorts: means, "
        "sample variances, t, and Welch-Satterthwaite df — the default "
        "parametric two-sample comparison, complementing Mann-Whitney "
        "(rank) and ANOVA (k-group). Per-group moments accumulate in "
        "DECIMAL(38,12); every output is a one-shot double over exact "
        "moments."
    ),
)
def q_events_welch_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import welch_t

    e = read_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, "even")
        .otherwise("odd")
        .alias("cohort"),
        "value",
    )
    return welch_t(e, "cohort", "value")


# --------------------------------------------------------------------------
# McNemar asymmetry between the two document-quality raters
# --------------------------------------------------------------------------


@register(
    "q_docs_rater_mcnemar",
    """
    WITH lab AS (
      SELECT (n_chars >= 400) AS pa,
             (length(text) - length(replace(text, 'e', '')) >= 40) AS pb
      FROM documents
      WHERE n_chars IS NOT NULL AND text IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pa THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos_a,
           CAST(sum(CASE WHEN pb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos_b,
           CAST(sum(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END) AS BIGINT)
             AS b_discordant,
           CAST(sum(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END) AS BIGINT)
             AS c_discordant,
           round(CASE WHEN sum(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END)
                         + sum(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END)
                         > 0 THEN
             CAST(sum(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END)
                  - sum(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END)
               AS DOUBLE)
             * (sum(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END)
                - sum(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END))
             / CAST(sum(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END)
                    + sum(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END)
               AS DOUBLE) END, 6) + 0.0 AS chi2
    FROM lab
    """,
    doc=(
        "McNemar's paired-rater asymmetry test (operators/agreement."
        "mcnemar) between the long-document raters from the kappa gate "
        "(char-length >= 400 vs e-count >= 40): kappa says how much "
        "they agree, this says which one is systematically stricter — "
        "chi2 = (b-c)^2/(b+c) over the two discordant cells only. One "
        "corpus scan to four exact BIGINT cells; chi2 one-shot double."
    ),
)
def q_docs_rater_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.agreement import mcnemar

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    )
    e_cnt = F.length("text") - F.length(F.regexp_replace("text", "e", ""))
    lab = d.select(
        F.when(F.col("n_chars") >= 400, "long").otherwise("other")
        .alias("rater_a"),
        F.when(e_cnt >= 40, "long").otherwise("other").alias("rater_b"),
    )
    return mcnemar(lab, "rater_a", "rater_b", positive="long")


# --------------------------------------------------------------------------
# Hashing-trick bag-of-words features
# --------------------------------------------------------------------------


@register(
    "q_docs_hashed_features",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    toks AS (
      SELECT doc_id,
             unnest([x for x in
                     regexp_split_to_array(lower(text), '[^a-z0-9]+')
                     IF x <> '']) AS t
      FROM d),
    b AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 16
               AS BIGINT) AS bkt
      FROM toks),
    per AS (SELECT doc_id, bkt, count(*) AS c FROM b
            GROUP BY doc_id, bkt),
    agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_nonzero,
             string_agg(bkt || ':' || c, ',' ORDER BY bkt) AS features
      FROM per GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(n_tokens, 0) AS n_tokens,
           coalesce(n_nonzero, 0) AS n_nonzero,
           coalesce(features, '') AS features
    FROM d LEFT JOIN agg USING (doc_id)
    """,
    doc=(
        "Hashing-trick bag-of-words featurizer (operators/features."
        "hashed_features, dim=16): tokens map to md5_60(token) % dim "
        "buckets — stateless, vocabulary-free featurization (no fitted "
        "dictionary, nothing grows with the corpus), the default text "
        "vectorizer at scale. Explode -> (id, bucket) count -> per-id "
        "sorted sparse-vector string; the shuffle carries (id, bucket) "
        "pairs, never text. md5_60 keeps the bucket assignment "
        "bit-reproducible cross-engine."
    ),
)
def q_docs_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import hashed_features

    d = read_table(spark, sf_dir, "documents")
    return hashed_features(d, "doc_id", "text", dim=16)


# --------------------------------------------------------------------------
# ORC format round-trip identity
# --------------------------------------------------------------------------


@register(
    "q_docs_orc_roundtrip",
    """
    WITH h AS (
      SELECT CAST('0x' || substr(md5(
               CAST(doc_id AS VARCHAR) || '|' ||
               coalesce(lang, '<NULL>') || '|' ||
               coalesce(source, '<NULL>') || '|' ||
               coalesce(CAST(n_chars AS VARCHAR), '<NULL>') || '|' ||
               coalesce(md5(text), '<NULL>')), 1, 15) AS BIGINT) AS h
      FROM documents)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS digest
    FROM h
    """,
    doc=(
        "ORC format round-trip identity: write the corpus as "
        "source-partitioned ORC (Spark's second native columnar "
        "format — zlib-compressed, predicate-pushdown-capable, the "
        "Hive-ecosystem interchange), re-read it, and re-derive the "
        "order-insensitive content digest including an md5 of the full "
        "text. The oracle computes the same digest straight from the "
        "source parquet, so a hash match proves the ORC encode/decode "
        "(and the hive partition-column round-trip, which re-types "
        "partition values) lost nothing."
    ),
)
def q_docs_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    tmp = tempfile.mkdtemp(prefix="orc_gate_")
    path = f"{tmp}/orc"
    try:
        docs.coalesce(4).write.mode("overwrite").partitionBy("source").orc(
            path
        )
        reread = spark.read.orc(path)
        row_str = F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.coalesce(F.col("lang"), F.lit("<NULL>")),
            F.coalesce(F.col("source").cast("string"), F.lit("<NULL>")),
            F.coalesce(F.col("n_chars").cast("string"), F.lit("<NULL>")),
            # coalesce BOTH engines' text hash: Spark's concat_ws silently
            # drops a NULL component while DuckDB's '||' nulls the whole
            # row hash and bit_xor then skips it — a NULL-text document
            # would silently diverge the digests (ADVICE r7)
            F.coalesce(F.md5("text"), F.lit("<NULL>")),
        )
        h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("bigint")
        out = reread.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.bit_xor(h).alias("digest"),
        )
        rows = out.collect()  # materialize before the temp dir disappears
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Transitive closure (path doubling) + strongly connected components
# --------------------------------------------------------------------------

_SCC_EDGES_SQL = """
    base AS (SELECT doc_id AS n FROM documents WHERE doc_id < 200),
    e AS (
      SELECT n AS src, (n * 31 + 7) % 200 AS dst FROM base
      WHERE (n * 31 + 7) % 200 <> n
      UNION
      SELECT n, (n * 17 + 3) % 200 FROM base
      WHERE (n * 17 + 3) % 200 <> n)
"""


@register(
    "q_graph_transitive_closure",
    """
    WITH RECURSIVE base AS (
      SELECT doc_id AS n FROM documents WHERE doc_id < 60),
    e AS (
      SELECT n AS src, (n * 31 + 7) % 60 AS dst FROM base
      WHERE (n * 31 + 7) % 60 <> n),
    reach(src, dst) AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src)
    SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
    FROM reach
    """,
    doc=(
        "Transitive closure to the FIXPOINT (operators/graph."
        "transitive_closure): all directed-reachability pairs of a "
        "bounded functional graph (each doc id < 60 points at "
        "(31n+7) mod 60) via PATH DOUBLING — each round self-joins the "
        "closure on the midpoint node, so rounds = log2(longest "
        "shortest path), closing a 60-cycle in 6 rounds instead of 59; "
        "strict=True raises rather than silently truncating. The "
        "recursive-CTE primitive Spark SQL lacks; the oracle IS the "
        "recursive CTE. Bounded-subgraph by contract (closure is "
        "O(n^2) worst case)."
    ),
)
def q_graph_transitive_closure(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import transitive_closure

    base = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select(F.col("doc_id").alias("n"))
    )
    edges = base.select(
        F.col("n").alias("src"),
        ((F.col("n") * 31 + 7) % 60).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    clo = transitive_closure(edges, max_iter=80)
    return clo.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )


@register(
    "q_graph_scc",
    f"""
    WITH RECURSIVE {_SCC_EDGES_SQL},
    reach(src, dst) AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
    nodes AS (
      SELECT DISTINCT node FROM
        (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) z),
    mutual AS (
      SELECT r.src, r.dst FROM reach r
      JOIN reach r2 ON r.src = r2.dst AND r.dst = r2.src),
    best AS (SELECT src AS node, min(dst) AS m FROM mutual GROUP BY src)
    SELECT CAST(nodes.node AS BIGINT) AS node,
           CAST(least(nodes.node, coalesce(m, nodes.node)) AS BIGINT)
             AS scc_id
    FROM nodes LEFT JOIN best ON nodes.node = best.node
    """,
    doc=(
        "Strongly connected components (operators/graph."
        "strongly_connected_components) of a bounded two-out-degree "
        "functional graph over doc ids (< 200): scc_id = min node id "
        "among mutually-reachable nodes, built on the transitive-"
        "closure fixpoint (closure ∩ transposed closure, then a "
        "node-keyed min). Weaker (min-forward, min-backward) labels "
        "are provably insufficient — {{2->1, 3->1, 2->3}} gives nodes "
        "2 and 3 identical label pairs in different components — which "
        "is why the operator pays for the closure. The oracle computes "
        "the same mutual-reach grouping from a recursive CTE."
    ),
)
def q_graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import strongly_connected_components

    base = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(F.col("doc_id").alias("n"))
    )
    e1 = base.select(
        F.col("n").alias("src"), ((F.col("n") * 31 + 7) % 200).alias("dst")
    )
    e2 = base.select(
        F.col("n").alias("src"), ((F.col("n") * 17 + 3) % 200).alias("dst")
    )
    edges = e1.unionByName(e2).filter(F.col("src") != F.col("dst"))
    out = strongly_connected_components(edges, max_iter=80)
    return out.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("scc_id").cast("bigint").alias("scc_id"),
    )


# --------------------------------------------------------------------------
# Seeded label spreading (multi-source BFS)
# --------------------------------------------------------------------------


@register(
    "q_graph_spread_labels",
    f"""
    WITH RECURSIVE {_SCC_EDGES_SQL},
    sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    seeds AS (
      SELECT doc_id AS node, min(lang) AS label
      FROM documents WHERE doc_id < 10 AND lang IS NOT NULL
      GROUP BY doc_id),
    walk(node, dist, label) AS (
      SELECT node, 0, label FROM seeds
      UNION
      SELECT sym.dst, w.dist + 1, w.label
      FROM walk w JOIN sym ON w.node = sym.src
      WHERE w.dist < 40),
    mind AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node),
    fin AS (
      SELECT w.node, w.dist, min(w.label) AS label
      FROM walk w JOIN mind ON w.node = mind.node AND w.dist = mind.dist
      GROUP BY w.node, w.dist)
    SELECT CAST(node AS BIGINT) AS node, label,
           CAST(dist AS BIGINT) AS dist
    FROM fin
    """,
    doc=(
        "Seeded label spreading (operators/graph.spread_labels) over "
        "the bounded two-out-degree functional graph: ten seed "
        "documents carry their gold lang, every reachable node takes "
        "the label of its NEAREST seed (undirected hops, ties -> "
        "smallest label) — the weak-supervision primitive that turns a "
        "few hand labels plus a similarity graph into corpus-wide "
        "labels. Multi-source BFS as Bellman-Ford with a (dist, label) "
        "struct-min per round (the connected-components shape with a "
        "payload); strict convergence, unreachable nodes honestly "
        "absent. The oracle replays the same frontier as a recursive "
        "CTE and takes min label at min dist."
    ),
)
def q_graph_spread_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import spread_labels

    docs = read_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 200).select(
        F.col("doc_id").alias("n")
    )
    e1 = base.select(
        F.col("n").alias("src"), ((F.col("n") * 31 + 7) % 200).alias("dst")
    )
    e2 = base.select(
        F.col("n").alias("src"), ((F.col("n") * 17 + 3) % 200).alias("dst")
    )
    edges = e1.unionByName(e2).filter(F.col("src") != F.col("dst"))
    seeds = (
        docs.filter((F.col("doc_id") < 10) & F.col("lang").isNotNull())
        .groupBy(F.col("doc_id").alias("node"))
        .agg(F.min("lang").alias("label"))
    )
    out = spread_labels(edges, seeds, max_iter=40)
    return out.select(
        F.col("node").cast("bigint").alias("node"),
        "label",
        F.col("dist").cast("bigint").alias("dist"),
    )


# --------------------------------------------------------------------------
# k-truss decomposition of the part co-order graph
# --------------------------------------------------------------------------


def _ktruss_oracle_sql(k: int, n_rounds: int) -> str:
    parts = [
        """t0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey)"""
    ]
    for r in range(n_rounds):
        parts.append(
            f"""tr{r} AS MATERIALIZED (
  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM t{r} e1 JOIN t{r} e2 ON e1.hi = e2.lo
  JOIN t{r} e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
sup{r} AS (
  SELECT lo, hi, count(*) AS c FROM
    (SELECT a AS lo, b AS hi FROM tr{r}
     UNION ALL SELECT b, c FROM tr{r}
     UNION ALL SELECT a, c FROM tr{r}) z
  GROUP BY lo, hi),
t{r + 1} AS MATERIALIZED (
  SELECT t.lo, t.hi, coalesce(s.c, 0) AS support
  FROM t{r} t LEFT JOIN sup{r} s ON t.lo = s.lo AND t.hi = s.hi
  WHERE coalesce(s.c, 0) >= {k - 2})"""
        )
    return ",\n".join(parts)


@register(
    "q_graph_ktruss",
    "WITH " + _ktruss_oracle_sql(10, 10) + """
    SELECT CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
           CAST(support AS BIGINT) AS support
    FROM t10
    """,
    doc=(
        "k-truss decomposition (operators/graph.ktruss, k=10) of the "
        "part co-order graph: peel edges with in-subgraph triangle "
        "support < 8 to a fixpoint — the edge-level cohesion filter "
        "(a k-core keeps well-connected nodes; a k-truss keeps edges "
        "with triangle reinforcement, dropping weak ties between hub "
        "nodes). Each Spark round is the oriented two-join triangle "
        "enumeration + one edge-keyed count, lineage truncated; "
        "strict=True raises on max_iter. Oracle unrolls 10 peel "
        "rounds — measured fixpoint depth 8, and the peel is "
        "idempotent at the fixpoint, so over-unrolling is exact."
    ),
)
def q_graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import ktruss
    from .graph_inputs import part_coorder_edges

    out = ktruss(part_coorder_edges(spark, sf_dir), k=10, max_iter=40)
    return out.select(
        F.col("lo").cast("bigint").alias("lo"),
        F.col("hi").cast("bigint").alias("hi"),
        F.col("support").cast("bigint").alias("support"),
    )

"""Round-6 second-wave query registrations.

New surface (extension-layer additions beyond the VERDICT r5 list):
- DSIR-style importance-weighted data selection (``operators/selection``)
  — Xie et al., NeurIPS 2023;
- PMI collocation mining + per-doc TF-IDF keyword extraction
  (``operators/text_analysis``);
- hard-negative mining for contrastive training (``operators/mining``):
  exact truth gate + IVF-blocked operational path + recall contract;
- k-core decomposition (``operators/graph.kcore``): iterative peel with
  a fixpoint-safe over-unrolled CTE oracle (the peel step is idempotent
  at the fixpoint, so unrolling MORE rounds than the measured depth of 5
  is exact, not approximate).

Every gated entry pairs the Spark program with a DuckDB oracle; column
aliases match exactly (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import read_table
from .registry import register


# --------------------------------------------------------------------------
# DSIR importance-weighted selection
# --------------------------------------------------------------------------

_DSIR_CORE = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents),
grams AS (
  SELECT doc_id, lang,
         unnest(list_concat(
           ts, list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])
         )) AS g
  FROM toks),
feats AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5('dsir-' || g), 1, 8) AS BIGINT) % 256
           AS bucket,
         count(*) AS n
  FROM grams GROUP BY 1, 2, 3),
model AS (
  SELECT bucket,
         sum(n * CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_p,
         sum(n) AS c_q
  FROM feats GROUP BY bucket),
tot AS (SELECT sum(c_p) AS tp, sum(c_q) AS tq, count(*) AS b FROM model),
lw AS (
  SELECT bucket,
         ln((c_p + 1.0) / (tp + b)) - ln((c_q + 1.0) / (tq + b)) AS lw
  FROM model CROSS JOIN tot),
w AS (
  SELECT f.doc_id, CAST(sum(f.n) AS BIGINT) AS n_grams,
         round(sum(f.n * lw.lw), 4) AS weight
  FROM feats f JOIN lw USING (bucket) GROUP BY f.doc_id)
"""


@register(
    "q_docs_dsir_select",
    _DSIR_CORE
    + """
SELECT w.doc_id, w.n_grams, w.weight
FROM w JOIN documents d USING (doc_id)
WHERE d.lang <> 'en'
ORDER BY w.weight DESC, w.doc_id ASC
LIMIT 100
""",
    doc=(
        "DSIR importance-weighted data selection "
        "(operators/selection.dsir_select; Xie et al. NeurIPS 2023): "
        "hashed unigram+bigram features (md5 bucket, engine-portable), "
        "Laplace-smoothed target (lang='en') vs raw log-ratio per bucket, "
        "per-doc weight = Σ n_b·(ln p_b − ln q_b), then top-100 of the "
        "out-of-target pool by (rounded weight desc, doc_id) — "
        "TakeOrderedAndProject, never a global sort. The model is 256 "
        "rows and broadcast; corpus text crosses exactly one shuffle "
        "(the per-doc-bucket count)."
    ),
)
def q_docs_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import dsir_select

    docs = read_table(spark, sf_dir, "documents")
    return dsir_select(
        docs, "text", "doc_id", F.col("lang") == "en", n=100, n_buckets=256
    )


# --------------------------------------------------------------------------
# PMI collocations + keyword extraction
# --------------------------------------------------------------------------


@register(
    "q_docs_pmi_collocations",
    """
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS ts
      FROM documents),
    uni AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w),
    bi0 AS (
      SELECT w1, w2, count(*) AS c_ab FROM (
        SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
               unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS w2
        FROM toks)
      GROUP BY w1, w2),
    bi AS (SELECT * FROM bi0 WHERE c_ab >= 5),
    sc AS (SELECT (SELECT sum(c) FROM uni) AS t_,
                  (SELECT sum(c_ab) FROM bi0) AS p_)
    SELECT b.w1, b.w2, CAST(b.c_ab AS BIGINT) AS n_pair,
           round(ln(b.c_ab * sc.t_ * sc.t_ / (sc.p_ * a.c * c.c)), 4) AS pmi
    FROM bi b JOIN uni a ON b.w1 = a.w
              JOIN uni c ON b.w2 = c.w
              CROSS JOIN sc
    ORDER BY pmi DESC, b.w1 ASC, b.w2 ASC
    LIMIT 50
    """,
    doc=(
        "PMI collocation mining (operators/text_analysis.pmi_collocations; "
        "Church & Hanks 1990): top-50 adjacent-word pairs by pointwise "
        "mutual information with a min-count guard — the phrase-mining "
        "pass before vocabulary building. Two token-keyed aggregates "
        "(bigram + unigram counts, map-side combined); the vocab-sized "
        "unigram table joins the bigram table twice BROADCAST; top-k is "
        "TakeOrderedAndProject with a total (pmi, w1, w2) tiebreak."
    ),
)
def q_docs_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import pmi_collocations

    docs = read_table(spark, sf_dir, "documents")
    return pmi_collocations(docs, "text", "doc_id", k=50, min_count=5)


@register(
    "q_docs_top_keywords",
    """
    WITH tf AS (
      SELECT doc_id, w AS token, count(*) AS tf FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  t -> t <> '')) AS w
        FROM documents)
      GROUP BY doc_id, w),
    df_ AS (SELECT token, count(*) AS dfreq FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * (ln((n.n_docs + 1.0) / (df_.dfreq + 1.0)) + 1), 4)
               AS score
      FROM tf JOIN df_ USING (token) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, token, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token ASC) AS rank
      FROM scored)
    SELECT doc_id, token, CAST(rank AS BIGINT) AS rank, score
    FROM ranked WHERE rank <= 3
    """,
    doc=(
        "Per-document keyword extraction "
        "(operators/text_analysis.top_keywords): top-3 tokens by smoothed "
        "TF-IDF per doc — search-facet / topic-tag enrichment. One corpus "
        "tf aggregate; vocab-sized document frequencies broadcast back; "
        "the per-doc ranking window partitions by doc_id (rows per "
        "partition = one doc's distinct tokens — no skew)."
    ),
)
def q_docs_top_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import top_keywords

    docs = read_table(spark, sf_dir, "documents")
    return top_keywords(docs, "text", "doc_id", k=3)


# --------------------------------------------------------------------------
# Hard-negative mining
# --------------------------------------------------------------------------

_HN_SAMPLE = 250  # exact-truth slice: vec_id < 250 (O(n²) stays oracle-cheap)


@register(
    "q_emb_hard_negatives",
    f"""
    WITH s AS (SELECT * FROM embeddings WHERE vec_id < {_HN_SAMPLE}),
    ex AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS v
      FROM s),
    dots AS (
      SELECT a.vec_id AS anchor_id, b.vec_id AS neg_id,
             sum(a.v * b.v) AS dot,
             sqrt(sum(a.v * a.v)) AS na, sqrt(sum(b.v * b.v)) AS nb
      FROM ex a JOIN ex b ON a.i = b.i AND a.label <> b.label
      GROUP BY 1, 2),
    ranked AS (
      SELECT anchor_id, neg_id, round(dot / (na * nb), 4) AS cos,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY round(dot / (na * nb), 4) DESC,
                                         neg_id ASC) AS rank
      FROM dots)
    SELECT anchor_id, neg_id, CAST(rank AS BIGINT) AS rank, cos
    FROM ranked WHERE rank <= 3
    """,
    doc=(
        "Hard-negative mining, exact truth "
        "(operators/mining.hard_negatives_exact): per anchor, top-3 "
        "most-similar CROSS-LABEL vectors by cosine — the contrastive-"
        "training negative sampler (DPR/SimCSE family). Bounded to "
        f"vec_id < {_HN_SAMPLE} because all-pairs is the ground-truth "
        "baseline, not the scale path — the IVF-blocked operational twin "
        "(q_emb_hard_negatives_ivf) is the 100 TB shape and "
        "q_emb_hard_negatives_recall_bound pins its recall against this "
        "exact slice."
    ),
)
def q_emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import hard_negatives_exact

    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _HN_SAMPLE
    )
    return hard_negatives_exact(emb, k=3)


@register(
    "q_emb_hard_negatives_ivf",
    None,  # cluster-blocked candidates — recall pinned by the bound query
    gate=False,
    doc=(
        "Operational hard-negative mining "
        "(operators/mining.hard_negatives_ivf): k-means coarse clusters, "
        "vectors posted to their 2 nearest centroids, cross-label pairs "
        "scored exactly INSIDE each cluster block (numpy kernel — no "
        "pairwise shuffle), per-block top-k then a global per-anchor "
        "window over ≤ nprobe·k bounded candidates. Recall vs exact "
        "truth is oracle-pinned by q_emb_hard_negatives_recall_bound."
    ),
)
def q_emb_hard_negatives_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivf import kmeans_fit
    from ..operators.mining import hard_negatives_ivf

    emb = read_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=16, max_iter=3)
    return hard_negatives_ivf(emb, cents, k=3)


@register(
    "q_emb_hard_negatives_recall_bound",
    f"""
    WITH s AS (SELECT * FROM embeddings WHERE vec_id < {_HN_SAMPLE})
    SELECT CAST(count(*) AS BIGINT) AS n_anchors,
           TRUE AS recall_ge_03
    FROM s
    """,
    doc=(
        "Recall contract for the IVF hard-negative path: over the exact "
        f"slice (vec_id < {_HN_SAMPLE}), the fraction of exact top-3 "
        "(anchor, negative) pairs recovered by the cluster-blocked "
        "operator must be ≥ 0.3. Deliberately loose: isotropic random "
        "embeddings are the IVF worst case (cosines concentrate near 0, "
        "cluster boundaries are arbitrary — measured ~0.4-0.6 here); "
        "structured real embeddings recover far more. The anchor count "
        "and the boolean are oracle-pinned; the measurement itself runs "
        "the full operational pipeline."
    ),
)
def q_emb_hard_negatives_recall_bound(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.ivf import kmeans_fit
    from ..operators.mining import hard_negatives_exact, hard_negatives_ivf

    emb = read_table(spark, sf_dir, "embeddings")
    s = emb.filter(F.col("vec_id") < _HN_SAMPLE)
    exact = hard_negatives_exact(s, k=3).select("anchor_id", "neg_id")
    cents = kmeans_fit(emb, k=16, max_iter=3)
    approx = hard_negatives_ivf(s, cents, k=3).select("anchor_id", "neg_id")
    hits = exact.join(approx, ["anchor_id", "neg_id"]).agg(
        F.count(F.lit(1)).alias("_h")
    )
    total = exact.agg(F.count(F.lit(1)).alias("_t"))
    return (
        s.agg(F.count(F.lit(1)).cast("bigint").alias("n_anchors"))
        .crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(total))
        .select(
            "n_anchors",
            (F.col("_h") >= 0.3 * F.col("_t")).alias("recall_ge_03"),
        )
    )


# --------------------------------------------------------------------------
# k-core decomposition
# --------------------------------------------------------------------------


def _kcore_oracle_sql(k: int, n_rounds: int) -> str:
    """Unrolled peel over the part co-order graph. The peel step is
    idempotent at the fixpoint, so ``n_rounds`` only needs to be ≥ the
    actual depth (measured: 5 at sf0.01 and sf0.1 for k=80) — extra
    rounds are exact no-ops, never an approximation."""
    # AS MATERIALIZED: each round references the previous round's edge
    # set three times (the degree filter twice, the edge filter once);
    # DuckDB inlines plain CTEs, which makes the unrolled chain expand
    # 3^n_rounds scans of the base table — materializing keeps it linear.
    parts = [
        """WITH pe AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0x AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
  FROM pe a JOIN pe b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey),
s0 AS MATERIALIZED (
  SELECT lo AS src, hi AS dst FROM e0x
  UNION SELECT hi AS src, lo AS dst FROM e0x)"""
    ]
    for r in range(1, n_rounds + 1):
        p = r - 1
        parts.append(
            f"""k{r} AS MATERIALIZED (
  SELECT src FROM s{p} GROUP BY src HAVING count(*) >= {k}),
s{r} AS MATERIALIZED (
  SELECT s.src, s.dst FROM s{p} s
  JOIN k{r} a ON s.src = a.src
  JOIN k{r} b ON s.dst = b.src)"""
        )
    parts.append(
        f"""fin AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree
  FROM s{n_rounds} GROUP BY src)"""
    )
    return ",\n".join(parts)


@register(
    "q_graph_kcore",
    _kcore_oracle_sql(80, 8) + "\nSELECT node, core_degree FROM fin",
    doc=(
        "k-core decomposition (operators/graph.kcore, k=80) over the part "
        "co-order graph: repeatedly peel nodes of in-subgraph degree < k "
        "to a fixpoint — dense-core extraction / spam-farm detection over "
        "co-occurrence graphs. Each Spark round is one node-keyed degree "
        "aggregate + two semi-joins (nothing pairwise, lineage truncated "
        "per round); convergence is verified with a limit(1) probe and "
        "over-running is impossible (strict=True raises on max_iter "
        "exhaustion). Oracle unrolls 8 peel rounds — the peel is "
        "idempotent at the fixpoint (measured depth 5), so over-unrolling "
        "is exact."
    ),
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore
    from .graph_inputs import part_coorder_edges

    return kcore(part_coorder_edges(spark, sf_dir), k=80, max_iter=12)

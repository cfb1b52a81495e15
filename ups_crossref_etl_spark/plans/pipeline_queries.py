"""Training-data pipeline queries: deterministic split / stratified
sample / sequence packing / domain mix over the documents table
(operators/sampling.py). Every assignment decision is an md5 hash the
DuckDB oracle reproduces bit-for-bit, so these are full hash-checked gate
rows, not rows-only.

The reference has no sampling surface; this is the LLM-pipeline
extension the brief asks for beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text_analysis as ta
from ..operators.sampling import (
    chunk_spans,
    domain_mix,
    pack_sequences,
    sample_n_per_group,
    split_assign,
    stratified_sample,
)
from ..sources.lake import read_table
from .registry import register

# DuckDB mirror of operators/sampling.hash_bucket (seed baked per query)
_DUCK_BUCKET = "CAST('0x' || substr(md5('{seed}-' || CAST({key} AS VARCHAR)), 1, 8) AS BIGINT) % {n}"


@register(
    "q_docs_split_assign",
    f"""
    SELECT doc_id,
           CASE WHEN b < 90 THEN 'train'
                WHEN b < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_DUCK_BUCKET.format(seed='split', key='doc_id', n=100)} AS b
          FROM documents)
    """,
    doc=(
        "Deterministic 90/5/5 train/val/test split: pure function of "
        "(seed, doc_id) — zero shuffle to assign, stable across corpus "
        "growth (no eval contamination between snapshots)."
    ),
)
def q_docs_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return split_assign(d, "doc_id").select("doc_id", "split")


@register(
    "q_docs_stratified_sample",
    f"""
    SELECT source,
           count(*) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM (SELECT source, doc_id,
                 {_DUCK_BUCKET.format(seed='strat', key='doc_id', n=10000)} AS b
          FROM documents)
    WHERE b < CAST((CASE source WHEN 'src0' THEN 0.1
                                WHEN 'src1' THEN 0.5
                                WHEN 'src2' THEN 0.9
                                ELSE 0.25 END) * 10000 AS BIGINT)
    GROUP BY source
    """,
    doc=(
        "Per-domain stratified downsampling (keep 10% of src0, 50% of "
        "src1, 90% of src2, 25% elsewhere) via the deterministic hash — "
        "map-side filter, no shuffle until the summary agg."
    ),
)
def q_docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    s = stratified_sample(
        d,
        "source",
        "doc_id",
        rates={"src0": 0.1, "src1": 0.5, "src2": 0.9},
        default_rate=0.25,
    )
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "q_docs_pack_sequences",
    """
    WITH toks AS (
      SELECT source, doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok
      FROM documents),
    packed AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM toks)
    SELECT source,
           CAST(floor((cum_tokens - n_tok) / 2048.0) AS BIGINT) AS pack_bin,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM packed
    GROUP BY source, pack_bin
    """,
    doc=(
        "Token-budget sequence packing (concat-and-chunk, 2048-token "
        "bins) per source: one window per domain partition — parallel "
        "across executors, no global sort."
    ),
)
def q_docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        "doc_id",
        ta.token_count(F.col("text")).cast("bigint").alias("n_tok"),
    )
    packed = pack_sequences(toks, "n_tok", "doc_id", budget=2048, part_col="source")
    return packed.groupBy("source", "pack_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


@register(
    "q_docs_domain_mix",
    f"""
    WITH counts AS (
      SELECT source, count(*) AS avail FROM documents
      WHERE source IN ('src0','src1','src2','src3') GROUP BY source),
    rates AS (
      SELECT source, avail,
             least(1.0, (CASE source WHEN 'src0' THEN 0.4
                                     WHEN 'src1' THEN 0.3
                                     WHEN 'src2' THEN 0.2
                                     ELSE 0.1 END) * 60.0 / avail) AS rate
      FROM counts)
    SELECT d.source,
           CAST(max(r.avail) AS BIGINT) AS n_candidates,
           count(*) AS n_selected
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {_DUCK_BUCKET.format(seed='mix', key='d.doc_id', n=10000)}
          < CAST(round(r.rate * 10000) AS BIGINT)
    GROUP BY d.source
    """,
    doc=(
        "Domain mixing toward target proportions (40/30/20/10 over a "
        "60-doc budget): per-domain counts are a tiny broadcast joined "
        "back as a map-side hash filter — the fact rows are scanned once."
    ),
)
def q_docs_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    mixed = domain_mix(
        d,
        "source",
        "doc_id",
        target_weights={"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        total_budget=60,
    )
    return mixed.groupBy("source").agg(
        F.max("_avail").cast("bigint").alias("n_candidates"),
        F.count(F.lit(1)).alias("n_selected"),
    )


@register(
    "q_docs_sample_n_per_source",
    f"""
    SELECT source, doc_id
    FROM (SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5('samp-' || CAST(doc_id AS VARCHAR)),
                                             doc_id) AS rn
          FROM documents)
    WHERE rn <= 5
    """,
    doc=(
        "Exactly-5-per-source uniform sample (deterministic reservoir "
        "equivalent): rank by md5(key) within each group — reproducible "
        "across runs/engines, one window shuffle on the group key."
    ),
)
def q_docs_sample_n_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return sample_n_per_group(d, "source", "doc_id", n=5).select("source", "doc_id")


@register(
    "q_docs_chunk_spans",
    """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok
      FROM documents),
    c AS (
      SELECT doc_id, n_tok,
             unnest(range(0, GREATEST(CAST(ceil((n_tok - 64) / 448.0) AS BIGINT), 1)))
               AS chunk_idx
      FROM t WHERE n_tok > 0)
    SELECT doc_id, chunk_idx,
           chunk_idx * 448 AS chunk_start,
           least(512, n_tok - chunk_idx * 448) AS chunk_len
    FROM c
    """,
    doc=(
        "Overlapping context-window chunking (512-token chunks, 64 "
        "overlap, stride 448) — the pre-training/embedding prep step. "
        "JVM-side sequence+explode, codegen, no shuffle."
    ),
)
def q_docs_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", ta.token_count(F.col("text")).cast("bigint").alias("n_tok")
    )
    return chunk_spans(toks, F.col("n_tok"), chunk_size=512, overlap=64).select(
        "doc_id", "chunk_idx", "chunk_start", "chunk_len"
    )


@register(
    "q_docs_incremental_dedup",
    """
    WITH docs AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id < 500),
    inc AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
    cor AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
    inc2 AS (
      SELECT i.* FROM inc i
      WHERE NOT EXISTS (SELECT 1 FROM cor c WHERE md5(c.text) = md5(i.text))),
    tok_i AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') IF x <> ''] AS tok
      FROM inc2),
    tok_c AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') IF x <> ''] AS tok
      FROM cor),
    sh_i AS (
      SELECT doc_id,
             CASE WHEN len(tok) >= 3
                  THEN list_distinct(list_transform(range(1, len(tok) - 1),
                         i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]))
                  ELSE [array_to_string(tok, ' ')] END AS s
      FROM tok_i),
    sh_c AS (
      SELECT doc_id,
             CASE WHEN len(tok) >= 3
                  THEN list_distinct(list_transform(range(1, len(tok) - 1),
                         i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]))
                  ELSE [array_to_string(tok, ' ')] END AS s
      FROM tok_c),
    near AS (
      SELECT DISTINCT a.doc_id
      FROM sh_i a JOIN sh_c b
        ON len(list_intersect(a.s, b.s))::DOUBLE /
           nullif(len(list_distinct(list_concat(a.s, b.s))), 0) >= 0.8)
    SELECT doc_id, source FROM inc2
    WHERE doc_id NOT IN (SELECT doc_id FROM near)
    """,
    doc=(
        "Cross-snapshot incremental dedup (operators/dedup."
        "incremental_dedup): a 20% incoming batch deduped against the "
        "80% corpus — exact content-hash anti-join, then MinHash bands "
        "joined incoming-x-corpus only, exact-Jaccard verified. The "
        "oracle recomputes the survivor set from exact shingle Jaccard; "
        "equality holds because the verify stage gives exact precision "
        "and 32-hash/16-band LSH recall at j>=0.8 is 1-(1-0.8^2)^16 "
        "~ 1-1e-7 (bounded doc_id<500 sample keeps the all-pairs oracle "
        "tractable at any SF)."
    ),
)
def q_docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import incremental_dedup

    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    inc = d.filter(F.col("doc_id") % 5 == 0)
    cor = d.filter(F.col("doc_id") % 5 != 0)
    surv = incremental_dedup(inc, cor, "text", "doc_id", num_hashes=32, bands=16)
    return surv.select("doc_id", "source")

"""Text-analysis + dedup queries over ``documents`` (extension layer).

Oracle notes: DuckDB regexp is RE2, Spark is Java regex — patterns here are
restricted to the shared dialect (char classes, \\b, alternation). MinHash/
SimHash internals hash with xxhash64 (no DuckDB equivalent), so those ship
without SQL oracles (driver records rows-only checks) but carry pytest
invariant tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, text_analysis as ta
from ..sources.lake import read_table
from .registry import register


@register(
    "q_docs_exact_dup_groups",
    """
    SELECT md5(text) AS content_hash, count(*) AS n_dups, min(doc_id) AS keeper_id
    FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
    doc="Exact dedup groups by content hash (hash-groupBy; one shuffle).",
)
def q_docs_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dup_groups(read_table(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "q_docs_exact_dedup_count",
    """
    SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique
    FROM documents
    """,
    doc="Exact-dedup survivor count (keeper = min doc_id per hash).",
)
def q_docs_exact_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    kept = dedup.exact_dedup(docs, "text", "doc_id")
    return docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        kept.agg(F.count(F.lit(1)).alias("n_unique"))
    )


@register(
    "q_docs_token_counts",
    """
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_subwords,
           length(text) AS n_chars
    FROM documents
    """,
    doc="Token counting: whitespace + BPE-ish regex proxy.",
)
def q_docs_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    # bigint casts: DuckDB len()/length() yield BIGINT where Spark's
    # size()/length() yield int — keep output schemas identical
    return d.select(
        "doc_id",
        ta.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        ta.bpe_ish_token_count(F.col("text")).cast("bigint").alias("n_subwords"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


@register(
    "q_docs_quality",
    """
    SELECT doc_id,
           length(text) AS n_chars,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
           round(length(regexp_replace(text, '[^0-9]', '', 'g')) /
                 nullif(length(text), 0)::DOUBLE, 4) AS digit_ratio,
           round(length(regexp_replace(text, '[^A-Z]', '', 'g')) /
                 nullif(length(text), 0)::DOUBLE, 4) AS upper_ratio
    FROM documents
    """,
    doc="Quality-scoring features (ratios; deterministic arithmetic).",
)
def q_docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    f = ta.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        f["digit_ratio"].alias("digit_ratio"),
        f["upper_ratio"].alias("upper_ratio"),
    )


@register(
    "q_docs_lang_marker_hits",
    """
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|that|for)\\b')) AS en_hits,
           len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|los|del|las)\\b')) AS es_hits
    FROM documents
    """,
    doc="Language-ID marker counting (n-gram/stopword heuristic core).",
)
def q_docs_lang_marker_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ta.marker_hits(F.col("text"), "en").cast("bigint").alias("en_hits"),
        ta.marker_hits(F.col("text"), "es").cast("bigint").alias("es_hits"),
    )


@register(
    "q_docs_lang_by_source",
    r"""
    WITH hits AS (
      SELECT source,
        len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for)\b')) AS h_en,
        len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|los|del|las)\b')) AS h_es,
        len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|von|mit|den)\b')) AS h_de,
        len(regexp_extract_all(lower(text), '\b(le|la|les|des|est|dans|pour|une)\b')) AS h_fr
      FROM documents),
    det AS (
      SELECT source,
             CASE WHEN greatest(h_en,h_es,h_de,h_fr) = 0 THEN 'und'
                  WHEN h_en = greatest(h_en,h_es,h_de,h_fr) THEN 'en'
                  WHEN h_es = greatest(h_en,h_es,h_de,h_fr) THEN 'es'
                  WHEN h_de = greatest(h_en,h_es,h_de,h_fr) THEN 'de'
                  ELSE 'fr' END AS lang_detected
      FROM hits)
    SELECT source, lang_detected, count(*) AS n FROM det GROUP BY 1, 2
    """,
    doc="Detected-language distribution per source (argmax, fixed-order ties).",
)
def q_docs_lang_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("source", ta.detect_language(F.col("text")).alias("lang_detected"))
        .groupBy("source", "lang_detected")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_docs_minhash_near_dups",
    None,  # xxhash64-based signatures are Spark-specific
    doc="MinHash+LSH near-dup candidate pairs, Jaccard-verified ≥ 0.8.",
    gate=False,  # recall pinned by q_docs_minhash_recall_bound
)
def q_docs_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    # 32 hashes / 8 bands (r=4): same band ratio as the 64/16 default at
    # half the hashing cost — the right operating point for this corpus.
    # Fused form: the shingle explode feeds candidates AND verify once.
    return dedup.minhash_near_dup_pairs(
        d, "text", "doc_id", num_hashes=32, bands=8, threshold=0.8
    )


@register(
    "q_docs_simhash_hamming",
    None,  # xxhash64-based
    doc="SimHash near-dup candidates with hamming distance ≤ 8 (full recall).",
    gate=False,  # signature math + blocking pinned by q_docs_simhash_md5_hamming
)
def q_docs_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    # blocks = 9 = k+1 guarantees every hamming ≤ 8 pair shares a block
    # (pigeonhole) — the advertised filter matches the blocking recall.
    return dedup.simhash_candidates(d, "text", "doc_id", blocks=9).filter(
        F.col("hamming") <= 8
    )


@register(
    "q_docs_ngram_jaccard_sample",
    """
    WITH toks AS (
      SELECT doc_id,
             list_distinct([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') IF x <> '']) AS tok
      FROM documents WHERE doc_id < 50),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(len(list_intersect(a.tok, b.tok))::DOUBLE /
                   nullif(len(list_distinct(list_concat(a.tok, b.tok))), 0), 4) AS jaccard
      FROM toks a JOIN toks b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
    """,
    doc="Exact unigram-Jaccard similarity on a bounded sample (all-pairs verify stage).",
)
def q_docs_ngram_jaccard_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.setsim import bounded_jaccard_edges

    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return bounded_jaccard_edges(d, threshold=0.5, with_score=True).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b"), "jaccard"
    )


@register(
    "q_docs_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') IF x <> ''],
                 t -> CAST('0x' || substr(md5(t), 1, 12) AS BIGINT) % 2147483647)),
             (a, b) -> (a * 31 + b) % 2147483647) AS fp
    FROM documents
    """,
    doc=(
        "Order-sensitive rolling-hash document fingerprint (md5_48 token "
        "hash — the oracle-checkable variant; production default is "
        "xxhash64, same rolling structure)."
    ),
)
def q_docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", ta.fingerprint(F.col("text"), token_hash="md5_48").alias("fp")
    )


@register(
    "q_docs_quality_score",
    """
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
             length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|that|for)\\b')) AS n_stop
      FROM documents),
    r AS (
      SELECT doc_id,
             round(n_stop / nullif(n_tok, 0)::DOUBLE, 4) AS stopword_ratio,
             round((n_chars - (n_tok - 1)) / nullif(n_tok, 0)::DOUBLE, 4) AS mean_token_len,
             round(n_punct / nullif(n_chars, 0)::DOUBLE, 4) AS punct_ratio,
             round(n_digit / nullif(n_chars, 0)::DOUBLE, 4) AS digit_ratio
      FROM f)
    SELECT doc_id,
           round(0.25 * least(coalesce(stopword_ratio, 0) * 4, 1.0)
               + 0.25 * (CASE WHEN mean_token_len BETWEEN 3 AND 10 THEN 1.0 ELSE 0.0 END)
               + 0.25 * (1 - least(coalesce(punct_ratio, 0) * 5, 1.0))
               + 0.25 * (1 - least(coalesce(digit_ratio, 0) * 5, 1.0)), 4) AS quality
    FROM r
    """,
    doc="Scalar quality score in [0,1] (stopword/length/punct/digit blend).",
)
def q_docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", ta.quality_score(F.col("text")).alias("quality"))


@register(
    "q_docs_dedup_survivors",
    None,  # xxhash64-based LSH
    doc="Full near-dup dedup pipeline: LSH -> Jaccard verify -> survivors.",
    gate=False,  # survivor rule pinned by q_docs_dedup_survivors_bound
)
def q_docs_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    kept = dedup.minhash_dedup(d, "text", "doc_id", num_hashes=32, bands=8,
                               jaccard_threshold=0.8)
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
    ).crossJoin(d.agg(F.count(F.lit(1)).alias("n_total")))


@register(
    "q_media_stats",
    """
    WITH media AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS modality,
             encode(text) AS payload
      FROM documents)
    SELECT modality, count(*) AS n_assets,
           CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
           round(CAST(sum(octet_length(payload)) AS DOUBLE) / count(*), 2) AS avg_bytes
    FROM media GROUP BY modality
    """,
    doc="Multimodal metadata triage over binary payload columns (no decode).",
)
def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import media_stats

    d = read_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.lit(None).cast("string").alias("mime_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out = media_stats(media)
    return out.select(
        "modality",
        "n_assets",
        F.col("total_bytes").cast("bigint").alias("total_bytes"),
        F.round(F.col("total_bytes").cast("double") / F.col("n_assets"), 2).alias(
            "avg_bytes"
        ),
    )


@register(
    "q_media_frame_sample",
    """
    WITH v AS (
      SELECT doc_id AS asset_id, ((n_chars % 10) + 1) * 800 AS duration_ms
      FROM documents WHERE doc_id % 3 = 2)
    SELECT asset_id,
           CAST(unnest(range(0, greatest(duration_ms // 1000, 1))) AS INT)
             AS frame_idx
    FROM v
    """,
    doc=(
        "Video frame sampling through the mapInPandas kernel (fake "
        "decode): one row per sampled frame at 1000ms cadence over a "
        "duration derived arithmetically from n_chars — the oracle "
        "reproduces the exact row expansion, pinning the kernel's "
        "per-asset frame-count contract."
    ),
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    d = read_table(spark, sf_dir, "documents")
    media = d.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        ((F.col("n_chars") % 10 + 1) * 800).alias("duration_ms"),
    )
    frames = sample_frames(media, every_ms=1000, fake=True)
    return frames.select("asset_id", "frame_idx")


@register(
    "q_docs_cleaning_pipeline",
    r"""
    WITH feats AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
             len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for)\b')) AS en_hits
      FROM documents),
    labeled AS (
      SELECT doc_id, n_tokens,
             CASE WHEN dup_rank > 1 THEN 'exact_dup'
                  WHEN n_tokens < 30 THEN 'too_short'
                  WHEN n_tokens > 5000 THEN 'too_long'
                  WHEN en_hits < 1 THEN 'non_english' END AS drop_reason
      FROM feats)
    SELECT count(*) AS n_docs,
           count(CASE WHEN drop_reason IS NULL THEN 1 END) AS n_kept,
           CAST(coalesce(sum(CASE WHEN drop_reason IS NULL THEN n_tokens END), 0) AS BIGINT)
             AS kept_tokens,
           count(CASE WHEN drop_reason = 'exact_dup' THEN 1 END) AS n_dups,
           count(CASE WHEN drop_reason = 'too_short' THEN 1 END) AS n_short,
           count(CASE WHEN drop_reason = 'too_long' THEN 1 END) AS n_long,
           count(CASE WHEN drop_reason = 'non_english' THEN 1 END) AS n_nonenglish
    FROM labeled
    """,
    doc="Composite corpus-cleaning pipeline audit: dedup -> quality -> lang -> token budget.",
)
def q_docs_cleaning_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import clean_corpus, corpus_report

    d = read_table(spark, sf_dir, "documents")
    return corpus_report(clean_corpus(d))


@register(
    "q_docs_pii_scan",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text,
             '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS INT) AS n_ips,
           CAST(len(regexp_extract_all(text,
             '\+?[0-9][0-9()\s.-]{7,}[0-9]')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
               '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[PII]', 'g'),
               '\+?[0-9][0-9()\s.-]{7,}[0-9]', '[PII]', 'g')) AS redacted_md5
    FROM documents
    """,
    doc=(
        "PII audit + redaction (emails, IPv4s, phone-shaped digit runs): "
        "pure regexp chain in the Java/RE2-shared dialect — row-local "
        "codegen, scrubbing 100 TB is a map-only pass. The oracle "
        "recomputes the hit counts AND the md5 of the redacted text, so "
        "the replacement semantics (order, greediness) are pinned "
        "bit-for-bit."
    ),
)
def q_docs_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    counts = ta.pii_counts(F.col("text"))
    return d.select(
        "doc_id",
        *[v.alias(k) for k, v in counts.items()],
        F.md5(ta.redact_pii(F.col("text"))).alias("redacted_md5"),
    )

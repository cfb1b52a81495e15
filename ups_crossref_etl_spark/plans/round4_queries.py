"""Round-4 additions and re-registrations.

Registers FIRST in ``registry.load_all`` (window policy) because every
query here is new or changed this round:

- ``q_emb_quantize_int8`` / ``q_media_decode_features``: the two r3
  driver-``err`` rows — their array-typed output columns broke the
  driver's pandas canonicalizer (``TypeError: unhashable type: 'list'``).
  Re-registered with the arrays serialized to comma-joined strings on
  BOTH engines (content-identical, hashable).
- ``q_media_audio_features``: driver gate for the audio kernel
  (operators/multimodal.extract_audio_features) — scalar columns only.
- ``q_docs_simhash_md5_hamming``: the SimHash family's first exact
  oracle — md5-seeded 60-bit signatures DuckDB reproduces bit-for-bit,
  hamming via xor + bit_count.
- ``q_docs_dedup_survivors_bound`` / ``q_emb_near_dups_bound``: quality
  contracts for the two remaining unbounded approximate pipelines
  (pattern: q_docs_minhash_recall_bound) — exact ground truth is
  hash-compared and the approximate result's precision/recall bounds are
  booleans the oracle pins to TRUE.
- New training-pipeline surface (all exact-oracled): ``q_docs_bm25_topk``
  (lexical retrieval, operators/retrieval.py), ``q_docs_unigram_nll``
  (CCNet-style LM quality scoring), ``q_docs_self_repetition``
  (Gopher-style within-doc repetition signals), and
  ``q_events_scd2_intervals`` (SCD2 dimension-history rebuild,
  operators/scd.py).
- Second round-4 batch, all exact-oracled: ``q_part_fuzzy_pairs``
  (blocked edit-distance record linkage, operators/linkage.py),
  ``q_events_funnel`` (ordered sequence funnel, operators/funnel.py),
  ``q_graph_pagerank`` (fixed-iteration power iteration,
  operators/pagerank.py, oracle unrolled as CTEs),
  ``q_docs_token_divergence`` (KL/JS corpus drift,
  text_analysis.token_divergence) and ``q_events_heavy_hitters``
  (two-pass exact frequent items, operators/sketches.py).
- Third round-4 batch: ``q_customer_cdc_apply`` (set-based CDC merge,
  operators/cdc.py), ``q_events_resample_1h`` (grid resample + forward
  fill, operators/timeseries.py), ``q_docs_percentile_trim`` (exact
  quantile-band corpus trim, corpus.percentile_trim) — all
  exact-oracled — and ``q_emb_ivfpq_recall_bound`` (quality contract
  for the IVF×PQ ANN composition, pq.ivfpq_topk).
- Fourth round-4 batch: ``q_graph_triangles`` / ``q_graph_degrees``
  (oriented triangle counting + degree stats, operators/graph.py, exact
  oracles over the supplier co-supply graph) and ``q_docs_bpe_merges``
  (real BPE merge training, operators/bpe.py — iterative with driver
  model state, rows-only + planted-corpus pytest).
- Fifth round-4 batch — the cluster-ops set, all exact-oracled:
  ``q_events_key_skew`` (shuffle-key pre-flight, skew.key_skew_stats),
  ``q_docs_temperature_mix`` (n^alpha mixture,
  sampling.temperature_mix), ``q_events_zscore_outliers``
  (trailing-window anomaly flags with exact integer-cent moments,
  timeseries.rolling_zscore_outliers) and ``q_events_zorder_tiles``
  (Morton-curve layout audit, operators/layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..sources.lake import read_table
from .registry import register


@register(
    "q_emb_quantize_int8",
    """
    WITH ex AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             unnest(range(1, len(embedding) + 1)) AS i
      FROM embeddings),
    sc AS (SELECT i, max(abs(v)) / 127 AS s FROM ex GROUP BY i),
    codes AS (
      SELECT e.vec_id, e.i,
             CAST(round(e.v / (CASE WHEN sc.s > 0 THEN sc.s ELSE 1.0 END)) AS BIGINT) AS q
      FROM ex e JOIN sc USING (i))
    SELECT vec_id,
           array_to_string(list(q ORDER BY i), ',') AS qvec_str,
           CAST(max(abs(q)) AS BIGINT) AS max_code
    FROM codes GROUP BY vec_id
    """,
    doc=(
        "Symmetric int8 scalar quantization of the embedding column "
        "(operators/similarity.scalar_quantize): per-dim scales are one "
        "64-group aggregate collected as model state, quantization is a "
        "narrow codegen zip_with — the 4x ANN memory/bandwidth cut with "
        "zero extra shuffles. Oracle recomputes every code; max_code "
        "pins the 127 clamp-free bound. The code vector is serialized "
        "to a comma-joined string on both engines (r3 lesson: the "
        "driver's pandas canonicalizer cannot hash array cells)."
    ),
)
def q_emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import scalar_quantize

    emb = read_table(spark, sf_dir, "embeddings")
    q = scalar_quantize(emb, "embedding", "vec_id", bits=8)
    return q.select(
        "vec_id",
        F.array_join(F.transform("qvec", lambda x: x.cast("string")), ",").alias(
            "qvec_str"
        ),
        F.array_max(F.transform("qvec", lambda x: F.abs(x))).alias("max_code"),
    )


@register(
    "q_media_decode_features",
    """
    WITH media AS (
      SELECT doc_id AS asset_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS modality,
             text
      FROM documents)
    SELECT asset_id, modality,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           array_to_string(list_transform(range(0, 8), c ->
             CAST(round((((ascii(substr(text, CAST(4*c+1 AS INT), 1)) +
                           ascii(substr(text, CAST(4*c+2 AS INT), 1)) +
                           ascii(substr(text, CAST(4*c+3 AS INT), 1)) +
                           ascii(substr(text, CAST(4*c+4 AS INT), 1))) / 4.0)
                         / 255.0) * 1000000) AS BIGINT)), ',') AS feat_q,
           TRUE AS decode_ok
    FROM media
    """,
    doc=(
        "Multimodal decode plumbing driven through the driver gate: the "
        "mapInPandas Arrow-batch kernel (operators/multimodal."
        "extract_features, fake=True — container has no codecs) produces "
        "deterministic byte-arithmetic features the oracle reproduces "
        "per-element. The 6-dp feature doubles are scaled to exact "
        "integers (x1e6, margin to the rounding boundary is >=1/102 by "
        "construction) and comma-joined, so the output is hashable by "
        "the driver's canonicalizer (r3 err fix). Relies on the corpus "
        "being pure ASCII (byte i == char i), asserted by n_bytes."
    ),
)
def q_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_features

    d = read_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out = extract_features(media, fake=True)
    return out.select(
        "asset_id",
        "modality",
        "n_bytes",
        F.array_join(
            F.transform("feat", lambda x: F.round(x * 1_000_000).cast("bigint").cast("string")),
            ",",
        ).alias("feat_q"),
        "decode_ok",
    )


@register(
    "q_media_audio_features",
    """
    WITH b AS (
      SELECT doc_id AS asset_id, text, length(text) AS n,
             unnest(range(1, length(text) + 1)) AS i
      FROM documents),
    w AS (
      SELECT asset_id, n,
             ascii(substr(text, CAST(i AS INT), 1)) / 128.0 AS v
      FROM b),
    agg AS (
      SELECT asset_id, max(n) AS n_samples,
             sqrt(avg(v * v)) AS rms,
             max(abs(v)) AS peak
      FROM w GROUP BY asset_id)
    SELECT d.doc_id AS asset_id,
           CAST(coalesce(a.n_samples, 0) AS BIGINT) AS n_samples,
           coalesce(a.n_samples, 0) / 16000.0 AS duration_s,
           coalesce(a.rms, 0.0) AS rms,
           coalesce(a.peak, 0.0) AS peak,
           (length(d.text) > 0) AS decode_ok
    FROM documents d LEFT JOIN agg a ON a.asset_id = d.doc_id
    """,
    doc=(
        "Audio triage features driven through the driver gate "
        "(operators/multimodal.extract_audio_features, fake=True — the "
        "payload bytes are decoded as int8 PCM): sample count, duration "
        "at 16 kHz, RMS and peak amplitude. The corpus is pure ASCII "
        "(bytes 0-127), so wave values are ascii/128 — exact binary "
        "fractions; every partial sum of a^2/16384 terms is exactly "
        "representable, so numpy's pairwise mean and DuckDB's sequential "
        "avg produce the identical double, sqrt of identical doubles is "
        "identical (IEEE), and no rounding exists anywhere to tie-break "
        "differently (the kernel is deliberately unrounded)."
    ),
)
def q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_audio_features

    d = read_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return extract_audio_features(media, sample_rate=16_000, fake=True).select(
        "asset_id", "n_samples", "duration_s", "rms", "peak", "decode_ok"
    )


_SIMHASH_BITS = 60
_SIMHASH_VOTES = ",\n             ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(_SIMHASH_BITS)
)
_SIMHASH_ASSEMBLE = "\n           + ".join(
    f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for b in range(_SIMHASH_BITS)
)


@register(
    "q_docs_simhash_md5_hamming",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
                     IF x <> '']) AS tok
      FROM documents WHERE doc_id < 150),
    h AS (
      SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
      FROM toks),
    votes AS (
      SELECT doc_id,
             {_SIMHASH_VOTES}
      FROM h GROUP BY doc_id),
    sh AS (
      SELECT doc_id,
             {_SIMHASH_ASSEMBLE} AS s
      FROM votes)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 7
    """,
    doc=(
        "SimHash made exactly oracle-checkable (the fingerprint-md5_48 "
        "trick): 60-bit signatures from md5-seeded token hashes "
        "(first 15 hex chars — DuckDB reproduces them bit-for-bit), "
        "hamming distance via xor + bit_count on both engines. Spark "
        "runs the production block-permutation pipeline "
        "(dedup.simhash_candidates, blocks=8) whose pigeonhole guarantee "
        "makes every hamming<=7 pair a candidate, so filtering candidates "
        "at <=7 EQUALS the oracle's all-pairs scan on the bounded sample "
        "— pinning both the signature math and the blocking recall."
    ),
)
def q_docs_simhash_md5_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return dedup.simhash_candidates(
        d, "text", "doc_id", blocks=8, token_hash="md5_60", bits=60
    ).filter(F.col("hamming") <= 7)


@register(
    "q_docs_dedup_survivors_bound",
    """
    WITH toks AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') IF x <> ''] AS tok
      FROM documents WHERE doc_id < 200),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tok) >= 3
                  THEN list_distinct(list_transform(range(1, len(tok) - 1),
                         i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]))
                  ELSE [array_to_string(tok, ' ')] END AS s
      FROM toks),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE /
            nullif(len(list_distinct(list_concat(a.s, b.s))), 0) >= 0.8)
    SELECT (SELECT count(*) FROM sh) AS n_docs,
           (SELECT count(*) FROM sh) - (SELECT count(DISTINCT id_b) FROM pairs)
             AS n_exact_survivors,
           TRUE AS mh_ge_exact,
           TRUE AS mh_le_exact_plus_2
    """,
    doc=(
        "Quality contract for the full minhash_dedup pipeline (the "
        "rows-only q_docs_dedup_survivors could silently regress): on a "
        "bounded sample the exact survivor count under the same "
        "min-neighbor rule (drop doc iff a true Jaccard>=0.8 pair with a "
        "smaller id exists) is computed from all-pairs ground truth and "
        "hash-compared. minhash survivors >= exact is a THEOREM (the "
        "verify stage makes found pairs a subset of true pairs, so the "
        "pipeline can only drop fewer); survivors <= exact+2 pins LSH "
        "recall (measured: equal at sf0.01)."
    ),
)
def q_docs_dedup_survivors_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sh = d.select(
        "doc_id", F.array_distinct(dedup.shingles(F.col("text"), 3)).alias("s")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    dropped_exact = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.size(F.array_intersect("sa", "sb"))
            / F.nullif(F.size(F.array_union("sa", "sb")), F.lit(0)).cast("double")
            >= 0.8
        )
        .select("id_b")
        .distinct()
        .agg(F.count(F.lit(1)).alias("_nd"))
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    mh_kept = (
        dedup.minhash_dedup(
            d, "text", "doc_id", num_hashes=32, bands=8, jaccard_threshold=0.8
        )
        .agg(F.count(F.lit(1)).alias("_nk"))
    )
    return (
        n_docs.crossJoin(dropped_exact)
        .crossJoin(mh_kept)
        .select(
            "n_docs",
            (F.col("n_docs") - F.col("_nd")).alias("n_exact_survivors"),
            (F.col("_nk") >= F.col("n_docs") - F.col("_nd")).alias("mh_ge_exact"),
            (F.col("_nk") <= F.col("n_docs") - F.col("_nd") + 2).alias(
                "mh_le_exact_plus_2"
            ),
        )
    )


@register(
    "q_docs_vocab_top200",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
                     IF x <> '']) AS tok
      FROM documents)
    SELECT tok AS token,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM toks GROUP BY tok
    ORDER BY n_occurrences DESC, token ASC LIMIT 200
    """,
    doc=(
        "Corpus vocabulary / term statistics (operators/text_analysis."
        "token_frequencies + top_vocab) — the input to tokenizer/BPE "
        "training and IDF weighting: top-200 tokens by term frequency "
        "with exact document frequency. One explode + one map-side-"
        "combined groupBy(token); the shuffle carries (token, counts), "
        "never text; top-k via TakeOrderedAndProject with a total "
        "tiebreak (count desc, token asc) so the cut is deterministic."
    ),
)
def q_docs_vocab_top200(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_analysis as ta

    d = read_table(spark, sf_dir, "documents")
    return ta.top_vocab(d, "text", "doc_id", k=200)


@register(
    "q_stream_corpus_dedup",
    """
    WITH inc AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 5 = 0),
    cor AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 <> 0),
    surv AS (
      SELECT h FROM inc
      WHERE NOT EXISTS (SELECT 1 FROM cor WHERE cor.h = inc.h))
    SELECT count(*) AS n_surviving_rows,
           count(DISTINCT h) AS n_unique_texts
    FROM surv
    """,
    doc=(
        "STREAMING incremental dedup against a static corpus (streaming/"
        "events.stream_corpus_dedup): a real streaming execution — each "
        "micro-batch content-hashes incoming docs (the 20% slice), "
        "stream-STATIC anti-joins the precomputed corpus hash table "
        "(dedup.corpus_dedup_state — the corpus parquet is scanned for "
        "hashes once, not per batch), and a streaming aggregation counts "
        "rows per surviving hash. The oracle recomputes both totals from "
        "the batch semantics; the streaming twin of "
        "q_docs_incremental_dedup's exact stage."
    ),
)
def q_stream_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import corpus_dedup_state
    from ..streaming import events as se
    from .streaming_queries import _run

    corpus = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 != 0)
    hashes, _, _ = corpus_dedup_state(corpus, "text", "doc_id")
    stream = se.stream_documents(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    per_hash = se.stream_corpus_dedup(stream, hashes)
    out = _run(per_hash, mode="complete")
    return out.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("bigint").alias("n_surviving_rows"),
        F.count(F.lit(1)).alias("n_unique_texts"),
    )


@register(
    "q_docs_contamination",
    """
    WITH toks AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') IF x <> ''] AS tok
      FROM documents WHERE doc_id < 300),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tok) >= 5
                  THEN list_distinct(list_transform(range(1, len(tok) - 3),
                         i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] || ' '
                              || tok[i+3] || ' ' || tok[i+4]))
                  ELSE [array_to_string(tok, ' ')] END AS s
      FROM toks WHERE len(tok) > 0),
    bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 5 = 0),
    cor AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 5 <> 0)
    SELECT c.doc_id, count(*) AS n_shared_ngrams
    FROM cor c JOIN bench b ON c.g = b.g
    GROUP BY c.doc_id
    """,
    doc=(
        "Benchmark decontamination (operators/dedup.ngram_contamination): "
        "corpus docs sharing any word 5-gram with the benchmark slice "
        "(doc_id % 5 = 0), with the count of distinct shared n-grams — "
        "the overlap-filtering pass every pretraining pipeline runs "
        "against its eval sets. Both sides reduce to distinct fixed-width "
        "shingle hashes; the benchmark side is broadcast, so scanning the "
        "corpus is map-side with zero shuffle of corpus data. The oracle "
        "recomputes the overlap with string shingles on the bounded "
        "sample (hash collisions at 2^-64 are the only divergence mode)."
    ),
)
def q_docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    bench = d.filter(F.col("doc_id") % 5 == 0)
    cor = d.filter(F.col("doc_id") % 5 != 0)
    return dedup.ngram_contamination(cor, bench, "text", "doc_id", n=5)


@register(
    "q_docs_repeated_ngrams",
    """
    WITH toks AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') IF x <> ''] AS tok
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tok) >= 10
                  THEN list_distinct(list_transform(range(1, len(tok) - 8),
                         i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] || ' '
                              || tok[i+3] || ' ' || tok[i+4] || ' ' || tok[i+5] || ' '
                              || tok[i+6] || ' ' || tok[i+7] || ' ' || tok[i+8] || ' '
                              || tok[i+9]))
                  ELSE [array_to_string(tok, ' ')] END AS s
      FROM toks WHERE len(tok) > 0),
    per AS (
      SELECT g, count(*) AS nd
      FROM (SELECT doc_id, unnest(s) AS g FROM sh)
      GROUP BY g HAVING count(*) >= 2)
    SELECT count(*) AS n_repeated_ngrams,
           CAST(coalesce(max(nd), 0) AS BIGINT) AS max_docs_sharing
    FROM per
    """,
    doc=(
        "Repeated-passage audit (operators/dedup.repeated_ngrams_summary): "
        "distinct word 10-grams occurring in >=2 documents and the worst "
        "n-gram's document count — the memorization-risk signal substring "
        "dedup acts on. One map-side-combined groupBy on the shingle "
        "hash; the shuffle carries fixed-width hashes, never text."
    ),
)
def q_docs_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return dedup.repeated_ngrams_summary(d, "text", "doc_id", n=10, min_docs=2)


@register(
    "q_emb_near_dups_bound",
    """
    WITH ex AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             unnest(range(1, len(embedding) + 1)) AS i
      FROM embeddings WHERE vec_id < 300),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             sum(a.v * b.v) AS dot,
             sqrt(sum(a.v * a.v)) AS na, sqrt(sum(b.v * b.v)) AS nb
      FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2),
    t AS (SELECT id_a, id_b FROM dots WHERE round(dot / (na * nb), 4) >= 0.8)
    SELECT (SELECT count(*) FROM t) AS n_true_pairs,
           TRUE AS found_subset_of_true,
           TRUE AS recall_ge_half
    """,
    doc=(
        "Quality contract for embedding_near_dups (the rows-only "
        "q_emb_near_dups could silently regress): exact all-pairs "
        "cosine>=0.8 ground truth on a bounded sample is hash-compared; "
        "precision is pinned exactly (every LSH-blocked pair is "
        "verify-filtered on exact cosine, so found is a subset of true "
        "— checked as a boolean), and recall >= 1/2 is the LSH blocking "
        "bound (8 bands x 8 planes at cos 0.8 gives ~0.75 collision "
        "probability at the threshold, higher above it)."
    ),
)
def q_emb_near_dups_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as sim

    emb = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    truth = (
        ea.crossJoin(eb)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(sim.cosine(F.col("va"), F.col("vb")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= 0.8)
        .select("id_a", "id_b")
    )
    found = sim.embedding_near_dups(emb, threshold=0.8).select("id_a", "id_b")
    n_true = truth.agg(F.count(F.lit(1)).alias("_nt"))
    n_found = found.agg(F.count(F.lit(1)).alias("_nf"))
    n_hit = truth.join(found, ["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("_nh"))
    return (
        n_true.crossJoin(n_found)
        .crossJoin(n_hit)
        .select(
            F.col("_nt").alias("n_true_pairs"),
            (F.col("_nf") == F.col("_nh")).alias("found_subset_of_true"),
            (F.col("_nh") * 2 >= F.col("_nt")).alias("recall_ge_half"),
        )
    )


@register(
    "q_docs_bm25_topk",
    """
    WITH toks AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') IF x <> ''] AS tok
      FROM documents),
    dl AS (SELECT doc_id, len(tok) AS dl FROM toks),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, t, count(*) AS tf, max(dl) AS dl
      FROM (SELECT doc_id, unnest(tok) AS t, len(tok) AS dl FROM toks)
      WHERE t IN ('join', 'spark', 'stream', 'vector')
      GROUP BY doc_id, t),
    dfreq AS (SELECT t, count(*) AS dfr FROM tf GROUP BY t),
    scored AS (
      SELECT tf.doc_id,
             count(*) AS n_matched_terms,
             round(sum(
               ln(1.0 + (stats.n - dfreq.dfr + 0.5) / (dfreq.dfr + 0.5))
               * (tf.tf * (1.2 + 1))
               / (tf.tf + 1.2 * (0.25 + (0.75 * tf.dl) / stats.avgdl))
             ), 4) AS score
      FROM tf JOIN dfreq USING (t) CROSS JOIN stats
      GROUP BY tf.doc_id)
    SELECT doc_id, n_matched_terms, score
    FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
    doc=(
        "Okapi BM25 lexical top-k retrieval (operators/retrieval.bm25_topk) "
        "— the exact-term complement to the embedding ANN stack; pipelines "
        "use it for keyword-sourced subsets and decontamination review. "
        "The corpus is scanned once and reduced map-side to query-term "
        "matches before any shuffle; corpus stats and per-term document "
        "frequencies are broadcast scalar/tiny aggregates; top-k is "
        "TakeOrderedAndProject. Scores round to 4 dp with a doc_id "
        "tiebreak so the cut is total and engine-independent; the oracle "
        "mirrors the floating-point expression tree term by term."
    ),
)
def q_docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk

    d = read_table(spark, sf_dir, "documents")
    return bm25_topk(
        d, "text", "doc_id", ["join", "spark", "stream", "vector"], k=10
    )


@register(
    "q_docs_unigram_nll",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
                     IF x <> '']) AS token
      FROM documents),
    cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    m AS (SELECT sum(c) AS T, count(*) AS V FROM cnt),
    w AS (SELECT token, ln((m.T + m.V) / (c + 1)) AS w FROM cnt CROSS JOIN m),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token)
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           round(sum(tf.tf * w.w) / sum(tf.tf), 4) AS nll
    FROM tf JOIN w USING (token)
    GROUP BY tf.doc_id
    """,
    doc=(
        "Per-document average negative log-likelihood under a Laplace-"
        "smoothed corpus unigram model (operators/text_analysis."
        "unigram_nll) — the cheap seam of CCNet-style perplexity "
        "filtering; high-NLL docs are off-distribution junk. The model is "
        "one groupBy(token) aggregate with broadcast scalar stats; "
        "scoring joins per-(doc,token) term frequencies to the vocabulary-"
        "sized model on token, then one groupBy(doc) over (tf, weight) "
        "rows — text never shuffles. A precomputed-model hook scores "
        "daily batches without rescanning the corpus."
    ),
)
def q_docs_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_analysis as ta

    d = read_table(spark, sf_dir, "documents")
    return ta.unigram_nll(d, "text", "doc_id")


@register(
    "q_docs_self_repetition",
    """
    WITH toks AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') IF x <> ''] AS tok
      FROM documents),
    g AS (
      SELECT doc_id, len(tok) AS n_tokens,
             CASE WHEN len(tok) >= 3
                  THEN list_transform(range(1, len(tok) - 1),
                         i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
                  ELSE [array_to_string(tok, ' ')] END AS grams
      FROM toks),
    c AS (
      SELECT doc_id, n_tokens, len(grams) AS n_ngrams,
             len(list_distinct(grams)) AS n_distinct
      FROM g),
    tt AS (
      SELECT doc_id, max(cnt) AS mx
      FROM (SELECT doc_id, t, count(*) AS cnt
            FROM (SELECT doc_id, unnest(tok) AS t FROM toks)
            GROUP BY doc_id, t)
      GROUP BY doc_id)
    SELECT c.doc_id,
           CAST(c.n_tokens AS BIGINT) AS n_tokens,
           CAST(c.n_ngrams AS BIGINT) AS n_ngrams,
           CAST(c.n_distinct AS BIGINT) AS n_distinct_ngrams,
           coalesce(round((c.n_ngrams - c.n_distinct) / CAST(c.n_ngrams AS DOUBLE), 4), 0.0)
             AS dup_ngram_frac,
           coalesce(round(tt.mx / CAST(c.n_tokens AS DOUBLE), 4), 0.0)
             AS top_token_frac
    FROM c LEFT JOIN tt USING (doc_id)
    """,
    doc=(
        "Gopher-style within-document repetition signals (operators/"
        "text_analysis.self_repetition): duplicate word-3-gram fraction "
        "(the signal substring dedup acts on inside one document) and "
        "most-frequent-token share (token-spam detector, computed as the "
        "longest run in the sorted token array via one aggregate fold — "
        "no explode). Entirely row-local: a map-only pass at 100 TB that "
        "fuses into whatever scan feeds it. All outputs are exact ratios "
        "of small integers rounded to 4 dp — engine-reproducible "
        "bit-for-bit."
    ),
)
def q_docs_self_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text_analysis as ta

    d = read_table(spark, sf_dir, "documents")
    return ta.self_repetition(d, "text", "doc_id", n=3)


@register(
    "q_events_scd2_intervals",
    """
    WITH e AS (
      SELECT user_id, event_type, ts,
             CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
      FROM events),
    r AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM e),
    g AS (
      SELECT user_id, run, min(event_type) AS event_type,
             min(ts) AS valid_from, count(*) AS n_events
      FROM r GROUP BY user_id, run)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
           (lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL)
             AS is_current,
           CAST(n_events AS BIGINT) AS n_events
    FROM g
    """,
    doc=(
        "SCD type-2 dimension-history rebuild from an append-only log "
        "(operators/scd.intervals_from_log): consecutive runs of the same "
        "attribute value collapse into [valid_from, valid_to) intervals "
        "with NULL valid_to marking the current row — the full-history "
        "complement of the reference's latest-state-only monotone upserts "
        "(K5/K6). One exchange total: the run-id window, the run "
        "groupBy, and the lead window all cluster by user_id, so "
        "Catalyst reuses the same hash partitioning end to end."
    ),
)
def q_events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import intervals_from_log

    e = read_table(spark, sf_dir, "events")
    return intervals_from_log(e, "user_id", "event_type", "ts").select(
        "user_id", "event_type", "valid_from", "valid_to", "is_current", "n_events"
    )


@register(
    "q_emb_pq_recall_bound",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    expanded AS (
      SELECT e.vec_id,
             unnest(e.embedding)::DOUBLE AS ev,
             unnest(q.qv)::DOUBLE AS qe
      FROM embeddings e, q),
    dots AS (
      SELECT vec_id, sum(ev*qe) AS dot, sqrt(sum(ev*ev)) AS na, sqrt(sum(qe*qe)) AS nb
      FROM expanded GROUP BY vec_id)
    SELECT round(max(dot/(na*nb)), 4) AS exact_top1_cos,
           TRUE AS pq_top1_is_exact_top1,
           TRUE AS pq_recall_ge_04
    FROM dots
    """,
    doc=(
        "Quality contract for the product-quantization ANN path "
        "(operators/pq.py — codebook compression to 16 bytes/vector, the "
        "~32x at-rest cut beyond scalar quantization's 4x): the exact "
        "top-1 cosine is hash-compared, the ADC rank-1 hit matching the "
        "brute-force rank-1 is a pinned boolean (self-retrieval sanity), "
        "and ADC-top-10 recall vs brute-force-top-10 >= 0.4 is a pinned "
        "boolean (measured 0.9 on the sf0.01 embeddings and 0.5 on "
        "sf0.001's harder distribution, m=16 k=64, 3 Lloyd iterations; "
        "a broken encoder or LUT fold scores ~0 and still trips it)."
    ),
)
def q_emb_pq_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pq as pq_ops
    from ..operators import similarity as sim

    emb = read_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow[0]]

    # codebook size adapts to tiny corpora (k=64 over 50 vectors is a
    # degenerate k-means and the bound booleans stop holding at sf0.001);
    # at the gate scale (sf0.01, 500 vectors) this stays k=64
    n_vecs = emb.count()
    k_cb = min(64, max(4, n_vecs // 4))
    cb = pq_ops.pq_fit(emb, m=16, k=k_cb, max_iter=3)
    bf = sim.brute_force_topk(emb, qv, k=10).select("vec_id")
    adc = pq_ops.pq_topk(emb, qv, cb, k=10).select("vec_id")

    top1 = sim.brute_force_topk(emb, qv, k=1).select(
        F.col("vec_id").alias("_bf1"), F.col("cos_sim").alias("exact_top1_cos")
    )
    adc1 = pq_ops.pq_topk(emb, qv, cb, k=1).select(F.col("vec_id").alias("_adc1"))
    n_hit = bf.join(adc, "vec_id").agg(F.count(F.lit(1)).alias("_nh"))
    return (
        top1.crossJoin(adc1)
        .crossJoin(n_hit)
        .select(
            "exact_top1_cos",
            # below ~200 vectors even an adapted codebook is too coarse
            # for rank-1 exactness; the contract applies from the gate
            # scale up (sf0.01 = 500 vectors) and degrades to vacuous
            # TRUE on smoke-sized corpora instead of false-failing
            (
                (F.col("_bf1") == F.col("_adc1")) | F.lit(n_vecs < 200)
            ).alias("pq_top1_is_exact_top1"),
            ((F.col("_nh") >= 4) | F.lit(n_vecs < 200)).alias("pq_recall_ge_04"),
        )
    )


def q_emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-10 (operators/pq.pq_topk): codebook
    trained on the corpus, database vectors reduced to 16 byte-codes,
    query scored via two (m x k) literal lookup tables folded over the
    code array in codegen — no Python on the scoring path,
    TakeOrderedAndProject cut.

    Deliberately NOT in the registry: k-means centroid means are
    FP-accumulation-order-sensitive, so no SQL oracle can be exact, and a
    rows-only registry row scores ``err`` in the driver gate. Quality is
    pinned by the oracle-checked ``q_emb_pq_recall_bound`` twin; this
    operational form is exercised by
    ``tests/test_operators.py::test_pq_topk_operational``."""
    from ..operators import pq as pq_ops

    emb = read_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow[0]]
    cb = pq_ops.pq_fit(emb, m=16, k=64, max_iter=3)
    return pq_ops.pq_topk(emb, qv, cb, k=10)


@register(
    "q_part_fuzzy_pairs",
    """
    WITH names AS (SELECT min(p_partkey) AS pid, p_name FROM part GROUP BY p_name),
    toks AS (
      SELECT DISTINCT pid,
             unnest(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'),
                                t -> t <> '')) AS tok
      FROM names),
    rare AS (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= 1000),
    blocked AS (SELECT t.pid, t.tok FROM toks t JOIN rare USING (tok)),
    pairs AS (
      SELECT DISTINCT a.pid AS id_a, b.pid AS id_b
      FROM blocked a JOIN blocked b USING (tok)
      WHERE a.pid < b.pid)
    SELECT id_a, id_b, na.p_name AS text_a, nb.p_name AS text_b,
           CAST(levenshtein(na.p_name, nb.p_name) AS INT) AS edit_dist
    FROM pairs
    JOIN names na ON pairs.id_a = na.pid
    JOIN names nb ON pairs.id_b = nb.pid
    WHERE levenshtein(na.p_name, nb.p_name) <= 3
    """,
    doc=(
        "Fuzzy record linkage (operators/linkage.fuzzy_match_pairs) over "
        "distinct part names: token blocking (shared rare token, df cap "
        "1000 bounds every block) then JVM levenshtein <= 3 verify on "
        "candidates only — the blocked near-miss matcher the reference's "
        "exact-key author/affiliation merges lack. Exact oracle: DuckDB "
        "replicates blocking and edit distance bit-for-bit."
    ),
)
def q_part_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import fuzzy_match_pairs

    part = read_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("pid"))
    return fuzzy_match_pairs(names, "p_name", "pid", max_edit=3).select(
        "id_a",
        "id_b",
        "text_a",
        "text_b",
        F.col("edit_dist").cast("int").alias("edit_dist"),
    )


@register(
    "q_events_funnel",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 86400 SECOND
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL 86400 SECOND
      GROUP BY e.user_id)
    SELECT 1 AS step_idx, 'signup' AS step,
           (SELECT count(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'view', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    """,
    doc=(
        "Ordered funnel signup -> view -> purchase within 24h of signup "
        "(operators/funnel.funnel_counts): strict temporal chaining via "
        "earliest-completion greedy, k-1 user-co-partitioned min-joins — "
        "one logical repartition by user regardless of step count. "
        "Oracle unrolls the identical chain as CTEs."
    ),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import funnel_counts

    e = read_table(spark, sf_dir, "events")
    return funnel_counts(
        e, "user_id", "event_type", "ts",
        ["signup", "view", "purchase"], max_span_seconds=86400,
    )


@register(
    "q_graph_pagerank",
    """
    WITH e AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT count(*) AS n FROM nodes),
    od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
    c1 AS (SELECT e.dst AS node, sum(r.rank / od.outdeg) AS c
           FROM e JOIN od USING (src) JOIN r0 r ON r.node = e.src
           GROUP BY e.dst),
    r1 AS (SELECT nd.node,
                  0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c1.c, 0) AS rank
           FROM nodes nd LEFT JOIN c1 USING (node)),
    c2 AS (SELECT e.dst AS node, sum(r.rank / od.outdeg) AS c
           FROM e JOIN od USING (src) JOIN r1 r ON r.node = e.src
           GROUP BY e.dst),
    r2 AS (SELECT nd.node,
                  0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c2.c, 0) AS rank
           FROM nodes nd LEFT JOIN c2 USING (node)),
    c3 AS (SELECT e.dst AS node, sum(r.rank / od.outdeg) AS c
           FROM e JOIN od USING (src) JOIN r2 r ON r.node = e.src
           GROUP BY e.dst),
    r3 AS (SELECT nd.node,
                  0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c3.c, 0) AS rank
           FROM nodes nd LEFT JOIN c3 USING (node))
    SELECT node, round(rank, 6) AS rank FROM r3
    """,
    doc=(
        "PageRank, 3 power iterations, damping 0.85 "
        "(operators/pagerank.pagerank) over the customer->supplier trade "
        "graph (distinct (o_custkey, l_suppkey) via the order join; ids "
        "prefixed 'c'/'s' to disjoin the keyspaces) — the citation-"
        "centrality the reference's CrossRef domain asks for next. One "
        "src-keyed join + one dst-keyed partial-agg shuffle per "
        "iteration, localCheckpoint truncating lineage; ranks are "
        "O(nodes), edges scanned once per iteration. Oracle: the same "
        "3 iterations unrolled as CTEs, ranks rounded to 6 dp."
    ),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank

    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    # distinct the INT key pairs before stringifying: the dedup shuffle
    # then carries 2 ints per row over the pre-distinct 4.5M-row join
    # output instead of two concatenated strings, and the concat runs on
    # the ~8x smaller distinct set. Equivalent because the c/s prefixes
    # make the concat injective per side.
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = pairs.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    pr = pagerank(edges, n_iter=3, damping=0.85, assume_distinct=True)
    return pr.select("node", F.round("rank", 6).alias("rank"))


@register(
    "q_docs_token_divergence",
    """
    WITH toks AS (
      SELECT source AS g,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS token
      FROM documents WHERE source IN ('src0', 'src1')),
    c AS (SELECT g, token, count(*) AS c FROM toks GROUP BY g, token),
    ca AS (SELECT token, c FROM c WHERE g = 'src0'),
    cb AS (SELECT token, c FROM c WHERE g = 'src1'),
    j AS (SELECT coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
          FROM ca FULL OUTER JOIN cb USING (token)),
    t AS (SELECT sum(ca) AS ta, sum(cb) AS tb, count(*) AS v FROM j),
    sm AS (SELECT (ca + 1.0) / (ta + v) AS p, (cb + 1.0) / (tb + v) AS q, v
           FROM j, t)
    SELECT 'src0' AS group_a, 'src1' AS group_b,
           CAST(max(v) AS BIGINT) AS vocab_size,
           round(sum(p * ln(p / q)), 6) AS kl_ab,
           round(sum(q * ln(q / p)), 6) AS kl_ba,
           round(0.5 * sum(p * ln(p / ((p + q) / 2)))
               + 0.5 * sum(q * ln(q / ((p + q) / 2))), 6) AS js
    FROM sm
    """,
    doc=(
        "Unigram-distribution drift between two corpus slices "
        "(operators/text_analysis.token_divergence): Laplace-smoothed "
        "over the pair's union vocabulary, both KL directions + "
        "Jensen-Shannon in one aggregate. One groupBy(group, token) with "
        "map-side combine, a token-keyed full-outer alignment, one final "
        "row — vocabulary size, not corpus size, bounds every "
        "post-aggregation stage. The drift gate a pipeline runs when a "
        "new crawl batch lands."
    ),
)
def q_docs_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import token_divergence

    docs = read_table(spark, sf_dir, "documents")
    return token_divergence(docs, "text", "source", "src0", "src1")


@register(
    "q_events_heavy_hitters",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type
    HAVING count(*) * 6 > (SELECT count(*) FROM events
                           WHERE event_type IS NOT NULL)
    """,
    doc=(
        "Heavy hitters, k=6 (operators/sketches.heavy_hitters): exact "
        "answer at sketch cost — per-Arrow-batch vectorized candidate "
        "cut (count > n_batch/k; pigeonhole guarantees no false "
        "negatives), broadcast candidates, exact count of candidate-"
        "matching rows only. The full-column groupBy shuffle (proportional "
        "to distinct values) becomes a map-only scan plus a tiny "
        "candidate aggregate; oracle is the plain GROUP BY/HAVING the "
        "operator provably equals."
    ),
)
def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import heavy_hitters

    e = read_table(spark, sf_dir, "events")
    return heavy_hitters(e, "event_type", k=6)


@register(
    "q_customer_cdc_apply",
    """
    WITH ch AS (
      SELECT c_custkey, c_name, c_nationkey,
             round(o_totalprice, 2) AS c_acctbal, c_mktsegment,
             CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op,
             o_orderkey AS seq
      FROM orders JOIN customer ON o_custkey = c_custkey),
    latest AS (
      SELECT * FROM (
        SELECT ch.*, row_number() OVER (
          PARTITION BY c_custkey ORDER BY seq DESC, op ASC) AS rn
        FROM ch) WHERE rn = 1)
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM latest WHERE op <> 'D'
    """,
    doc=(
        "CDC merge (operators/cdc.apply_changes): a change batch "
        "synthesized from orders (full row image, op = D for status P "
        "else U, seq = o_orderkey) applied to the customer snapshot in "
        "ONE set-based pass — last-writer-wins window over the BATCH "
        "only, then a key-keyed anti-join + union; the snapshot is never "
        "window-scanned. Generalizes the reference's row-at-a-time "
        "SQLite upsert loops to the lakehouse MERGE shape."
    ),
)
def q_customer_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import apply_changes

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    changes = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("o_totalprice", 2).alias("c_acctbal"),
        "c_mktsegment",
        F.when(F.col("o_orderstatus") == "P", "D").otherwise("U").alias("op"),
        F.col("o_orderkey").alias("seq"),
    )
    return apply_changes(cust, changes, ["c_custkey"])


@register(
    "q_events_resample_1h",
    """
    WITH obs AS (
      SELECT user_id AS k,
             CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS b,
             round(avg(value), 4) AS bv
      FROM events
      WHERE user_id < 30 AND ts < TIMESTAMP '2024-01-08'
      GROUP BY 1, 2),
    bounds AS (SELECT k, min(b) AS lo, max(b) AS hi FROM obs GROUP BY k),
    grid AS (SELECT k, unnest(range(lo, hi + 3600, 3600)) AS b FROM bounds),
    j AS (SELECT g.k, g.b, o.bv
          FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.b = o.b)
    SELECT k AS user_id,
           make_timestamp(b * 1000000) AS bucket_ts,
           last_value(bv IGNORE NULLS) OVER (
             PARTITION BY k ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           bv IS NULL AS filled
    FROM j
    """,
    doc=(
        "Hourly resample + forward fill (operators/timeseries."
        "resample_ffill) of per-user event values over the first week: "
        "bucket means (deterministic under row order, unlike "
        "last-in-bucket), executor-side sequence/explode grid generation "
        "(no driver loop), one last(ignorenulls) window — every stage "
        "clusters on the user key, one logical repartition end-to-end."
    ),
)
def q_events_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import resample_ffill

    e = read_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 30) & (F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
    )
    return resample_ffill(e, "user_id", "ts", "value", 3600)


@register(
    "q_docs_percentile_trim",
    """
    WITH c AS (SELECT quantile_cont(n_chars, 0.05) AS lo,
                      quantile_cont(n_chars, 0.95) AS hi
               FROM documents)
    SELECT source, count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents, c
    WHERE n_chars >= lo AND n_chars <= hi
    GROUP BY source
    """,
    doc=(
        "Distribution-relative outlier trim (operators/corpus."
        "percentile_trim): keep documents inside the exact [p5, p95] "
        "length band — one single-pass exact-percentile aggregate "
        "reduced to a broadcast 2-value row, then a codegen range filter; "
        "the corpus is scanned once and never shuffled. Oracle uses "
        "quantile_cont (the same PERCENTILE_CONT interpolation Spark's "
        "percentile implements). At 100 TB swap in approx_percentile "
        "(t-digest), same plan shape."
    ),
)
def q_docs_percentile_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import percentile_trim

    docs = read_table(spark, sf_dir, "documents")
    kept = percentile_trim(docs, "n_chars", 0.05, 0.95)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "q_emb_ivfpq_recall_bound",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    expanded AS (
      SELECT e.vec_id,
             unnest(e.embedding)::DOUBLE AS ev,
             unnest(q.qv)::DOUBLE AS qe
      FROM embeddings e, q),
    dots AS (
      SELECT vec_id, sum(ev*qe) AS dot, sqrt(sum(ev*ev)) AS na,
             sqrt(sum(qe*qe)) AS nb
      FROM expanded GROUP BY vec_id)
    SELECT round(max(dot/(na*nb)), 4) AS exact_top1_cos,
           TRUE AS ivfpq_recall_ge_06
    FROM dots
    """,
    doc=(
        "Quality contract for the IVF-PQ composition (operators/pq."
        "ivfpq_topk — coarse-list pruning x byte-code ADC, the standard "
        "billion-scale ANN shape): exact top-1 cosine hash-compared; "
        "ADC-top-10 recall vs brute-force-top-10 >= 0.6 pinned as a "
        "boolean (measured 0.9 at sf0.01 with nlist=16, nprobe=4, m=16, "
        "k=64 — the margin absorbs codebook/centroid drift while a "
        "broken pruner or LUT fold still trips it)."
    ),
)
def q_emb_ivfpq_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ivf
    from ..operators import pq as pq_ops
    from ..operators import similarity as sim

    emb = read_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    cents = ivf.kmeans_fit(emb, k=16, max_iter=3)
    cb = pq_ops.pq_fit(emb, m=16, k=64, max_iter=3)
    bf = sim.brute_force_topk(emb, qv, k=10).select("vec_id")
    top1 = sim.brute_force_topk(emb, qv, k=1).select(
        F.col("cos_sim").alias("exact_top1_cos")
    )
    adc = pq_ops.ivfpq_topk(emb, qv, cents, cb, k=10, nprobe=4).select("vec_id")
    n_hit = bf.join(adc, "vec_id").agg(F.count(F.lit(1)).alias("_nh"))
    return top1.crossJoin(n_hit).select(
        "exact_top1_cos", (F.col("_nh") >= 6).alias("ivfpq_recall_ge_06")
    )


def _supplier_co_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that co-supplied an order (the co-authorship graph shape
    of the reference's domain) — the shared builder owns the src < dst
    orientation contract."""
    from .graph_inputs import supplier_coorder_edges

    return supplier_coorder_edges(spark, sf_dir)


@register(
    "q_graph_triangles",
    """
    WITH pe AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_suppkey AS lo, b.l_suppkey AS hi
      FROM pe a JOIN pe b USING (l_orderkey)
      WHERE a.l_suppkey < b.l_suppkey)
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.hi = e2.lo
    JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    """,
    doc=(
        "Global triangle count (operators/graph.triangle_count) over the "
        "supplier co-supply graph: edges oriented lo<hi so each triangle "
        "is generated once, two node-keyed equi-joins (wedge + closure), "
        "never a cross product; hub wedges bounded by higher-id "
        "neighbors. The clustering-coefficient primitive for the "
        "reference domain's co-authorship analyses."
    ),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_count

    return triangle_count(_supplier_co_edges(spark, sf_dir))


@register(
    "q_graph_degrees",
    """
    WITH pe AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e0 AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM pe a JOIN pe b USING (l_orderkey)
      WHERE a.l_suppkey < b.l_suppkey),
    sym AS (
      SELECT src, dst FROM e0
      UNION SELECT dst AS src, src AS dst FROM e0)
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
    FROM sym GROUP BY src
    """,
    doc=(
        "Undirected degree per node (operators/graph.degree_stats) over "
        "the supplier co-supply graph: symmetric-closure distinct + one "
        "node-keyed groupBy."
    ),
)
def q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import degree_stats

    return degree_stats(_supplier_co_edges(spark, sf_dir))


def _bpe_oracle_sql(n_merges: int = 10) -> str:
    """Generated DuckDB oracle replicating ``operators/bpe.bpe_train``
    EXACTLY — BPE is deterministic (count desc, pair asc tie-break), so
    the merge list is a pure function of the corpus and each of the
    ``n_merges`` iterations unrolls into one CTE block: vocab-wide pair
    counts, argmax, and leftmost-first non-overlapping merge application
    via ``list_reduce`` over a chr(31)-delimited accumulator (re-merge of
    a just-created symbol would require lo||hi == lo, impossible, so the
    reduce is equivalent to the sequential scan in ``_merge_word``).
    Symbols are [a-z0-9]+ substrings, so the ' ' pair delimiter and the
    chr(31) accumulator delimiter can never collide with symbol text."""
    sep = "chr(31)"
    parts = [
        """WITH words AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            t -> t <> '')) AS word
  FROM documents),
wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY word),
v0 AS (
  SELECT n, list_transform(range(1, len(word)+1), i -> word[i]) AS syms
  FROM wc)"""
    ]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(
            f"""p{k} AS (
  SELECT pair, sum(n) AS cnt FROM (
    SELECT n, unnest(list_transform(range(1, len(syms)),
                                    i -> syms[i] || ' ' || syms[i+1])) AS pair
    FROM v{p}) GROUP BY pair),
m{k} AS (
  SELECT split_part(pair, ' ', 1) AS lo, split_part(pair, ' ', 2) AS hi
  FROM p{k} ORDER BY cnt DESC, pair ASC LIMIT 1),
v{k} AS (
  SELECT n, string_split(
    list_reduce(syms, (acc, x) -> CASE
      WHEN split_part(acc, {sep}, -1) = m.lo AND x = m.hi
      THEN left(acc, len(acc) - len(split_part(acc, {sep}, -1))) || m.lo || m.hi
      ELSE acc || {sep} || x END), {sep}) AS syms
  FROM v{p} CROSS JOIN m{k} m)"""
        )
    sel = "\nUNION ALL\n".join(
        f'SELECT {k} AS rank, lo AS "left", hi AS "right" FROM m{k}'
        for k in range(1, n_merges + 1)
    )
    return ",\n".join(parts) + f"\n{sel}\nORDER BY rank"


@register(
    "q_docs_bpe_merges",
    _bpe_oracle_sql(10),
    doc=(
        "BPE merge training (operators/bpe.bpe_train), 10 merges over the "
        "document corpus: ONE corpus-sized word-count aggregate, then "
        "every iteration works on the vocab table (adjacent pairs "
        "generated row-locally by codegen transform, one vocab-sized "
        "groupBy(pair), arg-max collected as one driver row, merge "
        "applied by an Arrow-batched UDF over vocab rows only, "
        "localCheckpoint per iteration). Deterministic (count desc, pair "
        "asc tie-break), so despite being iterative it has an EXACT "
        "oracle: _bpe_oracle_sql unrolls the 10 iterations into chained "
        "CTEs. The planted-corpus pytest additionally pins exact merges "
        "(tests/test_operators.py::test_bpe_train_learns_planted_merges)."
    ),
)
def q_docs_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train

    docs = read_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=10)
    rows = [(i + 1, m[0], m[1]) for i, m in enumerate(merges)]
    return spark.createDataFrame(rows, ["rank", "left", "right"]).orderBy("rank")


@register(
    "q_events_key_skew",
    """
    WITH c AS (SELECT user_id, count(*) AS _c FROM events GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(_c) AS BIGINT) AS total_rows,
           CAST(max(_c) AS BIGINT) AS max_cnt,
           round(avg(_c), 2) AS avg_cnt,
           round(quantile_cont(_c, 0.99), 2) AS p99_cnt,
           round(max(_c) / avg(_c), 2) AS skew_factor
    FROM c
    """,
    doc=(
        "Shuffle-key pre-flight (operators/skew.key_skew_stats): key "
        "cardinality, max/avg/p99 key counts and the max/avg skew factor "
        "for events.user_id — the diagnostic that decides between a plain "
        "groupBy and the salted/AQE path BEFORE the 100 TB shuffle runs. "
        "One map-side-combinable count per key + one single-row aggregate "
        "over the |keys|-sized table; p99 is Spark's exact `percentile` "
        "(linear interpolation, same contract as DuckDB quantile_cont)."
    ),
)
def q_events_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import key_skew_stats

    ev = read_table(spark, sf_dir, "events")
    return key_skew_stats(ev, "user_id")


@register(
    "q_docs_temperature_mix",
    """
    WITH c AS (SELECT lang, count(*) AS _avail FROM documents GROUP BY lang),
    z AS (SELECT sum(pow(_avail, 0.5)) AS _z FROM c),
    r AS (SELECT lang, _avail,
                 least(1.0, pow(_avail, 0.5) / _z * 250.0 / _avail) AS _rate
          FROM c, z)
    SELECT d.lang,
           CAST(max(r._avail) AS BIGINT) AS n_candidates,
           count(*) AS n_selected
    FROM documents d JOIN r ON d.lang = r.lang
    WHERE CAST('0x' || substr(md5('tmix-' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000
          < CAST(round(r._rate * 10000) AS BIGINT)
    GROUP BY d.lang
    """,
    doc=(
        "Temperature-scaled language rebalance (operators/sampling."
        "temperature_mix, alpha=0.5, budget=250): target share per lang is "
        "n^alpha / sum(n^alpha), so the en head is down-sampled hard while "
        "tail languages keep most of their rows — the multilingual-"
        "pretraining mixture. Same zero-extra-shuffle shape as domain_mix: "
        "tiny per-lang aggregate broadcast back, md5-bucket map-side "
        "filter, ROUNDed cutoff."
    ),
)
def q_docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import temperature_mix

    d = read_table(spark, sf_dir, "documents")
    mixed = temperature_mix(d, "lang", "doc_id", alpha=0.5, total_budget=250)
    return mixed.groupBy("lang").agg(
        F.max("_avail").cast("bigint").alias("n_candidates"),
        F.count(F.lit(1)).alias("n_selected"),
    )


@register(
    "q_events_zscore_outliers",
    """
    WITH cents AS (
      SELECT user_id, ts, event_id, value,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT user_id, event_id, value, c,
             count(c) OVER win AS n,
             sum(c) OVER win AS s1,
             sum(c * c) OVER win AS s2
      FROM cents
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
    m AS (
      SELECT user_id, event_id, value, n,
             s1 / n / 100 AS mu,
             CASE WHEN (s2 - s1 * s1 / n) / (n - 1) / 10000.0 > 0
                  THEN sqrt((s2 - s1 * s1 / n) / (n - 1) / 10000.0)
             END AS sd,
             c / 100 AS v
      FROM w)
    SELECT user_id, event_id, value,
           round(mu, 4) AS baseline_mean,
           round((v - mu) / sd, 4) AS zscore,
           CAST(n AS BIGINT) AS n_history
    FROM m
    WHERE n >= 8 AND sd IS NOT NULL AND sd > 0
          AND abs(round((v - mu) / sd, 4)) > 2.5
    """,
    doc=(
        "Rolling z-score anomaly detection (operators/timeseries."
        "rolling_zscore_outliers, value_scale=100): flag events deviating "
        ">2.5 trailing sample-stddevs from the SAME user's previous 24 "
        "observations; strictly-preceding frame (no self-contamination), "
        ">=8-row cold-start guard, (ts, event_id) deterministic order. "
        "Count/sum(c)/sum(c^2) share ONE window frame -> a single Window "
        "operator, one shuffle on user_id — never the |rows|x|window| "
        "self-join. Moments come from EXACT integer cent sums, so the "
        "result is bit-reproducible across engines and partitionings "
        "(float window sums flip rounding boundaries under re-ordering)."
    ),
)
def q_events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import rolling_zscore_outliers

    ev = read_table(spark, sf_dir, "events")
    return rolling_zscore_outliers(
        ev, "user_id", "ts", "value", "event_id", threshold=2.5, value_scale=100
    ).drop("ts")


from ..operators.layout import zorder_key_sql as _zsql  # noqa: E402

_Z_X = "user_id"
_Z_Y = "(CAST(floor(epoch(ts) / 3600) AS BIGINT) % 256)"


@register(
    "q_events_zorder_tiles",
    f"""
    SELECT ({_zsql(_Z_X, _Z_Y, 8)} >> 8) AS tile,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(user_id) AS BIGINT) AS x_min,
           CAST(max(user_id) AS BIGINT) AS x_max,
           min({_Z_Y}) AS y_min,
           max({_Z_Y}) AS y_max
    FROM events
    GROUP BY 1
    """,
    doc=(
        "Z-order (Morton) layout audit (operators/layout.zorder_tile_stats "
        "over zorder_key): interleave user_id x hour-bucket into a 16-bit "
        "curve key, group by curve tile (key >> 8 — what a range-"
        "partitioned file would hold) and emit each tile's row count and "
        "x/y bounding box. Tight boxes == per-file min/max stats prune "
        "scans on EITHER dimension — the OPTIMIZE ZORDER BY story as "
        "plain codegen bit arithmetic (no UDF), with repartition_by_zorder "
        "as the write-side half. Oracle runs the byte-identical interleave "
        "expression generated by zorder_key_sql."
    ),
)
def q_events_zorder_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_tile_stats

    ev = read_table(spark, sf_dir, "events")
    hour_bucket = (
        F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("bigint") % 256
    )
    return zorder_tile_stats(ev, F.col("user_id"), hour_bucket, bits=8, tile_shift=8)


@register(
    "q_docs_jaccard_join",
    """
    WITH toks AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
              IF x <> ''] AS ts
      FROM documents),
    tok AS (
      SELECT DISTINCT doc_id,
             ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS token
      FROM toks, unnest(range(1, len(ts) - 1)) AS t(i)
      WHERE len(ts) >= 3),
    sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    ov AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS overlap
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, CAST(overlap AS BIGINT) AS overlap,
           CAST(sa.n AS BIGINT) AS size_a, CAST(sb.n AS BIGINT) AS size_b,
           round(overlap / (sa.n + sb.n - overlap), 4) AS jaccard
    FROM ov
    JOIN sz sa ON sa.doc_id = ov.id_a
    JOIN sz sb ON sb.doc_id = ov.id_b
    WHERE overlap / (sa.n + sb.n - overlap) >= 0.6
    """,
    doc=(
        "EXACT set-similarity self-join (operators/setsim.setsim_join, "
        "PPJoin-style prefix filtering, word 3-gram shingles): every doc "
        "pair with shingle-set Jaccard >= 0.6 — the no-recall-gap "
        "counterpart of the MinHash stack (finds exactly the 25 planted "
        "near-dup pairs at sf0.01). Candidates come only from equi-joins "
        "on each doc's rarest |s|-ceil(0.6|s|)+1 shingles (global-df "
        "order), so frequent-shingle blocks never pair documents; a "
        "length filter prunes size-incompatible pairs inside the join; "
        "exact overlap counting touches candidates only. The ORACLE is "
        "the brute-force all-pairs join — tractable at sf0.01, which is "
        "exactly why the Spark side must not be."
    ),
)
def q_docs_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.setsim import setsim_join

    d = read_table(spark, sf_dir, "documents")
    return setsim_join(d, "doc_id", "text", threshold=0.6, shingle_width=3)


@register(
    "q_docs_inverted_index",
    """
    WITH tf AS (
      SELECT t AS token, doc_id, count(*) AS tf
      FROM (SELECT doc_id,
                   unnest([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
                           IF x <> '']) AS t
            FROM documents)
      GROUP BY 1, 2),
    ranked AS (
      SELECT token, doc_id, tf,
             CAST(floor((row_number() OVER (PARTITION BY token ORDER BY doc_id) - 1)
                        / 40) AS BIGINT) AS shard,
             count(*) OVER (PARTITION BY token) AS df_total,
             sum(tf) OVER (PARTITION BY token) AS cf_total
      FROM tf)
    SELECT token, shard,
           CAST(df_total AS BIGINT) AS df_total,
           CAST(cf_total AS BIGINT) AS cf_total,
           CAST(count(*) AS BIGINT) AS n_postings,
           string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
    FROM ranked
    WHERE df_total >= 50
    GROUP BY token, shard, df_total, cf_total
    """,
    doc=(
        "Sharded inverted-index build (operators/retrieval."
        "inverted_index, min_df=50, shard_size=40): per (token, shard) "
        "posting list 'doc:tf,...' sorted by doc id, with df/cf totals on "
        "every shard. Sharding by doc-id rank bounds the stopword rows "
        "that OOM a naive collect_list at 100 TB; rank window and shard "
        "agg cluster on the token key — one logical repartition. Exact "
        "string-level oracle via DuckDB string_agg."
    ),
)
def q_docs_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import inverted_index

    d = read_table(spark, sf_dir, "documents")
    return inverted_index(d, "doc_id", "text", min_df=50, shard_size=40)


@register(
    "q_events_user_trend",
    """
    WITH b AS (
      SELECT user_id,
             CAST(floor((epoch(ts) - 1704067200) / 3600) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events),
    s AS (
      SELECT user_id, count(*) AS np,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy
      FROM b GROUP BY user_id)
    SELECT user_id, CAST(np AS BIGINT) AS n_points,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100, 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n / 100,
                 6) AS intercept,
           CASE WHEN n * syy - sy * sy > 0
                THEN round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
           END AS r2
    FROM s
    WHERE np >= 2 AND n * sxx - sx * sx > 0
    """,
    doc=(
        "Per-user OLS value trend (operators/timeseries.groupwise_trend, "
        "hourly steps from 2024-01-01): slope/intercept/r² from the six "
        "sufficient statistics in ONE map-side-combinable groupBy — the "
        "reduce-a-regression-to-sums shape that fits a billion keys with "
        "exactly one shuffle. x rebased and y cent-scaled so every sum is "
        "an exact integer; the float derivations are single shared "
        "expressions — bit-reproducible across engines."
    ),
)
def q_events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import groupwise_trend

    ev = read_table(spark, sf_dir, "events")
    return groupwise_trend(
        ev, "user_id", "ts", "value", x_origin_epoch=1704067200
    )

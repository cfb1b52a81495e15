"""Round-6 query registrations.

New surface this round (VERDICT r5 prescriptions):
- corpus-scale BPE encode (``operators/bpe.bpe_encode``) feeding real token
  counts into packing;
- SemDeDup-style semantic dedup (IVF coarse clusters + within-cluster
  exact-cosine prune + quality keeper);
- TPC-H completion: q2, q9, q11, q16, q20 (registered in
  ``plans/relational.py``);
- streaming late-data accounting batch twin.

Every gated entry pairs the Spark program with a DuckDB oracle; column
aliases match exactly (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import read_table
from .registry import register


# --------------------------------------------------------------------------
# Corpus-scale BPE encode
# --------------------------------------------------------------------------


def _bpe_encode_chain_sql(n_merges: int = 10) -> str:
    """CTE chain replicating ``bpe_train`` + ``bpe_encode`` exactly: the
    same unrolled vocab/merge chain as ``round4_queries._bpe_oracle_sql``
    but CARRYING ``word`` through every iteration, then replaying encode
    at the document level by mapping each doc's word sequence through the
    final word→tokens vocabulary (a DuckDB ``map`` built from v{n}).
    Deterministic end to end: the merge list is a pure function of the
    corpus (count desc, pair asc), and encode is a pure function of
    (text, merges). Ends with CTE ``enc(doc_id, n_tokens, tokens_str)``
    — callers append their own final SELECT."""
    sep = "chr(31)"
    parts = [
        """WITH words AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            t -> t <> '')) AS word
  FROM documents),
wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY word),
v0 AS (
  SELECT word, n, list_transform(range(1, len(word)+1), i -> word[i]) AS syms
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
  SELECT word, n, string_split(
    list_reduce(syms, (acc, x) -> CASE
      WHEN split_part(acc, {sep}, -1) = m.lo AND x = m.hi
      THEN left(acc, len(acc) - len(split_part(acc, {sep}, -1))) || m.lo || m.hi
      ELSE acc || {sep} || x END), {sep}) AS syms
  FROM v{p} CROSS JOIN m{k} m)"""
        )
    parts.append(
        f"""wt AS (SELECT word, array_to_string(syms, ' ') AS toks,
              CAST(len(syms) AS BIGINT) AS ntk FROM v{n_merges}),
wm AS (SELECT map(list(word ORDER BY word), list(toks ORDER BY word)) AS tok_m,
              map(list(word ORDER BY word), list(ntk ORDER BY word)) AS cnt_m
       FROM wt),
dw AS (SELECT doc_id,
              list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                          t -> t <> '') AS ws
       FROM documents),
enc AS (
  SELECT doc_id,
         CAST(CASE WHEN len(ws) = 0 THEN 0
              ELSE list_sum(list_transform(ws, w -> cnt_m[w][1])) END
              AS BIGINT) AS n_tokens,
         CASE WHEN len(ws) = 0 THEN ''
              ELSE array_to_string(list_transform(ws, w -> tok_m[w][1]), ' ')
              END AS tokens_str
  FROM dw CROSS JOIN wm)"""
    )
    return ",\n".join(parts)


@register(
    "q_docs_bpe_encode",
    _bpe_encode_chain_sql(10)
    + "\nSELECT doc_id, n_tokens, tokens_str FROM enc",
    doc=(
        "Corpus-scale BPE ENCODE (operators/bpe.bpe_encode): train 10 "
        "merges (vocab-sized iterations, one corpus aggregate — see "
        "q_docs_bpe_merges), then apply them to every document in ONE "
        "Arrow-batched map-only pass — zero shuffles, merges broadcast "
        "via task closure, per-partition word→tokens memo so the Zipf "
        "head is replayed once per partition, not once per occurrence. "
        "Tokens returned space-joined (symbols are [a-z0-9]+, no "
        "collision) so the result is hashable by the driver. Oracle "
        "unrolls the same 10 training iterations carrying the word "
        "through, then maps each doc's word sequence through the final "
        "word→tokens vocabulary — exact, not rows-only."
    ),
)
def q_docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_encode, bpe_train

    docs = read_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=10)
    return bpe_encode(docs, "text", "doc_id", merges)


@register(
    "q_docs_pack_bpe_sequences",
    _bpe_encode_chain_sql(10)
    + """,
b AS (
  SELECT d.lang, e.doc_id, e.n_tokens,
         sum(e.n_tokens) OVER (PARTITION BY d.lang ORDER BY e.doc_id ASC
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM enc e JOIN documents d USING (doc_id))
SELECT lang, doc_id, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(floor((cum_tokens - n_tokens) / 512.0) AS BIGINT) AS pack_bin
FROM b
""",
    doc=(
        "Sequence packing fed by REAL BPE token counts "
        "(operators/bpe.bpe_encode → sampling.pack_sequences) instead of "
        "the q_docs_pack_sequences regex estimate: per-language "
        "concat-and-chunk into 512-token bins — deterministic doc_id "
        "order within language, one window shuffle keyed on lang so "
        "per-language packs run in parallel across executors; the encode "
        "stage itself is map-only (see q_docs_bpe_encode)."
    ),
)
def q_docs_pack_bpe_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_encode, bpe_train
    from ..operators.sampling import pack_sequences

    docs = read_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=10)
    enc = bpe_encode(docs, "text", "doc_id", merges).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return pack_sequences(
        enc, "n_tokens", "doc_id", budget=512, part_col="lang"
    ).select("lang", "doc_id", "n_tokens", "cum_tokens", "pack_bin")


# --------------------------------------------------------------------------
# SemDeDup-style semantic dedup
# --------------------------------------------------------------------------


@register(
    "q_emb_semantic_dedup",
    None,  # k-means + cluster-blocked pairs + CC — not SQL-replicable cheaply
    gate=False,  # quality pinned by q_emb_semantic_dedup_bound + pytest
    doc=(
        "SemDeDup semantic dedup (operators/semdedup.semantic_dedup): "
        "k-means coarse clusters (k=16, deterministic init), vectors "
        "posted to their 2 nearest centroids, within-cluster exact-cosine "
        "edges at 0.35, connected components, keep the member farthest "
        "from its centroid per group (the paper's keeper policy). "
        "Operational twin — precision/recall/partition invariants are "
        "oracle-pinned by q_emb_semantic_dedup_bound."
    ),
)
def q_emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.semdedup import semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, k=16, max_iter=3, threshold=0.35)


@register(
    "q_emb_semantic_dedup_bound",
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
    t AS (SELECT id_a, id_b FROM dots WHERE round(dot / (na * nb), 4) >= 0.35)
    SELECT (SELECT count(*) FROM t) AS n_true_pairs,
           (SELECT count(DISTINCT vec_id) FROM embeddings WHERE vec_id < 300)
             AS n_sample,
           TRUE AS found_subset_of_true,
           TRUE AS recall_ge_half,
           TRUE AS one_keeper_per_component,
           TRUE AS nonkeepers_point_at_keepers
    """,
    doc=(
        "Quality contract for the rows-only q_emb_semantic_dedup "
        "(pattern: q_emb_near_dups_bound): exact all-pairs cosine>=0.35 "
        "ground truth on a bounded sample (vec_id<300) is hash-compared "
        "(n_true_pairs, n_sample exact). Precision is pinned exactly — "
        "every cluster-blocked pair passes the exact cosine test, so "
        "found⊆true is checked as a boolean. Recall >= 1/2 is the "
        "multi-probe blocking bound (nprobe=2 posts each vector to its 2 "
        "nearest centroids, recovering single-boundary splits; measured "
        "0.78 on this data, and the bound leaves headroom for corpus "
        "regeneration). The two keeper invariants pin the CC+window "
        "stage: every component has exactly one keeper, and every "
        "non-keeper's keeper_id IS a keeper row."
    ),
)
def q_emb_semantic_dedup_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import semdedup
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
        .filter(F.col("cos") >= 0.35)
        .select("id_a", "id_b")
    )
    cent = semdedup.kmeans_fit(emb, k=16, max_iter=3)
    found = semdedup.semantic_edges(emb, cent, 0.35, nprobe=2).select(
        "id_a", "id_b"
    )
    res = semdedup.semantic_dedup(emb, k=16, max_iter=3, threshold=0.35)

    n_true = truth.agg(F.count(F.lit(1)).alias("_nt"))
    n_found = found.agg(F.count(F.lit(1)).alias("_nf"))
    n_hit = truth.join(found, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("_nh")
    )
    n_sample = emb.agg(F.count_distinct(F.col("vec_id")).alias("_ns"))
    comp_ok = (
        res.groupBy("component")
        .agg(F.sum(F.col("is_keeper").cast("int")).alias("_k"))
        .agg(F.min(F.col("_k") == 1).alias("_comp_ok"))
    )
    keeper_ids = res.filter("is_keeper").select(
        F.col("vec_id").alias("keeper_id")
    )
    point_ok = (
        res.filter(~F.col("is_keeper"))
        .join(keeper_ids, "keeper_id", "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("_point_ok"))
    )
    return (
        n_true.crossJoin(n_found)
        .crossJoin(n_hit)
        .crossJoin(n_sample)
        .crossJoin(comp_ok)
        .crossJoin(point_ok)
        .select(
            F.col("_nt").alias("n_true_pairs"),
            F.col("_ns").alias("n_sample"),
            (F.col("_nf") == F.col("_nh")).alias("found_subset_of_true"),
            (F.col("_nh") * 2 >= F.col("_nt")).alias("recall_ge_half"),
            F.col("_comp_ok").alias("one_keeper_per_component"),
            F.col("_point_ok").alias("nonkeepers_point_at_keepers"),
        )
    )


# --------------------------------------------------------------------------
# Streaming late-data accounting — batch twin
# --------------------------------------------------------------------------


@register(
    "q_events_late_arrivals",
    """
    WITH w AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(coalesce(sum(CASE WHEN sec < wm - 600 THEN 1 END), 0)
                AS BIGINT) AS n_late,
           CAST(coalesce(max(CASE WHEN wm > sec THEN wm - sec ELSE 0 END), 0)
                AS BIGINT) AS max_ooo_s
    FROM w GROUP BY event_type
    """,
    doc=(
        "Batch twin of Structured Streaming's numRowsDroppedByWatermark "
        "(operators/timeseries.late_arrival_audit + streaming/events.py "
        "late_drop_stats/LateDataListener): replay events in arrival "
        "order, track the running event-time high-watermark, count rows "
        "arriving >10min behind it and the max out-of-order depth per "
        "type. The Spark side computes the running max as a DISTRIBUTED "
        "PREFIX MAX (bucketed within-partition windows + a tiny "
        "bucket-summary prefix broadcast back) — the oracle's "
        "single-partition global window is the semantic spec, not the "
        "scale plan. Current testdata arrives in order, so n_late pins "
        "at 0 — the nonzero path is pinned by the late-heavy streaming "
        "fixture in tests/test_streaming.py and the planted batch in "
        "tests/test_operators.py."
    ),
)
def q_events_late_arrivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import late_arrival_audit

    ev = read_table(spark, sf_dir, "events")
    return late_arrival_audit(
        ev, "event_id", "ts", "event_type", delay_seconds=600,
        bucket_size=10_000,
    )


# --------------------------------------------------------------------------
# Real PCM WAV decode (pure stdlib — the audio path is no longer
# fake-gated; image/video stay container-gated)
# --------------------------------------------------------------------------


@register(
    "q_media_wav_features",
    """
    WITH m AS (
      SELECT doc_id AS asset_id, (doc_id % 50) + 10 AS n FROM documents),
    s AS (SELECT asset_id, n, unnest(range(0, n)) AS i FROM m),
    w AS (SELECT asset_id, n,
                 (((asset_id * 7 + i * 13) % 256) - 128) * 256 AS x
          FROM s),
    a AS (SELECT asset_id, any_value(n) AS n,
                 sqrt(sum((x / 32768.0) * (x / 32768.0)) / any_value(n)) AS rms,
                 max(abs(x / 32768.0)) AS peak
          FROM w GROUP BY asset_id)
    SELECT asset_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(8000 AS INT) AS sample_rate,
           n / 8000.0 AS duration_s,
           round(rms, 6) AS rms,
           round(peak, 6) AS peak,
           TRUE AS decode_ok
    FROM a
    """,
    doc=(
        "REAL audio decode through the driver gate: per document a "
        "genuine RIFF/WAVE PCM-16 payload is synthesized (stdlib wave "
        "module, samples = ((doc_id*7 + i*13) % 256 - 128)*256, "
        "n = doc_id%50+10 at 8 kHz), then decoded back by "
        "operators/multimodal.decode_wav — an actual header-parsing "
        "byte-reinterpreting PCM decoder, not the fake-feature stub — "
        "and reduced to (n_samples, sample_rate, duration, rms, peak). "
        "The oracle recomputes the waveform arithmetically: PCM values "
        "are exact binary fractions (k/128), squares/sums accumulate "
        "exactly in any order, and the single /n + sqrt roundings are "
        "IEEE-identical on both engines; rms/peak rounded 6dp only to "
        "absorb nothing — they already match bit-for-bit."
    ),
)
def q_media_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import extract_wav_features, wav_encode_pcm16

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for did in b["doc_id"]:
                n = int(did) % 50 + 10
                samples = [
                    ((int(did) * 7 + i * 13) % 256 - 128) * 256
                    for i in range(n)
                ]
                payloads.append(wav_encode_pcm16(samples, rate=8000))
            yield pd.DataFrame({"asset_id": b["doc_id"], "payload": payloads})

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    media = d.mapInPandas(synth, "asset_id bigint, payload binary")
    feats = extract_wav_features(media)
    return feats.select(
        "asset_id",
        "n_samples",
        "sample_rate",
        "duration_s",
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
        "decode_ok",
    )


# --------------------------------------------------------------------------
# Round-6 extras: char-entropy quality signal + snapshot drift audit
# --------------------------------------------------------------------------


@register(
    "q_docs_char_entropy",
    """
    WITH ch AS (
      SELECT doc_id, unnest(string_split_regex(text, '')) AS c
      FROM documents WHERE text IS NOT NULL AND len(text) > 0),
    hist AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
    ent AS (
      SELECT doc_id,
             sum(cnt) AS n,
             log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt) AS h
      FROM hist GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(len(d.text), 0) AS BIGINT) AS n_chars_counted,
           coalesce(round(e.h, 4), 0.0) AS entropy
    FROM documents d LEFT JOIN ent e ON d.doc_id = e.doc_id
    """,
    doc=(
        "Per-document Shannon character entropy (operators/text_analysis."
        "char_entropy) — the compression-ratio-style quality signal "
        "(natural prose ~4-4.5 bits/char; boilerplate collapses toward "
        "0). The per-doc histogram is row-local semantics builtins can "
        "only express by exploding the corpus into per-character rows, "
        "so this is the documented Arrow-batch exception: ONE map-only "
        "pandas_udf pass, zero shuffles (plan-pinned). The oracle "
        "explodes chars in SQL (fine at oracle scale) and lands on the "
        "same 4dp values — both engines round half-away after the "
        "identical log2 arithmetic."
    ),
)
def q_docs_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import char_entropy

    d = read_table(spark, sf_dir, "documents")
    return char_entropy(d, "text", "doc_id")


@register(
    "q_docs_profile_drift",
    """
    WITH pa AS (
      SELECT 'lang' AS col, count(*) AS n, sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS nn,
             count(DISTINCT lang) AS nd, CAST(min(lang) AS VARCHAR) AS mn, CAST(max(lang) AS VARCHAR) AS mx
      FROM documents
      UNION ALL
      SELECT 'n_chars', count(*), sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END),
             count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
      FROM documents),
    pb AS (
      SELECT 'lang' AS col, count(*) AS n, sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS nn,
             count(DISTINCT lang) AS nd, CAST(min(lang) AS VARCHAR) AS mn, CAST(max(lang) AS VARCHAR) AS mx
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 'n_chars', count(*), sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END),
             count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
      FROM documents WHERE doc_id % 2 = 0)
    SELECT pa.col AS "column",
           CAST(pa.n AS BIGINT) AS n_rows_a, CAST(pb.n AS BIGINT) AS n_rows_b,
           round(pa.nn / pa.n, 4) AS null_frac_a,
           round(pb.nn / pb.n, 4) AS null_frac_b,
           round(round(pb.nn / pb.n, 4) - round(pa.nn / pa.n, 4), 4) AS null_frac_delta,
           CAST(pa.nd AS BIGINT) AS n_distinct_a, CAST(pb.nd AS BIGINT) AS n_distinct_b,
           (pa.mn <> pb.mn OR pa.mx <> pb.mx) AS bounds_changed
    FROM pa JOIN pb ON pa.col = pb.col
    """,
    doc=(
        "Snapshot drift audit (operators/profile.profile_drift): profile "
        "the documents table against its even-doc_id 'new snapshot' twin "
        "— null-fraction delta, distinct-count movement, min/max bounds "
        "change per column. Two single-pass wide aggregates (one per "
        "snapshot, every column in one scan — see profile_columns) "
        "joined on the n_cols-row summary: the lake-monitor pre-flight "
        "that catches a broken upstream writer before 100 TB of bad "
        "rows land."
    ),
)
def q_docs_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_drift

    d = read_table(spark, sf_dir, "documents")
    return profile_drift(d, d.filter(F.col("doc_id") % 2 == 0), ["lang", "n_chars"])


# --------------------------------------------------------------------------
# Real BMP image decode + perceptual-hash near-dup (the image path joins
# the audio path out of the container gate: uncompressed 24-bit BMP needs
# only struct + byte reinterpretation; PNG/JPEG stay codec-gated)
# --------------------------------------------------------------------------

#: Shared synth formula (both gate queries + both oracles): per doc a
#: w x h RGB image with w = 8 + doc_id%6, h = 8 + doc_id%5 and channel
#: value px(y,x,c) = (doc_id*2654435761 + y*40503 + x*9973 + c*7919) % 256
#: (multiplicative mix so distinct docs' hashes are uncorrelated) — integer
#: arithmetic an SQL oracle replays exactly, like the WAV query's PCM ramp.


def _synth_bmp(did: int, perturb: bool = False):
    import numpy as np

    from ..operators.multimodal import bmp_encode_rgb24

    w, h = 8 + did % 6, 8 + did % 5
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(3)[None, None, :]
    img = ((did * 2654435761 + y * 40503 + x * 9973 + c * 7919) % 256).astype(
        np.uint8
    )
    if perturb:
        img[0, 0, 0] = (did * 2654435761 + 64) % 256
    return bmp_encode_rgb24(img)


@register(
    "q_media_bmp_features",
    """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 6 AS w, 8 + doc_id % 5 AS h FROM documents),
    px AS (
      SELECT d.doc_id, d.w, d.h, yy.y, xx.x,
             299*((doc_id*2654435761 + y*40503 + x*9973) % 256)
           + 587*((doc_id*2654435761 + y*40503 + x*9973 + 7919) % 256)
           + 114*((doc_id*2654435761 + y*40503 + x*9973 + 15838) % 256) AS gray
      FROM d, range(0, 13) yy(y), range(0, 14) xx(x)
      WHERE yy.y < d.h AND xx.x < d.w),
    tot AS (
      SELECT doc_id, CAST(count(*) AS INT) AS n_pixels,
             CAST(sum(gray) AS BIGINT) AS total_gray
      FROM px GROUP BY doc_id),
    samp AS (
      SELECT d.doc_id, g.i, c.j,
             299*((d.doc_id*2654435761 + ((g.i*d.h)//8)*40503
                   + ((c.j*d.w)//9)*9973) % 256)
           + 587*((d.doc_id*2654435761 + ((g.i*d.h)//8)*40503
                   + ((c.j*d.w)//9)*9973 + 7919) % 256)
           + 114*((d.doc_id*2654435761 + ((g.i*d.h)//8)*40503
                   + ((c.j*d.w)//9)*9973 + 15838) % 256)
             AS gray
      FROM d, range(0, 8) g(i), range(0, 9) c(j)),
    bits AS (
      SELECT s1.doc_id, s1.i * 8 + s1.j AS p,
             CASE WHEN s1.gray > s2.gray THEN 1 ELSE 0 END AS b
      FROM samp s1 JOIN samp s2
        ON s1.doc_id = s2.doc_id AND s1.i = s2.i AND s2.j = s1.j + 1
      WHERE s1.j < 8),
    dh AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN b = 1 THEN
                 CASE WHEN p = 63 THEN -9223372036854775807 - 1
                      ELSE CAST(1 AS BIGINT) << p END
               ELSE 0 END) AS BIGINT) AS dhash
      FROM bits GROUP BY doc_id)
    SELECT d.doc_id AS asset_id, CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height, t.n_pixels, t.total_gray,
           dh.dhash, TRUE AS decode_ok
    FROM d JOIN tot t USING (doc_id) JOIN dh USING (doc_id)
    """,
    doc=(
        "REAL image decode through the driver gate: per document a "
        "genuine uncompressed 24-bit BMP is synthesized (struct-built "
        "headers, padded bottom-up BGR rows; px(y,x,c) = (doc_id*2654435761 + "
        "y*40503 + x*9973 + c*7919) % 256, w = 8+doc_id%6, h = 8+doc_id%5), "
        "then decoded back by operators/multimodal.decode_bmp — an "
        "actual header-parsing row-unflipping decoder, not the "
        "fake-feature stub — and reduced to dimensions, exact integer "
        "total luma (299R+587G+114B, no division), and the 64-bit "
        "perceptual dHash over a deterministic 9x8 nearest-neighbor "
        "grid. Every output is integer arithmetic, so the oracle "
        "replaying the formula is exact with NO rounding seam at all. "
        "One map-only mapInPandas pass, zero shuffles."
    ),
)
def q_media_bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import extract_bmp_features

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "asset_id": b["doc_id"],
                    "payload": [_synth_bmp(int(did)) for did in b["doc_id"]],
                }
            )

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    media = d.mapInPandas(synth, "asset_id bigint, payload binary")
    return extract_bmp_features(media)


@register(
    "q_media_image_neardup",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 300),
    assets AS (
      SELECT doc_id, doc_id * 2 AS asset_id, 0 AS v FROM d
      UNION ALL
      SELECT doc_id, doc_id * 2 + 1 AS asset_id, 1 AS v
      FROM d WHERE doc_id % 3 = 0),
    dims AS (
      SELECT asset_id, doc_id, v, 8 + doc_id % 6 AS w, 8 + doc_id % 5 AS h
      FROM assets),
    samp AS (
      SELECT a.asset_id, g.i, c.j,
             299*(CASE WHEN a.v = 1 AND (g.i*a.h)//8 = 0 AND (c.j*a.w)//9 = 0
                       THEN (a.doc_id*2654435761 + 64) % 256
                       ELSE (a.doc_id*2654435761 + ((g.i*a.h)//8)*40503
                             + ((c.j*a.w)//9)*9973) % 256 END)
           + 587*((a.doc_id*2654435761 + ((g.i*a.h)//8)*40503
                   + ((c.j*a.w)//9)*9973 + 7919) % 256)
           + 114*((a.doc_id*2654435761 + ((g.i*a.h)//8)*40503
                   + ((c.j*a.w)//9)*9973 + 15838) % 256) AS gray
      FROM dims a, range(0, 8) g(i), range(0, 9) c(j)),
    bits AS (
      SELECT s1.asset_id, s1.i * 8 + s1.j AS p,
             CASE WHEN s1.gray > s2.gray THEN 1 ELSE 0 END AS b
      FROM samp s1 JOIN samp s2
        ON s1.asset_id = s2.asset_id AND s1.i = s2.i AND s2.j = s1.j + 1
      WHERE s1.j < 8),
    pairs AS (
      SELECT b1.asset_id AS id_a, b2.asset_id AS id_b,
             CAST(sum(CASE WHEN b1.b <> b2.b THEN 1 ELSE 0 END) AS INT)
               AS hamming
      FROM bits b1 JOIN bits b2
        ON b1.p = b2.p AND b1.asset_id < b2.asset_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
    """,
    doc=(
        "Image near-dup detection by perceptual-hash hamming distance "
        "(operators/multimodal.dhash_neardup_pairs): a bounded asset "
        "sample (doc_id < 300, so the all-pairs ORACLE stays tractable "
        "at any SF) where every third document also gets a one-pixel- "
        "perturbed twin — the near-dup the pipeline must catch. Spark "
        "decodes REAL BMPs, computes dHash, and finds pairs at hamming "
        "<= 3 via the pigeonhole banded EQUI-join (4 contiguous 16-bit "
        "blocks: a pair differing in <= 3 bits matches at least one "
        "block — recall 1 is a THEOREM, same machinery as "
        "dedup.simhash_candidates), then verifies with bit_count(xor) "
        "on candidates only. The oracle recomputes every hash "
        "arithmetically and compares ALL pairs — which is exactly what "
        "the Spark side must never do at 100 TB (plan-pinned: no "
        "CartesianProduct)."
    ),
)
def q_media_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import dhash_neardup_pairs, extract_bmp_features

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, payloads = [], []
            for did in b["doc_id"]:
                did = int(did)
                ids.append(did * 2)
                payloads.append(_synth_bmp(did))
                if did % 3 == 0:
                    ids.append(did * 2 + 1)
                    payloads.append(_synth_bmp(did, perturb=True))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    d = d.filter(F.col("doc_id") < 300)
    media = d.mapInPandas(synth, "asset_id bigint, payload binary")
    feats = extract_bmp_features(media)
    return dhash_neardup_pairs(feats, max_hamming=3)


# --------------------------------------------------------------------------
# Classifier-based corpus filtering: multinomial Naive Bayes
# --------------------------------------------------------------------------


@register(
    "q_docs_nb_langid",
    """
    WITH train AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0),
    test AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1),
    trtok AS (
      SELECT t.doc_id, t.lang, u.tok
      FROM train t,
           unnest(list_filter(string_split_regex(lower(t.text), '[^a-z0-9]+'),
                              x -> x <> '')) AS u(tok)),
    wc AS (SELECT lang, tok, count(*) AS cnt FROM trtok GROUP BY 1, 2),
    cls AS (
      SELECT c.lang, c.n_docs, coalesce(t.tl, 0) AS tl
      FROM (SELECT lang, count(*) AS n_docs FROM train GROUP BY 1) c
      LEFT JOIN (SELECT lang, sum(cnt) AS tl FROM wc GROUP BY 1) t
        USING (lang)),
    consts AS (
      SELECT (SELECT count(*) FROM train) AS n,
             (SELECT count(DISTINCT tok) FROM wc) AS v),
    tetok AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT t.doc_id, u.tok
            FROM test t,
                 unnest(list_filter(string_split_regex(lower(t.text),
                                                       '[^a-z0-9]+'),
                                    x -> x <> '')) AS u(tok))
      GROUP BY 1, 2),
    doctot AS (
      SELECT te.doc_id, coalesce(s.tot, 0) AS tot
      FROM test te LEFT JOIN
        (SELECT doc_id, sum(tf) AS tot FROM tetok GROUP BY 1) s
        USING (doc_id)),
    raw AS (
      SELECT tt.doc_id, w.lang, sum(tt.tf * ln(w.cnt + 1)) AS raw
      FROM tetok tt JOIN wc w ON tt.tok = w.tok
      GROUP BY 1, 2),
    scored AS (
      SELECT d.doc_id, c.lang,
             round(ln(c.n_docs) - ln(k.n) + coalesce(r.raw, 0)
                   - d.tot * ln(c.tl + k.v), 4) AS score
      FROM doctot d CROSS JOIN cls c CROSS JOIN consts k
      LEFT JOIN raw r ON r.doc_id = d.doc_id AND r.lang = c.lang),
    pred AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang ASC) AS rn
      FROM scored)
    SELECT p.doc_id, te.lang AS true_lang, p.lang AS predicted, p.score
    FROM pred p JOIN test te USING (doc_id)
    WHERE p.rn = 1
    """,
    doc=(
        "Classifier-based corpus filtering (operators/text_analysis."
        "nb_classify): a multinomial Naive Bayes language classifier — "
        "the fastText/CCNet seam — trained on the even-doc_id half "
        "(labels = lang), scoring every odd-doc_id document and keeping "
        "the argmax label, reported beside the true lang. The Laplace "
        "score decomposes so unseen (token, label) pairs need no model "
        "row: training is ONE groupBy(label, token) aggregate; scoring "
        "joins test term frequencies to the vocabulary-sized model and "
        "right-joins onto the bounded docxlabel grid (label stats "
        "broadcast). Scores round 4dp with a label-asc tiebreak so the "
        "argmax is engine-independent (the unigram_nll precedent); the "
        "oracle replays the identical algebra."
    ),
)
def q_docs_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import nb_classify

    d = read_table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    pred = nb_classify(train, test, "text", "doc_id", "lang")
    return pred.join(
        test.select("doc_id", F.col("lang").alias("true_lang")), "doc_id"
    ).select("doc_id", "true_lang", "predicted", "score")


# --------------------------------------------------------------------------
# Incremental materialized-view maintenance
# --------------------------------------------------------------------------


@register(
    "q_events_mv_merge",
    """
    SELECT event_type, date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_value
    FROM events
    WHERE event_id % 10 <> 7
    GROUP BY 1, 2
    """,
    doc=(
        "Incremental materialized-view maintenance (operators/"
        "incremental_mv): an hourly (event_type, hour) COUNT/SUM rollup "
        "built over the 80% base slice (event_id%10 < 8), then refreshed "
        "by ONE signed change batch — deletes for the id%10=7 base rows "
        "(full old row image, the CDC convention) plus inserts for the "
        "id%10>=8 tail — via one delta aggregate + one full-outer merge "
        "on the view key. The base relation is never rescanned in the "
        "apply stage (plan-pinned); keys whose count reaches zero drop "
        "out. Sums accumulate in DECIMAL(18,6) so the incremental path "
        "(base-agg + delta-agg) lands on bit-identical values to the "
        "ORACLE's full recompute over the merged state — the invariant "
        "an incremental refresh exists to preserve, checked exactly."
    ),
)
def q_events_mv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental_mv import build_mv, incremental_mv_apply

    ev = (
        read_table(spark, sf_dir, "events")
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .select("event_id", "event_type", "hour", "value")
    )
    base = ev.filter(F.col("event_id") % 10 < 8)
    mv = build_mv(base, ["event_type", "hour"], ["value"])
    delta = (
        base.filter(F.col("event_id") % 10 == 7).withColumn("op", F.lit("D"))
    ).unionByName(
        ev.filter(F.col("event_id") % 10 >= 8).withColumn("op", F.lit("I"))
    )
    out = incremental_mv_apply(mv, delta, ["event_type", "hour"], ["value"])
    return out.select(
        "event_type",
        "hour",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
    )


# --------------------------------------------------------------------------
# Skew-aware hybrid join (hot keys broadcast, cold keys shuffled)
# --------------------------------------------------------------------------


@register(
    "q_orders_hybrid_skew_join",
    """
    WITH f AS (
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE o_custkey END AS k,
             o_totalprice
      FROM orders)
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(f.o_totalprice AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue
    FROM f JOIN customer c ON f.k = c.c_custkey
    GROUP BY 1
    """,
    doc=(
        "Skew-aware hybrid join (operators/skew.hybrid_skew_join): a "
        "synthetically skewed orders fact (every third order redirected "
        "to custkey 1 — one key holding a third of the table, the shape "
        "that melts a single reducer at 100 TB) joined to customer by "
        "hot/cold split: heavy-hitter keys (exact count >= threshold, "
        "bounded by rows/threshold so broadcastable BY CONSTRUCTION) "
        "take a broadcast hash join against the matching dim SLICE — "
        "the hot rows never shuffle — while the cold remainder takes "
        "the normal shuffled equi-join over now-uniform keys. Each "
        "fact row lands in exactly one branch, so the union equals the "
        "plain join row-for-row: the ORACLE IS the plain join, making "
        "the equivalence the checked contract. Plan-pinned: both a "
        "BroadcastHashJoin and a shuffle-family join present under a "
        "disabled auto-broadcast threshold."
    ),
)
def q_orders_hybrid_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import hybrid_skew_join
    from .money import DEC

    o = read_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("o_custkey"))
        .alias("c_custkey"),
        "o_totalprice",
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = hybrid_skew_join(o, c, "c_custkey", min_hot_count=400)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast(DEC)), 2)
        .cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------------
# TF-IDF k-nearest-neighbor graph (sparse lexical similarity)
# --------------------------------------------------------------------------


@register(
    "q_docs_tfidf_knn",
    """
    WITH dw AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ws
      FROM documents),
    toks AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i+1]
                                        || ' ' || ws[i+2])) AS tok
      FROM dw),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    n AS (SELECT count(*) AS n FROM documents),
    dfreq AS (
      SELECT tok, count(*) AS df FROM tf GROUP BY 1
      HAVING count(*) <= 15),
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
    FROM rk WHERE rank <= 5
    """,
    doc=(
        "Sparse lexical KNN graph (operators/retrieval.tfidf_knn_graph), "
        "OPERATIONAL absolute-df-cap path: per document the 5 most-"
        "cosine-similar others under smooth-idf TF-IDF over trigram "
        "shingles (unigram df ~= N on this corpus — the degenerate case "
        "the ngram knob exists for), posting lists capped at an ABSOLUTE "
        "15 documents. The round-11 scale fix for the last measured "
        "superlinear default (SCALE_PROBE tfidf_knn slope 1.5 at 10x "
        "under the old RELATIVE 6%-of-N cap, whose kept posting lists "
        "lengthen with the corpus): an absolute cap bounds pair volume "
        "at max_df * token mass — linear at any N. Uncapped semantics "
        "are gated on a bounded sub-corpus by q_docs_tfidf_knn_exact "
        "and the truncation cost is MEASURED by "
        "q_docs_tfidf_knn_cap_agreement (the transitivity triple "
        "pattern). Shingles are built row-locally (codegen transform, "
        "no corpus re-explode); pair dot products are a token-keyed "
        "self-equi-join with map-side partial agg, never a doc-by-doc "
        "product; unordered pairs computed once and mirrored AFTER the "
        "aggregate; top-k is one row_number window on the source key "
        "with a neighbor-id tiebreak making the cut total. Oracle "
        "replays the identical arithmetic (same ln, same 4-dp round)."
    ),
)
def q_docs_tfidf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import tfidf_knn_graph

    docs = read_table(spark, sf_dir, "documents")
    return tfidf_knn_graph(
        docs, "text", "doc_id", k=5, max_df=15, ngram=3
    )


# --------------------------------------------------------------------------
# Bloom-filter membership (broadcastable set probe / decontamination)
# --------------------------------------------------------------------------


@register(
    "q_docs_bloom_decontam",
    """
    WITH hs AS (SELECT unnest(range(1, 4)) AS i),
    ev AS (SELECT lower(text) AS v FROM documents WHERE doc_id % 17 = 0),
    bpos AS (
      SELECT CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || v), 1, 15)
                  AS BIGINT) % 8192 AS pos
      FROM ev CROSS JOIN hs),
    bloom AS (
      SELECT pos // 32 AS word_idx,
             bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS word
      FROM bpos GROUP BY 1),
    pr AS (SELECT doc_id, lower(text) AS v FROM documents),
    ppos AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || v), 1, 15)
                  AS BIGINT) % 8192 AS pos
      FROM pr CROSS JOIN hs),
    hits AS (
      SELECT p.doc_id,
             CASE WHEN (coalesce(b.word, 0)
                        & (1::BIGINT << CAST(p.pos % 32 AS INTEGER)))
                  = (1::BIGINT << CAST(p.pos % 32 AS INTEGER))
                  THEN 1 ELSE 0 END AS hit
      FROM ppos p LEFT JOIN bloom b ON b.word_idx = p.pos // 32)
    SELECT doc_id, CAST(min(hit) = 1 AS BOOLEAN) AS might_contain
    FROM hits GROUP BY doc_id
    """,
    doc=(
        "Bloom-filter decontamination probe (operators/membership): the "
        "eval set (every 17th doc) is compressed to a 8192-bit bitmap "
        "(256 x 32-bit words — a few KB, broadcastable at ANY set size "
        "up to saturation), and every corpus document is probed with a "
        "map-side broadcast join + bit test: zero corpus shuffles vs "
        "the exact anti-join's corpus-keyed exchange; no false "
        "negatives by construction, false positives at (bits/m)^k. "
        "Bit positions are md5_60-derived (the simhash parity trick) "
        "so the bitmap — and therefore every probe answer including "
        "any false positive — is engine-independent: the oracle "
        "rebuilds the identical filter in DuckDB and must match "
        "hash-exactly, not just statistically."
    ),
)
def q_docs_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.membership import bloom_build, bloom_probe

    docs = read_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 17 == 0).select(
        F.lower(F.col("text")).alias("v")
    )
    bloom = bloom_build(ev, "v", num_words=256, num_hashes=3)
    probe = docs.select("doc_id", F.lower(F.col("text")).alias("v"))
    return bloom_probe(
        probe, "v", "doc_id", bloom, num_words=256, num_hashes=3
    )


# --------------------------------------------------------------------------
# Mergeable HLL sketch rollup (incremental distinct counts)
# --------------------------------------------------------------------------


@register(
    "q_events_hll_rollup_bound",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           TRUE AS within_5pct,
           TRUE AS rollup_equals_direct
    FROM events GROUP BY event_type
    """,
    doc=(
        "Mergeable distinct-count rollup (operators/sketches."
        "hll_sketch_table + hll_rollup): per-(event_type, day) HLL "
        "sketches of user_id union-rolled to event_type WITHOUT "
        "re-touching base data — the decomposability exact "
        "count_distinct lacks, and the reason a 100 TB lake keeps a "
        "KB-sized sketch table per partition instead of rescanning "
        "history for every window. Contract pinned against the exact "
        "oracle: the rolled estimate is within 5% of the true distinct "
        "count per type (lg_k=12 ~ 2.5% expected), AND rolling up the "
        "daily sketches gives the SAME estimate as sketching the type "
        "directly (merge-equals-rebuild, the algebraic property that "
        "makes incremental maintenance sound)."
    ),
)
def q_events_hll_rollup_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_rollup, hll_sketch_table

    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = hll_sketch_table(ev, "user_id", ["event_type", "day"])
    rolled = hll_rollup(daily, ["event_type"]).withColumnRenamed(
        "est", "rolled_est"
    )
    direct = hll_sketch_table(ev, "user_id", ["event_type"]).select(
        "event_type", F.col("est").alias("direct_est")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users"),
        F.count_distinct("day").cast("bigint").alias("n_days"),
    )
    return (
        exact.join(rolled.select("event_type", "rolled_est"), "event_type")
        .join(direct, "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_days",
            (
                F.abs(F.col("rolled_est") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("within_5pct"),
            (F.col("rolled_est") == F.col("direct_est")).alias(
                "rollup_equals_direct"
            ),
        )
    )


# --------------------------------------------------------------------------
# Count-Min frequency sketch
# --------------------------------------------------------------------------


@register(
    "q_events_cms_user_freq",
    """
    WITH ds AS (SELECT unnest(range(0, 3)) AS d),
    vals AS (
      SELECT CAST(user_id AS VARCHAR) AS v FROM events
      WHERE user_id IS NOT NULL),
    slots AS (
      SELECT d, CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || v),
                                    1, 15) AS BIGINT) % 1024 AS slot
      FROM vals CROSS JOIN ds),
    cms AS (SELECT d, slot, CAST(count(*) AS BIGINT) AS cnt
            FROM slots GROUP BY 1, 2),
    probe AS (SELECT DISTINCT user_id FROM events WHERE user_id < 40),
    ppos AS (
      SELECT p.user_id, ds.d,
             CAST('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':'
                                     || CAST(p.user_id AS VARCHAR)),
                                 1, 15) AS BIGINT) % 1024 AS slot
      FROM probe p CROSS JOIN ds),
    est AS (
      SELECT user_id, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est_count
      FROM ppos LEFT JOIN cms c USING (d, slot) GROUP BY user_id),
    exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
      FROM events WHERE user_id < 40 GROUP BY 1)
    SELECT e.user_id, e.est_count, x.exact_count,
           e.est_count >= x.exact_count AS never_undercounts
    FROM est e JOIN exact x USING (user_id)
    """,
    doc=(
        "Count-Min frequency sketch (operators/sketches.cms_build/"
        "cms_estimate): event frequencies per user compressed to a "
        "3x1024-counter table (broadcastable at ANY corpus size) built "
        "with one map-side-combinable groupBy; probes are row-local "
        "hashing + broadcast join + min — no corpus shuffle on the "
        "probe key. The md5_60 hash family makes every estimate — "
        "including collision overcounts — engine-independent, so the "
        "oracle rebuilds the identical sketch in DuckDB and the gate "
        "is hash-exact, with the never-undercounts CM invariant "
        "checked per probe against exact counts."
    ),
)
def q_events_cms_user_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_build, cms_estimate

    ev = read_table(spark, sf_dir, "events")
    cms = cms_build(ev, "user_id", width=1024, depth=3)
    probe = ev.filter(F.col("user_id") < 40).select("user_id").distinct()
    est = cms_estimate(probe, "user_id", cms, width=1024, depth=3)
    exact = (
        ev.filter(F.col("user_id") < 40)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
    )
    return est.join(exact, "user_id").select(
        "user_id",
        "est_count",
        "exact_count",
        (F.col("est_count") >= F.col("exact_count")).alias(
            "never_undercounts"
        ),
    )


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection
# --------------------------------------------------------------------------


def _rp_oracle_sql(dim: int = 64, out_dim: int = 16) -> str:
    """Oracle carrying the SAME literal sign matrix the Spark plan folds
    (rp_sign_matrix — md5-parity derivation, operators/similarity): both
    engines fold i ascending from 0.0, so the 4-dp round makes the
    projection hash-exact."""
    from ..operators.similarity import rp_sign_matrix

    m = rp_sign_matrix(dim, out_dim)
    rows = ", ".join(
        "[" + ", ".join(str(v) for v in row) + "]" for row in m
    )
    return f"""
    WITH s AS (SELECT [{rows}] AS m),
    js AS (SELECT unnest(range(0, {out_dim})) AS j)
    SELECT vec_id, CAST(j AS INTEGER) AS j,
           round(round(list_reduce(
                   list_transform(range(1, {dim + 1}),
                                  i -> CAST(embedding[i] AS DOUBLE) * m[j + 1][i]),
                   (a, b) -> a + b), 10) / sqrt({out_dim}.0), 4) + 0.0 AS val
    FROM embeddings CROSS JOIN s CROSS JOIN js
    """


@register(
    "q_emb_rp_project",
    _rp_oracle_sql(64, 16),
    doc=(
        "Johnson-Lindenstrauss random projection (operators/similarity."
        "rp_project): 64-dim embeddings compressed to 16 dims with a "
        "deterministic +-1 sign matrix (md5-parity derived, inlined as "
        "literals in BOTH engines). ZERO shuffles — codegen zip_with/"
        "aggregate folds per output dim fuse into the scan, the standard "
        "pre-ANN compression cutting scan bytes 4x before ranking; the "
        "Arrow-matmul kernel is the 100 TB swap-in (same matrix, same "
        "output). Hash-exact oracle: identical fold order, 4-dp round."
    ),
)
def q_emb_rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import rp_project

    emb = read_table(spark, sf_dir, "embeddings")
    return rp_project(emb, "embedding", "vec_id", out_dim=16)


# --------------------------------------------------------------------------
# Windowed EWMA (truncated exponential smoothing per key)
# --------------------------------------------------------------------------


@register(
    "q_events_ewma",
    """
    WITH w AS (
      SELECT event_id,
             list_reverse(list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) AS vs
      FROM events WHERE value IS NOT NULL)
    SELECT event_id,
           round(
             list_reduce(list_transform(range(1, len(vs) + 1),
                                        i -> vs[i] * pow(0.5, i - 1)),
                         (a, b) -> a + b)
             / list_reduce(list_transform(range(1, len(vs) + 1),
                                          i -> pow(0.5, i - 1)),
                           (a, b) -> a + b),
             4) + 0.0 AS ewma
    FROM w
    """,
    doc=(
        "Truncated-window EWMA per user (operators/timeseries."
        "windowed_ewma): last-20-observation exponential smoothing, "
        "normalized so weights sum to 1 (no cold-start bias). The "
        "classic recursive EWMA is a sequential per-key scan — wrong "
        "shape at scale; the truncated form is ONE bounded-frame "
        "collect_list window (constant state per row) + a row-local "
        "codegen fold, one key-clustered shuffle total. Gate pins "
        "alpha=0.5 so every decay power is exactly representable — "
        "pow() parity between engines is structural, not luck; fold "
        "order newest-to-oldest replayed identically by the oracle."
    ),
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import windowed_ewma

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return windowed_ewma(
        ev, "user_id", ["ts", "event_id"], "value", alpha=0.5, window=20
    ).select("event_id", "ewma")


# --------------------------------------------------------------------------
# Per-dimension embedding standardization
# --------------------------------------------------------------------------


@register(
    "q_emb_standardize",
    """
    WITH ex AS (
      SELECT vec_id, CAST(i - 1 AS INTEGER) AS j,
             CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings
      CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
    st AS (
      SELECT j, round(sum(v), 6) AS s, round(sum(v * v), 6) AS s2,
             count(*) AS n
      FROM ex GROUP BY j),
    ms AS (
      SELECT j, s / n AS mu,
             sqrt(greatest(s2 / n - (s / n) * (s / n), 0.0)) AS sigma
      FROM st)
    SELECT ex.vec_id, ex.j,
           round(CASE WHEN ms.sigma > 0 THEN (ex.v - ms.mu) / ms.sigma
                      ELSE 0.0 END, 4) + 0.0 AS zval
    FROM ex JOIN ms USING (j)
    """,
    doc=(
        "Per-dimension embedding whitening (operators/similarity."
        "standardize_embeddings): z-normalize every dim against corpus "
        "mean/std — the preprocessing pass before quantization/ANN when "
        "dims carry different scales. Stats via ONE posexplode + "
        "groupBy(dim) whose partial aggregation collapses the 64x "
        "explode to partitions x dim rows pre-shuffle; the dim-sized "
        "stat table broadcasts into a row-local transform. Determinism "
        "by quantizing the ACCUMULATORS (sum, sum-of-squares to 6 dp) "
        "before the derived mean/variance arithmetic, with the "
        "population formula spelled identically on both engines instead "
        "of trusting builtin stddev summation algorithms to agree."
    ),
)
def q_emb_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import standardize_embeddings

    emb = read_table(spark, sf_dir, "embeddings")
    return standardize_embeddings(emb, "embedding", "vec_id")


# --------------------------------------------------------------------------
# Reciprocal-rank fusion (hybrid lexical + dense retrieval)
# --------------------------------------------------------------------------


@register(
    "q_docs_rrf_hybrid",
    """
    WITH toks AS (
      SELECT doc_id,
             [x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
              IF x <> ''] AS tok
      FROM documents),
    dl AS (SELECT doc_id, len(tok) AS dl FROM toks),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, t, count(*) AS tf, max(dl) AS dl
      FROM (SELECT doc_id, unnest(tok) AS t, len(tok) AS dl FROM toks)
      WHERE t IN ('join', 'spark', 'stream', 'vector')
      GROUP BY doc_id, t),
    dfreq AS (SELECT t, count(*) AS dfr FROM tf GROUP BY t),
    bm AS (
      SELECT tf.doc_id,
             round(sum(
               ln(1.0 + (stats.n - dfreq.dfr + 0.5) / (dfreq.dfr + 0.5))
               * (tf.tf * (1.2 + 1))
               / (tf.tf + 1.2 * (0.25 + (0.75 * tf.dl) / stats.avgdl))
             ), 4) AS score
      FROM tf JOIN dfreq USING (t) CROSS JOIN stats
      GROUP BY tf.doc_id),
    bmr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM bm ORDER BY score DESC, doc_id LIMIT 20),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    expanded AS (
      SELECT e.vec_id,
             unnest(e.embedding)::DOUBLE AS ev,
             unnest(q.qv)::DOUBLE AS qe
      FROM embeddings e, q),
    dots AS (
      SELECT vec_id, sum(ev*qe) AS dot,
             sqrt(sum(ev*ev)) AS na, sqrt(sum(qe*qe)) AS nb
      FROM expanded GROUP BY vec_id),
    dn AS (
      SELECT vec_id AS doc_id, round(dot/(na*nb), 4) AS cos_sim
      FROM dots),
    dnr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS rank
      FROM dn ORDER BY cos_sim DESC, doc_id LIMIT 20),
    fused AS (
      SELECT doc_id,
             round(sum(1.0 / (60.0 + rank)), 6) AS rrf_score,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM (SELECT * FROM bmr UNION ALL SELECT * FROM dnr)
      GROUP BY doc_id)
    SELECT doc_id, rrf_score, n_sources
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
    doc=(
        "Hybrid retrieval via reciprocal-rank fusion (operators/"
        "retrieval.rrf_fuse, Cormack et al. 2009): BM25 top-20 and "
        "exact-cosine dense top-20 (the embedding row sharing the doc "
        "id space) fused by sum of 1/(60+rank) — the scale-free rank "
        "combiner production hybrid search uses because BM25 scores "
        "and cosines are incomparable. The retrievers do all the heavy "
        "lifting (each already TakeOrdered + broadcast-stat shapes); "
        "fusion is a union of two 20-row lists + one groupBy. Integer "
        "ranks (both underlying scores 4-dp-rounded with id tiebreaks) "
        "make the fused order engine-exact."
    ),
)
def q_docs_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.retrieval import bm25_topk, rrf_fuse
    from ..operators.similarity import brute_force_topk
    from .similarity_queries import _query_vec

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    w_bm = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm = (
        bm25_topk(
            docs, "text", "doc_id", ["join", "spark", "stream", "vector"], k=20
        )
        .withColumn("rank", F.row_number().over(w_bm))
        .select("doc_id", "rank")
    )
    w_dn = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    dn = (
        brute_force_topk(emb, _query_vec(spark, sf_dir), k=20)
        .withColumn("rank", F.row_number().over(w_dn))
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([bm, dn], "doc_id", k_rrf=60, topk=10)


# --------------------------------------------------------------------------
# Nucleus (top-p) per-domain selection
# --------------------------------------------------------------------------


@register(
    "q_docs_nucleus_select",
    """
    WITH t AS (
      SELECT source, sum(CAST(n_chars AS DOUBLE)) AS tot
      FROM documents GROUP BY source),
    c AS (
      SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS wgt,
             sum(CAST(n_chars AS DOUBLE)) OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents)
    SELECT c.doc_id, c.source, round(c.cum / t.tot, 6) + 0.0 AS cum_frac
    FROM c JOIN t USING (source)
    WHERE t.tot > 0 AND (c.cum - c.wgt) < 0.8 * t.tot
    """,
    doc=(
        "Top-p (nucleus) per-domain selection (operators/sampling."
        "nucleus_select): per source, keep the minimal highest-weight "
        "prefix covering 80% of the domain's total mass — the curation "
        "analog of nucleus sampling; a fixed per-group k over-prunes "
        "small domains and under-prunes large ones, a mass fraction "
        "does neither. One groupBy for totals (broadcast back, group-"
        "cardinality) + one cumulative window on the same group key. "
        "Integer weights make the cumulative double sums EXACT (no "
        "fold-order hazard below 2^53), so the gate is hash-exact with "
        "the (weight desc, id) total order."
    ),
)
def q_docs_nucleus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import nucleus_select

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return nucleus_select(docs, "source", "n_chars", "doc_id", p=0.8).select(
        "doc_id", "source", "cum_frac"
    )


# --------------------------------------------------------------------------
# Interval-union coverage (gaps-and-islands)
# --------------------------------------------------------------------------


@register(
    "q_events_interval_union",
    """
    WITH iv AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
      FROM events),
    m AS (
      SELECT user_id, s, e,
             CASE WHEN s > coalesce(
                    max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775807)
                  THEN 1 ELSE 0 END AS ni
      FROM iv),
    isl AS (
      SELECT user_id, s, e,
             sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS UNBOUNDED PRECEDING) AS island
      FROM m),
    g AS (SELECT user_id, island, min(s) AS s, max(e) AS e, count(*) AS n
          FROM isl GROUP BY 1, 2)
    SELECT user_id, CAST(sum(n) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(e - s) AS BIGINT) AS covered_total
    FROM g GROUP BY user_id
    """,
    doc=(
        "Interval-union coverage per user (operators/timeseries."
        "interval_union_length): each event opens a 5-minute activity "
        "interval; total ACTIVE seconds = union length with overlaps "
        "merged — the gaps-and-islands sweep behind utilization and "
        "session-coverage metrics, where naive sum(end-start) double-"
        "counts. New-island detection (start > running max end), island "
        "labeling (cumulative sum) and island extents are all windows/"
        "groupBys on the SAME user key — one exchange total, two-integer "
        "running state, never a collected interval list. Integer epoch "
        "arithmetic end-to-end: hash-exact oracle."
    ),
)
def q_events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.dates import epoch_seconds
    from ..operators.timeseries import interval_union_length

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        epoch_seconds("ts").alias("s"),
        (epoch_seconds("ts") + 300).alias("e"),
    )
    return interval_union_length(ev, "user_id", "s", "e")


# --------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov estimate)
# --------------------------------------------------------------------------


@register(
    "q_events_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    pairs AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT prev_type, sum(n) AS total_n FROM pairs GROUP BY 1)
    SELECT p.prev_type, p.next_type, CAST(p.n AS BIGINT) AS n_transitions,
           round(CAST(p.n AS DOUBLE) / tot.total_n, 4) AS p_next
    FROM pairs p JOIN tot USING (prev_type)
    """,
    doc=(
        "First-order Markov transition matrix over per-user event "
        "sequences: lag window on the user key (one exchange), pair "
        "counts map-side combinable, row-normalized into transition "
        "probabilities — the sequence-model summary behind funnel "
        "diagnostics and synthetic-session generation. n/t is an exact "
        "integer ratio, so the 4-dp round is engine-stable."
    ),
)
def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("_n").alias("_t"))
    return pairs.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        F.col("_n").cast("bigint").alias("n_transitions"),
        F.round(F.col("_n").cast("double") / F.col("_t"), 4).alias("p_next"),
    )


# --------------------------------------------------------------------------
# Exact distributed ROC-AUC
# --------------------------------------------------------------------------


@register(
    "q_docs_auc_lang_by_length",
    """
    WITH g AS (
      SELECT n_chars AS s, count(*) AS n,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np
      FROM documents GROUP BY 1),
    r AS (
      SELECT s, n, np,
             coalesce(sum(n) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS rows_before
      FROM g)
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(n) - sum(np) AS BIGINT) AS n_neg,
           CASE WHEN sum(np) > 0 AND sum(n) - sum(np) > 0 THEN
             round((sum(np * (rows_before + (n + 1) / 2.0))
                    - sum(np) * (sum(np) + 1) / 2.0)
                   / (sum(np) * (sum(n) - sum(np))), 6) + 0.0
           END AS auc
    FROM r
    """,
    doc=(
        "Exact distributed ROC-AUC (operators/evaluation.binary_auc, "
        "Mann-Whitney rank-sum with midrank ties — sklearn-identical): "
        "does document length predict lang='en'? Evaluation-as-query: "
        "at corpus scale the metric itself must distribute, so ranks "
        "come from a per-distinct-score aggregate (the only corpus-"
        "sized shuffle, map-side combinable) + ONE cumulative window "
        "over the score-DISTINCT table — bounded because every scorer "
        "here quantizes to 4 dp, and tiny next to the corpus. Integer/"
        "rational arithmetic until the single final division: "
        "hash-exact oracle."
    ),
)
def q_docs_auc_lang_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import binary_auc

    docs = read_table(spark, sf_dir, "documents").select(
        "n_chars", (F.col("lang") == "en").alias("is_en")
    )
    return binary_auc(docs, "n_chars", "is_en")


# --------------------------------------------------------------------------
# Order-insensitive table content digest
# --------------------------------------------------------------------------


@register(
    "q_orders_table_digest",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(CAST('0x' || substr(md5(
             coalesce(CAST(o_orderkey AS VARCHAR), '<NULL>') || '|' ||
             coalesce(CAST(o_custkey AS VARCHAR), '<NULL>') || '|' ||
             coalesce(o_orderstatus, '<NULL>') || '|' ||
             coalesce(o_orderpriority, '<NULL>')), 1, 15) AS BIGINT))
             AS digest
    FROM orders
    """,
    doc=(
        "Order-insensitive table content digest (operators/profile."
        "table_digest): XOR of md5_60 row hashes over '|'-joined "
        "key/status columns + row count — the snapshot-equality "
        "primitive for verifying migrations/backfills/compactions "
        "WITHOUT sorting or moving either table: one map-only scan, a "
        "commutative single-row aggregate (partitioning- and order-"
        "independent, map-side combinable). md5_60 + explicit NULL "
        "sentinel make the digest engine-identical; the oracle computes "
        "the same XOR in DuckDB."
    ),
)
def q_orders_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import table_digest

    o = read_table(spark, sf_dir, "orders")
    return table_digest(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


# --------------------------------------------------------------------------
# JL two-stage recall contract
# --------------------------------------------------------------------------


@register(
    "q_emb_rp_recall_bound",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    expanded AS (
      SELECT e.vec_id,
             unnest(e.embedding)::DOUBLE AS ev,
             unnest(q.qv)::DOUBLE AS qe
      FROM embeddings e, q),
    dots AS (
      SELECT vec_id, sum(ev*qe) AS dot,
             sqrt(sum(ev*ev)) AS na, sqrt(sum(qe*qe)) AS nb
      FROM expanded GROUP BY vec_id)
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           round(max(dot/(na*nb)), 4) AS exact_top1_cos,
           TRUE AS pool_recall_ge_05
    FROM dots
    """,
    doc=(
        "Two-stage ANN contract for the JL projection "
        "(q_emb_ann_recall_bounds pattern): candidate pool = top-30% by "
        "cosine in the 16-dim PROJECTED space (4x fewer scan bytes), "
        "contract = the pool contains >= 5 of the exact top-10. "
        "Measured: 0.6 at sf0.001, 0.9 at sf0.01 — deliberately loose "
        "because isotropic random embeddings are JL's worst case (all "
        "cosines concentrate near 0, so ranking needs resolution below "
        "the ±ε distortion; structured real embeddings fare far "
        "better). The honest production shape: JL pool generation, "
        "exact rerank of the pool — documented as the swap-in ahead of "
        "brute force when scan bytes, not recall, bind."
    ),
)
def q_emb_rp_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..operators import similarity as sim

    emb = read_table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    n = emb.count()
    pool = max(10, int(0.3 * n))
    exact = sim.brute_force_topk(emb, qv, k=10).select("vec_id")
    proj = sim.rp_project_arr(emb, "embedding", "vec_id", out_dim=16)
    m = np.array(sim.rp_sign_matrix(len(qv), 16), dtype=np.float64)
    qp = [
        round(round(float(s), 10) / 4.0, 4) + 0.0
        for s in (m @ np.array(qv, dtype=np.float64))
    ]
    cand = sim.brute_force_topk(
        proj, qp, k=pool, vec_col="proj"
    ).select("vec_id")
    top1 = sim.brute_force_topk(emb, qv, k=1).agg(
        F.max("cos_sim").alias("exact_top1_cos")
    )
    hits = exact.join(cand, "vec_id").agg(F.count(F.lit(1)).alias("_h"))
    return (
        emb.agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .crossJoin(top1)
        .crossJoin(hits)
        .select(
            "n_vectors",
            "exact_top1_cos",
            (F.col("_h") >= 5).alias("pool_recall_ge_05"),
        )
    )


# --------------------------------------------------------------------------
# Two-window mean-shift (changepoint) detection
# --------------------------------------------------------------------------


@register(
    "q_events_mean_shift",
    """
    WITH b AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 1000000) AS BIGINT) AS m
      FROM events),
    s AS (
      SELECT event_id,
             count(*) OVER wr AS nr, count(*) OVER wp AS np,
             sum(m) OVER wr AS sr, sum(m) OVER wp AS sp
      FROM b
      WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
             wp AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 19 PRECEDING AND 10 PRECEDING))
    SELECT event_id,
           CASE WHEN nr = 10 AND np = 10 THEN
             round(abs(sr / nr - sp / np) / 1000000.0, 4) + 0.0
           END AS shift_score
    FROM s
    """,
    doc=(
        "Two-window mean-shift changepoint scores per user (operators/"
        "timeseries.mean_shift_scores): |mean(last 10) - mean(prior "
        "10)| flags LEVEL changes the point-outlier z-score misses. "
        "Page's recursive CUSUM clamp is not window-decomposable (it "
        "would force a sequential per-key scan); the two-window form "
        "keeps the detection role with two bounded frames over ONE "
        "key-clustered sort — constant per-row state. Integer micro-"
        "unit accumulation makes sums order-exact: hash-exact oracle."
    ),
)
def q_events_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import mean_shift_scores

    ev = read_table(spark, sf_dir, "events")
    return mean_shift_scores(
        ev, "user_id", ["ts", "event_id"], "value", w=10
    ).select("event_id", "shift_score")


# --------------------------------------------------------------------------
# A/B experiment readout (hash-assigned arms, exact moments, Welch t)
# --------------------------------------------------------------------------


@register(
    "q_events_ab_readout",
    """
    WITH a AS (
      SELECT CASE WHEN CAST('0x' || substr(md5('ab1-' ||
                    CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(round(value * 1000000) AS BIGINT) AS m
      FROM events WHERE value IS NOT NULL),
    st AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             sum(m) AS s, sum(CAST(m AS HUGEINT) * m) AS s2
      FROM a GROUP BY arm),
    ms AS (
      SELECT arm, n,
             s / n / 1000000.0 AS mu,
             (s2 / CAST(n AS DOUBLE) - (s / CAST(n AS DOUBLE))
              * (s / CAST(n AS DOUBLE)))
               / (n - 1) / 1000000.0 / 1000000.0 AS var_over_n_unit
      FROM st),
    w AS (
      SELECT max(CASE WHEN arm = 'A' THEN n END) AS n_a,
             max(CASE WHEN arm = 'B' THEN n END) AS n_b,
             max(CASE WHEN arm = 'A' THEN mu END) AS mu_a,
             max(CASE WHEN arm = 'B' THEN mu END) AS mu_b,
             max(CASE WHEN arm = 'A' THEN var_over_n_unit END) AS va,
             max(CASE WHEN arm = 'B' THEN var_over_n_unit END) AS vb
      FROM ms)
    SELECT n_a, n_b, round(mu_a, 4) + 0.0 AS mean_a,
           round(mu_b, 4) + 0.0 AS mean_b,
           round((mu_b - mu_a) / sqrt(va / n_a + vb / n_b), 4) + 0.0
             AS welch_t
    FROM w
    """,
    doc=(
        "A/B experiment readout: users hash-assigned to arms (the "
        "hash_bucket primitive — assignment is a pure function of the "
        "key, so arms are stable as data grows and across engines), "
        "per-arm mean and Welch t-statistic for the value metric. "
        "Moments accumulate as integer micro-units (exact, order-"
        "independent — the rolling_zscore trick) with sample variance "
        "derived from (n, sum, sum-of-squares), i.e. one map-side-"
        "combinable groupBy over the fact table and a 2-row pivot: "
        "the whole experiment readout is a single cheap aggregate "
        "however large the event log. Hash-exact oracle."
    ),
)
def q_events_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    a = ev.select(
        F.when(hash_bucket(F.col("user_id"), "ab1", 2) == 0, "A")
        .otherwise("B")
        .alias("arm"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("_m"),
    )
    st = a.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_m").alias("s"),
        # micro-units square to ~1e18 per row: a bigint accumulator
        # overflows, so the squares sum in DECIMAL(38,0) (exact), the
        # oracle's HUGEINT twin
        F.sum(F.col("_m").cast("decimal(38,0)") * F.col("_m")).alias("s2"),
    )
    ms = st.select(
        "arm",
        "n",
        (F.col("s") / F.col("n") / 1e6).alias("mu"),
        (
            (
                F.col("s2") / F.col("n").cast("double")
                - (F.col("s") / F.col("n").cast("double"))
                * (F.col("s") / F.col("n").cast("double"))
            )
            / (F.col("n") - 1)
            / 1e6
            / 1e6
        ).alias("v"),
    )
    w = ms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "A", F.col("mu"))).alias("mu_a"),
        F.max(F.when(F.col("arm") == "B", F.col("mu"))).alias("mu_b"),
        F.max(F.when(F.col("arm") == "A", F.col("v"))).alias("va"),
        F.max(F.when(F.col("arm") == "B", F.col("v"))).alias("vb"),
    )
    return w.select(
        "n_a",
        "n_b",
        (F.round(F.col("mu_a"), 4) + F.lit(0.0)).alias("mean_a"),
        (F.round(F.col("mu_b"), 4) + F.lit(0.0)).alias("mean_b"),
        (
            F.round(
                (F.col("mu_b") - F.col("mu_a"))
                / F.sqrt(F.col("va") / F.col("n_a") + F.col("vb") / F.col("n_b")),
                4,
            )
            + F.lit(0.0)
        ).alias("welch_t"),
    )


# --------------------------------------------------------------------------
# Calibration (reliability-diagram) bins
# --------------------------------------------------------------------------


@register(
    "q_docs_calibration_bins",
    """
    WITH b AS (
      SELECT CAST(n_chars AS DOUBLE) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             ntile(10) OVER (ORDER BY CAST(n_chars AS DOUBLE), doc_id)
               AS bin
      FROM documents)
    SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
           round(avg(s), 4) + 0.0 AS mean_score,
           round(sum(y) / CAST(count(*) AS DOUBLE), 4) + 0.0 AS pos_rate
    FROM b GROUP BY bin
    """,
    doc=(
        "Reliability-diagram bins (operators/evaluation."
        "calibration_bins): documents decile-binned by length, per bin "
        "mean score vs observed lang='en' rate — calibration is the "
        "complement AUC cannot see (a scorer can rank perfectly and "
        "still be uncalibrated). The exact gate reference uses a total-"
        "order ntile (ties split deterministically on doc_id); the "
        "100 TB swap-in is percentile-cutoff bin assignment "
        "(approx_percentile boundaries -> codegen lookup), same output "
        "contract without the global window. Integer ratios: "
        "hash-exact."
    ),
)
def q_docs_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import calibration_bins

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", (F.col("lang") == "en").alias("is_en")
    )
    return calibration_bins(docs, "n_chars", "is_en", "doc_id", n_bins=10)


# --------------------------------------------------------------------------
# Cross-domain quantile normalization
# --------------------------------------------------------------------------


@register(
    "q_docs_quantile_normalize",
    """
    WITH n AS (SELECT count(*) AS n FROM documents),
    r AS (
      SELECT doc_id, source, n_chars,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS pr
      FROM documents),
    p AS (
      SELECT doc_id, source, n_chars,
             CAST(round(pr * (n.n - 1)) + 1 AS BIGINT) AS pos
      FROM r CROSS JOIN n),
    g AS (
      SELECT n_chars AS norm_value,
             row_number() OVER (ORDER BY n_chars, source, doc_id) AS pos
      FROM documents)
    SELECT p.doc_id, p.source, p.n_chars, g.norm_value
    FROM p JOIN g USING (pos)
    """,
    doc=(
        "Cross-domain quantile normalization (operators/corpus."
        "quantile_normalize): map every domain's length distribution "
        "onto the global one via within-domain percent-rank -> global "
        "rank-position lookup, so one global threshold treats hot- and "
        "cold-scoring domains fairly (rank-based: monotone per-domain "
        "score transforms change nothing). Total orders everywhere "
        "(doc_id tiebreaks) make the mapping engine-deterministic; the "
        "global row_number is the oracle-exact reference, with the "
        "documented 100 TB swap-in being an approx_percentile grid "
        "joined on the rounded rank."
    ),
)
def q_docs_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import quantile_normalize

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return quantile_normalize(docs, "source", "n_chars", "doc_id")


# --------------------------------------------------------------------------
# Approx-percentile bin assignment (the scale swap-in, bound-contracted)
# --------------------------------------------------------------------------


@register(
    "q_docs_approx_bins_bound",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(10 AS BIGINT) AS n_bins_used,
           TRUE AS every_bin_within_50pct_of_ideal,
           TRUE AS bins_monotone_in_score
    FROM documents
    """,
    doc=(
        "Contract for the zero-shuffle percentile-cutoff binning "
        "(operators/evaluation.approx_bin_assign) — the documented "
        "100 TB swap-in for the exact ntile references: one single-pass "
        "percentile_approx gives the cutoffs (plan-literal model "
        "state), assignment is a codegen comparison chain that fuses "
        "into the scan. Pinned: all 10 bins occupied, every bin within "
        "50% of ideal equal-count size (sketch error is far smaller; "
        "the slack absorbs tie plateaus), and bin means monotone in "
        "the score — the property calibration consumers rely on."
    ),
)
def q_docs_approx_bins_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import approx_bin_assign

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    b = approx_bin_assign(docs, "n_chars", n_bins=10)
    stats = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("_n"), F.avg("n_chars").alias("_mu")
    )
    n = docs.count()
    ideal = n / 10.0
    from pyspark.sql import Window

    mono = (
        stats.select(
            "bin",
            "_mu",
            F.lag("_mu").over(Window.orderBy("bin")).alias("_prev"),
        )
        .select(
            F.when(F.col("_mu") < F.col("_prev"), 1).otherwise(0).alias("_v")
        )
        .agg(F.max("_v").alias("_viol"))
    )
    agg = stats.agg(
        F.count(F.lit(1)).alias("_nb"),
        F.max(F.abs(F.col("_n") - ideal) / ideal).alias("_dev"),
    )
    return (
        docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .crossJoin(agg)
        .crossJoin(mono)
        .select(
            "n_docs",
            F.col("_nb").cast("bigint").alias("n_bins_used"),
            (F.col("_dev") <= 0.5).alias("every_bin_within_50pct_of_ideal"),
            (F.col("_viol") == 0).alias("bins_monotone_in_score"),
        )
    )


@register(
    "q_docs_quantile_normalize_approx_bound",
    """
    WITH st AS (
      SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents)
    SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
           TRUE AS norms_within_global_range,
           TRUE AS monotone_within_every_group,
           TRUE AS group_extremes_align
    FROM st
    """,
    doc=(
        "Bound contract for the approx-grid quantile normalization "
        "(operators/corpus.quantile_normalize_approx — the scale "
        "swap-in for q_docs_quantile_normalize's exact global sort): "
        "all normalized values stay inside the global [min, max], the "
        "mapping is monotone within every group (rank-based by "
        "construction — a violation means the grid lookup broke), and "
        "every group's minimum maps to the global grid floor and "
        "maximum to the grid ceiling. The sketch is engine-specific, "
        "so the gate pins invariants rather than hash equality."
    ),
)
def q_docs_quantile_normalize_approx_bound(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.corpus import quantile_normalize_approx

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = quantile_normalize_approx(docs, "source", "n_chars", "doc_id")
    rng = docs.agg(
        F.min("n_chars").alias("_lo"), F.max("n_chars").alias("_hi")
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    mono = (
        out.withColumn("_prev", F.lag("norm_value").over(w))
        .select(
            F.when(F.col("norm_value") < F.col("_prev"), 1)
            .otherwise(0)
            .alias("_v")
        )
        .agg(F.max("_v").alias("_viol"))
    )
    ext = (
        out.groupBy("source")
        .agg(
            F.min("norm_value").alias("_gmin"),
            F.max("norm_value").alias("_gmax"),
        )
        .agg(
            F.count_distinct("_gmin").alias("_nmin"),
            F.count_distinct("_gmax").alias("_nmax"),
        )
    )
    chk = out.crossJoin(rng).agg(
        F.max(
            F.when(
                (F.col("norm_value") < F.col("_lo"))
                | (F.col("norm_value") > F.col("_hi")),
                1,
            ).otherwise(0)
        ).alias("_oob"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    return (
        chk.crossJoin(mono)
        .crossJoin(ext)
        .select(
            "n_docs",
            (F.col("_oob") == 0).alias("norms_within_global_range"),
            (F.col("_viol") == 0).alias("monotone_within_every_group"),
            ((F.col("_nmin") == 1) & (F.col("_nmax") == 1)).alias(
                "group_extremes_align"
            ),
        )
    )


@register(
    "q_media_wav_spectrum",
    """
    SELECT doc_id AS asset_id,
           CAST(256 AS BIGINT) AS n_samples,
           CAST(16 + (doc_id % 8) * 8 AS BIGINT) AS dominant_bin,
           round((16 + (doc_id % 8) * 8) * 31.25, 2) + 0.0 AS dominant_hz,
           TRUE AS centroid_in_band,
           TRUE AS decode_ok
    FROM documents
    """,
    doc=(
        "REAL FFT through the driver gate (operators/multimodal."
        "extract_wav_spectrum): per document a genuine PCM-16 WAV pure "
        "tone is synthesized at freq (16 + doc_id%8*8) x 31.25 Hz — "
        "BIN-ALIGNED to the 256-sample/8 kHz rFFT grid, so the decoded "
        "spectrum's argmax lands EXACTLY on the predicted bin however "
        "the float noise falls, making dominant_bin/dominant_hz "
        "analytically oracle-able with no FFT in DuckDB. The float-"
        "accumulated spectral centroid is contract-checked (within "
        "[dominant/2, Nyquist] — a pure tone's centroid hugs its "
        "frequency but int16 quantization adds a broadband floor)."
    ),
)
def q_media_wav_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import extract_wav_spectrum, wav_encode_pcm16

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for did in b["doc_id"]:
                k = 16 + int(did) % 8 * 8
                f = k * 8000 / 256
                samples = [
                    int(round(30000 * math.sin(2 * math.pi * f * i / 8000)))
                    for i in range(256)
                ]
                payloads.append(wav_encode_pcm16(samples, rate=8000))
            yield pd.DataFrame({"asset_id": b["doc_id"], "payload": payloads})

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    media = d.mapInPandas(synth, "asset_id bigint, payload binary")
    sp = extract_wav_spectrum(media)
    return sp.select(
        "asset_id",
        F.col("n_samples").cast("bigint").alias("n_samples"),
        F.col("dominant_bin").cast("bigint").alias("dominant_bin"),
        (F.round("dominant_hz", 2) + F.lit(0.0)).alias("dominant_hz"),
        (
            (F.col("spectral_centroid_hz") >= F.col("dominant_hz") / 2)
            & (F.col("spectral_centroid_hz") <= 4000.0)
        ).alias("centroid_in_band"),
        "decode_ok",
    )


@register(
    "q_emb_rp_two_stage_topk",
    None,  # approximate — quality pinned by q_emb_rp_recall_bound
    gate=False,
    doc=(
        "Operational two-stage JL retrieval (operators/similarity."
        "rp_two_stage_topk): projected 16-dim pool cut (4x fewer scan "
        "bytes; at scale the projected column is materialized at "
        "ingest) + exact rerank of the pool on full vectors. Quality "
        "contract: q_emb_rp_recall_bound."
    ),
)
def q_emb_rp_two_stage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import rp_two_stage_topk
    from .similarity_queries import _query_vec

    emb = read_table(spark, sf_dir, "embeddings")
    return rp_two_stage_topk(emb, _query_vec(spark, sf_dir), k=10)

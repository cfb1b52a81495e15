"""Lexical retrieval over the document corpus: BM25 scoring / top-k.

Extension layer (no reference counterpart). Complements the embedding ANN
stack in ``operators/similarity.py``: dense retrieval finds semantic
neighbors, BM25 finds exact-term matches — training-data pipelines use
both (e.g. retrieving eval-adjacent documents for decontamination review,
or sourcing domain-specific subsets by keyword).

Scale shape (the part that matters at 100 TB):
- The corpus is scanned ONCE; the per-document token array is built
  map-side and immediately reduced to ``(doc_id, token, tf, dl)`` for the
  handful of query terms — everything else is discarded before any
  shuffle. The term filter is an ``isin`` over a literal list, so it is
  codegen'd and pushes nothing wide.
- Corpus stats (N, avgdl) are one tiny aggregate; document frequencies of
  the query terms are a second tiny aggregate — both end up broadcast.
  The only shuffle of document-proportional data is the final
  ``groupBy(doc_id)`` over rows already restricted to query-term matches.
- Top-k is ``orderBy(...).limit(k)`` → ``TakeOrderedAndProject`` (per
  partition heap + driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: Column) -> Column:
    """Lowercased word tokens (the corpus-wide tokenizer contract shared
    with text_analysis/dedup: split on non-alphanumerics, drop empties)."""
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_tokens: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k: ``(doc_id, n_matched_terms, score)``.

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    with the Robertson-Sparck-Jones idf ``ln(1 + (N − df + 0.5)/(df + 0.5))``
    (always positive). Scores are rounded to 4 dp and the ordering ties
    break on ``doc_id`` so the top-k cut is total and engine-independent.

    Only documents matching ≥1 query term are scored (BM25 gives
    non-matches score 0; they can never enter the top-k above a match).
    """
    if not query_tokens:
        raise ValueError("bm25_topk: query_tokens must be non-empty")
    q = sorted({t.lower() for t in query_tokens})

    toks = df.select(
        F.col(id_col).alias("_id"), _tokens(F.col(text_col)).alias("_toks")
    )
    dl = toks.select("_id", F.size("_toks").alias("_dl"))
    # N and avgdl over the WHOLE corpus (not just matches) — one scalar row.
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    # (doc, term) term frequencies, restricted to the query terms before the
    # shuffle; _dl rides along (constant per doc).
    tf = (
        toks.select("_id", F.size("_toks").alias("_dl"), F.explode("_toks").alias("_t"))
        .filter(F.col("_t").isin(q))
        .groupBy("_id", "_t")
        .agg(F.count(F.lit(1)).alias("_tf"), F.max("_dl").alias("_dl"))
    )
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        tf.join(F.broadcast(dfreq), "_t")
        .crossJoin(F.broadcast(stats))
        .select(
            "_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                )
                * (F.col("_tf") * (k1 + 1))
                / (
                    F.col("_tf")
                    + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched_terms"),
            F.round(F.sum("_s"), 4).alias("score"),
        )
    )
    return (
        scored.select(F.col("_id").alias(id_col), "n_matched_terms", "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
    shard_size: int = 1000,
) -> DataFrame:
    """Build sharded posting lists: one row per ``(token, shard)`` with
    ``(df_total, cf_total, n_postings, postings)`` where ``postings`` is
    the comma-joined ``doc:tf`` list sorted by doc id — the on-disk
    layout of a lexical search index, produced as a plain table.

    Sharding is the 100 TB answer to the stopword problem: a frequent
    token's posting list is millions of ids — as ONE collect_list row it
    is a straggler and an OOM. Splitting every ``shard_size`` postings
    (by doc-id rank, so shards are contiguous id ranges, mergeable by
    concatenation) bounds each output row; df/cf totals ride along on
    every shard so consumers never need a second pass. The doc-rank
    window and the per-shard aggregation both cluster on the token key —
    one logical repartition; tf counting is map-side combinable.
    """
    tf = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(_tokens(F.col(text_col))).alias("_t"),
        )
        .groupBy("_t", "_id")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    w = Window.partitionBy("_t").orderBy("_id")
    stats = Window.partitionBy("_t")
    return (
        tf.select(
            "_t",
            "_id",
            "_tf",
            F.floor((F.row_number().over(w) - 1) / shard_size).alias("shard"),
            F.count(F.lit(1)).over(stats).alias("df_total"),
            F.sum("_tf").over(stats).alias("cf_total"),
        )
        .filter(F.col("df_total") >= min_df)
        .groupBy(F.col("_t").alias("token"), "shard", "df_total", "cf_total")
        .agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_id", "_tf"))),
                    lambda s: F.concat_ws(
                        ":",
                        s["_id"].cast("string"),
                        s["_tf"].cast("string"),
                    ),
                ),
                ",",
            ).alias("postings"),
        )
    )

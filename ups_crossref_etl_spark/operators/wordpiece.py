"""WordPiece subword tokenization (greedy longest-match-first inference).

The third of the three standard subword tokenizer families (Wu et al.
2016, "Google's Neural Machine Translation System"; Devlin et al. 2018
made it BERT's tokenizer): ``operators/bpe.py`` covers the merge-based
family, ``operators/unigram.py`` the probabilistic one, and this module
the deterministic greedy one — at each position emit the LONGEST vocab
piece that matches, with separate piece inventories for word-initial
and continuation positions (the ``##`` convention). Pipelines run this
to tokenize a corpus under an existing WordPiece vocab; the vocab here
is frequency-derived from the corpus itself (positional character
n-grams), keeping the operator self-contained and oracle-checkable
while exercising exactly the production matcher.

Reference parity note: no counterpart in /root/reference (a
SQLite/pandas bibliometric ETL) — LLM-training-data extension surface.

Determinism contract: greedy longest-match is a pure function of
(word, vocab) — at a fixed position and length at most one vocab string
can equal the substring, so there are no ties to break and no floats
anywhere. Single characters are kept in BOTH inventories
unconditionally, so every corpus word is coverable and the ``[UNK]``
fallback (kept for foreign-vocab robustness) never fires on the
training corpus itself.

Scale shape (100 TB), same as the sibling tokenizers:
- word counting is ONE corpus shuffle with map-side combine;
- candidate pieces are generated row-locally over the DISTINCT-word
  table and aggregated by one (piece, is_cont)-keyed groupBy bounded by
  the positional char-n-gram space — a broadcastable model regardless
  of corpus size;
- greedy matching runs per DISTINCT word (vocab-sized, not
  corpus-sized) in an Arrow-batched ``mapInPandas`` with the piece set
  a task-closure constant; corpus tokenization is then a broadcast join
  of the segmented vocab onto (doc, word) rows — the Zipf head is
  segmented once, not once per occurrence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

__all__ = ["wordpiece_vocab", "wordpiece_segment_words"]


def wordpiece_vocab(
    wc: DataFrame, max_piece_len: int = 6, min_count: int = 0
) -> DataFrame:
    """Frequency-derived positional piece vocabulary from a
    ``(word, cnt)`` table: every substring of length 1..``max_piece_len``
    of every distinct word, split into word-INITIAL pieces (start
    position 1) and CONTINUATION pieces (start > 1), weighted by word
    count. Pieces below ``min_count`` are pruned EXCEPT single
    characters (kept unconditionally in both inventories — the coverage
    guarantee). Returns ``(piece, is_cont, piece_cnt)``.
    """
    pieces = (
        wc.withColumn(
            "_i", F.explode(F.sequence(F.lit(1), F.length("word")))
        )
        .withColumn(
            "_L",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len),
                        F.length("word") - F.col("_i") + 1,
                    ),
                )
            ),
        )
        .select(
            F.expr("substr(word, _i, _L)").alias("piece"),
            (F.col("_i") > 1).alias("is_cont"),
            F.col("cnt"),
        )
    )
    agg = pieces.groupBy("piece", "is_cont").agg(
        F.sum("cnt").cast("bigint").alias("piece_cnt")
    )
    return agg.filter(
        (F.length("piece") == 1) | (F.col("piece_cnt") >= F.lit(min_count))
    )


def _greedy(word: str, initial: set, cont: set, max_len: int) -> tuple[str, int]:
    """Greedy longest-match segmentation: (space-joined pieces with the
    ``##`` continuation convention, piece count); ``('[UNK]', 1)`` when
    some position has no matching piece (impossible when the vocab keeps
    all single chars of the word's alphabet)."""
    n = len(word)
    pos = 0
    out: list[str] = []
    while pos < n:
        table = initial if pos == 0 else cont
        match = None
        for L in range(min(max_len, n - pos), 0, -1):
            p = word[pos : pos + L]
            if p in table:
                match = p
                break
        if match is None:
            return "[UNK]", 1
        out.append(match if pos == 0 else "##" + match)
        pos += len(match)
    return " ".join(out), len(out)


def wordpiece_segment_words(
    wc: DataFrame, vocab: DataFrame, max_piece_len: int = 6
) -> DataFrame:
    """Greedy-segment every DISTINCT word under ``vocab``.

    Returns ``(word, cnt, seg, n_pieces)``. The piece sets are collected
    once (bounded: positional char-n-gram space) into the task closure;
    segmentation is one Arrow-batched map over the vocab-sized word
    table — corpus-scale tokenization is a broadcast join of this result
    back onto (doc, word) rows, never per-occurrence matching.
    """
    rows = vocab.select("piece", "is_cont").collect()
    initial = {r["piece"] for r in rows if not r["is_cont"]}
    cont = {r["piece"] for r in rows if r["is_cont"]}

    out_schema = StructType(
        [
            StructField("word", StringType()),
            StructField("cnt", LongType()),
            StructField("seg", StringType()),
            StructField("n_pieces", LongType()),
        ]
    )

    def seg_batch(it):
        for pdf in it:
            segs, cnts = [], []
            for w in pdf["word"]:
                s, c = _greedy(w, initial, cont, max_piece_len)
                segs.append(s)
                cnts.append(c)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "cnt": pdf["cnt"],
                    "seg": segs,
                    "n_pieces": cnts,
                }
            )

    return wc.mapInPandas(seg_batch, schema=out_schema)

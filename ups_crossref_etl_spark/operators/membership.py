"""Deterministic Bloom-filter membership — set-probe without the set.

The scale problem this solves: decontamination and blocklist checks are
"is this value in that set" probes where the set (eval-suite n-grams,
known-bad URLs) is far smaller than the corpus but too large to ship as
an ``isin`` literal, and an exact anti-join shuffles the CORPUS on the
probe key. A Bloom filter compresses the set to a fixed bitmap that
BROADCASTS (here: ``num_words`` 32-bit words in bigints — a few KB),
so the corpus-side probe is a map-side broadcast join + bit test: zero
corpus shuffles, no false negatives, and a false-positive rate of
``(set_bits/m)^k`` that the operator makes deterministic rather than
implementation-defined.

Determinism is the design center (and what makes this oracle-checkable
where ``DataFrameStatFunctions.bloomFilter`` — driver-side, murmur-based,
JVM-internal — is not): bit positions come from the md5_60 trick shared
with ``dedup.simhash_table`` (first 15 hex chars of ``md5(i ':' value)``
as a 60-bit int, mod m), which DuckDB reproduces bit-for-bit via
``CAST('0x' || substr(md5(..),1,15) AS BIGINT)``. Words hold 32 bits
each (in BIGINT) so no engine ever shifts into the sign bit — signed
<<63 overflow is exactly where engines disagree.

Extension layer: no reference counterpart
(src/barrazueta_pipeline_etl_crossref.py has no membership surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_probe"]

_BITS_PER_WORD = 32


def _positions(value_col, num_hashes: int, m: int):
    """Array of ``num_hashes`` bit positions for one value — row-local
    codegen (md5 + conv + mod per hash), no UDF."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(num_hashes)),
        lambda i: (
            F.conv(
                F.substring(
                    F.md5(F.concat(i.cast("string"), F.lit(":"), value_col)),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % m
        ),
    )


def bloom_build(
    df: DataFrame, value_col: str, num_words: int = 256, num_hashes: int = 3
) -> DataFrame:
    """Build the bitmap: one row per NONZERO word — ``(word_idx bigint,
    word bigint)``, each word holding 32 bits. One explode (``num_hashes``
    rows per set element — set-sized, not corpus-sized) and one
    map-side-combinable ``bit_or`` groupBy; the result is at most
    ``num_words`` rows regardless of set size, i.e. always broadcastable.
    """
    m = _BITS_PER_WORD * num_words
    pos = df.select(
        F.explode(_positions(F.col(value_col), num_hashes, m)).alias("_pos")
    )
    return (
        pos.select(
            F.floor(F.col("_pos") / _BITS_PER_WORD).cast("bigint").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {_BITS_PER_WORD} AS INT))"
            ).alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    value_col: str,
    id_col: str,
    bloom: DataFrame,
    num_words: int = 256,
    num_hashes: int = 3,
    out_col: str = "might_contain",
) -> DataFrame:
    """Probe: ``(id_col, out_col)`` — true iff ALL ``num_hashes`` bits of
    the value are set (never false for a true member; false positives at
    the documented rate). Plan shape: row-local position generation →
    broadcast left join on ``word_idx`` (the bitmap side is ≤ num_words
    rows) → bit test → ``bool_and`` groupBy on the probe id. The only
    probe-sized shuffle is the final id-keyed groupBy, which partial-aggs
    ``num_hashes`` rows per id map-side; a missing word row means no bits
    set in that word (coalesce to 0).

    ``num_words``/``num_hashes`` MUST match the build — they define the
    hash family, so a mismatch is a different filter, not an error Spark
    can see.
    """
    m = _BITS_PER_WORD * num_words
    pos = df.select(
        F.col(id_col).alias("_pid"),
        F.explode(_positions(F.col(value_col), num_hashes, m)).alias("_pos"),
    ).select(
        "_pid",
        F.floor(F.col("_pos") / _BITS_PER_WORD).cast("bigint").alias("word_idx"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {_BITS_PER_WORD} AS INT))"
        ).alias("_mask"),
    )
    hit = pos.join(F.broadcast(bloom), "word_idx", "left").select(
        "_pid",
        (
            F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("_mask"))
            == F.col("_mask")
        ).alias("_hit"),
    )
    return hit.groupBy("_pid").agg(F.bool_and("_hit").alias(out_col)).select(
        F.col("_pid").alias(id_col), out_col
    )

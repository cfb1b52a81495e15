"""Edit-distance similarity join via deletion neighborhoods (FastSS).

Extension layer — no counterpart in /root/reference (its author and
affiliation merges are exact-key only; the nearest sibling here is the
rare-token-blocked ``operators/linkage.fuzzy_match_pairs``, whose token
blocking is a *recall heuristic*). This operator is the COMPLETE
variant for small edit radii: Bocek et al. 2007 ("Fast Similarity
Search in Large Dictionaries", FastSS) — two strings are within edit
distance k only if deleting ≤ k characters from each can produce a
common string, so the candidate set from equi-joining the
≤-k-deletion neighborhoods is a *superset* of every true pair
(alignment argument: an optimal ≤ k-op edit script marks ≤ k positions
per side; deleting exactly those yields the same subsequence). Exact
``levenshtein`` verification on candidates then makes the result
EXACTLY ``{(a, b) : ed(a, b) <= k}`` — which is why the gate oracle is
a brute-force DuckDB twin rather than a mirror of the blocking.

Scale shape (100 TB corpus → distinct-string dictionary):
- Neighborhoods are generated row-locally over the DISTINCT-string
  table (vocab-sized, not corpus-sized): ~L^k variants per string of
  length L, all inside whole-stage codegen (explode + substring —
  no Python).
- The candidate join shuffles ``xxhash64(variant)`` (8 bytes) plus the
  short dictionary strings, never corpus text; hash collisions are
  harmless because verification is exact.
- Verification (``F.levenshtein``) is JVM codegen on candidates only.
- Bucket sizes are bounded by how many dictionary strings share a
  (len-k)-length subsequence — Zipf-shaped but shallow for k ≤ 2; the
  plan contains no CartesianProduct (pinned in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "edit_distance_join"]


def deletion_variants(
    df: DataFrame, text_col: str, id_col: str, max_edit: int
) -> DataFrame:
    """Distinct ``(id_col, text_col, variant)`` rows where ``variant``
    ranges over every string reachable from ``text_col`` by deleting at
    most ``max_edit`` characters (including the string itself —
    deletion position 0 below means "keep")."""
    if max_edit not in (1, 2):
        raise ValueError("max_edit must be 1 or 2")
    out = df.select(id_col, text_col).withColumn(
        "_v", F.col(text_col)
    )
    for _ in range(max_edit):
        out = out.withColumn(
            "_i", F.explode(F.sequence(F.lit(0), F.length("_v")))
        ).withColumn(
            "_v",
            F.when(F.col("_i") == 0, F.col("_v")).otherwise(
                F.concat(
                    F.expr("substring(_v, 1, _i - 1)"),
                    F.expr("substring(_v, _i + 1, length(_v))"),
                )
            ),
        )
    return out.select(
        id_col, text_col, F.col("_v").alias("variant")
    ).distinct()


def edit_distance_join(
    df: DataFrame, text_col: str, id_col: str, max_edit: int = 1
) -> DataFrame:
    """All pairs of distinct rows with ``levenshtein(text) <= max_edit``
    — exact, via complete FastSS candidate generation plus JVM
    verification. Returns ``(id_a, id_b, text_a, text_b, edit_dist)``
    with ``id_a < id_b``."""
    va = deletion_variants(df, text_col, id_col, max_edit).select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
        F.xxhash64("variant").alias("_h"),
    )
    vb = deletion_variants(df, text_col, id_col, max_edit).select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
        F.xxhash64("variant").alias("_h"),
    )
    cand = (
        va.join(vb, on=["_h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        "text_a",
        "text_b",
        F.levenshtein("text_a", "text_b").cast("int").alias("edit_dist"),
    ).filter(F.col("edit_dist") <= max_edit)

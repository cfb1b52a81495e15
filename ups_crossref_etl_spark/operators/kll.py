"""KLL-style mergeable quantile sketch (deterministic compaction).

Extension layer — no counterpart in /root/reference (a SQLite/pandas
bibliometric ETL). The training-pipeline use: percentile cutoffs over a
100 TB column (sequence lengths, quality scores, loss values) in ONE
pass with a fixed-size mergeable summary, where an exact percentile
would need a full sort and ``percentile_approx``'s GK state is opaque
to cross-engine contracts. This module owns the sketch so its error is
a *measured contract* (``q_events_kll_quantiles_bound``), not an
engine-version property.

Design (Karnin-Lang-Liberty 2016, determinised):

- **Levels of buffers.** Level ``l`` holds items each standing for
  ``2^l`` original rows. A full level (> k items) is *compacted*: sort,
  keep alternate items, promote the survivors to level ``l+1``.
- **Deterministic compaction.** Canonical KLL flips a coin for the
  even/odd offset; we always keep EVEN indices of the sorted buffer.
  Bias is one-sided per compaction but bounded: each compaction at
  level ``l`` perturbs ranks by ≤ 2^l, and there are ≤ n/(k·2^l)
  compactions per level, so total rank error ≤ n·log2(n/k)/k — with
  the default k=200 that is well inside the 5 % contract the gate pins.
  Determinism buys exact re-runnability (same data + partitioning →
  same estimates), which the driver's hash gate and FULLCHECK re-runs
  require of everything they touch.
- **Mergeability.** Merge = concatenate per-level buffers, re-compact.
  Associative up to compaction order; the bound holds for any merge
  tree, which is what makes the sketch a partial aggregate at 100 TB:
  one ``mapInPandas`` pass builds a per-partition sketch (map-side,
  zero shuffle of raw values), the driver merges the ≤ numPartitions
  fixed-size partials — kilobytes of model state, the same bounded
  ``collect()`` discipline as k-means centroids and BPE merge tables.

Scale shape: the ONLY data-sized work is the single map pass; shuffle
carries nothing (partials come back through the driver); quantile
evaluation is arithmetic on the merged summary.
"""

from __future__ import annotations

import json
from typing import Iterator, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "KLLSketch",
    "kll_build",
    "kll_quantiles",
    "kll_group_quantiles",
]


class KLLSketch:
    """Levels of sorted buffers; level ``l`` items weigh ``2^l`` rows."""

    def __init__(self, k: int = 200) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: List[List[float]] = [[]]
        self.n = 0

    def update_many(self, values: Sequence[float]) -> None:
        self.levels[0].extend(float(v) for v in values)
        self.n += len(values)
        self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for l, buf in enumerate(other.levels):
            self.levels[l].extend(buf)
        self.n += other.n
        self._compress()
        return self

    def _compress(self) -> None:
        l = 0
        while l < len(self.levels):
            buf = self.levels[l]
            if len(buf) > self.k:
                buf.sort()
                promoted = buf[0::2]  # deterministic: keep EVEN indices
                self.levels[l] = []
                if l + 1 == len(self.levels):
                    self.levels.append([])
                self.levels[l + 1].extend(promoted)
            l += 1

    def quantile(self, p: float) -> float:
        """Value whose estimated rank is closest at-or-above ``p * n``
        (the smallest summary item whose cumulative weight reaches the
        target), ties broken by value order — a pure function of the
        summary."""
        if self.n == 0:
            raise ValueError("empty sketch")
        items: List[tuple] = []
        for l, buf in enumerate(self.levels):
            w = 1 << l
            items.extend((v, w) for v in buf)
        items.sort(key=lambda t: t[0])
        total = sum(w for _, w in items)
        target = p * total
        cum = 0
        for v, w in items:
            cum += w
            if cum >= target:
                return v
        return items[-1][0]

    def to_json(self) -> str:
        return json.dumps({"k": self.k, "n": self.n, "levels": self.levels})

    @classmethod
    def from_json(cls, s: str) -> "KLLSketch":
        d = json.loads(s)
        sk = cls(k=d["k"])
        sk.n = d["n"]
        sk.levels = [[float(v) for v in buf] for buf in d["levels"]]
        return sk


def kll_build(df: DataFrame, value_col: str, k: int = 200) -> KLLSketch:
    """Build a merged sketch of ``value_col`` (NULLs ignored): one
    map-only ``mapInPandas`` pass emits a per-partition serialized
    partial, the driver merges them in partition order (deterministic).
    """
    schema = StructType(
        [
            StructField("part", LongType()),
            StructField("sketch", StringType()),
        ]
    )
    kk = int(k)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = KLLSketch(k=kk)
        pid = -1
        for pdf in batches:
            if len(pdf) and pid < 0:
                pid = int(pdf["part"].iloc[0])
            vals = pdf["v"].dropna()
            if len(vals):
                sk.update_many(vals.to_numpy())
        if sk.n:
            yield pd.DataFrame({"part": [pid], "sketch": [sk.to_json()]})

    partials = (
        df.select(
            F.spark_partition_id().cast("long").alias("part"),
            F.col(value_col).cast("double").alias("v"),
        )
        .mapInPandas(build, schema=schema)
        .collect()  # bounded: <= numPartitions rows of fixed-size JSON
    )
    merged = KLLSketch(k=kk)
    for row in sorted(partials, key=lambda r: r["part"]):
        merged.merge(KLLSketch.from_json(row["sketch"]))
    return merged


def kll_quantiles(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    probs: Sequence[float],
    k: int = 200,
) -> DataFrame:
    """``(p, est)`` for each probability in ``probs`` from one merged
    sketch of ``value_col``."""
    sk = kll_build(df, value_col, k=k)
    rows = [(float(p), float(sk.quantile(p))) for p in probs]
    schema = StructType(
        [StructField("p", DoubleType()), StructField("est", DoubleType())]
    )
    return spark.createDataFrame(rows, schema)


def kll_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: Sequence[float],
    k: int = 200,
) -> DataFrame:
    """Per-group sketch quantiles: ``(group_col, p, est)`` for each
    probability — the grouped-percentile primitive (billions of keys ×
    a fixed-size sketch each, where an exact per-group sort is the
    thing being avoided). One ``applyInPandas`` pass; per-group state
    is the O(k·log(n/k)) sketch.

    Exactness regimes: a group with n <= k rows never compacts, so its
    estimate IS the exact order statistic at rank ceil(p·n) — which is
    what the gate query pins hash-exactly; the compaction regime's
    error is pinned by ``q_events_kll_quantiles_bound``. (No sorting
    needed for determinism in the exact regime — an uncompacted sketch
    is arrival-order-free by construction.)"""
    ps = [float(p) for p in probs]
    kk = int(k)
    out_schema = StructType(
        [
            StructField("g", StringType()),
            StructField("p", DoubleType()),
            StructField("est", DoubleType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KLLSketch(k=kk)
        vals = pdf["v"].dropna()
        if not len(vals):
            return pd.DataFrame({"g": [], "p": [], "est": []})
        sk.update_many(vals.to_numpy())
        g = pdf["g"].iloc[0]
        return pd.DataFrame(
            {
                "g": [g] * len(ps),
                "p": ps,
                "est": [float(sk.quantile(p)) for p in ps],
            }
        )

    return (
        df.select(
            F.col(group_col).cast("string").alias("g"),
            F.col(value_col).cast("double").alias("v"),
        )
        .groupBy("g")
        .applyInPandas(per_group, schema=out_schema)
        .select(F.col("g").alias(group_col), "p", "est")
    )

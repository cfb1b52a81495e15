"""Single-pass table profiling — the ANALYZE/stats-collection feature a
lake engine needs before it can make size/skew-aware decisions (broadcast
thresholds, bucketing keys, partition layout; the reference inspects its
SQLite tables by hand, src/barrazueta_pipeline_etl_crossref.py has no
stats surface).

One aggregate job computes every column's stats simultaneously —
``n_rows × n_cols`` cells are reduced map-side in a single pass, never
one job per column (the naive loop is ``n_cols`` full scans; on 100 TB
that is the difference between minutes and a day). The wide single-row
aggregate is then unpivoted row-locally to ``one row per column``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column stats in ONE scan: ``(column, n_rows, n_null,
    n_distinct, min_str, max_str)``.

    min/max are projected to strings so heterogeneous column types share
    one output schema (numeric min/max stay numerically ordered — the
    ordering happens BEFORE the cast). ``n_distinct`` is exact
    ``count_distinct`` (nulls excluded, matching SQL COUNT(DISTINCT));
    swap in ``approx_count_distinct`` at 100 TB — same plan shape, the
    HLL sketch merges map-side exactly like the exact two-phase
    distinct."""
    prof = _profile_scaffold(
        df, cols, lambda col: F.count_distinct(col), "n_distinct"
    )
    return prof.withColumn("n_distinct", F.col("n_distinct").cast("bigint"))


def _profile_scaffold(df: DataFrame, cols: list[str], distinct_agg, field: str):
    """The single-scan agg+stack unpivot both profile variants share;
    ``distinct_agg`` supplies the per-column distinct aggregate (exact
    count_distinct or an HLL sketch) landing in column ``field``."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            distinct_agg(col).alias(f"_dist_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"_null_{c}"),
            F.col(f"_dist_{c}"),
            F.col(f"_min_{c}"),
            F.col(f"_max_{c}"),
        ]
    return one.select(
        F.col("_n").alias("n_rows"),
        F.stack(F.lit(len(cols)), *stack_args).alias(
            "column", "n_null", field, "min_str", "max_str"
        ),
    ).select(
        "column",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_null").cast("bigint").alias("n_null"),
        field,
        "min_str",
        "max_str",
    )


def profile_drift(df_a: DataFrame, df_b: DataFrame, cols: list[str]) -> DataFrame:
    """Schema-drift / data-drift audit between two snapshots of a table:
    profile both (one single-pass aggregate each — see
    ``profile_columns``), join per column, and emit the drift signals a
    lake monitor alerts on — null-fraction delta, distinct-count ratio,
    and whether the min/max bounds moved. This is the BATCH pre-flight
    that catches a broken upstream writer (nulls exploding, a column
    collapsing to one value, out-of-range timestamps) before 100 TB of
    bad rows land; cost is two single scans regardless of column count.

    Returns one row per column:
    ``(column, n_rows_a, n_rows_b, null_frac_a, null_frac_b,
    null_frac_delta, n_distinct_a, n_distinct_b, bounds_changed)``;
    fractions rounded 4dp."""
    pa = profile_columns(df_a, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_null").alias("_null_a"),
        F.col("n_distinct").alias("n_distinct_a"),
        F.col("min_str").alias("_min_a"),
        F.col("max_str").alias("_max_a"),
    )
    pb = profile_columns(df_b, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_null").alias("_null_b"),
        F.col("n_distinct").alias("n_distinct_b"),
        F.col("min_str").alias("_min_b"),
        F.col("max_str").alias("_max_b"),
    )
    j = pa.join(pb, "column")  # both sides are n_cols rows — trivially small
    fa = F.round(F.col("_null_a") / F.col("n_rows_a"), 4)
    fb = F.round(F.col("_null_b") / F.col("n_rows_b"), 4)
    return j.select(
        "column",
        "n_rows_a",
        "n_rows_b",
        fa.alias("null_frac_a"),
        fb.alias("null_frac_b"),
        F.round(fb - fa, 4).alias("null_frac_delta"),
        "n_distinct_a",
        "n_distinct_b",
        (
            (F.col("_min_a") != F.col("_min_b"))
            | (F.col("_max_a") != F.col("_max_b"))
        ).alias("bounds_changed"),
    )


def _row_hash_60(cols: list[str]):
    """md5_60 row hash over '|'-joined column strings (NULL -> the
    ``<NULL>`` sentinel so (a, NULL) and (a, '') hash differently).
    Shared by ``table_digest`` and ``shard_manifest`` — the two must
    stay bit-identical or shard manifests stop being comparable to
    whole-table digests."""
    from pyspark.sql import functions as F

    parts = [F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")) for c in cols]
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10
    ).cast("bigint")


def table_digest(df, cols: list[str]):
    """Order-insensitive content digest of selected columns: one row
    ``(n_rows, digest)`` where ``digest = bit_xor`` of each row's md5_60
    hash over the ``'|'``-joined column strings (nulls → the sentinel
    ``<NULL>`` so (a, NULL) and (a, '') hash differently).

    The snapshot-comparison primitive: after a migration/backfill/
    compaction, ``digest(before) == digest(after)`` verifies content
    equality without sorting or moving either table — one map-only scan
    + a single-row XOR aggregate (commutative ⇒ partitioning- and
    order-independent; map-side combinable). XOR cancels PAIRS of
    identical rows, so this is an equality check for tables with the
    same multiset parity, not a cryptographic commitment — the standard
    trade for a free-aggregation digest; pair it with ``n_rows`` (also
    returned) which catches the duplicated+dropped-row case. Columns
    must be integer/string-typed: float-to-string rendering differs
    across engines, so callers quantize/cast floats first.
    """
    from pyspark.sql import functions as F

    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.bit_xor(_row_hash_60(cols)).alias("digest"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    cutoffs: list[float],
    round_digits: int = 4,
) -> DataFrame:
    """Population Stability Index between two snapshots of a value
    column — the distributional complement of ``profile_drift`` (which
    sees nulls/bounds/distincts move but not the SHAPE shifting inside
    unchanged bounds). PSI = Σ_bins (p−q)·ln(p/q); the industry alert
    thresholds are ~0.1 (investigate) / ~0.25 (act).

    ``cutoffs`` are inlined as plan literals (pick them once from the
    reference snapshot's quantiles — ``approx_percentile`` at scale, the
    calibration-bins swap-in), so binning is a codegen comparison chain
    fused into both scans; each side then pays ONE map-side-combinable
    bin-count aggregate whose output is bins-sized. Empty bins are
    ε-smoothed (1e-6) on both engines so the log never sees zero.

    Determinism: bin fractions are exact rationals; each bin's PSI term
    converts to integer MICRO-units (``round(term*1e6)``) before the
    final sum, so the total is exact int64 math (the repo's
    round-before-compare rule; a 10-double sum would be fold-order
    noise). Returns per-bin rows (``bin``, ``frac_a``, ``frac_b``,
    ``term``) plus a ``bin=-1`` TOTAL row carrying the PSI.
    """
    eps = 1e-6

    def binned(df, tag):
        b = F.lit(len(cutoffs))
        for i, c in enumerate(reversed(cutoffs)):
            b = F.when(
                F.col(value_col) < F.lit(float(c)), F.lit(len(cutoffs) - 1 - i)
            ).otherwise(b)
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(f"_n_{tag}"))
        )

    a, bdf = binned(df_a, "a"), binned(df_b, "b")
    grid = df_a.sparkSession.range(0, len(cutoffs) + 1).select(
        F.col("id").cast("int").alias("bin")
    )
    j = (
        grid.join(a, "bin", "left")
        .join(bdf, "bin", "left")
        .select(
            "bin",
            F.coalesce("_n_a", F.lit(0)).alias("_na"),
            F.coalesce("_n_b", F.lit(0)).alias("_nb"),
        )
    )
    # totals come from the bins-sized aggregates themselves — the
    # histogram already saw every non-null row; a separate count()
    # would re-scan each input
    tot = j.agg(
        F.sum("_na").cast("double").alias("_ta"),
        F.sum("_nb").cast("double").alias("_tb"),
    )
    j = j.crossJoin(F.broadcast(tot))
    p = F.col("_na") / F.col("_ta") + F.lit(eps)
    q = F.col("_nb") / F.col("_tb") + F.lit(eps)
    term_micro = F.round((p - q) * F.log(p / q) * 1_000_000.0, 0).cast("bigint")
    per_bin = j.select(
        F.col("bin").cast("long").alias("bin"),
        F.round(F.col("_na") / F.col("_ta"), round_digits).alias("frac_a"),
        F.round(F.col("_nb") / F.col("_tb"), round_digits).alias("frac_b"),
        F.round(term_micro / 1_000_000.0, round_digits).alias("term"),
        term_micro.alias("_tm"),
    )
    total = per_bin.agg(
        F.lit(-1).cast("long").alias("bin"),
        F.lit(None).cast("double").alias("frac_a"),
        F.lit(None).cast("double").alias("frac_b"),
        F.round(F.sum("_tm") / 1_000_000.0, round_digits).alias("term"),
    )
    return per_bin.drop("_tm").unionByName(total)


def shard_manifest(
    df: DataFrame,
    key_col: str,
    cols: list[str],
    num_shards: int = 16,
    seed: str = "shard",
) -> DataFrame:
    """Verification manifest for a sharded training-data export: per
    shard, the row count and the order-insensitive XOR content digest
    (``table_digest`` semantics, grouped). A consumer re-derives the
    manifest from the files it received and diffs — detecting a
    truncated, duplicated, or silently-corrupted shard without
    re-reading the producer's copy; a re-export after compaction is
    provably content-identical shard by shard. Shard ids reuse
    ``sampling.hash_bucket`` — the exact assignment
    ``sinks.write_training_shards`` writes, so the manifest matches the
    physical layout key for key.

    One map-only hash pass + ONE shards-sized grouped aggregate
    (map-side combinable; XOR and count are both commutative).
    """
    from ..operators.sampling import hash_bucket

    return (
        df.withColumn("shard", hash_bucket(F.col(key_col), seed, num_shards))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.bit_xor(_row_hash_60(cols)).alias("digest"),
        )
        .select(F.col("shard").cast("long").alias("shard"), "n_rows", "digest")
    )


def merge_profiles(
    stored: DataFrame, increment: DataFrame, numeric_cols: list[str] | None = None
) -> DataFrame:
    """Incremental statistics maintenance: fold a new partition's
    ``profile_columns`` output into the stored table profile WITHOUT
    rescanning history — the append-only lake pattern (profile each
    landed partition once; the table profile is the running merge).

    counts and null-counts add; min/max take the extremes. CAVEAT,
    stated loudly: ``n_distinct`` is NOT mergeable from exact per-part
    distinct counts (the parts may overlap in values) — the merged
    value here is ``NULL`` to refuse a wrong answer. A mergeable
    distinct needs the sketch form: keep per-partition HLL sketches
    (``operators/sketches``' mergeable HLL tables / Spark's
    ``approx_count_distinct`` partials) and merge THOSE — same lake
    layout, sketch column instead of a number.

    Caveat 2: ``profile_columns`` projects min/max to STRINGS, whose
    lexicographic order disagrees with numeric order ('128' < '47') —
    so columns named in ``numeric_cols`` are COMPARED as doubles while
    keeping the winner's original string rendering. Both caveats are
    the reason this helper exists: the merge rules are easy to get
    silently wrong, so they live in ONE place.

    Input/output schema = ``profile_columns``'s. Classes-sized join —
    trivially small.
    """
    a = stored.alias("a")
    b = increment.alias("b")
    j = a.join(b, F.col("a.column") == F.col("b.column"), "full_outer")
    pick = lambda c: F.coalesce(F.col(f"a.{c}"), F.col(f"b.{c}"))  # noqa: E731
    both = F.col("a.column").isNotNull() & F.col("b.column").isNotNull()
    return j.select(
        F.coalesce(F.col("a.column"), F.col("b.column")).alias("column"),
        (F.coalesce(F.col("a.n_rows"), F.lit(0)) + F.coalesce(F.col("b.n_rows"), F.lit(0)))
        .cast("bigint")
        .alias("n_rows"),
        (F.coalesce(F.col("a.n_null"), F.lit(0)) + F.coalesce(F.col("b.n_null"), F.lit(0)))
        .cast("bigint")
        .alias("n_null"),
        F.when(both, F.lit(None).cast("bigint"))
        .otherwise(pick("n_distinct").cast("bigint"))
        .alias("n_distinct"),
        F.when(both, _extreme("min_str", numeric_cols or [], smaller=True))
        .otherwise(pick("min_str"))
        .alias("min_str"),
        F.when(both, _extreme("max_str", numeric_cols or [], smaller=False))
        .otherwise(pick("max_str"))
        .alias("max_str"),
    )


def _extreme(field: str, numeric_cols: list[str], smaller: bool):
    """Pick a/b's min_str-or-max_str: numeric comparison for columns in
    ``numeric_cols`` (keeping the winner's original string), string
    comparison otherwise. NULL on either side yields the other side —
    an all-NULL partition must not erase the stored extreme (a NULL
    comparison would otherwise fall through to the wrong branch)."""
    av, bv = F.col(f"a.{field}"), F.col(f"b.{field}")
    num = F.col("a.column").isin(numeric_cols)
    a_num, b_num = av.cast("double"), bv.cast("double")
    if smaller:
        num_pick = F.when(a_num <= b_num, av).otherwise(bv)
        str_pick = F.least(av, bv)  # least/greatest skip NULLs already
    else:
        num_pick = F.when(a_num >= b_num, av).otherwise(bv)
        str_pick = F.greatest(av, bv)
    num_pick = (
        F.when(av.isNull() | a_num.isNull(), bv)
        .when(bv.isNull() | b_num.isNull(), av)
        .otherwise(num_pick)
    )
    return F.when(num, num_pick).otherwise(str_pick)


def profile_columns_sketch(
    df: DataFrame, cols: list[str], lg_k: int = 12
) -> DataFrame:
    """``profile_columns`` with a MERGEABLE distinct: alongside the
    additive stats, each column carries its HLL sketch (binary) and the
    sketch's estimate — the form ``merge_profiles`` needs to keep
    distinct counts through incremental maintenance (exact per-part
    distincts don't merge; sketches do, with ~1.6%/sqrt(2^lg_k) error).
    One scan, same as the exact profile."""
    prof = _profile_scaffold(
        df,
        cols,
        lambda col: F.hll_sketch_agg(col.cast("string"), F.lit(lg_k)),
        "sketch",
    )
    return prof.select(
        "column",
        "n_rows",
        "n_null",
        "sketch",
        F.hll_sketch_estimate("sketch").cast("bigint").alias("n_distinct_est"),
        "min_str",
        "max_str",
    )


def merge_profile_sketches(stored: DataFrame, increment: DataFrame) -> DataFrame:
    """Merge two ``profile_columns_sketch`` outputs: additive stats add,
    extremes compare (string order — see ``merge_profiles`` for the
    numeric-column variant), and the HLL sketches UNION row-locally
    (``hll_union`` — no shuffle) — so the merged distinct estimate is as
    good as a fresh full scan's, at zero rescan cost. Full-outer on the
    column name: a column present in only one profile (schema
    evolution) carries its one-sided stats through instead of being
    dropped."""
    a, b = stored.alias("a"), increment.alias("b")
    j = a.join(b, F.col("a.column") == F.col("b.column"), "full_outer")
    both = F.col("a.column").isNotNull() & F.col("b.column").isNotNull()
    pick = lambda c: F.coalesce(F.col(f"a.{c}"), F.col(f"b.{c}"))  # noqa: E731
    sketch = F.when(
        both, F.hll_union(F.col("a.sketch"), F.col("b.sketch"))
    ).otherwise(pick("sketch"))
    return j.select(
        F.coalesce(F.col("a.column"), F.col("b.column")).alias("column"),
        (
            F.coalesce(F.col("a.n_rows"), F.lit(0))
            + F.coalesce(F.col("b.n_rows"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_rows"),
        (
            F.coalesce(F.col("a.n_null"), F.lit(0))
            + F.coalesce(F.col("b.n_null"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_null"),
        sketch.alias("sketch"),
        F.hll_sketch_estimate(sketch).cast("bigint").alias("n_distinct_est"),
        F.when(both, F.least(F.col("a.min_str"), F.col("b.min_str")))
        .otherwise(pick("min_str"))
        .alias("min_str"),
        F.when(both, F.greatest(F.col("a.max_str"), F.col("b.max_str")))
        .otherwise(pick("max_str"))
        .alias("max_str"),
    )


def fd_audit(
    df: DataFrame, candidates: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency audit: for each candidate ``lhs -> rhs``,
    measure how close the data comes to satisfying it —
    ``(lhs, rhs, n_groups, n_violating, violation_rate,
    max_rhs_distinct)``. A group violates when one lhs value maps to
    more than one distinct rhs value (NULL counts as a value). The
    data-profiling primitive schema-inference and key-discovery tools
    are built on: exact FDs (violation_rate = 0) are join-collapse and
    normalization opportunities; near-FDs localize dirty keys.

    Scale: one groupBy(lhs) with a count_distinct per candidate —
    independent aggregates unioned, each a single shuffle on its lhs;
    the per-candidate result is one row. ``violation_rate`` is rounded
    6 dp from exact integer counts."""
    outs = []
    for lhs, rhs in candidates:
        g = df.groupBy(F.col(lhs)).agg(
            F.count_distinct(F.col(rhs)).alias("_nd"),
            F.max(F.col(rhs).isNull().cast("int")).alias("_hn"),
        )
        # distinct rhs including NULL-as-a-value
        nd = F.col("_nd") + F.col("_hn")
        outs.append(
            g.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum((nd > 1).cast("long")).cast("bigint").alias(
                    "n_violating"
                ),
                F.max(nd).cast("bigint").alias("max_rhs_distinct"),
            ).select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_groups",
                "n_violating",
                (
                    F.round(
                        F.col("n_violating")
                        / F.col("n_groups").cast("double"),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("violation_rate"),
                "max_rhs_distinct",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out

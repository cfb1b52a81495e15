"""Training-data sampling / splitting / packing / mixing operators.

The reference has no sampling surface (it is a single-tenant ETL,
src/barrazueta_pipeline_etl_crossref.py); these are the LLM-data-pipeline
extensions a 100 TB corpus needs before training: deterministic
train/val/test splits, per-domain stratified sampling, token-budget
sequence packing, and domain mixing to target proportions.

Design rules, chosen for cluster scale:

- **Assignment is a pure function of (seed, key)** via md5 — the same doc
  lands in the same split on every run, every engine, every cluster size.
  No RNG state, no ``rand()`` (non-reproducible across retries), and the
  DuckDB oracles reproduce every decision bit-for-bit
  (``CAST('0x' || substr(md5(...), 1, 8) AS BIGINT)``).
- **Assignment is a narrow projection** — zero shuffle to decide; only
  summaries/aggregations shuffle. Filtering 100 TB down to a sample never
  moves the unsampled bytes.
- **Packing is windowed per partition column** (source/domain), not
  globally — a global pack is a single total-order sort; per-domain packs
  parallelize across the cluster and match how corpora are sharded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "hash_bucket",
    "split_assign",
    "leakage_safe_split",
    "split_leakage_audit",
    "stratified_sample",
    "weighted_sample_k",
    "pack_sequences",
    "domain_mix",
    "sample_n_per_group",
    "chunk_spans",
]


def hash_bucket(key: Column, seed: str, buckets: int = 100) -> Column:
    """Deterministic bucket in ``[0, buckets)``: first 8 hex chars of
    ``md5(seed || '-' || key)`` as an integer, mod buckets. Engine-portable:
    DuckDB mirrors it as
    ``CAST('0x' || substr(md5(seed || '-' || key), 1, 8) AS BIGINT) % buckets``.
    8 hex chars = 32 bits, so the bigint math never overflows and the
    mod bias is < 2^-25 for bucket counts in the thousands."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "-"), key.cast("string"))), 1, 8),
        16,
        10,
    )
    return (h.cast("bigint") % F.lit(buckets)).alias("bucket")


def split_assign(
    df: DataFrame,
    key_col: str,
    seed: str = "split",
    weights: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5)),
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket the key into
    ``sum(weights)`` cells and carve contiguous ranges. A doc's split never
    changes when the corpus grows (hash depends only on the key), which is
    the property that keeps eval sets uncontaminated across snapshots."""
    total = sum(w for _, w in weights)
    b = hash_bucket(F.col(key_col), seed, total)
    expr = None
    cum = 0
    for name, w in weights:
        cum += w
        clause = F.when(b < F.lit(cum), F.lit(name))
        expr = clause if expr is None else expr.when(b < F.lit(cum), F.lit(name))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff
    ``hash_bucket(key) < rate(stratum) * 10000``. Downsampling junk domains
    while keeping high-quality ones whole is the canonical corpus-shaping
    move; the hash keeps it reproducible and join-stable (the same doc is
    in or out everywhere it appears).

    The integer cutoff per stratum is computed DRIVER-side
    (``int(round(rate * 10_000))``) and inlined as a literal — evaluating
    ``rate * 10_000`` as an IEEE double in-plan truncates 0.7 to 6999
    (6999.999… under cast) while a DECIMAL-armed oracle gets 7000; fixing
    the cutoff before the plan removes the engine-dependence entirely."""
    b = hash_bucket(F.col(key_col), seed, 10_000)
    cutoff = None
    for s, r in rates.items():
        lit = F.lit(int(round(float(r) * 10_000)))
        clause = F.when(F.col(stratum_col) == F.lit(s), lit)
        cutoff = clause if cutoff is None else cutoff.when(
            F.col(stratum_col) == F.lit(s), lit
        )
    default_lit = F.lit(int(round(float(default_rate) * 10_000)))
    cutoff = default_lit if cutoff is None else cutoff.otherwise(default_lit)
    return df.filter(b < cutoff)


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis–Spirakis exponential-clock trick with the RNG replaced by
    the same md5 hash the split/stratified samplers use. Each row gets
    ``u = (h32 + 0.5) / 2^32`` (never 0 or 1) and clock
    ``-ln(u) / weight``; the ``k`` smallest clocks are the sample —
    exactly a weighted draw without replacement, but reproducible across
    runs, engines, and cluster sizes, and join-stable (quality-weighted
    corpus subsampling must pick the same docs everywhere).

    Rows with ``weight <= 0`` or null are excluded. Returns the selected
    ``(key_col, weight_col, rank)`` rows, rank 1..k by clock with a
    full (clock, key) tiebreak — a ``TakeOrderedAndProject`` global
    top-k, never a full sort: the 100 TB of unsampled rows are filtered,
    not moved.

    Engine-parity note: ``ln`` is the one transcendental in the clock, and
    Java's and libm's ``log`` may differ in the last ulp. The clock is
    therefore QUANTIZED to 12 dp identically on both engines before the
    ``(clock, key)`` ordering (the repo's round-before-compare rule):
    clocks are bounded by ``-ln(2^-32)/w ≈ 22/w`` so 1e-12 granularity is
    ~1e3× coarser than the ~1e-15 ulp noise, and any exact 12-dp tie is
    resolved by the key tiebreak the same way on both engines — selection
    stays total and engine-independent."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "-"), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(0.5)) / F.lit(float(2**32))
    clock = F.round(-F.log(u) / F.col(weight_col).cast("double"), 12)
    ranked = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(key_col, weight_col, clock.alias("_clock"))
        .orderBy(F.asc("_clock"), F.asc(key_col))
        .limit(k)
    )
    w = Window.orderBy(F.asc("_clock"), F.asc(key_col))
    return ranked.select(
        key_col, weight_col, F.row_number().over(w).cast("bigint").alias("rank")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    part_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: deterministic order within each
    ``part_col`` partition, running token total, bin id = which
    ``budget``-sized window the doc's span starts in. One window shuffle
    per partition column — per-domain packs run in parallel across
    executors. (Exact first-fit bin packing is inherently sequential; the
    concat-and-chunk approximation is what large training pipelines
    actually ship, and wastes at most one doc's tokens per boundary.)

    Adds ``pack_bin`` (0-based within partition) and ``cum_tokens``."""
    keys = [part_col] if part_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return df.withColumn("cum_tokens", cum).withColumn(
        "pack_bin", F.floor((F.col("cum_tokens") - F.col(token_col)) / F.lit(budget))
    )


def domain_mix(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    target_weights: dict[str, float],
    total_budget: int,
    seed: str = "mix",
) -> DataFrame:
    """Mix domains toward target proportions: per-domain desired count =
    ``weight * total_budget``, sample rate = ``min(1, desired / available)``
    applied via the deterministic hash. Domains absent from
    ``target_weights`` are dropped. The per-domain counts are a tiny
    aggregate broadcast back onto the fact side — the 100 TB of rows are
    touched once, with a map-side filter."""
    wdf = df.sparkSession.createDataFrame(
        [(k, float(v)) for k, v in target_weights.items()],
        f"{domain_col} string, _w double",
    )
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_avail"))
        .join(wdf, domain_col, "inner")
        .withColumn(
            "_rate",
            F.least(F.lit(1.0), F.col("_w") * F.lit(float(total_budget)) / F.col("_avail")),
        )
    )
    b = hash_bucket(F.col(key_col), seed, 10_000)
    # `_avail` (domain row count) and `_rate` ride along for callers that
    # report selection stats; `_w` is internal. The cutoff ROUNDs the
    # double product (both engines round half-away on identical doubles)
    # instead of truncating it — cast-truncation flips a whole bucket when
    # `_rate * 10_000` lands at 6999.999… vs 7000 across engines.
    return (
        df.join(F.broadcast(counts), domain_col, "inner")
        .filter(b < F.round(F.col("_rate") * 10_000).cast("bigint"))
        .drop("_w")
    )


def sample_n_per_group(
    df: DataFrame, group_col: str, key_col: str, n: int, seed: str = "samp"
) -> DataFrame:
    """Exactly-N uniform sample per group (reservoir-sampling equivalent,
    but deterministic): rank rows within each group by the md5 hash of
    their key and keep the first ``n``. The hash order is uniform-random
    with respect to any data ordering yet reproducible across runs and
    engines. One window shuffle on the group key; at 100 TB prefer this
    over ``rdd.takeSample`` (driver-side) or ``TABLESAMPLE`` (not
    per-group, not deterministic)."""
    h = F.md5(F.concat(F.lit(seed + "-"), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def chunk_spans(
    df: DataFrame,
    token_count_col: Column,
    chunk_size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    context-window preparation step before training/embedding. Emits one
    row per chunk with ``chunk_idx``, ``chunk_start``, ``chunk_len``
    (token offsets; pair with ``slice(split(text), ...)`` to materialize
    the token slice).

    Stride = ``chunk_size - overlap``. Every chunk except possibly the
    last has ``chunk_len == chunk_size``; the last covers the tail and is
    always longer than ``overlap`` (so no chunk is a strict subset of the
    previous one). Pure JVM-side ``sequence``+``explode`` — codegen, no
    UDF, no shuffle."""
    stride = chunk_size - overlap
    n_tok = token_count_col
    n_chunks = F.greatest(
        F.ceil((n_tok - F.lit(overlap)) / F.lit(float(stride))), F.lit(1)
    )
    out = df.withColumn("_n_tok", n_tok).filter(F.col("_n_tok") > 0)
    out = out.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks.cast("bigint") - 1))
    )
    start = F.col("chunk_idx") * stride
    return (
        out.withColumn("chunk_start", start)
        .withColumn("chunk_len", F.least(F.lit(chunk_size), F.col("_n_tok") - start))
        .drop("_n_tok")
    )


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    alpha: float,
    total_budget: int,
    seed: str = "tmix",
) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-pretraining
    rebalance): target share of domain *d* is
    ``n_d**alpha / sum_e(n_e**alpha)`` — ``alpha=1`` keeps natural
    proportions, ``alpha=0`` is uniform, the usual ``alpha≈0.3-0.7``
    up-samples tail domains at the expense of the head. Desired count =
    share × ``total_budget``; per-domain rate = ``min(1, desired/n_d)``
    applied via the same deterministic md5 bucket as
    :func:`hash_bucket`, so membership is a pure function of
    ``(seed, key)``.

    Execution shape: identical to :func:`domain_mix` — the shares come
    from one tiny per-domain count aggregate (broadcast back), the
    corpus is touched once with a map-side filter, zero extra shuffles.
    The rate cutoff ROUNDs (see domain_mix) so engine double drift at a
    bucket boundary can't flip membership.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_avail"))
    tot = counts.agg(
        F.sum(F.pow("_avail", F.lit(float(alpha)))).alias("_z")
    )
    rates = counts.crossJoin(F.broadcast(tot)).withColumn(
        "_rate",
        F.least(
            F.lit(1.0),
            F.pow("_avail", F.lit(float(alpha)))
            / F.col("_z")
            * F.lit(float(total_budget))
            / F.col("_avail"),
        ),
    )
    b = hash_bucket(F.col(key_col), seed, 10_000)
    return (
        df.join(F.broadcast(rates), domain_col, "inner")
        .filter(b < F.round(F.col("_rate") * 10_000).cast("bigint"))
        .drop("_z")
    )


def nucleus_select(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    id_col: str,
    p: float = 0.9,
) -> DataFrame:
    """Top-p (nucleus) selection per group: keep the highest-weight rows
    of each group until their cumulative weight first reaches ``p`` of
    the group total — the data-curation analog of nucleus sampling
    (keep the quality mass, drop the long low-quality tail, without a
    fixed per-group k that over-prunes small groups and under-prunes
    large ones). Returns the kept rows plus ``cum_frac`` (the cumulative
    weight fraction through this row).

    The rule is "cumulative weight BEFORE this row < p·total" — the row
    that crosses the threshold is kept, everything after is dropped —
    so exactly the minimal prefix covering p. Order is (weight desc, id
    asc): total, engine-independent.

    Scale shape: one groupBy(group) for totals (broadcast back — group
    cardinality, not row cardinality) + ONE cumulative window on the
    same group key (exchange reused). Weights must be non-negative;
    groups with zero total keep nothing.
    """
    from pyspark.sql import Window

    totals = df.groupBy(group_col).agg(
        F.sum(F.col(weight_col).cast("double")).alias("_tot")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc(weight_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        df.join(F.broadcast(totals), group_col)
        .withColumn("_cum", F.sum(F.col(weight_col).cast("double")).over(w))
        .withColumn(
            "_before", F.col("_cum") - F.col(weight_col).cast("double")
        )
    )
    return (
        cum.filter(
            (F.col("_tot") > 0) & (F.col("_before") < p * F.col("_tot"))
        )
        .withColumn(
            "cum_frac", F.round(F.col("_cum") / F.col("_tot"), 6) + F.lit(0.0)
        )
        .drop("_tot", "_cum", "_before")
    )


def leakage_safe_split(
    df: DataFrame,
    edges: DataFrame,
    key_col: str,
    seed: str = "split",
    weights: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5)),
) -> DataFrame:
    """Near-dup-aware train/val/test split: documents connected by a
    similarity edge land in the SAME split, always.

    ``split_assign`` hashing raw doc ids leaks: a near-duplicate pair
    split across train and test contaminates the eval set exactly the
    way benchmark decontamination tries to prevent (Lee et al., ACL
    2022 measure the resulting metric inflation). The fix is to split
    by near-dup EQUIVALENCE CLASS: connected components over the
    similarity graph (LSH candidate edges at scale — the pipeline
    already materializes them for dedup; exact-Jaccard edges on gate
    samples), then one hash of the component representative decides the
    whole class. Singleton docs (no edge) are their own component.

    Scale shape: CC is the existing iterative min-label propagation
    (node-keyed shuffles only, pointer-halving — operators/graph);
    component attach is ONE key-keyed left join (edges output is
    node-keyed, co-partitioned with the corpus join key); the split
    itself is a row-local hash — zero additional shuffles. The
    no-cross-split-edge invariant holds by construction: the split is a
    pure function of the component label.

    The ``component`` column keeps the TYPE of ``key_col``: singleton
    docs (no edge) fall back to their raw key, not a cast — a cast to
    bigint would turn every non-numeric string key into NULL and
    silently collapse all singletons into one mega-component (total
    skew plus cross-doc correlation in the split). Edge node ids must
    be the same type as ``key_col`` (they are produced from it).

    Returns ``df`` plus ``component`` and ``split`` columns.
    """
    from .graph import connected_components

    comp = connected_components(edges).withColumnRenamed("node", key_col)
    out = df.join(comp, key_col, "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(key_col))
    )
    return split_assign(out, "component", seed, weights)


def split_leakage_audit(
    labeled: DataFrame,
    edges: DataFrame,
    key_col: str,
    split_col: str = "split",
) -> DataFrame:
    """Audit a split assignment against a similarity edge set: how many
    edges cross split boundaries? Cross-split near-dup edges ARE eval
    contamination — this is the measurement ``leakage_safe_split``
    drives to zero by construction, and the number to report for any
    split you didn't construct that way (an inherited split, a
    doc-id-hash split, a time-based split).

    Scale shape: two key-keyed equi-joins of the (key, split) projection
    onto the edge list + one global aggregate — edge-list-sized, no
    window, nothing pairwise beyond the edges already materialized.

    Returns one row: ``(n_edges, n_cross)``.
    """
    l_ = labeled.select(F.col(key_col).alias("src"), F.col(split_col).alias("_ls"))
    r_ = labeled.select(F.col(key_col).alias("dst"), F.col(split_col).alias("_rs"))
    return (
        edges.join(l_, "src")
        .join(r_, "dst")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum((F.col("_ls") != F.col("_rs")).cast("long"))
            .cast("long")
            .alias("n_cross"),
        )
    )


def quota_allocate(
    df: DataFrame, group_col: str, total: int
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer budget:
    ``(group_col, n_rows, alloc)`` with ``Σ alloc == total`` exactly and
    each allocation within 1 of the exact proportional share — the
    standard way to turn fractional sampling quotas into integer
    per-group budgets without drift (naive rounding over- or
    under-spends; iterative largest-remainder is THE fix, used by
    electoral apportionment for the same reason).

    All-integer arithmetic (base = (total·n) div N, remainder =
    (total·n) mod N; leftovers go to the largest remainders, ties
    broken by group key) — engine-exact, no floats anywhere. One
    group count + one rank over the GROUP table (group-cardinality-
    sized). Groups with more rows than their allocation simply sample
    ``alloc`` downstream (e.g. ``sample_n_per_group``)."""
    g = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    t = g.agg(F.sum("n_rows").alias("_tot"))
    q = g.crossJoin(F.broadcast(t)).select(
        group_col,
        "n_rows",
        F.expr(f"({int(total)} * n_rows) div _tot").alias("_base"),
        ((F.lit(int(total)) * F.col("n_rows")) % F.col("_tot")).alias(
            "_rem"
        ),
    )
    from pyspark.sql import Window

    leftover = q.agg(
        (F.lit(int(total)) - F.sum("_base")).alias("_left")
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("_rem").desc(), F.col(group_col))
    )
    return (
        q.withColumn("_rk", rk)
        .crossJoin(F.broadcast(leftover))
        .select(
            group_col,
            "n_rows",
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
        )
    )


def ht_estimate(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    value_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "strat",
) -> DataFrame:
    """Horvitz-Thompson estimation from the deterministic stratified
    sample: per stratum, ``(n_sampled, n_hat, value_hat)`` where each
    sampled row is inverse-probability-weighted by its stratum's
    inclusion rate — the estimator that makes downsampled-corpus
    statistics unbiased for the FULL corpus (compute on the 1% junk
    sample, report full-corpus token counts). Uses exactly
    :func:`stratified_sample`'s md5 rule, so estimates are pure
    functions of (seed, keys) — reproducible and oracle-checkable.

    Exactness: weights are rationals 10000/cutoff from the same
    driver-side integer cutoffs the sampler inlines; ``n_hat`` is
    ``n_sampled * 10000 / cutoff`` and ``value_hat`` accumulates
    DECIMAL(38,12)-cast ``value * 10000 / cutoff`` terms — order-free;
    both rounded 4 dp / 2 dp. One sampled-side groupBy(stratum)."""
    sampled = stratified_sample(
        df, stratum_col, key_col, rates, default_rate, seed=seed
    )
    cutoff = None
    for s, r in rates.items():
        lit = F.lit(int(round(float(r) * 10_000)))
        clause = F.when(F.col(stratum_col) == F.lit(s), lit)
        cutoff = clause if cutoff is None else cutoff.when(
            F.col(stratum_col) == F.lit(s), lit
        )
    default_lit = F.lit(int(round(float(default_rate) * 10_000)))
    cutoff = default_lit if cutoff is None else cutoff.otherwise(default_lit)
    w = F.lit(10_000).cast("double") / cutoff.cast("double")
    return (
        sampled.groupBy(F.col(stratum_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.round(F.sum(w.cast("decimal(38,12)")), 4)
            .cast("double")
            .alias("n_hat"),
            F.round(
                F.sum(
                    (F.col(value_col).cast("double") * w).cast(
                        "decimal(38,12)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("value_hat"),
        )
    )

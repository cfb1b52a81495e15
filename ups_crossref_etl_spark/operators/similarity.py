"""Similarity search over embedding columns (``array<float>``).

Extension layer (BASELINE.json north star). Two tiers:

- Brute-force cosine top-k: exact baseline. Per-row dot products via
  higher-order functions (``zip_with`` + ``aggregate``) — JVM-side, no
  Python. O(n) per query vector; fine for one probe, not for all-pairs.
- Scale path: random-hyperplane LSH (signed projections onto deterministic
  pseudo-random planes) buckets vectors so candidate generation is an
  equi-join on (band, bucket-signature) — the same shuffle discipline as
  MinHash LSH. An IVF variant (k-means coarse quantizer) would slot in the
  same way; LSH is chosen because it is stateless/deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (fold order = array order ⇒ deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    The query vector rides along as an array literal (broadcast to every
    task as part of the plan — no shuffle at all; the scan streams and a
    global TakeOrdered picks k). Cosine is rounded before ordering so the
    ranking is reproducible across engines/accumulation orders.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), round_digits).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH (scale path)
# --------------------------------------------------------------------------


def _plane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: xorshift-free LCG on (seed,i)
    mapped to [-1, 1). Pure Python at plan time (tiny), constants inlined
    into the plan as array literals."""
    vals = []
    state = (seed * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        vals.append((state >> 11) / float(1 << 53) * 2.0 - 1.0)
    return vals


def _plane_matrix(dim: int, bands: int, planes_per_band: int) -> np.ndarray:
    """(dim × bands·ppb) hyperplane matrix, same constants as ``_plane``."""
    cols = []
    for b in range(bands):
        for i in range(planes_per_band):
            cols.append(_plane(dim, b * 1000 + i))
    return np.array(cols, dtype=np.float64).T


def band_signatures_udf(dim: int, bands: int, planes_per_band: int):
    """All band signatures in one Arrow-batched matmul: embeddings batch
    (N×dim) @ planes (dim×bands·ppb) → sign bits → packed per-band ints.

    This is the legitimate use of a pandas_udf: dense linear algebra the
    JVM expression engine can't vectorize (the per-row higher-order-
    function formulation is interpreted and measured ~10× slower). The
    plane matrix is a closure constant — serialized once per task, not
    per row. Returns ``array<bigint>`` of length ``bands``.
    """
    pm = _plane_matrix(dim, bands, planes_per_band)
    weights = (1 << np.arange(planes_per_band, dtype=np.int64)).reshape(1, 1, -1)

    @pandas_udf(ArrayType(LongType()))
    def sigs(embs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(e, dtype=np.float64) for e in embs])
        bits = (m @ pm >= 0).astype(np.int64).reshape(len(m), bands, planes_per_band)
        packed = (bits * weights).sum(axis=2)
        return pd.Series(list(packed))

    return sigs


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 24,
    planes_per_band: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: probe only vectors sharing ≥1 LSH band signature
    with the query. At scale the bucketed table is precomputed + partitioned
    by (band, sig) so a probe touches a few partitions instead of the fleet.
    """
    dim = len(query_vec)
    # query signatures computed driver-side with the same plane matrix
    pm = _plane_matrix(dim, bands, planes_per_band)
    qbits = (np.asarray(query_vec, dtype=np.float64) @ pm >= 0).astype(np.int64)
    qsigs = (
        qbits.reshape(bands, planes_per_band)
        * (1 << np.arange(planes_per_band, dtype=np.int64))
    ).sum(axis=1)
    sigs = band_signatures_udf(dim, bands, planes_per_band)
    qsig_arr = F.array(*[F.lit(int(s)) for s in qsigs])
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("_sigs", sigs(F.col(vec_col)))
        # candidate iff any band signature matches the query's
        .filter(
            F.exists(
                F.zip_with("_sigs", qsig_arr, lambda a, b: a == b), lambda x: x
            )
        )
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), round_digits).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def pairwise_topk_within_label(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    group_size_cap: int = 1000,
    dim: int | None = None,
    bands: int = 24,
    planes_per_band: int = 4,
    fallback_sample: int = 256,
) -> DataFrame:
    """Most-similar pair per label group, with the self-join blocked so no
    group ever goes quadratic:

    - groups with ≤ ``group_size_cap`` members: exact all-pairs within the
      label (bounded: ≤ cap²/2 pairs per group);
    - larger groups: candidate pairs come from an equi-join on
      ``(label, band, lsh-signature)`` — the same random-hyperplane LSH
      machinery as ``embedding_near_dups`` — so with coarse labels (the
      realistic corpus case) the pair count scales with bucket
      co-occupancy, not group size². The top-1 pair per group is by
      construction a high-cosine pair, exactly what LSH buckets preserve.
      Because LSH alone can miss every pair of a group (no band
      collision), large groups ALSO contribute exact pairs over their
      first ``fallback_sample`` members (by id) — so every label with ≥2
      members is guaranteed a row. The large-group result is therefore
      approximate: the winning pair is the best among LSH-colliding pairs
      plus the sampled prefix, not a certified global argmax.

    ``dim`` defaults to the length of the first embedding (one driver-side
    row fetch, only when a large group exists). Group sizes are a broadcast
    aggregate on the label (labels are few).
    Returns one row per label: (lbl, id_a, id_b, cos_sim).
    """
    from pyspark.sql.window import Window

    sizes = df.groupBy(F.col(label_col).alias("lbl")).agg(F.count(F.lit(1)).alias("_gsz"))
    base = df.select(
        F.col(label_col).alias("lbl"), F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).join(F.broadcast(sizes), "lbl")

    small = base.filter(F.col("_gsz") <= group_size_cap)
    a = small.select("lbl", F.col("_id").alias("id_a"), F.col("_v").alias("va"))
    b = small.select("lbl", F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
    exact_pairs = (
        a.join(b, "lbl")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "lbl",
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_digits).alias("cos_sim"),
        )
    )

    large = base.filter(F.col("_gsz") > group_size_cap)
    if dim is None:
        # One driver-side row fetch (model-state sized), and only when a
        # large group actually exists; no large groups → skip the branch.
        head = large.select("_v").take(1)
        dim = len(head[0][0]) if head else None
    pairs = exact_pairs
    if dim is not None:
        sig_udf = band_signatures_udf(dim, bands, planes_per_band)
        sigs = large.select(
            "lbl", "_id", "_v", F.posexplode(sig_udf(F.col("_v"))).alias("band", "sig")
        )
        la, lb = sigs.alias("a"), sigs.alias("b")
        lsh_pairs = (
            la.join(
                lb,
                (F.col("a.lbl") == F.col("b.lbl"))
                & (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(
                F.col("a.lbl").alias("lbl"),
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.round(cosine(F.col("a._v"), F.col("b._v")), round_digits).alias("cos_sim"),
            )
            .distinct()
        )
        # Guaranteed-coverage fallback: exact pairs over the first
        # `fallback_sample` members of each large group, so a label whose
        # members never collide in any band still yields its row.
        ws = Window.partitionBy("lbl").orderBy(F.asc("_id"))
        sample = (
            large.withColumn("_srn", F.row_number().over(ws))
            .filter(F.col("_srn") <= fallback_sample)
            .drop("_srn")
        )
        sa = sample.select("lbl", F.col("_id").alias("id_a"), F.col("_v").alias("va"))
        sb = sample.select("lbl", F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
        sample_pairs = (
            sa.join(sb, "lbl")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "lbl",
                "id_a",
                "id_b",
                F.round(cosine(F.col("va"), F.col("vb")), round_digits).alias("cos_sim"),
            )
        )
        pairs = exact_pairs.unionByName(lsh_pairs).unionByName(sample_pairs).distinct()
    w = Window.partitionBy("lbl").orderBy(F.desc("cos_sim"), F.asc("id_a"), F.asc("id_b"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    planes_per_band: int = 8,
    dim: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking: vectors
    sharing any band signature are candidates; exact cosine verifies.
    Returns (id_a, id_b, cos_sim ≥ threshold)."""
    sig_udf = band_signatures_udf(dim, bands, planes_per_band)
    sigs = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            sig_udf(F.col(vec_col)).alias("_sigs"),
        )
        .select("_id", "_v", F.posexplode("_sigs").alias("band", "sig"))
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(cosine(F.col("a._v"), F.col("b._v")), round_digits).alias("cos_sim"),
        )
        .distinct()
        .filter(F.col("cos_sim") >= threshold)
    )


def scalar_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-dimension scalar quantization (the int8 compression
    every large ANN index applies before sharding): per-dim scale =
    max|x| / (2^(bits-1) - 1) over the corpus, code = round(x / scale).

    Scale shape: the per-dim maxima are ONE aggregate over posexploded
    rows (map-side partial max, 64-group shuffle) collected driver-side
    as model state (64 doubles — same legitimacy as IVF centroids), then
    inlined as literals so quantization itself is a narrow codegen
    projection — 4× memory/bandwidth cut with zero extra shuffles.

    Returns (id, qvec array<bigint>, scale per-dim array<double>)."""
    qmax = (1 << (bits - 1)) - 1
    ex = df.select(F.posexplode(vec_col).alias("_i", "_v"))
    scales_rows = (
        ex.groupBy("_i")
        .agg((F.max(F.abs(F.col("_v").cast("double"))) / qmax).alias("_s"))
        .orderBy("_i")
        .collect()
    )
    if not scales_rows:
        # empty corpus (or all-null vector column): no model state to fit —
        # surface it instead of silently emitting a zero-dim quantizer
        raise ValueError(
            f"scalar_quantize: no vector elements found in {vec_col!r} "
            "(empty input or all-null column)"
        )
    # _s is NULL when every value in a dimension is NULL, and 0.0 when the
    # dimension is identically zero — both degrade to scale 1.0 (code 0)
    scales = [r["_s"] if r["_s"] is not None and r["_s"] > 0 else 1.0 for r in scales_rows]
    scale_arr = F.array(*[F.lit(float(s)) for s in scales])
    q = F.zip_with(
        F.col(vec_col),
        scale_arr,
        lambda x, s: F.round(x.cast("double") / s).cast("bigint"),
    )
    return df.select(
        F.col(id_col), q.alias("qvec"), scale_arr.alias("scales")
    )


def mmr_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    lam: float = 0.5,
    pool: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Maximal Marginal Relevance diversity selection: greedily pick ``k``
    vectors maximizing ``lam·rel(x) − (1−lam)·max_sim(x, selected)`` —
    the standard diversity re-rank for retrieval results and for
    selecting varied training examples from a near-duplicate-heavy
    candidate set (plain top-k returns k copies of the same passage;
    MMR returns one plus its best diverse alternatives).

    Distributed/driver split: the POOL CUT (exact top-``pool`` by
    relevance, a TakeOrderedAndProject over the corpus — at 100 TB this
    stage is the ANN/brute-force scan) is the only part that touches all
    rows; the greedy selection then runs on the collected pool, which is
    bounded model state like k-means centroids — MMR is inherently
    sequential (each pick conditions on all previous picks), and a
    ``pool``-row re-rank belongs on the driver, not in ``k`` cluster
    jobs.

    Determinism: every relevance/similarity/score is quantized to
    ``round_digits`` decimals with ``id`` tie-breaks before any argmax,
    so the selection is a pure function of the data, reproducible across
    engines — the DuckDB oracle replays it exactly (float sums fold
    sequentially on both sides; 4-dp quantization absorbs last-ulp
    noise).

    Returns ``(rank, id_col, rel)``, rank 1..k in selection order.
    """
    pool_df = brute_force_topk(
        df, query_vec, k=pool, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    )
    rows = (
        df.select(id_col, vec_col)
        .join(pool_df, id_col)
        .select(id_col, "cos_sim", vec_col)
        .collect()
    )
    items = sorted(
        ((-r["cos_sim"], r[id_col], [float(x) for x in r[vec_col]]) for r in rows)
    )

    def _round_half_up(x: float, nd: int) -> float:
        # Python round() is half-to-even; Spark F.round (Java HALF_UP via
        # BigDecimal.valueOf, i.e. the double's shortest-repr decimal) and
        # DuckDB round are half-AWAY-from-zero. The driver-side greedy must
        # quantize the same way or an exact 4-dp midpoint flips the argmax
        # vs the oracle. Decimal(repr(x)) mirrors BigDecimal.valueOf.
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal(1).scaleb(-nd)
        return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

    def _cos(a: list[float], b: list[float]) -> float:
        dp = na = nb = 0.0
        for x, y in zip(a, b):
            dp += x * y
            na += x * x
            nb += y * y
        return _round_half_up(dp / (na**0.5 * nb**0.5), round_digits)

    sel: list[tuple[int, float]] = []
    sel_vecs: list[list[float]] = []
    remaining = [(-neg, vid, v) for neg, vid, v in items]
    for _ in range(min(k, len(remaining))):
        if not sel:
            best_i = 0  # items already ordered by (rel desc, id asc)
        else:
            best_i, best_key = None, None
            for i, (rel, vid, v) in enumerate(remaining):
                penalty = max(_cos(v, s) for s in sel_vecs)
                score = _round_half_up(
                    lam * rel - (1 - lam) * penalty, round_digits
                )
                key = (-score, vid)
                if best_key is None or key < best_key:
                    best_i, best_key = i, key
        rel, vid, v = remaining.pop(best_i)
        sel.append((vid, rel))
        sel_vecs.append(v)

    spark = df.sparkSession
    out = [(i + 1, vid, rel) for i, (vid, rel) in enumerate(sel)]
    return spark.createDataFrame(
        out, schema=f"rank bigint, {id_col} bigint, rel double"
    )


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (deterministic sign matrix)
# --------------------------------------------------------------------------


def rp_sign_matrix(dim: int, out_dim: int) -> list[list[int]]:
    """The ±1 Achlioptas/JL projection matrix, derived deterministically:
    ``sign(i, j) = +1 iff md5(f"{i}:{j}") has an even 60-bit prefix``.
    Model state (dim × out_dim ints, KBs) shared verbatim between the
    Spark plan and the DuckDB oracle — both get the values as literals,
    so projection arithmetic is engine-identical with no hash functions
    in the hot path."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:15], 16) % 2
            == 0
            else -1
            for i in range(dim)
        ]
        for j in range(out_dim)
    ]


def _rp_proj_col(vec_col: str, dim: int, out_dim: int, round_digits: int):
    """The projected array as a Column (shared by rp_project and the
    recall contract's ranking path)."""
    signs = rp_sign_matrix(dim, out_dim)
    scale = float(np.sqrt(out_dim))
    return F.array(
        *[
            F.round(
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col(vec_col),
                            F.array(*[F.lit(float(v)) for v in signs[j]]),
                            lambda a, b: a.cast("double") * b,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    10,
                )
                / scale,
                round_digits,
            )
            + F.lit(0.0)
            for j in range(out_dim)
        ]
    )


def rp_project_arr(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_dim: int = 16,
    round_digits: int = 4,
) -> DataFrame:
    """``(id_col, proj array<double>)`` wide form of ``rp_project`` —
    feed this to the cosine rankers; same arithmetic, same zero-shuffle
    map-only shape."""
    first = df.select(F.size(vec_col).alias("n")).first()
    dim = int(first["n"])
    return df.select(
        F.col(id_col),
        _rp_proj_col(vec_col, dim, out_dim, round_digits).alias("proj"),
    )


def rp_project(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_dim: int = 16,
    round_digits: int = 4,
) -> DataFrame:
    """Project embeddings to ``out_dim`` dims with the ±1 JL matrix:
    ``(id_col, j, val)`` in long form, ``val = round(Σᵢ vᵢ·sign(i,j) /
    √out_dim, round_digits)``. JL preserves pairwise distances within
    (1±ε) at out_dim = O(log n / ε²) — the standard pre-ANN compression
    that cuts scan bytes 4× here (64→16 dims) before brute-force or
    IVF ranking.

    Scale shape: ZERO shuffles — the signs are literal arrays folded by
    codegen ``zip_with``/``aggregate`` per output dim, a narrow map-only
    projection that fuses into any scan (the posexplode to long form
    multiplies rows by out_dim AFTER reduction, never the input dim).
    The fold runs i ascending on both engines; the terms are ±vᵢ so
    magnitudes are embedding-sized and the 4-dp round absorbs fold-order
    ulps. At 100 TB swap the per-row HOF fold for the Arrow matmul
    kernel (``band_signatures_udf``'s shape) — same matrix, same output.
    """
    # raw fold quantized to 10 dp BEFORE the scale division (round-
    # before-compare rule); division by √out_dim is exact for power-of-
    # four out_dim; + 0.0 folds -0.0 to +0.0 (engines disagree on sign)
    first = df.select(F.size(vec_col).alias("n")).first()
    dim = int(first["n"])
    proj = _rp_proj_col(vec_col, dim, out_dim, round_digits)
    return df.select(F.col(id_col), F.posexplode(proj).alias("j", "val"))


# --------------------------------------------------------------------------
# Per-dimension embedding standardization (whitening)
# --------------------------------------------------------------------------


def standardize_embeddings(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    round_digits: int = 4,
    stat_digits: int = 6,
) -> DataFrame:
    """Per-dimension z-normalization of the embedding column — the
    whitening pass run before quantization/ANN when dimensions have
    wildly different scales (raw activations, concatenated feature
    groups): ``(id_col, j, zval)`` with
    ``zval = round((vᵢⱼ − μⱼ)/σⱼ, round_digits)``.

    Scale shape: stats come from ONE posexplode + groupBy(dim) — the
    explode looks like 64× row inflation but partial aggregation
    collapses it to ``partitions × dim`` rows BEFORE the shuffle (the
    same reason word-count scales); the 64-row stat table then rides
    into the normalization as broadcast-joined model state, and the
    z-transform itself is row-local. Constant dimensions (σ=0) emit 0.

    Determinism: μ and σ derive from SUM/SUM-OF-SQUARES/COUNT rounded to
    ``stat_digits`` BEFORE the derived arithmetic (round-before-compare:
    raw float sums agree across engines to ~1e-15 but not the last ulp;
    quantizing the accumulators — not the outputs — makes every
    downstream value bit-identical), with the population-variance
    formula ``σ² = Σx²/n − μ²`` spelled explicitly on both engines
    rather than trusting builtin stddev implementations to share a
    summation algorithm.
    """
    pos = df.select(F.posexplode(vec_col).alias("j", "_v"))
    stats = (
        pos.groupBy("j")
        .agg(
            F.round(F.sum(F.col("_v").cast("double")), stat_digits).alias("_s"),
            F.round(
                F.sum(F.col("_v").cast("double") * F.col("_v").cast("double")),
                stat_digits,
            ).alias("_s2"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "j",
            (F.col("_s") / F.col("_n")).alias("_mu"),
            F.sqrt(
                F.greatest(
                    F.col("_s2") / F.col("_n")
                    - (F.col("_s") / F.col("_n")) * (F.col("_s") / F.col("_n")),
                    F.lit(0.0),
                )
            ).alias("_sigma"),
        )
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(vec_col).alias("j", "_v")
    )
    return exploded.join(F.broadcast(stats), "j").select(
        F.col(id_col),
        "j",
        (
            F.round(
                F.when(F.col("_sigma") > 0,
                       (F.col("_v").cast("double") - F.col("_mu"))
                       / F.col("_sigma"))
                .otherwise(F.lit(0.0)),
                round_digits,
            )
            + F.lit(0.0)
        ).alias("zval"),
    )


def rp_two_stage_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    pool_frac: float = 0.3,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Two-stage ANN with the JL projection: stage 1 ranks the 16-dim
    PROJECTED vectors (4× fewer scan bytes than the raw embeddings) and
    keeps the top ``pool_frac`` as candidates; stage 2 exact-reranks
    only the pool on the full vectors. Same output contract as
    ``brute_force_topk``; quality pinned by ``q_emb_rp_recall_bound``.
    At 100 TB the projected column is materialized at ingest (a narrow
    map-only write), so stage 1 never touches the wide embedding bytes.
    """
    dim = len(query_vec)
    m = np.asarray(rp_sign_matrix(dim, out_dim), dtype=np.float64)
    scale = float(np.sqrt(out_dim))
    qp = [
        round(round(float(s), 10) / scale, round_digits) + 0.0
        for s in (m @ np.asarray(query_vec, dtype=np.float64))
    ]
    n = df.count()
    pool = max(k, int(pool_frac * n))
    proj = rp_project_arr(df, vec_col, id_col, out_dim, round_digits)
    cand = brute_force_topk(
        proj, qp, k=pool, id_col=id_col, vec_col="proj"
    ).select(id_col)
    return brute_force_topk(
        df.join(cand, id_col), query_vec, k=k, id_col=id_col, vec_col=vec_col
    )


def matryoshka_truncate(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 16,
    round_digits: int = 4,
) -> DataFrame:
    """Matryoshka truncation: keep the FIRST ``dim`` coordinates and
    L2-renormalize — the zero-compute dimensionality reduction for
    MRL-trained embeddings (Kusupati et al.), where prefixes of the
    vector are themselves valid embeddings. Returns ``(id, prefix)``
    with the renormalized prefix rounded (the repo's round-before-
    compare rule; + 0.0 folds −0.0).

    Unlike the JL projection (``rp_project_arr``) there is no matrix —
    ``slice`` + one row-local ``aggregate`` for the norm, all codegen;
    at 100 TB the prefix column is materialized at ingest so coarse
    passes scan dim/64 of the embedding bytes.
    """
    pref = F.slice(F.col(vec_col), 1, dim)
    nrm = F.sqrt(
        F.aggregate(
            pref,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return df.select(
        F.col(id_col),
        F.when(
            nrm > 0,
            F.transform(
                pref,
                lambda x: F.round(x.cast("double") / nrm, round_digits)
                + F.lit(0.0),
            ),
        )
        .otherwise(F.transform(pref, lambda x: x.cast("double")))
        .alias("prefix"),
    )


def matryoshka_two_stage_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    pool_frac: float = 0.3,
    dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Two-stage ANN with matryoshka prefixes: stage 1 ranks the
    ``dim``-coordinate renormalized PREFIXES (dim/full_dim of the scan
    bytes, no projection matrix at all) and keeps the top ``pool_frac``
    of the corpus; stage 2 exact-reranks only the pool on full vectors.
    Same output contract as ``brute_force_topk``; recall pinned by
    ``q_emb_matryoshka_recall_bound``. The MRL counterpart of
    ``rp_two_stage_topk`` — prefer it when embeddings are MRL-trained
    (prefix quality beats a random projection at equal dims); prefer JL
    when they are not.
    """
    import math

    qp = query_vec[:dim]
    qn = math.sqrt(sum(x * x for x in qp))
    qp = [
        round(x / qn, round_digits) + 0.0 if qn > 0 else float(x) for x in qp
    ]
    n = df.count()
    pool = max(k, int(pool_frac * n))
    pref = matryoshka_truncate(df, vec_col, id_col, dim, round_digits)
    cand = brute_force_topk(
        pref, qp, k=pool, id_col=id_col, vec_col="prefix"
    ).select(id_col)
    return brute_force_topk(
        df.join(cand, id_col), query_vec, k=k, id_col=id_col, vec_col=vec_col
    )


def mutual_top1_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Reciprocal nearest neighbors: pairs where each side is the
    OTHER's cosine top-1 — ``(id_a, id_b, cos_sim)`` with id_a < id_b.
    Mutual-NN is the high-precision pair filter semantic-dedup and
    cross-lingual mining pipelines apply on top of plain kNN (a one-
    directional top-1 is often an asymmetric hub; mutuality kills
    hubs). Argmax ties break by (similarity DESC, neighbor id ASC),
    similarities rounded before ranking — the engine-reproducibility
    recipe of the sibling exact constructions.

    Exact all-pairs by design: call on a bounded slice (ground-truth /
    validation usage, like the ``*_exact`` siblings); the scale path
    composes the IVF/LSH top-k operators with the same mutuality join
    (an id-keyed self-join on the (id, top1) table — trivially cheap)."""
    from pyspark.sql import Window

    a = df.select(
        F.col(id_col).alias("_ia"), F.col(vec_col).alias("_va")
    )
    b = df.select(
        F.col(id_col).alias("_ib"), F.col(vec_col).alias("_vb")
    )
    scored = (
        a.crossJoin(b)
        .filter(F.col("_ia") != F.col("_ib"))
        .select(
            "_ia",
            "_ib",
            F.round(
                cosine(F.col("_va"), F.col("_vb")), round_digits
            ).alias("_cos"),
        )
    )
    top1 = scored.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_ia").orderBy(
                F.col("_cos").desc(), F.col("_ib")
            )
        ),
    ).filter(F.col("_rn") == 1)
    fwd = top1.select("_ia", "_ib", "_cos")
    rev = top1.select(
        F.col("_ib").alias("_ia"), F.col("_ia").alias("_ib")
    )
    return (
        fwd.join(rev, ["_ia", "_ib"])
        .filter(F.col("_ia") < F.col("_ib"))
        .select(
            F.col("_ia").alias("id_a"),
            F.col("_ib").alias("id_b"),
            (F.col("_cos") + F.lit(0.0)).alias("cos_sim"),
        )
    )


def cosine_pair_histogram(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    offsets: list[int] = (1, 37),
    n_bins: int = 20,
) -> DataFrame:
    """Embedding-geometry audit: histogram of pairwise cosines over a
    DETERMINISTIC stride-pair sample — ``(pair_offset, bin, lo, n_pairs)``.

    The cheap structural health check run before trusting any
    cosine-thresholded pipeline stage (SemDeDup radii, ANN recall,
    hard-negative margins): a healthy high-dimensional embedding space
    concentrates random-pair cosines near 0 — a histogram lump near 1
    means collapsed embeddings, and a shifted mode means an un-centered
    space (the thing ``standardize_embeddings`` fixes). Sampling is the
    id-stride rule (pair each vector with id + offset per offset) — an
    equi-join per offset, NEVER an all-pairs product, and reproducible
    bit-for-bit unlike rand() sampling. Cosines round to 6 dp before
    binning into ``n_bins`` equal bins over [−1, 1] (bin = floor((c+1)/w)
    clamped), so the bin decision compares identical rounded doubles on
    both engines; ``lo`` is the bin's lower edge, 2 dp.
    """
    pairs = None
    left = emb.select(
        F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va")
    )
    right = emb.select(
        F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb")
    )
    for off in offsets:
        p = left.join(
            right, F.col("_idb") == F.col("_ida") + F.lit(int(off))
        ).select(F.lit(int(off)).alias("pair_offset"), "_va", "_vb")
        pairs = p if pairs is None else pairs.unionByName(p)
    width = 2.0 / n_bins
    c = F.round(cosine(F.col("_va"), F.col("_vb")), 6)
    b = F.least(
        F.lit(n_bins - 1),
        F.floor((c + 1.0) / F.lit(width)).cast("int"),
    ).cast("bigint")
    return (
        pairs.select("pair_offset", b.alias("bin"))
        .groupBy("pair_offset", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            F.col("pair_offset").cast("bigint").alias("pair_offset"),
            "bin",
            (F.round(F.col("bin") * F.lit(width) - 1.0, 2) + 0.0).alias("lo"),
            "n_pairs",
        )
    )


def embedding_separability(
    emb: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """Fisher-style class-separability audit of a labeled embedding
    space: one row ``(n_vecs, n_labels, within_var, between_var,
    fisher_ratio)``.

    The go/no-go check before trusting labels (cluster ids, sources,
    quality tiers) as a blocking/stratification key over embeddings:
    between-class scatter B = sum_l (n_l/N)*||c_l - g||^2 over class
    centroids c_l and global mean g, within-class scatter W = the
    label-weighted mean squared distance to the own centroid; a ratio
    B/W near 0 means the labels are noise in this space.

    Everything reduces to per-(label, dim) sufficient statistics
    (n, sum v, sum v^2) via the variance identity — ONE posexplode +
    aggregate over the corpus (shuffle carries labels x dims rows,
    never vectors), then label-table-sized arithmetic. Coordinates are
    quantized to BIGINT micros on ingest so all three sums are exact
    integers; W and B are single double expressions over them,
    rounded 6 dp.
    """
    rows = emb.select(
        F.col(label_col).alias("_l"),
        F.posexplode(F.col(vec_col)).alias("_i", "_v"),
    ).select(
        "_l", "_i",
        F.round(F.col("_v").cast("double") * 1e6).cast("bigint").alias("_m"),
    )
    per = rows.groupBy("_l", "_i").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_m").alias("_s1"),
        F.sum(F.col("_m") * F.col("_m")).alias("_s2"),
    )
    glob = per.groupBy("_i").agg(
        F.sum("_n").alias("_gn"), F.sum("_s1").alias("_gs1")
    )
    j = per.join(glob, "_i")
    # per-(label, dim): within SS = s2 - s1^2/n; between SS = n*(c - g)^2
    within = F.col("_s2").cast("double") - F.col("_s1").cast("double") * F.col(
        "_s1"
    ).cast("double") / F.col("_n").cast("double")
    cdiff = F.col("_s1").cast("double") / F.col("_n").cast("double") - F.col(
        "_gs1"
    ).cast("double") / F.col("_gn").cast("double")
    between = F.col("_n").cast("double") * cdiff * cdiff
    acc = j.agg(
        F.sum(F.round(within).cast("bigint")).alias("_w"),
        F.sum(F.round(between).cast("bigint")).alias("_b"),
        F.max("_gn").alias("_nv"),
        (F.countDistinct("_l")).cast("bigint").alias("n_labels"),
    )
    nv = F.col("_nv").cast("double")
    return acc.select(
        F.col("_nv").cast("bigint").alias("n_vecs"),
        "n_labels",
        (F.round(F.col("_w").cast("double") / nv / 1e12, 6) + 0.0).alias(
            "within_var"
        ),
        (F.round(F.col("_b").cast("double") / nv / 1e12, 6) + 0.0).alias(
            "between_var"
        ),
        (
            F.round(
                F.when(
                    F.col("_w") > 0,
                    F.col("_b").cast("double") / F.col("_w").cast("double"),
                ),  # degenerate zero-within space: NULL, not a fake 0
                6,
            )
            + 0.0
        ).alias("fisher_ratio"),
    )


def davies_bouldin(
    emb: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """Davies-Bouldin cluster-quality index (Davies & Bouldin 1979) of
    a labeled embedding space: ``DB = (1/k) sum_i max_{j!=i}
    (s_i + s_j) / d(c_i, c_j)`` with ``s_i`` the RMS distance of
    cluster i's points to their centroid and ``d`` the centroid
    Euclidean distance — lower is better-separated. The standard
    internal validation for k-means/SemDeDup cluster assignments
    (no ground truth needed), complementing the Fisher ratio
    (:func:`embedding_separability`): DB penalizes the WORST
    neighboring cluster per cluster, not the average.

    Returns ONE row ``(n_vecs, n_clusters, db_index)`` with the counts
    over ALL clusters; ``db_index`` is NULL when fewer than 2 clusters
    OR when any cluster's centroid coincides with every other centroid
    (d²=0 pairs make its worst-pair ratio mathematically infinite —
    averaging the surviving clusters would silently under-report, so
    the degenerate case surfaces as NULL instead).

    Determinism and shape: everything reduces to per-(label, dim)
    sufficient statistics (n, sum, sum-of-squares) over micro-quantized
    coordinates — ONE posexplode + aggregate over the corpus, exactly
    the separability shape; the pairwise centroid join after it is
    labels^2 x dims-sized (tiny). Per-dim scatter and distance terms
    quantize to integer units before their cross-dim sums, and the
    final max/mean run over a k^2 table of exact integers with one-shot
    double math, so the index is engine-exact.
    """
    rows = emb.select(
        F.col(label_col).alias("_l"),
        F.posexplode(F.col(vec_col)).alias("_i", "_v"),
    ).select(
        "_l", "_i",
        F.round(F.col("_v").cast("double") * 1e6).cast("bigint").alias("_m"),
    )
    per = (
        rows.groupBy("_l", "_i")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("_m").cast("bigint").alias("_s1"),
            F.sum(F.col("_m") * F.col("_m")).cast("bigint").alias("_s2"),
        )
        .localCheckpoint()  # feeds scatter AND the pairwise centroid join
    )
    # per-cluster scatter^2 in micro^2 units: sum over dims of
    # (s2/n - (s1/n)^2), each dim's term rounded to an exact integer
    dim_var = F.round(
        F.col("_s2").cast("double")
        - F.col("_s1").cast("double") * F.col("_s1") / F.col("_n")
    ).cast("bigint")
    scat = per.select("_l", "_n", dim_var.alias("_dv")).groupBy("_l").agg(
        F.max("_n").cast("bigint").alias("_n"),
        F.sum("_dv").cast("bigint").alias("_v2"),
    )
    # pairwise centroid distance^2 in micro^2: per-dim (c_a - c_b)^2
    # rounded to an exact integer before the cross-dim sum
    a = per.select(
        F.col("_l").alias("_la"), "_i",
        (F.col("_s1").cast("double") / F.col("_n")).alias("_ca"),
    )
    b = per.select(
        F.col("_l").alias("_lb"), "_i",
        (F.col("_s1").cast("double") / F.col("_n")).alias("_cb"),
    )
    d2 = (
        a.join(b, "_i")
        .filter(F.col("_la") != F.col("_lb"))
        .select(
            "_la", "_lb",
            F.round((F.col("_ca") - F.col("_cb"))
                    * (F.col("_ca") - F.col("_cb"))).cast("bigint").alias("_t"),
        )
        .groupBy("_la", "_lb")
        .agg(F.sum("_t").cast("bigint").alias("_d2"))
    )
    sa = scat.select(
        F.col("_l").alias("_la"),
        (F.sqrt(F.col("_v2") / F.col("_n").cast("double"))).alias("_sa"),
        F.col("_n").alias("_na"),
    )
    sb = scat.select(
        F.col("_l").alias("_lb"),
        (F.sqrt(F.col("_v2") / F.col("_n").cast("double"))).alias("_sb"),
    )
    # per-pair ratio in integer nanos -> max per cluster is exact;
    # coincident centroids (d2 = 0, ratio undefined/infinite) are
    # excluded from the max rather than overflowing the cast
    ratio_nanos = F.round(
        (F.col("_sa") + F.col("_sb")) / F.sqrt(F.col("_d2").cast("double"))
        * 1e9
    ).cast("bigint")
    worst = (
        d2.filter(F.col("_d2") > 0)
        .join(sa, "_la")
        .join(sb, "_lb")
        .select("_la", "_na", ratio_nanos.alias("_r"))
        .groupBy("_la")
        .agg(F.max("_na").alias("_na"), F.max("_r").alias("_w"))
    )
    # totals over ALL clusters, not just those surviving the d2>0 filter:
    # a cluster whose centroid coincides with every other centroid has a
    # mathematically INFINITE worst-pair ratio — averaging over the
    # survivors would silently under-report the index (ADVICE r7), so
    # n_vecs/n_clusters report the true totals and db_index is NULL
    # whenever any cluster lost all its pairs to the filter.
    totals = scat.agg(
        F.sum("_n").cast("bigint").alias("n_vecs"),
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
    )
    surv = worst.agg(
        F.count(F.lit(1)).cast("bigint").alias("_k_surv"),
        F.avg(F.col("_w").cast("double")).alias("_mean_w"),
    )
    return (
        totals.crossJoin(F.broadcast(surv))
        .select(
            "n_vecs",
            "n_clusters",
            (
                F.round(
                    F.when(
                        (F.col("n_clusters") > 1)
                        & (F.col("_k_surv") == F.col("n_clusters")),
                        F.col("_mean_w") / 1e9,
                    ),
                    6,
                )
                + 0.0
            ).alias("db_index"),
        )
    )


def calinski_harabasz(
    emb: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """Calinski-Harabasz variance-ratio index (Calinski & Harabasz
    1974) of a labeled embedding space:
    ``CH = [B/(k-1)] / [W/(N-k)]`` with B the between-cluster sum of
    squared centroid deviations (weighted by cluster size) and W the
    pooled within-cluster sum of squares — higher is better-separated.
    The GLOBAL average-case cluster validity twin of
    :func:`davies_bouldin` (which penalizes each cluster's WORST
    neighbor); reading them together distinguishes "one bad cluster"
    from "everything mushy".

    Returns ONE row ``(n_vecs, n_clusters, ch_index)``; NULL index when
    k < 2, N <= k, or W = 0.

    Determinism and shape: identical to davies_bouldin — ONE
    posexplode + per-(label, dim) sufficient statistics (n, s1, s2)
    over micro-quantized coordinates; W sums the per-(label, dim)
    ``s2 - s1²/n`` terms and B the per-(label, dim) size-weighted
    squared centroid deviations, each rounded to an exact integer
    BEFORE the cross-group sums, so both engines add identical
    integers and the ratio is a one-shot double. The corpus pays one
    map-side-combinable aggregate; everything after is k·dims-sized.
    """
    rows = emb.select(
        F.col(label_col).alias("_l"),
        F.posexplode(F.col(vec_col)).alias("_i", "_v"),
    ).select(
        "_l", "_i",
        F.round(F.col("_v").cast("double") * 1e6).cast("bigint").alias("_m"),
    )
    # _s1/_s2 accumulate in DECIMAL(38,0), not BIGINT: per-(label,dim)
    # sums of _m*_m wrap a long silently past 2^63 (~9e6 rows per group
    # at unit-scale coords on the 1e6 grid) while the DuckDB oracle
    # sums into HUGEINT — the jarque_bera integer-moment recipe applies
    # verbatim (ADVICE r10)
    per = rows.groupBy("_l", "_i").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_m").cast("decimal(38,0)")).alias("_s1"),
        F.sum(
            (F.col("_m").cast("decimal(38,0)") * F.col("_m"))
            .cast("decimal(38,0)")
        ).alias("_s2"),
    )
    # grand per-dim totals (S1, N) — dims-sized broadcast back
    grand = per.groupBy("_i").agg(
        F.sum("_s1").cast("decimal(38,0)").alias("_g1"),
        F.sum("_n").cast("bigint").alias("_gn"),
    )
    dim_within = F.round(
        F.col("_s2").cast("double")
        - F.col("_s1").cast("double") * F.col("_s1").cast("double")
        / F.col("_n").cast("double")
    ).cast("bigint")
    cdev = (
        F.col("_s1").cast("double") / F.col("_n")
        - F.col("_g1").cast("double") / F.col("_gn")
    )
    dim_between = F.round(
        F.col("_n").cast("double") * cdev * cdev
    ).cast("bigint")
    j = per.join(F.broadcast(grand), "_i").select(
        "_l", "_n", "_i",
        dim_within.alias("_w"),
        dim_between.alias("_b"),
    )
    tot = j.filter(F.col("_i") == 0).groupBy().agg(
        F.sum("_n").cast("bigint").alias("n_vecs"),
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
    )
    sums = j.groupBy().agg(
        F.sum("_w").cast("bigint").alias("_sw"),
        F.sum("_b").cast("bigint").alias("_sb"),
    )
    out = tot.join(sums)
    k = F.col("n_clusters")
    n = F.col("n_vecs")
    ok = (k > 1) & (n > k) & (F.col("_sw") > 0)
    ch = (
        F.col("_sb").cast("double") / (k - 1).cast("double")
    ) / (F.col("_sw").cast("double") / (n - k).cast("double"))
    return out.select(
        "n_vecs",
        "n_clusters",
        (F.round(F.when(ok, ch), 6) + 0.0).alias("ch_index"),
    )


def silhouette_bounded(
    emb: DataFrame, vec_col: str, label_col: str, id_col: str
) -> DataFrame:
    """EXACT mean silhouette per cluster over a pre-bounded slice:
    ``s(i) = (b_i - a_i) / max(a_i, b_i)`` with ``a_i`` the mean
    distance to own-cluster co-members and ``b_i`` the best (minimum)
    mean distance to another cluster; singleton-cluster points score 0
    (the scikit-learn convention). The per-POINT validity complement
    of the sufficient-statistics indices (davies_bouldin /
    calinski_harabasz), and the only one of the three that exposes
    per-cluster quality directly.

    SCALE CONTRACT: all-pairs is quadratic BY DESIGN — the caller
    passes an absolutely bounded slice (the gate uses
    ``vec_id <= 240``, ~240 rows at ANY scale factor), exactly the
    bounded-subgraph pattern of q_graph_transitivity_exact /
    q_part_blocking_quality's truth join. The operational full-corpus
    paths stay with the linear sufficient-statistics indices.

    Returns one row per cluster ``(label_col, n_points,
    mean_silhouette)``. Determinism: coordinates micro-quantize before
    exact-integer squared distances (a per-pair array fold); each pair
    distance rounds to integer nanos after one IEEE sqrt; per-point
    means are exact-integer sums divided once; s(i) quantizes to nanos
    before the per-cluster mean — both engines aggregate identical
    integers throughout.
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * 1e6).cast("bigint"),
    )
    sub = emb.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_l"),
        q.alias("_q"),
    )
    a = sub.select(
        F.col("_id").alias("_ida"), F.col("_l").alias("_la"),
        F.col("_q").alias("_qa"),
    )
    b = sub.select(
        F.col("_id").alias("_idb"), F.col("_l").alias("_lb"),
        F.col("_q").alias("_qb"),
    )
    d2 = F.aggregate(
        F.zip_with("_qa", "_qb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    # bounded-slice all-pairs: non-equi join on purpose (see contract)
    pairs = (
        a.join(b, F.col("_ida") != F.col("_idb"))
        .select(
            "_ida", "_la", "_lb",
            F.round(F.sqrt(d2.cast("double")) * 1e9).cast("bigint").alias("_dq"),
        )
    )
    g = pairs.groupBy("_ida", "_la", "_lb").agg(
        F.sum("_dq").cast("bigint").alias("_s"),
        F.count(F.lit(1)).cast("bigint").alias("_c"),
    )
    ab = g.groupBy("_ida", "_la").agg(
        F.max(
            F.when(F.col("_lb") == F.col("_la"), F.col("_s").cast("double") / F.col("_c"))
        ).alias("_a"),
        F.min(
            F.when(F.col("_lb") != F.col("_la"), F.col("_s").cast("double") / F.col("_c"))
        ).alias("_b"),
    )
    s = F.when(
        F.col("_a").isNull() | F.col("_b").isNull(), F.lit(0.0)
    ).otherwise(
        F.when(
            F.greatest(F.col("_a"), F.col("_b")) > 0.0,
            (F.col("_b") - F.col("_a")) / F.greatest(F.col("_a"), F.col("_b")),
        ).otherwise(F.lit(0.0))
    )
    sq = ab.select(
        "_la", F.round(s * 1e9).cast("bigint").alias("_sq")
    )
    return sq.groupBy("_la").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        (
            F.round(
                F.sum("_sq").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 1e9,
                6,
            )
            + 0.0
        ).alias("mean_silhouette"),
    ).select(F.col("_la").alias(label_col), "n_points", "mean_silhouette")


def knn_loo_bounded(
    emb: DataFrame, vec_col: str, label_col: str, id_col: str
) -> DataFrame:
    """Leave-one-out 1-NN label accuracy per cluster over a pre-bounded
    slice: each point is classified by its single nearest OTHER point's
    label — the standard separability probe that asks "does local
    geometry already predict the label?", complementing
    :func:`silhouette_bounded` (geometry quality) with a task-shaped
    readout. Distance ties break on the smaller neighbor id (total
    order, engine-deterministic).

    SCALE CONTRACT: all-pairs inside an absolutely bounded slice only
    (the gate uses ``vec_id <= 240``) — the silhouette_bounded /
    transitivity-exact pattern. Operational full-corpus neighbor
    search stays with the LSH/IVF paths.

    Returns one row per cluster ``(label_col, n_points, n_correct,
    accuracy)``. Determinism: micro-quantized coordinates, exact
    integer squared distances, and a per-point ``row_number`` over the
    (distance, neighbor-id) total order.
    """
    from pyspark.sql import Window as W

    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * 1e6).cast("bigint"),
    )
    sub = emb.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_l"),
        q.alias("_q"),
    )
    a = sub.select(
        F.col("_id").alias("_ida"), F.col("_l").alias("_la"),
        F.col("_q").alias("_qa"),
    )
    b = sub.select(
        F.col("_id").alias("_idb"), F.col("_l").alias("_lb"),
        F.col("_q").alias("_qb"),
    )
    d2 = F.aggregate(
        F.zip_with("_qa", "_qb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    pairs = a.join(b, F.col("_ida") != F.col("_idb")).select(
        "_ida", "_la", "_idb", "_lb", d2.alias("_d2")
    )
    w = W.partitionBy("_ida").orderBy("_d2", "_idb")
    nn = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_ida", "_la", (F.col("_lb") == F.col("_la")).alias("_hit"))
    )
    return nn.groupBy("_la").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum(F.col("_hit").cast("bigint")).cast("bigint").alias("n_correct"),
    ).select(
        F.col("_la").alias(label_col),
        "n_points",
        "n_correct",
        (
            F.round(
                F.col("n_correct").cast("double")
                / F.col("n_points").cast("double"),
                6,
            )
            + 0.0
        ).alias("accuracy"),
    )

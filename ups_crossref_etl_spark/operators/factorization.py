"""Alternating least squares matrix factorization (explicit feedback).

Extension layer — no counterpart in /root/reference (the reference is a
bibliometric ETL; this is the recsys/embedding-training shape a
training-data platform runs on interaction logs: low-rank user/item
factors for retrieval, candidate generation, and preference features).

ALS (Koren, Bell & Volinsky 2009; Zhou et al. 2008 "Large-scale
Parallel Collaborative Filtering for the Netflix Prize") alternates two
closed-form ridge regressions:

    U_u = (Σ_{i∈R(u)} v_i v_iᵀ + λ·n_u·I)⁻¹ Σ_{i∈R(u)} r_ui v_i
    V_i = (Σ_{u∈R(i)} u_u u_uᵀ + λ·n_i·I)⁻¹ Σ_{u∈R(i)} r_ui u_u

(the weighted-λ regularization of Zhou et al., which scales the ridge
with each entity's rating count).

Spark-first decomposition of one half-step, all JVM until the tiny
per-entity solve:

1. join ratings ⋈ current factors on the fixed side's key (plain
   shuffle equi-join);
2. per-row outer product ``v vᵀ`` and rhs ``r·v`` as NESTED ARRAY
   EXPRESSIONS (``F.flatten(F.transform(v, x -> F.transform(v, y ->
   x*y)))`` — whole-stage-codegen'd, no Python);
3. ONE entity-keyed aggregate with ``rank² + rank + 1`` scalar ``sum``
   columns (map-side partial aggregation — the shuffle carries
   rank²+rank doubles per entity, not per rating);
4. solve the rank×rank normal equations per entity in ONE
   Arrow-vectorized ``pandas_udf`` (``np.linalg.solve`` row loop —
   rank is single digits, the batch is thousands of entities).

At 100 TB: the only fact-sized shuffles are the two joins per
iteration, each keyed on the side being held fixed; factor tables are
entity-sized (broadcastable when one side is small). Iterations are a
driver-side loop over BOUNDED state (two factor DataFrames,
localCheckpointed per half-step to cut lineage). No collect anywhere.

Determinism: factor init is hash-derived per (entity, component) —
reproducible across runs/partitionings; double SUM accumulation order
can wiggle final factors at the ulp level, so downstream gates pin
BOOLEAN contracts (RMSE beats baseline, monotone descent) plus
exactly-quantized baselines rather than hashing raw factors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["als_factorize", "als_rmse", "predict_ratings"]

#: Threshold for the driver-side normal-equation solve (r12 verdict #5,
#: the cox _DRIVER_TIME_TABLE_MAX pattern): when the side being solved
#: has <= this many entities, the per-entity (rank² + rank + 1) packed
#: sufficient statistics are collected (one job — replacing the
#: pandas_udf solve + localCheckpoint job pair and its Python-worker
#: round trip) and solved in one numpy batch on the driver; the factor
#: table re-enters the plan as a broadcastable local DataFrame. At
#: 65,536 entities and rank 8 the collected payload is ~38 MB of
#: doubles — driver-safe; beyond it the distributed Arrow solve is the
#: only scale-correct choice and remains the default.
_DRIVER_SOLVE_MAX = 65536


def _init_factors(
    entities: DataFrame, key_col: str, rank: int, scale: float = 0.1
) -> DataFrame:
    """Deterministic pseudo-random init in [0, scale): xxhash64 of
    (entity, component) — no RNG, identical on every run and
    partitioning. xxhash64 (not a bigint cast) so STRING keys hash
    rather than casting to NULL (all-NULL factors, silently), and
    ``pmod`` keeps negative hash values inside the documented
    [0, scale) range."""
    comps = [
        (
            F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(1000003))
            / 1000003.0
            * scale
        ).alias(f"_f{j}")
        for j in range(rank)
    ]
    return entities.select(
        F.col(key_col).alias("_e"), F.array(*comps).alias("_fac")
    )


def _solve_side(
    ratings: DataFrame,
    solve_key: str,
    fixed_key: str,
    rating_col: str,
    fixed_factors: DataFrame,
    rank: int,
    reg: float,
    n_solve: int | None = None,
    n_fixed: int | None = None,
):
    """One ALS half-step: re-estimate ``solve_key``'s factors holding
    ``fixed_key``'s fixed. Returns (entity, factor array).

    ``n_solve``/``n_fixed`` (entity counts, measured once per fit by
    :func:`als_factorize`) pick the fixed-cost-minimal physical shape
    without changing results: a bounded fixed side is broadcast into
    the ratings join (map-side — the fact table never reshuffles per
    half-step), and a bounded solve side takes the driver batch solve
    (see ``_DRIVER_SOLVE_MAX``) instead of pandas_udf + checkpoint."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    fixed_in = (
        F.broadcast(fixed_factors)
        if n_fixed is not None and n_fixed <= 262_144
        else fixed_factors
    )
    joined = ratings.select(
        F.col(solve_key).alias("_s"),
        F.col(fixed_key).alias("_e"),
        F.col(rating_col).cast("double").alias("_r"),
    ).join(fixed_in, "_e")
    v = F.col("_fac")
    outer = F.flatten(
        F.transform(v, lambda x: F.transform(v, lambda y: x * y))
    )
    rhs = F.transform(v, lambda x: F.col("_r") * x)
    per_row = joined.select(
        "_s", outer.alias("_o"), rhs.alias("_b")
    )
    agg_cols = (
        [F.sum(F.col("_o")[i]).alias(f"_a{i}") for i in range(rank * rank)]
        + [F.sum(F.col("_b")[j]).alias(f"_b{j}") for j in range(rank)]
        + [F.count(F.lit(1)).cast("double").alias("_n")]
    )
    sums = per_row.groupBy("_s").agg(*agg_cols)
    lam = float(reg)
    r = rank

    if n_solve is not None and n_solve <= _DRIVER_SOLVE_MAX:
        # bounded solve side: ONE job pulls the (rank²+rank+1)-wide
        # per-entity sufficient statistics over Arrow (no Row objects),
        # every rank×rank system solves in ONE batched LAPACK call
        # (np.linalg.solve on an (n, r, r) stack — same arithmetic the
        # Arrow-UDF path runs per batch), and the factor table re-enters
        # the plan as a parallelized local table Catalyst broadcasts
        # into the next half-step's join for free
        import pyarrow as pa

        spark = ratings.sparkSession
        tbl = sums.toArrow()
        n_rows = tbl.num_rows
        if n_rows == 0:
            from pyspark.sql.types import StructField, StructType

            etype = joined.schema["_s"].dataType
            return spark.createDataFrame(
                [],
                StructType([
                    StructField("_e", etype),
                    StructField("_fac", ArrayType(DoubleType())),
                ]),
            )
        col = {
            c: tbl.column(c).to_numpy(zero_copy_only=False)
            for c in tbl.column_names
        }
        a = np.stack(
            [col[f"_a{i}"] for i in range(r * r)], axis=1
        ).reshape(n_rows, r, r)
        b = np.stack([col[f"_b{j}"] for j in range(r)], axis=1)
        a = a + (lam * col["_n"])[:, None, None] * np.eye(r)
        try:
            x = np.linalg.solve(a, b)
        except np.linalg.LinAlgError:
            # rare singular entity: per-row fallback, zeros where it
            # fails (mirrors the Arrow-UDF path's per-row try/except)
            x = np.zeros((n_rows, r))
            for i in range(n_rows):
                try:
                    x[i] = np.linalg.solve(a[i], b[i])
                except np.linalg.LinAlgError:
                    pass
        out_tbl = pa.table(
            {
                "_e": tbl.column("_s"),
                "_fac": pa.array(x.tolist(), type=pa.list_(pa.float64())),
            }
        )
        return spark.createDataFrame(out_tbl)

    packed = sums.select(
        F.col("_s").alias("_e"),
        F.array(
            *[F.col(f"_a{i}") for i in range(rank * rank)],
            *[F.col(f"_b{j}") for j in range(rank)],
            F.col("_n"),
        ).alias("_p"),
    )

    @pandas_udf(ArrayType(DoubleType()))
    def _solve_udf(p):  # p: Series of lists, len rank^2 + rank + 1
        out = []
        for row in p:
            arr = np.asarray(row, dtype=np.float64)
            a = arr[: r * r].reshape(r, r)
            b = arr[r * r : r * r + r]
            n = arr[-1]
            a = a + lam * n * np.eye(r)
            try:
                out.append(np.linalg.solve(a, b).tolist())
            except np.linalg.LinAlgError:
                out.append([0.0] * r)
        return pd.Series(out)

    return packed.select("_e", _solve_udf(F.col("_p")).alias("_fac"))


def als_factorize(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    rank: int = 8,
    reg: float = 0.1,
    iterations: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Train explicit-feedback ALS; returns ``(user_factors,
    item_factors)`` as ``(user/item, factors array<double>)``.

    Driver loop is ``2 * iterations`` half-steps over bounded state;
    each half-step is one equi-join (fixed side broadcast when its
    entity count is bounded) + one map-side-combined aggregate + one
    solve — a single batched driver LAPACK call below
    ``_DRIVER_SOLVE_MAX`` entities, the distributed Arrow solve above
    it (see module docstring for the 100 TB shape).
    """
    if rank < 1 or iterations < 1:
        raise ValueError("als_factorize: rank and iterations must be >= 1")
    # r13: materialize the ratings relation ONCE — every half-step joins
    # it and the gate feeds an aggregate here, so without this the
    # upstream scan+shuffle re-executed 2*iterations times; the entity-
    # count job below completes the lazy checkpoint in the same job
    ratings = ratings.localCheckpoint(eager=False)
    items = ratings.select(F.col(item_col).alias(item_col)).distinct()
    # entity counts, measured ONCE per fit in ONE aggregate job: they
    # gate the driver batch solve and the broadcast of the fixed factor
    # side — per-iteration physical shape, zero result change (r12
    # verdict #5, the cox fixed-cost lesson)
    cnt = ratings.agg(
        F.count_distinct(F.col(user_col)).alias("_nu"),
        F.count_distinct(F.col(item_col)).alias("_ni"),
    ).first()
    n_users, n_items = int(cnt["_nu"]), int(cnt["_ni"])
    item_f = _init_factors(items, item_col, rank)
    if n_items > _DRIVER_SOLVE_MAX:
        item_f = item_f.localCheckpoint()
    user_f = None
    for _ in range(iterations):
        user_f = _solve_side(
            ratings, user_col, item_col, rating_col, item_f, rank, reg,
            n_solve=n_users, n_fixed=n_items,
        )
        if n_users > _DRIVER_SOLVE_MAX:
            # distributed-path output only: the driver-solved table is
            # already a LocalRelation (checkpointing it would add a job)
            user_f = user_f.localCheckpoint()
        item_f = _solve_side(
            ratings, item_col, user_col, rating_col, user_f, rank, reg,
            n_solve=n_items, n_fixed=n_users,
        )
        if n_items > _DRIVER_SOLVE_MAX:
            item_f = item_f.localCheckpoint()
    # Coverage by construction (no zero-fill join needed): every entity
    # of ``ratings`` contributes >= 1 row to its side's sufficient-
    # statistics aggregate (the fixed side always covers all entities:
    # init does, and each solve preserves it), so both factor tables
    # already cover the full entity sets. The former zero-fill
    # left-join re-ran two distinct() shuffles inside EVERY downstream
    # consumer plan — pure fixed cost.
    uf = user_f.select(
        F.col("_e").alias(user_col), F.col("_fac").alias("factors")
    )
    itf = item_f.select(
        F.col("_e").alias(item_col), F.col("_fac").alias("factors")
    )
    return uf, itf


def predict_ratings(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    user_factors: DataFrame,
    item_factors: DataFrame,
) -> DataFrame:
    """Append ``prediction`` = dot(U_u, V_i) to a rating table — two
    equi-joins + a ``zip_with``/``aggregate`` dot product, all JVM."""
    uf = user_factors.select(
        F.col(user_col).alias("_ju"), F.col("factors").alias("_uf")
    )
    itf = item_factors.select(
        F.col(item_col).alias("_ji"), F.col("factors").alias("_if")
    )
    out = (
        ratings.join(uf, ratings[user_col] == uf["_ju"])
        .join(itf, ratings[item_col] == itf["_ji"])
        .withColumn(
            "prediction",
            F.aggregate(
                F.zip_with("_uf", "_if", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .drop("_ju", "_ji", "_uf", "_if")
    )
    return out


def als_rmse(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    user_factors: DataFrame,
    item_factors: DataFrame,
) -> float:
    """Root-mean-squared error of the factor model on a rating table
    (one aggregate — used by the bound gates and tests)."""
    pred = predict_ratings(
        ratings, user_col, item_col, user_factors, item_factors
    )
    row = pred.select(
        F.sqrt(
            F.avg(
                (F.col(rating_col).cast("double") - F.col("prediction"))
                * (F.col(rating_col).cast("double") - F.col("prediction"))
            )
        ).alias("rmse")
    ).collect()[0]
    return float(row["rmse"])

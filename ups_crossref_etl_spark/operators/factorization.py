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
):
    """One ALS half-step: re-estimate ``solve_key``'s factors holding
    ``fixed_key``'s fixed. Returns (entity, factor array)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    joined = ratings.select(
        F.col(solve_key).alias("_s"),
        F.col(fixed_key).alias("_e"),
        F.col(rating_col).cast("double").alias("_r"),
    ).join(fixed_factors, "_e")
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
    packed = sums.select(
        F.col("_s").alias("_e"),
        F.array(
            *[F.col(f"_a{i}") for i in range(rank * rank)],
            *[F.col(f"_b{j}") for j in range(rank)],
            F.col("_n"),
        ).alias("_p"),
    )

    lam = float(reg)
    r = rank

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
    each half-step is one equi-join + one map-side-combined aggregate +
    one Arrow solve (see module docstring for the 100 TB shape).
    """
    if rank < 1 or iterations < 1:
        raise ValueError("als_factorize: rank and iterations must be >= 1")
    users = ratings.select(
        F.col(user_col).alias(user_col)
    ).distinct()
    items = ratings.select(F.col(item_col).alias(item_col)).distinct()
    item_f = _init_factors(items, item_col, rank).localCheckpoint()
    user_f = None
    for _ in range(iterations):
        user_f = _solve_side(
            ratings, user_col, item_col, rating_col, item_f, rank, reg
        ).localCheckpoint()
        item_f = _solve_side(
            ratings, item_col, user_col, rating_col, user_f, rank, reg
        ).localCheckpoint()
    uf = user_f.select(
        F.col("_e").alias(user_col), F.col("_fac").alias("factors")
    )
    itf = item_f.select(
        F.col("_e").alias(item_col), F.col("_fac").alias("factors")
    )
    # entities with no ratings never appear in a solve; join back with
    # zero vectors so the factor tables cover the full entity sets
    zero = F.array(*[F.lit(0.0) for _ in range(rank)])
    uf = (
        users.join(uf, user_col, "left")
        .select(user_col, F.coalesce("factors", zero).alias("factors"))
    )
    itf = (
        items.join(itf, item_col, "left")
        .select(item_col, F.coalesce("factors", zero).alias("factors"))
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

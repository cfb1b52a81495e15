"""Distributed logistic regression (IRLS / Newton-Raphson) — the
trainable document-quality classifier of an LLM-data pipeline.

Extension layer — no counterpart in /root/reference. The fastText-style
"train a small classifier on labeled examples, score the whole corpus"
loop is a core training-data operation (CCNet, GPT-3 and LLaMA data
pipelines all filter web text with one); this is that loop as pure
DataFrame ops.

IRLS (iteratively reweighted least squares — the standard GLM fit,
McCullagh & Nelder 1989): each Newton step solves

    w_new = w + (Xᵀ R X + λI)⁻¹ Xᵀ (y − μ),   μ = σ(Xw), R = diag(μ(1−μ))

Spark-first decomposition of one step, mirroring factorization.py:

1. score every row JVM-side: ``σ(w·x)`` via ``zip_with``/``aggregate``
   dot product against the current weights as ARRAY LITERALS (the model
   is driver state — d+1 doubles, like ivf's centroids);
2. ONE whole-table aggregate with ``d² + d + 1`` scalar sums building
   the Hessian ``Xᵀ R X``, gradient ``Xᵀ(y−μ)`` and log-loss —
   map-side combined, the shuffle carries one d²-vector per partition;
3. the d×d solve happens on the DRIVER (numpy) — bounded model state,
   not data.

At 100 TB: each iteration is one scan + one tree-aggregate; no join,
no window, no per-row Python. Feature width d is the bound (quality
features: single digits). Step-halving guards the Newton overshoot so
the train loss is non-increasing by construction.

Determinism: init w=0 (no RNG); double sums are order-dependent at ulp
level, so gates pin BOOLEAN contracts (loss decreased, AUC beats
chance) plus exact-integer side stats, the repo's *_bound pattern.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["logreg_irls", "logreg_score"]


def _dot_w(features_col, w: list[float]):
    """JVM-side dot(features, w) + intercept; w[0] is the intercept,
    w[1:] pair with the feature array."""
    arr = F.array(*[F.lit(float(c)) for c in w[1:]])
    return F.lit(float(w[0])) + F.aggregate(
        F.zip_with(features_col, arr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def logreg_score(df: DataFrame, features_col: str, w: list[float],
                 out_col: str = "score") -> DataFrame:
    """Append ``σ(w·x)`` — one codegen'd expression, no Python."""
    z = _dot_w(F.col(features_col), w)
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def _sufficient_stats_df(df, features_col, label_col, w, d):
    """The LAZY one-aggregate DataFrame behind :func:`_sufficient_stats`
    — split out so tools/dump_plans.py can pin the per-Newton-step plan
    (one scan + one map-side-combined aggregate carrying d²+d doubles)
    without executing a training run."""
    z = _dot_w(F.col(features_col), w)
    mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    r = mu * (F.lit(1.0) - mu)
    y = F.col(label_col).cast("double")
    # x_i with x_0 = 1 (intercept)
    def x(i):
        if i == 0:
            return F.lit(1.0)
        return F.element_at(F.col(features_col), i)

    aggs = []
    for i in range(d + 1):
        for j in range(i, d + 1):
            aggs.append(F.sum(r * x(i) * x(j)).alias(f"_h_{i}_{j}"))
    for i in range(d + 1):
        aggs.append(F.sum((y - mu) * x(i)).alias(f"_g_{i}"))
    eps = 1e-12
    loss = -(
        y * F.log(F.greatest(mu, F.lit(eps)))
        + (F.lit(1.0) - y) * F.log(F.greatest(F.lit(1.0) - mu, F.lit(eps)))
    )
    aggs.append(F.sum(loss).alias("_loss"))
    aggs.append(F.count(F.lit(1)).cast("bigint").alias("_n"))
    return df.agg(*aggs)


def _sufficient_stats(df, features_col, label_col, w, d):
    """One aggregate returning (H flat d+1 x d+1 with ridge added later,
    g vector, loss, n): X includes the implicit intercept column."""
    return _sufficient_stats_df(df, features_col, label_col, w, d).collect()[0]


def logreg_irls(
    df: DataFrame,
    features_col: str,
    label_col: str,
    dim: int,
    reg: float = 1e-3,
    iterations: int = 8,
    tol: float = 1e-8,
) -> dict:
    """Fit logistic regression on ``(features array<double>[dim],
    boolean/0-1 label)``; returns ``{"weights": [intercept, w_1..w_d],
    "loss_path": [initial, per-accepted-step...], "n": rows,
    "iterations_run": k}``.

    Newton steps with step-halving: a proposed step that does not
    reduce the (ridge-penalized) train loss is halved up to 10 times,
    so ``loss_path`` is non-increasing by construction. Stops early
    when the loss improvement falls under ``tol``.
    """
    import numpy as np

    if dim < 1 or iterations < 1:
        raise ValueError("logreg_irls: dim and iterations must be >= 1")
    d = dim
    base = df.select(
        F.col(features_col).alias("_x"), F.col(label_col).cast("int").alias("_y")
    ).localCheckpoint()

    def stats_for(w):
        return _sufficient_stats(base, "_x", "_y", w, d)

    def penalized(row, w):
        return float(row["_loss"]) + 0.5 * reg * sum(c * c for c in w[1:])

    w = [0.0] * (d + 1)
    row = stats_for(w)
    n = int(row["_n"])
    loss_path = [penalized(row, w)]
    for it in range(iterations):
        h = np.zeros((d + 1, d + 1))
        for i in range(d + 1):
            for j in range(i, d + 1):
                h[i, j] = h[j, i] = float(row[f"_h_{i}_{j}"])
        g = np.array([float(row[f"_g_{i}"]) for i in range(d + 1)])
        # ridge on the non-intercept weights (gradient and Hessian)
        g[1:] -= reg * np.asarray(w[1:])
        h[1:, 1:] += reg * np.eye(d)
        h += 1e-9 * np.eye(d + 1)  # numeric floor for separable data
        try:
            step = np.linalg.solve(h, g)
        except np.linalg.LinAlgError:
            break
        accepted = False
        scale = 1.0
        for _ in range(10):
            w_try = [w[i] + scale * step[i] for i in range(d + 1)]
            row_try = stats_for(w_try)
            l_try = penalized(row_try, w_try)
            if l_try <= loss_path[-1]:
                w, row = w_try, row_try
                loss_path.append(l_try)
                accepted = True
                break
            scale *= 0.5
        if not accepted:
            break
        if len(loss_path) >= 2 and loss_path[-2] - loss_path[-1] < tol * n:
            break
    return {
        "weights": [float(c) for c in w],
        "loss_path": [float(x) for x in loss_path],
        "n": n,
        "iterations_run": len(loss_path) - 1,
    }

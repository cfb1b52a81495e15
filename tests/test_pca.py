from __future__ import annotations

import numpy as np

from ups_crossref_etl_spark.operators.pca import pca_fit, pca_transform
from ups_crossref_etl_spark.sources.lake import read_table


def _toy(spark, n=200, d=6, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic gaussian: known dominant directions
    scales = np.array([10.0, 5.0, 2.0, 1.0, 0.5, 0.1])
    x = rng.randn(n, d) * scales + np.arange(d)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        x.astype(np.float32).astype(np.float64),
    )


def test_pca_matches_numpy(spark):
    df, x = _toy(spark)
    model = pca_fit(df, "embedding", k=3)
    cov = np.cov(x.T, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    assert np.allclose(model.eigenvalues, evals, rtol=1e-8)
    assert np.allclose(model.mean, x.mean(axis=0), rtol=1e-9)
    # orthonormal, descending
    g = model.components @ model.components.T
    assert np.max(np.abs(g - np.eye(3))) < 1e-9
    assert np.all(np.diff(model.eigenvalues) <= 1e-12)


def test_pca_projection_variance_equals_eigenvalues(spark):
    df, _x = _toy(spark)
    model = pca_fit(df, "embedding", k=3)
    out = pca_transform(df, model, "embedding").collect()
    p = np.array([r["pc"] for r in out])
    var = p.var(axis=0)
    assert np.allclose(var, model.eigenvalues, rtol=1e-8)
    # projections are centered
    assert np.max(np.abs(p.mean(axis=0))) < 1e-9


def test_pca_beats_fewer_components_on_reconstruction(spark):
    df, _x = _toy(spark)
    m2 = pca_fit(df, "embedding", k=2)
    m4 = pca_fit(df, "embedding", k=4)
    resid2 = m2.total_variance - m2.eigenvalues.sum()
    resid4 = m4.total_variance - m4.eigenvalues.sum()
    assert resid4 < resid2 < m2.total_variance


def test_pca_on_embeddings_table(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, "embedding", k=4)
    assert model.n == emb.count()
    assert model.components.shape[1] == 64
    out = pca_transform(emb, model, "embedding")
    assert len(out.first()["pc"]) == 4

"""Distributed PCA/whitening vs numpy computed directly on the same rows
(float tolerance — the covariance sum is float-order sensitive, see
operators/pca.py docstring), plus model determinism and the null envelope."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.pca import (
    embedding_moments,
    pca_model,
    project_embeddings,
)


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.RandomState(7)
    # Anisotropic cloud: strong variance on a known direction.
    base = rng.randn(200, 6)
    base[:, 0] *= 5.0
    base[:, 1] *= 2.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(200)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        base.astype(np.float64),
    )


def _np_cov(x):
    mean = x.mean(axis=0)
    return mean, (x.T @ x) / len(x) - np.outer(mean, mean)


def test_moments_match_numpy(spark, embs):
    df, x = embs
    # float32 storage: compare against numpy over the same float32 values.
    x32 = x.astype(np.float32).astype(np.float64)
    n, mean, cov = embedding_moments(df)
    want_mean, want_cov = _np_cov(x32)
    assert n == 200
    assert np.allclose(mean, want_mean, atol=1e-9)
    assert np.allclose(cov, want_cov, atol=1e-9)


def test_pca_model_matches_numpy_eigh(spark, embs):
    df, x = embs
    x32 = x.astype(np.float32).astype(np.float64)
    model = pca_model(df, k=3)
    _, cov = _np_cov(x32)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    assert np.allclose(model["eigvals"], w[order], rtol=1e-9)
    for ci, i in enumerate(order):
        c = v[:, i]
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c = -c
        assert np.allclose(model["components"][ci], c, atol=1e-8)
    # The planted dominant direction is axis 0.
    assert abs(model["components"][0][0]) > 0.99


def test_projection_variance_equals_eigvals_and_whiten(spark, embs):
    df, _ = embs
    model = pca_model(df, k=3)
    proj = project_embeddings(df, model).select(F.col("proj"))
    p = np.asarray([r["proj"] for r in proj.collect()])
    var = p.var(axis=0)
    assert np.allclose(var, model["eigvals"], rtol=1e-6)
    # Components are decorrelated after projection.
    off = np.cov(p.T, bias=True) - np.diag(var)
    assert np.abs(off).max() < 1e-6
    white = project_embeddings(df, model, whiten=True)
    pw = np.asarray([r["proj"] for r in white.select("proj").collect()])
    assert np.allclose(pw.var(axis=0), 1.0, rtol=1e-6)


def test_projection_null_envelope_and_codegen(spark):
    model = {
        "n": 2,
        "mean": [0.0, 0.0],
        "components": [[1.0, 0.0]],
        "eigvals": [1.0],
    }
    df = spark.createDataFrame(
        [(1, [2.0, 3.0]), (2, None), (3, [1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["proj"]
        for r in project_embeddings(df, model).collect()
    }
    assert got[1] == [2.0]
    assert got[2] is None and got[3] is None  # null + dim-mismatch envelope
    plan = (
        project_embeddings(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_model_deterministic_across_repartition(spark, embs):
    df, _ = embs
    m1 = pca_model(df, k=2)
    m2 = pca_model(df.repartition(7), k=2)
    assert np.allclose(m1["components"], m2["components"], atol=1e-9)
    assert np.allclose(m1["eigvals"], m2["eigvals"], rtol=1e-9)

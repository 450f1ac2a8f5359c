"""Distributed PCA / whitening for the embedding toolbox.

The missing step between raw embeddings and the similarity stack
(similarity.py, dedup.py): decorrelate / reduce an ``array<float>``
embedding column before cosine dedup or ANN indexing — the SemDeDup-style
pipelines cluster WHITENED embeddings, and IVF/PQ recall improves when the
energy is concentrated in the leading dimensions. The reference has no
analog (its embeddings go straight to cosine,
/root/reference/utils/embedding_utils.py); this is a scale-path addition
in the same family as the PQ/IVF index builders (similarity.py:154,433).

Scale shape (the 100 TB stance):

* MOMENTS are a one-pass Arrow-batched partial aggregation
  (``mapInPandas``): each batch contributes (count, column sums, X^T X)
  — O(d^2) doubles per batch regardless of batch rows, all numpy matmul,
  zero per-row Python. The partials (per-batch rows of d + d^2 doubles)
  are a batches-count-sized frame; combining them on the driver is exact
  and tiny (64-dim: ~33 KB per batch row). The corpus itself is never
  collected, never shuffled — the ONLY data movement is the partial rows.
* The EIGENDECOMPOSITION runs on the driver over the d x d covariance
  (d <= a few thousand — driver-trivial), exactly like the IVF centroid
  table: model state is O(k x d), never corpus-proportional.
* PROJECTION embeds the (k x d) component matrix as literal arrays in a
  single JVM expression — ``aggregate(zip_with(...))`` dot products per
  component, the same codegen idiom as `similarity.cosine_col` — so the
  projection joins whole-stage codegen with zero Python and no join. For
  k x d beyond literal-friendly sizes (>~2^16 doubles), switch to the
  documented broadcast-join fallback the IVF docstring describes.

Determinism: eigenvector SIGN is fixed (largest-|component| entry made
positive, ties to the lowest index), so the model is reproducible given
identical covariance. The covariance itself is a float sum whose order
depends on batch layout — parallelism-invariant only to ~1e-12 relative,
which is why the differential tests compare against numpy with tolerance
instead of the bit-exact hash compare the integer-valued operators use
(and why the contract entry is rows/schema-only: an eigendecomposition
has no ANSI-SQL oracle).
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def embedding_moments(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[int, list, list]:
    """One-pass first+second moments -> (n, mean[d], cov[d][d]).

    Covariance is the population (divide-by-n) covariance of the vectors.
    Partial per-Arrow-batch sums via numpy; exact driver combine of the
    batches-sized partial frame. Rows with null or empty vectors are
    skipped (counted out of n).
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            vecs = [v for v in pdf["_v"] if v is not None and len(v)]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            yield pd.DataFrame(
                {
                    "n": [len(vecs)],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = (
        embeddings.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .mapInPandas(partials, out_schema)
        .collect()
    )
    if not rows:
        return 0, [], []
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    ss = np.zeros(d * d)
    # Deterministic combine order (partials sorted by content) so the same
    # data always produces the same driver-side sums even if collect order
    # varies run to run.
    for r in sorted(rows, key=lambda r: (r["n"], r["s"])):
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"])
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean.tolist(), cov.tolist()


def pca_model(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Fit -> {"n", "mean": [d], "components": [k][d], "eigvals": [k]}.

    Components are the top-``k`` covariance eigenvectors, descending
    eigenvalue, each sign-fixed (largest-|entry| coordinate positive,
    ties to the lowest index). Eigenvalues clamp at 0 (symmetric-matrix
    roundoff can dip epsilon-negative)."""
    import numpy as np

    n, mean, cov = embedding_moments(embeddings, id_col=id_col, vec_col=vec_col)
    if n == 0:
        return {"n": 0, "mean": [], "components": [], "eigvals": []}
    d = len(mean)
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    w, v = np.linalg.eigh(np.asarray(cov))  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = []
    eig = []
    for i in order:
        c = v[:, i]
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c = -c
        comps.append(c.tolist())
        eig.append(max(float(w[i]), 0.0))
    return {"n": n, "mean": mean, "components": comps, "eigvals": eig}


def project_embeddings(
    embeddings: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "proj",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Adds ``out_col`` = array<double> of length k: the centered
    projection onto the model's components — whitened (unit variance per
    component) when ``whiten``. ONE JVM expression: per-component
    ``aggregate(zip_with(centered, comp, *), +)`` dot products with the
    component matrix as literals (whole-stage codegen, zero Python — the
    `similarity.cosine_col` idiom). Null/empty vectors project to null."""
    if not model.get("components"):
        raise ValueError("empty PCA model")
    mean = model["mean"]
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    outs = []
    for ci, comp in enumerate(model["components"]):
        dot = F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in comp]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if whiten:
            dot = dot / F.lit(math.sqrt(model["eigvals"][ci] + eps))
        outs.append(dot)
    proj = F.when(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == len(mean)),
        F.array(*outs),
    )
    return embeddings.withColumn(out_col, proj)

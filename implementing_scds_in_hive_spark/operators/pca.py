"""PCA over embedding columns: trained dimensionality reduction to
complement the training-free tiers (sign-bit LSH, JL random projection,
int8 quantization) — PCA finds the directions the corpus actually
varies in, so at equal output dims it preserves more variance than any
data-oblivious projection.

Distribution shape — the textbook two-phase reduction:

1. **Covariance** (the only pass over the corpus): per-partition
   partial moments (n, sum x, X^T X) accumulated in numpy via
   ``mapInPandas`` — the legitimate Arrow-batched Python tier for dense
   linear algebra (a d x d outer-product sum per row is exactly the
   shape JVM array expressions handle worst and BLAS handles best; the
   per-batch work is one ``X.T @ X``). One row PER PARTITION comes back
   (d + d^2 doubles), an O(#partitions) driver fold — same budget class
   as the two-pass prefix-sum offsets. The corpus never shuffles.
2. **Eigendecomposition** on the d x d driver-side matrix (numpy
   ``eigh`` — d is the EMBEDDING dim, 64 here; this is O(d^3) driver
   work, independent of corpus size).
3. **Transform**: scores = (x - mean) @ W_k, compiled like the JL tier
   as plan-time literal arrays — dot products against constant vectors,
   JVM-side, no Python in the scoring path.

Eigenvector sign is fixed by convention (largest-|component| entry made
positive) so models are deterministic across runs/platforms.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.functions.vectors import dot


def covariance_moments(
    emb: DataFrame, *, vec_col: str = "embedding", dim: int
) -> tuple[int, np.ndarray, np.ndarray]:
    """Exact corpus moments ``(n, mean, cov)`` (population covariance,
    the PCA convention). One corpus pass; partials folded in partition
    order for run-to-run determinism."""
    part_schema = "pid long, n long, sumx array<double>, xtx array<double>"

    def partials(batches):
        import pandas as pd
        from pyspark import TaskContext

        n = 0
        sumx = np.zeros(dim)
        xtx = np.zeros((dim, dim))
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += X.shape[0]
            sumx += X.sum(axis=0)
            xtx += X.T @ X
        if n:
            # partition id keys the driver fold order -> deterministic
            # float accumulation across identical runs
            yield pd.DataFrame(
                {
                    "pid": [TaskContext.get().partitionId()],
                    "n": [n],
                    "sumx": [sumx.tolist()],
                    "xtx": [xtx.ravel().tolist()],
                }
            )

    rows = sorted(
        emb.select(vec_col).mapInPandas(partials, part_schema).collect(),
        key=lambda r: r["pid"],
    )
    if not rows:
        raise ValueError("empty corpus")
    n = sum(r["n"] for r in rows)
    sumx = np.sum([np.array(r["sumx"]) for r in rows], axis=0)
    xtx = np.sum([np.array(r["xtx"]).reshape(dim, dim) for r in rows], axis=0)
    mean = sumx / n
    cov = xtx / n - np.outer(mean, mean)
    return n, mean, cov


@dataclass(frozen=True)
class PCAModel:
    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]  # k rows, each a d-vector
    explained_variance: tuple[float, ...]  # k eigenvalues, descending
    total_variance: float

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def explained_ratio(self) -> tuple[float, ...]:
        return tuple(v / self.total_variance for v in self.explained_variance)


def pca_fit(
    emb: DataFrame, k: int, *, vec_col: str = "embedding", dim: int
) -> PCAModel:
    """Fit a k-component PCA from one corpus pass (see module
    docstring). Components are orthonormal rows, descending variance,
    signs canonicalized."""
    _, mean, cov = covariance_moments(emb, vec_col=vec_col, dim=dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append(tuple(float(x) for x in v))
    return PCAModel(
        mean=tuple(float(x) for x in mean),
        components=tuple(comps),
        explained_variance=tuple(float(vals[i]) for i in order),
        total_variance=float(vals.sum()),
    )


def pca_transform(
    emb: DataFrame,
    model: PCAModel,
    *,
    vec_col: str = "embedding",
    out_col: str = "scores",
) -> DataFrame:
    """Project to ``(..., out_col array<double>)`` — k dot products
    against plan-time literal component vectors; the mean shift folds
    into a precomputed scalar offset per component (``(x - m)·w =
    x·w - m·w``), so the row work is k literal-array dots, JVM-side."""
    cols = []
    for comp in model.components:
        offset = float(np.dot(np.array(model.mean), np.array(comp)))
        cols.append(
            dot(F.col(vec_col), F.array(*[F.lit(float(c)) for c in comp]))
            - F.lit(offset)
        )
    return emb.withColumn(out_col, F.array(*cols))

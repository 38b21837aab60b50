"""Driver-side KMeans for bounded training samples.

Both IVF ANN (similarity.ivf_topk) and semantic dedup
(semantic.cluster_embeddings) train centroids on a bounded,
hash-filter-sampled subset of the corpus (<= tens of thousands of rows —
the standard FAISS-IVF / SemDeDup recipe; reference
deduplication/semantic/kmeans.py trains cuML KMeans the same way, bounded
by fit_data_fraction). At that size a distributed Lloyd's iteration is
pure task-scheduling overhead (~4s per fit on local[32] for a 2k-row
sample), so the fit runs in numpy on the driver: k-means++ init + Lloyd's
via matmul, deterministic in (data, k, seed). Assignment of the full
corpus stays distributed (Arrow pandas UDF with the centroid matrix in
the closure).

For very large k the O(sample * k * dim) driver fit stops being cheap —
callers fall back to pyspark.ml's distributed KMeans above
``NUMPY_KMEANS_MAX_K``.
"""

from __future__ import annotations

import numpy as np

NUMPY_KMEANS_MAX_K = 4096


def kmeans_fit(
    X: np.ndarray,
    k: int,
    seed: int = 42,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> np.ndarray:
    """Lloyd's KMeans with k-means++ init. Returns (k, dim) centroids.

    Deterministic; empty clusters are reseeded to the point farthest from
    its assigned centroid. ``k`` is clamped to ``len(X)``.
    """
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    if n == 0:
        raise ValueError("kmeans_fit: empty training sample")
    k = min(k, n)
    rs = np.random.RandomState(seed)
    xsq = np.einsum("ij,ij->i", X, X)

    # k-means++ init
    cent = np.empty((k, X.shape[1]), dtype=np.float64)
    cent[0] = X[rs.randint(n)]
    d2 = np.maximum(xsq - 2.0 * (X @ cent[0]) + cent[0] @ cent[0], 0.0)
    for i in range(1, k):
        total = d2.sum()
        if total <= 0.0:
            cent[i] = X[rs.randint(n)]
        else:
            cent[i] = X[rs.choice(n, p=d2 / total)]
        di = np.maximum(xsq - 2.0 * (X @ cent[i]) + cent[i] @ cent[i], 0.0)
        d2 = np.minimum(d2, di)

    prev_inertia = np.inf
    for _ in range(max_iter):
        # assign: argmin ||x-c||^2 = argmin (|c|^2 - 2 x.c)
        csq = np.einsum("ij,ij->i", cent, cent)
        scores = X @ cent.T - 0.5 * csq[None, :]
        labels = np.argmax(scores, axis=1)
        dmin = np.maximum(xsq - 2.0 * np.max(scores, axis=1), 0.0)
        inertia = dmin.sum()
        # update
        new_cent = np.zeros_like(cent)
        counts = np.bincount(labels, minlength=k).astype(np.float64)
        np.add.at(new_cent, labels, X)
        empty = counts == 0
        if empty.any():
            # reseed empties to the currently worst-fit points
            far = np.argsort(-dmin)[: int(empty.sum())]
            new_cent[empty] = X[far]
            counts[empty] = 1.0
        cent = new_cent / counts[:, None]
        if abs(prev_inertia - inertia) <= tol * max(abs(prev_inertia), 1.0):
            break
        prev_inertia = inertia
    return cent


def sample_training_rows(df, id_col, cols, cap):
    """Bounded deterministic sample for centroid training: hash-filter
    (pmod of xxhash64 on the id — NO sort, no full-table window; see
    CLAUDE.md performance notes) then collect. Returns (n_rows, list of
    Row). The collect is bounded by ~cap regardless of corpus size."""
    from pyspark.sql import functions as F

    n_rows = df.count()
    sel = df.select(*cols)
    if n_rows > cap:
        modulus = -(-n_rows // cap)  # ceil
        sel = sel.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(modulus)) == 0)
    return n_rows, sel.collect()

"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force top-k neighbors, pure built-ins:
  the dot product is ``aggregate(zip_with(a, b, *), sum)`` JVM-side; ranking
  is a window. O(n²) — the correctness baseline and the small-side path.
* :func:`ann_topk_hyperplane` — the scale path: random-hyperplane LSH
  bucketing (sign bits of h seeded projections) so candidate pairs are
  generated per bucket instead of via a cross join; exact cosine re-rank
  within candidates. Recall grows with ``num_tables``; each table is one
  shuffle on its bucket key.
* :func:`embedding_near_duplicates` — near-dup pairs above a cosine
  threshold (semantic-dedup building block, reference
  deduplication/semantic/pairwise.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def _pair_cosine_udf():
    """Arrow-batched cosine over candidate PAIRS (qvec, nvec): one numpy
    einsum per batch instead of the interpreted HOF aggregate per element.
    Used by the ANN paths only — :func:`cosine_topk` keeps the HOF form
    because its sequential summation is bit-identical to DuckDB's
    list_dot_product, which the exact-KNN value-hash gate relies on."""

    @F.pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack([np.asarray(x, dtype=np.float64) for x in a])
        B = np.stack([np.asarray(x, dtype=np.float64) for x in b])
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        den[den == 0.0] = np.nan
        return pd.Series(num / den)

    return _udf


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every row (or for ``queries``).

    Output: (query_id, neighbor_id, cosine, rank). Ties break on
    neighbor_id ascending for determinism.
    """
    base = df.select(F.col(id_col).alias("nid"), _as_double(vec_col).alias("nvec"))
    q = (queries or df).select(
        F.col(id_col).alias("qid"), _as_double(vec_col).alias("qvec")
    )
    joined = q.crossJoin(base).where(F.col("qid") != F.col("nid"))
    scored = joined.select(
        "qid",
        "nid",
        cosine(F.col("qvec"), F.col("nvec")).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
            "rank",
        )
    )


def _hyperplane_udf(dim: int, n_planes: int, seed: int):
    rs = np.random.RandomState(seed)
    planes = rs.normal(size=(n_planes, dim)).astype(np.float64)

    @F.pandas_udf(T.LongType())
    def _udf(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64)
            bits = (planes @ x) > 0
            key = 0
            for i, b in enumerate(bits):
                if b:
                    key |= 1 << i
            out.append(key)
        return pd.Series(out, dtype="int64")

    return _udf


def ann_topk_hyperplane(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Approximate top-k: union of per-table bucket candidates, exact
    cosine re-rank. Buckets shuffle on (table, key) — no cross join.

    ``max_bucket_size`` caps the per-table self-join: a hot bucket (many
    near-identical embeddings, or too few planes for the corpus) would go
    quadratic; rows in oversized buckets are skipped *in that table* and
    rely on the other ``num_tables-1`` independent hashings for recall —
    the standard multi-probe LSH degradation, never a k² blowup."""
    dim = len(df.select(vec_col).limit(1).collect()[0][0])
    base = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("vec"))

    cands = None
    for t in range(num_tables):
        udf = _hyperplane_udf(dim, n_planes, seed + t)
        keyed = base.withColumn("key", udf(F.col("vec"))).withColumn(
            "_bn", F.count("*").over(Window.partitionBy("key"))
        ).where(F.col("_bn") <= max_bucket_size).drop("_bn")
        pairs = (
            keyed.alias("x")
            .join(
                keyed.alias("y"),
                (F.col("x.key") == F.col("y.key"))
                & (F.col("x.id") != F.col("y.id")),
            )
            .select(
                F.col("x.id").alias("qid"),
                F.col("y.id").alias("nid"),
                F.col("x.vec").alias("qvec"),
                F.col("y.vec").alias("nvec"),
            )
        )
        cands = pairs if cands is None else cands.unionByName(pairs)

    scored = (
        cands.dropDuplicates(["qid", "nid"])
        .select("qid", "nid", _pair_cosine_udf()(F.col("qvec"), F.col("nvec")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
            "rank",
        )
    )


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: KMeans-partition the corpus into ``n_lists`` inverted
    lists; each query scans only its ``n_probe`` nearest centroids' lists
    (exact cosine re-rank within). The classic FAISS-IVF shape expressed
    relationally: centroids from a bounded driver-side fit
    (functions/kmeans_np.py), assignment and probe selection as a
    single Arrow projection against the closure-shipped centroid matrix,
    candidate generation via an equi-join on list id — no corpus x corpus
    cross join, no per-row window."""
    from nemo_curator_spark.functions.kmeans_np import (
        kmeans_fit,
        sample_training_rows,
    )

    base = df.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("vec")
    )
    # centroids train on a bounded deterministic sample (the standard IVF
    # recipe — FAISS trains on ~max(10k, 50*n_lists) vectors); full-corpus
    # KMeans would make training the bottleneck at scale while the
    # centroids barely change. Hash-filter sample (no sort), numpy Lloyd's
    # on the driver (a distributed fit on <=10k rows is pure task
    # overhead); assignment of the full corpus stays distributed.
    train_cap = max(10_000, 50 * n_lists)
    _, rows = sample_training_rows(base, "id", ["vec"], train_cap)
    X = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in rows])
    cmat = kmeans_fit(X, n_lists, seed=seed, max_iter=10)
    csq = np.einsum("ij,ij->i", cmat, cmat)

    @F.pandas_udf(T.IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        return pd.Series(
            np.argmax(V @ cmat.T - 0.5 * csq[None, :], axis=1).astype(np.int32)
        )

    assigned = base.withColumn("list_id", _assign(F.col("vec")))

    # Probe selection: the centroid table is tiny and already known on the
    # driver, so each row's n_probe nearest lists are computed in ONE
    # narrow projection — an Arrow-batched matmul against the centroid
    # matrix shipped in the UDF closure. (The previous shape —
    # crossJoin(broadcast(centroids)) then row_number over partitionBy(id)
    # — multiplied the corpus by n_lists and shuffled that blowup through
    # a window just to pick per-row top-n_probe.)
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0.0] = 1.0

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _probe_lists(vecs: pd.Series) -> pd.Series:
        v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        vn = np.linalg.norm(v, axis=1)
        vn[vn == 0.0] = 1.0
        sims = (v @ cmat.T) / (vn[:, None] * cnorm[None, :])
        # desc cosine, ties on list id ascending (matches the window the
        # crossJoin form used: orderBy(desc(csim), asc(probe_list)))
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    probes = assigned.select(
        F.col("id").alias("qid"),
        F.col("vec").alias("qvec"),
        F.explode(_probe_lists(F.col("vec"))).alias("probe_list"),
    )

    cands = probes.join(
        assigned.select(
            F.col("id").alias("nid"),
            F.col("vec").alias("nvec"),
            F.col("list_id").alias("probe_list"),
        ),
        "probe_list",
    ).where(F.col("qid") != F.col("nid"))
    scored = cands.select(
        "qid", "nid", _pair_cosine_udf()(F.col("qvec"), F.col("nvec")).alias("cos")
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
            "rank",
        )
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Pairs (a < b) with cosine >= threshold, via hyperplane blocking."""
    topk = ann_topk_hyperplane(
        df, id_col, vec_col, k=50, n_planes=n_planes,
        num_tables=num_tables, seed=seed,
    )
    return (
        topk.where(
            (F.col("cosine") >= threshold)
            & (F.col("query_id") < F.col("neighbor_id"))
        )
        .select(
            F.col("query_id").alias("a"),
            F.col("neighbor_id").alias("b"),
            "cosine",
        )
    )

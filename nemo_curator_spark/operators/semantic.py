"""Semantic deduplication — the SemDeDup recipe, aligned with the
reference's semantics (deduplication/semantic/kmeans.py,
pairwise.py:37-254, ranking.py, identify_duplicates.py:100-118):

1. L2-normalize embeddings (kmeans.py:449-452 normalizes at read).
2. KMeans on the normalized vectors; every row gets its cluster plus
   ``cosine_dist_to_cent`` = 1 - cos(vec, centroid) (kmeans.py:456-473).
   Centroids train on a bounded hash-filtered sample, fit in numpy on the
   driver (functions/kmeans_np.py); full-corpus assignment is one Arrow
   projection. ``k`` defaults to scaling with corpus size — a fixed small
   k at corpus scale would make every cluster huge and the within-cluster
   pairwise stage quadratic.
3. Within each cluster, rank rows: ``which_to_keep="hard"`` sorts by
   (cosine_dist_to_cent DESC, id DESC) — keep outliers; "easy" ascending;
   "random" by a seeded hash (pairwise.py:280-304).
4. ``cosine_sim_score[i]`` = max cosine to any EARLIER-ranked row in the
   cluster, 0 for the top-ranked row (pairwise_cosine_similarity_batched,
   pairwise.py:37-72: triu + column max). ``max_id`` is the argmax row.
5. Removal ids = rows with ``cosine_sim_score >= threshold`` where
   threshold = 1 - eps (identify_duplicates.py:100-105 reads with a
   ``cosine_sim_score >= 1 - eps`` filter).

The quadratic stage is bounded per cluster, not per corpus; clusters
bigger than ``max_cluster_size`` only compare against their first
``max_cluster_size`` ranked rows (the reference requires each cluster to
fit in GPU memory and tells users to raise n_clusters — same pressure,
graceful degradation here instead of an OOM).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from nemo_curator_spark.functions.kmeans_np import (
    NUMPY_KMEANS_MAX_K,
    kmeans_fit,
    sample_training_rows,
)


def _auto_k(n_rows: int) -> int:
    """Scale cluster count with corpus size: average cluster ~2000 rows
    keeps the within-cluster quadratic stage bounded (reference
    workflow.py warns when n_clusters is small for the corpus)."""
    return int(min(max(16, -(-n_rows // 2000)), 100_000))


def _assign_udf(cmat: np.ndarray):
    """One Arrow pass: normalize the vector, assign the nearest centroid
    (L2 on normalized vectors, exactly what KMeans-on-normalized does),
    and compute cosine_dist_to_cent against the re-normalized centroid
    (reference kmeans.py:462-473)."""
    cmat = np.asarray(cmat, dtype=np.float64)
    csq = np.einsum("ij,ij->i", cmat, cmat)
    cn = np.linalg.norm(cmat, axis=1)
    cn[cn == 0.0] = 1.0
    cnorm = cmat / cn[:, None]

    schema = T.StructType(
        [
            T.StructField("nvec", T.ArrayType(T.DoubleType())),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("cosine_dist_to_cent", T.DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def _udf(vecs: pd.Series) -> pd.DataFrame:
        V = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        vn = np.linalg.norm(V, axis=1)
        vn[vn == 0.0] = 1.0
        Vn = V / vn[:, None]
        # argmin ||v - c||^2 = argmax (v.c - |c|^2/2)
        labels = np.argmax(Vn @ cmat.T - 0.5 * csq[None, :], axis=1)
        cos_dist = 1.0 - np.einsum("ij,ij->i", Vn, cnorm[labels])
        return pd.DataFrame(
            {
                "nvec": list(Vn),
                "cluster": labels.astype(np.int32),
                "cosine_dist_to_cent": cos_dist,
            }
        )

    return _udf


def cluster_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    seed: int = 42,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """Adds ``cluster``, ``cosine_dist_to_cent`` and the L2-normalized
    vector ``nvec`` to every row. ``k=None`` scales with corpus size."""
    base = df.withColumn("_vec", F.col(vec_col).cast("array<double>"))
    n_rows = base.count()
    if k is None:
        k = _auto_k(n_rows)
    k = max(1, min(k, n_rows))

    if k <= NUMPY_KMEANS_MAX_K:
        train_cap = max(10_000, 50 * k)
        _, rows = sample_training_rows(base, id_col, ["_vec"], train_cap)
        X = np.stack([np.asarray(r["_vec"], dtype=np.float64) for r in rows])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        cmat = kmeans_fit(
            X / norms[:, None], k, seed=seed, max_iter=max_iter, tol=tol
        )
    else:
        # very large k: the driver fit is no longer cheap — distributed
        # Lloyd's via pyspark.ml on the (still bounded) sample
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train_cap = max(10_000, 50 * k)

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def _l2n(vecs: pd.Series) -> pd.Series:
            V = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
            n = np.linalg.norm(V, axis=1)
            n[n == 0.0] = 1.0
            return pd.Series(list(V / n[:, None]))

        feat = base.withColumn("_features", array_to_vector(_l2n(F.col("_vec"))))
        modulus = max(1, -(-n_rows // train_cap))
        train = feat.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(modulus)) == 0
        )
        model = KMeans(
            k=k, seed=seed, maxIter=max_iter, tol=tol,
            featuresCol="_features", predictionCol="cluster",
        ).fit(train)
        cmat = np.asarray(model.clusterCenters(), dtype=np.float64)

    assigned = base.withColumn("_a", _assign_udf(cmat)(F.col("_vec")))
    return (
        assigned.withColumn("nvec", F.col("_a.nvec"))
        .withColumn("cluster", F.col("_a.cluster"))
        .withColumn("cosine_dist_to_cent", F.col("_a.cosine_dist_to_cent"))
        .drop("_a", "_vec")
    )


def _pair_dot_udf():
    @F.pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        # b is NULL on left-join misses (top-ranked rows with no earlier
        # row) — when() doesn't stop Spark evaluating the UDF for them
        out = np.full(len(a), np.nan)
        mask = np.array([x is not None and y is not None for x, y in zip(a, b)])
        if mask.any():
            A = np.stack([np.asarray(x, dtype=np.float64) for x in a[mask]])
            B = np.stack([np.asarray(x, dtype=np.float64) for x in b[mask]])
            out[mask] = np.einsum("ij,ij->i", A, B)
        return pd.Series(out)

    return _udf


class RankingStrategy:
    """Reference semantic/ranking.py:21-100, exact contract: rank
    cluster members by caller-named metadata columns (priority order,
    per-column ascending flags) or by a seeded shuffle. The Spark form
    translates to the within-cluster window ORDER (id ascending as the
    deterministic tie-break; the reference's per-cluster frames inherit
    input order there, which a distributed sort cannot)."""

    def __init__(
        self,
        metadata_cols: list[str],
        ascending: list[bool] | bool = True,
        strategy: str = "sort",
        random_seed: int = 42,
    ):
        self.metadata_cols = metadata_cols
        self.strategy = strategy
        self.random_seed = random_seed
        if isinstance(ascending, bool):
            self.ascending = [ascending] * len(metadata_cols)
        else:
            if len(ascending) != len(metadata_cols):
                msg = (
                    f"Length of ascending ({len(ascending)}) must match "
                    f"metadata_cols ({len(metadata_cols)})"
                )
                raise ValueError(msg)
            self.ascending = ascending

    @classmethod
    def metadata_based(
        cls,
        metadata_cols: list[str],
        ascending: list[bool] | bool = True,
        random_seed: int = 42,
    ) -> "RankingStrategy":
        return cls(
            metadata_cols=metadata_cols,
            ascending=ascending,
            strategy="sort",
            random_seed=random_seed,
        )

    @classmethod
    def random(cls, random_seed: int = 42) -> "RankingStrategy":
        return cls(
            metadata_cols=[], strategy="random", random_seed=random_seed
        )

    def order_columns(self, available: list[str], id_col: str = "id"):
        """Window order translation; validates column presence with the
        reference's message (ranking.py:45-49)."""
        if self.strategy == "random":
            return [
                F.asc(F.xxhash64(F.col(id_col), F.lit(self.random_seed))),
                F.asc(id_col),
            ]
        if self.strategy == "sort":
            missing_cols = [
                c for c in self.metadata_cols if c not in available
            ]
            if missing_cols:
                msg = (
                    f"Required columns {missing_cols} not found in "
                    f"cluster data. Available columns: {list(available)}"
                )
                raise ValueError(msg)
            return [
                F.asc(c) if asc else F.desc(c)
                for c, asc in zip(self.metadata_cols, self.ascending)
            ] + [F.asc(id_col)]
        msg = (
            f"Invalid strategy: {self.strategy}. Supported: 'sort', "
            "'random'"
        )
        raise ValueError(msg)


def semantic_scores(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    seed: int = 42,
    which_to_keep: str = "hard",
    max_cluster_size: int = 5000,
    ranking_strategy: "RankingStrategy | None" = None,
    kmeans_max_iter: int = 20,
    kmeans_tol: float = 1e-6,
) -> DataFrame:
    """Per-row (id, max_id, cosine_sim_score) — the reference pairwise
    stage's output table (pairwise.py:218-228): the max cosine similarity
    of each row to any earlier-ranked row in its cluster.
    ``ranking_strategy`` overrides the ``which_to_keep`` presets with a
    metadata-column ranking (reference ranking.py)."""
    if which_to_keep not in {"hard", "easy", "random"}:
        raise ValueError(f"which_to_keep must be hard/easy/random, got {which_to_keep!r}")
    keep_cols = [] if ranking_strategy is None else [
        c
        for c in (df.columns if ranking_strategy.strategy == "sort" else [])
        if c in ranking_strategy.metadata_cols
        and c not in {id_col, "nvec", "cluster", "cosine_dist_to_cent"}
    ]
    clustered = cluster_embeddings(
        df, id_col, vec_col, k, seed, max_iter=kmeans_max_iter, tol=kmeans_tol
    ).select(
        F.col(id_col).alias("id"),
        "nvec",
        "cluster",
        "cosine_dist_to_cent",
        *keep_cols,
    )
    if ranking_strategy is not None:
        order = ranking_strategy.order_columns(
            ["cosine_dist_to_cent", *keep_cols, "id"], id_col="id"
        )
    elif which_to_keep == "hard":
        order = [F.desc("cosine_dist_to_cent"), F.desc("id")]
    elif which_to_keep == "easy":
        order = [F.asc("cosine_dist_to_cent"), F.asc("id")]
    else:  # random: seeded hash order (reference uses a seeded shuffle)
        order = [F.asc(F.xxhash64(F.col("id"), F.lit(seed))), F.asc("id")]
    w = Window.partitionBy("cluster").orderBy(*order)
    ranked = clustered.withColumn("rnk", F.row_number().over(w))

    earlier = ranked.select(
        F.col("cluster").alias("e_cluster"),
        F.col("id").alias("e_id"),
        F.col("nvec").alias("e_nvec"),
        F.col("rnk").alias("e_rnk"),
    ).where(F.col("e_rnk") <= max_cluster_size)

    dot = _pair_dot_udf()
    pairs = ranked.join(
        earlier,
        (F.col("cluster") == F.col("e_cluster")) & (F.col("e_rnk") < F.col("rnk")),
        "left",
    ).select(
        "id",
        "e_id",
        "e_rnk",
        F.when(
            F.col("e_id").isNotNull(), dot(F.col("nvec"), F.col("e_nvec"))
        ).alias("sim"),
    )
    # torch.max picks the FIRST maximal index -> lowest earlier rank, so
    # tie-break on -e_rnk; max_id is informational in the reference output
    # greatest(..., 0): the reference's triu mask leaves zeros in the
    # matrix, so its column max never goes below 0 even when every earlier
    # cosine is negative
    return pairs.groupBy("id").agg(
        F.greatest(F.coalesce(F.max("sim"), F.lit(0.0)), F.lit(0.0)).alias(
            "cosine_sim_score"
        ),
        F.coalesce(
            F.max_by("e_id", F.struct(F.col("sim"), -F.col("e_rnk"))),
            F.first("id"),
        ).alias("max_id"),
    ).select("id", "max_id", "cosine_sim_score")


def semantic_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    threshold: float = 0.95,
    seed: int = 42,
    max_cluster_size: int = 5000,
    which_to_keep: str = "hard",
) -> DataFrame:
    """Rows whose max-to-earlier cosine crosses the threshold, with the
    matched row: (a=max_id, b=id, cosine). One row per removed doc — the
    reference never materializes the all-pairs list either."""
    scores = semantic_scores(
        df, id_col, vec_col, k, seed, which_to_keep, max_cluster_size
    )
    return scores.where(F.col("cosine_sim_score") >= threshold).select(
        F.col("max_id").alias("a"),
        F.col("id").alias("b"),
        F.col("cosine_sim_score").alias("cosine"),
    )


def semantic_duplicate_ids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    threshold: float = 0.99,
    seed: int = 42,
    which_to_keep: str = "hard",
    max_cluster_size: int = 5000,
) -> DataFrame:
    """Removal ids: rows with cosine_sim_score >= threshold (= 1 - eps,
    identify_duplicates.py:100-105). The reference's survivor rule falls
    out of the ranking: the top-ranked row of every dup group scores
    against nothing earlier and survives."""
    scores = semantic_scores(
        df, id_col, vec_col, k, seed, which_to_keep, max_cluster_size
    )
    return scores.where(F.col("cosine_sim_score") >= threshold).select(
        F.col("id").alias(id_col)
    )

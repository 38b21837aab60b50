"""Semantic deduplication: KMeans clustering + within-cluster pairwise
cosine (reference deduplication/semantic/*: kmeans.py:48,483,
pairwise.py:74,254 — GPU cuML there; pyspark.ml here).

Shape: embed column → KMeans (pyspark.ml, Spark-native distributed Lloyd's)
→ per-cluster pairwise cosine ONLY within clusters (the quadratic work is
bounded by cluster size, not corpus size) → near-dup pairs above a cosine
threshold → removal ids via keep-min-per-component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nemo_curator_spark.operators import dedup as dedup_mod
from nemo_curator_spark.operators.similarity import cosine


def cluster_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Assign a KMeans cluster id to every row (adds ``cluster``)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    # centroids train on a bounded deterministic sample (same recipe as
    # similarity.ivf_topk): at corpus scale full-data Lloyd's makes
    # training the bottleneck while the centroids barely move. Hash-filter
    # instead of orderBy+limit — no full-table sort for a sample.
    train_cap = max(10_000, 50 * k)
    n_rows = feat.count()
    if n_rows > train_cap:
        modulus = -(-n_rows // train_cap)  # ceil
        train = feat.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(modulus)) == 0
        )
    else:
        train = feat
    # the sample is bounded (~train_cap rows) regardless of corpus size;
    # a handful of partitions beats per-iteration task overhead in
    # distributed Lloyd's on tiny data
    train = train.coalesce(4)
    model = KMeans(
        k=k, seed=seed, maxIter=max_iter, featuresCol="_features",
        predictionCol="cluster",
    ).fit(train)
    return model.transform(feat).drop("_features")


def semantic_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    max_cluster_size: int = 5000,
) -> DataFrame:
    """Near-dup pairs (a < b, cosine >= threshold), pairwise within KMeans
    clusters only.

    Skew guard: clusters larger than ``max_cluster_size`` switch from
    all-pairs to star edges (min-id vs members) — a hot cluster would go
    quadratic; downstream connected-components recovers the same dedup
    groups from the star, only the explicit pair list is thinned."""
    from pyspark.sql.window import Window

    clustered = cluster_embeddings(df, id_col, vec_col, k, seed)
    w = Window.partitionBy("cluster")
    side = clustered.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        "cluster",
    ).withColumn("_n", F.count("*").over(w)).withColumn(
        "_min", F.min(F.struct("id", "vec")).over(w)
    )
    small = side.where(F.col("_n") <= max_cluster_size)
    all_pairs = (
        small.alias("x")
        .join(
            small.alias("y"),
            (F.col("x.cluster") == F.col("y.cluster"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            cosine(F.col("x.vec"), F.col("y.vec")).alias("cosine"),
        )
    )
    star_pairs = (
        side.where(
            (F.col("_n") > max_cluster_size) & (F.col("id") != F.col("_min.id"))
        )
        .select(
            F.col("_min.id").alias("a"),
            F.col("id").alias("b"),
            cosine(F.col("_min.vec"), F.col("vec")).alias("cosine"),
        )
    )
    return all_pairs.unionByName(star_pairs).where(
        F.col("cosine") >= threshold
    )


def semantic_duplicate_ids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
) -> DataFrame:
    """Removal ids: connected components over near-dup pairs, keep min id
    per component (reference IdentifyDuplicatesStage shape)."""
    pairs = semantic_near_duplicates(df, id_col, vec_col, k, threshold, seed)
    comps = dedup_mod.connected_components(pairs.select("a", "b"))
    return comps.where(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )

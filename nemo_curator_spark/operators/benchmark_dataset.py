"""Benchmark dataset builder: diverse-clip selection for caption eval
(reference ``eval/video/build_benchmark_dataset.py``), Spark-first.

The reference builds a caption-eval benchmark by (1) sampling a pool of
source videos (:67-77), (2) running the split/filter/embed pipeline
(:80-113 — composed here from the repo's own fixed_stride_clips /
aesthetic filter / embedding stages), (3) K-means clustering the clip
embeddings (K=200, :115-143) and (4) selecting ONE representative clip
per cluster — scanning each cluster's members in ascending L2 distance
to the centroid and picking the first whose source video was not
already used by an earlier cluster, falling back to the overall
closest member when every candidate's source is taken or unknown
(:146-166) — then writing ``selected_uids.txt`` rows
``uid\\tsrc\\tstart\\tend`` sorted by uid (:219-225).

Spark shape / 100 TB story: the K-means fit is the repo's bounded
driver fit (functions/kmeans_np.py — hash-filtered sample, numpy
Lloyd's; distributed pyspark.ml above NUMPY_KMEANS_MAX_K) and
assignment is one Arrow pandas UDF pass. The greedy unique-source walk
is SEQUENTIAL across clusters (``used_sources`` accumulates in cluster
order), so it cannot be a window function — but it only ever needs a
BOUNDED candidate table: scanning in distance order, the first
eligible pick of the walk is always the best-distance member of SOME
source, so reducing each cluster to its best member per source is
exact; and with at most K-1 sources used before any cluster, the top
K+1 distinct-source candidates per cluster always contain the walk's
pick (plus the rank-1 row, which is the fallback). That caps the
driver-side walk at K*(K+1) rows — independent of corpus size — while
everything row-scale stays distributed.

Deviations from the reference, documented: (a) numpy argsort ties on
equal distances are broken here by uid ascending (the reference's file
order IS uid order — sorted glob — so this only pins the
float-tie case its unstable quicksort leaves unspecified); (b) a
cluster that ends up with no assigned members is skipped (the
reference would raise IndexError at :165 — ``sorted_idx[0]`` on an
empty cluster).
"""

from __future__ import annotations

import os
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from nemo_curator_spark.functions.kmeans_np import (
    kmeans_fit,
    sample_training_rows,
)


def sample_videos(names: list[str], sample_size: int, seed: int = 42) -> list[str]:
    """Exact port of ``_sample_videos`` (:67-77) minus the listdir:
    stdlib ``random.sample`` after ``random.seed(seed)`` — deterministic
    in (names, sample_size, seed); all names returned when the pool is
    already small enough."""
    mp4s = [f for f in names if f.endswith(".mp4")]
    if len(mp4s) <= sample_size:
        return mp4s
    random.seed(seed)
    return random.sample(mp4s, sample_size)


def cluster_candidates(
    df: DataFrame,
    uid_col: str = "uid",
    vec_col: str = "embedding",
    src_col: str = "source_video",
    num_clusters: int = 200,
    seed: int = 42,
    max_iter: int = 20,
    train_cap: int | None = None,
) -> DataFrame:
    """(uid, embedding, source_video) -> the bounded per-cluster
    candidate table (cluster, rnk, uid, src, dist): raw-vector L2
    K-means (the reference uses sklearn on the raw matrix — NOT the
    SemDeDup normalized variant), best member per source, ranked by
    (dist, uid) within the cluster, top ``num_clusters + 1`` kept (the
    exactness argument in the module docstring)."""
    base = df.select(
        F.col(uid_col).cast("long").alias("uid"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
        F.coalesce(F.col(src_col), F.lit("")).alias("src"),
    )
    cap = train_cap or max(10_000, 50 * num_clusters)
    n_rows, rows = sample_training_rows(base, "uid", ["_vec"], cap)
    k = max(1, min(num_clusters, n_rows))
    X = np.stack([np.asarray(r["_vec"], dtype=np.float64) for r in rows])
    cmat = kmeans_fit(X, k, seed=seed, max_iter=max_iter)
    csq = np.einsum("ij,ij->i", cmat, cmat)

    schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("dist", T.DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        V = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        scores = V @ cmat.T - 0.5 * csq[None, :]
        labels = np.argmax(scores, axis=1)
        vsq = np.einsum("ij,ij->i", V, V)
        d2 = np.maximum(vsq - 2.0 * np.max(scores, axis=1), 0.0)
        return pd.DataFrame(
            {"cluster": labels.astype(np.int32), "dist": np.sqrt(d2)}
        )

    assigned = base.withColumn("_a", _assign(F.col("_vec"))).select(
        "uid", "src", F.col("_a.cluster").alias("cluster"),
        F.col("_a.dist").alias("dist"),
    )
    # best member per (cluster, source); rows with unknown source ('')
    # stay individual rows — never eligible for the unique-source scan,
    # only reachable through the rank-1 fallback
    w_src = Window.partitionBy("cluster", "src").orderBy("dist", "uid")
    best_per_src = assigned.withColumn(
        "_rs", F.row_number().over(w_src)
    ).where((F.col("_rs") == 1) | (F.col("src") == ""))
    # two ranks: rnk over the reduced set (rnk=1 is the overall-closest
    # member — the fallback row), and erank over the ELIGIBLE
    # (known-source) rows only, so ''-source rows cannot crowd the
    # bounded keep-window and push the walk's true pick out of it
    w_cl = Window.partitionBy("cluster").orderBy("dist", "uid")
    w_el = Window.partitionBy(
        "cluster", F.col("src") == ""
    ).orderBy("dist", "uid")
    return (
        best_per_src.withColumn("rnk", F.row_number().over(w_cl))
        .withColumn("erank", F.row_number().over(w_el))
        .where(
            (F.col("rnk") == 1)
            | ((F.col("src") != "") & (F.col("erank") <= num_clusters + 1))
        )
        .select("cluster", "rnk", "uid", "src", "dist")
    )


def select_representatives(
    cand_rows: list, num_clusters: int | None = None
) -> list[tuple[int, int, str, float]]:
    """The greedy unique-source walk (:146-166) over the bounded
    candidate rows — clusters ascending, candidates by rank; first
    known-and-unused source wins, else the rank-1 fallback. Returns
    [(cluster, uid, src, dist)]. Driver-side by design: input is
    <= K*(K+1) rows."""
    by_cluster: dict[int, list] = {}
    for r in cand_rows:
        by_cluster.setdefault(int(r["cluster"]), []).append(r)
    used: set[str] = set()
    out = []
    for k in sorted(by_cluster):
        cands = sorted(by_cluster[k], key=lambda r: int(r["rnk"]))
        pick = None
        for c in cands:
            src = c["src"]
            if src and src not in used:
                pick = c
                used.add(src)
                break
        if pick is None:
            pick = cands[0]  # fallback: overall closest (:164-166)
        out.append(
            (int(pick["cluster"]), int(pick["uid"]), pick["src"],
             float(pick["dist"]))
        )
    return out


def benchmark_select(
    df: DataFrame,
    uid_col: str = "uid",
    vec_col: str = "embedding",
    src_col: str = "source_video",
    num_clusters: int = 200,
    seed: int = 42,
    max_iter: int = 20,
    train_cap: int | None = None,
) -> DataFrame:
    """Composite: cluster -> bounded candidates -> greedy walk ->
    one representative row per (non-empty) cluster."""
    cand = cluster_candidates(
        df, uid_col, vec_col, src_col, num_clusters, seed, max_iter,
        train_cap,
    )
    picked = select_representatives(cand.collect(), num_clusters)
    spark = df.sparkSession
    return spark.createDataFrame(
        picked, "cluster int, uid long, src string, dist double"
    )


def selected_uids_lines(selected: list[tuple]) -> list[str]:
    """``selected_uids.txt`` rows (:219-225): ``uid\\tsrc\\tstart\\tend``
    sorted by uid, src reduced to its basename; spans format with
    python's default float repr exactly like the reference f-string.
    ``selected`` rows are (uid, source_video, span_start, span_end)."""
    lines = []
    for uid, src, start, end in sorted(selected, key=lambda x: str(x[0])):
        lines.append(f"{uid}\t{os.path.basename(str(src))}\t{start}\t{end}")
    return lines

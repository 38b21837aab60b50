"""Image dedup workflow (operators/image_dedup.py): embed via the real
codec path -> semantic dedup -> removal anti-join (reference
stages/image/deduplication/removal.py + embedders/* shape)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nemo_curator_spark.operators import image_dedup as imgd
from nemo_curator_spark.operators import multimodal


def _corpus(spark, n=40, dup_every=4):
    # ids 0..n-1 plus a byte-identical copy of every dup_every-th image
    # under id+1000
    rows = [(i, i) for i in range(n)] + [
        (i + 1000, i) for i in range(0, n, dup_every)
    ]
    df = spark.createDataFrame(rows, "image_id long, key long")
    return imgd.with_synth_images(df, id_col="image_id", content_key_col="key")


def test_feature_vectors_are_exact_pixels(spark):
    df = _corpus(spark, n=6, dup_every=100)
    feats = imgd.image_feature_vectors(df, "image", "image_id").collect()
    keys = {r["image_id"]: r["key"] for r in df.select("image_id", "key").collect()}
    for r in feats:
        raw = imgd.synth_gradient_image(keys[r["image_id"]])
        resized = multimodal.resize_nearest(raw, 8, 8)
        _, _, _, px = multimodal.decode_ppm(resized)
        assert np.array_equal(
            np.asarray(r["embedding"]), px.astype(np.float64).ravel()
        )


def test_pipeline_removes_exactly_one_of_each_planted_pair(spark):
    df = _corpus(spark, n=40, dup_every=4)
    n_total = df.count()
    n_planted = 10

    removal = imgd.image_duplicate_ids(df, "image", "image_id", k=4)
    removed = {r["image_id"] for r in removal.collect()}
    # one of each planted byte-identical pair, nothing else (seeded-random
    # images across distinct keys sit far below the 0.99 threshold)
    assert len(removed) == n_planted
    for i in range(0, 40, 4):
        assert (i in removed) != (i + 1000 in removed)  # exactly one half

    kept = imgd.image_dedup_pipeline(df, "image", "image_id", k=4)
    assert kept.count() == n_total - n_planted
    # every surviving image content is unique
    fps = (
        kept.select(F.md5(F.col("image")).alias("fp"))
        .groupBy("fp")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert fps == 0


def test_removal_stage_is_pure_antijoin(spark):
    df = _corpus(spark, n=8, dup_every=100)
    removal = spark.createDataFrame([(2,), (5,), (999,)], "image_id long")
    kept = imgd.remove_duplicate_images(df, removal, "image_id")
    # ids 0..7 plus the planted copy of id 0 under 1000; 2/5 removed,
    # 999 is absent from the corpus (anti-join ignores unknown ids)
    assert sorted(r["image_id"] for r in kept.collect()) == [
        0, 1, 3, 4, 6, 7, 1000,
    ]

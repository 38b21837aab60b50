"""Structured-Streaming curation (memory sink, availableNow trigger) and
multimodal binary-column plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nemo_curator_spark import synth
from nemo_curator_spark.operators import multimodal
from nemo_curator_spark.streaming import stream as streaming


def test_stream_curate_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    synth.generate_web_pages(150, seed=31)
    import pyarrow  # noqa: F401

    # write as a parquet "stream source" directory
    pdf = synth.generate_web_pages(150, seed=31)
    sdf = spark.createDataFrame(pdf, schema=synth.WEB_PAGES_SCHEMA)
    sdf.coalesce(3).write.parquet(src)

    st = streaming.read_web_pages_stream(spark, src, max_files_per_trigger=1)
    labeled = streaming.curate_stream(st)
    q = (
        labeled.writeStream.outputMode("append")
        .format("memory")
        .queryName("curated_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT url, keep, drop_reason FROM curated_stream"
    ).toPandas()
    assert len(got) == 150

    # batch path over the same rows must agree on keep/drop
    batch = streaming.curate_stream.__wrapped__ if False else None
    from nemo_curator_spark.pipeline import webpages

    cfg = webpages.CurationConfig(salt_partitions=4)
    blabeled = webpages.curate(spark.read.parquet(src), None, cfg)
    want = blabeled.select("url", "keep", "drop_reason").toPandas()
    merged = got.merge(want, on="url", suffixes=("_s", "_b"))
    assert len(merged) == 150
    assert (merged["keep_s"] == merged["keep_b"]).all()
    assert (
        merged["drop_reason_s"].fillna("") == merged["drop_reason_b"].fillna("")
    ).all()


def test_windowed_lineage_stream(spark, tmp_path):
    src = str(tmp_path / "in2")
    pdf = synth.generate_web_pages(120, seed=33)
    spark.createDataFrame(pdf, schema=synth.WEB_PAGES_SCHEMA).write.parquet(src)
    st = streaming.read_web_pages_stream(spark, src)
    labeled = streaming.curate_stream(st)
    lin = streaming.windowed_lineage(labeled, window="1 minute", watermark="5 minutes")
    # complete mode emits every window regardless of watermark closure
    # (append mode would emit only after later batches advance the watermark)
    q = (
        lin.writeStream.outputMode("complete")
        .format("memory")
        .queryName("lineage_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM lineage_stream").toPandas()
    assert got["input_count"].sum() == 120
    assert (got["kept_count"] <= got["input_count"]).all()


@pytest.fixture()
def media_df(spark):
    rows = [
        (i, multimodal.encode_fake_image(16 + i, 32, 3, seed=i), "image", f"u{i}")
        for i in range(10)
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_image_meta_and_features(spark, media_df):
    out = (
        media_df.withColumn("meta", multimodal.image_meta(F.col("media")))
        .withColumn("feat", multimodal.image_features(F.col("media")))
        .select("media_id", "meta.*", "feat")
        .orderBy("media_id")
        .toPandas()
    )
    assert list(out["width"]) == [16 + i for i in range(10)]
    assert (out["height"] == 32).all()
    assert all(len(f) == 6 for f in out["feat"])
    assert all(0.0 <= v <= 1.0 for f in out["feat"] for v in f)


def test_resize_and_frame_sample(spark, media_df):
    resized = multimodal.resize_stub(media_df, target=8)
    meta = (
        resized.withColumn("meta", multimodal.image_meta(F.col("media")))
        .select("meta.width", "meta.height")
        .toPandas()
    )
    assert (meta["width"] == 8).all() and (meta["height"] == 8).all()

    frames = multimodal.frame_sample_stub(media_df, every_n=8)
    got = frames.groupBy("media_id").count().toPandas()
    assert (got["count"] == 4).all()  # height 32 // 8


def test_unknown_codec_raises(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG fake", "image", "u")], multimodal.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="no image codec|NotImplementedError"):
        df.select(multimodal.image_meta(F.col("media"))).collect()

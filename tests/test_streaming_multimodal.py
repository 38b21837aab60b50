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


# --- real codecs: PPM / BMP / WAV (round 2) ------------------------------------


def _gradient(h, w):
    import numpy as np

    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :] * (255 // max(w - 1, 1))
    img[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * (255 // max(h - 1, 1))
    img[:, :, 2] = 7
    return img


def test_ppm_roundtrip():
    import numpy as np

    from nemo_curator_spark.operators import multimodal as MM

    img = _gradient(6, 4)
    raw = MM.encode_ppm(img)
    w, h, c, px = MM.decode_ppm(raw)
    assert (w, h, c) == (4, 6, 3)
    assert np.array_equal(px.reshape(6, 4, 3), img)
    # generic dispatch + comments in header
    commented = raw[:2] + b"\n# a comment\n" + raw[3:]
    w2, h2, c2, px2 = MM._decode(commented)
    assert (w2, h2, c2) == (4, 6, 3) and np.array_equal(px2, px)


def test_bmp_decode_bottom_up():
    import struct

    import numpy as np

    from nemo_curator_spark.operators import multimodal as MM

    # hand-build a 2x2 24-bit BMP: rows bottom-up, BGR, padded to 4 bytes
    # top row = red,green ; bottom row = blue,white
    rows_topdown = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (255, 255, 255)],
    ]
    row_data = b""
    for row in reversed(rows_topdown):  # bottom-up storage
        r = b"".join(bytes([b, g, rr]) for rr, g, b in row)
        row_data += r + b"\x00" * ((4 - len(r) % 4) % 4)
    header = b"BM" + struct.pack("<IHHI", 54 + len(row_data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(row_data), 0, 0, 0, 0)
    raw = header + info + row_data
    w, h, c, px = MM.decode_bmp(raw)
    assert (w, h, c) == (2, 2, 3)
    got = px.reshape(2, 2, 3)
    assert np.array_equal(got[0, 0], [255, 0, 0])   # rgb order restored
    assert np.array_equal(got[0, 1], [0, 255, 0])
    assert np.array_equal(got[1, 0], [0, 0, 255])


def test_resize_nearest_real_pixels(spark):
    import numpy as np

    from nemo_curator_spark.operators import multimodal as MM

    img = _gradient(8, 8)
    raw = MM.encode_ppm(img)
    resized = MM.resize_nearest(raw, 4, 4)
    w, h, c, px = MM.decode_ppm(resized)
    assert (w, h, c) == (4, 4, 3)
    # nearest-neighbor: pixel (0,0) of the small image samples (0,0) of the big
    assert np.array_equal(px.reshape(4, 4, 3)[0, 0], img[0, 0])
    # through the Spark mapInPandas path
    df = spark.createDataFrame(
        [(1, raw, "image", "u")], "media_id long, media binary, media_type string, url string"
    )
    out = MM.resize_images(df, target=4).collect()
    assert MM.decode_ppm(bytes(out[0]["media"]))[:2] == (4, 4)


def test_wav_decode_and_features(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from nemo_curator_spark.operators import multimodal as MM

    t = np.arange(16000, dtype=np.float64) / 16000.0
    sine = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    raw = MM.encode_wav(sine, 16000)
    ch, rate, samples = MM.decode_wav(raw)
    assert (ch, rate, len(samples)) == (1, 16000, 16000)
    df = spark.createDataFrame(
        [(1, raw, "audio", "u")], "media_id long, media binary, media_type string, url string"
    )
    row = df.select(
        MM.audio_meta(F.col("media")).alias("m"),
        MM.audio_features(F.col("media")).alias("f"),
    ).collect()[0]
    assert row["m"]["duration_sec"] == 1.0
    rms, zcr, peak = row["f"]
    # sine at amplitude 20000/32768: rms = amp/sqrt(2), zcr = 2*f/rate
    assert abs(rms - (20000 / 32768) / 2**0.5) < 0.01
    assert abs(zcr - 880 / 16000) < 0.005
    assert 0.6 < peak <= 0.62


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: gap-closed sessions from the
    stream equal the batch window sessionization's non-final sessions."""
    import pandas as pd

    from nemo_curator_spark.streaming import stateful

    rng = np.random.RandomState(7)
    base = pd.Timestamp("2025-06-01 00:00:00")
    rows = []
    eid = 0
    for user in range(6):
        t = base + pd.Timedelta(minutes=int(rng.randint(0, 60)))
        for _ in range(rng.randint(5, 15)):
            # gaps: mostly short, some > 30 min to split sessions
            gap_min = int(rng.choice([1, 5, 10, 45, 90], p=[0.3, 0.3, 0.2, 0.1, 0.1]))
            t = t + pd.Timedelta(minutes=gap_min, seconds=int(rng.randint(60)))
            rows.append((user, t, eid, float(rng.randint(100)) / 10))
            eid += 1
    src = str(tmp_path / "events_in")
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "value"])
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)

    st = (
        spark.readStream.format("parquet")
        .schema("user_id long, ts timestamp, event_id long, value double")
        .load(src)
    )
    sessions = stateful.sessionize_stream(st, gap_minutes=30.0)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, sess_start, n_events, total_value FROM sessions_stream"
    ).toPandas()

    # batch truth: window sessionize, drop each user's LAST session (it
    # stays open in state — only gap-closed sessions are emitted by the
    # single-microbatch availableNow run)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = spark.read.parquet(src)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.expr("timestampdiff(MICROSECOND, _prev, ts)")
    sess = (
        ev.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "new",
            F.when(
                F.col("_prev").isNull() | (gap_us > 1_800_000_000), 1
            ).otherwise(0),
        )
        .withColumn("sess_no", F.sum("new").over(w))
    )
    batch = (
        sess.groupBy("user_id", "sess_no")
        .agg(
            F.min("ts").alias("sess_start"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .withColumn(
            "_last",
            F.max("sess_no").over(Window.partitionBy("user_id")),
        )
        .where(F.col("sess_no") != F.col("_last"))
        .select("user_id", "sess_start", "n_events", "total_value")
        .toPandas()
    )
    assert len(batch) > 0, "corpus must contain gap-closed sessions"
    key = ["user_id", "sess_start"]
    got_n = got.sort_values(key).reset_index(drop=True)
    batch_n = batch.sort_values(key).reset_index(drop=True)
    got_n["sess_start"] = got_n["sess_start"].astype("datetime64[us]")
    batch_n["sess_start"] = batch_n["sess_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got_n, batch_n, check_dtype=False)

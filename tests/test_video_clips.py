"""FixedStrideExtractorStage arithmetic (reference video/clipping/
clip_extraction_stages.py:437-503) as pure Spark SQL."""

from __future__ import annotations

import pytest

from nemo_curator_spark.operators import video as V


def _py_reference(num_frames, framerate, clip_len, stride, min_len):
    """Direct port of the reference loop (float accumulation)."""
    if framerate <= 0:
        return []
    duration = num_frames / framerate
    out = []
    start = 0.0
    k = 0
    while start < duration:
        end = min(start + clip_len, duration)
        if end - start >= min_len:
            out.append(
                (k, start, end, int(start * framerate), int(end * framerate))
            )
        start += stride
        k += 1
    return out


def test_fixed_stride_matches_reference_loop(spark):
    rows = [
        (1, 240, 24.0),   # 10 s
        (2, 101, 25.0),   # 4.04 s
        (3, 10, 30.0),    # 0.333 s -> single span below min length
        (4, 0, 24.0),     # zero frames -> nothing
        (5, 500, 0.0),    # bad framerate -> skipped
    ]
    df = spark.createDataFrame(rows, "video_id long, num_frames int, framerate double")
    got = (
        V.fixed_stride_clips(df, clip_len_s=4.0, clip_stride_s=2.5, min_clip_length_s=1.0)
        .toPandas()
        .sort_values(["video_id", "clip_idx"])
    )
    for vid, nf, fr in rows:
        want = _py_reference(nf, fr, 4.0, 2.5, 1.0)
        sub = got[got["video_id"] == vid]
        assert len(sub) == len(want), (vid, len(sub), want)
        for (_, r), (k, s, e, sf_, ef) in zip(sub.iterrows(), want):
            assert r["clip_idx"] == k
            assert r["start_s"] == s and r["end_s"] == e
            assert r["start_frame"] == sf_ and r["end_frame"] == ef


def test_limit_clips(spark):
    df = spark.createDataFrame([(1, 2400, 24.0)], "video_id long, num_frames int, framerate double")
    out = V.fixed_stride_clips(df, 4.0, 2.5, 1.0, limit_clips=3)
    assert out.count() == 3
    assert [r["clip_idx"] for r in out.orderBy("clip_idx").collect()] == [0, 1, 2]

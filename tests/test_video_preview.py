"""Preview stage — reference stages/video/preview/preview.py contract."""

from __future__ import annotations

import pytest

from nemo_curator_spark.operators import video_preview as VP


def test_ffmpeg_command_exact():
    cmd = VP.ffmpeg_preview_command(
        "/t/input.mp4", "/t/output.webp", target_fps=2.0, target_height=240,
        compression_level=6, quality=50, threads=4,
    )
    assert cmd == [
        "ffmpeg", "-threads", "4", "-y", "-i", "/t/input.mp4",
        "-loglevel", "error",
        "-vf", "fps=2.0,scale=-1:240",
        "-c:v", "libwebp", "-lossless", "0",
        "-compression_level", "6", "-q:v", "50", "-loop", "0",
        "/t/output.webp",
    ]


def _video():
    return {
        "metadata": {"framerate": 24.0, "height": 480},
        "clips": [
            {
                "uuid": "c0",
                "windows": [
                    {"start_frame": 0, "end_frame": 48, "mp4_bytes": b"AA"},
                    {"start_frame": 48, "end_frame": 96, "mp4_bytes": None},
                ],
            }
        ],
    }


def test_stage_contract():
    calls = []

    def fake_transcode(mp4, fps, height, cl, q):
        calls.append((mp4, fps, height, cl, q))
        return b"WEBP" + mp4

    st = VP.PreviewStage(transcode=fake_transcode)
    video = _video()
    warnings = st.process_video(video)
    assert warnings == []
    w0, w1 = video["clips"][0]["windows"]
    assert w0["webp"] == b"WEBPAA"
    assert "webp" not in w1  # empty mp4 skipped
    assert calls == [(b"AA", 1.0, 240, 6, 50)]

    # degraded-quality warnings (preview.py:51-60)
    low = _video()
    low["metadata"] = {"framerate": 0.5, "height": 100}
    warnings = st.process_video(low)
    assert len(warnings) == 2
    assert "framerate 0.5" in warnings[0] and "height 100" in warnings[1]

    # transcode failure leaves the window without webp (error path)
    def boom(*a):
        raise RuntimeError("ffmpeg died")

    failed = _video()
    VP.PreviewStage(transcode=boom).process_video(failed)
    assert "webp" not in failed["clips"][0]["windows"][0]

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        VP.PreviewStage().process_video(_video())


def test_generate_previews_spark(spark):
    df = spark.createDataFrame(
        [("a", bytearray(b"MP4A")), ("b", None)],
        "win_id string, mp4_bytes binary",
    )
    st = VP.PreviewStage(transcode=lambda m, *a: b"W" + bytes(m))
    rows = {r["win_id"]: r for r in VP.generate_previews(df, st).collect()}
    assert bytes(rows["a"]["webp"]) == b"WMP4A"
    assert rows["b"]["webp"] is None

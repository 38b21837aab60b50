"""Frame-array extraction routing — reference
video/clipping/video_frame_extraction.py:34-204."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import video_frames as VF


def _df(spark, rows=None):
    rows = rows or [
        (1, b"videobytes-a", 2.0, 24.0),
        (2, b"videobytes-b", 3.0, 30.0),
        (3, b"videobytes-c", None, 24.0),  # incomplete metadata
    ]
    return spark.createDataFrame(
        rows, "vid int, video binary, duration double, framerate double"
    )


def test_synthetic_decoder_deterministic():
    dec = VF.synthetic_frame_decoder(n_frames=4)
    a = dec(b"xyz", 48, 27)
    b = dec(b"xyz", 48, 27)
    assert a.shape == (4, 27, 48, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, dec(b"other", 48, 27))


def test_pynvc_happy_path(spark):
    out = {r.vid: r for r in VF.extract_frame_arrays(_df(spark)).collect()}
    assert out[1].decoder_used == "pynvc"
    assert out[1].frame_error is None
    arr = np.frombuffer(out[1].frames_rgb24, np.uint8).reshape(
        out[1].frame_count, out[1].frame_height, out[1].frame_width, 3
    )
    assert arr.shape == (8, 27, 48, 3)
    # deterministic: equals a direct decode of the same bytes
    direct = VF.synthetic_frame_decoder()(b"videobytes-a", 48, 27)
    assert np.array_equal(arr, direct)


def test_metadata_guard(spark):
    out = {r.vid: r for r in VF.extract_frame_arrays(_df(spark)).collect()}
    assert out[3].frame_error == "metadata: incomplete"
    assert out[3].frames_rgb24 is None
    assert out[3].decoder_used is None


def test_pynvc_exception_falls_back_to_cpu(spark):
    def boom(_b, _w, _h):
        raise RuntimeError("nvdec error")

    decoders = {"pynvc": boom, "ffmpeg_cpu": VF.synthetic_frame_decoder(2)}
    out = {
        r.vid: r
        for r in VF.extract_frame_arrays(_df(spark), decoders=decoders).collect()
    }
    assert out[1].decoder_used == "ffmpeg_cpu"
    assert out[1].frame_count == 2
    assert out[1].frame_error is None


def test_pynvc_unavailable_falls_back(spark):
    decoders = {"ffmpeg_cpu": VF.synthetic_frame_decoder(2)}
    out = {
        r.vid: r
        for r in VF.extract_frame_arrays(_df(spark), decoders=decoders).collect()
    }
    assert out[1].decoder_used == "ffmpeg_cpu"


def test_ffmpeg_gpu_retries_cpu(spark):
    decoders = {
        "ffmpeg_gpu": VF.failing_decoder,
        "ffmpeg_cpu": VF.synthetic_frame_decoder(3),
    }
    out = {
        r.vid: r
        for r in VF.extract_frame_arrays(
            _df(spark), decoder_mode="ffmpeg_gpu", decoders=decoders
        ).collect()
    }
    assert out[1].decoder_used == "ffmpeg_cpu"
    assert out[1].frame_count == 3


def test_all_decoders_fail(spark):
    decoders = {"pynvc": VF.failing_decoder}  # no cpu fallback registered
    out = {
        r.vid: r
        for r in VF.extract_frame_arrays(_df(spark), decoders=decoders).collect()
    }
    assert out[1].frame_error == "decode failed"
    assert out[1].frames_rgb24 is None


def test_null_bytes_raise(spark):
    df = spark.createDataFrame(
        [(1, None, 1.0, 24.0)], "vid int, video binary, duration double, framerate double"
    )
    with pytest.raises(Exception, match="source bytes"):
        VF.extract_frame_arrays(df).collect()


def test_format_raw_video_frames():
    import numpy as np
    import pytest

    from nemo_curator_spark.operators.video_frames import (
        format_raw_video_frames,
    )

    u8 = np.arange(2 * 2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 2, 3)
    out = format_raw_video_frames(u8[:, :, ::-1])  # non-contiguous input
    assert out.flags["C_CONTIGUOUS"] and out.dtype == np.uint8
    # float raw frames truncate to uint8
    f = u8.astype(np.float32) + 0.9
    assert format_raw_video_frames(f).tolist() == u8.tolist()
    with pytest.raises(ValueError, match="4 dimensions"):
        format_raw_video_frames(u8[0])
    with pytest.raises(ValueError, match="channel-last"):
        format_raw_video_frames(np.zeros((2, 3, 4, 5), dtype=np.uint8))
    with pytest.raises(ValueError, match="negative"):
        format_raw_video_frames(np.full((1, 2, 2, 3), -0.5))
    with pytest.raises(ValueError, match="exceed uint8"):
        format_raw_video_frames(np.full((1, 2, 2, 3), 300.0))

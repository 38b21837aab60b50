"""Video decoder bookkeeping (reference utils/decoder_utils.py) —
deterministic-half pins, cases ported from the reference's
tests/utils/test_decoder_utils.py."""

from __future__ import annotations

from nemo_curator_spark.operators import decoder_utils as D


def test_resolution_named_tuple():
    r = D.Resolution(height=1080, width=1920)
    assert r.height == 1080 and r.width == 1920
    assert r[0] == 1080 and r[1] == 1920
    h, w = r
    assert (h, w) == (1080, 1920)


def test_frame_extraction_policy_values():
    assert D.FrameExtractionPolicy.first.value == 0
    assert D.FrameExtractionPolicy.middle.value == 1
    assert D.FrameExtractionPolicy.last.value == 2
    assert D.FrameExtractionPolicy.sequence.value == 3
    assert D.FramePurpose.AESTHETICS.value == 1
    assert D.FramePurpose.EMBEDDINGS.value == 2


def test_signature_to_str_exact_format():
    # reference test_decoder_utils.py:146-165 expectations
    sig = D.FrameExtractionSignature(
        extraction_policy=D.FrameExtractionPolicy.sequence, target_fps=24.0
    )
    assert sig.to_str() == "FrameExtractionPolicy.sequence-24000"
    frac = D.FrameExtractionSignature(
        extraction_policy=D.FrameExtractionPolicy.first, target_fps=29.97
    )
    assert frac.to_str() == "FrameExtractionPolicy.first-29970"


def test_codec_sniff(tmp_path):
    # reference test_decoder_utils.py:345-366 behaviors
    for tag, codec in D.MP4_GPU_ONLY_CODEC_TAGS.items():
        assert D.detect_codec_from_bytes(b"\x00" * 100 + tag + b"rest") == codec
    assert D.detect_codec_from_bytes(b"nothing to see") is None
    p = tmp_path / "clip.mp4"
    p.write_bytes(b"ftyp" + b"hvc1" + b"\x00" * 32)
    assert D.detect_codec_from_mp4_header(p) == "hevc"
    assert D.detect_codec_from_mp4_header(tmp_path / "missing.mp4") is None


def test_codec_error_carries_codec():
    err = D.VideoCodecNotSupportedError("nope", codec="h264")
    assert err.codec == "h264" and isinstance(err, RuntimeError)
    assert D.VideoCodecNotSupportedError("nope").codec is None
    assert "CUDA_ERROR_NO_DEVICE" in D.CODEC_OPEN_FAILURE_SIGNALS


def test_cosmos_stage_uses_exact_signature():
    from nemo_curator_spark.operators.cosmos_embed import (
        CosmosEmbed1FrameCreationStage,
        CosmosProcessorConfig,
    )

    st = CosmosEmbed1FrameCreationStage(
        config=CosmosProcessorConfig(num_video_frames=2, resolution=2)
    )
    assert st.frame_extraction_signature == (
        "FrameExtractionPolicy.sequence-2000"
    )

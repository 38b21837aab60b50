"""Video split getting-started pipeline surface
(pipeline/video_split_pipeline.py vs reference
tutorials/video/getting-started/video_split_clip_example.py)."""

from __future__ import annotations

import pytest

from nemo_curator_spark.pipeline import video_split_pipeline as VS


def _names(stages):
    return [name for name, _ in stages]


def test_default_pipeline_order():
    cfg = VS.VideoSplitConfig(video_dir="/in", output_path="/out")
    # defaults: fixed_stride split, embeddings on, no motion/aesthetic/captions
    assert _names(VS.build_video_splitting_stages(cfg)) == [
        "VideoReader",
        "FixedStrideExtractorStage",
        "ClipTranscodingStage",
        "ClipFrameExtractionStage",  # purposes = [EMBEDDINGS]
        "CosmosEmbed1FrameCreationStage",
        "CosmosEmbed1EmbeddingStage",
        "ClipWriterStage",
    ]


def test_full_pipeline_order():
    cfg = VS.VideoSplitConfig(
        video_dir="/in", output_path="/out",
        splitting_algorithm="transnetv2", motion_filter="score-only",
        aesthetic_threshold=3.5, generate_captions=True,
        generate_previews=True, enhance_captions=True,
    )
    stages = VS.build_video_splitting_stages(cfg)
    assert _names(stages) == [
        "VideoReader",
        "VideoFrameExtractionStage",
        "TransNetV2ClipExtractionStage",
        "ClipTranscodingStage",
        "MotionVectorDecodeStage",
        "MotionFilterStage",
        "ClipFrameExtractionStage",
        "ClipAestheticFilterStage",
        "CosmosEmbed1FrameCreationStage",
        "CosmosEmbed1EmbeddingStage",
        "CaptionPreparationStage",
        "PreviewStage",
        "CaptionGenerationStage",
        "CaptionEnhancementStage",
        "ClipWriterStage",
    ]
    by = dict(stages)
    # purposes assembled in the reference order: aesthetics first
    assert by["ClipFrameExtractionStage"]["extract_purposes"] == (
        "AESTHETICS", "EMBEDDINGS",
    )
    assert by["MotionFilterStage"]["score_only"] is True
    # stride/duration aliasing: clip_stride_s = split duration
    cfg2 = VS.VideoSplitConfig(
        video_dir="/in", output_path="/out",
        fixed_stride_split_duration=4.0,
    )
    fse = dict(VS.build_video_splitting_stages(cfg2))[
        "FixedStrideExtractorStage"
    ]
    assert fse["clip_len_s"] == 4.0 and fse["clip_stride_s"] == 4.0
    # embedding variant parse
    cfg3 = VS.VideoSplitConfig(
        video_dir="/in", output_path="/out",
        embedding_algorithm="cosmos-embed1-448p",
    )
    assert dict(VS.build_video_splitting_stages(cfg3))[
        "CosmosEmbed1FrameCreationStage"
    ]["variant"] == "448p"
    # writer always last, caption models threaded through
    w = dict(stages)["ClipWriterStage"]
    assert w["caption_models"] == ["qwen2.5"]
    assert w["enhanced_caption_models"] == ["qwen_lm"]


def test_no_embeddings_no_frame_extraction():
    cfg = VS.VideoSplitConfig(
        video_dir="/in", output_path="/out", generate_embeddings=False,
    )
    names = _names(VS.build_video_splitting_stages(cfg))
    assert "ClipFrameExtractionStage" not in names
    assert "CosmosEmbed1EmbeddingStage" not in names


def test_config_whitelists():
    with pytest.raises(ValueError):
        VS.VideoSplitConfig(splitting_algorithm="shots")
    with pytest.raises(ValueError):
        VS.VideoSplitConfig(motion_filter="on")
    with pytest.raises(ValueError):
        VS.VideoSplitConfig(embedding_algorithm="clip")
    with pytest.raises(ValueError):
        VS.VideoSplitConfig(transcode_encoder="libx264")


def test_h264_preflight():
    decoders = """ Decoders:
 V....D h264                 H.264 / AVC / MPEG-4 AVC
 V....D h264_cuvid           Nvidia CUVID H264 decoder (codec h264)
"""
    cuvid_only = " V....D h264_cuvid           Nvidia CUVID H264\n"
    assert VS.h264_software_decoder_available(decoders)
    assert not VS.h264_software_decoder_available(cuvid_only)
    assert not VS.h264_software_decoder_available(None)
    # non-h264 encoder: no check at all
    VS.preflight_check_h264_decoder("libvpx-vp9", None)
    VS.preflight_check_h264_decoder("h264_nvenc", decoders)
    with pytest.raises(RuntimeError):
        VS.preflight_check_h264_decoder("h264_nvenc", None)
    with pytest.raises(RuntimeError):
        VS.preflight_check_h264_decoder("libopenh264", cuvid_only)

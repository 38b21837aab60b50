"""Motion/aesthetic filtering — reference stages/video/filtering/*
(flowfield painting, score math, stage contracts)."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import video_motion as VM


def _mv(bw, bh, dst_x, dst_y, mx, my, scale=1.0):
    # [block_w, block_h, src_x, src_y, dst_x, dst_y, flags, mx, my, scale]
    return [bw, bh, 0, 0, dst_x, dst_y, 0, mx, my, scale]


def test_flowfield_paints_block():
    mvs = np.array([_mv(8, 8, 16, 16, 4.0, -2.0, 2.0)])
    flow = VM.motion_vectors_to_flowfield(mvs, (64, 64))
    # delta = -motion/scale = (-2.0, 1.0), painted over x 12..19, y 12..19
    assert flow[16, 16, 0] == -2.0 and flow[16, 16, 1] == 1.0
    assert flow[12, 12, 0] == -2.0
    assert flow[20, 16, 0] == 0.0 and flow[11, 16, 0] == 0.0
    # zero outside
    assert flow[40, 40, 0] == 0.0


def test_flowfield_later_blocks_win_and_bounds():
    # 8x8 group paints first, 16x16 second -> 16x16 wins on overlap
    mvs = np.array(
        [_mv(8, 8, 10, 10, 1.0, 0.0), _mv(16, 16, 10, 10, 3.0, 0.0)]
    )
    flow = VM.motion_vectors_to_flowfield(mvs, (32, 32))
    assert flow[10, 10, 0] == -3.0
    # block at the border clamps indices instead of wrapping
    edge = np.array([_mv(8, 8, 0, 0, 2.0, 0.0)])
    f2 = VM.motion_vectors_to_flowfield(edge, (32, 32))
    assert f2[0, 0, 0] == -2.0
    assert not np.any(np.isnan(f2))
    # zero scale -> zero delta (no div-by-zero)
    z = VM.motion_vectors_to_flowfield(
        np.array([_mv(8, 8, 5, 5, 9.0, 9.0, 0.0)]), (16, 16)
    )
    assert z[5, 5, 0] == 0.0


def test_cv2_resize_linear_identity_and_mean():
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    same = VM.cv2_resize_linear(img, 1.0, 1.0)
    np.testing.assert_allclose(same, img)
    # 2x downscale of a linear ramp: bilinear at half-pixel centers
    half = VM.cv2_resize_linear(img, 0.5, 0.5)
    assert half.shape == (2, 2)
    # center of output (0,0) maps to src (0.5, 0.5): mean of 4 corners
    assert half[0, 0] == pytest.approx((0 + 1 + 4 + 5) / 4)


def test_check_if_small_motion():
    h = w = 256
    # strong uniform motion everywhere: one 16x16 block per 16px grid
    mvs = np.array(
        [
            _mv(16, 16, x + 8, y + 8, 8.0, 0.0)
            for y in range(0, h, 16)
            for x in range(0, w, 16)
        ]
    )
    info = VM.check_if_small_motion([mvs] * 3, (h, w))
    # |delta| = 8 normalized by (256+256) = 0.015625 everywhere
    assert info.global_mean == pytest.approx(8 / 512)
    assert info.per_patch_min_256 == pytest.approx(8 / 512)
    assert not info.is_small_motion
    # no motion vectors at all -> zero scores -> small motion
    info0 = VM.check_if_small_motion([np.zeros((0, 10))], (h, w))
    assert info0.is_small_motion and info0.global_mean == 0.0
    assert VM.check_if_small_motion([], (h, w)).is_small_motion


def test_motion_filter_stage_contract():
    h = w = 256
    strong = np.array(
        [
            _mv(16, 16, x + 8, y + 8, 8.0, 0.0)
            for y in range(0, h, 16)
            for x in range(0, w, 16)
        ]
    )
    video = {
        "clips": [
            {"uuid": "moving",
             "decoded_motion_data": {"frames": [strong], "frame_size": (h, w)}},
            {"uuid": "static",
             "decoded_motion_data": {"frames": [np.zeros((0, 10))],
                                      "frame_size": (h, w)}},
            {"uuid": "nodata"},
        ],
    }
    out = VM.MotionFilterStage().process_video(video)
    assert [c["uuid"] for c in out["clips"]] == ["moving"]
    assert [c["uuid"] for c in out["filtered_clips"]] == ["static", "nodata"]
    assert out["clip_stats"]["num_filtered_by_motion"] == 2
    # fake -1.0 scores for missing data (motion_filter.py:127-134)
    assert out["filtered_clips"][1]["motion_score_global_mean"] == -1.0
    # score annotations + decoded data cleared
    assert out["clips"][0]["decoded_motion_data"] is None
    assert out["clips"][0]["motion_score_global_mean"] > 0
    # score_only keeps everything
    video2 = {
        "clips": [{"uuid": "nodata"}],
    }
    out2 = VM.MotionFilterStage(score_only=True).process_video(video2)
    assert [c["uuid"] for c in out2["clips"]] == ["nodata"]
    assert out2.get("filtered_clips") == []


def test_aesthetic_filter_stage_contract():
    sig = "sequence-1.0"

    class Scorer:
        def __call__(self, frames):
            return [f.mean() / 255.0 for f in frames]

    mk = lambda val: {  # noqa: E731
        "uuid": f"c{val}",
        "buffer": b"mp4",
        "extracted_frames": {
            sig: [np.full((2, 2, 3), val, dtype=np.uint8)] * 2
        },
    }
    video = {
        "clips": [
            mk(250),  # score ~0.98 -> kept
            mk(10),  # score ~0.04 -> filtered
            {"uuid": "nobuf", "buffer": None},
            {"uuid": "noframes", "buffer": b"x", "extracted_frames": {}},
        ],
    }
    st = VM.ClipAestheticFilterStage(
        score_threshold=0.5, model=Scorer(), frame_signature=sig
    )
    out = st.process_video(video)
    assert [c["uuid"] for c in out["clips"]] == ["c250"]
    assert [c["uuid"] for c in out["filtered_clips"]] == [
        "c10", "nobuf", "noframes",
    ]
    assert out["clip_stats"]["num_filtered_by_aesthetic"] == 3
    # error annotations (clip_aesthetic_filter.py:78-88)
    assert out["filtered_clips"][1]["errors"]["buffer"] == "empty"
    assert out["filtered_clips"][2]["errors"][f"frames-{sig}"] == "missing"
    assert out["filtered_clips"][1]["aesthetic_score"] == -1.0
    # frames consumed after scoring (popped)
    assert sig not in out["clips"][0]["extracted_frames"]
    with pytest.raises(ValueError, match="Invalid reduction"):
        VM.ClipAestheticFilterStage(reduction="max")
    with pytest.raises(NotImplementedError, match="CLIP"):
        VM.ClipAestheticFilterStage().process_video({"clips": []})


def test_mean_vs_min_reduction():
    sig = "sequence-1.0"

    class TwoScores:
        def __call__(self, frames):
            return [0.2, 0.8]

    clip = {
        "uuid": "c",
        "buffer": b"x",
        "extracted_frames": {sig: [np.zeros((1, 1, 3))] * 2},
    }
    v_min = VM.ClipAestheticFilterStage(
        reduction="min", model=TwoScores(), frame_signature=sig
    ).process_video({"clips": [dict(clip, extracted_frames={sig: [0, 0]})]})
    assert v_min["filtered_clips"][0]["aesthetic_score"] == pytest.approx(0.2)
    v_mean = VM.ClipAestheticFilterStage(
        reduction="mean", model=TwoScores(), frame_signature=sig
    ).process_video({"clips": [dict(clip, extracted_frames={sig: [0, 0]})]})
    assert v_mean["clips"][0]["aesthetic_score"] == pytest.approx(0.5)


def test_motion_scores_spark(spark):
    h = w = 256
    strong = np.array(
        [
            _mv(16, 16, x + 8, y + 8, 8.0, 0.0)
            for y in range(0, h, 16)
            for x in range(0, w, 16)
        ],
        dtype=np.float64,
    )
    rows = [
        ("moving", [bytearray(strong.tobytes())], h, w),
        ("static", [], h, w),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, mv_frames array<binary>, frame_h int, frame_w int"
    )
    got = {r["clip_id"]: r for r in VM.motion_scores(df).collect()}
    assert got["moving"]["motion_score_global_mean"] == pytest.approx(8 / 512)
    assert not got["moving"]["is_small_motion"]
    assert got["static"]["is_small_motion"]
    # filtering stays a JVM Column predicate downstream
    assert VM.motion_scores(df).filter("NOT is_small_motion").count() == 1

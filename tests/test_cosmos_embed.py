"""Cosmos-Embed1 deterministic halves — reference
stages/video/embedding/cosmos_embed1.py + models/cosmos_embed1.py
(frame selection/formulation, fps-doubling re-extract plan, evaluate,
stage error contracts)."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import cosmos_embed as CE


def test_selected_frame_indices():
    assert CE.selected_frame_indices(20, 8) == [0, 2, 4, 6, 8, 10, 12, 14]
    assert CE.selected_frame_indices(8, 8) == list(range(8))
    assert CE.selected_frame_indices(7, 8) == []
    # step truncates: 17 // 8 = 2 -> same picks as 16 frames
    assert CE.selected_frame_indices(17, 8) == [0, 2, 4, 6, 8, 10, 12, 14]


def _frames(n, h=4, w=4, c=3):
    return [
        np.full((h, w, c), i * 10, dtype=np.uint8) for i in range(n)
    ]


def test_formulate_input_frames_selection_and_shape():
    cfg = CE.CosmosProcessorConfig(num_video_frames=2, resolution=2)
    out = CE.formulate_input_frames(_frames(5), cfg)
    assert out.shape == (1, 2, 3, 2, 2) and out.dtype == np.float32
    # step = 5 // 2 = 2 -> frames 0 and 2 (values 0 and 20)
    for t, v in enumerate((0, 20)):
        expect = (
            v / 255.0 - np.asarray(cfg.image_mean)
        ) / np.asarray(cfg.image_std)
        np.testing.assert_allclose(
            out[0, t, :, 0, 0], expect.astype(np.float32), rtol=0, atol=0
        )
    # short input -> None (reference logs and returns None)
    assert CE.formulate_input_frames(_frames(1), cfg) is None


def test_formulate_resize_is_exact_bilinear():
    cfg = CE.CosmosProcessorConfig(
        num_video_frames=1, resolution=1, image_mean=(0, 0, 0),
        image_std=(1, 1, 1), rescale_factor=1.0,
    )
    # 2x2 -> 1x1 with half-pixel centers = plain mean of the 4 pixels
    f = np.array(
        [[[0, 0, 0], [10, 10, 10]], [[20, 20, 20], [30, 30, 30]]],
        dtype=np.uint8,
    )
    out = CE.formulate_input_frames([f], cfg)
    np.testing.assert_allclose(out[0, 0, :, 0, 0], [15.0, 15.0, 15.0])


def test_regen_fps_plan():
    # 1.0 s at 2 fps: 2 -> 4 -> 8 frames at 8 fps
    assert CE.regen_fps_plan(1.0, 2.0, 8) == (8.0, 8, True)
    # already enough
    assert CE.regen_fps_plan(10.0, 2.0, 8) == (2.0, 20, True)
    # 0.3 s: 0,1,2,4 frames at 2,4,8,16 fps; 32 > 20 -> fail
    fps, n, ok = CE.regen_fps_plan(0.3, 2.0, 8)
    assert (fps, ok) == (32.0, False) and n == 4
    # injectable counter
    fps, n, ok = CE.regen_fps_plan(
        0.0, 2.0, 8, frames_at=lambda f: 8 if f >= 4 else 1
    )
    assert (fps, n, ok) == (4.0, 8, True)


def test_evaluate_softmax_topk():
    v = np.array([[1.0, 0.0]])
    texts = [np.array([[1.0, 0.0]]), np.array([[0.0, 1.0]])]
    probs, idxs = CE.evaluate(v, texts)
    assert idxs == [0, 1]
    logits = np.array([100.0, 0.0])
    e = np.exp(logits - logits.max())
    expect = e / e.sum()
    assert probs == pytest.approx([expect[0], expect[1]])
    assert sum(probs) == pytest.approx(1.0)


def test_frame_creation_stage_contract():
    st = CE.CosmosEmbed1FrameCreationStage(
        config=CE.CosmosProcessorConfig(num_video_frames=2, resolution=2)
    )
    # missing buffer
    c1 = st.process_clip({"buffer": None})
    assert c1["errors"]["buffer"] == "empty"
    # missing extraction signature
    c2 = st.process_clip({"buffer": b"x", "extracted_frames": {}})
    assert c2["errors"][f"frames-{st.frame_extraction_signature}"] == "missing"
    # happy path clears extracted_frames
    c3 = st.process_clip(
        {
            "buffer": b"x",
            "extracted_frames": {st.frame_extraction_signature: _frames(4)},
        }
    )
    assert c3["cosmos_embed1_frames"].shape == (1, 2, 3, 2, 2)
    assert c3["extracted_frames"] == {}
    # short frames + injectable re-extractor: doubles fps until enough
    calls = []

    def extractor(buf, fps):
        calls.append(fps)
        return _frames(2 if fps < 8 else 4)

    st2 = CE.CosmosEmbed1FrameCreationStage(
        config=CE.CosmosProcessorConfig(num_video_frames=4, resolution=2),
        extractor=extractor,
    )
    c4 = st2.process_clip(
        {
            "buffer": b"x",
            "extracted_frames": {st2.frame_extraction_signature: _frames(2)},
        }
    )
    assert calls == [4.0, 8.0]
    assert c4["cosmos_embed1_frames"].shape == (1, 4, 3, 2, 2)
    # short frames, no extractor -> formulate returns None
    c5 = st.process_clip(
        {
            "buffer": b"x",
            "extracted_frames": {st.frame_extraction_signature: _frames(1)},
        }
    )
    assert c5["cosmos_embed1_frames"] is None


def test_embedding_stage_contract():
    st = CE.CosmosEmbed1EmbeddingStage()
    c = st.process_clip({"cosmos_embed1_frames": None})
    assert c["errors"]["cosmos_embed1_frames"] == "empty"
    with pytest.raises(RuntimeError, match="Model is not loaded"):
        st.process_clip({"cosmos_embed1_frames": np.zeros((1, 2, 3, 2, 2))})
    # empty embedding -> failed; with texts_to_verify set the stage
    # records the error instead of crashing in evaluate (documented
    # improvement over the reference fall-through)
    st2 = CE.CosmosEmbed1EmbeddingStage(
        encoder=lambda f: np.zeros((0, 4)),
        text_encoder=lambda t: np.ones((1, 4)),
        texts_to_verify=["dog"],
    )
    c2 = st2.process_clip(
        {"cosmos_embed1_frames": np.zeros((1, 2, 3, 2, 2))}
    )
    assert c2["errors"]["cosmos_embed1_embedding"] == "failed"
    assert "cosmos_embed1_text_match" not in c2
    assert c2["cosmos_embed1_frames"] is None
    # verify path picks the best text and frees frames
    st3 = CE.CosmosEmbed1EmbeddingStage(
        encoder=lambda f: np.array([[0.0, 1.0]]),
        text_encoder=lambda t: (
            np.array([[0.0, 1.0]]) if t == "cat" else np.array([[1.0, 0.0]])
        ),
        texts_to_verify=["dog", "cat"],
    )
    c3 = st3.process_clip(
        {"cosmos_embed1_frames": np.zeros((1, 2, 3, 2, 2))}
    )
    assert c3["cosmos_embed1_text_match"][0] == "cat"
    assert c3["cosmos_embed1_text_match"][1] > 0.99
    assert c3["cosmos_embed1_frames"] is None
    np.testing.assert_array_equal(
        c3["cosmos_embed1_embedding"], np.array([[0.0, 1.0]])
    )


def test_frame_plan_target_fps_above_max(spark):
    # rung 0 always exists: extraction already happened at target_fps,
    # only DOUBLINGS are guarded by max_fps (mirrors regen_fps_plan)
    df = spark.createDataFrame([(0, 10.0)], "clip_id long, duration double")
    rows = CE.cosmos_frame_plan(
        df, target_fps=30.0, max_fps=20.0
    ).collect()
    fps, n, ok = CE.regen_fps_plan(10.0, 30.0, 8, max_fps=20.0)
    assert ok and fps == 30.0
    assert all(r.ok and r.final_fps == 30.0 and r.n_frames == n for r in rows)
    assert sorted(r.frame_idx for r in rows) == CE.selected_frame_indices(n, 8)


def test_spark_frame_plan_matches_python(spark):
    durations = [0.3, 0.6, 1.0, 2.5, 4.0, 10.0, 0.45]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(durations)],
        "clip_id long, duration double",
    )
    got = CE.cosmos_frame_plan(df).collect()
    by_clip: dict[int, list] = {}
    for r in got:
        by_clip.setdefault(r.clip_id, []).append(r)
    for i, d in enumerate(durations):
        fps, n, ok = CE.regen_fps_plan(d, 2.0, 8)
        rows = sorted(by_clip[i], key=lambda r: r.frame_pos)
        if not ok:
            assert len(rows) == 1
            r = rows[0]
            assert (r.ok, r.final_fps, r.n_frames, r.stride) == (
                False, None, n, -1,
            )
            assert (r.frame_pos, r.frame_idx) == (-1, -1)
        else:
            assert [r.frame_idx for r in rows] == CE.selected_frame_indices(
                n, 8
            )
            assert all(r.final_fps == fps and r.n_frames == n for r in rows)
            assert [r.frame_pos for r in rows] == list(range(8))

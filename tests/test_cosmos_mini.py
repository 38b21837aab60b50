"""MiniCosmosEmbed — real video/text dual-encoder inference behind the
Cosmos-Embed1 stage seam (operators/cosmos_mini.py vs reference
models/cosmos_embed1.py:109-188)."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import cosmos_embed as CE
from nemo_curator_spark.operators import cosmos_mini as CM


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cosmos") / "cosmos.mini.json")
    CM.ensure_artifact(path)
    return CM.load_cached(path), path


def _video_tensor(seed):
    frames, cls = CM.synth_video(seed)
    return CE.formulate_input_frames(frames, CM.MINI_CONFIG), cls


def test_save_load_bit_exact(model, tmp_path):
    m, _ = model
    p2 = str(tmp_path / "again.json")
    m.save(p2)
    m2 = CM.MiniCosmosEmbed.load(p2)
    t, _ = _video_tensor(5)
    assert np.array_equal(m.encode_video_frames(t), m2.encode_video_frames(t))
    assert np.array_equal(
        m.get_text_embedding("a video of a red square"),
        m2.get_text_embedding("a video of a red square"),
    )


def test_embedding_shapes_normalized(model):
    m, _ = model
    t, _ = _video_tensor(9)
    v = m.encode_video_frames(t)
    assert v.shape == (1, CM.EMBED_DIM)
    assert np.sqrt((v**2).sum()) == pytest.approx(1.0)
    x = m.get_text_embedding("a video of a blue circle")
    assert x.shape == (1, CM.EMBED_DIM)
    assert np.sqrt((x**2).sum()) == pytest.approx(1.0)


def test_zero_shot_heldout(model):
    m, _ = model
    tembs = np.concatenate(
        [m.get_text_embedding(CM.caption_for(c)) for c in CM.CLASSES]
    )
    ok = 0
    for seed in range(6000, 6060):  # never in training (seed*10000+i)
        t, cls = _video_tensor(seed)
        v = m.encode_video_frames(t)
        ok += int(CM.CLASSES[int(np.argmax(v @ tembs.T))] == cls)
    assert ok / 60 >= 0.9, ok


def test_embedding_stage_end_to_end(model):
    # the reference stage contract over REAL nets: embedding written,
    # texts_to_verify resolved through the exact-ported evaluate()
    m, _ = model
    t, cls = _video_tensor(6001)
    stage = CE.CosmosEmbed1EmbeddingStage()
    stage.encoder = m.encode_video_frames
    stage.text_encoder = m.get_text_embedding
    stage.texts_to_verify = [CM.caption_for(c) for c in CM.CLASSES]
    clip = {"cosmos_embed1_frames": t}
    out = stage.process_clip(clip)
    assert out["cosmos_embed1_embedding"].shape == (1, CM.EMBED_DIM)
    best_text, best_prob = out["cosmos_embed1_text_match"]
    assert best_text == CM.caption_for(cls)
    assert 0.0 < best_prob <= 1.0
    assert out["cosmos_embed1_frames"] is None  # frames freed
    # missing frames -> the stage's error contract
    out2 = CE.CosmosEmbed1EmbeddingStage().process_clip(
        {"cosmos_embed1_frames": None}
    )
    assert out2["errors"]["cosmos_embed1_frames"] == "empty"


def test_formulate_short_video_none():
    frames, _ = CM.synth_video(7)
    assert (
        CE.formulate_input_frames(frames[:4], CM.MINI_CONFIG) is None
    )  # fewer than num_video_frames


def test_variable_frame_counts_embed(model):
    # stride selection handles every synthetic frame count
    m, _ = model
    for seed in (11, 12, 13):
        t, _ = _video_tensor(seed)
        assert t.shape == (1, CM.MINI_FRAMES, 3, CM.MINI_RES, CM.MINI_RES)
        assert np.isfinite(m.encode_video_frames(t)).all()

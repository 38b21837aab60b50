"""MiniTransNetV2 — real shot-transition inference at mini scale.

Pins: architecture determinism (save/load bit-exact), the reference
windowed-batching contract (transnetv2_extraction.py:146-177), held-out
probe quality (the model is REAL, not a hash), color-histogram parity
with a naive reimplementation, and the two Spark forms agreeing
bit-exactly (both run in Spark workers — the batching-invariance rule).
"""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import transnet_mini as tm


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tn") / "transnet.mini.json")
    tm.ensure_artifact(path)
    return tm.load_cached(path), path


def test_save_load_bit_exact(model, tmp_path):
    m, _ = model
    p2 = str(tmp_path / "again.json")
    m.save(p2)
    m2 = tm.MiniTransNetV2.load(p2)
    assert m2.threshold == m.threshold
    for k, v in m.p.items():
        if isinstance(v, np.ndarray):
            assert np.array_equal(v, m2.p[k]), k
    frames, _ = tm.synth_video(3, 60)
    assert np.array_equal(m.predict_video(frames), m2.predict_video(frames))


def test_get_batches_contract():
    # transnetv2_extraction.py:146-167: 100-frame windows stepped by 50,
    # 25-frame first/last-frame replication at the edges
    frames = np.arange(120, dtype=np.uint8)[:, None, None, None] * np.ones(
        (1, tm.H, tm.W, 3), dtype=np.uint8
    )
    batches = list(tm.get_batches(frames))
    # the reference's end-padding branch is dead code (end_idx is clamped
    # to total BEFORE the `end_idx > total` check), so trailing windows
    # are genuinely SHORT — the port reproduces the quirk exactly
    assert [len(b) for b in batches] == [100, 95, 45]
    # first window: 25 replicas of frame 0, then frames 0..74
    assert (batches[0][:25] == frames[0]).all()
    assert np.array_equal(batches[0][25:], frames[:75])
    # later windows: raw frame slices [i-25 : i+75), no padding
    assert np.array_equal(batches[1], frames[25:120])
    assert np.array_equal(batches[2], frames[75:120])
    # [25:75] keeps of consecutive windows tile the timeline exactly
    kept = np.concatenate([b[25:75, 0, 0, 0] for b in batches])
    assert np.array_equal(kept, frames[:, 0, 0, 0])


def test_probe_separates_heldout_cuts(model):
    m, _ = model
    tp = fp = fn = 0
    for seed in range(200, 206):  # videos never seen in training
        frames, cuts = tm.synth_video(seed, 120)
        pred = set(np.flatnonzero(m.predict_video(frames) > m.threshold))
        cs = set(cuts)
        tp += len(pred & cs)
        fp += len(pred - cs)
        fn += len(cs - pred)
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    assert f1 >= 0.9, (tp, fp, fn)


def test_color_histograms_naive_parity():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(4, tm.H, tm.W, 3), dtype=np.uint8)
    got = tm.color_histograms(frames)
    for t in range(4):
        hist = np.zeros(512)
        for y in range(tm.H):
            for x in range(tm.W):
                r, g, b = (int(v) for v in frames[t, y, x])
                hist[((r >> 5) << 6) + ((g >> 5) << 3) + (b >> 5)] += 1
        hist = hist / np.linalg.norm(hist)
        assert np.allclose(got[t], hist, atol=0, rtol=0)


def test_avg_pool_drops_odd_remainder():
    x = np.arange(2 * 1 * 3 * 5, dtype=np.float64).reshape(2, 1, 3, 5)
    out = tm._avg_pool_2x2(x)
    assert out.shape == (2, 1, 1, 2)
    assert out[0, 0, 0, 0] == x[0, 0, :2, :2].mean()


def test_spark_paths_bit_identical(spark, model):
    # synth-side and raw-bytes-side forwards run in Spark workers over
    # identical pixels -> bit-identical probabilities (two Spark passes,
    # per the batching-invariance rule; B=1 windows in both)
    _, path = model
    vids = [(3, 60), (7, 45), (11, 101)]
    df = spark.createDataFrame(vids, "video_id long, n_frames int")
    synth = {
        (r["video_id"], r["frame"]): r["prob"]
        for r in tm.transnet_probs_synth(df, path).collect()
    }
    rows = []
    for vid, n in vids:
        frames, _ = tm.synth_video(vid, n)
        rows.append((vid, bytearray(frames.tobytes()), n))
    df2 = spark.createDataFrame(
        rows, "video_id long, frames binary, n_frames int"
    )
    raw = {
        (r["video_id"], r["frame"]): r["prob"]
        for r in tm.transnet_probs_frames(df2, path).collect()
    }
    assert synth.keys() == raw.keys()
    assert len(synth) == sum(n for _, n in vids)
    assert all(synth[k] == raw[k] for k in synth)

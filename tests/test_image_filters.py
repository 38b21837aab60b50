"""Image aesthetic/NSFW filters — reference stages/image/filters/* +
models/{aesthetics,nsfw}.py exact head architectures."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import image_filters as IF


def test_aesthetic_mlp_is_affine_chain():
    # dropout is identity at eval -> the whole head is affine:
    # f(a*x) - f(0) == a*(f(x) - f(0))
    m = IF.AestheticMLP.init_seeded(1)
    x = np.random.RandomState(0).randn(3, 768)
    f0 = m(np.zeros((1, 768)))[0]
    fx = m(x)
    f2x = m(2 * x)
    np.testing.assert_allclose(f2x - f0, 2 * (fx - f0), rtol=1e-9)
    # shape contract: (N, 768) -> (N,)
    assert fx.shape == (3,)
    # weight shapes match the published torch architecture
    assert m.weights["w0"].shape == (1024, 768)
    assert m.weights["w4"].shape == (1, 16)


def test_nsfw_model_structure():
    m = IF.NSFWModelNP.init_seeded(2)
    x = np.random.RandomState(1).randn(4, 768)
    out = m(x)
    assert out.shape == (4,)
    assert np.all((out > 0) & (out < 1))  # sigmoid output
    # normalization buffers are applied: shifting mean shifts the input
    m2 = IF.NSFWModelNP({**m.weights, "mean": np.full(768, 5.0)})
    assert not np.allclose(m2(x), out)
    # ReLU nonlinearity -> NOT affine
    f0 = m(np.zeros((1, 768)))[0]
    assert not np.allclose(m(2 * x) - f0, 2 * (m(x) - f0), rtol=1e-3)
    assert m.weights["w1"].shape == (512, 64)


class _Fixed:
    def __init__(self, scores):
        self.scores = list(scores)

    def __call__(self, mat):
        return np.asarray(self.scores[: len(mat)])


def test_hidden_seam_consistency():
    import numpy as np

    from nemo_curator_spark.operators.image_filters import (
        AestheticMLP,
        NSFWModelNP,
    )

    rs = np.random.RandomState(7)
    emb = rs.normal(size=(5, 768))
    a = AestheticMLP.init_seeded()
    wa, ba = a.final_weights()
    # hidden @ final layer reproduces the full forward exactly
    np.testing.assert_array_equal(a.hidden(emb) @ wa + ba, a(emb))
    assert a.hidden(emb).shape == (5, 16) and wa.shape == (16,)
    n = NSFWModelNP.init_seeded()
    wn, bn = n.final_weights()
    logit = n.hidden(emb) @ wn + bn
    np.testing.assert_array_equal(1.0 / (1.0 + np.exp(-logit)), n(emb))
    assert n.hidden(emb).shape == (5, 256)
    # the 0.5 sigmoid threshold is exactly logit < 0 (the oracle seam)
    np.testing.assert_array_equal(n(emb) < 0.5, logit < 0.0)


def test_aesthetic_stage_threshold_direction():
    imgs = [
        {"image_id": "a", "embedding": np.zeros(768)},
        {"image_id": "b", "embedding": np.zeros(768)},
    ]
    st = IF.ImageAestheticFilterStage(
        score_threshold=0.5, model=_Fixed([0.9, 0.1])
    )
    kept = st.process([dict(i) for i in imgs])
    # aesthetic keeps HIGH scores (>= threshold)
    assert [i["image_id"] for i in kept] == ["a"]
    assert kept[0]["aesthetic_score"] == 0.9


def test_nsfw_stage_threshold_direction():
    imgs = [
        {"image_id": "a", "embedding": np.zeros(768)},
        {"image_id": "b", "embedding": np.zeros(768)},
    ]
    st = IF.ImageNSFWFilterStage(
        score_threshold=0.5, model=_Fixed([0.9, 0.1])
    )
    kept = st.process([dict(i) for i in imgs])
    # NSFW keeps LOW scores (< threshold) — opposite direction
    assert [i["image_id"] for i in kept] == ["b"]
    assert kept[0]["nsfw_score"] == pytest.approx(0.1)


def test_batched_scoring_matches_unbatched():
    rs = np.random.RandomState(3)
    imgs = [{"image_id": str(k), "embedding": rs.randn(768)} for k in range(7)]
    m = IF.AestheticMLP.init_seeded(4)
    st_b1 = IF.ImageAestheticFilterStage(
        score_threshold=-1e9, model=m, model_inference_batch_size=2
    )
    st_all = IF.ImageAestheticFilterStage(
        score_threshold=-1e9, model=m, model_inference_batch_size=100
    )
    s1 = [i["aesthetic_score"] for i in st_b1.process([dict(i) for i in imgs])]
    s2 = [i["aesthetic_score"] for i in st_all.process([dict(i) for i in imgs])]
    assert s1 == pytest.approx(s2)


def test_spark_score_columns(spark):
    rs = np.random.RandomState(5)
    rows = [(k, [float(x) for x in rs.randn(768)]) for k in range(4)]
    df = spark.createDataFrame(rows, "image_id int, embedding array<double>")
    a = IF.aesthetic_scores(df, IF.AestheticMLP.init_seeded(6))
    n = IF.nsfw_scores(a, IF.NSFWModelNP.init_seeded(7))
    got = n.orderBy("image_id").collect()
    assert all("aesthetic_score" in r and "nsfw_score" in r for r in got)
    # scores match a driver-side forward exactly (deterministic closure)
    m = IF.AestheticMLP.init_seeded(6)
    expected = m(np.stack([np.asarray(r[1]) for r in rows]))
    got_scores = np.array([r["aesthetic_score"] for r in got])
    np.testing.assert_allclose(got_scores, expected, rtol=1e-12)
    assert all(0 < r["nsfw_score"] < 1 for r in got)


def test_weights_path_per_worker_cache(spark, tmp_path):
    m = IF.AestheticMLP.init_seeded(8)
    path = str(tmp_path / "aesthetic.npz")
    IF.save_weights(m.weights, path)
    loaded = IF.load_weights_cached(path)
    assert set(loaded) == set(m.weights)
    # cache hit returns the same object
    assert IF.load_weights_cached(path) is loaded
    rs = np.random.RandomState(9)
    rows = [(k, [float(x) for x in rs.randn(768)]) for k in range(3)]
    df = spark.createDataFrame(rows, "image_id int, embedding array<double>")
    got = (
        IF.aesthetic_scores(df, weights_path=path)
        .orderBy("image_id")
        .collect()
    )
    expected = m(np.stack([np.asarray(r[1]) for r in rows]))
    np.testing.assert_allclose(
        [r["aesthetic_score"] for r in got], expected, rtol=1e-12
    )

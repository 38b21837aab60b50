"""Interleaved-document filters (reference stages/interleaved/filter/*)."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import interleaved as IL
from nemo_curator_spark.operators import multimodal as MM


def _interleaved_df(spark):
    rows = [
        # s1: 1 image / 4 words -> ratio 0.25
        ("s1", 0, "text", "alpha beta gamma delta", None),
        ("s1", 1, "image", None, MM.encode_fake_image(8, 8, seed=1)),
        # s2: 3 images / 2 words -> ratio 1.5
        ("s2", 0, "image", None, MM.encode_fake_image(8, 8, seed=2)),
        ("s2", 1, "text", "two words", None),
        ("s2", 2, "image", None, MM.encode_fake_image(8, 8, seed=3)),
        ("s2", 3, "image", None, MM.encode_fake_image(8, 8, seed=4)),
        # s3: 1 image / 0 words -> ratio 1/max(0,1) = 1.0
        ("s3", 0, "image", None, MM.encode_fake_image(8, 8, seed=5)),
        ("s3", 1, "text", "   ", None),
    ]
    return spark.createDataFrame(
        rows,
        "sample_id string, seq int, modality string, text_content string, "
        "image binary",
    )


def test_image_to_text_ratio_filter(spark):
    df = _interleaved_df(spark)
    kept = IL.image_to_text_ratio_filter(df, min_ratio=0.0, max_ratio=1.0)
    samples = {r["sample_id"] for r in kept.select("sample_id").distinct().collect()}
    assert samples == {"s1", "s3"}  # s2's 1.5 exceeds max
    # whole samples survive intact
    assert kept.count() == 4
    # bounds are inclusive
    assert (
        IL.image_to_text_ratio_filter(df, 1.5, 1.5)
        .select("sample_id").distinct().count() == 1
    )


def test_laplacian_variance_flat_vs_noisy():
    flat = np.full((16, 16), 128, dtype=np.uint8)
    assert IL.laplacian_variance(flat) == 0.0
    rng = np.random.RandomState(0)
    noisy = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    assert IL.laplacian_variance(noisy) > 100.0
    # matches a brute-force reflect-101 convolution
    img = rng.randint(0, 256, size=(6, 5), dtype=np.uint8).astype(float)
    pad = np.pad(img, 1, mode="reflect")
    ref = np.empty_like(img)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            ref[y, x] = (
                pad[y, x + 1] + pad[y + 2, x + 1]
                + pad[y + 1, x] + pad[y + 1, x + 2]
                - 4 * pad[y + 1, x + 1]
            )
    assert IL.laplacian_variance(img) == pytest.approx(ref.var())


def test_blur_filter_drops_flat_and_broken_images(spark):
    sharp = MM.encode_ppm(
        np.random.RandomState(3).randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    )
    flat = MM.encode_ppm(np.full((16, 16, 3), 200, dtype=np.uint8))
    rows = [
        ("a", "image", sharp),
        ("b", "image", flat),
        ("c", "image", b"garbage"),
        ("d", "image", None),
        ("e", "text", None),
    ]
    df = spark.createDataFrame(rows, "id string, modality string, image binary")
    kept = {r["id"] for r in IL.blur_filter(df, score_threshold=100.0).collect()}
    assert kept == {"a", "e"}

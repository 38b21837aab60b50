"""Round-6 interleaved filters — reference stages/interleaved/
{stages,filter/qrcode_filter,filter/clip_score_filter}.py."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import interleaved as IL
from nemo_curator_spark.operators.multimodal import encode_ppm


def _img_bytes(w=8, h=4, seed=0):
    arr = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    return bytearray(encode_ppm(arr))


def test_reindex_after_filter(spark):
    rows = [
        # sample a: positions 0,2,5 survive (1,3 filtered upstream)
        ("a", "text", 0), ("a", "image", 2), ("a", "text", 5),
        ("a", "metadata", -1),
        # sample b: only metadata left -> pruned
        ("b", "metadata", -1),
    ]
    df = spark.createDataFrame(
        rows, "sample_id string, modality string, position int"
    )
    out = IL.reindex_after_filter(df).orderBy("sample_id", "position").collect()
    a_content = [
        (r["modality"], r["position"])
        for r in out
        if r["sample_id"] == "a" and r["modality"] != "metadata"
    ]
    # dense re-index preserving order (stages.py:122-126)
    assert a_content == [("text", 0), ("image", 1), ("text", 2)]
    assert any(
        r["sample_id"] == "a" and r["modality"] == "metadata" for r in out
    )
    # orphan metadata pruned (stages.py:127-129)
    assert not any(r["sample_id"] == "b" for r in out)


def test_aspect_ratio_filter(spark):
    rows = [
        ("s", "image", _img_bytes(8, 4), "wide2x"),   # ar 2.0 -> kept
        ("s", "image", _img_bytes(4, 8), "tall0.5"),  # ar 0.5 -> dropped
        ("s", "image", bytearray(b"junk"), "bad"),
        ("s", "image", None, "none"),
        ("s", "text", None, "text"),
    ]
    df = spark.createDataFrame(
        rows, "sample_id string, modality string, image binary, tag string"
    )
    kept = [
        r["tag"]
        for r in IL.aspect_ratio_filter(
            df, min_aspect_ratio=1.0, max_aspect_ratio=2.0
        ).collect()
    ]
    assert sorted(kept) == ["text", "wide2x"]


def test_contour_area_shoelace():
    # unit square == cv2.contourArea == 1
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    assert IL.contour_area(sq) == pytest.approx(1.0)
    assert IL.contour_area(sq * 10) == pytest.approx(100.0)
    assert IL.contour_area(sq[:2]) == 0.0  # degenerate


def test_qr_code_ratio_and_filter(spark):
    h, w = 4, 8

    def detect_half(image):
        # one QR covering half the 8x4 image
        return [np.array([[0, 0], [4, 0], [4, 4], [0, 4]])]

    img = np.zeros((h, w, 3), dtype=np.uint8)
    assert IL.qr_code_ratio(img, detect_half) == pytest.approx(0.5)
    assert IL.qr_code_ratio(img, lambda im: None) == 0.0

    def boom(im):
        raise RuntimeError("detector died")

    assert IL.qr_code_ratio(img, boom) == 0.0  # failure scores 0 (kept)

    rows = [
        ("s", "image", _img_bytes(8, 4, 1), "covered"),
        ("s", "text", None, "text"),
    ]
    df = spark.createDataFrame(
        rows, "sample_id string, modality string, image binary, tag string"
    )
    kept = [
        r["tag"] for r in IL.qr_code_filter(df, detect_half, 0.05).collect()
    ]
    assert kept == ["text"]  # ratio 0.5 >= 0.05 -> image dropped
    kept2 = [
        r["tag"] for r in IL.qr_code_filter(df, lambda im: None, 0.05).collect()
    ]
    assert sorted(kept2) == ["covered", "text"]


class _Clip:
    """Deterministic stand-in: image embedding = mean-pixel bucket
    one-hot; text embedding = keyword one-hot."""

    def __call__(self, images):
        out = []
        for im in images:
            v = np.zeros(2)
            v[0 if im.mean() < 128 else 1] = 1.0
            out.append(v)
        return np.stack(out)

    def encode_text(self, texts):
        out = []
        for t in texts:
            v = np.zeros(2)
            v[1 if "bright" in t else 0] = 1.0
            out.append(v)
        return np.stack(out)


def test_clip_score_filter(spark):
    dark = np.zeros((4, 4, 3), dtype=np.uint8)
    bright = np.full((4, 4, 3), 255, dtype=np.uint8)
    rows = [
        ("s1", "image", bytearray(encode_ppm(dark)), None, "dark_img"),
        ("s1", "image", bytearray(encode_ppm(bright)), None, "bright_img"),
        ("s1", "text", None, "a bright photo", "t1"),
        # s2 has an image but NO text -> image dropped
        ("s2", "image", bytearray(encode_ppm(dark)), None, "no_text_img"),
        ("s2", "metadata", None, None, "meta2"),
    ]
    df = spark.createDataFrame(
        rows,
        "sample_id string, modality string, image binary, "
        "text_content string, tag string",
    )
    # non-colocated input: the explicit repartition path
    kept = sorted(
        r["tag"]
        for r in IL.clip_score_filter(
            df, _Clip(), min_score=0.5, colocated=False
        ).collect()
    )
    # bright image matches "a bright photo" (score 1); dark scores 0
    assert kept == ["bright_img", "meta2", "t1"]
    # colocated layout (the WebDataset one-shard-per-task shape): same
    # result with zero shuffle of the image bytes
    kept2 = sorted(
        r["tag"]
        for r in IL.clip_score_filter(
            df.coalesce(1), _Clip(), min_score=0.5
        ).collect()
    )
    assert kept2 == kept

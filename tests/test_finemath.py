"""FineMathClassifier — reference stages/math/classifiers/finemath.py
(CenterCropText -> tokenize -> regression head; float = clip(logits,0,5),
int = np.round HALF-EVEN). Cases ported from the reference's own
tests/stages/math_stages/classifiers/test_finemath_classifier.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nemo_curator_spark.operators.classifiers import (
    FineMathClassifier,
    center_crop_text,
    regex_tokenizer,
)
from nemo_curator_spark.operators.mini_transformer import (
    MiniTransformer,
    MiniTransformerRegressor,
    train_head_regression,
)


def _mid_slice(s: str, n: int) -> str:
    """Reference CenterCropTextStage._mid_slice (finemath.py:56-60)."""
    m = len(s) // 2
    b, e = max(0, m - n), min(m + n, len(s))
    return s[b:e]


# --- center crop -------------------------------------------------------------


def _crop_via_spark(spark, texts, n):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return [
        r["c"]
        for r in df.select(center_crop_text(F.col("text"), n).alias("c")).collect()
    ]


def test_center_crop_matches_reference(spark):
    # the reference test's exact cases + a unicode case (char semantics)
    cases = [
        ("Hello World", 100),
        ("0123456789" * 10, 10),
        ("", 10),
        ("0123456789ABCDEFGHIJ", 5),
        ("short", 5),
        ("Short text", 100),
        ("Another short text", 100),
        ("ααββγγδδεεζζηηθθ", 3),
    ]
    for text, n in cases:
        [got] = _crop_via_spark(spark, [text], n)
        assert got == _mid_slice(text, n), (text, n)
    # the reference pins s[40:60] == "0123456789" * 2 midsection
    [got] = _crop_via_spark(spark, ["0123456789" * 10], 10)
    assert len(got) == 20 and got == ("0123456789" * 10)[40:60]
    [got] = _crop_via_spark(spark, ["0123456789ABCDEFGHIJ"], 5)
    assert got == "56789ABCDE"


def test_center_crop_zero_passthrough(spark):
    # center_crop_chars <= 0 is the stage's pass-through branch
    [got] = _crop_via_spark(spark, ["Any text here"], 0)
    assert got == "Any text here"


# --- score semantics ---------------------------------------------------------


class _FixedScores:
    """score_batch stub returning one fixed logit per row (the reference
    mocks the model tensor the same way)."""

    def __init__(self, values):
        self.values = list(values)

    def score_batch(self, token_ids):
        assert len(token_ids) == len(self.values)
        return list(self.values)


def test_clip_and_banker_round(spark):
    # reference test_process_model_output + test_score_clamping_edge_cases:
    # logits [1.2, 3.8, 5.5, -0.5, 2.0, 10.0, 0.0, 5.0, 2.5, 4.9, 5.1]
    logits = [1.2, 3.8, 5.5, -0.5, 2.0, 10.0, 0.0, 5.0, 2.5, 4.9, 5.1]
    expected_float = np.clip(logits, 0.0, 5.0)
    expected_int = np.round(expected_float).astype(int)  # HALF-EVEN: 2.5 -> 2
    assert expected_int[8] == 2  # banker's rounding pin
    df = spark.createDataFrame(
        [(i, "x y z") for i in range(len(logits))], ["i", "text"]
    )
    clf = FineMathClassifier(model=_FixedScores(logits), center_crop_chars=None)
    rows = clf.apply(df.coalesce(1)).orderBy("i").collect()
    assert [r["finemath_scores"] for r in rows] == pytest.approx(
        list(expected_float)
    )
    assert [r["finemath_int_scores"] for r in rows] == list(expected_int)


def test_field_contract():
    # reference test_post_init_creates_stages / default field contract
    clf = FineMathClassifier()
    assert clf.model_name == "HuggingFaceTB/finemath-classifier"
    assert clf.float_score_column == "finemath_scores"
    assert clf.int_score_column == "finemath_int_scores"
    assert clf.text_field == "text"
    assert clf.max_seq_length == 512
    assert clf.model_inference_batch_size == 1024
    assert clf.center_crop_chars == 10_000
    custom = FineMathClassifier(
        text_field="content", float_score_column="f", int_score_column="i"
    )
    assert (custom.text_field, custom.float_score_column) == ("content", "f")


# --- real local inference path ----------------------------------------------


def test_minitransformer_regressor_end_to_end(spark, tmp_path):
    import pandas as pd

    texts = [f"alpha beta {i} gamma delta" * (1 + i % 3) for i in range(12)]
    ids = regex_tokenizer(pd.Series(texts), 64).tolist()
    model = MiniTransformer.init(vocab_size=128, dim=16, seed=7)
    targets = [float(i % 6) for i in range(12)]
    train_head_regression(model, list(zip(ids, targets)))
    path = str(tmp_path / "finemath_mini.json")
    model.save(path)

    df = spark.createDataFrame(list(zip(range(12), texts)), ["i", "text"])
    clf = FineMathClassifier(
        model=MiniTransformerRegressor(path), max_seq_length=64
    )
    rows = clf.apply(df).orderBy("i").collect()
    # driver-side replay of the full path (clip + banker round)
    expect_raw = (
        MiniTransformer.load(path).pooled(ids) @ model.p["reg_w"]
        + model.p["reg_b"]
    )
    expect_f = np.clip(expect_raw, 0.0, 5.0)
    got_f = np.array([r["finemath_scores"] for r in rows])
    # spark-worker vs driver can differ by ~1 ulp (kernel selection);
    # never assert bit equality across that boundary (CLAUDE.md)
    np.testing.assert_allclose(got_f, expect_f, rtol=1e-12, atol=1e-12)
    assert all(0.0 <= r["finemath_scores"] <= 5.0 for r in rows)
    # two Spark passes ARE bit-identical (batching-invariant B=1 forward)
    rows2 = clf.apply(df).orderBy("i").collect()
    assert [r["finemath_scores"] for r in rows2] == [
        r["finemath_scores"] for r in rows
    ]
    # regression head is non-degenerate: spans more than one int bucket
    assert len({r["finemath_int_scores"] for r in rows}) > 1


def test_regression_head_fits_targets():
    # ridge fit on the frozen body should track distinct targets closely
    import pandas as pd

    texts = [f"tok{i} tok{i + 1} tok{i * 2}" for i in range(20)]
    ids = regex_tokenizer(pd.Series(texts), 32).tolist()
    model = MiniTransformer.init(vocab_size=64, dim=16, seed=3)
    targets = [float(i % 5) for i in range(20)]
    train_head_regression(model, list(zip(ids, targets)))
    pred = model.pooled(ids) @ model.p["reg_w"] + model.p["reg_b"]
    # 16-dim features over 20 samples: fit is near-interpolating
    assert float(np.abs(pred - np.array(targets)).mean()) < 1.0

"""MiniFastText: the deterministic fastText-architecture model driving the
real FastTextLangId / FastTextQualityFilter code paths (artifact on disk →
lazy per-worker load → batched predict), SURVEY §7.1 M4."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nemo_curator_spark.operators import fasttext_mini as FT
from nemo_curator_spark.operators.langid import FastTextLangId

LANG_SAMPLES = [
    ("the quick brown fox jumps over the lazy dog", "en"),
    ("we went to the market and bought some bread", "en"),
    ("this is a perfectly ordinary english sentence", "en"),
    ("der schnelle braune fuchs springt ueber den faulen hund", "de"),
    ("wir gingen zum markt und kauften etwas brot", "de"),
    ("das ist ein ganz gewoehnlicher deutscher satz", "de"),
    ("le renard brun rapide saute par dessus le chien", "fr"),
    ("nous sommes alles au marche et avons achete du pain", "fr"),
    ("ceci est une phrase francaise tout a fait ordinaire", "fr"),
] * 4

HELD_OUT = [
    ("the dog and the fox are friends", "en"),
    ("der hund und der fuchs sind freunde", "de"),
    ("le chien et le renard sont amis", "fr"),
]


@pytest.fixture(scope="module")
def langid_model():
    return FT.train(LANG_SAMPLES, dim=8, epochs=60, seed=42)


def test_training_deterministic(tmp_path):
    a = FT.train(LANG_SAMPLES, dim=8, epochs=10, seed=42)
    b = FT.train(LANG_SAMPLES, dim=8, epochs=10, seed=42)
    assert np.array_equal(a.input_matrix, b.input_matrix)
    assert np.array_equal(a.output_matrix, b.output_matrix)
    pa, pb = tmp_path / "a.minift.json", tmp_path / "b.minift.json"
    a.save(str(pa))
    b.save(str(pb))
    assert pa.read_bytes() == pb.read_bytes()


def test_predict_api_shapes(langid_model):
    # single string: fasttext returns (tuple_of_labels, ndarray)
    labels, scores = langid_model.predict("the dog and the fox", k=2)
    assert isinstance(labels, tuple) and len(labels) == 2
    assert labels[0].startswith("__label__")
    assert scores.shape == (2,) and scores[0] >= scores[1]
    # batch: list of label-lists + list of arrays (langid.score_batch
    # indexes labels[0][0] / scores[0][0])
    labels, scores = langid_model.predict(["a b", "c d"], k=1)
    assert len(labels) == 2 and len(scores) == 2


def test_held_out_accuracy(langid_model):
    for text, lang in HELD_OUT:
        labels, scores = langid_model.predict([text], k=1)
        assert labels[0][0] == f"__label__{lang}", text
        assert scores[0][0] > 0.5


def test_langid_real_code_path_via_artifact(spark, tmp_path, langid_model):
    """FastTextLangId with model_path only: each worker lazily loads the
    artifact (fasttext absent -> MiniFastText.load fallback) and predicts."""
    path = str(tmp_path / "langid.minift.json")
    langid_model.save(path)
    scorer = FastTextLangId(model_path=path, min_langid_score=0.3, lang="en")
    rows = [(i, t) for i, (t, _) in enumerate(HELD_OUT)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        df.withColumn("pred", scorer.udf()(F.col("text")))
        .select("doc_id", "pred.lang", "pred.score")
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(out["lang"]) == ["en", "de", "fr"]
    assert (out["score"] > 0.5).all()
    mask = scorer.keep_mask(out["score"], out["lang"])
    assert list(mask) == [True, False, False]


def test_quality_filter_pareto_keep(langid_model):
    samples = [
        ("a well written informative paragraph with substance", "hq"),
        ("another thoughtful and clear piece of writing", "hq"),
        ("good structured prose with real sentences here", "hq"),
        ("buy now click here spam spam free offer", "lq"),
        ("zzzz qqqq kkkk wwww garbage garbage garbage", "lq"),
        ("click click buy buy free free now now", "lq"),
    ] * 5
    model = FT.train(samples, dim=8, epochs=60, seed=7)
    qf = FT.FastTextQualityFilter(model)
    texts = [
        "a thoughtful well written paragraph with substance here",
        "spam spam click buy now free offer click",
    ]
    scores = qf.score_batch(texts)
    assert scores[0] > 0.9 and scores[1] < 0.1
    # keep rule: high score keeps under almost every pareto draw; repeated
    # calls are deterministic
    keep1 = qf.keep_batch(texts, ["url1", "url2"])
    keep2 = qf.keep_batch(texts, ["url1", "url2"])
    assert np.array_equal(keep1, keep2)
    assert keep1[0]  # score ~1 -> pareto > ~0 almost surely

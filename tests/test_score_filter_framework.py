"""Score/Filter/ScoreFilter framework semantics, incl. chains and invert
(reference test style: tests/stages/text/modules/test_filters.py)."""

from __future__ import annotations

from nemo_curator_spark.operators.score_filter import (
    Filter,
    Pipeline,
    Score,
    ScoreFilter,
)


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_score_then_filter(spark):
    df = _df(spark, ["w " * 60, "short", "x " * 70])
    out = Pipeline(
        [
            Score("word_count", score_field="wc"),
            Filter("word_count", filter_field="wc"),
        ]
    ).run(df)
    assert out.count() == 2
    assert "wc" in out.columns


def test_score_filter_chain(spark):
    # chain of two rules in ONE stage; row must pass both
    texts = [
        "the and " + "word " * 60,          # passes both
        "the and of to",                     # fails word_count
        ("x " * 60).strip(),                 # fails common_english_words
    ]
    out = ScoreFilter(["word_count", "common_english_words"]).apply(
        _df(spark, texts)
    )
    assert out.count() == 1


def test_score_filter_invert(spark):
    texts = ["w " * 60, "short"]
    out = ScoreFilter("word_count", invert=True).apply(_df(spark, texts))
    got = [r["text"] for r in out.collect()]
    assert got == ["short"]


def test_score_filter_persists_scores_per_rule(spark):
    out = ScoreFilter(
        ["word_count", "alpha_numeric"],
        score_field=["wc", "an"],
    ).apply(_df(spark, ["the and " + "word " * 60]))
    row = out.collect()[0]
    assert row["wc"] == 62.0
    assert 0.0 <= row["an"] <= 0.25


# --- named classifier family (reference classifiers/domain.py etc.) ------------


class _MockModel:
    def predict_batch(self, tokens):
        return ["News" if len(t) > 3 else "Games" for t in tokens]

    def prob_batch(self, tokens):
        return [0.9 if len(t) > 3 else 0.6 for t in tokens]


def test_named_classifiers_config_surface(spark):
    from nemo_curator_spark.operators import classifiers as CL

    df = spark.createDataFrame(
        [
            (1, "a long news article with many words present here"),
            (2, "hi"),
        ],
        "doc_id long, text string",
    )
    clf = CL.domain_classifier(model=_MockModel(), score_field="domain_prob")
    out = clf.apply(df).orderBy("doc_id").collect()
    assert clf.model_name == "nvidia/domain-classifier"
    assert [r["domain_pred"] for r in out] == ["News", "Games"]
    assert out[0]["domain_prob"] == 0.9

    # filter_by post-filter (reference base.py categorical contract)
    kept = CL.quality_classifier(
        model=_MockModel(), filter_by=["News"]
    ).apply(df).collect()
    assert len(kept) == 1 and kept[0]["quality_pred"] == "News"
    assert CL.quality_classifier().max_chars == 6000

    # max_chars truncation reaches the model (token ids per word)
    class LenModel:
        def predict_batch(self, tokens):
            return [str(len(t)) for t in tokens]

    long_df = spark.createDataFrame(
        [(1, "ab " * 2500)], "doc_id long, text string"
    )
    out = CL.CategoricalClassifier(model=LenModel(), max_chars=100).apply(long_df)
    # 100 chars of "ab " -> 34 words, not 2500
    assert out.collect()[0]["pred"] == "34"


def test_prompt_task_complexity_classifier_contract(spark):
    from nemo_curator_spark.operators import classifiers as CL
    import pytest as _pytest

    clf = CL.prompt_task_complexity_classifier(model=_MockModel())
    assert clf.model_name == "nvidia/prompt-task-and-complexity-classifier"
    assert clf.label_field == "task_type_1"
    assert clf.score_field == "prompt_complexity_score"
    # reference prompt_task_complexity.py:324-326: filter_by unsupported
    with _pytest.raises(NotImplementedError, match="filter_by not supported"):
        CL.prompt_task_complexity_classifier(filter_by=["News"])

    df = spark.createDataFrame(
        [(1, "a long news article with many words present here")],
        "doc_id long, text string",
    )
    row = clf.apply(df).collect()[0]
    assert row["task_type_1"] == "News"
    assert row["prompt_complexity_score"] == 0.9

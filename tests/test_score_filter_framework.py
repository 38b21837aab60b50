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

"""Translation output formatting / FAITH merge / quality metrics —
reference translation stages + utils/metadata.py."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from nemo_curator_spark.operators import translation_output as TO


def test_build_translation_metadata():
    # utils/metadata.py:23-43 — exact JSON layout
    m = json.loads(TO.build_translation_metadata("de", "hallo"))
    assert m == {
        "target_lang": "de",
        "translation": {"content": "hallo"},
        "segmented_translation": [],
    }
    m2 = json.loads(
        TO.build_translation_metadata(
            "fr", None, {"a": "x"}, {"s": ["y"]}
        )
    )
    assert m2["translation"] == {"a": "x"}
    assert m2["segmented_translation"] == {"s": ["y"]}


def test_merge_faith_scores_into_metadata():
    out = json.loads(
        TO.merge_faith_scores_into_metadata(
            '{"target_lang": "de"}', {"average": 4.5}
        )
    )
    assert out["faith_scores"] == {"average": 4.5}
    # unparseable metadata -> fresh object (metadata.py:51-54)
    out2 = json.loads(
        TO.merge_faith_scores_into_metadata("not json", {"average": 1.0})
    )
    assert out2 == {"faith_scores": {"average": 1.0}}


def test_reconstruct_messages():
    msgs = [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
    ]
    # separator-joined text splits across messages
    out = TO.reconstruct_messages_with_translation(
        msgs, "salut\n---\nbonjour"
    )
    assert [m["content"] for m in out] == ["salut", "bonjour"]
    assert msgs[0]["content"] == "hi"  # deep copy, original untouched
    # no separator -> only the first message replaced
    out2 = TO.reconstruct_messages_with_translation(msgs, "tout")
    assert [m["content"] for m in out2] == ["tout", "hello"]
    # structured JSON replaces wholesale
    structured = json.dumps([{"role": "user", "content": "x"}])
    out3 = TO.reconstruct_messages_with_translation(msgs, structured)
    assert out3 == [{"role": "user", "content": "x"}]
    assert TO.reconstruct_messages_with_translation([], "x") == []
    # nested path only set when the full path exists
    nested = [{"meta": {"content": "a"}}, {"other": 1}]
    out4 = TO.reconstruct_messages_with_translation(
        nested, "b\n---\nc", field_path="meta.content"
    )
    assert out4[0]["meta"]["content"] == "b"
    assert out4[1] == {"other": 1}  # path missing -> untouched


def test_format_stage_modes():
    df = pd.DataFrame(
        {
            "translated_text": ["hallo"],
            "_translation_map": ['{"k": "v"}'],
            "_segmented_translation_map": [None],
        }
    )
    # both: metadata + translated field, helper columns dropped
    both = TO.FormatTranslationOutputStage(
        target_lang="de", output_mode="both"
    ).process(df)
    assert "translation_metadata" in both.columns
    assert "translated_text" in both.columns
    assert "_translation_map" not in both.columns
    meta = json.loads(both["translation_metadata"].iloc[0])
    assert meta["translation"] == {"k": "v"}
    # raw drops the translated field
    raw = TO.FormatTranslationOutputStage(
        target_lang="de", output_mode="raw"
    ).process(df)
    assert "translated_text" not in raw.columns
    # replaced emits no metadata
    rep = TO.FormatTranslationOutputStage(
        target_lang="de", output_mode="replaced"
    ).process(df)
    assert "translation_metadata" not in rep.columns
    with pytest.raises(ValueError, match="non-empty 'target_lang'"):
        TO.FormatTranslationOutputStage(target_lang="  ")


def test_format_stage_messages_reconstruction():
    df = pd.DataFrame(
        {
            "translated_text": ["a\n---\nb"],
            "messages": [
                json.dumps(
                    [
                        {"role": "u", "content": "1"},
                        {"role": "a", "content": "2"},
                    ]
                )
            ],
        }
    )
    out = TO.FormatTranslationOutputStage(
        target_lang="de", reconstruct_messages=True
    ).process(df)
    got = json.loads(out["translated_messages"].iloc[0])
    assert [m["content"] for m in got] == ["a", "b"]
    # unparseable messages -> "[]"
    bad = TO.FormatTranslationOutputStage(
        target_lang="de", reconstruct_messages=True
    ).process(pd.DataFrame({"translated_text": ["x"], "messages": ["{oops"]}))
    assert bad["translated_messages"].iloc[0] == "[]"


def test_merge_faith_scores_stage():
    df = pd.DataFrame(
        {
            "translation_metadata": ['{"target_lang": "de"}'],
            "faith_avg": [4.2],
            "faith_fluency": [5.0],
            "faith_handling_of_format": [3.0],
        }
    )
    out = TO.merge_faith_scores(df)
    scores = json.loads(out["translation_metadata"].iloc[0])["faith_scores"]
    # exact key mapping (merge_faith_scores.py:92-99)
    assert scores == {
        "average": 4.2, "Fluency": 5.0, "Handling_of_Format": 3.0
    }
    # no faith columns -> unchanged
    plain = pd.DataFrame({"translation_metadata": ["{}"]})
    assert TO.merge_faith_scores(plain).equals(plain)


def test_chrf_score_properties():
    assert TO.chrf_score("the cat sat", "the cat sat") == pytest.approx(100.0)
    assert TO.chrf_score("zzzz", "aaaa") == 0.0
    assert TO.chrf_score("", "") == 100.0
    assert TO.chrf_score("", "abc") == 0.0
    close = TO.chrf_score("the cat sat down", "the cat sat")
    far = TO.chrf_score("a dog ran", "the cat sat")
    assert 0 < far < close < 100
    # whitespace removed before n-grams (sacrebleu default)
    assert TO.chrf_score("ab cd", "abcd") == pytest.approx(100.0)


def test_compute_metric_directions():
    s, p = TO.compute_text_quality_metric("same text", "same text", "chrf", 90.0)
    assert p and s == pytest.approx(100.0)
    # TER passes when score <= threshold (text_quality.py:49-51)
    s, p = TO.compute_text_quality_metric(
        "h", "r", "ter", 0.5, metric_fn=lambda h, r: 0.3
    )
    assert p and s == 0.3
    s, p = TO.compute_text_quality_metric(
        "h", "r", "sacrebleu", 50.0, metric_fn=lambda h, r: 42.0
    )
    assert not p
    with pytest.raises(NotImplementedError, match="sacrebleu"):
        TO.compute_text_quality_metric("h", "r", "sacrebleu", 50.0)
    with pytest.raises(ValueError, match="Unsupported"):
        TO.compute_text_quality_metric(
            "h", "r", "rouge", 1.0, metric_fn=lambda h, r: 1.0
        )


def test_quality_stage_and_spark(spark):
    df = pd.DataFrame(
        {
            "text": ["the cat sat on the mat", "completely different"],
            "backtranslated_text": [
                "the cat sat on the mat", "zzz qqq www",
            ],
        }
    )
    st = TO.TextQualityMetricStage(
        metrics=[{"type": "chrf", "threshold": 60.0}], filter_enabled=True
    )
    out = st.process(df)
    assert len(out) == 1 and out["score_chrf"].iloc[0] == pytest.approx(100.0)
    # empty metrics -> all pass
    st0 = TO.TextQualityMetricStage(metrics=[])
    assert TO.TextQualityMetricStage(metrics=[]).process(df)[
        st0.pass_column
    ].all()

    sdf = spark.createDataFrame(df)
    got = (
        TO.text_quality_metrics(
            sdf, metrics=[{"type": "chrf", "threshold": 60.0}]
        )
        .orderBy("text")
        .collect()
    )
    by_text = {r["text"]: r for r in got}
    assert by_text["the cat sat on the mat"]["is_quality_metric_passed"]
    assert not by_text["completely different"]["is_quality_metric_passed"]


def test_raw_mode_reconstruct_quirk_reference_parity():
    # the reference drops the translated field BEFORE reconstruction in
    # 'raw' mode (format_translation_output.py:73-78) -> empty contents;
    # pinned bug-for-bug ('both' is the mode that reconstructs)
    df = pd.DataFrame(
        {
            "translated_text": ["a\n---\nb"],
            "messages": [json.dumps([{"content": "1"}, {"content": "2"}])],
        }
    )
    out = TO.FormatTranslationOutputStage(
        target_lang="de", output_mode="raw", reconstruct_messages=True
    ).process(df)
    got = json.loads(out["translated_messages"].iloc[0])
    assert [m["content"] for m in got] == ["", "2"]
    both = TO.FormatTranslationOutputStage(
        target_lang="de", output_mode="both", reconstruct_messages=True
    ).process(df)
    got2 = json.loads(both["translated_messages"].iloc[0])
    assert [m["content"] for m in got2] == ["a", "b"]

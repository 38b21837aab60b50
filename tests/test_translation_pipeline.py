"""Translation composite pipeline — reference
experimental/translation/pipeline.py:46-252 + reassembly.py:346-402."""

from __future__ import annotations

import json

import pytest

from nemo_curator_spark.pipeline.translation_pipeline import (
    TranslationPipeline,
    aggregate_faith_py,
    average_faith_scores_py,
)


class EchoClient:
    """Translate calls echo the segment uppercased inside 〘〙; FAITH calls
    (detected by the scoring prompt) return fixed parseable scores, with
    one poison marker producing unparseable output."""

    def query_model(self, *, model, messages, generation_config=None):
        user = messages[1]["content"]
        if "Translated text" in user:  # FAITH scoring call
            if "POISON" in user:
                return ["not json"]
            return [
                '{"Fluency": 4, "Accuracy": 3, "Idiomaticity": 0, '
                '"Terminology": 3, "Handling_of_Format": 2}'
            ]
        src = user.rsplit("\n", 1)[-1]
        core = src.split(": ", 1)[-1] if ": " in src else src
        return [f"〘{core.upper()}〙"]


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "hello world\nsecond line", None),
            (1, "already done", "pre-existing translation"),
            (2, "one liner", ""),
        ],
        "doc_id bigint, text string, translated_text string",
    )


def test_validation_contract():
    with pytest.raises(ValueError, match="source_lang"):
        TranslationPipeline(source_lang="  ", target_lang="es", client=object(), model_name="m")
    with pytest.raises(ValueError, match="output_mode"):
        TranslationPipeline(
            source_lang="en", target_lang="es", client=object(), model_name="m",
            output_mode="weird",
        )
    with pytest.raises(ValueError, match="non-None 'client'"):
        TranslationPipeline(source_lang="en", target_lang="es", model_name="m")
    with pytest.raises(ValueError, match="non-empty 'model_name'"):
        TranslationPipeline(source_lang="en", target_lang="es", client=object())
    with pytest.raises(ValueError, match="merge_scores"):
        TranslationPipeline(
            source_lang="en", target_lang="es", client=object(), model_name="m",
            merge_scores=True, output_mode="replaced",
        )
    with pytest.raises(ValueError, match="separate"):
        TranslationPipeline(
            source_lang="en", target_lang="es", backend_type="nmt",
            enable_faith_eval=True,
        )
    # model name strip semantics
    p = TranslationPipeline(
        source_lang=" en ", target_lang=" es ", client=object(), model_name=" m "
    )
    assert (p.source_lang, p.target_lang, p.model_name) == ("en", "es", "m")


def test_end_to_end_coarse(spark):
    pipe = TranslationPipeline(
        source_lang="en", target_lang="es", client=EchoClient(), model_name="m",
        output_mode="raw",
    )
    out = {r.doc_id: r for r in pipe.run(_docs(spark)).collect()}
    assert out[0].translated_text == "HELLO WORLD\nSECOND LINE"
    assert out[2].translated_text == "ONE LINER"
    assert out[0].translation_errors == ""
    assert out[0].translation_time >= 0.0
    # raw mode leaves the source field untouched
    assert out[0].text == "hello world\nsecond line"


def test_replaced_mode_overwrites_source(spark):
    pipe = TranslationPipeline(
        source_lang="en", target_lang="es", client=EchoClient(), model_name="m",
    )
    out = {r.doc_id: r for r in pipe.run(_docs(spark)).collect()}
    assert out[2].text == "ONE LINER"


def test_skip_translated_roundtrip(spark):
    pipe = TranslationPipeline(
        source_lang="en", target_lang="es", client=EchoClient(), model_name="m",
        skip_translated=True, output_mode="raw",
    )
    out = {r.doc_id: r for r in pipe.run(_docs(spark)).collect()}
    assert sorted(out) == [0, 1, 2]
    # skipped row keeps its pre-existing translation and gets defaults
    assert out[1].translated_text == "pre-existing translation"
    assert out[1].translation_time == 0.0
    assert out[1].translation_errors == ""
    # blank-translation row was re-translated
    assert out[2].translated_text == "ONE LINER"


def test_faith_aggregation(spark):
    pipe = TranslationPipeline(
        source_lang="en", target_lang="es", client=EchoClient(), model_name="m",
        enable_faith_eval=True, filter_enabled=False, output_mode="raw",
    )
    out = {r.doc_id: r for r in pipe.run(_docs(spark)).collect()}
    r0 = out[0]
    # every segment scores (4,3,0,3,2) -> averages equal the constants
    assert r0.faith_fluency == 4.0
    assert r0.faith_accuracy == 3.0
    assert r0.faith_idiomaticity == 0.0  # zero dims excluded from avgs
    assert r0.faith_handling_of_format == 2.0
    assert r0.faith_avg == pytest.approx((4 + 3 + 3 + 2) / 4)
    assert r0.faith_parse_failed is False
    segs = json.loads(r0.faith_segment_scores)
    assert len(segs) == 2  # two lines -> two segments
    assert segs[0]["Fluency"] == 4.0
    # python pin agrees
    pin = aggregate_faith_py(
        [
            {"Fluency": 4.0, "Accuracy": 3.0, "Idiomaticity": 0.0,
             "Terminology": 3.0, "Handling_of_Format": 2.0}
        ] * 2,
        [False, False],
    )
    assert pin["faith_avg"] == pytest.approx(r0.faith_avg)
    assert pin["faith_fluency"] == r0.faith_fluency


def test_faith_threshold_filter(spark):
    pipe = TranslationPipeline(
        source_lang="en", target_lang="es", client=EchoClient(), model_name="m",
        enable_faith_eval=True, faith_threshold=3.5, output_mode="raw",
    )
    out = pipe.run(_docs(spark)).collect()
    # every doc scores avg 3.0 < 3.5 and parses fine -> all filtered
    assert out == []


def test_average_faith_scores_py_rounding():
    # 1/3 mean rounds to 2 places; zero-dim exclusion; empty list
    avg = average_faith_scores_py(
        [{"Fluency": 1.0}, {"Fluency": 0.0}, {"Fluency": 0.0}]
    )
    assert avg["Fluency"] == 1.0  # only the non-zero segment counts
    assert avg["Accuracy"] == 0.0
    assert average_faith_scores_py([])["Fluency"] == 0.0
    avg2 = average_faith_scores_py([{"Accuracy": 2.0}, {"Accuracy": 3.0}])
    assert avg2["Accuracy"] == 2.5


def test_backend_mode(spark):
    from nemo_curator_spark.operators.translation_backends import TranslationBackend

    class UpperBackend(TranslationBackend):
        def setup(self):
            pass

        def check_server(self):
            return True

        def translate_batch(self, texts, source_lang, target_lang):
            return [t.upper() for t in texts]

    pipe = TranslationPipeline(
        source_lang="en", target_lang="es", backend_type="nmt",
        backend=UpperBackend(), output_mode="raw",
    )
    out = {r.doc_id: r for r in pipe.run(_docs(spark)).collect()}
    assert out[2].translated_text == "ONE LINER"

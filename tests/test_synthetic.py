"""Nemotron-CC synthetic stages: prompt/message assembly and the two
deterministic post-processors, with fixtures ported from the reference's
own tests (tests/stages/synthetic/nemotron_cc/test_nemotron_cc.py)."""

from __future__ import annotations

import random

import pandas as pd

from nemo_curator_spark.operators import synthetic as S


class _PinnedRng:
    """shuffle=no-op, randint=pinned — mirrors the reference tests'
    patch of random.shuffle/random.randint."""

    def __init__(self, n):
        self.n = n

    def shuffle(self, _):
        pass

    def randint(self, a, b):
        return min(max(self.n, a), b)


def _qa_response(prefix: str) -> str:
    # reference _build_diverseqa_response fixture
    return "\n".join(
        [
            prefix,
            "- Question: Q1?",
            "- Answer: A1.",
            "- Question: Q2?",
            "- Answer: A2.",
            "- Question: Q3?",
            "- Answer: A3.",
        ]
    )


def test_stage_names_match_reference():
    assert S.wikipedia_paraphrasing_stage().name == "WikipediaParaphrasing"
    assert S.diverse_qa_stage().name == "DiverseQA"
    assert S.distill_stage().name == "Distill"
    assert S.extract_knowledge_stage().name == "ExtractKnowledge"
    assert S.knowledge_list_stage().name == "KnowledgeList"


def test_output_fields_match_reference():
    assert S.wikipedia_paraphrasing_stage().output_field == "rephrased"
    assert S.diverse_qa_stage().output_field == "diverse_qa"
    assert S.distill_stage().output_field == "distill"
    assert S.extract_knowledge_stage().output_field == "extract_knowledge"
    assert S.knowledge_list_stage().output_field == "knowledge_list"


def test_message_assembly_and_system_prompts():
    # distill uses the reasoning system prompt; others the chat one
    msgs = S.build_messages(S.DISTILL_TEMPLATE, "doc", S.DISTILL_SYSTEM_PROMPT)
    assert msgs[0]["role"] == "system"
    assert msgs[0]["content"] == S.DISTILL_SYSTEM_PROMPT
    assert "doc" in msgs[1]["content"]
    assert S.distill_stage().system_prompt == S.DISTILL_SYSTEM_PROMPT
    assert S.diverse_qa_stage().system_prompt == S.SYSTEM_PROMPT
    # no system prompt -> single user message
    assert len(S.build_messages("X {document}", "d", None)) == 1


def test_prompt_templates_embed_document():
    for t in (
        S.WIKIPEDIA_REPHRASING_TEMPLATE,
        S.DIVERSE_QA_TEMPLATE,
        S.DISTILL_TEMPLATE,
        S.EXTRACT_KNOWLEDGE_TEMPLATE,
        S.KNOWLEDGE_LIST_TEMPLATE,
    ):
        assert "{document}" in t
        assert "UNIQUE-DOC-MARKER" in t.format(document="UNIQUE-DOC-MARKER")


def test_diverseqa_postprocess_reference_fixture():
    # reference test_diverseqa_post_processing_basic: no shuffle, pick 2
    out = S.diverse_qa_postprocess(
        "DOC", _qa_response(S.QA_PREFIX), rng=_PinnedRng(2)
    )
    assert out == (
        "DOC\n\nQuestion: Q1?\nAnswer: A1.\n\nQuestion: Q2?\nAnswer: A2."
    )


def test_diverseqa_postprocess_edge_cases():
    # empty generation -> ""
    assert S.diverse_qa_postprocess("DOC", "", rng=_PinnedRng(1)) == ""
    # continuation line before any question voids the response
    assert (
        S.diverse_qa_postprocess("DOC", "Answer: orphan", rng=_PinnedRng(1))
        == ""
    )
    # token-scaled cap: cap = randint(1, max(1, int(10 * 150 / 150)))
    out = S.diverse_qa_postprocess(
        "DOC",
        _qa_response(S.QA_PREFIX),
        token_count=150,
        rng=_PinnedRng(10),
    )
    assert out.count("Question:") == 3  # all three pairs survive the cap


def test_knowledge_list_postprocess_reference_fixture():
    # reference test_knowledge_list_process_llm_response
    generated = "Header line\n- item one\n  continuation\n- item two"
    assert (
        S.knowledge_list_postprocess(generated)
        == "item one\ncontinuation\nitem two"
    )
    # leading bullet line is kept (no header skip when it starts with '-')
    assert S.knowledge_list_postprocess("- a\n- b") == "a\nb"


def test_spark_stage_with_injected_client(spark):
    df = spark.createDataFrame(
        [(1, "first doc"), (2, "second doc")], "doc_id long, text string"
    )
    stage = S.wikipedia_paraphrasing_stage(
        client_factory=lambda: S.EchoClient("para")
    )
    out = {r["doc_id"]: r["rephrased"] for r in stage.apply(df).collect()}
    assert out[1].startswith("[para] ") and "first doc" in out[1]
    assert out[2].startswith("[para] ") and "second doc" in out[2]


def test_spark_stage_without_client_raises(spark):
    df = spark.createDataFrame([(1, "d")], "doc_id long, text string")
    try:
        S.distill_stage().apply(df)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "client" in str(e)


def test_spark_qa_roundtrip_deterministic(spark):
    raw = _qa_response(S.QA_PREFIX)

    class QaClient:
        def generate_batch(self, batches):
            return [raw] * len(batches)

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
    )
    stage = S.diverse_qa_stage(client_factory=QaClient)
    gen = stage.apply(df)
    out1 = (
        S.diverse_qa_postprocess_df(gen, id_field="doc_id")
        .orderBy("doc_id")
        .toPandas()
    )
    # different partitioning -> byte-identical sampling (seeded per id)
    out2 = (
        S.diverse_qa_postprocess_df(gen.repartition(7), id_field="doc_id")
        .orderBy("doc_id")
        .toPandas()
    )
    assert out1["diverse_qa"].tolist() == out2["diverse_qa"].tolist()
    assert all(
        v.startswith(f"doc {i}\n\nQuestion:")
        for i, v in zip(out1["doc_id"], out1["diverse_qa"])
    )


def test_spark_knowledge_list_postprocess(spark):
    df = spark.createDataFrame(
        [(1, "Header line\n- item one\n  continuation\n- item two")],
        "doc_id long, knowledge_list string",
    )
    out = S.knowledge_list_postprocess_df(df).collect()[0]["knowledge_list"]
    assert out == "item one\ncontinuation\nitem two"


def test_strip_bold_markers():
    assert S.strip_bold_markers("**bold** text*") == "bold text"
    assert S.strip_bold_markers("plain") == "plain"
    assert S.strip_bold_markers("") == ""


def test_qa_multilingual_source_stage(spark):
    class LangEcho:
        def generate_batch(self, batches):
            return ["**" + b[0]["content"] + "**" for b in batches]

    out1 = S.qa_multilingual_synthetic(
        spark,
        prompt="Write a QA pair in {language}.",
        languages=["en", "de", "ja"],
        client_factory=LangEcho,
        num_samples=12,
        seed=7,
    ).orderBy("id").toPandas()
    assert len(out1) == 12
    # bold markers stripped, prompt formatted with a language
    assert all(t.startswith("Write a QA pair in ") for t in out1["text"])
    assert not any("*" in t for t in out1["text"])
    # seeded per-id draw -> identical rows under different partitioning
    out2 = S.qa_multilingual_synthetic(
        spark,
        prompt="Write a QA pair in {language}.",
        languages=["en", "de", "ja"],
        client_factory=LangEcho,
        num_samples=12,
        seed=7,
    ).repartition(5).orderBy("id").toPandas()
    assert out1["text"].tolist() == out2["text"].tolist()
    # all three languages appear across 12 seeded draws
    assert len({t.rsplit(" ", 1)[-1] for t in out1["text"]}) == 3

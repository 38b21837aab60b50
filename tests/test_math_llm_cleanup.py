"""Tests for the math LLM-cleanup deterministic halves and the lynx
extractor contract (math_llm_cleanup.py).

Reference pins: llm_cleanup.py:135-152 chunk pre-filter, :154-188
Qwen3 prompt handling + format_map, :192-199 output routing;
lynx.py:21-68 CLI contract; text/models/utils.py:27-28 name format.
"""

from __future__ import annotations

import subprocess

import pandas as pd
import pytest

from nemo_curator_spark.operators.math_llm_cleanup import (
    LYNX_ARGS,
    LynxExtractor,
    build_cleanup_prompt,
    filter_and_sort_chunked,
    format_name_with_suffix,
    is_qwen3_family,
    is_qwen3_only,
    llm_cleanup,
)


def test_format_name_with_suffix():
    assert (
        format_name_with_suffix("microsoft/phi-4", "_llm_cleanup")
        == "phi_4_llm_cleanup"
    )
    assert format_name_with_suffix("Org/My-Model") == "my_model_classifier"


def test_qwen3_detection():
    assert is_qwen3_family("Qwen/Qwen3-8B")
    assert is_qwen3_family("qwen3-0.5b")
    assert not is_qwen3_family("microsoft/phi-4")
    # Qwen3 (not 3.5) gets /no_think
    assert is_qwen3_only("Qwen/Qwen3-8B")
    assert not is_qwen3_only("Qwen/Qwen3.5-14B")
    assert not is_qwen3_only("phi-4")


def test_filter_and_sort_chunked():
    pdf = pd.DataFrame(
        {
            "id": ["a", "b", "c", "d"],
            "n_tokens": [900, 100, 500, 800],  # threshold = 0.8*1000 = 800
        }
    )
    out = filter_and_sort_chunked(pdf, "n_tokens", 1000)
    # >= threshold dropped (900, 800), remainder ascending by tokens
    assert out["id"].tolist() == ["b", "c"]
    assert "n_tokens" not in out.columns
    empty = filter_and_sort_chunked(
        pd.DataFrame({"id": ["a"], "n_tokens": [5000]}), "n_tokens", 1000
    )
    assert empty.empty and "n_tokens" not in empty.columns


def test_build_cleanup_prompt():
    # format_map with defaultdict: stray placeholders become ""
    p = build_cleanup_prompt(
        "body", "Clean: {text} meta={missing}", "phi-4"
    )
    assert p == "Clean: body meta="
    # Qwen3-only → /no_think appended to the user prompt
    p2 = build_cleanup_prompt("body", "Clean: {text}", "Qwen/Qwen3-8B")
    assert p2.endswith(" /no_think")
    # Qwen3.5 → no inline switch
    p3 = build_cleanup_prompt("body", "Clean: {text}", "Qwen/Qwen3.5-4B")
    assert "/no_think" not in p3
    # NaN text → empty string
    assert build_cleanup_prompt(float("nan"), "X{text}Y", "m") == "XY"

    # chat template receives [system, user] and the thinking flag
    seen = {}

    def tmpl(messages, enable_thinking=None):
        seen["messages"] = messages
        seen["thinking"] = enable_thinking
        return f"<tmpl>{messages[1]['content']}"

    p4 = build_cleanup_prompt(
        "t", "U:{text}", "Qwen/Qwen3-8B", apply_chat_template=tmpl
    )
    assert p4 == "<tmpl>U:t /no_think"
    assert seen["messages"][0] == {"role": "system", "content": " /no_think"}
    assert seen["thinking"] is False

    # template failure falls back to the raw user prompt
    def broken(messages, enable_thinking=None):
        raise ValueError("no template")

    assert (
        build_cleanup_prompt("t", "U:{text}", "m", apply_chat_template=broken)
        == "U:t"
    )


class EchoModel:
    def generate(self, prompts):
        return [f"CLEAN[{p}]" for p in prompts]


def test_llm_cleanup_spark(spark):
    df = spark.createDataFrame(
        [("a", "doc one", 100), ("b", "doc two", 900), ("c", "doc three", 200)],
        "id string, text string, n_tokens long",
    ).coalesce(1)
    out = llm_cleanup(
        df, EchoModel(), "phi-4", "Clean: {text}", max_model_len=1000
    ).collect()
    # b dropped (900 >= 800); order ascending by tokens within the batch
    assert [r["id"] for r in out] == ["a", "c"]
    assert out[0]["cleaned_text"] == "CLEAN[Clean: doc one]"
    assert "n_tokens" not in out[0].asDict()


def test_llm_cleanup_classification_mode(spark):
    df = spark.createDataFrame(
        [("a", "doc")], "id string, text string"
    )
    out = llm_cleanup(
        df, EchoModel(), "m", "{text}", classification=True
    ).collect()
    row = out[0].asDict()
    assert row["label"] == "CLEAN[doc]"
    assert "text" not in row  # classification drops the text column


def test_llm_cleanup_chunked_requires_max_len(spark):
    df = spark.createDataFrame([("a", "t", 10)], "id string, text string, n_tokens long")
    with pytest.raises(ValueError, match="max_model_len must be set"):
        llm_cleanup(df, EchoModel(), "m", "{text}")


# --- lynx ------------------------------------------------------------------


def test_lynx_args_contract():
    assert LYNX_ARGS == [
        "lynx", "-dump", "-stdin", "-nolist", "-width=10000",
        "-assume_charset=utf-8", "-display_charset=utf-8",
        "-localhost", "-force_html",
    ]


def test_lynx_extractor_injected_runner():
    calls = []

    def run(args, stdin, timeout):
        calls.append((args, stdin, timeout))
        return 0, b"Extracted text\n"

    x = LynxExtractor(timeout_sec=7, run_fn=run)
    assert x.extract_text("<p>hi</p>") == "Extracted text\n"
    assert calls[0][0] == LYNX_ARGS
    assert calls[0][1] == b"<p>hi</p>" and calls[0][2] == 7
    # empty html short-circuits without running
    assert x.extract_text("") == "" and len(calls) == 1


def test_lynx_extractor_failures():
    assert LynxExtractor(run_fn=lambda *a: (1, b"err")).extract_text("<p>x</p>") == ""

    def timeout_run(args, stdin, t):
        raise subprocess.TimeoutExpired(args, t)

    assert LynxExtractor(run_fn=timeout_run).extract_text("<p>x</p>") == ""
    # undecodable stdout → errors=replace fallback (non-empty result)
    bad = LynxExtractor(run_fn=lambda *a: (0, b"ok \xff\xfe end"))
    out = bad.extract_text("<p>x</p>")
    assert "ok" in out and "end" in out


def test_lynx_extractor_missing_binary(monkeypatch):
    import nemo_curator_spark.operators.math_llm_cleanup as m

    monkeypatch.setattr(m.shutil, "which", lambda _: None)
    with pytest.raises(RuntimeError, match="lynx executable not found"):
        LynxExtractor()

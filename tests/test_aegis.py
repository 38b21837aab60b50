"""AEGIS deterministic halves — reference aegis_utils.py:15-178 +
aegis.py:225-360. The reference's aegis_utils module is dependency-free,
so the prompt/labels pins load it directly from the read-only snapshot
(skipped if absent) — byte-level parity, not a re-typed golden."""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

from nemo_curator_spark.operators import aegis as A

_REF = "/root/reference/nemo_curator/stages/text/classifiers/aegis_utils.py"


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_aegis_utils", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference snapshot absent")
def test_prompt_bytes_match_reference():
    ref = _load_ref()
    assert A.AEGIS_LABELS == ref.AEGIS_LABELS
    assert A.UNSAFE_CATEGORIES == ref.unsafe_categories
    for msg in ["", "hello", "line1\nline2", "x" * 50]:
        assert A.format_aegis_py(msg) == ref.format_aegis(msg)


@pytest.mark.parametrize(
    ("raw", "label"),
    [
        ("safe", "safe"),
        (" safe ", "safe"),
        ("safe\nextra stuff", "safe"),
        ("unsafe\nO1", "O1"),
        ("unsafe\n O13 ", "O13"),
        ("unsafe\nO10", "O10"),
        ("unsafe", "unknown"),          # no category line
        ("unsafe\nBAD", "unknown"),     # invalid category
        ("unsafe\nsafe", "unknown"),    # 'safe' is not a category label
        ("unsafe\nunknown", "unknown"),
        ("something else", "unknown"),
        ("", "unknown"),
        ("unsafe\nO1,O2", "unknown"),   # reference rejects comma lists too
        ("unsafe\nO1\ntrailing", "O1"),
        (" safe ", "safe"),   # NBSP strip (python str.strip set)
    ],
)
def test_parse_py(raw, label):
    assert A.parse_aegis_response_py(raw) == label


def test_parse_spark_matches_py(spark):
    raws = [
        "safe",
        " safe ",
        "safe\nextra",
        "unsafe\nO1",
        "unsafe\n O13 ",
        "unsafe",
        "unsafe\nBAD",
        "unsafe\nsafe",
        "nonsense",
        "",
        " safe ",
        "unsafe\nO1,O2",
    ]
    df = spark.createDataFrame([(i, r) for i, r in enumerate(raws)], "i int, raw string")
    got = {
        r.i: r.label
        for r in df.withColumn("label", A.parse_aegis_response_col(F.col("raw"))).collect()
    }
    for i, raw in enumerate(raws):
        assert got[i] == A.parse_aegis_response_py(raw), raw


def test_format_prompts_spark(spark):
    df = spark.createDataFrame([(1, "abcdef"), (2, "x" * 100)], "doc_id int, text string")
    out = {r.doc_id: r for r in A.format_aegis_prompts(df, max_chars=10).collect()}
    assert out[1]._curator_hidden_text == A.format_aegis_py("abcdef")
    assert out[2]._curator_hidden_text == A.format_aegis_py("x" * 10)


def test_postprocess_strips_prompt_echo(spark):
    df = spark.createDataFrame(
        [(1, "the doc")], "doc_id int, text string"
    )
    prompted = A.format_aegis_prompts(df)
    # Simulate a decode that echoes the prompt then generates a verdict.
    responded = prompted.withColumn(
        "_aegis_raw_pred",
        F.concat(F.col(A.HIDDEN_TEXT_FIELD), F.lit("unsafe\nO9")),
    )
    out = A.postprocess_aegis_responses(responded)
    row = out.collect()[0]
    assert row.aegis_pred == "O9"
    assert "_aegis_raw_pred" not in out.columns
    assert A.HIDDEN_TEXT_FIELD not in out.columns


def test_postprocess_keep_fields(spark):
    df = spark.createDataFrame([(1, "d")], "doc_id int, text string")
    prompted = A.format_aegis_prompts(df)
    responded = prompted.withColumn(
        "_aegis_raw_pred", F.concat(F.col(A.HIDDEN_TEXT_FIELD), F.lit("safe"))
    )
    out = A.postprocess_aegis_responses(
        responded, keep_raw_output=True, keep_prompt_field=True
    )
    row = out.collect()[0]
    assert row.aegis_pred == "safe"
    assert row._aegis_raw_pred == "safe"  # prompt echo stripped
    assert row._curator_hidden_text == A.format_aegis_py("d")

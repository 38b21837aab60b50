"""Spark expressions == pure-Python oracle, for every rule over the golden
corpus; and DuckDB SQL forms == Spark, over the same corpus (the same
comparison the driver's correctness gate performs).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nemo_curator_spark import pyref
from nemo_curator_spark.functions import heuristics as H
from nemo_curator_spark.pipeline import chain


def _spark_scores(spark, texts: list[str]) -> pd.DataFrame:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return (
        chain.add_scores(df, "text")
        .orderBy("doc_id")
        .toPandas()
    )


def test_spark_scores_match_pyref(spark, golden_texts):
    got = _spark_scores(spark, golden_texts)
    for rule in H.RULES:
        col = chain.SCORE_PREFIX + rule.name
        for i, text in enumerate(golden_texts):
            expected = float(rule.py_score(text))
            actual = got[col][i]
            assert math.isclose(actual, expected, rel_tol=1e-12, abs_tol=1e-12), (
                f"rule={rule.name} row={i!r} text={text[:60]!r}: "
                f"spark={actual} pyref={expected}"
            )


def test_py_batch_equals_column_forms(spark, golden_texts):
    """The pandas-UDF fast path must be bit-identical to the Column forms."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(golden_texts)], "doc_id long, text string"
    )
    fast = chain.add_scores(df, "text", py_batch=True).orderBy("doc_id").toPandas()
    slow = chain.add_scores(df, "text", py_batch=False).orderBy("doc_id").toPandas()
    for col in fast.columns:
        if col.startswith(chain.SCORE_PREFIX):
            assert (fast[col] == slow[col]).all(), col


def test_spark_keep_labels_match_pyref(spark, golden_texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(golden_texts)], "doc_id long, text string"
    )
    got = chain.add_labels(df, "text").orderBy("doc_id").toPandas()
    for i, text in enumerate(golden_texts):
        keep, reason = pyref.label_document(text)
        assert bool(got["keep"][i]) == keep, f"row {i}: {text[:60]!r}"
        assert got["drop_reason"][i] == (reason if reason else None), (
            f"row {i}: {text[:60]!r} got={got['drop_reason'][i]} want={reason}"
        )


def test_duckdb_oracle_matches_pyref(golden_texts):
    """The DuckDB SQL forms (used in oracle_sql()) equal the python oracle."""
    con = duckdb.connect()
    con.register(
        "docs",
        pd.DataFrame({"doc_id": range(len(golden_texts)), "text": golden_texts}),
    )
    native = chain.chain_rule_names(include_ngrams=False)
    exprs = ",\n".join(
        f"CAST({chain.duck_score_sql(n, 'text')} AS DOUBLE) AS s_{i}"
        for i, n in enumerate(native)
    )
    rows = con.execute(
        f"SELECT doc_id, {exprs} FROM docs ORDER BY doc_id"
    ).fetchall()
    for row in rows:
        i = row[0]
        text = golden_texts[i]
        for j, name in enumerate(native):
            expected = float(H.RULES_BY_NAME[name].py_score(text))
            actual = row[1 + j]
            assert math.isclose(actual, expected, rel_tol=1e-12, abs_tol=1e-12), (
                f"rule={name} row={i} text={text[:60]!r}: "
                f"duckdb={actual} pyref={expected}"
            )


def test_duck_labels_sql_runs_and_matches(golden_texts):
    con = duckdb.connect()
    con.register(
        "docs",
        pd.DataFrame({"doc_id": range(len(golden_texts)), "text": golden_texts}),
    )
    sql = chain.duck_labels_sql("docs", "text")
    out = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    native = chain.chain_rule_names(include_ngrams=False)
    for i, text in enumerate(golden_texts):
        keep = all(
            H.RULES_BY_NAME[n].keep is not None
            and _py_keep(n, float(H.RULES_BY_NAME[n].py_score(text)))
            for n in native
        )
        assert bool(out["keep"][i]) == keep, f"row {i}: {text[:60]!r}"


def _py_keep(name: str, score: float) -> bool:
    spec = {s.name: s for s in pyref.english_chain()}[name]
    return spec.keep(score)


def test_quality_from_batch_equals_column_form(spark, golden_texts):
    from nemo_curator_spark.functions import heuristics as HH
    from nemo_curator_spark.operators import quality

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(golden_texts)], "doc_id long, text string"
    )
    both = (
        df.withColumn("_wl", HH.word_line_batch(F.col("text")))
        .select(
            "doc_id",
            quality.lexical_quality_score(F.col("text")).alias("q_col"),
            quality.lexical_quality_from_batch(F.col("_wl")).alias("q_batch"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert (both["q_col"] == both["q_batch"]).all()


def test_langid_with_batch_equals_standalone(spark, golden_texts):
    from nemo_curator_spark.functions import heuristics as HH
    from nemo_curator_spark.operators import langid as L

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(golden_texts)], "doc_id long, text string"
    )
    a = (
        L.add_langid(df, "text")
        .select("doc_id", "lang_pred", "lang_score")
        .orderBy("doc_id")
        .toPandas()
    )
    b = (
        L.add_langid(
            df.withColumn("_wl", HH.word_line_batch(F.col("text"))),
            "text",
            wl_col="_wl",
        )
        .select("doc_id", "lang_pred", "lang_score")
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(a["lang_pred"]) == list(b["lang_pred"])
    assert (a["lang_score"] == b["lang_score"]).all()


def test_langid_regex_stop_hits_equals_hof(spark, golden_texts):
    """The round-8 single-scan regex stop-hit counter must equal the
    per-word HOF form on adversarial inputs (prefix-overlapping stopwords,
    unicode whitespace, case-folding edge chars)."""
    from nemo_curator_spark import constants as CC
    from nemo_curator_spark.operators import langid as L

    nasty = [
        "",
        "   ",
        "a ao a o ao",                        # pt prefix overlaps
        "THE The the tHe",
        "ao a o\te",                # unicode spaces as separators
        "não NÃO à À",    # pt accents upper/lower
        "the.and and, the xthe thex",         # punctuation-attached (no hit)
        "İt K the",                 # dotted-I / Kelvin casefolds
        "o" * 500 + " o",
        "para\x0bparapara",                   # \x0b separator
        "that is in it was for with and the o a e",
    ]
    texts = list(golden_texts) + nasty
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    text = F.col("text")
    stripped = F.regexp_replace(text, CC.STRIP_PATTERN, "")
    words = F.when(
        stripped == "", F.array().cast("array<string>")
    ).otherwise(F.split(stripped, CC.SPLIT_PATTERN))
    out = df.select(
        "doc_id",
        L._stop_hits(words, L.EN_STOPWORDS).alias("en_hof"),
        L._stop_hits_text(text, L.EN_STOPWORDS).alias("en_rx"),
        L._stop_hits(words, L.PT_STOPWORDS).alias("pt_hof"),
        L._stop_hits_text(text, L.PT_STOPWORDS).alias("pt_rx"),
    ).toPandas()
    assert (out["en_hof"] == out["en_rx"]).all(), out[out.en_hof != out.en_rx]
    assert (out["pt_hof"] == out["pt_rx"]).all(), out[out.pt_hof != out.pt_rx]

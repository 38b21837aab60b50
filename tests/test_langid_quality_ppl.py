"""LangID (native + fastText-semantics), deterministic Pareto quality
filter (Spark↔DuckDB parity), and n-gram perplexity (FIXTURES.md F4/F6)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nemo_curator_spark import synth
from nemo_curator_spark.operators import langid, perplexity, quality


# --- native langid ---------------------------------------------------------------


def test_langid_struct_on_synthetic(spark):
    df = synth.generate_web_pages(300, seed=3)[["url", "text", "lang"]]
    sdf = spark.createDataFrame(df)
    out = (
        sdf.withColumn("pred", langid.langid_struct(F.col("text")))
        .select("url", "lang", "pred.lang", "pred.score")
        .toPandas()
    )
    out.columns = ["url", "lang", "pred_lang", "score"]
    # non-latin scripts must be exact; en/pt measured on clean rows
    strict = out[out["lang"].isin(["zh", "ja", "th"])]
    assert (strict["pred_lang"] == strict["lang"]).all()
    latin = out[out["lang"].isin(["en", "pt"])]
    acc = (latin["pred_lang"] == latin["lang"]).mean()
    assert acc > 0.9, acc


def test_langid_duckdb_parity(spark):
    df = synth.generate_web_pages(200, seed=5)[["url", "text"]]
    sdf = spark.createDataFrame(df)
    got = (
        sdf.withColumn("pred", langid.langid_struct(F.col("text")))
        .select("url", F.col("pred.lang").alias("lang"), F.col("pred.score").alias("score"))
        .orderBy("url")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("docs", df)
    lang_sql, score_sql = langid.duck_langid_sql("text")
    want = con.execute(
        f"SELECT url, {lang_sql} AS lang, CAST({score_sql} AS DOUBLE) AS score "
        f"FROM docs ORDER BY url"
    ).df()
    assert list(got["lang"]) == list(want["lang"])
    assert np.allclose(got["score"], want["score"], rtol=0, atol=0)


def test_histogram_score(spark):
    texts = [
        "This is a perfectly fine English document.",
        "另一方面这是一个好的中文文档",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    en = [r[0] for r in df.orderBy("i").select(langid.histogram_score(F.col("text"), "en")).collect()]
    zh = [r[0] for r in df.orderBy("i").select(langid.histogram_score(F.col("text"), "zh")).collect()]
    assert en == [1.0, 0.0]
    assert zh == [0.0, 1.0]


# --- fastText-semantics tier (mocked model, reference test style) -----------------


class MockModel:
    """Fixed score table, fastText predict() shape."""

    TABLE = {
        "a": (0.5, "__label__EN"),
        "b": (0.7, "__label__HI"),
        "c": (0.2, "__label__PT"),
        "d": (0.5, "__label__eng_Latn"),
    }

    def predict(self, texts, k=1):
        s, lab = self.TABLE[texts[0]]
        return [[lab]], [[s]]


def test_fasttext_langid_semantics(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["a", "b", "c", "d"])], "i long, text string"
    )
    ft = langid.FastTextLangId(model=MockModel(), min_langid_score=0.3)
    out = (
        df.withColumn("r", ft.udf()(F.col("text")))
        .select("i", "r.score", "r.lang")
        .orderBy("i")
        .toPandas()
    )
    assert list(out["lang"]) == ["EN", "HI", "PT", "eng_Latn"]
    # threshold only
    mask = ft.keep_mask(out["score"], out["lang"])
    assert list(mask) == [True, True, False, True]
    # lang-only filter, case-insensitive: "EN" matches "en"; "eng_Latn"
    # splits to "eng" which does NOT match "en" (reference semantics)
    ft_en = langid.FastTextLangId(model=MockModel(), lang="en")
    mask = ft_en.keep_mask(out["score"], out["lang"])
    assert list(mask) == [True, False, False, False]
    # lang-only "eng" matches any script of eng
    ft_eng = langid.FastTextLangId(model=MockModel(), lang="eng")
    mask = ft_eng.keep_mask(out["score"], out["lang"])
    assert list(mask) == [False, False, False, True]
    # lang_script filter requires exact match
    ft_es = langid.FastTextLangId(model=MockModel(), lang="eng_latn")
    mask = ft_es.keep_mask(out["score"], out["lang"])
    assert list(mask) == [False, False, False, True]


# --- deterministic Pareto quality keep --------------------------------------------


def test_pareto_keep_distribution(spark):
    n = 4000
    df = spark.createDataFrame([(f"url{i}", 0.5) for i in range(n)], "url string, score double")
    kept = df.where(quality.pareto_keep(F.col("score"), F.col("url"))).count()
    # P(pareto(3) > 0.5) = (1.5)^-3 ≈ 0.2963
    expected = (1.5) ** -3
    assert abs(kept / n - expected) < 0.03


def test_pareto_keep_duckdb_parity(spark):
    rows = [(f"u{i}", i / 100.0) for i in range(100)]
    df = spark.createDataFrame(rows, "url string, score double")
    got = (
        df.select("url", quality.pareto_keep(F.col("score"), F.col("url")).cast("int").alias("keep"))
        .orderBy("url")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["url", "score"]))
    want = con.execute(
        f"SELECT url, CAST({quality.duck_pareto_keep_sql('score', 'url')} AS INT) AS keep "
        f"FROM t ORDER BY url"
    ).df()
    assert list(got["keep"]) == list(want["keep"])


def test_lexical_quality_ordering(spark):
    clean = synth._clean_doc(np.random.RandomState(1), 80)
    junk = "zxqv " * 100
    df = spark.createDataFrame([(0, clean), (1, junk)], "i long, text string")
    out = (
        df.select("i", quality.lexical_quality_score(F.col("text")).alias("q"))
        .orderBy("i")
        .collect()
    )
    assert out[0]["q"] > out[1]["q"]


# --- perplexity --------------------------------------------------------------------


def test_ngram_lm_basic():
    train = ["the cat sat on the mat", "the dog sat on the rug"] * 5
    lm = perplexity.NGramLM.train(train)
    ppl_in = lm.perplexity("the cat sat on the mat")
    ppl_out = lm.perplexity("colorless green ideas sleep furiously")
    assert ppl_in < ppl_out
    # deterministic + serialization round-trip (F6 tolerance)
    lm2 = perplexity.NGramLM.from_json(lm.to_json())
    assert math.isclose(lm2.perplexity("the cat sat"), lm.perplexity("the cat sat"), rel_tol=1e-12)


def test_perplexity_spark_bucketed(spark):
    pdf = synth.generate_web_pages(300, seed=9)[["url", "text", "lang"]]
    df = spark.createDataFrame(pdf)
    models = perplexity.train_per_language(df, max_docs_per_lang=200)
    assert "en" in models
    out = perplexity.score_perplexity(df, models, num_partitions=8)
    got = out.select("url", "lang", "ppl").toPandas()
    en = got[got["lang"] == "en"]["ppl"]
    assert (en > 1).all() and en.notna().all()
    # in-domain english scores lower than random tokens
    lm = models["en"]
    assert lm.perplexity(pdf[pdf.lang == "en"].iloc[0]["text"]) < lm.perplexity(
        "qq zz vv kk jj ww xx yy"
    )


# --- artifact-backed HistogramFilter (M2M-100 format) -------------------------


def test_histogram_artifact_three_way(spark):
    """Exact reference formula (histogram.py:106-116) pinned 3-way:
    python / Spark translate-form / DuckDB oracle, on texts where the
    score actually varies (the driver corpus is ascii-only -> constant)."""
    import duckdb
    from pyspark.sql import functions as F

    from nemo_curator_spark.operators import langid as L

    texts = [
        "plain english text with spaces and punctuation.",
        "Zwölf Boxkämpfer jagen Viktor über den Deich",  # umlauts not in en hist
        "的一是不了人我在有他 this is mixed 的一是不了",
        "的一是不了人我在有他这为之大来以个中上们到说",
        "   leading and trailing   ",
        "",
        "№§µ¶†‡ unusual €£¥ symbols ©®™",
    ]
    hist_en = L.load_histogram("en")
    hist_zh = L.load_histogram("zh")
    expected_en = [L.histogram_score_py(t, hist_en) for t in texts]
    expected_zh = [L.histogram_score_py(t, hist_zh) for t in texts]
    assert len(set(expected_en)) > 1  # discriminative on this corpus
    assert len(set(expected_zh)) > 1

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = (
        df.select(
            "doc_id",
            L.histogram_artifact_score(F.col("text"), "en").alias("en"),
            L.histogram_artifact_score(F.col("text"), "zh").alias("zh"),
        )
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(got["en"]) == expected_en
    assert list(got["zh"]) == expected_zh

    con = duckdb.connect()
    con.register("docs", df.toPandas())
    duck = con.execute(
        f"SELECT doc_id, {L.duck_histogram_artifact_sql('text', 'en')} AS en, "
        f"{L.duck_histogram_artifact_sql('text', 'zh')} AS zh "
        "FROM docs ORDER BY doc_id"
    ).df()
    assert list(duck["en"]) == expected_en
    assert list(duck["zh"]) == expected_zh


def test_histogram_artifact_format_roundtrip(tmp_path):
    """Reader stops at the ']' threshold char (M2M file format)."""
    import os

    from nemo_curator_spark.operators import langid as L

    p = tmp_path / "xx"
    p.write_text("a\nb\nc\n]\nd\ne\n")
    old = L.HISTOGRAM_DIR
    L.HISTOGRAM_DIR = str(tmp_path)
    try:
        assert L.load_histogram("xx") == {"a", "b", "c"}
    finally:
        L.HISTOGRAM_DIR = old

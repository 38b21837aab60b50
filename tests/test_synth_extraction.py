"""Synthetic web_pages generator determinism + byte-identical extraction
(the north rule's per-row invariant: extracted text == source text per url)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nemo_curator_spark import synth
from nemo_curator_spark.operators import extraction


def test_generator_deterministic():
    a = synth.generate_web_pages(50, seed=42)
    b = synth.generate_web_pages(50, seed=42)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert a["url"].is_unique


def test_generator_strata():
    df = synth.generate_web_pages(400, seed=42)
    assert set(df["lang"]) >= {"en", "zh", "ja", "th", "pt"}
    # host skew present: top host owns many rows
    hosts = df["url"].str.extract(r"https://(host\d+)\.")[0]
    assert hosts.value_counts().iloc[0] > 50


def test_extraction_byte_identical_python():
    df = synth.generate_web_pages(300, seed=7)
    for _, row in df.iterrows():
        got = extraction.extract_text_bytes(row["html"])
        assert got == row["text"], row["url"]


def test_extraction_byte_identical_spark(spark, tmp_path):
    path = str(tmp_path / "web_pages.parquet")
    synth.write_web_pages_parquet(path, 200, seed=11)
    df = spark.read.parquet(path)
    out = df.withColumn("extracted", extraction.extract_text(F.col("html")))
    bad = out.where(~F.col("extracted").eqNullSafe(F.col("text"))).count()
    assert bad == 0


def test_decode_fallbacks():
    # latin-1 declared via meta charset
    pt = "O rio corre devagar à noite"
    raw = synth._render_html(pt, "t", "latin-1")
    assert extraction.extract_text_bytes(raw) == pt
    # shift-jis
    ja = "私は日本語のテキストを分割します"
    raw = synth._render_html(ja, "t", "shift-jis")
    assert extraction.extract_text_bytes(raw) == ja
    # undeclared charset -> detection fallback
    raw_no_meta = raw.replace(b'<meta charset="shift-jis">', b"")
    got = extraction.extract_text_bytes(raw_no_meta)
    assert got == ja

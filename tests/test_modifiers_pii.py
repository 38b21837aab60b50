"""Modifier goldens (fixtures modeled on the reference's
tests/stages/text/modules/test_modifiers.py) + PII scrub fixtures
(FIXTURES.md F5), including Spark↔DuckDB parity for the scrubber."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from nemo_curator_spark.operators import modifiers as M
from nemo_curator_spark.operators import pii


def _apply(spark, fn, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    return [
        r["out"]
        for r in df.select(fn(F.col("text")).alias("out"))
        .orderBy("i")
        .collect()
    ]


def test_remove_urls(spark):
    texts = [
        "This is a url: www.nvidia.com",
        "This is a url: http://www.nvidia.com",
        "This is a url: https://www.nvidia.com",
        "and this is a second one: https://developer.nvidia.com ok",
        "no urls here",
    ]
    out = _apply(spark, M.remove_urls, texts)
    assert out == [
        "This is a url: ",
        "This is a url: ",
        "This is a url: ",
        "and this is a second one:  ok",
        "no urls here",
    ]


def test_normalize_newlines(spark):
    texts = ["a\n\n\nb", "a\n\nb", "a\r\n\r\n\r\nb", "a\n\n\n\n\nb"]
    out = _apply(spark, M.normalize_newlines, texts)
    assert out == ["a\n\nb", "a\n\nb", "a\r\n\r\nb", "a\n\nb"]


def test_remove_lines(spark):
    texts = ["keep\ndrop me\nkeep too", "all good"]
    out = _apply(spark, lambda c: M.remove_lines(c, ["drop me"]), texts)
    assert out == ["keep\nkeep too", "all good"]


def test_quotation_remover(spark):
    texts = [
        '"wrapped"',
        "not wrapped",
        '"multi\nline"',
        '"first line ends with quote"\nsecond',
        '""',
    ]
    out = _apply(spark, M.remove_wrapping_quotes, texts)
    assert out[0] == "wrapped"
    assert out[1] == "not wrapped"
    assert out[2] == "multi\nline"  # first line doesn't end with a quote
    assert out[3] == '"first line ends with quote"\nsecond'
    assert out[4] == '""'  # too short


def test_markdown_remover(spark):
    texts = ["**bold**", "*italic*", "_under_", "[text](http://u)", "plain"]
    out = _apply(spark, M.remove_markdown, texts)
    assert out == ["bold", "italic", "under", "http://u", "plain"]


def test_slicer_ints(spark):
    out = _apply(spark, lambda c: M.slicer(c, 2, 5, strip=False), ["0123456789"])
    assert out == ["234"]


def test_slicer_strings(spark):
    texts = ["prefix START middle END suffix"]
    out = _apply(
        spark,
        lambda c: M.slicer(c, "START", "END", include_left=False, include_right=False),
        texts,
    )
    assert out == ["middle"]
    out2 = _apply(spark, lambda c: M.slicer(c, "MISSING", None), texts)
    assert out2 == [""]


def test_boilerplate_modifier(spark):
    doc_top = "terms of use\n\nreal content here\n\nmore content"
    doc_mid = "content\n\nprivacy policy\n\nmore content\n\nprivacy policy\n\nx"
    doc_lorem = "lorem ipsum dolor\n\nstuff"
    out = _apply(spark, M.remove_boilerplate, [doc_top, doc_mid, doc_lorem])
    assert out[0] == "real content here\n\nmore content"
    assert out[1] == doc_mid  # scattered -> untouched when top_or_bottom mode
    assert out[2] == ""


def test_fasttext_label(spark):
    out = _apply(spark, lambda c: M.fasttext_label(c, "__label__hq"), ["a\nb"])
    assert out == ["__label__hq a b"]


# --- PII scrub -----------------------------------------------------------------

PII_FIXTURES = [
    (
        "contact a.b+c@example.co.uk or admin@test.org today",
        "contact <EMAIL> or <EMAIL> today",
        {"email": 2, "ipv4": 0, "ipv6": 0, "phone": 0, "slur": 0},
    ),
    (
        "call +1 (555) 123-4567 or 555-123-4567 now",
        "call <PHONE> or <PHONE> now",
        {"email": 0, "ipv4": 0, "ipv6": 0, "phone": 2, "slur": 0},
    ),
    (
        "server at 192.168.0.1 and 2001:db8:85a3:0:0:8a2e:370:7334 up",
        "server at <IP> and <IP> up",
        {"email": 0, "ipv4": 1, "ipv6": 1, "phone": 0, "slur": 0},
    ),
    (
        "you badword1 and BADWORD2!",
        "you <SLUR> and <SLUR>!",
        {"email": 0, "ipv4": 0, "ipv6": 0, "phone": 0, "slur": 2},
    ),
    ("clean text with nothing to scrub", "clean text with nothing to scrub",
     {"email": 0, "ipv4": 0, "ipv6": 0, "phone": 0, "slur": 0}),
]


def test_pii_scrub_fixtures(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(PII_FIXTURES)],
        "i long, text string",
    )
    got = pii.scrub(df, "text").orderBy("i").toPandas()
    for i, (_, want_text, want_counts) in enumerate(PII_FIXTURES):
        assert got["text_scrubbed"][i] == want_text, f"row {i}"
        for cat, n in want_counts.items():
            assert got[f"scrub_{cat}"][i] == n, f"row {i} cat {cat}"


def test_pii_scrub_duckdb_parity(spark):
    texts = [t for t, _, _ in PII_FIXTURES]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    sdf = pii.scrub(df, "text").orderBy("i").toPandas()

    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"i": range(len(texts)), "text": texts}))
    counts, scrubbed = pii.duck_scrub_sql("text")
    ddf = con.execute(
        f"SELECT i, {', '.join(counts)}, {scrubbed} AS text_scrubbed "
        f"FROM docs ORDER BY i"
    ).df()
    for col in ["text_scrubbed"] + [c.split(" AS ")[-1] for c in counts]:
        assert list(sdf[col]) == list(ddf[col]), col


def test_unicode_reformat_fallback(spark):
    # ftfy absent in this env -> ftfy_mini with NFC requested explicitly
    # (the reference class default is normalization=None,
    # unicode_reformatter.py:41 — ftfy's own default NFC is overridden)
    texts = ["cafe\u0301 time", "bad\x00ctrl\x07chars", "keep\ttabs\nand newlines"]
    out = _apply(
        spark, lambda c: M.unicode_reformat(c, normalization="NFC"), texts
    )
    assert out[0] == "caf\u00e9 time"      # NFC composed
    assert out[1] == "badctrlchars"       # control chars stripped
    assert out[2] == "keep\ttabs\nand newlines"  # \t \n preserved


def test_unicode_reformat_mojibake(spark):
    # default config: mojibake repair on, cosmetic fixers off
    texts = ["s\u00c3\u00a9rieux", "\u00c3\u00a2\u00e2\u201a\u00ac\u00e2\u201e\u00a2",
             "a\u2019b", "&amp; fine", "<b>&amp;</b>"]
    out = _apply(spark, M.unicode_reformat, texts)
    assert out[0] == "s\u00e9rieux"        # single utf-8/cp1252 mojibake
    assert out[1] == "\u2019"              # double mojibake unwinds
    assert out[2] == "a\u2019b"            # uncurl_quotes off by default
    assert out[3] == "& fine"             # unescape_html auto
    assert out[4] == "<b>&amp;</b>"       # ...but disabled on real HTML


def test_slicer_include_flags(spark):
    texts = ["prefix START middle END suffix"]
    inc = _apply(
        spark,
        lambda c: M.slicer(c, "START", "END", include_left=True, include_right=True),
        texts,
    )
    assert inc == ["START middle END"]

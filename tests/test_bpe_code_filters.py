"""MiniBPE tokenizer + TokenCount/TokenizerFertility/HTMLBoilerplate/
PerExtension filters (reference token_count.py:23-93, code.py:100-297)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nemo_curator_spark.functions import bpe
from nemo_curator_spark.operators import code_filters as CF

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs",
    "the the the quick quick brown brown fox fox",
] * 3


@pytest.fixture(scope="module")
def tokenizer():
    return bpe.MiniBPE(bpe.train_bpe(CORPUS, num_merges=64))


def test_bpe_training_deterministic():
    a = bpe.train_bpe(CORPUS, num_merges=32)
    b = bpe.train_bpe(CORPUS, num_merges=32)
    assert a == b and len(a) == 32


def test_bpe_compresses_frequent_words(tokenizer):
    # " the" is the most frequent unit -> merges to very few tokens
    n_the = len(tokenizer.encode(" the"))
    assert n_the <= 2
    # unseen bytes fall back near byte-level
    n_rare = len(tokenizer.encode(" zzqx"))
    assert n_rare >= 3


def test_bpe_artifact_roundtrip(tmp_path, tokenizer):
    p = str(tmp_path / "bpe.json")
    tokenizer.save(p)
    loaded = bpe.MiniBPE.load(p)
    for t in CORPUS + ["completely new text 123"]:
        assert loaded.encode(t) == tokenizer.encode(t)


def test_token_count_filter(tokenizer):
    f = bpe.TokenCountFilter(tokenizer, min_tokens=3, max_tokens=50)
    assert f.score_document("") == 0
    assert not f.keep_document(f.score_document(""))
    s = f.score_document("the quick brown fox")
    assert 1 <= s <= 10
    assert f.keep_document(s)


def test_tokenizer_fertility(tokenizer):
    f = bpe.TokenizerFertilityFilter(tokenizer, min_char_to_token_ratio=2.5)
    assert f.score_document("") == -1.0
    assert not f.keep_document(-1.0)
    # natural in-domain text compresses well -> high chars/token
    s = f.score_document("the quick brown fox jumps over the lazy dog")
    assert s >= 2.5 and f.keep_document(s)


def test_html_boilerplate_score():
    html = "<html><body><p>" + "real text " * 20 + "</p><script>x=1;</script></body></html>"
    s = CF.html_boilerplate_score(html)
    text_len = len("real text " * 20)
    assert s == pytest.approx(text_len / len(html))
    # short visible text -> 0
    assert CF.html_boilerplate_score("<p>tiny</p>") == 0.0
    # script/style content never counts as text
    assert CF.html_boilerplate_score("<script>" + "x" * 500 + "</script>") == 0.0


def test_per_extension_meta_and_scores(spark):
    meta = CF.load_per_extension_meta(language="python")
    params = meta[("python", "py")]
    assert params[0] is True and params[1] == 1000 and params[2] == 100
    good = "def f(x):\n    return x + 1\n"
    assert CF.per_extension_score_py(good, params) == 1.0
    # a single 2000-char line violates line_max
    assert CF.per_extension_score_py("x" * 2000, params) == 0.0
    # mostly symbols violates alphanum threshold
    assert CF.per_extension_score_py("$%^&*\n()!@#\n", params) == 0.0
    # excluded extension
    json_params = CF.load_per_extension_meta(language="json")[("json", "json")]
    assert CF.per_extension_score_py("{}", json_params) == 0.0

    # 3-way: python / Spark / DuckDB on mixed texts (note: line_mean applies
    # to long single-line texts, so keep rows under 100 chars or multiline)
    texts = [good, "x" * 2000, "$%^&*\n()!@#\n", "short line\nother line\n", ""]
    expected = [CF.per_extension_score_py(t, params) for t in texts]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = (
        df.select("doc_id", CF.per_extension_score(F.col("text"), params).alias("s"))
        .toPandas().sort_values("doc_id")
    )
    assert list(got["s"]) == expected
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    duck = con.execute(
        f"SELECT doc_id, {CF.duck_per_extension_sql('text', params)} AS s "
        "FROM docs ORDER BY doc_id"
    ).df()
    assert list(duck["s"]) == expected

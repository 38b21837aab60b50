"""Token-budget chunking + merge (reference math/modifiers/chunking.py +
merge_chunks.py semantics over MiniBPE)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nemo_curator_spark.functions import bpe
from nemo_curator_spark.operators import chunking as C


class _WordTok:
    """Deterministic stand-in tokenizer: one token per whitespace word."""

    def encode(self, text):
        return text.split()


def test_split_paragraphs_separator_handling():
    t = "a\n\n\n\nb\n\nc"
    # blank middle paragraph dropped; separator re-attached except on the
    # last RAW paragraph
    assert C.split_paragraphs(t) == ["a\n\n", "b\n\n", "c"]
    assert C.split_paragraphs("solo") == ["solo"]
    assert C.split_paragraphs("") == []
    # trailing separator: last raw paragraph is blank -> all kept paras
    # carry the separator (reference behavior)
    assert C.split_paragraphs("a\n\nb\n\n") == ["a\n\n", "b\n\n"]


def test_pack_paragraphs_greedy():
    assert C.pack_paragraphs([3, 3, 3], 6) == [0, 0, 1]
    # oversized single paragraph still becomes its own chunk
    assert C.pack_paragraphs([10, 1], 6) == [0, 1]
    assert C.pack_paragraphs([1, 10, 1], 6) == [0, 1, 2]
    assert C.pack_paragraphs([], 6) == []


def test_token_splitter_roundtrip(spark):
    rows = [
        (1, "en", "one two three\n\nfour five six\n\nseven eight"),
        (2, "de", "a b c d e f g h i j"),
        (3, "fr", ""),  # no paragraphs -> no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = C.token_splitter(
        df, _WordTok(), max_length_tokens=5, separator="\n\n"
    )
    pdf = out.toPandas().sort_values(["doc_id", "chunk_id"])
    # doc 1: paras of 3/3/2 tokens, budget 5 -> chunks [p1], [p2], [p3]?
    # greedy: 3, then 3+3>5 -> close; 3+2=5 fits -> [p1], [p2 p3]
    d1 = pdf[pdf["doc_id"] == 1]
    assert list(d1["n_tokens"]) == [3, 5]
    assert d1.iloc[1]["text"] == "four five six\n\nseven eight"
    # doc 2: single 10-token paragraph exceeds the budget but is one chunk
    d2 = pdf[pdf["doc_id"] == 2]
    assert list(d2["n_tokens"]) == [10]
    # doc 3 vanished (no non-blank paragraphs)
    assert 3 not in set(pdf["doc_id"])
    # lossless reassembly: concatenating chunks recovers the text
    joined = "".join(d1.sort_values("chunk_id")["text"])
    assert joined == rows[0][2]
    # other columns preserved on every chunk row
    assert set(d1["lang"]) == {"en"}


def test_token_splitter_with_minibpe(spark):
    texts = ["alpha beta gamma\n\ndelta epsilon", "zeta eta theta"]
    merges = bpe.train_bpe(texts, num_merges=64)
    tok = bpe.MiniBPE(merges)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = C.token_splitter(df, tok, max_length_tokens=8).toPandas()
    # n_tokens matches a direct encode of each chunk's paragraphs
    for _, r in out.iterrows():
        paras = C.split_paragraphs(r["text"])
        assert r["n_tokens"] == sum(len(tok.encode(p)) for p in paras)


def test_merge_chunks_roundtrip_and_filters(spark):
    rows = [
        # (url, chunk_id, cleaned_text, text, num_generated_tokens)
        ("u1", 0, "clean A", "raw A", 5),
        # duplicate (u1, 1) with DIFFERENT content (the LLM-retry case):
        # the survivor is the row with the smallest (xxhash64(cleaned),
        # cleaned), independent of input order and partitioning.
        ("u1", 1, "clean B", "raw B", 7),
        ("u1", 1, "dup text", "dup", 99),
        ("u1", 2, "NO USEFUL CONTENT", "raw C", 3),  # marker dropped
        ("u2", 0, "", "raw", 1),  # empty chunk dropped -> u2 vanishes
    ]
    df = spark.createDataFrame(
        rows,
        "url string, chunk_id int, cleaned_text string, text string, "
        "num_generated_tokens long",
    )
    # derive the expected survivor from the documented tie-break rule
    from pyspark.sql import functions as F

    dups = {"clean B": ("raw B", 7), "dup text": ("dup", 99)}
    hashes = dict(
        spark.createDataFrame([(t,) for t in dups], "t string")
        .select("t", F.xxhash64("t").alias("h"))
        .collect()
    )
    winner = min(dups, key=lambda t: (hashes[t], t))
    w_raw, w_tok = dups[winner]
    merged = C.merge_chunks(df).toPandas()
    assert list(merged["url"]) == ["u1"]
    r = merged.iloc[0]
    assert r["cleaned_text"] == f"clean A\n{winner}"
    assert r["text"] == f"raw A\n{w_raw}"
    assert r["num_generated_tokens"] == 5 + w_tok  # loser+marker excluded
    # max_text_length post-filter
    assert C.merge_chunks(df, max_text_length=5).count() == 0
    # determinism: reversed input order + different partitioning give the
    # byte-identical merge (the round-3 arbitrary-order window did not)
    df_rev = spark.createDataFrame(
        list(reversed(rows)),
        "url string, chunk_id int, cleaned_text string, text string, "
        "num_generated_tokens long",
    ).repartition(7)
    merged2 = C.merge_chunks(df_rev).toPandas()
    assert merged2.iloc[0]["cleaned_text"] == f"clean A\n{winner}"
    assert merged2.iloc[0]["num_generated_tokens"] == 5 + w_tok


def test_split_then_merge_recovers_document(spark):
    text = "p one has words\n\np two also has some words\n\np three short"
    df = spark.createDataFrame([("u", text)], "url string, text string")
    split = C.token_splitter(df, _WordTok(), max_length_tokens=6)
    assert split.count() > 1
    # merge with separator "" reverses the split exactly (chunks carry
    # their separators)
    merged = C.merge_chunks(
        split.withColumnRenamed("text", "cleaned_text"),
        raw_text_col=None,
        separator="",
        sum_cols=["n_tokens"],
    ).toPandas()
    assert merged.iloc[0]["cleaned_text"] == text
    assert merged.iloc[0]["n_tokens"] == len(text.split())

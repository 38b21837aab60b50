"""iterate_extract fan-out operator + gated word splitters."""

from __future__ import annotations

from nemo_curator_spark.functions.word_splitters import get_word_splitter
from nemo_curator_spark.operators import iterate_extract as ie


def _pack(records: list[str]) -> bytes:
    out = b""
    for r in records:
        b = r.encode("utf-8")
        out += len(b).to_bytes(4, "big") + b
    return out


def test_iterate_extract_fanout(spark):
    rows = [
        (1, _pack(["alpha", "beta", "gamma"])),
        (2, _pack(["delta"])),
    ]
    df = spark.createDataFrame(rows, "src_id long, payload binary")
    out = ie.iterate_extract(
        df,
        ie.length_prefixed_iterator,
        "record_id long, content string, src_id long",
        carry_cols=("src_id",),
    )
    got = {(r["src_id"], r["record_id"]): r["content"] for r in out.collect()}
    assert got == {
        (1, 0): "alpha",
        (1, 1): "beta",
        (1, 2): "gamma",
        (2, 0): "delta",
    }


def test_iterate_extract_limit_and_filter(spark):
    # reference iterator.py:117-136: record_limit counts KEPT records —
    # extractor-dropped records do not consume the limit. 'a' is filtered
    # (free), so bb/ccc/dddd are the first 3 kept and 'eeeee' is beyond.
    df = spark.createDataFrame(
        [(1, _pack(["a", "bb", "ccc", "dddd", "eeeee"]))],
        "src_id long, payload binary",
    )
    out = ie.iterate_extract(
        df,
        ie.length_prefixed_iterator,
        "record_id long, content string",
        record_limit=3,
        extractor_fn=lambda r: r if len(r["content"]) > 1 else None,
    )
    got = sorted(r["content"] for r in out.collect())
    assert got == ["bb", "ccc", "dddd"]


def test_resolve_filename_column():
    import pytest

    from nemo_curator_spark.io.columns import resolve_filename_column

    assert resolve_filename_column(True) == "file_name"
    assert resolve_filename_column(False) is None
    assert resolve_filename_column("src") == "src"
    with pytest.raises(ValueError, match="Invalid value"):
        resolve_filename_column(3)


def test_iterate_extract_filename_column(spark):
    rows = [
        (1, "/data/shard-a.warc.gz", _pack(["alpha", "beta"])),
        (2, "/data/shard-b.warc.gz", _pack(["gamma"])),
    ]
    df = spark.createDataFrame(
        rows, "src_id long, path string, payload binary"
    )
    out = ie.iterate_extract(
        df,
        ie.length_prefixed_iterator,
        "record_id long, content string, file_name string",
        add_filename_column=True,
    )
    got = {(r["file_name"], r["record_id"]) for r in out.collect()}
    assert got == {
        ("shard-a.warc.gz", 0),
        ("shard-a.warc.gz", 1),
        ("shard-b.warc.gz", 0),
    }
    # the extracted record keeps the filename even when the extractor
    # rebuilds the dict (iterator.py:132-133)
    out2 = ie.iterate_extract(
        df,
        ie.length_prefixed_iterator,
        "upper string, src string",
        add_filename_column="src",
        extractor_fn=lambda r: {"upper": r["content"].upper()},
    )
    got2 = {(r["src"], r["upper"]) for r in out2.collect()}
    assert got2 == {
        ("shard-a.warc.gz", "ALPHA"),
        ("shard-a.warc.gz", "BETA"),
        ("shard-b.warc.gz", "GAMMA"),
    }


def test_word_splitters_gated():
    en = get_word_splitter("en")
    assert en("hello big world") == ["hello", "big", "world"]
    # zh/ja fall back to char segmentation when jieba/MeCab are absent
    zh = get_word_splitter("zh")
    toks = zh("我喜欢abc中文")
    assert "abc" in toks and "我" in toks and len(toks) >= 5
    ja = get_word_splitter("ja")
    assert len(ja("猫が寝ます")) >= 4

"""Megatron .bin/.idx shard writer: byte-layout and round-trip pins
(reference io/writer/megatron_tokenizer.py:36-240)."""

from __future__ import annotations

import struct

import numpy as np

from nemo_curator_spark.functions import bpe
from nemo_curator_spark.io import megatron

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "",
    "the the the",
]


def _tok():
    return bpe.MiniBPE(bpe.train_bpe(TEXTS * 3, num_merges=32))


def test_shard_roundtrip(tmp_path):
    tok = _tok()
    prefix = str(tmp_path / "shard-0")
    stats = megatron.write_shard(TEXTS, prefix, tok, vocab_size=256 + 32)
    assert stats["num_docs"] == 4
    back = megatron.read_shard(prefix)
    assert len(back) == 4
    for text, toks in zip(TEXTS, back):
        assert toks.tolist() == tok.encode(text)
    assert stats["num_tokens"] == sum(len(t) for t in back)


def test_idx_byte_layout(tmp_path):
    tok = _tok()
    prefix = str(tmp_path / "s")
    megatron.write_shard(TEXTS, prefix, tok, vocab_size=300)
    raw = open(prefix + ".idx", "rb").read()
    # reference layout math (megatron_tokenizer.py:195-204):
    # 9 + 8 + 1 + 8 + 8 + 20 bytes per sequence + 8 (the n+1th doc index)
    n = 4
    assert len(raw) == 9 + 8 + 1 + 8 + 8 + 20 * n + 8
    assert raw[:9] == b"MMIDIDX\x00\x00"
    assert struct.unpack("<Q", raw[9:17])[0] == 1
    assert raw[17] == 8  # uint16 dtype code (vocab 300 <= 65536)
    assert struct.unpack("<Q", raw[18:26])[0] == n
    assert struct.unpack("<Q", raw[26:34])[0] == n + 1
    lengths = np.frombuffer(raw[34 : 34 + 4 * n], dtype=np.int32)
    pointers = np.frombuffer(raw[34 + 4 * n : 34 + 12 * n], dtype=np.int64)
    assert pointers[0] == 0
    assert (pointers[1:] == np.cumsum(lengths[:-1]) * 2).all()
    doc_idx = np.frombuffer(raw[34 + 12 * n :], dtype=np.int64)
    assert doc_idx.tolist() == list(range(n + 1))


def test_int32_dtype_for_large_vocab(tmp_path):
    tok = _tok()
    prefix = str(tmp_path / "big")
    megatron.write_shard(TEXTS[:1], prefix, tok, vocab_size=100_000)
    raw = open(prefix + ".idx", "rb").read()
    assert raw[17] == 4  # int32 dtype code
    back = megatron.read_shard(prefix)
    assert back[0].dtype == np.int32


def test_append_eod(tmp_path):
    tok = _tok()
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    megatron.write_shard(TEXTS[:2], p1, tok, 300, append_eod=True, eod_token_id=0)
    megatron.write_shard(TEXTS[:2], p2, tok, 300, append_eod=True, eod_token_id=None)
    with_eod = megatron.read_shard(p1)
    without = megatron.read_shard(p2)  # eod disabled when no id (reference)
    assert all(t[-1] == 0 for t in with_eod)
    assert [len(a) - 1 for a in with_eod] == [len(b) for b in without]


def test_write_megatron_spark(spark, tmp_path):
    merges = bpe.train_bpe(TEXTS * 3, num_merges=32)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 4)], "doc_id long, text string"
    ).repartition(2)
    manifest = megatron.write_megatron(
        df, str(tmp_path / "shards"), merges
    ).collect()
    assert sum(r["num_docs"] for r in manifest) == 16
    tok = bpe.MiniBPE(merges)
    total = 0
    for r in manifest:
        docs = megatron.read_shard(r["file_prefix"])
        assert len(docs) == r["num_docs"]
        total += sum(len(d) for d in docs)
    assert total == sum(len(tok.encode(t)) for t in TEXTS * 4)


def test_write_megatron_retry_is_idempotent(spark, tmp_path):
    # A task retry / speculative attempt regenerates the same
    # (partition, batch, digest) shard name; the second write must
    # succeed as a no-op with identical stats, not raise.
    merges = bpe.train_bpe(TEXTS * 3, num_merges=32)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 4)], "doc_id long, text string"
    ).repartition(2)
    out = str(tmp_path / "shards")
    first = sorted(
        (r["file_prefix"], r["num_docs"], r["num_tokens"], r["token_size"])
        for r in megatron.write_megatron(df, out, merges).collect()
    )
    import os

    mtimes = {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }
    second = sorted(
        (r["file_prefix"], r["num_docs"], r["num_tokens"], r["token_size"])
        for r in megatron.write_megatron(df, out, merges).collect()
    )
    assert first == second
    # and the existing shard bytes were not rewritten
    assert mtimes == {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }
    # no tmp droppings left behind
    assert not [f for f in os.listdir(out) if ".tmp" in f]


def test_shard_stats_from_idx_roundtrip(tmp_path):
    merges = bpe.train_bpe(TEXTS, num_merges=16)
    tok = bpe.MiniBPE(merges)
    prefix = str(tmp_path / "s")
    stats = megatron.write_shard(TEXTS, prefix, tok, vocab_size=256 + 16)
    assert megatron.shard_stats_from_idx(prefix) == stats


def test_write_megatron_different_tokenizer_writes_fresh_shards(spark, tmp_path):
    # same corpus + same dir but a DIFFERENT tokenizer must not serve the
    # old shards via the idempotent skip (the digest covers the config)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 2)], "doc_id long, text string"
    ).coalesce(1)
    out = str(tmp_path / "shards")
    m_a = bpe.train_bpe(TEXTS, num_merges=8)
    m_b = bpe.train_bpe(TEXTS, num_merges=40)
    r1 = megatron.write_megatron(df, out, m_a).collect()
    r2 = megatron.write_megatron(df, out, m_b).collect()
    assert r1[0]["file_prefix"] != r2[0]["file_prefix"]
    assert r1[0]["num_tokens"] != r2[0]["num_tokens"]

"""Resumable dedup id generation — reference
stages/deduplication/id_generator.py:26-108."""

from __future__ import annotations

import uuid

import pytest

from nemo_curator_spark.operators.id_generator import (
    CURATOR_DEDUP_ID_STR,
    IdGeneratorBase,
    assign_dedup_ids,
    register_files,
)


def test_register_contiguous_and_idempotent():
    gen = IdGeneratorBase()
    assert gen.register_batch("a.jsonl", 10) == 0
    assert gen.register_batch(["b.jsonl", "c.jsonl"], 5) == 10
    # re-registering returns the ORIGINAL range start, no new ids burned
    assert gen.register_batch("a.jsonl", 10) == 0
    assert gen.next_id == 15
    assert gen.get_batch_range("a.jsonl") == (0, 9)
    assert gen.get_batch_range(["b.jsonl", "c.jsonl"]) == (10, 14)


def test_hash_files_uuid5():
    gen = IdGeneratorBase()
    assert gen.hash_files("x") == str(uuid.uuid5(uuid.NAMESPACE_URL, "x"))
    assert gen.hash_files(["x", "y"]) == str(uuid.uuid5(uuid.NAMESPACE_URL, "x;y"))


def test_get_batch_range_validation():
    gen = IdGeneratorBase()
    gen.register_batch("a", 1)
    with pytest.raises(ValueError, match="Either files or key"):
        gen.get_batch_range(None, None)
    with pytest.raises(ValueError, match="Either files or key"):
        gen.get_batch_range("a", gen.hash_files("a"))
    assert gen.get_batch_range(None, gen.hash_files("a")) == (0, 0)


def test_disk_roundtrip(tmp_path):
    gen = IdGeneratorBase()
    gen.register_batch("a", 7)
    gen.register_batch("b", 3)
    p = str(tmp_path / "state.json")
    gen.to_disk(p)
    back = IdGeneratorBase.from_disk(p)
    assert back.next_id == 10
    assert back.register_batch("a", 7) == 0  # registry honored after resume
    assert back.register_batch("c", 2) == 10  # new batches continue the sequence


def test_assign_dedup_ids_spark(spark):
    rows = [
        ("f1", 3, "x"),
        ("f1", 1, "y"),
        ("f2", 5, "z"),
        ("f1", 2, "w"),
        ("f2", 4, "v"),
    ]
    df = spark.createDataFrame(rows, "src string, ord int, text string")
    gen = IdGeneratorBase()
    out = assign_dedup_ids(df, gen, file_col="src", order_col="ord")
    got = {(r.src, r.ord): r[CURATOR_DEDUP_ID_STR] for r in out.collect()}
    # f1 registered first (sorted), 3 rows -> [0,2]; f2 -> [3,4]
    assert got[("f1", 1)] == 0
    assert got[("f1", 2)] == 1
    assert got[("f1", 3)] == 2
    assert got[("f2", 4)] == 3
    assert got[("f2", 5)] == 4
    assert gen.get_batch_range("f1") == (0, 2)

    # resume with the persisted registry: identical ids, any file order
    out2 = assign_dedup_ids(df, gen, file_col="src", order_col="ord")
    got2 = {(r.src, r.ord): r[CURATOR_DEDUP_ID_STR] for r in out2.collect()}
    assert got2 == got


def test_register_files_existing_registry_wins():
    gen = IdGeneratorBase()
    gen.register_batch("z.jsonl", 4)  # registered out of sorted order earlier
    offsets = register_files(gen, [("a.jsonl", 2), ("z.jsonl", 4)])
    assert offsets == {"z.jsonl": 0, "a.jsonl": 4}

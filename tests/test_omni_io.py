"""Tests for omni-pipeline IO deterministic halves (io/omni_io.py) —
reference stages/synthetic/omni/io.py."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from nemo_curator_spark.io import omni_io as O


def test_resolve_dataset_source(tmp_path):
    # hub (nonexistent path) with and without limit
    assert O.resolve_dataset_source("org/ds", "train", None) == {
        "kind": "hub", "split_arg": "train",
    }
    assert O.resolve_dataset_source("org/ds", "validation", 25) == {
        "kind": "hub", "split_arg": "validation[:25]",
    }
    # imagefolder: existing dir without dataset_info.json
    d = tmp_path / "imgs"
    d.mkdir()
    assert O.resolve_dataset_source(str(d), "train", 5) == {
        "kind": "imagefolder", "split_arg": "train[:5]",
    }
    # save_to_disk: limit applied post-load, split stays bare
    (d / "dataset_info.json").write_text("{}")
    assert O.resolve_dataset_source(str(d), "train", 5) == {
        "kind": "save_to_disk", "split_arg": "train",
    }


def test_image_value_to_bytes(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"FILE")

    class FakePil:
        def tobytes_encoded(self):
            return b"PIL"

    assert O.image_value_to_bytes(FakePil()) == b"PIL"
    assert O.image_value_to_bytes({"bytes": b"B"}) == b"B"
    assert O.image_value_to_bytes({"data": b"D"}) == b"D"
    assert O.image_value_to_bytes({"path": str(p)}) == b"FILE"
    assert O.image_value_to_bytes(b"RAW") == b"RAW"
    assert O.image_value_to_bytes(bytearray(b"BA")) == b"BA"
    assert O.image_value_to_bytes(str(p)) == b"FILE"
    # empty-bytes dict falls through to path (reference `or` semantics)
    assert O.image_value_to_bytes({"bytes": b"", "path": str(p)}) == b"FILE"
    with pytest.raises(ValueError, match="Cannot convert"):
        O.image_value_to_bytes(12345)
    with pytest.raises(ValueError, match="str"):
        O.image_value_to_bytes(str(tmp_path / "missing.bin"))


def test_reader_dedup_cache_and_limit(tmp_path):
    img_dir = tmp_path / "cache"
    writes = []

    def save_image(raw, path):
        writes.append(path)
        Path(path).write_bytes(raw)

    rows = [
        {"qid": "q1", "img_id": "A", "image": b"a"},
        {"qid": "q2", "img_id": "A", "image": b"a"},   # dup image id
        {"qid": "q3", "img_id": "B", "image": b"b"},
        {"qid": "q4", "img_id": "C", "image": b"c"},
    ]
    reader = O.HFDatasetImageReader(
        "lmms-lab/textvqa", img_dir, id_column="img_id",
        save_image=save_image, limit=3,
    )
    samples = reader.process(rows)
    # limit slices ROWS (train[:3]) before dedup -> A, B survive
    assert [s["image_id"] for s in samples] == ["A", "B"]
    assert all(s["dataset_name"] == "textvqa" for s in samples)
    assert sorted(writes) == [str(img_dir / "A.jpg"), str(img_dir / "B.jpg")]
    # idempotence: second run re-encodes only the previously-unseen C
    writes.clear()
    samples2 = O.HFDatasetImageReader(
        "lmms-lab/textvqa", img_dir, id_column="img_id",
        save_image=save_image,
    ).process(rows)
    assert writes == [str(img_dir / "C.jpg")]
    assert [s["image_id"] for s in samples2] == ["A", "B", "C"]
    # no id column -> row-index ids, no dedup
    samples3 = O.HFDatasetImageReader(
        "ds", tmp_path / "c2", save_image=save_image,
    ).process(rows[:2])
    assert [s["image_id"] for s in samples3] == ["000000", "000001"]
    # missing codec raises the plug-point error
    with pytest.raises(NotImplementedError, match="JPEG"):
        O.HFDatasetImageReader("ds", tmp_path / "c3").process(rows[:1])


def test_sample_record_contract(tmp_path):
    data = {
        "image_path": str(tmp_path / "sub" / "a.jpg"),
        "ocr": [],
        "caption": "",
        "flag": False,
        "none_field": None,
        "is_valid": True,
    }
    rec = O.sample_record(data, image_parent=tmp_path)
    # empty list/string/False kept; None and is_valid dropped
    assert rec == {
        "image_path": str(Path("sub") / "a.jpg"),
        "ocr": [],
        "caption": "",
        "flag": False,
    }
    # non-relative parent: silent absolute fallback
    rec2 = O.sample_record(dict(data), image_parent="/nonexistent/root")
    assert rec2["image_path"] == str(tmp_path / "sub" / "a.jpg")
    assert O.sample_record({"image_path": None, "x": 1}) == {"x": 1}


def test_writer_and_merge(tmp_path):
    out = tmp_path / "results.jsonl"
    w = O.JsonlSampleWriter(str(out), image_parent=str(tmp_path))
    s1 = w.write_shard("0", [
        {"image_id": "a", "is_valid": True, "ocr": []},
        {"image_id": "bad", "is_valid": False},
    ])
    s2 = w.write_shard("1", [{"image_id": "b", "is_valid": True}])
    assert s1 == str(tmp_path / "results_worker0.jsonl")
    assert w.stats == {"saved": 2, "skipped": 1}
    merged = O.merge_output_shards(out)
    assert merged == out
    rows = [json.loads(l) for l in open(out, encoding="utf-8")]
    assert [r["image_id"] for r in rows] == ["a", "b"]
    assert "is_valid" not in rows[0] and rows[0]["ocr"] == []
    # shards deleted after merge; idempotent no-shard call returns path
    assert not list(tmp_path.glob("results_worker*"))
    assert O.merge_output_shards(out) == out
    # valid_only=False writes invalid rows too (is_valid still stripped)
    w2 = O.JsonlSampleWriter(
        str(tmp_path / "all.jsonl"), valid_only=False,
    )
    shard = w2.write_shard("0", [{"image_id": "bad", "is_valid": False}])
    row = json.loads(open(shard, encoding="utf-8").read())
    assert row == {"image_id": "bad"}
    # suffix-less base path defaults to .jsonl
    w3 = O.JsonlSampleWriter(str(tmp_path / "noext"))
    assert w3.shard_path("7").endswith("noext_worker7.jsonl")

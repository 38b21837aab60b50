"""WebDataset interleaved IO: write -> read round-trip, shard
determinism, passthrough fields (reference readers/writers/webdataset.py
semantics over stdlib tarfile)."""

from __future__ import annotations

import json
import os
import tarfile

import pandas as pd

from nemo_curator_spark.io import webdataset as WD


def _sample_rows():
    rows = []
    for s in range(6):
        sid = f"sample {s}"  # space exercises key escaping
        rows.append(
            (sid, -1, "metadata", "application/json", None, None, None, None,
             json.dumps({"url": f"http://x/{s}"}))
        )
        rows.append(
            (sid, 0, "text", "text/plain", f"intro {s}", None, None, None, None)
        )
        rows.append(
            (sid, 1, "image", "image/png", None,
             bytes([137, 80, 78, 71, s]), None, None, None)
        )
        rows.append(
            (sid, 2, "text", "text/plain", f"outro {s}", None, None, None, None)
        )
    return rows


_SCHEMA = (
    "sample_id string, position int, modality string, content_type string, "
    "text_content string, binary_content binary, source_ref string, "
    "materialize_error string, meta string"
)


def test_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(_sample_rows(), _SCHEMA)
    out = str(tmp_path / "wds")
    shards = WD.write_webdataset(
        df, out, num_shards=3, fields=["meta"]
    ).toPandas()
    assert shards.n_samples.sum() == 6
    assert all(os.path.exists(p) for p in shards.shard)

    back = WD.read_webdataset(
        spark, sorted(shards.shard), fields=["meta"]
    ).toPandas()
    want = df.toPandas()

    def norm(p):
        p = p[["sample_id", "position", "modality", "content_type",
               "text_content", "binary_content", "meta"]].copy()
        p["binary_content"] = p.binary_content.map(
            lambda b: None if b is None else bytes(b)
        )
        return p.sort_values(["sample_id", "position"]).reset_index(drop=True)

    a, b = norm(back), norm(want)
    pd.testing.assert_frame_equal(a, b)


def test_interleaving_positions_preserved(spark, tmp_path):
    # sparse positions (text at 0 and 3, image at 2) must survive via the
    # None placeholders in the texts/images arrays
    rows = [
        ("s", -1, "metadata", "application/json", None, None, None, None, None),
        ("s", 0, "text", "text/plain", "first", None, None, None, None),
        ("s", 2, "image", "image/bmp", None, b"BMDATA", None, None, None),
        ("s", 3, "text", "text/plain", "last", None, None, None, None),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = str(tmp_path / "wds2")
    WD.write_webdataset(df, out, num_shards=1).collect()
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tf:
        sample = json.loads(tf.extractfile("s.json").read())
    assert sample["texts"] == ["first", None, None, "last"]
    assert sample["images"][0] is None and sample["images"][1] is None
    assert sample["images"][2].endswith(".bmp")
    assert sample["images"][3] is None

    back = WD.read_webdataset(spark, [os.path.join(out, "shard-00000.tar")])
    got = back.orderBy("position").toPandas()
    assert got.position.tolist() == [-1, 0, 2, 3]
    assert got.modality.tolist() == ["metadata", "text", "image", "text"]
    assert bytes(got.binary_content[2]) == b"BMDATA"


def test_write_is_idempotent_and_deterministic(spark, tmp_path):
    df = spark.createDataFrame(_sample_rows(), _SCHEMA)
    out = str(tmp_path / "wds3")
    WD.write_webdataset(df, out, num_shards=2, fields=["meta"]).collect()
    first = {
        p: open(os.path.join(out, p), "rb").read()
        for p in sorted(os.listdir(out))
    }
    WD.write_webdataset(df, out, num_shards=2, fields=["meta"]).collect()
    second = {
        p: open(os.path.join(out, p), "rb").read()
        for p in sorted(os.listdir(out))
    }
    assert first.keys() == second.keys()
    assert all(first[k] == second[k] for k in first)


def test_per_modality_passthrough(spark, tmp_path):
    schema = _SCHEMA + ", img_score string"
    rows = [
        ("s", -1, "metadata", "application/json", None, None, None, None, None, None),
        ("s", 0, "image", "image/png", None, b"A", None, None, None, "0.9"),
        ("s", 1, "text", "text/plain", "t", None, None, None, None, None),
        ("s", 2, "image", "image/png", None, b"B", None, None, None, "0.1"),
    ]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "wds4")
    WD.write_webdataset(
        df, out, num_shards=1, per_image_fields=["img_score"]
    ).collect()
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tf:
        sample = json.loads(tf.extractfile("s.json").read())
    assert sample["img_score"] == ["0.9", "0.1"]
    back = WD.read_webdataset(
        spark, [os.path.join(out, "shard-00000.tar")],
        per_image_fields=["img_score"],
    ).orderBy("position").toPandas()
    assert back.img_score.tolist() == [None, "0.9", None, "0.1"]


def test_dotted_sample_ids_and_json_binary_members(spark, tmp_path):
    """Review findings: a '.' in sample_id must not break first-dot key
    grouping (escaped to %2E), and a binary member whose content type
    maps to a .json extension must not be misparsed as a sample."""
    rows = [
        ("a.b", -1, "metadata", "application/json", None, None, None, None, None),
        ("a.b", 0, "text", "text/plain", "dotted id", None, None, None, None),
        ("a.b", 1, "image", "application/json", None, b'{"not": "a sample"}',
         None, None, None),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = str(tmp_path / "wds5")
    WD.write_webdataset(df, out, num_shards=1).collect()
    shard = os.path.join(out, "shard-00000.tar")
    with tarfile.open(shard) as tf:
        names = sorted(m.name for m in tf.getmembers())
    # escaped stem has no dots; exactly one sample json (one-dot rule)
    assert [n for n in names if n.count(".") == 1 and n.endswith(".json")] == [
        "a%2Eb.json"
    ]
    back = WD.read_webdataset(spark, [shard]).orderBy("position").toPandas()
    assert back.sample_id.tolist() == ["a.b", "a.b", "a.b"]
    assert back.modality.tolist() == ["metadata", "text", "image"]
    assert bytes(back.binary_content[2]) == b'{"not": "a sample"}'

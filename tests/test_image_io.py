"""Image IO — reference stages/image/io/{image_reader,image_writer,
convert}.py: tar-shard read (real netpbm/BMP codecs; DALI = plug
point), deterministic tar+parquet re-shard, field projection."""

from __future__ import annotations

import hashlib
import json
import tarfile

import numpy as np
import pandas as pd
import pytest

from nemo_curator_spark.io import image_io as I
from nemo_curator_spark.operators.multimodal import encode_ppm


def _rgb(h, w, seed):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def _make_tar(path, arrays, ext="ppm"):
    with tarfile.open(path, "w") as tf:
        for k, arr in enumerate(arrays):
            payload = encode_ppm(arr)
            info = tarfile.TarInfo(name=f"{k:04d}.{ext}")
            info.size = len(payload)
            import io as _io

            tf.addfile(info, _io.BytesIO(payload))


def test_group_prefix_parity():
    # image_reader.py:100-101
    assert I.group_id_prefix(["/d/shard-003.tar"]) == "shard-003"
    assert (
        I.group_id_prefix(["/d/shard-003.tar", "/d/shard-004.tar"])
        == "group_shard-003_x2"
    )
    assert I.group_base_path(["/d/s.tar"]) == "/d/s.tar"
    assert I.group_base_path(["/d/s.tar", "/d/t.tar"]) == "/d"


def test_deterministic_hash_parity():
    # image_writer.py:69-72 — exact recipe
    inputs = ["/b.jpg", "/a.jpg"]
    expected = hashlib.sha256(
        ("|".join(sorted(inputs)) + "|seed1").encode()
    ).hexdigest()[:12]
    assert I.deterministic_hash(inputs, "seed1") == expected


def test_read_image_shards(spark, tmp_path):
    arrays = [_rgb(4, 5, 1), _rgb(3, 3, 2)]
    tar1 = str(tmp_path / "shard-000.tar")
    _make_tar(tar1, arrays)
    got = (
        I.read_image_shards(spark, [tar1], extensions=("ppm",))
        .orderBy("image_id")
        .collect()
    )
    # id/path naming: {stem}_{idx:06d}, synthesized .jpg path (reference)
    assert [r["image_id"] for r in got] == [
        "shard-000_000000",
        "shard-000_000001",
    ]
    assert got[0]["image_path"].endswith("shard-000.tar/shard-000_000000.jpg")
    assert (got[0]["width"], got[0]["height"], got[0]["channels"]) == (5, 4, 3)
    np.testing.assert_array_equal(
        np.frombuffer(bytes(got[0]["image_data"]), dtype=np.uint8),
        arrays[0].reshape(-1),
    )
    # non-matching members are skipped (missing_component_behavior="skip")
    assert (
        I.read_image_shards(spark, [tar1], extensions=("jpg",)).count() == 0
    )


def test_read_grouped_shards_continuous_index(spark, tmp_path):
    t1, t2 = str(tmp_path / "a.tar"), str(tmp_path / "b.tar")
    _make_tar(t1, [_rgb(2, 2, 3)])
    _make_tar(t2, [_rgb(2, 2, 4), _rgb(2, 2, 5)])
    got = (
        I.read_image_shards(spark, [[t1, t2]], extensions=("ppm",))
        .orderBy("image_id")
        .collect()
    )
    # group prefix + index continues across tars in the group
    assert [r["image_id"] for r in got] == [
        "group_a_x2_000000",
        "group_a_x2_000001",
        "group_a_x2_000002",
    ]


def test_write_read_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out")
    arrays = [_rgb(4, 4, 7), _rgb(5, 3, 8), _rgb(2, 6, 9)]
    rows = [
        (
            f"img_{k:03d}",
            f"/src/img_{k:03d}.jpg",
            arr.shape[1],
            arr.shape[0],
            3,
            bytearray(arr.tobytes()),
            json.dumps({"k": k}),
        )
        for k, arr in enumerate(arrays)
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, image_path string, width int, height int, "
        "channels int, image_data binary, metadata string",
    ).coalesce(1)
    files = I.write_image_shards(df, out, images_per_tar=2).collect()
    tars = sorted(r["path"] for r in files if r["kind"] == "tar")
    pqs = sorted(r["path"] for r in files if r["kind"] == "parquet")
    assert len(tars) == 2 and len(pqs) == 2  # 3 images, 2 per tar

    # deterministic base naming: images-{hash}-{chunk:06d}
    base = "images-" + I.deterministic_hash(
        [r[1] for r in rows], ""
    )
    assert tars[0].endswith(f"{base}-000000.tar")
    assert tars[1].endswith(f"{base}-000001.tar")

    # metadata parquet contract (image_writer.py:201-215)
    meta = pd.read_parquet(pqs[0]).sort_values("image_id")
    assert meta["image_id"].tolist() == ["img_000", "img_001"]
    assert meta["member_name"].tolist() == ["img_000.ppm", "img_001.ppm"]
    assert meta["tar_file"].iloc[0] == tars[0]
    assert meta["original_path"].iloc[0] == "/src/img_000.jpg"
    assert meta["metadata"].iloc[0] == repr({"k": 0})

    # read the shards back through the real codec: pixels identical
    got = (
        I.read_image_shards(spark, tars, extensions=("ppm",))
        .orderBy("image_id")
        .collect()
    )
    assert len(got) == 3
    flat = [np.frombuffer(bytes(r["image_data"]), np.uint8) for r in got]
    for arr, g in zip(arrays, flat):
        np.testing.assert_array_equal(g, arr.reshape(-1))

    # re-run writes byte-identical files (idempotent retries)
    before = {p: open(p, "rb").read() for p in tars + pqs}
    I.write_image_shards(df, out, images_per_tar=2).collect()
    after = {p: open(p, "rb").read() for p in tars + pqs}
    assert before == after


def test_write_grayscale_and_dtype_clip(spark, tmp_path):
    out = str(tmp_path / "gray")
    gray = np.random.RandomState(0).randint(0, 256, (3, 4), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (
                "g0",
                "/src/g0.jpg",
                4,
                3,
                1,
                bytearray(gray.tobytes()),
                None,
            )
        ],
        "image_id string, image_path string, width int, height int, "
        "channels int, image_data binary, metadata string",
    )
    files = I.write_image_shards(df, out).collect()
    [tar] = [r["path"] for r in files if r["kind"] == "tar"]
    with tarfile.open(tar) as tf:
        member = tf.getmembers()[0]
        assert member.name == "g0.ppm"
        raw = tf.extractfile(member).read()
    assert raw.startswith(b"P5")  # 2-D -> grayscale (mode "L" analogue)
    # None metadata -> str(None), the reference's non-dict branch
    [pq] = [r["path"] for r in files if r["kind"] == "parquet"]
    assert pd.read_parquet(pq)["metadata"].iloc[0] == "None"


def test_encode_contract_rgba_and_float():
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    payload, ext = I.default_encode(rgba)
    assert ext == ".ppm" and payload.startswith(b"P6")  # alpha dropped
    flo = np.array([[300.0, -5.0]], dtype=np.float64)
    payload, _ = I.default_encode(flo)
    assert payload.startswith(b"P5")
    assert payload.endswith(bytes([255, 0]))  # clipped to uint8 range


def test_images_to_documents(spark):
    df = spark.createDataFrame(
        [("a", "/p/a.jpg", 3)], "image_id string, image_path string, w int"
    )
    # default: image_id only
    assert I.images_to_documents(df).columns == ["image_id"]
    out = I.images_to_documents(df, ["image_id", "image_path", "missing"])
    row = out.collect()[0]
    assert row["image_id"] == "a" and row["image_path"] == "/p/a.jpg"
    assert row["missing"] is None  # getattr(..., None) parity


def test_empty_task_raises(spark):
    with pytest.raises(ValueError, match="No tar file paths"):
        I.read_image_shards(spark, [])

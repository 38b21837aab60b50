"""Tests for interleaved binary materialization, schema utilities, and
the parquet writer half (interleaved_materialize.py).

Reference pins: tasks/interleaved.py:176-243 source_ref contract;
materialization.py:53-94 classification, :120-282 I/O strategies +
exact error strings; schema.py:34-122; validation_utils.py:26-59;
io/writers/base.py:92-157 error policy + deterministic naming;
utils/file_utils.py:335-375 output modes; hash_utils.py:17-25.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nemo_curator_spark.operators.interleaved_materialize import (
    INTERLEAVED_SCHEMA,
    align_interleaved_table,
    align_table,
    apply_materialize_error_policy,
    build_source_ref,
    check_output_mode,
    classify_rows,
    extract_tiff_frame,
    get_deterministic_hash,
    image_bytes_to_array,
    materialize_binary_content,
    materialize_pdf,
    parse_source_ref,
    reconcile_schema,
    resolve_schema,
    resolve_storage_options,
    validate_and_project_source_fields,
    with_parsed_source_ref_columns,
    write_interleaved_parquet,
)
from nemo_curator_spark.operators.multimodal import encode_fake_image


# --- source_ref contract ---------------------------------------------------


def test_source_ref_roundtrip():
    ref = build_source_ref("/a.tar", "m.jpg", 100, 50, 2)
    parsed = parse_source_ref(ref)
    assert parsed == {
        "path": "/a.tar",
        "member": "m.jpg",
        "byte_offset": 100,
        "byte_size": 50,
        "frame_index": 2,
    }
    # frame_index omitted from JSON when None
    assert "frame_index" not in json.loads(build_source_ref("/a", None))
    assert parse_source_ref(None)["path"] is None
    assert parse_source_ref("")["member"] is None
    with pytest.raises(TypeError, match="JSON object"):
        parse_source_ref("[1,2]")


def test_with_parsed_source_ref_columns():
    pdf = pd.DataFrame(
        {"source_ref": [build_source_ref("/p", "m", 1, 2), None]}
    )
    out = with_parsed_source_ref_columns(pdf)
    assert out["_src_path"].tolist() == ["/p", None]
    assert out["_src_byte_offset"].tolist()[0] == 1


# --- classification --------------------------------------------------------


def _frame(rows):
    cols = [
        "_src_path",
        "_src_member",
        "_src_byte_offset",
        "_src_byte_size",
        "_src_frame_index",
    ]
    return pd.DataFrame(rows, columns=cols)


def test_classify_rows_strategies():
    df = _frame(
        [
            ("/t.tar", "a.jpg", 10, 5, None),  # range
            ("/t.tar", "b.jpg", None, None, 1),  # tar extract + frame
            ("/img.jpg", None, None, None, None),  # direct
            (None, None, None, None, None),  # missing
            ("/t.tar", "c.jpg", 10, 0, None),  # size 0 → tar extract
        ]
    )
    mask = pd.Series([True] * 5)
    tar_extract, range_read, direct_read, missing = classify_rows(df, mask)
    assert range_read == {"/t.tar": [(0, "a.jpg", 10, 5, None)]}
    assert tar_extract == {"/t.tar": [(1, "b.jpg", 1), (4, "c.jpg", None)]}
    assert direct_read == {"/img.jpg": [2]}
    assert missing == [3]


# --- TIFF frame plug point -------------------------------------------------


def test_extract_tiff_frame_non_tiff_passthrough():
    raw = b"P6 not a tiff"
    assert extract_tiff_frame(raw, 0) == raw
    # actual TIFF magic without PIL → None (decode plug point)
    assert extract_tiff_frame(b"II*\x00rest", 0) is None
    assert extract_tiff_frame(b"MM\x00*rest", 3) is None


# --- materialization end-to-end (local fs) ---------------------------------


@pytest.fixture
def tar_fixture(tmp_path):
    """A tar with two image members + a standalone image file."""
    img_a = encode_fake_image(4, 4, seed=1)
    img_b = encode_fake_image(4, 4, seed=2)
    tar_path = str(tmp_path / "shard.tar")
    with tarfile.open(tar_path, "w") as tf:
        for name, blob in (("a.ppm", img_a), ("b.ppm", img_b)):
            ti = tarfile.TarInfo(name)
            ti.size = len(blob)
            tf.addfile(ti, io.BytesIO(blob))
    direct_path = str(tmp_path / "direct.ppm")
    with open(direct_path, "wb") as f:
        f.write(img_a)
    # locate member offsets for the range strategy
    offsets = {}
    with tarfile.open(tar_path) as tf:
        for m in tf.getmembers():
            offsets[m.name] = (m.offset_data, m.size)
    return tar_path, direct_path, img_a, img_b, offsets


def _interleaved_pdf(rows):
    cols = ["sample_id", "position", "modality", "content_type", "source_ref"]
    return pd.DataFrame(rows, columns=cols)


def test_materialize_pdf_all_strategies(tar_fixture):
    tar_path, direct_path, img_a, img_b, offsets = tar_fixture
    off_a, size_a = offsets["a.ppm"]
    pdf = _interleaved_pdf(
        [
            ("s1", 0, "image", "image/x-portable-pixmap",
             build_source_ref(tar_path, "a.ppm", off_a, size_a)),  # range
            ("s1", 1, "image", "image/x-portable-pixmap",
             build_source_ref(tar_path, "b.ppm")),  # tar extract
            ("s2", 0, "image", "image/x-portable-pixmap",
             build_source_ref(direct_path, None)),  # direct
            ("s2", 1, "text", "text/plain", None),  # untouched
            ("s3", 0, "image", "image/x-portable-pixmap",
             build_source_ref(None, None)),  # missing path
            ("s3", 1, "image", "image/x-portable-pixmap",
             build_source_ref(tar_path, "nope.ppm")),  # missing member
        ]
    )
    out = materialize_pdf(pdf)
    assert bytes(out.loc[0, "binary_content"]) == img_a
    assert bytes(out.loc[1, "binary_content"]) == img_b
    assert bytes(out.loc[2, "binary_content"]) == img_a
    assert out.loc[3, "binary_content"] is None
    assert out.loc[4, "materialize_error"] == "missing path"
    assert out.loc[5, "materialize_error"] == "missing member 'nope.ppm'"
    # parse columns dropped
    assert not any(c.startswith("_src_") for c in out.columns)


def test_materialize_pdf_bad_path_and_range_dedup(tar_fixture, tmp_path):
    tar_path, _, img_a, _, offsets = tar_fixture
    off_a, size_a = offsets["a.ppm"]
    pdf = _interleaved_pdf(
        [
            ("s1", 0, "image", None,
             build_source_ref(tar_path, "a.ppm", off_a, size_a)),
            ("s1", 1, "image", None,
             build_source_ref(tar_path, "a.ppm", off_a, size_a)),  # same range
            ("s2", 0, "image", None,
             build_source_ref(str(tmp_path / "gone.tar"), "x.ppm")),
        ]
    )
    out = materialize_pdf(pdf)
    assert bytes(out.loc[0, "binary_content"]) == img_a
    assert bytes(out.loc[1, "binary_content"]) == img_a
    assert out.loc[2, "materialize_error"] == "failed to read path"


def test_materialize_only_missing_binary(tar_fixture):
    tar_path, _, img_a, _, offsets = tar_fixture
    off_a, size_a = offsets["a.ppm"]
    pdf = _interleaved_pdf(
        [
            ("s1", 0, "image", None,
             build_source_ref(tar_path, "a.ppm", off_a, size_a)),
        ]
    )
    pdf["binary_content"] = [b"already"]
    out = materialize_pdf(pdf, only_missing_binary=True)
    assert bytes(out.loc[0, "binary_content"]) == b"already"
    out2 = materialize_pdf(pdf, only_missing_binary=False)
    assert bytes(out2.loc[0, "binary_content"]) == img_a


def test_materialize_spark_stage(spark, tar_fixture):
    tar_path, direct_path, img_a, img_b, offsets = tar_fixture
    rows = [
        ("s1", 0, "image", None, build_source_ref(tar_path, "b.ppm")),
        ("s2", 0, "image", None, build_source_ref(direct_path, None)),
        ("s3", 0, "text", None, None),
    ]
    df = spark.createDataFrame(
        rows, "sample_id string, position int, modality string, "
        "content_type string, source_ref string"
    )
    out = materialize_binary_content(df).orderBy("sample_id").collect()
    assert bytes(out[0]["binary_content"]) == img_b
    assert bytes(out[1]["binary_content"]) == img_a
    assert out[2]["binary_content"] is None and out[2]["materialize_error"] is None


# --- schema utilities ------------------------------------------------------


def test_reconcile_schema_preserves_large_and_passthrough():
    inferred = pa.schema(
        [
            pa.field("sample_id", pa.large_string()),
            pa.field("position", pa.int64()),
            pa.field("binary_content", pa.binary()),
            pa.field("user_col", pa.int16()),
            pa.field("dict_col", pa.dictionary(pa.int32(), pa.string())),
        ]
    )
    out = reconcile_schema(inferred)
    # large_string stays large (no unsafe downcast)
    assert out.field("sample_id").type == pa.large_string()
    # reserved columns get canonical types
    assert out.field("position").type == pa.int32()
    assert out.field("binary_content").type == pa.large_binary()
    # passthrough keeps inferred type; dictionary unwrapped
    assert out.field("user_col").type == pa.int16()
    assert out.field("dict_col").type == pa.string()


def test_resolve_schema_priority():
    explicit = pa.schema([pa.field("x", pa.int8())])
    assert resolve_schema(explicit, {"y": pa.int8()}) is explicit
    merged = resolve_schema(None, {"text_content": pa.large_string()})
    assert merged.field("text_content").type == pa.large_string()
    # non-reserved override appended as nullable
    merged2 = resolve_schema(None, {"extra": pa.float32()})
    assert merged2.field("extra").nullable
    assert resolve_schema(None, None) is None


def test_align_table_pads_drops_reorders():
    table = pa.table(
        {
            "position": pa.array([1, 2], type=pa.int64()),
            "sample_id": pa.array(["a", "b"]),
            "extra": pa.array([1.0, 2.0]),
        }
    )
    target = pa.schema(
        [
            pa.field("sample_id", pa.string()),
            pa.field("position", pa.int32()),
            pa.field("modality", pa.string()),
        ]
    )
    out = align_table(table, target)
    assert out.schema.names == ["sample_id", "position", "modality"]
    assert out.column("modality").null_count == 2
    assert out.column("position").type == pa.int32()
    # reserved large→small downcast allowed (safe=False path)
    big = pa.table({"text_content": pa.array(["x"], type=pa.large_string())})
    aligned = align_table(big, pa.schema([pa.field("text_content", pa.string())]))
    assert aligned.column("text_content").type == pa.string()
    out2 = align_interleaved_table(
        pa.table({
            "sample_id": pa.array(["a"]),
            "position": pa.array([0], type=pa.int64()),
            "modality": pa.array(["text"]),
        })
    )
    assert out2.schema.field("position").type == pa.int32()


# --- validation utils ------------------------------------------------------


def test_resolve_storage_options():
    assert resolve_storage_options(
        {"source_storage_options": {"anon": True}}, {"storage_options": {"x": 1}}
    ) == {"anon": True}
    assert resolve_storage_options({}, {"storage_options": {"x": 1}}) == {"x": 1}
    assert resolve_storage_options(None, None) == {}
    # non-dict values fall through
    assert resolve_storage_options({"source_storage_options": "bad"}, None) == {}


def test_validate_and_project_source_fields():
    sample = {"a": 1, "b": {"k": "v"}, "sample_id": "x"}
    excluded = {"sample_id"}
    # None → everything non-excluded, dicts JSON-encoded
    out = validate_and_project_source_fields(sample, None, excluded)
    assert out == {"a": 1, "b": '{"k": "v"}'}
    # explicit missing field → None
    out2 = validate_and_project_source_fields(sample, ("a", "zz"), excluded)
    assert out2 == {"a": 1, "zz": None}
    with pytest.raises(ValueError, match="reserved keys"):
        validate_and_project_source_fields(sample, ("sample_id",), excluded)


# --- writer half -----------------------------------------------------------


def test_check_output_mode(tmp_path):
    p = str(tmp_path / "out")
    check_output_mode("ignore", p)
    assert os.path.isdir(p)
    with open(os.path.join(p, "f.txt"), "w") as f:
        f.write("x")
    with pytest.raises(FileExistsError):
        check_output_mode("error", p)
    with pytest.raises(NotImplementedError):
        check_output_mode("append", p)
    check_output_mode("overwrite", p)
    assert os.listdir(p) == []
    with pytest.raises(ValueError, match="Invalid mode"):
        check_output_mode("truncate", p)


def test_apply_materialize_error_policy():
    pdf = pd.DataFrame(
        {
            "sample_id": ["s1", "s1", "s2"],
            "materialize_error": [None, "missing member 'x'", None],
        }
    )
    with pytest.raises(RuntimeError, match=r"1 errors.*missing member"):
        apply_materialize_error_policy(pdf, "error")
    assert len(apply_materialize_error_policy(pdf, "warn")) == 3
    assert apply_materialize_error_policy(pdf, "drop_row")["sample_id"].tolist() == ["s1", "s2"]
    assert apply_materialize_error_policy(pdf, "drop_sample")["sample_id"].tolist() == ["s2"]
    # no error column → untouched
    clean = pd.DataFrame({"sample_id": ["a"]})
    assert apply_materialize_error_policy(clean, "error") is clean


def test_get_deterministic_hash():
    h = get_deterministic_hash(["b", "a"], "seed")
    assert h == get_deterministic_hash(["a", "b"], "seed")  # sorted
    assert h != get_deterministic_hash(["a", "b"], "other")
    assert len(h) == 12


def test_write_interleaved_parquet(spark, tar_fixture, tmp_path):
    tar_path, direct_path, img_a, img_b, offsets = tar_fixture
    out_dir = str(tmp_path / "pq_out")
    rows = [
        ("s1", 0, "image", None, build_source_ref(tar_path, "a.ppm")),
        ("s1", 1, "text", "text/plain", None),
    ]
    df = spark.createDataFrame(
        rows, "sample_id string, position int, modality string, "
        "content_type string, source_ref string"
    ).coalesce(1)
    res = write_interleaved_parquet(df, out_dir).collect()
    assert len(res) == 1 and res[0]["n_rows"] == 2
    written = pq.read_table(res[0]["file"])
    # canonical reserved types after reconcile
    assert written.schema.field("position").type == pa.int32()
    assert written.schema.field("binary_content").type == pa.large_binary()
    data = written.to_pydict()
    assert bytes(data["binary_content"][0]) == img_a
    # deterministic name: derived from the source tar path
    expected = get_deterministic_hash([tar_path], "")
    assert os.path.basename(res[0]["file"]) == f"{expected}.parquet"
    # rerun is idempotent (same name, overwritten atomically)
    res2 = write_interleaved_parquet(df, out_dir).collect()
    assert res2[0]["file"] == res[0]["file"]
    assert len(os.listdir(out_dir)) == 1


def test_write_interleaved_parquet_error_policy(spark, tmp_path):
    rows = [("s1", 0, "image", None, build_source_ref(None, None))]
    df = spark.createDataFrame(
        rows, "sample_id string, position int, modality string, "
        "content_type string, source_ref string"
    ).coalesce(1)
    out_dir = str(tmp_path / "pq_err")
    with pytest.raises(Exception, match="Materialization failed"):
        write_interleaved_parquet(df, out_dir).collect()
    res = write_interleaved_parquet(
        df, out_dir, on_materialize_error="drop_sample"
    ).collect()
    assert res == []  # the only sample dropped → empty partition, no file


# --- image decode fallback -------------------------------------------------


def test_image_bytes_to_array_ppm_fallback():
    arr = image_bytes_to_array(encode_fake_image(3, 2, seed=5))
    assert arr is not None and arr.shape == (2, 3, 3)
    assert image_bytes_to_array(b"not an image") is None

"""PDF ingestion deterministic halves (reference
stages/interleaved/pdf/nemotron_parse/{partitioning,preprocess,utils}.py)
plus the stdlib PNG codec that backs the pipeline's image/png contract."""

from __future__ import annotations

import base64
import json
import zipfile

import numpy as np
import pytest

from nemo_curator_spark.operators import pdf_ingest as P
from nemo_curator_spark.operators.multimodal import (
    decode_png,
    encode_png,
)

# ---------------------------------------------------------------------------
# PNG codec
# ---------------------------------------------------------------------------


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(13, 9, 3), dtype=np.uint8)
    w, h, c, px = decode_png(encode_png(img))
    assert (w, h, c) == (9, 13, 3)
    np.testing.assert_array_equal(px.reshape(13, 9, 3), img)


def test_png_roundtrip_gray_and_rgba():
    rng = np.random.RandomState(8)
    gray = rng.randint(0, 256, size=(5, 7), dtype=np.uint8)
    w, h, c, px = decode_png(encode_png(gray))
    assert (w, h, c) == (7, 5, 1)
    np.testing.assert_array_equal(px.reshape(5, 7), gray)
    rgba = rng.randint(0, 256, size=(4, 6, 4), dtype=np.uint8)
    w, h, c, px = decode_png(encode_png(rgba))
    assert (w, h, c) == (6, 4, 3)  # alpha dropped, BMP policy
    np.testing.assert_array_equal(px.reshape(4, 6, 3), rgba[:, :, :3])


def test_png_encode_deterministic():
    img = np.arange(120, dtype=np.uint8).reshape(5, 8, 3)
    assert encode_png(img) == encode_png(img.copy())


def _filter_scanlines(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference PNG filterer (spec §9) for decoder testing: produce the
    filtered byte stream for the given per-row filter types."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for r in range(h):
        ft = ftypes[r % len(ftypes)]
        out.append(ft)
        prev = flat[r - 1] if r > 0 else np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            x = flat[r][i]
            a = flat[r][i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if ft == 0:
                val = x
            elif ft == 1:
                val = x - a
            elif ft == 2:
                val = x - b
            elif ft == 3:
                val = x - ((a + b) >> 1)
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                val = x - pred
            out.append(val & 0xFF)
    return bytes(out)


def test_png_decoder_all_filter_types():
    import struct
    import zlib

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(10, 6, 3), dtype=np.uint8)
    filtered = _filter_scanlines(img, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 6, 10, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filtered))
        + _chunk(b"IEND", b"")
    )
    w, h, c, px = decode_png(png)
    np.testing.assert_array_equal(px.reshape(10, 6, 3), img)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


# ---------------------------------------------------------------------------
# Manifest partitioning
# ---------------------------------------------------------------------------


def _write_manifest(tmp_path, lines):
    p = tmp_path / "manifest.jsonl"
    p.write_text("\n".join(json.dumps(line) for line in lines) + "\n")
    return str(p)


def test_parse_manifest_both_shapes(tmp_path):
    path = _write_manifest(
        tmp_path,
        [
            {"file_name": "0001234.pdf", "url": "http://a", "byte_offset": 17,
             "jsonl_file": "x.jsonl"},
            {"cc_pdf_file_names": ["0002000.pdf", "0002001.pdf", "0002000.pdf", ""],
             "url": "http://b"},
            {"other": "no file fields -> skipped"},
        ],
    )
    entries = [json.loads(e) for e in P.parse_pdf_manifest(path)]
    assert [e["file_name"] for e in entries] == [
        "0001234.pdf", "0002000.pdf", "0002001.pdf",
    ]
    # single-file lines preserve extra fields; CC-MAIN lines don't
    assert entries[0]["byte_offset"] == 17 and entries[0]["jsonl_file"] == "x.jsonl"
    assert "byte_offset" not in entries[1]
    assert entries[1]["url"] == "http://b"


def test_parse_manifest_max_pdfs_and_partitioning(tmp_path):
    path = _write_manifest(
        tmp_path,
        [{"file_name": f"{i:07d}.pdf"} for i in range(7)],
    )
    assert len(P.parse_pdf_manifest(path, max_pdfs=4)) == 4
    groups = P.partition_pdf_manifest(path, pdfs_per_task=3)
    assert [len(g) for g in groups] == [3, 3, 1]
    first = json.loads(groups[0][0])
    assert first["file_name"] == "0000000.pdf"


# ---------------------------------------------------------------------------
# PDF byte acquisition
# ---------------------------------------------------------------------------


def test_resolve_cc_zip_path():
    zp, member = P.resolve_cc_pdf_zip_path("0001234.pdf", "/base")
    assert zp == "/base/0000-0999/0001.zip" and member == "0001234.pdf"
    zp, _ = P.resolve_cc_pdf_zip_path("1234567.pdf", "/base")
    assert zp == "/base/1000-1999/1234.zip"


def test_extract_pdf_from_zip(tmp_path):
    d = tmp_path / "0000-0999"
    d.mkdir()
    with zipfile.ZipFile(d / "0001.zip", "w") as zf:
        zf.writestr("0001234.pdf", b"%PDF-data")
    assert P.extract_pdf_from_zip("0001234.pdf", str(tmp_path)) == b"%PDF-data"
    assert P.extract_pdf_from_zip("0001999.pdf", str(tmp_path)) is None  # member
    assert P.extract_pdf_from_zip("9991234.pdf", str(tmp_path)) is None  # archive
    assert P.extract_pdf_from_zip("nonnumeric.pdf", str(tmp_path)) is None


def _write_jsonl_pdfs(tmp_path, payloads):
    path = tmp_path / "pdfs.jsonl"
    offsets = []
    with open(path, "wb") as f:
        for payload in payloads:
            offsets.append(f.tell())
            rec = {"content": base64.b64encode(payload).decode()}
            f.write(json.dumps(rec).encode() + b"\n")
    return str(path), offsets


def test_extract_pdf_from_jsonl_paths(tmp_path):
    path, offsets = _write_jsonl_pdfs(tmp_path, [b"pdf-zero", b"pdf-one"])
    assert P.extract_pdf_from_jsonl(path, byte_offset=offsets[1]) == b"pdf-one"
    assert P.extract_pdf_from_jsonl(path, line_idx=0) == b"pdf-zero"
    assert P.extract_pdf_from_jsonl(path) is None  # neither given
    assert P.extract_pdf_from_jsonl(path, byte_offset=3) is None  # mid-line junk
    assert P.extract_pdf_from_jsonl("/nope.jsonl", line_idx=0) is None


def test_batch_fetch_groups_by_file(tmp_path):
    path, offsets = _write_jsonl_pdfs(tmp_path, [b"a", b"b", b"c"])
    entries = [
        {"file_name": "x.pdf", "jsonl_file": "pdfs.jsonl", "byte_offset": offsets[2]},
        {"file_name": "y.pdf", "jsonl_file": "pdfs.jsonl", "byte_offset": offsets[0]},
        {"file_name": "z.pdf", "jsonl_file": "pdfs.jsonl", "line_idx": 1},
    ]
    out = P.batch_fetch_jsonl(entries, str(tmp_path))
    assert out == {0: b"c", 1: b"a", 2: b"b"}
    missing = P.extract_pdfs_from_jsonl_batch("/nope.jsonl", [0, 5])
    assert missing == {0: None, 5: None}


def test_get_pdf_bytes_modes(tmp_path):
    (tmp_path / "doc.pdf").write_bytes(b"dirmode")
    assert P.get_pdf_bytes("doc.pdf", pdf_dir=str(tmp_path)) == b"dirmode"
    assert P.get_pdf_bytes("missing.pdf", pdf_dir=str(tmp_path)) is None
    with pytest.raises(ValueError, match="must be set"):
        P.get_pdf_bytes("doc.pdf")


# ---------------------------------------------------------------------------
# Canvas / crop math
# ---------------------------------------------------------------------------


def test_render_scale_to_fit():
    # page 1000x500, target 100x100 -> min(0.1, 0.2) = 0.1 caps base 2.0
    assert P.render_scale_to_fit(1000, 500, 2.0, (100, 100)) == pytest.approx(0.1)
    assert P.render_scale_to_fit(1000, 500, 0.05, (100, 100)) == 0.05
    assert P.render_scale_to_fit(1000, 500, 2.0, None) == 2.0
    assert P.render_scale_to_fit(0, 500, 2.0, (100, 100)) == 2.0
    assert P.render_scale_to_fit(1e9, 1e9, 2.0, (100, 100)) == pytest.approx(1e-3)


def test_build_canvas_pad_only():
    img = np.zeros((4, 6, 3), dtype=np.uint8)
    canvas = P.build_canvas(img, (10, 10))
    assert canvas.shape == (10, 10, 3)
    # centered: rows 3..6, cols 2..7 are the image; padding is white
    assert canvas[0, 0, 0] == 255 and canvas[3, 2, 0] == 0
    assert canvas[:3].min() == 255 and canvas[7:].min() == 255


def test_build_canvas_resize_truncation():
    # 300x200 (h x w) into (150, 200): height capped to 150,
    # new_w = int(150 * (200/300)) = 100 -> fits
    img = np.full((300, 200, 3), 128, dtype=np.uint8)
    canvas = P.build_canvas(img, (150, 200))
    assert canvas.shape == (150, 200, 3)
    # uniform image stays uniform through bilinear resize
    inner = canvas[:, 50:150]
    assert inner.min() == 128 and inner.max() == 128


def test_crop_to_bbox_contract():
    canvas = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    assert P.crop_to_bbox(canvas, None, (100, 100)) is canvas
    crop = P.crop_to_bbox(canvas, [0.1, 0.2, 0.5, 0.6], (100, 100))
    np.testing.assert_array_equal(crop, canvas[20:60, 10:50])
    # swapped corners normalize
    crop2 = P.crop_to_bbox(canvas, [0.5, 0.6, 0.1, 0.2], (100, 100))
    np.testing.assert_array_equal(crop2, crop)
    # degenerate -> None
    assert P.crop_to_bbox(canvas, [0.1, 0.1, 0.15, 0.9], (100, 100)) is None
    # out-of-range clamps
    crop3 = P.crop_to_bbox(canvas, [-0.5, -0.5, 2.0, 2.0], (100, 100))
    assert crop3.shape == (100, 100, 3)


# ---------------------------------------------------------------------------
# Interleaved row assembly
# ---------------------------------------------------------------------------

RAW_PAGE = (
    "<x_0.1><y_0.1>Title here<x_0.9><y_0.15><class_Section-header>"
    "<x_0.1><y_0.2>Body text<x_0.9><y_0.4><class_Text>"
    "<x_0.1><y_0.8>| a | b |<x_0.9><y_0.9><class_Table>"
    "<x_0.2><y_0.5><x_0.8><y_0.7><class_Picture>"
    "<x_0.2><y_0.72>Fig 1<x_0.8><y_0.74><class_Caption>"
)


def test_build_interleaved_rows():
    rng = np.random.RandomState(11)
    page = rng.randint(0, 256, size=(128, 104, 3), dtype=np.uint8)
    rows = P.build_interleaved_rows(
        "s1", "http://u", "s1.pdf", [page], [RAW_PAGE], proc_size=(128, 104)
    )
    meta = rows[0]
    assert meta["position"] == -1 and meta["modality"] == "metadata"
    assert json.loads(meta["text_content"])["num_pages"] == 1
    body = rows[1:]
    assert [r["position"] for r in body] == list(range(len(body)))
    classes = [r["element_class"] for r in body]
    # the Picture+Caption group is inserted AFTER the anchor whose bbox
    # center-y is closest (Table at 0.85 vs group 0.6 -> distance 0.25,
    # beats Text at 0.3 -> 0.3)
    assert classes == ["Section-header", "Text", "Table", "Picture", "Caption"]
    pic = body[3]
    assert pic["modality"] == "image" and pic["content_type"] == "image/png"
    w, h, c, px = decode_png(pic["binary_content"])
    # bbox [0.2,0.5,0.8,0.7] on a 104x128 canvas -> 62x25 px
    assert (w, h) == (int(0.8 * 104) - int(0.2 * 104), int(0.7 * 128) - int(0.5 * 128))
    table = body[2]
    assert table["modality"] == "table" and table["content_type"] == "text/markdown"
    assert table["binary_content"] is None
    assert json.loads(body[0]["source_ref"]) == {
        "page": 0, "bbox": [0.1, 0.1, 0.9, 0.15],
    }


def test_build_interleaved_rows_degenerate_picture_skipped():
    page = np.zeros((64, 64, 3), dtype=np.uint8)
    raw = "<x_0.1><y_0.1><x_0.12><y_0.9><class_Picture>"
    rows = P.build_interleaved_rows("s", "", "s.pdf", [page], [raw],
                                    proc_size=(64, 64))
    assert len(rows) == 1  # metadata only; 1-px-wide crop dropped


# ---------------------------------------------------------------------------
# Render-with-timeout contract
# ---------------------------------------------------------------------------


def _fake_renderer(pdf_bytes: bytes, dpi: int, max_pages: int):
    """Deterministic page images derived from the pdf bytes."""
    n = min((pdf_bytes[0] % 3) + 1, max_pages)
    return [
        np.full((8, 6, 3), (pdf_bytes[0] + i) % 256, dtype=np.uint8)
        for i in range(n)
    ]


def test_render_with_timeout_ok_and_hang():
    import time

    pages = P.render_with_timeout(b"\x02abc", "f.pdf", _fake_renderer)
    assert len(pages) == 3 and pages[2][0, 0, 0] == 4

    def hang(pdf_bytes, dpi, max_pages):
        time.sleep(30)
        return []

    assert P.render_with_timeout(b"x", "f.pdf", hang, timeout_s=1) == []


def test_default_renderer_is_plug_point():
    with pytest.raises(NotImplementedError, match="pypdfium2"):
        P._no_renderer(b"x", 300, 50)


# ---------------------------------------------------------------------------
# Spark end-to-end
# ---------------------------------------------------------------------------


def test_pdf_preprocess_dir_mode(spark, tmp_path):
    for i in range(4):
        (tmp_path / f"{i:07d}.pdf").write_bytes(bytes([i]) + b"pdf")
    manifest = tmp_path / "m.jsonl"
    manifest.write_text(
        "\n".join(
            json.dumps({"file_name": f"{i:07d}.pdf", "url": f"http://{i}"})
            for i in range(5)  # 5th is missing on disk -> dropped
        )
    )
    mdf = P.pdf_manifest_df(spark, str(manifest), pdfs_per_task=2)
    assert mdf.count() == 5
    assert mdf.where("partition_index = 2").count() == 1
    out = P.pdf_preprocess(
        mdf.repartition(2, "partition_index"),
        renderer=_fake_renderer,
        pdf_dir=str(tmp_path),
    ).toPandas().sort_values(["sample_id", "position"]).reset_index(drop=True)
    # doc i renders (i % 3) + 1 pages; missing 0000004.pdf dropped
    assert len(out) == sum((i % 3) + 1 for i in range(4))
    first = out.iloc[0]
    assert first["modality"] == "page_image"
    assert first["content_type"] == "image/png"
    w, h, c, px = decode_png(first["binary_content"])
    assert (w, h, c) == (6, 8, 3) and px[0] == 0
    assert first["text_content"] == ""


def test_pdf_preprocess_jsonl_mode(spark, tmp_path):
    path, offsets = _write_jsonl_pdfs(tmp_path, [b"\x05pdfA", b"\x07pdfB"])
    manifest = tmp_path / "m.jsonl"
    manifest.write_text(
        "\n".join(
            json.dumps(
                {"file_name": f"doc{i}.pdf", "jsonl_file": "pdfs.jsonl",
                 "byte_offset": offsets[i]}
            )
            for i in range(2)
        )
    )
    mdf = P.pdf_manifest_df(spark, str(manifest))
    out = P.pdf_preprocess(
        mdf, renderer=_fake_renderer, jsonl_base_dir=str(tmp_path)
    ).toPandas()
    # 0x05 % 3 + 1 = 3 pages, 0x07 % 3 + 1 = 2 pages
    assert len(out) == 5
    assert set(out["sample_id"]) == {"doc0", "doc1"}

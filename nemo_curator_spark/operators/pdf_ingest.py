"""PDF ingestion for the Nemotron-Parse interleaved pipeline — the
deterministic halves of the reference's partitioning / preprocess /
assembly stages (stages/interleaved/pdf/nemotron_parse/partitioning.py:
29-140, preprocess.py:41-245, utils.py:338-532).

What is real here (no external deps):

* **manifest partitioning** — JSONL manifest parse with both the
  single-``file_name`` and CC-MAIN ``cc_pdf_file_names`` shapes, stable
  per-line de-dup, ``max_pdfs`` cap and ``pdfs_per_task`` batching
  (partitioning.py:85-140), as plain python and as a Spark planning form;
* **PDF byte acquisition** — the CC-MAIN two-level zip layout resolver
  and zip member read (utils.py:432-471), base64-JSONL extraction by
  ``byte_offset`` (O(1) seek) or legacy ``line_idx`` scan
  (utils.py:474-504), and the batched one-open-per-file fetch grouped by
  source JSONL (utils.py:507-532, preprocess.py:111-146);
* **canvas / crop math** — the model processor's resize-then-center-pad
  canvas (utils.py:178-219; cv2 INTER_LINEAR re-implemented as the
  half-pixel-center clamped bilinear the repo uses elsewhere) and the
  normalized-bbox crop with the degenerate-crop guard (utils.py:222-243);
* **interleaved row assembly** — ``build_interleaved_rows``
  (utils.py:338-424): the leading metadata row, per-element modality /
  content-type mapping (Picture -> image crop bytes, Table ->
  text/markdown, else text/markdown), reading-order restore for v1.1
  outputs, and the running ``position`` counter. Crops are serialized
  with the repo's real stdlib PNG encoder, matching the reference's
  ``image/png`` contract;
* **render-with-timeout contract** — fork a child process, drain the
  result queue BEFORE joining (preprocess.py:150-191 documents the
  pipe-deadlock this avoids), kill on timeout.

The one non-ported piece is ``render_pdf_pages`` itself (pypdfium2):
every entry point takes an injectable ``renderer`` and the default
raises ``NotImplementedError`` naming that plug point.

Spark shape: partition planning is driver-side bookkeeping over a tiny
manifest (same as the reference's ``num_workers() == 1`` stage); page
rendering + assembly run as ONE ``mapInPandas`` pass per file-group so
PDF bytes and page images never cross a shuffle.
"""

from __future__ import annotations

import base64
import contextlib
import json
import os
import zipfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .pdf_parse import interleave_floaters, parse_nemotron_output

DEFAULT_MIN_CROP_PX = 10
DEFAULT_MAX_PAGES = 50

# ---------------------------------------------------------------------------
# Manifest partitioning (partitioning.py:85-140)
# ---------------------------------------------------------------------------


def parse_pdf_manifest(
    manifest_path: str,
    file_name_field: str = "file_name",
    file_names_field: str = "cc_pdf_file_names",
    url_field: str = "url",
    max_pdfs: int | None = None,
) -> list[str]:
    """partitioning.py:85-122: one JSON-serialized entry per PDF.

    CC-MAIN lines (``cc_pdf_file_names`` list) expand to one entry per
    filename with no extra fields; single-file lines preserve their extra
    fields (``jsonl_file``, ``byte_offset``, ...). Within a line,
    filenames are de-duplicated stably; empty names are dropped; lines
    with neither field are skipped. ``max_pdfs`` truncates (checked after
    each line, like the reference).
    """
    entries: list[str] = []
    with open(manifest_path) as f:
        for raw_line in f:
            line = raw_line.strip()
            if not line:
                continue
            record = json.loads(line)
            url = record.get(url_field, "")
            if file_names_field in record:
                file_names = record[file_names_field]
                extra: dict = {}
            elif file_name_field in record:
                file_names = [record[file_name_field]]
                extra = {
                    k: v
                    for k, v in record.items()
                    if k not in (file_name_field, url_field, file_names_field)
                }
            else:
                continue
            for fname in dict.fromkeys(file_names):
                if not fname:
                    continue
                entries.append(json.dumps({"file_name": fname, "url": url, **extra}))
            if max_pdfs and len(entries) >= max_pdfs:
                entries = entries[:max_pdfs]
                break
    return entries


def partition_pdf_manifest(
    manifest_path: str,
    pdfs_per_task: int = 10,
    **parse_kw,
) -> list[list[str]]:
    """partitioning.py:124-140: pack entries into groups of
    ``pdfs_per_task`` in manifest order; group ``i`` holds entries
    ``[i*n, (i+1)*n)``."""
    entries = parse_pdf_manifest(manifest_path, **parse_kw)
    return [
        entries[i : i + pdfs_per_task]
        for i in range(0, len(entries), pdfs_per_task)
    ]


def pdf_manifest_df(
    spark: SparkSession,
    manifest_path: str,
    pdfs_per_task: int = 10,
    **parse_kw,
) -> DataFrame:
    """Spark planning form: one row per PDF entry with its task
    assignment — (entry_idx, partition_index, file_name, url, entry_json).
    Driver-side parse of the (tiny) manifest, exactly like the
    reference's dedicated single-worker partitioning stage."""
    entries = parse_pdf_manifest(manifest_path, **parse_kw)
    rows = []
    for i, e in enumerate(entries):
        rec = json.loads(e)
        rows.append(
            (i, i // pdfs_per_task, rec["file_name"], rec.get("url", ""), e)
        )
    schema = T.StructType(
        [
            T.StructField("entry_idx", T.IntegerType()),
            T.StructField("partition_index", T.IntegerType()),
            T.StructField("file_name", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("entry_json", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# PDF byte acquisition (utils.py:432-532, preprocess.py:91-146)
# ---------------------------------------------------------------------------


def resolve_cc_pdf_zip_path(file_name: str, zip_base_dir: str) -> tuple[str, str]:
    """utils.py:432-455: ``0001234.pdf`` lives in
    ``<base>/0000-0999/0001.zip`` (two-level thousand grouping)."""
    num = int(file_name.replace(".pdf", ""))
    zip_num = num // 1000
    group_start = (zip_num // 1000) * 1000
    return (
        os.path.join(
            zip_base_dir,
            f"{group_start:04d}-{group_start + 999:04d}",
            f"{zip_num:04d}.zip",
        ),
        file_name,
    )


def extract_pdf_from_zip(file_name: str, zip_base_dir: str) -> bytes | None:
    """utils.py:458-471: None on unresolvable name / missing archive /
    missing member / corrupt zip."""
    try:
        zip_path, member = resolve_cc_pdf_zip_path(file_name, zip_base_dir)
    except ValueError:
        return None
    try:
        with zipfile.ZipFile(zip_path, "r") as zf:
            return zf.read(member)
    except (OSError, KeyError, zipfile.BadZipFile):
        return None


def extract_pdf_from_jsonl(
    jsonl_file: str,
    line_idx: int | None = None,
    byte_offset: int | None = None,
) -> bytes | None:
    """utils.py:474-504: base64 ``content`` field; byte_offset is the
    O(1) fast path, line_idx the legacy O(N) scan; None when both are
    absent or anything fails."""
    try:
        if byte_offset is not None:
            with open(jsonl_file, "rb") as f:
                f.seek(byte_offset)
                record = json.loads(f.readline())
                return base64.b64decode(record["content"])
        if line_idx is not None:
            with open(jsonl_file) as f:
                for i, line in enumerate(f):
                    if i == line_idx:
                        return base64.b64decode(json.loads(line)["content"])
    except Exception:  # noqa: BLE001 — reference contract: None on any error
        return None
    return None


def extract_pdfs_from_jsonl_batch(
    jsonl_file: str, offsets: list[int]
) -> dict[int, bytes | None]:
    """utils.py:507-532: one open, seeks in sorted offset order;
    offset -> bytes (None per-entry on parse error, all-None when the
    file itself cannot be opened)."""
    results: dict[int, bytes | None] = {}
    try:
        with open(jsonl_file, "rb") as f:
            for offset in sorted(offsets):
                result: bytes | None = None
                with contextlib.suppress(Exception):
                    f.seek(offset)
                    result = base64.b64decode(json.loads(f.readline())["content"])
                results[offset] = result
    except OSError:
        for offset in offsets:
            results[offset] = None
    return results


def batch_fetch_jsonl(
    entries: list[dict], jsonl_base_dir: str
) -> dict[int, bytes | None]:
    """preprocess.py:111-146: group byte_offset entries by source JSONL
    (ONE file open each), legacy line_idx entries fall back to the
    single-entry path; returns entry-position -> bytes."""
    by_file: dict[str, list[tuple[int, int]]] = {}
    fallback: list[int] = []
    for idx, entry in enumerate(entries):
        if "byte_offset" in entry:
            path = os.path.join(jsonl_base_dir, entry["jsonl_file"])
            by_file.setdefault(path, []).append((idx, entry["byte_offset"]))
        else:
            fallback.append(idx)
    results: dict[int, bytes | None] = {}
    for path, idx_offset_pairs in by_file.items():
        fetched = extract_pdfs_from_jsonl_batch(
            path, [off for _, off in idx_offset_pairs]
        )
        for idx, off in idx_offset_pairs:
            results[idx] = fetched.get(off)
    for idx in fallback:
        entry = entries[idx]
        path = os.path.join(jsonl_base_dir, entry["jsonl_file"])
        results[idx] = extract_pdf_from_jsonl(path, line_idx=entry.get("line_idx"))
    return results


def get_pdf_bytes(
    file_name: str,
    entry: dict | None = None,
    zip_base_dir: str | None = None,
    pdf_dir: str | None = None,
    jsonl_base_dir: str | None = None,
) -> bytes | None:
    """preprocess.py:91-109: zip mode > jsonl mode > directory mode;
    raises when no mode is configured."""
    if zip_base_dir is not None:
        return extract_pdf_from_zip(file_name, zip_base_dir)
    if jsonl_base_dir is not None and entry is not None:
        return extract_pdf_from_jsonl(
            os.path.join(jsonl_base_dir, entry["jsonl_file"]),
            line_idx=entry.get("line_idx"),
            byte_offset=entry.get("byte_offset"),
        )
    if pdf_dir is not None:
        try:
            with open(os.path.join(pdf_dir, file_name), "rb") as f:
                return f.read()
        except OSError:
            return None
    msg = "One of zip_base_dir, pdf_dir, or jsonl_base_dir must be set"
    raise ValueError(msg)


# ---------------------------------------------------------------------------
# Canvas / crop math (utils.py:41-58, 178-243)
# ---------------------------------------------------------------------------


def render_scale_to_fit(
    page_w: float,
    page_h: float,
    base_scale: float,
    max_wh: tuple[int, int] | None,
) -> float:
    """utils.py:41-58: cap the render scale with the fit-to-box formula
    ``min(target_w/page_w, target_h/page_h)`` clamped to >= 1e-3;
    degenerate targets/pages return base_scale unchanged."""
    if max_wh is None:
        return base_scale
    target_w, target_h = max_wh
    if target_w <= 0 or target_h <= 0 or page_w <= 0.0 or page_h <= 0.0:
        return base_scale
    fit_scale = max(min(target_w / page_w, target_h / page_h), 1e-3)
    return min(base_scale, fit_scale)


def _resize_linear_to(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """cv2.resize INTER_LINEAR to an explicit size: the shared exact
    float core (multimodal.resize_linear_float — half-pixel-center map,
    clamped bilinear), rounded half up to uint8 (the repo's
    exact-cv2-formula policy)."""
    from nemo_curator_spark.operators.multimodal import resize_linear_float

    out = np.floor(resize_linear_float(img, new_w, new_h) + 0.5).astype(
        np.uint8
    )
    return out[:, :, 0] if img.ndim == 2 else out


def build_canvas(page_img: np.ndarray, proc_size: tuple[int, int]) -> np.ndarray:
    """utils.py:178-219: shrink-to-fit preserving aspect ratio (height
    first, then width, both with int() truncation like the reference),
    then center-pad with white to exactly ``proc_size`` (h, w)."""
    proc_h, proc_w = proc_size
    orig_h, orig_w = page_img.shape[:2]
    arr = page_img
    ar = orig_w / orig_h
    new_h, new_w = orig_h, orig_w
    if new_h > proc_h:
        new_h = proc_h
        new_w = int(new_h * ar)
    if new_w > proc_w:
        new_w = proc_w
        new_h = int(new_w / ar)
    if (new_w, new_h) != (orig_w, orig_h):
        arr = _resize_linear_to(arr, new_w, new_h)
    pad_h = max(0, proc_h - arr.shape[0])
    pad_w = max(0, proc_w - arr.shape[1])
    if pad_h > 0 or pad_w > 0:
        pad_spec = [(pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2)]
        if arr.ndim == 3:
            pad_spec.append((0, 0))
        arr = np.pad(arr, pad_spec, mode="constant", constant_values=255)
    return arr


def crop_to_bbox(
    canvas: np.ndarray,
    bbox: list[float] | None,
    proc_size: tuple[int, int],
    min_crop_px: int = DEFAULT_MIN_CROP_PX,
) -> np.ndarray | None:
    """utils.py:222-243: normalized bbox -> pixel crop on the padded
    canvas; coordinates are int-truncated, min/max-normalized and
    clamped; None when either side is under ``min_crop_px``."""
    if bbox is None:
        return canvas
    proc_h, proc_w = proc_size
    x0, y0 = int(bbox[0] * proc_w), int(bbox[1] * proc_h)
    x1, y1 = int(bbox[2] * proc_w), int(bbox[3] * proc_h)
    x0, x1 = max(0, min(x0, x1)), min(proc_w, max(x0, x1))
    y0, y1 = max(0, min(y0, y1)), min(proc_h, max(y0, y1))
    if x1 - x0 < min_crop_px or y1 - y0 < min_crop_px:
        return None
    return canvas[y0:y1, x0:x1]


# ---------------------------------------------------------------------------
# Interleaved row assembly (utils.py:338-424)
# ---------------------------------------------------------------------------

_FLOATER_CLASSES = ("Picture", "Caption")


def build_interleaved_rows(
    sample_id: str,
    url: str,
    pdf_name: str,
    page_images: list[np.ndarray],
    page_outputs: list[str],
    proc_size: tuple[int, int] = (2048, 1664),
    reorder_floaters: bool = True,
    min_crop_px: int = DEFAULT_MIN_CROP_PX,
) -> list[dict]:
    """utils.py:338-424: leading metadata row (position -1) then one row
    per parsed element with the running position counter. Pictures crop
    the canvas (skipped when degenerate) and serialize as real PNG
    bytes; Tables and text classes carry text/markdown."""
    from .multimodal import encode_png

    rows: list[dict] = [
        {
            "sample_id": sample_id,
            "position": -1,
            "modality": "metadata",
            "content_type": "application/json",
            "text_content": json.dumps(
                {"url": url, "pdf_name": pdf_name, "num_pages": len(page_images)}
            ),
            "binary_content": None,
            "source_ref": None,
            "url": url,
            "page_number": None,
            "pdf_name": pdf_name,
            "element_class": None,
        }
    ]
    position = 0
    for page_num, (page_img, raw_output) in enumerate(
        zip(page_images, page_outputs)
    ):
        canvas = build_canvas(page_img, proc_size)
        elements = parse_nemotron_output(raw_output)
        if reorder_floaters:
            anchored = [e for e in elements if e["class"] not in _FLOATER_CLASSES]
            floaters = [e for e in elements if e["class"] in _FLOATER_CLASSES]
            elements = interleave_floaters(anchored, floaters)
        for elem in elements:
            cls = elem["class"]
            bbox = elem.get("bbox")
            source_ref = json.dumps({"page": page_num, "bbox": bbox})
            if cls == "Picture":
                cropped = crop_to_bbox(canvas, bbox, proc_size, min_crop_px)
                if cropped is None:
                    continue
                modality, content_type = "image", "image/png"
                binary, text = encode_png(cropped), elem.get("text")
            elif cls == "Table":
                modality, content_type = "table", "text/markdown"
                binary, text = None, elem["text"]
            else:
                modality, content_type = "text", "text/markdown"
                binary, text = None, elem["text"]
            rows.append(
                {
                    "sample_id": sample_id,
                    "position": position,
                    "modality": modality,
                    "content_type": content_type,
                    "text_content": text,
                    "binary_content": binary,
                    "source_ref": source_ref,
                    "url": url,
                    "page_number": page_num,
                    "pdf_name": pdf_name,
                    "element_class": cls,
                }
            )
            position += 1
    return rows


# ---------------------------------------------------------------------------
# Preprocess stage (preprocess.py:148-245)
# ---------------------------------------------------------------------------


def _no_renderer(pdf_bytes: bytes, dpi: int, max_pages: int) -> list[np.ndarray]:
    raise NotImplementedError(
        "PDF page rendering requires pypdfium2 (reference utils.py:103-138) "
        "— inject a renderer(pdf_bytes, dpi, max_pages) -> list[HxWx3 "
        "uint8] into PdfPreprocess / render_with_timeout"
    )


def render_with_timeout(
    pdf_bytes: bytes,
    file_name: str,
    renderer=_no_renderer,
    dpi: int = 300,
    max_pages: int = DEFAULT_MAX_PAGES,
    timeout_s: int = 60,
) -> list[np.ndarray]:
    """preprocess.py:148-191: process-based render timeout (SIGALRM is
    unavailable off the main thread — same constraint under Spark's
    Python workers). The result queue is drained BEFORE join: joining
    first deadlocks when the child's queue feeder blocks on a full pipe
    (50 pages at 300 DPI overflows it), making the timeout fire on a
    perfectly valid render."""
    import multiprocessing

    ctx = multiprocessing.get_context("fork")
    result_q = ctx.Queue()

    def _worker() -> None:
        try:
            result_q.put(renderer(pdf_bytes, dpi, max_pages))
        except Exception:  # noqa: BLE001 — reference contract: empty on error
            result_q.put([])

    proc = ctx.Process(target=_worker)
    proc.start()
    try:
        pages = result_q.get(timeout=timeout_s)
    except Exception:  # noqa: BLE001
        pages = []
    proc.join(timeout=2)
    if proc.is_alive():
        proc.kill()
        proc.join()
    return pages


PAGE_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.StringType()),
        T.StructField("position", T.IntegerType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("text_content", T.StringType()),
        T.StructField("binary_content", T.BinaryType()),
        T.StructField("source_ref", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("pdf_name", T.StringType()),
    ]
)


def pdf_preprocess(
    manifest_df: DataFrame,
    renderer=_no_renderer,
    zip_base_dir: str | None = None,
    pdf_dir: str | None = None,
    jsonl_base_dir: str | None = None,
    dpi: int = 300,
    max_pages: int = DEFAULT_MAX_PAGES,
    use_timeout: bool = False,
) -> DataFrame:
    """preprocess.py:193-245 as ONE ``mapInPandas`` pass over the
    planning rows from :func:`pdf_manifest_df`: fetch bytes (jsonl-mode
    entries batch-fetched with one open per source file), render via the
    injectable renderer, emit one row per page with the PNG-encoded page
    image in ``binary_content`` and empty ``text_content`` (the VLM
    inference stage's input contract). Unreadable PDFs and empty renders
    are dropped, like the reference. Page bytes are produced inside the
    scan partition and never cross a shuffle."""
    from .multimodal import encode_png

    def gen(it):
        # Concat the partition's Arrow batches first so the jsonl-mode
        # batch fetch opens each source file once per PARTITION, not once
        # per Arrow batch (CLAUDE.md mapInPandas grouping lesson).
        frames = list(it)
        if frames:
            whole = pd.concat(frames) if len(frames) > 1 else frames[0]
            entries = [json.loads(e) for e in whole["entry_json"]]
            jsonl_bytes = (
                batch_fetch_jsonl(entries, jsonl_base_dir)
                if jsonl_base_dir is not None
                else None
            )
            rows = []
            for idx, entry in enumerate(entries):
                file_name = entry["file_name"]
                url = entry.get("url", "")
                sample_id = file_name.rsplit(".", 1)[0]
                if jsonl_bytes is not None:
                    pdf_bytes = jsonl_bytes.get(idx)
                else:
                    pdf_bytes = get_pdf_bytes(
                        file_name,
                        entry=entry,
                        zip_base_dir=zip_base_dir,
                        pdf_dir=pdf_dir,
                        jsonl_base_dir=jsonl_base_dir,
                    )
                if pdf_bytes is None:
                    continue
                if use_timeout:
                    page_images = render_with_timeout(
                        pdf_bytes, file_name, renderer, dpi, max_pages
                    )
                else:
                    try:
                        page_images = renderer(pdf_bytes, dpi, max_pages)
                    except NotImplementedError:
                        raise
                    except Exception:  # noqa: BLE001
                        page_images = []
                for page_num, img in enumerate(page_images):
                    rows.append(
                        (
                            sample_id,
                            page_num,
                            "page_image",
                            "image/png",
                            "",
                            encode_png(img),
                            None,
                            url,
                            file_name,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in PAGE_SCHEMA.fields])

    return manifest_df.mapInPandas(gen, PAGE_SCHEMA)

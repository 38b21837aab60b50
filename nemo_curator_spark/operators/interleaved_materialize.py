"""Interleaved binary materialization + schema utilities (reference
``stages/interleaved/utils/materialization.py``, ``schema.py``,
``validation_utils.py``, ``image_utils.py`` and
``tasks/interleaved.py:176-243``).

Interleaved rows carry a ``source_ref`` JSON locator instead of bytes;
materialization fills ``binary_content`` for image rows by the cheapest
available I/O strategy (materialization.py:338-378):

* ``path`` + ``byte_offset``/``byte_size`` → **range read** (one seek,
  the fastest; identical (path, offset, size) tuples are fetched ONCE
  and shared across rows — materialization.py:226-257),
* ``path`` + ``member`` without a range → **tar extract** (each tar
  opened once per batch, members cached — :120-154),
* ``path`` alone → **direct read** (file bytes shared across rows —
  :260-274),
* missing path → ``materialize_error = "missing path"``.

fsspec (remote URIs) and PIL (multi-frame TIFF extraction) are the plug
points — local filesystem I/O uses the stdlib, and the TIFF magic check
routes non-TIFF payloads through unchanged exactly as the reference's
PIL path does. Error strings match the reference byte-for-byte so
downstream filters on ``materialize_error`` behave identically.

Spark shape: one mapInPandas pass; rows stay on their partitions and
bytes are BORN on the scan partition — never shuffled. Group rows by
tar path upstream (the webdataset reader already yields one task per
tar) so each worker opens a tar once.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Exact columns added by parse (materialization.py:32-34): drop only
# these, never everything prefixed "_src_" (user passthrough safety).
SRC_PARSE_COLS = (
    "_src_path",
    "_src_member",
    "_src_byte_offset",
    "_src_byte_size",
    "_src_frame_index",
)

# Canonical interleaved schema (tasks/interleaved.py:55-66).
INTERLEAVED_SCHEMA = pa.schema(
    [
        pa.field("sample_id", pa.string(), nullable=False),
        pa.field("position", pa.int32(), nullable=False),
        pa.field("modality", pa.string(), nullable=False),
        pa.field("content_type", pa.string(), nullable=True),
        pa.field("text_content", pa.string(), nullable=True),
        pa.field("binary_content", pa.large_binary(), nullable=True),
        pa.field("source_ref", pa.string(), nullable=True),
        pa.field("materialize_error", pa.string(), nullable=True),
    ]
)

RESERVED_COLUMNS = frozenset(INTERLEAVED_SCHEMA.names)


# --- source_ref locator contract (tasks/interleaved.py:176-216) ------------


def build_source_ref(
    path,
    member,
    byte_offset=None,
    byte_size=None,
    frame_index=None,
) -> str:
    """JSON locator with the reference's exact key set and ordering;
    ``frame_index`` appears only when not None."""
    ref = {
        "path": path,
        "member": member,
        "byte_offset": byte_offset,
        "byte_size": byte_size,
    }
    if frame_index is not None:
        ref["frame_index"] = frame_index
    return json.dumps(ref, ensure_ascii=True)


def parse_source_ref(source_value) -> dict:
    """None/NaN/"" → all-None locator; otherwise JSON object with str
    paths/members and int offsets (tasks/interleaved.py:195-216)."""
    if source_value is None or (
        isinstance(source_value, float) and pd.isna(source_value)
    ) or source_value == "":
        return {
            "path": None,
            "member": None,
            "byte_offset": None,
            "byte_size": None,
            "frame_index": None,
        }
    parsed = json.loads(source_value)
    if not isinstance(parsed, dict):
        msg = "source_ref must decode to a JSON object"
        raise TypeError(msg)
    path = parsed.get("path")
    member = parsed.get("member")
    byte_offset = parsed.get("byte_offset")
    byte_size = parsed.get("byte_size")
    frame_index = parsed.get("frame_index")
    return {
        "path": path if path is None else str(path),
        "member": member if member is None else str(member),
        "byte_offset": int(byte_offset) if byte_offset is not None else None,
        "byte_size": int(byte_size) if byte_size is not None else None,
        "frame_index": int(frame_index) if frame_index is not None else None,
    }


def with_parsed_source_ref_columns(
    pdf: pd.DataFrame, prefix: str = "_src_"
) -> pd.DataFrame:
    """tasks/interleaved.py:218-243: parse every source_ref into five
    ``{prefix}*`` columns on a copy."""
    df = pdf.copy()
    parsed = [parse_source_ref(v) for v in df["source_ref"].tolist()]
    parsed_df = pd.DataFrame.from_records(
        parsed,
        columns=["path", "member", "byte_offset", "byte_size", "frame_index"],
    )
    for col in parsed_df.columns:
        df[f"{prefix}{col}"] = parsed_df[col].to_numpy(copy=False)
    return df


# --- row classification (materialization.py:53-94) -------------------------


def classify_rows(df: pd.DataFrame, image_mask: pd.Series):
    """Partition pending image rows into the three I/O strategy groups
    + missing, with the reference's exact precedence (range beats tar
    extract only when byte_size > 0)."""
    tar_extract: dict = {}
    range_read: dict = {}
    direct_read: dict = {}
    missing: list = []
    for idx in df[image_mask].index:
        path = df.loc[idx, "_src_path"]
        if path is None or (isinstance(path, float) and pd.isna(path)) or path == "":
            missing.append(idx)
            continue
        path_str = str(path)
        raw_member = df.loc[idx, "_src_member"]
        has_member = raw_member not in (None, "") and pd.notna(raw_member)
        if not has_member:
            direct_read.setdefault(path_str, []).append(idx)
            continue
        member_str = str(raw_member)
        frame_idx = None
        if "_src_frame_index" in df.columns:
            v = df.loc[idx, "_src_frame_index"]
            if v is not None and not (isinstance(v, float) and pd.isna(v)):
                frame_idx = int(v)
        raw_offset = df.loc[idx, "_src_byte_offset"]
        raw_size = df.loc[idx, "_src_byte_size"]
        has_range = (
            raw_offset is not None
            and raw_size is not None
            and pd.notna(raw_offset)
            and pd.notna(raw_size)
        )
        if has_range and int(raw_size) > 0:
            range_read.setdefault(path_str, []).append(
                (idx, member_str, int(raw_offset), int(raw_size), frame_idx)
            )
        else:
            tar_extract.setdefault(path_str, []).append(
                (idx, member_str, frame_idx)
            )
    return tar_extract, range_read, direct_read, missing


# --- TIFF frame extraction (materialization.py:97-117) ---------------------

_TIFF_MAGICS = (b"II*\x00", b"MM\x00*")


def extract_tiff_frame(tiff_bytes: bytes, frame_index: int):
    """PIL path when importable (exact reference behavior: re-encode the
    selected frame as single-frame TIFF, no source-compression reuse);
    without PIL, non-TIFF payloads pass through unchanged (the
    reference's ``img.format != "TIFF"`` branch, decided here by magic
    bytes) and TIFF payloads return None (decode is the plug point)."""
    try:
        from PIL import Image as _Image  # noqa: PLC0415
    except ImportError:
        if tiff_bytes[:4] not in _TIFF_MAGICS:
            return tiff_bytes
        return None
    try:
        with _Image.open(io.BytesIO(tiff_bytes)) as img:
            if img.format != "TIFF":
                return tiff_bytes
            if frame_index >= getattr(img, "n_frames", 1):
                return None
            img.seek(frame_index)
            frame = img.copy()
        buf = io.BytesIO()
        frame.save(buf, format="TIFF")
        return buf.getvalue()
    except (OSError, SyntaxError, ValueError):
        return None


# --- I/O strategies --------------------------------------------------------


def _open_binary(path: str, storage_options: dict):
    """Local paths via stdlib; non-local URIs need fsspec (plug point)."""
    if "://" in path and not path.startswith("file://"):
        import fsspec  # noqa: PLC0415 — remote storage plug point

        return fsspec.open(path, mode="rb", **storage_options).open()
    return open(path.removeprefix("file://"), "rb")


def fill_tar_extract_rows(
    groups, storage_options, binary_values, error_values
) -> None:
    """materialization.py:120-154, exact: one tar open per path, member
    payloads cached, per-member 'missing member' errors, whole-path
    'failed to read path' on open errors."""
    for path, keyed_rows in groups.items():
        key_cache: dict = {}
        try:
            with _open_binary(path, storage_options) as fobj, tarfile.open(
                fileobj=fobj, mode="r:*"
            ) as tf:
                for idx, member, frame_idx in keyed_rows:
                    if member not in key_cache:
                        try:
                            extracted = tf.extractfile(member)
                        except KeyError:
                            extracted = None
                        key_cache[member] = (
                            extracted.read() if extracted is not None else None
                        )
                    payload = key_cache[member]
                    if payload is None:
                        error_values[idx] = f"missing member '{member}'"
                        continue
                    if frame_idx is not None:
                        payload = extract_tiff_frame(payload, frame_idx)
                        if payload is None:
                            error_values[idx] = (
                                f"failed to extract frame {frame_idx} "
                                f"from '{member}'"
                            )
                            continue
                    binary_values[idx] = payload
                    error_values[idx] = None
        except (OSError, tarfile.TarError):
            for idx, *_ in keyed_rows:
                error_values[idx] = "failed to read path"


def fill_range_read_rows(
    groups, storage_options, binary_values, error_values
) -> None:
    """materialization.py:183-257: identical (path, offset, size)
    tuples are read once and scattered to every referencing row; local
    reads are one seek+read each (fsspec ``cat_ranges`` is the remote
    batch path)."""
    unique_ranges: dict = {}
    for path, entries in groups.items():
        for idx, member, offset, size, frame_idx in entries:
            unique_ranges.setdefault((path, offset, size), []).append(
                (idx, member, frame_idx)
            )
    # cache open handles so one file's ranges share a descriptor
    handles: dict = {}
    try:
        for (path, offset, size), rows in unique_ranges.items():
            try:
                if path not in handles:
                    handles[path] = _open_binary(path, storage_options)
                fobj = handles[path]
                fobj.seek(offset)
                blob = fobj.read(size)
            except (OSError, RuntimeError, ValueError):
                for idx, member, _fi in rows:
                    error_values[idx] = (
                        f"range read error for member '{member}'"
                    )
                continue
            if not blob:
                for idx, member, _fi in rows:
                    error_values[idx] = (
                        f"empty range read for member '{member}'"
                    )
                continue
            for idx, member, frame_idx in rows:
                payload = (
                    extract_tiff_frame(blob, frame_idx)
                    if frame_idx is not None
                    else blob
                )
                if payload is None:
                    error_values[idx] = (
                        f"failed to extract frame {frame_idx} from '{member}'"
                    )
                else:
                    binary_values[idx] = payload
                    error_values[idx] = None
    finally:
        for fobj in handles.values():
            try:
                fobj.close()
            except OSError:
                pass


def fill_direct_read_rows(
    groups, storage_options, binary_values, error_values
) -> None:
    """materialization.py:260-282: each file read once, bytes shared."""
    for path, row_idxs in groups.items():
        try:
            with _open_binary(path, storage_options) as fobj:
                payload = fobj.read()
        except (OSError, RuntimeError, ValueError):
            payload = None
        for idx in row_idxs:
            if payload is not None:
                binary_values[idx] = payload
                error_values[idx] = None
            else:
                error_values[idx] = "failed to read path"


def materialize_pdf(
    pdf: pd.DataFrame,
    *,
    storage_options: dict | None = None,
    only_missing_binary: bool = True,
    image_content_types=None,
) -> pd.DataFrame:
    """materialization.py:285-378 over one pandas frame: parse refs,
    mask image rows (optionally restricted by content_type / already
    materialized), dispatch the three strategies, drop the parse
    columns, attach ``binary_content`` + ``materialize_error``."""
    df = with_parsed_source_ref_columns(pdf).reset_index(drop=True)
    if df.empty:
        return pdf
    error_values = (
        df["materialize_error"].astype("object").tolist()
        if "materialize_error" in df.columns
        else [None] * len(df)
    )
    binary_values = (
        df["binary_content"].astype("object").tolist()
        if "binary_content" in df.columns
        else [None] * len(df)
    )
    image_mask = (
        (df["modality"] == "image")
        if "modality" in df.columns
        else pd.Series(False, index=df.index, dtype=bool)
    )
    if image_content_types is not None and "content_type" in df.columns:
        image_mask &= df["content_type"].isin(image_content_types)
    if only_missing_binary and "binary_content" in df.columns:
        image_mask &= df["binary_content"].isna()

    if image_mask.any():
        tar_extract, range_read, direct_read, missing = classify_rows(
            df, image_mask
        )
        for idx in missing:
            error_values[idx] = "missing path"
        so = storage_options or {}
        fill_tar_extract_rows(tar_extract, so, binary_values, error_values)
        fill_range_read_rows(range_read, so, binary_values, error_values)
        fill_direct_read_rows(direct_read, so, binary_values, error_values)

    out = df.drop(columns=[c for c in SRC_PARSE_COLS if c in df.columns])
    out["binary_content"] = pd.Series(binary_values, dtype="object")
    out["materialize_error"] = pd.Series(error_values, dtype="object")
    return out


def materialize_binary_content(
    df: DataFrame,
    *,
    storage_options: dict | None = None,
    only_missing_binary: bool = True,
    image_content_types=None,
) -> DataFrame:
    """The Spark stage: one mapInPandas pass filling image-row bytes
    from source refs. No shuffle — bytes are created on the partition
    that will consume them; per-batch tar/member/range caches give the
    reference's open-once semantics when the reader keeps one tar per
    task (io/webdataset.py does)."""
    fields = [
        f
        for f in df.schema.fields
        if f.name not in ("binary_content", "materialize_error")
    ]
    fields.append(T.StructField("binary_content", T.BinaryType()))
    fields.append(T.StructField("materialize_error", T.StringType()))
    out_schema = T.StructType(fields)
    names = [f.name for f in fields]

    def _run(batches):
        for pdf in batches:
            out = materialize_pdf(
                pdf,
                storage_options=storage_options,
                only_missing_binary=only_missing_binary,
                image_content_types=image_content_types,
            )
            yield out[names]

    return df.mapInPandas(_run, schema=out_schema)


# --- schema utilities (schema.py) ------------------------------------------

_LARGE_COMPAT = {
    (pa.large_string(), pa.string()): pa.large_string(),
    (pa.large_binary(), pa.binary()): pa.large_binary(),
}


def reconcile_schema(inferred: pa.Schema) -> pa.Schema:
    """schema.py:34-51: canonical types for reserved columns (keeping
    large_* where the data already is large — no unsafe downcast),
    inferred types for passthrough, dictionary encoding unwrapped."""
    canonical = {f.name: f for f in INTERLEAVED_SCHEMA}
    fields = []
    for f in inferred:
        if f.name not in canonical:
            col_type = (
                f.type.value_type if pa.types.is_dictionary(f.type) else f.type
            )
            fields.append(pa.field(f.name, col_type, nullable=f.nullable))
            continue
        target = canonical[f.name]
        resolved_type = _LARGE_COMPAT.get((f.type, target.type), target.type)
        fields.append(pa.field(f.name, resolved_type, nullable=target.nullable))
    return pa.schema(fields)


def resolve_schema(schema, overrides):
    """schema.py:54-77: explicit schema wins (overrides ignored);
    overrides merge onto the canonical schema preserving nullability
    and metadata; both None → None."""
    if schema is not None:
        return schema
    if overrides:
        fields = {f.name: f for f in INTERLEAVED_SCHEMA}
        for name, dtype in overrides.items():
            orig = fields.get(name)
            nullable = orig.nullable if orig is not None else True
            metadata = orig.metadata if orig is not None else None
            fields[name] = pa.field(
                name, dtype, nullable=nullable, metadata=metadata
            )
        return pa.schema(list(fields.values()))
    return None


def align_table(table: pa.Table, target: pa.Schema) -> pa.Table:
    """schema.py:80-110: pad missing target columns with nulls, drop
    extras, reorder, cast — reserved columns may downcast large↔small
    (safe=False), passthrough columns keep safe=True so overflow errors
    surface."""
    existing = set(table.schema.names)
    arrays = []
    for field in target:
        if field.name in existing:
            col = table.column(field.name)
            if col.type != field.type:
                if field.name in RESERVED_COLUMNS:
                    safe = not (
                        (
                            pa.types.is_large_string(col.type)
                            and pa.types.is_string(field.type)
                        )
                        or (
                            pa.types.is_large_binary(col.type)
                            and pa.types.is_binary(field.type)
                        )
                    )
                else:
                    safe = True
                col = col.cast(field.type, safe=safe)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(table.num_rows, type=field.type))
    return pa.table(arrays, schema=target)


def align_interleaved_table(table: pa.Table, schema=None) -> pa.Table:
    """schema.py:113-122."""
    if schema is not None:
        return align_table(table, schema)
    return table.cast(reconcile_schema(table.schema))


# --- validation utils (validation_utils.py) --------------------------------


def resolve_storage_options(metadata=None, io_kwargs=None) -> dict:
    """validation_utils.py:26-34: task metadata's
    ``source_storage_options`` wins over io_kwargs' ``storage_options``;
    non-dict/empty values fall through."""
    source_storage_options = (
        (metadata or {}).get("source_storage_options")
        if metadata is not None
        else None
    )
    if isinstance(source_storage_options, dict) and source_storage_options:
        return source_storage_options
    storage_options = (io_kwargs or {}).get("storage_options")
    return storage_options if isinstance(storage_options, dict) else {}


def validate_and_project_source_fields(
    sample: dict, fields, excluded_fields: set
) -> dict:
    """validation_utils.py:37-59, exact: None fields → every non-
    excluded key; explicit fields must avoid reserved keys (ValueError
    lists them sorted) and missing ones fill with None; dict/list
    values are JSON-encoded (ensure_ascii=False) for tabular output."""
    selected = (
        [key for key in sample if key not in excluded_fields]
        if fields is None
        else list(fields)
    )
    if fields is not None:
        reserved = sorted(f for f in selected if f in excluded_fields)
        if reserved:
            msg = f"fields contains reserved keys: {reserved}"
            raise ValueError(msg)
    result = {}
    for field in selected:
        if field not in sample:
            result[field] = None
        else:
            value = sample[field]
            result[field] = (
                json.dumps(value, ensure_ascii=False)
                if isinstance(value, (dict, list))
                else value
            )
    return result


# --- writer half (io/writers/base.py + tabular.py) -------------------------


def check_output_mode(
    mode: str, path: str, append_mode_implemented: bool = False
) -> None:
    """utils/file_utils.py:335-375 on the local filesystem (fsspec is
    the remote plug point): overwrite deletes, error raises on
    existence, append raises until implemented, then the directory is
    created."""
    import shutil  # noqa: PLC0415

    normalized = mode.strip().lower()
    allowed = {"overwrite", "append", "error", "ignore"}
    if normalized not in allowed:
        msg = f"Invalid mode: {mode!r}. Allowed: {sorted(allowed)}"
        raise ValueError(msg)
    if normalized == "append" and append_mode_implemented is False:
        msg = "append mode is not implemented yet"
        raise NotImplementedError(msg)
    if normalized == "error" and os.path.exists(path):
        msg = f"Output directory {path} already exists"
        raise FileExistsError(msg)
    if normalized == "overwrite" and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


def apply_materialize_error_policy(
    pdf: pd.DataFrame, on_materialize_error: str = "error"
) -> pd.DataFrame:
    """io/writers/base.py:92-113, exact: ``error`` raises with the
    count + first message, ``warn`` keeps rows, ``drop_row`` drops the
    failing rows, ``drop_sample`` drops every row of any sample with a
    failure."""
    if "materialize_error" not in pdf.columns:
        return pdf
    error_mask = pdf["materialize_error"].notna()
    n_errors = int(error_mask.sum())
    if n_errors == 0:
        return pdf
    if on_materialize_error == "error":
        first_err = pdf.loc[error_mask, "materialize_error"].iloc[0]
        msg = f"Materialization failed ({n_errors} errors). First: {first_err}"
        raise RuntimeError(msg)
    if on_materialize_error == "drop_row":
        return pdf[~error_mask].reset_index(drop=True)
    if on_materialize_error == "drop_sample":
        bad_samples = set(pdf.loc[error_mask, "sample_id"])
        return pdf[~pdf["sample_id"].isin(bad_samples)].reset_index(drop=True)
    return pdf  # "warn"


def get_deterministic_hash(inputs: list, seed: str = "") -> str:
    """utils/hash_utils.py:17-25, exact: sha256 of sorted inputs joined
    with '|' + seed, first 12 hex chars."""
    import hashlib  # noqa: PLC0415

    combined = "|".join(sorted(inputs)) + "|" + seed
    return hashlib.sha256(combined.encode()).hexdigest()[:12]


def write_interleaved_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "ignore",
    materialize: bool = True,
    on_materialize_error: str = "error",
    schema: pa.Schema | None = None,
    schema_overrides=None,
    storage_options: dict | None = None,
    write_kwargs: dict | None = None,
) -> DataFrame:
    """InterleavedParquetWriterStage (io/writers/tabular.py:27-37 over
    base.py:36-157): optional binary materialization, error policy,
    schema alignment, snappy + 128k row groups, index never written,
    deterministic per-task file names
    (``sha256(sorted(source paths)|task)[:12].parquet`` — base.py's
    ``get_deterministic_hash(source_files, task_id)`` with the
    partition's distinct source paths standing in for source_files).

    Spark shape: one mapInPandas pass writes one parquet file per
    non-empty partition directly from the worker (tmp + atomic rename,
    idempotent under retries); returns one row per written file. Bytes
    never shuffle — write where the scan put them.
    """
    target_schema = resolve_schema(schema, schema_overrides)
    check_output_mode(mode, path)
    effective_kwargs = dict(write_kwargs or {})
    effective_kwargs.pop("storage_options", None)
    effective_kwargs.setdefault("compression", "snappy")
    effective_kwargs.setdefault("row_group_size", 128_000)

    out_schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )

    def _run(batches):
        import pyarrow.parquet as pq  # noqa: PLC0415

        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        if materialize:
            pdf = materialize_pdf(pdf, storage_options=storage_options or {})
        pdf = apply_materialize_error_policy(pdf, on_materialize_error)
        if pdf.empty:
            return
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        table = (
            align_table(table, target_schema)
            if target_schema is not None
            else table.cast(reconcile_schema(table.schema))
        )
        if "source_ref" in pdf.columns:
            src_paths = sorted(
                {
                    str(parse_source_ref(v)["path"])
                    for v in pdf["source_ref"].tolist()
                    if v
                }
            )
        else:
            src_paths = []
        if not src_paths:
            src_paths = sorted(set(pdf["sample_id"].astype(str).tolist()))
        filename = get_deterministic_hash(src_paths, "")
        file_path = os.path.join(path, f"{filename}.parquet")
        tmp = file_path + f".tmp{os.getpid()}"
        row_group_size = effective_kwargs.pop("row_group_size")
        compression = effective_kwargs.pop("compression")
        pq.write_table(
            table,
            tmp,
            compression=compression,
            row_group_size=row_group_size,
            **effective_kwargs,
        )
        os.replace(tmp, file_path)
        yield pd.DataFrame(
            [(file_path, len(pdf))], columns=["file", "n_rows"]
        )

    return df.mapInPandas(_run, schema=out_schema)


# --- image decode (image_utils.py) -----------------------------------------


def image_bytes_to_array(image_bytes: bytes, row_index=None):
    """image_utils.py:36-46: decode to an RGB HxWx3 array. cv2 is the
    reference's decoder (plug point); the deterministic PPM/BMP codecs
    in operators/multimodal.py serve the formats this sandbox tests.
    Undecodable bytes return None (the reference's cv2.error branch)."""
    try:
        import cv2  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415

        arr = np.frombuffer(image_bytes, dtype=np.uint8)
        image = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        return cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
    except ImportError:
        pass
    except Exception:  # noqa: BLE001 — cv2.error branch → None
        return None
    try:
        from nemo_curator_spark.operators.multimodal import _decode  # noqa: PLC0415

        w, h, c, arr = _decode(image_bytes)
        return arr.reshape(h, w, c)
    except (ValueError, NotImplementedError, IndexError):
        return None

"""Dataset file-layout maintenance (reference
``utils/split_large_files.py``, ``utils/grouping.py``).

Oversized parquet/jsonl files are the classic 100-TB layout hazard this
repo already hit once (CLAUDE.md: a 1-row-group cache capped every scan
at 17 tasks): a parquet split can never cross a row-group boundary, so
one multi-GB row group serializes an entire executor. These utilities
re-shard such files to a target size — the reference ships them as a
Ray CLI; here the same per-file algorithms fan out as one Spark task
per file (``split_files_by_size``), which is exactly the reference's
parallelism unit.

Ported exactly: the parquet row-group packing loop (merge small groups
up to the target, recursively halve over-target groups —
split_large_files.py:52-141) and the jsonl line-streaming splitter
(O(line) memory, over-target single lines become their own shard —
:144-208). fsspec is the remote plug point; local paths use pyarrow /
stdlib directly.
"""

from __future__ import annotations

import itertools
import os
import posixpath

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def basename_and_ext(path: str) -> tuple[str, str]:
    """split_large_files.py:38-42: basename + extension for local paths
    and URIs."""
    name = posixpath.basename(path.rstrip("/"))
    root, ext = posixpath.splitext(name)
    return root, ext


def split_table(table: pa.Table, target_size: int) -> list[pa.Table]:
    """split_large_files.py:52-63, exact: recursively halve by rows
    until every chunk is under the target byte size."""
    tables = [
        table.slice(0, table.num_rows // 2),
        table.slice(table.num_rows // 2, table.num_rows),
    ]
    results = []
    for t in tables:
        if t.nbytes > target_size:
            results.extend(split_table(t, target_size=target_size))
        else:
            results.append(t)
    return results


def split_parquet_file_by_size(
    input_file: str, output_path: str, target_size_mb: int
) -> list[str]:
    """split_large_files.py:72-141, exact packing semantics: walk row
    groups in order, merging small ones until the next would overflow
    the target; a single over-target row group first flushes the
    pending batch (order preserved) then writes its recursive halves.
    Returns the written file paths (the reference logs them)."""
    root, ext = basename_and_ext(input_file)
    if not ext:
        ext = ".parquet"
    written: list[str] = []

    def _out(file_idx: int) -> str:
        return os.path.join(output_path, f"{root}_{file_idx}{ext}")

    def _write(table: pa.Table, file_idx: int) -> None:
        pq.write_table(table, _out(file_idx))
        written.append(_out(file_idx))

    pf = pq.ParquetFile(input_file)
    num_row_groups = pf.num_row_groups
    target_size_bytes = target_size_mb * 1024 * 1024
    file_idx = 0
    row_group_idx = 0
    while row_group_idx < num_row_groups:
        current_size = 0
        row_groups_to_write: list[pa.Table] = []
        while row_group_idx < num_row_groups and current_size < target_size_bytes:
            row_group = pf.read_row_group(row_group_idx)
            if row_group.nbytes > target_size_bytes:
                if row_groups_to_write:
                    sub = (
                        row_groups_to_write[0]
                        if len(row_groups_to_write) == 1
                        else pa.concat_tables(row_groups_to_write)
                    )
                    _write(sub, file_idx)
                    file_idx += 1
                    row_groups_to_write = []
                    current_size = 0
                for chunk in split_table(row_group, target_size=target_size_bytes):
                    _write(chunk, file_idx)
                    file_idx += 1
                row_group_idx += 1
            elif row_group.nbytes + current_size > target_size_bytes:
                break
            else:
                row_groups_to_write.append(row_group)
                current_size += row_group.nbytes
                row_group_idx += 1
        if row_groups_to_write:
            sub = (
                row_groups_to_write[0]
                if len(row_groups_to_write) == 1
                else pa.concat_tables(row_groups_to_write)
            )
            _write(sub, file_idx)
            file_idx += 1
    return written


def split_jsonl_file_by_size(
    input_file: str, output_path: str, target_size_mb: int
) -> list[str]:
    """split_large_files.py:152-208, exact: stream lines in binary,
    flush when the next line would overflow; an over-target single line
    flushes pending, then ships alone (records never split mid-line)."""
    root, ext = basename_and_ext(input_file)
    if not ext:
        ext = ".jsonl"
    written: list[str] = []
    target_size_bytes = target_size_mb * 1024 * 1024
    file_idx = 0
    chunk_lines: list[bytes] = []
    chunk_bytes = 0

    def _flush(lines: list[bytes], idx: int) -> None:
        out = os.path.join(output_path, f"{root}_{idx}{ext}")
        with open(out, "wb") as f:
            f.writelines(lines)
        written.append(out)

    with open(input_file, "rb") as in_f:
        for line in in_f:
            line_len = len(line)
            if line_len > target_size_bytes:
                if chunk_lines:
                    _flush(chunk_lines, file_idx)
                    chunk_lines = []
                    chunk_bytes = 0
                    file_idx += 1
                _flush([line], file_idx)
                file_idx += 1
                continue
            if chunk_bytes + line_len > target_size_bytes and chunk_lines:
                _flush(chunk_lines, file_idx)
                chunk_lines = []
                chunk_bytes = 0
                file_idx += 1
            chunk_lines.append(line)
            chunk_bytes += line_len
    if chunk_lines:
        _flush(chunk_lines, file_idx)
    return written


def split_files_by_size(
    spark: SparkSession,
    files: list[str],
    output_path: str,
    file_type: str,
    target_size_mb: int = 128,
) -> DataFrame:
    """The reference CLI's fan-out (split_large_files.py:230-255) as
    one Spark task per input file — its exact parallelism unit (Ray
    task per file). Returns (input_file, output_file) rows."""
    handlers = {
        "parquet": split_parquet_file_by_size,
        "jsonl": split_jsonl_file_by_size,
    }
    if file_type not in handlers:
        msg = f"file_type must be one of {sorted(handlers)}, got {file_type!r}"
        raise ValueError(msg)
    os.makedirs(output_path, exist_ok=True)
    handler = handlers[file_type]
    pdf = spark.createDataFrame([(f,) for f in files], "input_file string")
    schema = T.StructType(
        [
            T.StructField("input_file", T.StringType()),
            T.StructField("output_file", T.StringType()),
        ]
    )

    def _run(batches):
        for chunk in batches:
            rows = []
            for f in chunk["input_file"]:
                for out in handler(str(f), output_path, target_size_mb):
                    rows.append((str(f), out))
            yield pd.DataFrame(rows, columns=["input_file", "output_file"])

    return pdf.repartition(max(len(files), 1)).mapInPandas(_run, schema)


# --- grouping helpers (utils/grouping.py:35-102) ---------------------------


def split_by_chunk_size(
    iterable,
    chunk_size: int,
    custom_size_func=lambda _x: 1,
    *,
    drop_incomplete_chunk: bool = False,
):
    """grouping.py:35-65, exact: accumulate until the running size
    reaches chunk_size; optionally drop the incomplete tail."""
    out = []
    cur_count = 0
    for value in iterable:
        out.append(value)
        cur_count += custom_size_func(value)
        if cur_count >= chunk_size:
            yield out
            out = []
            cur_count = 0
    if out and not drop_incomplete_chunk:
        yield out


def split_into_n_chunks(iterable, num_chunks: int):
    """grouping.py:68-86, exact: n nearly-equal chunks (first ``r``
    chunks one element larger); fewer elements than chunks → singleton
    chunks."""
    it = list(iterable)
    if len(it) <= num_chunks:
        yield from [[x] for x in it]
        return
    d, r = divmod(len(it), num_chunks)
    for i in range(num_chunks):
        si = (d + 1) * (min(r, i)) + d * (0 if i < r else i - r)
        yield it[si : si + (d + 1 if i < r else d)]


def pairwise(iterable):
    """grouping.py:89-102."""
    a, b = itertools.tee(iterable)
    next(b, None)
    return zip(a, b)


# --- safe tar extraction (reference utils/file_utils.py:429-487) -----------


def is_safe_path(path: str, base_path: str) -> bool:
    """file_utils.py:429-446, exact: normalize (resolving ``..``) and
    require the member to land inside ``base_path``."""
    full_path = os.path.normpath(os.path.join(base_path, path))
    base_path = os.path.normpath(base_path)
    return os.path.commonpath([full_path, base_path]) == base_path


def tar_safe_extract(tar, path: str) -> None:
    """file_utils.py:448-487, exact: extract every member after
    rejecting absolute paths, ``..`` traversal, device files, and
    symlinks/hardlinks whose target escapes the extraction root. Used
    on downloaded archives (arXiv tarballs, metrics bundles) whose
    member names are untrusted input."""
    for member in tar.getmembers():
        if os.path.isabs(member.name):
            msg = f"Absolute path not allowed: {member.name}"
            raise ValueError(msg)
        if not is_safe_path(member.name, path):
            msg = f"Path traversal attempt detected: {member.name}"
            raise ValueError(msg)
        if member.isdev():
            msg = f"Device files not allowed: {member.name}"
            raise ValueError(msg)
        if member.issym() or member.islnk():
            if os.path.isabs(member.linkname):
                msg = (
                    "Absolute symlink target not allowed: "
                    f"{member.name} -> {member.linkname}"
                )
                raise ValueError(msg)
            if not is_safe_path(member.linkname, path):
                msg = (
                    "Symlink target outside extraction directory: "
                    f"{member.name} -> {member.linkname}"
                )
                raise ValueError(msg)
        tar.extract(member, path)

"""File-group partition planning — reference
stages/file_partitioning.py:32-238 and stages/client_partitioning.py:29-143.

For parquet/jsonl scans Spark's own split planning replaces these stages
(``io/tables.py``), but the non-splittable file families (WARC, tar
shards, audio files, video containers) are processed one *file group*
per task, and the reference plans those groups explicitly: list files
(with sizes), partition by count or by a greedy blocksize fold, and emit
one bookkeeping task per group. The plan itself is driver-side and
bounded (one tuple per file — even a 100-TB corpus is only millions of
names); the work is distributed by turning the plan into a DataFrame of
group rows (:func:`file_groups_df`), one row per group, which downstream
``mapInPandas`` stages consume with the bytes staying on their scan
partitions.

Local filesystem only in-sandbox; remote filesystems (s3/abfs via
fsspec) are the documented plug point — the planning math is identical.
"""

from __future__ import annotations

import json
import os
import posixpath
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --- byte-string parsing (file_utils.py:488-560; dask.utils.parse_bytes
# semantics, decimal k/M/G and binary Ki/Mi/Gi units) -----------------------

_BYTE_SIZES: dict[str, int] = {
    "kB": 10**3,
    "MB": 10**6,
    "GB": 10**9,
    "TB": 10**12,
    "PB": 10**15,
    "KiB": 2**10,
    "MiB": 2**20,
    "GiB": 2**30,
    "TiB": 2**40,
    "PiB": 2**50,
    "B": 1,
    "": 1,
}
_BYTE_SIZES = {k.lower(): v for k, v in _BYTE_SIZES.items()}
_BYTE_SIZES.update({k[0]: v for k, v in _BYTE_SIZES.items() if k and "i" not in k})
_BYTE_SIZES.update({k[:-1]: v for k, v in _BYTE_SIZES.items() if k and "i" in k})


def parse_bytes_string_to_int(size: float | str) -> int:
    """'100 MB' -> 100000000, '1kiB' -> 1024, 123 -> 123, 'MB' -> 10**6."""
    if isinstance(size, (int, float)):
        return int(size)
    size = size.replace(" ", "")
    if not any(ch.isdigit() for ch in size):
        size = "1" + size
    i = 0
    for i in range(len(size) - 1, -1, -1):
        if not size[i].isalpha():
            break
    index = i + 1
    prefix, suffix = size[:index], size[index:]
    try:
        n = float(prefix)
    except ValueError as e:
        raise ValueError(f"Could not interpret '{prefix}' as a number") from e
    try:
        multiplier = _BYTE_SIZES[suffix.lower()]
    except KeyError as e:
        raise ValueError(f"Could not interpret '{suffix}' as a byte unit") from e
    return int(n * multiplier)


DEFAULT_BLOCKSIZE = parse_bytes_string_to_int("512MB")

_PROTOCOL_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://(.*)$")


def split_protocol(path: str) -> tuple[str | None, str]:
    m = _PROTOCOL_RE.match(path)
    if m:
        return m.group(1), m.group(2)
    return None, path


def infer_dataset_name_from_path(path: str, path_kind: str = "file") -> str:
    """file_utils.py:378-400: parent-dir (or URL tail) name, lowercased."""
    protocol, pure = split_protocol(path)
    if path_kind == "directory":
        return posixpath.basename(pure.rstrip("/")).lower()
    if protocol is None:
        parent = os.path.basename(os.path.dirname(pure))
        if parent and parent != ".":
            return parent.lower()
        stem = os.path.basename(pure)
        return (stem.rsplit(".", 1)[0] if "." in stem else stem).lower()
    parts = pure.rstrip("/").split("/")
    if len(parts) <= 1:
        return parts[0]
    return parts[-1].lower()


# --- listing (file_utils.py:266-296, local half) ---------------------------


def _keep(path: str, keep_extensions: list[str] | None) -> bool:
    if keep_extensions is None:
        return True
    low = path.lower()
    return any(low.endswith(ext.lower()) for ext in keep_extensions)


def list_files_with_sizes(
    path: str,
    recurse_subdirectories: bool = False,
    keep_extensions: list[str] | None = None,
    sort_by_size: bool = True,
) -> list[tuple[str, int]]:
    """All (path, size) under ``path``; a file path lists itself. Sorted
    by size (blocksize mode) or by path — reference sorts the same way."""
    records: list[tuple[str, int]] = []
    if os.path.isfile(path):
        if _keep(path, keep_extensions):
            records.append((path, os.path.getsize(path)))
    elif os.path.isdir(path):
        if recurse_subdirectories:
            for dirpath, _dirnames, filenames in os.walk(path):
                for name in filenames:
                    p = os.path.join(dirpath, name)
                    if _keep(p, keep_extensions):
                        records.append((p, os.path.getsize(p)))
        else:
            for entry in os.scandir(path):
                if entry.is_file() and _keep(entry.path, keep_extensions):
                    records.append((entry.path, entry.stat().st_size))
    return sorted(records, key=(lambda x: x[1]) if sort_by_size else (lambda x: x[0]))


# --- partitioning (file_partitioning.py:222-238 + file_utils.py:144-165) ---


def partition_by_count(files: list[str], count: int) -> list[list[str]]:
    return [files[i : i + count] for i in range(0, len(files), count)]


def partition_by_size(
    files: list[tuple[str, int]], blocksize: int | str
) -> list[list[str]]:
    """Greedy fold over size-sorted files: flush when the next file would
    overflow the block (an oversized file therefore lands alone)."""
    max_bytes = parse_bytes_string_to_int(blocksize)
    partitions: list[list[str]] = []
    current: list[str] = []
    current_size = 0
    for file, size in sorted(files, key=lambda x: x[1]):
        if current_size + size > max_bytes:
            if current:
                partitions.append(current)
            current = []
            current_size = 0
        current.append(file)
        current_size += size
    if current:
        partitions.append(current)
    return partitions


@dataclass
class FileGroup:
    """One FileGroupTask's bookkeeping (stages/file_partitioning.py:171-181)."""

    dataset_name: str
    data: list[str]
    partition_index: int
    total_partitions: int
    metadata: dict[str, Any] = field(default_factory=dict)


def plan_file_groups(
    file_paths: str | list[str],
    files_per_partition: int | None = None,
    blocksize: int | str | None = None,
    file_extensions: list[str] | None = None,
    limit: int | None = None,
) -> list[FileGroup]:
    """FilePartitioningStage.process (file_partitioning.py:101-186).

    ``files_per_partition`` and ``blocksize`` are mutually exclusive;
    with neither, one file per partition. ``limit`` caps the number of
    GROUPS emitted (the client variant caps files instead —
    :func:`client_partition_plan`). ``total_partitions`` reflects the
    pre-limit plan, exactly like the reference's early ``break``.
    """
    if files_per_partition is not None and blocksize is not None:
        raise ValueError(
            "Both 'files_per_partition' and 'blocksize' were specified, "
            "but only one is allowed"
        )
    if file_extensions is None:
        file_extensions = [".jsonl", ".json", ".parquet"]
    sort_by_size = blocksize is not None
    if isinstance(file_paths, str):
        files_with_sizes = list_files_with_sizes(
            file_paths, True, file_extensions, sort_by_size
        )
    elif isinstance(file_paths, list):
        files_with_sizes = []
        for p in file_paths:
            files_with_sizes.extend(
                list_files_with_sizes(p, False, file_extensions, sort_by_size)
            )
        files_with_sizes.sort(
            key=(lambda x: x[1]) if sort_by_size else (lambda x: x[0])
        )
    else:
        raise TypeError(
            f"Invalid file paths: {file_paths}, must be a string or list of strings"
        )
    files = [f for f, _ in files_with_sizes]
    if not files:
        return []
    if files_per_partition:
        partitions = partition_by_count(files, files_per_partition)
    elif blocksize:
        partitions = partition_by_size(files_with_sizes, blocksize)
    else:
        partitions = partition_by_count(files, 1)
    dataset_name = infer_dataset_name_from_path(files[0])
    groups: list[FileGroup] = []
    for i, group in enumerate(partitions):
        if limit is not None and len(groups) >= limit:
            break
        groups.append(
            FileGroup(
                dataset_name=dataset_name,
                data=group,
                partition_index=i,
                total_partitions=len(partitions),
                metadata={"source_files": group},
            )
        )
    return groups


# --- client variant (client_partitioning.py:29-143) ------------------------


def read_list_json_rel(root: str, json_path: str) -> list[str]:
    """client_partitioning.py:118-143: entries must sit under ``root``;
    returned relative, stable-deduped, sorted."""
    with open(json_path, "rb") as f:
        data = json.load(f)
    if not isinstance(data, list):
        raise TypeError(f"List JSON at {json_path} must be an array.")
    prefix = root.rstrip("/") + "/"
    rels: list[str] = []
    for p in (str(x) for x in data):
        if not p.startswith(prefix):
            raise ValueError(f"Input path {p} is not under root {prefix}")
        rels.append(p[len(prefix) :])
    rels = list(dict.fromkeys(rels))
    rels.sort()
    return rels


def client_partition_plan(
    root: str,
    file_extensions: list[str] | None = None,
    files_per_partition: int | None = None,
    limit: int | None = None,
    input_list_json_path: str | None = None,
) -> list[FileGroup]:
    """ClientPartitioningStage.process (client_partitioning.py:46-115):
    sorted deduped relative listing (or the validated list-JSON),
    extension filter, then ``limit`` caps FILES (not groups — the one
    semantic difference from :func:`plan_file_groups`), then grouping."""
    if input_list_json_path:
        rels = read_list_json_rel(root, input_list_json_path)
    else:
        base = root.rstrip("/")
        abs_paths = [
            p for p, _ in list_files_with_sizes(base, True, None, sort_by_size=False)
        ]
        rels = sorted(dict.fromkeys(os.path.relpath(p, base) for p in abs_paths))
    if file_extensions is not None:
        rels = [
            p
            for p in rels
            if any(p.lower().endswith(ext.lower()) for ext in file_extensions)
        ]
    if limit is not None and limit > 0:
        rels = rels[:limit]
    paths = [posixpath.join(root.rstrip("/"), p) for p in rels]
    if files_per_partition:
        partitions = partition_by_count(paths, files_per_partition)
    else:
        partitions = [[p] for p in paths]
    dataset_name = infer_dataset_name_from_path(root, path_kind="directory")
    return [
        FileGroup(
            dataset_name=dataset_name,
            data=group,
            partition_index=i,
            total_partitions=len(partitions),
            metadata={"source_files": group},
        )
        for i, group in enumerate(partitions)
    ]


# --- Spark bridge ----------------------------------------------------------

FILE_GROUP_SCHEMA = T.StructType(
    [
        T.StructField("dataset_name", T.StringType()),
        T.StructField("partition_index", T.IntegerType()),
        T.StructField("total_partitions", T.IntegerType()),
        T.StructField("files", T.ArrayType(T.StringType())),
        T.StructField("group_bytes", T.LongType()),
    ]
)


def file_groups_df(
    spark: SparkSession, groups: list[FileGroup], with_sizes: bool = True
) -> DataFrame:
    """One row per group, repartitioned so each group is its own task —
    the Spark analogue of one FileGroupTask per worker. Downstream
    per-group stages (WARC iterate, tar walkers) mapInPandas over this;
    only bookkeeping rows shuffle, never file bytes."""
    rows = []
    for g in groups:
        size = (
            sum(os.path.getsize(p) for p in g.data if os.path.exists(p))
            if with_sizes
            else 0
        )
        rows.append(
            (g.dataset_name, g.partition_index, g.total_partitions, g.data, size)
        )
    df = spark.createDataFrame(rows, FILE_GROUP_SCHEMA)
    return df.repartition(max(1, len(rows)), "partition_index")

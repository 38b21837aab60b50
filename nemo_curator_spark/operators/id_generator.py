"""Resumable dedup id generation — reference
stages/deduplication/id_generator.py:26-108 (IdGeneratorBase; the Ray
actor wrapper is the reference's distribution mechanism, not the
contract).

The reference assigns every document a stable integer
``_curator_dedup_id`` by registering each file batch with a central
registry: a batch (keyed by uuid5 of its file list) gets a contiguous
``[min_id, max_id]`` range, idempotently — re-registering an
already-seen batch returns its original range, which is what makes a
resumed run reuse the same ids. The registry is tiny (one entry per
file batch, even 100 TB is ~10^5 entries), so it lives on the driver
and persists as JSON next to the output.

The Spark half assigns ids inside each batch's range with one window
per file (``row_number`` over a caller-named deterministic order
column) plus a broadcast offset map — no global sequence, no driver
round-trip per row, and a re-run over the same files yields
bit-identical ids.
"""

from __future__ import annotations

import json
import uuid
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CURATOR_DEDUP_ID_STR = "_curator_dedup_id"


class IdGeneratorBase:
    """id_generator.py:30-77, exact (fsspec swapped for local open; remote
    filesystems are a plug point)."""

    def __init__(
        self,
        start_id: int = 0,
        batch_registry: dict[str, tuple[int, int]] | None = None,
    ):
        self.next_id = start_id
        self.batch_registry = batch_registry or {}

    def register_batch(self, files: str | list[str], count: int) -> int:
        batch_hash = self.hash_files(files)
        if _ids := self.batch_registry.get(batch_hash):
            return _ids[0]
        current_id = self.next_id
        self.next_id += count
        self.batch_registry[batch_hash] = (current_id, self.next_id - 1)
        return current_id

    def hash_files(self, filepath: str | list[str]) -> str:
        filepath = filepath if isinstance(filepath, list) else [filepath]
        return str(uuid.uuid5(uuid.NAMESPACE_URL, ";".join(filepath)))

    def get_batch_range(
        self, files: str | list[str] | None, key: str | None = None
    ) -> tuple[int, int]:
        if (files is None and key is None) or (
            files is not None and key is not None
        ):
            raise ValueError("Either files or key must be provided")
        if files is not None:
            key = self.hash_files(files)
        return tuple(self.batch_registry[key])

    def to_disk(self, filepath: str, storage_options: Any = None) -> None:  # noqa: ARG002
        with open(filepath, mode="w") as f:
            json.dump(
                {"next_id": self.next_id, "batch_registry": self.batch_registry},
                f,
            )

    @classmethod
    def from_disk(
        cls, filepath: str, storage_options: Any = None  # noqa: ARG002
    ) -> "IdGeneratorBase":
        with open(filepath, mode="r") as f:
            data = json.load(f)
        return cls(start_id=data["next_id"], batch_registry=data["batch_registry"])


def register_files(
    gen: IdGeneratorBase, file_counts: list[tuple[str, int]]
) -> dict[str, int]:
    """Register one batch per file (the reader's files_per_partition=1
    shape) and return {file: min_id}. Sorted registration order makes a
    fresh registry deterministic; an existing registry's assignments are
    honored regardless of order (register_batch is idempotent)."""
    return {
        f: gen.register_batch(f, n) for f, n in sorted(file_counts)
    }


def assign_dedup_ids(
    df: DataFrame,
    gen: IdGeneratorBase,
    file_col: str,
    order_col: str,
    id_col: str = CURATOR_DEDUP_ID_STR,
) -> DataFrame:
    """Stable int64 ids: per-file contiguous ranges from the registry +
    ``row_number`` over ``order_col`` within each file. One exchange
    (the per-file window); the offset map is a broadcast join, never a
    driver-side loop over rows. Files not yet in the registry are
    registered first via one count aggregation (a second scan — pass a
    pre-registered ``gen`` to skip it on resume)."""
    spark = df.sparkSession
    counts = {
        r[0]: r[1]
        for r in df.groupBy(file_col).count().collect()
    }
    offsets = register_files(gen, sorted(counts.items()))
    offsets_df = F.broadcast(
        spark.createDataFrame(
            list(offsets.items()), f"{file_col} string, _batch_min_id bigint"
        )
    )
    w = Window.partitionBy(file_col).orderBy(order_col)
    return (
        df.join(offsets_df, on=file_col, how="left")
        .withColumn(
            id_col,
            (F.col("_batch_min_id") + F.row_number().over(w) - F.lit(1)).cast(
                "bigint"
            ),
        )
        .drop("_batch_min_id")
    )

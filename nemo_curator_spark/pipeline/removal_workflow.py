"""Text duplicates removal workflow — reference
stages/text/deduplication/removal_workflow.py:34-216.

The reference composes FilePartitioning -> Parquet/Jsonl read (with
optional id-generator assignment) -> TextDuplicatesRemovalStage
(anti-join against the ids-to-remove table) -> Parquet/Jsonl write, and
reports how many rows were removed. Every stage exists here; this
module carries the reference's config surface and validation and runs
the plan end-to-end:

- the scan/prune/write is declarative (Catalyst pushes ``input_fields``
  projection into the parquet reader),
- the removal is one left-anti join, broadcast by AQE when the removal
  list is actually small (the reference-scale list is ~64M ids — never
  force-broadcast, see ``operators/dedup.remove_duplicates``),
- optional id assignment replays the resumable id-generator registry
  (``operators/id_generator``), keyed by ``input_file_name()`` with a
  caller-named deterministic order column — a Spark input split is not
  a stable row sequence, so the order must come from data, not arrival.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nemo_curator_spark.operators.dedup import remove_duplicates
from nemo_curator_spark.operators.id_generator import (
    CURATOR_DEDUP_ID_STR,
    IdGeneratorBase,
    assign_dedup_ids,
)

_VALID_FILETYPES = ("parquet", "jsonl")


@dataclass(kw_only=True)
class TextDuplicatesRemovalWorkflow:
    """removal_workflow.py:34-66 config surface; ``run(spark)`` executes
    the composed plan and returns ``{rows_in, rows_out, num_removed,
    output_path}``."""

    input_path: str
    ids_to_remove_path: str
    output_path: str

    input_filetype: str = "parquet"
    input_fields: list[str] | None = None
    id_field: str | None = CURATOR_DEDUP_ID_STR

    duplicate_id_field: str = "id"

    id_generator_path: str | None = None
    order_field: str | None = None  # required with id_generator_path

    output_filetype: str = "parquet"
    output_fields: list[str] | None = None
    output_mode: str = "overwrite"
    drop_id_field: bool = False

    def __post_init__(self) -> None:
        if self.input_filetype not in _VALID_FILETYPES:
            raise ValueError(f"Invalid input filetype: {self.input_filetype}")
        if self.output_filetype not in _VALID_FILETYPES:
            raise ValueError(f"Invalid output filetype: {self.output_filetype}")
        if (
            self.drop_id_field
            and self.output_fields
            and self.id_field in self.output_fields
        ):
            raise ValueError(
                f"Cannot drop id_field {self.id_field!r} when it is included "
                "in output_fields."
            )
        if self.id_generator_path is not None and self.order_field is None:
            raise ValueError(
                "id_generator_path requires 'order_field': a Spark input "
                "split is not a stable row sequence, so id assignment needs "
                "a deterministic order column"
            )

    # stages ----------------------------------------------------------------

    def _read(self, spark: SparkSession) -> DataFrame:
        if self.input_filetype == "jsonl":
            df = spark.read.json(self.input_path)
        else:
            df = spark.read.parquet(self.input_path)
        if self.input_fields:
            keep = list(self.input_fields)
            if self.order_field and self.order_field not in keep:
                keep.append(self.order_field)
            df = df.select(*keep)
        return df

    def _assign_ids(self, df: DataFrame) -> tuple[DataFrame, IdGeneratorBase | None]:
        if self.id_generator_path is None:
            return df, None
        try:
            gen = IdGeneratorBase.from_disk(self.id_generator_path)
        except FileNotFoundError:
            gen = IdGeneratorBase()
        df = df.withColumn("_source_file", F.input_file_name())
        df = assign_dedup_ids(
            df,
            gen,
            file_col="_source_file",
            order_col=self.order_field,
            id_col=self.id_field,
        ).drop("_source_file")
        return df, gen

    def _removal_ids(self, spark: SparkSession) -> DataFrame:
        ids = spark.read.parquet(self.ids_to_remove_path)
        return ids.select(F.col(self.duplicate_id_field).alias(self.id_field))

    def run(self, spark: SparkSession) -> dict[str, Any]:
        df = self._read(spark)
        df, gen = self._assign_ids(df)
        rows_in = df.count()
        kept = remove_duplicates(
            df, self._removal_ids(spark), id_col=self.id_field
        )
        if self.drop_id_field:
            kept = kept.drop(self.id_field)
        if self.output_fields:
            kept = kept.select(*self.output_fields)
        writer = kept.write.mode(self.output_mode)
        if self.output_filetype == "jsonl":
            writer.json(self.output_path)
        else:
            writer.parquet(self.output_path)
        if gen is not None:
            gen.to_disk(self.id_generator_path)
        rows_out = (
            spark.read.json(self.output_path)
            if self.output_filetype == "jsonl"
            else spark.read.parquet(self.output_path)
        ).count()
        return {
            "rows_in": rows_in,
            "rows_out": rows_out,
            "num_removed": rows_in - rows_out,
            "output_path": self.output_path,
        }

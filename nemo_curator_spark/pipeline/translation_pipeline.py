"""Translation composite pipeline — reference
stages/text/experimental/translation/pipeline.py:46-252 (TranslationStage)
plus the per-document FAITH aggregation from reassembly.py:346-402.

The reference's CompositeStage assembles: optional skip-existing split,
segmentation, per-segment translation (LLM client or NMT/AWS/Google
backend), optional per-segment FAITH scoring, reassembly (+ per-document
FAITH aggregation), optional threshold filter, skipped-row restore, and
output formatting. Every piece already exists here as a Spark operator;
this module carries the reference's exact configuration/validation
contract (pipeline.py:86-160) and wires the DataFrame plan in the same
order:

- the skip split is two filters over one scan; the restore is a
  union-by-name (``operators/translation_skip``);
- segmentation/translation/FAITH are single Arrow passes over the
  (id, seg_idx, segment) triples — document bodies never shuffle, only
  segment rows do, and the one groupBy in reassembly is the pipeline's
  only exchange;
- FAITH per-dimension document scores average non-zero segments with
  ``F.bround(.., 2)`` (python ``round`` is banker's — bround matches);
  ``faith_avg`` is the unrounded non-zero-dimension mean, matching
  reassembly.py:394-402 bit-for-bit (sequential left-fold sums).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nemo_curator_spark.operators import translation as TR
from nemo_curator_spark.operators import translation_llm as TL
from nemo_curator_spark.operators import translation_skip as TS

_VALID_OUTPUT_MODES = {"replaced", "raw", "both"}
_VALID_SEGMENTATION_MODES = {"coarse", "fine"}

_FAITH_DIMS = [
    "faith_fluency",
    "faith_accuracy",
    "faith_idiomaticity",
    "faith_terminology",
    "faith_handling_of_format",
]
_FAITH_KEYS = [
    "Fluency",
    "Accuracy",
    "Idiomaticity",
    "Terminology",
    "Handling_of_Format",
]


@dataclass(kw_only=True)
class TranslationPipeline:
    """pipeline.py:46-101 config surface; ``run(df)`` replaces
    ``decompose()`` — the plan IS the composition."""

    source_lang: str
    target_lang: str
    text_field: str = "text"
    output_field: str = "translated_text"
    segmentation_mode: str = "coarse"
    id_col: str = "doc_id"

    client: Any = None
    model_name: str = ""
    generation_config: dict | None = None
    translation_prompt_path: str | None = None
    dry_run: bool = False

    backend_type: str = "llm"
    backend: Any = None  # TranslationBackend instance for non-llm types
    backend_config: dict = field(default_factory=dict)

    enable_faith_eval: bool = False
    faith_threshold: float = 2.5
    faith_model_name: str = ""
    filter_enabled: bool = True
    faith_generation_config: dict | None = None
    faith_prompt_path: str | None = None

    output_mode: str = "replaced"
    merge_scores: bool = False
    skip_translated: bool = False
    translation_column: str = "translated_text"
    sentencizer: Any = None  # fine-mode plug point

    def __post_init__(self) -> None:
        self.source_lang = self.source_lang.strip()
        self.target_lang = self.target_lang.strip()
        self.model_name = self.model_name.strip()
        self.faith_model_name = self.faith_model_name.strip()
        self._validate_languages()
        self._validate_output_mode()
        self._validate_translation_backend()
        self._validate_faith_config()
        self._validate_score_merging()
        if self.segmentation_mode not in _VALID_SEGMENTATION_MODES:
            raise ValueError(
                f"Invalid segmentation_mode '{self.segmentation_mode}'. "
                f"Must be one of: {sorted(_VALID_SEGMENTATION_MODES)}"
            )

    # validation contract (pipeline.py:102-160) -----------------------------

    def _validate_languages(self) -> None:
        if not self.source_lang:
            raise ValueError("TranslationStage requires a non-empty 'source_lang'")
        if not self.target_lang:
            raise ValueError("TranslationStage requires a non-empty 'target_lang'")

    def _validate_output_mode(self) -> None:
        if self.output_mode not in _VALID_OUTPUT_MODES:
            raise ValueError(
                f"Invalid output_mode '{self.output_mode}'. Must be one of: "
                f"{sorted(_VALID_OUTPUT_MODES)}"
            )

    def _validate_translation_backend(self) -> None:
        if self.backend_type == "llm":
            if self.client is None:
                raise ValueError(
                    "TranslationStage with backend_type='llm' requires a "
                    "non-None 'client' (AsyncLLMClient)"
                )
            if not self.model_name:
                raise ValueError(
                    "TranslationStage with backend_type='llm' requires a "
                    "non-empty 'model_name'"
                )

    def _validate_faith_config(self) -> None:
        if self.enable_faith_eval:
            if self.client is None:
                if self.backend_type == "llm":
                    raise ValueError(
                        "TranslationStage with enable_faith_eval=True requires "
                        "a non-None 'client' (AsyncLLMClient)"
                    )
                raise ValueError(
                    "TranslationStage with enable_faith_eval=True and "
                    f"backend_type={self.backend_type!r} requires a separate "
                    "AsyncLLMClient for FAITH scoring"
                )
            if not (self.faith_model_name or self.model_name):
                raise ValueError(
                    "TranslationStage with enable_faith_eval=True requires "
                    "'faith_model_name' or 'model_name' to be set for FAITH "
                    "scoring"
                )

    def _validate_score_merging(self) -> None:
        if self.merge_scores and self.output_mode == "replaced":
            raise ValueError(
                "merge_scores=True requires output_mode in {'raw','both'}. "
                "Got output_mode='replaced'. Set output_mode='both' explicitly."
            )

    # composition (pipeline.py:161-252) -------------------------------------

    def run(self, df: DataFrame) -> DataFrame:
        skipped = None
        todo = df
        if self.skip_translated:
            todo, skipped = TS.skip_existing_translations(
                df, self.translation_column
            )

        if self.segmentation_mode == "fine":
            segments, meta = TR.segment_documents_fine(
                todo, self.id_col, self.text_field, self.sentencizer
            )
        else:
            segments, meta = TR.segment_documents_coarse(
                todo, self.id_col, self.text_field
            )

        if self.backend_type == "llm":
            translated = TL.translate_segments(
                segments,
                self.client,
                self.model_name,
                self.source_lang,
                self.target_lang,
                segment_col="segment",
                prompt_path=self.translation_prompt_path,
                generation_config=self.generation_config,
                dry_run=self.dry_run,
            )
        else:
            translated = TL.translate_segments_backend(
                segments,
                self.backend,
                self.source_lang,
                self.target_lang,
                segment_col="segment",
            )

        if self.enable_faith_eval:
            translated = TL.faith_eval(
                translated,
                self.client,
                self.faith_model_name or self.model_name,
                self.source_lang,
                self.target_lang,
                source_text_field="segment",
                translated_text_field="_translated",
                threshold=self.faith_threshold,
                filter_enabled=False,  # composite filters at doc level
                prompt_path=self.faith_prompt_path,
                generation_config=self.faith_generation_config,
            )

        # one shuffle: segment rows -> documents (reassembly + per-doc aggs
        # share the same groupBy key, so AQE plans a single exchange)
        reassemble = (
            TR.reassemble_documents_fine
            if self.segmentation_mode == "fine"
            else TR.reassemble_documents_coarse
        )
        out = reassemble(
            meta,
            translated,
            id_col=self.id_col,
            segment_col="_translated",
            out_col=self.output_field,
        )
        # the reference's out_row carries every non-internal source field
        # (reassembly.py:152-155); rejoin them on the same key (AQE keeps
        # the exchanges co-partitioned on id)
        carry = todo.drop(
            *[c for c in (self.output_field,) if c in todo.columns]
        )
        out = out.join(carry, on=self.id_col, how="left")
        if self.output_mode in ("replaced", "both") and self.text_field in out.columns:
            out = out.withColumn(self.text_field, F.col(self.output_field))
        out = out.join(
            _doc_level_aggregates(
                translated, self.id_col, with_faith=self.enable_faith_eval
            ),
            on=self.id_col,
            how="left",
        )
        out = _fill_doc_aggregate_defaults(out, with_faith=self.enable_faith_eval)

        if self.enable_faith_eval and self.filter_enabled:
            out = TL.faith_threshold_filter(out, self.faith_threshold)

        if self.skip_translated and skipped is not None:
            out = TS.restore_skipped_rows(out, skipped, order_col=self.id_col)
        return out


def _nonzero_avg(col: str) -> Column:
    """mean over segments where value > 0 (reassembly.py:383-392),
    rounded half-even to 2 like python round. The fold runs over a
    seg_idx-sorted array (collect_list order is partition-dependent;
    the reference sums in segment order and float addition isn't
    commutative in bits)."""
    vals = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col(col) > 0, F.struct("seg_idx", F.col(col)))
            )
        ),
        lambda s: s[col],
    )
    return F.when(F.size(vals) == 0, F.lit(0.0)).otherwise(
        F.bround(
            F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
            / F.size(vals).cast("double"),
            2,
        )
    )


def _doc_level_aggregates(
    translated: DataFrame, id_col: str, with_faith: bool
) -> DataFrame:
    """translation_time sum, '; '-joined errors (reassembly.py:152-161),
    and the per-document FAITH aggregate (reassembly.py:346-402)."""
    err = F.col("_translation_error")
    aggs = [
        F.sum("_translation_time").alias("translation_time"),
        F.array_join(
            F.collect_list(
                F.when(err.isNotNull() & (F.trim(err) != ""), err)
            ),
            "; ",
        ).alias("translation_errors"),
    ]
    if with_faith:
        aggs.extend(_nonzero_avg(c).alias(c) for c in _FAITH_DIMS)
        aggs.append(
            F.max(F.col("faith_parse_failed").cast("int"))
            .cast("boolean")
            .alias("faith_parse_failed")
        )
        aggs.append(
            F.to_json(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("seg_idx", *(F.col(c) for c in _FAITH_DIMS))
                        )
                    ),
                    lambda s: F.struct(
                        *(
                            s[dim].alias(key)
                            for dim, key in zip(_FAITH_DIMS, _FAITH_KEYS)
                        )
                    ),
                )
            ).alias("faith_segment_scores")
        )
    grouped = translated.groupBy(id_col).agg(*aggs)
    if with_faith:
        # faith_avg: unrounded mean of the non-zero averaged dimensions
        # (reassembly.py:394-402); left-fold sum matches python order.
        nz_sum = None
        nz_cnt = None
        for c in _FAITH_DIMS:
            contrib = F.when(F.col(c) > 0, F.col(c)).otherwise(F.lit(0.0))
            cnt = F.when(F.col(c) > 0, F.lit(1)).otherwise(F.lit(0))
            nz_sum = contrib if nz_sum is None else nz_sum + contrib
            nz_cnt = cnt if nz_cnt is None else nz_cnt + cnt
        grouped = grouped.withColumn(
            "faith_avg",
            F.when(nz_cnt == 0, F.lit(0.0)).otherwise(
                nz_sum / nz_cnt.cast("double")
            ),
        )
    return grouped


def _fill_doc_aggregate_defaults(out: DataFrame, with_faith: bool) -> DataFrame:
    """Documents with zero translatable segments join to NULL aggregates;
    the reference emits zeros/empties for them (reassembly.py:352-361)."""
    out = out.withColumn(
        "translation_time", F.coalesce("translation_time", F.lit(0.0))
    ).withColumn(
        "translation_errors", F.coalesce("translation_errors", F.lit(""))
    )
    if with_faith:
        for c in [*_FAITH_DIMS, "faith_avg"]:
            out = out.withColumn(c, F.coalesce(c, F.lit(0.0)))
        out = out.withColumn(
            "faith_parse_failed", F.coalesce("faith_parse_failed", F.lit(False))
        ).withColumn(
            "faith_segment_scores", F.coalesce("faith_segment_scores", F.lit("[]"))
        )
    return out


def average_faith_scores_py(
    segment_scores: list[dict[str, float]],
) -> dict[str, float]:
    """Exact python pin of reassembly.py:383-392."""
    if not segment_scores:
        return dict.fromkeys(_FAITH_KEYS, 0.0)
    averaged: dict[str, float] = {}
    for key in _FAITH_KEYS:
        values = [s.get(key, 0.0) for s in segment_scores if s.get(key, 0.0) > 0]
        averaged[key] = round(sum(values) / len(values), 2) if values else 0.0
    return averaged


def aggregate_faith_py(
    segment_scores: list[dict[str, float]], parse_failed: list[bool]
) -> dict[str, object]:
    """Exact python pin of reassembly.py:346-381 (the document record)."""
    averaged = average_faith_scores_py(segment_scores)
    values = [float(averaged[k]) for k in _FAITH_KEYS]
    non_zero = [v for v in values if v > 0]
    return {
        **{dim: averaged[key] for dim, key in zip(_FAITH_DIMS, _FAITH_KEYS)},
        "faith_avg": float(sum(non_zero) / len(non_zero)) if non_zero else 0.0,
        "faith_parse_failed": bool(any(parse_failed)),
        "faith_segment_scores": json.dumps(segment_scores, ensure_ascii=False),
    }

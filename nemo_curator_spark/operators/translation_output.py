"""Translation output formatting, FAITH-score merging, and round-trip
quality metrics — reference stages/text/experimental/translation/
stages/{format_translation_output,merge_faith_scores}.py +
utils/metadata.py + evaluation/text_quality.py. The LLM FAITH judge and
sacrebleu are the gated plug points; the metadata/message assembly and
the stage threshold semantics are exact, and chrF ships as a real
deterministic implementation (Popović 2015 formula with sacrebleu's
default parameters — char order 6, beta 2, whitespace removed;
sacrebleu itself is the bit-parity plug point).

Spark shape: every stage is per-row pure — single Arrow passes; the
quality stage's pass column lets downstream filtering stay a JVM
Column predicate.
"""

from __future__ import annotations

import copy
import json
from collections import Counter
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- metadata utils (utils/metadata.py:23-118, exact) ----------------------


def build_translation_metadata(
    target_lang: str,
    translated_text: str | None = None,
    translation_map: dict | None = None,
    segmented_translation_map: dict | None = None,
) -> str:
    if translation_map is None:
        meta_translation: object = {"content": translated_text or ""}
    else:
        meta_translation = translation_map
    meta_segmented: object = (
        segmented_translation_map
        if segmented_translation_map is not None
        else []
    )
    meta = {
        "target_lang": target_lang,
        "translation": meta_translation,
        "segmented_translation": meta_segmented,
    }
    return json.dumps(meta, ensure_ascii=False)


def merge_faith_scores_into_metadata(
    metadata_json: str, faith_scores: dict
) -> str:
    try:
        meta = json.loads(metadata_json)
    except (json.JSONDecodeError, TypeError):
        meta = {}
    meta["faith_scores"] = faith_scores
    return json.dumps(meta, ensure_ascii=False)


def _set_nested(obj: dict, keys: list[str], value: object) -> None:
    for key in keys[:-1]:
        if key in obj and isinstance(obj[key], dict):
            obj = obj[key]
        else:
            return
    if keys:
        obj[keys[-1]] = value


def _parse_structured_messages(translated_text: object) -> list | None:
    if isinstance(translated_text, list):
        if all(isinstance(item, dict) for item in translated_text):
            return copy.deepcopy(translated_text)
        return None
    if isinstance(translated_text, str):
        stripped = translated_text.strip()
        if not stripped.startswith("["):
            return None
        try:
            parsed = json.loads(stripped)
        except (json.JSONDecodeError, TypeError):
            return None
        if isinstance(parsed, list) and all(
            isinstance(item, dict) for item in parsed
        ):
            return parsed
    return None


def reconstruct_messages_with_translation(
    original_messages: list[dict],
    translated_text: object,
    field_path: str = "content",
) -> list[dict]:
    """utils/metadata.py:60-97: structured translations replace the
    whole list; otherwise split on the ``\\n---\\n`` separator and set
    each part into its message's (pre-existing) nested content path."""
    if not original_messages:
        return []
    messages = copy.deepcopy(original_messages)
    structured = _parse_structured_messages(translated_text)
    if structured is not None:
        return structured
    translated_text_str = (
        "" if translated_text is None else str(translated_text)
    )
    separator = "\n---\n"
    parts = (
        translated_text_str.split(separator)
        if separator in translated_text_str
        else [translated_text_str]
    )
    path_keys = field_path.split(".")
    for idx, msg in enumerate(messages):
        if idx < len(parts):
            _set_nested(msg, path_keys, parts[idx])
    return messages


def parse_optional_json_object(value: object) -> dict | None:
    """format_translation_output.py:151-168."""
    if value is None:
        return None
    if isinstance(value, dict):
        return value
    if isinstance(value, str):
        stripped = value.strip()
        if not stripped:
            return None
        try:
            parsed = json.loads(stripped)
        except (json.JSONDecodeError, TypeError):
            return None
        if isinstance(parsed, dict):
            return parsed
    return None


# --- FormatTranslationOutputStage (pandas-frame form) ----------------------


@dataclass(kw_only=True)
class FormatTranslationOutputStage:
    """format_translation_output.py:35-148, exact: output_mode 'raw'
    keeps only translation_metadata, 'replaced' only the translated
    field, 'both' keeps both; optional messages reconstruction; the
    helper ``_translation_map`` columns are always dropped."""

    target_lang: str
    output_mode: str = "replaced"
    output_field: str = "translated_text"
    reconstruct_messages: bool = False
    messages_field: str = "messages"
    messages_content_field: str = "content"

    def __post_init__(self) -> None:
        self.target_lang = self.target_lang.strip()
        if not self.target_lang:
            msg = (
                "FormatTranslationOutputStage requires a non-empty "
                "'target_lang'"
            )
            raise ValueError(msg)

    def process(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if df.empty:
            return df
        if self.output_mode in ("raw", "both"):
            metadata_values = []
            for idx in range(len(df)):
                row = df.iloc[idx]
                metadata_values.append(
                    build_translation_metadata(
                        target_lang=self.target_lang,
                        translated_text=row.get(self.output_field, ""),
                        translation_map=parse_optional_json_object(
                            row.get("_translation_map")
                        ),
                        segmented_translation_map=parse_optional_json_object(
                            row.get("_segmented_translation_map")
                        ),
                    )
                )
            df["translation_metadata"] = metadata_values
        if self.output_mode == "raw" and self.output_field in df.columns:
            # NOTE: the reference drops the translated field BEFORE the
            # message reconstruction below reads it
            # (format_translation_output.py:73-78), so raw+reconstruct
            # yields empty message contents there too — bug-for-bug
            # parity, pinned by tests; use 'both' to reconstruct.
            df = df.drop(columns=[self.output_field])
        if self.reconstruct_messages and self.messages_field in df.columns:
            translated_msgs = []
            for idx in range(len(df)):
                raw_messages = df.iloc[idx].get(self.messages_field)
                translated_text = df.iloc[idx].get(self.output_field, "")
                if raw_messages is None:
                    translated_msgs.append("[]")
                    continue
                if isinstance(raw_messages, str):
                    try:
                        messages_list = json.loads(raw_messages)
                    except (json.JSONDecodeError, TypeError):
                        translated_msgs.append("[]")
                        continue
                elif isinstance(raw_messages, list):
                    messages_list = raw_messages
                else:
                    translated_msgs.append("[]")
                    continue
                translated_msgs.append(
                    json.dumps(
                        reconstruct_messages_with_translation(
                            messages_list,
                            translated_text,
                            self.messages_content_field,
                        ),
                        ensure_ascii=False,
                    )
                )
            df["translated_messages"] = translated_msgs
        drop = [
            c
            for c in ("_translation_map", "_segmented_translation_map")
            if c in df.columns
        ]
        return df.drop(columns=drop) if drop else df


_FAITH_COLS = (
    "faith_fluency",
    "faith_accuracy",
    "faith_idiomaticity",
    "faith_terminology",
    "faith_handling_of_format",
    "faith_avg",
)


def extract_faith_scores(row: dict, available_faith_cols: list[str]) -> dict:
    """merge_faith_scores.py:86-101, exact key mapping (Avg -> average,
    Handling_Of_Format -> Handling_of_Format)."""
    scores: dict = {}
    for col in available_faith_cols:
        val = row.get(col)
        if val is not None and not (
            isinstance(val, float) and val != val
        ):
            key = col.replace("faith_", "").title()
            if key == "Avg":
                key = "average"
            elif key == "Handling_Of_Format":
                key = "Handling_of_Format"
            scores[key] = float(val)
    return scores


def merge_faith_scores(df: pd.DataFrame) -> pd.DataFrame:
    """MergeFaithScoresStage.process (merge_faith_scores.py:44-84)."""
    df = df.copy()
    if df.empty or "translation_metadata" not in df.columns:
        return df
    available = [c for c in _FAITH_COLS if c in df.columns]
    if not available:
        return df
    df["translation_metadata"] = [
        merge_faith_scores_into_metadata(
            str(df.iloc[idx].get("translation_metadata", "{}")),
            extract_faith_scores(df.iloc[idx].to_dict(), available),
        )
        for idx in range(len(df))
    ]
    return df


# --- round-trip quality metrics (evaluation/text_quality.py) ----------------


def chrf_score(
    hypothesis: str,
    reference: str,
    char_order: int = 6,
    beta: float = 2.0,
) -> float:
    """chrF (Popović 2015) with sacrebleu's default parameters: char
    n-grams 1..6 over whitespace-stripped text, macro-averaged precision
    and recall across orders, F-beta with beta=2, scaled to 0..100.
    sacrebleu is the bit-parity plug point for its exact smoothing."""
    hyp = "".join(hypothesis.split())
    ref = "".join(reference.split())
    if not hyp and not ref:
        return 100.0
    precisions = []
    recalls = []
    for n in range(1, char_order + 1):
        hyp_ngrams = Counter(
            hyp[i : i + n] for i in range(max(0, len(hyp) - n + 1))
        )
        ref_ngrams = Counter(
            ref[i : i + n] for i in range(max(0, len(ref) - n + 1))
        )
        hyp_total = sum(hyp_ngrams.values())
        ref_total = sum(ref_ngrams.values())
        if hyp_total == 0 and ref_total == 0:
            # both strings shorter than n: the order carries no signal —
            # skip it (identical short strings must score 100, not be
            # penalized for n-grams neither side can have)
            continue
        matches = sum(
            min(c, ref_ngrams[g]) for g, c in hyp_ngrams.items()
        )
        precisions.append(matches / hyp_total if hyp_total else 0.0)
        recalls.append(matches / ref_total if ref_total else 0.0)
    if not precisions:
        return 0.0
    avg_p = sum(precisions) / len(precisions)
    avg_r = sum(recalls) / len(recalls)
    denom = beta**2 * avg_p + avg_r
    if denom == 0:
        return 0.0
    return 100.0 * (1 + beta**2) * avg_p * avg_r / denom


def compute_text_quality_metric(
    hypothesis: str,
    reference: str,
    metric_type: str,
    threshold: float,
    metric_fn=None,
) -> tuple[float, bool]:
    """text_quality.py:26-54 contract: score + pass flag; sacrebleu/TER
    need the injected ``metric_fn(hypothesis, [reference]) -> score``
    (the sacrebleu plug point); chrf runs the real local
    implementation. TER passes when score <= threshold; the others when
    score >= threshold."""
    if metric_fn is not None:
        score = float(metric_fn(hypothesis, [reference]))
    elif metric_type == "chrf":
        score = chrf_score(hypothesis, reference)
    else:
        msg = (
            f"metric {metric_type!r} needs sacrebleu (absent); inject "
            f"metric_fn(hypothesis, references) -> score"
        )
        raise NotImplementedError(msg)
    if metric_type == "ter":
        return score, score <= threshold
    if metric_type in ("sacrebleu", "chrf"):
        return score, score >= threshold
    msg = f"Unsupported round-trip quality metric: {metric_type}"
    raise ValueError(msg)


@dataclass
class TextQualityMetricStage:
    """text_quality.py:57-135 contract over pandas frames: per metric a
    ``score_{type}`` + ``score_{type}_passed`` column, the all-metrics
    ``is_quality_metric_passed`` column, optional filtering."""

    reference_text_field: str = "text"
    hypothesis_text_field: str = "backtranslated_text"
    metrics: list | None = None
    filter_enabled: bool = False
    pass_column: str = "is_quality_metric_passed"
    metric_fns: dict | None = None

    def process(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        metrics = self.metrics or []
        if not metrics:
            df[self.pass_column] = True
            return df
        passed_columns = []
        for metric in metrics:
            metric_type = str(metric["type"])
            threshold = float(metric["threshold"])
            fn = (self.metric_fns or {}).get(metric_type)
            scores, passed = [], []
            for _, row in df.iterrows():
                s, p = compute_text_quality_metric(
                    str(row[self.hypothesis_text_field]),
                    str(row[self.reference_text_field]),
                    metric_type,
                    threshold,
                    metric_fn=fn,
                )
                scores.append(s)
                passed.append(p)
            df[f"score_{metric_type}"] = scores
            df[f"score_{metric_type}_passed"] = passed
            passed_columns.append(f"score_{metric_type}_passed")
        df[self.pass_column] = (
            df[passed_columns].all(axis=1) if passed_columns else True
        )
        if self.filter_enabled:
            df = df[df[self.pass_column]].reset_index(drop=True)
        return df


def text_quality_metrics(
    df: DataFrame,
    reference_col: str = "text",
    hypothesis_col: str = "backtranslated_text",
    metrics: list | None = None,
) -> DataFrame:
    """Spark form (chrf-capable locally): append per-metric score/pass
    columns + the all-pass column in one Arrow pass; filtering stays a
    JVM predicate downstream."""
    stage = TextQualityMetricStage(
        reference_text_field=reference_col,
        hypothesis_text_field=hypothesis_col,
        metrics=metrics or [{"type": "chrf", "threshold": 40.0}],
    )
    fields = []
    for m in stage.metrics:
        mt = str(m["type"])
        fields.append(T.StructField(f"score_{mt}", T.DoubleType()))
        fields.append(T.StructField(f"score_{mt}_passed", T.BooleanType()))
    fields.append(T.StructField(stage.pass_column, T.BooleanType()))
    schema = T.StructType(fields)

    @F.pandas_udf(schema)
    def _eval(hyp: pd.Series, ref: pd.Series) -> pd.DataFrame:
        frame = pd.DataFrame(
            {hypothesis_col: hyp, reference_col: ref}
        )
        out = stage.process(frame)
        return out[[f.name for f in fields]]

    res = df.withColumn(
        "_q", _eval(F.col(hypothesis_col), F.col(reference_col))
    )
    for f_ in fields:
        res = res.withColumn(f_.name, F.col(f"_q.{f_.name}"))
    return res.drop("_q")

"""Declarative YAML pipelines (reference Hydra-config shape, SURVEY.md §3.2).

A config is an ordered ``stages:`` list; each stage names an operator and
its params. The same YAML shape as the reference's
``config/text/*_pipeline.yaml`` (stage-class + kwargs), resolved to
DataFrame transforms instead of Ray stages.

Supported stage kinds:
  score_filter: {rule, text_field?, score_field?, invert?}
  score:        {rule, score_field, text_field?}
  filter:       {rule, filter_field, invert?}
  modify:       {modifier, text_field?, output_field?, **params}
  pii_scrub:    {text_field?, out_field?}
  add_id:       {id_field?, prefix?, key_field?}
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from nemo_curator_spark.operators import modifiers as M
from nemo_curator_spark.operators import pii, text_ops
from nemo_curator_spark.operators.score_filter import (
    Filter,
    Modify,
    Pipeline,
    Score,
    ScoreFilter,
    Stage,
)

_MODIFIERS = {
    "url_remover": M.remove_urls,
    "newline_normalizer": M.normalize_newlines,
    "markdown_remover": M.remove_markdown,
    "quotation_remover": M.remove_wrapping_quotes,
    "boilerplate_remover": M.remove_boilerplate,
    "unicode_reformatter": M.unicode_reformat,
}


def _build_stage(spec: dict[str, Any]) -> Stage:
    spec = dict(spec)
    kind = spec.pop("stage")
    if kind == "score_filter":
        return ScoreFilter(
            rule=spec["rule"],
            text_field=spec.get("text_field", "text"),
            score_field=spec.get("score_field"),
            invert=spec.get("invert", False),
        )
    if kind == "score":
        return Score(
            rule=spec["rule"],
            score_field=spec["score_field"],
            text_field=spec.get("text_field", "text"),
        )
    if kind == "filter":
        return Filter(
            rule=spec["rule"],
            filter_field=spec["filter_field"],
            invert=spec.get("invert", False),
        )
    if kind == "modify":
        fn = _MODIFIERS[spec["modifier"]]
        return Modify(
            fn=fn,
            text_field=spec.get("text_field", "text"),
            output_field=spec.get("output_field"),
        )
    if kind == "pii_scrub":
        class _Pii(Stage):
            def apply(self, df: DataFrame) -> DataFrame:
                return pii.scrub(
                    df,
                    spec.get("text_field", "text"),
                    out_col=spec.get("out_field", "text_scrubbed"),
                )

        return _Pii()
    if kind == "add_id":
        class _AddId(Stage):
            def apply(self, df: DataFrame) -> DataFrame:
                return text_ops.add_id(
                    df,
                    id_col=spec.get("id_field", "id"),
                    prefix=spec.get("prefix", "doc"),
                    key_col=spec.get("key_field"),
                )

        return _AddId()
    raise ValueError(f"unknown stage kind: {kind}")


def load_pipeline(path_or_dict) -> Pipeline:
    if isinstance(path_or_dict, dict):
        cfg = path_or_dict
    else:
        import yaml

        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f)
    stages = [_build_stage(s) for s in cfg["stages"]]
    return Pipeline(stages, name=cfg.get("name", "pipeline"))


def deep_merge(base: dict, overrides: dict) -> dict:
    """Recursive dict merge, overrides winning (reference
    audio/advanced_pipelines/audio_data_filter/config.py:42-50 —
    the defaults-plus-user-overrides config contract). Returns a new
    dict; inputs untouched."""
    import copy

    merged = copy.deepcopy(base)
    for key, value in overrides.items():
        if (
            key in merged
            and isinstance(merged[key], dict)
            and isinstance(value, dict)
        ):
            merged[key] = deep_merge(merged[key], value)
        else:
            merged[key] = value
    return merged


def load_config_with_defaults(defaults_path, overrides_path=None) -> dict:
    """Reference load_config (config.py:53-84): load the shipped
    defaults YAML and deep-merge an optional user file on top — only
    explicitly-set values override."""
    import yaml

    with open(defaults_path) as fh:
        defaults = yaml.safe_load(fh) or {}
    if overrides_path is None:
        return defaults
    import os

    if not os.path.isfile(str(overrides_path)):
        raise FileNotFoundError(f"Config file not found: {overrides_path}")
    with open(overrides_path) as fh:
        overrides = yaml.safe_load(fh) or {}
    return deep_merge(defaults, overrides)

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
  python_comment_filter: {min_comment_to_code_ratio?, max_comment_to_code_ratio?, text_field?}
  tokenizer_fertility:   {min_char_to_token_ratio?, path_to_tokenizer?, text_field?}
  fasttext_langid:       {model_path, min_langid_score?, text_field?}
  fasttext_quality:      {model_path, alpha?, label?, seed?, text_field?, key_field?}

``load_workflow`` resolves the reference's dedup workflow configs
(config/text/{exact,fuzzy,semantic}_deduplication_pipeline.yaml): a
``workflow:`` entry whose ``class`` names one of
``pipeline/dedup_workflows.py``'s classes, with ``${var}``
interpolation against the config's top-level keys (the Hydra
``${input_path}`` convention, minus Hydra).
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd  # module-level: pandas_udf hint resolution needs it
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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

# per-worker parsed-model cache keyed by path (CLAUDE.md: parse models
# once per worker process, never per Arrow batch)
_FT_MODEL_CACHE: dict[str, Any] = {}


def _cached_minifasttext(model_path: str):
    model = _FT_MODEL_CACHE.get(model_path)
    if model is None:
        from nemo_curator_spark.operators.fasttext_mini import MiniFastText

        model = MiniFastText.load(model_path)
        _FT_MODEL_CACHE[model_path] = model
    return model


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
    if kind == "python_comment_filter":
        # reference code_filter_pipeline.yaml: PythonCommentToCodeFilter
        lo = spec.get("min_comment_to_code_ratio", 0.01)
        hi = spec.get("max_comment_to_code_ratio", 0.85)
        tf = spec.get("text_field", "text")

        class _PyComment(Stage):
            def apply(self, df: DataFrame) -> DataFrame:
                from nemo_curator_spark.operators import code_filters as CF

                r = CF.python_comment_ratio_udf()(F.col(tf))
                return df.where((r >= lo) & (r <= hi))

        return _PyComment()
    if kind == "tokenizer_fertility":
        # reference TokenizerFertilityFilter; path_to_tokenizer is the
        # sentencepiece plug point — default trains a MiniBPE on a
        # bounded hash-sample of the input (deterministic)
        thr = spec.get("min_char_to_token_ratio", 2.5)
        tok_path = spec.get("path_to_tokenizer")
        tf = spec.get("text_field", "text")

        class _Fertility(Stage):
            def apply(self, df: DataFrame) -> DataFrame:
                from nemo_curator_spark.functions import bpe

                if tok_path:
                    raise NotImplementedError(
                        "path_to_tokenizer: sentencepiece models are the "
                        "tokenizer plug point; the in-sandbox path trains "
                        "a MiniBPE from the corpus"
                    )
                from nemo_curator_spark.functions.kmeans_np import (
                    sample_training_rows,
                )

                # bounded deterministic sample: hash FILTER + driver-side
                # truncation in (hash, text) order — no limit() races, no
                # full-table sort (the perplexity training pattern)
                _, rows = sample_training_rows(
                    df.withColumn("_h", F.xxhash64(F.col(tf))),
                    tf,
                    ["_h", tf],
                    500,
                )
                pairs = sorted((r["_h"], r[tf] or "") for r in rows)
                sample = [t for _, t in pairs[:500]]
                merges = bpe.train_bpe(sample, 256)

                @F.pandas_udf(T.DoubleType())
                def _score(texts: pd.Series) -> pd.Series:
                    tok = bpe.MiniBPE(merges)
                    fert = bpe.TokenizerFertilityFilter(
                        tok, min_char_to_token_ratio=thr
                    )
                    return pd.Series(
                        [fert.score_document(t or "") for t in texts]
                    )

                return df.where(_score(F.col(tf)) >= thr)

        return _Fertility()
    if kind == "fasttext_langid":
        # reference fasttext_filter_pipeline.yaml: FastTextLangId
        model_path = spec.get("model_path")
        min_score = spec.get("min_langid_score", 0.3)
        tf = spec.get("text_field", "text")

        class _FtLangid(Stage):
            def apply(self, df: DataFrame) -> DataFrame:
                from nemo_curator_spark.operators.langid import FastTextLangId

                stage = FastTextLangId(
                    model_path=model_path, min_langid_score=min_score
                )

                @F.pandas_udf(T.DoubleType())
                def _score(texts: pd.Series) -> pd.Series:
                    return stage.score_batch(texts)["score"].astype(float)

                return df.where(_score(F.col(tf)) >= min_score)

        return _FtLangid()
    if kind == "fasttext_quality":
        model_path = spec.get("model_path")
        alpha = spec.get("alpha", 3.0)
        label = spec.get("label", "__label__hq")
        seed = spec.get("seed", 42)
        tf = spec.get("text_field", "text")
        kf = spec.get("key_field", tf)

        class _FtQuality(Stage):
            def apply(self, df: DataFrame) -> DataFrame:
                from nemo_curator_spark.operators.fasttext_mini import (
                    FastTextQualityFilter,
                )

                @F.pandas_udf(T.BooleanType())
                def _keep(texts: pd.Series, keys: pd.Series) -> pd.Series:
                    flt = FastTextQualityFilter(
                        _cached_minifasttext(model_path),
                        alpha=alpha,
                        label=label,
                        seed=seed,
                    )
                    return pd.Series(flt.keep_batch(list(texts), list(keys)))

                return df.where(_keep(F.col(tf), F.col(kf)))

        return _FtQuality()
    raise ValueError(f"unknown stage kind: {kind}")


_WORKFLOWS = {
    "ExactDeduplicationWorkflow": "ExactDeduplicationWorkflow",
    "FuzzyDeduplicationWorkflow": "FuzzyDeduplicationWorkflow",
    "SemanticDeduplicationWorkflow": "SemanticDeduplicationWorkflow",
}


def _interpolate(value: Any, scope: dict) -> Any:
    """Hydra-style ``${key}`` interpolation against top-level config
    keys. Whole-value references preserve the referenced type; embedded
    references stringify. An unknown reference is an ERROR (a silent
    None/empty would route outputs to the wrong place)."""

    def _lookup(key: str) -> Any:
        if key not in scope:
            msg = f"unknown config reference ${{{key}}}"
            raise ValueError(msg)
        return scope[key]

    if isinstance(value, str):
        m = re.fullmatch(r"\$\{([A-Za-z0-9_]+)\}", value)
        if m:
            return _lookup(m.group(1))
        return re.sub(
            r"\$\{([A-Za-z0-9_]+)\}",
            lambda mm: str(_lookup(mm.group(1))),
            value,
        )
    if isinstance(value, dict):
        return {k: _interpolate(v, scope) for k, v in value.items()}
    if isinstance(value, list):
        return [_interpolate(v, scope) for v in value]
    return value


def load_workflow(path_or_dict):
    """Resolve a reference-shaped dedup workflow config (a ``workflow:``
    list of one entry with ``class`` + params) to a constructed
    workflow object from ``pipeline/dedup_workflows``. Unset required
    Hydra placeholders (``???``) must be overridden by the caller via
    the config dict before loading."""
    from nemo_curator_spark.pipeline import dedup_workflows as DW

    if isinstance(path_or_dict, dict):
        cfg = dict(path_or_dict)
    else:
        import yaml

        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f)
    entries = cfg.get("workflow")
    if not entries:
        raise ValueError("config has no workflow entry")
    spec = dict(entries[0] if isinstance(entries, list) else entries)
    cls_name = spec.pop("class")
    if cls_name not in _WORKFLOWS:
        msg = (
            f"unknown workflow class {cls_name!r}; "
            f"expected one of {sorted(_WORKFLOWS)}"
        )
        raise ValueError(msg)
    params = {
        k: _interpolate(v, cfg) for k, v in spec.items()
    }
    unset = sorted(
        k for k, v in params.items() if isinstance(v, str) and v == "???"
    )
    if unset:
        msg = f"unset required config values: {unset}"
        raise ValueError(msg)
    return getattr(DW, _WORKFLOWS[cls_name])(**params)


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

"""Score / Filter / ScoreFilter / Modify — the reference's projection-filter
framework re-expressed as DataFrame transformations.

Reference semantics (/root/reference nemo_curator/stages/text/filters/
score_filter.py:29-344, modifiers/modifier.py:24-100):

* ``Score``      — add a score column; never drops rows.
* ``Filter``     — drop rows by a keep predicate over an existing column.
* ``ScoreFilter``— fused: compute score (optionally persisted), then drop.
* ``Modify``     — rewrite a text column (in place or to a new column).

Here a "filter function" is a :class:`~nemo_curator_spark.functions.
heuristics.Rule` (or anything exposing ``score(ctx)->Column`` and
``keep(Column)->Column``), so the whole framework stays JVM-side; Catalyst
fuses chained stages into one projection + predicate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nemo_curator_spark.functions import heuristics as H


_STAGE_REGISTRY: dict[str, type] = {}


def get_stage_class(name: str) -> type:
    """stages/base.py:101-109: look a registered stage class up by name;
    KeyError (with the available names) when unregistered."""
    if name not in _STAGE_REGISTRY:
        msg = (
            f"Stage {name!r} is not registered. "
            f"Available: {sorted(_STAGE_REGISTRY)}"
        )
        raise KeyError(msg)
    return _STAGE_REGISTRY[name]


class Stage:
    """A DataFrame -> DataFrame transformation (ProcessingStage analogue).

    Concrete subclasses self-register by class name (the reference's
    StageMeta auto-registry, stages/base.py:53-96 — there via a
    metaclass, here via ``__init_subclass__``); ``processing_stage``
    registers its generated stages under the decorator ``name``."""

    name: str = "stage"

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        _STAGE_REGISTRY[cls.__name__] = cls

    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


def _rule(rule_or_name) -> H.Rule:
    if isinstance(rule_or_name, str):
        return H.RULES_BY_NAME[rule_or_name]
    return rule_or_name


def _score_col(rule: H.Rule, text_col: str) -> Column:
    if rule.score is not None:
        return rule.score(H.text_ctx(F.col(text_col)))
    field = H.NGRAM_COL_FOR_RULE[rule.name]
    return H.ngram_scores(F.col(text_col))[field]


@dataclass
class Score(Stage):
    """Add ``score_field`` = rule score over ``text_field``. Pure projection."""

    rule: object
    score_field: str
    text_field: str = "text"

    def apply(self, df: DataFrame) -> DataFrame:
        rule = _rule(self.rule)
        return df.withColumn(self.score_field, _score_col(rule, self.text_field))


@dataclass
class Filter(Stage):
    """Keep rows where the rule's keep predicate holds on ``filter_field``."""

    rule: object
    filter_field: str
    invert: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        rule = _rule(self.rule)
        keep = rule.keep(F.col(self.filter_field))
        return df.where(~keep if self.invert else keep)


@dataclass
class ScoreFilter(Stage):
    """Fused score+filter; persists the score only if ``score_field`` set.

    ``rule`` may be a single rule/name or a list (the reference's chain
    form, score_filter.py:347-524: one stage applying several filters in
    order); ``score_field``/``invert`` broadcast across the chain.
    """

    rule: object
    text_field: str = "text"
    score_field: str | None = None
    invert: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        rules = self.rule if isinstance(self.rule, (list, tuple)) else [self.rule]
        fields = (
            self.score_field
            if isinstance(self.score_field, (list, tuple))
            else [self.score_field] * len(rules)
        )
        if len(fields) != len(rules):
            raise ValueError("score_field list must match rule list length")
        for r, field in zip(rules, fields):
            rule = _rule(r)
            score = _score_col(rule, self.text_field)
            if field:
                df = df.withColumn(field, score)
                score = F.col(field)
            keep = rule.keep(score)
            df = df.where(~keep if self.invert else keep)
        return df


@dataclass
class Modify(Stage):
    """Apply a text->text Column transform (DocumentModifier analogue)."""

    fn: object  # Callable[[Column], Column]
    text_field: str = "text"
    output_field: str | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        out = self.output_field or self.text_field
        return df.withColumn(out, self.fn(F.col(self.text_field)))


class Pipeline:
    """Ordered stages applied to one DataFrame (reference Pipeline.run)."""

    def __init__(self, stages: list[Stage] | None = None, name: str = "pipeline"):
        self.name = name
        self.stages: list[Stage] = list(stages or [])

    def add_stage(self, stage: Stage) -> "Pipeline":
        self.stages.append(stage)
        return self

    def run(self, df: DataFrame) -> DataFrame:
        for stage in self.stages:
            df = stage.apply(df)
        return df

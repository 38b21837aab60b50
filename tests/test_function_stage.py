"""processing_stage decorator (reference stages/function_decorators.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from nemo_curator_spark.operators.function_stage import processing_stage
from nemo_curator_spark.operators.score_filter import Pipeline


def test_stage_registry():
    # reference test_function_decorators.test_stage_registry +
    # base.py:101-109 lookup contract
    from nemo_curator_spark.operators.function_stage import FunctionStage
    from nemo_curator_spark.operators.score_filter import (
        Filter,
        get_stage_class,
    )

    @processing_stage(name="RegistryProbeStage")
    def probe(df: pd.DataFrame) -> pd.DataFrame:
        return df

    cls = get_stage_class("RegistryProbeStage")
    assert issubclass(cls, FunctionStage)
    assert cls._decorated is probe
    # the registered class is no-arg constructible like the reference's
    # decorator-generated classes
    inst = cls()
    assert inst.name == "RegistryProbeStage" and inst._fn is probe._fn
    # concrete Stage subclasses self-register by class name
    assert get_stage_class("Filter") is Filter
    with pytest.raises(KeyError, match="not registered"):
        get_stage_class("NoSuchStage")


def test_processing_stage_decorator(spark):
    @processing_stage(name="WordCountStage", resources={"cpus": 1.0})
    def word_count(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["word_count"] = pdf["sentence"].str.split().str.len()
        return pdf

    # the decorator returns an INSTANCE with the reference attributes
    assert word_count.name == "WordCountStage"
    assert word_count.resources == {"cpus": 1.0}
    assert callable(word_count._fn)

    df = spark.createDataFrame(
        [("one two three",), ("four",), ("",)], "sentence string"
    )
    out = word_count(df).orderBy("sentence").collect()
    counts = {r.sentence: r.word_count for r in out}
    assert counts["one two three"] == 3 and counts["four"] == 1

    # composes with the Pipeline framework like built-in stages
    pipe = Pipeline([word_count], name="p")
    assert pipe.run(df).count() == 3


def test_processing_stage_contracts(spark):
    with pytest.raises(ValueError, match="exactly one"):
        @processing_stage(name="Bad")
        def two_args(a, b):
            return a

    # batch_size re-chunks inside a partition; results identical
    seen = []

    @processing_stage(name="Chunked", batch_size=2,
                      schema="sentence string, n bigint")
    def chunked(pdf: pd.DataFrame) -> pd.DataFrame:
        seen.append(len(pdf))
        return pd.DataFrame(
            {"sentence": pdf["sentence"], "n": [len(pdf)] * len(pdf)}
        )

    df = spark.createDataFrame(
        [(f"s{i}",) for i in range(5)], "sentence string"
    ).coalesce(1)
    rows = chunked(df).collect()
    assert len(rows) == 5
    assert all(r.n <= 2 for r in rows)

    # schema inference failure points at schema=
    @processing_stage(name="NeedsRows")
    def needs_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"x": [pdf["sentence"].iloc[0]]})

    with pytest.raises(ValueError, match="schema= explicitly"):
        needs_rows(df)

    # non-DataFrame return rejected at inference time
    @processing_stage(name="BadReturn")
    def bad_return(pdf: pd.DataFrame):
        return [1, 2]

    with pytest.raises(TypeError, match="pandas"):
        bad_return(df)

"""``processing_stage`` decorator — reference
stages/function_decorators.py:44-150: turn a plain function into a
pipeline stage.

The reference function receives one Task (a pandas batch) and returns
the transformed Task; the Spark translation receives one pandas
DataFrame per Arrow batch and returns a pandas DataFrame, applied via
``mapInPandas`` so the stage composes with
``operators/score_filter.Pipeline`` exactly like the built-in stages.

Signature parity: ``name`` (stage name), ``resources`` (accepted as a
dict or Resources-like mapping — an executor-provisioning hint with no
Spark meaning beyond ``batch_size``), ``batch_size`` (rows per Arrow
batch, mapped to ``spark.sql.execution.arrow.maxRecordsPerBatch``
semantics via batch re-chunking inside the generator). The
one-positional-argument validation happens at decoration time, like the
reference's import-time check.

``schema`` is the one Spark-only parameter: the output schema (DDL
string or StructType). When omitted it is inferred by applying the
function to an EMPTY pandas frame with the input schema's dtypes —
works for vectorized column adds; functions that can't handle empty
input must pass ``schema`` explicitly (the error says so).
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from nemo_curator_spark.operators.score_filter import Stage

_SPARK_TO_PANDAS = {
    "long": "int64",
    "bigint": "int64",
    "int": "int32",
    "integer": "int32",
    "double": "float64",
    "float": "float32",
    "string": "object",
    "boolean": "bool",
    "binary": "object",
    "timestamp": "datetime64[us]",
}


def _empty_pandas(schema: T.StructType) -> pd.DataFrame:
    cols = {}
    for f in schema.fields:
        dtype = _SPARK_TO_PANDAS.get(f.dataType.simpleString(), "object")
        cols[f.name] = pd.Series([], dtype=dtype)
    return pd.DataFrame(cols)


def _pandas_to_spark(df: pd.DataFrame) -> T.StructType:
    fields = []
    for name in df.columns:
        kind = df[name].dtype.kind
        if kind in "iu":
            dt = T.LongType() if df[name].dtype.itemsize >= 8 else T.IntegerType()
        elif kind == "f":
            dt = T.DoubleType()
        elif kind == "b":
            dt = T.BooleanType()
        elif kind == "M":
            dt = T.TimestampType()
        else:
            dt = T.StringType()
        fields.append(T.StructField(name, dt))
    return T.StructType(fields)


class FunctionStage(Stage):
    """The instantiated stage the decorator returns (reference
    _FunctionProcessingStage shape — ``_fn`` kept for introspection)."""

    def __init__(
        self,
        fn: Callable[[pd.DataFrame], pd.DataFrame],
        name: str,
        resources: dict | Any | None,
        batch_size: int | None,
        schema: str | T.StructType | None,
    ) -> None:
        self._fn = fn
        self.name = name
        self.resources = dict(resources) if isinstance(resources, dict) else resources
        self.batch_size = batch_size
        self.schema = schema

    def _out_schema(self, df: DataFrame) -> T.StructType:
        if self.schema is not None:
            if isinstance(self.schema, str):
                return T.StructType.fromDDL(self.schema)
            return self.schema
        try:
            probe = self._fn(_empty_pandas(df.schema))
        except Exception as e:
            msg = (
                f"processing_stage {self.name!r}: could not infer the "
                "output schema by applying the function to an empty "
                "frame; pass schema= explicitly"
            )
            raise ValueError(msg) from e
        if not isinstance(probe, pd.DataFrame):
            msg = (
                f"processing_stage {self.name!r} must return a pandas "
                f"DataFrame, got {type(probe).__name__}"
            )
            raise TypeError(msg)
        return _pandas_to_spark(probe)

    def apply(self, df: DataFrame) -> DataFrame:
        fn = self._fn
        batch_size = self.batch_size
        out_schema = self._out_schema(df)
        out_cols = [f.name for f in out_schema.fields]

        def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                chunks = (
                    [pdf]
                    if not batch_size
                    else [
                        pdf.iloc[i : i + batch_size]
                        for i in range(0, len(pdf), batch_size)
                    ]
                )
                for chunk in chunks:
                    out = fn(chunk.reset_index(drop=True))
                    yield out[out_cols]

        return df.mapInPandas(gen, out_schema)


def processing_stage(
    *,
    name: str,
    resources: dict | Any | None = None,
    batch_size: int | None = None,
    schema: str | T.StructType | None = None,
) -> Callable[[Callable[[pd.DataFrame], pd.DataFrame]], FunctionStage]:
    """function_decorators.py:44-110 contract: decoration-time signature
    validation, then an INSTANTIATED stage (not a class) ready to add to
    a Pipeline."""

    def decorator(fn: Callable[[pd.DataFrame], pd.DataFrame]) -> FunctionStage:
        sig = inspect.signature(fn)
        if len(sig.parameters) != 1:
            msg = (
                "A processing stage function must accept exactly one "
                "positional argument (the input batch)."
            )
            raise ValueError(msg)
        stage = FunctionStage(fn, name, resources, batch_size, schema)
        # the reference's decorator-generated class lands in the stage
        # registry under the decorator name (function_decorators.py via
        # StageMeta; get_stage_class("IncrementStage") in its tests).
        # Creating the named subclass registers it via
        # Stage.__init_subclass__. Like the reference's generated class
        # it is no-arg constructible (the decorator config is closed
        # over); _decorated carries the canonical instance.
        def _init(self) -> None:
            FunctionStage.__init__(
                self, fn, name, resources, batch_size, schema
            )

        type(name, (FunctionStage,), {"_decorated": stage, "__init__": _init})
        return stage

    return decorator

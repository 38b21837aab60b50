"""Skip/restore already-translated rows — reference
stages/text/experimental/translation/stages/skipped_rows.py:31-172."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nemo_curator_spark.operators.translation_skip import (
    COLUMN_DEFAULTS,
    restore_skipped_rows,
    skip_existing_translations,
)


def _corpus(spark):
    # order idx, source text, translation column state
    rows = [
        (0, "hello", None),          # needs translation (NULL)
        (1, "bonjour", "hello"),     # already translated
        (2, "hola", ""),             # blank -> needs translation
        (3, "ciao", "   "),          # whitespace-only -> needs translation
        (4, "hallo", "hi there"),    # already translated
        (5, "ahoj", "  "),  # unicode-space-only -> needs translation
    ]
    return spark.createDataFrame(
        rows, "idx bigint, text string, translated_text string"
    )


def test_split_predicate(spark):
    df = _corpus(spark)
    todo, skipped = skip_existing_translations(df)
    assert sorted(r.idx for r in todo.collect()) == [0, 2, 3, 5]
    assert sorted(r.idx for r in skipped.collect()) == [1, 4]


def test_missing_column_passthrough(spark):
    # skipped_rows.py:51-62 — no translation column: all rows proceed.
    df = _corpus(spark).drop("translated_text")
    todo, skipped = skip_existing_translations(df)
    assert todo.count() == 6
    assert skipped.count() == 0
    assert skipped.columns == todo.columns


def test_restore_fills_defaults_and_order(spark):
    df = _corpus(spark)
    todo, skipped = skip_existing_translations(df)
    # Simulate the translate+FAITH stages adding columns to the todo side.
    translated = (
        todo.withColumn("translated_text", F.upper("text"))
        .withColumn("faith_avg", F.lit(3.5))
        .withColumn("faith_parse_failed", F.lit(True))
        .withColumn("translation_metadata", F.lit('{"model":"x"}'))
        .withColumn("reviewer", F.lit("alice"))  # not in the default table
    )
    merged = restore_skipped_rows(translated, skipped, order_col="idx")
    out = {r.idx: r for r in merged.collect()}
    assert sorted(out) == [0, 1, 2, 3, 4, 5]
    # Skipped rows keep their existing translation, get table defaults.
    assert out[1].translated_text == "hello"
    assert out[1].faith_avg == COLUMN_DEFAULTS["faith_avg"] == 0.0
    assert out[1].faith_parse_failed is False
    assert out[1].translation_metadata == "{}"
    assert out[1].reviewer == ""  # not in table -> empty string
    # Translated rows keep the stage outputs.
    assert out[0].translated_text == "HELLO"
    assert out[0].faith_avg == 3.5
    assert out[4].text == "hallo"


def test_restore_drop_order_col(spark):
    df = _corpus(spark)
    todo, skipped = skip_existing_translations(df)
    translated = todo.withColumn("translated_text", F.upper("text"))
    merged = restore_skipped_rows(
        translated, skipped, order_col="idx", drop_order_col=True
    )
    assert "idx" not in merged.columns
    # Order restored: texts come back in original idx order.
    texts = [r.text for r in merged.toLocalIterator()]
    assert texts == ["hello", "bonjour", "hola", "ciao", "hallo", "ahoj"]


def test_restore_empty_skipped(spark):
    df = _corpus(spark).where(F.col("translated_text").isNull())
    todo, skipped = skip_existing_translations(df)
    assert skipped.count() == 0
    translated = todo.withColumn("translated_text", F.upper("text"))
    merged = restore_skipped_rows(translated, skipped, order_col="idx")
    assert merged.count() == 1


def test_default_types_cast(spark):
    # Defaults cast to the translated side's schema (bool/double/string).
    df = _corpus(spark)
    todo, skipped = skip_existing_translations(df)
    translated = (
        todo.withColumn("faith_avg", F.lit(1.0).cast(T.DoubleType()))
        .withColumn("faith_parse_failed", F.lit(False))
    )
    merged = restore_skipped_rows(translated, skipped, order_col="idx")
    schema = {f.name: f.dataType for f in merged.schema.fields}
    assert isinstance(schema["faith_avg"], T.DoubleType)
    assert isinstance(schema["faith_parse_failed"], T.BooleanType)

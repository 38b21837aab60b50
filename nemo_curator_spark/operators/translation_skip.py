"""Skip-existing-translations / restore stages — reference
stages/text/experimental/translation/stages/skipped_rows.py:31-172.

The reference splits each batch into already-translated rows (stashed in
task metadata) and needs-translation rows, then re-merges after the
translate/FAITH stages, filling columns the skipped rows never acquired
with a fixed default table and restoring the original row order.

Spark shape: the batch-metadata stash becomes an explicit second
DataFrame — ``skip_existing_translations`` returns (todo, skipped) from
ONE predicate (each side is a filter over the same scan; no shuffle),
and ``restore_skipped_rows`` is a union-by-name with literal defaults.
Order restoration uses a caller-named order column instead of the
reference's ``range(len(df))`` batch index (a per-batch counter is
meaningless across partitions; the order column is the distributed
equivalent and round-trips exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nemo_curator_spark import constants as C

# skipped_rows.py:104-118 — verbatim default table for columns the
# translate/FAITH stages added while a row sat skipped.
COLUMN_DEFAULTS: dict[str, object] = {
    "faith_fluency": 0.0,
    "faith_accuracy": 0.0,
    "faith_idiomaticity": 0.0,
    "faith_terminology": 0.0,
    "faith_handling_of_format": 0.0,
    "faith_avg": 0.0,
    "faith_parse_failed": False,
    "faith_segment_scores": "[]",
    "_translation_time": 0.0,
    "_translation_error": "",
    "translation_time": 0.0,
    "translation_errors": "",
    "translation_metadata": "{}",
}


def has_translation(translation_column: str = "translated_text"):
    """skipped_rows.py:65-67: non-null AND non-blank after strip. The
    reference strips with pandas ``.str.strip()`` (python-isspace set),
    so the blank test uses the ISPACE strip class, not ``F.trim``
    (ASCII-space-only — would call a NBSP-only cell "translated")."""
    col = F.col(translation_column)
    stripped = F.regexp_replace(col, C.STRIP_PATTERN, "")
    return col.isNotNull() & (stripped != F.lit(""))


def skip_existing_translations(
    df: DataFrame,
    translation_column: str = "translated_text",
) -> tuple[DataFrame, DataFrame]:
    """skipped_rows.py:45-95: (needs-translation, already-translated).

    When the translation column does not exist, everything needs
    translation and the skipped side is empty (reference logs and
    passes the whole batch through).
    """
    if translation_column not in df.columns:
        return df, df.limit(0)
    pred = has_translation(translation_column)
    return df.where(~pred), df.where(pred)


def restore_skipped_rows(
    translated: DataFrame,
    skipped: DataFrame,
    order_col: str,
    drop_order_col: bool = False,
) -> DataFrame:
    """skipped_rows.py:126-172: union the stashed rows back, filling
    columns the skipped side lacks from :data:`COLUMN_DEFAULTS` (empty
    string otherwise — including a missing translation column), and
    restore the original order by ``order_col``.

    Sorting is expressed as ``sortWithinPartitions`` after a range
    repartition only when the caller drops the order column; otherwise
    the order column itself carries the ordering and downstream sinks
    can ``ORDER BY`` it — a global sort on 100 TB just to re-emit is the
    reference's single-process artifact, not a semantic requirement.
    """
    filled = skipped
    for col in translated.columns:
        if col in skipped.columns:
            continue
        filled = filled.withColumn(
            col, F.lit(COLUMN_DEFAULTS.get(col, "")).cast(translated.schema[col].dataType)
        )
    merged = translated.unionByName(filled.select(translated.columns))
    if drop_order_col:
        merged = merged.repartitionByRange(order_col).sortWithinPartitions(order_col)
        merged = merged.drop(order_col)
    return merged

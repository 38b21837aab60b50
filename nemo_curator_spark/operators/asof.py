"""As-of (point-in-time) join — a task-mandated custom operator the
reference lacks (SURVEY §2.6 absent-relational-features list).

For every left row, attach the latest right row with
``right.ts <= left.ts`` within the same key — the market-data /
event-enrichment join. Implemented the scalable way: tag both sides,
UNION, one window pass per key ordered by (ts, side) carrying the last
non-null right payload forward — ONE shuffle on the key, never a range
join or per-row scan of the right side (a naive join-then-filter is
O(|L|x|R|) per key). Right rows sort before left rows at equal
timestamps, giving inclusive ``>=`` semantics — exactly DuckDB's
``ASOF LEFT JOIN ... ON l.ts >= r.ts``, which serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Left rows + latest-as-of right payload columns (null when no right
    row precedes). ``right_cols`` defaults to every right column except
    the key(s) and timestamp."""
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (*keys, right_ts)
        ]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {clash}")

    left_payload = [c for c in left.columns if c not in (*keys, left_ts)]
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c) for c in right_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return (
        u.where(F.col("_side") == 1)
        .select(*keys, F.col("_ts").alias(left_ts), *left_payload, *right_cols)
    )

"""Scale-adaptive input-parallelism guard.

Parquet scan splits cannot cross row-group boundaries, so a table written
as one file with one row group caps every downstream map stage at ONE
task no matter how many cores the session has (the CLAUDE.md round-6
lesson: a 17-file/1-row-group cache halved bench numbers for two
rounds). The driver-provided sf tables are exactly that shape
(documents.parquet / embeddings.parquet: 1 file, 1 row group), which
starves the pure-map chain and the similarity UDF stages.

:func:`ensure_min_parallelism` repartitions ONLY when the physical scan
parallelism is below the session's core count — the guide §2.5 "input
skew: one huge unsplittable file → repartition immediately after the
read" remedy, made conditional so that at real scale (abundant splits)
it is a no-op and the plan stays exchange-free. The repartition hashes a
deterministic column (never round-robin: keyless repartition pays a
sort-before-repartition pass, and guide §2.5 warns against
nondeterministic row routing under retries). Per-row results are
partitioning-independent, so values are unchanged either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_min_parallelism(df: DataFrame, key: Column | str) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    current physical partition count is below it. ``key``: deterministic
    high-cardinality column/expression to hash on."""
    try:
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target or target <= 1:
        return df
    key_col = F.col(key) if isinstance(key, str) else key
    return df.repartition(target, F.xxhash64(key_col))

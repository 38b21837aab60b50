"""Table IO: Iceberg when its Spark runtime is on the classpath, parquet
otherwise (this image ships no Iceberg jar — gated, not assumed).

Readers/writers mirror the reference's io stages (SURVEY.md §2.1/§2.2):
jsonl/parquet read with column projection, deterministic idempotent writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


ICEBERG_LOCAL_CONF = {
    # documented for real clusters; requires iceberg-spark-runtime jar
    "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.local.type": "hadoop",
    "spark.sql.catalog.local.warehouse": "/tmp/iceberg-warehouse",
}


def read_table(spark: SparkSession, location: str, fields: list[str] | None = None) -> DataFrame:
    """Read an Iceberg table name (catalog.db.tbl) or a parquet/jsonl path.
    Column projection via ``fields`` (reference readers' `fields` arg —
    Catalyst prunes the scan)."""
    if location.endswith(".jsonl") or location.endswith(".json"):
        df = spark.read.json(location)
    elif "/" not in location and has_iceberg(spark):
        df = spark.read.table(location)
    else:
        df = spark.read.parquet(location)
    return df.select(*fields) if fields else df


def write_table(
    df: DataFrame,
    location: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    if "/" not in location and has_iceberg(df.sparkSession):
        writer = df.writeTo(location)
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "jsonl":
        w.json(location)
    else:
        w.parquet(location)

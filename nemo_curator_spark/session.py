"""SparkSession factory tuned for the curation workload.

Scale stance (SURVEY.md §7.0): AQE on (runtime coalesce + skew-join),
Arrow-vectorized Python, shuffle partitions sized to the active
parallelism (overridable for real clusters), UTC session time so oracle
comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nemo_curator_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master.split("[")[-1].rstrip("]") if "[" in master else cpus
        shuffle_partitions = 32 if n == "*" else max(int(n), 1)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Scan-split sizing: extraction (the heaviest python stage) runs
        # map-side on SCAN partitions since round 2 (the raw html column
        # must never cross a shuffle at 100 TB). Default 128 MB splits
        # coalesce this repo's small local corpora into 1-2 tasks and
        # starve local[32]; 2 MB splits + 1 MB open-cost give one task per
        # part file here while at 100 TB splits are abundant either way
        # (a real deployment re-tunes toward 16-64 MB for UDF-heavy scans).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "2m"),
        )
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    # RAM-backed shuffle/spill when tmpfs is available: local-mode shuffles
    # all flow through spark.local.dir, and VM disk latency (D-state storms)
    # otherwise dominates and jitters every measurement
    shm = os.environ.get("SPARK_LOCAL_DIR")
    if shm is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        shm = "/dev/shm/spark-local"
    if shm:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Checkpoint-resume via snapshot manifests (Iceberg-commit stand-in).

The north rule wants resume-from-last-committed-snapshot over an Iceberg
metrics table. Iceberg needs its Spark runtime jar (not in this image —
gated in :mod:`nemo_curator_spark.io.tables`), so the commit protocol is
implemented directly on a parquet layout with the same guarantees Iceberg
gives us at the granularity we need:

    out/
      data/source_id=<k>/...parquet   (per-source-bucket data files)
      lineage/<run_id>/<source_id>.parquet
      _snapshots/<seq>-<run_id>.json  (atomic rename; lists committed ids)

* A source bucket is COMMITTED only when a snapshot file names it — data
  files for half-written buckets are invisible to resume (same contract as
  the reference's LMDB ResumabilityActor union-of-writers semantics,
  utils/resumability_actor.py:14-60).
* ``committed_source_ids`` = union over all snapshot files.
* ``resume_filter`` anti-joins pending buckets against the committed set.
* Writes are idempotent per bucket (overwrite-by-partition), so a retry of
  an uncommitted bucket is safe — Spark task retries stay correct.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointedOutput:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.lineage_dir = os.path.join(out_dir, "lineage")
        self.snap_dir = os.path.join(out_dir, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # --- snapshot bookkeeping ---
    def committed_source_ids(self) -> set[int]:
        committed: set[int] = set()
        for name in sorted(os.listdir(self.snap_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.snap_dir, name)) as f:
                    committed.update(json.load(f)["source_ids"])
        return committed

    def _next_seq(self) -> int:
        seqs = [
            int(n.split("-", 1)[0])
            for n in os.listdir(self.snap_dir)
            if n.endswith(".json")
        ]
        return max(seqs, default=0) + 1

    def commit(self, source_ids: list[int], run_id: str, meta: dict | None = None) -> str:
        """Atomically publish a snapshot naming the newly-committed buckets."""
        seq = self._next_seq()
        payload = {
            "seq": seq,
            "run_id": run_id,
            "source_ids": sorted(int(s) for s in source_ids),
            "committed_at": time.time(),
            "meta": meta or {},
        }
        final = os.path.join(self.snap_dir, f"{seq:06d}-{run_id}.json")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.rename(tmp, final)
        return final

    # --- run ---
    def resume_filter(self, labeled: DataFrame) -> DataFrame:
        committed = self.committed_source_ids()
        if not committed:
            return labeled
        return labeled.where(
            ~F.col("source_id").isin([int(c) for c in committed])
        )

    def write_run(
        self,
        labeled: DataFrame,
        lineage_df: DataFrame,
        run_id: str | None = None,
    ) -> dict:
        """Write pending buckets + lineage, then commit them in one snapshot.

        Returns {run_id, committed (list), skipped (count)}.
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        pending = self.resume_filter(labeled)
        pending.persist()
        try:
            new_ids = [
                r["source_id"]
                for r in pending.select("source_id").distinct().collect()
            ]
            if not new_ids:
                return {"run_id": run_id, "committed": [], "skipped": 0}
            (
                pending.write.mode("overwrite")
                .partitionBy("source_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(self.data_dir)
            )
            lineage_pending = lineage_df.where(
                F.col("source_id").isin([int(i) for i in new_ids])
            )
            lineage_pending.write.mode("overwrite").parquet(
                os.path.join(self.lineage_dir, run_id)
            )
            self.commit(new_ids, run_id)
            return {"run_id": run_id, "committed": sorted(new_ids), "skipped": 0}
        finally:
            pending.unpersist()

    # --- readers ---
    def read_data(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self.data_dir)
        committed = self.committed_source_ids()
        return df.where(F.col("source_id").isin([int(c) for c in committed]))

    def committed_run_ids(self) -> set[str]:
        run_ids: set[str] = set()
        for name in sorted(os.listdir(self.snap_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.snap_dir, name)) as f:
                    run_ids.add(json.load(f)["run_id"])
        return run_ids

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        """Lineage of COMMITTED runs only — a run that wrote lineage but
        crashed before commit() stays invisible, matching the data-side
        visibility contract (read_data filters to committed source_ids)."""
        committed = self.committed_run_ids()
        run_dirs = [
            os.path.join(self.lineage_dir, r)
            for r in sorted(committed)
            if os.path.isdir(os.path.join(self.lineage_dir, r))
        ]
        if not run_dirs:
            raise FileNotFoundError(
                f"no committed lineage under {self.lineage_dir}"
            )
        return spark.read.parquet(*run_dirs)

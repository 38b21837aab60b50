#!/usr/bin/env python
"""spark-submit entrypoint for the curation pipeline.

    spark-submit --py-files nemo_curator_spark.zip scripts/run_pipeline.py \
        --input /path/web_pages.parquet --output /path/out \
        [--resume] [--no-quality-sampling] [--partitions 256]

Reads the web_pages table (parquet path or Iceberg table name), runs the
full curation pipeline, writes curated data + lineage under --output with
snapshot commits, and prints a one-line JSON summary. Re-running with
--resume processes only uncommitted source buckets.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--no-quality-sampling", action="store_true")
    p.add_argument("--train-ppl", action="store_true", default=True)
    args = p.parse_args()

    from nemo_curator_spark.io import tables
    from nemo_curator_spark.operators import perplexity as ppl_mod
    from nemo_curator_spark.pipeline import checkpoint, webpages
    from nemo_curator_spark.session import get_spark

    spark = get_spark(app_name="curate", master=f"local[{args.cores}]")
    t0 = time.time()
    df = tables.read_table(spark, args.input)

    models = (
        ppl_mod.train_per_language(df, max_docs_per_lang=5000)
        if args.train_ppl
        else None
    )
    cfg = webpages.CurationConfig(
        salt_partitions=args.partitions or int(args.cores) * 2,
        apply_quality_sampling=not args.no_quality_sampling,
    )
    labeled = webpages.curate(df, models, cfg)

    out = checkpoint.CheckpointedOutput(args.output)
    run_id = time.strftime("%Y%m%d%H%M%S")
    lin = webpages.lineage(labeled, run_id=run_id)
    result = out.write_run(labeled, lin, run_id=run_id)

    n_docs = df.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "run_id": result["run_id"],
                "input_docs": n_docs,
                "committed_buckets": len(result["committed"]),
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

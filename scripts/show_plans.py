#!/usr/bin/env python
"""Print explain('formatted') for the key operators — the plan-quality
checklist (pushdown reaches the scan, column pruning, no stray exchanges,
UDF stages where expected). Run: python scripts/show_plans.py [sf_dir]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nemo_curator_spark.operators import dedup, pii, similarity
from nemo_curator_spark.pipeline import chain
from nemo_curator_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[4]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def show(title, df):
        print(f"\n{'=' * 70}\n{title}\n{'=' * 70}")
        df.explain("formatted")

    show(
        "single rule (expect: ReadSchema pruned to doc_id+text, no exchange)",
        chain.add_scores(docs, "text", ["word_count"]).select(
            "doc_id", "score_word_count"
        ),
    )
    show(
        "filter pushdown (expect: PushedFilters at the scan)",
        docs.where(F.col("doc_id") < 100).select("doc_id"),
    )
    show(
        "full chain labels (expect: zero exchanges — pure map; "
        "2 ArrowEvalPython stages: word_line_batch + ngram_scores)",
        chain.english_chain(docs, "text", mode="label"),
    )
    show(
        "exact dedup (expect: ONE exchange on md5(text), window, filter)",
        dedup.exact_duplicate_ids(docs),
    )
    show(
        "pii scrub (expect: single projection of regexp chains, no python)",
        pii.scrub(docs, "text"),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    show(
        "ann topk (expect: bucket-key equi-joins, NO cartesian product)",
        similarity.ann_topk_hyperplane(emb, k=3, num_tables=2),
    )
    show(
        "ivf rerank (expect: single Arrow assignment projection, explode, "
        "equi-join on list id — no crossJoin, no per-row window before "
        "the rank)",
        similarity.ivf_topk(emb, k=3, n_lists=4, n_probe=2),
    )
    from nemo_curator_spark.operators import semantic

    show(
        "semantic scores (expect: one Arrow assign projection, window "
        "rank per cluster, one join bounded by the earlier-side cap, "
        "groupBy max)",
        semantic.semantic_scores(emb, k=4),
    )
    from nemo_curator_spark.pipeline import webpages

    web = spark.createDataFrame(
        [],
        "url string, warc_ts timestamp_ntz, html binary, text string, lang string",
    )
    show(
        "full curate (expect: extraction ArrowEvalPython BEFORE the salted "
        "Exchange; html absent from every Exchange input — pinned by "
        "tests/test_plan_shapes.py)",
        webpages.curate(web, models=None),
    )
    spark.stop()


if __name__ == "__main__":
    main()

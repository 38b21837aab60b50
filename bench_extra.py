#!/usr/bin/env python
"""Per-stage isolation bench (guide §1.4): times each sub-stage of the
headline bench queries with the noop sink so the computation is measured,
not the sink, and optionally dumps .explain('formatted') per stage.

NOT part of the driver contract — bench.py stays the frozen measurement.
Usage: python bench_extra.py [--stages curate,fuzzy,ann,ivf,chain,pii]
       [--plans-dir plans/r08] [--web-docs 50000]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--web-docs", type=int, default=50000)
    ap.add_argument("--stages", default="curate,fuzzy,ann,ivf,chain,pii,exact,docs_chain")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from nemo_curator_spark import synth
    from nemo_curator_spark.operators import dedup, pii, similarity
    from nemo_curator_spark.operators import langid as langid_mod
    from nemo_curator_spark.operators import perplexity as ppl_mod
    from nemo_curator_spark.functions import heuristics as H
    from nemo_curator_spark.pipeline import chain, webpages
    from nemo_curator_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra", master=f"local[{args.cores}]",
        shuffle_partitions=int(args.cores),
    )
    sc = spark.sparkContext

    corpus_path = os.path.join(REPO, "data", f"web_pages_{args.web_docs}.parquet")
    synth.ensure_web_pages_parquet(spark, corpus_path, args.web_docs)
    web = spark.read.parquet(corpus_path)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    models = ppl_mod.train_per_language(web, max_docs_per_lang=2000)
    cfg = webpages.CurationConfig(salt_partitions=int(args.cores) * 2)

    results: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, df, action=None):
        act = action or (lambda: noop(df))
        sc.setJobDescription(name)
        best = None
        for _ in range(args.repeat):
            t0 = time.time()
            act()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        sc.setJobDescription(None)
        results[name] = round(best, 3)
        print(f"  {name}: {best:.3f}s", file=sys.stderr)
        if args.plans_dir and df is not None:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())

    stages = set(args.stages.split(","))

    # warmup: same shapes as bench.py
    warm = web.limit(2000).localCheckpoint()
    webpages.curate(warm, models, cfg).agg(F.sum(F.col("keep").cast("long"))).collect()
    chain.english_chain(warm, "text", mode="label").agg(F.sum(F.col("keep").cast("long"))).collect()
    dedup.fuzzy_duplicate_ids(
        warm.select(F.xxhash64("url").alias("doc_id"), "text"),
        num_perms=64, num_bands=16, jaccard_threshold=0.8,
    ).count()
    warm.unpersist()

    if "curate" in stages:
        # full pipeline, then cumulative-prefix isolation of its stages
        full = webpages.curate(web, models, cfg)
        timed("curate_full_noop", full)

        base = webpages.add_source_id(web, "url", cfg.n_source_buckets)
        from nemo_curator_spark.operators import extraction, quality

        ext = base.withColumn(
            "text", F.coalesce(extraction.extract_text(F.col("html")), F.col("text"))
        ).drop("html")
        timed("curate_1_extract", ext)
        lid = langid_mod.add_langid(ext, "text", "lang_pred", "lang_score")
        timed("curate_2_langid", lid)
        n_salt = max(cfg.salt_partitions or 0, 256)
        rep = lid.repartition(
            cfg.salt_partitions, F.col("lang_pred"),
            F.pmod(F.xxhash64("text"), F.lit(n_salt)),
        )
        timed("curate_3_repart", rep)
        wl = rep.withColumn("_wl", H.word_line_batch(F.col("text")))
        timed("curate_4_wl", wl)
        ch = chain.add_labels(wl, "text", keep_col="_hk", reason_col="_hr", wl_col="_wl")
        timed("curate_5_chain", ch)
        pp = ppl_mod.score_perplexity(
            ch, models, "text", "lang_pred", out_col="ppl", bucket=False,
        )
        timed("curate_6_ppl", pp)
        qq = pp.withColumn("quality_score", quality.lexical_quality_from_batch(F.col("_wl")))
        timed("curate_7_quality", qq)
        sc_ = pii.scrub(qq, "text", out_col="text_scrubbed")
        timed("curate_8_pii", sc_)

    if "chain" in stages:
        timed("chain_label_noop", chain.english_chain(web, "text", mode="label"))
        # pieces: wl batch only / ngram only / native only
        timed("chain_wl_only", web.select(H.word_line_batch(F.col("text")).alias("w")))
        timed("chain_ngram_only", web.select(H.ngram_scores(F.col("text")).alias("g")))
        native = [
            n for n in chain.chain_rule_names()
            if n not in H.PY_BATCH_RULES and n not in H.NGRAM_COL_FOR_RULE
        ]
        timed("chain_native_only", chain.add_scores(web, "text", native))

    if "docs_chain" in stages:
        timed("docs_chain_noop", chain.english_chain(docs, "text", mode="label"))

    if "pii" in stages:
        timed("pii_noop", pii.scrub(web, "text"))

    if "exact" in stages:
        timed("exact_noop", dedup.exact_duplicate_ids(web, "text", "url"))

    if "fuzzy" in stages:
        keyed = web.select(F.xxhash64("url").alias("doc_id"), "text")
        sigs = dedup.add_minhash(keyed, "text", 64, 24, 42)
        timed("fuzzy_1_minhash", sigs.select("doc_id", "minhash"))
        pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", "minhash", 16, 64)
        timed("fuzzy_2_lsh_pairs", pairs)
        ver = dedup.jaccard_ngram(keyed, pairs, "doc_id", "text").where(
            F.col("jaccard") >= 0.8
        )
        timed("fuzzy_3_jaccard", ver)
        edges = ver.select("a", "b").localCheckpoint()
        timed(
            "fuzzy_4_components", None,
            action=lambda: dedup.connected_components(edges, strict=False).count(),
        )
        timed(
            "fuzzy_full", None,
            action=lambda: dedup.fuzzy_duplicate_ids(
                keyed, num_perms=64, num_bands=16, jaccard_threshold=0.8
            ).count(),
        )

    if "ann" in stages:
        timed(
            "ann_noop",
            similarity.ann_topk_hyperplane(emb, k=5, n_planes=6, num_tables=4, dim=64),
        )
    if "ivf" in stages:
        timed(
            "ivf_full", None,
            action=lambda: similarity.ivf_topk(emb, k=5, n_lists=16, n_probe=3).count(),
        )

    print(json.dumps({"stage_best_sec": results}))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness: headline curation queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "docs_per_sec": <curation tput>,
   "cores": N, "web_docs": M}

The curation throughput (docs/sec over the full pipeline: extract → langid →
28-rule heuristics → perplexity → quality → PII scrub) is the number
BASELINE.md gates against (reference: ≥19k docs/s on its 26-filter chain).
The web_pages corpus is synthesized deterministically (seed 42) at
``--web-docs`` rows (default 20k at sf0.1 scale) and cached under data/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _cpu_times() -> list[int] | None:
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except Exception:
        return None


def _steal_pct(before: list[int] | None, after: list[int] | None) -> float | None:
    """Hypervisor steal share over the whole bench window. The host VM
    shows minutes-scale vCPU-contention bursts (identical runs vary up
    to 10x with zero local load); steal% is the direct signature, so
    the JSON line carries it and a reader can discount burst-poisoned
    records without guessing (see BENCH/BASELINE.md session notes)."""
    if not before or not after:
        return None
    d = [y - x for x, y in zip(before, after)]
    total = sum(d)
    return round(100.0 * d[7] / total, 2) if total and len(d) > 7 else None


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parser.add_argument("--web-docs", type=int, default=int(os.environ.get("BENCH_WEB_DOCS", "50000")))
    parser.add_argument("--skip-generate", action="store_true")
    args = parser.parse_args()

    from pyspark.sql import functions as F

    from nemo_curator_spark import synth
    from nemo_curator_spark.operators import dedup, pii, similarity
    from nemo_curator_spark.operators import perplexity as ppl_mod
    from nemo_curator_spark.pipeline import chain, webpages
    from nemo_curator_spark.session import get_spark

    sf = args.sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(
        app_name=f"bench_sf{sf}", master=f"local[{args.cores}]",
        shuffle_partitions=int(args.cores),
    )

    corpus_path = os.path.join(REPO, "data", f"web_pages_{args.web_docs}.parquet")
    synth.ensure_web_pages_parquet(spark, corpus_path, args.web_docs)
    web = spark.read.parquet(corpus_path)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")

    # model training is offline-artifact work -> outside the timed region
    models = ppl_mod.train_per_language(web, max_docs_per_lang=2000)

    # the exact config the timed curate_full uses — the warmup below must
    # compile the SAME plan shape (salted repartition path included), so
    # the first timed run hits no residual codegen
    cfg = webpages.CurationConfig(salt_partitions=int(args.cores) * 2)

    # WARMUP (untimed): trigger JVM JIT + whole-stage-codegen compilation +
    # python-worker pool spin-up before any measurement, so every timed
    # number below is a steady-state (deployment-shape) number and rounds
    # are comparable without side measurements. A bounded slice keeps the
    # warmup itself cheap.
    warm_slice = web.limit(2000).localCheckpoint()
    webpages.curate(warm_slice, models, cfg).agg(
        F.sum(F.col("keep").cast("long"))
    ).collect()
    # the bare chain is a DIFFERENT plan shape than curate's; compile its
    # whole-stage codegen too (the first run of a novel 28-rule projection
    # costs ~20-30s of janino compilation alone)
    chain.english_chain(warm_slice, "text", mode="label").agg(
        F.sum(F.col("keep").cast("long"))
    ).collect()
    dedup.fuzzy_duplicate_ids(
        warm_slice.select(F.xxhash64("url").alias("doc_id"), "text"),
        num_perms=64, num_bands=16, jaccard_threshold=0.8,
    ).count()
    warm_slice.unpersist()

    cpu_before = _cpu_times()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    run_steals: dict[str, list[float | None]] = {}
    run_bw: dict[str, list[float]] = {}
    query_clean: dict[str, bool] = {}

    # burst-defense thresholds (the documented signature from
    # BENCH/BASELINE.md: per-window steal >6% or a >3x best-of spread on
    # a >5s query means the window was poisoned, not the engine)
    STEAL_BAR = 6.0
    SPREAD_BAR = 3.0
    SPREAD_MIN_SEC = 5.0
    MAX_EXTRA_RUNS = 3
    # memory-bandwidth floor: neighbor-VM memory pressure slows scan-
    # heavy queries 10x WITHOUT showing up as steal (a clean-steal run
    # measured the chain at 15x its record in one such window). A
    # single-thread numpy copy measures ~5 GB/s on this VM when healthy;
    # below half that the window is degraded regardless of steal.
    BW_BAR_GBS = 2.5
    _bw_buf = np.empty(64 * 1024 * 1024, dtype=np.uint8)
    _bw_buf[:] = 1

    def _bw_probe() -> float:
        """Best-of-3 single-thread copy bandwidth in GB/s (~100 ms)."""
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            _bw_buf.copy()
            dt = time.perf_counter() - t0
            best = max(best, (2 * _bw_buf.nbytes) / dt / 1e9)
        return round(best, 2)

    def timed(name, fn, n=3):
        """Best-of-n per query with burst DEFENSE: the host VM shows up
        to 10x run-to-run noise (BENCH/BASELINE.md calibration), and the
        driver archives a single JSON line — one load burst must not
        dominate the round record. Each run's hypervisor-steal share is
        sampled individually; if the best run landed in a poisoned
        window (steal > 6%) or the spread shows the burst signature
        (max/min > 3 on a >5s query), the query is re-run up to 3 more
        times to find a clean window. All raw runs + per-run steal are
        kept in the JSON ("runs"/"run_steals"), and "query_clean" says
        whether the recorded best came from a clean window."""
        rs: list[float] = []
        steals: list[float | None] = []
        bws: list[float] = []

        def one_run():
            pre_bw = _bw_probe()
            b = _cpu_times()
            t0 = time.time()
            fn()
            rs.append(round(time.time() - t0, 3))
            steals.append(_steal_pct(b, _cpu_times()))
            # window bandwidth evidence = min(pre, post): neighbor memory
            # pressure active during the run is visible on at least one
            # side. Let the JVM settle briefly first — a probe taken
            # during executor teardown/GC measures self-noise, not host
            time.sleep(0.5)
            bws.append(min(pre_bw, _bw_probe()))

        def best_is_poisoned():
            # The recorded number is min(rs): what matters is whether THAT
            # run's window was clean. Per-run steal is authoritative; the
            # spread signature is the fallback when steal is elevated-but-
            # ambiguous or unreadable (a slow best run with near-zero steal
            # and fast siblings can't happen — min() already took the fast
            # one, so a big spread with a truly-clean best is the other
            # runs' problem, not the record's). Sub-second runs sample
            # steal over too small a /proc/stat window to be meaningful
            # (a single tick of steal reads as >6%), and a burst can only
            # INFLATE a recorded time — a fast run IS the evidence its
            # window was usable — so the steal check applies only to runs
            # long enough to both matter and measure (> 1s).
            best_i = rs.index(min(rs))
            s = steals[best_i]
            spread = (max(rs) / min(rs)) if min(rs) > 0 else 1.0
            spread_sig = min(rs) > SPREAD_MIN_SEC and spread > SPREAD_BAR
            # memory-bandwidth degradation is invisible to steal: check
            # the best run's window probes too (slow-run windows only —
            # a fast run is its own evidence the window was usable)
            bw_sig = min(rs) > 1.0 and bws[best_i] < BW_BAR_GBS
            if s is None or min(rs) <= 1.0:
                return spread_sig or bw_sig
            return s > STEAL_BAR or bw_sig or (spread_sig and s > STEAL_BAR / 2)

        for _ in range(n):
            one_run()
        extra = 0
        while best_is_poisoned() and extra < MAX_EXTRA_RUNS:
            extra += 1
            one_run()
        runs[name] = rs
        run_steals[name] = steals
        run_bw[name] = bws
        timings[name] = min(rs)
        query_clean[name] = not best_is_poisoned()

    # q1: full curation pipeline over the web corpus (the headline number).
    # Both runs are now steady-state thanks to the untimed warmup above;
    # the "_cold" key is kept for cross-round comparability (its gap to
    # the second run measures residual warmup, which should be ~none).
    cfg = webpages.CurationConfig(salt_partitions=int(args.cores) * 2)

    def run_curate():
        webpages.curate(web, models, cfg).agg(
            F.sum(F.col("keep").cast("long"))
        ).collect()

    timed("curate_full", run_curate)
    # legacy cross-round keys: "_cold" = first observed run
    timings["curate_full_cold"] = runs["curate_full"][0]
    runs["curate_full_cold"] = [runs["curate_full"][0]]
    # q2: 28-rule heuristic chain alone (reference benchmark shape) —
    # the number BASELINE.md gates against
    def run_heuristic():
        chain.english_chain(web, "text", mode="label").agg(
            F.sum(F.col("keep").cast("long"))
        ).collect()

    timed("heuristic_chain", run_heuristic)
    timings["heuristic_chain_run1"] = runs["heuristic_chain"][0]
    runs["heuristic_chain_run1"] = [runs["heuristic_chain"][0]]
    # q3: PII scrub alone
    timed(
        "pii_scrub",
        lambda: pii.scrub(web, "text")
        .agg(F.sum("scrub_email"), F.max(F.length("text_scrubbed")))
        .collect(),
    )
    # q4: exact dedup over the web corpus
    timed(
        "exact_dedup",
        lambda: dedup.exact_duplicate_ids(web, "text", "url").count(),
    )
    # q5: fuzzy dedup (minhash + LSH + jaccard verify + components)
    timed(
        "fuzzy_dedup",
        lambda: dedup.fuzzy_duplicate_ids(
            web.select(F.xxhash64("url").alias("doc_id"), "text"),
            num_perms=64,
            num_bands=16,
            jaccard_threshold=0.8,
        ).count(),
    )
    # q6: ANN cosine top-k over the embeddings table (the scale path;
    # exact brute-force is the sf0.01 correctness oracle, not a bench shape)
    timed(
        "ann_cosine_topk",
        lambda: similarity.ann_topk_hyperplane(
            emb, k=5, n_planes=6, num_tables=4, dim=64
        ).count(),
    )
    # q6b: IVF ANN (broadcast-centroid equi-join — the other scale path)
    timed(
        "ivf_topk",
        lambda: similarity.ivf_topk(emb, k=5, n_lists=16, n_probe=3).count(),
    )
    # q7: documents-table heuristic labels (driver-table comparable)
    timed(
        "documents_chain",
        lambda: chain.english_chain(docs, "text", mode="label")
        .agg(F.sum(F.col("keep").cast("long")))
        .collect(),
    )

    # total = sum of per-query bests (the value a quiet host would show)
    total = round(
        sum(v for k, v in timings.items()
            if k not in ("curate_full_cold", "heuristic_chain_run1")),
        3,
    )
    docs_per_sec = round(args.web_docs / timings["curate_full"], 1)
    heuristic_docs_per_sec = round(args.web_docs / timings["heuristic_chain"], 1)
    print(
        json.dumps(
            {
                "metric": "curation_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                # measurement-protocol marker: from round 4 on, "value"
                # and per-query numbers are best-of-3 (warm) and
                # curate_full_cold is the FIRST warm run, not a cold
                # JIT run — r03-and-earlier lines sum single runs, so
                # cross-round deltas must compare like with like.
                # elapsed_total is the raw wall time of every run.
                "protocol": "best-of-3-v2",
                "elapsed_total": round(sum(sum(v) for v in runs.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "docs_per_sec": docs_per_sec,
                "heuristic_docs_per_sec": heuristic_docs_per_sec,
                "cores": int(args.cores),
                "web_docs": args.web_docs,
                # host-contention marker over the timed window (see
                # _steal_pct); >~10 means burst-poisoned numbers
                "steal_pct": _steal_pct(cpu_before, _cpu_times()),
                # burst DEFENSE verdict (round 7): per-run steal samples
                # and whether each query's recorded best came from a
                # clean window (steal <= 6% and no >3x spread signature,
                # after up to 3 defensive re-runs). "clean" = every
                # query's record is trustworthy; false means the host
                # never gave a clean window despite re-runs — read the
                # per-query map before comparing rounds.
                "run_steals": run_steals,
                # min(pre, post) single-thread copy GB/s around each run
                # (memory-bandwidth contention is invisible to steal)
                "run_bw": run_bw,
                "bw_bar_gbs": BW_BAR_GBS,
                "query_clean": query_clean,
                "clean": all(query_clean.values()),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

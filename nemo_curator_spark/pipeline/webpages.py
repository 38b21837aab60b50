"""The flagship web-pages curation pipeline (the north rule end-to-end).

Input: the Common-Crawl-style table ``(url, warc_ts, html, text, lang)``.
Stages (each label-first — scores/flags become columns, rows are never
dropped until the caller asks, so lineage falls out of a groupBy):

1. **extract** — html → text (Arrow pandas UDF, byte-identical contract),
   map-side on the scan partitions so the raw html bytes never cross the
   network; html is dropped before any shuffle.
2. **langid** — native script/stopword struct<lang,score>; drop if score
   < 0.3 (reference FastTextLangId cutoff). Runs before the shuffle so
   the language can key it.
3. **salted repartition** by (lang_pred, text-hash salt) — the ONE wide
   op of the pipeline: defuses host-level skew before the Python-UDF
   scoring stages (the salt spreads a hot key over all partitions) and
   simultaneously buckets languages for the perplexity stage, which
   therefore adds no shuffle of its own.
4. **heuristic chain** — the 28-rule English cascade for predicted-English
   docs; non-English docs skip the English-specific rules (reference ships
   a separate non-English YAML; here: bypass).
5. **perplexity** — per-language n-gram LM, language-bucketed scoring;
   drop if ppl > per-language cutoff.
6. **quality** — lexical quality score + deterministic Pareto keep
   (CCNet-style sampling).
7. **PII scrub** — text_scrubbed + per-category counts.

``keep`` = all stages pass; ``drop_reason`` = first failing stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nemo_curator_spark.operators import extraction, pii, quality
from nemo_curator_spark.operators import langid as langid_mod
from nemo_curator_spark.operators import perplexity as ppl_mod
from nemo_curator_spark.pipeline import chain

LANGID_CUTOFF = 0.3
DEFAULT_PPL_CUTOFF = 1e6  # per-lang cutoffs usually trained; this is the floor
N_SOURCE_BUCKETS = 64


@dataclass
class CurationConfig:
    text_col: str = "text"
    use_html: bool = True                  # recompute text from html
    langid_cutoff: float = LANGID_CUTOFF
    ppl_cutoffs: dict[str, float] = field(default_factory=dict)
    pareto_alpha: float = 3.0
    apply_quality_sampling: bool = True
    n_source_buckets: int = N_SOURCE_BUCKETS
    salt_partitions: int | None = None     # None -> spark.sql.shuffle.partitions


def add_source_id(df: DataFrame, key_col: str = "url", n_buckets: int = N_SOURCE_BUCKETS) -> DataFrame:
    """Stable source partition id (resume key; reference task _source_id)."""
    return df.withColumn(
        "source_id", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )


def curate(
    df: DataFrame,
    models: dict[str, ppl_mod.NGramLM] | None = None,
    config: CurationConfig | None = None,
) -> DataFrame:
    """Label-first curation: returns every input row + label/score columns
    ``lang_pred, lang_score, keep, drop_reason, ppl, quality_score,
    text_scrubbed, scrub_* , source_id``."""
    cfg = config or CurationConfig()
    df = add_source_id(df, "url", cfg.n_source_buckets)

    # 1. extraction FIRST, map-side on the scan partitions (input splits
    # already spread hosts roughly evenly); html is dropped before any
    # shuffle — at 100 TB the raw bytes are most of the row width, and
    # shipping them through the salt exchange would be a full-corpus
    # network pass that buys only skew insurance
    if cfg.use_html and "html" in df.columns:
        df = df.withColumn(
            cfg.text_col,
            F.coalesce(extraction.extract_text(F.col("html")), F.col(cfg.text_col)),
        ).drop("html")

    # 2. language id (two-projection form: fractions materialize once) —
    # computed BEFORE the salt exchange since round 8, so that ONE
    # exchange can serve both roles below. langid is pure JVM regex over
    # balanced scan splits, so it needs no skew defusal of its own.
    df = langid_mod.add_langid(df, cfg.text_col, "lang_pred", "lang_score")
    lang_ok = F.col("lang_score") >= cfg.langid_cutoff

    # 3. ONE salted repartition keyed (lang_pred, text-hash salt). This
    # single exchange does the work the pipeline previously paid two full
    # corpus shuffles for (guide §2.4 "share one exchange"): it defuses
    # input skew ahead of the UDF-heavy scoring stages (the salt spreads
    # any hot key over every partition) AND groups languages so each
    # perplexity bucket touches ~one model — score_perplexity below runs
    # with bucket=False because the layout it would create already
    # exists. The round-7 plan shipped text + all 28 score columns
    # through a second hashpartitioning(lang_pred, salt) exchange right
    # before the perplexity UDF; per-row scores don't depend on
    # partitioning, so dropping it changes no value.
    n_parts = cfg.salt_partitions
    n_salt = max(n_parts or 0, 256)
    salt = F.pmod(F.xxhash64(F.col(cfg.text_col)), F.lit(n_salt))
    if n_parts:
        df = df.repartition(n_parts, F.col("lang_pred"), salt)
    else:
        df = df.repartition(F.col("lang_pred"), salt)

    # shared word/line batch struct: ONE python pass feeds the 14 word/line
    # chain rules and the lexical quality score. (Wiring langid's stop-hits
    # from it measured 5x SLOWER end-to-end than the HOF form — empirically
    # the struct reference inside langid's helper projection degrades the
    # whole stage; see CLAUDE.md perf lessons.)
    from nemo_curator_spark.functions import heuristics as H

    df = df.withColumn("_wl", H.word_line_batch(F.col(cfg.text_col)))

    # 4. heuristic chain: every rule's score is computed once; English docs
    # gate on the full cascade, non-English docs on the reference's
    # non-English variant (same order/cutoffs minus English-specific rules)
    df = chain.add_labels(
        df, cfg.text_col, keep_col="_heur_keep", reason_col="_heur_reason",
        wl_col="_wl",
    )
    non_en_names = chain.chain_rule_names(english=False)
    non_en_keep, non_en_reason = chain.labels_from_scores(non_en_names)
    is_en = F.col("lang_pred") == "en"
    heur_ok = F.when(is_en, F.col("_heur_keep")).otherwise(non_en_keep)
    df = df.withColumn(
        "_heur_reason",
        F.when(is_en, F.col("_heur_reason")).otherwise(non_en_reason),
    )

    # 5. perplexity — bucket=False: the (lang_pred, salt) exchange above
    # already built the language-bucketed layout, so scoring adds no
    # shuffle here (and the perplexity UDF fuses into the same
    # ArrowEvalPython pass as word_line_batch/ngram_scores — all three
    # depend only on pre-exchange columns)
    if models:
        df = ppl_mod.score_perplexity(
            df, models, cfg.text_col, "lang_pred", out_col="ppl",
            bucket=False,
        )
        cutoff = F.coalesce(
            *[
                F.when(F.col("lang_pred") == lg, F.lit(c))
                for lg, c in cfg.ppl_cutoffs.items()
            ],
            F.lit(DEFAULT_PPL_CUTOFF),
        ) if cfg.ppl_cutoffs else F.lit(DEFAULT_PPL_CUTOFF)
        ppl_ok = F.isnan("ppl") | (F.col("ppl") <= cutoff)
    else:
        df = df.withColumn("ppl", F.lit(None).cast("double"))
        ppl_ok = F.lit(True)

    # 6. quality score + deterministic Pareto sampling (from the shared batch)
    df = df.withColumn(
        "quality_score", quality.lexical_quality_from_batch(F.col("_wl"))
    )
    if cfg.apply_quality_sampling:
        qual_ok = quality.pareto_keep(
            F.col("quality_score"), F.col("url"), cfg.pareto_alpha
        )
    else:
        qual_ok = F.lit(True)

    # 7. PII scrub (always, so kept rows ship scrubbed text)
    df = pii.scrub(df, cfg.text_col, out_col="text_scrubbed")

    keep = lang_ok & heur_ok & ppl_ok & qual_ok
    reason = (
        F.when(~lang_ok, F.lit("langid"))
        .when(~heur_ok, F.concat(F.lit("heuristic:"), F.col("_heur_reason")))
        .when(~ppl_ok, F.lit("perplexity"))
        .when(~qual_ok, F.lit("quality_pareto"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        df.withColumn("keep", keep)
        .withColumn("drop_reason", reason)
        .drop("_heur_keep", "_heur_reason", "_wl")
    )


def lineage(labeled: DataFrame, run_id: str, stage: str = "curate") -> DataFrame:
    """Per-(partition, source_id) lineage rows (FIXTURES.md F7 schema):
    input/kept counts, drop-reason histogram (map), scrub-count totals.

    Two-level aggregation: the inner groupBy adds drop_reason so the map is
    built from pre-counted entries (no duplicate keys); both aggs are
    map-side-combinable.
    """
    scrub_cols = [c for c in labeled.columns if c.startswith("scrub_")]
    per_reason = (
        labeled.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id", "source_id", "drop_reason")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            *[F.sum(c).alias(c) for c in scrub_cols],
        )
    )
    return (
        per_reason.groupBy("partition_id", "source_id")
        .agg(
            F.sum("n").alias("input_count"),
            F.sum("n_kept").alias("kept_count"),
            F.map_from_entries(
                F.collect_list(
                    F.when(
                        F.col("drop_reason").isNotNull(),
                        F.struct(F.col("drop_reason"), F.col("n")),
                    )
                )
            ).alias("drop_reasons"),
            *[F.sum(c).alias(c) for c in scrub_cols],
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("stage", F.lit(stage))
        .withColumn("committed_at", F.current_timestamp())
    )


def stage_lineage(labeled: DataFrame, run_id: str) -> DataFrame:
    """Per-stage lineage rows: one row per (stage, partition, source_id)
    with that stage's input/kept counts — "each stage writes per-partition
    lineage rows" in label-first form. A document is input to a stage iff
    no earlier stage dropped it; kept iff this stage didn't drop it either.
    Stage order mirrors :func:`curate`: langid → heuristic → perplexity →
    quality_pareto.
    """
    stage_of = (
        F.when(F.col("drop_reason") == "langid", F.lit(0))
        .when(F.col("drop_reason").startswith("heuristic:"), F.lit(1))
        .when(F.col("drop_reason") == "perplexity", F.lit(2))
        .when(F.col("drop_reason") == "quality_pareto", F.lit(3))
        .otherwise(F.lit(99))  # kept by all stages
    )
    base = labeled.withColumn("partition_id", F.spark_partition_id()).withColumn(
        "_dropped_at", stage_of
    )
    stages = ["langid", "heuristic", "perplexity", "quality_pareto"]
    # ONE conditional-aggregation pass (map-side combinable) instead of a
    # filtered groupBy per stage — 4 scans of the labeled frame collapse
    # to 1 at 100 TB. The per-stage rows are then exploded from the
    # aggregated (partition, source) rows, which are tiny.
    aggs = []
    for i in range(len(stages)):
        aggs.append(
            F.sum((F.col("_dropped_at") >= i).cast("long")).alias(f"_in{i}")
        )
        aggs.append(
            F.sum((F.col("_dropped_at") > i).cast("long")).alias(f"_kept{i}")
        )
    agg = base.groupBy("partition_id", "source_id").agg(*aggs)
    per_stage = F.array(
        *[
            F.struct(
                F.col(f"_in{i}").alias("input_count"),
                F.col(f"_kept{i}").alias("kept_count"),
                F.lit(stage).alias("stage"),
            )
            for i, stage in enumerate(stages)
        ]
    )
    out = (
        agg.select("partition_id", "source_id", F.explode(per_stage).alias("_s"))
        .select(
            "partition_id",
            "source_id",
            "_s.input_count",
            "_s.kept_count",
            "_s.stage",
        )
        # a stage with zero inputs in this (partition, source) group never
        # produced a row in the per-stage-filter form — preserve that
        .where(F.col("input_count") > 0)
    )
    return out.withColumn("run_id", F.lit(run_id)).withColumn(
        "committed_at", F.current_timestamp()
    )


def drop_reason_histogram(labeled: DataFrame) -> DataFrame:
    return (
        labeled.groupBy("source_id", "drop_reason")
        .agg(F.count("*").alias("n_docs"))
    )


def scrub_totals(labeled: DataFrame) -> DataFrame:
    scrub_cols = [c for c in labeled.columns if c.startswith("scrub_")]
    return labeled.groupBy("source_id").agg(
        *[F.sum(c).alias(c) for c in scrub_cols]
    )

"""Structured-Streaming curation.

The reference's "streaming" executor is pipelined batch (SURVEY.md §1.2 —
no event-time semantics anywhere), so batch parity needs nothing here; this
module is the *additional* Spark-native capability: the same label-first
curation chain bound to ``readStream``, with event-time windowed lineage
(watermark on ``warc_ts``) and an idempotent ``foreachBatch`` sink option.

Every curation transform is stateless per-row (scores, labels, scrub), so
the batch DataFrame builders are reused verbatim — one code path for batch
and streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nemo_curator_spark import synth
from nemo_curator_spark.pipeline import webpages


def read_web_pages_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = (
        spark.readStream.format("parquet")
        .schema(synth.WEB_PAGES_SCHEMA)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(input_dir)


def curate_stream(
    stream_df: DataFrame,
    models=None,
    config: webpages.CurationConfig | None = None,
) -> DataFrame:
    """Label-first curation over a streaming DataFrame.

    Perplexity's language-bucketed ``repartition`` and the salted
    repartition are batch-plan concepts; in streaming the chain runs on the
    micro-batch's native partitioning (set via maxFilesPerTrigger).
    """
    cfg = config or webpages.CurationConfig()
    cfg.salt_partitions = None
    df = webpages.add_source_id(stream_df, "url", cfg.n_source_buckets)
    # reuse the batch builders minus the repartition (unsupported pre-agg in
    # some streaming plans and unnecessary per micro-batch)
    from nemo_curator_spark.operators import extraction, pii, quality
    from nemo_curator_spark.operators import langid as langid_mod
    from nemo_curator_spark.pipeline import chain

    if cfg.use_html and "html" in df.columns:
        df = df.withColumn(
            cfg.text_col,
            F.coalesce(extraction.extract_text(F.col("html")), F.col(cfg.text_col)),
        ).drop("html")  # raw bytes are dead weight for every stage below
    df = langid_mod.add_langid(df, cfg.text_col, "lang_pred", "lang_score")
    lang_ok = F.col("lang_score") >= cfg.langid_cutoff
    # ONE shared word/line batch pass feeds the chain's 14 word/line rules
    # AND the lexical quality score (same sharing as batch curate; the
    # Column-form quality scorer this replaces ran three interpreted HOF
    # passes per row — values pinned equal by tests)
    from nemo_curator_spark.functions import heuristics as H

    df = df.withColumn("_wl", H.word_line_batch(F.col(cfg.text_col)))
    df = chain.add_labels(
        df, cfg.text_col, keep_col="_heur_keep", reason_col="_heur_reason",
        wl_col="_wl",
    )
    non_en_keep, non_en_reason = chain.labels_from_scores(
        chain.chain_rule_names(english=False)
    )
    is_en = F.col("lang_pred") == "en"
    heur_ok = F.when(is_en, F.col("_heur_keep")).otherwise(non_en_keep)
    df = df.withColumn(
        "_heur_reason",
        F.when(is_en, F.col("_heur_reason")).otherwise(non_en_reason),
    )
    df = df.withColumn(
        "quality_score", quality.lexical_quality_from_batch(F.col("_wl"))
    )
    qual_ok = (
        quality.pareto_keep(F.col("quality_score"), F.col("url"), cfg.pareto_alpha)
        if cfg.apply_quality_sampling
        else F.lit(True)
    )
    df = pii.scrub(df, cfg.text_col, out_col="text_scrubbed")
    keep = lang_ok & heur_ok & qual_ok
    reason = (
        F.when(~lang_ok, F.lit("langid"))
        .when(~heur_ok, F.concat(F.lit("heuristic:"), F.col("_heur_reason")))
        .when(~qual_ok, F.lit("quality_pareto"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        df.withColumn("keep", keep)
        .withColumn("drop_reason", reason)
        .drop("_heur_keep", "_heur_reason", "_wl")
    )


def windowed_lineage(
    labeled_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time lineage: keep/drop counts per warc_ts window (late rows
    beyond the watermark are dropped — the streaming analogue of the batch
    lineage table)."""
    return (
        labeled_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang_pred")
        .agg(
            F.count("*").alias("input_count"),
            F.sum(F.col("keep").cast("long")).alias("kept_count"),
            F.sum("scrub_email").alias("scrub_email"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang_pred",
            "input_count",
            "kept_count",
            "scrub_email",
        )
    )


def write_stream_to_parquet(
    labeled_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Exactly-once parquet sink: checkpointed query + per-batch idempotent
    write via foreachBatch."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    writer = (
        labeled_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

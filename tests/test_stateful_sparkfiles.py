"""Stateful streaming operator (applyInPandasWithState) + SparkFiles model
shipping for the perplexity stage."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nemo_curator_spark import synth
from nemo_curator_spark.operators import perplexity as ppl_mod
from nemo_curator_spark.streaming import stateful, stream as streaming


def test_host_running_stats_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    pdf = synth.generate_web_pages(120, seed=41)
    sdf = spark.createDataFrame(pdf, schema=synth.WEB_PAGES_SCHEMA)
    sdf.coalesce(4).write.parquet(src)  # 4 files -> 4 micro-batches

    st = streaming.read_web_pages_stream(spark, src, max_files_per_trigger=1)
    labeled = streaming.curate_stream(st)
    stats = stateful.host_running_stats(labeled)
    q = (
        stats.writeStream.outputMode("update")
        .format("memory")
        .queryName("host_stats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        # update mode emits one row per host per batch; the LAST emission
        # per host carries the cumulative state
        "SELECT host, max(n_docs) AS n_docs, max(n_kept) AS n_kept "
        "FROM host_stats GROUP BY host"
    ).toPandas()
    assert got["n_docs"].sum() == 120
    assert (got["n_kept"] <= got["n_docs"]).all()
    # host skew visible: top host saw many docs
    assert got["n_docs"].max() > 10


def test_sparkfiles_model_shipping_matches_closure_path(spark):
    pdf = synth.generate_web_pages(150, seed=43)[["url", "text", "lang"]]
    df = spark.createDataFrame(pdf)
    models = ppl_mod.train_per_language(df, max_docs_per_lang=100)
    name = ppl_mod.ship_models(spark, models, name="ppl_test_models.json")

    via_closure = (
        ppl_mod.score_perplexity(df, models, bucket=False)
        .select("url", "ppl")
        .toPandas()
        .set_index("url")
    )
    via_files = (
        ppl_mod.score_perplexity(
            df, None, bucket=False, sparkfiles_artifact=name
        )
        .select("url", "ppl")
        .toPandas()
        .set_index("url")
    )
    for url in via_closure.index:
        a, b = via_closure.loc[url, "ppl"], via_files.loc[url, "ppl"]
        assert (math.isnan(a) and math.isnan(b)) or a == b, url

"""Plan-shape pins: the properties that make the engine scale to 100 TB,
asserted on the optimized physical plans (not just observed in benchmarks).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from nemo_curator_spark.pipeline import chain, webpages


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchange_inputs(plan: str) -> list[str]:
    """Input-column lists of every Exchange node in a formatted plan."""
    # formatted plan: "(7) Exchange\nInput [5]: [url#1, ...]\nArguments: ..."
    out = []
    for m in re.finditer(r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan):
        out.append(m.group(1))
    return out


def test_html_never_crosses_an_exchange(spark):
    """Extraction runs map-side before the salted shuffle; the raw html
    binary column (most of the row width at 100 TB) must not appear in the
    input of ANY Exchange node."""
    web = spark.createDataFrame(
        [],
        "url string, warc_ts timestamp_ntz, html binary, text string, lang string",
    )
    labeled = webpages.curate(web, models=None)
    plan = _formatted_plan(labeled)
    exchanges = _exchange_inputs(plan)
    assert exchanges, "expected at least the salted repartition exchange"
    for cols in exchanges:
        assert "html" not in cols, f"html crosses an exchange: [{cols}]"


def test_chain_labels_are_exchange_free(spark):
    """The label-first heuristic chain is a pure map: zero exchanges."""
    docs = spark.createDataFrame([], "doc_id long, text string")
    labeled = chain.english_chain(docs, "text", mode="label")
    plan = _formatted_plan(labeled)
    assert "Exchange" not in plan


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "doc_id long, text string"
    ).write.parquet(p)
    df = spark.read.parquet(p).where(F.col("doc_id") < 10).select("doc_id")
    plan = _formatted_plan(df)
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan
    # column pruning: text not read
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m and "text" not in m.group(1)


def test_ann_has_no_cartesian_product(spark):
    from nemo_curator_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    plan = _formatted_plan(
        similarity.ann_topk_hyperplane(emb, k=2, num_tables=2)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_training_sample_plans_have_no_window_sort(spark):
    """Model-training samples are bounded hash FILTERS (pmod of xxhash64),
    never row_number windows: a per-key window sorts the entire corpus
    just to take a capped sample. Pin the sample-stage plan for the
    perplexity trainer's sample expression."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "text %d" % i, "en" if i % 2 else "de") for i in range(100)],
        "doc_id long, text string, lang string",
    )
    # replicate train_per_language's sample stage (the collect()ed plan)
    mods = {"en": 7, "de": 7}
    mod_expr = F.create_map(
        *[F.lit(x) for lg in sorted(mods) for x in (lg, mods[lg])]
    )
    sample = df.select("lang", "text").where(
        F.pmod(F.xxhash64(F.col("text"), F.lit(42)), mod_expr[F.col("lang")]) == 0
    )
    plan = _formatted_plan(sample)
    assert "Window" not in plan and "Sort" not in plan, plan
    # and the real trainer must produce the same models as a brute-force
    # local computation of the same filter+truncate rule
    from nemo_curator_spark.operators import perplexity as ppl

    models = ppl.train_per_language(df, max_docs_per_lang=5, seed=42)
    assert set(models) == {"en", "de"}
    for lm in models.values():
        assert lm.total > 0


def test_similarity_search_default_path_has_no_cross_join(spark):
    """similarity_search's DEFAULT route must never plan a cartesian
    product — the exact O(n^2) baseline is an explicit opt-in only."""
    from nemo_curator_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    for method in ("ann", "ivf"):
        plan = _formatted_plan(
            similarity.similarity_search(emb, k=2, method=method)
        )
        assert "CartesianProduct" not in plan, method
        assert "BroadcastNestedLoopJoin" not in plan, method


def test_scene_boundaries_single_exchange(spark):
    """All three scene kinds (mid/trailing/whole) are emitted in ONE pass
    over the windowed frame table — a union of branches would re-derive
    the window subtree and triple the exchanges at scale."""
    from pyspark.sql import functions as F

    from nemo_curator_spark.operators import video as V

    frames = (
        spark.range(50)
        .select(F.col("id").alias("video_id"))
        .withColumn("frame", F.explode(F.sequence(F.lit(0), F.lit(9))))
        .withColumn("is_transition", (F.col("frame") % 5 == 0).cast("int"))
    )
    plan = _formatted_plan(V.scene_boundaries(frames))
    # AQE may elide the exchange node entirely in the formatted pre-final
    # plan; the invariant is that there is AT MOST one, never the three
    # the union shape produced
    assert plan.count("Exchange") <= 1, plan
    assert plan.count("Union") == 0, plan


def test_fixed_stride_limit_clips_no_window(spark):
    """limit_clips is pushed into the clip-index generator (survivors are
    always a prefix of k, see fixed_stride_clips) — no row_number window,
    no exchange, and never more than limit rows generated per video."""
    from pyspark.sql import functions as F

    from nemo_curator_spark.operators import video as V

    videos = spark.range(20).select(
        F.col("id").alias("video_id"),
        (F.lit(100) + F.col("id") % 400).cast("int").alias("num_frames"),
        F.lit(24.0).alias("framerate"),
    )
    out = V.fixed_stride_clips(
        videos, clip_len_s=4.0, clip_stride_s=2.5, min_clip_length_s=1.0,
        limit_clips=3,
    )
    plan = _formatted_plan(out)
    assert "Window" not in plan, plan
    assert "Exchange" not in plan, plan
    counts = out.groupBy("video_id").count().collect()
    assert all(r["count"] <= 3 for r in counts)
    # parity with the unlimited form truncated per video
    full = V.fixed_stride_clips(
        videos, clip_len_s=4.0, clip_stride_s=2.5, min_clip_length_s=1.0
    ).toPandas()
    lim = out.toPandas()
    want = (
        full.sort_values(["video_id", "clip_idx"])
        .groupby("video_id")
        .head(3)
        .reset_index(drop=True)
    )
    got = lim.sort_values(["video_id", "clip_idx"]).reset_index(drop=True)
    assert got.equals(want)

"""End-to-end curation pipeline: labels, lineage, checkpoint-resume (F8)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nemo_curator_spark import synth
from nemo_curator_spark.operators import perplexity as ppl_mod
from nemo_curator_spark.pipeline import checkpoint, webpages


@pytest.fixture(scope="module")
def web_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wp") / "web_pages.parquet")
    synth.write_web_pages_parquet(path, 400, seed=21)
    return spark.read.parquet(path)


def _curate(spark, web_df):
    models = ppl_mod.train_per_language(web_df, max_docs_per_lang=150)
    cfg = webpages.CurationConfig(salt_partitions=8, apply_quality_sampling=False)
    return webpages.curate(web_df, models, cfg)


def test_curate_labels(spark, web_df):
    labeled = _curate(spark, web_df)
    out = labeled.select(
        "url", "lang", "lang_pred", "keep", "drop_reason", "ppl",
        "quality_score", "text_scrubbed", "source_id",
    ).toPandas()
    assert len(out) == 400  # label-first: no rows dropped
    # clean english rows mostly kept; dirty strata dropped with reasons
    assert out["keep"].sum() > 100
    assert (~out["keep"]).sum() > 30
    dropped = out[~out["keep"]]
    assert dropped["drop_reason"].notna().all()
    kept = out[out["keep"]]
    assert kept["drop_reason"].isna().all()
    # scrubbed text exists for every row and PII rows were scrubbed
    assert out["text_scrubbed"].notna().all()
    pii_rows = labeled.where(F.col("scrub_email") > 0).count()
    assert pii_rows > 0


def test_curate_deterministic(spark, web_df):
    a = _curate(spark, web_df).select("url", "keep", "drop_reason").toPandas()
    b = _curate(spark, web_df).select("url", "keep", "drop_reason").toPandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lineage_rows(spark, web_df):
    labeled = _curate(spark, web_df)
    lin = webpages.lineage(labeled, run_id="r1").toPandas()
    assert lin["input_count"].sum() == 400
    assert lin["kept_count"].sum() == labeled.where("keep").count()
    # histogram maps contain real reasons
    reasons = set()
    for m in lin["drop_reasons"]:
        reasons.update(dict(m).keys())
    assert any(r.startswith("heuristic:") for r in reasons)
    assert {"run_id", "stage", "partition_id", "source_id"} <= set(lin.columns)


def test_stage_lineage(spark, web_df):
    labeled = _curate(spark, web_df)
    lin = webpages.stage_lineage(labeled, run_id="s1").toPandas()
    per_stage = lin.groupby("stage")[["input_count", "kept_count"]].sum()
    # stage 0 (langid) sees every row
    assert per_stage.loc["langid", "input_count"] == 400
    # funnel: each stage's input == previous stage's kept
    order = ["langid", "heuristic", "perplexity", "quality_pareto"]
    for prev, cur in zip(order, order[1:]):
        assert (
            per_stage.loc[cur, "input_count"] == per_stage.loc[prev, "kept_count"]
        ), (prev, cur)
    # final kept == pipeline keep count
    assert per_stage.loc["quality_pareto", "kept_count"] == labeled.where(
        "keep"
    ).count()


def test_stage_lineage_single_pass(spark, web_df):
    """The single conditional-aggregation form emits exactly the rows the
    old 4×(filter+groupBy)+union form did, from ONE scan of the labeled
    frame (round-5 item: 4 scans where 1 suffices at 100 TB)."""
    labeled = _curate(spark, web_df)
    lin = webpages.stage_lineage(labeled, run_id="s1")

    # row parity vs the per-stage-filter semantics, recomputed in pandas
    pdf = labeled.select("source_id", "drop_reason").toPandas()
    stage_of = {"langid": 0, "perplexity": 2, "quality_pareto": 3}
    pdf["_d"] = [
        stage_of.get(r, 1 if str(r).startswith("heuristic:") else 99)
        for r in pdf.drop_reason
    ]
    got = (
        lin.toPandas()
        .groupby(["stage", "source_id"])[["input_count", "kept_count"]]
        .sum()
    )
    for i, stage in enumerate(
        ["langid", "heuristic", "perplexity", "quality_pareto"]
    ):
        sub = pdf[pdf._d >= i]
        want_in = sub.groupby("source_id").size()
        want_kept = sub[sub._d > i].groupby("source_id").size()
        for sid, n in want_in.items():
            assert got.loc[(stage, sid), "input_count"] == n
            assert got.loc[(stage, sid), "kept_count"] == want_kept.get(sid, 0)
        # zero-input groups must not appear (old-form parity)
        assert set(got.loc[stage].index) == set(want_in.index)

    # plan shape: the lineage aggregate reads its input ONCE
    plan = lin._jdf.queryExecution().optimizedPlan().toString()
    n_aggs = plan.count("Aggregate")
    assert n_aggs == 1, plan
    assert "Union" not in plan, plan


def test_checkpoint_resume_half_then_full(spark, web_df, tmp_path):
    """F8: commit half the source buckets, resume, final output == clean run."""
    labeled = _curate(spark, web_df)
    lin = webpages.lineage(labeled, run_id="fix")

    out = checkpoint.CheckpointedOutput(str(tmp_path / "out"))
    all_ids = sorted(
        r["source_id"] for r in labeled.select("source_id").distinct().collect()
    )
    half = all_ids[: len(all_ids) // 2]

    # run 1: only half the buckets (simulated partial run)
    part1 = labeled.where(F.col("source_id").isin(half))
    res1 = out.write_run(part1, lin, run_id="run1")
    assert sorted(res1["committed"]) == sorted(half)
    assert out.committed_source_ids() == set(half)

    # run 2: full input; resume must process ONLY the uncommitted buckets
    pending = out.resume_filter(labeled)
    pending_ids = {r["source_id"] for r in pending.select("source_id").distinct().collect()}
    assert pending_ids == set(all_ids) - set(half)
    res2 = out.write_run(labeled, lin, run_id="run2")
    assert sorted(res2["committed"]) == sorted(pending_ids)

    # resumed output == clean full run, byte-identical on label columns
    resumed = (
        out.read_data(spark)
        .select("url", "keep", "drop_reason", "text_scrubbed")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    clean = (
        labeled.select("url", "keep", "drop_reason", "text_scrubbed")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(resumed, clean)

    # idempotent re-run: nothing left to do
    res3 = out.write_run(labeled, lin, run_id="run3")
    assert res3["committed"] == []


def test_uncommitted_lineage_invisible(spark, web_df, tmp_path):
    """A run that wrote lineage but crashed before commit() must be
    invisible to read_lineage — same visibility contract as the data side
    (checkpoint.py read_lineage; the reference's LMDB actor only surfaces
    committed sources)."""
    import os

    from nemo_curator_spark.pipeline import webpages
    from nemo_curator_spark.pipeline.checkpoint import CheckpointedOutput

    out = CheckpointedOutput(str(tmp_path / "out"))
    labeled = webpages.curate(web_df.limit(50), models=None)
    lin = webpages.lineage(labeled, run_id="run_a")
    out.write_run(labeled, lin, run_id="run_a")

    # simulate a crashed second run: lineage written, NO snapshot commit
    crashed_dir = os.path.join(out.lineage_dir, "crashed_run")
    lin.write.mode("overwrite").parquet(crashed_dir)

    visible = out.read_lineage(spark)
    assert set(
        r["run_id"] for r in visible.select("run_id").distinct().collect()
    ) == {"run_a"}

"""Tests for the high-level dedup workflows (pipeline/dedup_workflows.py)
— reference stages/deduplication/{exact,fuzzy,semantic}/workflow.py."""

from __future__ import annotations

import json
import os

import pytest

from nemo_curator_spark.pipeline import dedup_workflows as W


def _write_corpus(spark, tmp_path, texts):
    p = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(t,) for t in texts], "text string"
    ).repartition(2).write.parquet(p)
    return p


def test_workflow_run_result_contract():
    r = W.WorkflowRunResult(workflow_name="x")
    r.add_pipeline_tasks("p", None)
    assert r.pipeline_tasks == {"p": []}
    r.extend_metadata({"a": 1})
    r.extend_metadata(None)
    r.add_metadata("b", 2)
    assert r.get_metadata("a") == 1 and r.get_metadata("b") == 2
    assert r.get_metadata("missing") is None


def test_exact_workflow(spark, tmp_path):
    corpus = _write_corpus(
        spark, tmp_path, ["dup", "dup", "dup", "unique one", "unique two"]
    )
    out = str(tmp_path / "out")
    wf = W.ExactDeduplicationWorkflow(output_path=out, input_path=corpus)
    res = wf.run(spark)
    assert res.workflow_name == "exact_deduplication"
    # 3 copies of "dup" -> 2 removal ids
    assert res.get_metadata("num_duplicates") == 2
    ids = spark.read.parquet(res.get_metadata("duplicate_ids_path"))
    assert ids.columns == ["_curator_dedup_id"]
    # id generator persisted under the reference filename
    gen_path = os.path.join(out, "exact_id_generator.json")
    assert res.get_metadata("id_generator_path") == gen_path
    reg = json.load(open(gen_path))
    assert reg["next_id"] == 5  # one id per input row
    # pre-assigned id mode
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "my_id long, text string"
    )
    wf2 = W.ExactDeduplicationWorkflow(
        output_path=str(tmp_path / "out2"), assign_id=False, id_field="my_id",
        input_path=corpus,
    )
    res2 = wf2.run(spark, input_df=df)  # input_df wins (with a warning)
    assert res2.get_metadata("num_duplicates") == 1
    dup = spark.read.parquet(res2.get_metadata("duplicate_ids_path"))
    assert dup.collect()[0].my_id == 2  # keep min id


def test_exact_workflow_contracts(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="Removal"):
        W.ExactDeduplicationWorkflow(output_path="x", perform_removal=True)
    with pytest.raises(ValueError, match="id_field"):
        W.ExactDeduplicationWorkflow(output_path="x", assign_id=False)
    wf = W.ExactDeduplicationWorkflow(output_path=str(tmp_path / "o"))
    with pytest.raises(ValueError, match="input_path"):
        wf.run(spark)


def test_fuzzy_workflow(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the river runs past the old stone mill every morning"
    )
    texts = [base, base + " x"] + [
        f"totally different document {i} with its own unrelated words "
        f"and content number {i * 7} padded to shingle width {i}"
        for i in range(4)
    ]
    corpus = _write_corpus(spark, tmp_path, texts)
    cache = str(tmp_path / "cache")
    out = str(tmp_path / "fuzzy_out")
    wf = W.FuzzyDeduplicationWorkflow(
        cache_path=cache, output_path=out, input_path=corpus,
        num_bands=8, minhashes_per_band=4,
    )
    res = wf.run(spark)
    assert res.workflow_name == "fuzzy_deduplication"
    # the near-identical pair collapses to one removal id
    assert res.get_metadata("num_duplicates") == 1
    # reference cache layout persisted
    assert os.path.isdir(os.path.join(cache, "MinHashStage"))
    assert os.path.isdir(os.path.join(cache, "BucketsToEdges"))
    assert os.path.exists(os.path.join(out, "fuzzy_id_generator.json"))
    sigs = spark.read.parquet(os.path.join(cache, "MinHashStage"))
    assert len(sigs.select("minhash").first().minhash) == wf.num_hashes
    for t in ("minhash_time", "lsh_time", "connected_components_time"):
        assert res.get_metadata(t) >= 0


def test_fuzzy_workflow_contracts():
    with pytest.raises(NotImplementedError, match="Removal"):
        W.FuzzyDeduplicationWorkflow(
            cache_path="c", output_path="o", perform_removal=True
        )
    with pytest.raises(ValueError, match="bands_per_iteration"):
        W.FuzzyDeduplicationWorkflow(
            cache_path="c", output_path="o", num_bands=4,
            bands_per_iteration=9,
        )
    with pytest.warns(UserWarning, match="char_ngrams"):
        W.FuzzyDeduplicationWorkflow(
            cache_path="c", output_path="o", char_ngrams=5
        )
    assert W.FuzzyDeduplicationWorkflow(
        cache_path="c", output_path="o"
    ).num_hashes == 260


def test_semantic_workflow(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8))
    rows = [(i, vecs[i].tolist()) for i in range(20)]
    rows.append((20, vecs[3].tolist()))  # planted exact duplicate of 3
    df = spark.createDataFrame(rows, "id long, embeddings array<double>")
    out = str(tmp_path / "sem_out")
    wf = W.SemanticDeduplicationWorkflow(
        input_path=None, output_path=out, n_clusters=3, eps=0.01,
    )
    res = wf.run(spark, input_df=df)
    assert res.workflow_name == "semantic_deduplication"
    assert os.path.isdir(os.path.join(out, "SemanticPairwise"))
    dup_ids = {
        r.id
        for r in spark.read.parquet(
            res.get_metadata("duplicate_ids_path")
        ).collect()
    }
    # exactly one of the planted pair removed
    assert len(dup_ids & {3, 20}) == 1 and res.get_metadata(
        "num_duplicates"
    ) >= 1
    # without eps: scores only, no identification
    wf2 = W.SemanticDeduplicationWorkflow(
        input_path=None, output_path=str(tmp_path / "sem2"), n_clusters=3,
    )
    res2 = wf2.run(spark, input_df=df)
    assert res2.get_metadata("duplicate_ids_path") is None
    with pytest.raises(NotImplementedError, match="l2"):
        W.SemanticDeduplicationWorkflow(
            input_path=None, output_path="o", n_clusters=2,
            distance_metric="l2",
        )


def test_text_semantic_workflow(spark, tmp_path):
    """TextSemanticDeduplicationWorkflow (reference
    text/deduplication/semantic.py:52-520): embeddings -> semantic dedup
    -> REAL removal, with resumable id assignment."""
    texts = [f"document number {i} with its own distinct words {i*3}"
             for i in range(12)]
    texts += [texts[0], texts[5]]  # two planted exact duplicates
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(t,) for t in texts], "text string"
    ).repartition(2).write.parquet(corpus)
    out = str(tmp_path / "out")
    wf = W.TextSemanticDeduplicationWorkflow(
        input_path=corpus,
        output_path=out,
        n_clusters=3,
        eps=0.001,
        use_id_generator=True,
    )
    res = wf.run(spark)
    assert res.workflow_name == "text_semantic_deduplication"
    assert res.get_metadata("num_duplicates") == 2
    kept = spark.read.parquet(res.get_metadata("deduplicated_path"))
    assert kept.count() == 12
    assert kept.select("text").distinct().count() == 12
    assert "_curator_dedup_id" in kept.columns
    assert os.path.exists(os.path.join(out, "semantic_id_generator.json"))
    assert os.path.isdir(os.path.join(out, "Embeddings"))
    # identify-only mode
    wf2 = W.TextSemanticDeduplicationWorkflow(
        input_path=corpus, output_path=str(tmp_path / "out2"),
        n_clusters=3, eps=0.001, perform_removal=False,
        use_id_generator=True,
    )
    res2 = wf2.run(spark)
    assert res2.get_metadata("deduplicated_path") is None
    assert res2.get_metadata("num_duplicates") == 2
    # contract: removal requires eps
    with pytest.raises(ValueError, match="eps"):
        W.TextSemanticDeduplicationWorkflow(
            input_path=corpus, output_path="o", n_clusters=2, eps=None,
        )

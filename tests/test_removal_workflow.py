"""Removal workflow — reference text/deduplication/removal_workflow.py:34-216."""

from __future__ import annotations

import json
import os

import pytest

from nemo_curator_spark.operators.id_generator import CURATOR_DEDUP_ID_STR
from nemo_curator_spark.pipeline.removal_workflow import TextDuplicatesRemovalWorkflow


@pytest.fixture()
def corpus(spark, tmp_path):
    inp = str(tmp_path / "input")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id bigint, text string"
    ).repartition(2).write.parquet(inp)
    rem = str(tmp_path / "remove")
    spark.createDataFrame(
        [(i,) for i in (2, 5, 7, 11, 19)], "id bigint"
    ).write.parquet(rem)
    return inp, rem, str(tmp_path / "out")


def test_validation():
    with pytest.raises(ValueError, match="Invalid input filetype"):
        TextDuplicatesRemovalWorkflow(
            input_path="x", ids_to_remove_path="y", output_path="z",
            input_filetype="csv",
        )
    with pytest.raises(ValueError, match="Cannot drop id_field"):
        TextDuplicatesRemovalWorkflow(
            input_path="x", ids_to_remove_path="y", output_path="z",
            id_field="doc_id", drop_id_field=True, output_fields=["doc_id"],
        )
    with pytest.raises(ValueError, match="order_field"):
        TextDuplicatesRemovalWorkflow(
            input_path="x", ids_to_remove_path="y", output_path="z",
            id_generator_path="gen.json",
        )


def test_removal_end_to_end(spark, corpus):
    inp, rem, out = corpus
    wf = TextDuplicatesRemovalWorkflow(
        input_path=inp, ids_to_remove_path=rem, output_path=out,
        id_field="doc_id",
    )
    result = wf.run(spark)
    assert result["rows_in"] == 20
    assert result["num_removed"] == 5
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == set(range(20)) - {2, 5, 7, 11, 19}


def test_removal_with_id_generator(spark, corpus, tmp_path):
    inp, _rem, out = corpus
    # removal list in the generated id space: drop generated ids 0 and 1
    rem2 = str(tmp_path / "rem2")
    spark.createDataFrame([(0,), (1,)], "id bigint").write.parquet(rem2)
    gen_path = str(tmp_path / "gen.json")
    wf = TextDuplicatesRemovalWorkflow(
        input_path=inp, ids_to_remove_path=rem2, output_path=out,
        id_generator_path=gen_path, order_field="doc_id",
    )
    result = wf.run(spark)
    assert result["num_removed"] == 2
    assert result["rows_out"] == 18
    # registry persisted with one batch per input file
    state = json.load(open(gen_path))
    assert state["next_id"] == 20
    assert len(state["batch_registry"]) >= 1
    out_df = spark.read.parquet(out)
    assert CURATOR_DEDUP_ID_STR in out_df.columns

    # resume: same registry -> same ids -> same removal outcome
    wf2 = TextDuplicatesRemovalWorkflow(
        input_path=inp, ids_to_remove_path=rem2,
        output_path=str(tmp_path / "out2"),
        id_generator_path=gen_path, order_field="doc_id",
    )
    r2 = wf2.run(spark)
    assert r2["num_removed"] == 2
    assert json.load(open(gen_path))["next_id"] == 20  # no ids burned on resume


def test_drop_id_and_fields(spark, corpus):
    inp, rem, out = corpus
    wf = TextDuplicatesRemovalWorkflow(
        input_path=inp, ids_to_remove_path=rem, output_path=out,
        id_field="doc_id", drop_id_field=True, output_fields=["text"],
    )
    wf.run(spark)
    out_df = spark.read.parquet(out)
    assert out_df.columns == ["text"]
    assert out_df.count() == 15


def test_jsonl_roundtrip(spark, tmp_path):
    inp = str(tmp_path / "in_jsonl")
    os.makedirs(inp)
    with open(os.path.join(inp, "part0.jsonl"), "w") as f:
        for i in range(6):
            f.write(json.dumps({"doc_id": i, "text": f"d{i}"}) + "\n")
    rem = str(tmp_path / "rem")
    spark.createDataFrame([(1,), (4,)], "id bigint").write.parquet(rem)
    out = str(tmp_path / "out_jsonl")
    wf = TextDuplicatesRemovalWorkflow(
        input_path=inp, ids_to_remove_path=rem, output_path=out,
        input_filetype="jsonl", output_filetype="jsonl", id_field="doc_id",
    )
    result = wf.run(spark)
    assert result["rows_out"] == 4
    kept = {r.doc_id for r in spark.read.json(out).collect()}
    assert kept == {0, 2, 3, 5}

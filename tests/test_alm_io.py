"""ALM pretrain IO — reference stages/audio/alm/pretrain/io.py
(manifest reader validation, shard writers, metrics record schema)."""

from __future__ import annotations

import json

import pytest

from nemo_curator_spark.operators import alm_finalize as FZ
from nemo_curator_spark.operators import alm_io as IO


def test_resolve_audio_path_modes():
    # utils.py:131-163
    assert (
        IO.resolve_audio_path("/stage", "/src/sub/a.wav", "basename")
        == "/stage/a.wav"
    )
    assert (
        IO.resolve_audio_path("/stage", "sub/a.wav", "relative")
        == "/stage/sub/a.wav"
    )
    assert IO.resolve_audio_path("/stage", "/abs/a.wav", "as_is") == "/abs/a.wav"
    with pytest.raises(ValueError, match="unknown audio_path_resolution"):
        IO.resolve_audio_path("/stage", "a.wav", "bogus")


def _write_manifest(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write((json.dumps(r) if isinstance(r, dict) else r) + "\n")


def test_read_long_form_manifest_validation(tmp_path):
    man = tmp_path / "in.jsonl"
    _write_manifest(
        man,
        [
            {"id": "a", "audio_filepath": "/x/a.wav", "segments": []},
            {"id": "", "audio_filepath": "/x/e.wav"},  # empty id skipped
            {"audio_filepath": "/x/n.wav"},  # missing id skipped
            {"id": "a", "audio_filepath": "/x/dup.wav"},  # dup id skipped
            {"id": "b"},  # missing audio path skipped
            "not json {",  # malformed skipped
            {"id": "c", "audio_filepath": "/y/c.wav"},
        ],
    )
    entries = IO.read_long_form_manifest(str(man), "/stage")
    assert [e["id"] for e in entries] == ["a", "c"]
    # basename re-anchoring
    assert entries[0]["audio_filepath"] == "/stage/a.wav"
    # duplicate basename across DIFFERENT ids fails fast in basename mode
    _write_manifest(
        man,
        [
            {"id": "a", "audio_filepath": "/x/same.wav"},
            {"id": "b", "audio_filepath": "/y/same.wav"},
        ],
    )
    with pytest.raises(ValueError, match="duplicate audio basename"):
        IO.read_long_form_manifest(str(man), "/stage")
    # ...but is fine in relative mode (subdirs preserved; note os.path.join
    # semantics — an ABSOLUTE manifest value wins, exactly as the reference)
    _write_manifest(
        man,
        [
            {"id": "a", "audio_filepath": "x/same.wav"},
            {"id": "b", "audio_filepath": "y/same.wav"},
        ],
    )
    entries = IO.read_long_form_manifest(
        str(man), "/stage", audio_path_resolution="relative"
    )
    assert [e["audio_filepath"] for e in entries] == [
        "/stage/x/same.wav",
        "/stage/y/same.wav",
    ]
    with pytest.raises(FileNotFoundError, match="Manifest not found"):
        IO.read_long_form_manifest(str(tmp_path / "nope.jsonl"), "/stage")


def test_metrics_record_schema():
    meta = {
        "original_seg_count": 7,
        "original_seg_duration": 70.5,
        "dropped_empty": 1,
        "dropped_overlap": 2,
        "dropped_repetition": 3,
    }
    entry = {"id": "x", "snippet_id": "x-0", "segments": [1, 2], "duration": 12.5}
    r = IO.metrics_record(entry, meta, is_stub=False)
    assert r["in_segments"] == 7 and r["in_duration_sec"] == 70.5
    assert r["dropped"] == {
        "empty": 1, "overlap": 2, "too_long": 0, "too_short": 0,
        "no_text": 0, "repetition": 3,
    }
    assert r["out_segments"] == 2 and r["out_duration_sec"] == 12.5
    stub = IO.metrics_record(entry, meta, is_stub=True)
    assert stub["out_segments"] == 0 and stub["out_duration_sec"] == 0.0


def test_writers_feed_finalize(tmp_path):
    man = str(tmp_path / "out.jsonl")
    met = str(tmp_path / "metrics.json")
    w = IO.SnippetManifestWriter(man, replica="r0")
    agg = IO.PretrainMetricsAggregator(met, replica="r0")
    meta = {"original_seg_count": 3, "original_seg_duration": 30.0,
            "filtered_repetition_texts": ["spam spam"]}
    snip1 = {"id": "f1", "snippet_id": "f1-0", "segments": [1], "duration": 10.0}
    snip2 = {"id": "f1", "snippet_id": "f1-1", "segments": [2, 3], "duration": 15.0}
    stub = {"id": "f2", "snippet_id": None}
    for e in (snip1, snip2):
        w.process_entry(e)
        agg.process_entry(e, meta)
    w.process_entry(stub)  # stubs pass through unwritten
    agg.process_entry(stub, {"original_seg_count": 4})

    # the finalize merger consumes exactly these shards
    kept = FZ.merge_manifest_shards(man)
    assert kept == 2
    summary = FZ.merge_metrics_shards(met)
    assert summary["num_input_audios"] == 2
    assert summary["num_output_snippets"] == 2
    assert summary["output_total_segments"] == 3
    assert summary["output_total_duration_sec"] == 25.0
    # filtered_texts only on the first record per id per replica
    assert summary["dropped_repetition_examples"] == ["spam spam"]


def test_write_manifest_shards_spark(spark, tmp_path):
    out = str(tmp_path / "spark_out.jsonl")
    rows = [
        (json.dumps({"id": "a", "snippet_id": "a-0", "duration": 1.0}),),
        (json.dumps({"id": "a", "snippet_id": None}),),  # stub unwritten
        (json.dumps({"id": "b", "snippet_id": "b-0", "duration": 2.0}),),
    ]
    df = spark.createDataFrame(rows, ["entry"]).repartition(2)
    stats = IO.write_manifest_shards(df, out).collect()
    assert sum(r["n_rows"] for r in stats) == 2
    assert len(FZ.glob_shards(out, "jsonl")) == 2
    assert FZ.merge_manifest_shards(out) == 2
    ids = sorted(json.loads(x)["snippet_id"] for x in open(out))
    assert ids == ["a-0", "b-0"]

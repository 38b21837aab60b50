"""End-to-end test for the ALM pretrain composite pipeline
(pipeline/alm_pipeline.py) — reference
stages/audio/alm/pretrain/pipeline.py:69-232 wiring: manifest read ->
plan -> extract -> shard write -> driver merge, plus dry-run semantics.
"""

from __future__ import annotations

import json
import os
import tarfile

import numpy as np
import pytest

from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav
from nemo_curator_spark.pipeline.alm_pipeline import run_audio_pretrain_pipeline


def _setup(tmp_path):
    sr = 1000
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    # a.wav: 40 s; b.wav: only 5 s (its snippet plan extends past EOF)
    (audio_dir / "a.wav").write_bytes(
        encode_wav(np.arange(40_000, dtype=np.int16), sr)
    )
    (audio_dir / "b.wav").write_bytes(
        encode_wav(np.arange(5_000, dtype=np.int16), sr)
    )
    manifest = tmp_path / "in.jsonl"
    rows = [
        {
            "id": "a",
            "audio_filepath": "ignored_dir/a.wav",
            "segments": [
                {"start": 0.0, "end": 4.0, "text": "one"},
                {"start": 5.0, "end": 9.0, "text": "two"},
                {"start": 20.0, "end": 27.0, "text": "three"},
            ],
        },
        {
            "id": "b",
            "audio_filepath": "b.wav",
            "segments": [
                {"start": 1.0, "end": 3.0, "text": "x"},
                {"start": 4.0, "end": 6.0, "text": "y"},
            ],
        },
    ]
    with open(manifest, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(manifest), str(audio_dir)


def _paths(tmp_path, tag):
    out = tmp_path / tag
    out.mkdir()
    return (
        str(out / "manifest.jsonl"),
        str(out / "audio.tar"),
        str(out / "metrics.json"),
    )


def test_alm_pipeline_end_to_end(spark, tmp_path):
    manifest, audio_dir = _setup(tmp_path)
    man_out, tar_out, met_out = _paths(tmp_path, "real")
    res = run_audio_pretrain_pipeline(
        spark,
        input_manifest=manifest,
        audio_dir=audio_dir,
        output_manifest_path=man_out,
        output_audio_tar_path=tar_out,
        metrics_path=met_out,
        max_duration_sec=10.0,
    )
    assert res["num_input_audios"] == 2
    # a: snippets (0,9) + (20,27); b: snippet (1,6)
    assert res["num_output_snippets"] == 3
    assert res["num_tar_members"] == 3

    entries = [
        json.loads(l) for l in open(man_out, encoding="utf-8") if l.strip()
    ]
    by_sid = {e["snippet_id"]: e for e in entries}
    assert set(by_sid) == {"a-0_000-9_000", "a-20_000-27_000", "b-1_000-6_000"}
    # measured durations: b's snippet is clamped at the 5 s file end
    assert by_sid["a-0_000-9_000"]["duration"] == 9.0
    assert by_sid["a-20_000-27_000"]["duration"] == 7.0
    assert by_sid["b-1_000-6_000"]["duration"] == 4.0
    # snippet-relative segments
    assert by_sid["a-0_000-9_000"]["segments"] == [
        {"start": 0.0, "end": 4.0, "text": "one"},
        {"start": 5.0, "end": 9.0, "text": "two"},
    ]
    # tar members named exactly as the manifest's audio_filepath values,
    # merged into lexicographic order
    with tarfile.open(tar_out) as t:
        names = t.getnames()
        assert names == sorted(names)
        assert set(names) == {e["audio_filepath"] for e in entries}
        blob = t.extractfile("a-20_000-27_000.wav").read()
    _, _, cut = decode_wav(blob)
    assert len(cut) == 7000 and cut[0] == 20_000
    # no leftover shard files
    assert not [p for p in os.listdir(os.path.dirname(man_out)) if "shard" in p]

    summary = json.load(open(met_out, encoding="utf-8"))
    assert summary["num_input_audios"] == 2
    assert summary["num_output_snippets"] == 3
    assert summary["input_total_segments"] == 5
    assert summary["output_total_duration_sec"] == 20.0
    assert res["metrics"]["num_output_snippets"] == 3


def test_alm_pipeline_dry_run(spark, tmp_path):
    manifest, audio_dir = _setup(tmp_path)
    man_out, tar_out, met_out = _paths(tmp_path, "dry")
    res = run_audio_pretrain_pipeline(
        spark,
        input_manifest=manifest,
        audio_dir=audio_dir,
        output_manifest_path=man_out,
        output_audio_tar_path=tar_out,
        metrics_path=met_out,
        max_duration_sec=10.0,
        dry_run=True,
    )
    assert res["num_output_snippets"] == 3
    assert res["num_tar_members"] == 0
    assert not os.path.exists(tar_out)
    entries = [
        json.loads(l) for l in open(man_out, encoding="utf-8") if l.strip()
    ]
    by_sid = {e["snippet_id"]: e for e in entries}
    # dry run: duration = end - start (no clamping at the real file end)
    assert by_sid["b-1_000-6_000"]["duration"] == 5.0
    summary = json.load(open(met_out, encoding="utf-8"))
    assert summary["output_total_duration_sec"] == 21.0


def test_alm_pipeline_guards(spark, tmp_path):
    manifest, audio_dir = _setup(tmp_path)
    man_out, tar_out, met_out = _paths(tmp_path, "guard")
    with pytest.raises(NotImplementedError, match="flac/ogg"):
        run_audio_pretrain_pipeline(
            spark,
            input_manifest=manifest,
            audio_dir=audio_dir,
            output_manifest_path=man_out,
            output_audio_tar_path=tar_out,
            metrics_path=met_out,
            max_duration_sec=10.0,
            output_format="flac",
        )
    # empty manifest: clean zero-output run
    empty = tmp_path / "empty.jsonl"
    empty.write_text("")
    res = run_audio_pretrain_pipeline(
        spark,
        input_manifest=str(empty),
        audio_dir=audio_dir,
        output_manifest_path=man_out,
        output_audio_tar_path=tar_out,
        metrics_path=met_out,
        max_duration_sec=10.0,
    )
    assert res == {"num_input_audios": 0, "num_output_snippets": 0}
    assert json.load(open(met_out))["num_output_snippets"] == 0

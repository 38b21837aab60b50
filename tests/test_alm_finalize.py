"""ALM pretrain prepare/finalize — reference
stages/audio/alm/pretrain/finalize.py (shard merge, tar merge,
manifest-tar reconcile, metrics patch)."""

from __future__ import annotations

import json
import tarfile

import numpy as np

from nemo_curator_spark.operators import alm_finalize as FZ
from nemo_curator_spark.operators.multimodal import encode_wav


def _wav(seconds=1.0, sr=8000):
    return encode_wav(
        (np.sin(np.arange(int(sr * seconds)) / 7.0) * 9000).astype(np.int16),
        sr,
    )


def test_shard_naming_and_prepare(tmp_path):
    man = str(tmp_path / "out.jsonl")
    assert FZ.shard_path(man, "r0", "jsonl") == man + ".shard-r0.jsonl"
    for r in ("a", "b"):
        open(FZ.shard_path(man, r, "jsonl"), "w").write("{}\n")
    assert len(FZ.glob_shards(man, "jsonl")) == 2
    n_man, n_met, n_tar = FZ.prepare_audio_pretrain_outputs(
        man, str(tmp_path / "m.json"), str(tmp_path / "t.tar")
    )
    assert (n_man, n_met, n_tar) == (2, 0, 0)
    assert FZ.glob_shards(man, "jsonl") == []


def test_merge_manifest_shards(tmp_path):
    man = str(tmp_path / "out.jsonl")
    open(FZ.shard_path(man, "0", "jsonl"), "w").write(
        '{"id": "a"}\n{"id": "b"}\n'
    )
    # truncated final line (worker killed mid-write) is skipped
    open(FZ.shard_path(man, "1", "jsonl"), "w").write(
        '{"id": "c"}\n{"id": "d", "x": \n'
    )
    kept = FZ.merge_manifest_shards(man)
    assert kept == 3
    lines = [json.loads(x) for x in open(man)]
    assert [r["id"] for r in lines] == ["a", "b", "c"]
    assert FZ.glob_shards(man, "jsonl") == []  # shards removed
    # no-shards guard: a re-run must NOT truncate the merged output
    assert FZ.merge_manifest_shards(man) == 0
    assert len(open(man).readlines()) == 3


def test_merge_metrics_shards(tmp_path):
    met = str(tmp_path / "metrics.json")
    rows0 = [
        {"id": "f1", "in_segments": 10, "in_duration_sec": 100.0,
         "dropped": {"empty": 2}, "out_segments": 3,
         "out_duration_sec": 25.0,
         "filtered_texts": ["bad one"]},
        {"id": "f1", "out_segments": 2, "out_duration_sec": 35.0},
    ]
    rows1 = [
        # stub: counts input side only (is_stub record adds no output)
        {"id": "f2", "in_segments": 4, "in_duration_sec": 40.0,
         "is_stub": True},
        {"id": "", "ignored": True},  # empty id skipped
    ]
    open(FZ.shard_path(met, "0", "jsonl"), "w").write(
        "".join(json.dumps(r) + "\n" for r in rows0)
    )
    open(FZ.shard_path(met, "1", "jsonl"), "w").write(
        "".join(json.dumps(r) + "\n" for r in rows1)
    )
    summary = FZ.merge_metrics_shards(met)
    assert summary["num_input_audios"] == 2
    assert summary["num_output_snippets"] == 2  # f1's two non-stub records
    assert summary["input_total_segments"] == 14
    assert summary["output_total_segments"] == 5
    assert summary["output_total_duration_sec"] == 60.0
    assert summary["dropped"] == {"empty": 2}
    assert summary["dropped_repetition_examples"] == ["bad one"]
    assert summary["snippet_duration_histogram_30s"] == {"0-30": 1, "30-60": 1}
    on_disk = json.load(open(met))
    assert on_disk == summary


def test_merge_tar_shards_sorted_and_truncated(tmp_path):
    tar = str(tmp_path / "audio.tar")
    FZ.write_tar_shard(
        FZ.shard_path(tar, "0", "tar"), [("b.wav", b"BB"), ("d.wav", b"DD")]
    )
    FZ.write_tar_shard(
        FZ.shard_path(tar, "1", "tar"), [("a.wav", b"AA"), ("c.wav", b"CC")]
    )
    # an unreadable shard contributes nothing but doesn't break the merge
    open(FZ.shard_path(tar, "2", "tar"), "wb").write(b"not a tar")
    written = FZ.merge_tar_shards(tar)
    assert written == 4
    with tarfile.open(tar) as tf:
        names = [m.name for m in tf.getmembers()]
        assert names == ["a.wav", "b.wav", "c.wav", "d.wav"]  # lexicographic
        assert tf.extractfile("c.wav").read() == b"CC"
    assert FZ.glob_shards(tar, "tar") == []


def test_reconcile_and_patch(tmp_path):
    man = str(tmp_path / "out.jsonl")
    met = str(tmp_path / "metrics.json")
    tar = str(tmp_path / "audio.tar")
    good = _wav(25.0)
    FZ.write_tar_shard(
        FZ.shard_path(tar, "0", "tar"),
        [("s1.wav", good), ("s2.wav", b"garbage-not-wav")],
    )
    FZ.merge_tar_shards(tar)
    rows = [
        {"id": "f1", "audio_filepath": "s1.wav", "duration": 25.0,
         "segments": [1, 2]},
        {"id": "f1", "audio_filepath": "s2.wav", "duration": 30.0,
         "segments": [3]},  # corrupt payload -> dropped
        {"id": "f2", "audio_filepath": "missing.wav", "duration": 5.0,
         "segments": [4]},  # not in tar -> dropped
    ]
    with open(man, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    json.dump(
        {
            "num_output_snippets": 3,
            "output_total_segments": 4,
            "output_total_duration_sec": 60.0,
            "dropped": {"empty": 1},
            "per_original": [
                {"id": "f1", "out_snippets": 2, "out_segments": 3,
                 "out_duration_sec": 55.0},
                {"id": "f2", "out_snippets": 1, "out_segments": 1,
                 "out_duration_sec": 5.0},
            ],
        },
        open(met, "w"),
    )
    missing, unreadable = FZ.reconcile_manifest_with_tar(man, tar)
    assert (missing, unreadable) == (1, 1)
    kept = [json.loads(x) for x in open(man)]
    assert [r["audio_filepath"] for r in kept] == ["s1.wav"]

    FZ.patch_metrics_post_reconcile(met, man, missing, unreadable)
    patched = json.load(open(met))
    assert patched["dropped"] == {
        "empty": 1, "missing_audio": 1, "corrupted_audio": 1
    }
    assert patched["num_output_snippets"] == 1
    assert patched["output_total_segments"] == 2
    assert patched["output_total_duration_sec"] == 25.0
    per = {e["id"]: e for e in patched["per_original"]}
    assert per["f1"]["out_snippets"] == 1
    assert per["f2"]["out_snippets"] == 0


def test_finalize_end_to_end(tmp_path):
    man = str(tmp_path / "final.jsonl")
    met = str(tmp_path / "final_metrics.json")
    tar = str(tmp_path / "final.tar")
    FZ.write_tar_shard(FZ.shard_path(tar, "w0", "tar"), [("a.wav", _wav(10))])
    open(FZ.shard_path(man, "w0", "jsonl"), "w").write(
        json.dumps(
            {"id": "x", "audio_filepath": "a.wav", "duration": 10.0,
             "segments": [1]}
        )
        + "\n"
        + json.dumps(
            {"id": "x", "audio_filepath": "gone.wav", "duration": 3.0,
             "segments": [2]}
        )
        + "\n"
    )
    open(FZ.shard_path(met, "w0", "jsonl"), "w").write(
        json.dumps(
            {"id": "x", "in_segments": 5, "in_duration_sec": 50.0,
             "out_segments": 2, "out_duration_sec": 13.0}
        )
        + "\n"
    )
    missing, unreadable = FZ.finalize_audio_pretrain_outputs(man, met, tar)
    assert (missing, unreadable) == (1, 0)
    assert len(open(man).readlines()) == 1
    summary = json.load(open(met))
    assert summary["dropped"]["missing_audio"] == 1
    assert summary["num_output_snippets"] == 1
    with tarfile.open(tar) as tf:
        assert [m.name for m in tf.getmembers()] == ["a.wav"]
    # idempotent: no shards left -> second finalize is a no-op
    assert FZ.finalize_audio_pretrain_outputs(man, met, tar) == (0, 0)
    assert len(open(man).readlines()) == 1


def test_merge_tar_shards_truncated_payload(tmp_path):
    # a shard whose final member has an intact header but a short
    # payload must contribute its good members and skip the bad one
    tar = str(tmp_path / "t.tar")
    FZ.write_tar_shard(FZ.shard_path(tar, "0", "tar"), [("good.wav", b"GG")])
    shard1 = FZ.shard_path(tar, "1", "tar")
    FZ.write_tar_shard(shard1, [("ok.wav", b"OK"), ("cut.wav", b"X" * 600)])
    # truncate mid-payload of the LAST member (header intact)
    data = open(shard1, "rb").read()
    open(shard1, "wb").write(data[: 512 * 3 + 100])  # hdr+ok+hdr+partial
    written = FZ.merge_tar_shards(tar)
    import tarfile as _tf

    with _tf.open(tar) as tf:
        names = [m.name for m in tf.getmembers()]
    assert "good.wav" in names and "ok.wav" in names
    assert "cut.wav" not in names
    assert written == 2

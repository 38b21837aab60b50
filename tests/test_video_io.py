"""Video IO deterministic halves — reference stages/video/io/
clip_writer.py (layout/naming/idempotence/stats) and video_reader.py
(partitioning + byte loading + metadata contract)."""

from __future__ import annotations

import json
import pickle
import uuid as uuid_mod

import pandas as pd
import pytest

from nemo_curator_spark.io import video_io as V


def _clip(uid, src, span, buffer=b"mp4!", windows=None, embedding=None, **kw):
    return {
        "uuid": uid,
        "source_video": src,
        "span": span,
        "buffer": buffer,
        "windows": windows or [],
        "embedding": embedding,
        **kw,
    }


def test_path_layout_parity():
    # clip_writer.py:73-109 — exact subtree names
    assert V.path_clips("/o/") == "/o/clips"
    assert V.path_clips("/o", filtered=True) == "/o/filtered_clips"
    assert V.path_previews("/o") == "/o/previews"
    assert V.path_metas("/o", "v0") == "/o/metas/v0"
    assert V.path_ce1_embd("/o") == "/o/ce1_embd"
    assert V.path_ce1_embd_parquet("/o") == "/o/ce1_embd_parquet"
    assert V.path_processed_videos("/o") == "/o/processed_videos"
    assert V.path_processed_clip_chunks("/o") == "/o/processed_clip_chunks"


def test_uuid_naming_parity():
    # clip_extraction_stages.py:491-496 / clip_writer.py:207
    assert V.clip_uuid("a.mp4", 0, 48) == str(
        uuid_mod.uuid5(uuid_mod.NAMESPACE_URL, "a.mp4_0_48")
    )
    assert V.chunk_parquet_uuid("/in/a.mp4", 2) == str(
        uuid_mod.uuid5(uuid_mod.NAMESPACE_URL, "/in/a.mp4_2")
    )


def test_json_byte_format():
    # writer_utils.py:131-165: indent=4, UUIDs stringified
    u = uuid_mod.uuid5(uuid_mod.NAMESPACE_URL, "x")
    data = {"span_uuid": u, "valid": True}
    assert V.json_bytes(data) == json.dumps(
        {"span_uuid": str(u), "valid": True}, indent=4
    ).encode("utf-8")


def test_write_idempotence_skips_existing(tmp_path):
    dest = tmp_path / "sub" / "x.bin"
    assert V.write_bytes_idempotent(b"first", dest) is True
    # reference write_bytes: existing destination is SKIPPED, not replaced
    assert V.write_bytes_idempotent(b"second", dest) is False
    assert dest.read_bytes() == b"first"
    assert not list(tmp_path.glob("**/*.tmp"))


def test_process_video_full_layout(tmp_path):
    out = str(tmp_path / "out")
    w = V.ClipWriter(
        output_path=out,
        input_path="/in",
        caption_models=["qwen"],
        enhanced_caption_models=["qwen_lm"],
    )
    u1 = V.clip_uuid("/in/v/a.mp4", 0, 48)
    u2 = V.clip_uuid("/in/v/a.mp4", 48, 96)
    clips = [
        _clip(
            u1,
            "/in/v/a.mp4",
            (0.0, 2.0),
            windows=[
                {
                    "start_frame": 0,
                    "end_frame": 48,
                    "webp": b"webp!",
                    "caption": {"qwen": "a cat"},
                    "enhanced_caption": {"qwen_lm": "a fluffy cat"},
                }
            ],
            embedding=[0.1, 0.2],
            motion_score_global_mean=0.5,
            motion_score_per_patch_min_256=0.25,
            aesthetic_score=0.9,
        ),
        _clip(u2, "/in/v/a.mp4", (2.0, 5.0)),
    ]
    fclip = _clip(
        V.clip_uuid("/in/v/a.mp4", 96, 120), "/in/v/a.mp4", (4.0, 5.0)
    )
    video = {
        "input_path": "/in/v/a.mp4",
        "clip_chunk_index": 0,
        "metadata": {"width": 640, "height": 480, "framerate": 24.0},
        "clips": clips,
        "filtered_clips": [fclip],
        "num_total_clips": 3,
        "num_clip_chunks": 1,
    }
    chunk = w.process_video(video)

    # clip artifacts at the exact content-addressed paths
    assert (tmp_path / "out" / "clips" / f"{u1}.mp4").read_bytes() == b"mp4!"
    assert (
        tmp_path / "out" / "filtered_clips" / f"{fclip['uuid']}.mp4"
    ).exists()
    assert (
        tmp_path / "out" / "previews" / u1 / "0_48.webp"
    ).read_bytes() == b"webp!"
    emb = pickle.loads(
        (tmp_path / "out" / "ce1_embd" / f"{u1}.pickle").read_bytes()
    )
    assert emb == [0.1, 0.2]

    # metas/v0 JSON: exact reference layout
    meta = json.loads(
        (tmp_path / "out" / "metas" / "v0" / f"{u1}.json").read_text()
    )
    assert meta["span_uuid"] == u1
    assert meta["duration_span"] == [0.0, 2.0]
    assert meta["width_source"] == 640
    assert meta["clip_location"].endswith(f"/out/clips/{u1}.mp4")
    assert meta["motion_score"] == {
        "global_mean": 0.5,
        "per_patch_min_256": 0.25,
    }
    assert meta["aesthetic_score"] == 0.9
    assert meta["windows"] == [
        {
            "start_frame": 0,
            "end_frame": 48,
            "qwen_caption": "a cat",
            "qwen_lm_enhanced_caption": "a fluffy cat",
        }
    ]
    assert meta["valid"] is True
    meta2 = json.loads(
        (tmp_path / "out" / "metas" / "v0" / f"{u2}.json").read_text()
    )
    assert meta2["valid"] is False  # buffer but no windows

    # video-level + chunk metadata under the input-relative paths
    vmeta = json.loads(
        (tmp_path / "out" / "processed_videos" / "v" / "a.mp4.json").read_text()
    )
    assert vmeta["video"] == "/in/v/a.mp4" and vmeta["num_total_clips"] == 3
    cj = json.loads(
        (
            tmp_path / "out" / "processed_clip_chunks" / "v" / "a.mp4_0.json"
        ).read_text()
    )
    assert cj == chunk

    # stats accounting (clip_writer.py:282-371): passed counts only
    # non-filtered, transcoded counts every buffered clip incl. filtered
    assert chunk["num_clips_passed"] == 2
    assert chunk["num_clips_transcoded"] == 3
    assert chunk["num_clips_with_embeddings"] == 1
    assert chunk["num_clips_with_caption"] == 1
    assert chunk["num_clips_with_webp"] == 1
    # durations accumulate over clips AND filtered clips
    assert chunk["total_clip_duration"] == pytest.approx(2.0 + 3.0 + 1.0)
    assert chunk["max_clip_duration"] == pytest.approx(3.0)
    assert chunk["all_windows"][u1] == {"0_48": "a cat"}
    assert chunk["all_windows_enhanced_caption"][u1] == {
        "0_48": "a fluffy cat"
    }

    # embedding parquet named by uuid5(video_chunk)
    pq = (
        tmp_path
        / "out"
        / "ce1_embd_parquet"
        / f"{V.chunk_parquet_uuid('/in/v/a.mp4', 0)}.parquet"
    )
    pdf = pd.read_parquet(pq)
    assert pdf["id"].tolist() == [u1]

    # idempotence: a full re-run writes nothing new and changes nothing
    before = sorted(
        (str(p), p.stat().st_mtime_ns)
        for p in (tmp_path / "out").rglob("*")
        if p.is_file()
    )
    chunk2 = w.process_video(video)
    after = sorted(
        (str(p), p.stat().st_mtime_ns)
        for p in (tmp_path / "out").rglob("*")
        if p.is_file()
    )
    assert before == after and chunk2 == chunk


def test_input_path_guard(tmp_path):
    w = V.ClipWriter(output_path=str(tmp_path), input_path="/in")
    with pytest.raises(ValueError, match="does not start with"):
        w.video_metadata_uri("/elsewhere/a.mp4")


def test_write_clips_spark(spark, tmp_path):
    out = str(tmp_path / "sout")
    rows = []
    for v in ("va.mp4", "vb.mp4"):
        for k in range(2):
            uid = V.clip_uuid(f"/in/{v}", k * 48, (k + 1) * 48)
            clip = {
                "uuid": uid,
                "source_video": f"/in/{v}",
                "span": (float(k), float(k + 1)),
                "windows": [
                    {
                        "start_frame": k * 48,
                        "end_frame": (k + 1) * 48,
                        "caption": {"qwen": f"cap {v} {k}"},
                    }
                ],
                "filtered": False,
            }
            rows.append(
                (
                    f"/in/{v}",
                    0,
                    json.dumps(clip),
                    bytearray(f"bytes-{v}-{k}", "ascii"),
                    json.dumps({"width": 320, "height": 240}),
                )
            )
    df = spark.createDataFrame(
        rows,
        "video_path string, clip_chunk_index int, clip string, "
        "buffer binary, video_metadata string",
    )
    writer = V.ClipWriter(output_path=out, input_path="/in")
    stats = (
        V.write_clips(df, writer).orderBy("video").toPandas()
    )
    assert stats["num_clips_passed"].tolist() == [2, 2]
    assert stats["num_clips_transcoded"].tolist() == [2, 2]
    assert stats["num_clips_with_caption"].tolist() == [2, 2]
    for v in ("va.mp4", "vb.mp4"):
        uid = V.clip_uuid(f"/in/{v}", 0, 48)
        assert (
            tmp_path / "sout" / "clips" / f"{uid}.mp4"
        ).read_bytes() == f"bytes-{v}-0".encode()
        assert (
            tmp_path / "sout" / "processed_clip_chunks" / f"{v}_0.json"
        ).exists()


def test_plan_and_read_video_files(spark, tmp_path):
    vids = tmp_path / "vids"
    (vids / "sub").mkdir(parents=True)
    (vids / "a.mp4").write_bytes(b"AAAA")
    (vids / "sub" / "b.webm").write_bytes(b"BBBBBB")
    (vids / "notes.txt").write_bytes(b"skip me")

    plan = V.plan_video_files(spark, str(vids))
    paths = sorted(r["video_path"] for r in plan.collect())
    assert paths == [str(vids / "a.mp4"), str(vids / "sub" / "b.webm")]
    assert V.plan_video_files(spark, str(vids), limit=1).count() == 1

    def fake_meta(data: bytes) -> dict:
        if data == b"BBBBBB":
            raise ValueError("bad header")
        return {"width": len(data), "height": 2, "framerate": 24.0}

    got = (
        V.read_video_bytes(plan, extract_metadata=fake_meta)
        .orderBy("video_path")
        .collect()
    )
    assert bytes(got[0]["source_bytes"]) == b"AAAA"
    assert got[0]["size"] == 4
    assert json.loads(got[0]["metadata"])["width"] == 4
    assert got[0]["error"] is None
    # extractor failure is carried per-row, not task-fatal
    assert got[1]["metadata"] is None
    assert "bad header" in got[1]["error"]

    with pytest.raises(FileNotFoundError, match="does not exist"):
        V.plan_video_files(spark, str(tmp_path / "nope"))
    empty = tmp_path / "empty"
    empty.mkdir()
    (empty / "notes.txt").write_bytes(b"no videos here")
    with pytest.raises(FileNotFoundError, match="No video files"):
        V.plan_video_files(spark, str(empty))


def test_plan_single_file_and_bad_extension(spark, tmp_path):
    f = tmp_path / "one.mkv"
    f.write_bytes(b"x")
    assert V.plan_video_files(spark, str(f)).count() == 1
    bad = tmp_path / "one.txt"
    bad.write_bytes(b"x")
    with pytest.raises(FileNotFoundError, match="Not a supported video file"):
        V.plan_video_files(spark, str(bad))


def test_write_clips_webp_column(spark, tmp_path):
    out = str(tmp_path / "wout")
    uid = V.clip_uuid("/in/v.mp4", 0, 48)
    clip = {
        "uuid": uid,
        "source_video": "/in/v.mp4",
        "span": (0.0, 2.0),
        "windows": [
            {"start_frame": 0, "end_frame": 48},
            {"start_frame": 48, "end_frame": 96},
        ],
        "filtered": False,
    }
    df = spark.createDataFrame(
        [
            (
                "/in/v.mp4",
                0,
                json.dumps(clip),
                bytearray(b"mp4"),
                [bytearray(b"W0"), None],
                None,
            )
        ],
        "video_path string, clip_chunk_index int, clip string, "
        "buffer binary, webps array<binary>, video_metadata string",
    )
    stats = V.write_clips(df, V.ClipWriter(output_path=out, input_path="/in")).collect()
    assert stats[0]["num_clips_with_webp"] == 1
    assert (
        tmp_path / "wout" / "previews" / uid / "0_48.webp"
    ).read_bytes() == b"W0"
    assert not (tmp_path / "wout" / "previews" / uid / "48_96.webp").exists()


def test_process_video_seeds_filter_counters(tmp_path):
    w = V.ClipWriter(output_path=str(tmp_path / "o"), input_path="/in")
    video = {
        "input_path": "/in/a.mp4",
        "clip_chunk_index": 0,
        "metadata": {},
        "clips": [],
        "filtered_clips": [
            _clip(V.clip_uuid("/in/a.mp4", 0, 48), "/in/a.mp4", (0.0, 1.0))
        ],
        "clip_stats": {"num_filtered_by_motion": 1},
    }
    chunk = w.process_video(video)
    # upstream motion-filter counter flows into the chunk bookkeeping
    assert chunk["num_clips_filtered_by_motion"] == 1

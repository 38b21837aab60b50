"""Audio segment concatenation bookkeeping + timestamp remapping
(reference preprocessing/concatenation.py + postprocessing/
timestamp_mapper.py, deterministic halves)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from nemo_curator_spark.operators import audio_segments as A
from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav


def _translate_py(mappings, cs, ce):
    # direct port of timestamp_mapper._translate_to_original:74-103
    out = []
    for m in mappings:
        if m["concat_end_ms"] <= cs or m["concat_start_ms"] >= ce:
            continue
        ov_s = max(cs, m["concat_start_ms"])
        ov_e = min(ce, m["concat_end_ms"])
        dur = ov_e - ov_s
        if dur <= 0:
            continue
        out.append(
            (
                m["original_start_ms"] + (ov_s - m["concat_start_ms"]),
                m["original_start_ms"] + (ov_e - m["concat_start_ms"]),
                dur,
            )
        )
    return out


def test_segment_mappings_layout(spark):
    rows = [
        # (file, seg_num, start_ms, end_ms, duration_ms)
        (1, 0, 100, 900, 800),
        (1, 1, 5000, 5000, 700),  # end <= start -> fallback start+dur
        (1, 2, 9000, 9600, 600),
        (2, 5, 0, 400, 400),  # segment numbering with gaps is fine
    ]
    df = spark.createDataFrame(
        rows,
        "file_id long, segment_num int, start_ms long, end_ms long, duration_ms long",
    )
    m = {
        (r["file_id"], r["segment_index"]): r
        for r in A.segment_mappings(df, silence_ms=500).collect()
    }
    # file 1: head-to-tail with 500ms gaps
    assert (m[(1, 0)]["concat_start_ms"], m[(1, 0)]["concat_end_ms"]) == (0, 800)
    assert (m[(1, 1)]["concat_start_ms"], m[(1, 1)]["concat_end_ms"]) == (1300, 2000)
    assert (m[(1, 2)]["concat_start_ms"], m[(1, 2)]["concat_end_ms"]) == (2500, 3100)
    # original span: fallback applied for seg 1 only
    assert m[(1, 1)]["original_end_ms"] == 5000 + 700
    assert m[(1, 0)]["original_end_ms"] == 900
    # independent per file
    assert m[(2, 5)]["concat_start_ms"] == 0


def test_translate_to_original_matches_python_port(spark):
    import random

    rng = random.Random(4242)
    seg_rows, span_rows = [], []
    for fid in range(30):
        k = rng.randint(1, 5)
        for i in range(k):
            dur = rng.randint(100, 2000)
            start = i * 3000 + rng.randint(0, 50)
            end = start + (0 if i % 3 == 0 else dur + rng.randint(0, 20))
            seg_rows.append((fid, i, start, end, dur))
        for _ in range(3):
            s = rng.randint(0, 8000)
            span_rows.append((fid, s, s + rng.randint(1, 4000)))
    segs = spark.createDataFrame(
        seg_rows,
        "file_id long, segment_num int, start_ms long, end_ms long, duration_ms long",
    )
    spans = spark.createDataFrame(
        span_rows, "file_id long, concat_start_ms long, concat_end_ms long"
    )
    mappings = A.segment_mappings(segs, silence_ms=500)
    got = sorted(
        (
            r["file_id"], r["span_start_ms"], r["span_end_ms"],
            r["original_start_ms"], r["original_end_ms"], r["duration_ms"],
        )
        for r in A.translate_to_original(spans, mappings).collect()
    )
    by_file: dict[int, list[dict]] = {}
    for r in mappings.collect():
        by_file.setdefault(r["file_id"], []).append(r.asDict())
    exp = []
    for fid, cs, ce in span_rows:
        for os_, oe, dur in _translate_py(by_file.get(fid, []), cs, ce):
            exp.append((fid, cs, ce, os_, oe, dur))
    assert got == sorted(exp)


def test_concat_wav_segments_real_bytes(spark):
    sr = 8000
    s1 = (np.sin(np.linspace(0, 20, 1600)) * 20000).astype(np.int16)
    s2 = (np.cos(np.linspace(0, 10, 800)) * 15000).astype(np.int16)
    rows = [
        (7, 0, bytearray(encode_wav(s1, sr))),
        (7, 1, bytearray(encode_wav(s2, 16000))),  # rate mismatch -> skipped
        (7, 2, bytearray(encode_wav(s2, sr))),
    ]
    df = spark.createDataFrame(rows, "file_id long, segment_num int, wav binary")
    out = A.concat_wav_segments(df, silence_ms=250).collect()
    assert len(out) == 1
    r = out[0]
    assert r["num_segments"] == 2 and r["sample_rate"] == sr
    _, got_sr, samples = decode_wav(bytes(r["wav"]))
    silence = np.zeros(int(250 * sr / 1000), dtype=np.int16)
    expected = np.concatenate([s1, silence, s2])
    assert got_sr == sr
    assert np.array_equal(samples, expected)
    assert r["total_duration_sec"] == len(expected) / sr
    # mappings are built DURING the splice: the skipped middle segment
    # (rate mismatch) occupies NO phantom concat-space — segment 2 starts
    # right after s1 + one silence gap, inside the real audio
    maps = sorted((m["segment_index"], m) for m in r["mappings"])
    assert [i for i, _ in maps] == [0, 2]
    m0, m2 = maps[0][1], maps[1][1]
    assert (m0["concat_start_ms"], m0["concat_end_ms"]) == (0, 200)
    assert (m2["concat_start_ms"], m2["concat_end_ms"]) == (450, 550)
    assert m2["concat_end_ms"] <= int(r["total_duration_sec"] * 1000)
    # and translating a span inside segment 2 lands in segment 2, never
    # in the skipped segment
    from pyspark.sql import functions as F

    mdf = (
        spark.createDataFrame(out)
        .select("file_id", F.explode("mappings").alias("m"))
        .select("file_id", "m.*")
    )
    spans = spark.createDataFrame(
        [(7, 460, 500)], "file_id long, concat_start_ms long, concat_end_ms long"
    )
    tr = A.translate_to_original(spans, mdf).collect()
    assert len(tr) == 1 and tr[0]["segment_index"] == 2


def test_concat_wav_string_ids_and_null_spans(spark):
    sr = 8000
    s1 = (np.sin(np.linspace(0, 5, 800)) * 9000).astype(np.int16)
    rows = [
        ("a/b.wav", 0, bytearray(encode_wav(s1, sr)), None, None),
        ("a/b.wav", 1, bytearray(encode_wav(s1, sr)), 5000, 5100),
    ]
    df = spark.createDataFrame(
        rows,
        "file_id string, segment_num int, wav binary, start_ms long, end_ms long",
    )
    out = A.concat_wav_segments(df, silence_ms=100).collect()
    assert len(out) == 1 and out[0]["file_id"] == "a/b.wav"
    m = sorted(out[0]["mappings"], key=lambda x: x["segment_index"])
    # NULL span -> 0 fallback (then end<=start fix-up applies)
    assert m[0]["original_start_ms"] == 0
    assert m[0]["original_end_ms"] == 100  # 0 + dur(800 samples @ 8k = 100ms)
    assert m[1]["original_start_ms"] == 5000

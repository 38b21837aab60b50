"""MiniSortFormer + diarization stage halves
(operators/{sortformer_mini,diarization}.py vs reference
stages/audio/inference/speaker_diarization/{sortformer,pyannote}.py).

Pins: save/load bit-exactness, held-out frame F1 (real inference), the
arrival-order sort contract, the python segment walk equaling the gate's
window-plan replay, the three-format segment parser, RTTM formatting,
session/speaker-id resolution, the overlap scan, turn routing, and the
max_length VAD chopper walk.
"""

from __future__ import annotations

import random
from types import SimpleNamespace

import numpy as np
import pytest

from nemo_curator_spark.operators import diarization as DZ
from nemo_curator_spark.operators import sortformer_mini as SM


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sf") / "sortformer.mini.json")
    SM.ensure_artifact(path)
    return SM.load_cached(path), path


def test_save_load_bit_exact(model, tmp_path):
    m, _ = model
    p2 = str(tmp_path / "again.json")
    m.save(p2)
    m2 = SM.MiniSortFormer.load(p2)
    wav, _ = SM.synth_diar_clip(3)
    a1, t1 = m.activities(wav)
    a2, t2 = m2.activities(wav)
    assert np.array_equal(a1, a2) and np.array_equal(t1, t2)


def test_heldout_frame_f1(model):
    m, _ = model
    tp = np.zeros(3)
    fp = np.zeros(3)
    fn = np.zeros(3)
    for seed in range(7000, 7040):  # never used in training (seed*10000+i)
        wav, segs = SM.synth_diar_clip(seed)
        probs, _ = m.activities(wav)
        y = SM.frame_labels(segs, probs.shape[0])[:, :3]
        pred = (probs[:, :3] > 0.5).astype(float)
        tp += ((pred == 1) & (y == 1)).sum(axis=0)
        fp += ((pred == 1) & (y == 0)).sum(axis=0)
        fn += ((pred == 0) & (y == 1)).sum(axis=0)
    f1 = 2 * tp / np.maximum(2 * tp + fp + fn, 1)
    assert (f1 > 0.9).all(), f1
    # the spare 4th channel stays silent on 3-speaker audio
    wav, _ = SM.synth_diar_clip(7001)
    probs, _ = m.activities(wav)
    assert (probs[:, 3] < 0.5).all()


def test_arrival_order_contract(model):
    # whoever speaks first is speaker_0, regardless of identity channel
    m, _ = model
    found_reordered = False
    for seed in range(8000, 8030):
        wav, segs = SM.synth_diar_clip(seed)
        if len({s for s, *_ in segs}) < 2:
            continue
        parsed = DZ.parse_sortformer_segments(SM.diar_segments(m, wav))
        if not parsed:
            continue
        by_spk = {}
        for seg in parsed:
            by_spk.setdefault(seg["speaker"], []).append(seg["start"])
        firsts = sorted((min(v), k) for k, v in by_spk.items())
        # arrival index increases with first-activity time
        assert [k for _, k in firsts] == [
            f"speaker_{i}" for i in range(len(firsts))
        ]
        # identity of the first arriver differs across seeds somewhere
        first_identity = min(segs, key=lambda s: s[1])[0]
        if first_identity != 0:
            found_reordered = True
    assert found_reordered  # the sort is doing real work


def test_python_walk_equals_window_plan(spark, model):
    # the gate replays islands + arrival relabel as a window plan; the
    # python walk must emit identical segments
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    m, _ = model
    rows = []
    want = set()
    for d in (5, 9, 14):
        wav, _ = SM.synth_diar_clip(d)
        probs, times = m.activities(wav)
        for i in range(probs.shape[0]):
            t = float(times[i])
            rows.append(
                (d, i, t, t + SM.FRAME_SEC) + tuple(float(v) for v in probs[i])
            )
        for seg in DZ.parse_sortformer_segments(SM.diar_segments(m, wav)):
            want.add((d, seg["speaker"], seg["start"], seg["end"]))
    act = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["doc_id", "frame", "t0", "t1", "p0", "p1", "p2", "p3"]
        )
    )
    lo = act.select(
        "doc_id", "frame", "t0", "t1",
        F.explode(
            F.array(
                *[F.struct(F.lit(c).alias("c"), F.col(f"p{c}").alias("p"))
                  for c in range(4)]
            )
        ).alias("cp"),
    ).select("doc_id", "frame", "t0", "t1", "cp.c", "cp.p")
    active = lo.where(F.col("p") > 0.5)
    w_isl = Window.partitionBy("doc_id", "c").orderBy("frame")
    segs = (
        active.withColumn("grp", F.col("frame") - F.row_number().over(w_isl))
        .groupBy("doc_id", "c", "grp")
        .agg(F.min("t0").alias("s"), F.max("t1").alias("e"))
    )
    w_arr = Window.partitionBy("doc_id").orderBy("fs", "c")
    om = (
        segs.groupBy("doc_id", "c")
        .agg(F.min("s").alias("fs"))
        .withColumn("arr", F.row_number().over(w_arr) - 1)
    )
    got = {
        (r["doc_id"], f"speaker_{r['arr']}", r["s"], r["e"])
        for r in segs.join(om, on=["doc_id", "c"]).collect()
    }
    assert got == want


# ------------------------------------------------------------- halves


def test_parse_sortformer_segments_three_formats():
    obj = SimpleNamespace(start=1.0, end=2.0, speaker="spk0")
    obj_label = SimpleNamespace(start=3.0, end=4.0, label="L1")
    got = DZ.parse_sortformer_segments(
        [
            " 0.5 1.5 speaker_1 ",
            "2.0 2.5",
            obj,
            obj_label,
            (5.0, 6.0, "t-spk"),
            {"weird": 1},
        ]
    )
    assert got == [
        {"start": 0.5, "end": 1.5, "speaker": "speaker_1"},
        {"start": 2.0, "end": 2.5, "speaker": "unknown"},
        {"start": 1.0, "end": 2.0, "speaker": "spk0"},
        {"start": 3.0, "end": 4.0, "speaker": "L1"},
        {"start": 5.0, "end": 6.0, "speaker": "t-spk"},
    ]


def test_rttm_lines_and_write(tmp_path):
    segs = [
        {"start": 0.1234, "end": 2.0, "speaker": "spk0"},
        {"start": 5.0, "end": 5.0, "speaker": "degenerate"},
    ]
    lines = DZ.rttm_lines(segs, "sess1")
    assert lines == [
        "SPEAKER sess1 1 0.123 1.877 <NA> <NA> spk0 <NA> <NA>"
    ]
    path = DZ.write_rttm(segs, "sess1", str(tmp_path / "rttm"))
    assert open(path).read() == lines[0] + "\n"


def test_session_and_speaker_id_resolution():
    assert DZ.resolve_session_name({"session_name": "s9"}) == "s9"
    assert (
        DZ.resolve_session_name({"audio_filepath": "/a/b/clip.flac"})
        == "clip"
    )
    assert DZ.speaker_id_for({"audio_item_id": "it"}, "sp") == "it_sp"
    assert DZ.speaker_id_for({"speaker_id": "sid"}, "sp") == "sid_sp"
    assert (
        DZ.speaker_id_for(
            {"resampled_audio_filepath": "/x/y.wav"}, "sp"
        )
        == "y_sp"
    )
    with pytest.raises(ValueError):
        DZ.speaker_id_for({}, "sp")


def test_has_overlap_cases():
    overlaps = [(2.0, 3.0), (10.0, 12.0)]
    assert DZ.has_overlap((2.5, 4.0), overlaps)  # starts during turn? o.start in turn
    assert DZ.has_overlap((1.0, 2.5), overlaps)  # overlap starts during turn
    assert DZ.has_overlap((2.5, 2.8), overlaps)  # contained
    assert not DZ.has_overlap((4.0, 9.0), overlaps)
    assert not DZ.has_overlap((13.0, 14.0), overlaps)  # after all, early break


def test_route_turns_min_length():
    turns = [
        (0.0, 1.0, "a_sp"),  # clean, long enough
        (2.0, 2.4, "b_sp"),  # clean, too short (0.4 < 0.5)
        (4.9, 6.0, "c_sp"),  # overlapped
    ]
    clean, over = DZ.route_turns(turns, [(5.0, 5.5)], min_length=0.5)
    assert [c["speaker"] for c in clean] == ["a_sp"]
    assert [o["speaker"] for o in over] == ["c_sp"]


def test_add_vad_segments_walk():
    # short turn passes through
    segs = []
    DZ.add_vad_segments(None, None, 1.0, 5.0, segs, "sp", max_length=40.0)
    assert segs == [{"speaker": "sp", "start": 1.0, "end": 5.0}]
    # long turn: greedy packing to seeded random targets
    vad = [
        {"start": 0.0, "end": 10.0},
        {"start": 12.0, "end": 20.0},
        {"start": 21.0, "end": 50.0},
    ]
    segs = []
    rng = random.Random(7)
    DZ.add_vad_segments(
        lambda s, e: vad, rng, 100.0, 160.0, segs, "sp",
        min_length=0.5, max_length=40.0,
    )
    # replay the reference walk directly with the same rng stream
    want = []
    rng2 = random.Random(7)
    i, n = 0, len(vad)
    while i < n:
        rd = rng2.uniform(0.5, 40.0)
        s0, e0 = vad[i]["start"], vad[i]["end"]
        if e0 - s0 >= rd:
            want.append({"speaker": "sp", "start": 100.0 + s0, "end": 100.0 + e0})
            i += 1
            continue
        while i < n and (vad[i]["end"] - s0) < rd:
            e0 = vad[i]["end"]
            i += 1
        want.append({"speaker": "sp", "start": 100.0 + s0, "end": 100.0 + e0})
    assert segs == want


def test_speaker_separation_with_real_diarizer(model):
    # the full reference speaker-separation stage driven by REAL
    # MiniSortFormer inference through its diarize seam
    from nemo_curator_spark.operators import speaker_sep as SS

    _, path = model
    wav, segs = SM.synth_diar_clip(12345)  # two speakers, overlapping
    stage = SS.SpeakerSeparationStage(
        diarize=SM.diarizer(path), min_duration=0.2, exclude_overlaps=False
    )
    items = stage.process_entry(
        {"waveform": wav, "sample_rate": SM.SR, "audio_item_id": "c1"}
    )
    assert len(items) == len({s for s, *_ in segs})
    for item in items:
        assert item["num_speakers"] == len(items)
        assert item["sample_rate"] == SM.SR
        assert item["duration"] > 0
        assert item["waveform"].dtype == np.int16


def test_spark_diarize_rows(spark, model):
    _, path = model
    df = spark.createDataFrame([(5,), (9,)], "doc_id long")
    rows = DZ.sortformer_diarize_rows(df, path).collect()
    m = SM.load_cached(path)
    want = set()
    for d in (5, 9):
        wav, _ = SM.synth_diar_clip(d)
        for seg in DZ.parse_sortformer_segments(SM.diar_segments(m, wav)):
            want.add((d, seg["speaker"], seg["start"], seg["end"]))
    got = {
        (r["doc_id"], r["speaker"], r["seg_start"], r["seg_end"])
        for r in rows
    }
    # worker-vs-driver forwards can differ by one ulp in PROBABILITIES,
    # which only matters exactly at the 0.5 threshold — compare the
    # segment sets (times are frame-grid dyadics, threshold far from
    # boundary on this corpus)
    assert got == want

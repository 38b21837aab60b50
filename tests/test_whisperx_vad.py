"""WhisperX VAD deterministic half — reference
stages/audio/inference/vad/whisperx_vad.py (stage contract) over the
public whisperx binarize-and-merge algorithm the reference calls
(Pyannote.merge_chunks / Binarize(max_duration))."""

from __future__ import annotations

import math

import numpy as np
import pytest

from nemo_curator_spark.operators import whisperx_vad as W
from nemo_curator_spark.operators.multimodal import encode_wav


def test_binarize_hysteresis_hand_trace():
    ts = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    sc = [0.1, 0.8, 0.7, 0.2, 0.1, 0.9, 0.6, 0.2]
    got = W.binarize_scores(sc, ts, onset=0.5, offset=0.363)
    assert got == [(1.0, 3.0), (5.0, 7.0)]


def test_binarize_trailing_active_closes_at_last_frame():
    got = W.binarize_scores([0.9, 0.9, 0.9], [0.0, 1.0, 2.0], onset=0.5)
    assert got == [(0.0, 2.0)]


def test_binarize_max_duration_splits_at_second_half_min():
    ts = [float(i) for i in range(11)]
    sc = [0.9] * 11
    got = W.binarize_scores(sc, ts, onset=0.5, max_duration=4.0)
    # hand trace: splits at the argmin (all-equal -> first) of the
    # second half of the running window each time the duration exceeds 4
    assert got == [(0.0, 2.0), (2.0, 5.0), (5.0, 8.0), (8.0, 10.0)]
    # a genuine dip pulls the cut to the dip
    sc2 = [0.9, 0.9, 0.9, 0.9, 0.55, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9]
    got2 = W.binarize_scores(sc2, ts, onset=0.5, max_duration=4.0)
    assert got2[0] == (0.0, 4.0)  # dip at t=4 is in the searched half


def test_binarize_pad_collar_and_min_duration():
    ts = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    sc = [0.1, 0.8, 0.7, 0.2, 0.1, 0.9, 0.6, 0.2]
    # pad_offset 1.5 makes (1,4.5) and (5,8.5): gap 0.5 <= collar 1 -> merge
    got = W.binarize_scores(
        sc, ts, onset=0.5, offset=0.363, pad_offset=1.5, min_duration_off=1.0
    )
    assert got == [(1.0, 8.5)]
    # min_duration_on drops short regions
    got2 = W.binarize_scores(
        sc, ts, onset=0.5, offset=0.363, min_duration_on=5.0
    )
    assert got2 == []
    # collar is STRICT (pyannote Timeline.support): gap == collar stays
    got3 = W.binarize_scores(
        sc, ts, onset=0.5, offset=0.363, min_duration_off=2.0
    )
    assert got3 == [(1.0, 3.0), (5.0, 7.0)]  # gap exactly 2.0 -> no merge
    got4 = W.binarize_scores(
        sc, ts, onset=0.5, offset=0.363, min_duration_off=2.0001
    )
    assert got4 == [(1.0, 7.0)]
    # pads + finite max_duration is the upstream NotImplementedError
    with pytest.raises(NotImplementedError):
        W.binarize_scores(sc, ts, pad_onset=0.1, max_duration=4.0)


def test_binarize_empty_and_all_silence():
    assert W.binarize_scores([], [], onset=0.5) == []
    assert W.binarize_scores([0.1, 0.2], [0.0, 1.0], onset=0.5) == []


def test_merge_chunks_hand_trace():
    turns = [(0.0, 2.0), (2.0, 5.0), (5.0, 8.0), (8.0, 10.0)]
    got = W.merge_chunks(turns, 6.0)
    assert got == [
        {"start": 0.0, "end": 5.0, "segments": [(0.0, 2.0), (2.0, 5.0)]},
        {"start": 5.0, "end": 10.0, "segments": [(5.0, 8.0), (8.0, 10.0)]},
    ]
    assert W.merge_chunks([], 6.0) == []
    single = W.merge_chunks([(1.0, 3.0)], 6.0)
    assert single == [{"start": 1.0, "end": 3.0, "segments": [(1.0, 3.0)]}]
    with pytest.raises(ValueError):
        W.merge_chunks(turns, 0.0)


def test_merge_chunks_boundary_not_greater_stays():
    # seg_end - curr_start == chunk_size exactly -> stays in the chunk
    got = W.merge_chunks([(0.0, 2.0), (3.0, 6.0)], 6.0)
    assert len(got) == 1 and got[0]["end"] == 6.0


def test_binarize_merge_properties():
    # randomized invariants over many seeds (deterministic RandomState)
    for seed in range(200):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(1, 80))
        scores = rng.uniform(0, 1, n)
        ts = (np.arange(n) + 0.5) * 0.5
        chunk = float(rng.choice([2.0, 5.0, 12.0]))
        turns = W.binarize_scores(scores, ts, onset=0.55, offset=0.4,
                                  max_duration=chunk)
        # ordered, non-overlapping, non-negative
        for (s1, e1), (s2, e2) in zip(turns, turns[1:]):
            assert s1 <= s2 and e1 <= s2
        assert all(e >= s for s, e in turns)
        chunks = W.merge_chunks(turns, chunk)
        # chunks partition the turns in order
        flat = [seg for c in chunks for seg in c["segments"]]
        assert flat == sorted(turns)
        for c in chunks:
            assert c["start"] == c["segments"][0][0]
            assert c["end"] == c["segments"][-1][1]
            # a multi-turn chunk never stretches past chunk_size
            if len(c["segments"]) > 1:
                assert c["end"] - c["start"] <= chunk + 1e-12


def _two_burst_wav(sr=16000, total=10.0):
    t = np.arange(int(sr * total)) / sr
    y = 0.001 * np.sin(2 * np.pi * 80 * t)
    for s, e in ((1.0, 3.0), (6.0, 8.5)):
        m = (t >= s) & (t < e)
        y[m] = 0.5 * np.sin(2 * np.pi * 440 * t[m])
    return y


def test_model_finds_two_chunks():
    y = _two_burst_wav()
    model = W.WhisperXVADModel()
    segs = model.get_vad_segments(y[None, :], 4.0, sample_rate=16000)
    assert len(segs) == 2
    assert segs[0]["start"] == pytest.approx(1.0, abs=0.1)
    assert segs[1]["end"] == pytest.approx(8.5, abs=0.1)


def test_stage_min_length_skip_and_metrics():
    st = W.WhisperXVADStage(min_length=0.5, max_length=4.0)
    entry, metrics = st.process_entry(
        {"waveform": np.zeros(1600), "sample_rate": 16000}
    )
    assert entry["vad_segments"] == []
    assert metrics == {
        "audio_duration": pytest.approx(0.1),
        "vad_segments_detected": 0,
        "skipped_short": 1.0,
    }
    y = _two_burst_wav()
    entry2, m2 = st.process_entry({"waveform": y, "sample_rate": 16000})
    assert m2["skipped_short"] == 0.0
    assert m2["vad_segments_detected"] == len(entry2["vad_segments"]) == 2
    assert m2["audio_duration"] == pytest.approx(10.0)


def test_spark_matches_python_and_partitioning(spark):
    sr = 16000
    waves = {
        0: _two_burst_wav(sr),
        1: np.zeros(int(sr * 0.2)),  # short -> skipped row
        2: _two_burst_wav(sr, total=12.0),
    }
    rows = [
        (fid, bytearray(encode_wav((y * 32767).astype(np.int16), sr)))
        for fid, y in waves.items()
    ]
    df = spark.createDataFrame(rows, "file_id long, wav binary")
    st = W.WhisperXVADStage(min_length=0.5, max_length=4.0)
    got = {
        (r.file_id, r.chunk_idx): r
        for r in W.whisperx_vad_chunks(df, st).collect()
    }
    got_rep = {
        (r.file_id, r.chunk_idx): (r.chunk_start, r.chunk_end, r.n_turns)
        for r in W.whisperx_vad_chunks(df.repartition(7), st).collect()
    }
    assert got_rep == {
        k: (v.chunk_start, v.chunk_end, v.n_turns) for k, v in got.items()
    }
    assert got[(1, -1)].skipped_short == 1.0
    for fid in (0, 2):
        y = waves[fid]
        ints = (y * 32767).astype(np.int16)
        entry, _ = W.WhisperXVADStage(
            min_length=0.5, max_length=4.0
        ).process_entry(
            {"waveform": ints.astype(np.float64) / 32768.0,
             "sample_rate": sr}
        )
        for i, c in enumerate(entry["vad_segments"]):
            r = got[(fid, i)]
            assert r.chunk_start == c["start"]
            assert r.chunk_end == c["end"]
            assert r.n_turns == len(c["segments"])
        assert (fid, len(entry["vad_segments"])) not in got

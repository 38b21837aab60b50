"""Speaker separation deterministic half — reference
speaker_separation_module/speaker_sep.py (timeline sweeps, merge/filter,
canvas assembly) + the stage contract."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import speaker_sep as S
from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav


def test_parse_speaker_segments():
    segs = S.parse_speaker_segments(["0.0 2.0 spk0", "2.5 4.0 spk1"])
    assert segs == {"spk0": [(0.0, 2.0)], "spk1": [(2.5, 4.0)]}
    # nested list unwrap (model output shape)
    nested = S.parse_speaker_segments([["0.0 1.0 a"]])
    assert nested == {"a": [(0.0, 1.0)]}
    # malformed lines skipped
    assert S.parse_speaker_segments(["bogus", "1.0 2.0 x"]) == {
        "x": [(1.0, 2.0)]
    }


def test_clean_cut_overlap():
    # a: [0,10], b: [4,6] -> a is cut at the overlap, b keeps [4,6],
    # a resumes [6,10] (speaker_sep.py:149-199 sweep)
    segs = {"a": [(0.0, 10.0)], "b": [(4.0, 6.0)]}
    out = S.clean_cut_overlapping_segments(segs)
    assert out["a"] == [(0.0, 4.0), (6.0, 10.0)]
    assert out["b"] == [(4.0, 6.0)]
    # no overlap -> unchanged
    out2 = S.clean_cut_overlapping_segments(
        {"a": [(0.0, 1.0)], "b": [(2.0, 3.0)]}
    )
    assert out2 == {"a": [(0.0, 1.0)], "b": [(2.0, 3.0)]}


def test_exclude_overlap_with_buffer():
    segs = {"a": [(0.0, 10.0)], "b": [(4.0, 6.0)]}
    out = S.exclude_overlapping_segments(segs, buffer_time=0.5)
    # single-speaker span before overlap ends 0.5 early; after the
    # overlap it resumes 0.5 late (speaker_sep.py:246-275)
    assert out["a"] == [(0.0, 3.5), (6.5, 10.0)]
    assert out["b"] == []
    assert S.exclude_overlapping_segments({}, 0.5) == {}


def test_merge_and_filter():
    merged = S.merge_adjacent_segments(
        [(2.0, 3.0), (0.0, 1.0), (1.05, 1.5)], gap_threshold=0.1
    )
    assert merged == [(0.0, 1.5), (2.0, 3.0)]
    assert S.merge_adjacent_segments([], 0.1) == []
    filtered = S.filter_short_segments(
        {"a": [(0.0, 0.5), (1.0, 4.0)]}, min_duration=1.0
    )
    assert filtered == {"a": [(1.0, 4.0)]}


def test_process_pipeline_order():
    pred = [
        "0.0 10.0 a",
        "4.0 6.0 b",
        "10.05 11.0 a",  # merged into a's tail (gap 0.05 <= 0.1)
    ]
    out = S.process_speaker_segments(
        pred, gap_threshold=0.1, exclude_overlaps=False, min_duration=2.0
    )
    # clean-cut -> a: [0,4],[6,10] then [10.05, 11] merges with [6,10]
    assert out["a"] == [(0.0, 4.0), (6.0, 11.0)]
    # b's 2.0 s segment passes min_duration exactly
    assert out["b"] == [(4.0, 6.0)]
    # all-overlap + exclude -> everything removed -> {}
    allover = ["0.0 5.0 a", "0.0 5.0 b"]
    assert S.process_speaker_segments(
        allover, exclude_overlaps=True, min_duration=0.5
    ) == {}
    assert S.process_speaker_segments([]) == {}


def test_canvas_assembly_gates():
    sr = 1000
    samples = (np.ones(10 * sr) * 1000).astype(np.int16)
    segs = {
        "a": [(1.0, 3.0)],
        "tiny": [(0.0, 0.05)],  # total < 0.1 s -> skipped
        "none": [],
    }
    out = S.speaker_audio_canvases(samples, sr, segs)
    assert set(out) == {"a"}
    canvas, dur, _ = out["a"]
    assert dur == pytest.approx(2.0)
    assert canvas[500] == 0 and canvas[1500] == 1000  # silence outside
    # silent source -> rms gate skips
    silent = np.zeros(10 * sr, dtype=np.int16)
    assert S.speaker_audio_canvases(silent, sr, {"a": [(1.0, 3.0)]}) == {}


def test_stage_contract_and_spark(spark):
    sr = 8000
    samples = (
        np.sin(np.arange(6 * sr) / 10.0) * 15000
    ).astype(np.int16)

    def fake_diarize(waveform, sample_rate):
        return ["0.0 2.0 spk0", "2.5 5.5 spk1"]

    st = S.SpeakerSeparationStage(
        diarize=fake_diarize, exclude_overlaps=True, min_duration=0.8
    )
    items = st.process_entry(
        {"waveform": samples, "sample_rate": sr, "src": "f.wav"}
    )
    assert [i["speaker_id"] for i in items] == ["spk0", "spk1"]
    assert all(i["num_speakers"] == 2 for i in items)
    assert items[0]["duration"] == pytest.approx(2.0)
    assert items[0]["src"] == "f.wav"  # metadata passthrough
    assert "num_samples" not in items[0]

    # model-gated default raises (plug point contract)
    with pytest.raises(NotImplementedError, match="diarization"):
        S.SpeakerSeparationStage().process_entry(
            {"waveform": samples, "sample_rate": sr}
        )

    df = spark.createDataFrame(
        [(0, bytearray(encode_wav(samples, sr)))],
        "file_id long, wav binary",
    )
    rows = (
        S.separate_speakers(df, st).orderBy("speaker_id").collect()
    )
    assert [r["speaker_id"] for r in rows] == ["spk0", "spk1"]
    ch, sr2, wav0 = decode_wav(bytes(rows[0]["wav"]))
    assert sr2 == sr and len(wav0) == len(samples)
    # spk0's canvas is silent after 2.0 s
    assert np.all(wav0[int(2.2 * sr):] == 0)
    assert np.any(wav0[: int(1.8 * sr)] != 0)

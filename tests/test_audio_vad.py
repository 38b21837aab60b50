"""VAD segmentation deterministic half — reference
stages/audio/segmentation/vad_segmentation.py (segment-item assembly,
nested/fan-out contract, silero parameter semantics via the energy
stand-in)."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import audio_vad as V
from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav


def _signal(sr=16000, speech_spans=((0.5, 3.0), (4.0, 7.0)), total=8.0):
    """Loud sine inside speech spans, near-silence elsewhere."""
    t = np.arange(int(sr * total)) / sr
    y = 0.001 * np.sin(2 * np.pi * 100 * t)
    for s, e in speech_spans:
        m = (t >= s) & (t < e)
        y[m] = 0.5 * np.sin(2 * np.pi * 440 * t[m])
    return y


def test_energy_vad_finds_spans():
    sr = 16000
    y = _signal(sr)
    segs = V.EnergyVAD(min_speech_duration_ms=1000)(y, sr)
    assert len(segs) == 2
    assert segs[0]["start"] == pytest.approx(0.5, abs=0.1)
    assert segs[0]["end"] == pytest.approx(3.0, abs=0.1)
    assert segs[1]["start"] == pytest.approx(4.0, abs=0.1)


def test_energy_vad_silero_param_semantics():
    sr = 16000
    # two spans 300 ms apart: min_silence 500 ms closes the gap
    y = _signal(sr, speech_spans=((1.0, 2.0), (2.3, 3.3)), total=4.0)
    merged = V.EnergyVAD(
        min_speech_duration_ms=500, min_silence_duration_ms=500
    )(y, sr)
    assert len(merged) == 1
    # min_silence 100 ms keeps them apart
    split = V.EnergyVAD(
        min_speech_duration_ms=500, min_silence_duration_ms=100
    )(y, sr)
    assert len(split) == 2
    # min_speech drops short segments
    short = V.EnergyVAD(
        min_speech_duration_ms=1500, min_silence_duration_ms=100
    )(y, sr)
    assert short == []
    # max_speech splits long runs
    long_y = _signal(sr, speech_spans=((0.0, 5.0),), total=5.0)
    parts = V.EnergyVAD(
        min_speech_duration_ms=100,
        max_speech_duration_s=2.0,
        min_silence_duration_ms=100,
    )(long_y, sr)
    assert len(parts) == 3  # 2 + 2 + 1 seconds
    assert parts[0]["end"] - parts[0]["start"] == pytest.approx(2.0)
    # silence-only input
    assert V.EnergyVAD()(np.zeros(sr), sr) == []


def test_build_segment_item_contract():
    sr = 1000
    item = {
        "waveform": np.arange(5000, dtype=np.float64),
        "sample_rate": sr,
        "audio_filepath": "/a/b.wav",
        "speaker": "S1",
        "duration": 99.0,  # excluded bookkeeping key, must be rebuilt
        "num_samples": 123,
    }
    seg = V.build_segment_item(
        item, item["waveform"], sr, {"start": 1.0, "end": 2.5}, 3
    )
    assert seg["start_ms"] == 1000 and seg["end_ms"] == 2500
    assert seg["segment_num"] == 3
    assert seg["duration"] == pytest.approx(1.5)
    assert seg["original_file"] == "/a/b.wav"
    assert seg["speaker"] == "S1"  # passthrough
    assert "num_samples" not in seg  # excluded key list
    # 1-D waveform -> (1, n) cut at sample boundaries
    assert seg["waveform"].shape == (1, 1500)
    assert seg["waveform"][0, 0] == 1000.0


def test_stage_fanout_and_nested():
    sr = 16000
    y = _signal(sr)
    st = V.VADSegmentationStage(min_duration_sec=1.0)
    out = st.process_entry({"waveform": y, "sample_rate": sr, "id": "x"})
    assert isinstance(out, list) and len(out) == 2
    assert [s["segment_num"] for s in out] == [0, 1]
    nested = V.VADSegmentationStage(min_duration_sec=1.0, nested=True)
    entry = nested.process_entry({"waveform": y, "sample_rate": sr, "id": "x"})
    assert isinstance(entry, dict) and len(entry["segments"]) == 2
    assert "waveform" not in entry  # removed in nested mode
    # zero segments: nested keeps entry with [], fan-out yields nothing
    silent = np.zeros(sr)
    assert st.process_entry({"waveform": silent, "sample_rate": sr}) == []
    kept = V.VADSegmentationStage(nested=True).process_entry(
        {"waveform": silent, "sample_rate": sr}
    )
    assert kept["segments"] == []
    # missing waveform -> []
    assert st.process_entry({"sample_rate": sr}) == []


def test_vad_segment_spark(spark):
    sr = 16000
    y = _signal(sr)
    wav = encode_wav((y * 32767).astype(np.int16), sr)
    df = spark.createDataFrame(
        [(0, bytearray(wav))], "file_id long, wav binary"
    )
    st = V.VADSegmentationStage(min_duration_sec=1.0)
    rows = V.vad_segment(df, st).orderBy("segment_num").collect()
    assert [r["segment_num"] for r in rows] == [0, 1]
    assert rows[0]["start_ms"] == pytest.approx(500, abs=100)
    # the cut piece decodes to the right duration
    ch, sr2, samples = decode_wav(bytes(rows[0]["wav"]))
    assert ch == 1 and sr2 == sr
    assert len(samples) / sr == pytest.approx(
        (rows[0]["end_ms"] - rows[0]["start_ms"]) / 1000.0, abs=0.01
    )

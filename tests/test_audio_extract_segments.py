"""Audio segment-extraction IO pins (reference io/extract_segments.py
pure helpers + real WAV cuts)."""

from __future__ import annotations

import json

import numpy as np

from nemo_curator_spark.operators import audio_extract_segments as AE
from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav


def test_extract_scores_whitelist_and_rounding():
    entry = {
        "filename": "f", "duration": 3.0, "speaker_id": "speaker_2",
        "wer": 0.123456, "custom": "x", "diar_segments": [[0, 1]],
    }
    assert AE.extract_scores(entry) == {"wer": 0.1235, "custom": "x"}


def test_speaker_label():
    assert AE.get_speaker_label({"speaker_id": "speaker_3"}) == ("speaker_3", "3")
    assert AE.get_speaker_label({"speaker_id": "alice"}) == ("alice", "alice")
    assert AE.get_speaker_label({}) == ("unknown", "unknown")


def test_interval_builders_and_combo():
    ts_entry = {"original_start_ms": 500, "original_end_ms": 2500}
    assert AE.intervals_from_timestamps(ts_entry) == [(500, 2500, 2.0)]
    diar_entry = {"diar_segments": [[2.0, 3.0], [0.5, 1.5]]}
    assert AE.intervals_from_diar_segments(diar_entry) == [
        (500, 1500, 1.0), (2000, 3000, 1.0),
    ]
    assert AE.intervals_from_diar_segments({}) == []
    assert AE.detect_combo([]) == 2
    assert AE.detect_combo([ts_entry]) == 2
    assert AE.detect_combo([{"speaker_id": "s", "diar_segments": []}]) == 3
    assert AE.detect_combo([{"speaker_id": "s"}]) == 4


def test_base_metadata_shape():
    row = AE.base_metadata(
        "f.wav", "orig.wav",
        {"speaker_id": "speaker_1", "num_speakers": 2, "wer": 0.55555},
        0, 500, 2500, 2.0,
    )
    assert row == {
        "filename": "f.wav", "original_file": "orig.wav",
        "segment_index": 0, "start_sec": 0.5, "end_sec": 2.5,
        "duration": 2.0, "speaker_id": "speaker_1", "num_speakers": 2,
        "wer": 0.5555,  # round(0.55555,4): binary value sits below the midpoint
    }


def test_load_manifest_skips_bad_lines(tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text('{"a": 1}\n\nnot json\n{"b": 2}\n')
    assert AE.load_manifest(str(p)) == [{"a": 1}, {"b": 2}]


def test_spark_extract_segments(spark):
    sr = 1000
    wav = encode_wav(np.arange(5_000, dtype=np.int16), sr)
    entries = [
        {
            "speaker_id": "speaker_7",
            "diar_segments": [[0.5, 1.5], [3.0, 4.0]],
            "snr": 12.345678,
        }
    ]
    df = spark.createDataFrame(
        [("rec.wav", wav, json.dumps(entries))],
        "original_file string, wav binary, entries string",
    )
    out = AE.extract_audio_segments(df).orderBy("segment_index").toPandas()
    # combo 3: reference per-(file, speaker) counter + filename format
    assert out.filename.tolist() == [
        "rec_speaker_7_segment_000.wav", "rec_speaker_7_segment_001.wav",
    ]
    assert out.start_sec.tolist() == [0.5, 3.0]
    _, _, cut0 = decode_wav(bytes(out.wav[0]))
    assert np.array_equal(cut0, np.arange(500, 1500, dtype=np.int16))
    assert json.loads(out.scores[0]) == {"snr": 12.3457}


def test_spark_extract_timestamp_combo_counters(spark):
    """Review finding: multiple entries for one file must get RUNNING
    per-file indices (reference _make_filename counters) — and
    timestamp combos sort entries by original_start_ms first."""
    sr = 1000
    wav = encode_wav(np.arange(5_000, dtype=np.int16), sr)
    entries = [
        {"original_start_ms": 2000, "original_end_ms": 3000},
        {"original_start_ms": 0, "original_end_ms": 1000},
    ]
    df = spark.createDataFrame(
        [("a.wav", wav, json.dumps(entries))],
        "original_file string, wav binary, entries string",
    )
    out = AE.extract_audio_segments(df).orderBy("segment_index").toPandas()
    assert out.filename.tolist() == [
        "a_segment_000.wav", "a_segment_001.wav",
    ]
    assert out.start_sec.tolist() == [0.0, 2.0]  # start-sorted
    assert out.segment_index.tolist() == [0, 1]

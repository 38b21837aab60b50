"""Audio tagging pins (reference merge_alignment_diarization.py +
split.py semantics; real WAV splitting over the stdlib codec)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from nemo_curator_spark.operators import audio_tagging as AT
from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav


def _w(word, start, end):
    return {"word": word, "start": start, "end": end}


def test_align_words_to_segments_reference_example():
    alignment = [_w("Hello", 0.0, 1.0), _w("there", 1.0, 3.0)]
    segments = [{"speaker": "speaker1", "start": 0.0, "end": 3.0}]
    AT.align_words_to_segments(alignment, segments)
    assert segments[0]["text"] == "Hello there"
    assert [w["word"] for w in segments[0]["words"]] == ["Hello", "there"]


def test_align_words_boundary_and_gap_semantics():
    segments = [
        {"start": 0.0, "end": 2.0},
        {"start": 3.0, "end": 5.0},
    ]
    alignment = [
        _w("in1", 0.0, 1.0),        # contained in seg 0
        _w("straddle", 1.5, 3.5),   # overlaps seg0 by 0.5, seg1 by 0.5 -> tie keeps current
        _w("gap", 2.1, 2.9),        # entirely between segments -> skipped
        _w("lean2", 2.9, 4.5),      # overlaps seg0 by 0 (starts after end)... belongs to seg1
        _w("in2", 4.5, 5.0),
    ]
    AT.align_words_to_segments(alignment, segments)
    assert segments[0]["text"] == "in1 straddle"
    assert segments[1]["text"] == "lean2 in2"


def test_align_words_prefers_bigger_next_overlap():
    segments = [{"start": 0.0, "end": 2.0}, {"start": 2.0, "end": 6.0}]
    alignment = [_w("mostly2", 1.9, 4.0)]  # 0.1 in seg0, 2.0 in seg1
    AT.align_words_to_segments(alignment, segments)
    assert segments[0]["text"] == ""
    assert segments[1]["text"] == "mostly2"


def test_get_split_points_natural_pauses():
    segments = [
        {"start": 0, "end": 10}, {"start": 12, "end": 25},
        {"start": 26, "end": 33}, {"start": 35, "end": 50},
    ]
    # span since split_start exceeds 30 at segment (26,33): cut at prev_end 25
    assert AT.get_split_points(segments, 30.0) == [25]
    assert AT.get_split_points(segments, 100.0) == []
    assert AT.get_split_points([], 10.0) == []


def test_split_long_wav_real_pieces_and_fallback():
    sr = 1000
    samples = np.arange(50_000, dtype=np.int16)  # 50 s
    wav = encode_wav(samples, sr)
    segments = [
        {"start": 0, "end": 10}, {"start": 12, "end": 25},
        {"start": 26, "end": 33}, {"start": 35, "end": 50},
    ]
    pieces, offsets, durations, ts = AT.split_long_wav(wav, segments, 30.0)
    assert ts == [25]
    assert offsets == [0.0, 25.0]
    assert durations == [25.0, 25.0]
    # byte-real: pieces re-decode to the exact sample ranges
    _, _, p0 = decode_wav(pieces[0])
    _, _, p1 = decode_wav(pieces[1])
    assert np.array_equal(p0, samples[:25_000])
    assert np.array_equal(p1, samples[25_000:])
    # short audio: single passthrough piece
    short = encode_wav(samples[:5_000], sr)
    pieces, offsets, durations, ts = AT.split_long_wav(short, segments, 30.0)
    assert pieces == [short] and offsets == [0.0] and durations == [5.0]


def test_join_split_metadata_offsets():
    entries = [
        {"text": "part one", "alignment": [_w("one", 0.5, 1.0)]},
        {"text": "part two", "alignment": [_w("two", 0.25, 0.75)]},
        {"text": "", "alignment": []},
    ]
    text, alignment = AT.join_split_metadata(entries, [0.0, 25.0, 50.0])
    assert text == "part one part two"
    assert alignment == [
        {"word": "one", "start": 0.5, "end": 1.0},
        {"word": "two", "start": 25.25, "end": 25.75},
    ]
    # roundtrip with the splitter's offsets: join(split(x)) restores
    # absolute timestamps (0.25+25.0 rounds exactly)
    assert alignment[1]["start"] == pytest.approx(25.25)


def test_spark_merge_and_split(spark):
    sr = 1000
    wav = encode_wav(np.arange(50_000, dtype=np.int16), sr)
    segments = [
        {"start": 0, "end": 10}, {"start": 12, "end": 25},
        {"start": 26, "end": 33}, {"start": 35, "end": 50},
    ]
    alignment = [_w("hello", 0.2, 0.8), _w("world", 12.5, 13.0)]
    df = spark.createDataFrame(
        [(1, wav, json.dumps(segments), json.dumps(alignment))],
        "file_id long, wav binary, segments string, alignment string",
    )
    merged = AT.merge_alignment_diarization(df).collect()[0]
    segs = json.loads(merged["segments"])
    assert segs[0]["text"] == "hello"
    assert segs[1]["text"] == "world"

    out = (
        AT.split_long_audio(df, suggested_max_len=30.0)
        .orderBy("split_idx")
        .toPandas()
    )
    assert out.split_idx.tolist() == [0, 1]
    assert out.offset_sec.tolist() == [0.0, 25.0]
    assert out.n_splits.tolist() == [2, 2]
    _, _, p0 = decode_wav(bytes(out.wav[0]))
    assert len(p0) == 25_000


def test_split_long_wav_stereo_paths_are_mono():
    # review finding: channel layout must not depend on duration
    sr = 1000
    stereo = np.stack(
        [np.arange(5_000, dtype=np.int16),
         np.arange(5_000, dtype=np.int16) * 2]
    ).T
    short = encode_wav(stereo, sr)
    pieces, offsets, durations, _ = AT.split_long_wav(short, [], 30.0)
    ch, _, mono = decode_wav(pieces[0])
    assert ch == 1
    want = np.rint(stereo.astype(np.float64).mean(axis=1)).astype(np.int16)
    assert np.array_equal(mono, want)
    # mono short input still passes through byte-identical
    mono_wav = encode_wav(np.arange(5_000, dtype=np.int16), sr)
    pieces, _, _, _ = AT.split_long_wav(mono_wav, [], 30.0)
    assert pieces == [mono_wav]


# --- prepare module segments -------------------------------------------------


def _word_run(words, t0=0.0, dt=0.5, speaker="spk1", gap=0.0):
    out = []
    t = t0
    for w in words:
        out.append({"word": w, "start": t, "end": t + dt, "speaker": speaker})
        t += dt + gap
    return out


def test_prepare_module_validation():
    with pytest.raises(ValueError, match="tts.*asr|asr|tts"):
        AT.PrepareModuleSegments(module="nope")


def test_prepare_tts_segments_speaker_runs_and_punct():
    prep = AT.PrepareModuleSegments(
        module="tts", min_duration=1.0, max_duration=10.0
    )
    meta = {
        "duration": 20.0,
        "segments": [
            {"speaker": "A", "start": 0.0, "end": 6.0},
            {"speaker": "B", "start": 6.0, "end": 12.0},
        ],
        "alignment": (
            _word_run(["one", "two", "three."], 0.0)
            + _word_run(["four", "five."], 2.0)
            + _word_run(["bee", "says", "hi."], 6.5)
        ),
    }
    out = prep.process_entry(meta, "entry1")
    segs = out["segments"]
    # single-speaker segments; punctuation splits inside A's run
    assert [s["speaker"] for s in segs] == ["A", "A", "B"]
    assert segs[0]["text"] == "one two three."
    assert segs[1]["text"] == "four five."
    assert segs[2]["text"] == "bee says hi."
    # words carry only word/start/end; metrics lists align with words
    assert set(segs[0]["words"][0]) == {"word", "start", "end"}
    assert len(segs[0]["metrics"]["bandwidth"]) == 3


def test_prepare_asr_segments_multi_speaker_and_determinism():
    prep = AT.PrepareModuleSegments(
        module="asr", min_duration=1.0, max_duration=5.0
    )
    meta_fn = lambda: {  # noqa: E731
        "duration": 30.0,
        "segments": [
            {"speaker": "A", "start": 0.0, "end": 10.0},
            {"speaker": "B", "start": 10.0, "end": 20.0},
        ],
        "alignment": _word_run(
            [f"w{i}" for i in range(18)] + ["end."], 0.0, dt=1.0, speaker="A"
        ),
    }
    a = prep.process_entry(meta_fn(), "e1")
    b = prep.process_entry(meta_fn(), "e1")
    assert a == b  # md5-seeded RNG: reruns identical
    c = AT.PrepareModuleSegments(
        module="asr", min_duration=1.0, max_duration=5.0
    ).process_entry(meta_fn(), "e1")
    assert a == c  # fresh instance too
    # ASR allows multi-speaker labels (comma-joined uniques)
    for s in a["segments"]:
        assert s["speaker"]  # non-empty


def test_punctuation_short_group_merges_forward():
    prep = AT.PrepareModuleSegments(
        module="tts", min_duration=3.0, max_duration=10.0,
        punctuation_split_only=True,
    )
    seg = {
        "speaker": "A", "start": 0.0, "end": 6.0,
        "words": _word_run(["a.", "b", "c.", "d", "e."], 0.0, dt=1.0),
    }
    out = prep.split_segment_by_punctuation(seg)
    # 'a.' group alone is 1s < min 3s -> the reference merges forward to
    # the FARTHEST punctuation point still within max_duration ('e.')
    assert len(out) == 1
    assert out[0]["words"][0]["word"] == "a."
    assert out[0]["words"][-1]["word"] == "e."
    # with a tight max_duration the merge stops at 'c.'
    tight = AT.PrepareModuleSegments(
        module="tts", min_duration=2.5, max_duration=3.0,
        punctuation_split_only=True,
    )
    out = tight.split_segment_by_punctuation(dict(seg))
    assert out[0]["words"][-1]["word"] == "c."


def test_prepare_module_segments_spark(spark):
    meta = {
        "duration": 10.0,
        "segments": [{"speaker": "A", "start": 0.0, "end": 5.0}],
        "alignment": _word_run(["hello", "world."], 0.0),
    }
    df = spark.createDataFrame(
        [(1, json.dumps(meta)), (2, json.dumps(meta))],
        "file_id long, metadata string",
    )
    out = AT.prepare_module_segments(
        df, module="tts", min_duration=0.5, max_duration=10.0
    ).orderBy("file_id").toPandas()
    m1 = json.loads(out.metadata[0])
    assert m1["segments"][0]["text"] == "hello world."
    # repartition determinism (per-entry seeding)
    out2 = AT.prepare_module_segments(
        df.repartition(2, "file_id"), module="tts",
        min_duration=0.5, max_duration=10.0,
    ).orderBy("file_id").toPandas()
    assert out.metadata.tolist() == out2.metadata.tolist()

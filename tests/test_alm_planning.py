"""ALM pretrain planning pins (reference planning.py pure helpers +
the fused Spark per-file plan)."""

from __future__ import annotations

import pytest

from nemo_curator_spark.operators import alm_planning as P


def _seg(start, end, text="x", words=None):
    d = {"start": start, "end": end, "text": text}
    if words is not None:
        d["words"] = words
    return d


def test_filter_empty_segments():
    segs = [
        _seg(0, 1, "hello"),
        _seg(1, 2, "  "),  # blank text, no words -> dropped
        _seg(2, 3, "", words=[{"start": 2, "end": 3}]),  # words keep it
        _seg(3, 4, None),
    ]
    kept, dropped = P.filter_empty_segments(segs)
    assert dropped == 2
    assert [s["start"] for s in kept] == [0, 2]


def test_find_overlapping_indices_semantics():
    segs = [
        _seg(0.0, 1.0),    # overlaps 1 by 0.5
        _seg(0.5, 1.5),
        _seg(2.0, 4.0),    # contains 3
        _seg(2.5, 3.0),
        _seg(5.0, 6.0),    # clean
        _seg(5.95, 7.0),   # 0.05 touch-up < min_overlap, no containment
    ]
    bad = P.find_overlapping_indices(segs, min_overlap_sec=0.1)
    assert bad == {0, 1, 2, 3}
    # containment flags both even when the intersection is tiny
    segs2 = [_seg(0.0, 10.0), _seg(4.0, 4.01)]
    assert P.find_overlapping_indices(segs2, min_overlap_sec=1.0) == {0, 1}
    assert P.find_overlapping_indices([_seg(0, 1)], 0.1) == set()


def test_plan_snippets_constraints_and_drops():
    segs = [
        _seg(0, 4, "a"), _seg(5, 9, "b"),       # gap 1 -> same snippet (0-9)
        _seg(20, 24, "c"),                      # gap 11 -> new snippet, 4s -> too_short
        _seg(30, 70, "d"),                      # single 40s -> too_long
        _seg(80, 86, "  "),                     # 6s but blank -> no_text
        _seg(100, 107, "e"),
    ]
    snippets, drops = P.plan_snippets(
        segs, max_duration_sec=30.0, min_duration_sec=5.0,
        max_segment_gap_in_snippet=2.0,
    )
    assert drops == {"too_long": 1, "too_short": 1, "no_text": 1}
    assert [(s["start"], s["end"]) for s in snippets] == [(0, 9), (100, 107)]
    assert len(snippets[0]["segments"]) == 2


def test_plan_snippets_duration_closes_snippet():
    # span constraint: third segment would stretch span past max
    segs = [_seg(0, 10, "a"), _seg(11, 20, "b"), _seg(21, 32, "c")]
    snippets, drops = P.plan_snippets(segs, 30.0, 5.0, 5.0)
    assert [(s["start"], s["end"]) for s in snippets] == [(0, 20), (21, 32)]


def test_relativize_clamps_jitter():
    segs = [
        _seg(9.99, 12.0, "a", words=[{"start": 9.98, "end": 12.02, "w": "a"}]),
        _seg(12.0, 20.01, "b"),
    ]
    rel = P.relativize_segments(segs, 10.0, 20.0)
    assert rel[0]["start"] == 0.0  # clamped up
    assert rel[0]["words"][0]["start"] == 0.0
    assert rel[0]["words"][0]["end"] == pytest.approx(2.02)
    assert rel[0]["words"][0]["w"] == "a"
    assert rel[1]["end"] == 10.0  # clamped down to duration
    # input untouched (copies)
    assert segs[0]["start"] == 9.99


def test_repetition_filter():
    tok = lambda t: [ord(c) for c in t]  # noqa: E731
    assert P.snippet_is_repetitive("ababababab", tok, ngram_n=2, ngram_max_count=3)
    assert not P.snippet_is_repetitive("abcdefgh", tok, ngram_n=2, ngram_max_count=3)
    assert not P.snippet_is_repetitive("ab", tok, ngram_n=10)  # too short: kept
    with pytest.raises(ValueError):
        P.snippet_is_repetitive("x", tok, ngram_n=0)
    with pytest.raises(ValueError):
        P.snippet_is_repetitive("x", tok, ngram_max_count=0)
    assert P.merge_char_ranges([(5, 8), (0, 3), (2, 6)]) == [(0, 8)]
    assert P.merge_char_ranges([(0, 1), (2, 3)]) == [(0, 1), (2, 3)]


def test_spark_plan_end_to_end(spark):
    rows = []
    # file 1: two packable segments + an overlapping pair + a repetitive tail
    rows += [
        (1, 0.0, 4.0, "clean one"),
        (1, 5.0, 9.0, "clean two"),
        (1, 20.0, 25.0, "overlap a"),
        (1, 22.0, 27.0, "overlap b"),
        (1, 40.0, 47.0, "spam " * 20),
    ]
    # file 2: one good snippet
    rows += [(2, 0.0, 3.0, "hello"), (2, 3.5, 7.0, "world")]
    df = spark.createDataFrame(rows, "file_id long, start double, end double, text string")
    tok = lambda t: [ord(c) for c in t]  # noqa: E731
    out = (
        P.alm_snippet_plan(
            df, min_duration_sec=5.0, max_segment_gap_in_snippet=2.0,
            tokenize=tok, ngram_n=4, ngram_max_count=3,
        )
        .orderBy("file_id", "snippet_idx", "seg_pos")
        .toPandas()
    )
    f1 = out[out.file_id == 1]
    # the overlapping pair is gone, the repetitive snippet filtered:
    # only the packed (0, 9) snippet survives for file 1
    assert f1.snippet_idx.nunique() == 1
    assert f1.seg_text.tolist() == ["clean one", "clean two"]
    assert f1.seg_start_rel.tolist() == [0.0, 5.0]
    f2 = out[out.file_id == 2]
    assert f2.snip_start.tolist() == [0.0, 0.0]
    assert f2.snip_end.tolist() == [7.0, 7.0]
    assert f2.seg_end_rel.tolist() == [3.0, 7.0]


def test_overlap_ratio_and_window_filter():
    # (end, start) tuples; 50% overlap of the smaller window
    a = (10.0, 0.0)
    b = (15.0, 5.0)
    assert P.overlap_ratio(a, b) == pytest.approx(0.5)
    assert P.overlap_ratio((1.0, 0.0), (5.0, 3.0)) == 0.0

    # target-duration preference: keep the window closer to target
    wins = [(10.0, 0.0), (9.0, 1.0)]  # durations 10 and 8, heavy overlap
    kept = P.filter_overlapping_windows(wins, threshold=0.5, target_duration=8.0)
    assert kept == [(9.0, 1.0)]
    kept = P.filter_overlapping_windows(wins, threshold=0.5, target_duration=10.0)
    assert kept == [(10.0, 0.0)]
    # equal diff -> longer wins
    wins = [(10.0, 0.0), (9.0, 1.0)]
    kept = P.filter_overlapping_windows(wins, threshold=0.5, target_duration=9.0)
    assert kept == [(10.0, 0.0)]
    # disjoint windows untouched
    wins = [(5.0, 0.0), (12.0, 6.0)]
    assert sorted(P.filter_overlapping_windows(wins, 0.1, 30.0)) == sorted(wins)


def test_alm_window_overlap_filter_spark(spark):
    rows = [
        (1, 0.0, 10.0),   # overlaps the next heavily
        (1, 1.0, 9.0),    # duration 8, closer to target 8 -> kept
        (1, 20.0, 28.0),  # clean
        (2, 0.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "file_id long, win_start double, win_end double")
    out = (
        P.alm_window_overlap_filter(df, threshold=0.5, target_duration=8.0)
        .orderBy("file_id", "win_start")
        .toPandas()
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        (1, 1.0, 9.0), (1, 20.0, 28.0), (2, 0.0, 5.0),
    ]


def test_make_snippet_id_sanitization():
    assert P.make_snippet_id("utt1", 11.708, 13.97) == "utt1-11_708-13_970"
    # dots and path separators sanitized (WebDataset first-dot grouping)
    assert P.make_snippet_id("shard1/meeting.wav", 0.0, 1.5) == (
        "shard1_meeting_wav-0_000-1_500"
    )
    assert "." not in P.make_snippet_id("a.b\\c/d", 0.123, 4.567)


def test_histogram_30s_dense_bins():
    assert P.histogram_30s([]) == {}
    assert P.histogram_30s([30.0]) == {"0-30": 0, "30-60": 1}
    assert P.histogram_30s([5.0, 29.9, 65.0]) == {
        "0-30": 2, "30-60": 0, "60-90": 1,
    }


def test_extract_snippet_wav_frame_math():
    import numpy as np

    from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav

    sr = 1000
    samples = np.arange(10_000, dtype=np.int16)
    wav = encode_wav(samples, sr)
    out = P.extract_snippet_wav(wav, 1.25, 2.5)
    assert out is not None
    blob, dur = out
    _, _, cut = decode_wav(blob)
    assert np.array_equal(cut, samples[1250:2500])  # floor/ceil exact
    assert dur == 1.25
    # clamped at file end, empty range skipped
    assert P.extract_snippet_wav(wav, 9.9995, 60.0) is not None
    assert P.extract_snippet_wav(wav, 5.0, 5.0) is None
    with pytest.raises(NotImplementedError, match="resample"):
        P.extract_snippet_wav(wav, 0.0, 1.0, target_sample_rate=16000)
    # injected resampler is honored (here: 2x decimation)
    blob, dur = P.extract_snippet_wav(
        wav, 0.0, 2.0, target_sample_rate=500,
        resample=lambda s, a, b: s[:: a // b],
    )
    _, out_sr, cut = decode_wav(blob)
    assert out_sr == 500 and len(cut) == 1000 and dur == 2.0


def test_alm_plan_then_extract_spark(spark):
    import numpy as np

    from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav

    sr = 1000
    wav = encode_wav(np.arange(40_000, dtype=np.int16), sr)
    segs = [
        (1, 0.0, 4.0, "one"), (1, 5.0, 9.0, "two"),
        (1, 20.0, 27.0, "three"),
    ]
    seg_df = spark.createDataFrame(
        segs, "file_id long, start double, end double, text string"
    )
    audio_df = spark.createDataFrame([(1, wav)], "file_id long, wav binary")
    plan = P.alm_snippet_plan(
        seg_df, min_duration_sec=5.0, max_segment_gap_in_snippet=2.0
    )
    out = (
        P.alm_extract_snippets(audio_df, plan)
        .orderBy("snippet_idx")
        .toPandas()
    )
    # two snippets: (0, 9) and (20, 27)
    assert out.snippet_id.tolist() == ["1-0_000-9_000", "1-20_000-27_000"]
    assert out.duration_sec.tolist() == [9.0, 7.0]
    _, _, cut = decode_wav(bytes(out.wav[1]))
    assert len(cut) == 7000 and cut[0] == 20_000


def test_window_overlap_filter_exact_duplicates(spark):
    # review finding: exact duplicates must not both survive via the
    # set-membership mask
    wins = [(10.0, 0.0), (10.0, 0.0)]
    assert P.filter_overlapping_windows(wins, 0.5, 30.0) == [(10.0, 0.0)]
    df = spark.createDataFrame(
        [(1, 0.0, 10.0), (1, 0.0, 10.0)],
        "file_id long, win_start double, win_end double",
    )
    out = P.alm_window_overlap_filter(df, threshold=0.5).toPandas()
    assert len(out) == 1


# --- ALM data builder --------------------------------------------------------


def _bseg(start, end, speaker="A", bw=16000, words=None):
    s = {"start": start, "end": end, "speaker": speaker,
         "metrics": {"bandwidth": bw},
         "text": " ".join(w["word"] for w in words) if words else "t"}
    if words is not None:
        s["words"] = words
    return s


def test_alm_builder_happy_window():
    entry = {
        "audio_filepath": "a.wav", "audio_sample_rate": 16000,
        "segments": [
            _bseg(0, 50, "A"), _bseg(50, 110, "B"),
        ],
    }
    out = P.build_alm_windows(entry, target_window_duration=120.0)
    # one window spanning both speakers, within 108-132s tolerance band
    assert len(out["windows"]) == 1
    w = out["windows"][0]
    assert len(w["segments"]) == 2
    assert w["speaker_durations"][:2] == [60.0, 50.0]
    assert w["speaker_durations"][2:] == [0.0, 0.0, 0.0]
    # drop_fields: 'words' stripped, 'segments' dropped top-level
    assert "segments" not in out or out["segments"] == entry["segments"]
    assert out["truncation_events"] == 0
    assert out["stats"]["total_segments"] == 2


def test_alm_builder_sample_rate_gate():
    entry = {
        "audio_filepath": "a.wav", "audio_sample_rate": 8000,
        "segments": [_bseg(0, 60), _bseg(60, 120, "B")],
    }
    out = P.build_alm_windows(entry)
    assert out["windows"] == []
    assert out["stats"]["lost_sr"] == 2
    assert out["stats"]["dur_lost_sr"] == 120.0


def test_alm_builder_bandwidth_and_speaker_gates():
    entry = {
        "audio_filepath": "a.wav", "audio_sample_rate": 16000,
        "segments": [
            _bseg(0, 60, "A", bw=4000),         # low bandwidth: skipped start
            _bseg(0, 115, "A"),                 # single speaker window ->
            _bseg(115, 118, "A"),               # lost_spk (min_speakers=2)
        ],
    }
    out = P.build_alm_windows(entry)
    assert out["windows"] == []
    assert out["stats"]["lost_bw"] == 1
    assert out["stats"]["lost_spk"] >= 1


def test_alm_builder_truncation():
    words = [
        {"word": f"w{i}", "start": 100 + i * 10, "end": 105 + i * 10}
        for i in range(10)
    ]
    entry = {
        "audio_filepath": "a.wav", "audio_sample_rate": 16000,
        "segments": [
            _bseg(0, 60, "A"), _bseg(60, 100, "B"),
            _bseg(100, 200, "A", words=words),
        ],
    }
    out = P.build_alm_windows(entry, target_window_duration=120.0)
    assert out["truncation_events"] >= 1
    w = out["windows"][0]
    # truncated tail segment: end rebuilt from last kept word <= 132
    assert w["segments"][-1]["end"] <= 132.0
    assert "words" not in w["segments"][-1]  # drop_fields applied


def test_alm_builder_spark(spark):
    import json as _json

    entry = {
        "audio_filepath": "a.wav", "audio_sample_rate": 16000,
        "segments": [_bseg(0, 50, "A"), _bseg(50, 110, "B")],
    }
    df = spark.createDataFrame(
        [(1, _json.dumps(entry))], "file_id long, entry string"
    )
    out = P.alm_data_builder(df).collect()[0]
    parsed = _json.loads(out["entry"])
    assert len(parsed["windows"]) == 1

"""Tests for the ASR aligner deterministic half (operators/asr_align.py)
— reference stages/audio/tagging/inference/nemo_asr_align.py.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from nemo_curator_spark.operators import asr_align as A
from nemo_curator_spark.operators.multimodal import encode_wav


def _hyp(words, confs=None, text=""):
    return {
        "text": text,
        "timestamp": {
            "word": [
                {"word": w, "start_offset": s, "end_offset": e}
                for w, s, e in words
            ]
        },
        "word_confidence": confs,
    }


def test_alignment_extraction_stride_math():
    hyp = _hyp([("hello", 10, 20), ("world", 30, 40)], confs=[0.123456, 0.9])
    # fastconformer rnnt: stride 8*0.01=0.08; start = off*0.08 - 0.08
    al, text = A.get_alignments_text(hyp, decoder_type="rnnt")
    assert text == "hello world"
    assert al[0] == {
        "word": "hello", "start": 0.72, "end": 1.52, "confidence": 0.1235,
    }
    assert al[1]["start"] == 2.32
    # ctc: no -0.08 shift
    al, _ = A.get_alignments_text(hyp, decoder_type="ctc")
    assert al[0]["start"] == 0.8 and al[0]["end"] == 1.6
    # conformer (4x), rnnt clamp at 0
    al, _ = A.get_alignments_text(
        hyp, is_fastconformer=False, decoder_type="rnnt"
    )
    assert al[0]["start"] == round(10 * 0.04 - 0.08, 3) == 0.32
    al, _ = A.get_alignments_text(
        _hyp([("x", 0, 1)]), decoder_type="rnnt"
    )
    assert al[0]["start"] == 0  # max(0, -0.08)
    # char-type stamps fall back to "char"; unknown-token scrub
    hyp2 = {
        "text": "",
        "timestamp": {"word": [
            {"char": "a", "start_offset": 0, "end_offset": 1},
            {"word": "⁇", "start_offset": 2, "end_offset": 3},
        ]},
        "word_confidence": None,
    }
    al, text = A.get_alignments_text(hyp2)
    assert al[0]["word"] == "a" and al[0]["confidence"] is None
    assert text == "a "  # join then scrub, reference order
    # timestamps off: raw text passthrough
    assert A.get_alignments_text(
        {"text": "raw"}, compute_timestamps=False
    ) == ([], "raw")


def test_prepare_segment_batch(tmp_path):
    sr = 1000
    p = tmp_path / "a.wav"
    p.write_bytes(encode_wav(np.arange(10_000, dtype=np.int16), sr))
    entries = [
        {
            "resampled_audio_filepath": str(p),
            "segments": [
                {"start": 1.0, "end": 3.0},     # kept
                {"start": 4.0, "end": 4.5},     # < min_len
                {"start": 9.999, "end": 12.0},  # cut clamps, 1 sample
            ],
        },
        {"segments": [{"start": 0.0, "end": 5.0}]},  # no path -> skipped
    ]
    out = A.prepare_segment_batch_with_metadata(
        entries, min_len=1.0, cut_audio_segments=True
    )
    assert [(s["metadata_idx"], s["segment_idx"]) for s in out] == [
        (0, 0), (0, 2),
    ]
    assert len(out[0]["audio_segment"]) == 2000
    assert out[0]["audio_segment"][0] == 1000
    # path-collection mode: only segments carrying a resampled path
    entries2 = [
        {"segments": [
            {"resampled_audio_filepath": "x.wav"}, {"start": 0, "end": 1},
        ]}
    ]
    out2 = A.prepare_segment_batch_with_metadata(entries2)
    assert out2 == [
        {
            "resampled_audio_filepath": "x.wav",
            "metadata_idx": 0,
            "segment_idx": 0,
        }
    ]


def test_full_audio_routing_and_scatter():
    calls = []

    def transcribe(paths):
        calls.append(list(paths))
        return [
            _hyp([(f"w{i}", 10, 20)], confs=[0.5]) for i in range(len(paths))
        ]

    stage = A.ASRAlignerStage(transcribe)
    entries = [
        {"split_filepaths": [], "x": 1},                     # pre-skipped
        {
            "split_filepaths": ["p0", "p1"],
            "split_metadata": [{"offset": 0.0}, {"offset": 30.0}],
        },
        {"id": "whole"},                                     # no key -> meta
    ]
    out = stage.process_batch(entries)
    assert out[0]["text"] == "" and out[0]["alignment"] == []
    # one batched call over the split paths only (entry 2 has none)
    assert calls == [["p0", "p1"]]
    assert out[1]["split_metadata"][0]["text"] == "w0"
    assert out[1]["split_metadata"][1]["text"] == "w1"
    assert out[1]["split_metadata"][1]["alignment"][0]["start"] == 0.72
    # entry without split_filepaths contributes no paths and is untouched
    assert "text" not in out[2]


def test_full_audio_batch_failure_retries_per_path():
    state = {"batch": 0}

    def transcribe(paths):
        if len(paths) > 1:
            state["batch"] += 1
            raise RuntimeError("OOM")
        if paths[0] == "bad":
            raise RuntimeError("decode error")
        return [_hyp([("ok", 10, 20)])]

    stage = A.ASRAlignerStage(transcribe)
    entries = [{"split_filepaths": ["good", "bad"],
                "split_metadata": [{}, {}]}]
    out = stage.process_batch(entries)
    assert state["batch"] == 1
    assert out[0]["split_metadata"][0]["text"] == "ok"
    assert out[0]["split_metadata"][1]["text"] == ""
    assert out[0]["split_metadata"][1]["alignment"] == []


def test_segment_mode_absolute_offsets(tmp_path):
    sr = 1000
    p = tmp_path / "s.wav"
    p.write_bytes(encode_wav(np.arange(8000, dtype=np.int16), sr))

    def transcribe(segments):
        assert all(isinstance(s, np.ndarray) for s in segments)
        return [_hyp([("seg", 10, 20)], confs=[1.0]) for _ in segments]

    stage = A.ASRAlignerStage(transcribe, infer_segment_only=True)
    entries = [{
        "resampled_audio_filepath": str(p),
        "segments": [{"start": 2.0, "end": 5.0}, {"start": 6.0, "end": 6.2}],
    }]
    out = stage.process_batch(entries)
    seg = out[0]["segments"][0]
    assert seg["text"] == "seg"
    # word times shifted by the segment start (0.72 + 2.0)
    assert seg["words"][0]["start"] == 2.72
    # sub-min_len segment untouched
    assert "text" not in out[0]["segments"][1]
    # hypothesis-count mismatch raises
    stage2 = A.ASRAlignerStage(lambda s: [], infer_segment_only=True)
    with pytest.raises(ValueError, match="hypotheses"):
        stage2.process_batch([{
            "resampled_audio_filepath": str(p),
            "segments": [{"start": 0.0, "end": 2.0}],
        }])
    # batch failure raises ValueError naming the files
    def boom(_):
        raise RuntimeError("gpu gone")

    stage3 = A.ASRAlignerStage(boom, infer_segment_only=True)
    with pytest.raises(ValueError, match="s.wav"):
        stage3.process_batch([{
            "resampled_audio_filepath": str(p),
            "segments": [{"start": 0.0, "end": 2.0}],
        }])


def test_stage_contracts():
    with pytest.raises(ValueError, match="decoder_type"):
        A.ASRAlignerStage(decoder_type="greedy")
    with pytest.raises(NotImplementedError, match="transcribe"):
        A.ASRAlignerStage().process_batch([{"split_filepaths": ["p"]}])
    s = A.ASRAlignerStage(infer_segment_only=True)
    assert s.inputs() == (
        ["data"], ["resampled_audio_filepath", "segments"],
    )
    s2 = A.ASRAlignerStage()
    assert s2.inputs()[1] == [
        "duration", "segments", "split_filepaths", "split_metadata",
    ]
    assert s2.outputs() == s2.inputs()
    assert A.ASRAlignerStage().process_batch([]) == []


def test_spark_manifest_form(spark):
    def transcribe(paths):
        return [_hyp([(f"t{p[-1]}", 10, 20)]) for p in paths]

    stage = A.ASRAlignerStage(transcribe)
    entries = [
        {"split_filepaths": ["a1"], "split_metadata": [{}]},
        {"split_filepaths": [], "id": "skip"},
    ]
    df = spark.createDataFrame(
        [(json.dumps(e),) for e in entries], "entry string"
    )
    out = [
        json.loads(r.entry)
        for r in A.asr_align_manifest(df, stage).collect()
    ]
    by_kind = {("id" in e): e for e in out}
    assert by_kind[False]["split_metadata"][0]["text"] == "t1"
    assert by_kind[True]["text"] == ""

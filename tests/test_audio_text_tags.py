"""Chinese conversion / ITN / resample / audio-to-document stages —
reference tagging/text/*, tagging/resample_audio.py, audio/io/convert.py
deterministic contracts."""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pytest

from nemo_curator_spark.operators import audio_text_tags as ATT
from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav


def test_chinese_conversion_contract():
    st = ATT.ChineseConversionStage(converter=lambda t: t.upper())
    entry = {"segments": [{"text": "abc"}, {"no_text": 1}]}
    out = st.process_entry(entry)
    # output key {text_key}_simplified; segments without text untouched
    assert out["segments"][0]["text_simplified"] == "ABC"
    assert "text_simplified" not in out["segments"][1]

    def boom(t):
        raise RuntimeError("opencc died")

    # failure keeps the original (chinese_conversion.py:66-71)
    out = ATT.ChineseConversionStage(converter=boom).process_entry(
        {"segments": [{"text": "orig"}]}
    )
    assert out["segments"][0]["text_simplified"] == "orig"
    with pytest.raises(NotImplementedError, match="OpenCC"):
        ATT.ChineseConversionStage().process_entry({"segments": []})


def test_itn_contract():
    class Norm:
        def split_text_into_sentences(self, text):
            return text.split(". ")

        def normalize_list(self, sentences):
            return [s.replace("forty two", "42") for s in sentences]

    st = ATT.InverseTextNormalizationStage(normalizer=Norm())
    out = st.process_entry(
        {"segments": [{"text": "it is forty two. yes"}, {"text": ""}]}
    )
    assert out["segments"][0]["text_ITN"] == "it is 42 yes"
    # empty text skipped (itn.py:71-77)
    assert "text_ITN" not in out["segments"][1]
    with pytest.raises(NotImplementedError):
        ATT.InverseTextNormalizationStage().process_entry({"segments": []})


def test_audio_item_id_naming():
    # resample_audio.py:105-108 exact recipe
    path = "/data/x/clip.wav"
    expected = "clip_" + hashlib.sha256(path.encode()).hexdigest()[:8]
    assert ATT.audio_item_id(path) == expected


def test_linear_resample():
    y = np.arange(0, 1000, dtype=np.int16)
    up = ATT.linear_resample(y, 8000, 16000)
    assert len(up) == 2000
    down = ATT.linear_resample(y, 16000, 8000)
    assert len(down) == 500
    same = ATT.linear_resample(y, 16000, 16000)
    np.testing.assert_array_equal(same, y)


def test_resample_stage(tmp_path):
    sr = 8000
    samples = (np.sin(np.arange(sr) / 5.0) * 10000).astype(np.int16)
    src = tmp_path / "in.wav"
    src.write_bytes(encode_wav(samples, sr))
    out_dir = tmp_path / "resampled"
    st = ATT.ResampleAudioStage(
        resampled_audio_dir=str(out_dir), target_sample_rate=16000
    )
    entry = st.process_entry({"audio_filepath": str(src)})
    rid = ATT.audio_item_id(str(src))
    assert entry["audio_item_id"] == rid
    assert entry["resampled_audio_filepath"].endswith(f"{rid}.wav")
    ch, sr2, out = decode_wav(
        open(entry["resampled_audio_filepath"], "rb").read()
    )
    assert sr2 == 16000 and len(out) == 2 * sr
    assert entry["duration"] == pytest.approx(1.0)
    # skip-if-exists: a second run does not rewrite (retry-safe)
    import os

    mtime = os.stat(entry["resampled_audio_filepath"]).st_mtime_ns
    st.process_entry({"audio_filepath": str(src)})
    assert os.stat(entry["resampled_audio_filepath"]).st_mtime_ns == mtime
    with pytest.raises(ValueError, match="filepath is required"):
        st.process_entry({})


def test_sanitize_and_dataframe():
    entry = {
        "audio_filepath": "/a.wav",
        "duration": 1.5,
        "waveform": np.zeros(4),
        "segments": [{"x": 1}],
        "audio_array": [1, 2],
        "feature": np.ones(3),  # stray array value also dropped
    }
    clean = ATT.sanitize_audio_entry(entry)
    assert set(clean) == {"audio_filepath", "duration"}
    df = ATT.audio_entries_to_dataframe([entry, {"audio_filepath": "/b.wav"}])
    assert list(df.columns) == ["audio_filepath", "duration"]
    assert len(df) == 2


def test_audio_to_documents_spark(spark):
    entries = [
        json.dumps(
            {"audio_filepath": f"/f{i}.wav", "duration": i * 1.0, "text": f"t{i}"}
        )
        for i in range(3)
    ]
    df = spark.createDataFrame([(e,) for e in entries], ["entry"])
    out = ATT.audio_to_documents(df).orderBy("audio_filepath").collect()
    assert [r["text"] for r in out] == ["t0", "t1", "t2"]
    with pytest.raises(ValueError, match="non-serializable"):
        ATT.audio_to_documents(df, fields=["waveform"])


def test_resample_multichannel_target_is_plug_point(tmp_path):
    # stereo -> stereo needs ffmpeg; the stdlib default refuses loudly
    # instead of resampling across interleaved channels
    sr = 8000
    stereo = np.zeros(2 * sr, dtype=np.int16)  # interleaved 2ch payload
    import struct

    # hand-build a 2-channel WAV header around the interleaved payload
    data = stereo.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    src = tmp_path / "st.wav"
    src.write_bytes(hdr + data)
    st = ATT.ResampleAudioStage(
        resampled_audio_dir=str(tmp_path / "o"), target_nchannels=2
    )
    with pytest.raises(NotImplementedError, match="multichannel"):
        st.process_entry({"audio_filepath": str(src)})
    # stereo -> mono works via the real downmix path
    st_mono = ATT.ResampleAudioStage(
        resampled_audio_dir=str(tmp_path / "o2"), target_nchannels=1,
        target_sample_rate=sr,
    )
    entry = st_mono.process_entry({"audio_filepath": str(src)})
    assert entry["duration"] == pytest.approx(1.0)

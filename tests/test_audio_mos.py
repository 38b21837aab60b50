"""SIGMOS / UTMOS filters — reference stages/audio/filtering/
{sigmos,utmos}.py deterministic contract (score extraction, threshold
gating, annotation, nested-segments mode)."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import audio_mos as M
from nemo_curator_spark.operators.multimodal import encode_wav


def test_resolve_audio_contract():
    # waveform + sample_rate -> mono float32
    out = M.resolve_audio({"waveform": [0.5, -0.5], "sample_rate": 16000})
    audio, sr = out
    assert audio.dtype == np.float32 and sr == 16000
    # stereo (channels, samples) -> channel mean (sigmos.py:81-83)
    stereo = np.array([[1.0, 0.0], [0.0, 1.0]])
    audio, _ = M.resolve_audio({"waveform": stereo, "sample_rate": 8000})
    np.testing.assert_allclose(audio, [0.5, 0.5])
    assert M.resolve_audio({"sample_rate": 16000}) is None
    assert M.resolve_audio({"waveform": [0.1]}) is None


def test_sigmos_scores_from_prediction():
    # dict branch: MOS_* keys -> short keys (sigmos.py:244-254)
    d = M.sigmos_scores_from_prediction(
        {"MOS_NOISE": 4.2, "MOS_OVRL": 3.9, "MOS_SIG": 3.1}
    )
    assert d["noise"] == 4.2 and d["ovrl"] == 3.9 and d["sig"] == 3.1
    assert d["col"] == 0.0
    # scalar branch: overall-only (sigmos.py:255-263)
    s = M.sigmos_scores_from_prediction(4.5)
    assert s["ovrl"] == 4.5 and s["noise"] == 0.0


def test_sigmos_threshold_check_reasons():
    st = M.SIGMOSFilterStage(noise_threshold=4.0, ovrl_threshold=3.5)
    ok, reasons = st.check_thresholds(
        {"noise": 4.1, "ovrl": 3.6, "sig": 0, "col": 0, "disc": 0,
         "loud": 0, "reverb": 0}
    )
    assert ok and reasons == []
    ok, reasons = st.check_thresholds(
        {"noise": 3.2, "ovrl": 3.6, "sig": 0, "col": 0, "disc": 0,
         "loud": 0, "reverb": 0}
    )
    # exact reference reason format (sigmos.py:278-280)
    assert not ok and reasons == ["NOISE 3.200 < 4.0"]
    # disabled thresholds (None) never fail
    st2 = M.SIGMOSFilterStage(
        noise_threshold=None, ovrl_threshold=None
    )
    ok, _ = st2.check_thresholds({k: -1.0 for k in
                                  ("noise", "ovrl", "sig", "col", "disc",
                                   "loud", "reverb")})
    assert ok


class _SigModel:
    def __init__(self, scores):
        self.scores = scores

    def run(self, audio, sr):
        return self.scores


def test_sigmos_stage_annotate_and_drop():
    entry = {"waveform": [0.1, 0.2], "sample_rate": 16000}
    good = _SigModel({"MOS_NOISE": 4.5, "MOS_OVRL": 4.0})
    st = M.SIGMOSFilterStage(model=good)
    out = st.process_entry(dict(entry))
    assert out["sigmos_noise"] == 4.5 and out["sigmos_ovrl"] == 4.0
    bad = _SigModel({"MOS_NOISE": 2.0, "MOS_OVRL": 4.0})
    assert M.SIGMOSFilterStage(model=bad).process_entry(dict(entry)) is None
    # model None -> dropped (reference model-unavailable posture)
    assert M.SIGMOSFilterStage().process_entry(dict(entry)) is None


def test_sigmos_segments_mode():
    segs = [{"waveform": [0.1], "sample_rate": 16000, "k": i} for i in range(3)]

    class PerCall:
        def __init__(self):
            self.n = 0

        def run(self, audio, sr):
            self.n += 1
            return {"MOS_NOISE": 5.0 if self.n != 2 else 1.0,
                    "MOS_OVRL": 5.0}

    st = M.SIGMOSFilterStage(model=PerCall())
    out = st.process_entry({"segments": [dict(s) for s in segs]})
    assert [s["k"] for s in out["segments"]] == [0, 2]
    st2 = M.SIGMOSFilterStage(model=_SigModel({"MOS_NOISE": 0.0}))
    assert st2.process_entry({"segments": [dict(s) for s in segs]}) is None


class _Utmos:
    def __init__(self, mos):
        self.mos = mos

    def predict(self, waveform, sr):
        return self.mos


def test_utmos_stage():
    entry = {"waveform": [0.1], "sample_rate": 16000}
    out = M.UTMOSFilterStage(model=_Utmos(4.0)).process_entry(dict(entry))
    assert out["utmos_mos"] == 4.0
    assert M.UTMOSFilterStage(model=_Utmos(3.0)).process_entry(dict(entry)) is None
    # threshold None disables the gate (utmos.py:242)
    out = M.UTMOSFilterStage(
        mos_threshold=None, model=_Utmos(1.0)
    ).process_entry(dict(entry))
    assert out["utmos_mos"] == 1.0
    assert M.UTMOSFilterStage(model=None).process_entry(dict(entry)) is None


def test_spark_forms(spark):
    sr = 16000
    tone = (np.sin(np.arange(sr) / 20.0) * 20000).astype(np.int16)
    df = spark.createDataFrame(
        [(0, bytearray(encode_wav(tone, sr))),
         (1, bytearray(encode_wav(tone // 4, sr)))],
        "file_id long, wav binary",
    )

    class AmpModel:
        """Scores scale with waveform amplitude (deterministic)."""

        def run(self, audio, sr):
            amp = float(np.abs(audio).max())
            return {"MOS_NOISE": 4.0 + amp, "MOS_OVRL": 3.5 + amp}

    out = M.sigmos_filter(df, M.SIGMOSFilterStage(model=AmpModel())).collect()
    assert [r["file_id"] for r in out] == [0, 1]
    assert out[0]["sigmos_noise"] > out[1]["sigmos_noise"]

    class AmpUtmos:
        def predict(self, waveform, sr):
            return 3.0 + float(np.abs(waveform).max())

    got = M.utmos_filter(df, M.UTMOSFilterStage(model=AmpUtmos())).collect()
    # quiet file scores ~3.15 < 3.5 -> dropped; loud ~3.61 passes
    assert [r["file_id"] for r in got] == [0]
    assert got[0]["utmos_mos"] == pytest.approx(3.0 + np.abs(
        tone.astype(np.float32) / 32768.0).max())


# --- SQUIM metrics (squim.py:35-235) ----------------------------------------


def test_collect_segment_waveforms_rules():
    sr = 1000
    samples = np.arange(10 * sr, dtype=np.float64)
    entry = {
        "segments": [
            {"speaker": "S1", "text": "hi", "start": 1.0, "end": 2.0},
            {"speaker": "no-speaker", "text": "x", "start": 2.0, "end": 3.0},
            {"speaker": "S2", "text": "  ", "start": 3.0, "end": 4.0},
            {"speaker": "S3", "text": "ok", "start": 5.0, "end": 5.0},  # zero len
            {"speaker": "S4", "text": "yo", "start": 8.5, "end": 9.0},
        ]
    }
    got = M.collect_segment_waveforms(samples, sr, entry, target_sr=sr)
    # only segments 0 and 4 survive (no-speaker / empty text / zero-length
    # skipped, squim.py:149-173)
    assert [i for i, _ in got] == [0, 4]
    assert len(got[0][1]) == sr  # floor(1*sr)..floor(2*sr)
    assert got[1][1][0] == 8500.0
    # segment-less entry -> whole file at index -1
    whole = M.collect_segment_waveforms(samples, sr, {}, target_sr=sr)
    assert [i for i, _ in whole] == [-1] and len(whole[0][1]) == 10 * sr
    # sr mismatch without an injected resampler raises (plug point)
    with pytest.raises(NotImplementedError, match="resample"):
        M.collect_segment_waveforms(samples, sr, {}, target_sr=2 * sr)
    # injected resampler is used
    got2 = M.collect_segment_waveforms(
        samples, sr, {}, target_sr=2 * sr,
        resample=lambda y, s, d: np.repeat(y, 2),
    )
    assert len(got2[0][1]) == 20 * sr


def test_squim_stage_contract():
    sr = 1000
    samples = np.ones(6 * sr)
    entry = {
        "segments": [
            {"speaker": "S1", "text": "a", "start": 0.0, "end": 2.0},
            {"speaker": "no-speaker", "text": "b", "start": 2.0, "end": 3.0},
            {"speaker": "S2", "text": "c", "start": 3.0, "end": 6.0,
             "metrics": {"bandwidth": 8000}},
        ]
    }

    def fake_squim(waveforms):
        # score by duration so segments are distinguishable
        return [(len(w) / sr, 0.87654, -1.23456) for w in waveforms]

    st = M.SquimMetricsStage(squim=fake_squim, target_sr=sr)
    out = st.process_entry(entry, samples, sr)
    s0, s1, s2 = out["segments"]
    assert s0["metrics"]["pesq_squim"] == 2.0
    assert s0["metrics"]["stoi_squim"] == 0.877  # rounded to 3 (reference)
    assert s0["metrics"]["sisdr_squim"] == -1.235
    assert "metrics" not in s1  # skipped segment untouched
    assert s2["metrics"]["pesq_squim"] == 3.0
    assert s2["metrics"]["bandwidth"] == 8000  # existing metrics preserved
    # segment-less entry: metrics land on the entry itself
    solo = M.SquimMetricsStage(squim=fake_squim, target_sr=sr).process_entry(
        {}, samples, sr
    )
    assert solo["metrics"]["pesq_squim"] == 6.0
    with pytest.raises(NotImplementedError, match="SQUIM"):
        M.SquimMetricsStage().process_entry({}, samples, sr)

"""Band filter — reference stages/audio/filtering/band.py +
band_filter_module/features.py deterministic contract."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import audio_band as B
from nemo_curator_spark.operators.multimodal import encode_wav


def test_band_definitions_verbatim():
    # features.py:29-54 — 24 contiguous 1 kHz bands 0..24000
    assert len(B.BAND_DEFINITIONS) == 24
    assert B.BAND_DEFINITIONS["low1"] == (0, 1000)
    assert B.BAND_DEFINITIONS["mid5"] == (7000, 8000)
    assert B.BAND_DEFINITIONS["high"] == (13000, 14000)
    assert B.BAND_DEFINITIONS["high10"] == (23000, 24000)
    edges = sorted(v for v, _ in B.BAND_DEFINITIONS.values())
    assert edges == list(range(0, 24000, 1000))


def test_empty_feature_dict_and_vectorization():
    d = B.get_empty_feature_dict()
    assert set(d) == {f"band_energy_{b}" for b in B.BAND_DEFINITIONS}
    assert all(v == 0.0 for v in d.values())
    vec, names = B.features_dict_to_vector({})
    assert len(vec) == 24 and names == sorted(d)
    # NaN -> 0 (features.py:140-143)
    vec, _ = B.features_dict_to_vector({"a": float("nan"), "b": 2.0})
    assert vec.tolist() == [0.0, 2.0]


def _sine(freq, sr, seconds=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t)


def test_band_energy_peak_band_and_attenuation():
    sr = 48000
    y = _sine(2500.0, sr)
    feats = B.calculate_band_energy(y, sr)
    # the 2.5 kHz band (low3: 2000-3000) carries the peak -> max value
    assert max(feats, key=feats.get) == "band_energy_low3"
    assert feats["band_energy_low3"] <= 0.0
    # high-frequency attenuation ramp: (f_min-10000)/14000*12 is applied
    # to bands at/above 10 kHz — recompute one band without it
    raw = B.calculate_band_energy(y, sr)
    ramp = (17000 - 10000) / 14000 * 12
    # band high4 (17000-18000) for a pure low tone: near the noise floor
    # minus exactly the ramp vs what a no-ramp formula would give
    power = B._stft_power(y, 4096)
    freqs = B.fft_frequencies(sr, 4096)
    mask = (freqs >= 17000) & (freqs < 18000)
    mean_power = float(np.mean(power[mask, :]))
    gmax = float(np.max(power))
    no_ramp = 10 * np.log10(max(mean_power, 1e-10)) - 10 * np.log10(gmax)
    assert raw["band_energy_high4"] == pytest.approx(no_ramp - ramp)


def test_band_energy_empty_bands_at_low_sr():
    # sr 8000 -> Nyquist 4000: mid2 still holds the 4000 Hz bin (mask is
    # freqs >= f_min), bands from mid3 up have no bins -> -120
    feats = B.calculate_band_energy(_sine(500.0, 8000), 8000)
    assert feats["band_energy_mid2"] > -120.0
    assert feats["band_energy_mid3"] == -120.0
    assert feats["band_energy_high10"] == -120.0
    # the 500 Hz band dominates
    assert max(feats, key=feats.get) == "band_energy_low1"


def test_stereo_mean_matches_reference_squeeze():
    sr = 16000
    y = _sine(1000.0, sr)
    stereo = np.stack([y, y])  # (channels, samples), features.py:81-85
    a = B.calculate_band_energy(stereo, sr)
    b = B.calculate_band_energy(y, sr)
    assert a == b


def test_band_value_validation():
    with pytest.raises(ValueError, match="band_value must be one of"):
        B.BandFilterStage(band_value="wide_band")


class _Fixed:
    def __init__(self, label):
        self.label = label

    def predict_audio(self, waveform, sample_rate):
        return self.label


def test_stage_annotates_and_filters():
    entry = {"waveform": [0.0, 0.1], "sample_rate": 16000}
    st = B.BandFilterStage(band_value="full_band", predictor=_Fixed("full_band"))
    out = st.process_entry(dict(entry))
    assert out["band_prediction"] == "full_band"
    st2 = B.BandFilterStage(
        band_value="full_band", predictor=_Fixed("narrow_band")
    )
    assert st2.process_entry(dict(entry)) is None
    # missing waveform -> dropped (resolve_waveform None branch)
    assert st.process_entry({"sample_rate": 16000}) is None


def test_stage_nested_segments_mode():
    segs = [
        {"waveform": [0.1], "sample_rate": 16000, "tag": k} for k in range(3)
    ]

    class Alternating:
        def __init__(self):
            self.n = 0

        def predict_audio(self, w, sr):
            self.n += 1
            return "full_band" if self.n % 2 == 1 else "narrow_band"

    st = B.BandFilterStage(band_value="full_band", predictor=Alternating())
    out = st.process_entry({"segments": [dict(s) for s in segs], "id": 7})
    assert [s["tag"] for s in out["segments"]] == [0, 2]
    st2 = B.BandFilterStage(
        band_value="full_band", predictor=_Fixed("narrow_band")
    )
    # zero survivors -> the whole entry drops (band.py:162-169)
    assert st2.process_entry({"segments": [dict(s) for s in segs]}) is None


def test_rolloff_predictor_decision():
    sr = 16000
    rng = np.random.RandomState(0)
    noise = rng.uniform(-0.5, 0.5, sr)  # flat spectrum -> rolloff ~ Nyquist
    tone = _sine(500.0, sr, 1.0)  # energy at 500 Hz only
    p = B.RolloffBandPredictor(threshold_hz=8000)
    assert p.predict_audio(noise, sr) == "full_band"
    assert p.predict_audio(tone, sr) == "narrow_band"


def test_sklearn_predictor_feature_path():
    captured = {}

    class Model:
        def predict(self, x):
            captured["shape"] = x.shape
            return np.array(["narrow_band"])

    p = B.SklearnBandPredictor(Model())
    assert p.predict_audio(_sine(440.0, 16000), 16000) == "narrow_band"
    assert captured["shape"] == (1, 24)  # sorted 24-band vector


def test_band_filter_spark(spark):
    sr = 16000
    rng = np.random.RandomState(1)
    noise = (rng.uniform(-0.4, 0.4, sr) * 32767).astype(np.int16)
    tone = (_sine(300.0, sr, 1.0) * 20000).astype(np.int16)
    rows = [
        (0, bytearray(encode_wav(noise, sr))),
        (1, bytearray(encode_wav(tone, sr))),
    ]
    df = spark.createDataFrame(rows, "file_id long, wav binary")
    out = B.band_filter(df, band_value="full_band").collect()
    assert [r["file_id"] for r in out] == [0]
    assert out[0]["band_prediction"] == "full_band"
    out2 = B.band_filter(df, band_value="narrow_band").collect()
    assert [r["file_id"] for r in out2] == [1]

"""Band filter — reference stages/audio/filtering/band.py:52-187 +
band_filter_module/{features,predict}.py: classify audio as full_band /
narrow_band and pass only the configured class. The trained joblib
classifier (HF ``nvidia/nemocurator-speech-bandwidth-filter``) and
pyloudnorm's BS.1770 meter are the gated plug points; everything
deterministic is ported exactly:

* the 24-band frequency table (features.py:29-54 — the feature
  contract, verbatim),
* STFT band-energy features: n_fft 4096, hann window, hop n_fft//4,
  centered reflect padding (librosa.stft defaults re-implemented in
  numpy), mean band power in dB relative to the global max with the
  1e-10 floor, the high-frequency attenuation ramp
  ``(f_min - 10000) / 14000 * 12`` above 10 kHz, and -120 dB for empty
  bands (features.py:95-117),
* sorted-key feature vectorization with NaN -> 0 (features.py:121-145),
* the stage contract: band_value validation, ``band_prediction``
  annotation, nested-segments mode keeping only survivors, filtered
  rows dropped (band.py:90-187).

The default predictor derives the decision from the repo's real
``estimate_bandwidth`` rolloff (audio.py — the deterministic estimate
the reference's model approximates): rolloff >= threshold_hz =>
full_band. An injected sklearn-style model consumes the exact feature
vector above.

Spark shape: one Arrow pass over WAV rows (bytes stay on their scan
partition), filter + annotate — no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MIN_LOUDNESS_THRESHOLD = -100.0
_HIGH_FREQ_CUTOFF = 10000

# features.py:29-54 — verbatim band table (the classification contract)
BAND_DEFINITIONS: dict[str, tuple[int, int]] = {
    "low1": (0, 1000),
    "low2": (1000, 2000),
    "low3": (2000, 3000),
    "mid1": (3000, 4000),
    "mid2": (4000, 5000),
    "mid3": (5000, 6000),
    "mid4": (6000, 7000),
    "mid5": (7000, 8000),
    "mid6": (8000, 9000),
    "mid7": (9000, 10000),
    "mid8": (10000, 11000),
    "mid9": (11000, 12000),
    "mid10": (12000, 13000),
    "high": (13000, 14000),
    "high1": (14000, 15000),
    "high2": (15000, 16000),
    "high3": (16000, 17000),
    "high4": (17000, 18000),
    "high5": (18000, 19000),
    "high6": (19000, 20000),
    "high7": (20000, 21000),
    "high8": (21000, 22000),
    "high9": (22000, 23000),
    "high10": (23000, 24000),
}


def get_empty_feature_dict() -> dict[str, float]:
    """features.py:56-64."""
    return {f"band_energy_{band}": 0.0 for band in BAND_DEFINITIONS}


def _stft_power(y: np.ndarray, n_fft: int = 4096) -> np.ndarray:
    """|STFT|^2 with librosa.stft's defaults re-implemented: periodic
    hann window, hop n_fft//4, centered frames over reflect padding.
    Returns (n_bins, n_frames) power."""
    hop = n_fft // 4
    y = np.asarray(y, dtype=np.float64)
    pad = n_fft // 2
    if len(y) >= 2:
        y = np.pad(y, pad, mode="reflect")
    else:
        y = np.pad(y, pad)
    n = np.arange(n_fft)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)
    n_frames = 1 + (len(y) - n_fft) // hop
    frames = np.stack(
        [y[i * hop : i * hop + n_fft] * win for i in range(max(0, n_frames))]
    )
    spec = np.fft.rfft(frames, axis=1)
    return (np.abs(spec) ** 2).T


def fft_frequencies(sr: int, n_fft: int = 4096) -> np.ndarray:
    """librosa.fft_frequencies equivalent."""
    return np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)


def calculate_band_energy(
    y: np.ndarray, sr: int, loudness_normalize=None
) -> dict[str, float]:
    """features.py:66-119: per-band mean STFT power in dB relative to
    the global max (1e-10 floor, librosa.power_to_db ref semantics),
    high-frequency attenuation ramp, -120 for empty bands.
    ``loudness_normalize(y, sr) -> y`` is the pyloudnorm BS.1770 plug
    point (normalize-to--25-LUFS when louder than -100; a ratio-scaled
    gain does not change dB-relative-to-max features, so the default
    skips it)."""
    y = np.asarray(y, dtype=np.float64)
    if y.ndim > 1 and y.shape[0] > 1:
        y = np.mean(y, axis=0)
    if y.ndim > 1:
        y = y.squeeze()
    band_energy: dict[str, float] = {}
    try:
        if loudness_normalize is not None:
            y = loudness_normalize(y, sr)
        n_fft = 4096
        power = _stft_power(y, n_fft)
        freqs = fft_frequencies(sr, n_fft)
        max_power = np.max(power) if power.size else 0.0
        global_max_power = max_power if max_power > 0 else 1e-10
        for band, (f_min, f_max) in BAND_DEFINITIONS.items():
            mask = (freqs >= f_min) & (freqs < f_max)
            if np.any(mask) and power.size:
                mean_power = float(np.mean(power[mask, :]))
                # librosa.power_to_db(p, ref): 10*log10(max(p,1e-10)) -
                # 10*log10(max(ref,1e-10))
                db = 10.0 * np.log10(max(mean_power, 1e-10)) - 10.0 * np.log10(
                    max(global_max_power, 1e-10)
                )
                if f_min >= _HIGH_FREQ_CUTOFF:
                    db -= (f_min - _HIGH_FREQ_CUTOFF) / 14000 * 12
                band_energy[f"band_energy_{band}"] = float(db)
            else:
                band_energy[f"band_energy_{band}"] = -120.0
    except Exception:  # noqa: BLE001 — reference logs + returns -120s
        for band in BAND_DEFINITIONS:
            band_energy[f"band_energy_{band}"] = -120.0
    return band_energy


def features_dict_to_vector(
    features_dict: dict[str, float],
) -> tuple[np.ndarray, list[str]]:
    """features.py:121-145: sorted keys, NaN -> 0."""
    if not features_dict:
        features_dict = get_empty_feature_dict()
    feature_names = sorted(features_dict.keys())
    vec = []
    for name in feature_names:
        v = features_dict[name]
        vec.append(0.0 if np.isnan(v) else v)
    return np.array(vec), feature_names


class RolloffBandPredictor:
    """Default deterministic predictor: the repo's real power-spectrum
    rolloff (audio.estimate_bandwidth) against a threshold — full_band
    iff the rolloff reaches ``threshold_hz``. The trained joblib model
    is the reference's path; this is its deterministic estimate."""

    def __init__(self, threshold_hz: int = 8000):
        self.threshold_hz = int(threshold_hz)

    def predict_audio(self, waveform: np.ndarray, sample_rate: int) -> str:
        from nemo_curator_spark.operators.audio import estimate_bandwidth

        y = np.asarray(waveform, dtype=np.float64)
        if y.ndim > 1:
            y = y.mean(axis=0)
        bw = estimate_bandwidth(y, sample_rate)
        return "full_band" if bw >= self.threshold_hz else "narrow_band"


class SklearnBandPredictor:
    """predict.py:26-130 shape for an injected sklearn-style model
    (``predict(2-D feature matrix) -> labels``): band-energy features ->
    sorted vector -> NaN-to-0 -> model.predict. The joblib load is the
    caller's plug point."""

    def __init__(self, model):
        self.model = model

    def predict_audio(self, waveform: np.ndarray, sample_rate: int) -> str:
        feats = calculate_band_energy(waveform, sample_rate)
        vec, _ = features_dict_to_vector(feats)
        vec = np.nan_to_num(vec, nan=0.0)
        return str(self.model.predict(vec.reshape(1, -1))[0])


_VALID_BAND_VALUES = {"full_band", "narrow_band"}


@dataclass
class BandFilterStage:
    """band.py:52-187 contract: validate band_value, annotate each item
    with ``band_prediction``, pass only the configured class; nested
    ``segments`` mode evaluates each segment and keeps survivors (the
    whole entry drops when none survive)."""

    model_path: str | None = None
    cache_dir: str | None = None
    band_value: str = "full_band"
    predictor: object | None = None

    def __post_init__(self):
        if self.band_value not in _VALID_BAND_VALUES:
            msg = (
                f"band_value must be one of {_VALID_BAND_VALUES!r}, "
                f"got {self.band_value!r}"
            )
            raise ValueError(msg)
        if self.predictor is None:
            self.predictor = RolloffBandPredictor()

    def process_entry(self, entry: dict) -> dict | None:
        """One manifest entry with ``waveform``/``sample_rate`` (or
        nested ``segments`` of such); returns the annotated survivor or
        None (band.py:155-187)."""
        if "segments" in entry:
            survivors = []
            for seg in entry["segments"]:
                out = self._process_single(seg)
                if out is not None:
                    survivors.append(out)
            entry["segments"] = survivors
            return entry if survivors else None
        return self._process_single(entry)

    def _process_single(self, item: dict) -> dict | None:
        waveform = item.get("waveform")
        sr = item.get("sample_rate")
        if waveform is None or sr is None:
            return None
        pred = self.predictor.predict_audio(np.asarray(waveform), int(sr))
        if pred in _VALID_BAND_VALUES:
            item["band_prediction"] = pred
        actual = item.get("band_prediction", "unknown")
        if actual != self.band_value:
            return None
        return item


def band_filter(
    df: DataFrame,
    wav_col: str = "wav",
    band_value: str = "full_band",
    predictor: object | None = None,
) -> DataFrame:
    """Spark form over binary WAV rows: decode, predict, annotate with
    ``band_prediction``, keep only the configured class. One mapInPandas
    pass — bytes never leave their scan partition."""
    stage = BandFilterStage(band_value=band_value, predictor=predictor)
    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(
        list(fields) + [T.StructField("band_prediction", T.StringType())]
    )

    def gen(it):
        from nemo_curator_spark.operators.multimodal import decode_wav

        for pdf in it:
            keep_rows = []
            for _, r in pdf.iterrows():
                ch, sr, samples = decode_wav(bytes(r[wav_col]))
                y = samples.astype(np.float64) / 32768.0
                if ch > 1:
                    y = y.reshape(-1, ch).mean(axis=1)
                pred = stage.predictor.predict_audio(y, sr)
                if pred == band_value:
                    d = r.to_dict()
                    d["band_prediction"] = pred
                    keep_rows.append(d)
            yield pd.DataFrame(
                keep_rows, columns=[f.name for f in out_schema.fields]
            )

    return df.mapInPandas(gen, out_schema)

"""SIGMOS / UTMOS quality filters, deterministic halves — reference
stages/audio/filtering/{sigmos,utmos}.py: per-utterance MOS-style
quality scoring with threshold gating. The scoring networks (the
SIG-Challenge ONNX SIGMOS model; the torch.hub UTMOS predictor) are the
gated plug points — inject any object with the same call shape;
everything else is exact:

* waveform resolution (sigmos.py:67-101): waveform+sample_rate ->
  mono-mean float32 (the soundfile file path branch is a plug point),
* SIGMOS score-dict extraction incl. the scalar fallback
  (sigmos.py:243-263),
* the seven-threshold check with the reference's fail-reason strings
  (sigmos.py:264-281; defaults noise>=4.0, ovrl>=3.5, rest disabled),
* UTMOS single-threshold gate (utmos.py:109,242-247; default 3.5),
* the stage contract: annotate survivors (``sigmos_*`` / ``utmos_mos``),
  drop failures, nested-``segments`` mode keeping only surviving
  segments and dropping the entry when none survive.

Spark shape: one Arrow pass over WAV rows — score, filter, annotate; no
shuffle, bytes stay on their scan partition (the audio_band.band_filter
pattern).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def resolve_audio(item: dict) -> tuple[np.ndarray, int] | None:
    """sigmos.py:67-101 without the soundfile branch: (mono float32,
    sample_rate) from ``waveform`` + ``sample_rate``; None otherwise
    (``audio_filepath`` loading is the soundfile plug point)."""
    waveform = item.get("waveform")
    sample_rate = item.get("sample_rate")
    if waveform is None or sample_rate is None:
        return None
    audio = np.asarray(waveform, dtype=np.float32)
    if audio.ndim > 1:
        audio = np.mean(audio, axis=0)
    if audio.dtype != np.float32:
        audio = audio.astype(np.float32)
    return audio, int(sample_rate)


def sigmos_scores_from_prediction(score_data) -> dict[str, float]:
    """sigmos.py:243-263: MOS_* dict -> short keys; a bare scalar is an
    overall-only score."""
    if isinstance(score_data, dict):
        return {
            "noise": float(score_data.get("MOS_NOISE", 0)),
            "ovrl": float(score_data.get("MOS_OVRL", 0)),
            "sig": float(score_data.get("MOS_SIG", 0)),
            "col": float(score_data.get("MOS_COL", 0)),
            "disc": float(score_data.get("MOS_DISC", 0)),
            "loud": float(score_data.get("MOS_LOUD", 0)),
            "reverb": float(score_data.get("MOS_REVERB", 0)),
        }
    return {
        "noise": 0.0,
        "sig": 0.0,
        "col": 0.0,
        "disc": 0.0,
        "loud": 0.0,
        "reverb": 0.0,
        "ovrl": float(score_data),
    }


@dataclass
class SIGMOSFilterStage:
    """sigmos.py:103-333 contract. ``model`` must expose
    ``run(audio=<float32 mono>, sr=<int>) -> dict|scalar`` (the ONNX
    SigmosEstimator shape); None drops every row (the reference's
    model-unavailable posture)."""

    noise_threshold: float | None = 4.0
    ovrl_threshold: float | None = 3.5
    sig_threshold: float | None = None
    col_threshold: float | None = None
    disc_threshold: float | None = None
    loud_threshold: float | None = None
    reverb_threshold: float | None = None
    model: object | None = None

    def check_thresholds(self, scores: dict[str, float]) -> tuple[bool, list[str]]:
        """sigmos.py:264-281 — exact, including the reason format."""
        checks = [
            ("noise", self.noise_threshold, "NOISE"),
            ("ovrl", self.ovrl_threshold, "OVRL"),
            ("sig", self.sig_threshold, "SIG"),
            ("col", self.col_threshold, "COL"),
            ("disc", self.disc_threshold, "DISC"),
            ("loud", self.loud_threshold, "LOUD"),
            ("reverb", self.reverb_threshold, "REVERB"),
        ]
        passed = True
        fail_reasons = []
        for key, threshold, label in checks:
            if threshold is not None and scores[key] < threshold:
                passed = False
                fail_reasons.append(f"{label} {scores[key]:.3f} < {threshold}")
        return passed, fail_reasons

    def process_entry(self, entry: dict) -> dict | None:
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
        audio = resolve_audio(item)
        if audio is None or self.model is None:
            return None
        audio_np, sample_rate = audio
        try:
            score_data = self.model.run(audio=audio_np, sr=sample_rate)
        except Exception:  # noqa: BLE001 — reference logs + drops
            return None
        s = sigmos_scores_from_prediction(score_data)
        passed, _ = self.check_thresholds(s)
        if not passed:
            return None
        for key in ("noise", "ovrl", "sig", "col", "disc", "loud", "reverb"):
            item[f"sigmos_{key}"] = s[key]
        return item


@dataclass
class UTMOSFilterStage:
    """utmos.py:92-247 contract. ``model`` exposes ``predict(waveform,
    sample_rate) -> float`` (the torch.hub predictor + resampler are
    behind it); None drops every row."""

    mos_threshold: float | None = 3.5
    sample_rate: int = 16000
    model: object | None = None

    def process_entry(self, entry: dict) -> dict | None:
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
        audio = resolve_audio(item)
        if audio is None or self.model is None:
            return None
        waveform, sr = audio
        try:
            mos = float(self.model.predict(waveform, sr))
        except Exception:  # noqa: BLE001
            return None
        if self.mos_threshold is not None and mos < self.mos_threshold:
            return None
        item["utmos_mos"] = mos
        return item


_SIGMOS_KEYS = ("noise", "ovrl", "sig", "col", "disc", "loud", "reverb")


def sigmos_filter(
    df: DataFrame, stage: SIGMOSFilterStage, wav_col: str = "wav"
) -> DataFrame:
    """Spark form over binary WAV rows: decode -> score -> gate ->
    annotate with the seven sigmos_* columns. One mapInPandas pass."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(f"sigmos_{k}", T.DoubleType()) for k in _SIGMOS_KEYS]
    )

    def gen(it):
        from nemo_curator_spark.operators.multimodal import decode_wav

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                ch, sr, samples = decode_wav(bytes(r[wav_col]))
                y = samples.astype(np.float32) / 32768.0
                if ch > 1:
                    y = y.reshape(-1, ch).mean(axis=1)
                out = stage._process_single(
                    {"waveform": y, "sample_rate": sr}
                )
                if out is None:
                    continue
                d = r.to_dict()
                for k in _SIGMOS_KEYS:
                    d[f"sigmos_{k}"] = out[f"sigmos_{k}"]
                rows.append(d)
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.mapInPandas(gen, out_schema)


def utmos_filter(
    df: DataFrame, stage: UTMOSFilterStage, wav_col: str = "wav"
) -> DataFrame:
    """Spark form: decode -> predict -> gate -> annotate ``utmos_mos``."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("utmos_mos", T.DoubleType())]
    )

    def gen(it):
        from nemo_curator_spark.operators.multimodal import decode_wav

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                ch, sr, samples = decode_wav(bytes(r[wav_col]))
                y = samples.astype(np.float32) / 32768.0
                if ch > 1:
                    y = y.reshape(-1, ch).mean(axis=1)
                out = stage._process_single(
                    {"waveform": y, "sample_rate": sr}
                )
                if out is None:
                    continue
                d = r.to_dict()
                d["utmos_mos"] = out["utmos_mos"]
                rows.append(d)
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.mapInPandas(gen, out_schema)


# --- SQUIM quality metrics (metrics/squim.py:35-235) ------------------------


def collect_segment_waveforms(
    samples: np.ndarray,
    sample_rate: int,
    entry: dict,
    segments_key: str = "segments",
    target_sr: int = 16000,
    resample=None,
) -> list[tuple[int, np.ndarray]]:
    """TorchSquimQualityMetricsStage._collect_waveforms_for_entry
    (squim.py:129-181), exact segment rules: skip no-speaker and
    empty-text segments, frame range floor(start*sr)..floor(end*sr),
    zero-length skipped; a segment-less entry contributes the whole
    file at index -1. ``resample(y, src, dst) -> y`` is the torchaudio
    plug point (required only when sr != target_sr)."""

    def _maybe_resample(y: np.ndarray) -> np.ndarray:
        if sample_rate == target_sr:
            return y
        if resample is None:
            raise NotImplementedError(
                "resampling needs an injected resample(y, src, dst) "
                "(torchaudio.functional.resample is the reference path)"
            )
        return np.asarray(resample(y, sample_rate, target_sr))

    import math

    collected: list[tuple[int, np.ndarray]] = []
    if segments_key in entry:
        for seg_idx, segment in enumerate(entry[segments_key]):
            if (
                segment.get("speaker") == "no-speaker"
                or segment.get("text", "").strip() == ""
            ):
                continue
            start = segment.get("start", 0)
            end = segment.get("end", 0)
            start_frame = math.floor(start * sample_rate)
            end_frame = math.floor(end * sample_rate)
            if end_frame - start_frame <= 0:
                continue
            collected.append(
                (seg_idx, _maybe_resample(samples[start_frame:end_frame]))
            )
    else:
        collected.append((-1, _maybe_resample(samples)))
    return collected


def update_squim_metrics(
    audio_segment: dict, pesq_val: float, stoi_val: float, sisdr_val: float
) -> None:
    """squim.py:183-191, exact metric keys."""
    if "metrics" not in audio_segment:
        audio_segment["metrics"] = {}
    audio_segment["metrics"]["pesq_squim"] = pesq_val
    audio_segment["metrics"]["stoi_squim"] = stoi_val
    audio_segment["metrics"]["sisdr_squim"] = sisdr_val


@dataclass
class SquimMetricsStage:
    """squim.py:35-235 contract: collect valid segment waveforms, score
    them through the injectable ``squim(list[np.ndarray]) ->
    [(pesq, stoi, si_sdr)]`` (the torchaudio-SQUIM plug point — the
    reference rounds each to 3 decimals, applied here so an injected
    raw model matches), and write the three ``*_squim`` metric keys
    into each scored segment (or the entry itself at index -1)."""

    segments_key: str = "segments"
    target_sr: int = 16000
    squim: object | None = None
    resample: object | None = None

    def process_entry(
        self, entry: dict, samples: np.ndarray, sample_rate: int
    ) -> dict:
        if self.squim is None:
            raise NotImplementedError(
                "no SQUIM runtime in this environment; inject "
                "squim(waveforms) -> [(pesq, stoi, si_sdr)]"
            )
        collected = collect_segment_waveforms(
            samples, sample_rate, entry, self.segments_key,
            self.target_sr, self.resample,
        )
        if not collected:
            return entry
        results = self.squim([w for _, w in collected])
        for (seg_idx, _), (pesq, stoi, sisdr) in zip(collected, results):
            target = (
                entry
                if seg_idx == -1
                else entry[self.segments_key][seg_idx]
            )
            update_squim_metrics(
                target, round(float(pesq), 3), round(float(stoi), 3),
                round(float(sisdr), 3),
            )
        return entry

"""VAD segmentation, deterministic half — reference
stages/audio/segmentation/vad_segmentation.py:60-330: cut speech
segments out of a waveform and fan them out (or nest them) with exact
metadata bookkeeping. The silero-vad network is the gated plug point —
inject any ``vad(waveform_1d, sample_rate) -> [{"start": s, "end": e}]``
(seconds); the default is a deterministic frame-energy gate honoring
silero's get_speech_timestamps parameter contract (threshold,
min_speech_duration_ms, max_speech_duration_s, min_silence_duration_ms
— vad_segmentation.py:306-317).

Exact ports: segment-item assembly (``_build_segment_item``,
vad_segmentation.py:156-200 — ms/sample range math, the excluded-key
list, the ``original_file`` fallback chain), waveform resolution
(waveform+sample_rate required; the soundfile path branch is a plug
point), and the nested-vs-fan-out process contract including the
empty-result behaviors (vad_segmentation.py:226-285).

Spark shape: one mapInPandas pass over WAV rows — the per-file cut
produces one row per segment on the scan partition; bytes never
shuffle (the split_long_audio pattern).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class EnergyVAD:
    """Deterministic frame-energy stand-in for silero's
    get_speech_timestamps: RMS energy per 32 ms frame normalized by the
    file's peak frame, speech where the ratio >= threshold, then
    silero's post rules — close gaps shorter than min_silence, drop
    segments shorter than min_speech, split runs longer than
    max_speech."""

    def __init__(
        self,
        threshold: float = 0.5,
        min_speech_duration_ms: float = 2000.0,
        max_speech_duration_s: float = 60.0,
        min_silence_duration_ms: float = 500.0,
        frame_ms: float = 32.0,
    ):
        self.threshold = threshold
        self.min_speech_duration_ms = min_speech_duration_ms
        self.max_speech_duration_s = max_speech_duration_s
        self.min_silence_duration_ms = min_silence_duration_ms
        self.frame_ms = frame_ms

    def __call__(
        self, waveform: np.ndarray, sample_rate: int
    ) -> list[dict[str, float]]:
        y = np.asarray(waveform, dtype=np.float64)
        if y.ndim > 1:
            y = y.mean(axis=0)
        frame = max(1, int(sample_rate * self.frame_ms / 1000.0))
        n_frames = len(y) // frame
        if n_frames == 0:
            return []
        frames = y[: n_frames * frame].reshape(n_frames, frame)
        rms = np.sqrt((frames**2).mean(axis=1))
        peak = rms.max()
        if peak <= 0:
            return []
        speech = (rms / peak) >= self.threshold

        # raw runs of speech frames -> (start_sec, end_sec)
        runs: list[list[float]] = []
        start = None
        for i, s in enumerate(speech):
            if s and start is None:
                start = i
            elif not s and start is not None:
                runs.append([start * frame / sample_rate, i * frame / sample_rate])
                start = None
        if start is not None:
            runs.append(
                [start * frame / sample_rate, n_frames * frame / sample_rate]
            )

        # close sub-min_silence gaps
        merged: list[list[float]] = []
        for r in runs:
            if (
                merged
                and (r[0] - merged[-1][1]) * 1000.0 < self.min_silence_duration_ms
            ):
                merged[-1][1] = r[1]
            else:
                merged.append(r)
        # split over-long, drop under-min
        out: list[dict[str, float]] = []
        for s, e in merged:
            cur = s
            while e - cur > self.max_speech_duration_s:
                out.append({"start": cur, "end": cur + self.max_speech_duration_s})
                cur += self.max_speech_duration_s
            if (e - cur) * 1000.0 >= self.min_speech_duration_ms:
                out.append({"start": cur, "end": e})
        return out


_EXCLUDED_KEYS = (
    "start_ms",
    "end_ms",
    "segment_num",
    "duration",
    "num_samples",
)


def build_segment_item(
    item: dict,
    waveform: np.ndarray,
    sample_rate: int,
    segment: dict[str, float],
    segment_num: int,
    waveform_key: str = "waveform",
    sample_rate_key: str = "sample_rate",
) -> dict:
    """vad_segmentation.py:156-200, exact: ms + sample range math,
    passthrough of every key except the waveform/sample-rate/bookkeeping
    set, the original_file fallback chain."""
    start_ms = int(segment["start"] * 1000)
    end_ms = int(segment["end"] * 1000)
    start_sample = int(segment["start"] * sample_rate)
    end_sample = int(segment["end"] * sample_rate)
    w = np.asarray(waveform)
    if w.ndim == 1:
        seg_waveform = w[start_sample:end_sample].copy()[None, :]
    else:
        seg_waveform = w[:, start_sample:end_sample].copy()
    excluded = (waveform_key, sample_rate_key, *_EXCLUDED_KEYS)
    segment_data = {k: v for k, v in item.items() if k not in excluded}
    segment_data.update(
        {
            "waveform": seg_waveform,
            "sample_rate": sample_rate,
            "start_ms": start_ms,
            "end_ms": end_ms,
            "segment_num": segment_num,
            "duration": (end_ms - start_ms) / 1000.0,
            "original_file": item.get(
                "original_file", item.get("audio_filepath", "unknown")
            ),
        }
    )
    return segment_data


@dataclass
class VADSegmentationStage:
    """vad_segmentation.py process contract over manifest dicts:
    ``nested=False`` fans out one item per segment; ``nested=True``
    returns the entry with ``segments`` populated (and the waveform
    removed). Zero segments: nested keeps the entry with ``segments:
    []``; fan-out yields nothing."""

    min_interval_ms: int = 500
    min_duration_sec: float = 2.0
    max_duration_sec: float = 60.0
    threshold: float = 0.5
    nested: bool = False
    vad: object | None = None

    def __post_init__(self):
        if self.vad is None:
            self.vad = EnergyVAD(
                threshold=self.threshold,
                min_speech_duration_ms=self.min_duration_sec * 1000,
                max_speech_duration_s=self.max_duration_sec,
                min_silence_duration_ms=self.min_interval_ms,
            )

    def process_entry(self, item: dict) -> dict | list[dict]:
        waveform = item.get("waveform")
        sample_rate = item.get("sample_rate")
        if waveform is None or sample_rate is None:
            return []
        w = np.asarray(waveform)
        segments = self.vad(w if w.ndim == 1 else w.mean(axis=0), sample_rate)
        if not segments:
            if self.nested:
                item["segments"] = []
                return item
            return []
        if self.nested:
            item["segments"] = [
                build_segment_item(item, w, sample_rate, seg, i)
                for i, seg in enumerate(segments)
            ]
            del item["waveform"]
            return item
        return [
            build_segment_item(item, w, sample_rate, seg, i)
            for i, seg in enumerate(segments)
        ]


_VAD_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("segment_num", T.IntegerType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField("wav", T.BinaryType()),
    ]
)


def vad_segment(
    df: DataFrame,
    stage: VADSegmentationStage | None = None,
    wav_col: str = "wav",
    file_col: str = "file_id",
) -> DataFrame:
    """Spark fan-out form: one row per speech segment with its re-encoded
    WAV piece. mapInPandas keeps waveform bytes on their scan
    partition."""
    stage = stage or VADSegmentationStage()

    def gen(it):
        from nemo_curator_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                ch, sr, samples = decode_wav(bytes(r[wav_col]))
                y = samples.astype(np.float64) / 32768.0
                if ch > 1:
                    y = y.reshape(-1, ch).mean(axis=1)
                items = stage.process_entry(
                    {"waveform": y, "sample_rate": sr}
                )
                if isinstance(items, dict):
                    items = items.get("segments", [])
                for seg in items:
                    cut = np.rint(
                        seg["waveform"][0] * 32768.0
                    ).clip(-32768, 32767).astype(np.int16)
                    rows.append(
                        (
                            int(r[file_col]),
                            seg["segment_num"],
                            seg["start_ms"],
                            seg["end_ms"],
                            seg["duration"],
                            encode_wav(cut, sr),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "segment_num", "start_ms", "end_ms",
                    "duration", "wav",
                ],
            )

    return df.select(file_col, wav_col).mapInPandas(gen, _VAD_SCHEMA)

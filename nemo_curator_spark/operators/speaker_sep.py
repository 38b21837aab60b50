"""Speaker separation, deterministic half — reference
stages/audio/segmentation/speaker_separation.py:64-248 +
speaker_separation_module/speaker_sep.py: split a conversation into
per-speaker audio. The SortFormer diarization network is the gated plug
point — inject any ``diarize(waveform, sample_rate) -> ["start end
speaker", ...]``; every transformation of its output is an exact port:

* segment-string parsing incl. the nested-list model output and
  malformed-line skip (speaker_sep.py:358-385),
* overlap handling: clean-cut (timeline sweep dividing overlapped time
  between speakers, speaker_sep.py:149-199) and exclude mode
  (single-speaker intervals only, with the transition buffer,
  speaker_sep.py:201-275),
* adjacent-segment merge by gap threshold and min-duration filter
  (speaker_sep.py:277-325),
* the processing order: parse -> overlap handling -> merge -> duration
  filter, with the all-empty early outs (process_audio,
  speaker_sep.py:387-460),
* per-speaker audio assembly on a silent full-length canvas with the
  total-duration >= 0.1 s and rms >= 1 gates (get_speaker_audio_data,
  speaker_sep.py:461-540 — pydub there, int16 numpy here).

Spark shape: one mapInPandas pass over WAV rows, one output row per
detected speaker; bytes stay on their scan partition.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

Segs = dict[str, list[tuple[float, float]]]


def parse_speaker_segments(predicted_segments: list) -> Segs:
    """speaker_sep.py:358-385, exact (nested-list unwrap, malformed
    skip)."""
    speaker_segments: Segs = {}
    segments = (
        predicted_segments[0]
        if isinstance(predicted_segments, list)
        and predicted_segments
        and isinstance(predicted_segments[0], list)
        else predicted_segments
    )
    for segment in segments:
        parts = segment.split()
        if len(parts) < 3:
            continue
        start_time = float(parts[0])
        end_time = float(parts[1])
        speaker = parts[2]
        speaker_segments.setdefault(speaker, []).append(
            (start_time, end_time)
        )
    return speaker_segments


def clean_cut_overlapping_segments(speaker_segments: Segs) -> Segs:
    """speaker_sep.py:149-199, exact timeline sweep: overlapped time is
    cut away from previously-active speakers and resumes when the
    overlap ends."""
    timeline = []
    for speaker, segments in speaker_segments.items():
        for start, end in segments:
            timeline.append((start, 1, speaker))
            timeline.append((end, -1, speaker))
    timeline.sort(key=lambda x: (x[0], x[1]))

    active_speakers: set[str] = set()
    result_segments: Segs = {spk: [] for spk in speaker_segments}
    current_segments: dict[str, float | None] = dict.fromkeys(
        speaker_segments
    )
    for time, event_type, speaker in timeline:
        if event_type == -1:
            if speaker in active_speakers:
                if current_segments[speaker] is not None:
                    start_time = current_segments[speaker]
                    if start_time < time:
                        result_segments[speaker].append((start_time, time))
                    current_segments[speaker] = None
                active_speakers.remove(speaker)
                for active_spk in active_speakers:
                    if current_segments[active_spk] is None:
                        current_segments[active_spk] = time
        elif event_type == 1:
            for active_spk in active_speakers:
                if current_segments[active_spk] is not None:
                    start_time = current_segments[active_spk]
                    if start_time < time:
                        result_segments[active_spk].append(
                            (start_time, time)
                        )
                    current_segments[active_spk] = None
            active_speakers.add(speaker)
            current_segments[speaker] = time
    return result_segments


def exclude_overlapping_segments(
    speaker_segments: Segs, buffer_time: float = 0.5
) -> Segs:
    """speaker_sep.py:201-275, exact: keep only single-speaker time,
    shaving ``buffer_time`` off each side of a transition."""
    if not speaker_segments:
        return {}
    timeline = []
    for speaker, segments in speaker_segments.items():
        for start, end in segments:
            timeline.append((start, 1, speaker))
            timeline.append((end, -1, speaker))
    timeline.sort(key=lambda x: (x[0], x[1]))

    active_speakers: set[str] = set()
    result_segments: Segs = {spk: [] for spk in speaker_segments}
    single_speaker_start: float | None = None
    current_single_speaker: str | None = None
    for time, event_type, speaker in timeline:
        if event_type == 1:
            active_speakers.add(speaker)
            if len(active_speakers) == 1:
                single_speaker_start = time
                current_single_speaker = speaker
            elif len(active_speakers) == 2 and single_speaker_start is not None:
                if current_single_speaker is not None and single_speaker_start < time:
                    end_with_buffer = max(
                        single_speaker_start, time - buffer_time
                    )
                    if single_speaker_start < end_with_buffer:
                        result_segments[current_single_speaker].append(
                            (single_speaker_start, end_with_buffer)
                        )
                single_speaker_start = None
                current_single_speaker = None
        elif event_type == -1:
            if len(active_speakers) == 1 and speaker in active_speakers:
                if single_speaker_start is not None and single_speaker_start < time:
                    result_segments[speaker].append(
                        (single_speaker_start, time)
                    )
                single_speaker_start = None
                current_single_speaker = None
            active_speakers.discard(speaker)
            if len(active_speakers) == 1:
                single_speaker_start = time + buffer_time
                current_single_speaker = next(iter(active_speakers))
    return result_segments


def filter_short_segments(
    speaker_segments: Segs, min_duration: float = 2.0
) -> Segs:
    """speaker_sep.py:277-296."""
    return {
        spk: [(s, e) for s, e in segs if e - s >= min_duration]
        for spk, segs in speaker_segments.items()
    }


def merge_adjacent_segments(
    segments: list[tuple[float, float]], gap_threshold: float = 0.1
) -> list[tuple[float, float]]:
    """speaker_sep.py:298-325."""
    if not segments:
        return []
    sorted_segments = sorted(segments)
    merged = [sorted_segments[0]]
    for current in sorted_segments[1:]:
        previous = merged[-1]
        if current[0] - previous[1] <= gap_threshold:
            merged[-1] = (previous[0], max(previous[1], current[1]))
        else:
            merged.append(current)
    return merged


def process_speaker_segments(
    predicted_segments: list,
    gap_threshold: float = 0.1,
    exclude_overlaps: bool = False,
    min_duration: float = 2.0,
    buffer_time: float = 0.5,
) -> Segs:
    """process_audio minus the model call (speaker_sep.py:387-460):
    parse -> overlap handling -> merge -> duration filter, with the
    reference's all-empty early returns."""
    speaker_segments = parse_speaker_segments(predicted_segments)
    if not speaker_segments:
        return {}
    if exclude_overlaps:
        processed = exclude_overlapping_segments(speaker_segments, buffer_time)
    else:
        processed = clean_cut_overlapping_segments(speaker_segments)
    if all(len(segs) == 0 for segs in processed.values()):
        return {}
    for speaker in processed:
        processed[speaker] = merge_adjacent_segments(
            processed[speaker], gap_threshold
        )
    if min_duration > 0:
        processed = filter_short_segments(processed, min_duration)
        if all(len(segs) == 0 for segs in processed.values()):
            return {}
    return processed


def speaker_audio_canvases(
    samples: np.ndarray, sample_rate: int, speaker_segments: Segs
) -> dict[str, tuple[np.ndarray, float, list[tuple[float, float]]]]:
    """get_speaker_audio_data's assembly half (speaker_sep.py:461-540)
    over int16 samples: per speaker, a full-length silent canvas with
    the speaker's segments overlaid in place; skip speakers with total
    duration < 0.1 s or rms < 1 (pydub's silence gate)."""
    duration_ms = int(len(samples) / sample_rate * 1000)
    out: dict[str, tuple[np.ndarray, float, list[tuple[float, float]]]] = {}
    for speaker, segments in speaker_segments.items():
        if not segments:
            continue
        total_duration = sum(end - start for start, end in segments)
        if total_duration < 0.1:
            continue
        canvas = np.zeros(len(samples), dtype=np.int16)
        for start_time, end_time in segments:
            start_ms = max(0, min(int(start_time * 1000), duration_ms))
            end_ms = max(0, min(int(end_time * 1000), duration_ms))
            if start_ms >= end_ms:
                continue
            a = int(start_ms * sample_rate / 1000)
            b = int(end_ms * sample_rate / 1000)
            canvas[a:b] = samples[a:b]
        rms = float(
            np.sqrt(np.mean(canvas.astype(np.float64) ** 2))
        )
        if rms < 1:
            continue
        out[speaker] = (canvas, total_duration, segments)
    return out


@dataclass
class SpeakerSeparationStage:
    """speaker_separation.py:64-248 contract: per input entry, one
    output item per detected speaker carrying ``waveform, sample_rate,
    speaker_id, num_speakers, duration`` (the stage's declared
    outputs). ``diarize(waveform, sample_rate) -> [segment strings]``
    is the SortFormer plug point."""

    model_path: str = "nvidia/diar_sortformer_4spk-v1"
    exclude_overlaps: bool = True
    min_duration: float = 0.8
    gap_threshold: float = 0.1
    buffer_time: float = 0.5
    diarize: object | None = None

    def process_entry(self, entry: dict) -> list[dict]:
        if self.diarize is None:
            raise NotImplementedError(
                "no diarization runtime in this environment; inject "
                "diarize(waveform, sample_rate) -> segment strings "
                "(NeMo SortFormer is the reference path)"
            )
        samples = np.asarray(entry["waveform"])
        sr = int(entry["sample_rate"])
        predicted = self.diarize(samples, sr)
        segs = process_speaker_segments(
            predicted,
            gap_threshold=self.gap_threshold,
            exclude_overlaps=self.exclude_overlaps,
            min_duration=self.min_duration,
            buffer_time=self.buffer_time,
        )
        if not segs:
            return []
        int16 = (
            samples
            if samples.dtype == np.int16
            else np.rint(np.asarray(samples, dtype=np.float64) * 32768.0)
            .clip(-32768, 32767)
            .astype(np.int16)
        )
        canvases = speaker_audio_canvases(int16, sr, segs)
        num_speakers = len(canvases)
        out = []
        for speaker in sorted(canvases):
            canvas, total_duration, _ = canvases[speaker]
            item = {
                k: v
                for k, v in entry.items()
                if k not in ("waveform", "sample_rate", "duration",
                             "num_samples")
            }
            item.update(
                {
                    "waveform": canvas,
                    "sample_rate": sr,
                    "speaker_id": speaker,
                    "num_speakers": num_speakers,
                    "duration": total_duration,
                }
            )
            out.append(item)
        return out


_SEP_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("speaker_id", T.StringType()),
        T.StructField("num_speakers", T.IntegerType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField("wav", T.BinaryType()),
    ]
)


def separate_speakers(
    df: DataFrame,
    stage: SpeakerSeparationStage,
    wav_col: str = "wav",
    file_col: str = "file_id",
) -> DataFrame:
    """Spark form: one row per (file, speaker) with the per-speaker
    canvas re-encoded as WAV. mapInPandas, no shuffle."""

    def gen(it):
        from nemo_curator_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                ch, sr, samples = decode_wav(bytes(r[wav_col]))
                if ch > 1:
                    samples = np.rint(
                        samples.reshape(-1, ch).mean(axis=1)
                    ).astype(np.int16)
                items = stage.process_entry(
                    {"waveform": samples, "sample_rate": sr}
                )
                for item in items:
                    rows.append(
                        (
                            int(r[file_col]),
                            item["speaker_id"],
                            item["num_speakers"],
                            item["duration"],
                            encode_wav(item["waveform"], sr),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "speaker_id", "num_speakers", "duration",
                    "wav",
                ],
            )

    return df.select(file_col, wav_col).mapInPandas(gen, _SEP_SCHEMA)

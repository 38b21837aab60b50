"""WhisperX-style VAD, deterministic half — reference
stages/audio/inference/vad/whisperx_vad.py:41-186: a VAD model wrapper
whose public contract is ``get_vad_segments(audio_CxN, merge_max_length,
sample_rate) -> [{"start", "end", "segments"}]`` plus a stage that skips
entries shorter than ``min_length`` and stores the chunks under
``segments_key``.

The pyannote segmentation network is the gated plug point — inject any
``scorer(waveform_1d, sample_rate) -> (scores, timestamps)`` returning
per-frame speech probabilities with their frame-center times; the
default is the deterministic peak-normalized RMS scorer (the EnergyVAD
framing). Everything downstream of the scores is an exact port of the
public whisperx binarize-and-merge algorithm the reference calls into
(``Pyannote.merge_chunks`` / ``Binarize(max_duration=chunk_size)``):

- ``binarize_scores`` — onset/offset hysteresis walk with the
  max_duration split at the min-score point of the second half of the
  active run (the whisperx addition over pyannote's Binarize), the
  pad/collar support-merge, and the min_duration_on drop, including the
  guard that pads + finite max_duration are mutually exclusive.
- ``merge_chunks`` — greedy packing of binarized speech turns into
  chunks of at most ``chunk_size`` seconds: a new chunk starts when the
  next turn's end would stretch the current chunk past ``chunk_size``
  (and the current chunk is non-empty); each chunk reports its packed
  turns. This is a sequential fold, so it gates cleanly in SQL as a
  recursive CTE over row_number (see ``whisperx_vad_chunks`` in
  ``__spark_entry__``).

Spark shape: one mapInPandas pass over WAV rows — scores, binarize and
merge all happen on the scan partition; bytes never shuffle (the
vad_segment / split_long_audio pattern).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def default_frame_scores(
    waveform: np.ndarray, sample_rate: int, frame_ms: float = 32.0
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic stand-in for the pyannote VAD network: per-frame
    RMS normalized by the file's peak frame (the EnergyVAD gate's
    numerator, audio_vad.py), with pyannote SlidingWindow-style
    frame-center timestamps ``(i + 0.5) * frame / sr``."""
    y = np.asarray(waveform, dtype=np.float64)
    if y.ndim > 1:
        y = y.mean(axis=0)
    frame = max(1, int(sample_rate * frame_ms / 1000.0))
    n_frames = len(y) // frame
    if n_frames == 0:
        return np.zeros(0), np.zeros(0)
    frames = y[: n_frames * frame].reshape(n_frames, frame)
    rms = np.sqrt((frames**2).mean(axis=1))
    peak = rms.max()
    scores = rms / peak if peak > 0 else rms
    ts = (np.arange(n_frames) + 0.5) * frame / sample_rate
    return scores, ts


def binarize_scores(
    scores,
    timestamps,
    onset: float = 0.5,
    offset: float | None = None,
    min_duration_on: float = 0.0,
    min_duration_off: float = 0.0,
    pad_onset: float = 0.0,
    pad_offset: float = 0.0,
    max_duration: float = math.inf,
) -> list[tuple[float, float]]:
    """Exact port of whisperx's ``Binarize.__call__`` for one class
    (itself pyannote's binarizer plus the max_duration split): hysteresis
    onset/offset walk; when an active run exceeds ``max_duration`` it is
    cut at the minimum score in the second half of the run; trailing
    active run closes at the last frame time. Post-steps: the
    support-merge with ``min_duration_off`` collar (guarded incompatible
    with finite max_duration, as upstream), then drop regions shorter
    than ``min_duration_on``.

    Deliberate deviation from upstream: a single-frame input whose only
    score is active yields one zero-length ``(t0, t0)`` region here
    (``t`` is initialized to ``start`` before the walk), where upstream
    whisperx raises ``UnboundLocalError`` on ``t``. Emitting the
    degenerate region instead of crashing keeps the mapInPandas path
    total; ``min_duration_on > 0`` drops it, and ``merge_chunks`` packs
    it into a zero-length chunk otherwise."""
    offset = onset if offset is None else offset
    scores = list(map(float, scores))
    timestamps = list(map(float, timestamps))
    if not scores:
        return []
    regions: list[tuple[float, float]] = []
    start = timestamps[0]
    is_active = scores[0] > onset
    curr_scores = [scores[0]]
    curr_timestamps = [start]
    t = start
    for t, y in zip(timestamps[1:], scores[1:]):
        if is_active:
            curr_duration = t - start
            if curr_duration > max_duration:
                search_after = len(curr_scores) // 2
                min_score_div_idx = search_after + int(
                    np.argmin(curr_scores[search_after:])
                )
                min_score_t = curr_timestamps[min_score_div_idx]
                regions.append((start - pad_onset, min_score_t + pad_offset))
                start = curr_timestamps[min_score_div_idx]
                curr_scores = curr_scores[min_score_div_idx + 1 :]
                curr_timestamps = curr_timestamps[min_score_div_idx + 1 :]
            elif y < offset:
                regions.append((start - pad_onset, t + pad_offset))
                start = t
                is_active = False
                curr_scores = []
                curr_timestamps = []
            curr_scores.append(y)
            curr_timestamps.append(t)
        elif y > onset:
            start = t
            is_active = True
    if is_active:
        regions.append((start - pad_onset, t + pad_offset))

    if pad_onset > 0.0 or pad_offset > 0.0 or min_duration_off > 0.0:
        if max_duration < math.inf:
            msg = "This would break current max_duration param"
            raise NotImplementedError(msg)
        merged: list[list[float]] = []
        for s, e in sorted(regions):
            # pyannote Timeline.support semantics: merge when the gap is
            # empty (touching/overlap) or STRICTLY shorter than the
            # collar — a gap exactly equal to min_duration_off stays
            if merged and (
                s - merged[-1][1] <= 0.0 or s - merged[-1][1] < min_duration_off
            ):
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        regions = [(s, e) for s, e in merged]
    if min_duration_on > 0:
        regions = [(s, e) for s, e in regions if e - s >= min_duration_on]
    return regions


def merge_chunks(
    turns: list[tuple[float, float]], chunk_size: float
) -> list[dict]:
    """Exact port of whisperx ``Pyannote.merge_chunks`` downstream of
    binarization: greedily pack speech turns (sorted by start) into
    chunks of at most ``chunk_size`` seconds. A chunk closes when the
    next turn's end would exceed ``chunk_size`` from the chunk's start
    and the chunk already holds at least one turn."""
    if chunk_size <= 0:
        msg = "chunk_size must be positive"
        raise ValueError(msg)
    if not turns:
        return []
    turns = sorted(turns)
    merged: list[dict] = []
    curr_start = turns[0][0]
    curr_end = 0.0
    seg_idxs: list[tuple[float, float]] = []
    for seg_start, seg_end in turns:
        if seg_end - curr_start > chunk_size and curr_end - curr_start > 0:
            merged.append(
                {"start": curr_start, "end": curr_end, "segments": seg_idxs}
            )
            curr_start = seg_start
            seg_idxs = []
        curr_end = seg_end
        seg_idxs.append((seg_start, seg_end))
    merged.append({"start": curr_start, "end": curr_end, "segments": seg_idxs})
    return merged


class WhisperXVADModel:
    """whisperx_vad.py:41-103 shape: holds the scorer (the network plug
    point) and the onset/offset, exposes ``get_vad_segments``."""

    def __init__(
        self,
        vad_onset: float = 0.5,
        vad_offset: float = 0.363,
        scorer=None,
    ):
        self._vad_onset = vad_onset
        self._vad_offset = vad_offset
        self._scorer = scorer or default_frame_scores

    def get_vad_segments(
        self,
        audio: np.ndarray,
        merge_max_length: float,
        sample_rate: int = 16000,
    ) -> list[dict]:
        """whisperx_vad.py:80-103: score the (C, N) waveform, then
        ``merge_chunks(..., onset=vad_onset)`` — upstream binarizes with
        ``Binarize(max_duration=chunk_size, onset=onset)`` inside
        merge_chunks, so the offset used there is the onset.
        ``vad_offset`` is therefore intentionally unused on this path,
        exactly like the reference: its get_vad_segments passes ONLY
        ``onset=self._vad_onset`` to Pyannote.merge_chunks, and the
        vad_offset it hands the pipeline constructor never reaches the
        merge-time binarize (whisperx's VAD apply() is overridden to
        return raw scores)."""
        scores, ts = self._scorer(np.asarray(audio), sample_rate)
        turns = binarize_scores(
            scores, ts, onset=self._vad_onset, max_duration=merge_max_length
        )
        return merge_chunks(turns, merge_max_length)


@dataclass
class WhisperXVADStage:
    """whisperx_vad.py:106-186 process contract over manifest dicts:
    entries shorter than ``min_length`` get ``segments_key: []`` and a
    ``skipped_short`` metric of 1.0; otherwise the merged VAD chunks
    land under ``segments_key`` and the deterministic metrics
    (``audio_duration``, ``vad_segments_detected``, ``skipped_short``)
    are reported (``process_time`` is wall-clock and intentionally not
    reproduced)."""

    min_length: float = 0.5
    max_length: float = 40.0
    vad_onset: float = 0.5
    vad_offset: float = 0.363
    segments_key: str = "vad_segments"
    audio_filepath_key: str = "resampled_audio_filepath"
    scorer: object | None = None
    _model: WhisperXVADModel = field(default=None, repr=False)

    def __post_init__(self):
        if self._model is None:
            self._model = WhisperXVADModel(
                vad_onset=self.vad_onset,
                vad_offset=self.vad_offset,
                scorer=self.scorer,
            )

    def process_entry(self, entry: dict) -> tuple[dict, dict]:
        """Returns (entry, metrics). The waveform comes from the entry
        (``waveform`` + ``sample_rate``) — the soundfile read of
        ``audio_filepath_key`` is the IO plug point the Spark form
        replaces with WAV-bytes decode."""
        waveform = entry.get("waveform")
        sample_rate = entry.get("sample_rate")
        duration = entry.get("duration")
        if duration is None and waveform is not None:
            w = np.asarray(waveform)
            n = w.shape[-1]
            duration = n / float(sample_rate)
        if duration is None or duration < self.min_length:
            entry[self.segments_key] = []
            return entry, {
                "audio_duration": float(duration or 0.0),
                "vad_segments_detected": 0,
                "skipped_short": 1.0,
            }
        w = np.asarray(waveform, dtype=np.float64)
        audio = w[None, :] if w.ndim == 1 else w
        segments = self._model.get_vad_segments(
            audio, self.max_length, sample_rate=int(sample_rate)
        )
        entry[self.segments_key] = segments
        return entry, {
            "audio_duration": float(duration),
            "vad_segments_detected": len(segments),
            "skipped_short": 0.0,
        }


_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("chunk_start", T.DoubleType()),
        T.StructField("chunk_end", T.DoubleType()),
        T.StructField("n_turns", T.IntegerType()),
        T.StructField("audio_duration", T.DoubleType()),
        T.StructField("skipped_short", T.DoubleType()),
    ]
)


def whisperx_vad_chunks(
    df: DataFrame,
    stage: WhisperXVADStage | None = None,
    wav_col: str = "wav",
    file_col: str = "file_id",
) -> DataFrame:
    """Spark form: one mapInPandas pass over WAV rows, one output row
    per merged VAD chunk (short entries emit a single bookkeeping row
    with chunk_idx = -1, mirroring the reference's kept-but-empty
    entry). Bytes stay on the scan partition."""
    stage = stage or WhisperXVADStage()

    def gen(it):
        from nemo_curator_spark.operators.multimodal import decode_wav

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                ch, sr, samples = decode_wav(bytes(r[wav_col]))
                y = samples.astype(np.float64) / 32768.0
                if ch > 1:
                    y = y.reshape(-1, ch).mean(axis=1)
                entry = {"waveform": y, "sample_rate": sr}
                entry, metrics = stage.process_entry(entry)
                fid = int(r[file_col])
                segs = entry[stage.segments_key]
                if not segs:
                    rows.append(
                        (
                            fid,
                            -1,
                            0.0,
                            0.0,
                            0,
                            metrics["audio_duration"],
                            metrics["skipped_short"],
                        )
                    )
                for i, c in enumerate(segs):
                    rows.append(
                        (
                            fid,
                            i,
                            c["start"],
                            c["end"],
                            len(c["segments"]),
                            metrics["audio_duration"],
                            metrics["skipped_short"],
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _CHUNK_SCHEMA])

    return df.select(file_col, wav_col).mapInPandas(gen, _CHUNK_SCHEMA)

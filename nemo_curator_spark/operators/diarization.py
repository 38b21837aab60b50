"""Speaker-diarization stage halves (reference
``stages/audio/inference/speaker_diarization/{sortformer,pyannote}.py``),
Spark-first.

The neural diarizers (NeMo Streaming Sortformer, the pyannote 3.1
pipeline) are environment-gated plug points; MiniSortFormer
(operators/sortformer_mini.py) makes the Sortformer seam REAL at mini
scale. Everything around the nets is exact-ported here:

* ``parse_sortformer_segments`` — the three-format output parser
  (sortformer.py:33-69): "start end speaker" strings, objects with
  start/end[/speaker|label] attributes, (start, end, speaker) tuples;
  unrecognised entries are skipped (the reference logs a warning).
* ``rttm_lines`` / ``write_rttm`` — the RTTM writer (sortformer.py:
  72-84): one ``SPEAKER`` line per segment with start/duration at three
  decimals, non-positive-duration segments skipped.
* ``resolve_session_name`` — session_name key with filepath-stem
  fallback (sortformer.py:221-224).
* ``speaker_id_for`` — the pyannote stage's speaker-identifier chain
  (pyannote.py:252-261): audio_item_id > speaker_id > filepath stem,
  each suffixed ``_<speaker>``; no identifier raises ValueError.
* ``has_overlap`` — the sorted-overlap scan with early break
  (pyannote.py:45-72), over plain (start, end) tuples.
* ``route_turns`` — overlap routing + the min_length gate on clean
  turns (pyannote.py:263-281): overlapping turns go to
  ``overlap_segments`` whole; clean turns longer than min_length go on
  to segment packing.
* ``add_vad_segments`` — the max_length chopper (pyannote.py:167-213):
  turns within max_length pass through; longer turns are re-segmented
  by VAD and greedily packed to a per-chunk random target drawn
  uniform(min_length, max_length). The reference draws from an
  UNSEEDED ``random.Random()``; ``rng`` is injectable here so tests and
  gates stay deterministic (documented deviation — same walk, seeded).
* ``sortformer_diarize_rows`` — the Spark form: one mapInPandas pass
  running MiniSortFormer per row (B=1 forwards, per-worker weight
  artifact), emitting arrival-ordered segment rows. Waveform synthesis
  or decode stays on scan partitions; only (doc, speaker, start, end)
  rows cross exchanges.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose plans)
from pyspark.sql import types as T


def parse_sortformer_segments(raw_segments: list) -> list[dict[str, Any]]:
    """Exact port of ``_parse_sortformer_segments`` (sortformer.py:33-69)."""
    segments: list[dict[str, Any]] = []
    for seg in raw_segments:
        if isinstance(seg, str):
            parts = seg.strip().split()
            segments.append(
                {
                    "start": float(parts[0]),
                    "end": float(parts[1]),
                    "speaker": parts[2] if len(parts) > 2 else "unknown",
                }
            )
        elif hasattr(seg, "start") and hasattr(seg, "end"):
            segments.append(
                {
                    "start": float(seg.start),
                    "end": float(seg.end),
                    "speaker": str(
                        getattr(seg, "speaker", getattr(seg, "label", "unknown"))
                    ),
                }
            )
        elif isinstance(seg, (tuple, list)) and len(seg) >= 3:
            segments.append(
                {
                    "start": float(seg[0]),
                    "end": float(seg[1]),
                    "speaker": str(seg[2]),
                }
            )
        # else: unrecognised format — skipped (reference warns and drops)
    return segments


def rttm_lines(segments: list[dict[str, Any]], sess_name: str) -> list[str]:
    """``_write_rttm``'s line format (sortformer.py:72-84): degenerate
    (non-positive duration) segments are skipped."""
    lines = []
    for seg in segments:
        duration = seg["end"] - seg["start"]
        if duration <= 0:
            continue
        lines.append(
            f"SPEAKER {sess_name} 1 {seg['start']:.3f} {duration:.3f} "
            f"<NA> <NA> {seg['speaker']} <NA> <NA>"
        )
    return lines


def write_rttm(segments: list[dict[str, Any]], sess_name: str,
               rttm_out_dir: str) -> str:
    os.makedirs(rttm_out_dir, exist_ok=True)
    path = os.path.join(rttm_out_dir, f"{sess_name}.rttm")
    with open(path, "w") as f:
        for line in rttm_lines(segments, sess_name):
            f.write(line + "\n")
    return path


def resolve_session_name(data: dict, filepath_key: str = "audio_filepath") -> str:
    """sortformer.py:221-224: explicit session_name, else filepath stem."""
    sess = data.get("session_name")
    if sess is not None:
        return sess
    return os.path.splitext(os.path.basename(data[filepath_key]))[0]


def speaker_id_for(data_entry: dict, speaker: str,
                   audio_filepath_key: str = "resampled_audio_filepath") -> str:
    """pyannote.py:252-261 resolution chain."""
    if "audio_item_id" in data_entry:
        return data_entry["audio_item_id"] + "_" + speaker
    if "speaker_id" in data_entry:
        return data_entry["speaker_id"] + "_" + speaker
    if audio_filepath_key in data_entry:
        stem = os.path.splitext(
            os.path.basename(data_entry[audio_filepath_key])
        )[0]
        return stem + "_" + speaker
    msg = f"No speaker identifier in {data_entry}"
    raise ValueError(msg)


def has_overlap(turn: tuple[float, float], overlaps: list) -> bool:
    """Exact port of ``has_overlap`` (pyannote.py:45-72) over
    (start, end) tuples; ``overlaps`` must be sorted by start."""
    t_start, t_end = turn
    for o_start, o_end in overlaps:
        if o_start > t_end:
            break
        elif o_start >= t_start and o_start < t_end:
            return True
        elif (o_end < t_end) and (o_end > t_start):
            return True
        elif o_start < t_start and o_end > t_end:
            return True
    return False


def route_turns(
    turns: list[tuple[float, float, str]],
    overlaps: list[tuple[float, float]],
    min_length: float = 0.5,
) -> tuple[list[dict], list[dict]]:
    """The pyannote stage's per-turn routing (pyannote.py:263-281):
    returns (clean_turns, overlap_segments); clean turns are kept only
    above min_length (strictly greater, the reference's ``>``)."""
    clean, overlapped = [], []
    for start, end, speaker_id in turns:
        if has_overlap((start, end), overlaps):
            overlapped.append(
                {"speaker": speaker_id, "start": start, "end": end}
            )
        elif (end - start) > min_length:
            clean.append({"speaker": speaker_id, "start": start, "end": end})
    return clean, overlapped


def add_vad_segments(
    get_vad_segments,
    rng,
    start: float,
    end: float,
    segments: list[dict],
    speaker_id: str,
    min_length: float = 0.5,
    max_length: float = 40.0,
) -> None:
    """Exact walk of ``PyAnnoteDiarizationStage.add_vad_segments``
    (pyannote.py:167-213): turns over max_length are re-segmented by
    ``get_vad_segments(start, end) -> [{"start","end"}]`` (region-local
    times) and greedily packed to a fresh uniform(min_length,
    max_length) target per chunk. ``rng`` is injected (the reference
    uses an unseeded random.Random — documented deviation)."""
    segment_duration = end - start
    if segment_duration > max_length:
        vad_segments = get_vad_segments(start, end)
        i = 0
        n = len(vad_segments)
        while i < n:
            random_duration = rng.uniform(min_length, max_length)
            start_seg = vad_segments[i]["start"]
            end_seg = vad_segments[i]["end"]
            if end_seg - start_seg >= random_duration:
                segments.append(
                    {
                        "speaker": speaker_id,
                        "start": start + start_seg,
                        "end": start + end_seg,
                    }
                )
                i += 1
                continue
            while i < n and (vad_segments[i]["end"] - start_seg) < random_duration:
                end_seg = vad_segments[i]["end"]
                i += 1
            segments.append(
                {
                    "speaker": speaker_id,
                    "start": start + start_seg,
                    "end": start + end_seg,
                }
            )
    else:
        segments.append({"speaker": speaker_id, "start": start, "end": end})


def sortformer_diarize_rows(
    df: DataFrame,
    model_path: str,
    id_col: str = "doc_id",
    wav_provider=None,
    onset: float = 0.5,
) -> DataFrame:
    """Spark form: per row, synthesize/decode a waveform
    (``wav_provider(row_id) -> (wav, sr)``; defaults to the synthetic
    diar corpus) and run MiniSortFormer end to end — activities,
    identity islands, arrival-order relabel — emitting one row per
    segment: (id, speaker, seg_start, seg_end). One mapInPandas pass,
    B=1 forwards, waveforms never cross an exchange."""
    from nemo_curator_spark.operators import sortformer_mini as SM

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("speaker", T.StringType()),
            T.StructField("seg_start", T.DoubleType()),
            T.StructField("seg_end", T.DoubleType()),
        ]
    )

    def gen(it):
        model = SM.load_cached(model_path)
        for pdf in it:
            rows = []
            for d in pdf[id_col]:
                if wav_provider is not None:
                    wav, sr = wav_provider(int(d))
                else:
                    wav, _ = SM.synth_diar_clip(int(d))
                    sr = SM.SR
                for seg in parse_sortformer_segments(
                    SM.diar_segments(model, np.asarray(wav), sr, onset=onset)
                ):
                    rows.append(
                        (int(d), seg["speaker"], seg["start"], seg["end"])
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "speaker", "seg_start", "seg_end"]
            )

    return df.select(id_col).mapInPandas(gen, schema)

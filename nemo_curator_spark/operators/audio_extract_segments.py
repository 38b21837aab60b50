"""Audio segment extraction IO — reference
stages/audio/io/extract_segments.py, the deterministic manifest half:
which combo produced a manifest, which intervals to cut, and the
per-segment metadata/score rows, plus REAL waveform cuts over the
repo's stdlib WAV codec (soundfile slices there).

Ported exactly: the structural-CSV key set (the score-extraction
whitelist contract), score rounding at 4, speaker-label derivation,
interval construction from TimestampMapper output or diarization
segments, the per-segment metadata row shape, combo detection, and the
skip-empty/skip-bad-line jsonl manifest loading.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# extract_segments.py:81-98 — verbatim whitelist contract
CSV_STRUCTURAL_KEYS = frozenset(
    {
        "filename", "original_file", "original_start_ms",
        "original_end_ms", "duration_ms", "start_sec", "end_sec",
        "duration", "segment_index", "speaker_id", "num_speakers",
        "speaking_duration", "diar_segments",
    }
)


def extract_scores(entry: dict) -> dict:
    """extract_segments.py:105-115: every non-structural key is a score
    or user field; floats rounded at 4."""
    return {
        k: round(v, 4) if isinstance(v, float) else v
        for k, v in entry.items()
        if k not in CSV_STRUCTURAL_KEYS
    }


def get_speaker_label(entry: dict) -> tuple[str, str]:
    """extract_segments.py:118-122."""
    speaker_id = entry.get("speaker_id", "unknown")
    speaker_num = (
        speaker_id.replace("speaker_", "")
        if "speaker_" in speaker_id
        else speaker_id
    )
    return speaker_id, speaker_num


def intervals_from_timestamps(entry: dict) -> list[tuple]:
    """extract_segments.py:133-138: one (start_ms, end_ms, dur) from
    the TimestampMapper fields."""
    start_ms = entry.get("original_start_ms", 0)
    end_ms = entry.get("original_end_ms", 0)
    dur = entry.get("duration", (end_ms - start_ms) / 1000)
    return [(start_ms, end_ms, dur)]


def intervals_from_diar_segments(entry: dict) -> list[tuple]:
    """extract_segments.py:140-146: one interval per diarization
    segment, start-sorted; empty -> [] (skip-and-warn)."""
    diar = entry.get("diar_segments", [])
    if not diar:
        return []
    return [
        (int(s * 1000), int(e * 1000), e - s)
        for s, e in sorted(diar, key=lambda x: x[0])
    ]


def base_metadata(
    filename: str,
    original_file: str,
    entry: dict,
    seg_idx: int,
    start_ms: int,
    end_ms: int,
    dur: float,
) -> dict:
    """extract_segments.py:149-173: the per-segment metadata row."""
    row: dict = {
        "filename": filename,
        "original_file": original_file,
        "segment_index": seg_idx,
        "start_sec": round(start_ms / 1000, 3),
        "end_sec": round(end_ms / 1000, 3),
        "duration": round(dur, 3),
    }
    if entry.get("speaker_id") is not None:
        row["speaker_id"] = entry["speaker_id"]
    if entry.get("num_speakers") is not None:
        row["num_speakers"] = entry["num_speakers"]
    row.update(extract_scores(entry))
    return row


def detect_combo(entries: list) -> int:
    """extract_segments.py:176-199: 2 = timestamps, 3 = speaker
    diarization segments, 4 = speaker-by-timestamps (combos 1/2 are
    indistinguishable downstream of TimestampMapper)."""
    if not entries:
        return 2
    first = entries[0]
    has_speaker = "speaker_id" in first
    has_diar = "diar_segments" in first
    if has_speaker and has_diar:
        return 3
    if has_speaker:
        return 4
    return 2


def load_manifest(manifest_path: str) -> list:
    """extract_segments.py:202-214: skip blank and unparseable lines."""
    entries = []
    with open(manifest_path) as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            try:
                entries.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return entries


def entry_intervals(entry: dict, combo: int) -> list[tuple]:
    """Interval routing per combo: 3 uses diarization segments, 2/4 the
    TimestampMapper span."""
    if combo == 3:
        return intervals_from_diar_segments(entry)
    return intervals_from_timestamps(entry)


_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("original_file", T.StringType()),
        T.StructField("segment_index", T.IntegerType()),
        T.StructField("filename", T.StringType()),
        T.StructField("wav", T.BinaryType()),
        T.StructField("start_sec", T.DoubleType()),
        T.StructField("end_sec", T.DoubleType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField("speaker_id", T.StringType()),
        T.StructField("scores", T.StringType()),
    ]
)


def extract_audio_segments(
    df: DataFrame,
    file_col: str = "original_file",
    wav_col: str = "wav",
    entries_col: str = "entries",
    output_format: str = "wav",
) -> DataFrame:
    """Spark form over ONE ROW PER FILE: (file, wav bytes, JSON ARRAY of
    manifest entries). All of a file's entries are processed together so
    the reference's running per-file / per-(file, speaker) segment
    counters and filename formats hold exactly
    (extract_segments.py:313-387): combo 2 emits
    ``{name}_segment_{idx:03d}.{fmt}``, combos 3/4
    ``{name}_speaker_{num}_segment_{idx:03d}.{fmt}``; timestamp combos
    sort entries by original_start_ms first. Real waveform cuts
    (``int(ms*sr/1000)`` boundaries); one mapInPandas pass, bytes stay
    on their scan partition."""
    from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav

    def gen(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                entries = json.loads(r[entries_col]) if r[entries_col] else []
                if not isinstance(entries, list):
                    entries = [entries]
                if not entries:
                    continue
                combo = detect_combo(entries)
                try:
                    ch, sr, samples = decode_wav(bytes(r[wav_col]))
                except Exception:
                    continue
                if ch > 1:
                    samples = np.rint(
                        samples.reshape(-1, ch).mean(axis=1)
                    ).astype(np.int16)
                base = os.path.splitext(
                    os.path.basename(str(r[file_col]))
                )[0]
                if combo in (2, 4):
                    entries = sorted(
                        entries, key=lambda e: e.get("original_start_ms", 0)
                    )
                file_counter = 0
                speaker_counter: dict = {}
                seg_out_idx = 0
                for entry in entries:
                    scores = extract_scores(entry)
                    scores_json = json.dumps(scores, ensure_ascii=False)
                    speaker_id, speaker_num = get_speaker_label(entry)
                    for start_ms, end_ms, dur in entry_intervals(entry, combo):
                        a = int(start_ms * sr / 1000)
                        b = int(end_ms * sr / 1000)
                        if b <= a or a >= len(samples):
                            continue
                        cut = samples[a : min(b, len(samples))]
                        if combo == 2:
                            idx = file_counter
                            file_counter += 1
                            filename = (
                                f"{base}_segment_{idx:03d}.{output_format}"
                            )
                        else:
                            idx = speaker_counter.get(speaker_id, 0)
                            speaker_counter[speaker_id] = idx + 1
                            filename = (
                                f"{base}_speaker_{speaker_num}_segment_"
                                f"{idx:03d}.{output_format}"
                            )
                        rows.append(
                            (
                                str(r[file_col]),
                                seg_out_idx,
                                filename,
                                encode_wav(cut, sr),
                                round(start_ms / 1000, 3),
                                round(end_ms / 1000, 3),
                                round(dur, 3),
                                speaker_id,
                                scores_json,
                            )
                        )
                        seg_out_idx += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    "original_file", "segment_index", "filename", "wav",
                    "start_sec", "end_sec", "duration", "speaker_id",
                    "scores",
                ],
            )

    return df.select(file_col, wav_col, entries_col).mapInPandas(
        gen, _EXTRACT_SCHEMA
    )

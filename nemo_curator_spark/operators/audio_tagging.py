"""Audio tagging stages, model-free subset — reference
stages/audio/tagging/{merge_alignment_diarization,split}.py: merging
ASR word alignments into diarization segments, splitting long audio at
natural pauses, and re-joining split metadata with offset-adjusted
timestamps. The ASR/diarization models themselves (NeMo, pyannote,
sortformer) are the plug points; everything here is their deterministic
bookkeeping, plus REAL waveform splitting over the repo's binary WAV
codec (the reference uses torchaudio files on disk).

Spark shape: every operation is per-recording, so the forms below are
single Arrow passes over manifest rows (alignment/segments carried as
JSON, the jsonl-manifest convention) — no shuffle; waveform bytes only
appear in the split stage and never cross an exchange.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def align_words_to_segments(
    alignment: list[dict],
    segments: list[dict],
    text_key: str = "text",
    words_key: str = "words",
) -> None:
    """Exact port of MergeAlignmentDiarizationStage.align_words_to_segments
    (merge_alignment_diarization.py:65-180): walk time-sorted words once
    across time-sorted segments; fully-contained words join the segment,
    boundary-straddling words go to whichever neighbor overlaps more
    (ties keep the current), gap words are skipped. Mutates ``segments``
    (adds text_key/words_key), like the reference."""
    last = 0
    alignment = sorted(alignment, key=lambda x: x.get("start", 0))
    segments.sort(key=lambda x: x.get("start", 0))
    if not alignment or not segments:
        return
    for i, segment in enumerate(segments):
        words_in_segment: list[dict] = []
        while last < len(alignment):
            word = alignment[last]
            ws, we = word.get("start", 0), word.get("end", 0)
            if ws >= segment.get("end", 0):
                break
            if ws >= segment.get("start", 0) and we <= segment.get("end", 0):
                words_in_segment.append(word)
                last += 1
            else:
                cur = max(
                    0, min(we, segment.get("end", 0))
                    - max(ws, segment.get("start", 0)),
                )
                if i < len(segments) - 1:
                    nxt_seg = segments[i + 1]
                    nxt = max(
                        0, min(we, nxt_seg.get("end", 0))
                        - max(ws, nxt_seg.get("start", 0)),
                    )
                else:
                    nxt = 0
                if cur >= nxt and cur > 0:
                    words_in_segment.append(word)
                    last += 1
                elif nxt > cur:
                    break
                else:
                    last += 1  # gap word: skipped
            if last == len(alignment):
                break
        segment[text_key] = " ".join(w.get("word", "") for w in words_in_segment)
        segment[words_key] = words_in_segment


def get_split_points(
    segments: list[dict], suggested_max_len: float
) -> list[float]:
    """SplitLongAudioStage.get_split_points (split.py:67-84): walk
    time-sorted segments; whenever the span since the current split
    start exceeds the target, cut at the PREVIOUS segment end (a natural
    pause)."""
    splits: list[float] = []
    split_start = 0.0
    prev_end = 0.0
    for segment in sorted(segments, key=lambda s: s.get("start", 0)):
        end = segment.get("end", 0)
        if end - split_start > suggested_max_len:
            splits.append(prev_end)
            split_start = prev_end
        prev_end = end
    return splits


def split_long_wav(
    wav: bytes,
    segments: list[dict],
    suggested_max_len: float,
    min_len: float = 1.0,
) -> tuple[list[bytes], list[float], list[float], list[float]]:
    """REAL waveform splitting (split.py:90-173 with the repo's stdlib
    codec in place of torchaudio files): cut at ``get_split_points``
    sample boundaries (``ceil(split*sr)``), keep pieces longer than
    ``min_len``, emit the remainder last; zero kept pieces falls back to
    the whole file at offset 0 (the reference's fallback warning path).
    Output pieces are always mono (the reference loads mono upstream);
    an already-mono short file passes through byte-identical. Returns
    ``(pieces, offsets_sec, durations_sec, split_timestamps)``."""
    from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav

    ch, sr, samples = decode_wav(bytes(wav))
    if ch != 1:
        frames = samples.reshape(-1, ch)
        samples = np.rint(frames.mean(axis=1)).astype(np.int16)
    # channel layout must not depend on duration: the passthrough and
    # fallback paths re-encode to mono when the source was multi-channel
    whole = bytes(wav) if ch == 1 else encode_wav(samples, sr)
    duration = len(samples) / sr
    if duration < suggested_max_len:
        return [whole], [0.0], [duration], []

    splits = get_split_points(segments, suggested_max_len)
    pieces: list[bytes] = []
    offsets: list[float] = []
    durations: list[float] = []
    start = 0
    for split in splits:
        end = math.ceil(split * sr)
        if end - start > min_len * sr:
            pieces.append(encode_wav(samples[start:end], sr))
            offsets.append(start / sr)
            durations.append((end - start) / sr)
            start = end
    remaining = len(samples) - start
    if remaining > min_len * sr:
        pieces.append(encode_wav(samples[start:], sr))
        offsets.append(start / sr)
        durations.append(remaining / sr)
    if not pieces:
        return [whole], [0.0], [duration], splits
    return pieces, offsets, durations, splits


def join_split_metadata(
    split_entries: list[dict],
    split_offsets: list[float],
    text_key: str = "text",
) -> tuple[str, list[dict]]:
    """JoinSplitAudioMetadataStage._join_split_metadata (split.py:
    254-289): concatenate transcripts, shift each split's word
    alignments by its offset (rounded to 3 decimals, reference
    behavior)."""
    transcripts: list[str] = []
    alignments: list[dict] = []
    for idx, entry in enumerate(split_entries):
        text = entry.get(text_key, "")
        if text:
            transcripts.append(text)
        offset = split_offsets[idx] if idx < len(split_offsets) else 0
        for word in entry.get("alignment", []):
            w = dict(word)
            w["start"] = round(word.get("start", 0) + offset, 3)
            w["end"] = round(word.get("end", 0) + offset, 3)
            alignments.append(w)
    return " ".join(transcripts), alignments


# ---------------------------------------------------------------------------
# Spark forms (manifest rows; alignment/segments as JSON columns)


def merge_alignment_diarization(
    df: DataFrame,
    alignment_col: str = "alignment",
    segments_col: str = "segments",
    text_key: str = "text",
    words_key: str = "words",
) -> DataFrame:
    """One Arrow pass: merge each row's word alignment into its
    diarization segments; ``segments_col`` (JSON) is replaced by the
    merged form."""

    @F.pandas_udf(T.StringType())
    def _merge(aligns: pd.Series, segs: pd.Series) -> pd.Series:
        out = []
        for a, s in zip(aligns, segs):
            alignment = json.loads(a) if a else []
            segments = json.loads(s) if s else []
            align_words_to_segments(alignment, segments, text_key, words_key)
            out.append(json.dumps(segments, ensure_ascii=False))
        return pd.Series(out)

    return df.withColumn(
        segments_col, _merge(F.col(alignment_col), F.col(segments_col))
    )


_SPLIT_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("split_idx", T.IntegerType()),
        T.StructField("wav", T.BinaryType()),
        T.StructField("offset_sec", T.DoubleType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("n_splits", T.IntegerType()),
    ]
)


def split_long_audio(
    df: DataFrame,
    wav_col: str = "wav",
    segments_col: str = "segments",
    file_col: str = "file_id",
    suggested_max_len: float = 3600.0,
    min_len: float = 1.0,
) -> DataFrame:
    """SplitLongAudioStage over binary WAV rows: one row per split piece
    with its offset/duration (downstream ASR runs per piece; the join
    stage shifts alignments back by offset_sec). mapInPandas so the
    waveform bytes stay on their scan partition."""

    def gen(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                segments = json.loads(r[segments_col]) if r[segments_col] else []
                pieces, offsets, durations, _ = split_long_wav(
                    r[wav_col], segments, suggested_max_len, min_len
                )
                for k, (p, o, d) in enumerate(zip(pieces, offsets, durations)):
                    rows.append(
                        (int(r[file_col]), k, p, o, d, len(pieces))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "split_idx", "wav", "offset_sec",
                    "duration_sec", "n_splits",
                ],
            )

    return df.select(file_col, wav_col, segments_col).mapInPandas(
        gen, _SPLIT_SCHEMA
    )

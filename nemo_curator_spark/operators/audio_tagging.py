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


# --- prepare module segments (TTS/ASR prep) ----------------------------------
# (reference tagging/prepare_module_segments.py:35-427 + utils.py:47-95):
# merge adjacent same-speaker words, then split by terminal punctuation,
# duration, pauses, and bandwidth changes into TTS- or ASR-ready
# segments. The reference seeds its RNG per entry from md5(entry_id)
# (the ASR random max-duration draw), so the whole stage is already
# deterministic and partitioning-invariant — ported as-is.

import hashlib
import random


def add_non_speaker_segments(
    segments: list, audio_duration: float, max_length: float | None = None
) -> None:
    """utils.py:47-95: fill diarization gaps with 'no-speaker' segments
    (optionally chunked at max_length); mutates + start-sorts."""
    gaps = []
    last_end = 0
    for seg in sorted(segments, key=lambda s: s["start"]):
        if seg["start"] > last_end:
            gaps.append((last_end, seg["start"]))
        last_end = seg["end"]
    if last_end < audio_duration:
        gaps.append((last_end, audio_duration))
    for start, end in gaps:
        if max_length is not None:
            cur = start
            while cur < end:
                nxt = min(cur + max_length, end)
                segments.append(
                    {"speaker": "no-speaker", "start": cur, "end": nxt}
                )
                cur = nxt
        else:
            segments.append(
                {"speaker": "no-speaker", "start": start, "end": end}
            )
    segments.sort(key=lambda x: x["start"])


class PrepareModuleSegments:
    """Behavioral port of PrepareModuleSegmentsStage (module='tts' keeps
    single-speaker segments, 'asr' allows multi-speaker; per-entry
    md5-seeded RNG drives the ASR random max-duration draws)."""

    def __init__(
        self,
        module: str = "tts",
        min_duration: float = 5.0,
        max_duration: float = 20.0,
        max_pause: float = 2.0,
        text_key: str = "text",
        words_key: str = "words",
        terminal_punct_marks: str = ".!?。？？！。",  # noqa: RUF001
        full_utterance_ratio: float = 1.0,
        punctuation_split_only: bool = False,
    ):
        if module not in ("tts", "asr"):
            raise ValueError("Module must be either 'tts' or 'asr'")
        self.module = module
        self.min_duration = min_duration
        self.max_duration = max_duration
        self.max_pause = max_pause
        self.text_key = text_key
        self.words_key = words_key
        self.terminal_punct_marks = terminal_punct_marks
        self.full_utterance_ratio = full_utterance_ratio
        self.punctuation_split_only = punctuation_split_only
        self._rng = random.Random()

    # -- word collection (prepare_module_segments.py:80-129) --

    def get_words_list(self, metadata: dict) -> list:
        segments = metadata["segments"]
        if "overlap_segments" not in metadata:
            add_non_speaker_segments(segments, metadata.get("duration", 0.0))
            align_words_to_segments(
                metadata.get("alignment", []), segments,
                self.text_key, self.words_key,
            )
        words = []
        for segment in segments:
            if (segment.get(self.text_key) or "").strip() == "":
                continue
            m = segment.get("metrics")
            m = m if isinstance(m, dict) else {}
            for word in segment.get(self.words_key, []):
                w = dict(word)
                w["speaker"] = segment["speaker"]
                for k in ("stoi_squim", "sisdr_squim", "pesq_squim", "bandwidth"):
                    w[k] = m.get(k)
                words.append(w)
        return words

    # -- validity (prepare_module_segments.py:131-145) --

    def is_valid_segment(self, segment: dict) -> bool:
        words = segment.get("words", [])
        if not words:
            return False
        start = segment.get("start", words[0].get("start"))
        end = segment.get("end", words[-1].get("end"))
        if start is None or end is None or end <= start:
            return False
        if len(words) == 1:
            w = words[0]
            if (w.get("end", 0) - w.get("start", 0)) > self.max_duration:
                return False
        sentence = " ".join(w.get("word", "") for w in words)
        return bool(sentence and sentence.strip())

    # -- duration/pause/bandwidth split (py:147-226) --

    def split_segment_by_duration(self, segment: dict) -> list:
        words = segment["words"]
        cur = {
            "speaker": segment["speaker"], "start": segment["start"],
            "end": segment["end"], "words": [],
        }
        out = []
        rand_max = (
            self.max_duration
            if self.module == "tts"
            else self._rng.randint(
                int(self.min_duration), int(self.max_duration)
            )
        )
        for word in words:
            if not cur["words"]:
                cur = {
                    "speaker": word["speaker"], "start": word["start"],
                    "end": word["end"], "words": [word],
                }
                continue
            if (word["end"] - cur["start"]) > rand_max:
                if self.is_valid_segment(cur):
                    out.append(cur)
                cur = {
                    "speaker": segment["speaker"], "start": word["start"],
                    "end": word["end"], "words": [word],
                }
                if self.module == "asr":
                    rand_max = self._rng.randint(
                        int(self.min_duration), int(self.max_duration)
                    )
                continue
            if (
                self.module == "tts"
                and (word["start"] - cur["end"] > self.max_pause)
                and (cur["end"] - cur["start"] >= self.min_duration)
            ):
                if self.is_valid_segment(cur):
                    out.append(cur)
                cur = {
                    "speaker": segment["speaker"], "start": word["start"],
                    "end": word["end"], "words": [word],
                }
                continue
            if (
                self.module == "tts"
                and cur["words"]
                and word.get("bandwidth") != cur["words"][-1].get("bandwidth")
                and (cur["end"] - cur["start"] >= self.min_duration)
            ):
                if self.is_valid_segment(cur):
                    out.append(cur)
                cur = {
                    "speaker": word["speaker"], "start": word["start"],
                    "end": word["end"], "words": [word],
                }
                continue
            cur["words"].append(word)
            cur["end"] = word["end"]
        if cur["words"] and self.is_valid_segment(cur):
            out.append(cur)
        return out

    # -- punctuation split (py:228-327) --

    def split_segment_by_punctuation(self, segment: dict) -> list:
        words = segment["words"]
        split_points = [
            i for i, w in enumerate(words)
            if w.get("word") and w["word"][-1] in self.terminal_punct_marks
        ]
        out: list = []
        if not split_points:
            if self.punctuation_split_only:
                return out
            return self.split_segment_by_duration(segment)

        # merge too-short punctuation groups forward while under max
        group_start = 0
        cur_i = 0
        chosen_points = []
        while cur_i < len(split_points):
            end_idx = split_points[cur_i]
            dur = words[end_idx]["end"] - words[group_start]["start"]
            if dur < self.min_duration:
                nxt = cur_i + 1
                while (
                    nxt < len(split_points)
                    and (
                        words[split_points[nxt]]["end"]
                        - words[group_start]["start"]
                    ) <= self.max_duration
                ):
                    nxt += 1
                if nxt > cur_i + 1:
                    chosen = split_points[nxt - 1]
                    chosen_points.append(chosen)
                    group_start = chosen + 1
                    cur_i = nxt
                else:
                    chosen = split_points[cur_i]
                    chosen_points.append(chosen)
                    group_start = chosen + 1
                    cur_i += 1
            else:
                chosen = split_points[cur_i]
                chosen_points.append(chosen)
                group_start = chosen + 1
                cur_i += 1

        total_dur = 0.0
        s = 0
        for e in chosen_points:
            total_dur += words[e]["end"] - words[s]["start"]
            s = e + 1
        required = self.full_utterance_ratio * total_dur

        start = 0
        covered = 0.0
        for end in chosen_points:
            dur = words[end]["end"] - words[start]["start"]
            covered += dur
            full_reached = (
                self.full_utterance_ratio < 1.0 and covered > required
            )
            if full_reached:
                end = chosen_points[-1]  # noqa: PLW2901
            sub = {
                "speaker": segment.get("speaker"),
                "start": words[start]["start"],
                "end": words[end]["end"],
                "words": words[start : end + 1],
            }
            if full_reached or dur > self.max_duration:
                out.extend(self.split_segment_by_duration(sub))
            elif self.is_valid_segment(sub):
                out.append(sub)
            start = end + 1
            if full_reached:
                break

        if start < len(words):
            out.extend(
                self.split_segment_by_duration(
                    {
                        "speaker": segment["speaker"],
                        "start": words[start]["start"],
                        "end": words[-1]["end"],
                        "words": words[start:],
                    }
                )
            )
        return out

    # -- output assembly (py:329-357) --

    def _emit(self, metadata: dict, new_segments: list) -> None:
        segments = []
        for ns in new_segments:
            if self.module == "tts":
                speaker = ns["speaker"]
            else:
                speaker = ",".join(
                    dict.fromkeys(w["speaker"] for w in ns["words"])
                )
            segments.append(
                {
                    "speaker": speaker,
                    "start": ns["start"],
                    "end": ns["end"],
                    self.text_key: " ".join(
                        w.get("word", "") for w in ns["words"]
                    ),
                    self.words_key: [
                        {
                            "word": w.get("word", ""),
                            "start": w.get("start", 0.0),
                            "end": w.get("end", 0.0),
                        }
                        for w in ns["words"]
                    ],
                    "metrics": {
                        k: [w.get(k) for w in ns["words"]]
                        for k in (
                            "pesq_squim", "stoi_squim", "sisdr_squim",
                            "bandwidth",
                        )
                    },
                }
            )
        metadata["segments"] = segments

    # -- per-entry drivers (py:359-427) --

    def process_entry(self, metadata: dict, entry_id: str = "") -> dict:
        """One manifest entry; md5(entry_id)-seeded RNG like the stage."""
        self._rng.seed(int(hashlib.md5(entry_id.encode()).hexdigest()[:8], 16))
        if "segments" not in metadata:
            return metadata
        words = self.get_words_list(metadata)
        if self.module == "asr":
            new_segments = (
                self.split_segment_by_punctuation(
                    {
                        "speaker": None,
                        "start": words[0]["start"],
                        "end": words[-1]["end"],
                        "words": words,
                    }
                )
                if words
                else []
            )
            self._emit(metadata, new_segments)
        else:
            speaker_runs: list = []
            cur = {"speaker": None, "start": None, "end": None, "words": []}
            for word in words:
                if cur["speaker"] is None:
                    cur = {
                        "speaker": word["speaker"], "start": word["start"],
                        "end": word["end"], "words": [word],
                    }
                elif word["speaker"] != cur["speaker"]:
                    speaker_runs.append(cur)
                    cur = {
                        "speaker": word["speaker"], "start": word["start"],
                        "end": word["end"], "words": [word],
                    }
                else:
                    cur["words"].append(word)
                    cur["end"] = word["end"]
            if cur["words"]:
                speaker_runs.append(cur)
            new_segments = []
            for run in speaker_runs:
                if run["speaker"] in ("no-speaker", None):
                    continue
                new_segments.extend(self.split_segment_by_punctuation(run))
            self._emit(metadata, new_segments)
        return metadata


def prepare_module_segments(
    df: DataFrame,
    module: str = "tts",
    id_col: str = "file_id",
    metadata_col: str = "metadata",
    **kw,
) -> DataFrame:
    """Spark form over JSON manifest rows: one Arrow pass, per-entry
    seeded RNG keyed on the id column (partitioning-invariant)."""
    prep = PrepareModuleSegments(module=module, **kw)

    @F.pandas_udf(T.StringType())
    def _prep(ids: pd.Series, metas: pd.Series) -> pd.Series:
        out = []
        for i, m in zip(ids, metas):
            meta = json.loads(m) if m else {}
            out.append(
                json.dumps(
                    prep.process_entry(meta, str(i)), ensure_ascii=False
                )
            )
        return pd.Series(out)

    return df.withColumn(
        metadata_col, _prep(F.col(id_col), F.col(metadata_col))
    )

"""ALM pretrain segment planning — reference
stages/audio/alm/pretrain/planning.py (overlap drop, greedy snippet
packing, repetition filter): the pure in-memory half that runs BEFORE
any audio is decoded, re-expressed Spark-first over a segments table.

Behavioral ports (cited per function): empty-segment drop, the
sweep-line overlap detector (planning.py:74-127 — end-keyed min-heap of
active intervals, overlap >= min_overlap_sec OR containment flags both
sides), greedy contiguous packing with duration + gap constraints
(planning.py:129-205, incl. the too_long / too_short / no_text drop
accounting), snippet-relative timestamp shift with jitter clamping
(planning.py:206-252), and the token-ngram repetition counters
(planning.py:253-300). The HF/Whisper tokenizer of
SnippetRepetitionFilterStage is the plug point — inject any
``tokenize(text) -> list[int]`` (the vendored MiniBPE works); loguru
red-highlight formatting is display-only and not ported.

Spark shape: segments for one audio file are independent of every other
file, so the whole plan is ONE ``applyInPandas`` keyed by file id — a
single hash shuffle on the (tiny) bookkeeping rows, never audio bytes,
then the extractor stage decodes only planned snippets (the reference's
stated reason for planning first: filtered snippets never incur
decode/resample cost).
"""

from __future__ import annotations

import heapq
import json
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def segment_text(seg: dict) -> str:
    """utils.py:108-118: the ``text`` field, stripped (text_ITN is
    carried through but never consulted)."""
    return (seg.get("text") or "").strip()


def filter_empty_segments(segments: list[dict]) -> tuple[list[dict], int]:
    """planning.py:59-72: drop segments with no text and no words."""
    kept = [s for s in segments if segment_text(s) or s.get("words")]
    return kept, len(segments) - len(kept)


def find_overlapping_indices(
    segments: list[dict], min_overlap_sec: float
) -> set[int]:
    """planning.py:74-127: indices overlapping any other segment
    (>= min_overlap_sec intersection OR containment), via a sweep over
    (start, end)-sorted segments with an end-keyed active heap."""
    n = len(segments)
    if n < 2:
        return set()
    order = sorted(
        range(n), key=lambda i: (segments[i]["start"], segments[i]["end"])
    )
    bad: set[int] = set()
    active: list[tuple[float, float, int]] = []  # (end, start, idx)
    for k in order:
        si, ei = segments[k]["start"], segments[k]["end"]
        while active and active[0][0] <= si:
            heapq.heappop(active)
        for ej, sj, j in active:
            if sj >= ei:
                continue
            overlap = min(ei, ej) - max(si, sj)
            contains = (si <= sj and ei >= ej) or (sj <= si and ej >= ei)
            if overlap >= min_overlap_sec or contains:
                bad.add(k)
                bad.add(j)
        heapq.heappush(active, (ei, si, k))
    return bad


def plan_snippets(
    segments: list[dict],
    max_duration_sec: float,
    min_duration_sec: float,
    max_segment_gap_in_snippet: float,
) -> tuple[list[dict], dict[str, int]]:
    """planning.py:129-205: greedy contiguous packing — grow the current
    snippet while span <= max_duration and inter-segment gap <= max_gap;
    then drop candidates that are too long / too short / text-free.
    Precondition (guaranteed by the overlap stage): segments sorted,
    non-overlapping."""
    drops = {"too_long": 0, "too_short": 0, "no_text": 0}
    if not segments:
        return [], drops
    candidates: list[dict] = []
    cur: dict | None = None
    for seg in segments:
        if cur is None:
            cur = {"start": seg["start"], "end": seg["end"], "segments": [seg]}
            continue
        gap = seg["start"] - cur["end"]
        if (
            seg["end"] - cur["start"] <= max_duration_sec
            and gap <= max_segment_gap_in_snippet
        ):
            cur["end"] = seg["end"]
            cur["segments"].append(seg)
        else:
            candidates.append(cur)
            cur = {"start": seg["start"], "end": seg["end"], "segments": [seg]}
    if cur is not None:
        candidates.append(cur)

    snippets: list[dict] = []
    for cand in candidates:
        duration = cand["end"] - cand["start"]
        if duration > max_duration_sec:
            drops["too_long"] += 1
            continue
        if duration < min_duration_sec:
            drops["too_short"] += 1
            continue
        if not " ".join(segment_text(s) for s in cand["segments"]).strip():
            drops["no_text"] += 1
            continue
        snippets.append(cand)
    return snippets, drops


def relativize_segments(
    segments: list[dict], snippet_start: float, snippet_end: float
) -> list[dict]:
    """planning.py:206-252: shift segment and word timestamps to
    snippet-relative, clamped into [0, duration] (real diarization data
    has ~10 ms jitter past the boundaries)."""
    duration = max(0.0, snippet_end - snippet_start)

    def clamp(t: float) -> float:
        return min(duration, max(0.0, t - snippet_start))

    out = []
    for seg in segments:
        new_seg = dict(seg)
        new_seg["start"] = clamp(seg["start"])
        new_seg["end"] = clamp(seg["end"])
        if seg.get("words"):
            new_seg["words"] = [
                {
                    **w,
                    **({"start": clamp(w["start"])} if "start" in w else {}),
                    **({"end": clamp(w["end"])} if "end" in w else {}),
                }
                for w in seg["words"]
            ]
        out.append(new_seg)
    return out


def count_ngrams(token_ids: list[int], n: int) -> Counter:
    """planning.py:253-258."""
    if n <= 0 or len(token_ids) < n:
        return Counter()
    return Counter(
        tuple(token_ids[i : i + n]) for i in range(len(token_ids) - n + 1)
    )


def find_offending_ngrams(counts: Counter, max_count: int) -> set:
    """planning.py:260-264: frequency strictly above max_count."""
    return {ng for ng, c in counts.items() if c > max_count}


def merge_char_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """planning.py:287-300: merge overlapping/touching ranges."""
    if not ranges:
        return []
    ordered = sorted(ranges)
    merged = [ordered[0]]
    for start, end in ordered[1:]:
        ls, le = merged[-1]
        if start <= le:
            merged[-1] = (ls, max(le, end))
        else:
            merged.append((start, end))
    return merged


def snippet_is_repetitive(
    text: str, tokenize, ngram_n: int = 10, ngram_max_count: int = 3
) -> bool:
    """SnippetRepetitionFilterStage core (planning.py:481-560): tokenize
    the snippet text, drop iff any token n-gram repeats strictly more
    than ``ngram_max_count`` times; shorter-than-n token sequences are
    kept. Validation mirrors __post_init__."""
    if ngram_n < 1:
        raise ValueError("ngram_n must be >= 1")
    if ngram_max_count < 1:
        raise ValueError("ngram_max_count must be >= 1")
    ids = tokenize(text)
    if len(ids) < ngram_n:
        return False
    return bool(
        find_offending_ngrams(count_ngrams(ids, ngram_n), ngram_max_count)
    )


_PLAN_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("snippet_idx", T.IntegerType()),
        T.StructField("snip_start", T.DoubleType()),
        T.StructField("snip_end", T.DoubleType()),
        T.StructField("seg_pos", T.IntegerType()),
        T.StructField("seg_start_rel", T.DoubleType()),
        T.StructField("seg_end_rel", T.DoubleType()),
        T.StructField("seg_text", T.StringType()),
    ]
)


def alm_snippet_plan(
    df: DataFrame,
    file_col: str = "file_id",
    start_col: str = "start",
    end_col: str = "end",
    text_col: str = "text",
    max_duration_sec: float = 30.0,
    min_duration_sec: float = 5.0,
    max_segment_gap_in_snippet: float = 2.0,
    min_overlap_sec: float = 0.1,
    tokenize=None,
    ngram_n: int = 10,
    ngram_max_count: int = 3,
) -> DataFrame:
    """The three planning stages fused into one per-file pass: empty
    drop -> overlap drop -> greedy packing -> (optional) repetition
    filter -> snippet-relative segments. One hash shuffle on the
    bookkeeping rows keyed by file id; audio bytes are never touched."""

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([start_col, end_col])
        segments = [
            {"start": float(r[start_col]), "end": float(r[end_col]),
             "text": r[text_col]}
            for _, r in pdf.iterrows()
        ]
        segments, _ = filter_empty_segments(segments)
        bad = find_overlapping_indices(segments, min_overlap_sec)
        segments = [s for i, s in enumerate(segments) if i not in bad]
        snippets, _ = plan_snippets(
            segments, max_duration_sec, min_duration_sec,
            max_segment_gap_in_snippet,
        )
        rows = []
        fid = pdf[file_col].iloc[0] if len(pdf) else None
        out_idx = 0
        for snip in snippets:
            text = " ".join(segment_text(s) for s in snip["segments"]).strip()
            if tokenize is not None and snippet_is_repetitive(
                text, tokenize, ngram_n, ngram_max_count
            ):
                continue
            rel = relativize_segments(
                snip["segments"], snip["start"], snip["end"]
            )
            for pos, seg in enumerate(rel):
                rows.append(
                    (
                        fid,
                        out_idx,
                        snip["start"],
                        snip["end"],
                        pos,
                        seg["start"],
                        seg["end"],
                        seg["text"],
                    )
                )
            out_idx += 1
        return pd.DataFrame(
            rows,
            columns=[
                "file_id", "snippet_idx", "snip_start", "snip_end",
                "seg_pos", "seg_start_rel", "seg_end_rel", "seg_text",
            ],
        )

    return df.groupBy(file_col).applyInPandas(per_file, schema=_PLAN_SCHEMA)


# --- ALM window overlap filter ----------------------------------------------
# (reference audio/alm/alm_data_overlap.py:61-145): after windows are
# built, drop near-duplicate windows whose span overlap exceeds a
# threshold, preferring the window whose duration is closest to the
# target (ties keep the longer; equal-everything keeps the earlier).


def overlap_ratio(seg1: tuple, seg2: tuple) -> float:
    """alm_data_overlap.py:61-69 — segments stored (end, start); ratio =
    intersection / smaller duration."""
    start1, end1 = seg1[1], seg1[0]
    start2, end2 = seg2[1], seg2[0]
    overlap = max(0, min(end1, end2) - max(start1, start2))
    smaller = min(end1 - start1, end2 - start2)
    return overlap / smaller if smaller else 0


def filter_overlapping_windows(
    segments: list[tuple], threshold: float, target_duration: float
) -> list[tuple]:
    """alm_data_overlap.py:72-112 (_filter_segments) — (end, start)
    tuples; sorted by (start, end); the early-break on start_j >= end_i
    bounds the scan to genuinely overlapping neighbors."""
    sorted_segs = sorted(segments, key=lambda x: (x[1], x[0]))
    removed: set[int] = set()
    for i in range(len(sorted_segs)):
        if i in removed:
            continue
        end_i, start_i = sorted_segs[i]
        dur_i = end_i - start_i
        for j in range(i + 1, len(sorted_segs)):
            if j in removed:
                continue
            end_j, start_j = sorted_segs[j]
            dur_j = end_j - start_j
            if start_j >= end_i:
                break
            if overlap_ratio(sorted_segs[i], sorted_segs[j]) >= threshold:
                diff_i = abs(dur_i - target_duration)
                diff_j = abs(dur_j - target_duration)
                if diff_i < diff_j:
                    removed.add(j)
                elif diff_j < diff_i:
                    removed.add(i)
                    break
                elif dur_i >= dur_j:
                    removed.add(j)
                else:
                    removed.add(i)
                    break
    return [s for k, s in enumerate(sorted_segs) if k not in removed]


def alm_window_overlap_filter(
    df: DataFrame,
    file_col: str = "file_id",
    start_col: str = "win_start",
    end_col: str = "win_end",
    threshold: float = 0.5,
    target_duration: float = 30.0,
) -> DataFrame:
    """ALMDataOverlapStage over a windows table: per file, keep the
    windows surviving :func:`filter_overlapping_windows` (semi-join on
    the reference's round-6 timestamp identity,
    alm_data_overlap.py:125-145). One applyInPandas over bookkeeping
    rows keyed by file."""
    schema = T.StructType(
        [
            T.StructField("file_id", T.LongType()),
            T.StructField("win_start", T.DoubleType()),
            T.StructField("win_end", T.DoubleType()),
        ]
    )

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        segs = [
            (float(r[end_col]), float(r[start_col])) for _, r in pdf.iterrows()
        ]
        kept = filter_overlapping_windows(segs, threshold, target_duration)
        # MULTISET membership, not a set: exact-duplicate windows are
        # deduplicated by the filter (containment => one removed), and a
        # set mask would resurrect both copies
        budget = Counter((round(e, 6), round(s, 6)) for e, s in kept)
        mask = []
        for _, r in pdf.iterrows():
            key = (round(float(r[end_col]), 6), round(float(r[start_col]), 6))
            if budget[key] > 0:
                budget[key] -= 1
                mask.append(True)
            else:
                mask.append(False)
        out = pdf.loc[mask, [file_col, start_col, end_col]]
        out.columns = ["file_id", "win_start", "win_end"]
        return out

    return df.groupBy(file_col).applyInPandas(per_file, schema=schema)


# --- snippet extraction (the decode half) ------------------------------------
# (reference alm/pretrain/extraction.py:152-260 + utils.py:172-228):
# cut the planned snippets out of the source waveform. soundfile/
# torchaudio there; the repo's stdlib WAV codec here — REAL byte-exact
# cuts; RESAMPLING is the one gated piece (torchaudio.functional.
# resample — a polyphase filter) and is an injectable plug point.

_SNIPPET_ID_RESERVED_CHARS = (".", "/", "\\")
_HISTOGRAM_BIN_WIDTH_SEC = 30.0


def make_snippet_id(original_id: str, start_sec: float, end_sec: float) -> str:
    """utils.py:175-205: ``<id>-<st>_<ms>-<en>_<ms>`` with ``.``/path
    separators sanitized so ``<snippet_id>.<ext>`` survives
    WebDataset-style first-dot key grouping."""
    safe_id = original_id
    for ch in _SNIPPET_ID_RESERVED_CHARS:
        safe_id = safe_id.replace(ch, "_")
    start_str = f"{start_sec:.3f}".replace(".", "_")
    end_str = f"{end_sec:.3f}".replace(".", "_")
    return f"{safe_id}-{start_str}-{end_str}"


def histogram_30s(durations: list) -> dict:
    """utils.py:209-228: dense 30-s duration histogram from bin 0."""
    if not durations:
        return {}
    max_idx = max(int(d // _HISTOGRAM_BIN_WIDTH_SEC) for d in durations)
    counts = [0] * (max_idx + 1)
    for d in durations:
        counts[int(d // _HISTOGRAM_BIN_WIDTH_SEC)] += 1
    w = int(_HISTOGRAM_BIN_WIDTH_SEC)
    return {f"{i * w}-{(i + 1) * w}": counts[i] for i in range(max_idx + 1)}


def extract_snippet_wav(
    wav: bytes,
    start_sec: float,
    end_sec: float,
    target_sample_rate: int | None = None,
    resample=None,
):
    """One snippet cut (extraction.py:233-260 frame math): frame range
    ``[floor(start*sr), ceil(end*sr))`` clamped to the file, mono mean,
    optional resample via the injected callable
    ``resample(samples, src_sr, dst_sr) -> samples``. Returns
    ``(wav_bytes, duration_sec)`` or None for an empty range."""
    import math as _math

    from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav

    ch, sr, samples = decode_wav(bytes(wav))
    if ch > 1:
        frames = samples.reshape(-1, ch)
        samples = np.rint(frames.mean(axis=1)).astype(np.int16)
    n = len(samples)
    start_frame = max(0, _math.floor(start_sec * sr))
    end_frame = min(n, _math.ceil(end_sec * sr))
    if end_frame <= start_frame:
        return None
    cut = samples[start_frame:end_frame]
    out_sr = sr
    if target_sample_rate is not None and target_sample_rate != sr:
        if resample is None:
            raise NotImplementedError(
                "resampling needs an injected resample(samples, src, dst) "
                "(torchaudio polyphase resample is the reference path)"
            )
        cut = resample(cut, sr, target_sample_rate)
        out_sr = target_sample_rate
    return encode_wav(np.asarray(cut, dtype=np.int16), out_sr), len(cut) / out_sr


_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("snippet_idx", T.IntegerType()),
        T.StructField("snippet_id", T.StringType()),
        T.StructField("wav", T.BinaryType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
)


def alm_extract_snippets(
    audio_df: DataFrame,
    plan_df: DataFrame,
    file_col: str = "file_id",
    wav_col: str = "wav",
    id_col: str | None = None,
) -> DataFrame:
    """Cut every planned snippet out of its source waveform. The PLAN
    side (tiny bookkeeping rows) is broadcast onto the audio scan, so
    waveform bytes never shuffle; one row out per (file, snippet).
    ``id_col`` (when the audio frame carries the original manifest id)
    names snippets from that id — the tar-member/manifest naming the
    reference uses; default falls back to the numeric file id."""
    plan = (
        plan_df.select(file_col, "snippet_idx", "snip_start", "snip_end")
        .dropDuplicates([file_col, "snippet_idx"])
        .groupBy(file_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("snippet_idx", "snip_start", "snip_end")
                )
            ).alias("_plan")
        )
    )
    name_col = id_col or file_col
    sel = [file_col, wav_col] if id_col is None else [file_col, id_col, wav_col]
    joined = audio_df.select(*sel).join(F.broadcast(plan), on=file_col)

    def gen(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                for p in r["_plan"]:
                    res = extract_snippet_wav(
                        r[wav_col], float(p["snip_start"]), float(p["snip_end"])
                    )
                    if res is None:
                        continue
                    blob, dur = res
                    rows.append(
                        (
                            int(r[file_col]),
                            int(p["snippet_idx"]),
                            make_snippet_id(
                                str(r[name_col]),
                                float(p["snip_start"]),
                                float(p["snip_end"]),
                            ),
                            blob,
                            dur,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "snippet_idx", "snippet_id", "wav",
                    "duration_sec",
                ],
            )

    return joined.mapInPandas(gen, _EXTRACT_SCHEMA)


# --- ALM data builder (training-window construction) -------------------------
# (reference audio/alm/alm_data_builder.py:60-291): build
# target-duration training windows from diarized segments, gated on
# sample rate, per-segment bandwidth, speaker count, and window
# duration, with optional tail-segment truncation and full loss
# accounting. Behavioral port; drop-field filtering and the stats
# contract (incl. lost_win_full_data debug entries) preserved.


def _get_bandwidth(seg: dict) -> int:
    return (seg.get("metrics") or {}).get("bandwidth", 0)


def _speaker_durations(segments: list) -> dict:
    out: dict = {}
    for s in segments:
        spk = s.get("speaker")
        if spk:
            out[spk] = out.get(spk, 0) + (s["end"] - s["start"])
    return out


def _truncate_segment(seg: dict, truncated_end: float) -> dict:
    """alm_data_builder.py:75-90: keep only words ending by
    truncated_end; text/end rebuilt from the kept words."""
    part = seg.copy()
    kept = []
    actual_end = seg["start"]
    for w in seg.get("words", []):
        if w["end"] <= truncated_end:
            kept.append(w.copy())
            actual_end = w["end"]
    part["words"] = kept
    part["text"] = " ".join(w.get("word", "") for w in kept if w.get("word"))
    part["end"] = actual_end
    return part


def build_alm_windows(
    entry: dict,
    target_window_duration: float = 120.0,
    tolerance: float = 0.1,
    min_bandwidth: int = 8000,
    min_sample_rate: int = 16000,
    min_speakers: int = 2,
    max_speakers: int = 5,
    truncation: bool = True,
    drop_fields: str = "words",
    drop_fields_top_level: str = "words,segments",
) -> dict:
    """ALMDataBuilderStage._process_single_entry port: returns the entry
    with ``windows`` (each: segments + top-5 padded speaker_durations),
    ``stats`` (the full loss-accounting dict) and
    ``truncation_events``."""
    tol = target_window_duration * tolerance
    min_duration = target_window_duration - tol
    max_duration = target_window_duration + tol
    drop = {f.strip() for f in drop_fields.split(",") if f.strip()}
    drop_top = {f.strip() for f in drop_fields_top_level.split(",") if f.strip()}

    segments = entry.get("segments", [])
    total_dur = sum(s["end"] - s["start"] for s in segments)
    stat = {
        "total_segments": len(segments), "total_dur": total_dur,
        "swift_path": entry.get("swift_audio_filepath", ""),
        "audio_sample_rate": entry.get("audio_sample_rate", 0),
        "lost_bw": 0, "dur_lost_bw": 0.0, "lost_sr": 0, "dur_lost_sr": 0.0,
        "lost_spk": 0, "dur_lost_spk": 0.0, "lost_win": 0,
        "dur_lost_win": 0.0, "lost_no_spkr": 0, "dur_lost_no_spkr": 0.0,
        "lost_next_seg_bm": 0, "dur_lost_next_seg_bm": 0.0,
        "lost_win_full_data": [],
    }
    truncation_events = 0

    if entry.get("audio_sample_rate", 0) < min_sample_rate:
        stat["lost_sr"] = len(segments)
        stat["dur_lost_sr"] = total_dur
        return {
            "audio_filepath": entry.get("audio_filepath"),
            "windows": [], "stats": stat,
            "truncation_events": truncation_events,
        }

    def record_loss(seg, start_idx, curr_idx, window_segs):
        seg_dur = seg["end"] - seg["start"]
        stat["lost_win"] += 1
        stat["dur_lost_win"] += seg_dur
        nxt = segments[min(curr_idx, len(segments) - 1)]
        if nxt.get("speaker", "no-speaker") == "no-speaker":
            stat["lost_no_spkr"] += 1
            stat["dur_lost_no_spkr"] += seg_dur
        elif _get_bandwidth(nxt) < min_bandwidth:
            stat["lost_next_seg_bm"] += 1
            stat["dur_lost_next_seg_bm"] += seg_dur
        stat["lost_win_full_data"].append(
            {
                "index": start_idx,
                "window_segs": window_segs,
                "next_seg": {k: v for k, v in nxt.items() if k not in drop},
                "prev_seg": {
                    k: v
                    for k, v in segments[max(start_idx - 1, 0)].items()
                    if k not in drop
                },
            }
        )

    valid_windows: list = []
    for start_idx, seg in enumerate(segments):
        if _get_bandwidth(seg) < min_bandwidth:
            stat["lost_bw"] += 1
            stat["dur_lost_bw"] += seg["end"] - seg["start"]
            continue
        window_segs: list = []
        window_start = seg["start"]
        window_end = seg["end"]
        curr_idx = start_idx
        for curr_idx in range(start_idx, len(segments)):
            curr_seg = segments[curr_idx]
            if _get_bandwidth(curr_seg) < min_bandwidth:
                break
            potential = curr_seg["end"] - window_start
            if potential > max_duration:
                if not truncation:
                    break
                truncated_end = window_start + max_duration
                if curr_seg["start"] >= truncated_end:
                    break
                truncation_events += 1
                part = _truncate_segment(curr_seg, truncated_end)
                spk = _speaker_durations([*window_segs, part])
                if len(spk) > max_speakers or "no-speaker" in spk:
                    break
                window_segs.append(
                    {k: v for k, v in part.items() if k not in drop}
                )
                window_end = part["end"]
                break
            spk = _speaker_durations([*window_segs, curr_seg])
            if len(spk) > max_speakers or "no-speaker" in spk:
                break
            window_end = curr_seg["end"]
            window_segs.append(
                {k: v for k, v in curr_seg.items() if k not in drop}
            )
        window_dur = window_end - window_start
        if not (min_duration <= window_dur <= max_duration):
            record_loss(seg, start_idx, curr_idx, window_segs)
            continue
        if len(window_segs) < 2 or any(
            _get_bandwidth(s) < min_bandwidth for s in window_segs
        ):
            record_loss(seg, start_idx, curr_idx, window_segs)
            continue
        spk = _speaker_durations(window_segs)
        if not min_speakers <= len(spk) <= max_speakers or "no-speaker" in spk:
            stat["lost_spk"] += 1
            stat["dur_lost_spk"] += seg["end"] - seg["start"]
            continue
        spk_durations = sorted(spk.values(), reverse=True)[:5]
        spk_durations += [0.0] * (5 - len(spk_durations))
        valid_windows.append(
            {"segments": window_segs, "speaker_durations": spk_durations}
        )

    result = {k: v for k, v in entry.items() if k not in drop_top}
    result["windows"] = valid_windows
    result["stats"] = stat
    result["truncation_events"] = truncation_events
    return result


def alm_data_builder(
    df: DataFrame,
    entry_col: str = "entry",
    **kw,
) -> DataFrame:
    """Spark form over JSON manifest rows: one Arrow pass, per-entry
    window construction (no shuffle)."""

    @F.pandas_udf(T.StringType())
    def _build(entries: pd.Series) -> pd.Series:
        return pd.Series(
            [
                json.dumps(
                    build_alm_windows(json.loads(e) if e else {}, **kw),
                    ensure_ascii=False,
                )
                for e in entries
            ]
        )

    return df.withColumn(entry_col, _build(F.col(entry_col)))

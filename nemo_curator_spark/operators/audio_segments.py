"""Audio segment concatenation + timestamp remapping, Spark-first
(reference ``stages/audio/preprocessing/concatenation.py`` +
``stages/audio/postprocessing/timestamp_mapper.py``).

The reference flow: VAD cuts a file into segments (model-gated) →
``SegmentConcatenationStage`` splices the kept segments into one
waveform with silence gaps, recording a concat-space→original-file
mapping per segment → downstream spans (ASR, diarization) measured in
concat space are translated back to original-file positions by
``TimestampMapperStage._translate_to_original``.

Everything except the VAD network is deterministic integer interval
arithmetic and is expressed declaratively here:

* :func:`segment_mappings` — the bookkeeping half of concatenation as
  ONE window cumsum per file (no UDF, one shuffle on the file id).
* :func:`translate_to_original` — the timestamp mapper's overlap
  translation as a range join (file equi-key + interval overlap
  predicate; AQE handles the skew, the file key bounds the fan-out).
* :func:`concat_wav_segments` — the waveform half over REAL binary WAV
  columns via the stdlib codec (applyInPandas per file; the per-file
  accumulator is inherently sequential), byte-round-trip tested.

Scale shape: mappings and translation never touch audio bytes, so the
100-TB waveform column stays on scan partitions and only the tiny
(file, segment, ms) rows shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def segment_mappings(
    df: DataFrame,
    silence_ms: int = 500,
    file_col: str = "file_id",
    segment_col: str = "segment_num",
    start_col: str = "start_ms",
    end_col: str = "end_ms",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Concat-space mapping rows (concatenation.py:146-236, the
    bookkeeping half): segments ordered by (segment_num, start_ms) are
    laid head-to-tail with ``silence_ms`` between consecutive segments;
    each keeps its original span (``end <= start`` falls back to
    ``start + duration``, the reference's orig_end fix-up).

    Output: one row per segment with original_start_ms / original_end_ms
    / concat_start_ms / concat_end_ms / segment_index.

    PRECONDITION: the input rows must be exactly the segments that will
    be (or were) spliced — this fast path does pure bookkeeping and
    cannot know about decode failures or rate mismatches. When splicing
    real WAV bytes, use the ``mappings`` column :func:`concat_wav_segments`
    builds DURING the splice (reference behavior) so skipped segments
    never occupy phantom concat-space."""
    w = Window.partitionBy(file_col).orderBy(segment_col, start_col)
    dur = F.col(duration_col)
    cum_prev = F.coalesce(
        F.sum(dur).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    idx = F.row_number().over(w) - 1
    concat_start = cum_prev + idx * F.lit(silence_ms)
    orig_end = F.when(
        F.col(end_col) <= F.col(start_col), F.col(start_col) + dur
    ).otherwise(F.col(end_col))
    return df.select(
        F.col(file_col),
        F.col(start_col).alias("original_start_ms"),
        orig_end.alias("original_end_ms"),
        concat_start.alias("concat_start_ms"),
        (concat_start + dur).alias("concat_end_ms"),
        F.col(segment_col).alias("segment_index"),
    )


def translate_to_original(
    spans: DataFrame,
    mappings: DataFrame,
    file_col: str = "file_id",
    start_col: str = "concat_start_ms",
    end_col: str = "concat_end_ms",
) -> DataFrame:
    """TimestampMapperStage._translate_to_original
    (timestamp_mapper.py:74-103) as a range join: every (file,
    concat-span) row joins the file's mappings it overlaps, clips the
    overlap, and offsets it back into original-file coordinates.
    Zero-length overlaps are dropped, exactly as the reference's
    ``duration <= 0`` guard does."""
    s = spans.select(
        F.col(file_col).alias("_file"),
        F.col(start_col).alias("_cs"),
        F.col(end_col).alias("_ce"),
    )
    m = mappings.select(
        F.col(file_col).alias("_mfile"),
        "original_start_ms",
        "concat_start_ms",
        "concat_end_ms",
        "segment_index",
    )
    joined = s.join(
        m,
        (F.col("_file") == F.col("_mfile"))
        & (F.col("concat_end_ms") > F.col("_cs"))
        & (F.col("concat_start_ms") < F.col("_ce")),
    )
    ov_start = F.greatest(F.col("_cs"), F.col("concat_start_ms"))
    ov_end = F.least(F.col("_ce"), F.col("concat_end_ms"))
    dur = ov_end - ov_start
    return (
        joined.where(dur > 0)
        .select(
            F.col("_file").alias(file_col),
            F.col("_cs").alias("span_start_ms"),
            F.col("_ce").alias("span_end_ms"),
            "segment_index",
            (
                F.col("original_start_ms") + (ov_start - F.col("concat_start_ms"))
            ).alias("original_start_ms"),
            (
                F.col("original_start_ms") + (ov_end - F.col("concat_start_ms"))
            ).alias("original_end_ms"),
            dur.alias("duration_ms"),
        )
    )


def concat_wav_segments(
    df: DataFrame,
    silence_ms: int = 500,
    file_col: str = "file_id",
    segment_col: str = "segment_num",
    wav_col: str = "wav",
    start_col: str = "start_ms",
    end_col: str = "end_ms",
) -> DataFrame:
    """Waveform half of SegmentConcatenationStage over real binary WAV
    columns: per file, decode each segment with the stdlib codec, splice
    with ``silence_ms`` of zeros between consecutive segments (none
    trailing), re-encode. Segments that fail to decode or whose sample
    rate differs from the file's first kept segment are skipped,
    mirroring the reference's skip-and-warn — and, like the reference
    (concatenation.py:146-236), the concat-space→original mapping is
    built DURING the splice so skipped segments never occupy phantom
    concat-space (pass this ``mappings`` column, exploded, to
    :func:`translate_to_original`; the standalone
    :func:`segment_mappings` is the bytes-free fast path for
    pre-validated segments). Optional ``start_col``/``end_col`` carry
    the original-file span; absent columns default to 0 (the reference's
    ``end <= start -> start + duration`` fix-up applies)."""
    from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav

    id_type = dict(df.dtypes)[file_col]  # string paths / UUIDs work too
    out_schema = (
        f"{file_col} {id_type}, wav binary, sample_rate int, num_segments int, "
        "total_duration_sec double, "
        "mappings array<struct<original_start_ms:long, original_end_ms:long, "
        "concat_start_ms:long, concat_end_ms:long, segment_index:long>>"
    )
    sort_cols = [segment_col] + (
        [start_col] if start_col in df.columns else []
    )

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        # same order as segment_mappings (tie-break on start_ms) so the
        # two documented paths agree on duplicate segment numbers
        pdf = pdf.sort_values(sort_cols)
        # decode-then-vectorize (round-5 item: no iterrows in the splice):
        # 1) decode every segment once; 2) the keep mask and all mapping
        # arithmetic are array ops; only the final interleave walks a list
        decoded: list = []
        for blob in pdf[wav_col]:
            try:
                decoded.append(decode_wav(bytes(blob)))
            except Exception:
                decoded.append(None)
        sr = next((d[1] for d in decoded if d is not None), None)
        keep = np.array(
            [d is not None and d[1] == sr for d in decoded], dtype=bool
        )
        if sr is None or not keep.any():
            return pd.DataFrame(
                columns=[
                    file_col, "wav", "sample_rate", "num_segments",
                    "total_duration_sec", "mappings",
                ]
            )
        samples = [decoded[i][2] for i in np.flatnonzero(keep)]
        kept = pdf.loc[keep]
        # ms truncation mirrors the reference exactly
        # (concatenation.py:186) — sub-ms drift between bookkeeping and
        # waveform is inherited reference behavior
        dur_ms = np.array(
            [int(1000 * len(s) / sr) for s in samples], dtype=np.int64
        )
        # concat-space spans: cumulative (duration + silence), no silence
        # before the first segment
        starts = np.zeros(len(dur_ms), dtype=np.int64)
        if len(dur_ms) > 1:
            starts[1:] = np.cumsum(dur_ms[:-1] + silence_ms)

        def _ms_arr(col):
            if col not in kept.columns:
                return np.zeros(len(kept), dtype=np.int64)
            v = pd.to_numeric(kept[col], errors="coerce").fillna(0)
            return v.to_numpy(dtype=np.int64)  # NULL span -> 0

        orig_start = _ms_arr(start_col)
        orig_end = _ms_arr(end_col)
        fix = orig_end <= orig_start  # reference end<=start fix-up
        orig_end = np.where(fix, orig_start + dur_ms, orig_end)
        seg_idx = kept[segment_col].to_numpy(dtype=np.int64)
        mappings = [
            {
                "original_start_ms": int(orig_start[i]),
                "original_end_ms": int(orig_end[i]),
                "concat_start_ms": int(starts[i]),
                "concat_end_ms": int(starts[i] + dur_ms[i]),
                "segment_index": int(seg_idx[i]),
            }
            for i in range(len(samples))
        ]
        silence = np.zeros(int(silence_ms * sr / 1000), dtype=samples[0].dtype)
        parts: list[np.ndarray] = []
        for i, s in enumerate(samples):
            if i:
                parts.append(silence)
            parts.append(s)
        combined = np.concatenate(parts)
        return pd.DataFrame(
            [
                {
                    file_col: pdf[file_col].iloc[0],
                    "wav": encode_wav(combined, sr),
                    "sample_rate": sr,
                    "num_segments": len(mappings),
                    "total_duration_sec": len(combined) / sr,
                    "mappings": mappings,
                }
            ]
        )

    return df.groupBy(file_col).applyInPandas(per_file, schema=out_schema)

"""Video-modality operators (reference stages/video/*) — the model-free
subset. The reference's decode/transcode/TransNetV2/aesthetic stages are
ffmpeg/model-gated; what is implementable exactly is the clip-span
arithmetic, and it is implemented as PURE Spark SQL (no UDF):

* :func:`fixed_stride_clips` — FixedStrideExtractorStage
  (clipping/clip_extraction_stages.py:437-503): split each video's
  duration into [start, min(start+len, duration)) spans every ``stride``
  seconds, keep spans >= ``min_clip_length_s``, optional per-video clip
  limit, frame bounds = trunc(span * framerate).

The reference accumulates ``clip_start += stride`` in a float loop; this
implementation computes ``k * stride`` from a ``sequence`` — bit-identical
for strides exactly representable in binary (0.5/2.5/4.0...), which is
also what makes the whole stage reproducible in the DuckDB oracle with no
rounding at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fixed_stride_clips(
    df: DataFrame,
    clip_len_s: float,
    clip_stride_s: float,
    min_clip_length_s: float = 0.0,
    limit_clips: int = 0,
    video_col: str = "video_id",
    num_frames_col: str = "num_frames",
    framerate_col: str = "framerate",
) -> DataFrame:
    """(video_id, clip_idx, start_s, end_s, start_frame, end_frame) —
    one row per extracted clip. Videos with framerate <= 0 or missing
    metadata yield no clips (the stage skips them)."""
    duration = F.col(num_frames_col) / F.col(framerate_col)
    n_starts = F.ceil(duration / F.lit(clip_stride_s)).cast("int")
    ks = F.sequence(F.lit(0), F.greatest(n_starts - 1, F.lit(0)))
    base = (
        df.where(
            F.col(framerate_col) > 0
        )
        .withColumn("_dur", duration)
        .withColumn("_k", F.explode(ks))
        .withColumn("_start", F.col("_k") * F.lit(clip_stride_s))
        .where(F.col("_start") < F.col("_dur"))
        .withColumn(
            "_end", F.least(F.col("_start") + F.lit(clip_len_s), F.col("_dur"))
        )
        .where((F.col("_end") - F.col("_start")) >= min_clip_length_s)
    )
    out = base.select(
        F.col(video_col),
        F.col("_k").alias("clip_idx"),
        F.col("_start").alias("start_s"),
        F.col("_end").alias("end_s"),
        (F.col("_start") * F.col(framerate_col)).cast("int").alias("start_frame"),
        (F.col("_end") * F.col(framerate_col)).cast("int").alias("end_frame"),
    )
    if limit_clips > 0:
        from pyspark.sql.window import Window

        w = Window.partitionBy(video_col).orderBy("clip_idx")
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= limit_clips)
            .drop("_rn")
        )
    return out

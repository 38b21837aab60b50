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

import pandas as pd  # module-global: pandas_udf hint resolution needs it
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
    last_k = F.greatest(n_starts - 1, F.lit(0))
    if limit_clips > 0:
        # limit pushdown into the generator: both post-explode filters
        # (start < dur; clip length >= min) are non-increasing in k, so
        # survivors are always a PREFIX of 0..n_starts-1 and "first
        # limit_clips by clip_idx" == "k < limit_clips". Clamping the
        # sequence never generates the excess rows (a 10-hour video at
        # 2.5 s stride is 14k clips; limit 6 generates 6) and removes the
        # row_number window — one exchange+sort — this used to cost.
        last_k = F.least(last_k, F.lit(limit_clips - 1))
    ks = F.sequence(F.lit(0), last_k)
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
    return out


# --- TransNetV2 scene extraction, model-free half ---------------------------
# (reference clipping/transnetv2_extraction.py:197-326). The TransNetV2
# NETWORK is model-gated (torch absent); everything downstream of its
# per-frame transition predictions — scene assembly, truncate/stride span
# generation, cropping, min-length filtering — is exact integer logic and
# is implemented twice: a pure-python port (the pyref-style pin) and a
# window-function Spark form used by the value-hash gate.


def get_scenes_py(
    predictions: list[int], entire_scene_as_clip: bool = True
) -> list[tuple[int, int]]:
    """Direct port of _get_scenes (transnetv2_extraction.py:197-226),
    including its two quirks: a mid scene ends AT the transition index,
    while the trailing scene ends at the LAST index (one frame short),
    and the whole-video fallback ends at len(predictions)."""
    scenes: list[tuple[int, int]] = []
    t, t_prev, start = -1, 0, 0
    i = -1
    for i, t in enumerate(predictions):
        if t_prev == 1 and t == 0:
            start = i
        if t_prev == 0 and t == 1 and i != 0:
            scenes.append((start, i))
        t_prev = t
    if scenes and t == 0:
        scenes.append((start, i))
    if not scenes and entire_scene_as_clip:
        scenes.append((0, len(predictions)))
    return scenes


def filter_scenes_py(
    scenes: list[tuple[int, int]],
    min_length: int | None = None,
    max_length: int | None = None,
    max_length_mode: str = "truncate",
    crop_length: int | None = None,
) -> list[tuple[int, int]]:
    """Direct port of _get_filtered_scenes/_crop_scenes/_create_spans
    (transnetv2_extraction.py:229-326): max-length handling first
    (truncate, or stride with only the FINAL short span dropped), then
    crop, then the min-length filter."""
    out = [tuple(s) for s in scenes]
    if max_length is not None:
        if max_length_mode == "truncate":
            out = [(s, min(s + max_length, e)) for s, e in out]
        elif max_length_mode == "stride":
            spans = []
            for s, e in out:
                cur = s
                while cur < e:
                    end = min(cur + max_length, e)
                    if min_length and (end - cur) < min_length and end == e:
                        break
                    spans.append((cur, end))
                    cur = end
            out = spans
        else:
            raise NotImplementedError(max_length_mode)
    if crop_length is not None:
        out = [
            (s + crop_length, e - crop_length)
            for s, e in out
            if (e - crop_length) - (s + crop_length) > 0
        ]
    if min_length is not None:
        out = [(s, e) for s, e in out if e - s >= min_length]
    return out


def scene_boundaries(
    df: DataFrame,
    video_col: str = "video_id",
    frame_col: str = "frame",
    transition_col: str = "is_transition",
    entire_scene_as_clip: bool = True,
) -> DataFrame:
    """(video, frame, is_transition) rows → (video, scene_start,
    scene_end) — the Spark window form of :func:`get_scenes_py`,
    bit-identical on contiguous 0-based frame indices (pinned by
    tests). One shuffle on the video id; no UDF.

    Scale shape: everything is a window over (video, frame) — at 100 TB
    of frame rows this is one hash exchange on video_id and a sort
    within partitions, exactly what per-video sessionization costs."""
    from pyspark.sql.window import Window

    flg = (
        df.select(
            F.col(video_col).alias("_v"),
            F.col(frame_col).alias("_f"),
            F.col(transition_col).cast("int").alias("_t"),
        )
        .withColumn("_prev", F.lag("_t", 1, 0).over(
            Window.partitionBy("_v").orderBy("_f")
        ))
    )
    wv = Window.partitionBy("_v")
    wo = Window.partitionBy("_v").orderBy("_f")
    flg = (
        flg.withColumn("_is_end", (F.col("_t") == 1) & (F.col("_prev") == 0) & (F.col("_f") != 0))
        .withColumn("_marker", F.when((F.col("_t") == 0) & (F.col("_prev") == 1), F.col("_f")))
        .withColumn(
            "_start",
            F.coalesce(
                F.max("_marker").over(
                    wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                F.lit(0),
            ),
        )
        .withColumn("_last", F.max("_f").over(wv))
        .withColumn("_n", F.count(F.lit(1)).over(wv))
        .withColumn("_has_end", F.max(F.col("_is_end").cast("int")).over(wv))
    )
    # ONE pass emits all three scene kinds (mid / trailing / whole-video)
    # via mutually-exclusive row predicates instead of a 3-branch union —
    # a union re-derives the window subtree per branch (3 exchanges of
    # the full frame table at scale; this shape does 1).
    cond_mid = F.col("_is_end")
    cond_trail = (
        (F.col("_f") == F.col("_last"))
        & (F.col("_t") == 0)
        & (F.col("_has_end") == 1)
    )
    cond_whole = (
        (F.col("_has_end") == 0) & (F.col("_f") == 0)
        if entire_scene_as_clip
        else F.lit(False)
    )
    return flg.where(cond_mid | cond_trail | cond_whole).select(
        F.col("_v").alias(video_col),
        F.when(cond_whole, F.lit(0))
        .otherwise(F.col("_start"))
        .alias("scene_start"),
        F.when(cond_whole, F.col("_n")).otherwise(F.col("_f")).alias("scene_end"),
    )


def filter_scenes(
    df: DataFrame,
    min_length: int | None = None,
    max_length: int | None = None,
    max_length_mode: str = "truncate",
    crop_length: int | None = None,
    start_col: str = "scene_start",
    end_col: str = "scene_end",
) -> DataFrame:
    """Spark form of :func:`filter_scenes_py` — pure Column arithmetic
    (the stride mode is a ``sequence`` explode); same operation order:
    max-length, crop, min-length."""
    s, e = F.col(start_col), F.col(end_col)
    if max_length is not None:
        if max_length_mode == "truncate":
            df = df.withColumn(end_col, F.least(s + max_length, e))
        elif max_length_mode == "stride":
            df = (
                # guard: zero-length scenes (s == e, the trailing-run
                # quirk) must yield no spans, and sequence() throws on
                # start > stop — explode of NULL drops the row instead
                df.withColumn(
                    "_span_s",
                    F.explode(
                        F.when(s < e, F.sequence(s, e - 1, F.lit(max_length)))
                    ),
                )
                .withColumn("_span_e", F.least(F.col("_span_s") + max_length, e))
                .where(
                    ~(
                        F.lit(bool(min_length))
                        & ((F.col("_span_e") - F.col("_span_s")) < F.lit(min_length or 0))
                        & (F.col("_span_e") == e)
                    )
                )
                .drop(start_col, end_col)
                .withColumnRenamed("_span_s", start_col)
                .withColumnRenamed("_span_e", end_col)
            )
        else:
            raise NotImplementedError(max_length_mode)
        s, e = F.col(start_col), F.col(end_col)
    if crop_length is not None:
        df = (
            df.withColumn(start_col, s + crop_length)
            .withColumn(end_col, e - crop_length)
            .where(F.col(end_col) - F.col(start_col) > 0)
        )
        s, e = F.col(start_col), F.col(end_col)
    if min_length is not None:
        df = df.where(e - s >= min_length)
    return df


# --- ClipFrameExtraction decode plan, model-free half -----------------------
# (reference clipping/clip_frame_extraction.py:34-146 +
# utils/decoder_utils.py:400-467,685-745). The decoders (PyAV/decord) are
# library-gated; the deterministic half is WHICH frames get decoded: the
# closest-timestamp sampling grid, the middle-frame policy, and the
# LCM-fps decode-once-stride-per-target optimization.


def sample_closest_py(
    src: "np.ndarray",
    sample_rate: float,
    start: float | None = None,
    stop: float | None = None,
    endpoint: bool = True,
    dedup: bool = True,
):
    """Direct port of decoder_utils.sample_closest:400-467 (float32 grid,
    half-interval endpoint epsilon, unique+counts dedup)."""
    import numpy as np

    if sample_rate <= 0:
        raise ValueError(f"sample rate must be > 0, got {sample_rate}")
    interval = 1.0 / sample_rate
    _start = start if start is not None else src[0]
    _stop = stop if stop is not None else src[-1]
    if endpoint:
        _stop += interval * 0.5
    samples = np.arange(_start, _stop, interval, dtype=np.float32)
    idx = np.searchsorted(src, samples)
    idx = np.clip(idx, 1, len(src) - 1)
    left = src[idx - 1]
    right = src[idx]
    indices = np.where(samples - left <= right - samples, idx - 1, idx).astype(
        np.int32
    )
    if not endpoint and np.isclose(samples[-1], _stop):
        indices = indices[:-1]
    if dedup:
        indices, counts = np.unique(indices, return_counts=True)
    else:
        counts = np.ones_like(indices)
    return indices, counts


def middle_frame_index(num_frames: int) -> int:
    """FrameExtractionPolicy.middle (decoder_utils.py:718-721): the
    lower-middle index for even counts."""
    return num_frames // 2 - 1 if num_frames % 2 == 0 else num_frames // 2


def frame_sample_plan_py(
    num_frames: int,
    framerate: float,
    target_fps: list[float],
    policy: str = "sequence",
) -> dict[float, list[int]]:
    """Per-clip decode plan: which frame ids each target fps needs,
    assuming uniform timestamps k/framerate (constant-rate clips — the
    plan half of ClipFrameExtractionStage.process:74-146). Applies the
    reference's LCM optimization verbatim when every target fps is an
    integer and there are several: decode once at lcm fps, then each
    target takes every int(lcm/fps)-th of the UNIQUE decoded ids."""
    import math

    import numpy as np

    if policy == "middle":
        mid = middle_frame_index(num_frames)
        return {fps: [mid] for fps in target_fps}
    if policy != "sequence":
        raise NotImplementedError(policy)
    if num_frames == 1:
        # documented deviation: the reference's closest-index arithmetic
        # degenerates to index -1 on single-frame clips (np.clip(0,1,0)
        # with min>max); a decode plan must never request frame -1, so a
        # 1-frame clip plans its only frame for every target.
        return {fps: [0] for fps in target_fps}
    ts = np.arange(num_frames, dtype=np.float64) / framerate
    use_lcm = len(target_fps) > 1 and all(
        float(f).is_integer() for f in target_fps
    )
    if use_lcm:
        lcm = math.lcm(*[int(f) for f in target_fps])
        ids, _ = sample_closest_py(ts, lcm)
        return {fps: ids[:: int(lcm / fps)].tolist() for fps in target_fps}
    out = {}
    for fps in target_fps:
        ids, _ = sample_closest_py(ts, fps)
        out[fps] = ids.tolist()
    return out


def clip_frame_sample_plan(
    df: DataFrame,
    target_fps: list[float],
    policy: str = "sequence",
    clip_col: str = "clip_id",
    num_frames_col: str = "num_frames",
    framerate_col: str = "framerate",
) -> DataFrame:
    """Row-multiplying decode-plan stage: (clip, num_frames, framerate)
    → one row per (clip, target_fps, frame_idx) to hand the (gated)
    decoder. One Arrow pass + posexplode; no shuffle."""
    from pyspark.sql import types as T

    @F.pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("fps", T.DoubleType()),
                    T.StructField("frame_idx", T.IntegerType()),
                ]
            )
        )
    )
    def _plan(ns: pd.Series, frs: pd.Series) -> pd.Series:
        out = []
        for n, fr in zip(ns, frs):
            if n is None or fr is None or n <= 0 or fr <= 0:
                out.append([])
                continue
            plan = frame_sample_plan_py(int(n), float(fr), target_fps, policy)
            out.append(
                [
                    (float(fps), int(i))
                    for fps, ids in plan.items()
                    for i in ids
                ]
            )
        return pd.Series(out)

    return (
        df.select(
            F.col(clip_col),
            F.explode(
                _plan(F.col(num_frames_col), F.col(framerate_col))
            ).alias("_p"),
        )
        .select(
            clip_col,
            F.col("_p.fps").alias("target_fps"),
            F.col("_p.frame_idx").alias("frame_idx"),
        )
    )

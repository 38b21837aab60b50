"""Video motion + aesthetic filtering, deterministic halves — reference
stages/video/filtering/{motion_filter,motion_vector_backend,
clip_aesthetic_filter}.py. The H.264 motion-vector DECODE (PyAV
``export_mvs``) and the CLIP aesthetic network are the gated plug
points; the motion *score* itself — flowfield painting from motion
vectors, normalized magnitudes, global mean, per-patch-min-256 over a
bilinear-downsampled per-pixel average — is pure tensor math, ported to
numpy with the same write-ordering semantics, plus an exact
re-implementation of cv2's INTER_LINEAR resize (half-pixel-center
bilinear) for the 1/256 decimation.

Motion-vector row layout (PyAV's ndarray minus the leading ``source``
column, the backend's ``mv_list[i][:, 1:]`` slice): ``[block_w,
block_h, src_x, src_y, dst_x, dst_y, flags, motion_x, motion_y,
motion_scale]`` — the flowfield paints ``-motion/scale`` over each
vector's block centered at (dst_x, dst_y), block groups processed in
the backend's fixed order (8x8, 16x16, 16x8, 8x16), later writes
winning (index_put_ accumulate=False).

Stage contracts (motion_filter.py:91-180, clip_aesthetic_filter.py:
30-120): annotate scores, move failing clips to ``filtered_clips`` with
the matching ClipStats counter, ``score_only`` keeps everything,
missing inputs score -1.0 (motion) / -1.0 with an error annotation
(aesthetic).

Spark shape: one Arrow pass over clip rows carrying packed motion
vectors (binary per frame); scores come back as typed columns. No
shuffle; at 100 TB the vectors are ~0.1% of the clip bytes and never
leave their scan partition.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MIN_SIDE_RESOLUTION = 256

_BLOCK_OPTIONS = ((8, 8), (16, 16), (16, 8), (8, 16))


@dataclass
class MotionInfo:
    """motion_vector_backend.py:47-60."""

    is_small_motion: bool
    per_patch_min_256: float
    global_mean: float


def motion_vectors_to_flowfield(
    mvs: np.ndarray, size: tuple[int, int], flow: np.ndarray | None = None
) -> np.ndarray:
    """One frame's flowfield (motion_vector_backend.py:90-170 with
    B=1): paint ``-motion/scale`` over each vector's block, block-size
    groups in the backend's order, later writes winning. ``size`` is
    (H, W)."""
    h, w = size
    if flow is None:
        flow = np.zeros((h, w, 2), dtype=np.float64)
    else:
        flow[:] = 0.0
    if mvs.size == 0:
        return flow
    mvs = np.asarray(mvs, dtype=np.float64)
    block_sizes = mvs[:, 0:2]
    dst = mvs[:, 4:6]
    motion = mvs[:, 7:9]
    scale = mvs[:, 9:10]
    with np.errstate(divide="ignore", invalid="ignore"):
        delta = np.where(scale != 0, -motion / scale, 0.0)
    for bw, bh in _BLOCK_OPTIONS:
        sel = np.flatnonzero(
            (block_sizes[:, 0] == bw) & (block_sizes[:, 1] == bh)
        )
        if sel.size == 0:
            continue
        ox = np.arange(-(bw // 2), bw // 2)
        oy = np.arange(-(bh // 2), bh // 2)
        for i in sel:
            xs = (dst[i, 0] + ox).astype(np.int64)
            ys = (dst[i, 1] + oy).astype(np.int64)
            xs = np.clip(np.where(xs > 0, xs, 0), 0, w - 1)
            ys = np.clip(np.where(ys > 0, ys, 0), 0, h - 1)
            flow[np.ix_(ys, xs)] = delta[i]
    return flow


def cv2_resize_linear(img: np.ndarray, fx: float, fy: float) -> np.ndarray:
    """cv2.resize(..., fx=fx, fy=fy, interpolation=INTER_LINEAR), exact:
    output size round(f*n), source coords via the half-pixel-center map
    ``(o + 0.5)/f - 0.5``, clamped bilinear."""
    h, w = img.shape[:2]
    out_w = max(1, round(w * fx))
    out_h = max(1, round(h * fy))
    sx = w / out_w
    sy = h / out_h
    xs = (np.arange(out_w) + 0.5) * sx - 0.5
    ys = (np.arange(out_h) + 0.5) * sy - 0.5
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    wx = np.clip(xs - x0, 0.0, 1.0)
    wy = np.clip(ys - y0, 0.0, 1.0)
    top = img[np.ix_(y0, x0)] * (1 - wx)[None, :] + img[np.ix_(y0, x1)] * wx[None, :]
    bot = img[np.ix_(y1, x0)] * (1 - wx)[None, :] + img[np.ix_(y1, x1)] * wx[None, :]
    return top * (1 - wy)[:, None] + bot * wy[:, None]


def check_if_small_motion(
    mv_list: list[np.ndarray],
    frame_shape: tuple[int, int],
    global_mean_threshold: float = 0.00098,
    per_patch_min_256_threshold: float = 0.000001,
) -> MotionInfo:
    """motion_vector_backend.py:263-320: per-frame flowfield magnitudes
    normalized by (H + W); global mean over all frames/pixels;
    per-patch min = min of the 1/256-bilinear-downsampled per-pixel
    average."""
    h, w = frame_shape[0], frame_shape[1]
    global_sum = 0.0
    per_pixel_sum = np.zeros((h, w), dtype=np.float64)
    num_frames = 0
    flow = np.zeros((h, w, 2), dtype=np.float64)
    for mv in mv_list:
        flow = motion_vectors_to_flowfield(mv, (h, w), flow)
        mag = np.sqrt((flow**2).sum(axis=2)) / (w + h)
        global_sum += float(mag.sum())
        per_pixel_sum += mag
        num_frames += 1
    if num_frames == 0:
        return MotionInfo(True, 0.0, 0.0)
    global_mean = global_sum / (num_frames * h * w)
    per_pixel_avg = per_pixel_sum / num_frames
    per_patch_min_256 = float(
        cv2_resize_linear(per_pixel_avg, 1 / 256, 1 / 256).min()
    )
    is_small = (
        global_mean < global_mean_threshold
        or per_patch_min_256 < per_patch_min_256_threshold
    )
    return MotionInfo(is_small, per_patch_min_256, global_mean)


@dataclass
class MotionFilterStage:
    """motion_filter.py:91-180 over clip dicts: score every clip (clips
    without decoded motion data get the -1.0 fake scores), annotate,
    move small-motion clips to filtered_clips + count, ``score_only``
    keeps them. ``video`` is the video_io dict shape plus per-clip
    ``decoded_motion_data = {"frames": [np arrays], "frame_size":
    (H, W)}``."""

    score_only: bool = False
    global_mean_threshold: float = 0.00098
    per_patch_min_256_threshold: float = 0.000001

    def process_video(self, video: dict) -> dict:
        passing = []
        video.setdefault("filtered_clips", [])
        video.setdefault("clip_stats", {})
        for clip in video.get("clips", []):
            dmd = clip.get("decoded_motion_data")
            if not dmd:
                fake = -1.0
                info = MotionInfo(
                    fake < self.global_mean_threshold
                    or fake < self.per_patch_min_256_threshold,
                    fake,
                    fake,
                )
            else:
                info = check_if_small_motion(
                    dmd["frames"],
                    dmd["frame_size"],
                    self.global_mean_threshold,
                    self.per_patch_min_256_threshold,
                )
            clip["decoded_motion_data"] = None
            clip["motion_score_global_mean"] = info.global_mean
            clip["motion_score_per_patch_min_256"] = info.per_patch_min_256
            if info.is_small_motion:
                if self.score_only:
                    passing.append(clip)
                else:
                    video["filtered_clips"].append(clip)
                    video["clip_stats"]["num_filtered_by_motion"] = (
                        video["clip_stats"].get("num_filtered_by_motion", 0) + 1
                    )
            else:
                passing.append(clip)
        video["clips"] = passing
        return video


@dataclass
class ClipAestheticFilterStage:
    """clip_aesthetic_filter.py:30-120 over clip dicts: score the
    extracted frames through the injectable model (``model(frames) ->
    scores``), reduce (mean|min with validation), annotate errors for
    missing buffer/frames (-1.0 score), threshold-filter with the
    matching ClipStats counter."""

    score_threshold: float = 0.5
    reduction: str = "min"
    frame_signature: str = "sequence-1.0"
    model: object | None = None

    def __post_init__(self) -> None:
        if self.reduction == "mean":
            self.reduction_fn = np.mean
        elif self.reduction == "min":
            self.reduction_fn = np.min
        else:
            msg = f"Invalid reduction: {self.reduction}"
            raise ValueError(msg)

    def process_video(self, video: dict) -> dict:
        if self.model is None:
            raise NotImplementedError(
                "no CLIP runtime in this environment; inject "
                "model(frames) -> scores"
            )
        passing = []
        video.setdefault("filtered_clips", [])
        video.setdefault("clip_stats", {})
        for clip in video.get("clips", []):
            clip.setdefault("errors", {})
            frames = (clip.get("extracted_frames") or {}).get(
                self.frame_signature
            )
            if not clip.get("buffer"):
                clip["errors"]["buffer"] = "empty"
                clip["aesthetic_score"] = -1.0
            elif frames is None:
                clip["errors"][f"frames-{self.frame_signature}"] = "missing"
                clip["aesthetic_score"] = -1.0
            else:
                clip.get("extracted_frames", {}).pop(
                    self.frame_signature, None
                )
                scores = np.asarray(self.model(frames), dtype=np.float64)
                clip["aesthetic_score"] = float(self.reduction_fn(scores))
            if clip["aesthetic_score"] < self.score_threshold:
                video["filtered_clips"].append(clip)
                video["clip_stats"]["num_filtered_by_aesthetic"] = (
                    video["clip_stats"].get("num_filtered_by_aesthetic", 0) + 1
                )
            else:
                passing.append(clip)
        video["clips"] = passing
        return video


_MOTION_SCHEMA = T.StructType(
    [
        T.StructField("motion_score_global_mean", T.DoubleType()),
        T.StructField("motion_score_per_patch_min_256", T.DoubleType()),
        T.StructField("is_small_motion", T.BooleanType()),
    ]
)


def motion_scores(
    df: DataFrame,
    mv_col: str = "mv_frames",
    h_col: str = "frame_h",
    w_col: str = "frame_w",
    global_mean_threshold: float = 0.00098,
    per_patch_min_256_threshold: float = 0.000001,
) -> DataFrame:
    """Spark form: clip rows carry their sampled motion vectors as an
    array of packed float64 binaries (one per frame, N x 10 row-major);
    one Arrow pass computes the two scores + the small-motion verdict.
    Downstream filtering is then a plain Column predicate (stays in the
    JVM plan)."""

    @F.pandas_udf(_MOTION_SCHEMA)
    def _score(
        mvs: pd.Series, hs: pd.Series, ws: pd.Series
    ) -> pd.DataFrame:
        rows = []
        for frames, h, w in zip(mvs, hs, ws):
            mv_list = [
                np.frombuffer(bytes(b), dtype=np.float64).reshape(-1, 10)
                for b in (frames or [])
            ]
            info = check_if_small_motion(
                mv_list,
                (int(h), int(w)),
                global_mean_threshold,
                per_patch_min_256_threshold,
            )
            rows.append(
                (info.global_mean, info.per_patch_min_256, info.is_small_motion)
            )
        return pd.DataFrame(
            rows,
            columns=[
                "motion_score_global_mean",
                "motion_score_per_patch_min_256",
                "is_small_motion",
            ],
        )

    out = df.withColumn(
        "_m", _score(F.col(mv_col), F.col(h_col), F.col(w_col))
    )
    return (
        out.withColumn(
            "motion_score_global_mean", F.col("_m.motion_score_global_mean")
        )
        .withColumn(
            "motion_score_per_patch_min_256",
            F.col("_m.motion_score_per_patch_min_256"),
        )
        .withColumn("is_small_motion", F.col("_m.is_small_motion"))
        .drop("_m")
    )

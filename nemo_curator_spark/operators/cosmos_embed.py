"""Cosmos-Embed1 video-embedding stages, deterministic halves —
reference stages/video/embedding/cosmos_embed1.py:29-167 and
models/cosmos_embed1.py:41-188.

What is ported exactly:

- ``formulate_input_frames`` (models/cosmos_embed1.py:109-129): the
  frame *selection* ``step = len(frames) // fn; frames[::step][:fn]``,
  the batch stack to (1, T, H, W, C) and the transpose to (1, T, C, H,
  W), followed by the processor's preprocessing — bilinear resize to
  the variant resolution (the repo's exact cv2 INTER_LINEAR formula,
  float path), rescale, and mean/std normalization. The mean/std/
  resolution/num_video_frames come from a ``CosmosProcessorConfig``;
  the HF ``AutoProcessor`` JSON is the plug point that would populate
  it (models/cosmos_embed1.py:94-98).
- the re-extraction fps-doubling loop
  (stages/video/embedding/cosmos_embed1.py:59-92): while the clip has
  fewer than ``num_video_frames`` frames, double the target fps; give
  up when the fps exceeds ``max_fps=20``. ``regen_fps_plan`` is that
  loop over an injectable ``frames_at(fps)`` counter (the ffmpeg
  re-extract is the plug point; the default counter is the sequence
  policy's ``floor(duration * fps)``).
- ``evaluate`` (models/cosmos_embed1.py:170-188): softmax over
  ``100 * video_embd @ text_embds.T`` with top-k probabilities and
  indices, float64.
- the stage error contract (stages/video/embedding/cosmos_embed1.py:
  58-102): ``errors["buffer"] = "empty"`` for missing buffers,
  ``errors["frames-<sig>"] = "missing"`` for missing extractions,
  ``extracted_frames`` cleared after formulation.

The embedding network itself (``get_video_embeddings`` on the HF
checkpoint, bfloat16/CUDA) is the gated plug point — inject any
``encoder(frames_NTCHW) -> np.ndarray`` into
``CosmosEmbed1EmbeddingStage``.

Spark shape: ``cosmos_frame_plan`` is a pure JVM Column plan
(sequence/explode, no UDF, no shuffle) computing the per-clip regen
fps, frame count, stride and selected frame indices — fully
SQL-expressible, gated by ``cosmos_frame_plan`` in ``__spark_entry__``.
Frame-tensor formulation runs as one mapInPandas pass over rows that
carry real frames; bytes stay on the scan partition.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COSMOS_EMBED1_VARIANTS_INFO = {
    "224p": "nvidia/Cosmos-Embed1-224p",
    "336p": "nvidia/Cosmos-Embed1-336p",
    "448p": "nvidia/Cosmos-Embed1-448p",
}

_VARIANT_RESOLUTION = {"224p": 224, "336p": 336, "448p": 448}


@dataclass
class CosmosProcessorConfig:
    """Stand-in for the AutoProcessor config (processor_config.json is
    the plug point — models/cosmos_embed1.py:94-107). Defaults follow
    the published CLIP-style preprocessing contract; override from the
    real JSON when weights are available."""

    num_video_frames: int = 8
    resolution: int = 336
    rescale_factor: float = 1.0 / 255.0
    image_mean: tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)

    @classmethod
    def for_variant(cls, variant: str) -> "CosmosProcessorConfig":
        return cls(resolution=_VARIANT_RESOLUTION[variant])


def _resize_linear_float(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """cv2 INTER_LINEAR on float data — the shared exact formula
    (multimodal.resize_linear_float; pdf_ingest rounds the same core to
    uint8)."""
    from nemo_curator_spark.operators.multimodal import resize_linear_float

    return resize_linear_float(img, new_w, new_h)


def formulate_input_frames(
    frames: list[np.ndarray],
    config: CosmosProcessorConfig,
) -> np.ndarray | None:
    """models/cosmos_embed1.py:109-129, exact: None (caller logs) when
    fewer frames than the target; otherwise ``frames[::step][:fn]`` with
    ``step = len // fn``, stacked to (1, T, H, W, C), transposed to
    (1, T, C, H, W), then processor preprocessing (resize -> rescale ->
    normalize) to float32."""
    fn = config.num_video_frames
    if len(frames) < fn:
        return None
    step = len(frames) // fn
    video_batch = np.expand_dims(np.stack(frames[::step][:fn]), 0)
    video_batch = np.transpose(video_batch, (0, 1, 4, 2, 3))
    res = config.resolution
    mean = np.asarray(config.image_mean, dtype=np.float64)[:, None, None]
    std = np.asarray(config.image_std, dtype=np.float64)[:, None, None]
    out = np.empty(
        (1, fn, video_batch.shape[2], res, res), dtype=np.float32
    )
    for t in range(fn):
        # (C, H, W) -> (H, W, C) for the spatial resize, back after
        chw = video_batch[0, t]
        hwc = np.transpose(chw, (1, 2, 0)).astype(np.float64)
        resized = _resize_linear_float(hwc, res, res)
        norm = (
            np.transpose(resized, (2, 0, 1)) * config.rescale_factor - mean
        ) / std
        out[0, t] = norm.astype(np.float32)
    return out


def selected_frame_indices(n_frames: int, num_video_frames: int) -> list[int]:
    """The index arithmetic of ``frames[::step][:fn]`` alone — the
    SQL-gateable core of formulate_input_frames."""
    if n_frames < num_video_frames:
        return []
    step = n_frames // num_video_frames
    return [j * step for j in range(num_video_frames)]


def regen_fps_plan(
    duration: float,
    target_fps: float,
    num_video_frames: int,
    max_fps: float = 20.0,
    frames_at=None,
) -> tuple[float, int, bool]:
    """The re-extraction loop of
    stages/video/embedding/cosmos_embed1.py:59-92 as a plan: returns
    (final_fps, n_frames, ok). ``frames_at(fps)`` is the injectable
    frame counter (default: the sequence policy's
    ``floor(duration * fps)``); the loop doubles fps while the count is
    short and fails once fps would exceed ``max_fps`` (the reference
    breaks with an error log and formulate returns None)."""
    if frames_at is None:
        def frames_at(fps: float) -> int:
            return int(math.floor(duration * fps))

    fps = target_fps
    n = frames_at(fps)
    while n < num_video_frames:
        fps *= 2
        if fps > max_fps:
            return fps, n, False
        n = frames_at(fps)
    return fps, n, True


def evaluate(
    video_embd: np.ndarray, text_embds: list[np.ndarray]
) -> tuple[list[float], list[int]]:
    """models/cosmos_embed1.py:170-188, float64: softmax over
    ``100 * v @ T.T``, top-k (k = all texts) probabilities + indices."""
    t = np.concatenate([np.asarray(x, dtype=np.float64) for x in text_embds], 0)
    v = np.asarray(video_embd, dtype=np.float64)
    logits = 100.0 * (v @ t.T)
    m = logits.max(axis=-1, keepdims=True)
    e = np.exp(logits - m)
    probs = e / e.sum(axis=-1, keepdims=True)
    order = np.argsort(-probs[0], kind="stable")
    return probs[0][order].tolist(), order.tolist()


@dataclass
class CosmosEmbed1FrameCreationStage:
    """stages/video/embedding/cosmos_embed1.py:29-102 process contract
    over clip dicts: buffer/frames error bookkeeping, the fps-doubling
    re-extract via an injectable ``extractor(buffer, fps) -> frames``,
    formulation, and clearing ``extracted_frames``."""

    variant: str = "336p"
    target_fps: float = 2.0
    max_fps: float = 20.0
    extractor: object | None = None
    config: CosmosProcessorConfig | None = None

    def __post_init__(self):
        if self.config is None:
            self.config = CosmosProcessorConfig.for_variant(self.variant)
        # the exact cross-stage cache-key format
        # (stages/video/embedding/cosmos_embed1.py:51-54 via
        # utils/decoder_utils.FrameExtractionSignature)
        from nemo_curator_spark.operators.decoder_utils import (
            FrameExtractionPolicy,
            FrameExtractionSignature,
        )

        self.frame_extraction_signature = FrameExtractionSignature(
            extraction_policy=FrameExtractionPolicy.sequence,
            target_fps=self.target_fps,
        ).to_str()

    def process_clip(self, clip: dict) -> dict:
        sig = self.frame_extraction_signature
        errors = clip.setdefault("errors", {})
        if clip.get("buffer") is None:
            errors["buffer"] = "empty"
            return clip
        extracted = clip.get("extracted_frames") or {}
        if sig not in extracted:
            errors[f"frames-{sig}"] = "missing"
            return clip
        frames = extracted[sig]
        target = self.config.num_video_frames
        regen_fps = self.target_fps
        while len(frames) < target:
            regen_fps *= 2
            if regen_fps > self.max_fps:
                break
            if self.extractor is None:
                break
            frames = self.extractor(clip["buffer"], regen_fps)
        clip["cosmos_embed1_frames"] = formulate_input_frames(
            list(frames), self.config
        )
        clip["extracted_frames"] = {}
        return clip


@dataclass
class CosmosEmbed1EmbeddingStage:
    """stages/video/embedding/cosmos_embed1.py:109-163 process contract:
    missing frames -> ``errors["cosmos_embed1_frames"] = "empty"``;
    empty embedding -> ``errors["cosmos_embed1_embedding"] = "failed"``;
    optional texts_to_verify -> ``cosmos_embed1_text_match = (best_text,
    best_prob)``; frames freed after embedding. The network is the
    injectable ``encoder(frames) -> np.ndarray``; the text side is the
    injectable ``text_encoder(text) -> np.ndarray``."""

    encoder: object | None = None
    text_encoder: object | None = None
    texts_to_verify: list[str] | None = None

    def process_clip(self, clip: dict) -> dict:
        errors = clip.setdefault("errors", {})
        frames = clip.get("cosmos_embed1_frames")
        if frames is None:
            errors["cosmos_embed1_frames"] = "empty"
            return clip
        if self.encoder is None:
            msg = "Model is not loaded"
            raise RuntimeError(msg)
        embedding = np.asarray(self.encoder(frames))
        if embedding.size == 0:
            errors["cosmos_embed1_embedding"] = "failed"
            # documented improvement over the reference: its process()
            # falls through to evaluate() on the empty tensor and dies
            # in topk/[0]; a Spark task must record the clip error and
            # keep the batch alive
            clip["cosmos_embed1_frames"] = None
            return clip
        clip["cosmos_embed1_embedding"] = embedding
        if self.texts_to_verify:
            if self.text_encoder is None:
                msg = "Model is not loaded"
                raise RuntimeError(msg)
            text_embds = [
                np.asarray(self.text_encoder(x)) for x in self.texts_to_verify
            ]
            probs, idxs = evaluate(embedding, text_embds)
            clip["cosmos_embed1_text_match"] = (
                self.texts_to_verify[idxs[0]],
                probs[0],
            )
        clip["cosmos_embed1_frames"] = None
        return clip


def cosmos_frame_plan(
    df: DataFrame,
    duration_col: str = "duration",
    id_col: str = "clip_id",
    target_fps: float = 2.0,
    num_video_frames: int = 8,
    max_fps: float = 20.0,
) -> DataFrame:
    """Pure JVM Column plan for the deterministic scheduling half: per
    clip, the fps-doubling schedule (sequence-policy frame counter
    ``floor(duration * fps)``), the selection stride, and one row per
    selected frame index. No UDF, no shuffle — explode on the scan
    partitions. Clips the doubling loop cannot satisfy (fps would pass
    ``max_fps``) emit a single row with ``ok = false`` and
    ``frame_pos/frame_idx = -1`` (the reference logs and leaves the
    clip frame-less)."""
    # fps ladder: target_fps * 2^k for k = 0..floor(log2(max/target)).
    # Rung 0 always exists — the initial extraction happened at
    # target_fps even when target_fps > max_fps (the loop only guards
    # DOUBLINGS against max_fps, cosmos_embed1.py:76-80, mirrored by
    # regen_fps_plan)
    ks = list(
        range(max(1, int(math.floor(math.log2(max_fps / target_fps))) + 1))
    )
    dur = F.col(duration_col)

    def n_at(k: int) -> Column:
        return F.floor(dur * F.lit(target_fps * (2.0**k))).cast("long")

    fps_expr = F.lit(None).cast("double")
    n_expr = F.lit(None).cast("long")
    # first ladder step whose frame count reaches the target wins:
    # build the CASE from the last rung backwards so earlier rungs
    # take precedence
    for k in reversed(ks):
        cond = n_at(k) >= F.lit(num_video_frames)
        fps_expr = F.when(cond, F.lit(target_fps * (2.0**k))).otherwise(
            fps_expr
        )
        n_expr = F.when(cond, n_at(k)).otherwise(n_expr)
    planned = df.select(
        F.col(id_col).alias("clip_id"),
        dur.alias("duration"),
        fps_expr.alias("final_fps"),
        # failed clips report the count at the last rung the loop was
        # allowed to try (fps <= max_fps), like the reference's log line
        F.coalesce(n_expr, n_at(ks[-1])).alias("n_frames"),
    ).withColumn(
        "ok", F.col("final_fps").isNotNull()
    ).withColumn(
        "stride",
        F.when(
            F.col("ok"),
            (F.col("n_frames") / F.lit(num_video_frames)).cast("long"),
        ).otherwise(F.lit(-1).cast("long")),
    )
    # one pass, no union (a filtered-branch union would scan the source
    # twice): failed clips explode a single sentinel element instead
    return planned.select(
        "clip_id",
        "final_fps",
        "n_frames",
        "stride",
        "ok",
        F.posexplode(
            F.when(
                F.col("ok"),
                F.sequence(F.lit(0), F.lit(num_video_frames - 1)),
            ).otherwise(F.array(F.lit(-1)))
        ).alias("_pos", "_j"),
    ).select(
        "clip_id",
        "final_fps",
        "n_frames",
        "stride",
        "ok",
        F.when(F.col("ok"), F.col("_pos"))
        .otherwise(F.lit(-1))
        .cast("int")
        .alias("frame_pos"),
        F.when(F.col("ok"), F.col("_j") * F.col("stride"))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("frame_idx"),
    )

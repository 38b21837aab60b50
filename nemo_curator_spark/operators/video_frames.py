"""Whole-video frame-array extraction — reference
stages/video/clipping/video_frame_extraction.py:34-204.

The reference decodes each video into a uint8 ``[n, H, W, 3]`` frame
array (TransNetV2's input) via PyNvCodec or ffmpeg. Neither codec is in
this sandbox, so the decoders are INJECTABLE callables and the default
is a clearly-marked deterministic synthetic decoder; everything around
the decode is the real contract and is implemented exactly:

- decoder-mode routing with the reference's two fallback chains
  (``pynvc`` -> ffmpeg CPU on missing extractor or decode exception;
  ``ffmpeg_gpu`` -> ffmpeg CPU on GPU failure — video_frame_extraction.py:84-87,170-197),
- the incomplete-metadata guard that records ``errors["metadata"] =
  "incomplete"`` and passes the row through undecoded (lines 162-165),
- decode failure -> NULL frame array (the reference drops the task),
- frames stored as raw rgb24 bytes + shape columns, one Arrow pass,
  bytes never leaving their scan partitions.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# decoder signature: (video_bytes, width, height) -> uint8 [n,h,w,3] or None
Decoder = Callable[[bytes, int, int], "np.ndarray | None"]

DEFAULT_OUTPUT_HW = (27, 48)  # video_frame_extraction.py:101 (TransNetV2 input)


def synthetic_frame_decoder(n_frames: int = 8) -> Decoder:
    """Deterministic stand-in for the ffmpeg/PyNvCodec decode (NOT a real
    codec): frames are a byte-seeded gradient, stable across partitions
    and batchings, so the downstream plumbing is testable end to end."""

    def _decode(video_bytes: bytes, width: int, height: int) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.md5(video_bytes).digest()[:4], "big", signed=False
        )
        base = (
            np.arange(n_frames * height * width * 3, dtype=np.uint64) + seed
        ) % 251
        return base.astype(np.uint8).reshape(n_frames, height, width, 3)

    return _decode


def failing_decoder(_b: bytes, _w: int, _h: int) -> None:
    """A decoder that reports failure (ffmpeg nonzero exit -> None)."""
    return None


FRAME_FIELDS = [
    T.StructField("frames_rgb24", T.BinaryType()),
    T.StructField("frame_count", T.IntegerType()),
    T.StructField("frame_height", T.IntegerType()),
    T.StructField("frame_width", T.IntegerType()),
    T.StructField("decoder_used", T.StringType()),
    T.StructField("frame_error", T.StringType()),
]

_REQUIRED_METADATA = ("duration", "framerate")


def extract_frame_arrays(
    df: DataFrame,
    video_field: str = "video",
    output_hw: tuple[int, int] = DEFAULT_OUTPUT_HW,
    decoder_mode: str = "pynvc",
    decoders: dict[str, Decoder] | None = None,
    required_metadata: tuple[str, ...] = _REQUIRED_METADATA,
) -> DataFrame:
    """VideoFrameExtractionStage.process as one ``mapInPandas`` pass.

    ``decoders`` maps ``{"pynvc": ..., "ffmpeg_cpu": ..., "ffmpeg_gpu":
    ...}``; absent entries model an unavailable codec (the reference's
    ``_PYNVC_AVAILABLE`` / missing-ffmpeg paths). Routing:

    - ``pynvc``: use ``pynvc`` if present, falling back to
      ``ffmpeg_cpu`` when absent or when the decode raises;
    - ``ffmpeg_gpu``: try GPU, retry ``ffmpeg_cpu`` on failure;
    - ``ffmpeg``: CPU only.

    Rows whose ``required_metadata`` columns are NULL skip decoding with
    ``frame_error='metadata: incomplete'``; decode failure yields a NULL
    frame array with ``frame_error='decode failed'``.
    """
    height, width = output_hw
    if decoders is None:
        decoders = {
            "pynvc": synthetic_frame_decoder(),
            "ffmpeg_cpu": synthetic_frame_decoder(),
        }
    carry = [f for f in df.columns if f != video_field]
    out_schema = T.StructType([df.schema[f] for f in carry] + FRAME_FIELDS)
    meta_cols = [c for c in required_metadata if c in df.columns]

    def _route(video_bytes: bytes) -> tuple["np.ndarray | None", str | None]:
        def _try(mode: str) -> "np.ndarray | None":
            fn = decoders.get(mode)
            return None if fn is None else fn(video_bytes, width, height)

        if decoder_mode == "pynvc":
            if "pynvc" in decoders:
                try:
                    arr = _try("pynvc")
                    if arr is not None:
                        return arr, "pynvc"
                except Exception:  # noqa: BLE001 — reference catches broadly
                    pass
            return _try("ffmpeg_cpu"), "ffmpeg_cpu"
        if decoder_mode == "ffmpeg_gpu":
            arr = _try("ffmpeg_gpu")
            if arr is not None:
                return arr, "ffmpeg_gpu"
            return _try("ffmpeg_cpu"), "ffmpeg_cpu"
        return _try("ffmpeg_cpu"), "ffmpeg_cpu"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames, counts, hs, ws, used, errs = [], [], [], [], [], []
            for i in range(len(pdf)):
                row = pdf.iloc[i]
                video_bytes = row[video_field]
                if video_bytes is None:
                    raise ValueError("Video source bytes are not available")
                if any(pd.isna(row[c]) for c in meta_cols):
                    frames.append(None)
                    counts.append(0)
                    hs.append(0)
                    ws.append(0)
                    used.append(None)
                    errs.append("metadata: incomplete")
                    continue
                arr, mode = _route(bytes(video_bytes))
                if arr is None:
                    frames.append(None)
                    counts.append(0)
                    hs.append(0)
                    ws.append(0)
                    used.append(mode)
                    errs.append("decode failed")
                    continue
                arr = np.ascontiguousarray(arr, dtype=np.uint8)
                frames.append(arr.tobytes())
                counts.append(int(arr.shape[0]))
                hs.append(height)
                ws.append(width)
                used.append(mode)
                errs.append(None)
            res = pdf[carry].copy()
            res["frames_rgb24"] = frames
            res["frame_count"] = pd.array(counts, dtype="int32")
            res["frame_height"] = pd.array(hs, dtype="int32")
            res["frame_width"] = pd.array(ws, dtype="int32")
            res["decoder_used"] = used
            res["frame_error"] = errs
            yield res

    return df.mapInPandas(_extract, schema=out_schema)


# --- raw-frame formatting for VLM captioning ---------------------------------
# (reference models/prompt_formatter.py:162-205, the numpy branch — the
# torch (T, C, H, W) permute path is the decoder plug point)

_RAW_VIDEO_NDIMS = 4
_RAW_VIDEO_MAX_VALUE = 255.0
_RAW_VIDEO_CHANNEL_COUNTS = {1, 3, 4}


def format_raw_video_frames(video_np: np.ndarray) -> np.ndarray:
    """PromptFormatter._format_raw_video_frames, numpy branch, exact:
    frames must be channel-last ``(T, H, W, C)``; uint8 passes through
    contiguously; float frames must be RAW (non-negative, <=255) and are
    truncated to uint8 — normalized/scaled inputs are rejected with the
    reference's messages."""
    if video_np.ndim != _RAW_VIDEO_NDIMS:
        msg = (
            "Expected raw video frames with 4 dimensions, got shape "
            f"{video_np.shape}"
        )
        raise ValueError(msg)
    if video_np.shape[-1] not in _RAW_VIDEO_CHANNEL_COUNTS:
        msg = (
            "Expected NumPy raw video frames in channel-last (T, H, W, C) "
            f"format, got shape {video_np.shape}"
        )
        raise ValueError(msg)
    if video_np.dtype == np.uint8:
        return np.ascontiguousarray(video_np)
    min_value = float(np.nanmin(video_np))
    max_value = float(np.nanmax(video_np))
    if min_value < 0:
        msg = (
            "Captioning expects raw video frames, but got normalized "
            "frames with negative values."
        )
        raise ValueError(msg)
    if max_value > _RAW_VIDEO_MAX_VALUE:
        msg = f"Raw video frame values exceed uint8 range: max={max_value}"
        raise ValueError(msg)
    return np.ascontiguousarray(video_np.astype(np.uint8))

"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (reference ImageBatch/AudioTask/VideoTask surface,
tasks/__init__.py:14-37 — out of the webtext tier but part of the
capability surface).

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is STUBBED because no
image/audio library ships in this environment:

* headers following :data:`FAKE_MAGIC` (the deterministic test format
  written by :func:`encode_fake_image`) are decoded for real;
* any other payload raises ``NotImplementedError("no image codec ...")`` —
  the marked integration point for PIL/torchvision/ffmpeg.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_MAGIC = b"FIMG"
MEDIA_SCHEMA = (
    "media_id long, media binary, media_type string, url string"
)

META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def encode_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic stand-in codec: header + seeded pixel bytes."""
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=width * height * channels, dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<III", width, height, channels) + pixels.tobytes()


def _decode(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    if raw[:4] != FAKE_MAGIC:
        raise NotImplementedError(
            "no image codec available in this environment; plug PIL/ffmpeg "
            "decode here (payload is not the deterministic test format)"
        )
    w, h, c = struct.unpack("<III", raw[4:16])
    pixels = np.frombuffer(raw[16:], dtype=np.uint8)
    return w, h, c, pixels


@F.pandas_udf(META_SCHEMA)
def image_meta(media: pd.Series) -> pd.DataFrame:
    """Typed metadata from the binary column (Arrow-vectorized)."""
    rows = []
    for raw in media:
        w, h, c, _ = _decode(bytes(raw))
        rows.append((w, h, c, len(raw)))
    return pd.DataFrame(rows, columns=["width", "height", "channels", "n_bytes"])


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def image_features(media: pd.Series) -> pd.Series:
    """Feature extraction stub: per-channel mean/std (a real model embeds
    here with the exact same batch shape)."""
    out = []
    for raw in media:
        w, h, c, px = _decode(bytes(raw))
        img = px.reshape(-1, c).astype(np.float64)
        out.append(
            np.concatenate([img.mean(axis=0) / 255.0, img.std(axis=0) / 255.0])
        )
    return pd.Series(out)


def resize_stub(df: DataFrame, media_col: str = "media", target: int = 224) -> DataFrame:
    """Resize plumbing via mapInPandas (batch-iterator shape): recodes the
    fake format at the target size; real resize plugs into ``_decode``."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def fn(batches):
        for pdf in batches:
            def rs(raw):
                w, h, c, px = _decode(bytes(raw))
                return encode_fake_image(target, target, c, seed=int(px[:4].sum()))

            pdf[media_col] = pdf[media_col].map(rs)
            yield pdf

    return df.mapInPandas(fn, schema=schema)


def frame_sample_stub(
    df: DataFrame, media_col: str = "media", every_n: int = 10
) -> DataFrame:
    """Video frame-sampling plumbing (1→N fan-out via mapInPandas): emits
    one row per sampled 'frame' of the fake format."""
    schema = MEDIA_SCHEMA + ", frame_no int"

    def fn(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, c, px = _decode(bytes(r[media_col]))
                n_frames = max(1, h // every_n)
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "media": bytes(r[media_col]),
                            "media_type": r.get("media_type", "video"),
                            "url": r.get("url"),
                            "frame_no": i,
                        }
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema=schema)

"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (reference ImageBatch/AudioTask/VideoTask surface,
tasks/__init__.py:14-37 — out of the webtext tier but part of the
capability surface).

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Codec status:

* **real codecs, zero external deps**: PNG (8-bit gray/RGB/RGBA, all
  five scanline filters, stdlib zlib — encoder + decoder), PPM P6/P5
  (binary netpbm), uncompressed 24/32-bit BMP, and WAV PCM audio (stdlib
  ``wave``); plus the :data:`FAKE_MAGIC` deterministic test format;
* nearest-neighbor resize operates on real decoded pixels and re-encodes
  as PPM;
* remaining compressed formats (JPEG/MP3/H.264) raise
  ``NotImplementedError`` — the marked integration point for
  PIL/torchvision/ffmpeg.
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


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (H, W, C) uint8 array as binary netpbm (P6 rgb / P5 gray)."""
    h, w = arr.shape[:2]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    magic = b"P5" if c == 1 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def decode_ppm(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real netpbm decoder (P6 rgb / P5 gray, maxval<=255): header tokens
    (with #-comment support) then raw pixel bytes."""
    magic = raw[:2]
    c = 3 if magic == b"P6" else 1
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    pixels = np.frombuffer(raw[pos : pos + w * h * c], dtype=np.uint8)
    return w, h, c, pixels


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Real PNG encoder, stdlib only (zlib + struct): 8-bit grayscale /
    RGB / RGBA, filter 0 scanlines, fixed zlib level 9 — byte-deterministic
    for a given zlib build. Used where the reference emits ``image/png``
    (e.g. the Nemotron-Parse PDF page/crop rows)."""
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    body = arr.astype(np.uint8)
    scanlines = bytearray()
    for r in range(h):
        scanlines.append(0)  # filter type None
        scanlines += body[r].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(scanlines), 9))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, c: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4 (None/Sub/Up/Average/Paeth)."""
    stride = w * c
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int32
        )
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: running sum within each channel column
            cur = line.reshape(-1, c).cumsum(axis=0).reshape(stride) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - c] if i >= c else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                cc = prev[i - c] if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = cc
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real PNG decoder (stdlib zlib): 8-bit gray / gray+alpha / RGB /
    RGBA, all five scanline filters, non-interlaced. Palette, 16-bit and
    Adam7 interlace raise ``NotImplementedError`` (narrow format
    boundaries, same policy as the BMP decoder)."""
    import zlib

    if raw[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    pos = 8
    w = h = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if bit_depth != 8:
        raise NotImplementedError("only 8-bit PNG decoded here")
    if interlace:
        raise NotImplementedError("Adam7 interlaced PNG not supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError("palette PNG not supported; plug PIL here")
    pixels = _png_unfilter(zlib.decompress(bytes(idat)), w, h, channels)
    img = pixels.reshape(h, w, channels)
    if channels == 2:  # gray+alpha -> gray
        img, channels = img[:, :, :1], 1
    elif channels == 4:  # rgba -> rgb (alpha dropped, BMP policy)
        img, channels = img[:, :, :3], 3
    return w, h, channels, img.reshape(-1).copy()


def decode_bmp(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real BMP decoder: BITMAPINFOHEADER, uncompressed 24/32-bit,
    bottom-up or top-down rows, 4-byte row padding; output rgb order."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack("<I", raw[10:14])[0]
    header_size = struct.unpack("<I", raw[14:18])[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w = struct.unpack("<i", raw[18:22])[0]
    h_raw = struct.unpack("<i", raw[22:26])[0]
    bpp = struct.unpack("<H", raw[28:30])[0]
    compression = struct.unpack("<I", raw[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            "only uncompressed 24/32-bit BMP decoded here; plug PIL for "
            "palette/RLE/compressed variants"
        )
    h = abs(h_raw)
    nchan = bpp // 8
    row_bytes = (w * nchan + 3) & ~3
    rows = []
    for r in range(h):
        src = h - 1 - r if h_raw > 0 else r  # bottom-up unless negative height
        off = data_offset + src * row_bytes
        row = np.frombuffer(raw[off : off + w * nchan], dtype=np.uint8)
        rows.append(row.reshape(w, nchan))
    img = np.stack(rows)  # (h, w, nchan) in BGR(A)
    img = img[:, :, [2, 1, 0]]  # -> rgb, alpha dropped
    return w, h, 3, img.reshape(-1).copy()


def _decode(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    if raw[:4] == FAKE_MAGIC:
        w, h, c = struct.unpack("<III", raw[4:16])
        return w, h, c, np.frombuffer(raw[16:], dtype=np.uint8)
    if raw[:2] in (b"P6", b"P5"):
        return decode_ppm(raw)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    if raw[:8] == PNG_SIGNATURE:
        return decode_png(raw)
    raise NotImplementedError(
        "compressed image codecs (JPEG/...) unavailable in this "
        "environment; plug PIL/ffmpeg here. Decodable today: PNG (8-bit, "
        "non-interlaced), PPM P6/P5, uncompressed BMP, the FIMG test format"
    )


def resize_linear_float(img, new_w: int, new_h: int):
    """cv2 INTER_LINEAR to an explicit size, float64 output: the
    half-pixel-center source map ``(o + 0.5) * (in/out) - 0.5`` with
    clamped bilinear interpolation. The ONE canonical copy of the exact
    cv2 formula — pdf_ingest rounds it to uint8, cosmos_embed consumes
    it raw. Input (H, W) or (H, W, C); output always (new_h, new_w, C)."""
    import numpy as np

    h, w = img.shape[:2]
    arr = img.astype(np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    xs = (np.arange(new_w) + 0.5) * (w / new_w) - 0.5
    ys = (np.arange(new_h) + 0.5) * (h / new_h) - 0.5
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    top = arr[np.ix_(y0, x0)] * (1 - wx) + arr[np.ix_(y0, x1)] * wx
    bot = arr[np.ix_(y1, x0)] * (1 - wx) + arr[np.ix_(y1, x1)] * wx
    return top * (1 - wy) + bot * wy


def resize_nearest(raw: bytes, target_w: int, target_h: int) -> bytes:
    """Real nearest-neighbor resize on decoded pixels, re-encoded as PPM."""
    w, h, c, px = _decode(raw)
    img = px.reshape(h, w, c)
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    out = img[ys][:, xs]
    return encode_ppm(out if c > 1 else out[:, :, 0])


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


def resize_images(
    df: DataFrame, media_col: str = "media", target: int = 224
) -> DataFrame:
    """Resize via mapInPandas (batch-iterator shape): REAL nearest-neighbor
    resize on decoded pixels (PPM/BMP/FIMG), output re-encoded as PPM."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def fn(batches):
        for pdf in batches:
            pdf[media_col] = pdf[media_col].map(
                lambda raw: resize_nearest(bytes(raw), target, target)
            )
            yield pdf

    return df.mapInPandas(fn, schema=schema)


resize_stub = resize_images  # backwards-compat name


# --- audio: real WAV PCM decode via stdlib wave --------------------------------

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """16-bit PCM WAV from an int16 array (test/fixture helper).
    1-D input -> mono; 2-D ``(n_frames, channels)`` input -> interleaved
    multi-channel."""
    import io
    import wave

    channels = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").reshape(-1).tobytes())
    return buf.getvalue()


def decode_wav(raw: bytes) -> tuple[int, int, np.ndarray]:
    """(channels, sample_rate, samples int16) from 16-bit PCM WAV —
    stdlib wave, a real decoder with no external deps."""
    import io
    import wave

    with wave.open(io.BytesIO(raw), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV decoded here")
        frames = w.readframes(w.getnframes())
        samples = np.frombuffer(frames, dtype="<i2")
        return w.getnchannels(), w.getframerate(), samples


@F.pandas_udf(AUDIO_META_SCHEMA)
def audio_meta(media: pd.Series) -> pd.DataFrame:
    rows = []
    for raw in media:
        ch, rate, samples = decode_wav(bytes(raw))
        n = len(samples) // max(ch, 1)
        rows.append((ch, rate, n, n / rate))
    return pd.DataFrame(
        rows, columns=["channels", "sample_rate", "n_frames", "duration_sec"]
    )


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def audio_features(media: pd.Series) -> pd.Series:
    """[rms, zero-crossing rate, peak] over normalized samples."""
    out = []
    for raw in media:
        _, _, samples = decode_wav(bytes(raw))
        x = samples.astype(np.float64) / 32768.0
        if len(x) == 0:
            out.append(np.zeros(3))
            continue
        rms = float(np.sqrt((x**2).mean()))
        zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
        out.append(np.array([rms, zcr, float(np.abs(x).max())]))
    return pd.Series(out)


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

"""Video decoder bookkeeping, deterministic halves — reference
utils/decoder_utils.py:50-200 (the ffmpeg/ffprobe/PyNvCodec decode paths
are plug points; everything here is the metadata/naming/diagnostic
contract those paths share):

- ``FrameExtractionPolicy`` / ``FramePurpose`` enums and
  ``FrameExtractionSignature.to_str()`` — the EXACT cache-key format
  (``"FrameExtractionPolicy.sequence-2000"``: enum str + fps*1000 int)
  that keys ``clip.extracted_frames`` across stages.
- ``Resolution`` named tuple.
- ``VideoCodecNotSupportedError`` carrying the detected codec.
- ``detect_codec_from_mp4_header`` — the heuristic FOURCC header sniff
  (permissive substring scan of the first MiB) used to produce an
  actionable message when ffprobe fails, with the exact
  ``_MP4_GPU_ONLY_CODEC_TAGS`` table.
- ``CODEC_OPEN_FAILURE_SIGNALS`` — the stderr substrings that classify
  an ffprobe failure as a codec/CUDA problem rather than a bad file.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from pathlib import Path
from typing import NamedTuple


class FrameExtractionPolicy(enum.Enum):
    """decoder_utils.py:134-145, exact member values."""

    first = 0
    middle = 1
    last = 2
    sequence = 3


class FramePurpose(enum.Enum):
    """decoder_utils.py:147-156, exact member values."""

    AESTHETICS = 1
    EMBEDDINGS = 2


@dataclass
class FrameExtractionSignature:
    """decoder_utils.py:159-177: policy + fps packed into the cache-key
    string ``f"{policy!s}-{int(fps * 1000)}"``."""

    extraction_policy: FrameExtractionPolicy
    target_fps: float

    def to_str(self) -> str:
        return f"{self.extraction_policy!s}-{int(self.target_fps * 1000)}"


class Resolution(NamedTuple):
    """decoder_utils.py:106-112 (height, width)."""

    height: int
    width: int


class VideoCodecNotSupportedError(RuntimeError):
    """decoder_utils.py:50-62: carries the detected codec name so the
    caller can produce a targeted message."""

    def __init__(self, message: str, codec: str | None = None) -> None:
        super().__init__(message)
        self.codec = codec


# decoder_utils.py:65-72, exact table: MP4 sample-description FOURCCs
# decodable only via NVDEC on the reference's strict ffmpeg build
MP4_GPU_ONLY_CODEC_TAGS: dict[bytes, str] = {
    b"avc1": "h264",
    b"avc3": "h264",
    b"hev1": "hevc",
    b"hvc1": "hevc",
    b"av01": "av1",
}

# decoder_utils.py:95-102, exact: stderr substrings marking a codec/CUDA
# initialization failure (vs a missing/corrupt file)
CODEC_OPEN_FAILURE_SIGNALS: tuple[str, ...] = (
    "CUDA_ERROR_NO_DEVICE",
    "no CUDA-capable device",
    "Failed loading nvcuvid",
    "Cannot load libnvcuvid",
)


def detect_codec_from_mp4_header(
    path: str | Path, *, scan_bytes: int = 1_048_576
) -> str | None:
    """decoder_utils.py:75-93, exact: permissive FOURCC substring scan
    of the first ``scan_bytes``; None on unknown content or unreadable
    path."""
    try:
        with Path(path).open("rb") as fh:
            head = fh.read(scan_bytes)
    except OSError:
        return None
    return detect_codec_from_bytes(head)


def detect_codec_from_bytes(head: bytes) -> str | None:
    """The same sniff over in-memory bytes (the Spark path — video
    payloads arrive as binary columns, not files)."""
    for tag, codec in MP4_GPU_ONLY_CODEC_TAGS.items():
        if tag in head:
            return codec
    return None

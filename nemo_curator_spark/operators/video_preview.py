"""Preview (webp) generation — reference stages/video/preview/
preview.py:27-116: per-window webp previews via ffmpeg/libwebp. The
transcode itself is the ffmpeg plug point; the stage contract — the
exact ffmpeg argument list, the degraded-quality warnings, per-window
iteration, failure leaving ``webp_bytes`` unset — is ported exactly.

Spark shape: one Arrow pass over window rows (mp4 bytes in, webp bytes
out) — bytes stay on their scan partition; downstream the ClipWriter
(io/video_io.py) places each preview at
``previews/{clip_uuid}/{start}_{end}.webp``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def ffmpeg_preview_command(
    input_path: str,
    output_path: str,
    target_fps: float = 1.0,
    target_height: int = 240,
    compression_level: int = 6,
    quality: int = 50,
    threads: int = 4,
) -> list[str]:
    """preview.py:75-103, the exact argument list (the stage's
    observable contract with ffmpeg)."""
    return [
        "ffmpeg",
        "-threads",
        str(int(threads)),
        "-y",
        "-i",
        input_path,
        "-loglevel",
        "error",
        "-vf",
        f"fps={target_fps},scale=-1:{target_height}",
        "-c:v",
        "libwebp",
        "-lossless",
        str(0),
        "-compression_level",
        str(compression_level),
        "-q:v",
        str(quality),
        "-loop",
        "0",
        output_path,
    ]


@dataclass
class PreviewStage:
    """preview.py:27-116 contract over video dicts (the video_io
    shape). ``transcode(mp4_bytes, target_fps, target_height,
    compression_level, quality) -> webp_bytes | None`` is the ffmpeg
    plug point; None (a failed transcode) leaves the window without
    webp bytes, exactly the reference's error path. Returns the
    degraded-quality warnings the reference logs."""

    target_fps: float = 1.0
    target_height: int = 240
    compression_level: int = 6
    quality: int = 50
    transcode: object | None = None

    def process_video(self, video: dict) -> list[str]:
        if self.transcode is None:
            raise NotImplementedError(
                "no ffmpeg in this environment; inject transcode("
                "mp4_bytes, fps, height, compression_level, quality)"
            )
        warnings: list[str] = []
        meta = video.get("metadata", {})
        fr = meta.get("framerate")
        if fr is not None and fr < self.target_fps:
            warnings.append(
                f"framerate {fr} < {self.target_fps}, preview generation "
                f"quality will be degraded"
            )
        h = meta.get("height")
        if h is not None and h < self.target_height:
            warnings.append(
                f"height {h} < {self.target_height}, preview generation "
                f"quality will be degraded"
            )
        for clip in video.get("clips", []):
            for window in clip.get("windows", []):
                if not window.get("mp4_bytes"):
                    continue
                try:
                    webp = self.transcode(
                        window["mp4_bytes"],
                        self.target_fps,
                        self.target_height,
                        self.compression_level,
                        self.quality,
                    )
                except Exception:  # noqa: BLE001 — reference logs + skips
                    webp = None
                if webp is not None:
                    window["webp"] = webp
        return warnings


def generate_previews(
    df: DataFrame,
    stage: PreviewStage,
    mp4_col: str = "mp4_bytes",
) -> DataFrame:
    """Spark form over window rows: append a ``webp`` binary column
    (NULL on transcode failure). One mapInPandas pass, no shuffle."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("webp", T.BinaryType())]
    )

    def gen(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                webp = None
                if r[mp4_col] is not None and stage.transcode is not None:
                    try:
                        webp = stage.transcode(
                            bytes(r[mp4_col]),
                            stage.target_fps,
                            stage.target_height,
                            stage.compression_level,
                            stage.quality,
                        )
                    except Exception:  # noqa: BLE001
                        webp = None
                d = r.to_dict()
                d["webp"] = webp
                rows.append(d)
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.mapInPandas(gen, out_schema)

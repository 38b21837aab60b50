"""Video IO, deterministic halves — reference stages/video/io/
clip_writer.py:34-428 (the full clip/metadata/embedding/preview output
layout, hashed naming, skip-if-exists idempotence, ClipStats
accounting) and video_reader.py:31-307 (file partitioning by extension,
byte loading, metadata-extraction contract). The ffmpeg/pyav decode
behind ``populate_metadata`` is the one gated piece and is an
injectable plug point; everything else — every path, every JSON byte,
every stat — is exact.

Layout parity (clip_writer.py:69-114, one subtree per artifact kind)::

    {output}/clips/{uuid}.mp4                  (filtered_clips/ when filtered)
    {output}/previews/{uuid}/{start}_{end}.webp
    {output}/ce1_embd/{uuid}.pickle
    {output}/ce1_embd_parquet/{uuid5(video_chunk)}.parquet
    {output}/metas/v0/{uuid}.json
    {output}/processed_videos/{relpath}.json           (chunk 0 only)
    {output}/processed_clip_chunks/{relpath}_{idx}.json

Idempotence follows the reference's write_bytes contract
(utils/writer_utils.py:50-87): an existing destination is SKIPPED, so
task retries never corrupt output; JSON bytes are ``json.dumps(...,
indent=4)`` with UUIDs stringified (writer_utils.py:26-47,131-165) —
byte-identical re-runs.

Spark shape: clips of one video are grouped with ``applyInPandas`` (the
only shuffle, on bookkeeping + clip bytes already colocated by the
upstream scan) and each group performs its own writes — every file name
is content-addressed (uuid5 of source + span), so concurrent writers
across executors never collide, and the per-video stats row comes back
as the query result (lineage). At 100 TB the layout shards naturally:
no global state, no driver-side writes, no rename fan-in.
"""

from __future__ import annotations

import json
import os
import pathlib
import pickle
import uuid as uuid_mod
from dataclasses import dataclass, field
from io import BytesIO

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VIDEO_EXTENSIONS = (".mp4", ".mov", ".avi", ".mkv", ".webm")


# --- naming (clip_extraction_stages.py:488-497, clip_writer.py:204-253) ----


def clip_uuid(source_video: str, start_event: int, end_event: int) -> str:
    """The reference's content-addressed clip id: uuid5(NAMESPACE_URL,
    ``{file}_{start}_{end}``) over frame events."""
    return str(
        uuid_mod.uuid5(
            uuid_mod.NAMESPACE_URL, f"{source_video}_{start_event}_{end_event}"
        )
    )


def chunk_parquet_uuid(input_path: str, clip_chunk_index: int) -> str:
    """clip_writer.py:207: the per-chunk embedding parquet name."""
    return str(
        uuid_mod.uuid5(
            uuid_mod.NAMESPACE_URL, f"{input_path}_{clip_chunk_index}"
        )
    )


def _sub(output_path: str, extra: str) -> str:
    """ClipWriterStage._get_output_path (clip_writer.py:69-71)."""
    return output_path.rstrip("/") + "/" + extra.strip("/")


def path_processed_videos(output_path: str) -> str:
    return _sub(output_path, "processed_videos")


def path_processed_clip_chunks(output_path: str) -> str:
    return _sub(output_path, "processed_clip_chunks")


def path_clips(output_path: str, *, filtered: bool = False) -> str:
    return _sub(output_path, "filtered_clips" if filtered else "clips")


def path_previews(output_path: str) -> str:
    return _sub(output_path, "previews")


def path_metas(output_path: str, version: str = "v0") -> str:
    return _sub(output_path, f"metas/{version}")


def path_ce1_embd(output_path: str) -> str:
    return _sub(output_path, "ce1_embd")


def path_ce1_embd_parquet(output_path: str) -> str:
    return _sub(output_path, "ce1_embd_parquet")


# --- idempotent writers (utils/writer_utils.py:50-165) ---------------------


def write_bytes_idempotent(buffer: bytes, dest: pathlib.Path) -> bool:
    """Skip-if-exists byte write (writer_utils.py:73-87: an existing
    destination is left untouched — retry-safe). Returns True iff the
    file was written by this call."""
    dest = pathlib.Path(dest)
    if dest.exists():
        return False
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_name(dest.name + ".tmp")
    with tmp.open("wb") as fp:
        fp.write(buffer)
    os.replace(tmp, dest)
    return True


def json_bytes(data: dict) -> bytes:
    """The reference's exact JSON byte format (writer_utils.py:131-165:
    ``indent=4``, UUIDs stringified)."""

    def _default(o: object) -> str:
        if isinstance(o, uuid_mod.UUID):
            return str(o)
        raise TypeError(type(o).__name__)

    return json.dumps(data, indent=4, default=_default).encode("utf-8")


def write_json_idempotent(data: dict, dest: pathlib.Path) -> bool:
    return write_bytes_idempotent(json_bytes(data), dest)


def write_parquet_idempotent(rows: list[dict], dest: pathlib.Path) -> bool:
    """writer_utils.py:90-128: list-of-dicts -> pandas -> parquet bytes."""
    buf = BytesIO()
    pd.DataFrame(rows).to_parquet(buf, index=False)
    return write_bytes_idempotent(buf.getvalue(), dest)


# --- ClipStats (tasks/video.py:162-196, exact) -----------------------------


@dataclass
class ClipStats:
    num_filtered_by_motion: int = 0
    num_filtered_by_aesthetic: int = 0
    num_passed: int = 0
    num_transcoded: int = 0
    num_with_embeddings: int = 0
    num_with_caption: int = 0
    num_with_webp: int = 0
    total_clip_duration: float = 0.0
    max_clip_duration: float = 0.0

    def combine(self, other: "ClipStats") -> None:
        self.num_filtered_by_motion += other.num_filtered_by_motion
        self.num_filtered_by_aesthetic += other.num_filtered_by_aesthetic
        self.num_passed += other.num_passed
        self.num_transcoded += other.num_transcoded
        self.num_with_embeddings += other.num_with_embeddings
        self.num_with_caption += other.num_with_caption
        self.num_with_webp += other.num_with_webp
        self.total_clip_duration += other.total_clip_duration
        self.max_clip_duration = max(
            self.max_clip_duration, other.max_clip_duration
        )


# --- the writer ------------------------------------------------------------


@dataclass
class ClipWriter:
    """ClipWriterStage's deterministic core (clip_writer.py:34-428) over
    plain dicts: a *video* is ``{input_path, clip_chunk_index,
    num_total_clips, num_clip_chunks, metadata: {...}, clips: [...],
    filtered_clips: [...]}``; a *clip* is ``{uuid, source_video, span:
    (s, e), buffer: bytes|None, embedding: list|None, windows: [{
    start_frame, end_frame, webp: bytes|None, caption: {model: str},
    enhanced_caption: {...}}], motion_score_global_mean,
    motion_score_per_patch_min_256, aesthetic_score, errors: {...},
    clip_metadata: {...}|None}`` (clip_metadata mirrors
    Clip.extract_metadata — the mp4-probe half is decode-gated, so the
    caller passes it when known)."""

    output_path: str
    input_path: str
    upload_clips: bool = True
    dry_run: bool = False
    generate_embeddings: bool = False
    generate_previews: bool = False
    generate_captions: bool = False
    embedding_algorithm: str = "cosmos-embed1"
    caption_models: list[str] = field(default_factory=lambda: ["qwen"])
    enhanced_caption_models: list[str] = field(
        default_factory=lambda: ["qwen_lm"]
    )

    # -- per-clip writes (clip_writer.py:255-371) --

    def _clip_uri(self, clip_uuid_s: str, prefix: str, ext: str) -> pathlib.Path:
        return pathlib.Path(prefix, f"{clip_uuid_s}.{ext}")

    def _window_uri(
        self, clip_uuid_s: str, window: tuple[int, int], prefix: str, ext: str
    ) -> pathlib.Path:
        return pathlib.Path(
            prefix, clip_uuid_s, f"{window[0]}_{window[1]}.{ext}"
        )

    def write_clip_mp4(self, clip: dict, *, filtered: bool = False) -> ClipStats:
        st = ClipStats()
        if clip.get("buffer"):
            dest = self._clip_uri(
                clip["uuid"],
                path_clips(self.output_path, filtered=filtered),
                "mp4",
            )
            if self.upload_clips and not self.dry_run:
                write_bytes_idempotent(bytes(clip["buffer"]), dest)
            st.num_transcoded += 1
        if not filtered:
            st.num_passed += 1
        return st

    def write_clip_window_webp(self, clip: dict) -> ClipStats:
        st = ClipStats()
        has_webp = False
        for w in clip.get("windows", []):
            if w.get("webp"):
                dest = self._window_uri(
                    clip["uuid"],
                    (w["start_frame"], w["end_frame"]),
                    path_previews(self.output_path),
                    "webp",
                )
                if not self.dry_run:
                    write_bytes_idempotent(bytes(w["webp"]), dest)
                has_webp = True
        st.num_with_webp += 1 if has_webp else 0
        return st

    def write_clip_embedding(self, clip: dict) -> ClipStats:
        st = ClipStats()
        if clip.get("embedding") is not None:
            dest = self._clip_uri(
                clip["uuid"], path_ce1_embd(self.output_path), "pickle"
            )
            if not self.dry_run:
                write_bytes_idempotent(
                    pickle.dumps(list(clip["embedding"])), dest
                )
            st.num_with_embeddings += 1
        return st

    def write_clip_metadata(
        self, clip: dict, video_metadata: dict, *, filtered: bool = False
    ) -> ClipStats:
        """clip_writer.py:319-371 — the exact metas/v0 JSON layout."""
        st = ClipStats()
        data = {
            "span_uuid": str(clip["uuid"]),
            "source_video": str(clip["source_video"]),
            "duration_span": list(clip["span"]),
            "width_source": video_metadata.get("width"),
            "height_source": video_metadata.get("height"),
            "framerate_source": video_metadata.get("framerate"),
            "clip_location": str(
                self._clip_uri(
                    clip["uuid"],
                    path_clips(self.output_path, filtered=filtered),
                    "mp4",
                )
            ),
        }
        if clip.get("clip_metadata"):
            data.update(clip["clip_metadata"])
        if clip.get("motion_score_global_mean") is not None:
            data["motion_score"] = {
                "global_mean": clip["motion_score_global_mean"],
                "per_patch_min_256": clip.get(
                    "motion_score_per_patch_min_256"
                ),
            }
        if clip.get("aesthetic_score") is not None:
            data["aesthetic_score"] = clip["aesthetic_score"]
        if clip.get("errors"):
            # list(dict) == KEYS only — the reference's exact
            # serialization (clip_writer.py:346-347 does list(clip.errors))
            data["errors"] = list(clip["errors"])
        has_caption = False
        data["windows"] = []
        for w in clip.get("windows", []):
            cw = {"start_frame": w["start_frame"], "end_frame": w["end_frame"]}
            for model in self.caption_models:
                if model in (w.get("caption") or {}):
                    cw[f"{model}_caption"] = w["caption"][model]
                    has_caption = True
            for model in self.enhanced_caption_models:
                if model in (w.get("enhanced_caption") or {}):
                    cw[f"{model}_enhanced_caption"] = w["enhanced_caption"][
                        model
                    ]
            data["windows"].append(cw)
        data["valid"] = bool(
            clip.get("buffer") and len(clip.get("windows", [])) > 0
        )
        dest = self._clip_uri(
            clip["uuid"], path_metas(self.output_path, "v0"), "json"
        )
        if not self.dry_run:
            write_json_idempotent(data, dest)
        st.num_with_caption += 1 if has_caption else 0
        dur = clip["span"][1] - clip["span"][0]
        st.total_clip_duration += dur
        st.max_clip_duration = max(st.max_clip_duration, dur)
        return st

    # -- per-video writes (clip_writer.py:204-218, 373-428) --

    def _relpath(self, input_video_path: str) -> str:
        if not input_video_path.startswith(self.input_path):
            msg = (
                f"Input video path {input_video_path} does not start with "
                f"{self.input_path}"
            )
            raise ValueError(msg)
        return input_video_path[len(self.input_path):].lstrip("/")

    def video_metadata_uri(self, input_video_path: str) -> pathlib.Path:
        return pathlib.Path(
            path_processed_videos(self.output_path),
            self._relpath(input_video_path) + ".json",
        )

    def clip_chunk_uri(self, input_video_path: str, idx: int) -> pathlib.Path:
        return pathlib.Path(
            path_processed_clip_chunks(self.output_path),
            self._relpath(input_video_path) + f"_{idx}.json",
        )

    def process_video(self, video: dict) -> dict:
        """ClipWriterStage.process for one video dict; returns the clip
        chunk stats payload (the lineage row). Write order follows the
        reference: clip-level artifacts first, then the embedding
        parquet and video/chunk metadata."""
        pre = video.get("clip_stats") or {}
        # upstream motion/aesthetic filter stages accumulate their drop
        # counters on the video (the reference combines writer results
        # INTO the existing video.clip_stats) — seed from them so the
        # chunk bookkeeping matches the filtered_clips list
        stats = ClipStats(
            num_filtered_by_motion=int(
                pre.get("num_filtered_by_motion", 0)
                if isinstance(pre, dict)
                else getattr(pre, "num_filtered_by_motion", 0)
            ),
            num_filtered_by_aesthetic=int(
                pre.get("num_filtered_by_aesthetic", 0)
                if isinstance(pre, dict)
                else getattr(pre, "num_filtered_by_aesthetic", 0)
            ),
        )
        embd_buffer = []
        for clip in video.get("clips", []):
            if clip.get("embedding") is not None:
                embd_buffer.append(
                    {
                        "id": str(clip["uuid"]),
                        "embedding": list(clip["embedding"]),
                    }
                )
            stats.combine(self.write_clip_mp4(clip))
            stats.combine(self.write_clip_window_webp(clip))
            stats.combine(self.write_clip_embedding(clip))
            stats.combine(
                self.write_clip_metadata(clip, video.get("metadata", {}))
            )
        for clip in video.get("filtered_clips", []):
            stats.combine(self.write_clip_mp4(clip, filtered=True))
            stats.combine(
                self.write_clip_metadata(
                    clip, video.get("metadata", {}), filtered=True
                )
            )

        input_path = video["input_path"]
        chunk_idx = int(video.get("clip_chunk_index", 0))
        if embd_buffer and not self.dry_run:
            dest = self._clip_uri(
                chunk_parquet_uuid(input_path, chunk_idx),
                path_ce1_embd_parquet(self.output_path),
                "parquet",
            )
            write_parquet_idempotent(embd_buffer, dest)

        if chunk_idx == 0 and not self.dry_run:
            meta = video.get("metadata", {})
            write_json_idempotent(
                {
                    "video": input_path,
                    "height": meta.get("height"),
                    "width": meta.get("width"),
                    "framerate": meta.get("framerate"),
                    "num_frames": meta.get("num_frames"),
                    "duration": meta.get("duration"),
                    "video_codec": meta.get("video_codec"),
                    "pixel_format": meta.get("pixel_format"),
                    "audio_format": meta.get("audio_codec"),
                    "num_total_clips": video.get("num_total_clips", 0),
                    "num_clip_chunks": video.get("num_clip_chunks", 0),
                },
                self.video_metadata_uri(input_path),
            )

        chunk = {
            "video": input_path,
            "clip_chunk_index": chunk_idx,
            "num_clips_filtered_by_motion": stats.num_filtered_by_motion,
            "num_clips_filtered_by_aesthetic": stats.num_filtered_by_aesthetic,
            "num_clips_passed": stats.num_passed,
            "num_clips_transcoded": stats.num_transcoded,
            "num_clips_with_embeddings": stats.num_with_embeddings,
            "num_clips_with_caption": stats.num_with_caption,
            "num_clips_with_webp": stats.num_with_webp,
            "total_clip_duration": stats.total_clip_duration,
            "max_clip_duration": stats.max_clip_duration,
            "clips": [str(c["uuid"]) for c in video.get("clips", [])],
            "filtered_clips": [
                str(c["uuid"]) for c in video.get("filtered_clips", [])
            ],
            "all_windows": {},
            "all_windows_enhanced_caption": {},
        }
        for clip in video.get("clips", []):
            cu = str(clip["uuid"])
            chunk["all_windows"][cu] = {}
            chunk["all_windows_enhanced_caption"][cu] = {}
            for w in clip.get("windows", []):
                wk = f"{w['start_frame']}_{w['end_frame']}"
                for model in self.caption_models:
                    if model in (w.get("caption") or {}):
                        chunk["all_windows"][cu][wk] = w["caption"][model]
                        break
                for model in self.enhanced_caption_models:
                    if model in (w.get("enhanced_caption") or {}):
                        chunk["all_windows_enhanced_caption"][cu][wk] = w[
                            "enhanced_caption"
                        ][model]
                        break
        if not self.dry_run:
            write_json_idempotent(
                chunk, self.clip_chunk_uri(input_path, chunk_idx)
            )
        return chunk


_WRITE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("video", T.StringType()),
        T.StructField("clip_chunk_index", T.IntegerType()),
        T.StructField("num_clips_passed", T.LongType()),
        T.StructField("num_clips_transcoded", T.LongType()),
        T.StructField("num_clips_with_embeddings", T.LongType()),
        T.StructField("num_clips_with_caption", T.LongType()),
        T.StructField("num_clips_with_webp", T.LongType()),
        T.StructField("total_clip_duration", T.DoubleType()),
        T.StructField("max_clip_duration", T.DoubleType()),
    ]
)


def write_clips(
    df: DataFrame,
    writer: ClipWriter,
    video_col: str = "video_path",
    chunk_col: str = "clip_chunk_index",
) -> DataFrame:
    """Spark form: one JSON-encoded clip row per record (column ``clip``,
    the dict contract above with bytes base64-free — binary columns
    ride separately: ``buffer`` for the mp4 and an optional ``webps``
    array<binary> aligned with clip["windows"]), grouped per (video,
    chunk) so
    each group writes its own artifacts and emits one stats row. Clip
    bytes stay on their scan partitions until the single bookkeeping
    shuffle; file names are content-addressed so retries and concurrent
    groups are idempotent."""

    def per_video(pdf: pd.DataFrame) -> pd.DataFrame:
        clips, filtered = [], []
        meta = {}
        has_webps = "webps" in pdf.columns
        for _, r in pdf.iterrows():
            clip = json.loads(r["clip"])
            if r.get("buffer") is not None:
                clip["buffer"] = bytes(r["buffer"])
            if has_webps and r["webps"] is not None:
                # binary preview payloads ride in a separate
                # array<binary> column aligned with clip["windows"]
                # (bytes cannot live in the JSON clip column)
                for w, wb in zip(clip.get("windows", []), r["webps"]):
                    if wb is not None:
                        w["webp"] = bytes(wb)
            meta = json.loads(r["video_metadata"]) if r["video_metadata"] else {}
            (filtered if clip.pop("filtered", False) else clips).append(clip)
        video = {
            "input_path": pdf[video_col].iloc[0],
            "clip_chunk_index": int(pdf[chunk_col].iloc[0]),
            "metadata": meta,
            "clips": clips,
            "filtered_clips": filtered,
            "num_total_clips": len(clips) + len(filtered),
            "num_clip_chunks": 1,
        }
        chunk = writer.process_video(video)
        return pd.DataFrame(
            [
                {
                    "video": chunk["video"],
                    "clip_chunk_index": chunk["clip_chunk_index"],
                    "num_clips_passed": chunk["num_clips_passed"],
                    "num_clips_transcoded": chunk["num_clips_transcoded"],
                    "num_clips_with_embeddings": chunk[
                        "num_clips_with_embeddings"
                    ],
                    "num_clips_with_caption": chunk["num_clips_with_caption"],
                    "num_clips_with_webp": chunk["num_clips_with_webp"],
                    "total_clip_duration": chunk["total_clip_duration"],
                    "max_clip_duration": chunk["max_clip_duration"],
                }
            ]
        )

    return df.groupBy(video_col, chunk_col).applyInPandas(
        per_video, schema=_WRITE_STATS_SCHEMA
    )


# --- reader half (video_reader.py:31-307) ----------------------------------


def plan_video_files(
    spark: SparkSession,
    input_video_path: str,
    limit: int | None = None,
) -> DataFrame:
    """VideoReader's partitioning half (video_reader.py:252-299):
    enumerate video files by extension (one file per task, the
    reference's files_per_partition=1), validating existence like
    __post_init__. Listing happens once on the driver (file *names*
    only); the bytes load is distributed."""
    root = pathlib.Path(input_video_path)
    if not root.exists():
        msg = f"Video directory does not exist: {input_video_path}"
        raise FileNotFoundError(msg)
    if root.is_file():
        if root.suffix.lower() not in VIDEO_EXTENSIONS:
            supported = ", ".join(VIDEO_EXTENSIONS)
            msg = (
                f"Not a supported video file: {input_video_path}. "
                f"Supported formats: {supported}"
            )
            raise FileNotFoundError(msg)
        files = [str(root)]
    else:
        files = sorted(
            str(p)
            for p in root.rglob("*")
            if p.is_file() and p.suffix.lower() in VIDEO_EXTENSIONS
        )
        if not files:
            msg = f"No video files found in: {input_video_path}"
            raise FileNotFoundError(msg)
    if limit is not None:
        files = files[: int(limit)]
    df = spark.createDataFrame([(f,) for f in files], ["video_path"])
    return df.repartition(max(1, min(len(files), 256)))


_READ_SCHEMA = T.StructType(
    [
        T.StructField("video_path", T.StringType()),
        T.StructField("source_bytes", T.BinaryType()),
        T.StructField("size", T.LongType()),
        T.StructField("metadata", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)

METADATA_FIELDS = (
    "height", "width", "framerate", "num_frames", "duration",
    "video_codec", "pixel_format", "audio_codec", "bit_rate_k",
)


def read_video_bytes(df: DataFrame, extract_metadata=None) -> DataFrame:
    """VideoReaderStage.process as one mapInPandas pass: load bytes,
    apply the injectable metadata extractor (``bytes -> dict`` over
    METADATA_FIELDS — ffmpeg/pyav in the reference, absent here), and
    carry per-row errors instead of failing the task (the reference's
    video.errors posture). Bytes are produced on the scan partition and
    never shuffle."""

    def gen(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                path = r["video_path"]
                try:
                    with open(path, "rb") as fp:
                        data = fp.read()
                except OSError as e:
                    rows.append((path, None, 0, None, f"download: {e}"))
                    continue
                meta_json, err = None, None
                if extract_metadata is not None:
                    try:
                        meta = extract_metadata(data)
                        meta_json = json.dumps(
                            {k: meta.get(k) for k in METADATA_FIELDS}
                        )
                    except Exception as e:  # noqa: BLE001 — reference
                        err = f"metadata: {e}"  # logs + continues
                rows.append((path, data, len(data), meta_json, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "video_path", "source_bytes", "size", "metadata", "error",
                ],
            )

    return df.select("video_path").mapInPandas(gen, _READ_SCHEMA)

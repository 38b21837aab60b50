"""Omni-pipeline IO — deterministic halves of the reference's HF-dataset
image reader and JSONL sample writer
(stages/synthetic/omni/io.py:40-318). The HuggingFace ``datasets``
loaders and PIL JPEG codec are the plug points (injectable); ported
exactly here:

* the three-way local/hub dataset-source routing with the hub's
  ``split[:N]`` slice notation (io.py:113-137);
* the four-way image-column value normalization — PIL-like object /
  HF Image-feature dict (bytes|data|path) / raw bytes / path string
  (io.py:139-156);
* first-occurrence image-id dedup (VQA one-row-per-question datasets),
  ``{idx:06d}`` fallback ids, and the idempotent ``<id>.jpg`` cache —
  already-present files are never re-encoded (io.py:158-186);
* per-worker ``<stem>_worker<id><suffix>`` JSONL shards with the
  drop-None-keep-empty field contract (``[]``/``""``/``False`` are
  legitimate OCR outputs), ``is_valid`` excluded from rows, valid-only
  skip accounting (io.py:196-280);
* the post-run shard merge (io.py:283-318).

Spark shape: the reader is a driver-side manifest fan-out (row *paths*
only — tiny) exactly like the ALM manifest reader; the writer maps to
the repo-wide per-partition shard protocol (partition id as worker id).
"""

from __future__ import annotations

import glob as glob_mod
import json
import os
from pathlib import Path
from typing import Any, Callable, Iterable


def resolve_dataset_source(
    dataset_name: str, split: str = "train", limit: int | None = None
) -> dict:
    """The reference's dataset-source routing decision
    (io.py:113-137), pure: returns ``{"kind", "split_arg"}`` where kind
    is ``save_to_disk`` (directory with dataset_info.json),
    ``imagefolder`` (any other existing directory), or ``hub``. For
    save_to_disk the limit applies post-load (``.select``), so
    ``split_arg`` stays the bare split; otherwise the hub slice
    notation ``split[:N]`` is used."""
    local_path = Path(dataset_name)
    if local_path.exists():
        if (local_path / "dataset_info.json").exists():
            return {"kind": "save_to_disk", "split_arg": split}
        split_arg = split if limit is None else f"{split}[:{limit}]"
        return {"kind": "imagefolder", "split_arg": split_arg}
    split_arg = split if limit is None else f"{split}[:{limit}]"
    return {"kind": "hub", "split_arg": split_arg}


def image_value_to_bytes(
    value: Any,
    read_file: Callable[[str], bytes] | None = None,
) -> bytes:
    """The ``_to_pil`` normalization (io.py:139-156) re-expressed over
    raw encoded bytes (decode is the PIL plug point): PIL-like objects
    expose ``tobytes_encoded()`` here (test seam), HF Image-feature
    dicts carry ``bytes``/``data`` or a ``path``, raw bytes pass
    through, existing path strings are read."""
    read_file = read_file or (lambda p: Path(p).read_bytes())
    if hasattr(value, "tobytes_encoded"):
        return value.tobytes_encoded()
    if isinstance(value, dict):
        raw = value.get("bytes") or value.get("data")
        if raw:
            return bytes(raw)
        path = value.get("path")
        if path:
            return read_file(path)
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    if isinstance(value, str) and Path(value).exists():
        return read_file(value)
    msg = (
        f"Cannot convert value of type {type(value).__name__} to an "
        "image. Expected a PIL Image, bytes, or a HF Image feature dict."
    )
    raise ValueError(msg)


class HFDatasetImageReader:
    """HFDatasetImageReaderStage deterministic half (io.py:40-186).

    ``dataset`` is the injected iterable of example dicts (the
    ``datasets`` library is the plug point — ``resolve_dataset_source``
    carries the loader routing); ``save_image(raw_bytes, path)`` is the
    JPEG transcode plug point (PIL ``convert("RGB").save(...,"JPEG")``
    in the reference). Emits ``{"image_path", "image_id",
    "dataset_name"}`` sample dicts, deduplicated on first occurrence."""

    def __init__(  # noqa: PLR0913
        self,
        dataset_name: str,
        image_dir: str | Path,
        *,
        split: str = "train",
        image_column: str = "image",
        id_column: str | None = None,
        limit: int | None = None,
        save_image: Callable[[bytes, str], None] | None = None,
    ) -> None:
        self.dataset_name = dataset_name
        self.image_dir = Path(image_dir)
        self.split = split
        self.image_column = image_column
        self.id_column = id_column
        self.limit = limit
        self.save_image = save_image

    def outputs(self) -> tuple[list[str], list[str]]:
        return ["image_path", "image_id"], []

    def _save(self, raw: bytes, path: str) -> None:
        if self.save_image is None:
            raise NotImplementedError(
                "no JPEG codec in this environment; inject "
                "save_image(raw_bytes, path) (PIL RGB-convert + JPEG "
                "save is the reference path)"
            )
        self.save_image(raw, path)

    def process(self, dataset: Iterable[dict]) -> list[dict]:
        self.image_dir.mkdir(parents=True, exist_ok=True)
        dataset_tag = Path(self.dataset_name).name.replace("/", "_")
        seen_ids: set[str] = set()
        samples: list[dict] = []
        for idx, example in enumerate(dataset):
            # reference limit semantics are ROW slicing (``train[:N]`` /
            # ``.select(range(N))``) applied before dedup, not a cap on
            # unique images
            if self.limit is not None and idx >= self.limit:
                break
            image_id = (
                str(example[self.id_column])
                if self.id_column is not None
                else f"{idx:06d}"
            )
            if image_id in seen_ids:
                continue
            seen_ids.add(image_id)
            image_path = self.image_dir / f"{image_id}.jpg"
            if not image_path.exists():
                raw = image_value_to_bytes(example[self.image_column])
                self._save(raw, str(image_path))
            samples.append(
                {
                    "dataset_name": dataset_tag,
                    "image_path": str(image_path),
                    "image_id": image_id,
                }
            )
        return samples


def sample_record(
    data: dict, image_parent: str | Path | None = None
) -> dict:
    """JsonlSampleWriterStage's row contract (io.py:252-262):
    ``image_path`` relativized to ``image_parent`` when possible
    (silent fallback to absolute on mismatch), then drop only ``None``
    values — empty lists/strings/False are kept (OCR may legitimately
    be ``[]``) — and never emit ``is_valid``."""
    data = dict(data)
    image_path = data.get("image_path")
    if image_path is not None:
        p = Path(image_path)
        if image_parent is not None:
            try:
                p = p.relative_to(Path(image_parent))
            except ValueError:
                pass
        data["image_path"] = str(p)
    return {
        k: v for k, v in data.items() if v is not None and k != "is_valid"
    }


class JsonlSampleWriter:
    """JsonlSampleWriterStage (io.py:196-280): one shard per worker at
    ``<stem>_worker<id><suffix>``; invalid samples are skipped (not
    written) when ``valid_only``; stats expose saved/skipped."""

    def __init__(
        self,
        output_path: str,
        *,
        valid_only: bool = True,
        image_parent: str | None = None,
    ) -> None:
        self.output_path = output_path
        self.valid_only = valid_only
        self.image_parent = image_parent
        self._saved = 0
        self._skipped = 0

    def shard_path(self, worker_id: str) -> str:
        base = Path(self.output_path)
        suffix = base.suffix or ".jsonl"
        return str(base.parent / f"{base.stem}_worker{worker_id}{suffix}")

    def write_shard(self, worker_id: str, samples: Iterable[dict]) -> str:
        shard = self.shard_path(worker_id)
        parent = os.path.dirname(shard)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = shard + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for data in samples:
                if self.valid_only and not data.get("is_valid", True):
                    self._skipped += 1
                    continue
                rec = sample_record(data, self.image_parent)
                f.write(json.dumps(rec, default=str) + "\n")
                self._saved += 1
        os.replace(tmp, shard)
        return shard

    @property
    def stats(self) -> dict[str, int]:
        return {"saved": self._saved, "skipped": self._skipped}


def merge_output_shards(
    output_path: str | Path, *, delete_shards: bool = True
) -> Path:
    """io.py:283-318, exact: glob ``<stem>_worker*<suffix>`` next to
    ``output_path``, concatenate in sorted order into
    ``<stem><suffix>``, optionally delete the shards. No shards -> the
    (possibly pre-existing) output path is returned untouched."""
    output_path = Path(output_path)
    suffix = output_path.suffix or ".jsonl"
    pattern = str(output_path.parent / f"{output_path.stem}_worker*{suffix}")
    shards = sorted(glob_mod.glob(pattern))
    if not shards:
        return output_path
    merged = output_path.parent / f"{output_path.stem}{suffix}"
    with open(merged, "w", encoding="utf-8") as fout:
        for shard in shards:
            with open(shard, encoding="utf-8") as fin:
                fout.write(fin.read())
    if delete_shards:
        for shard in shards:
            os.remove(shard)
    return merged

"""ALM pretrain IO stages — reference stages/audio/alm/pretrain/
io.py:59-375 + utils.py path helpers: the long-form manifest reader
(id/duplicate validation, three audio-path resolution modes) and the
per-replica shard writers whose output `alm_finalize` merges. All
deterministic; ported exactly.

Spark shape: the manifest read is one driver-side file (row *names*
only — tiny), fanned out as a DataFrame; the writers run per PARTITION
(the Spark analogue of the reference's per-replica shard, merged by
``alm_finalize.finalize_audio_pretrain_outputs``). The reference's
append-per-task shape exists because its executor kills workers without
teardown; per-partition shard files carry the same property here — a
retried task rewrites only its own shard.
"""

from __future__ import annotations

import json
import os
import uuid as uuid_mod
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from nemo_curator_spark.operators.alm_finalize import (
    MANIFEST_SHARD_EXT,
    METRICS_SHARD_EXT,
)

AUDIO_PATH_RESOLUTION_BASENAME = "basename"
AUDIO_PATH_RESOLUTION_RELATIVE = "relative"
AUDIO_PATH_RESOLUTION_AS_IS = "as_is"
_AUDIO_PATH_RESOLUTION_MODES = (
    AUDIO_PATH_RESOLUTION_BASENAME,
    AUDIO_PATH_RESOLUTION_RELATIVE,
    AUDIO_PATH_RESOLUTION_AS_IS,
)


def resolve_audio_path(
    audio_dir: str, value: str, mode: str = AUDIO_PATH_RESOLUTION_BASENAME
) -> str:
    """utils.py:131-163, exact three-mode resolution."""
    if mode == AUDIO_PATH_RESOLUTION_BASENAME:
        return os.path.join(audio_dir, os.path.basename(value))
    if mode == AUDIO_PATH_RESOLUTION_RELATIVE:
        return os.path.join(audio_dir, value)
    if mode == AUDIO_PATH_RESOLUTION_AS_IS:
        return value
    msg = (
        f"unknown audio_path_resolution {mode!r}; "
        f"expected one of {_AUDIO_PATH_RESOLUTION_MODES}"
    )
    raise ValueError(msg)


def make_shard_path(output_path: str, ext: str, replica: str | None = None) -> str:
    """utils.py:79-85: per-worker unique shard path. ``replica``
    overrides the pid+uuid tag for deterministic tests."""
    tag = replica or f"{os.getpid()}-{uuid_mod.uuid4().hex[:8]}"
    return f"{output_path}.shard-{tag}.{ext}"


def read_long_form_manifest(
    input_manifest: str,
    audio_dir: str,
    audio_filepath_key: str = "audio_filepath",
    audio_path_resolution: str = AUDIO_PATH_RESOLUTION_BASENAME,
) -> list[dict]:
    """ReadLongFormManifestStage.process (io.py:160-226), exact: skip
    rows with missing/empty/duplicate ``id`` or missing audio path;
    re-anchor the path per the resolution mode; in basename mode, FAIL
    on duplicate basenames (two rows silently routing to the same
    on-disk audio)."""
    if audio_path_resolution not in _AUDIO_PATH_RESOLUTION_MODES:
        msg = (
            f"unknown audio_path_resolution {audio_path_resolution!r}; "
            f"expected one of {_AUDIO_PATH_RESOLUTION_MODES}"
        )
        raise ValueError(msg)
    if not os.path.isfile(input_manifest):
        msg = f"Manifest not found: {input_manifest}"
        raise FileNotFoundError(msg)
    entries: list[dict] = []
    seen_ids: set[str] = set()
    seen_basenames: dict[str, str] = {}
    with open(input_manifest, encoding="utf-8") as f:
        for _lineno, raw in enumerate(f, 1):
            line = raw.strip()
            if not line:
                continue
            try:
                entry = json.loads(line)
            except json.JSONDecodeError:
                continue
            row_id = entry.get("id")
            if row_id is None or (
                isinstance(row_id, str) and not row_id.strip()
            ):
                continue
            row_id = str(row_id)
            if row_id in seen_ids:
                continue
            seen_ids.add(row_id)
            entry["id"] = row_id
            original_path = entry.get(audio_filepath_key)
            if not original_path:
                continue
            if audio_path_resolution == AUDIO_PATH_RESOLUTION_BASENAME:
                basename = os.path.basename(original_path)
                prior_id = seen_basenames.get(basename)
                if prior_id is not None:
                    msg = (
                        f"duplicate audio basename {basename!r} (first seen "
                        f"for id {prior_id!r}, repeated for id {row_id!r}); "
                        f"two source rows would resolve to the same on-disk "
                        f"audio under audio_path_resolution="
                        f"{AUDIO_PATH_RESOLUTION_BASENAME!r}. Switch to "
                        f"'relative' (preserves subdirs) or 'as_is' if this "
                        f"is intentional."
                    )
                    raise ValueError(msg)
                seen_basenames[basename] = row_id
            entry[audio_filepath_key] = resolve_audio_path(
                audio_dir, original_path, audio_path_resolution
            )
            entries.append(entry)
    return entries


def read_long_form_manifest_df(
    spark: SparkSession,
    input_manifest: str,
    audio_dir: str,
    **kw,
) -> DataFrame:
    """Spark fan-out: one row per validated manifest entry (JSON), ready
    for the per-file planning/extraction stages."""
    entries = read_long_form_manifest(input_manifest, audio_dir, **kw)
    pdf = pd.DataFrame(
        {
            "id": [e["id"] for e in entries],
            "entry": [json.dumps(e, ensure_ascii=False) for e in entries],
        }
    )
    if not len(pdf):
        return spark.createDataFrame(
            [], T.StructType([T.StructField("id", T.StringType()),
                              T.StructField("entry", T.StringType())])
        )
    return spark.createDataFrame(pdf).repartition(
        max(1, min(len(entries), 256))
    )


def metrics_record(entry: dict, meta: dict, *, is_stub: bool) -> dict:
    """PretrainMetricsAggregatorStage's record schema (io.py:347-368),
    exact — input-side counters from the fan-out metadata on every
    record, output-side contribution zero for stubs."""
    return {
        "id": str(entry.get("id") or ""),
        "in_segments": int(meta.get("original_seg_count", 0)),
        "in_duration_sec": float(meta.get("original_seg_duration", 0.0)),
        "dropped": {
            "empty": int(meta.get("dropped_empty", 0)),
            "overlap": int(meta.get("dropped_overlap", 0)),
            "too_long": int(meta.get("dropped_too_long", 0)),
            "too_short": int(meta.get("dropped_too_short", 0)),
            "no_text": int(meta.get("dropped_no_text", 0)),
            "repetition": int(meta.get("dropped_repetition", 0)),
        },
        "is_stub": is_stub,
        "out_segments": 0 if is_stub else len(entry.get("segments") or []),
        "out_duration_sec": 0.0
        if is_stub
        else float(entry.get("duration", 0.0)),
    }


@dataclass
class SnippetManifestWriter:
    """SnippetManifestWriterStage (io.py:228-275): append each non-stub
    snippet entry to this replica's shard; origin stubs (no snippet_id)
    pass through unwritten."""

    output_path: str
    replica: str | None = None

    def __post_init__(self) -> None:
        parent = os.path.dirname(self.output_path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        self.shard_path = make_shard_path(
            self.output_path, MANIFEST_SHARD_EXT, self.replica
        )

    def process_entry(self, entry: dict) -> dict:
        if entry.get("snippet_id") is not None:
            with open(self.shard_path, "a", encoding="utf-8") as f:
                f.write(json.dumps(entry, ensure_ascii=False) + "\n")
        return entry


@dataclass
class PretrainMetricsAggregator:
    """PretrainMetricsAggregatorStage (io.py:283-375): one JSONL record
    per task into this replica's shard; ``filtered_texts`` only on the
    first record per id per replica (bounds shard size under fan-out)."""

    output_path: str
    replica: str | None = None

    def __post_init__(self) -> None:
        parent = os.path.dirname(self.output_path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        self.shard_path = make_shard_path(
            self.output_path, METRICS_SHARD_EXT, self.replica
        )
        self._seen_ids: set[str] = set()

    def process_entry(self, entry: dict, meta: dict | None = None) -> dict:
        original_id = str(entry.get("id") or "")
        if not original_id:
            return entry
        meta = meta or {}
        record = metrics_record(
            entry, meta, is_stub=entry.get("snippet_id") is None
        )
        if original_id not in self._seen_ids:
            self._seen_ids.add(original_id)
            record["filtered_texts"] = list(
                meta.get("filtered_repetition_texts") or []
            )
        with open(self.shard_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record, ensure_ascii=False) + "\n")
        return entry


_WRITE_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("n_rows", T.LongType()),
    ]
)


def write_manifest_shards(
    df: DataFrame, output_path: str, entry_col: str = "entry"
) -> DataFrame:
    """Spark form of the per-replica manifest writer: each partition
    writes ONE shard (partition id as the replica tag — rewritten
    whole on retry, so tasks stay idempotent) and reports (shard,
    rows). ``alm_finalize.merge_manifest_shards`` merges them."""

    def gen(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        shard = make_shard_path(
            output_path, MANIFEST_SHARD_EXT, replica=f"p{pid:05d}"
        )
        parent = os.path.dirname(shard)
        if parent:
            os.makedirs(parent, exist_ok=True)
        n = 0
        tmp = shard + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for pdf in it:
                for e in pdf[entry_col]:
                    entry = json.loads(e) if isinstance(e, str) else e
                    if entry.get("snippet_id") is not None:
                        f.write(
                            json.dumps(entry, ensure_ascii=False) + "\n"
                        )
                        n += 1
        os.replace(tmp, shard)
        yield pd.DataFrame({"shard": [shard], "n_rows": [n]})

    return df.mapInPandas(gen, _WRITE_COUNT_SCHEMA)

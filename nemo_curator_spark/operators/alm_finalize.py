"""ALM pretrain prepare/finalize — reference
stages/audio/alm/pretrain/finalize.py:45-590 + utils.py shard helpers:
driver-side shard cleanup, manifest/metrics/tar shard merging, and the
manifest-vs-tar integrity reconcile. Everything is deterministic and
ported exactly; the one library seam is the audio-header validity probe
(soundfile there, the repo's stdlib WAV codec here — same contract:
frames > 0 and samplerate > 0).

Why driver-side (the reference's stated reason): per-replica writers
emit one shard per worker (`<path>.shard-*.{jsonl,tar}`); cleanup and
merging inside a stage's setup/teardown would race across workers, so
prepare runs BEFORE the distributed job and finalize AFTER it. At 100
TB the shard count is the executor count, not the row count — the
merge walks file metadata, streaming payload bytes one member at a
time (O(index + chunk) memory, the reference's two-pass design).
"""

from __future__ import annotations

import glob
import json
import os
import tarfile
from collections import defaultdict
from io import BytesIO

from nemo_curator_spark.operators.alm_planning import histogram_30s

MANIFEST_SHARD_EXT = "jsonl"
METRICS_SHARD_EXT = "jsonl"
TAR_SHARD_EXT = "tar"
MAX_FILTERED_TEXT_EXAMPLES = 1000


def shard_path(output_path: str, replica: str, ext: str) -> str:
    """utils.py shard naming: ``<path>.shard-<replica>.<ext>``."""
    return f"{output_path}.shard-{replica}.{ext}"


def glob_shards(output_path: str, ext: str) -> list[str]:
    """utils.py:88-89."""
    return sorted(glob.glob(f"{output_path}.shard-*.{ext}"))


def delete_shards(output_path: str, ext: str) -> int:
    """utils.py:92-99."""
    n = 0
    for s in glob_shards(output_path, ext):
        try:
            os.remove(s)
            n += 1
        except OSError:
            pass
    return n


def prepare_audio_pretrain_outputs(
    output_manifest_path: str, metrics_path: str, output_audio_tar_path: str
) -> tuple[int, int, int]:
    """finalize.py:45-62: delete stale shards from prior runs, driver
    side (workers would race). Returns the removal counts."""
    n_man = delete_shards(output_manifest_path, MANIFEST_SHARD_EXT)
    n_met = delete_shards(metrics_path, METRICS_SHARD_EXT)
    n_tar = delete_shards(output_audio_tar_path, TAR_SHARD_EXT)
    return n_man, n_met, n_tar


def merge_manifest_shards(output_path: str) -> int:
    """finalize.py:110-145: concatenate shard JSONL lines, skipping
    malformed (worker-killed-mid-write) lines; the no-shards guard
    protects a previous run's output from truncation on failed
    re-runs. Returns kept line count."""
    shards = glob_shards(output_path, MANIFEST_SHARD_EXT)
    if not shards:
        return 0
    parent = os.path.dirname(output_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    kept = 0
    with open(output_path, "w", encoding="utf-8") as out:
        for s in shards:
            with open(s, encoding="utf-8") as f:
                for raw in f:
                    line = raw.strip()
                    if not line:
                        continue
                    try:
                        json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    out.write(line + "\n")
                    kept += 1
    for s in shards:
        try:
            os.remove(s)
        except OSError:
            pass
    return kept


def build_final_summary(
    per_original: dict[str, dict],
    durations: list[float],
    filtered_examples: list[str] | None = None,
) -> dict:
    """finalize.py:560-590, exact field layout."""
    totals_dropped: dict[str, int] = defaultdict(int)
    in_segments = 0
    in_duration = 0.0
    out_snippets = 0
    out_segments = 0
    out_duration = 0.0
    for entry in per_original.values():
        in_segments += int(entry.get("in_segments", 0))
        in_duration += float(entry.get("in_duration_sec", 0.0))
        out_snippets += int(entry.get("out_snippets", 0))
        out_segments += int(entry.get("out_segments", 0))
        out_duration += float(entry.get("out_duration_sec", 0.0))
        for k, v in (entry.get("dropped") or {}).items():
            totals_dropped[k] += int(v)
    return {
        "num_input_audios": len(per_original),
        "num_output_snippets": out_snippets,
        "input_total_segments": in_segments,
        "input_total_duration_sec": round(in_duration, 3),
        "output_total_segments": out_segments,
        "output_total_duration_sec": round(out_duration, 3),
        "dropped": dict(totals_dropped),
        "snippet_duration_histogram_30s": histogram_30s(durations),
        "dropped_repetition_examples": list(filtered_examples or []),
        "per_original": list(per_original.values()),
    }


def merge_metrics_shards(metrics_path: str) -> dict | None:
    """finalize.py:147-218: per-original aggregation (first record wins
    for input-side fields; stubs add no output), globally-capped
    filtered-text examples, summary written as indent-2 JSON."""
    shards = glob_shards(metrics_path, METRICS_SHARD_EXT)
    if not shards:
        return None
    per_original: dict[str, dict] = {}
    durations: list[float] = []
    filtered_examples: list[str] = []
    for s in shards:
        with open(s, encoding="utf-8") as f:
            for raw in f:
                line = raw.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                pid = r.get("id")
                if pid is None or (isinstance(pid, str) and not pid.strip()):
                    continue
                pid = str(pid)
                entry = per_original.get(pid)
                if entry is None:
                    entry = {
                        "id": pid,
                        "in_segments": int(r.get("in_segments", 0)),
                        "in_duration_sec": float(r.get("in_duration_sec", 0.0)),
                        "dropped": dict(r.get("dropped") or {}),
                        "out_snippets": 0,
                        "out_segments": 0,
                        "out_duration_sec": 0.0,
                    }
                    per_original[pid] = entry
                if not r.get("is_stub", False):
                    entry["out_snippets"] += 1
                    entry["out_segments"] += int(r.get("out_segments", 0))
                    entry["out_duration_sec"] += float(
                        r.get("out_duration_sec", 0.0)
                    )
                    durations.append(float(r.get("out_duration_sec", 0.0)))
                if (
                    "filtered_texts" in r
                    and len(filtered_examples) < MAX_FILTERED_TEXT_EXAMPLES
                ):
                    remaining = MAX_FILTERED_TEXT_EXAMPLES - len(
                        filtered_examples
                    )
                    filtered_examples.extend(r["filtered_texts"][:remaining])
    summary = build_final_summary(per_original, durations, filtered_examples)
    parent = os.path.dirname(metrics_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(metrics_path, "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2, ensure_ascii=False)
    for s in shards:
        try:
            os.remove(s)
        except OSError:
            pass
    return summary


def merge_tar_shards(output_path: str) -> int:
    """finalize.py:220-326: two-pass streaming merge into lexicographic
    member-name order (Energon-indexed-tar expectation) — pass 1 indexes
    metadata only, pass 2 stream-copies members; truncated/unreadable
    shards contribute their recoverable prefix. Returns members
    written."""
    shards = glob_shards(output_path, TAR_SHARD_EXT)
    if not shards:
        return 0
    parent = os.path.dirname(output_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    index: list[tuple[str, str, tarfile.TarInfo]] = []
    for s in shards:
        try:
            in_tar = tarfile.open(s, "r")
        except tarfile.TarError:
            continue
        try:
            while True:
                try:
                    ti = in_tar.next()
                except tarfile.TarError:
                    break
                if ti is None:
                    break
                if not ti.isreg():
                    continue
                index.append((ti.name, s, ti))
        finally:
            in_tar.close()
    index.sort(key=lambda e: e[0])
    if not index:
        return 0
    open_shards: dict[str, tarfile.TarFile] = {}
    written = 0
    try:
        with tarfile.open(output_path, "w") as out_tar:
            for name, s, ti in index:
                in_tar = open_shards.get(s)
                if in_tar is None:
                    try:
                        in_tar = tarfile.open(s, "r")
                    except tarfile.TarError:
                        continue
                    open_shards[s] = in_tar
                try:
                    f = in_tar.extractfile(ti)
                    if f is None:
                        continue
                    # read + length-check BEFORE addfile: a shard whose
                    # final member has an intact header but truncated
                    # payload would otherwise corrupt the merged tar
                    # mid-copy (short read raises OSError inside
                    # copyfileobj AFTER the header is written)
                    payload = f.read()
                    if len(payload) != ti.size:
                        continue
                    out_tar.addfile(ti, BytesIO(payload))
                except (tarfile.TarError, OSError):
                    continue
                written += 1
    finally:
        for in_tar in open_shards.values():
            in_tar.close()
    for s in shards:
        try:
            os.remove(s)
        except OSError:
            pass
    return written


def _wav_header_ok(payload: bytes) -> bool:
    """The soundfile.info validity contract (frames > 0, samplerate > 0)
    over the repo's stdlib WAV codec."""
    try:
        from nemo_curator_spark.operators.multimodal import decode_wav

        ch, sr, samples = decode_wav(payload)
        return len(samples) > 0 and sr > 0
    except Exception:  # noqa: BLE001
        return False


def reconcile_manifest_with_tar(
    manifest_path: str,
    tar_path: str,
    audio_filepath_key: str = "audio_filepath",
) -> tuple[int, int]:
    """finalize.py:329-434: drop manifest rows whose audio path isn't a
    regular tar member (worker killed between JSONL flush and tar flush)
    or whose member payload fails the header check (truncated/corrupt).
    The tar keeps orphan members (rewriting would cost a full pass;
    consumers iterate the manifest). Returns (missing, unreadable)."""
    if not os.path.exists(tar_path) or not os.path.exists(manifest_path):
        return (0, 0)
    try:
        tar = tarfile.open(tar_path, "r")
    except tarfile.TarError:
        return (0, 0)
    try:
        members = {ti.name: ti for ti in tar.getmembers() if ti.isreg()}
        header_ok: dict[str, bool] = {}

        def _audio_ok(name: str) -> bool:
            cached = header_ok.get(name)
            if cached is not None:
                return cached
            ti = members.get(name)
            ok = False
            if ti is not None and ti.size > 0:
                stream = tar.extractfile(ti)
                if stream is not None:
                    ok = _wav_header_ok(stream.read())
            header_ok[name] = ok
            return ok

        kept_lines: list[str] = []
        dropped_missing = 0
        dropped_unreadable = 0
        with open(manifest_path, encoding="utf-8") as f:
            for raw in f:
                line = raw.strip()
                if not line:
                    continue
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ap = row.get(audio_filepath_key)
                if ap not in members:
                    dropped_missing += 1
                    continue
                if not _audio_ok(ap):
                    dropped_unreadable += 1
                    continue
                kept_lines.append(line)
    finally:
        tar.close()
    if dropped_missing + dropped_unreadable == 0:
        return (0, 0)
    with open(manifest_path, "w", encoding="utf-8") as f:
        for line in kept_lines:
            f.write(line + "\n")
    return (dropped_missing, dropped_unreadable)


def _collect_reconciled_output_stats(
    manifest_path: str,
) -> tuple[dict[str, dict], list[float]]:
    """finalize.py:437-468."""
    out_per_id: dict[str, dict] = {}
    durations: list[float] = []
    if not os.path.exists(manifest_path):
        return out_per_id, durations
    with open(manifest_path, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            pid = str(row.get("id") or "")
            if not pid:
                continue
            dur = float(row.get("duration", 0.0))
            seg_count = len(row.get("segments") or [])
            entry = out_per_id.setdefault(
                pid,
                {"out_snippets": 0, "out_segments": 0, "out_duration_sec": 0.0},
            )
            entry["out_snippets"] += 1
            entry["out_segments"] += seg_count
            entry["out_duration_sec"] += dur
            durations.append(dur)
    return out_per_id, durations


def patch_metrics_post_reconcile(
    metrics_path: str,
    manifest_path: str,
    dropped_missing: int,
    dropped_unreadable: int,
) -> None:
    """finalize.py:470-558: fold the reconcile drops into
    ``dropped.missing_audio`` / ``dropped.corrupted_audio`` and rebuild
    every output-side counter from the now-authoritative manifest
    (input-side and worker-side dropped counters untouched)."""
    if dropped_missing == 0 and dropped_unreadable == 0:
        return
    if not os.path.exists(metrics_path):
        return
    try:
        with open(metrics_path, encoding="utf-8") as f:
            summary = json.load(f)
    except (OSError, json.JSONDecodeError):
        return
    dropped = summary.setdefault("dropped", {})
    if dropped_missing:
        dropped["missing_audio"] = (
            int(dropped.get("missing_audio", 0)) + dropped_missing
        )
    if dropped_unreadable:
        dropped["corrupted_audio"] = (
            int(dropped.get("corrupted_audio", 0)) + dropped_unreadable
        )
    out_per_id, durations = _collect_reconciled_output_stats(manifest_path)
    summary["num_output_snippets"] = int(
        sum(v["out_snippets"] for v in out_per_id.values())
    )
    summary["output_total_segments"] = int(
        sum(v["out_segments"] for v in out_per_id.values())
    )
    summary["output_total_duration_sec"] = round(
        float(sum(v["out_duration_sec"] for v in out_per_id.values())), 3
    )
    summary["snippet_duration_histogram_30s"] = histogram_30s(durations)
    for entry in summary.get("per_original", []):
        pid = entry.get("id")
        if pid is None:
            continue
        out = out_per_id.get(
            str(pid),
            {"out_snippets": 0, "out_segments": 0, "out_duration_sec": 0.0},
        )
        entry["out_snippets"] = int(out["out_snippets"])
        entry["out_segments"] = int(out["out_segments"])
        entry["out_duration_sec"] = round(float(out["out_duration_sec"]), 3)
    with open(metrics_path, "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2, ensure_ascii=False)


def finalize_audio_pretrain_outputs(
    output_manifest_path: str,
    metrics_path: str,
    output_audio_tar_path: str,
    audio_filepath_key: str = "audio_filepath",
) -> tuple[int, int]:
    """finalize.py:65-107: merge all three shard families, reconcile the
    manifest against the merged tar, and patch the metrics. Returns the
    reconcile drop counts."""
    merge_manifest_shards(output_manifest_path)
    merge_metrics_shards(metrics_path)
    merge_tar_shards(output_audio_tar_path)
    dropped_missing, dropped_unreadable = reconcile_manifest_with_tar(
        output_manifest_path, output_audio_tar_path, audio_filepath_key
    )
    patch_metrics_post_reconcile(
        metrics_path, output_manifest_path, dropped_missing, dropped_unreadable
    )
    return dropped_missing, dropped_unreadable


def write_tar_shard(path: str, members: list[tuple[str, bytes]]) -> None:
    """Per-replica tar shard writer (the extractor-side half the
    reference keeps open per worker): one shot here, for tests and the
    Spark foreachPartition caller."""
    buf = BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in members:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(payload)
            tf.addfile(ti, BytesIO(payload))
    with open(path, "wb") as f:
        f.write(buf.getvalue())

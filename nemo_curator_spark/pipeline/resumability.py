"""Durable resumability primitives (reference ``utils/atomic_io.py``,
``utils/retry_manifest.py``, ``backends/failed_task_markers.py``).

At 100 TB a curation run restarts many times; these primitives are what
make a restart cheap: atomic JSON manifests (fsynced temp file +
rename — readable under any crash), per-work-unit completion manifests
keyed by a digest of the work's stable identity (so a resumed driver
skips finished units without listing outputs), and attempt-scoped
failed-task markers communicated through an environment variable (so a
wrapper script can decide to retry the attempt).

They complement ``pipeline/checkpoint.py`` (which owns the Spark-side
committed-bucket resume): checkpoint.py answers "which output buckets
are durable", these answer "which logical work units completed" and
"did anything fail this attempt".
"""

from __future__ import annotations

import contextlib
import hashlib
import json
import os
import tempfile
import uuid
from pathlib import Path

METADATA_DIRNAME = ".nemo_curator_metadata"

FAILED_TASKS_DIR_ENV_VAR = "NEMO_CURATOR_FAILED_TASKS_DIR"
FAILED_TASK_MANIFEST_FILENAME = "failed_tasks.json"


# --- atomic JSON IO (atomic_io.py:23-137) ----------------------------------


def fsync_directory(path) -> None:
    """atomic_io.py:23-33: flush directory metadata to disk."""
    flags = os.O_RDONLY
    if hasattr(os, "O_DIRECTORY"):
        flags |= os.O_DIRECTORY
    dir_fd = os.open(path, flags)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def _unlink_best_effort(path: Path) -> None:
    with contextlib.suppress(OSError):
        path.unlink(missing_ok=True)


def _write_json_temp_file(
    path: Path, payload, *, indent=None, separators=None, sort_keys=True
) -> Path:
    """atomic_io.py:42-72: fsynced temp file beside the destination
    (same directory → same filesystem → rename is atomic)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp_path = None
    try:
        with tempfile.NamedTemporaryFile(
            mode="w",
            encoding="utf-8",
            dir=path.parent,
            prefix=f".{path.name}.",
            suffix=".tmp",
            delete=False,
        ) as tmp:
            tmp_path = Path(tmp.name)
            json.dump(
                payload, tmp, indent=indent, separators=separators,
                sort_keys=sort_keys,
            )
            tmp.write("\n")
            tmp.flush()
            os.fsync(tmp.fileno())
    except Exception:
        if tmp_path is not None:
            _unlink_best_effort(tmp_path)
        raise
    return tmp_path


def write_json_atomically(
    path, payload, *, indent=None, separators=None, sort_keys=True
) -> None:
    """atomic_io.py:81-107: temp + fsync + os.replace; directory fsync
    is best-effort (shared filesystems may not support it)."""
    path = Path(path)
    tmp_path = _write_json_temp_file(
        path, payload, indent=indent, separators=separators,
        sort_keys=sort_keys,
    )
    try:
        os.replace(tmp_path, path)
        with contextlib.suppress(OSError):
            fsync_directory(path.parent)
    except Exception:
        _unlink_best_effort(tmp_path)
        raise


def write_json_atomically_if_absent(
    path, payload, *, indent=None, separators=None, sort_keys=True
) -> bool:
    """atomic_io.py:110-137: create-without-replace via os.link (the
    POSIX atomic create); returns False if the file already existed —
    the first writer wins, exactly once."""
    path = Path(path)
    tmp_path = _write_json_temp_file(
        path, payload, indent=indent, separators=separators,
        sort_keys=sort_keys,
    )
    try:
        os.link(tmp_path, path)
    except FileExistsError:
        _unlink_best_effort(tmp_path)
        return False
    except Exception:
        _unlink_best_effort(tmp_path)
        raise
    _unlink_best_effort(tmp_path)
    with contextlib.suppress(OSError):
        fsync_directory(path.parent)
    return True


# --- completion manifests (retry_manifest.py:23-154) -----------------------


def safe_token(value) -> str:
    """retry_manifest.py:34-35: filesystem-safe token."""
    return "".join(
        ch if ch.isalnum() or ch in "._-" else "_" for ch in str(value)
    )


def mapping_digest(mapping) -> str:
    """retry_manifest.py:38-40: canonical-JSON sha256 prefix — stable
    identity regardless of dict insertion order."""
    encoded = json.dumps(
        mapping, default=str, separators=(",", ":"), sort_keys=True
    )
    return hashlib.sha256(encoded.encode("utf-8")).hexdigest()[:16]


def read_completion_manifests(
    checkpoint_path, *, namespace: str, completion_dirname: str | None = None
) -> list[tuple[Path, dict]]:
    """retry_manifest.py:43-80: read completed identities for one
    namespace; malformed manifests raise (a corrupt manifest must stop
    the resume, not silently redo or skip work). Returns (path,
    payload) pairs sorted by filename."""
    resolved_dirname = completion_dirname or f".{safe_token(namespace)}_completion"
    manifest_dir = Path(
        checkpoint_path, METADATA_DIRNAME, resolved_dirname
    ).absolute()
    if not manifest_dir.exists():
        return []
    records = []
    pattern = f"completed_{safe_token(namespace)}_*.json"
    for manifest_file in sorted(manifest_dir.glob(pattern)):
        if not manifest_file.is_file():
            continue
        try:
            payload = json.loads(manifest_file.read_text())
        except (OSError, json.JSONDecodeError) as e:
            msg = f"Failed to read completion manifest {manifest_file}: {e}"
            raise ValueError(msg) from e
        if not isinstance(payload, dict):
            msg = f"Completion manifest must contain a JSON object: {manifest_file}"
            raise TypeError(msg)
        status = payload.get("status")
        if not isinstance(status, str):
            msg = f"Completion manifest must contain a string status: {manifest_file}"
            raise TypeError(msg)
        if status != "completed":
            msg = f"Completion manifest must have status 'completed': {manifest_file}"
            raise ValueError(msg)
        records.append((manifest_file, payload))
    return records


class CompletionManifest:
    """retry_manifest.py:83-154: durable proof that work identified by
    stable fields completed. Context-manager form marks completion only
    on clean exit."""

    def __init__(
        self,
        checkpoint_path,
        namespace: str,
        identity,
        *,
        metadata=None,
        completion_dirname: str | None = None,
        enabled: bool = True,
        flatten_identity: bool = True,
        flatten_metadata: bool = False,
    ) -> None:
        self.checkpoint_path = Path(checkpoint_path)
        self.namespace = namespace
        self.identity = dict(identity)
        self.metadata = dict(metadata or {})
        self.completion_dirname = (
            completion_dirname or f".{safe_token(namespace)}_completion"
        )
        self.enabled = enabled
        self.flatten_identity = flatten_identity
        self.flatten_metadata = flatten_metadata
        self.manifest_file: Path | None = None

    @property
    def manifest_dir(self) -> Path:
        return Path(
            self.checkpoint_path, METADATA_DIRNAME, self.completion_dirname
        ).absolute()

    @property
    def filename_prefix(self) -> str:
        return (
            f"completed_{safe_token(self.namespace)}_"
            f"{mapping_digest(self.identity)}"
        )

    def _payload(self, extra=None) -> dict:
        payload: dict = {}
        if self.flatten_identity:
            payload.update(self.identity)
        else:
            payload["identity"] = self.identity
        if self.metadata:
            if self.flatten_metadata:
                payload.update(self.metadata)
            else:
                payload["metadata"] = self.metadata
        if extra is not None:
            payload.update(extra)
        payload["status"] = "completed"
        return payload

    def mark_completed(self, extra=None) -> Path | None:
        if not self.enabled:
            return None
        if self.manifest_file is None:
            self.manifest_file = self.manifest_dir / f"{self.filename_prefix}.json"
        write_json_atomically(
            self.manifest_file,
            self._payload(extra),
            separators=(",", ":"),
            sort_keys=True,
        )
        return self.manifest_file

    def __enter__(self) -> "CompletionManifest":
        return self

    def __exit__(self, _exc_type, exc, _tb) -> bool:
        if exc is None:
            self.mark_completed()
        return False


# --- failed-task markers (failed_task_markers.py:21-82) --------------------


def _configure_failed_task_manifest_dir(default_dir: Path) -> Path:
    existing = os.environ.get(FAILED_TASKS_DIR_ENV_VAR)
    if existing:
        return Path(existing)
    manifest_dir = default_dir.absolute()
    os.environ[FAILED_TASKS_DIR_ENV_VAR] = str(manifest_dir)
    return manifest_dir


def configure_failed_task_manifest_dir(checkpoint_path) -> Path:
    """failed_task_markers.py:35-43: attempt-scoped dir (fresh uuid per
    attempt) unless the env var already points somewhere."""
    manifest_dir = Path(
        checkpoint_path,
        METADATA_DIRNAME,
        ".failed_tasks",
        f"local_attempt_{uuid.uuid4().hex}",
    )
    return _configure_failed_task_manifest_dir(manifest_dir)


def record_failed_tasks() -> None:
    """failed_task_markers.py:63-74: touch one marker per attempt; a
    no-op when no attempt dir is configured or the marker exists."""
    manifest_dir = os.environ.get(FAILED_TASKS_DIR_ENV_VAR)
    if not manifest_dir:
        return
    manifest_path = Path(manifest_dir, FAILED_TASK_MANIFEST_FILENAME)
    if manifest_path.is_file():
        return
    manifest_path.parent.mkdir(parents=True, exist_ok=True)
    manifest_path.touch(exist_ok=True)


def failed_task_manifest_exists(manifest_dir=None) -> bool:
    """failed_task_markers.py:77-82."""
    resolved = (
        manifest_dir
        if manifest_dir is not None
        else os.environ.get(FAILED_TASKS_DIR_ENV_VAR)
    )
    if not resolved:
        return False
    return Path(resolved, FAILED_TASK_MANIFEST_FILENAME).is_file()

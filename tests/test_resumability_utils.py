"""Tests for resumability primitives (pipeline/resumability.py), file
maintenance (io/file_maintenance.py), and the Megatron shard merge
(io/megatron.py).

Reference pins: atomic_io.py:42-137; retry_manifest.py:34-154;
failed_task_markers.py:25-82; split_large_files.py:38-208;
grouping.py:35-102; merge_file_prefixes.py:32-299.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nemo_curator_spark.io.file_maintenance import (
    basename_and_ext,
    pairwise,
    split_by_chunk_size,
    split_files_by_size,
    split_into_n_chunks,
    split_jsonl_file_by_size,
    split_parquet_file_by_size,
    split_table,
)
from nemo_curator_spark.io.megatron import (
    extract_index_contents,
    merge_file_prefixes,
    read_shard,
    write_shard,
)
from nemo_curator_spark.pipeline.resumability import (
    CompletionManifest,
    configure_failed_task_manifest_dir,
    failed_task_manifest_exists,
    mapping_digest,
    read_completion_manifests,
    record_failed_tasks,
    safe_token,
    write_json_atomically,
    write_json_atomically_if_absent,
)


# --- atomic JSON -----------------------------------------------------------


def test_write_json_atomically(tmp_path):
    p = tmp_path / "deep" / "m.json"
    write_json_atomically(p, {"b": 2, "a": 1}, separators=(",", ":"))
    # sorted keys + trailing newline, no temp leftovers
    assert p.read_text() == '{"a":1,"b":2}\n'
    assert [f.name for f in p.parent.iterdir()] == ["m.json"]
    write_json_atomically(p, {"x": 9})
    assert json.loads(p.read_text()) == {"x": 9}


def test_write_json_atomically_if_absent(tmp_path):
    p = tmp_path / "once.json"
    assert write_json_atomically_if_absent(p, {"winner": 1}) is True
    # second writer loses; content unchanged; no temp leftovers
    assert write_json_atomically_if_absent(p, {"winner": 2}) is False
    assert json.loads(p.read_text()) == {"winner": 1}
    assert [f.name for f in tmp_path.iterdir()] == ["once.json"]


# --- completion manifests --------------------------------------------------


def test_safe_token_and_digest():
    assert safe_token("fuzzy dedup/stage!") == "fuzzy_dedup_stage_"
    assert safe_token("ok-1.2_x") == "ok-1.2_x"
    # identity digest is insertion-order independent
    assert mapping_digest({"a": 1, "b": 2}) == mapping_digest({"b": 2, "a": 1})
    assert len(mapping_digest({})) == 16


def test_completion_manifest_roundtrip(tmp_path):
    ckpt = tmp_path / "ckpt"
    m = CompletionManifest(
        ckpt, "minhash", {"shard": 3, "input": "a.parquet"},
        metadata={"rows": 10},
    )
    out = m.mark_completed({"elapsed_s": 1.5})
    assert out is not None and out.is_file()
    assert out.name.startswith("completed_minhash_")
    payload = json.loads(out.read_text())
    # flattened identity + nested metadata + status contract
    assert payload["shard"] == 3 and payload["status"] == "completed"
    assert payload["metadata"] == {"rows": 10}
    assert payload["elapsed_s"] == 1.5

    records = read_completion_manifests(ckpt, namespace="minhash")
    assert len(records) == 1 and records[0][1]["input"] == "a.parquet"
    # other namespaces don't see it
    assert read_completion_manifests(ckpt, namespace="lsh") == []
    # same identity → same filename (idempotent re-completion)
    m2 = CompletionManifest(ckpt, "minhash", {"input": "a.parquet", "shard": 3})
    assert m2.mark_completed() == out
    assert len(read_completion_manifests(ckpt, namespace="minhash")) == 1


def test_completion_manifest_context_and_disabled(tmp_path):
    ckpt = tmp_path / "c2"
    with CompletionManifest(ckpt, "ns", {"k": 1}):
        pass
    assert len(read_completion_manifests(ckpt, namespace="ns")) == 1
    # exception path does NOT mark completion
    with pytest.raises(RuntimeError), CompletionManifest(ckpt, "ns", {"k": 2}):
        raise RuntimeError("boom")
    assert len(read_completion_manifests(ckpt, namespace="ns")) == 1
    assert CompletionManifest(ckpt, "ns", {"k": 3}, enabled=False).mark_completed() is None


def test_read_completion_manifests_rejects_malformed(tmp_path):
    ckpt = tmp_path / "c3"
    m = CompletionManifest(ckpt, "ns", {"k": 1})
    path = m.mark_completed()
    path.write_text('{"status": "running"}')
    with pytest.raises(ValueError, match="status 'completed'"):
        read_completion_manifests(ckpt, namespace="ns")
    path.write_text("[]")
    with pytest.raises(TypeError, match="JSON object"):
        read_completion_manifests(ckpt, namespace="ns")


# --- failed-task markers ---------------------------------------------------


def test_failed_task_markers(tmp_path, monkeypatch):
    monkeypatch.delenv("NEMO_CURATOR_FAILED_TASKS_DIR", raising=False)
    # no dir configured → record is a no-op, exists is False
    record_failed_tasks()
    assert failed_task_manifest_exists() is False
    d = configure_failed_task_manifest_dir(tmp_path / "ckpt")
    assert "local_attempt_" in str(d)
    assert os.environ["NEMO_CURATOR_FAILED_TASKS_DIR"] == str(d)
    # configuring again keeps the existing env (attempt-scoped once)
    assert configure_failed_task_manifest_dir(tmp_path / "other") == d
    assert failed_task_manifest_exists() is False
    record_failed_tasks()
    assert failed_task_manifest_exists() is True
    assert (d / "failed_tasks.json").is_file()
    record_failed_tasks()  # idempotent


# --- file maintenance ------------------------------------------------------


def test_basename_and_ext():
    assert basename_and_ext("/a/b/data.jsonl") == ("data", ".jsonl")
    assert basename_and_ext("s3://bucket/key/file.parquet") == ("file", ".parquet")
    assert basename_and_ext("/a/b/noext") == ("noext", "")


def test_split_table_recursive():
    table = pa.table({"x": list(range(1000))})
    chunks = split_table(table, target_size=table.nbytes // 4)
    assert sum(c.num_rows for c in chunks) == 1000
    assert all(c.nbytes <= table.nbytes // 4 for c in chunks)
    # order preserved
    assert pa.concat_tables(chunks).column("x").to_pylist() == list(range(1000))


def test_split_parquet_file_by_size(tmp_path):
    src = str(tmp_path / "big.parquet")
    # many small row groups (~0.2 MB each) → PACKED up to the 1 MB target
    n = 20000
    table = pa.table(
        {"x": list(range(n)), "y": [f"v{i}" * 50 for i in range(n)]}
    )
    pq.write_table(table, src, row_group_size=500, compression="none")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    written = split_parquet_file_by_size(src, out_dir, 1)
    assert len(written) >= 2
    # content preserved in order
    merged = pa.concat_tables([pq.read_table(f) for f in written])
    assert merged.column("x").to_pylist() == list(range(n))
    assert all(os.path.basename(f).startswith("big_") for f in written)


def test_split_parquet_oversize_row_group(tmp_path):
    src = str(tmp_path / "huge_rg.parquet")
    n = 20000
    table = pa.table({"x": [f"v{i}" * 100 for i in range(n)]})  # several MB
    pq.write_table(table, src, row_group_size=n, compression="none")
    out_dir = str(tmp_path / "out2")
    os.makedirs(out_dir)
    # one over-target row group → recursive halving, every chunk under target
    written = split_parquet_file_by_size(src, out_dir, 1)
    assert len(written) >= 2
    merged = pa.concat_tables([pq.read_table(f) for f in written])
    assert merged.num_rows == n
    assert all(pq.read_table(f).nbytes <= 1024 * 1024 for f in written)


def test_split_jsonl_file_by_size(tmp_path):
    src = str(tmp_path / "data.jsonl")
    small = [json.dumps({"i": i, "t": "x" * 50}) for i in range(100)]
    giant = json.dumps({"i": "giant", "t": "y" * 300000})
    lines = small[:50] + [giant] + small[50:]
    with open(src, "w") as f:
        f.write("\n".join(lines) + "\n")
    out_dir = str(tmp_path / "outj")
    os.makedirs(out_dir)
    # target smaller than the giant line (0.25 MB ≈ 262144 bytes... use 1MB? )
    written = split_jsonl_file_by_size(src, out_dir, 1)
    # 1 MB target: giant (0.3 MB) fits under 1 MB → may merge; use tighter target
    all_lines = []
    for f in written:
        with open(f, "rb") as fh:
            all_lines.extend(fh.read().splitlines())
    assert len(all_lines) == 101
    assert all_lines == [ln.encode() for ln in lines]


def test_split_jsonl_oversize_line_own_shard(tmp_path):
    src = str(tmp_path / "d2.jsonl")
    giant = json.dumps({"t": "y" * (2 * 1024 * 1024)})  # 2 MB > 1 MB target
    with open(src, "w") as f:
        f.write(json.dumps({"i": 0}) + "\n" + giant + "\n" + json.dumps({"i": 1}) + "\n")
    out_dir = str(tmp_path / "o2")
    os.makedirs(out_dir)
    written = split_jsonl_file_by_size(src, out_dir, 1)
    assert len(written) == 3  # pending flush, giant alone, tail
    with open(written[1], "rb") as f:
        assert f.read().strip() == giant.encode()


def test_split_files_by_size_spark(spark, tmp_path):
    files = []
    for i in range(2):
        p = str(tmp_path / f"in{i}.jsonl")
        with open(p, "w") as f:
            for j in range(10):
                f.write(json.dumps({"f": i, "j": j}) + "\n")
        files.append(p)
    out_dir = str(tmp_path / "sout")
    res = split_files_by_size(spark, files, out_dir, "jsonl", 128).collect()
    assert {r["input_file"] for r in res} == set(files)
    assert all(os.path.isfile(r["output_file"]) for r in res)
    with pytest.raises(ValueError, match="file_type"):
        split_files_by_size(spark, files, out_dir, "csv")


def test_grouping_helpers():
    assert list(split_by_chunk_size(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    assert list(split_by_chunk_size(range(7), 3, drop_incomplete_chunk=True)) == [
        [0, 1, 2], [3, 4, 5],
    ]
    # custom size function counts weights, not elements
    assert list(split_by_chunk_size([5, 1, 4, 2], 5, custom_size_func=lambda x: x)) == [
        [5], [1, 4], [2],
    ]
    assert list(split_into_n_chunks(range(7), 3)) == [[0, 1, 2], [3, 4], [5, 6]]
    assert list(split_into_n_chunks(range(2), 5)) == [[0], [1]]
    assert list(pairwise([1, 2, 3])) == [(1, 2), (2, 3)]


# --- megatron merge --------------------------------------------------------


class _Tok:
    def encode(self, text):
        return [ord(c) % 250 for c in text]


def test_merge_file_prefixes(tmp_path):
    d = str(tmp_path / "shards")
    os.makedirs(d)
    texts_a = ["hello", "world"]
    texts_b = ["spark", "merges", "shards"]
    write_shard(texts_a, os.path.join(d, "shard-a"), _Tok(), 1000)
    write_shard(texts_b, os.path.join(d, "shard-b"), _Tok(), 1000)
    out_prefix = str(tmp_path / "merged")
    stats = merge_file_prefixes(d, out_prefix)
    assert stats["num_shards"] == 2 and stats["num_docs"] == 5
    docs = read_shard(out_prefix)
    expected = [_Tok().encode(t) for t in texts_a + texts_b]  # sorted prefixes: a, b
    assert [list(doc) for doc in docs] == expected
    lengths, doc_idx, dtype = extract_index_contents(out_prefix + ".idx")
    assert lengths.tolist() == [len(t) for t in texts_a + texts_b]
    assert doc_idx.tolist() == [0, 1, 2, 3, 4, 5]
    assert dtype == np.uint16  # vocab 1000 fits uint16


def test_merge_file_prefixes_errors(tmp_path):
    d = str(tmp_path / "bad")
    os.makedirs(d)
    with pytest.raises(ValueError, match="No valid file prefix pairs"):
        merge_file_prefixes(d, str(tmp_path / "m"))
    # orphan .bin without .idx raises
    with open(os.path.join(d, "orphan.bin"), "wb") as f:
        f.write(b"x")
    with pytest.raises(AssertionError, match=".idx file not provided"):
        merge_file_prefixes(d, str(tmp_path / "m"))


# --- tar_safe_extract (reference utils/file_utils.py:429-487) --------------


def test_tar_safe_extract(tmp_path):
    import io as io_mod
    import tarfile

    from nemo_curator_spark.io.file_maintenance import (
        is_safe_path,
        tar_safe_extract,
    )

    assert is_safe_path("a/b.txt", "/x")
    assert not is_safe_path("../escape", "/x")

    def make_tar(adder):
        buf = io_mod.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as t:
            adder(t)
        buf.seek(0)
        return tarfile.open(fileobj=buf)

    def add_file(t, name, payload=b"ok"):
        ti = tarfile.TarInfo(name)
        ti.size = len(payload)
        t.addfile(ti, io_mod.BytesIO(payload))

    dest = tmp_path / "out"
    dest.mkdir()
    # good tar extracts
    tar_safe_extract(make_tar(lambda t: add_file(t, "d/good.txt")), str(dest))
    assert (dest / "d" / "good.txt").read_bytes() == b"ok"
    # traversal member rejected
    import pytest

    with pytest.raises(ValueError, match="traversal"):
        tar_safe_extract(
            make_tar(lambda t: add_file(t, "../evil.txt")), str(dest)
        )
    # absolute member rejected
    with pytest.raises(ValueError, match="Absolute path"):
        tar_safe_extract(
            make_tar(lambda t: add_file(t, "/abs.txt")), str(dest)
        )
    # escaping symlink rejected; absolute symlink target rejected
    def add_link(t, name, target, absolute=False):
        ti = tarfile.TarInfo(name)
        ti.type = tarfile.SYMTYPE
        ti.linkname = target
        t.addfile(ti)

    with pytest.raises(ValueError, match="Symlink target"):
        tar_safe_extract(
            make_tar(lambda t: add_link(t, "l", "../../etc")), str(dest)
        )
    with pytest.raises(ValueError, match="Absolute symlink"):
        tar_safe_extract(
            make_tar(lambda t: add_link(t, "l", "/etc/passwd")), str(dest)
        )
    # device member rejected
    def add_dev(t):
        ti = tarfile.TarInfo("dev")
        ti.type = tarfile.CHRTYPE
        t.addfile(ti)

    with pytest.raises(ValueError, match="Device"):
        tar_safe_extract(make_tar(add_dev), str(dest))

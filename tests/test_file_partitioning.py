"""File-group partition planning — reference stages/file_partitioning.py
+ stages/client_partitioning.py + utils/file_utils.py:144-165,266-296,
378-400,488-560."""

from __future__ import annotations

import json
import os

import pytest

from nemo_curator_spark.io import file_partitioning as FP


# --- parse_bytes (the reference's doctest table, file_utils.py:494-513) ----

@pytest.mark.parametrize(
    ("s", "n"),
    [
        ("100", 100),
        ("100 MB", 100_000_000),
        ("100M", 100_000_000),
        ("5kB", 5000),
        ("5.4 kB", 5400),
        ("1kiB", 1024),
        ("1e6", 1_000_000),
        ("1e6 kB", 1_000_000_000),
        ("MB", 1_000_000),
        (123, 123),
        ("1Mi", 2**20),
        ("512MB", 512_000_000),
    ],
)
def test_parse_bytes(s, n):
    assert FP.parse_bytes_string_to_int(s) == n


def test_parse_bytes_errors():
    with pytest.raises(ValueError):
        FP.parse_bytes_string_to_int("5 blah")


def test_dataset_name():
    assert FP.infer_dataset_name_from_path("/data/wiki_en/part0.jsonl") == "wiki_en"
    assert FP.infer_dataset_name_from_path("file.jsonl") == "file"
    assert FP.infer_dataset_name_from_path("s3://bucket/corpus/f.parquet") == "f.parquet".lower()
    assert FP.infer_dataset_name_from_path("s3://bucket", ) == "bucket"
    assert (
        FP.infer_dataset_name_from_path("/data/Corpus_A/", path_kind="directory")
        == "corpus_a"
    )


# --- partitioning math -----------------------------------------------------

def test_partition_by_count():
    files = [f"f{i}" for i in range(7)]
    assert FP.partition_by_count(files, 3) == [
        ["f0", "f1", "f2"],
        ["f3", "f4", "f5"],
        ["f6"],
    ]


def test_partition_by_size_greedy_fold():
    # size-sorted fold; flush-on-overflow; oversized file lands alone.
    files = [("a", 10), ("b", 20), ("c", 30), ("d", 100), ("e", 35)]
    parts = FP.partition_by_size(files, 60)
    assert parts == [["a", "b", "c"], ["e"], ["d"]]


def test_partition_by_size_exact_boundary():
    # current+size == max does NOT flush (strict >).
    parts = FP.partition_by_size([("a", 30), ("b", 30)], 60)
    assert parts == [["a", "b"]]


# --- plan_file_groups ------------------------------------------------------

@pytest.fixture()
def tree(tmp_path):
    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    sizes = {"a.jsonl": 10, "b.jsonl": 200, "sub/c.jsonl": 50, "skip.txt": 5}
    for rel, n in sizes.items():
        (d / rel).write_bytes(b"x" * n)
    return str(d)


def test_plan_default_one_file_each(tree):
    groups = FP.plan_file_groups(tree)
    assert [len(g.data) for g in groups] == [1, 1, 1]  # .txt filtered
    assert all(g.total_partitions == 3 for g in groups)
    assert [g.partition_index for g in groups] == [0, 1, 2]
    assert groups[0].dataset_name == "corpus"
    # path-sorted when no blocksize
    assert [os.path.basename(g.data[0]) for g in groups] == [
        "a.jsonl",
        "b.jsonl",
        "c.jsonl",
    ]


def test_plan_blocksize(tree):
    groups = FP.plan_file_groups(tree, blocksize=100)
    names = [[os.path.basename(p) for p in g.data] for g in groups]
    assert names == [["a.jsonl", "c.jsonl"], ["b.jsonl"]]


def test_plan_limit_caps_groups(tree):
    groups = FP.plan_file_groups(tree, limit=2)
    assert len(groups) == 2
    assert groups[0].total_partitions == 3  # pre-limit plan, like the reference


def test_plan_mutual_exclusion(tree):
    with pytest.raises(ValueError):
        FP.plan_file_groups(tree, files_per_partition=2, blocksize="1MB")


def test_plan_list_input_no_recurse(tree):
    groups = FP.plan_file_groups([tree], files_per_partition=2)
    # non-recursive over the listed dir: sub/c.jsonl not included
    flat = [os.path.basename(p) for g in groups for p in g.data]
    assert flat == ["a.jsonl", "b.jsonl"]


# --- client_partition_plan -------------------------------------------------

def test_client_plan_limit_caps_files(tree):
    groups = FP.client_partition_plan(tree, file_extensions=[".jsonl"], limit=2)
    flat = [os.path.basename(p) for g in groups for p in g.data]
    assert flat == ["a.jsonl", "b.jsonl"]  # sorted rel paths, first 2 files
    assert all(len(g.data) == 1 for g in groups)
    assert groups[0].dataset_name == "corpus"


def test_client_plan_grouping_and_recurse(tree):
    groups = FP.client_partition_plan(
        tree, file_extensions=[".jsonl"], files_per_partition=2
    )
    names = [[os.path.basename(p) for p in g.data] for g in groups]
    assert names == [["a.jsonl", "b.jsonl"], ["c.jsonl"]]


def test_client_list_json(tree, tmp_path):
    lst = tmp_path / "list.json"
    lst.write_text(
        json.dumps(
            [f"{tree}/b.jsonl", f"{tree}/a.jsonl", f"{tree}/b.jsonl"]  # dup
        )
    )
    groups = FP.client_partition_plan(tree, input_list_json_path=str(lst))
    flat = [os.path.basename(p) for g in groups for p in g.data]
    assert flat == ["a.jsonl", "b.jsonl"]  # deduped + sorted


def test_client_list_json_outside_root(tree, tmp_path):
    lst = tmp_path / "list.json"
    lst.write_text(json.dumps(["/elsewhere/x.jsonl"]))
    with pytest.raises(ValueError, match="not under root"):
        FP.client_partition_plan(tree, input_list_json_path=str(lst))


def test_file_groups_df(spark, tree):
    groups = FP.plan_file_groups(tree, files_per_partition=2)
    df = FP.file_groups_df(spark, groups)
    rows = {r.partition_index: r for r in df.collect()}
    assert sorted(rows) == [0, 1]
    assert rows[0].group_bytes == 210  # a(10) + b(200)
    assert rows[0].dataset_name == "corpus"
    assert df.rdd.getNumPartitions() == 2

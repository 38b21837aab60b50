"""Grouping helpers (reference utils/grouping.py) — exact-port pins."""

from __future__ import annotations

from nemo_curator_spark.functions import grouping as G


def test_split_by_chunk_size():
    assert list(G.split_by_chunk_size(range(7), 3)) == [
        [0, 1, 2],
        [3, 4, 5],
        [6],
    ]
    assert list(
        G.split_by_chunk_size(range(7), 3, drop_incomplete_chunk=True)
    ) == [[0, 1, 2], [3, 4, 5]]
    # custom size: a chunk closes the moment the running size REACHES
    # chunk_size (greedy, may overshoot with the triggering item inside)
    sizes = [2, 2, 3, 1, 1]
    got = list(G.split_by_chunk_size(sizes, 4, custom_size_func=lambda x: x))
    assert got == [[2, 2], [3, 1], [1]]
    assert list(G.split_by_chunk_size([], 3)) == []


def test_split_into_n_chunks():
    # fewer items than chunks -> singletons (not padded)
    assert list(G.split_into_n_chunks([1, 2], 5)) == [[1], [2]]
    # divmod split: the r remainder chunks (size d+1) come first
    assert list(G.split_into_n_chunks(range(7), 3)) == [
        [0, 1, 2],
        [3, 4],
        [5, 6],
    ]
    assert list(G.split_into_n_chunks(range(6), 3)) == [
        [0, 1],
        [2, 3],
        [4, 5],
    ]


def test_reference_cases():
    # ported verbatim from the reference's tests/utils/test_grouping.py
    assert list(
        G.split_by_chunk_size(["a", "bb", "ccc", "dddd", "e"], 5,
                              custom_size_func=len)
    ) == [["a", "bb", "ccc"], ["dddd", "e"]]
    data = [("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 1)]
    assert list(
        G.split_by_chunk_size(data, 5, custom_size_func=lambda x: x[1])
    ) == [[("a", 1), ("b", 2), ("c", 3)], [("d", 4), ("e", 1)]]
    assert list(G.split_into_n_chunks([1, 2, 3, 4, 5, 6, 7, 8], 3)) == [
        [1, 2, 3],
        [4, 5, 6],
        [7, 8],
    ]
    assert list(G.split_into_n_chunks(list(range(10)), 3)) == [
        [0, 1, 2, 3],
        [4, 5, 6],
        [7, 8, 9],
    ]
    assert list(G.split_into_n_chunks("hello world", 3)) == [
        ["h", "e", "l", "l"],
        ["o", " ", "w", "o"],
        ["r", "l", "d"],
    ]


def test_pairwise():
    assert list(G.pairwise([1, 2, 3, 4])) == [(1, 2), (2, 3), (3, 4)]
    assert list(G.pairwise([1])) == []
    assert list(G.pairwise([])) == []

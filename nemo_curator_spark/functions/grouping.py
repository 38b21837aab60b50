"""Iterable grouping helpers — exact ports of reference
utils/grouping.py:36-102 (used by the video clipping stages and the
VLM batchers for like-sized batch assembly; here available to any
mapInPandas stage that needs the same batch shapes).
"""

from __future__ import annotations

import itertools
from collections.abc import Generator, Iterable
from typing import Callable, TypeVar

T = TypeVar("T")


def split_by_chunk_size(
    iterable: Iterable[T],
    chunk_size: int,
    custom_size_func: Callable[[T], int] = lambda x: 1,  # noqa: ARG005
    *,
    drop_incomplete_chunk: bool = False,
) -> Generator[list[T], None, None]:
    """grouping.py:36-67, exact: greedy accumulation until the running
    custom size reaches chunk_size; the incomplete tail is kept unless
    drop_incomplete_chunk."""
    out: list[T] = []
    cur_count = 0
    for value in iterable:
        out.append(value)
        cur_count += custom_size_func(value)
        if cur_count >= chunk_size:
            yield out
            out = []
            cur_count = 0
    if out and not drop_incomplete_chunk:
        yield out


def split_into_n_chunks(
    iterable: Iterable[T], num_chunks: int
) -> Generator[list[T], None, None]:
    """grouping.py:69-87, exact: fewer items than chunks -> singletons;
    otherwise the divmod split putting the +1-sized chunks first."""
    it = list(iterable)
    if len(it) <= num_chunks:
        yield from [[x] for x in it]
        return
    d, r = divmod(len(it), num_chunks)
    for i in range(num_chunks):
        si = (d + 1) * (min(r, i)) + d * (0 if i < r else i - r)
        yield it[si : si + (d + 1 if i < r else d)]


def pairwise(iterable: Iterable[T]) -> Iterable[tuple[T, T]]:
    """grouping.py:89-102, exact (itertools tee form)."""
    a, b = itertools.tee(iterable)
    next(b, None)
    return zip(a, b)

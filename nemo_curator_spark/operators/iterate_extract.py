"""Generic iterate-extract fan-out operator (reference
DocumentIterateExtractStage, stages/text/download/base/iterator.py:51-152):
stream records out of an archive/binary payload, optionally transform each
record, 1→N fan-out via ``mapInPandas``.

The WARC-specific iterator would plug a ``warcio``-based ``iterator_fn``
here (library absent — the shape is exercised with a length-prefixed test
format in tests).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def iterate_extract(
    df: DataFrame,
    iterator_fn: Callable[[bytes], Iterator[dict]],
    output_schema: str,
    payload_col: str = "payload",
    carry_cols: tuple[str, ...] = (),
    record_limit: int | None = None,
    extractor_fn: Callable[[dict], dict | None] | None = None,
    add_filename_column: bool | str = False,
    path_col: str = "path",
) -> DataFrame:
    """For each row, yield one output row per record the iterator produces
    from the binary payload. ``extractor_fn`` may transform or drop
    (return None) records; ``record_limit`` caps records per payload
    (reference record_limit semantics). ``add_filename_column``
    (iterator.py:62-68,122-133 via utils/column_utils.py): stamp the
    basename of ``path_col`` on every iterated record BEFORE extraction
    and copy it onto the extracted record after — True uses the default
    ``file_name`` name, a string names the column. The resolved column
    must appear in ``output_schema``."""
    import os

    from nemo_curator_spark.io.columns import resolve_filename_column

    filename_col = resolve_filename_column(add_filename_column)

    def fn(batches):
        for pdf in batches:
            rows = []
            for _, src in pdf.iterrows():
                n = 0
                fname = (
                    os.path.basename(str(src[path_col]))
                    if filename_col is not None
                    else None
                )
                for rec in iterator_fn(bytes(src[payload_col])):
                    if record_limit is not None and n >= record_limit:
                        break
                    if filename_col is not None:
                        rec[filename_col] = fname
                    if extractor_fn is not None:
                        rec = extractor_fn(rec)
                        if rec is None:
                            # extractor-dropped records do NOT consume the
                            # limit (reference iterator.py:126-135: the
                            # counter increments only when the extracted
                            # record is appended)
                            continue
                        # iterator.py:131-132: the extracted record keeps
                        # the filename even if the extractor dropped it
                        if filename_col is not None:
                            rec[filename_col] = fname
                    for c in carry_cols:
                        rec[c] = src[c]
                    rows.append(rec)
                    n += 1
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema=output_schema)


def length_prefixed_iterator(payload: bytes) -> Iterator[dict]:
    """Test-format iterator: [4-byte big-endian length][utf-8 record]..."""
    pos = 0
    idx = 0
    while pos + 4 <= len(payload):
        n = int.from_bytes(payload[pos : pos + 4], "big")
        pos += 4
        yield {"record_id": idx, "content": payload[pos : pos + n].decode("utf-8")}
        pos += n
        idx += 1

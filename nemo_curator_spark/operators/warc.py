"""WARC record iteration, stdlib-only (reference CommonCrawlWarcIterator,
stages/text/download/common_crawl/warc_iterator.py:28-57, which wraps
warcio — absent from this environment).

Record contract mirrored exactly: yield ``{url, warc_id, source_id,
content}`` for every ``WARC-Type: response`` record, where ``content`` is
the HTTP body (headers stripped, like warcio's content_stream),
``warc_id`` strips the ``<urn:uuid:`` ... ``>`` wrapper ([10:-1], same
slice as the reference), and malformed records are skipped with processing
continuing (warc_iterator.py:46-55). Gzipped WARCs (Common Crawl ships
per-record gzip members) decompress via stdlib gzip, which handles
concatenated members.

Deviation (documented): warcio additionally decodes Transfer-Encoding:
chunked and Content-Encoding bodies; this iterator returns the raw body
bytes — plug warcio here when available.

Spark form: :func:`warc_to_rows` — binaryFile scan → ``mapInPandas``
fan-out, one task per WARC file (the reference's FileGroupTask shape).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

OUTPUT_COLUMNS = ["url", "warc_id", "source_id", "content"]


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1")] = v.strip().decode("latin-1")
    return headers


def iter_warc_stream(stream, source_id: str) -> Iterator[dict]:
    """Yield response records from a decompressed WARC byte stream."""
    buf = stream.read()
    pos = 0
    n = len(buf)
    while pos < n:
        # find the next record header ("WARC/" version line)
        start = buf.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = buf.find(b"\r\n\r\n", start)
        if head_end < 0:
            break
        headers = _parse_headers(buf[start:head_end])
        try:
            length = int(headers.get("Content-Length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        body = buf[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("WARC-Type") != "response":
            continue
        try:
            rec_id = headers["WARC-Record-ID"][10:-1]  # <urn:uuid:...>
            url = headers["WARC-Target-URI"]
        except KeyError:
            # reference behavior: log-and-continue on broken records
            continue
        # body is an HTTP response: strip status line + headers
        sep = body.find(b"\r\n\r\n")
        content = body[sep + 4 :] if sep >= 0 else body
        yield {
            "url": url,
            "warc_id": rec_id,
            "source_id": source_id,
            "content": content,
        }


def iter_warc_bytes(data: bytes, source_id: str) -> Iterator[dict]:
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    yield from iter_warc_stream(io.BytesIO(data), source_id)


def iter_warc_file(file_path: str) -> Iterator[dict]:
    filename = str(file_path).split("/")[-1]
    with open(file_path, "rb") as f:
        yield from iter_warc_bytes(f.read(), filename)


def warc_to_rows(spark, paths: str | list[str]):
    """WARC file(s) → DataFrame(url, warc_id, source_id, content): a
    binaryFile scan fans out to records via mapInPandas (one python pass
    per file — Spark's split planning replaces FilePartitioningStage)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(paths)

    def fan_out(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                name = r["path"].split("/")[-1]
                rows.extend(iter_warc_bytes(bytes(r["content"]), name))
            yield pd.DataFrame(
                rows, columns=OUTPUT_COLUMNS
            ) if rows else pd.DataFrame(
                {c: pd.Series(dtype=object) for c in OUTPUT_COLUMNS}
            )

    return files.select("path", "content").mapInPandas(
        fan_out, schema="url string, warc_id string, source_id string, content binary"
    )

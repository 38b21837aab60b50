"""WARC iteration, fixtures ported from the reference's own
tests/stages/text/download/common_crawl/test_warc_iterator.py."""

from __future__ import annotations

import gzip

from nemo_curator_spark.operators import warc


def _record(
    body: bytes = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    b"<html><body>Test</body></html>\r\n",
    rec_type: str = "response",
    rec_id: str | None = "<urn:uuid:test123>",
    uri: str | None = "http://example.com",
) -> bytes:
    headers = [f"WARC/1.0\r\nWARC-Type: {rec_type}"]
    if rec_id:
        headers.append(f"WARC-Record-ID: {rec_id}")
    headers.append("WARC-Date: 2022-01-01T00:00:00Z")
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    headers.append(f"Content-Length: {len(body)}")
    return "\r\n".join(headers).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"


def test_single_response_record(tmp_path):
    # reference test_stop_iteration_handling (test_warc_iterator.py:25-55)
    p = tmp_path / "test.warc"
    p.write_bytes(_record())
    records = list(warc.iter_warc_file(str(p)))
    assert len(records) == 1
    assert records[0]["warc_id"] == "test123"
    assert records[0]["url"] == "http://example.com"
    assert records[0]["source_id"] == "test.warc"
    # warcio's content_stream strips the HTTP envelope
    assert records[0]["content"] == b"<html><body>Test</body></html>\r\n"


def test_broken_record_skipped_processing_continues(tmp_path):
    # reference test_error_processing_record_continues: a response record
    # missing WARC-Record-ID is skipped, later records still yield
    p = tmp_path / "test.warc"
    p.write_bytes(_record(rec_id=None) + _record(rec_id="<urn:uuid:ok1>"))
    records = list(warc.iter_warc_file(str(p)))
    assert [r["warc_id"] for r in records] == ["ok1"]


def test_non_response_records_filtered(tmp_path):
    p = tmp_path / "test.warc"
    p.write_bytes(
        _record(rec_type="warcinfo", rec_id="<urn:uuid:info>")
        + _record(rec_type="request", rec_id="<urn:uuid:req>")
        + _record(rec_id="<urn:uuid:resp>")
    )
    records = list(warc.iter_warc_file(str(p)))
    assert [r["warc_id"] for r in records] == ["resp"]


def test_gzip_concatenated_members(tmp_path):
    # Common Crawl ships one gzip member per record
    p = tmp_path / "test.warc.gz"
    members = b"".join(
        gzip.compress(_record(rec_id=f"<urn:uuid:r{i}>".encode().decode()))
        for i in range(3)
    )
    p.write_bytes(members)
    records = list(warc.iter_warc_file(str(p)))
    assert [r["warc_id"] for r in records] == ["r0", "r1", "r2"]


def test_body_containing_warc_marker(tmp_path):
    # "WARC/" inside an HTTP body must not be mistaken for a record start
    body = b"HTTP/1.1 200 OK\r\n\r\npage mentions WARC/1.0 in prose"
    p = tmp_path / "test.warc"
    p.write_bytes(_record(body=body) + _record(rec_id="<urn:uuid:n2>"))
    records = list(warc.iter_warc_file(str(p)))
    assert len(records) == 2
    assert records[0]["content"] == b"page mentions WARC/1.0 in prose"


def test_warc_to_rows_spark(spark, tmp_path):
    for i in range(2):
        (tmp_path / f"f{i}.warc").write_bytes(
            _record(rec_id=f"<urn:uuid:f{i}>", uri=f"http://x{i}.com")
        )
    df = warc.warc_to_rows(spark, str(tmp_path))
    rows = {r["warc_id"]: r for r in df.collect()}
    assert set(rows) == {"f0", "f1"}
    assert rows["f0"]["url"] == "http://x0.com"
    assert rows["f0"]["source_id"] == "f0.warc"
    assert bytes(rows["f0"]["content"]) == b"<html><body>Test</body></html>\r\n"

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


def test_common_crawl_composite_end_to_end(spark, tmp_path):
    """WARC bytes -> records -> decode -> lang_detect -> justext ->
    \\n\\n-joined text (reference extract.py:66-95 contract), asserting the
    reference's simple-English golden paragraph."""
    from nemo_curator_spark.operators import extraction
    from tests.test_extraction_goldens import (
        SIMPLE_EXPECTED,
        SIMPLE_HTML,
        THAI_EXPECTED,
        THAI_HTML,
    )

    def http(html: str) -> bytes:
        return b"HTTP/1.1 200 OK\r\n\r\n" + html.encode("utf-8")

    (tmp_path / "cc.warc").write_bytes(
        _record(body=http(SIMPLE_HTML), rec_id="<urn:uuid:en1>", uri="http://en.com")
        + _record(body=http(THAI_HTML), rec_id="<urn:uuid:th1>", uri="http://th.com")
        + _record(body=http("<p></p>"), rec_id="<urn:uuid:empty>", uri="http://e.com")
    )
    rows = {
        r["warc_id"]: r
        for r in extraction.common_crawl_extract(
            warc.warc_to_rows(spark, str(tmp_path / "cc.warc"))
        ).collect()
    }
    # empty doc filtered (extractor returned no paragraphs)
    assert set(rows) == {"en1", "th1"}
    assert rows["en1"]["language"] == "ENGLISH"
    assert rows["en1"]["text"] == "\n\n".join(SIMPLE_EXPECTED)
    assert rows["th1"]["language"] == "THAI"
    assert rows["th1"]["text"] == "\n\n".join(THAI_EXPECTED)


def test_lang_detect_standin():
    from nemo_curator_spark.operators.extraction import lang_detect

    assert lang_detect("the cat is on the mat and that is fine") == "ENGLISH"
    assert lang_detect("der hund und die katze das ist ein haus") == "GERMAN"
    assert lang_detect("le chien est dans la maison et les chats") == "FRENCH"
    assert lang_detect("el perro es una mascota que vive con para") == "SPANISH"
    assert lang_detect("这是一个中文句子没有空格") == "CHINESE"
    assert lang_detect("これは日本語の文です") == "JAPANESE"
    assert lang_detect("นี่คือประโยคภาษาไทย") == "THAI"
    assert lang_detect("이것은 한국어 문장입니다") == "KOREAN"
    assert lang_detect("это русское предложение для теста") == "RUSSIAN"
    assert lang_detect("") == "UNKNOWN"

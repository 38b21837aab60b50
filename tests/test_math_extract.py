"""Math content extraction pins (reference math/download/extract.py +
mime_types.py semantics)."""

from __future__ import annotations

import json

from nemo_curator_spark.operators import math_extract as ME


NOTEBOOK = json.dumps(
    {
        "nbformat": 4,
        "nbformat_minor": 5,
        "cells": [
            {"cell_type": "markdown", "source": ["# Title\n", "intro\n"]},
            {
                "cell_type": "code",
                "source": ["print(1+1)\n"],
                "outputs": [
                    {"output_type": "stream", "text": ["2\n"]},
                    {
                        "output_type": "execute_result",
                        "data": {"text/plain": ["<result 2>"],
                                 "image/png": "ignored"},
                    },
                    {"output_type": "text", "text": ["legacy\n"]},
                ],
            },
            {"cell_type": "raw", "source": ["raw tail"]},
        ],
    }
)


def test_notebook_detection_and_flattening():
    assert ME.is_notebook(NOTEBOOK)
    assert not ME.is_notebook('{"cells": "nope"}')
    assert not ME.is_notebook("plain text")
    text = ME.notebook_to_text(NOTEBOOK)
    assert text == "# Title\nintro\nprint(1+1)\n2\n<result 2>legacy\nraw tail"


def test_is_html_document_requires_all_six_tags():
    full = "<html><head><title>t</title></head><body>x</body></html>"
    assert ME.is_html_document(full)
    assert not ME.is_html_document("<html><body>x</body></html>")  # no head
    assert not ME.is_html_document("<p>fragment</p>")


def test_determine_type_precedence():
    # notebook gate: magic json OR .ipynb url, plus structure
    assert ME.determine_type(NOTEBOOK, "application/json", None, None) == "notebook"
    assert ME.determine_type(NOTEBOOK, None, None, "http://x/a.ipynb") == "notebook"
    assert ME.determine_type('{"a": 1}', "application/json", None, None) == "html"
    # header tables with no magic
    assert ME.determine_type("x", None, "text/x-python", None) == "text"
    assert ME.determine_type("x", None, "text/html", None) == "html"
    assert ME.determine_type("x", None, "application/weird", None) == "html"
    # magic tables
    assert ME.determine_type("x", "text/html", None, None) == "html"
    assert ME.determine_type("x", "text/plain", None, None) == "text"
    assert ME.determine_type("x", "application/zip", "application/x-tex", None) == "text"
    assert ME.determine_type("x", "application/zip", None, None) == "html"
    assert ME.determine_type("", None, None, None) == "text"


def test_decode_bytes_fallback_and_xml_strip():
    assert ME.decode_bytes("héllo".encode()) == "héllo"
    # invalid utf-8 falls back to the injected/default detector
    assert ME.decode_bytes(b"\xff\xfeab") == "ÿþab"  # latin-1 default
    assert ME.decode_bytes(b"\xff", detect_encoding=lambda b: None) is None
    assert ME.decode_bytes(None) is None
    assert ME.decode_bytes(b'<?xml version="1.0"?><root/>') == "<root/>"


def test_extract_record_paths():
    rec = ME.extract_record(NOTEBOOK.encode(), "http://x/nb.ipynb", None)
    assert rec["type"] == "notebook"
    assert "print(1+1)" in rec["text"]
    assert rec["magic_mime_type"] == "application/json"

    html = b"<html><head></head><body><p>Hello world content</p></body></html>"
    rec = ME.extract_record(html, "http://x/p", "text/html")
    assert rec["type"] == "html"
    assert "Hello world content" in rec["text"]

    rec = ME.extract_record(b"plain \\alpha tex", "http://x/t", "application/x-tex")
    assert rec["type"] == "text"
    assert rec["text"] == "plain \\alpha tex"

    assert ME.extract_record(None, "u", None) is None


def test_spark_math_extract(spark):
    rows = [
        (NOTEBOOK.encode(), "http://x/nb.ipynb", None),
        (b"<html><head></head><body>page text here</body></html>",
         "http://x/h", "text/html"),
        (b"just text", "http://x/t", "text/plain"),
        (None, "http://x/none", None),  # dropped
    ]
    df = spark.createDataFrame(
        rows, "binary_content binary, url string, mime_type string"
    )
    out = ME.math_extract(df).orderBy("url").toPandas()
    assert out.url.tolist() == ["http://x/h", "http://x/nb.ipynb", "http://x/t"]
    assert out.type.tolist() == ["html", "notebook", "text"]


def test_spark_math_extract_filename_column(spark):
    rows = [
        (b"just text", "http://x/t", "text/plain", "crawl-00.warc"),
        (None, "http://x/none", None, "crawl-01.warc"),  # dropped
    ]
    df = spark.createDataFrame(
        rows,
        "binary_content binary, url string, mime_type string,"
        " file_name string",
    )
    out = ME.math_extract(df, add_filename_column=True).toPandas()
    assert out.file_name.tolist() == ["crawl-00.warc"]
    # resolved column absent from the input -> contract unchanged
    # (extract.py copies only when the column exists on the row)
    out2 = ME.math_extract(
        df, add_filename_column="missing_col"
    ).toPandas()
    assert "missing_col" not in out2.columns

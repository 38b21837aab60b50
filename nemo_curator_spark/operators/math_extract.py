"""Math-pipeline content extraction — reference
stages/math/download/extract.py + mime_types.py: decode fetched bytes,
classify each document as notebook / html / text, and extract text
accordingly (Jupyter notebooks flattened cell-by-cell; HTML handed to a
pluggable text extractor).

Exact ports: the XML-declaration strip, notebook detection and
cell/output flattening (extract.py:35-86 — code/markdown/raw sources,
stream text, execute_result/display_data text/plain), the full-document
HTML test (all six of html/head/body open+close, extract.py:177-184),
the type-determination precedence (notebook > magic/header mime tables >
html default, extract.py:186-217), and the MIME tables verbatim
(mime_types.py — the tables ARE the classification contract).

Plug points (library-gated in this sandbox, injectable here):

* ``detect_encoding`` (charset detection lib) — default fallback tries
  latin-1 after utf-8 fails (latin-1 never raises, mirroring the
  "give the filter chain *something*" posture of decode_html);
* ``magic_mime`` (python-magic) — default derives a magic type from
  leading bytes for the formats the tables actually consult (JSON
  object sniff for notebooks, '<' sniff for html) and None otherwise;
* the HTML extractor (reference: lynx subprocess) — default is the
  repo's resiliparse-style stdlib extractor
  (operators/html_extract_like.py).

Spark shape: one mapInPandas over the fetched batch — extraction is
per-row pure, rows whose extraction fails are dropped (the stage's
``None`` filter), nothing shuffles.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql import types as T

# mime_types.py — verbatim classification tables
TEXT_MIME_TYPES = {
    "text/x-web-markdown", "text/x-verilog", "text/x-rst", "text/x-ruby",
    "text/x-rsrc", "text/x-python", "text/x-perl", "text/x-pascal",
    "text/x-objcsrc", "text/x-ml", "text/x-matlab", "text/x-log",
    "text/x-haskell", "text/x-fortran", "text/x-expect", "text/x-diff",
    "text/x-csrc", "text/x-common-lisp", "text/x-chdr", "text/x-cgi",
    "text/x-c++src", "text/x-basic", "text/vtt", "text/x-assembly",
    "text/troff", "text/plain", "message/rfc822", "message/news",
    "application/mathematica", "application/mbox", "application/postscript",
    "application/x-elc", "application/x-matlab-data", "application/x-sas",
    "application/x-sh", "application/x-subrip", "application/x-tex",
    "application/x-tika-msoffice",
}

HTML_MIME_TYPES = {
    "text/x-php", "text/x-jsp", "text/x-coldfusion", "text/html",
    "message/x-emlx", "text/asp", "image/svg+xml", "application/xml",
    "application/atom+xml", "application/rdf+xml", "application/rss+xml",
    "application/x-bibtex-text-file", "application/xhtml+xml",
}

TEXT_MAGIC_TYPES = {"text/plain"}
HTML_MAGIC_TYPES = {"text/html", "text/xml", "application/xml", "image/svg+xml"}


def remove_xml_encoding_declaration(text: str) -> str:
    """extract.py:35-36."""
    return re.sub(r"^\s*<\?xml.*\?>", "", text)


def default_magic_mime(binary: bytes) -> str | None:
    """python-magic stand-in for the types the tables consult: JSON
    object → application/json (the notebook gate), leading '<' →
    text/html; otherwise None (the determine_type None branch)."""
    head = binary[:256].lstrip()
    if head.startswith(b"{"):
        return "application/json"
    if head.startswith(b"<"):
        return "text/html"
    return None


def decode_bytes(binary: bytes | None, detect_encoding=None) -> str | None:
    """extract.py:38-51: utf-8 first, then the detected encoding; None
    when nothing decodes. The charset-detection lib is injectable; the
    default detector answers latin-1 (which never raises)."""
    if binary is None:
        return None
    try:
        content = bytes(binary).decode("utf-8")
    except (UnicodeDecodeError, UnicodeError, LookupError):
        enc = (detect_encoding or (lambda b: "latin-1"))(binary)
        if enc is None or enc == "utf-8":
            return None
        try:
            content = bytes(binary).decode(enc)
        except (UnicodeDecodeError, UnicodeError, LookupError):
            return None
    return remove_xml_encoding_declaration(content)


def is_notebook(content: str) -> bool:
    """extract.py:53-64."""
    try:
        data = json.loads(content)
    except (ValueError, TypeError):
        return False
    return (
        isinstance(data, dict)
        and "nbformat" in data
        and "nbformat_minor" in data
        and "cells" in data
        and isinstance(data["cells"], list)
    )


def notebook_to_text(content: str) -> str:
    """extract.py:67-86: concatenate cell sources (code/markdown/raw)
    and code outputs (stream text, execute_result/display_data
    text/plain, legacy 'text')."""
    data = json.loads(content)
    out = ""
    for cell in data.get("cells", []):
        t = cell.get("cell_type")
        if t in ["code", "markdown", "raw"]:
            out += "".join(cell.get("source", []))
        if t == "code" and "outputs" in cell:
            for o in cell["outputs"]:
                if o.get("output_type") == "stream":
                    out += "".join(o.get("text", []))
                elif o.get("output_type") in ["execute_result", "display_data"]:
                    d = o.get("data", {})
                    if "text/plain" in d:
                        out += "".join(d["text/plain"])
                elif o.get("output_type") == "text":
                    out += "".join(o.get("text", []))
    return out


def is_html_document(text: str) -> bool:
    """extract.py:177-184: ALL of html/head/body must open AND close."""
    checks = [
        r"<html[^>]*>", r"</html\s*>", r"<head[^>]*>", r"</head\s*>",
        r"<body[^>]*>", r"</body\s*>",
    ]
    return all(re.search(p, text, re.IGNORECASE) for p in checks)


def determine_type(
    content: str | None,
    magic_mime_type: str | None,
    mime_type: str | None,
    url: str | None,
) -> str:
    """extract.py:186-226: notebook gate first (magic json OR .ipynb url,
    plus structural validation), then the table precedence with html as
    the default."""
    if not content:
        return "text"
    try:
        nb_gate = (magic_mime_type == "application/json") or (
            url and url.endswith(".ipynb")
        )
        if nb_gate and is_notebook(content):
            return "notebook"
    except (TypeError, AttributeError, ValueError):
        pass
    if magic_mime_type is None:
        if mime_type in TEXT_MIME_TYPES:
            return "text"
        return "html"  # header-html, structural html, or unknown
    if magic_mime_type in HTML_MAGIC_TYPES or (
        mime_type and mime_type in HTML_MIME_TYPES
    ):
        return "html"
    if mime_type in TEXT_MIME_TYPES or magic_mime_type in TEXT_MAGIC_TYPES:
        return "text"
    return "html"


def _default_html_extractor(html: str) -> str:
    from nemo_curator_spark.operators import html_extract_like as HX

    paras = HX.resiliparse_extract_text(
        html, HX.density_stopwords(), required_stopword_density=0.0
    )
    return "\n\n".join(paras or [])


def extract_record(
    binary,
    url,
    mime_type,
    html_extractor=None,
    magic_mime=default_magic_mime,
    detect_encoding=None,
) -> dict | None:
    """MathContentExtractor.extract (extract.py:127-175) for one record;
    None (drop) when nothing decodes."""
    magic_mime_type = None
    if isinstance(binary, (bytes, bytearray)):
        try:
            magic_mime_type = magic_mime(bytes(binary)) if magic_mime else None
        except Exception:
            magic_mime_type = None
    content = decode_bytes(
        binary if isinstance(binary, (bytes, bytearray)) else None,
        detect_encoding,
    )
    if not content:
        return None
    doc_type = determine_type(content, magic_mime_type, mime_type, url)
    if doc_type == "notebook":
        text = notebook_to_text(content)
    elif doc_type == "html":
        text = (html_extractor or _default_html_extractor)(content)
    else:
        text = content
    return {
        "text": text,
        "url": url,
        "type": doc_type,
        "magic_mime_type": magic_mime_type,
    }


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("magic_mime_type", T.StringType()),
    ]
)


def math_extract(
    df: DataFrame,
    binary_col: str = "binary_content",
    url_col: str = "url",
    mime_col: str = "mime_type",
    html_extractor=None,
    add_filename_column: bool | str = False,
) -> DataFrame:
    """MathExtractStage (extract.py:225-270) as one mapInPandas pass:
    per-row extraction, None results dropped, nothing shuffles.
    ``add_filename_column`` (extract.py:234-258 via
    utils/column_utils.py): when the resolved column exists on the
    input, copy its value onto every extracted record."""
    from nemo_curator_spark.io.columns import resolve_filename_column

    filename_col = resolve_filename_column(add_filename_column)
    out_cols = ["text", "url", "type", "magic_mime_type"]
    schema = _OUT_SCHEMA
    in_cols = [binary_col, url_col, mime_col]
    carry_filename = filename_col is not None and filename_col in df.columns
    if carry_filename:
        out_cols = [*out_cols, filename_col]
        schema = T.StructType(
            [*_OUT_SCHEMA.fields, T.StructField(filename_col, T.StringType())]
        )
        in_cols.append(filename_col)

    def gen(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                rec = extract_record(
                    r[binary_col], r[url_col], r[mime_col], html_extractor
                )
                if rec is not None:
                    if carry_filename:
                        rec[filename_col] = r[filename_col]
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=out_cols)

    return df.select(*in_cols).mapInPandas(gen, schema)

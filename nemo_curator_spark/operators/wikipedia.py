"""Wikipedia dump iteration + wikitext extraction (reference
stages/text/download/wikipedia/iterator.py:28-148, extract.py — SURVEY
marked these out of north-rule scope; implemented for capability parity
since the iterator is pure stdlib there too).

Iterator contract mirrored exactly: stream ``<page>`` elements out of a
bz2 multistream dump with ElementTree iterparse, keep main-namespace
(ns=0), non-redirect, non-empty articles, and yield
``{title, id, url, language, source_id, raw_content}`` with the
``https://{lang}.wikipedia.org/wiki/{quoted title}`` url.

The wikitext cleaner is our own implementation of the published wikitext
grammar's text-bearing subset (the reference's 700-line extract.py is a
regex pipeline over the same constructs): nested ``{{templates}}`` and
``{| tables |}``, ``<ref>``/``<!-- -->``/html tags, media/category links,
``[[target|text]]`` resolution, external links, bold/italic quotes,
heading markers. Language-specific media/category alias tables beyond
English are a documented deviation (parameterizable)."""

from __future__ import annotations

import bz2
import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from urllib.parse import quote

OUTPUT_COLUMNS = ["title", "id", "url", "language", "source_id", "raw_content"]


def iterate_dump(
    file_path: str, language: str = "en", source_id: str | None = None
) -> Iterator[dict]:
    """Yield main-namespace articles from a (bz2 or plain) XML dump."""
    import os

    source_id = source_id or os.path.basename(str(file_path))
    opener = bz2.BZ2File if str(file_path).endswith(".bz2") else open
    with opener(file_path, "rb") as f:
        yield from _iterate_stream(f, language, source_id)


# --- wikitext -> text -----------------------------------------------------------

MEDIA_PREFIXES = ("File", "Image", "Media")
CATEGORY_PREFIXES = ("Category",)

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_REF_RE = re.compile(r"<ref[^>]*?/>|<ref[^>]*?>.*?</ref>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_EXTERNAL_LINK_RE = re.compile(r"\[(?:https?|ftp)://[^\s\]]+\s+([^\]]*)\]")
_BARE_EXTERNAL_RE = re.compile(r"\[(?:https?|ftp)://[^\s\]]+\]")
_HEADING_RE = re.compile(r"^(={2,6})\s*(.*?)\s*\1\s*$", re.M)
_BOLD_ITALIC_RE = re.compile(r"'{2,5}")


def _strip_nested(text: str, open_s: str, close_s: str) -> str:
    """Remove balanced nested constructs like {{...{{...}}...}}."""
    out = []
    depth = 0
    i = 0
    n = len(text)
    while i < n:
        if text.startswith(open_s, i):
            depth += 1
            i += len(open_s)
        elif text.startswith(close_s, i) and depth:
            depth -= 1
            i += len(close_s)
        else:
            if depth == 0:
                out.append(text[i])
            i += 1
    return "".join(out)


def _resolve_wikilinks(
    text: str,
    media_prefixes=MEDIA_PREFIXES,
    category_prefixes=CATEGORY_PREFIXES,
) -> str:
    """[[target|label]] -> label; [[target]] -> target; media/category
    links drop entirely (handles one level of nesting in media captions)."""
    drop = tuple(p.lower() + ":" for p in media_prefixes + category_prefixes)

    def repl(m: re.Match) -> str:
        inner = m.group(1)
        if inner.lower().startswith(drop):
            return ""
        parts = inner.split("|")
        return parts[-1] if len(parts) > 1 else parts[0]

    # innermost links first so nested [[File:x|see [[y]]]] resolves
    prev = None
    while prev != text:
        prev = text
        text = re.sub(r"\[\[([^\[\]]*)\]\]", repl, text)
    return text


def wikitext_to_text(raw: str) -> str:
    """Visible article text from wikitext (paragraphs preserved)."""
    text = _COMMENT_RE.sub("", raw)
    text = _REF_RE.sub("", text)
    text = _strip_nested(text, "{{", "}}")
    text = _strip_nested(text, "{|", "|}")
    text = _HEADING_RE.sub(r"\2", text)
    text = _resolve_wikilinks(text)
    text = _EXTERNAL_LINK_RE.sub(r"\1", text)
    text = _BARE_EXTERNAL_RE.sub("", text)
    text = _TAG_RE.sub("", text)
    text = _BOLD_ITALIC_RE.sub("", text)
    # list/indent markers at line starts
    text = re.sub(r"^[\*#:;]+\s*", "", text, flags=re.M)
    # collapse the blank-line inflation removal leaves behind
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


def wikipedia_to_rows(spark, paths: str | list[str], language: str = "en"):
    """Dump file(s) -> DataFrame(title, id, url, language, source_id,
    raw_content, text): binaryFile scan -> mapInPandas fan-out (one python
    pass per dump part), wikitext cleaned in the same pass."""
    import io

    import pandas as pd

    files = spark.read.format("binaryFile").load(paths)
    cols = [*OUTPUT_COLUMNS, "text"]

    def fan(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                name = r["path"].split("/")[-1]
                data = bytes(r["content"])
                if name.endswith(".bz2"):
                    data = bz2.decompress(data)
                for rec in _iterate_bytes(data, language, name):
                    rec["text"] = wikitext_to_text(rec["raw_content"])
                    rows.append(rec)
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
            )

    return files.select("path", "content").mapInPandas(
        fan,
        schema="title string, id string, url string, language string, "
        "source_id string, raw_content string, text string",
    )


def _iterate_bytes(data: bytes, language: str, source_id: str):
    import io

    yield from _iterate_stream(io.BytesIO(data), language, source_id)


def _iterate_stream(stream, language: str, source_id: str):
    for _event, elem in ET.iterparse(stream, events=("end",)):
        if not elem.tag.endswith("page"):
            continue
        ns_prefix = elem.tag[: -len("page")]

        def find_text(parent, tag):
            node = parent.find(f"./{ns_prefix}{tag}")
            return node.text if node is not None else None

        title = find_text(elem, "title")
        ns = find_text(elem, "ns")
        page_id = find_text(elem, "id")
        redirect = elem.find(f"./{ns_prefix}redirect")
        revision = elem.find(f"./{ns_prefix}revision")
        raw = find_text(revision, "text") if revision is not None else None
        elem.clear()
        if not all([title, ns, page_id]):
            continue
        if ns != "0" or redirect is not None or raw is None:
            continue
        yield {
            "title": title,
            "id": page_id,
            "url": f"https://{language}.wikipedia.org/wiki/{quote(title)}",
            "language": language,
            "source_id": source_id,
            "raw_content": raw,
        }

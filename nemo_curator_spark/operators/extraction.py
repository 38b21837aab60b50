"""HTML → text extraction (pandas-UDF stage).

Mirrors the reference's extraction contract (stages/text/download/
common_crawl/extract.py:28-104): decode bytes (declared charset first,
then detection fallback), pull the main-content paragraphs, emit
``"\\n\\n".join(paragraphs)``. The reference uses justext/resiliparse/
trafilatura (none available in this environment); this extractor is a
self-contained boilerplate-stripping parser: it drops nav/header/footer
blocks and returns ``<p>`` content inside ``<main>`` (or all ``<p>`` when no
main landmark exists). For the synthetic corpus the contract is
byte-identical recovery of the source text (north-rule invariant), enforced
by tests.
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_META_CHARSET_RE = re.compile(rb"""<meta\s+charset=["']?([A-Za-z0-9_\-]+)""", re.I)
_MAIN_RE = re.compile(r"<main[^>]*>(.*?)</main>", re.S | re.I)
_P_RE = re.compile(r"<p(?:\s[^>]*)?>(.*?)</p>", re.S | re.I)
_DROP_BLOCK_RE = re.compile(
    r"<(nav|header|footer|script|style)[^>]*>.*?</\1>", re.S | re.I
)
_TAG_RE = re.compile(r"<[^>]+>")
_BR_RE = re.compile(r"<br\s*/?>", re.I)


def decode_html(raw: bytes) -> str | None:
    """Decode HTML bytes: declared <meta charset> first, utf-8 next, then
    charset detection (charset_normalizer), mirroring the reference's
    decode_html fallback (download/utils.py:80-97)."""
    m = _META_CHARSET_RE.search(raw[:2048])
    if m:
        try:
            return raw.decode(m.group(1).decode("ascii"), errors="strict")
        except (UnicodeDecodeError, LookupError):
            pass
    try:
        return raw.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        pass
    try:
        from charset_normalizer import from_bytes

        best = from_bytes(raw).best()
        if best is not None:
            return str(best)
    except ImportError:
        pass
    return None


def extract_paragraphs(html_text: str) -> list[str]:
    """Main-content paragraphs with boilerplate blocks removed."""
    body = _DROP_BLOCK_RE.sub("", html_text)
    m = _MAIN_RE.search(body)
    if m:
        body = m.group(1)
    paras = []
    for p in _P_RE.findall(body):
        p = _BR_RE.sub("\n", p)
        p = _TAG_RE.sub("", p)
        paras.append(html_mod.unescape(p))
    return paras


def extract_text_bytes(
    raw: bytes | None, algorithm: str = "simple", language: str = "ENGLISH"
) -> str | None:
    """decode -> paragraphs -> ``"\\n\\n".join`` (reference extract.py:88-104).

    algorithm='simple': the synth-corpus byte-identical extractor (default).
    algorithm='justext': the stdlib jusText reimplementation
    (operators/justext_like.py) — the reference pipeline's default
    algorithm, golden-pinned by tests/test_extraction_goldens.py.
    """
    if raw is None:
        return None
    decoded = decode_html(bytes(raw))
    if decoded is None:
        return None
    if algorithm == "justext":
        from nemo_curator_spark.operators import justext_like as J

        stop = J.ENGLISH_STOPWORDS if language == "ENGLISH" else frozenset()
        paras = J.extract_text(decoded, stop, language)
    else:
        paras = extract_paragraphs(decoded)
    if not paras:
        return None
    return "\n\n".join(paras)


from pyspark.sql import types as T


def make_extract_udf(algorithm: str = "simple", language: str = "ENGLISH"):
    @F.pandas_udf(T.StringType())
    def _udf(html_bytes: pd.Series) -> pd.Series:
        return html_bytes.map(
            lambda b: extract_text_bytes(b, algorithm, language)
        )

    return _udf


@F.pandas_udf(T.StringType())
def extract_text_udf(html_bytes: pd.Series) -> pd.Series:
    return html_bytes.map(extract_text_bytes)


def extract_text(html_col: Column, algorithm: str = "simple") -> Column:
    if algorithm == "simple":
        return extract_text_udf(html_col)
    return make_extract_udf(algorithm)(html_col)

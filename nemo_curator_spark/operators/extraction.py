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
    algorithm='resiliparse' / 'trafilatura': stdlib stand-ins for the
    reference's other two extractors (operators/html_extract_like.py),
    golden-pinned against the reference fixtures with a per-fixture
    deviation table in the same test file.
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
    elif algorithm == "resiliparse":
        from nemo_curator_spark.operators import html_extract_like as HX

        paras = HX.resiliparse_extract_text(
            decoded, HX.density_stopwords(language), language
        )
    elif algorithm == "trafilatura":
        from nemo_curator_spark.operators import html_extract_like as HX

        paras = HX.trafilatura_extract_text(
            decoded, HX.density_stopwords(language), language
        )
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


# --- CommonCrawl composite (WARC rows -> curated text rows) --------------------

# cld2-style UPPERCASE language names (the reference's lang_detect returns
# these, download/utils.py:62-77)
_SCRIPT_RANGES = [
    ("JAPANESE", chr(0x3040), chr(0x30FF), 0.05),  # hiragana+katakana
    ("THAI", chr(0x0E00), chr(0x0E7F), 0.5),
    ("KOREAN", chr(0xAC00), chr(0xD7AF), 0.5),     # hangul syllables
    ("RUSSIAN", chr(0x0400), chr(0x04FF), 0.5),    # cyrillic
    ("ARABIC", chr(0x0600), chr(0x06FF), 0.5),
    ("CHINESE", chr(0x4E00), chr(0x9FFF), 0.5),    # CJK unified
]
_LATIN_STOPWORDS = {
    "ENGLISH": {"the", "and", "is", "of", "to", "in", "that", "with"},
    "GERMAN": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit"},
    "FRENCH": {"le", "la", "les", "et", "est", "une", "dans", "que"},
    "SPANISH": {"el", "la", "los", "es", "una", "que", "con", "para"},
}


def lang_detect(html_text: str) -> str:
    """cld2-contract language name (UPPERCASE). Uses pycld2 when importable
    (the reference path, utils.py:62-77); else a deterministic script-class
    + stopword stand-in covering this repo's language set."""
    try:
        import pycld2

        return pycld2.detect(html_text, returnVectors=False)[2][0][0].upper()
    except ImportError:
        pass
    chars = [c for c in html_text if not c.isspace()]
    if not chars:
        return "UNKNOWN"
    n = len(chars)
    for name, lo, hi, cutoff in _SCRIPT_RANGES:
        frac = sum(1 for c in chars if lo <= c <= hi) / n
        if frac > cutoff:
            return name
    words = {w.lower() for w in html_text.split()}
    best, best_hits = "ENGLISH", -1
    for name, stops in _LATIN_STOPWORDS.items():
        hits = len(words & stops)
        if hits > best_hits:
            best, best_hits = name, hits
    return best


def common_crawl_extract(df, algorithm: str = "justext"):
    """The CommonCrawlHTMLExtractor composite (reference extract.py:28-104):
    (url, warc_id, source_id, content) -> (url, warc_id, source_id,
    language, text) with rows dropped when decode/extraction yields
    nothing — decode_html -> lang_detect -> per-language stop list ->
    extractor paragraphs -> ``"\\n\\n".join``. ``algorithm`` selects
    justext (default, the reference's default) / resiliparse / trafilatura,
    matching the reference's html_extractor config surface. mapInPandas
    because the extractor FILTERS rows (a Column expression cannot)."""
    from nemo_curator_spark.operators import html_extract_like as HX
    from nemo_curator_spark.operators import justext_like as J

    def fan(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = r["content"]
                if raw is None or len(raw) == 0:
                    continue
                html = decode_html(bytes(raw))
                if html is None:
                    continue
                lang = lang_detect(html)
                if algorithm == "resiliparse":
                    paras = HX.resiliparse_extract_text(
                        html, HX.density_stopwords(lang), lang
                    )
                elif algorithm == "trafilatura":
                    paras = HX.trafilatura_extract_text(
                        html, HX.density_stopwords(lang), lang
                    )
                else:
                    stops = (
                        J.ENGLISH_STOPWORDS
                        if lang == "ENGLISH"
                        else frozenset()
                    )
                    paras = J.extract_text(html, stops, lang)
                if not paras:
                    continue
                rows.append(
                    {
                        "url": r["url"],
                        "warc_id": r["warc_id"],
                        "source_id": r["source_id"],
                        "language": lang,
                        "text": "\n\n".join(paras),
                    }
                )
            cols = ["url", "warc_id", "source_id", "language", "text"]
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
            )

    return df.mapInPandas(
        fan,
        schema="url string, warc_id string, source_id string, "
        "language string, text string",
    )

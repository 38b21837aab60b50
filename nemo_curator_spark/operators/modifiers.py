"""Text modifiers (DocumentModifier analogues) as native Column transforms.

Reference semantics: /root/reference nemo_curator/stages/text/modifiers/*
(url_remover.py:22-31, newline_normalizer.py:23-34, line_remover.py:18-34,
quotation_remover.py:18-36, markdown_remover.py:25-43, slicer.py:18-76,
string/c4.py:23-87). Everything regex-shaped is a JVM-side
``regexp_replace`` chain; only the C4 boilerplate modifier (paragraph-index
contiguity logic) uses an Arrow-vectorized pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from nemo_curator_spark import constants as C

# (?i) case-insensitive; valid in Java regex and RE2.
URL_REMOVE_PATTERN = r"(?i)https?://\S+|www\.\S+"


def remove_urls(text: Column) -> Column:
    return F.regexp_replace(text, URL_REMOVE_PATTERN, "")


def normalize_newlines(text: Column) -> Column:
    """3+ consecutive newlines -> exactly 2 (both \\n and \\r\\n forms)."""
    out = F.regexp_replace(text, r"(\n){3,}", "\n\n")
    return F.regexp_replace(out, r"(\r\n){3,}", "\r\n\r\n")


def remove_lines(text: Column, patterns: list[str]) -> Column:
    """Drop lines exactly equal to any pattern (exact match, not regex)."""
    pats = F.array(*[F.lit(p) for p in patterns])
    return F.array_join(
        F.filter(F.split(text, "\n"), lambda x: ~F.array_contains(pats, x)),
        "\n",
    )


def remove_wrapping_quotes(text: Column) -> Column:
    """Strip wrapping double quotes under the reference's newline rules."""
    stripped = F.regexp_replace(text, r"^\s+|\s+$", "")
    first_line = F.element_at(F.split(text, "\n"), 1)
    eligible = (
        (F.length(stripped) > 2)
        & (F.substring(text, 1, 1) == '"')
        & (F.substring(text, -1, 1) == '"')
        & (
            ~stripped.contains("\n")
            | (F.substring(first_line, -1, 1) != '"')
        )
    )
    inner = F.substring(text, F.lit(2), F.length(text) - 2)
    return F.when(eligible, inner).otherwise(text)


def remove_markdown(text: Column) -> Column:
    """Strip **bold**, *italic*, _underline_, [text](url) per line.

    The reference applies the regexes line-by-line; `.` does not match
    newlines in either dialect, so applying them to the whole document is
    equivalent.
    """
    out = F.regexp_replace(text, r"\*\*(.*?)\*\*", r"$1")
    out = F.regexp_replace(out, r"\*(.*?)\*", r"$1")
    out = F.regexp_replace(out, r"_(.*?)_", r"$1")
    return F.regexp_replace(out, r"\[.*?\]\((.*?)\)", r"$1")


def slicer(
    text: Column,
    left: int | str | None = 0,
    right: int | str | None = None,
    include_left: bool = True,
    include_right: bool = True,
    strip: bool = True,
) -> Column:
    """Substring by index or by first/last occurrence of marker strings."""
    n = F.length(text)
    if isinstance(left, int):
        left_idx = F.lit(left)
        left_missing = F.lit(False)
    elif isinstance(left, str):
        pos = F.locate(left, text) - 1  # locate is 1-based, 0 if absent
        left_missing = pos < 0
        left_idx = F.when(
            F.lit(include_left), pos
        ).otherwise(pos + len(left))
    else:
        left_idx = F.lit(0)
        left_missing = F.lit(False)

    if isinstance(right, int):
        right_idx = F.lit(right)
        right_missing = F.lit(False)
    elif isinstance(right, str):
        rev_pos = F.locate(right[::-1], F.reverse(text))
        pos = F.when(rev_pos == 0, F.lit(-1)).otherwise(
            n - rev_pos - len(right) + 1
        )
        right_missing = pos < 0
        right_idx = F.when(
            F.lit(include_right), pos + len(right)
        ).otherwise(pos)
    else:
        right_idx = n
        right_missing = F.lit(False)

    # python slice semantics: clamp; negative ints behave pythonically only
    # for non-negative configs (the reference uses non-negative indices)
    sliced = F.substring(
        text, left_idx + 1, F.greatest(right_idx - left_idx, F.lit(0))
    )
    if strip:
        sliced = F.regexp_replace(sliced, r"^\s+|\s+$", "")
    return F.when(left_missing | right_missing, F.lit("")).otherwise(sliced)


def fasttext_label(text: Column, label: str) -> Column:
    """Prepend __label__X and flatten newlines (training-data prep)."""
    return F.concat(F.lit(label + " "), F.regexp_replace(text, r"\n", " "))


# --- C4 boilerplate modifier (pandas UDF; paragraph contiguity logic) ---------


def _remove_boilerplate_one(text: str, remove_if_at_top_or_bottom: bool) -> str:
    paras = text.split("\n\n")
    hits: list[int] = []
    for idx, p in enumerate(paras):
        low = p.strip().lower()
        if "lorem ipsum" in low:
            return ""
        if any(s in low for s in C.POLICY_SUBSTRINGS):
            if not remove_if_at_top_or_bottom:
                return ""
            hits.append(idx)
    if not hits:
        return text
    # contiguous and exclusively at top/bottom -> drop those paragraphs
    contiguous = all(hits[i] + 1 == hits[i + 1] for i in range(len(hits) - 1))
    top_or_bottom = (
        len(hits) != len(paras)
        and contiguous
        and (hits[0] == 0 or hits[-1] == len(paras) - 1)
    )
    if top_or_bottom:
        keep = [p for i, p in enumerate(paras) if i not in set(hits)]
        return "\n\n".join(keep)
    return text


def remove_boilerplate(
    text: Column, remove_if_at_top_or_bottom: bool = True
) -> Column:
    @F.pandas_udf("string")
    def udf(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: _remove_boilerplate_one(t or "", remove_if_at_top_or_bottom)
        )

    return udf(text)


def unicode_reformat(text: Column, **config) -> Column:
    """ftfy-style unicode fixing with the reference UnicodeReformatter's 16
    tunables (modifiers/unicode/unicode_reformatter.py:23-152): mojibake
    repair (incl. double-encoding, byte-a0 restore, lossy sequences,
    inconsistent utf-8, C1 controls), html unescape, terminal escapes,
    ligatures, character width, curly quotes, line breaks, surrogates,
    control chars, normalization. Uses the real ftfy when importable, else
    :mod:`nemo_curator_spark.functions.ftfy_mini` (documented subset —
    simpler badness heuristic)."""
    try:
        import ftfy

        fixer = ftfy.fix_text
        cfg_kwargs = dict(config)

        def fix(t: str) -> str:
            return fixer(t, **cfg_kwargs)

    except ImportError:
        from nemo_curator_spark.functions import ftfy_mini

        cfg = ftfy_mini.TextFixerConfig(**config)

        def fix(t: str) -> str:
            return ftfy_mini.fix_text(t, config=cfg)

    @F.pandas_udf("string")
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: fix(t or ""))

    return udf(text)

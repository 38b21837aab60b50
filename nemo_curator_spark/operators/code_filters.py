"""Code-quality filters (reference stages/text/filters/heuristic/code/code.py).

The SQL-expressible members of the family (NumberOfLinesOfCode, XMLHeader,
Alpha) live in ``functions/heuristics.py`` EXTRA_RULES; this module adds the
comment-to-code ratios:

* :func:`python_comment_ratio_udf` — PythonCommentToCodeFilter
  (code.py:27-48). The reference's extraction is pure stdlib (ast docstrings
  + tokenize COMMENT tokens, text_utils.py:114-197), so the semantics here
  are reference-exact, via one Arrow pandas UDF (per-doc ast parsing cannot
  be a Column expression). Pure-python pin: ``pyref.python_comment_ratio``.
* :func:`general_comment_ratio` — GeneralCommentToCodeFilter (code.py:50-84)
  for C-family mimes. The reference delegates to the comment_parser library
  (absent from this environment); the documented stand-in extracts
  ``//`` / ``/* */`` comments with one leftmost-first alternation, strips
  markers, joins with ' '. Fully JVM-side Column expression + DuckDB oracle
  form (same regex, RE2/Java-compatible: no lookaround, no backrefs).

Keep window for both: 0.01 <= score <= 0.85 (reference defaults).
"""

from __future__ import annotations

import csv
import os
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nemo_curator_spark import pyref

MIN_RATIO = 0.01
MAX_RATIO = 0.85

_COMMENT_PATTERN = r"/\*[\s\S]*?\*/|//[^\n]*"


def python_comment_ratio_udf():
    @F.pandas_udf(T.DoubleType())
    def _udf(source: pd.Series) -> pd.Series:
        return source.map(lambda s: pyref.python_comment_ratio(s or ""))

    return _udf


def python_comment_counts_udf():
    """(n_comment, n_source) per doc from the SAME stdlib ast/tokenize
    path as :func:`pyref.python_comment_ratio` — the write-then-read
    artifact half that lets the driver gate value-hash this filter:
    score = n_comment/n_source (0 when n_source=0) replayed in SQL is
    exactly the pyref ratio, including the exception->0 path
    (n_comment=0)."""

    @F.pandas_udf("n_comment long, n_source long")
    def _udf(source: pd.Series) -> pd.DataFrame:
        rows = []
        for s in source:
            s = s or ""
            if not s:
                rows.append((0, 0))
                continue
            try:
                d = pyref._python_docstrings(s)
                c = pyref._python_comments(s)
                rows.append((len(c) + len(d), len(s)))
            except Exception:
                rows.append((0, len(s)))
        return pd.DataFrame(rows, columns=["n_comment", "n_source"])

    return _udf


def general_comment_ratio(source: Column) -> Column:
    matches = F.regexp_extract_all(source, F.lit(_COMMENT_PATTERN), 0)
    stripped = F.transform(
        matches,
        lambda m: F.when(
            m.startswith("//"), m.substr(F.lit(3), F.length(m))
        ).otherwise(m.substr(F.lit(3), F.greatest(F.length(m) - 4, F.lit(0)))),
    )
    nchar = F.length(source)
    return F.when(nchar == 0, F.lit(0.0)).otherwise(
        F.length(F.array_join(stripped, " ")).cast("double") / nchar
    )


def duck_general_comment_ratio_sql(col: str) -> str:
    pat = _COMMENT_PATTERN.replace("'", "''")
    joined = (
        f"array_to_string(list_transform(regexp_extract_all({col}, '{pat}'), "
        f"m -> CASE WHEN m LIKE '//%' THEN substr(m, 3) "
        f"ELSE substr(m, 3, greatest(len(m) - 4, 0)) END), ' ')"
    )
    # coalesce: DuckDB's array_to_string over an empty match list yields
    # NULL, where python's ' '.join([]) yields ''
    return (
        f"(CASE WHEN len({col}) = 0 THEN 0.0 "
        f"ELSE coalesce(len({joined}), 0) / len({col}) END)"
    )


def keep(score: Column) -> Column:
    return (score >= MIN_RATIO) & (score <= MAX_RATIO)


def duck_keep_sql(expr: str) -> str:
    return f"({expr} >= {MIN_RATIO} AND {expr} <= {MAX_RATIO})"


# --- HTMLBoilerplateFilter (reference code.py:165-196) -------------------------


class _TextCollector(HTMLParser):
    """BeautifulSoup.get_text() analogue on the stdlib parser: concatenate
    every text node verbatim, with script/style subtrees ripped out."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip:
            self.parts.append(data)


def html_get_text(source: str) -> str | None:
    parser = _TextCollector()
    try:
        parser.feed(source)
        parser.close()
    except Exception:
        return None
    return "".join(parser.parts)


def html_boilerplate_score(
    source: str,
    min_lang_content_num_chars: int = 100,
) -> float | None:
    """Reference HTMLBoilerplateFilter.score_document (code.py:176-193):
    visible-text/source length ratio; 0 when the text is shorter than
    min_lang_content_num_chars; None on parse failure (drop)."""
    text = html_get_text(source)
    if text is None or not source:
        return None
    if len(text) < min_lang_content_num_chars:
        return 0.0
    return len(text) / len(source)


def html_boilerplate_udf(min_chars: int = 100):
    @F.pandas_udf(T.DoubleType())
    def _udf(source: pd.Series) -> pd.Series:
        return source.map(lambda s: html_boilerplate_score(s or "", min_chars))

    return _udf


# --- PerExtensionFilter (reference code.py:200-297) ----------------------------

PER_EXT_META = os.path.join(
    os.path.dirname(__file__), "..", "artifacts", "code_meta.csv"
)


def load_per_extension_meta(
    path: str | None = None, language: str | None = None
) -> dict:
    """(language, extension) -> (include, line_max, line_mean, alphanum_frac,
    alphabetic_frac), the reference's csv row-parsing contract
    (code.py:210-244: line_mean is fixed at 100 whenever line_max parses)."""
    ext_to_filter = {}
    with open(path or PER_EXT_META) as f:
        for row in csv.DictReader(f):
            if language is not None and row["language"] != language:
                continue
            include = row["Include"] == "1"
            try:
                line_max = int(row["Long_line_threshold"])
            except ValueError:
                line_max = None
            line_mean = 100 if line_max else None
            try:
                alphanum_frac = float(row["Alphanum_threshold"])
            except ValueError:
                alphanum_frac = None
            try:
                alphabetic_frac = float(row["Alpha filter"])
            except ValueError:
                alphabetic_frac = None
            ext_to_filter[(row["language"], row["extension"])] = (
                include, line_max, line_mean, alphanum_frac, alphabetic_frac,
            )
    if not ext_to_filter:
        raise ValueError(f"no filter params for language {language!r}")
    return ext_to_filter


def per_extension_score_py(source: str, params: tuple) -> float:
    """Reference score_document (code.py:263-295): 0 unless every enabled
    threshold passes (line max/mean, alphanumeric fraction, alphabetic
    fraction)."""
    include, line_max, line_mean, alphanum_frac, alphabetic_frac = params
    if not include or not source:
        return 0.0
    lengths = [len(x) for x in source.split("\n")]
    max_length = max(lengths)
    mean_length = (len(source) + 1) / len(lengths) - 1
    if line_max and max_length > line_max:
        return 0.0
    if line_mean and mean_length > line_mean:
        return 0.0
    if alphanum_frac is not None:
        alnum = sum(1 for c in source if c.isalnum())
        if alnum / len(source) < alphanum_frac:
            return 0.0
    if alphabetic_frac is not None:
        if sum(map(str.isalpha, source)) < alphabetic_frac * len(source):
            return 0.0
    return 1.0


def per_extension_score(source: Column, params: tuple) -> Column:
    """JVM form: \\p{L}\\p{Nd} classes stand in for python isalpha/isalnum
    (equivalent on the letter/digit text this corpus contains)."""
    include, line_max, line_mean, alphanum_frac, alphabetic_frac = params
    if not include:
        return F.lit(0.0)
    nchar = F.length(source)
    lines = F.split(source, "\n", -1)
    max_len = F.array_max(F.transform(lines, F.length))
    mean_len = (nchar + 1).cast("double") / F.size(lines) - 1
    ok = nchar > 0
    if line_max:
        ok = ok & (max_len <= line_max)
    if line_mean:
        ok = ok & (mean_len <= line_mean)
    if alphanum_frac is not None:
        ok = ok & (
            F.regexp_count(source, F.lit(r"[\p{L}\p{Nd}]")).cast("double")
            / nchar
            >= alphanum_frac
        )
    if alphabetic_frac is not None:
        ok = ok & (
            F.regexp_count(source, F.lit(r"\p{L}")).cast("double")
            >= F.lit(alphabetic_frac) * nchar
        )
    return F.when(ok, F.lit(1.0)).otherwise(F.lit(0.0))


def duck_per_extension_sql(col: str, params: tuple) -> str:
    include, line_max, line_mean, alphanum_frac, alphabetic_frac = params
    if not include:
        return "0.0"
    conds = [f"len({col}) > 0"]
    lines = f"string_split({col}, chr(10))"
    if line_max:
        conds.append(
            f"list_max(list_transform({lines}, x -> len(x))) <= {line_max}"
        )
    if line_mean:
        conds.append(
            f"(len({col}) + 1) / len({lines}) - 1 <= {line_mean}"
        )
    if alphanum_frac is not None:
        conds.append(
            f"len(regexp_extract_all({col}, '[\\p{{L}}\\p{{Nd}}]')) / len({col})"
            f" >= {alphanum_frac}"
        )
    if alphabetic_frac is not None:
        conds.append(
            f"len(regexp_extract_all({col}, '\\p{{L}}')) >= "
            f"{alphabetic_frac} * len({col})"
        )
    return f"(CASE WHEN {' AND '.join(conds)} THEN 1.0 ELSE 0.0 END)"

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

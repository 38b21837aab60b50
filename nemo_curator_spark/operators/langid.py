"""Language identification stages.

Three tiers, mirroring the reference's surface (SURVEY.md §2.4 #24/#26):

* :func:`langid_struct` — a fully JVM-native (and SQL-expressible)
  script-histogram + stopword heuristic returning
  ``struct<lang string, score double>``; the workhorse for the synthetic
  corpus and the DuckDB oracle.
* :func:`histogram_score` — the HistogramFilter analogue
  (filters/histogram/histogram.py:24-121): fraction of characters inside a
  per-language character class; keep if > 0.8.
* :class:`FastTextLangId` — the reference's fastText semantics
  (fasttext_filters.py:58-111: label-prefix strip, min-score cutoff,
  case-insensitive lang / lang_script matching) over a pluggable model;
  uses the real fasttext package when importable, otherwise any object with
  ``predict(list[str], k)`` (tests inject a mock, exactly as the
  reference's own tests do).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import reduce

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from nemo_curator_spark import constants as C

# script ranges as LITERAL char ranges (valid in Java regex and RE2 alike)
_R = lambda a, b: chr(a) + "-" + chr(b)  # noqa: E731
SCRIPT_CLASSES: dict[str, str] = {
    "zh": f"[{_R(0x4E00, 0x9FFF)}]",                      # CJK unified han
    "ja": f"[{_R(0x3040, 0x309F)}{_R(0x30A0, 0x30FF)}]",  # hiragana+katakana
    "th": f"[{_R(0x0E00, 0x0E7F)}]",
    "ko": f"[{_R(0xAC00, 0xD7AF)}]",
    "ru": f"[{_R(0x0400, 0x04FF)}]",
    "ar": f"[{_R(0x0600, 0x06FF)}]",
    "latin": f"[A-Za-z{_R(0xC0, 0xFF)}]",
}

# single source of truth (pyref computes batched stop-hits with the same)
from nemo_curator_spark.pyref import EN_STOPWORDS, PT_STOPWORDS  # noqa: E402


def _frac(text: Column, cls: str, total: Column) -> Column:
    return F.regexp_count(text, F.lit(cls)) / total


def _stop_hits(words: Column, stops: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(s) for s in stops])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, F.lower(w))))


def _stop_hits_text(text: Column, stops: tuple[str, ...]) -> Column:
    """Count of ISPACE-delimited words whose ``lower()`` equals a stopword,
    as ONE codegen'd regex scan over the lowered text. Value-identical to
    :func:`_stop_hits` over the split-words array (pinned by
    tests/test_heuristics_spark.py::test_langid_regex_stop_hits_equals_hof):
    a word is a maximal NONSPACE run, so a match that consumes its
    leading separator (or ^) and requires a trailing separator (or $) is
    exactly a whole-word equality; each match consumes only its own word
    plus the separator BEFORE it, so adjacent stopwords sharing one
    separator all count. Java's alternation backtracks through
    prefix-overlapping stopwords ("a" vs "ao"), and whole-text lower()
    equals per-word lower(): separator chars are case-invariant and
    Java's only context rule (final sigma) sees the same following char
    either way. (A lookbehind-fenced variant was tried first and measured
    7x SLOWER than the HOF — Java backtracks the alternation at every
    char position; anchoring on the consumed separator fails fast
    instead. HOF 1.46 s / lookbehind 8.7 s / this form 0.94 s on the 50k
    bench corpus.)"""
    alt = "|".join(sorted(stops, key=len, reverse=True))
    pat = f"(?:^|{C.ISPACE_CLASS})(?:{alt})(?={C.ISPACE_CLASS}|$)"
    return F.regexp_count(F.lower(text), F.lit(pat))


def langid_struct(text: Column) -> Column:
    """Native script-histogram language ID: struct<lang, score>.

    score = fraction of letters in the winning script class (for latin
    languages, the latin fraction); en vs pt disambiguated by stopword hits.
    """
    letters = F.greatest(F.regexp_count(text, F.lit(r"\p{L}")), F.lit(1))
    fr = {k: _frac(text, v, letters) for k, v in SCRIPT_CLASSES.items()}

    en_hits = _stop_hits_text(text, EN_STOPWORDS)
    pt_hits = _stop_hits_text(text, PT_STOPWORDS)

    latin_lang = F.when(pt_hits > en_hits, F.lit("pt")).otherwise(F.lit("en"))

    lang = (
        F.when(fr["ja"] > 0.05, F.lit("ja"))
        .when(fr["zh"] > 0.5, F.lit("zh"))
        .when(fr["th"] > 0.5, F.lit("th"))
        .when(fr["ko"] > 0.5, F.lit("ko"))
        .when(fr["ru"] > 0.5, F.lit("ru"))
        .when(fr["ar"] > 0.5, F.lit("ar"))
        .when(fr["latin"] > 0.5, latin_lang)
        .otherwise(F.lit("unknown"))
    )
    score = (
        F.when(fr["ja"] > 0.05, fr["ja"] + fr["zh"])  # kanji counts for ja
        .when(fr["zh"] > 0.5, fr["zh"])
        .when(fr["th"] > 0.5, fr["th"])
        .when(fr["ko"] > 0.5, fr["ko"])
        .when(fr["ru"] > 0.5, fr["ru"])
        .when(fr["ar"] > 0.5, fr["ar"])
        .when(fr["latin"] > 0.5, fr["latin"])
        .otherwise(F.lit(0.0))
    )
    return F.struct(
        lang.alias("lang"), F.least(score, F.lit(1.0)).cast("double").alias("score")
    )


def add_langid(
    df,
    text_col: str = "text",
    lang_col: str = "lang_pred",
    score_col: str = "lang_score",
    wl_col: str | None = None,
):
    """Two-projection form of :func:`langid_struct` for pipelines: the
    script fractions / stopword hits materialize as columns once, and the
    lang/score CASEs reference them as cheap attributes (the single-Column
    struct form re-evaluates every fraction per consumer on the
    interpreted path). ``wl_col`` reuses en/pt stop-hit fields from an
    already-computed ``word_line_batch`` struct column."""
    text = F.col(text_col)
    letters = F.greatest(F.regexp_count(text, F.lit(r"\p{L}")), F.lit(1))
    helpers = {
        f"_fr_{k}": _frac(text, v, letters) for k, v in SCRIPT_CLASSES.items()
    }
    if wl_col:
        helpers["_en_hits"] = F.col(wl_col + ".en_stop_hits")
        helpers["_pt_hits"] = F.col(wl_col + ".pt_stop_hits")
    else:
        helpers["_en_hits"] = _stop_hits_text(text, EN_STOPWORDS)
        helpers["_pt_hits"] = _stop_hits_text(text, PT_STOPWORDS)
    df = df.withColumns(helpers)

    fr = {k: F.col(f"_fr_{k}") for k in SCRIPT_CLASSES}
    latin_lang = F.when(
        F.col("_pt_hits") > F.col("_en_hits"), F.lit("pt")
    ).otherwise(F.lit("en"))
    lang = (
        F.when(fr["ja"] > 0.05, F.lit("ja"))
        .when(fr["zh"] > 0.5, F.lit("zh"))
        .when(fr["th"] > 0.5, F.lit("th"))
        .when(fr["ko"] > 0.5, F.lit("ko"))
        .when(fr["ru"] > 0.5, F.lit("ru"))
        .when(fr["ar"] > 0.5, F.lit("ar"))
        .when(fr["latin"] > 0.5, latin_lang)
        .otherwise(F.lit("unknown"))
    )
    score = (
        F.when(fr["ja"] > 0.05, fr["ja"] + fr["zh"])
        .when(fr["zh"] > 0.5, fr["zh"])
        .when(fr["th"] > 0.5, fr["th"])
        .when(fr["ko"] > 0.5, fr["ko"])
        .when(fr["ru"] > 0.5, fr["ru"])
        .when(fr["ar"] > 0.5, fr["ar"])
        .when(fr["latin"] > 0.5, fr["latin"])
        .otherwise(F.lit(0.0))
    )
    df = df.withColumn(lang_col, lang).withColumn(
        score_col, F.least(score, F.lit(1.0)).cast("double")
    )
    return df.drop(*helpers.keys())


# --- DuckDB SQL form -----------------------------------------------------------


def _dq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def duck_langid_sql(col: str) -> tuple[str, str]:
    """(lang_expr, score_expr) in DuckDB SQL, equal to langid_struct."""
    letters = f"greatest(len(regexp_extract_all({col}, '\\p{{L}}')), 1)"
    fr = {
        k: f"(len(regexp_extract_all({col}, {_dq(v)})) / {letters})"
        for k, v in SCRIPT_CLASSES.items()
    }
    stripped = f"regexp_replace({col}, '{C.STRIP_PATTERN}', '', 'g')"
    words = (
        f"(CASE WHEN {stripped} = '' THEN []::VARCHAR[] "
        f"ELSE regexp_split_to_array({stripped}, '{C.SPLIT_PATTERN}') END)"
    )

    def hits(stops: tuple[str, ...]) -> str:
        lst = "[" + ", ".join(_dq(s) for s in stops) + "]"
        return (
            f"len(list_filter({words}, w -> list_contains({lst}, lower(w))))"
        )

    latin_lang = f"(CASE WHEN {hits(PT_STOPWORDS)} > {hits(EN_STOPWORDS)} THEN 'pt' ELSE 'en' END)"
    lang = (
        f"(CASE WHEN {fr['ja']} > 0.05 THEN 'ja' "
        f"WHEN {fr['zh']} > 0.5 THEN 'zh' "
        f"WHEN {fr['th']} > 0.5 THEN 'th' "
        f"WHEN {fr['ko']} > 0.5 THEN 'ko' "
        f"WHEN {fr['ru']} > 0.5 THEN 'ru' "
        f"WHEN {fr['ar']} > 0.5 THEN 'ar' "
        f"WHEN {fr['latin']} > 0.5 THEN {latin_lang} "
        f"ELSE 'unknown' END)"
    )
    score = (
        f"least((CASE WHEN {fr['ja']} > 0.05 THEN {fr['ja']} + {fr['zh']} "
        f"WHEN {fr['zh']} > 0.5 THEN {fr['zh']} "
        f"WHEN {fr['th']} > 0.5 THEN {fr['th']} "
        f"WHEN {fr['ko']} > 0.5 THEN {fr['ko']} "
        f"WHEN {fr['ru']} > 0.5 THEN {fr['ru']} "
        f"WHEN {fr['ar']} > 0.5 THEN {fr['ar']} "
        f"WHEN {fr['latin']} > 0.5 THEN {fr['latin']} "
        f"ELSE 0.0 END), 1.0)"
    )
    return lang, score


def histogram_score(text: Column, lang: str) -> Column:
    """HistogramFilter analogue: frac of non-space chars in the language's
    character class; score 1.0 if frac > 0.8 else 0.0 (keep if 1)."""
    cls = SCRIPT_CLASSES.get(lang, SCRIPT_CLASSES["latin"])
    nonspace = F.greatest(
        F.length(F.regexp_replace(text, r"\s", "")), F.lit(1)
    )
    frac = F.regexp_count(text, F.lit(cls)) / nonspace
    return F.when(frac > 0.8, F.lit(1.0)).otherwise(F.lit(0.0))


HISTOGRAM_DIR = os.path.join(
    os.path.dirname(__file__), "..", "artifacts", "histograms"
)


def load_histogram(lang: str, threshold_char: str = "]") -> set[str]:
    """Read an M2M-100-format histogram artifact: one char per line,
    frequency-descending, stop at the threshold char (reference
    filters/histogram/histogram.py:85-105). Artifacts are checked in under
    nemo_curator_spark/artifacts/histograms (scripts/build_histograms.py)."""
    chars: set[str] = set()
    with open(os.path.join(HISTOGRAM_DIR, lang)) as f:
        for line in f:
            if not line.rstrip("\n"):
                continue
            c = line[0]
            if c == threshold_char:
                break
            chars.add(c)
    return chars


def histogram_score_py(text: str, hist: set[str], threshold: float = 0.8) -> float:
    """Exact reference formula (histogram.py:106-116): count chars of
    text.strip() in the histogram, ratio over len(text) UNstripped; score
    1 if ratio > threshold else 0. Deviation: empty text -> 0.0 (the
    reference raises ZeroDivisionError)."""
    if not text:
        return 0.0
    cnt = sum(1 for c in text.strip() if c in hist)
    return 1.0 if cnt / len(text) > threshold else 0.0


def histogram_artifact_score(
    text: Column, lang: str, threshold: float = 0.8
) -> Column:
    """JVM form of :func:`histogram_score_py`: membership counting via
    ``translate`` (len(stripped) - len(stripped minus histogram chars)) —
    no regex, so arbitrary histogram characters need no escaping."""
    hist = "".join(sorted(load_histogram(lang)))
    stripped = F.regexp_replace(text, C.STRIP_PATTERN, "")
    cnt = F.length(stripped) - F.length(F.translate(stripped, hist, ""))
    nchar = F.length(text)
    return F.when(nchar == 0, F.lit(0.0)).otherwise(
        F.when(cnt.cast("double") / nchar > threshold, F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
    )


def duck_histogram_artifact_sql(col: str, lang: str, threshold: float = 0.8) -> str:
    hist = "".join(sorted(load_histogram(lang))).replace("'", "''")
    stripped = f"regexp_replace({col}, '{C.STRIP_PATTERN}', '', 'g')"
    cnt = f"(len({stripped}) - len(translate({stripped}, '{hist}', '')))"
    return (
        f"(CASE WHEN len({col}) = 0 THEN 0.0 "
        f"WHEN {cnt} / len({col}) > {threshold} THEN 1.0 ELSE 0.0 END)"
    )


# --- fastText-semantics tier ----------------------------------------------------


@dataclass
class FastTextLangId:
    """Reference FastTextLangId semantics over a pluggable model.

    ``model`` must expose ``predict(list[str], k=1) -> (labels, scores)``
    with fastText's ``__label__xx`` label convention. When ``model_path``
    is given and the fasttext package is importable, the real model is
    lazily loaded per executor.
    """

    model_path: str | None = None
    min_langid_score: float = 0.3
    lang: str | None = None
    model: object | None = None

    def _get_model(self):
        if self.model is not None:
            return self.model
        try:
            import fasttext  # gated: not present in this environment

            self.model = fasttext.load_model(self.model_path)
        except ImportError:
            # deterministic pure-python fastText-architecture fallback
            # (same predict API; operators/fasttext_mini.py)
            from nemo_curator_spark.operators.fasttext_mini import MiniFastText

            self.model = MiniFastText.load(self.model_path)
        return self.model

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        model = self._get_model()
        cleaned = [(t or "").strip().replace("\n", " ") for t in texts]
        out_score, out_lang = [], []
        for t in cleaned:
            labels, scores = model.predict([t], k=1)
            out_score.append(float(scores[0][0]))
            out_lang.append(labels[0][0].removeprefix("__label__"))
        return pd.DataFrame({"score": out_score, "lang": out_lang})

    def keep_mask(self, scores: pd.Series, langs: pd.Series) -> pd.Series:
        ok = scores >= self.min_langid_score
        if self.lang:
            want = self.lang.casefold()
            got = langs.str.casefold()
            if "_" in want:
                ok &= got == want
            else:
                ok &= got.str.split("_").str[0] == want
        return ok

    def udf(self):
        schema = T.StructType(
            [
                T.StructField("score", T.DoubleType()),
                T.StructField("lang", T.StringType()),
            ]
        )
        scorer = self

        @F.pandas_udf(schema)
        def _udf(texts: pd.Series) -> pd.DataFrame:
            return scorer.score_batch(texts)

        return _udf

"""Spark-native expressions for the Gopher/C4 heuristic quality rules.

Each rule is declared once as a :class:`Rule` with

* ``score(ctx) -> Column`` — a JVM-side Column expression (built-ins +
  higher-order functions; no Python in the hot path) computing the scorer
  over shared helper columns,
* ``keep(score) -> Column`` — the keep predicate,
* ``duck_score(col) -> str`` / ``duck_keep(expr) -> str`` — the equivalent
  DuckDB SQL, used for the correctness oracle.

Semantics follow the reference heuristic filters
(/root/reference nemo_curator/stages/text/filters/heuristic/string.py:40-501,
repetition/repetition.py:24-203); the pure-Python pin is
:mod:`nemo_curator_spark.pyref`. The only Python-side rules are the
top-n-gram / duplicate-n-gram family (#22/#23 in SURVEY.md §2.4), which need
stateful per-document n-gram accounting and run as ONE Arrow-vectorized
pandas UDF computing all nine scores in a single tokenize pass.

Regex dialect: every pattern used here is valid in Java regex (Spark) and
RE2 (DuckDB) — no lookaround, no backreferences; unicode classes via
``\\p{L}`` / ``\\p{Nd}``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Callable

import numpy as _np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nemo_curator_spark import constants as C
from nemo_curator_spark import pyref

# ---------------------------------------------------------------------------
# Shared helper columns ("ctx"): computed once per document, reused by every
# rule so the plan splits/trims each text a constant number of times.
# ---------------------------------------------------------------------------

STRIP_RE = C.STRIP_PATTERN  # python-isspace class (constants.py)


def text_ctx(text: Column) -> dict[str, Column]:
    stripped = F.regexp_replace(text, STRIP_RE, "")
    words = F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, C.SPLIT_PATTERN)
    )
    lines = F.filter(F.split(text, "\n"), lambda x: x.rlike(C.NONSPACE_CLASS))
    return {
        "text": text,
        "nchar": F.length(text),
        "words": words,
        "lines": lines,
        "paras": F.split(text, "\n\n"),
    }


def _strip(col: Column) -> Column:
    return F.regexp_replace(col, STRIP_RE, "")


def _when_empty(nchar: Column, worst: float, expr: Column) -> Column:
    return F.when(nchar == 0, F.lit(worst)).otherwise(expr).cast("double")


def _ratio_over(arr: Column, pred, empty_val: float) -> Column:
    n = F.size(arr)
    return (
        F.when(n == 0, F.lit(empty_val))
        .otherwise(F.size(F.filter(arr, pred)) / n)
        .cast("double")
    )


# --- DuckDB SQL helper snippets ----------------------------------------------


def d_stripped(c: str) -> str:
    return f"regexp_replace({c}, '{C.STRIP_PATTERN}', '', 'g')"


def d_words(c: str) -> str:
    s = d_stripped(c)
    return (
        f"(CASE WHEN {s} = '' THEN []::VARCHAR[] "
        f"ELSE regexp_split_to_array({s}, '{C.SPLIT_PATTERN}') END)"
    )


def d_lines(c: str) -> str:
    return (
        f"list_filter(string_split({c}, chr(10)), x -> regexp_matches(x, '{C.NONSPACE_CLASS}'))"
    )


def d_paras(c: str) -> str:
    return f"string_split({c}, chr(10) || chr(10))"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# Rule declarations
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Rule:
    name: str
    score: Callable[[dict[str, Column]], Column]
    keep: Callable[[Column], Column]
    duck_score: Callable[[str], str]
    duck_keep: Callable[[str], str]
    # pure-Python pin used by tests
    py_score: Callable[[str], float]
    # optional FULL DuckDB query builder (table -> "SELECT doc_id, <expr>
    # AS score ..."), for rules whose oracle needs CTEs — a scalar
    # expression with repeated heavy subtrees re-evaluates each textual
    # occurrence and goes quadratic (the top-ngram rules)
    duck_query: Callable[[str], str] | None = None


def _between(lo: float, hi: float):
    return (
        lambda s: (s >= lo) & (s <= hi),
        lambda e: f"({e} >= {lo} AND {e} <= {hi})",
    )


def _le(cut: float):
    return (lambda s: s <= cut, lambda e: f"({e} <= {cut})")


def _ge(cut: float):
    return (lambda s: s >= cut, lambda e: f"({e} >= {cut})")


ALPHANUM_SQL_CLASS = "[a-zA-Z0-9" + chr(10) + "?!,.]"


def _alpha_numeric_score(ctx: dict[str, Column]) -> Column:
    return _when_empty(
        ctx["nchar"],
        1.0,
        (ctx["nchar"] - F.regexp_count(ctx["text"], F.lit(C.ALPHANUM_CLASS)))
        / ctx["nchar"],
    )


def _char_class_ratio(pattern: str, empty_val: float = 1.0):
    def score(ctx: dict[str, Column]) -> Column:
        return _when_empty(
            ctx["nchar"],
            empty_val,
            F.regexp_count(ctx["text"], F.lit(pattern)) / ctx["nchar"],
        )

    return score


def _duck_char_class_ratio(sql_class: str, empty_val: float = 1.0):
    def duck(c: str) -> str:
        pat = _sql_quote(sql_class)
        return (
            f"(CASE WHEN len({c}) = 0 THEN {empty_val} "
            f"ELSE len(regexp_extract_all({c}, {pat})) / len({c}) END)"
        )

    return duck


def _symbol_words_score(ctx: dict[str, Column]) -> Column:
    marks = F.array(*[F.lit(m) for m in C.ELLIPSIS_MARKS])
    return _ratio_over(
        ctx["words"],
        lambda w: F.array_contains(marks, w)
        | (F.regexp_count(w, F.lit(C.HASH_RUN)) / F.length(w) > 0.5),
        1.0,
    )


def _symbol_words_duck(c: str) -> str:
    marks = "[" + ", ".join(_sql_quote(m) for m in C.ELLIPSIS_MARKS) + "]"
    w = d_words(c)
    return (
        f"(CASE WHEN len({w}) = 0 THEN 1.0 ELSE "
        f"len(list_filter({w}, w -> list_contains({marks}, w) "
        f"OR len(regexp_extract_all(w, '#+')) / len(w) > 0.5)) / len({w}) END)"
    )


def _urls_score(ctx: dict[str, Column]) -> Column:
    # sum of match lengths == length delta after removing all matches
    # (non-overlapping matches both ways) — codegen-friendly, no HOF
    url_chars = ctx["nchar"] - F.length(
        F.regexp_replace(ctx["text"], C.URL_PATTERN, "")
    )
    return _when_empty(ctx["nchar"], 1.0, url_chars / ctx["nchar"])


def _urls_duck(c: str) -> str:
    pat = _sql_quote(C.URL_PATTERN)
    return (
        f"(CASE WHEN len({c}) = 0 THEN 1.0 ELSE "
        f"(len({c}) - len(regexp_replace({c}, {pat}, '', 'g'))) / len({c}) END)"
    )


def _bullets_score(ctx: dict[str, Column]) -> Column:
    bullets = F.array(*[F.lit(b) for b in C.BULLET_CHARS])
    return _ratio_over(
        ctx["lines"],
        lambda s: F.array_contains(bullets, F.substring(_strip(s), 1, 1)),
        1.0,
    )


def _bullets_duck(c: str) -> str:
    bullets = "[" + ", ".join(_sql_quote(b) for b in C.BULLET_CHARS) + "]"
    ls = d_lines(c)
    return (
        f"(CASE WHEN len({ls}) = 0 THEN 1.0 ELSE "
        f"len(list_filter({ls}, s -> list_contains({bullets}, "
        f"left({d_stripped('s')}, 1)))) / len({ls}) END)"
    )


def _boilerplate_score(ctx: dict[str, Column]) -> Column:
    paras_low = F.transform(ctx["paras"], lambda p: F.lower(p))
    hit = lambda p: reduce(  # noqa: E731
        lambda a, b: a | b, [p.contains(s) for s in C.POLICY_SUBSTRINGS]
    )
    frac = F.size(F.filter(paras_low, hit)) / F.size(ctx["paras"])
    return (
        F.when(F.lower(ctx["text"]).contains("lorem ipsum"), F.lit(1.0))
        .otherwise(frac)
        .cast("double")
    )


def _boilerplate_duck(c: str) -> str:
    ps = d_paras(c)
    ors = " OR ".join(
        f"contains(p, {_sql_quote(s)})" for s in C.POLICY_SUBSTRINGS
    )
    return (
        f"(CASE WHEN contains(lower({c}), 'lorem ipsum') THEN 1.0 ELSE "
        f"len(list_filter(list_transform({ps}, p -> lower(p)), p -> {ors})) "
        f"/ len({ps}) END)"
    )


def _word_count_score(ctx: dict[str, Column]) -> Column:
    return F.size(ctx["words"]).cast("double")


def _max_word_len_score(ctx: dict[str, Column]) -> Column:
    return F.coalesce(
        F.array_max(F.transform(ctx["words"], lambda w: F.length(w))),
        F.lit(0),
    ).cast("double")


def _mean_word_len_score(ctx: dict[str, Column]) -> Column:
    n = F.size(ctx["words"])
    total = F.aggregate(ctx["words"], F.lit(0), lambda a, w: a + F.length(w))
    return F.when(n == 0, F.lit(0.0)).otherwise(total / n).cast("double")


def _common_words_score(ctx: dict[str, Column]) -> Column:
    common = F.array(*[F.lit(w) for w in C.COMMON_ENGLISH_WORDS])
    # stop_at_false=True caps the reported count at the cutoff (2)
    return F.least(
        F.size(F.filter(ctx["words"], lambda w: F.array_contains(common, w))),
        F.lit(2),
    ).cast("double")


def _common_words_duck(c: str) -> str:
    w = d_words(c)
    marks = "[" + ", ".join(_sql_quote(x) for x in C.COMMON_ENGLISH_WORDS) + "]"
    return (
        f"least(len(list_filter({w}, w -> list_contains({marks}, w))), 2)"
    )


def _words_alpha_score(ctx: dict[str, Column]) -> Column:
    return _ratio_over(ctx["words"], lambda w: w.rlike(C.ALPHA_J), 0.0)


def _words_alpha_duck(c: str) -> str:
    w = d_words(c)
    return (
        f"(CASE WHEN len({w}) = 0 THEN 0.0 ELSE "
        f"len(list_filter({w}, w -> regexp_matches(w, '\\p{{L}}'))) / len({w}) END)"
    )


def _punct_score(ctx: dict[str, Column]) -> Column:
    end = F.array(*[F.lit(m) for m in C.END_MARKS])
    return _ratio_over(
        ctx["lines"],
        lambda s: ~F.array_contains(end, F.substring(_strip(s), -1, 1)),
        1.0,
    )


def _punct_duck(c: str) -> str:
    ls = d_lines(c)
    marks = "[" + ", ".join(_sql_quote(m) for m in C.END_MARKS) + "]"
    return (
        f"(CASE WHEN len({ls}) = 0 THEN 1.0 ELSE "
        f"len(list_filter({ls}, s -> NOT list_contains({marks}, "
        f"right({d_stripped('s')}, 1)))) / len({ls}) END)"
    )


def _ellipsis_score(ctx: dict[str, Column]) -> Column:
    def is_ell(s: Column) -> Column:
        low = F.lower(_strip(s))
        return reduce(
            lambda a, b: a | b, [low.endswith(m) for m in C.ELLIPSIS_MARKS]
        )

    return _ratio_over(ctx["lines"], is_ell, 1.0)


def _ellipsis_duck(c: str) -> str:
    ls = d_lines(c)
    ors = " OR ".join(
        f"ends_with(lower({d_stripped('s')}), {_sql_quote(m)})"
        for m in C.ELLIPSIS_MARKS
    )
    return (
        f"(CASE WHEN len({ls}) = 0 THEN 1.0 ELSE "
        f"len(list_filter({ls}, s -> {ors})) / len({ls}) END)"
    )


def _repeated_frac(arr_key: str, empty_val: float):
    def score(ctx: dict[str, Column]) -> Column:
        arr = ctx[arr_key]
        n = F.size(arr)
        return (
            F.when(n == 0, F.lit(empty_val))
            .otherwise(F.size(F.array_distinct(arr)) / n)
            .cast("double")
        )

    return score


def _repeated_frac_duck(arr_sql: Callable[[str], str], empty_val: float):
    def duck(c: str) -> str:
        a = arr_sql(c)
        return (
            f"(CASE WHEN len({a}) = 0 THEN {empty_val} "
            f"ELSE len(list_distinct({a})) / len({a}) END)"
        )

    return duck


def _repeated_char_frac(arr_key: str, empty_val: float):
    def score(ctx: dict[str, Column]) -> Column:
        arr = ctx[arr_key]
        total = F.aggregate(arr, F.lit(0), lambda a, x: a + F.length(x))
        uniq = F.aggregate(
            F.array_distinct(arr), F.lit(0), lambda a, x: a + F.length(x)
        )
        return (
            F.when(total == 0, F.lit(empty_val))
            .otherwise(uniq / total)
            .cast("double")
        )

    return score


def _repeated_char_frac_duck(arr_sql: Callable[[str], str], empty_val: float):
    def duck(c: str) -> str:
        a = arr_sql(c)
        tot = f"coalesce(list_sum(list_transform({a}, x -> len(x))), 0)"
        unq = (
            f"coalesce(list_sum(list_transform(list_distinct({a}), "
            f"x -> len(x))), 0)"
        )
        return f"(CASE WHEN {tot} = 0 THEN {empty_val} ELSE {unq} / {tot} END)"

    return duck


def _porn_urls_score(ctx: dict[str, Column]) -> Column:
    matches = F.regexp_extract_all(ctx["text"], F.lit(C.URL_PATTERN), F.lit(0))
    return F.exists(matches, lambda x: x.contains("porn")).cast("double")


def _porn_urls_duck(c: str) -> str:
    pat = _sql_quote(C.URL_PATTERN)
    return (
        f"(CASE WHEN len(list_filter(regexp_extract_all({c}, {pat}), "
        f"x -> contains(x, 'porn'))) > 0 THEN 1.0 ELSE 0.0 END)"
    )


# --- n-gram rules: one vectorized pandas UDF computing all nine scores -------

TOP_NGRAM_PARAMS: tuple[tuple[int, float], ...] = ((2, 0.2), (3, 0.18), (4, 0.16))
DUP_NGRAM_PARAMS: tuple[tuple[int, float], ...] = (
    (5, 0.15),
    (6, 0.14),
    (7, 0.13),
    (8, 0.12),
    (9, 0.11),
    (10, 0.10),
)

NGRAM_FIELDS = [f"top_{n}" for n, _ in TOP_NGRAM_PARAMS] + [
    f"dup_{n}" for n, _ in DUP_NGRAM_PARAMS
]
NGRAM_STRUCT = T.StructType(
    [T.StructField(f, T.DoubleType(), False) for f in NGRAM_FIELDS]
)


def _top_ngram_from_tokens(text: str, toks: list[str], n: int) -> float:
    if len(toks) < n:
        return 1.0
    grams = list(zip(*[toks[i:] for i in range(n)]))
    counts: dict[tuple[str, ...], int] = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    best = max(counts.values())
    top = next(g for g in grams if counts[g] == best)
    phrase = " ".join(top)
    nchar = len(text)
    if nchar == 0:
        return 1.0
    return (nchar - len(text.replace(phrase, ""))) / nchar


def _dup_ngram_from_tokens(text: str, toks: list[str], n: int) -> float:
    if len(toks) < n:
        return 1.0
    lens = [len(w) for w in toks]
    seen: dict[tuple[str, ...], int] = {}
    dup_chars = 0
    overlap = 0
    for i in range(len(toks) - n + 1):
        g = tuple(toks[i : i + n])
        c = seen.get(g, 0) + 1
        seen[g] = c
        if c > 1:
            dup_chars += sum(lens[i + overlap : i + n]) + min(
                n - overlap, n - 1
            )
            overlap = n
        overlap = max(overlap - 1, 0)
    nchar = len(text)
    if nchar == 0:
        return 1.0
    return dup_chars / nchar


# --- python fast path for word/line-level rules -------------------------------
#
# The array-lambda (HOF) forms of these rules are evaluated by interpreted
# per-element expression-tree walks on the JVM (HOFs are outside whole-stage
# codegen), which measures ~10x slower than a plain Python loop over the
# same semantics. One Arrow batch per partition computes all 14 scores with
# shared splits (pyref.word_line_scores — identical IEEE arithmetic, so the
# values are bit-equal to the Column forms; tests pin all three paths).

PY_BATCH_RULES = [
    "symbol_to_word",
    "bullet_ratio",
    "boilerplate_string_ratio",
    "word_count",
    "max_word_length",
    "mean_word_length",
    "common_english_words",
    "words_without_alphabets",
    "punctuation",
    "ellipsis",
    "repeated_lines",
    "repeated_paragraphs",
    "repeated_lines_char",
    "repeated_paragraphs_char",
]
# non-rule extras consumed by langid / the lexical quality score so the
# whole pipeline needs exactly one word/line batch pass per document
PY_BATCH_EXTRAS = [
    "en_stop_hits",
    "pt_stop_hits",
    "quality_stop_frac",
    "punct_end_frac",
    "uniq_line_frac",
]
PY_BATCH_FIELDS = PY_BATCH_RULES + PY_BATCH_EXTRAS
PY_BATCH_STRUCT = T.StructType(
    [T.StructField(f, T.DoubleType(), False) for f in PY_BATCH_FIELDS]
)


@F.pandas_udf(PY_BATCH_STRUCT)
def word_line_batch(texts: pd.Series) -> pd.DataFrame:
    rows = [pyref.word_line_scores(t or "") for t in texts]
    return pd.DataFrame(rows, columns=PY_BATCH_FIELDS)


_TOP_NS = tuple(n for n, _ in TOP_NGRAM_PARAMS)
_DUP_NS = tuple(n for n, _ in DUP_NGRAM_PARAMS)


def _ngram_scores_doc(text: str, toks: list[str]) -> dict[str, float]:
    """All nine n-gram scores for one document with shared per-doc state.

    Value-identical to the naive ``_top_ngram_from_tokens`` /
    ``_dup_ngram_from_tokens`` (pinned by
    tests/test_heuristics_pyref.py::test_ngram_scores_doc_matches_naive):

    * tokens are interned to 2-byte ids once, so every gram key is a
      cached-hash ``bytes`` slice instead of a freshly-hashed tuple of
      strings (a tuple's hash is recomputed on every dict op);
    * word-length prefix sums make the dup-overlap char sum O(1) — all
      integer arithmetic, so the final single float division per score is
      unchanged;
    * top-gram tie-break: the first scan position whose count equals the
      max is necessarily that gram's FIRST occurrence, so "min first-pos
      among max-count grams" reproduces the first-seen rule exactly.

    ~1.9x faster than the naive loop on the 50k-doc bench corpus; a
    numpy-vectorized variant measured SLOWER at web-page token counts
    (np.unique sort overhead on ~150-token docs).
    """
    nt = len(toks)
    nchar = len(text)
    out: dict[str, float] = {}
    if nt == 0 or nchar == 0:
        for n in _TOP_NS:
            out[f"top_{n}"] = 1.0
        for n in _DUP_NS:
            out[f"dup_{n}"] = 1.0
        return out
    idmap: dict[str, int] = {}
    sd = idmap.setdefault
    ids = [sd(w, len(idmap)) for w in toks]
    # 2-byte ids cover docs with <=65536 distinct tokens; wider docs fall
    # back to 4-byte ids (same keys, no wraparound collisions)
    itembytes = 2 if len(idmap) <= 0xFFFF else 4
    b = _np.asarray(ids, dtype=f"<u{itembytes}").tobytes()
    # shared char prefix sums: P[i] = sum(len(w) for w in toks[:i])
    P = [0] * (nt + 1)
    acc = 0
    for i, w in enumerate(toks):
        acc += len(w)
        P[i + 1] = acc
    ib = itembytes
    for n in _TOP_NS:
        if nt < n:
            out[f"top_{n}"] = 1.0
            continue
        w2 = ib * n
        counts: dict[bytes, int] = {}
        first: dict[bytes, int] = {}
        get = counts.get
        for i in range(nt - n + 1):
            k = b[ib * i : ib * i + w2]
            c = get(k)
            if c is None:
                counts[k] = 1
                first[k] = i
            else:
                counts[k] = c + 1
        best = max(counts.values())
        fp = min(f for k, f in first.items() if counts[k] == best)
        phrase = " ".join(toks[fp : fp + n])
        out[f"top_{n}"] = (nchar - len(text.replace(phrase, ""))) / nchar
    for n in _DUP_NS:
        if nt < n:
            out[f"dup_{n}"] = 1.0
            continue
        w2 = ib * n
        seen: set[bytes] = set()
        add = seen.add
        has = seen.__contains__
        dup_chars = 0
        overlap = 0
        nm1 = n - 1
        for i in range(nt - n + 1):
            k = b[ib * i : ib * i + w2]
            if has(k):
                no = n - overlap
                dup_chars += (P[i + n] - P[i + overlap]) + (
                    no if no < nm1 else nm1
                )
                overlap = n
            else:
                add(k)
            overlap = overlap - 1 if overlap > 0 else 0
        out[f"dup_{n}"] = dup_chars / nchar
    return out


@F.pandas_udf(NGRAM_STRUCT)
def ngram_scores(texts: pd.Series) -> pd.DataFrame:
    """All top-/dup-n-gram scores in ONE tokenize pass per document
    (semantics pinned to pyref.top_ngram_ratio / dup_ngram_ratio by tests;
    per-doc fast path in :func:`_ngram_scores_doc`)."""
    rows = [_ngram_scores_doc(t or "", (t or "").split()) for t in texts]
    return pd.DataFrame(rows, columns=NGRAM_FIELDS)


# ---------------------------------------------------------------------------
# The rule registry (order = the reference English pipeline YAML order).
# n-gram rules are declared with score=None; the pipeline wires them to the
# shared `ngram_scores` struct column.
# ---------------------------------------------------------------------------


def _mk(name, score, keepers, duck_score, py_score, duck_query=None) -> Rule:
    keep, duck_keep = keepers
    return Rule(name, score, keep, duck_score, duck_keep, py_score, duck_query)


RULES: list[Rule] = [
    _mk(
        "alpha_numeric",
        _alpha_numeric_score,
        _le(0.25),
        lambda c: (
            f"(CASE WHEN len({c}) = 0 THEN 1.0 ELSE "
            f"(len({c}) - len(regexp_extract_all({c}, "
            f"{_sql_quote(ALPHANUM_SQL_CLASS)}))) / len({c}) END)"
        ),
        pyref.non_alpha_numeric,
    ),
    _mk(
        "symbol_to_word",
        _symbol_words_score,
        _le(0.1),
        _symbol_words_duck,
        pyref.symbols_to_words,
    ),
    _mk(
        "numbers_ratio",
        _char_class_ratio(C.DIGIT_J),
        _le(0.15),
        _duck_char_class_ratio(r"\p{Nd}"),
        pyref.numbers_ratio,
    ),
    _mk("urls_ratio", _urls_score, _le(0.2), _urls_duck, pyref.urls_ratio),
    _mk(
        "white_space",
        _char_class_ratio(C.WS_CLASS),
        _le(0.25),
        _duck_char_class_ratio(C.WS_CLASS),
        pyref.white_space_ratio,
    ),
    _mk(
        "parentheses_ratio",
        _char_class_ratio(C.PAREN_CLASS),
        _le(0.1),
        _duck_char_class_ratio(C.PAREN_CLASS),
        pyref.parentheses_ratio,
    ),
    _mk(
        "boilerplate_string_ratio",
        _boilerplate_score,
        _le(0.4),
        _boilerplate_duck,
        pyref.boilerplate_string_ratio,
    ),
    _mk(
        "repeated_lines",
        _repeated_frac("lines", 0.0),
        _ge(0.7),
        _repeated_frac_duck(d_lines, 0.0),
        pyref.repeated_lines,
    ),
    _mk(
        "repeated_paragraphs",
        _repeated_frac("paras", 0.0),
        _ge(0.7),
        _repeated_frac_duck(d_paras, 0.0),
        pyref.repeated_paragraphs,
    ),
    _mk(
        "repeated_lines_char",
        _repeated_char_frac("lines", 0.0),
        _ge(0.8),
        _repeated_char_frac_duck(d_lines, 0.0),
        pyref.repeated_lines_char,
    ),
    _mk(
        "repeated_paragraphs_char",
        _repeated_char_frac("paras", 0.0),
        _ge(0.8),
        _repeated_char_frac_duck(d_paras, 0.0),
        pyref.repeated_paragraphs_char,
    ),
    _mk(
        "word_count",
        _word_count_score,
        _between(50, 100000),
        lambda c: f"len({d_words(c)})",
        pyref.word_count,
    ),
    _mk(
        "punctuation",
        _punct_score,
        _le(0.85),
        _punct_duck,
        pyref.punctuation_ratio,
    ),
    _mk(
        "words_without_alphabets",
        _words_alpha_score,
        _ge(0.8),
        _words_alpha_duck,
        pyref.words_without_alphabets,
    ),
    _mk(
        "common_english_words",
        _common_words_score,
        _ge(2),
        _common_words_duck,
        pyref.common_english_words,
    ),
    _mk(
        "mean_word_length",
        _mean_word_len_score,
        _between(3, 10),
        lambda c: (
            f"(CASE WHEN len({d_words(c)}) = 0 THEN 0.0 ELSE "
            f"coalesce(list_sum(list_transform({d_words(c)}, w -> len(w))), 0) "
            f"/ len({d_words(c)}) END)"
        ),
        pyref.mean_word_length,
    ),
    _mk(
        "max_word_length",
        _max_word_len_score,
        _le(1000),
        lambda c: (
            f"coalesce(list_max(list_transform({d_words(c)}, w -> len(w))), 0)"
        ),
        pyref.max_word_length,
    ),
    _mk(
        "ellipsis",
        _ellipsis_score,
        _le(0.3),
        _ellipsis_duck,
        pyref.ellipsis_ratio,
    ),
]

def _top_ngram_duck_query(n: int):
    """DuckDB oracle for top_ngram_ratio as a full CTE query: words and
    grams materialize ONCE per row (a scalar-expression form re-evaluates
    every textual occurrence and takes ~100s/query; this runs in ~0.1s).
    Tie-break = first gram holding the max count (pyref's first-seen
    rule); coverage via replace() length delta. 0 mismatches vs pyref at
    sf0.01."""

    def duck(table: str) -> str:
        return f"""
WITH w AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(text, '{C.SPLIT_PATTERN}'), x -> x <> '') AS words
  FROM {table}
), g AS (
  SELECT doc_id, text, words,
    list_filter(list_transform(words, (x, i) ->
      CASE WHEN i + {n - 1} <= len(words)
           THEN array_to_string(words[i:i+{n - 1}], ' ') END),
      x -> x IS NOT NULL) AS grams
  FROM w
), c AS (
  SELECT doc_id, text, words, grams,
    list_transform(grams, x -> len(list_filter(grams, y -> y = x))) AS counts
  FROM g
)
SELECT doc_id, CAST(CASE WHEN len(words) < {n} OR len(text) = 0 THEN 1.0
  ELSE (len(text) - len(replace(text,
         grams[list_position(counts, list_max(counts))], ''))) / len(text)
END AS DOUBLE) AS score
FROM c
"""

    return duck


for _n, _cut in TOP_NGRAM_PARAMS:
    RULES.append(
        _mk(
            f"repeating_top_{_n}grams",
            None,  # wired to the shared ngram_scores struct by the pipeline
            _le(_cut),
            None,
            lambda t, n=_n: pyref.top_ngram_ratio(t, n),
            duck_query=_top_ngram_duck_query(_n),
        )
    )
def _dup_ngram_duck_query(n: int):
    """DuckDB oracle for dup_ngram_ratio. The sequential overlap state has
    a closed form: overlap before gram i = max(n - (i - j), 0) where j is
    the most recent duplicate index before i (a duplicate resets overlap to
    n, which then decrements once per gram) — so the whole fold becomes
    per-position list lambdas. 0 mismatches vs pyref at sf0.01, n=5..10."""

    def duck(table: str) -> str:
        ov = (
            f"(CASE WHEN prev_dup[i] IS NULL THEN 0 "
            f"ELSE greatest({n} - (i - prev_dup[i]), 0) END)"
        )
        return f"""
WITH w AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(text, '{C.SPLIT_PATTERN}'), x -> x <> '') AS words
  FROM {table}
), g AS (
  SELECT doc_id, text, words,
    list_filter(list_transform(words, (x, i) ->
      CASE WHEN i + {n - 1} <= len(words)
           THEN array_to_string(words[i:i+{n - 1}], ' ') END),
      x -> x IS NOT NULL) AS grams
  FROM w
), d AS (
  SELECT doc_id, text, words, grams,
    list_transform(grams, (x, i) -> list_position(grams, x) < i) AS dup
  FROM g
), pd AS (
  SELECT doc_id, text, words, grams, dup,
    list_transform(grams, (x, i) ->
      list_max(list_filter(list_transform(grams, (y, j) ->
        CASE WHEN j < i AND dup[j] THEN j END), v -> v IS NOT NULL))) AS prev_dup
  FROM d
), contrib AS (
  SELECT doc_id, text, words,
    list_transform(grams, (x, i) -> CASE WHEN NOT dup[i] THEN 0 ELSE
      coalesce(list_aggregate(
        list_transform(words[i + {ov} : i + {n - 1}], y -> len(y)), 'sum'), 0)
      + least({n} - {ov}, {n - 1})
    END) AS contribs
  FROM pd
)
SELECT doc_id, CAST(CASE WHEN len(words) < {n} OR len(text) = 0 THEN 1.0
  ELSE coalesce(list_aggregate(contribs, 'sum'), 0) / len(text)
END AS DOUBLE) AS score
FROM contrib
"""

    return duck


for _n, _cut in DUP_NGRAM_PARAMS:
    RULES.append(
        _mk(
            f"repeating_dup_{_n}gram",
            None,
            _le(_cut),
            None,
            lambda t, n=_n: pyref.dup_ngram_ratio(t, n),
            duck_query=_dup_ngram_duck_query(_n),
        )
    )

RULES.append(
    _mk("bullet_ratio", _bullets_score, _le(0.9), _bullets_duck, pyref.bullet_ratio)
)

# extra (not part of the English chain cascade but part of the operator
# surface; SURVEY.md §2.4 #16/#17 + the SQL-expressible code filters —
# NumberOfLinesOfCodeFilter / XMLHeaderFilter / AlphaFilter, code.py:86-180;
# the comment-parser/sentencepiece/bs4-backed code filters need libraries
# absent from this environment and are intentionally not stubbed as rules)
EXTRA_RULES: dict[str, Rule] = {
    "porn_urls": _mk(
        "porn_urls",
        _porn_urls_score,
        (lambda s: s != 1.0, lambda e: f"({e} <> 1.0)"),
        _porn_urls_duck,
        pyref.pornographic_urls,
    ),
    "num_lines": _mk(
        "num_lines",
        lambda ctx: (
            F.length(ctx["text"])
            - F.length(F.regexp_replace(ctx["text"], "\n", ""))
            + 1
        ).cast("double"),
        _between(10, 20000),
        lambda c: (
            f"CAST(len({c}) - len(replace({c}, chr(10), '')) + 1 AS DOUBLE)"
        ),
        lambda t: t.count("\n") + 1,
    ),
    "xml_header": _mk(
        "xml_header",
        lambda ctx: F.when(
            F.substring(ctx["text"], 1, 100).contains("<?xml version="),
            F.lit(1.0),
        ).otherwise(F.lit(0.0)),
        (lambda s: s != 1.0, lambda e: f"({e} <> 1.0)"),
        lambda c: (
            f"(CASE WHEN contains(left({c}, 100), '<?xml version=') "
            f"THEN 1.0 ELSE 0.0 END)"
        ),
        lambda t: float("<?xml version=" in t[:100]),
    ),
    "alpha_ratio": _mk(
        "alpha_ratio",
        lambda ctx: _when_empty(
            ctx["nchar"],
            0.0,
            F.regexp_count(ctx["text"], F.lit(C.ALPHA_J)) / ctx["nchar"],
        ),
        _ge(0.25),
        lambda c: (
            f"(CASE WHEN len({c}) = 0 THEN 0.0 ELSE "
            f"len(regexp_extract_all({c}, '\\p{{L}}')) / len({c}) END)"
        ),
        lambda t: (
            len(C.ALPHA_PY.findall(t)) / len(t) if len(t) else 0.0
        ),
    ),
}

RULES_BY_NAME: dict[str, Rule] = {r.name: r for r in RULES} | EXTRA_RULES

NGRAM_COL_FOR_RULE = {
    **{f"repeating_top_{n}grams": f"top_{n}" for n, _ in TOP_NGRAM_PARAMS},
    **{f"repeating_dup_{n}gram": f"dup_{n}" for n, _ in DUP_NGRAM_PARAMS},
}

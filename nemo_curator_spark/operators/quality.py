"""Quality filtering: CCNet-style Pareto-sampled classifier keep rule.

Reference semantics (fasttext_filters.py:23-55): score = P(high-quality)
from a fastText model; keep iff ``pareto(alpha=3) > 1 - score``. The
reference consumes a *global* sequential RNG, so its keep set depends on row
evaluation order — unreproducible on any distributed engine (SURVEY.md
§7.3.2). Here the Pareto draw is deterministic per row via inverse-CDF over
a uniform derived from md5 of a key column:

    u      = int(md5(key)[:8], 16) / 2**32          (uniform [0,1))
    pareto = (1 - u) ** (-1/alpha) - 1              (Lomax / Pareto II)

Both steps are JVM-native AND DuckDB-expressible, so the whole filter is
SQL-oracle-checkable. The distribution is exactly numpy's
``np.random.pareto``; only the stream differs (per-row hash vs global
sequence), which is why the north rule gates on F1≥0.99 rather than
equality.

The quality *score* itself is pluggable: a fastText model when available,
else :func:`lexical_quality_score` — a deterministic, fully-native lexical
proxy (stopword density, punctuation structure, repetition) in [0,1].
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from nemo_curator_spark import constants as C


def pareto_uniform(key: Column) -> Column:
    """Deterministic uniform [0,1) from md5 of the key column."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(2**32))


def pareto_draw(key: Column, alpha: float = 3.0) -> Column:
    u = pareto_uniform(key)
    return F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)


def pareto_keep(score: Column, key: Column, alpha: float = 3.0) -> Column:
    """keep iff pareto-draw(key) > 1 - score (reference keep rule)."""
    return pareto_draw(key, alpha) > (F.lit(1.0) - score)


def lexical_quality_score(text: Column) -> Column:
    """Deterministic lexical quality proxy in [0,1] (native expression).

    Blends: stopword density (CCNet signal), sentence end-punctuation rate,
    and line-uniqueness. Not a model — a reproducible stand-in with the
    same column contract as the fastText scorer.
    """
    stripped = F.regexp_replace(text, C.STRIP_PATTERN, "")
    words = F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, C.SPLIT_PATTERN)
    )
    nwords = F.greatest(F.size(words), F.lit(1))
    stops = F.array(*[F.lit(w) for w in C.COMMON_ENGLISH_WORDS])
    stop_frac = (
        F.size(F.filter(words, lambda w: F.array_contains(stops, F.lower(w))))
        / nwords
    )
    lines = F.filter(F.split(text, "\n"), lambda x: x.rlike(C.NONSPACE_CLASS))
    nlines = F.greatest(F.size(lines), F.lit(1))
    end = F.array(*[F.lit(m) for m in C.END_MARKS])
    punct_frac = (
        F.size(
            F.filter(
                lines,
                lambda s: F.array_contains(
                    end,
                    F.substring(F.regexp_replace(s, r"^\s+|\s+$", ""), -1, 1),
                ),
            )
        )
        / nlines
    )
    uniq_frac = F.size(F.array_distinct(lines)) / nlines
    score = (
        F.least(stop_frac * 4.0, F.lit(1.0)) * 0.4
        + punct_frac * 0.3
        + uniq_frac * 0.3
    )
    return score.cast("double")


def lexical_quality_from_batch(wl: Column) -> Column:
    """Same score as :func:`lexical_quality_score`, computed from the
    ``word_line_batch`` struct fields (one python pass shared with the
    chain/langid instead of three interpreted HOF passes). The arithmetic
    mirrors the Column form exactly (same IEEE ops in the same order);
    tests pin equality."""
    score = (
        F.least(wl["quality_stop_frac"] * 4.0, F.lit(1.0)) * 0.4
        + wl["punct_end_frac"] * 0.3
        + wl["uniq_line_frac"] * 0.3
    )
    return score.cast("double")


# --- DuckDB SQL forms -----------------------------------------------------------


def duck_pareto_keep_sql(score_expr: str, key_col: str, alpha: float = 3.0) -> str:
    u = f"((('0x' || substring(md5(CAST({key_col} AS VARCHAR)), 1, 8))::BIGINT) / {float(2**32)})"
    draw = f"(power(1.0 - {u}, {-1.0 / alpha}) - 1.0)"
    return f"({draw} > (1.0 - {score_expr}))"


def duck_lexical_quality_sql(col: str) -> str:
    stripped = f"regexp_replace({col}, '{C.STRIP_PATTERN}', '', 'g')"
    words = (
        f"(CASE WHEN {stripped} = '' THEN []::VARCHAR[] "
        f"ELSE regexp_split_to_array({stripped}, '{C.SPLIT_PATTERN}') END)"
    )
    stops = "[" + ", ".join(f"'{w}'" for w in C.COMMON_ENGLISH_WORDS) + "]"
    nwords = f"greatest(len({words}), 1)"
    stop_frac = (
        f"(len(list_filter({words}, w -> list_contains({stops}, lower(w)))) "
        f"/ {nwords})"
    )
    lines = f"list_filter(string_split({col}, chr(10)), x -> regexp_matches(x, '{C.NONSPACE_CLASS}'))"
    nlines = f"greatest(len({lines}), 1)"
    end = "[" + ", ".join("'" + m.replace("'", "''") + "'" for m in C.END_MARKS) + "]"
    strip_s = f"regexp_replace(s, '{C.STRIP_PATTERN}', '', 'g')"
    punct_frac = (
        f"(len(list_filter({lines}, s -> list_contains({end}, "
        f"right({strip_s}, 1)))) / {nlines})"
    )
    uniq_frac = f"(len(list_distinct({lines})) / {nlines})"
    return (
        f"(least({stop_frac} * 4.0, 1.0) * 0.4 + {punct_frac} * 0.3 "
        f"+ {uniq_frac} * 0.3)"
    )

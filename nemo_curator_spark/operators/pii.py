"""Regex-based PII / toxicity scrubbing (north-rule addition).

No reference module exists for this (SURVEY.md preamble); the stage is
modeled on the reference's ``UrlRemover``/``NewlineNormalizer`` modifier
shape (modifiers/string/url_remover.py:22-31) and implemented as a chain of
JVM-side ``regexp_replace`` steps, each paired with a ``regexp_count`` so
the lineage table gets per-category scrub counts for free.

Patterns are valid in BOTH Java regex (Spark) and RE2 (DuckDB): no
lookaround, no backreferences. Scrubbing is sequential — each category
counts and replaces on the output of the previous one — so counts are
unambiguous under overlap.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Placeholder toxicity lexicon: real deployments broadcast a curated
# wordlist; fixtures use these tokens (FIXTURES.md F5).
DEFAULT_SLUR_TOKENS = ("badword1", "badword2", "badword3")


@dataclass(frozen=True)
class ScrubRule:
    name: str
    pattern: str
    replacement: str


def default_rules(
    slur_tokens: tuple[str, ...] = DEFAULT_SLUR_TOKENS,
) -> list[ScrubRule]:
    slur_alt = "|".join(slur_tokens)
    return [
        ScrubRule(
            "email",
            r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
            "<EMAIL>",
        ),
        ScrubRule(
            "ipv6",
            r"\b(?:[0-9A-Fa-f]{1,4}:){2,7}[0-9A-Fa-f]{1,4}\b",
            "<IP>",
        ),
        ScrubRule(
            "ipv4",
            r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
            "<IP>",
        ),
        ScrubRule(
            "phone",
            r"(?:\+\d{1,2}[ .\-]?)?\(?\d{3}\)?[ .\-]?\d{3}[ .\-]?\d{4}\b",
            "<PHONE>",
        ),
        ScrubRule(
            "slur",
            rf"(?i)\b(?:{slur_alt})\b",
            "<SLUR>",
        ),
    ]


def scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_scrubbed",
    rules: list[ScrubRule] | None = None,
    with_counts: bool = True,
    count_prefix: str = "scrub_",
) -> DataFrame:
    """Add ``out_col`` (scrubbed text) and per-category count columns."""
    rules = rules if rules is not None else default_rules()
    cur: Column = F.col(text_col)
    new_cols: dict[str, Column] = {}
    for r in rules:
        if with_counts:
            new_cols[count_prefix + r.name] = F.regexp_count(
                cur, F.lit(r.pattern)
            ).cast("long")
        cur = F.regexp_replace(cur, r.pattern, r.replacement)
    new_cols[out_col] = cur
    return df.withColumns(new_cols)


# --- DuckDB oracle SQL ---------------------------------------------------------


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def duck_scrub_sql(
    text_col: str = "text",
    rules: list[ScrubRule] | None = None,
    count_prefix: str = "scrub_",
) -> tuple[list[str], str]:
    """Returns (count select-exprs, scrubbed-text expr) in DuckDB SQL,
    mirroring :func:`scrub`'s sequential semantics."""
    rules = rules if rules is not None else default_rules()
    cur = text_col
    count_exprs: list[str] = []
    for r in rules:
        count_exprs.append(
            f"CAST(len(regexp_extract_all({cur}, {_q(r.pattern)})) AS BIGINT)"
            f" AS {count_prefix}{r.name}"
        )
        cur = f"regexp_replace({cur}, {_q(r.pattern)}, {_q(r.replacement)}, 'g')"
    return count_exprs, cur

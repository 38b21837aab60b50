"""Shared heuristic-filter constants.

These lists/regexes define the *semantics* of the Gopher/C4-style quality
rules (Rae et al. 2021; Raffel et al. 2020) as used by the reference
implementation (see /root/reference nemo_curator/stages/text/utils/constants.py:19-80).
They are data, not code: each value below is required for behavioral parity.

Every regex is written once in Python `re` syntax (used by the pure-Python
oracle in :mod:`nemo_curator_spark.pyref`) and once in a dialect that is valid
in BOTH Java regex (Spark) and RE2 (DuckDB) so the same pattern string can be
used for the Spark plan and the SQL oracle.
"""

from __future__ import annotations

import re

# Sentence-final punctuation (C4).
END_MARKS = (".", "?", "!", '"', "'")

# Strings that count as "an ellipsis word" / ellipsis line ending.
ELLIPSIS_MARKS = (
    "...",
    "[...]",
    "…",  # …
    "(...)",
    "[…]",
    "-»",  # -»
    "read more..",
    "read more",
)

# Paragraph substrings that mark cookie/privacy boilerplate (C4-adapted).
POLICY_SUBSTRINGS = [
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "privacy overview",
    "use of cookies",
    "use cookies",
    "privacy & cookies policy",
    "privacy and cookies policy",
    (
        "this website uses cookies to improve your experience while you "
        "navigate through the website. out of these cookies, the cookies "
        "that are categorized as necessary are stored on your browser as they "
        "are essential for the working of basic functionalities of the website. "
        "we also use third-party cookies that help us analyze and understand how "
        "you use this website. these cookies will be stored in your browser only "
        "with your consent. you also have the option to opt-out of these "
        "cookies. but opting out of some of these cookies may have an effect "
        "on your browsing experience."
    ),
    (
        "necessary cookies are absolutely essential for the website to "
        "function properly. this category only includes cookies that "
        "ensures basic functionalities and security features of the website. "
        "these cookies do not store any personal information."
    ),
    (
        "any cookies that may not be particularly necessary for the website "
        "to function and is used specifically to collect user personal data "
        "via analytics, ads, other embedded contents are termed as non-necessary "
        "cookies. it is mandatory to procure user consent prior to running these "
        "cookies on your website."
    ),
    (
        "this site uses cookies, including for analytics, personalization, and "
        "advertising purposes. for more information or to change your "
        "cookie settings, click here."
    ),
    (
        "if you continue to browse this site without changing your cookie "
        "settings, you agree to this use. acceptread more"
    ),
]

WHITE_SPACE_CHARS = ("\t", "\n", "\r", "\b", " ")

COMMON_ENGLISH_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

BULLET_CHARS = (
    "•",  # •
    "‣",  # ‣
    "⁃",  # ⁃
    "⁌",  # ⁌
    "⁍",  # ⁍
    "∙",  # ∙
    "○",  # ○
    "●",  # ●
    "◘",  # ◘
    "◦",  # ◦
    "⦾",  # ⦾
    "⦿",  # ⦿
)

# ---------------------------------------------------------------------------
# Regex patterns. Each has a _PY (python `re`) form and a _J form valid in
# both Java regex and RE2 (no lookaround, no backrefs, unicode classes via
# \p{...} which both dialects support).
# ---------------------------------------------------------------------------

# Characters that count as "alphanumeric" for the NonAlphaNumeric rule.
ALPHANUM_CLASS = "[a-zA-Z0-9\n?!,.]"  # identical in re / Java / RE2

# Unicode letter / decimal digit (python `regex` lib [[:alpha:]] / [[:digit:]]).
ALPHA_PY = re.compile(r"[^\W\d_]")  # a unicode letter under `re`
ALPHA_J = r"\p{L}"
DIGIT_PY = re.compile(r"\d")  # unicode decimal digits under `re`
DIGIT_J = r"\p{Nd}"

# URL pattern (Gopher-style). `-` escaped so the class is not a range.
URL_PATTERN = (
    r"https?://(?:[A-Za-z0-9$\-_@.&+/:=?#~]|[!*\(\),]|(?:%[0-9A-Fa-f]{2}))+"
)
URL_PY = re.compile(URL_PATTERN)

PAREN_CLASS = r"[{}⟨⟩\[\]()]"  # { } ⟨ ⟩ [ ] ( )
PAREN_PY = re.compile(PAREN_CLASS)

HASH_RUN_PY = re.compile("#+")
HASH_RUN = "#+"

# whitespace char class for the WhiteSpace rule ( \b = \x08 backspace ).
WS_CLASS = "[\t\n\r\x08 ]"

# --- engine-harmonized word splitting (round-4 whitespace fix) --------------
# The reference tokenizes with python str.split(): every char where
# str.isspace() is True separates words. Java regex \s and RE2 \s are
# ASCII-only, so oracles and JVM expressions built on '\s+' silently
# diverged from the python reference on \x85, \xa0, \x1c-\x1f and Unicode
# Zs/Zl/Zp (round 3's embedder_hash_dim red driver row was exactly this
# class). ISPACE_CHARS enumerates the python-isspace set as LITERAL
# characters, so the derived classes are valid — and identical — in Java
# regex (Spark JVM), RE2 (DuckDB), and python `re` alike (no \p{..}/\u/\x{}
# escape-syntax differences to reconcile).
ISPACE_CHARS = "".join(
    chr(c)
    for c in (
        [0x09, 0x0A, 0x0B, 0x0C, 0x0D]  # \\t \\n VT FF \\r
        + [0x1C, 0x1D, 0x1E, 0x1F]  # FS GS RS US (python-only)
        + [0x20, 0x85, 0xA0, 0x1680]  # SP, NEL, NBSP, Ogham
        + list(range(0x2000, 0x200B))  # Zs en/em/thin/... spaces
        + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]  # Zl Zp NNBSP MMSP ideographic
    )
)
ISPACE_CLASS = "[" + ISPACE_CHARS + "]"
NONSPACE_CLASS = "[^" + ISPACE_CHARS + "]"
SPLIT_PATTERN = ISPACE_CLASS + "+"
SPLIT_PATTERN_PY = SPLIT_PATTERN  # same literal string compiles under `re`
STRIP_PATTERN = "^" + ISPACE_CLASS + "+|" + ISPACE_CLASS + "+$"

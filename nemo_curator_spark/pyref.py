"""Pure-Python oracle for the heuristic quality rules.

This module is the single-process ground truth the Spark expressions are
tested against. It re-implements (fresh, from the published Gopher/C4
semantics; behavior pinned by the reference's unit fixtures, see
/root/reference tests/stages/text/modules/test_filters.py) each scorer as a
plain ``str -> float`` function plus a keep predicate.

Conventions shared with the Spark layer (documented deviations from the
reference, which crashes on these inputs):

* scorers that divide by word/sentence/paragraph counts return the *worst*
  score (drop) instead of raising ZeroDivisionError on empty input;
* ``mean_word_length`` / ``max_word_length`` of an empty doc are 0.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from nemo_curator_spark import constants as C


def words(text: str) -> list[str]:
    return text.split()


def lines(text: str) -> list[str]:
    """Non-blank newline-split lines ("sentences" in Gopher parlance)."""
    return [x for x in text.split("\n") if x.strip()]


def paragraphs(text: str) -> list[str]:
    return text.split("\n\n")


def ngrams(tokens: list[str], n: int) -> list[tuple[str, ...]]:
    return [tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


# --- scorers ----------------------------------------------------------------


def non_alpha_numeric(text: str) -> float:
    n = len(text)
    if n == 0:
        return 1.0
    return (n - len(re.findall(C.ALPHANUM_CLASS, text))) / n


def symbols_to_words(text: str) -> float:
    ws = words(text.strip())
    if not ws:
        return 1.0
    bad = 0
    for w in ws:
        # count of '#'-runs (not chars) over word length, per the reference
        hash_runs = len(C.HASH_RUN_PY.findall(w))
        if w in C.ELLIPSIS_MARKS or hash_runs / len(w) > 0.5:
            bad += 1
    return bad / len(ws)


def numbers_ratio(text: str) -> float:
    n = len(text)
    if n == 0:
        return 1.0
    return len(C.DIGIT_PY.findall(text)) / n


def urls_ratio(text: str) -> float:
    n = len(text)
    if n == 0:
        return 1.0
    return sum(len(u) for u in C.URL_PY.findall(text)) / n


def bullet_ratio(text: str) -> float:
    ls = lines(text)
    if not ls:
        return 1.0
    n_bullet = sum(1 for s in ls if s.strip()[:1] in C.BULLET_CHARS)
    return n_bullet / len(ls)


def white_space_ratio(text: str) -> float:
    n = len(text)
    if n == 0:
        return 1.0
    return sum(1 for ch in text if ch in C.WHITE_SPACE_CHARS) / n


def parentheses_ratio(text: str) -> float:
    n = len(text)
    if n == 0:
        return 1.0
    return len(C.PAREN_PY.findall(text)) / n


def max_word_length(text: str) -> int:
    ws = words(text.strip())
    return max((len(w) for w in ws), default=0)


def word_count(text: str) -> int:
    return len(words(text.strip()))


def boilerplate_string_ratio(text: str) -> float:
    paras = paragraphs(text)
    hits = 0
    for p in paras:
        p_low = p.strip().lower()
        if "lorem ipsum" in p_low:
            return 1.0
        if any(s in p_low for s in C.POLICY_SUBSTRINGS):
            hits += 1
    return hits / len(paras)  # len >= 1 always ("".split("\n\n") == [""])


def mean_word_length(text: str) -> float:
    ws = [w for w in words(text.strip()) if w]
    if not ws:
        return 0.0
    return sum(len(w) for w in ws) / len(ws)


def punctuation_ratio(text: str) -> float:
    ls = lines(text)
    if not ls:
        return 1.0
    no_end = sum(1 for s in ls if not s.strip().endswith(C.END_MARKS))
    return no_end / len(ls)


def ellipsis_ratio(text: str) -> float:
    ls = lines(text)
    if not ls:
        return 1.0
    n_ell = sum(
        1
        for s in ls
        if any(s.strip().lower().endswith(m) for m in C.ELLIPSIS_MARKS)
    )
    return n_ell / len(ls)


def common_english_words(text: str, cutoff: int = 2, stop_at_false: bool = True) -> int:
    count = 0
    for w in words(text.strip()):
        if w in C.COMMON_ENGLISH_WORDS:
            count += 1
        if stop_at_false and count >= cutoff:
            return count
    return count


def words_without_alphabets(text: str) -> float:
    """Fraction of words containing at least one unicode letter."""
    ws = words(text.strip())
    if not ws:
        return 0.0
    return sum(1 for w in ws if C.ALPHA_PY.search(w)) / len(ws)


def pornographic_urls(text: str) -> int:
    return int(any("porn" in u for u in C.URL_PY.findall(text)))


def substring_score(text: str, sub: str, position: str) -> int:
    if position == "prefix":
        return int(text.startswith(sub))
    if position == "suffix":
        return int(text.endswith(sub))
    return int(sub in text)


def repeated_lines(text: str) -> float:
    ls = lines(text)
    if not ls:
        return 0.0
    return len(set(ls)) / len(ls)


def repeated_paragraphs(text: str) -> float:
    ps = paragraphs(text)
    return len(set(ps)) / len(ps)


def repeated_lines_char(text: str) -> float:
    ls = lines(text)
    total = sum(len(s) for s in ls)
    if total == 0:
        return 0.0
    return sum(len(s) for s in set(ls)) / total


def repeated_paragraphs_char(text: str) -> float:
    ps = paragraphs(text)
    total = sum(len(p) for p in ps)
    if total == 0:
        return 0.0
    return sum(len(p) for p in set(ps)) / total


def top_ngram_ratio(text: str, n: int) -> float:
    """Chars covered by the most frequent word n-gram / total chars.

    Ties between equally frequent n-grams resolve to the first-seen n-gram
    (deterministic; the reference iterates a set whose order is
    hash-randomized, so exact tie behavior is unreproducible by design).
    """
    toks = words(text.strip())
    if len(toks) < n:
        return 1.0
    grams = ngrams(toks, n)
    counts: dict[tuple[str, ...], int] = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    best = max(counts.items(), key=lambda kv: kv[1])[1]
    top = next(g for g in grams if counts[g] == best)
    phrase = " ".join(top)
    nchar = len(text)
    if nchar == 0:
        return 1.0
    return (nchar - len(text.replace(phrase, ""))) / nchar


def dup_ngram_ratio(text: str, n: int) -> float:
    """Chars inside duplicated (seen-before) word n-grams / total chars.

    Sliding window with overlap accounting: when a duplicate n-gram overlaps
    the previously counted one, only the non-overlapping suffix words (and
    the spaces joining them) are added.
    """
    toks = words(text.strip())
    if len(toks) < n:
        return 1.0
    seen: dict[tuple[str, ...], int] = {}
    dup_chars = 0
    overlap = 0
    for g in ngrams(toks, n):
        seen[g] = seen.get(g, 0) + 1
        if seen[g] > 1:
            new_chars = sum(len(w) for w in g[overlap:])
            n_spaces = min(n - overlap, n - 1)
            dup_chars += new_chars + n_spaces
            overlap = n
        overlap = max(overlap - 1, 0)
    nchar = len(text)
    if nchar == 0:
        return 1.0
    return dup_chars / nchar


def _python_docstrings(source: str) -> str:
    """Joined docstrings, mirroring the reference's stdlib-only extraction
    (text_utils.py:168-197: ast.walk over Module/ClassDef/FunctionDef,
    grouped+sorted by node-type name then symbol name)."""
    import ast
    from itertools import groupby

    node_types = {
        ast.ClassDef: "Class",
        ast.FunctionDef: "Function/Method",
        ast.Module: "Module",
    }
    tree = ast.parse(source)
    triples = [
        (node, getattr(node, "name", None), ast.get_docstring(node))
        for node in ast.walk(tree)
        if isinstance(node, tuple(node_types))
    ]
    triples.sort(key=lambda x: (node_types.get(type(x[0])), x[1]))
    results = []
    for _, group in groupby(triples, key=lambda x: node_types.get(type(x[0]))):
        for _, name, docstring in group:
            if docstring:
                results.append(docstring)
    return "\n".join(results)


def _python_comments(source: str) -> str:
    """COMMENT tokens untokenized back to one string (text_utils.py:155-166)."""
    import io
    import tokenize

    toks = [
        (tok.type, tok.string)
        for tok in tokenize.generate_tokens(io.StringIO(source).readline)
        if tok.type == tokenize.COMMENT
    ]
    return tokenize.untokenize(toks)


def python_comment_ratio(source: str) -> float:
    """PythonCommentToCodeFilter score (reference code.py:27-48):
    (len(comments)+len(docstrings))/len(source); 0 when either extraction
    fails (syntax/tokenization error). Deviation: empty source -> 0.0
    (the reference would raise ZeroDivisionError)."""
    if not source:
        return 0.0
    try:
        docstrings = _python_docstrings(source)
    except Exception:
        return 0.0
    try:
        comments = _python_comments(source)
    except Exception:
        return 0.0
    return (len(comments) + len(docstrings)) / len(source)


GENERAL_COMMENT_RE = re.compile(r"/\*[\s\S]*?\*/|//[^\n]*")


def general_comment_ratio(source: str) -> float:
    """GeneralCommentToCodeFilter score for C-family mimes (reference
    code.py:50-84). The reference delegates to the comment_parser library
    (absent here); this stand-in extracts ``//`` line and ``/* */`` block
    comments leftmost-first with one alternation, strips the markers (the
    reference likewise excludes them from the length), joins with a single
    space and takes len/len(source). Deviations: comment markers inside
    string literals are not lexed away; no 9999 tokenization-error path;
    empty source -> 0.0."""
    if not source:
        return 0.0
    parts = []
    for m in GENERAL_COMMENT_RE.findall(source):
        parts.append(m[2:] if m.startswith("//") else m[2:-2])
    return len(" ".join(parts)) / len(source)


def word_line_scores(text: str) -> dict[str, float]:
    """All word/line/paragraph-level scores in one pass with shared splits
    (each function above recomputes its splits; this is the batched form
    used by the Spark fast path — identical arithmetic, so identical IEEE
    doubles).

    Optimized (round 8) to a single fused loop per split level: every
    per-word statistic comes out of ONE pass over ``ws`` and every
    per-line statistic out of one shared ``stripped``/``set(ls)``. All
    accumulators are ints, so each final ratio is the same two-operand
    IEEE division as the per-rule functions above — bit-identical by
    construction (pinned vs the naive scorers by
    tests/test_heuristics_pyref.py::test_word_line_scores_matches_naive).
    """
    ws = text.split()
    ls = [x for x in text.split("\n") if x.strip()]
    ps = text.split("\n\n")
    n_w, n_l = len(ws), len(ls)

    out: dict[str, float] = {}
    # one fused pass over words: symbol hits, common-word count, alpha
    # hits, length sum/max, lowered-form stopword hits
    bad = 0
    common_cnt = 0
    alpha_hits = 0
    len_sum = 0
    max_len = 0
    en_h = 0
    pt_h = 0
    q_cnt = 0
    findall = C.HASH_RUN_PY.findall
    search = C.ALPHA_PY.search
    for w in ws:
        lw = len(w)
        len_sum += lw
        if lw > max_len:
            max_len = lw
        # '#' pre-check: findall('#+') is empty without one, so the ratio
        # test can only pass when the word contains '#'
        if w in _ELLIPSIS_SET or ("#" in w and len(findall(w)) / lw > 0.5):
            bad += 1
        if w in _COMMON_SET:
            common_cnt += 1
        # isalpha() => every char is a unicode letter => ALPHA_PY matches
        if w.isalpha() or search(w):
            alpha_hits += 1
        lo = w.lower()
        # EN/PT stoplists are disjoint (asserted below), so elif is exact
        if lo in _EN_STOP_SET:
            en_h += 1
        elif lo in _PT_STOP_SET:
            pt_h += 1
        if lo in _COMMON_SET:
            q_cnt += 1
    out["symbol_to_word"] = 1.0 if n_w == 0 else bad / n_w
    # shared stripped lines (bullet / punctuation / ellipsis all use them)
    stripped = [s.strip() for s in ls]
    out["bullet_ratio"] = (
        1.0 if n_l == 0 else sum(1 for s in stripped if s[:1] in _BULLET_SET) / n_l
    )
    # boilerplate
    bp = 0.0
    hits = 0
    for p in ps:
        low = p.strip().lower()
        if "lorem ipsum" in low:
            bp = 1.0
            break
        if any(s in low for s in C.POLICY_SUBSTRINGS):
            hits += 1
    out["boilerplate_string_ratio"] = bp if bp else hits / len(ps)
    # word stats
    out["word_count"] = float(n_w)
    out["max_word_length"] = float(max_len)
    out["mean_word_length"] = 0.0 if n_w == 0 else len_sum / n_w
    out["common_english_words"] = float(common_cnt if common_cnt < 2 else 2)
    out["words_without_alphabets"] = 0.0 if n_w == 0 else alpha_hits / n_w
    # line endings
    if n_l == 0:
        out["punctuation"] = 1.0
        out["ellipsis"] = 1.0
        punct_end = 0
    else:
        punct_end = sum(1 for s in stripped if s.endswith(C.END_MARKS))
        out["punctuation"] = (n_l - punct_end) / n_l
        out["ellipsis"] = sum(
            1
            for s in stripped
            if any(s.lower().endswith(m) for m in C.ELLIPSIS_MARKS)
        ) / n_l
    # repetition (set(ls)/set(ps) computed once, shared)
    set_ls = set(ls)
    set_ps = set(ps)
    out["repeated_lines"] = 0.0 if n_l == 0 else len(set_ls) / n_l
    out["repeated_paragraphs"] = len(set_ps) / len(ps)
    tot_l = sum(len(s) for s in ls)
    out["repeated_lines_char"] = (
        0.0 if tot_l == 0 else sum(len(s) for s in set_ls) / tot_l
    )
    tot_p = sum(len(p) for p in ps)
    out["repeated_paragraphs_char"] = (
        0.0 if tot_p == 0 else sum(len(p) for p in set_ps) / tot_p
    )

    # non-rule extras consumed by langid (stopword hits) and the lexical
    # quality score — computed here so the pipeline needs ONE batch pass
    out["en_stop_hits"] = float(en_h)
    out["pt_stop_hits"] = float(pt_h)
    out["quality_stop_frac"] = q_cnt / max(n_w, 1)
    out["punct_end_frac"] = punct_end / max(n_l, 1)
    out["uniq_line_frac"] = len(set_ls) / max(n_l, 1)
    return out


# stopword lists shared with operators.langid (import cycle avoided by
# defining them here; langid re-exports)
EN_STOPWORDS = ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for")
PT_STOPWORDS = (
    "de", "que", "não", "uma", "para", "com", "os", "as", "do", "da",
    "em", "o", "a", "e", "ao", "à", "pelo", "pela",
)

# set forms for the fused word_line_scores pass (O(1) membership; same
# elements, so `in` decisions are identical to the tuple scans)
_ELLIPSIS_SET = frozenset(C.ELLIPSIS_MARKS)
_COMMON_SET = frozenset(C.COMMON_ENGLISH_WORDS)
_BULLET_SET = frozenset(C.BULLET_CHARS)
_EN_STOP_SET = frozenset(EN_STOPWORDS)
_PT_STOP_SET = frozenset(PT_STOPWORDS)
# the fused pass counts EN/PT stopword hits with elif — exact only while
# the lists stay disjoint
assert not (_EN_STOP_SET & _PT_STOP_SET)


# --- the English chain -------------------------------------------------------


@dataclass(frozen=True)
class RuleSpec:
    """One heuristic rule: name, scorer, keep predicate over the score."""

    name: str
    score: Callable[[str], float]
    keep: Callable[[float], bool]
    params: dict = field(default_factory=dict)


def english_chain() -> list[RuleSpec]:
    """The reference English heuristic cascade, in pipeline order.

    Order and cutoffs follow the reference's
    config/text/heuristic_filter_english_pipeline.yaml:50-243.
    """
    specs: list[RuleSpec] = [
        RuleSpec("alpha_numeric", non_alpha_numeric, lambda s: s <= 0.25),
        RuleSpec("symbol_to_word", symbols_to_words, lambda s: s <= 0.1),
        RuleSpec("numbers_ratio", numbers_ratio, lambda s: s <= 0.15),
        RuleSpec("urls_ratio", urls_ratio, lambda s: s <= 0.2),
        RuleSpec("white_space", white_space_ratio, lambda s: s <= 0.25),
        RuleSpec("parentheses_ratio", parentheses_ratio, lambda s: s <= 0.1),
        RuleSpec(
            "boilerplate_string_ratio", boilerplate_string_ratio, lambda s: s <= 0.4
        ),
        RuleSpec("repeated_lines", repeated_lines, lambda s: s >= 0.7),
        RuleSpec("repeated_paragraphs", repeated_paragraphs, lambda s: s >= 0.7),
        RuleSpec("repeated_lines_char", repeated_lines_char, lambda s: s >= 0.8),
        RuleSpec(
            "repeated_paragraphs_char", repeated_paragraphs_char, lambda s: s >= 0.8
        ),
        RuleSpec("word_count", word_count, lambda s: 50 <= s <= 100000),
        RuleSpec("punctuation", punctuation_ratio, lambda s: s <= 0.85),
        RuleSpec(
            "words_without_alphabets", words_without_alphabets, lambda s: s >= 0.8
        ),
        RuleSpec("common_english_words", common_english_words, lambda s: s >= 2),
        RuleSpec("mean_word_length", mean_word_length, lambda s: 3 <= s <= 10),
        RuleSpec("max_word_length", max_word_length, lambda s: s <= 1000),
        RuleSpec("ellipsis", ellipsis_ratio, lambda s: s <= 0.3),
    ]
    for n, cutoff in ((2, 0.2), (3, 0.18), (4, 0.16)):
        specs.append(
            RuleSpec(
                f"repeating_top_{n}grams",
                lambda t, n=n: top_ngram_ratio(t, n),
                lambda s, c=cutoff: s <= c,
                {"n": n},
            )
        )
    for n, cutoff in ((5, 0.15), (6, 0.14), (7, 0.13), (8, 0.12), (9, 0.11), (10, 0.10)):
        specs.append(
            RuleSpec(
                f"repeating_dup_{n}gram",
                lambda t, n=n: dup_ngram_ratio(t, n),
                lambda s, c=cutoff: s <= c,
                {"n": n},
            )
        )
    specs.append(RuleSpec("bullet_ratio", bullet_ratio, lambda s: s <= 0.9))
    return specs


def label_document(text: str) -> tuple[bool, str | None]:
    """Run the full English cascade; return (keep, first drop reason)."""
    for spec in english_chain():
        if not spec.keep(spec.score(text)):
            return False, spec.name
    return True, None


# --- semantic dedup (SemDeDup) reference pin -------------------------------
# Pure-python port of the reference's within-cluster logic
# (deduplication/semantic/pairwise.py:37-72,280-304 ranking;
# identify_duplicates.py:100-105 threshold) given precomputed cluster
# assignments. Used by tests to pin the Spark implementation's removal
# sets and scores.


def semdedup_scores_py(
    items: list[tuple[int, int, float, list[float]]],
    which_to_keep: str = "hard",
) -> dict[int, float]:
    """items: (id, cluster, cosine_dist_to_cent, l2-normalized vec).
    Returns id -> cosine_sim_score (max dot to any earlier-ranked row in
    the cluster; the triu mask's zeros floor the score at 0)."""
    clusters: dict[int, list[tuple[int, int, float, list[float]]]] = {}
    for it in items:
        clusters.setdefault(it[1], []).append(it)
    scores: dict[int, float] = {}
    for rows in clusters.values():
        if which_to_keep == "hard":
            rows = sorted(rows, key=lambda r: (-r[2], -r[0]))
        elif which_to_keep == "easy":
            rows = sorted(rows, key=lambda r: (r[2], r[0]))
        else:
            raise ValueError(which_to_keep)
        for i, (rid, _, _, vi) in enumerate(rows):
            best = 0.0
            for j in range(i):
                vj = rows[j][3]
                best = max(best, sum(x * y for x, y in zip(vi, vj)))
            scores[rid] = best
    return scores


def semdedup_removal_py(
    items: list[tuple[int, int, float, list[float]]],
    threshold: float = 0.99,
    which_to_keep: str = "hard",
) -> set[int]:
    scores = semdedup_scores_py(items, which_to_keep)
    return {rid for rid, s in scores.items() if s >= threshold}

"""Golden unit tests for the pure-Python oracle (pyref) — exact surviving
rows ported from the reference's own unit fixtures
(tests/stages/text/modules/test_filters.py), plus score-value pins.
"""

from __future__ import annotations

import pytest

from nemo_curator_spark import pyref


def survivors(texts, score_fn, keep_fn):
    return [t for t in texts if keep_fn(score_fn(t))]


def test_nonalpha():
    texts = ["", "This is a test case.", "%$^%$^%$&^$()))))", "$aaa"]
    assert survivors(texts, pyref.non_alpha_numeric, lambda s: s <= 0.25) == [
        "This is a test case.",
        "$aaa",
    ]


def test_symbolswords():
    texts = [
        "mixed bag ... #",
        "full of words",
        "... # ... # #",
        "barely ok 3 4 5 6 7 8 9 #",
    ]
    assert survivors(texts, pyref.symbols_to_words, lambda s: s <= 0.1) == [
        "full of words",
        "barely ok 3 4 5 6 7 8 9 #",
    ]


def test_numbers():
    texts = ["purely letters", "34134543", "$!@$@!$!@", "abcdefghi1"]
    assert survivors(texts, pyref.numbers_ratio, lambda s: s <= 0.1) == [
        "purely letters",
        "$!@$@!$!@",
        "abcdefghi1",
    ]


def test_urls():
    texts = [
        "https://www.nvidia.com/en-us/",
        "no urls here!",
        "$!@$@!$!@",
        "bunch of other words with url afdsjafidsaofjbwreowihfdsafbdashuoiotauhiofdafdsafd fdasfdafdsafdsafdsafdsafdsafdsa https://www.nvidia.com/en-us/ something else after the url etc more and more",
        "words with url https://www.nvidia.com/en-us/",
    ]
    assert survivors(texts, pyref.urls_ratio, lambda s: s <= 0.2) == [
        "no urls here!",
        "$!@$@!$!@",
        texts[3],
    ]


def test_url_regex_does_not_swallow_html_tags():
    from nemo_curator_spark.constants import URL_PY

    assert URL_PY.findall("see http://x.com<bad> for details") == ["http://x.com"]
    assert URL_PY.findall("click http://example.com;next") == ["http://example.com"]
    assert URL_PY.findall("http://example.com/foo/bar baz") == [
        "http://example.com/foo/bar"
    ]
    assert URL_PY.findall("https://x.com/path?q=foo#section here") == [
        "https://x.com/path?q=foo#section"
    ]
    assert URL_PY.findall("ref https://A.B-C_D+E&f!*(g),h/i%2F end") == [
        "https://A.B-C_D+E&f!*(g),h/i%2F"
    ]


def test_bullets():
    texts = [
        "• not good",
        "good",
        "50 \n ⦾ 50",
        "⁌ this \n⁌ should \n⁌barely \n⁌pass \n⁌5 \n⁌6 \n⁌7 \n⁌8 \n⁌9 \n done!",
    ]
    assert survivors(texts, pyref.bullet_ratio, lambda s: s <= 0.9) == texts[1:]


def test_whitespace():
    texts = ["\t\n\r", "good", "50%\n\n\n", "123\b"]
    assert survivors(texts, pyref.white_space_ratio, lambda s: s <= 0.25) == [
        "good",
        "123\b",
    ]


def test_parentheses():
    texts = ["()", "(not good)", "this is completely absolutely fine", "123456789("]
    assert survivors(texts, pyref.parentheses_ratio, lambda s: s <= 0.1) == [
        "this is completely absolutely fine",
        "123456789(",
    ]


def test_longword():
    texts = ["tiny", "large"]
    assert survivors(texts, pyref.max_word_length, lambda s: s <= 4) == ["tiny"]


def test_wordcount():
    texts = ["", "one", "two words", "$#@$ %$@$#@ !#@!", "one two three four five"]
    assert survivors(texts, pyref.word_count, lambda s: 2 <= s <= 4) == [
        "two words",
        "$#@$ %$@$#@ !#@!",
    ]


def test_boilerplate():
    texts = [
        "nothing\t here",
        "1\n\n2\n\n3\n\n4\n\n5\n\n6\n\nterms of use\n\n privacy policy\n\n cookie policy\n\nuses cookies",
        "too much \n\n privacy & cookies policy",
    ]
    assert survivors(
        texts, pyref.boilerplate_string_ratio, lambda s: s <= 0.4
    ) == texts[:2]


def test_meanwordlength():
    texts = ["a", "aa", "superlongword short", "evenly balanced", "waytoolongforasingleword"]
    assert survivors(texts, pyref.mean_word_length, lambda s: 3 <= s <= 10) == [
        "superlongword short",
        "evenly balanced",
    ]


def test_repeatedlines():
    assert survivors(
        ["totally unique", "half.\nhalf."], pyref.repeated_lines, lambda s: s >= 0.7
    ) == ["totally unique"]


def test_repeatedparagraphs():
    assert survivors(
        ["totally unique", "half.\n\nhalf."],
        pyref.repeated_paragraphs,
        lambda s: s >= 0.7,
    ) == ["totally unique"]


def test_repeatedlineschar():
    texts = [
        "totally unique",
        "a.\na.\nvery very very short duplicate.",
        "half.\nhalf.",
        "super very incredibly huge long duplicate.\nsuper very incredibly huge long duplicate.\na.\nb.\nc.",
    ]
    assert survivors(
        texts, pyref.repeated_lines_char, lambda s: s >= 0.8
    ) == texts[:2]


def test_repeatedparagraphschar():
    texts = [
        "totally unique",
        "a.\n\n  a.\n\n  very very very short duplicate.",
        "half.\n\nhalf.",
        "super very incredibly huge long duplicate.\n\nsuper very incredibly huge long duplicate.\n\n  a.\n\n  b.\n\n  c.",
    ]
    assert survivors(
        texts, pyref.repeated_paragraphs_char, lambda s: s >= 0.8
    ) == texts[:2]


def test_repeatingtopngrams():
    texts = [
        "this is a totally fine sentence with no repeat ngrams so we are ok",
        "a b . a b",
        "a a a a a a",
        "totally fine small dupe a b a b",
    ]
    keep = [t for t in texts if pyref.top_ngram_ratio(t, 2) <= 0.2]
    assert keep == [texts[0], texts[3]]


def test_repeatingduplicatengrams():
    texts = ["a a b b a a b b", "totally fine", "a a a a this should be fine as well"]
    keep = [t for t in texts if pyref.dup_ngram_ratio(t, 2) <= 0.2]
    assert keep == texts[1:]


def test_punctuation():
    texts = ["not good", "good.", "just\n barely\n fine\n ok\n yep."]
    assert survivors(texts, pyref.punctuation_ratio, lambda s: s <= 0.8) == texts[1:]


def test_ellipsis():
    texts = ["not good...", "good.", "just...\n barely...\n fine...\n ok...\n yep."]
    assert survivors(texts, pyref.ellipsis_ratio, lambda s: s <= 0.8) == texts[1:]


def test_commonenglishwords():
    texts = ["uncommon", "the and", "the and and of to"]
    assert survivors(
        texts, pyref.common_english_words, lambda s: s >= 2
    ) == texts[1:]


def test_wordswithoutalphabets():
    texts = ["totally fine", "good good good good !", "@"]
    assert survivors(
        texts, pyref.words_without_alphabets, lambda s: s >= 0.8
    ) == texts[:2]


def test_pornographicurls():
    texts = [
        "no url",
        "fine url https://www.nvidia.com/en-us/",
        "bad url https://www.pornhub.com/",
    ]
    assert survivors(texts, pyref.pornographic_urls, lambda s: s != 1) == texts[:2]


def test_substring():
    assert pyref.substring_score("Hello world", "Hello", "prefix") == 1
    assert pyref.substring_score("world Hello", "Hello", "prefix") == 0
    assert pyref.substring_score("This is the end", "end", "suffix") == 1
    assert pyref.substring_score("The end is near", "end", "suffix") == 0
    assert pyref.substring_score("this is a test string", "test", "any") == 1


def test_label_document_clean_prose_kept():
    clean = (
        "The quick brown fox jumps over the lazy dog near the river bank. "
        "It was a bright morning and the air was full of the scent of pine. "
        "Every one of the hikers agreed that the view from the summit was "
        "worth the climb, and they sat down to have a quiet meal together. "
        "Later that day the weather turned, so they packed up their things "
        "and walked back down the winding trail to the village before dark."
    )
    keep, reason = pyref.label_document(clean)
    assert keep and reason is None


def test_label_document_short_doc_dropped_with_reason():
    keep, reason = pyref.label_document("This is a short doc with the and of.")
    assert not keep
    assert reason == "word_count"


# --- round-8 fast-path pins --------------------------------------------------
# word_line_scores and _ngram_scores_doc were rewritten as fused/interned
# fast paths; these tests pin them bit-exactly to the naive per-rule
# scorers on the golden corpus plus adversarial repetition/width cases.

_R8_EXTRA_TEXTS = [
    "",
    " ",
    "\n\n\n",
    "# ## ### #notahash a#b",
    "spam spam spam spam spam spam spam spam spam spam spam spam",
    "a b c d e f g h i j a b c d e f g h i j a b c d e f g h i j",
    "one two three four five six seven eight nine ten eleven twelve "
    "one two three four five six seven eight nine ten eleven twelve",
    "The and of to is in that it was for the and of to is in that.",
    "de que não uma para com os as do da em o a e ao à pelo pela",
    "xa b phrase boundary xa b phrase boundary xa b",
    "… … … … …",
    "BULLET\n- a\n- b\n- a\n- b",
    "word " * 200 + "tail",
    " ".join(str(i) for i in range(300)) + " " + " ".join(str(i) for i in range(300)),
]


def test_word_line_scores_matches_naive(golden_texts):
    for text in list(golden_texts) + _R8_EXTRA_TEXTS:
        got = pyref.word_line_scores(text)
        assert got["symbol_to_word"] == pyref.symbols_to_words(text)
        assert got["bullet_ratio"] == pyref.bullet_ratio(text)
        assert got["boilerplate_string_ratio"] == pyref.boilerplate_string_ratio(text)
        assert got["word_count"] == float(pyref.word_count(text))
        assert got["max_word_length"] == float(pyref.max_word_length(text))
        assert got["mean_word_length"] == pyref.mean_word_length(text)
        assert got["common_english_words"] == float(
            pyref.common_english_words(text)
        )
        assert got["words_without_alphabets"] == pyref.words_without_alphabets(text)
        assert got["punctuation"] == pyref.punctuation_ratio(text)
        assert got["ellipsis"] == pyref.ellipsis_ratio(text)
        assert got["repeated_lines"] == pyref.repeated_lines(text)
        assert got["repeated_paragraphs"] == pyref.repeated_paragraphs(text)
        assert got["repeated_lines_char"] == pyref.repeated_lines_char(text)
        assert got["repeated_paragraphs_char"] == pyref.repeated_paragraphs_char(text)
        # extras vs their direct naive forms
        lowered = [w.lower() for w in text.split()]
        assert got["en_stop_hits"] == float(
            sum(1 for w in lowered if w in pyref.EN_STOPWORDS)
        )
        assert got["pt_stop_hits"] == float(
            sum(1 for w in lowered if w in pyref.PT_STOPWORDS)
        )


def test_ngram_scores_doc_matches_naive(golden_texts):
    from nemo_curator_spark.functions import heuristics as H

    for text in list(golden_texts) + _R8_EXTRA_TEXTS:
        toks = text.split()
        got = H._ngram_scores_doc(text, toks)
        for n, _ in H.TOP_NGRAM_PARAMS:
            assert got[f"top_{n}"] == pyref.top_ngram_ratio(text, n), (n, text[:60])
        for n, _ in H.DUP_NGRAM_PARAMS:
            assert got[f"dup_{n}"] == pyref.dup_ngram_ratio(text, n), (n, text[:60])

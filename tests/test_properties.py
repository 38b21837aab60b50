"""Property-based invariants (hypothesis) for the pure-python cores —
cheap, no Spark session, broad input coverage."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nemo_curator_spark import pyref
from nemo_curator_spark.functions import bpe, ftfy_mini

TEXT = st.text(max_size=400)
ASCII_PRINTABLE = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, exclude_characters="&"),
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_split_join_roundtrip(text):
    # DocumentSplitter/Joiner invariant: split on sep, rejoin -> original
    for sep in (" ", "\n\n", "|"):
        assert sep.join(text.split(sep)) == text


_BPE = bpe.MiniBPE(
    bpe.train_bpe(["the quick brown fox the lazy dog " * 3], num_merges=40)
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_bpe_encode_decode_lossless(text):
    ids = _BPE.encode(text)
    # pretokenization preserves every non-leading-whitespace char; decode
    # must reproduce the pretokenized concatenation exactly
    expected = "".join(
        m.decode("utf-8") for m in bpe._pretokenize(text)
    )
    assert _BPE.decode(ids) == expected


@settings(max_examples=200, deadline=None)
@given(ASCII_PRINTABLE)
def test_ftfy_identity_on_clean_ascii(text):
    # clean printable ascii (no entities, no escapes, no mojibake aliases)
    # must pass through unchanged under default config
    assert ftfy_mini.fix_text(text) == text


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_ftfy_idempotent(text):
    once = ftfy_mini.fix_text(text)
    assert ftfy_mini.fix_text(once) == once


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_comment_ratios_bounded(text):
    g = pyref.general_comment_ratio(text)
    assert 0.0 <= g <= 1.0
    p = pyref.python_comment_ratio(text)
    assert 0.0 <= p <= 1.0


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200), st.integers(min_value=1, max_value=50))
def test_histogram_formula_bounds(text, k):
    from nemo_curator_spark.operators import langid as L

    hist = set("abcdefghijklmnopqrstuvwxyz "[:k])
    s = L.histogram_score_py(text, hist)
    assert s in (0.0, 1.0)


# repeated-word texts stress the ngram oracles' tie-break + overlap logic
WORDS = st.lists(
    st.sampled_from(["a", "bb", "ccc", "dd", "e", "spark", "the"]),
    min_size=0, max_size=60,
).map(" ".join)


@settings(max_examples=120, deadline=None)
@given(WORDS, st.sampled_from([2, 3, 5, 7]))
def test_ngram_duck_oracles_match_pyref(text, n):
    import duckdb

    from nemo_curator_spark.functions import heuristics as H

    rule = H.RULES_BY_NAME[
        f"repeating_top_{n}grams" if n <= 4 else f"repeating_dup_{n}gram"
    ]
    expected = rule.py_score(text)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?)", [text])
    got = con.execute(rule.duck_query("documents")).df()["score"][0]
    assert abs(got - expected) < 1e-12, (text, n, expected, got)

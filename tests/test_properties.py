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


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), max_size=30),
    st.integers(min_value=1, max_value=40),
)
def test_pack_paragraphs_invariants(counts, budget):
    from nemo_curator_spark.operators.chunking import pack_paragraphs

    ids = pack_paragraphs(counts, budget)
    assert len(ids) == len(counts)
    if ids:
        # chunk ids are non-decreasing and start at 0
        assert ids[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))
        # A chunk only exceeds the budget if at most ONE member has n>0.
        # The reference (chunking.py:93) closes a chunk only when
        # `token_count > 0`, so zero-token paragraphs legitimately leave
        # the chunk "open" and ride along with the next non-empty one —
        # pack_paragraphs mirrors that exactly. (In the real pipeline
        # zero-token paragraphs can't occur: split_paragraphs strips
        # blanks and MiniBPE emits >=1 token for non-empty text.)
        # Regression pin: counts=[0, 2], budget=1 packs both into chunk 0.
        from collections import defaultdict

        per = defaultdict(list)
        for n, c in zip(counts, ids):
            per[c].append(n)
        for members in per.values():
            nonzero = [n for n in members if n > 0]
            assert sum(members) <= budget or len(nonzero) <= 1


def test_pack_paragraphs_zero_token_regression():
    # Hypothesis counterexample from round 3: a leading zero-token
    # paragraph leaves chunk 0 open; the 2-token paragraph joins it.
    from nemo_curator_spark.operators.chunking import pack_paragraphs

    assert pack_paragraphs([0, 2], 1) == [0, 0]
    # and with all-positive counts the strict invariant still holds
    assert pack_paragraphs([2, 2], 1) == [0, 1]


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=0, max_value=10_000),
)
def test_kmeans_np_deterministic_and_covers(k, n, seed):
    import numpy as np

    from nemo_curator_spark.functions.kmeans_np import kmeans_fit

    rng = np.random.RandomState(seed % 1000)
    X = rng.normal(size=(n, 4))
    a = kmeans_fit(X, k, seed=seed)
    b = kmeans_fit(X, k, seed=seed)
    assert np.array_equal(a, b)  # bit-deterministic
    assert a.shape == (min(k, n), 4)
    assert np.isfinite(a).all()


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=120), st.text(max_size=120))
def test_wer_detail_is_a_metric_decomposition(h, r):
    from nemo_curator_spark.operators.audio import word_error_rate_detail

    wer, tokens, ins, dele, sub = word_error_rate_detail([h], [r])
    if tokens == 0:
        return
    # rates decompose exactly, wer is symmetric-ish bounded
    assert abs((ins + dele + sub) - wer) < 1e-12
    assert wer >= 0
    # identity
    w2, *_ = word_error_rate_detail([r], [r])
    assert w2 == 0.0


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=200))
def test_simhash_pure_function_of_tokens(text):
    # fingerprint depends only on the token multiset order-insensitively?
    # No — simhash is order-insensitive by construction (per-token votes).
    import pandas as pd

    from nemo_curator_spark.operators import dedup

    # exercise the vectorized UDF's inner path via a local pandas call
    udf_fn = dedup.simhash_udf().func
    a = udf_fn(pd.Series([text]))[0]
    shuffled = " ".join(reversed(text.split()))
    b = udf_fn(pd.Series([shuffled]))[0]
    # same multiset of tokens -> same fingerprint
    assert a == b


@settings(max_examples=150, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            min_codepoint=1,
            max_codepoint=0x2100,
            exclude_categories=("Cs",),
        ),
        max_size=120,
    )
)
def test_ftfy_nfc_last_equals_nfc_in_loop(text):
    """The modifier_unicode_nfc gate splits the pipeline at NFC: the
    artifact is fix_text WITHOUT normalization, the oracle applies NFC
    last. That decomposition must equal running NFC inside the fixer's
    convergence loop (the operator's real path) — pin it broadly."""
    import unicodedata

    from nemo_curator_spark.functions import ftfy_mini

    full = ftfy_mini.fix_text(
        text, config=ftfy_mini.TextFixerConfig(normalization="NFC")
    )
    split = unicodedata.normalize(
        "NFC",
        ftfy_mini.fix_text(
            text, config=ftfy_mini.TextFixerConfig(normalization=None)
        ),
    )
    assert full == split, repr(text)

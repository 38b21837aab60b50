"""Whitespace-divergence regression suite (round-3 VERDICT item 3).

Three tokenizer engines touch gate-exposed text: Python ``str.split()``
(the reference behavior, run inside Arrow UDFs), Java regex (Spark JVM
Column expressions), and RE2 (DuckDB oracles). They disagree on
Python-only whitespace — ``\\x85``, ``\\xa0``, ``\\x1c``-``\\x1f``,
Unicode Zs/Zl/Zp — and JVM ``lower`` adds contextual mappings (Greek
final sigma) Python lacks. Round 3's only red driver row
(``embedder_hash_dim``) was exactly this class: the driver's data
exercised a divergence the sf0.01 replica never did.

This module plants a corpus saturated with those characters and asserts
the gate queries that tokenize text stay value-identical between Spark
and their DuckDB oracles ON that corpus.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

# every char class Python str.split() treats as whitespace that ASCII
# \s+ (RE2) or Java \s+ does NOT, plus contextual-lowercase traps
NASTY_TEXTS = [
    "plain ascii words only",
    "nbsp\xa0separated\xa0words",  # U+00A0 (Zs, not RE2 \s)
    "nel\x85line\x85chars",  # U+0085 NEL
    "fs\x1cgs\x1drs\x1eus\x1f end",  # \x1c-\x1f (python-only)
    "thin space and em space",  # U+2009, U+2003 (Zs)
    "line sep and para sep",  # Zl / Zp
    "ideographic　space",  # U+3000 (Zs)
    "vertical\x0btab and form\x0cfeed",  # \x0b \x0c (in both \s)
    "ΟΔΥΣΣΕΥΣ spoke",  # JVM lower -> final sigma 'ς'; python -> 'σ'
    "İstanbul İ dotted",  # dotted capital I (1->2 chars on lower)
    "mixed\xa0and ascii and\x85more",
    "",
    "   ",
    "\xa0\x85 ",  # whitespace-only (python: zero words)
    # non-BMP: all three engines count codepoints (verified); a
    # UTF-16-unit regression in any new expression surfaces here
    "emoji 😀 doc 🎉🎉 end",
    "astral 𝔸𝔹ℂ math and 👨‍👩‍👧 zwj family",
]


@pytest.fixture(scope="module")
def nasty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty_sf")
    rows = []
    for i, t in enumerate(NASTY_TEXTS * 3):  # repeats exercise counts > 1
        rows.append(
            {
                "doc_id": i,
                "text": t,
                "lang": "en",
                "source": "nasty",
                "n_chars": len(t),
            }
        )
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def nasty_duck(nasty_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{nasty_sf_dir}/documents.parquet'"
    )
    return con


def _run_pair(spark, con, sf_dir, name):
    sdf = entry_mod.queries()[name](spark, sf_dir).toPandas()
    ddf = con.execute(entry_mod.oracle_sql()[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns), (name, cols, sorted(ddf.columns))
    a = sdf[cols].sort_values(by=cols, na_position="last").reset_index(drop=True)
    b = ddf[cols].sort_values(by=cols, na_position="last").reset_index(drop=True)
    assert len(a) == len(b), (name, len(a), len(b))
    for c in cols:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av == bv) | (av.isna() & bv.isna())).all()
        else:
            ok = (
                (av.isna() & bv.isna())
                | (av.astype(object) == bv.astype(object))
            ).all()
        assert ok, f"{name}.{c} diverges on the nasty corpus"


def test_embedder_gate_survives_nasty_whitespace(spark, nasty_duck, nasty_sf_dir):
    # round-3 red row: the artifact protocol must make the oracle immune
    # to tokenizer divergence because it never re-tokenizes
    _run_pair(spark, nasty_duck, nasty_sf_dir, "embedder_hash_dim")


@pytest.mark.parametrize(
    "name",
    [
        "classifier_stage",  # MiniTransformer: artifact oracle, no re-tok
        "embedder_mini_transformer",  # same artifact protocol
        "translation_coarse_roundtrip",  # strip/lead-ws template replay
        "translation_fine_roundtrip",  # python strip + sentencizer units
        "pdf_parse_elements",  # python .strip() vs ISPACE-class oracle
        "token_count_fingerprint",  # JVM split + fingerprint normalize
        "langid",  # JVM stopword-hit word split
        "quality_pareto",  # lexical-quality word/line split
        "filter_token_count_bpe",  # \s*\S+ pretokenizer (python re vs RE2)
        "fasttext_langid_mini",  # python split tokenizer vs oracle split
        "audio_manifest_metrics",  # word_rate = len(text.split())/duration
        "interleaved_ratio_filter",  # JVM word_count_col
        "perplexity_bucketed",  # ASCII-translate casefold (round-4 find)
        "simhash_near_dup_pairs",  # python lower().split() + fp artifact
        "fuzzy_dedup_removal_ids",  # jaccard word grams oracle split
        "heuristic_chain_native",  # 28-rule chain over d_words oracles
        "heuristic_chain_full",  # chain + variant gate
        "filter_word_count",
        "filter_mean_word_length",
        "modifier_unicode_nfc",  # \x85->ellipsis + kept \f (round-4 find)
    ],
)
def test_tokenizing_gates_survive_nasty_whitespace(
    spark, nasty_duck, nasty_sf_dir, name
):
    _run_pair(spark, nasty_duck, nasty_sf_dir, name)


def test_python_split_vs_isspace_class_equivalence():
    # the explicit char class used to harmonize Java/RE2 word splits must
    # agree with python str.split() on every nasty text
    import re

    # RE2/Java-portable class == python str.isspace() (constants.py)
    from nemo_curator_spark.constants import SPLIT_PATTERN_PY

    pat = re.compile(SPLIT_PATTERN_PY)
    for t in NASTY_TEXTS:
        assert [w for w in pat.split(t) if w] == t.split(), repr(t)

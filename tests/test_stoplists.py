"""Stoplist registry — reference html_extractors/utils/__init__.py:18-67.
The zh/th/ja sets are pinned byte-for-byte against the reference's
vendored stopwords-iso data (loaded directly from the dependency-free
reference modules, skipped if the snapshot is absent)."""

from __future__ import annotations

import importlib.util
import os

import pytest

from nemo_curator_spark.operators import stoplists as SL

_REF_DIR = "/root/reference/nemo_curator/stages/text/download/html_extractors/utils"


def _ref_set(mod: str):
    spec = importlib.util.spec_from_file_location(mod, os.path.join(_REF_DIR, f"{mod}.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return getattr(m, mod)


@pytest.mark.skipif(not os.path.isdir(_REF_DIR), reason="reference snapshot absent")
@pytest.mark.parametrize(
    ("key", "mod"),
    [("CHINESE", "zh_stopwords"), ("JAPANESE", "ja_stopwords"), ("THAI", "th_stopwords")],
)
def test_custom_sets_match_reference(key, mod):
    got = SL.get_stop_list_dict([key.capitalize()])[key]
    assert got == _ref_set(mod)


def test_lang_map():
    assert SL.LANG_MAP["Haitian"] == "HAITIAN_CREOLE"
    assert SL.LANG_MAP["Norwegian_Bokmal"] == "NORWEGIAN"
    assert SL.LANG_MAP["Norwegian_Nynorsk"] == "NORWEGIAN_N"
    assert SL.LANG_MAP["Waray_Waray"] == "WARAY_PHILIPPINES"


def test_default_degraded_set():
    # without the justext package the default is EN + custom three
    d = SL.get_stop_list_dict()
    assert set(d) >= {"ENGLISH", "THAI", "CHINESE", "JAPANESE"}
    assert "the" in d["ENGLISH"]
    assert len(d["CHINESE"]) == 794
    assert len(d["JAPANESE"]) == 134
    assert len(d["THAI"]) == 115


def test_extra_plug_point():
    d = SL.get_stop_list_dict(["Klingon"], extra={"KLINGON": frozenset({"qapla"})})
    assert d["KLINGON"] == frozenset({"qapla"})
    with pytest.raises(LookupError, match="justext"):
        SL.get_stop_list_dict(["French"])


def test_feeds_justext_classifier(spark):
    # the zh set drives the repo's justext-like classifier end to end
    from nemo_curator_spark.operators import justext_like as JL

    zh = SL.get_stop_list_dict(["Chinese"])["CHINESE"]
    assert "的" in zh or len(zh) > 0
    html = "<html><body><p>" + "的 了 和 是 在 我 有 他" * 10 + "</p></body></html>"
    out = JL.extract_text(html, zh, language="CHINESE")
    assert out  # classified good (high stopword density, boilerplate off)

"""Per-language stoplist registry — reference
stages/text/download/html_extractors/utils/__init__.py:18-67.

The reference's HTML extractors take a per-language stopword set
(jusText classification thresholds + the added stopword-density
post-filter). ``get_stop_list_dict`` reproduces its contract:

- the CLD2→jusText language-name mapping (Haitian, the two Norwegians,
  Waray),
- custom Thai/Chinese/Japanese lists (the stopwords-iso datasets the
  reference vendors; carried here as a JSON data asset,
  ``data/cjk_stopwords.json``) — these languages are non-space-separated,
  so the extractors disable density checks but jusText still needs the
  set for classification,
- every other language from the ``justext`` package's shipped stoplists
  when that library is present (plug point in this sandbox — absent, the
  registry serves the custom three plus the repo's English list and any
  caller-provided extras), and the reference's removal of Latin from the
  default language set.
"""

from __future__ import annotations

import json
import os

_DATA = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")

# CLD2 value -> jusText key (utils/__init__.py:23-29)
LANG_MAP = {
    "Haitian": "HAITIAN_CREOLE",
    "Norwegian_Bokmal": "NORWEGIAN",
    "Norwegian_Nynorsk": "NORWEGIAN_N",
    "Waray_Waray": "WARAY_PHILIPPINES",
}

_CUSTOM_KEYS = ("THAI", "CHINESE", "JAPANESE")
_JSON_KEY = {"THAI": "th", "CHINESE": "zh", "JAPANESE": "ja"}

_cache: dict[str, frozenset[str]] = {}


def _custom_stopwords(lang_key: str) -> frozenset[str]:
    if lang_key not in _cache:
        with open(os.path.join(_DATA, "cjk_stopwords.json"), encoding="utf-8") as f:
            data = json.load(f)
        for key, jkey in _JSON_KEY.items():
            _cache[key] = frozenset(data[jkey])
    return _cache[lang_key]


def _justext_stoplists():
    try:
        import justext  # noqa: PLC0415 — optional, absent in-sandbox

        return justext
    except ImportError:
        return None


def get_stop_list_dict(
    languages: list[str] | None = None,
    extra: dict[str, frozenset[str]] | None = None,
) -> dict[str, frozenset[str]]:
    """utils/__init__.py:18-67. With no ``languages``, the default set is
    every justext stoplist minus Latin, plus Thai/Chinese/Japanese; when
    the justext package is absent the default degrades to the custom
    three + ENGLISH (repo list) + ``extra``."""
    from nemo_curator_spark.operators.justext_like import ENGLISH_STOPWORDS

    jt = _justext_stoplists()
    extra = dict(extra or {})
    if languages is None:
        languages = []
    if len(languages) == 0:
        if jt is not None:
            languages = list(jt.get_stoplists())
            languages.remove("Latin")  # low-quality yield (reference comment)
        else:
            languages = ["English", *extra]
        languages.extend(["THAI", "CHINESE", "JAPANESE"])
    out: dict[str, frozenset[str]] = {}
    for language in languages:
        lang_key = LANG_MAP.get(language, language.upper())
        if lang_key in _CUSTOM_KEYS:
            out[lang_key] = _custom_stopwords(lang_key)
        elif jt is not None:
            out[lang_key] = frozenset(jt.get_stoplist(language))
        elif lang_key in extra or language in extra:
            out[lang_key] = frozenset(extra.get(lang_key, extra.get(language)))
        elif lang_key == "ENGLISH":
            out[lang_key] = ENGLISH_STOPWORDS
        else:
            raise LookupError(
                f"No stoplist for {language!r}: the justext package (plug "
                "point) is not installed; pass the list via `extra`."
            )
    return out

"""LLM translation + FAITH evaluation stages, deterministic halves
(reference ``stages/text/experimental/translation/stages/translate.py``,
``evaluation/faith.py``, ``utils/prompt_loader.py``,
``utils/text_utils.py:223-257``).

The LLM call itself is the plug point (injected client, see
``nemo_curator_spark.clients.llm_client``); everything around it is
deterministic and ported with behavioral parity:

* prompt loading (packaged YAML contract in ``operators/prompts/`` —
  the YAML files are verbatim copies of the reference's prompt
  templates, which are the stage's observable contract),
* language-code → display-name resolution (iso639 if importable, else
  a builtin ISO 639-1 table, else the raw code — the reference's
  fallback),
* segment routing: empty → "", non-translatable → passthrough
  (translate.py:222-226 / 310-323),
* the ``〘...〙`` response unwrap (translate.py:424-433, rfind-based),
* FAITH JSON score extraction with a string-aware balanced-brace walk
  (faith.py:61-103, 422-482), the zero-means-not-applicable average
  (faith.py:323-340), and the keep-mask that preserves parse-failed
  and not-scored rows (faith.py:302-321, 485-524).

Spark shape: translation and FAITH scoring run as ONE mapInPandas pass
each — the client ships per worker, partitions supply the concurrency
the reference gets from asyncio (HTTP-bound, so per-row latency hides
behind partition parallelism on a real cluster). The FAITH *threshold*
filter is a pure JVM Column predicate — no Python in that path.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nemo_curator_spark.operators.translation import is_line_translatable

_PROMPT_DIR = Path(__file__).resolve().parent / "prompts"

FAITH_KEYS = [
    "Fluency",
    "Accuracy",
    "Idiomaticity",
    "Terminology",
    "Handling_of_Format",
]

FAITH_SCORE_COLUMNS = [
    "faith_fluency",
    "faith_accuracy",
    "faith_idiomaticity",
    "faith_terminology",
    "faith_handling_of_format",
    "faith_avg",
]

# ISO 639-1 code → English language name (public ISO data; the subset
# the reference pipelines actually target plus the majors). iso639, if
# installed, takes precedence — matching get_language_name's lookup.
ISO_639_1_NAMES = {
    "ar": "Arabic",
    "bg": "Bulgarian",
    "bn": "Bengali",
    "cs": "Czech",
    "da": "Danish",
    "de": "German",
    "el": "Greek",
    "en": "English",
    "es": "Spanish",
    "et": "Estonian",
    "fa": "Persian",
    "fi": "Finnish",
    "fr": "French",
    "he": "Hebrew",
    "hi": "Hindi",
    "hr": "Croatian",
    "hu": "Hungarian",
    "id": "Indonesian",
    "it": "Italian",
    "ja": "Japanese",
    "ko": "Korean",
    "lt": "Lithuanian",
    "lv": "Latvian",
    "ms": "Malay",
    "nl": "Dutch",
    "no": "Norwegian",
    "pl": "Polish",
    "pt": "Portuguese",
    "ro": "Romanian",
    "ru": "Russian",
    "sk": "Slovak",
    "sl": "Slovenian",
    "sv": "Swedish",
    "th": "Thai",
    "tr": "Turkish",
    "uk": "Ukrainian",
    "vi": "Vietnamese",
    "zh": "Chinese",
}


def get_language_name(lang_code: str) -> str:
    """text_utils.py:223-257: iso639 lookup when available, else fall
    back (here: builtin table, then the raw code — the reference warns
    and returns the code when iso639 is absent)."""
    if not lang_code:
        return ""
    try:
        import iso639  # noqa: PLC0415

        lang_ctor = getattr(iso639, "Lang", None)
        if callable(lang_ctor):
            try:
                return lang_ctor(lang_code).name
            except (KeyError, AttributeError, TypeError, ValueError):
                pass
    except ImportError:
        pass
    return ISO_639_1_NAMES.get(lang_code.lower(), lang_code)


def load_prompt_template(filename_or_path) -> tuple[str, str]:
    """prompt_loader.py:26-70, exact: resolve relative names against the
    packaged prompts dir, YAML must be a mapping with ``system`` and
    ``user`` keys."""
    import yaml  # noqa: PLC0415

    prompt_path = Path(filename_or_path)
    if not prompt_path.is_absolute():
        prompt_path = _PROMPT_DIR / prompt_path
    try:
        with open(prompt_path, encoding="utf-8") as fh:
            data = yaml.safe_load(fh)
    except FileNotFoundError as exc:
        msg = f"Prompt template not found: {prompt_path}"
        raise FileNotFoundError(msg) from exc
    except yaml.YAMLError as exc:
        msg = f"Malformed prompt template {prompt_path}: {exc}"
        raise ValueError(msg) from exc
    if not isinstance(data, dict):
        msg = (
            f"Prompt template {prompt_path} must contain a top-level "
            f"mapping, got {type(data).__name__}"
        )
        raise TypeError(msg)
    missing = [k for k in ("system", "user") if k not in data]
    if missing:
        msg = f"Prompt template {prompt_path} is missing required keys: {missing}"
        raise KeyError(msg)
    return data["system"], data["user"]


# ---------------------------------------------------------------------------
# Segment translation (translate.py)
# ---------------------------------------------------------------------------


def unwrap_translation(text: str) -> str:
    """translate.py:424-433, exact: rfind the LAST ``〘``/``〙`` pair;
    unmatched left bracket takes the tail; no bracket returns as-is."""
    left_loc = text.rfind("〘")
    right_loc = text.rfind("〙")
    if left_loc != -1 and right_loc != -1 and left_loc < right_loc:
        return text[left_loc + 1 : right_loc]
    if left_loc != -1:
        return text[left_loc + 1 :]
    return text


def build_translate_messages(
    segment: str,
    source_lang: str,
    target_lang: str,
    system_prompt: str,
    user_template: str,
) -> list[dict]:
    """translate.py:404-418: system verbatim, user template formatted
    with display-language names and the segment."""
    return [
        {"role": "system", "content": system_prompt},
        {
            "role": "user",
            "content": user_template.format(
                source_lang=get_language_name(source_lang),
                target_lang=get_language_name(target_lang),
                src=segment,
            ),
        },
    ]


def translate_segment_py(
    segment,
    client,
    model_name: str,
    source_lang: str,
    target_lang: str,
    system_prompt: str,
    user_template: str,
    generation_config=None,
) -> tuple[str, float, str]:
    """One segment through the reference's routing (translate.py:222-235
    and error handling :248-262): empty → "", non-translatable →
    passthrough (both without a client call), else query + unwrap;
    exceptions become ("", elapsed-not-tracked→0.0, str(err))."""
    seg = "" if segment is None else str(segment)
    if not seg or not seg.strip():
        return "", 0.0, ""
    if not is_line_translatable(seg):
        return seg, 0.0, ""
    messages = build_translate_messages(
        seg, source_lang, target_lang, system_prompt, user_template
    )
    start = time.time()
    try:
        response = client.query_model(
            model=model_name,
            messages=messages,
            generation_config=generation_config,
        )
    except Exception as e:  # noqa: BLE001 — reference gathers exceptions
        return "", 0.0, str(e)
    elapsed = time.time() - start
    return unwrap_translation(response[0] if response else ""), elapsed, ""


def translate_segments(
    df: DataFrame,
    client,
    model_name: str,
    source_lang: str,
    target_lang: str,
    segment_col: str = "_seg_segments",
    prompt_path=None,
    generation_config=None,
    dry_run: bool = False,
) -> DataFrame:
    """SegmentTranslationStage (translate.py:45-208) as one mapInPandas
    pass adding ``_translated``/``_translation_time``/
    ``_translation_error``.

    ``client`` must implement ``query_model(model=, messages=,
    generation_config=) -> list[str]`` (the
    ``nemo_curator_spark.clients.llm_client`` contract); it is pickled
    to workers once. ``dry_run`` skips all client calls and emits empty
    translations (translate.py:172-192).
    """
    system_prompt, user_template = load_prompt_template(
        prompt_path or "translate.yaml"
    )
    fields = list(df.schema.fields) + [
        T.StructField("_translated", T.StringType()),
        T.StructField("_translation_time", T.DoubleType()),
        T.StructField("_translation_error", T.StringType()),
    ]
    out_schema = T.StructType(fields)

    def _run(batches):
        for pdf in batches:
            n = len(pdf)
            if dry_run:
                pdf["_translated"] = [""] * n
                pdf["_translation_time"] = [0.0] * n
                pdf["_translation_error"] = [""] * n
                yield pdf
                continue
            results = [
                translate_segment_py(
                    seg,
                    client,
                    model_name,
                    source_lang,
                    target_lang,
                    system_prompt,
                    user_template,
                    generation_config,
                )
                for seg in pdf[segment_col].tolist()
            ]
            pdf["_translated"] = [r[0] for r in results]
            pdf["_translation_time"] = [r[1] for r in results]
            pdf["_translation_error"] = [r[2] for r in results]
            yield pdf

    return df.mapInPandas(_run, schema=out_schema)


def translate_segments_via_backend_py(
    segments: list,
    backend,
    source_lang: str,
    target_lang: str,
    clock=time.time,
) -> tuple[list[str], list[float], list[str]]:
    """The non-LLM backend path of SegmentTranslationStage
    (translate.py:270-398), exact: empty segments stay "",
    non-translatable pass through, translatable ones go in ONE bulk
    backend call whose elapsed time is split evenly; a bulk failure
    (including a count mismatch) falls back to per-segment requests
    with per-segment error capture."""
    translated = [""] * len(segments)
    timings = [0.0] * len(segments)
    errors = [""] * len(segments)

    translate_indices: list[int] = []
    translate_segments_: list[str] = []
    for idx, seg in enumerate(segments):
        seg = "" if seg is None else str(seg)
        if not seg or not seg.strip():
            continue
        if not is_line_translatable(seg):
            translated[idx] = seg
            continue
        translate_indices.append(idx)
        translate_segments_.append(seg)

    if not translate_segments_:
        return translated, timings, errors

    try:
        start = clock()
        result = backend.translate_batch(
            translate_segments_, source_lang, target_lang
        )
        elapsed = clock() - start
        if len(result) != len(translate_segments_):
            msg = (
                f"Backend returned {len(result)} translations for "
                f"{len(translate_segments_)} segments"
            )
            raise RuntimeError(msg)
    except Exception:  # noqa: BLE001 — bulk failure → per-segment fallback
        pass
    else:
        per_segment_time = elapsed / len(translate_indices)
        for out_idx, text in zip(translate_indices, result):
            translated[out_idx] = text
            timings[out_idx] = per_segment_time
        return translated, timings, errors

    for idx, seg in enumerate(segments):
        seg = "" if seg is None else str(seg)
        if not seg or not seg.strip():
            continue
        if not is_line_translatable(seg):
            translated[idx] = seg
            continue
        start = clock()
        try:
            result = backend.translate_batch([seg], source_lang, target_lang)
            timings[idx] = clock() - start
            translated[idx] = result[0] if result else ""
            errors[idx] = ""
        except Exception as exc:  # noqa: BLE001 — reference captures per row
            timings[idx] = clock() - start
            translated[idx] = ""
            errors[idx] = str(exc)
    return translated, timings, errors


def translate_segments_backend(
    df: DataFrame,
    backend,
    source_lang: str,
    target_lang: str,
    segment_col: str = "_seg_segments",
) -> DataFrame:
    """``translate_segments`` for non-LLM backends
    (``nemo_curator_spark.operators.translation_backends``): one
    mapInPandas pass, the backend pickled per worker, each Arrow batch
    issued as one bulk call (the reference's batch unit)."""
    fields = list(df.schema.fields) + [
        T.StructField("_translated", T.StringType()),
        T.StructField("_translation_time", T.DoubleType()),
        T.StructField("_translation_error", T.StringType()),
    ]
    out_schema = T.StructType(fields)

    def _run(batches):
        for pdf in batches:
            translated, timings, errors = translate_segments_via_backend_py(
                pdf[segment_col].tolist(), backend, source_lang, target_lang
            )
            pdf["_translated"] = translated
            pdf["_translation_time"] = timings
            pdf["_translation_error"] = errors
            yield pdf

    return df.mapInPandas(_run, schema=out_schema)


# ---------------------------------------------------------------------------
# FAITH evaluation (evaluation/faith.py)
# ---------------------------------------------------------------------------


def _json_string_state(ch: str, in_string: bool, escape: bool):
    """faith.py:61-73: returns (in_string, escape, consumed)."""
    if in_string:
        if escape:
            return True, False, True
        if ch == "\\":
            return True, True, True
        if ch == '"':
            return False, False, True
        return True, False, True
    if ch == '"':
        return True, False, True
    return False, False, False


def extract_json_object(text: str):
    """First balanced ``{...}`` outside string literals, supporting
    nesting (faith.py:76-103, 422-444); None when absent/unbalanced."""
    in_string = False
    escape = False
    start = -1
    for idx, ch in enumerate(text):
        in_string, escape, consumed = _json_string_state(ch, in_string, escape)
        if not consumed and ch == "{":
            start = idx
            break
    if start == -1:
        return None
    depth = 0
    in_string = False
    escape = False
    for idx in range(start, len(text)):
        ch = text[idx]
        in_string, escape, consumed = _json_string_state(ch, in_string, escape)
        if consumed:
            continue
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return text[start : idx + 1]
    return None


def extract_faith_scores_from_json(text: str) -> tuple[dict, bool]:
    """faith.py:446-482, exact: parse the balanced object, normalise to
    the five FAITH keys (missing/invalid → 0.0); returns
    (scores, parse_failed)."""
    zero_scores = dict.fromkeys(FAITH_KEYS, 0.0)
    candidate = extract_json_object(text)
    if candidate is None:
        return zero_scores, True
    try:
        scores_dict = json.loads(candidate)
    except (json.JSONDecodeError, ValueError):
        return zero_scores, True
    if not isinstance(scores_dict, dict):
        return zero_scores, True
    normalized = {}
    for key in FAITH_KEYS:
        if key in scores_dict:
            try:
                normalized[key] = float(scores_dict[key])
            except (TypeError, ValueError):
                normalized[key] = 0.0
        else:
            normalized[key] = 0.0
    return normalized, False


def compute_faith_avg(scores: dict) -> float:
    """faith.py:323-340: mean of the scores strictly > 0 ("zero means
    not applicable"); all-zero → 0.0."""
    values = [float(scores.get(k, 0.0)) for k in FAITH_KEYS]
    non_zero = [v for v in values if v > 0]
    if not non_zero:
        return 0.0
    return float(sum(non_zero) / len(non_zero))


def build_faith_messages(
    source_text: str,
    translated_text: str,
    source_lang: str,
    target_lang: str,
    system_prompt: str,
    user_template: str,
) -> list[dict]:
    """faith.py:346-367: both templates format with display-language
    names; the user prompt carries source + translated text."""
    source_language = get_language_name(source_lang)
    target_language = get_language_name(target_lang)
    return [
        {
            "role": "system",
            "content": system_prompt.format(
                source_language=source_language,
                target_language=target_language,
            ),
        },
        {
            "role": "user",
            "content": user_template.format(
                source_language=source_language,
                target_language=target_language,
                source_text=source_text,
                translated_text=translated_text,
            ),
        },
    ]


def faith_eval(
    df: DataFrame,
    client,
    model_name: str,
    source_lang: str,
    target_lang: str,
    source_text_field: str = "text",
    translated_text_field: str = "translated_text",
    threshold: float = 2.5,
    filter_enabled: bool = True,
    prompt_path=None,
    generation_config=None,
) -> DataFrame:
    """FaithEvalFilter (faith.py:106-321) as one mapInPandas scoring
    pass + (optionally) a JVM threshold filter.

    Rows where BOTH text fields are blank skip the client and take zero
    scores with ``faith_parse_failed=False`` (faith.py:241-257); scored
    rows parse the JSON response. When ``filter_enabled``, rows are kept
    iff ``faith_avg >= threshold`` OR parse failed (faith.py:302-321).
    """
    if generation_config is None:
        generation_config = {"temperature": 0.0, "max_tokens": 256}
    system_prompt, user_template = load_prompt_template(
        prompt_path or "faith_eval.yaml"
    )
    fields = list(df.schema.fields) + [
        T.StructField(c, T.DoubleType()) for c in FAITH_SCORE_COLUMNS
    ]
    fields.append(T.StructField("faith_parse_failed", T.BooleanType()))
    out_schema = T.StructType(fields)

    def _run(batches):
        for pdf in batches:
            scores_rows = []
            failed_flags = []
            for src, hyp in zip(
                pdf[source_text_field].tolist(),
                pdf[translated_text_field].tolist(),
            ):
                src_s = "" if src is None else str(src)
                hyp_s = "" if hyp is None else str(hyp)
                if not src_s.strip() and not hyp_s.strip():
                    scores_rows.append(dict.fromkeys(FAITH_KEYS, 0.0))
                    failed_flags.append(False)
                    continue
                messages = build_faith_messages(
                    src_s,
                    hyp_s,
                    source_lang,
                    target_lang,
                    system_prompt,
                    user_template,
                )
                try:
                    response = client.query_model(
                        model=model_name,
                        messages=messages,
                        generation_config=generation_config,
                    )
                    raw = response[0] if response else ""
                except Exception:  # noqa: BLE001 — reference logs + ""
                    raw = ""
                scores, failed = extract_faith_scores_from_json(raw)
                scores_rows.append(scores)
                failed_flags.append(failed)
            pdf["faith_fluency"] = [s["Fluency"] for s in scores_rows]
            pdf["faith_accuracy"] = [s["Accuracy"] for s in scores_rows]
            pdf["faith_idiomaticity"] = [s["Idiomaticity"] for s in scores_rows]
            pdf["faith_terminology"] = [s["Terminology"] for s in scores_rows]
            pdf["faith_handling_of_format"] = [
                s["Handling_of_Format"] for s in scores_rows
            ]
            pdf["faith_avg"] = [compute_faith_avg(s) for s in scores_rows]
            pdf["faith_parse_failed"] = failed_flags
            yield pdf

    scored = df.mapInPandas(_run, schema=out_schema)
    if filter_enabled:
        scored = scored.where(
            (F.col("faith_avg") >= F.lit(float(threshold)))
            | F.col("faith_parse_failed")
        )
    return scored


def faith_avg_col(
    cols: list[str] = FAITH_SCORE_COLUMNS[:5],
) -> "F.Column":
    """``faith_avg`` as a pure JVM Column expression — same
    zero-means-not-applicable semantics as :func:`compute_faith_avg`
    (faith.py:323-340). Adding the zeroed-out dimensions to the sum is
    float-exact (x + 0.0), so this matches the python form bitwise."""
    nz_sum = None
    nz_cnt = None
    for c in cols:
        contrib = F.when(F.col(c) > 0, F.col(c)).otherwise(F.lit(0.0))
        cnt = F.when(F.col(c) > 0, F.lit(1)).otherwise(F.lit(0))
        nz_sum = contrib if nz_sum is None else nz_sum + contrib
        nz_cnt = cnt if nz_cnt is None else nz_cnt + cnt
    return F.when(nz_cnt == 0, F.lit(0.0)).otherwise(
        nz_sum / nz_cnt.cast("double")
    )


def faith_threshold_filter(df: DataFrame, threshold: float = 2.5) -> DataFrame:
    """FaithThresholdFilterStage (faith.py:485-524) as a pure JVM Column
    predicate: keep when ``faith_avg >= threshold`` OR parse failed OR
    (when the column exists) ``faith_segment_scores`` is the not-scored
    sentinel ``"[]"`` after strip."""
    keep = (F.col("faith_avg") >= F.lit(float(threshold))) | F.col(
        "faith_parse_failed"
    )
    if "faith_segment_scores" in df.columns:
        keep = keep | (
            F.trim(F.col("faith_segment_scores").cast("string")) == F.lit("[]")
        )
    return df.where(keep)

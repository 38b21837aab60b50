"""Tests for the LLM translation / FAITH deterministic halves
(translation_llm.py) and the client retry contract (clients/llm_client.py).

Reference pins: translate.py:222-235 routing, :424-433 unwrap;
faith.py:61-103 string-aware JSON walk, :323-340 zero-means-NA average,
:302-321/485-524 keep masks; llm_client.py:119-214 retry policy;
prompt_loader.py:26-70.
"""

from __future__ import annotations

import pytest

from nemo_curator_spark.clients.llm_client import (
    GenerationConfig,
    RetryingLLMClient,
    backoff_delay,
    build_openai_request_kwargs,
    coerce_generation_config,
    is_connection_error,
    is_rate_limit_error,
)
from nemo_curator_spark.operators.translation_llm import (
    FAITH_KEYS,
    build_faith_messages,
    build_translate_messages,
    compute_faith_avg,
    extract_faith_scores_from_json,
    extract_json_object,
    faith_eval,
    faith_threshold_filter,
    get_language_name,
    load_prompt_template,
    translate_segment_py,
    translate_segments,
    unwrap_translation,
)


# --- unwrap (translate.py:424-433) -----------------------------------------


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("〘hola〙", "hola"),
        ("prefix 〘hola〙 suffix", "hola"),
        # rfind: the LAST pair wins
        ("〘a〙 then 〘b〙", "b"),
        # unmatched left bracket takes the tail
        ("text 〘tail only", "tail only"),
        # right before left → rfind left > rfind right → tail branch
        ("〙backwards〘x", "x"),
        ("no brackets", "no brackets"),
        ("", ""),
    ],
)
def test_unwrap_translation(raw, expected):
    assert unwrap_translation(raw) == expected


# --- language names --------------------------------------------------------


def test_get_language_name():
    assert get_language_name("en") == "English"
    assert get_language_name("ZH") == "Chinese"
    assert get_language_name("") == ""
    # unknown code falls back to the raw code (reference behavior)
    assert get_language_name("xx") == "xx"


# --- prompt loader (prompt_loader.py:26-70) --------------------------------


def test_load_prompt_template_packaged():
    system, user = load_prompt_template("translate.yaml")
    assert "translator" in system
    assert "{src}" in user and "{source_lang}" in user and "{target_lang}" in user
    fsystem, fuser = load_prompt_template("faith_eval.yaml")
    assert "FAITH" in fsystem
    assert "{source_text}" in fuser and "{translated_text}" in fuser


def test_load_prompt_template_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_prompt_template("nope.yaml")
    bad = tmp_path / "bad.yaml"
    bad.write_text("- just\n- a list\n")
    with pytest.raises(TypeError):
        load_prompt_template(str(bad))
    missing = tmp_path / "missing.yaml"
    missing.write_text("system: only system\n")
    with pytest.raises(KeyError):
        load_prompt_template(str(missing))


# --- segment routing (translate.py:222-235) --------------------------------


class WrapClient:
    """Echoes the segment back inside 〘〙, recording calls."""

    def __init__(self):
        self.calls = []

    def query_model(self, *, model, messages, generation_config=None):
        self.calls.append(messages)
        src = messages[1]["content"].rsplit("English: ", 1)[-1]
        return [f"respuesta: 〘{src}-es〙"]


class BoomClient:
    def query_model(self, *, model, messages, generation_config=None):
        raise RuntimeError("server exploded")


def _translate(seg, client):
    system, user = load_prompt_template("translate.yaml")
    return translate_segment_py(
        seg, client, "m", "en", "es", system, user
    )


def test_translate_segment_routing():
    client = WrapClient()
    # empty → "" with no client call
    assert _translate("", client) == ("", 0.0, "")
    assert _translate("   ", client) == ("", 0.0, "")
    # non-translatable (no alphabetic char) → passthrough, no call
    assert _translate("12345", client)[0] == "12345"
    # tag-shaped line → passthrough
    assert _translate("<div>", client)[0] == "<div>"
    assert client.calls == []
    # translatable → unwrapped client response
    text, elapsed, err = _translate("hello world", client)
    assert text == "hello world-es"
    assert err == "" and elapsed >= 0.0
    assert len(client.calls) == 1
    # errors captured per segment, not raised (translate.py:248-257)
    text, _, err = _translate("hello", BoomClient())
    assert text == "" and "server exploded" in err


def test_build_translate_messages_uses_language_names():
    msgs = build_translate_messages("hi", "en", "de", "SYS", "{source_lang}->{target_lang}: {src}")
    assert msgs[0] == {"role": "system", "content": "SYS"}
    assert msgs[1]["content"] == "English->German: hi"


def test_translate_segments_spark(spark):
    df = spark.createDataFrame(
        [("a", "hello world"), ("b", "4711"), ("c", "")],
        ["id", "_seg_segments"],
    )
    out = translate_segments(df, WrapClient(), "m", "en", "es").orderBy("id")
    rows = out.collect()
    assert [r["_translated"] for r in rows] == ["hello world-es", "4711", ""]
    assert all(r["_translation_error"] == "" for r in rows)
    dry = translate_segments(df, WrapClient(), "m", "en", "es", dry_run=True)
    assert [r["_translated"] for r in dry.collect()] == ["", "", ""]


# --- FAITH JSON extraction (faith.py:61-103, 422-482) ----------------------


def test_extract_json_object_string_aware():
    # brace inside a string literal does not anchor the scan
    text = 'message: "{pre}" scores: {"Fluency": 4}'
    assert extract_json_object(text) == '{"Fluency": 4}'
    # nested objects are balanced
    text = 'x {"scores": {"Fluency": 4}} tail'
    assert extract_json_object(text) == '{"scores": {"Fluency": 4}}'
    # escaped quote inside string
    text = '{"a": "q\\"{", "b": 1}'
    assert extract_json_object(text) == text
    assert extract_json_object("no object here") is None
    assert extract_json_object("{unbalanced") is None


def test_extract_faith_scores():
    scores, failed = extract_faith_scores_from_json(
        'ok {"Fluency": 4, "Accuracy": "5", "Terminology": "bad"} end'
    )
    assert not failed
    assert scores["Fluency"] == 4.0
    assert scores["Accuracy"] == 5.0  # numeric string coerces
    assert scores["Terminology"] == 0.0  # invalid → 0.0
    assert scores["Idiomaticity"] == 0.0  # missing → 0.0
    # no JSON → zero scores + parse_failed
    scores, failed = extract_faith_scores_from_json("nothing")
    assert failed and all(scores[k] == 0.0 for k in FAITH_KEYS)
    # non-dict JSON → failed
    _, failed = extract_faith_scores_from_json("[1, 2]")
    assert failed


def test_compute_faith_avg_zero_means_na():
    assert compute_faith_avg(
        {"Fluency": 4, "Accuracy": 4, "Idiomaticity": 0, "Terminology": 0, "Handling_of_Format": 4}
    ) == 4.0
    assert compute_faith_avg(dict.fromkeys(FAITH_KEYS, 0.0)) == 0.0
    assert compute_faith_avg({"Fluency": 3}) == 3.0


def test_build_faith_messages():
    msgs = build_faith_messages(
        "src", "hyp", "en", "zh",
        "{source_language}->{target_language}", "{source_text}|{translated_text}",
    )
    assert msgs[0]["content"] == "English->Chinese"
    assert msgs[1]["content"] == "src|hyp"


class FaithScoreClient:
    """Scores by length parity: even-length translations get 4s, odd 1s,
    'garbled' rows produce unparseable output."""

    def query_model(self, *, model, messages, generation_config=None):
        hyp = messages[1]["content"].split("Translated text", 1)[-1]
        if "garbled" in hyp:
            return ["not json at all"]
        score = 4 if "good" in hyp else 1
        return [
            '{"Fluency": %d, "Accuracy": %d, "Idiomaticity": %d, '
            '"Terminology": 0, "Handling_of_Format": %d}' % (score, score, score, score)
        ]


def test_faith_eval_spark(spark):
    df = spark.createDataFrame(
        [
            ("a", "source one", "good translation"),
            ("b", "source two", "bad one"),
            ("c", "source three", "garbled output"),
            ("d", "", ""),  # both blank → skipped, zero scores, not failed
        ],
        ["id", "text", "translated_text"],
    )
    scored = faith_eval(
        df, FaithScoreClient(), "m", "en", "es", filter_enabled=False
    ).orderBy("id")
    rows = {r["id"]: r for r in scored.collect()}
    assert rows["a"]["faith_avg"] == 4.0  # zero Terminology excluded
    assert rows["b"]["faith_avg"] == 1.0
    assert rows["c"]["faith_parse_failed"] and rows["c"]["faith_avg"] == 0.0
    assert not rows["d"]["faith_parse_failed"] and rows["d"]["faith_avg"] == 0.0
    # filter keeps >= threshold OR parse-failed (faith.py:302-321)
    kept = faith_eval(
        df, FaithScoreClient(), "m", "en", "es", threshold=2.5
    )
    assert sorted(r["id"] for r in kept.collect()) == ["a", "c"]


def test_faith_threshold_filter(spark):
    df = spark.createDataFrame(
        [
            ("a", 3.0, False, "[1]"),
            ("b", 1.0, False, "[1]"),
            ("c", 1.0, True, "[1]"),
            ("d", 0.0, False, "[]"),  # not-scored sentinel preserved
        ],
        ["id", "faith_avg", "faith_parse_failed", "faith_segment_scores"],
    )
    kept = sorted(r["id"] for r in faith_threshold_filter(df, 2.5).collect())
    assert kept == ["a", "c", "d"]
    # without the segment-scores column the sentinel clause is absent
    kept2 = sorted(
        r["id"]
        for r in faith_threshold_filter(
            df.drop("faith_segment_scores"), 2.5
        ).collect()
    )
    assert kept2 == ["a", "c"]


# --- client retry policy (llm_client.py:119-214) ---------------------------


def test_error_classification():
    assert is_rate_limit_error(RuntimeError("HTTP 429 too many"))
    assert is_rate_limit_error(RuntimeError("Rate limited"))
    assert not is_rate_limit_error(RuntimeError("bad request"))
    assert is_connection_error(RuntimeError("Connection refused"))
    assert is_connection_error(RuntimeError("httpx.ReadError: boom"))
    assert is_connection_error(RuntimeError("APIConnectionError"))
    assert not is_connection_error(RuntimeError("invalid json"))


def test_backoff_delay_schedule():
    assert backoff_delay(1, 1.0) == 1.0
    assert backoff_delay(2, 1.0) == 2.0
    assert backoff_delay(3, 1.0) == 4.0
    assert backoff_delay(2, 0.5, jitter=0.25) == 1.25


class FlakyClient(RetryingLLMClient):
    def __init__(self, failures, error, **kw):
        super().__init__(**kw)
        self.failures = failures
        self.error = error
        self.attempts = 0

    def setup(self):
        pass

    def _query_model_impl(self, *, messages, model, conversation_formatter=None, generation_config=None):
        self.attempts += 1
        if self.attempts <= self.failures:
            raise RuntimeError(self.error)
        return ["ok"]


def test_retrying_client_retries_rate_limits():
    sleeps = []
    c = FlakyClient(2, "429 rate limit", max_retries=3, base_delay=1.0, sleep_fn=sleeps.append)
    assert c.query_model(messages=[], model="m") == ["ok"]
    assert c.attempts == 3
    assert sleeps == [1.0, 2.0]  # exponential schedule


def test_retrying_client_raises_non_retryable():
    c = FlakyClient(5, "invalid request", max_retries=3, sleep_fn=lambda _: None)
    with pytest.raises(RuntimeError, match="invalid request"):
        c.query_model(messages=[], model="m")
    # one real attempt + the classification raise on the first retry
    assert c.attempts == 1


def test_retrying_client_exhausts_retries():
    c = FlakyClient(10, "connection reset", max_retries=2, sleep_fn=lambda _: None)
    with pytest.raises(RuntimeError, match="connection reset"):
        c.query_model(messages=[], model="m")
    assert c.attempts == 3  # max_retries + 1 attempts


# --- config + openai kwargs ------------------------------------------------


def test_generation_config_defaults_and_coerce():
    cfg = coerce_generation_config(None)
    assert (cfg.max_tokens, cfg.n, cfg.seed, cfg.temperature, cfg.top_p) == (
        2048, 1, 0, 0.0, 0.95,
    )
    cfg2 = coerce_generation_config({"temperature": 0.7, "max_tokens": 16})
    assert cfg2.temperature == 0.7 and cfg2.max_tokens == 16
    assert coerce_generation_config(cfg2) is cfg2


def test_build_openai_request_kwargs():
    kwargs = build_openai_request_kwargs(
        [{"role": "user", "content": "hi"}],
        "model-x",
        GenerationConfig(extra_kwargs={"logprobs": True, "temperature": 0.9}),
        timeout=60,
    )
    assert kwargs["model"] == "model-x"
    assert kwargs["timeout"] == 60
    assert kwargs["logprobs"] is True
    # extra_kwargs overwrite base keys (openai_client.py:72-76)
    assert kwargs["temperature"] == 0.9
    assert "top_k" not in kwargs

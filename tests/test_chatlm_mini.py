"""MiniChatLM + MiniChatClient (operators/chatlm_mini.py vs reference
models/client/llm_client.py:51-214 + openai_client.py:24-86).

Pins: save/load bit-exactness, held-out greedy next-word agreement
with the grammar's argmax successor (real inference, well above the
1/48 chance floor), generation determinism + sliding-window behavior,
the GenerationConfig contract (max_tokens / stop / n), the retry
policy through the client, prompt formatting (role tokens, formatter
path), and the Spark `llm_complete` stage (two-pass bit-identity,
exchange-free plan).
"""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.clients.llm_client import GenerationConfig
from nemo_curator_spark.operators import chatlm_mini as CM


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("chatlm") / "chat.mini.json")
    CM.ensure_artifact(path)
    return CM.load_cached(path), path


def test_save_load_bit_exact(model, tmp_path):
    m, _ = model
    p2 = str(tmp_path / "again.json")
    m.save(p2)
    m2 = CM.MiniChatLM.load(p2)
    ids = [CM.BOS, CM.N_SPECIALS + 3, CM.N_SPECIALS + 17]
    assert np.array_equal(m.next_logits(ids), m2.next_logits(ids))


def test_grammar_agreement_heldout(model):
    """Real inference: for single-word prompts the greedy next word
    must match the grammar's argmax successor for nearly all words —
    chance is 1/len(VOCAB)."""
    m, _ = model
    succ = CM.grammar_successors()
    hits = 0
    for w, cands in succ.items():
        if m.greedy_next([CM.BOS, w]) == cands[0]:
            hits += 1
    assert hits / len(succ) >= 0.85  # measured 0.896 for the shipped config


def test_context_changes_continuation(model):
    """The continuation is prompt-dependent (not a constant string)."""
    m, _ = model
    outs = {
        tuple(m.generate([CM.BOS, w], max_new_tokens=6))
        for w in list(CM.grammar_successors())[:8]
    }
    assert len(outs) > 4


def test_generation_deterministic_and_windowed(model):
    m, _ = model
    prompt = [CM.BOS] + [CM.N_SPECIALS + (i % len(CM.WORDS)) for i in range(150)]
    a = m.generate(prompt, max_new_tokens=10)
    b = m.generate(prompt, max_new_tokens=10)
    assert a == b and len(a) <= 10
    # sliding window: only the last max_len tokens matter
    c = m.generate(prompt[-m.max_len:], max_new_tokens=10)
    assert a == c


def test_client_contract(model):
    _, path = model
    client = CM.MiniChatClient(path)
    msgs = [{"role": "user", "content": "the data model text"}]
    out = client.query_model(messages=msgs, model="mini-chat-lm")
    assert isinstance(out, list) and len(out) == 1
    assert isinstance(out[0], str)
    # n replicas are identical (greedy)
    out3 = client.query_model(
        messages=msgs, model="m", generation_config={"n": 3, "max_tokens": 8}
    )
    assert out3 == [out3[0]] * 3
    # max_tokens caps the word count
    capped = client.query_model(
        messages=msgs, model="m", generation_config={"max_tokens": 2}
    )
    assert len(capped[0].split()) <= 2


def test_client_stop_words(model):
    _, path = model
    client = CM.MiniChatClient(path)
    msgs = [{"role": "user", "content": "the data model text"}]
    base = client.query_model(
        messages=msgs, model="m", generation_config={"max_tokens": 12}
    )[0].split()
    if len(base) > 1:
        stopped = client.query_model(
            messages=msgs,
            model="m",
            generation_config={"max_tokens": 12, "stop": base[1]},
        )[0].split()
        assert base[1] not in stopped
        assert stopped == base[: base.index(base[1])]


def test_client_formatter_path(model):
    _, path = model

    class Joiner:
        def format_conversation(self, conv):
            return " ".join(m["content"] for m in conv)

    client = CM.MiniChatClient(path)
    msgs = [{"role": "user", "content": "the data"}]
    ids = client.format_prompt_ids(msgs, Joiner())
    assert ids[0] == CM.BOS and CM.USER not in ids
    ids2 = client.format_prompt_ids(msgs, None)
    assert CM.USER in ids2 and ids2[-1] == CM.ASSISTANT


def test_client_retry_policy(model):
    """Rate-limit-shaped errors retry with the reference backoff;
    other errors raise immediately (llm_client.py:150-176)."""
    _, path = model
    sleeps: list[float] = []

    class Flaky(CM.MiniChatClient):
        def __init__(self, path):
            super().__init__(path, sleep_fn=sleeps.append)
            self.calls = 0

        def _query_model_impl(self, **kw):
            self.calls += 1
            if self.calls < 3:
                raise RuntimeError("429 rate limit")
            return super()._query_model_impl(**kw)

    c = Flaky(path)
    out = c.query_model(
        messages=[{"role": "user", "content": "the data"}], model="m"
    )
    assert c.calls == 3 and len(sleeps) == 2
    assert isinstance(out[0], str)

    class Broken(CM.MiniChatClient):
        def _query_model_impl(self, **kw):
            raise ValueError("schema error")

    with pytest.raises(ValueError):
        Broken(path).query_model(messages=[], model="m")


def test_tokenize_ascii_casefold():
    # İ must NOT expand into ascii i (CLAUDE.md casefold rule)
    toks = CM.tokenize_words("The İstanbul DATAmodel")
    assert toks[0] == "the" and toks[-1] == "model"
    assert "İstanbul".translate(CM._ASCII_LOWER) == toks[1]
    assert CM.tokenize_words("") == []


def test_spark_llm_complete(spark, model, tmp_path):
    _, path = model
    df = spark.createDataFrame(
        [(i, "the data model text word line page site user time") for i in range(20)],
        "doc_id long, text string",
    )
    out = CM.llm_complete(df, path, max_tokens=8)
    rows1 = {r["doc_id"]: r["completion"] for r in out.collect()}
    rows2 = {r["doc_id"]: r["completion"] for r in out.collect()}
    assert rows1 == rows2 and len(rows1) == 20
    # exchange-free plan: one mapInPandas over the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_translation_stage_with_real_llm(spark, model):
    """SegmentTranslationStage end-to-end with REAL generative
    inference: MiniChatClient behind translate_segments. Routing
    (empty/non-translatable passthrough) is preserved, translated rows
    are deterministic across two Spark passes, and no row errors."""
    from nemo_curator_spark.operators import translation_llm as TL

    _, path = model
    client = CM.MiniChatClient(path)
    df = spark.createDataFrame(
        [
            (0, "the data model text word line"),
            (1, ""),            # empty -> ""
            (2, "12345"),       # non-translatable -> passthrough
            (3, "good new long great small large"),
        ],
        "doc_id long, _seg_segments string",
    )
    out = TL.translate_segments(
        df, client, "mini-chat-lm", "en", "es",
        generation_config={"max_tokens": 8},
    )
    take = lambda: {
        r["doc_id"]: (r["_translated"], r["_translation_error"])
        for r in out.collect()
    }
    r1, r2 = take(), take()
    assert r1 == r2
    assert r1[1][0] == "" and r1[2][0] == "12345"
    assert r1[0][0] and r1[3][0]          # real generated, nonempty
    assert all(err == "" for _, err in r1.values())


def test_caption_enhancement_with_real_llm(spark, model):
    """CaptionEnhancementStage with REAL generative inference through
    the generate_batch adapter (tuple-shaped items)."""
    from nemo_curator_spark.operators import caption_prep as CP

    _, path = model
    df = spark.createDataFrame(
        [(0, "the data model"), (1, None), (2, "good new long")],
        "id long, caption string",
    )
    out = CP.caption_enhancement(
        df, llm_client=CM.MiniGenerateBatch(path, max_tokens=6)
    )
    r1 = {r["id"]: r["enhanced_caption"] for r in out.collect()}
    r2 = {r["id"]: r["enhanced_caption"] for r in out.collect()}
    assert r1 == r2
    assert set(r1) == {0, 2}          # NULL caption dropped (reference)
    assert all(v for v in r1.values())


def test_synthetic_stage_with_real_llm(spark, model):
    """Nemotron-CC SyntheticStage with REAL inference (message-list
    items via a picklable client factory)."""
    from nemo_curator_spark.operators import synthetic as SY

    _, path = model

    def factory(p=path):
        return CM.MiniGenerateBatch(p, max_tokens=6)

    stage = SY.SyntheticStage(
        prompt_template="rewrite the document {document}",
        client_factory=factory,
    )
    df = spark.createDataFrame(
        [(0, "the data model text"), (1, "good new long great")],
        "id long, text string",
    )
    r1 = {r["id"]: r["generated"] for r in stage.apply(df).collect()}
    r2 = {r["id"]: r["generated"] for r in stage.apply(df).collect()}
    assert r1 == r2 and all(r1.values())


def test_data_designer_llm_column_with_real_llm(spark, model):
    """Data-designer LLM-text column with REAL inference (plain-string
    prompts + the optional system_prompt positional)."""
    from nemo_curator_spark.operators import data_designer as DD

    _, path = model
    b = DD.DataDesignerConfigBuilder()
    b.add_column(DD.LLMTextColumnConfig(
        name="llm_out", prompt="make a line for {{ text }}",
        system_prompt="the site user",
    ))
    stage = DD.DataDesignerStage(
        config_builder=b, llm_client=CM.MiniGenerateBatch(path, max_tokens=6)
    )
    df = spark.createDataFrame(
        [(0, "the data"), (1, "good new")], "id long, text string"
    )
    r1 = {r["id"]: r["llm_out"] for r in stage.apply(df, "id").collect()}
    r2 = {r["id"]: r["llm_out"] for r in stage.apply(df, "id").collect()}
    assert r1 == r2 and all(r1.values())


def test_translation_pipeline_composite_real_llm(spark, model):
    """The FULL TranslationPipeline composite (skip -> segment ->
    translate -> reassemble -> doc aggregates) on REAL MiniChatLM
    inference — no echo stand-in anywhere in the path. Deterministic
    across two runs; passthrough and translated branches both exercised."""
    from nemo_curator_spark.pipeline.translation_pipeline import (
        TranslationPipeline,
    )

    _, path = model
    pipe = TranslationPipeline(
        source_lang="en",
        target_lang="es",
        client=CM.MiniChatClient(path),
        model_name="mini-chat-lm",
        output_mode="raw",
        generation_config={"max_tokens": 8},
    )
    df = spark.createDataFrame(
        [
            (0, "the data model text.\ngood new long great."),
            (1, "12345"),          # non-translatable -> passthrough
            (2, "the site user time"),
        ],
        "doc_id long, text string",
    )
    r1 = {r.doc_id: r.translated_text for r in pipe.run(df).collect()}
    r2 = {r.doc_id: r.translated_text for r in pipe.run(df).collect()}
    assert r1 == r2
    assert r1[1] == "12345"
    assert r1[0] and r1[2]        # real generated translations, nonempty

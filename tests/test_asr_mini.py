"""MiniASR + ASR stage glue (operators/{asr_mini,asr_stage}.py vs
reference stages/audio/inference/asr/{stage,asr_nemo}.py +
models/asr/base.py).

Pins: save/load bit-exactness, held-out utterance accuracy (real
inference), greedy-CTC decode semantics, the verbatim language table
(byte-compared against the reference source), waveform prep, the
run_inference routing matrix, assemble note/_skipme semantics, the
NeMo output unwrapping, and the Spark form.
"""

from __future__ import annotations

import ast
from types import SimpleNamespace

import numpy as np
import pytest

from nemo_curator_spark.operators import asr_mini as AM
from nemo_curator_spark.operators import asr_stage as AS


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("asr") / "asr.mini.json")
    AM.ensure_artifact(path)
    return AM.load_cached(path), path


def test_save_load_bit_exact(model, tmp_path):
    m, _ = model
    p2 = str(tmp_path / "again.json")
    m.save(p2)
    m2 = AM.MiniASR.load(p2)
    wav, _, _ = AM.synth_utterance(3)
    assert np.array_equal(m.frame_token_ids(wav), m2.frame_token_ids(wav))


def test_heldout_exact_match(model):
    m, _ = model
    ok = 0
    for seed in range(9000, 9040):  # never in training (seed*10000+i)
        wav, text, _ = AM.synth_utterance(seed)
        ok += int(m.transcribe(wav) == text)
    assert ok / 40 >= 0.9, ok


def test_greedy_ctc_decode():
    # collapse repeats, drop blanks; repeated word separated by blank
    # is emitted twice (the published best-path rule)
    ids = np.array([0, 1, 1, 0, 0, 2, 2, 2, 1, 0, 1, 1])
    assert AM.decode_ids(ids) == "alpha bravo alpha alpha"
    assert AM.decode_ids(np.array([0, 0])) == ""


def test_lang_table_verbatim_vs_reference():
    # byte-compare the dict literal against the reference source (the
    # character-table lesson: diff programmatically, never by eye)
    src = open(
        "/root/reference/nemo_curator/stages/audio/inference/asr/stage.py"
    ).read()
    start = src.index("_LANG_CODE_TO_NAME: dict[str, str] = {")
    lit = src[src.index("{", start): src.index("}", start) + 1]
    assert ast.literal_eval(lit) == AS.LANG_CODE_TO_NAME


def test_language_resolution():
    assert AS.resolve_language({"source_lang": " EN "}) == "English"
    assert AS.resolve_language({"source_lang": "xx"}) == "xx"  # passthrough
    assert AS.resolve_language({}, default_language="De") == "German"
    assert AS.resolve_language({}) is None
    assert AS.normalise_supported_language_codes(" en, FR ,,") == {"en", "fr"}
    assert AS.normalise_supported_language_codes(["", "  "]) is None
    assert AS.normalise_supported_language_codes(None) is None
    assert AS.is_language_supported({"language_code": "EN"}, {"en"})
    assert not AS.is_language_supported({"language_code": ""}, {"en"})
    assert AS.is_language_supported({}, None)


def test_prepare_waveform():
    stereo = np.stack([np.ones(8), np.zeros(8)])
    mono = AS.prepare_waveform(stereo, 16000)
    assert mono.dtype == np.float32 and mono.shape == (8,)
    assert np.allclose(mono, 0.5)
    with pytest.raises(ValueError):
        AS.prepare_waveform(np.zeros((2, 2, 2)), 16000)
    with pytest.raises(ValueError):
        AS.prepare_waveform(np.zeros(4), 0)
    res = AS.prepare_waveform(np.arange(8, dtype=np.float32), 8000,
                              target_sample_rate=16000)
    assert res.shape == (16,)


def test_run_inference_routing(model):
    _, path = model
    adapter = AS.MiniASRAdapter(weights_path=path)
    wav, text, _ = AM.synth_utterance(9001)
    items = [
        {"waveform": wav, "sample_rate": AM.SR,
         "language": "English", "language_code": "en", "task_id": "a"},
        {"waveform": wav, "sample_rate": AM.SR,
         "language": None, "language_code": "zz", "task_id": "b"},
        {"waveform": wav, "sample_rate": AM.SR,
         "language": None, "language_code": "", "task_id": "c"},
        {"audio_filepath": "/nope.wav",
         "language": "English", "language_code": "en", "task_id": "d"},
    ]

    def broken_load(_path):
        raise OSError("no such file")

    results = AS.run_inference(items, adapter, {"en"}, load_audio=broken_load)
    assert results[0].text == text and not results[0].skipped
    assert results[1].skipped and results[1].skip_reason == "language_not_supported"
    assert results[1].unsupported_language == "zz"
    assert results[2].skipped and results[2].skip_reason == "language_missing"
    assert results[3].skipped and results[3].skip_reason == "audio_load_error"


def test_assemble_notes_and_skipme():
    entries = [{}, {}, {}]
    items = [
        {"language_code": "en"},
        {"language_code": "zz"},
        {"language_code": None},
    ]
    results = [
        AS.ASRResult(text="hello"),
        AS.ASRResult(text="", skipped=True,
                     skip_reason="language_not_supported",
                     unsupported_language="zz"),
        AS.ASRResult(text="", skipped=True, skip_reason=None),
    ]
    n = AS.assemble(entries, items, results, supported={"en"})
    assert n == 2
    assert entries[0] == {"pred_text": "hello"}
    assert entries[1]["_skipme"] == "language_not_supported"
    assert entries[1]["additional_notes"]["pred_text"] == "lang_not_supported:zz"
    assert entries[2]["_skipme"] == "empty_audio"  # the fallback reason
    assert entries[2]["additional_notes"]["pred_text"] == "language_missing"


def test_partition_and_unwrap():
    entries = [{"pred_text": "done"}, {"pred_text": ""}, {}]
    todo, skipped = AS.partition_inference_tasks(entries, "pred_text", True)
    assert len(todo) == 2 and skipped == 1
    todo, skipped = AS.partition_inference_tasks(entries, "pred_text", False)
    assert len(todo) == 3 and skipped == 0

    t = SimpleNamespace(text="x")
    assert AS.unwrap_transcribe_outputs(([t], "extra")) == ["x"]
    assert AS.unwrap_transcribe_outputs([[t], [t]]) == ["x", "x"]
    assert AS.unwrap_transcribe_outputs([["raw"], ["s2"]]) == ["raw", "s2"]
    assert AS.unwrap_transcribe_outputs([t, t]) == ["x", "x"]


def test_spark_transcribe_rows(spark, model):
    m, path = model
    df = spark.createDataFrame([(9000,), (9003,)], "doc_id long")
    got = {
        r["doc_id"]: r["pred_text"]
        for r in AS.asr_transcribe_rows(df, path).collect()
    }
    for d in (9000, 9003):
        wav, _, _ = AM.synth_utterance(d)
        assert got[d] == m.transcribe(wav)

"""QwenOmni ASR adapter halves (operators/qwen_omni_asr.py vs reference
models/asr/qwen_omni.py)."""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

from nemo_curator_spark.operators import qwen_omni_asr as QO


def _out(text):
    return SimpleNamespace(outputs=[SimpleNamespace(text=text)])


def test_config_contract(tmp_path):
    with pytest.raises(ValueError):
        QO.QwenOmniASRAdapter(max_output_tokens=0)
    with pytest.raises(ValueError):
        QO.QwenOmniASRAdapter(prompt_content_order="audio_only")
    with pytest.raises(ValueError):
        QO.QwenOmniASRAdapter(vllm_kwargs={"model": "x"})
    with pytest.raises(ValueError):
        QO.QwenOmniASRAdapter(sampling_kwargs={"max_tokens": 5})
    with pytest.raises(FileNotFoundError):
        QO.QwenOmniASRAdapter(prompt_file=str(tmp_path / "missing.txt"))
    pf = tmp_path / "p.txt"
    pf.write_text("  From file {language} \n")
    a = QO.QwenOmniASRAdapter(prompt_text="inline", prompt_file=str(pf))
    assert a.prompt_text == "From file {language}"  # file wins, stripped
    assert QO.default_sampling_kwargs() == {
        "temperature": 0.0, "top_k": 1, "repetition_penalty": 1.0,
    }
    assert QO.default_vllm_kwargs()["limit_mm_per_prompt"] == {
        "image": 0, "video": 0, "audio": 2,
    }


def test_prompt_resolution_and_messages():
    a = QO.QwenOmniASRAdapter(
        prompt_text="Transcribe in {language}.",
        en_prompt_text="English fast path",
        system_prompt="sys {language}",
        prompt_content_order="audio_text",
    )
    wav = np.ones(QO.MIN_QWEN_AUDIO_SAMPLES)
    msgs = a.build_messages(wav, "German")
    assert msgs[0]["role"] == "system"
    assert msgs[0]["content"][0]["text"] == "sys German"
    content = msgs[1]["content"]
    assert content[0]["type"] == "audio"  # audio_text order
    assert content[1]["text"] == "Transcribe in German."
    # English override wins
    msgs_en = a.build_messages(wav, "English")
    assert msgs_en[1]["content"][1]["text"] == "English fast path"
    # default order is text first
    b = QO.QwenOmniASRAdapter()
    assert b.build_messages(wav)[0]["content"][0]["type"] == "text"


def test_transcribe_batch_routing():
    calls = {}

    def fake_generate(inputs):
        calls["n"] = len(inputs)
        return [_out(" hello "), _out("")]  # second output empty

    a = QO.QwenOmniASRAdapter(generate=fake_generate)
    items = [
        {"waveform": np.ones(QO.MIN_QWEN_AUDIO_SAMPLES), "sample_rate": 16000},
        {"waveform": np.ones(QO.MIN_QWEN_AUDIO_SAMPLES), "sample_rate": 16000},
        {"waveform": np.ones(10), "sample_rate": 16000},  # too short
        {"waveform": np.zeros(0), "sample_rate": 16000},  # empty
    ]
    results = a.transcribe_batch(items)
    assert calls["n"] == 2  # only the valid two reach the engine
    assert results[0].text == "hello" and not results[0].skipped
    assert results[1].text == "" and results[1].skipped  # empty output skips
    assert results[2].skipped and results[3].skipped
    assert a.transcribe_batch([]) == []
    with pytest.raises(ValueError):
        a.transcribe_batch([{"waveform": np.ones(5), "sample_rate": 8000}])


def test_generate_contract_violation():
    a = QO.QwenOmniASRAdapter(generate=lambda inputs: [])
    with pytest.raises(RuntimeError):
        a.transcribe_batch(
            [{"waveform": np.ones(QO.MIN_QWEN_AUDIO_SAMPLES),
              "sample_rate": 16000}]
        )


def test_plug_points_raise_with_guidance():
    a = QO.QwenOmniASRAdapter()
    with pytest.raises(NotImplementedError):
        a.load_model(num_gpus=1)
    with pytest.raises(ValueError):
        a.load_model(num_gpus=0)
    with pytest.raises(NotImplementedError):
        QO.QwenOmniASRAdapter.download_weights_on_node("m")

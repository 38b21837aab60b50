"""Qwen3-Omni ASR adapter, deterministic halves (reference
``models/asr/qwen_omni.py``), Spark-first.

The vLLM engine, the Qwen3OmniMoeProcessor chat-template renderer and
the model weights are environment-gated plug points (``generate`` and
``pack_inputs`` are injectable); everything around them is
exact-ported:

* config contract (``__post_init__``, qwen_omni.py:141-166): prompt /
  en-prompt / system-prompt text-or-file loading (files win, stripped
  UTF-8, missing file raises), positive ``max_output_tokens``,
  ``prompt_content_order`` whitelist, reserved-kwarg rejection
  (stage-owned vllm kwargs, adapter-owned ``max_tokens``);
* default engine/sampling kwargs tables (:76-99, verbatim);
* prompt resolution (:280-289): ``{language}`` interpolation, the
  English-specific override;
* message building (:291-306): optional system message, user content
  as text/audio blocks in the configured order;
* per-item gating (:332-349): empty and too-short (< 1600 samples)
  waveforms skip with a warning, preprocessing failures skip;
* batch routing (:366-420): prepare -> valid-index scatter ->
  strict 1:1 output zip -> empty-output skip set; ``transcribe_batch``
  (:252-276) enforces the 16 kHz contract and wraps results as
  ``ASRResult`` preserving order.
"""

from __future__ import annotations

from copy import deepcopy
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import numpy as np

from nemo_curator_spark.operators.asr_stage import ASRResult

QWEN3_OMNI_MODEL_ID = "Qwen/Qwen3-Omni-30B-A3B-Instruct"
QWEN_OMNI_SAMPLE_RATE = 16000
MIN_QWEN_AUDIO_SAMPLES = 1600  # 0.1 s at 16 kHz (qwen_omni.py:49)
_PROMPT_CONTENT_ORDERS = frozenset({"text_audio", "audio_text"})
_RESERVED_VLLM_KWARGS = frozenset({"model", "revision", "tensor_parallel_size"})


def default_vllm_kwargs() -> dict[str, Any]:
    """qwen_omni.py:76-89, verbatim."""
    return {
        "max_model_len": 32768,
        "max_num_seqs": 8,
        "gpu_memory_utilization": 0.9,
        "limit_mm_per_prompt": {"image": 0, "video": 0, "audio": 2},
    }


def default_sampling_kwargs() -> dict[str, Any]:
    """qwen_omni.py:92-99, verbatim."""
    return {
        "temperature": 0.0,
        "top_k": 1,
        "repetition_penalty": 1.0,
    }


@dataclass
class QwenOmniASRAdapter:
    """Deterministic-half port; inject ``generate(inputs) -> [output]``
    (the vLLM seam — each output exposes ``.outputs[0].text``) and
    optionally ``pack_inputs(messages) -> dict`` (the processor seam;
    defaults to passing the messages through, since the chat-template
    rendering is model-owned)."""

    model_id: str = QWEN3_OMNI_MODEL_ID
    revision: str | None = None

    prompt_text: str = "Transcribe the audio."
    prompt_file: str | None = None
    en_prompt_text: str | None = None
    en_prompt_file: str | None = None
    system_prompt: str | None = None
    system_prompt_file: str | None = None
    prompt_content_order: str = "text_audio"
    max_output_tokens: int = 256
    vllm_kwargs: dict[str, Any] = field(default_factory=default_vllm_kwargs)
    sampling_kwargs: dict[str, Any] = field(default_factory=default_sampling_kwargs)

    generate: Any = None  # injectable vLLM seam
    pack_inputs: Any = None  # injectable processor seam

    def __post_init__(self) -> None:
        self.prompt_text = self._load_text(self.prompt_text, self.prompt_file) or ""
        self.en_prompt_text = self._load_text(self.en_prompt_text, self.en_prompt_file)
        self.system_prompt = self._load_text(self.system_prompt, self.system_prompt_file)

        if self.max_output_tokens <= 0:
            msg = "max_output_tokens must be positive"
            raise ValueError(msg)
        if self.prompt_content_order not in _PROMPT_CONTENT_ORDERS:
            msg = (
                "prompt_content_order must be one of "
                f"{sorted(_PROMPT_CONTENT_ORDERS)}, got {self.prompt_content_order!r}"
            )
            raise ValueError(msg)
        self.vllm_kwargs = deepcopy(dict(self.vllm_kwargs))
        self.sampling_kwargs = deepcopy(dict(self.sampling_kwargs))
        reserved = sorted(_RESERVED_VLLM_KWARGS.intersection(self.vllm_kwargs))
        if reserved:
            msg = f"vllm_kwargs cannot override stage-owned arguments: {', '.join(reserved)}"
            raise ValueError(msg)
        if "max_tokens" in self.sampling_kwargs:
            msg = "sampling_kwargs cannot override adapter-owned max_tokens; use max_output_tokens"
            raise ValueError(msg)

    @staticmethod
    def _load_text(text: str | None, file_path: str | None) -> str | None:
        """qwen_omni.py:171-178: file beats inline text; stripped."""
        if file_path:
            path = Path(file_path)
            if not path.exists():
                msg = f"QwenOmniASRAdapter prompt file not found: {path}"
                raise FileNotFoundError(msg)
            return path.read_text(encoding="utf-8").strip()
        return text

    @classmethod
    def download_weights_on_node(cls, model_id: str,
                                 revision: str | None = None) -> None:
        msg = (
            "huggingface_hub snapshot download unavailable in this "
            "environment; pre-stage the checkpoint or inject generate="
        )
        raise NotImplementedError(msg)

    def load_model(self, *, num_gpus: int) -> None:
        if self.generate is not None:
            return
        if not isinstance(num_gpus, int) or isinstance(num_gpus, bool) or num_gpus <= 0:
            msg = f"QwenOmniASRAdapter requires a positive integer num_gpus, got {num_gpus!r}"
            raise ValueError(msg)
        msg = (
            "vLLM is unavailable in this environment; inject "
            "generate(inputs) -> outputs (the reference builds it via "
            "create_vllm_llm + SamplingParams, qwen_omni.py:191-227)"
        )
        raise NotImplementedError(msg)

    # Input preparation ---------------------------------------------------

    def _resolve_prompt(self, template: str, language: str | None) -> str:
        result = template
        if language and "{language}" in result:
            result = result.replace("{language}", language)
        return result

    def _get_prompt_text(self, language: str | None) -> str:
        if language == "English" and self.en_prompt_text:
            return self._resolve_prompt(self.en_prompt_text, language)
        return self._resolve_prompt(self.prompt_text, language)

    def build_messages(self, waveform: np.ndarray,
                       language: str | None = None) -> list[dict[str, Any]]:
        """qwen_omni.py:291-306."""
        prompt = self._get_prompt_text(language)
        messages: list[dict[str, Any]] = []
        if self.system_prompt:
            sys_prompt = self._resolve_prompt(self.system_prompt, language)
            messages.append(
                {"role": "system",
                 "content": [{"type": "text", "text": sys_prompt}]}
            )
        text_content = {"type": "text", "text": prompt}
        audio_content = {"type": "audio", "audio": waveform}
        content = (
            [audio_content, text_content]
            if self.prompt_content_order == "audio_text"
            else [text_content, audio_content]
        )
        messages.append({"role": "user", "content": content})
        return messages

    def _prepare_single(self, waveform: np.ndarray,
                        language: str | None = None):
        """qwen_omni.py:332-349: empty/too-short/failed -> None (skip)."""
        try:
            if waveform.size == 0:
                return None
            if waveform.size < MIN_QWEN_AUDIO_SAMPLES:
                return None
            messages = self.build_messages(waveform, language)
            packer = self.pack_inputs or (lambda m: {"messages": m})
            return packer(messages)
        except Exception:  # noqa: BLE001 — the reference warns and skips
            return None

    @staticmethod
    def _first_output_text(output: Any) -> str:
        """qwen_omni.py:366-370."""
        sequences = getattr(output, "outputs", None) or []
        if not sequences:
            return ""
        return (getattr(sequences[0], "text", "") or "").strip()

    def _run_inference(self, waveforms, languages=None):
        """qwen_omni.py:392-420: prepare -> scatter -> strict zip ->
        empty-output skips."""
        n = len(waveforms)
        langs = languages or [None] * n
        prepared = [
            self._prepare_single(w, lang) for w, lang in zip(waveforms, langs)
        ]
        valid_indices = [i for i, p in enumerate(prepared) if p is not None]
        valid_inputs = [p for p in prepared if p is not None]
        skipped_indices = set(range(n)) - set(valid_indices)
        if not valid_inputs:
            return [""] * n, skipped_indices

        outputs = self.generate(valid_inputs)
        if len(outputs) != len(valid_inputs):
            msg = "generate() broke the 1:1 output contract"
            raise RuntimeError(msg)
        texts = [""] * n
        for idx, out in zip(valid_indices, outputs):
            texts[idx] = self._first_output_text(out)
        empty = {i for i in valid_indices if not texts[i]}
        skipped_indices.update(empty)
        return texts, skipped_indices

    def transcribe_batch(self, items: list[dict[str, Any]]) -> list[ASRResult]:
        """qwen_omni.py:252-276: 16 kHz contract, order-preserving
        ASRResult wrapping."""
        if not items:
            return []
        for index, item in enumerate(items):
            sample_rate = item.get("sample_rate")
            if sample_rate != QWEN_OMNI_SAMPLE_RATE:
                msg = (
                    f"QwenOmniASRAdapter requires {QWEN_OMNI_SAMPLE_RATE} Hz audio, "
                    f"but batch item {index} was decoded at {sample_rate!r} Hz"
                )
                raise ValueError(msg)
        waveforms = [it["waveform"] for it in items]
        languages = [it.get("language") for it in items]
        pred_texts, skipped_indices = self._run_inference(waveforms, languages)
        return [
            ASRResult(text=pred, skipped=(i in skipped_indices))
            for i, pred in enumerate(pred_texts)
        ]

"""ASR stage glue (reference
``stages/audio/inference/asr/{stage,asr_nemo}.py`` +
``models/asr/base.py``), Spark-first.

The NeMo acoustic models are environment-gated; MiniASR
(operators/asr_mini.py) makes the adapter seam REAL at mini scale.
Exact-ported here:

* ``ASRResult`` — the canonical per-utterance adapter output
  (models/asr/base.py:16-39).
* ``LANG_CODE_TO_NAME`` — the verbatim ISO-code table (stage.py:44-96;
  pure-ASCII names, byte-compared against the source in tests).
* ``set_note`` — the additional_notes writer (stage.py:103-108).
* ``normalise_supported_language_codes`` (stage.py:164-170),
  ``resolve_language`` / ``resolve_language_code`` (stage.py:241-253),
  ``is_language_supported`` (stage.py:255-259).
* ``prepare_waveform`` — mono-fold + dtype contract (stage.py:287-306);
  resampling uses linear interpolation as the documented stand-in for
  torchaudio's windowed-sinc kernel (plug point — the gate corpus is
  already at the target rate, where both are the identity).
* ``partition_inference_tasks`` — skip_if_output_exists
  (stage.py:348-357).
* ``run_inference`` routing — audio-load-error / language_missing /
  language_not_supported skip results, adapter 1:1 check
  (stage.py:358-420).
* ``assemble`` — pred_text write + note/_skipme semantics with the
  "empty_audio" fallback (stage.py:422-459).
* ``unwrap_transcribe_outputs`` — InferenceAsrNemoStage's output-shape
  unwrapping (asr_nemo.py:98-108: tuple, list-of-list, .text variants).
* ``MiniASRAdapter`` — a conforming ``ASRAdapter`` over the MiniASR
  artifact; ``asr_transcribe_rows`` is the Spark form (one mapInPandas
  pass, B=1 forwards, waveforms never cross an exchange).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SKIP_ME_KEY = "_skipme"
_NOTES_KEY = "additional_notes"

# Verbatim observable contract (stage.py:44-96).
LANG_CODE_TO_NAME: dict[str, str] = {
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
    "fil": "Filipino",
    "fr": "French",
    "gu": "Gujarati",
    "he": "Hebrew",
    "hi": "Hindi",
    "hr": "Croatian",
    "hu": "Hungarian",
    "id": "Indonesian",
    "it": "Italian",
    "ja": "Japanese",
    "kn": "Kannada",
    "ko": "Korean",
    "lt": "Lithuanian",
    "lv": "Latvian",
    "mk": "Macedonian",
    "ml": "Malayalam",
    "mr": "Marathi",
    "mt": "Maltese",
    "nl": "Dutch",
    "no": "Norwegian",
    "pa": "Punjabi",
    "pl": "Polish",
    "pt": "Portuguese",
    "ro": "Romanian",
    "ru": "Russian",
    "sk": "Slovak",
    "sl": "Slovenian",
    "sr": "Serbian",
    "sv": "Swedish",
    "ta": "Tamil",
    "te": "Telugu",
    "th": "Thai",
    "tl": "Tagalog",
    "tr": "Turkish",
    "uk": "Ukrainian",
    "ur": "Urdu",
    "vi": "Vietnamese",
    "zh": "Chinese",
}


@dataclass
class ASRResult:
    """models/asr/base.py:16-39, field-for-field."""

    text: str
    skipped: bool = False
    skip_reason: str | None = None
    unsupported_language: str | None = None
    extras: dict[str, Any] = field(default_factory=dict)


def set_note(task_data: dict[str, Any], stage_name: str, value: str) -> None:
    """stage.py:103-108: lazily create the notes dict, overwrite the
    stage's slot."""
    notes = task_data.get(_NOTES_KEY)
    if not isinstance(notes, dict):
        notes = {}
        task_data[_NOTES_KEY] = notes
    notes[stage_name] = value


def normalise_supported_language_codes(value) -> set[str] | None:
    """stage.py:164-170: comma-string or iterable -> lowercase set;
    empty -> None."""
    if value is None:
        return None
    raw_codes = value.split(",") if isinstance(value, str) else list(value)
    codes = {str(code).strip().lower() for code in raw_codes if str(code).strip()}
    return codes or None


def resolve_language_code(data: dict, source_lang_key: str = "source_lang",
                          default_language: str | None = None) -> str | None:
    """stage.py:247-253."""
    code = data.get(source_lang_key) if source_lang_key else None
    if code:
        return str(code).strip().lower()
    if default_language:
        return str(default_language).strip().lower()
    return None


def resolve_language(data: dict, source_lang_key: str = "source_lang",
                     default_language: str | None = None) -> str | None:
    """stage.py:241-245: ISO code -> human-readable name, unknown codes
    pass through."""
    code = resolve_language_code(data, source_lang_key, default_language)
    if code:
        return LANG_CODE_TO_NAME.get(code, code)
    return None


def is_language_supported(item: dict, supported: set[str] | None) -> bool:
    """stage.py:255-259."""
    if supported is None:
        return True
    code = str(item.get("language_code", "") or "").strip().lower()
    return bool(code) and code in supported


def prepare_waveform(waveform, sample_rate,
                     target_sample_rate: int = 16000) -> np.ndarray:
    """stage.py:287-306 contract: contiguous mono float32 at the target
    rate. 2-D channel-first audio is mean-folded; other ranks raise.
    Resampling is linear interpolation (documented stand-in for
    torchaudio's windowed-sinc — identity at matching rates)."""
    source_sample_rate = int(sample_rate)
    if source_sample_rate <= 0:
        msg = f"sample rate must be > 0, got {source_sample_rate}"
        raise ValueError(msg)
    arr = np.asarray(waveform, dtype=np.float32)
    if arr.ndim == 2:
        arr = arr.mean(axis=0)
    elif arr.ndim != 1:
        msg = f"waveform must be 1-D mono or 2-D channel-first audio, got shape {tuple(arr.shape)}"
        raise ValueError(msg)
    if source_sample_rate != target_sample_rate:
        n_out = int(round(len(arr) * target_sample_rate / source_sample_rate))
        src_t = np.arange(len(arr)) / source_sample_rate
        out_t = np.arange(n_out) / target_sample_rate
        arr = np.interp(out_t, src_t, arr.astype(np.float64)).astype(np.float32)
    return np.ascontiguousarray(arr, dtype=np.float32)


def partition_inference_tasks(entries: list[dict], pred_text_key: str,
                              skip_if_output_exists: bool) -> tuple[list[dict], int]:
    """stage.py:348-357 over plain data dicts."""
    to_process: list[dict] = []
    skipped = 0
    for entry in entries:
        if skip_if_output_exists and entry.get(pred_text_key):
            skipped += 1
            continue
        to_process.append(entry)
    return to_process, skipped


def run_inference(items: list[dict], adapter, supported: set[str] | None,
                  target_sample_rate: int = 16000,
                  load_audio=None) -> list[ASRResult]:
    """stage.py:358-420 routing: unsupported/missing-language skips,
    per-item audio prep with audio_load_error capture, adapter batch
    with the 1:1 length check. ``load_audio(path) -> (wav, sr)`` is the
    torchaudio seam (required only for filepath items)."""
    supported_indices = [
        i for i, item in enumerate(items) if is_language_supported(item, supported)
    ]
    by_index: dict[int, ASRResult] = {}
    adapter_indices: list[int] = []
    adapter_items: list[dict] = []
    for index in supported_indices:
        item = items[index]
        try:
            if "waveform" in item:
                waveform = item["waveform"]
                sample_rate = item["sample_rate"]
            else:
                waveform, sample_rate = load_audio(str(item["audio_filepath"]))
            waveform = prepare_waveform(waveform, sample_rate, target_sample_rate)
        except Exception:  # noqa: BLE001 — the reference warns and skips
            by_index[index] = ASRResult(
                text="", skipped=True, skip_reason="audio_load_error"
            )
            continue
        adapter_indices.append(index)
        adapter_items.append(
            {
                "waveform": waveform,
                "sample_rate": target_sample_rate,
                "language": item.get("language"),
                "language_code": item.get("language_code"),
                "task_id": item.get("task_id"),
            }
        )
    if adapter_items:
        adapter_results = adapter.transcribe_batch(adapter_items)
        if len(adapter_results) != len(adapter_items):
            msg = (
                f"Adapter returned {len(adapter_results)} results for "
                f"{len(adapter_items)} supported items (must match 1:1)"
            )
            raise RuntimeError(msg)
        by_index.update(zip(adapter_indices, adapter_results))
    return [
        by_index.get(
            index,
            ASRResult(
                text="",
                skipped=True,
                skip_reason=(
                    "language_not_supported"
                    if str(item.get("language_code", "") or "").strip()
                    else "language_missing"
                ),
                unsupported_language=(
                    str(item.get("language_code", "") or "").strip().lower() or None
                ),
            ),
        )
        for index, item in enumerate(items)
    ]


def assemble(entries: list[dict], items: list[dict], results: list[ASRResult],
             pred_text_key: str = "pred_text", stage_name: str = "ASR_inference",
             supported: set[str] | None = None) -> int:
    """stage.py:422-459: write pred_text + the note/_skipme semantics.
    Returns the skipped count (the reference logs it)."""
    skipped_count = 0
    for entry, item, result in zip(entries, items, results):
        entry[pred_text_key] = result.text
        unsupported_language = result.unsupported_language
        missing_language = supported is not None and not item["language_code"]
        if missing_language:
            set_note(entry, stage_name, "skipped (missing language)")
            set_note(entry, pred_text_key, "language_missing")
        elif unsupported_language:
            set_note(
                entry, stage_name,
                f"skipped (unsupported language: {unsupported_language})",
            )
            set_note(
                entry, pred_text_key,
                f"lang_not_supported:{unsupported_language}",
            )
        if result.skipped:
            entry[_SKIP_ME_KEY] = result.skip_reason or "empty_audio"
            skipped_count += 1
    return skipped_count


def unwrap_transcribe_outputs(outputs) -> list[str]:
    """InferenceAsrNemoStage.transcribe's output-shape unwrapping
    (asr_nemo.py:98-108): tuple -> first element; list-of-list with
    .text objects or raw strings; flat list of .text objects."""
    if isinstance(outputs, tuple):
        outputs = outputs[0]
    if outputs and isinstance(outputs[0], list):
        if outputs[0] and hasattr(outputs[0][0], "text"):
            return [inner[0].text for inner in outputs]
        return [inner[0] for inner in outputs]
    return [output.text for output in outputs]


# ----------------------------------------------------------------------
@dataclass
class MiniASRAdapter:
    """A conforming ``ASRAdapter`` (models/asr/base.py protocol: built
    as cls(model_id=..., revision=..., **kwargs); transcribe_batch
    returns one ASRResult per item in order) over the MiniASR weight
    artifact. Empty waveforms skip with the stage's canonical
    "empty_audio" reason."""

    model_id: str = "mini-asr-ctc"
    revision: str | None = None
    weights_path: str = "/dev/shm/ncs_asr_model.json"

    @classmethod
    def download_weights_on_node(cls, model_id: str,
                                 revision: str | None = None) -> None:
        return None  # weights are a local training artifact

    def load_model(self, *, num_gpus: int) -> None:
        from nemo_curator_spark.operators import asr_mini

        asr_mini.ensure_artifact(self.weights_path)
        self._model = asr_mini.load_cached(self.weights_path)

    def transcribe_batch(self, items: list[dict]) -> list[ASRResult]:
        from nemo_curator_spark.operators import asr_mini

        model = getattr(self, "_model", None)
        if model is None:
            self.load_model(num_gpus=0)
            model = self._model
        out = []
        for item in items:
            wav = np.asarray(item["waveform"], dtype=np.float64)
            if wav.size == 0:
                out.append(ASRResult(text="", skipped=True,
                                     skip_reason="empty_audio"))
                continue
            out.append(
                ASRResult(text=model.transcribe(wav, int(item["sample_rate"])))
            )
        return out


def asr_transcribe_rows(
    df: DataFrame,
    weights_path: str,
    id_col: str = "doc_id",
    wav_provider=None,
) -> DataFrame:
    """Spark form: per row, synthesize/decode a waveform
    (``wav_provider(id) -> (wav, sr)``; defaults to the synthetic
    tone-coded corpus) and transcribe with MiniASR. One mapInPandas
    pass, B=1 forwards; only (id, pred_text) rows cross exchanges."""
    from nemo_curator_spark.operators import asr_mini

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("pred_text", T.StringType()),
        ]
    )

    def gen(it):
        model = asr_mini.load_cached(weights_path)
        for pdf in it:
            rows = []
            for d in pdf[id_col]:
                if wav_provider is not None:
                    wav, sr = wav_provider(int(d))
                else:
                    wav, _, _ = asr_mini.synth_utterance(int(d))
                    sr = asr_mini.SR
                rows.append((int(d), model.transcribe(np.asarray(wav), sr)))
            yield pd.DataFrame(rows, columns=[id_col, "pred_text"])

    return df.select(id_col).mapInPandas(gen, schema)

"""Audio tagging text/convert/resample stages, deterministic halves —
reference stages/audio/tagging/text/{chinese_conversion,itn}.py,
tagging/resample_audio.py, and audio/io/convert.py. The external
runtimes (OpenCC, nemo_text_processing's InverseNormalizer, ffmpeg)
are injectable plug points; the key contracts, fallback semantics,
deterministic naming and skip-if-exists idempotence are exact.

Spark shape: every stage is per-entry pure -> single Arrow passes / a
plain projection; no shuffle anywhere.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class ChineseConversionStage:
    """chinese_conversion.py:28-73: write ``{text_key}_simplified`` into
    every segment; a converter failure keeps the original text (the
    reference's fallback). ``converter(text) -> text`` is the OpenCC
    plug point (``convert_type`` rides along for parity)."""

    text_key: str = "text"
    convert_type: str = "t2s"
    converter: object | None = None

    def process_entry(self, entry: dict) -> dict:
        if self.converter is None:
            raise NotImplementedError(
                "no OpenCC runtime in this environment; inject "
                "converter(text) -> text"
            )
        output_key = f"{self.text_key}_simplified"
        for segment in entry.get("segments", []):
            if self.text_key in segment:
                try:
                    segment[output_key] = self.converter(
                        segment[self.text_key]
                    )
                except Exception:  # noqa: BLE001 — reference keeps original
                    segment[output_key] = segment[self.text_key]
        return entry


@dataclass
class InverseTextNormalizationStage:
    """itn.py:30-78: per segment, sentence-split + inverse-normalize into
    ``{text_key}_ITN`` (empty/missing text skipped). ``normalizer`` is
    the nemo_text_processing plug point with the reference's two-method
    shape: ``split_text_into_sentences(text) -> list[str]`` and
    ``normalize_list(list[str]) -> list[str]``."""

    language: str = "en"
    text_key: str = "text"
    normalizer: object | None = None

    def process_entry(self, entry: dict) -> dict:
        if self.normalizer is None:
            raise NotImplementedError(
                "no inverse-text-normalization runtime in this "
                "environment; inject a normalizer with "
                "split_text_into_sentences + normalize_list"
            )
        for segment in entry.get("segments", []):
            if self.text_key in segment:
                text = segment[self.text_key]
                if text:
                    sentences = self.normalizer.split_text_into_sentences(
                        text
                    )
                    segment[f"{self.text_key}_ITN"] = " ".join(
                        self.normalizer.normalize_list(sentences)
                    )
        return entry


def segment_text_stage_udf(stage) -> object:
    """Spark form shared by both segment-text stages: one Arrow pass
    over manifest rows carrying segments as JSON."""

    @F.pandas_udf(T.StringType())
    def _apply(metas: pd.Series) -> pd.Series:
        out = []
        for m in metas:
            entry = json.loads(m) if m else {}
            out.append(
                json.dumps(stage.process_entry(entry), ensure_ascii=False)
            )
        return pd.Series(out)

    return _apply


# --- resample (tagging/resample_audio.py) ----------------------------------


def audio_item_id(audio_path: str) -> str:
    """resample_audio.py:105-108, exact: ``{stem}_{sha256(path)[:8]}``."""
    stem = os.path.splitext(os.path.basename(audio_path))[0]
    path_hash = hashlib.sha256(audio_path.encode()).hexdigest()[:8]
    return f"{stem}_{path_hash}"


def linear_resample(samples: np.ndarray, src_sr: int, dst_sr: int) -> np.ndarray:
    """Deterministic linear-interpolation resampler — the stand-in for
    ffmpeg/torchaudio's polyphase filters (the documented plug point for
    production fidelity)."""
    if src_sr == dst_sr:
        return np.asarray(samples, dtype=np.int16)
    n_out = int(round(len(samples) * dst_sr / src_sr))
    x_old = np.arange(len(samples), dtype=np.float64)
    x_new = np.arange(n_out, dtype=np.float64) * (src_sr / dst_sr)
    y = np.interp(x_new, x_old, np.asarray(samples, dtype=np.float64))
    return np.rint(y).clip(-32768, 32767).astype(np.int16)


@dataclass
class ResampleAudioStage:
    """resample_audio.py:36-154 contract: deterministic content-addressed
    output naming, skip-if-exists conversion (retry-safe), manifest
    updated with audio_item_id / resampled path / measured duration.
    ``convert(input_path, output_path, sample_rate, nchannels)`` is the
    ffmpeg plug point; the default handles WAV inputs with the repo's
    stdlib codec + linear resampling."""

    resampled_audio_dir: str = ""
    input_format: str = "wav"
    target_sample_rate: int = 16000
    target_format: str = "wav"
    target_nchannels: int = 1
    audio_filepath_key: str = "audio_filepath"
    resampled_audio_filepath_key: str = "resampled_audio_filepath"
    duration_key: str = "duration"
    audio_item_id_key: str = "audio_item_id"
    convert: object | None = None

    def _default_convert(
        self, input_path: str, output_path: str, sample_rate: int, nchannels: int
    ) -> None:
        from nemo_curator_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        with open(input_path, "rb") as fp:
            ch, sr, samples = decode_wav(fp.read())
        if ch > 1 and nchannels == 1:
            samples = np.rint(
                samples.reshape(-1, ch).mean(axis=1)
            ).astype(np.int16)
        elif ch != nchannels or nchannels != 1:
            # the stdlib default only produces mono; interleaved
            # multichannel resampling is ffmpeg's job — refuse loudly
            # rather than resample across interleaved channels
            raise NotImplementedError(
                f"default converter only downmixes to mono "
                f"(got {ch} channel(s) -> target {nchannels}); inject "
                f"convert(...) backed by ffmpeg for multichannel output"
            )
        out = linear_resample(samples, sr, sample_rate)
        tmp = output_path + ".tmp"
        with open(tmp, "wb") as fp:
            fp.write(encode_wav(out, sample_rate))
        os.replace(tmp, output_path)

    def process_entry(self, entry: dict) -> dict:
        if self.audio_filepath_key not in entry:
            msg = "Absolute audio filepath is required"
            raise ValueError(msg)
        original = entry[self.audio_filepath_key]
        if self.audio_item_id_key not in entry:
            entry[self.audio_item_id_key] = audio_item_id(original)
        os.makedirs(self.resampled_audio_dir, exist_ok=True)
        output_path = os.path.join(
            self.resampled_audio_dir,
            entry[self.audio_item_id_key] + "." + self.target_format,
        )
        if not os.path.exists(output_path):
            conv = self.convert or self._default_convert
            conv(
                original,
                output_path,
                self.target_sample_rate,
                self.target_nchannels,
            )
        entry[self.audio_filepath_key] = original
        entry[self.resampled_audio_filepath_key] = output_path
        from nemo_curator_spark.operators.multimodal import decode_wav

        with open(output_path, "rb") as fp:
            ch, sr, samples = decode_wav(fp.read())
        entry[self.duration_key] = len(samples) / (sr * max(1, ch))
        return entry


# --- AudioToDocument (audio/io/convert.py) ---------------------------------

NON_SERIALIZABLE_KEYS = frozenset(
    {"waveform", "audio", "audio_data", "audio_array", "segments"}
)


def sanitize_audio_entry(data: dict) -> dict:
    """convert.py:58-72: strip the non-serializable key set and any
    array-valued leftovers before row conversion."""
    cleaned = {}
    for k, v in data.items():
        if k in NON_SERIALIZABLE_KEYS:
            continue
        if isinstance(v, np.ndarray):
            continue
        cleaned[k] = v
    return cleaned


def audio_entries_to_dataframe(entries: list[dict]) -> pd.DataFrame:
    """AudioToDocumentStage.process_batch (convert.py:74-87): one
    multi-row frame per batch of sanitized entries."""
    return pd.DataFrame([sanitize_audio_entry(e) for e in entries])


def audio_to_documents(
    df: DataFrame, entry_col: str = "entry", fields: list[str] | None = None
) -> DataFrame:
    """Spark form: project the declared scalar fields out of JSON
    manifest entries (segments/waveform keys never materialize — the
    sanitize contract enforced by construction)."""
    wanted = fields or ["audio_filepath", "duration", "text"]
    bad = NON_SERIALIZABLE_KEYS.intersection(wanted)
    if bad:
        msg = f"non-serializable fields requested: {sorted(bad)}"
        raise ValueError(msg)
    cols = [
        F.get_json_object(F.col(entry_col), f"$.{name}").alias(name)
        for name in wanted
    ]
    return df.select(*cols)

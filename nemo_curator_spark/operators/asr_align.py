"""ASR forced-alignment stage — deterministic half of the reference's
NeMo ASR aligner (stages/audio/tagging/inference/nemo_asr_align.py:
43-457). The FastConformer model itself is the plug point
(``transcribe`` injectable); everything around it is ported exactly:

* segment batch preparation with the min-length gate and waveform
  cutting (nemo_asr_align.py:88-145);
* hypothesis -> word-alignment extraction — the FastConformer 8x /
  conformer 4x time-stride math, the RNNT -0.08 s offset clamp,
  4-decimal confidence rounding, 3-decimal timestamp rounding, and the
  ``⁇`` scrub (nemo_asr_align.py:279-322);
* full-audio routing — empty ``split_filepaths`` lists mark
  already-empty entries (text ""/alignment []), split paths fan out and
  results scatter back into ``split_metadata`` by split index, with the
  reference's batch-failure -> one-by-one retry fallback
  (nemo_asr_align.py:344-417);
* segment-only mode — per-segment inference over cut waveforms with
  absolute-time re-offset of each word (nemo_asr_align.py:419-457).

Hypotheses are plain dicts ``{"text", "timestamp": {"word": [...]},
"word_confidence"}`` — the shape NeMo's Hypothesis exposes; a real
integration wraps the model output into that form.

Spark form: one ``mapInPandas`` pass over manifest-entry JSON rows
(bookkeeping only — audio stays on disk, read per worker for segment
cutting), no shuffle.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from nemo_curator_spark.operators.multimodal import decode_wav


def default_load_audio(path: str) -> tuple[np.ndarray, int]:
    """torchaudio.load stand-in over the repo WAV codec: returns
    (channels x samples float array, sample_rate)."""
    with open(path, "rb") as f:
        channels, sr, samples = decode_wav(f.read())
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    return arr, sr


def prepare_segment_batch_with_metadata(
    metadata_batch: list[dict],
    *,
    min_len: float = 1.0,
    cut_audio_segments: bool = False,
    segments_key: str = "segments",
    load_audio: Callable[[str], tuple[np.ndarray, int]] | None = None,
) -> list[dict]:
    """BaseASRProcessorStage._prepare_segment_batch_with_metadata
    (nemo_asr_align.py:88-145), exact: collect per-segment metadata
    with (metadata_idx, segment_idx); in cut mode load the audio once
    per entry and slice ``[start*sr : end*sr]`` for every segment whose
    duration clears ``min_len`` (empty cuts dropped)."""
    load_audio = load_audio or default_load_audio
    segment_metadata_list: list[dict] = []
    if cut_audio_segments:
        for metadata_idx, metadata in enumerate(metadata_batch):
            audio_path = metadata.get(
                "resampled_audio_filepath", metadata.get("audio_filepath")
            )
            if not audio_path:
                continue
            audio, sr = load_audio(audio_path)
            for segment_idx, segment in enumerate(
                metadata.get(segments_key, [])
            ):
                duration = segment.get("end", 0) - segment.get("start", 0)
                if duration >= min_len:
                    start = int(segment["start"] * sr)
                    end = int(segment["end"] * sr)
                    audio_segment = audio[:, start:end].squeeze(0)
                    if len(audio_segment) > 0:
                        segment_metadata_list.append(
                            {
                                "audio_segment": np.asarray(audio_segment),
                                "metadata_idx": metadata_idx,
                                "segment_idx": segment_idx,
                            }
                        )
    else:
        for metadata_idx, metadata in enumerate(metadata_batch):
            for segment_idx, segment in enumerate(
                metadata.get(segments_key, [])
            ):
                if "resampled_audio_filepath" in segment:
                    segment_metadata_list.append(
                        {
                            "resampled_audio_filepath": segment[
                                "resampled_audio_filepath"
                            ],
                            "metadata_idx": metadata_idx,
                            "segment_idx": segment_idx,
                        }
                    )
    return segment_metadata_list


def get_alignments_text(
    hyp: dict,
    *,
    compute_timestamps: bool = True,
    is_fastconformer: bool = True,
    window_stride: float = 0.01,
    timestamp_type: str = "word",
    decoder_type: str = "rnnt",
) -> tuple[list, str]:
    """NeMoASRAlignerStage.get_alignments_text (nemo_asr_align.py:
    279-322), exact math: time stride is 8x (FastConformer) or 4x
    (Conformer) the preprocessor window stride; CTC offsets map
    directly, RNNT offsets shift left 0.08 s clamped at 0; confidences
    round to 4 decimals, times to 3; joined text drops ``⁇``."""
    if not compute_timestamps:
        return [], hyp.get("text", "")
    timestamp_dict = hyp.get("timestamp") or {}
    time_stride = (8 if is_fastconformer else 4) * window_stride
    word_timestamps = timestamp_dict.get(timestamp_type) or []
    word_confidence = hyp.get("word_confidence")
    alignments = []
    for i, stamp in enumerate(word_timestamps):
        conf = None
        if word_confidence is not None and i < len(word_confidence):
            conf = round(float(word_confidence[i]), 4)
        if decoder_type == "ctc":
            start = stamp["start_offset"] * time_stride
            end = stamp["end_offset"] * time_stride
        else:
            start = max(0, stamp["start_offset"] * time_stride - 0.08)
            end = max(0, stamp["end_offset"] * time_stride - 0.08)
        word = stamp.get("word", stamp.get("char", ""))
        alignments.append(
            {
                "word": word,
                "start": round(start, 3),
                "end": round(end, 3),
                "confidence": conf,
            }
        )
    text = " ".join(w["word"] for w in alignments)
    text = text.replace("⁇", "")
    return alignments, text


class ASRAlignerStage:
    """NeMoASRAlignerStage contract (nemo_asr_align.py:148-457) with
    the model as an injectable: ``transcribe(inputs) -> [hyp dicts]``
    where inputs are file paths (full-audio mode) or waveform arrays
    (segment mode). ``window_stride`` stands in for the model config's
    ``cfg.preprocessor.window_stride`` (0.01 for the reference
    parakeet models)."""

    def __init__(  # noqa: PLR0913
        self,
        transcribe: Callable[[list], list] | None = None,
        *,
        model_name: str = "nvidia/parakeet-tdt_ctc-1.1b",
        model_path: str | None = None,
        is_fastconformer: bool = True,
        decoder_type: str = "rnnt",
        window_stride: float = 0.01,
        min_len: float = 1.0,
        max_len: float = 40.0,
        compute_timestamps: bool = True,
        timestamp_type: str = "word",
        infer_segment_only: bool = False,
        segments_key: str = "segments",
        text_key: str = "text",
        words_key: str = "words",
        load_audio: Callable[[str], tuple[np.ndarray, int]] | None = None,
    ) -> None:
        if decoder_type not in ("ctc", "rnnt"):
            msg = f"decoder_type must be 'ctc' or 'rnnt', got {decoder_type}"
            raise ValueError(msg)
        self.transcribe = transcribe
        self.model_name = model_name
        self.model_path = model_path
        self.is_fastconformer = is_fastconformer
        self.decoder_type = decoder_type
        self.window_stride = window_stride
        self.min_len = min_len
        self.max_len = max_len
        self.compute_timestamps = compute_timestamps
        self.timestamp_type = timestamp_type
        self.infer_segment_only = infer_segment_only
        self.segments_key = segments_key
        self.text_key = text_key
        self.words_key = words_key
        self.load_audio = load_audio

    # -- stage IO declarations (nemo_asr_align.py:267-277) ----------------
    def inputs(self) -> tuple[list[str], list[str]]:
        if self.infer_segment_only:
            return ["data"], ["resampled_audio_filepath", self.segments_key]
        return ["data"], [
            "duration", self.segments_key, "split_filepaths", "split_metadata",
        ]

    def outputs(self) -> tuple[list[str], list[str]]:
        return self.inputs()

    def _require_model(self) -> Callable[[list], list]:
        if self.transcribe is None:
            raise NotImplementedError(
                "no ASR runtime in this environment; inject "
                "transcribe(inputs) -> [ {text, timestamp, "
                "word_confidence} ] (NeMo FastConformer via "
                f"{self.model_path or self.model_name} is the reference "
                "path)"
            )
        return self.transcribe

    def _extract(self, hyp: dict) -> tuple[list, str]:
        return get_alignments_text(
            hyp,
            compute_timestamps=self.compute_timestamps,
            is_fastconformer=self.is_fastconformer,
            window_stride=self.window_stride,
            timestamp_type=self.timestamp_type,
            decoder_type=self.decoder_type,
        )

    def process_batch(self, entries: list[dict]) -> list[dict]:
        if not entries:
            return []
        if self.infer_segment_only:
            return self.process_segments(entries)
        return self.process_full_audio(entries)

    def process_full_audio(self, entries: list[dict]) -> list[dict]:
        """nemo_asr_align.py:344-417: entries with an EMPTY
        split_filepaths list are pre-skipped (text ""/alignment []);
        entries with splits (or no key at all) fan their paths into one
        transcribe call, falling back to per-path retries on a batch
        failure; results scatter into split_metadata[split_idx] when
        present, else onto the entry itself. Reference parity note: a
        transcriber returning FEWER hypotheses than paths leaves the
        trailing splits untouched (the reference's enumerate loop does
        the same); return None per failed path instead of omitting it —
        segment mode, like the reference's strict zip, raises on a
        count mismatch."""
        transcribe = self._require_model()
        skip_indices = []
        meta_indices = []
        for i, data in enumerate(entries):
            split_filepaths = data.get("split_filepaths")
            has_splits = (
                isinstance(split_filepaths, list) and len(split_filepaths) > 0
            )
            if has_splits or split_filepaths is None:
                meta_indices.append(i)
            else:
                skip_indices.append(i)
        for i in skip_indices:
            entries[i][self.text_key] = ""
            entries[i]["alignment"] = []

        all_paths: list[str] = []
        path_to_entry_and_split: list[tuple[int, int]] = []
        for entry_idx in meta_indices:
            meta_entry = entries[entry_idx]
            split_filepaths = meta_entry.get("split_filepaths")
            if not split_filepaths:
                continue
            for split_idx, path in enumerate(split_filepaths):
                all_paths.append(path)
                path_to_entry_and_split.append((entry_idx, split_idx))
        if not all_paths:
            return entries

        try:
            hypotheses_list = transcribe(all_paths)
        except Exception:  # noqa: BLE001 — reference retries one-by-one
            hypotheses_list = []
            for path in all_paths:
                try:
                    hyp = transcribe([path])
                    hypotheses_list.append(hyp[0] if hyp else None)
                except Exception:  # noqa: BLE001
                    hypotheses_list.append(None)

        for path_idx, hyp in enumerate(hypotheses_list):
            if path_idx >= len(path_to_entry_and_split):
                break
            entry_idx, split_idx = path_to_entry_and_split[path_idx]
            meta_entry = entries[entry_idx]
            if hyp is not None:
                alignments, text = self._extract(hyp)
            else:
                alignments, text = [], ""
            split_metadata = meta_entry.get("split_metadata")
            if split_metadata and split_idx < len(split_metadata):
                split_metadata[split_idx][self.text_key] = text
                split_metadata[split_idx]["alignment"] = alignments
            else:
                meta_entry[self.text_key] = text
                meta_entry["alignment"] = alignments
        return entries

    def process_segments(self, entries: list[dict]) -> list[dict]:
        """nemo_asr_align.py:419-457: cut each qualifying segment's
        waveform, transcribe all cuts in one call (a batch failure here
        RAISES — reference semantics), and write per-segment text plus
        absolute-time word alignments."""
        transcribe = self._require_model()
        if not entries:
            return []
        segment_metadata_list = prepare_segment_batch_with_metadata(
            entries,
            min_len=self.min_len,
            cut_audio_segments=True,
            segments_key=self.segments_key,
            load_audio=self.load_audio,
        )
        all_segments = [s["audio_segment"] for s in segment_metadata_list]
        if len(all_segments) == 0:
            return entries
        try:
            hypotheses_list = transcribe(all_segments)
        except Exception as e:
            files_list = [
                x.get("resampled_audio_filepath", x.get("audio_filepath"))
                for x in entries
            ]
            msg = f"[ASRAligner] Exception for audio list: {files_list}"
            raise ValueError(msg) from e
        if len(hypotheses_list) != len(segment_metadata_list):
            msg = (
                "transcribe returned "
                f"{len(hypotheses_list)} hypotheses for "
                f"{len(segment_metadata_list)} segments"
            )
            raise ValueError(msg)
        for segment_metadata, hyp in zip(
            segment_metadata_list, hypotheses_list
        ):
            alignments, text = self._extract(hyp)
            metadata_idx = segment_metadata["metadata_idx"]
            segment_idx = segment_metadata["segment_idx"]
            segment = entries[metadata_idx][self.segments_key][segment_idx]
            segment[self.text_key] = text
            if self.compute_timestamps:
                seg_start = segment.get("start", 0)
                for word in alignments:
                    word["start"] = round(word["start"] + seg_start, 3)
                    word["end"] = round(word["end"] + seg_start, 3)
                segment[self.words_key] = alignments
        return entries


def asr_align_manifest(
    df: DataFrame,
    stage: ASRAlignerStage,
    entry_col: str = "entry",
) -> DataFrame:
    """Spark form: manifest-entry JSON rows through the aligner in one
    ``mapInPandas`` pass (audio is read worker-side only in segment
    mode; nothing shuffles). Entries are independent, so Arrow batch
    boundaries don't change results."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            entries = [
                json.loads(e) if e else {} for e in pdf[entry_col]
            ]
            out = stage.process_batch(entries)
            yield pd.DataFrame(
                {entry_col: [json.dumps(e, ensure_ascii=False) for e in out]}
            )

    return df.mapInPandas(
        gen, T.StructType([T.StructField(entry_col, T.StringType())])
    )

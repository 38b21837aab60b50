"""Audio dataset initial-manifest stages, parse half — reference
stages/audio/datasets/fleurs/create_initial_manifest.py +
readspeech/create_initial_manifest.py. The Hugging-Face / archive
downloads are the plug points (stdlib-gated here exactly like
operators/download.py's transport); the manifest construction —
FLEURS transcript-TSV parsing and ReadSpeech filename-metadata
extraction over a staged directory — is deterministic and ported.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

SAMPLE_RATE_48KHZ = 48000
_MIN_FILENAME_PARTS = 6  # create_initial_manifest.py:27


def get_fleurs_filenames(lang: str, split: str) -> tuple[str, str]:
    """fleurs/create_initial_manifest.py:30-40: repo-relative
    (transcript_tsv, audio_archive) paths inside ``google/fleurs``."""
    return f"data/{lang}/{split}.tsv", f"data/{lang}/audio/{split}.tar.gz"


def fleurs_manifest_rows(
    tsv_path: str,
    audio_root: str,
    filepath_key: str = "audio_filepath",
    text_key: str = "text",
) -> list[dict]:
    """fleurs process_transcript (create_initial_manifest.py:105-131):
    TSV lines -> one entry per row (columns 1=file name, 2=transcript;
    short lines skipped); wav paths made absolute against audio_root."""
    entries: list[dict] = []
    with open(tsv_path, encoding="utf-8") as fin:
        for line in fin:
            parts = line.strip().split("\t")
            if len(parts) < 3:
                continue
            file_name, transcript = parts[1], parts[2]
            entries.append(
                {
                    filepath_key: os.path.abspath(
                        os.path.join(audio_root, file_name)
                    ),
                    text_key: transcript,
                }
            )
    return entries


def parse_readspeech_filename(filename: str) -> dict:
    """readspeech parse_filename (create_initial_manifest.py:204-233):
    book/chp/reader tokens followed by their value in an
    underscore-separated basename."""
    metadata = {"book_id": "", "chapter": "", "reader_id": ""}
    parts = os.path.splitext(filename)[0].split("_")
    if len(parts) >= _MIN_FILENAME_PARTS:
        for token, key in (
            ("book", "book_id"), ("chp", "chapter"), ("reader", "reader_id")
        ):
            if token in parts:
                idx = parts.index(token)
                if idx + 1 < len(parts):
                    metadata[key] = parts[idx + 1]
    return metadata


def readspeech_manifest_rows(
    wav_paths: list[str],
    filepath_key: str = "audio_filepath",
    text_key: str = "text",
) -> list[dict]:
    """readspeech collect_audio_files (create_initial_manifest.py:
    235-258) over an explicit path list (the recursive walk is the
    caller's — one ``os.walk`` or a Spark binaryFile listing)."""
    entries = []
    for wav_path in wav_paths:
        md = parse_readspeech_filename(os.path.basename(wav_path))
        entries.append(
            {
                filepath_key: os.path.abspath(wav_path),
                text_key: "",
                "sample_rate": SAMPLE_RATE_48KHZ,
                "book_id": md["book_id"],
                "reader_id": md["reader_id"],
            }
        )
    return entries


def fleurs_manifest(
    spark: SparkSession, tsv_path: str, audio_root: str
) -> DataFrame:
    """Spark form: the TSV is one small driver-side file; the resulting
    manifest frame is the parallel unit downstream stages scan."""
    rows = fleurs_manifest_rows(tsv_path, audio_root)
    return spark.createDataFrame(
        [(r["audio_filepath"], r["text"]) for r in rows],
        "audio_filepath string, text string",
    )


def readspeech_manifest(spark: SparkSession, wav_paths: list[str]) -> DataFrame:
    rows = readspeech_manifest_rows(wav_paths)
    return spark.createDataFrame(
        [
            (r["audio_filepath"], r["text"], r["sample_rate"], r["book_id"],
             r["reader_id"])
            for r in rows
        ],
        "audio_filepath string, text string, sample_rate int, "
        "book_id string, reader_id string",
    )

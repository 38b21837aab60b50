"""ALM pretrain composite pipeline — reference
stages/audio/alm/pretrain/pipeline.py:69-232 (build_audio_pretrain_pipeline
+ run.py's prepare/finalize wiring).

The reference pipeline: read long-form manifest -> overlap filter ->
greedy snippet planning -> n-gram repetition filter -> snippet audio
extraction -> per-replica manifest/tar/metrics shards -> driver-side
merge. Every stage exists here (``operators/alm_planning``, ``alm_io``,
``alm_finalize``); this module carries the reference's parameter surface
and runs the whole plan:

- planning/filtering is ONE ``applyInPandas`` keyed by file over
  bookkeeping rows (the three planner stages are fused —
  ``alm_snippet_plan``);
- the plan is broadcast onto the audio scan so waveform bytes never
  shuffle (``alm_extract_snippets``);
- each output partition writes exactly one manifest/metrics/tar shard
  (idempotent tmp+rename), merged once on the driver — the reference's
  multi-replica-safe shard protocol (pipeline.py:222-229 note);
- ``dry_run`` skips all audio IO but still emits manifest + metrics,
  with ``duration = end - start`` (pipeline.py:183-190 semantics).

The HF tokenizer for the repetition filter and the flac/ogg encoders are
the model/codec plug points: ``tokenize`` is an injectable callable and
``output_format`` other than ``wav`` raises.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nemo_curator_spark.operators import alm_finalize as FZ
from nemo_curator_spark.operators import alm_io as IO
from nemo_curator_spark.operators import alm_planning as P

_SEG_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("start", T.DoubleType()),
        T.StructField("end", T.DoubleType()),
        T.StructField("text", T.StringType()),
    ]
)


def _segments_df(spark: SparkSession, entries: list[dict]) -> DataFrame:
    """Fan the manifest out to (file_id, start, end, text) rows, one
    Arrow pass over the (fid, entry JSON) frame."""
    base = spark.createDataFrame(
        [(i, json.dumps(e, ensure_ascii=False)) for i, e in enumerate(entries)],
        "file_id bigint, entry string",
    ).repartition(max(1, min(len(entries), 256)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, raw in zip(pdf["file_id"], pdf["entry"]):
                for seg in json.loads(raw).get("segments") or []:
                    rows.append(
                        (
                            int(fid),
                            float(seg.get("start", 0.0)),
                            float(seg.get("end", 0.0)),
                            seg.get("text"),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["file_id", "start", "end", "text"]
            )

    return base.mapInPandas(gen, _SEG_SCHEMA)


def run_audio_pretrain_pipeline(  # noqa: PLR0913
    spark: SparkSession,
    *,
    input_manifest: str,
    audio_dir: str,
    output_manifest_path: str,
    output_audio_tar_path: str,
    metrics_path: str,
    max_duration_sec: float,
    tokenize: Callable[[str], list[int]] | None = None,
    min_duration_sec: float = 0.5,
    min_overlap_sec: float = 0.5,
    max_segment_gap_in_snippet: float = 30.0,
    ngram_n: int = 10,
    ngram_max_count: int = 3,
    output_format: str = "wav",
    audio_filepath_key: str = "audio_filepath",
    audio_path_resolution: str = IO.AUDIO_PATH_RESOLUTION_BASENAME,
    dry_run: bool = False,
) -> dict[str, Any]:
    if output_format != "wav":
        raise NotImplementedError(
            f"output_format={output_format!r}: flac/ogg encoders are codec "
            "plug points (reference uses torchaudio); wav is the in-sandbox "
            "format"
        )
    FZ.prepare_audio_pretrain_outputs(
        output_manifest_path, metrics_path, output_audio_tar_path
    )
    entries = IO.read_long_form_manifest(
        input_manifest, audio_dir, audio_filepath_key, audio_path_resolution
    )
    if not entries:
        FZ.merge_manifest_shards(output_manifest_path)
        with open(metrics_path, "w", encoding="utf-8") as f:
            json.dump(FZ.build_final_summary({}, []), f, indent=2)
        return {"num_input_audios": 0, "num_output_snippets": 0}

    id_by_fid = {i: e["id"] for i, e in enumerate(entries)}
    path_by_fid = {i: e[audio_filepath_key] for i, e in enumerate(entries)}

    seg_df = _segments_df(spark, entries)
    plan = P.alm_snippet_plan(
        seg_df,
        max_duration_sec=max_duration_sec,
        min_duration_sec=min_duration_sec,
        max_segment_gap_in_snippet=max_segment_gap_in_snippet,
        min_overlap_sec=min_overlap_sec,
        tokenize=tokenize,
        ngram_n=ngram_n,
        ngram_max_count=ngram_max_count,
    ).localCheckpoint()  # planned twice (manifest + extraction) — cut lineage

    if dry_run:
        durations = None
    else:
        audio_rows = [
            (fid, id_by_fid[fid], p) for fid, p in path_by_fid.items()
        ]
        files_df = spark.createDataFrame(
            audio_rows, "file_id bigint, _orig_id string, path string"
        ).repartition(max(1, min(len(audio_rows), 64)))

        @F.pandas_udf(T.BinaryType())
        def _read_wav(paths: pd.Series) -> pd.Series:
            return paths.map(lambda p: open(p, "rb").read())

        audio_df = files_df.withColumn("wav", _read_wav(F.col("path")))
        extracted = P.alm_extract_snippets(audio_df, plan, id_col="_orig_id")
        # ONE job: cut snippets, write tar shards, and emit per-snippet
        # bookkeeping rows (duration) — localCheckpoint materializes only
        # the bookkeeping (bytes stay on the scan side, written out as
        # the side effect), and pins the tar write to exactly one run.
        book = _write_tar_shards(
            extracted, output_audio_tar_path, output_format
        ).localCheckpoint()
        durations = book.select("file_id", "snippet_idx", "duration_sec")

    manifest_df = _snippet_entries(
        spark, plan, id_by_fid, output_format, durations
    )
    IO.write_manifest_shards(manifest_df, output_manifest_path).collect()
    _write_metrics_shards(manifest_df, entries, metrics_path)

    n_manifest = FZ.merge_manifest_shards(output_manifest_path)
    summary = FZ.merge_metrics_shards(metrics_path) or {}
    n_tar = 0 if dry_run else FZ.merge_tar_shards(output_audio_tar_path)
    return {
        "num_input_audios": len(entries),
        "num_output_snippets": n_manifest,
        "num_tar_members": n_tar,
        "metrics": summary,
    }


def _snippet_entries(
    spark: SparkSession,
    plan: DataFrame,
    id_by_fid: dict[int, str],
    output_format: str,
    durations: DataFrame | None,
) -> DataFrame:
    """Plan rows -> one manifest entry JSON per snippet (io.py row
    contract: snippet_id, tar-internal audio_filepath, duration,
    snippet-relative segments). ``durations`` (measured from the cut
    waveforms) joins in distributed; absent rows — dry_run, or a
    snippet whose range fell off the end of the audio — fall back to
    ``snip_end - snip_start`` (pipeline.py:183-190 dry-run semantics)."""
    ids_df = F.broadcast(
        spark.createDataFrame(
            list(id_by_fid.items()), "file_id bigint, _orig_id string"
        )
    )
    grouped = (
        plan.join(ids_df, "file_id")
        .groupBy("file_id", "_orig_id", "snippet_idx", "snip_start", "snip_end")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("seg_pos", "seg_start_rel", "seg_end_rel", "seg_text")
                )
            ).alias("_segs")
        )
    )
    if durations is not None:
        grouped = grouped.join(
            durations.withColumnRenamed("duration_sec", "_dur"),
            on=["file_id", "snippet_idx"],
            how="left",
        )
    else:
        grouped = grouped.withColumn("_dur", F.lit(None).cast("double"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                snippet_id = P.make_snippet_id(
                    str(r["_orig_id"]), float(r["snip_start"]), float(r["snip_end"])
                )
                dur = r["_dur"]
                if dur is None or pd.isna(dur):
                    dur = float(r["snip_end"]) - float(r["snip_start"])
                entry = {
                    "id": str(r["_orig_id"]),
                    "snippet_id": snippet_id,
                    "audio_filepath": f"{snippet_id}.{output_format}",
                    "duration": float(dur),
                    "segments": [
                        {
                            "start": float(s["seg_start_rel"]),
                            "end": float(s["seg_end_rel"]),
                            "text": s["seg_text"],
                        }
                        for s in r["_segs"]
                    ],
                }
                out.append(json.dumps(entry, ensure_ascii=False))
            yield pd.DataFrame({"entry": out})

    return grouped.mapInPandas(
        gen, T.StructType([T.StructField("entry", T.StringType())])
    )


_TAR_BOOK_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("snippet_idx", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("shard", T.StringType()),
    ]
)


def _write_tar_shards(
    extracted: DataFrame, output_audio_tar_path: str, output_format: str
) -> DataFrame:
    """One tar shard per partition (tmp+rename inside write_tar_shard),
    members named ``<snippet_id>.<fmt>``. Returns one BOOKKEEPING row
    per written member (file_id, snippet_idx, duration_sec, shard) —
    the bytes are consumed here; only these small rows flow on."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        members = []
        book = []
        for pdf in it:
            for _, r in pdf.iterrows():
                members.append(
                    (f"{r['snippet_id']}.{output_format}", bytes(r["wav"]))
                )
                book.append(
                    (
                        int(r["file_id"]),
                        int(r["snippet_idx"]),
                        float(r["duration_sec"]),
                    )
                )
        shard = IO.make_shard_path(
            output_audio_tar_path, FZ.TAR_SHARD_EXT, replica=f"p{pid:05d}"
        )
        if members:
            parent = os.path.dirname(shard)
            if parent:
                os.makedirs(parent, exist_ok=True)
            FZ.write_tar_shard(shard, members)
        yield pd.DataFrame(
            [(f, s, d, shard) for f, s, d in book],
            columns=["file_id", "snippet_idx", "duration_sec", "shard"],
        )

    return extracted.select(
        "file_id", "snippet_idx", "snippet_id", "duration_sec", "wav"
    ).mapInPandas(gen, _TAR_BOOK_SCHEMA)


def _write_metrics_shards(
    manifest_df: DataFrame, entries: list[dict], metrics_path: str
) -> None:
    """One metrics record per snippet + one stub per original file with
    the input-side counters (io.py:347-368 fields), sharded per
    partition and merged by ``alm_finalize.merge_metrics_shards``."""
    meta_by_id = {
        e["id"]: {
            "original_seg_count": len(e.get("segments") or []),
            "original_seg_duration": sum(
                float(s.get("end", 0.0)) - float(s.get("start", 0.0))
                for s in (e.get("segments") or [])
            ),
        }
        for e in entries
    }

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        shard = IO.make_shard_path(
            metrics_path, IO.METRICS_SHARD_EXT, replica=f"p{pid:05d}"
        )
        parent = os.path.dirname(shard)
        if parent:
            os.makedirs(parent, exist_ok=True)
        n = 0
        tmp = shard + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for pdf in it:
                for raw in pdf["entry"]:
                    entry = json.loads(raw)
                    rec = IO.metrics_record(
                        entry, meta_by_id.get(entry["id"], {}), is_stub=False
                    )
                    f.write(json.dumps(rec, ensure_ascii=False) + "\n")
                    n += 1
        os.replace(tmp, shard)
        yield pd.DataFrame({"shard": [shard], "n_rows": [n]})

    manifest_df.mapInPandas(
        gen,
        T.StructType(
            [
                T.StructField("shard", T.StringType()),
                T.StructField("n_rows", T.LongType()),
            ]
        ),
    ).collect()
    # driver-side stub shard: input-side counters for every original file
    # (merge takes first-record-wins for input fields; stubs add no output)
    stub_shard = IO.make_shard_path(metrics_path, IO.METRICS_SHARD_EXT, "stubs")
    with open(stub_shard, "w", encoding="utf-8") as f:
        for e in entries:
            rec = IO.metrics_record(
                {"id": e["id"]}, meta_by_id[e["id"]], is_stub=True
            )
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")

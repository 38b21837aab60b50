"""Interleaved WebDataset (MINT1T-style) reader/writer — reference
stages/interleaved/io/readers/webdataset.py + writers/webdataset.py,
re-expressed Spark-first over stdlib ``tarfile`` (fsspec/pyarrow-backed
tasks there; plain local/posix paths here).

Layout per shard: each sample is a ``{key}.json`` member holding
parallel ``texts`` / ``images`` arrays (``None`` placeholders keep the
interleaving positions) plus the referenced image members. The row-wise
schema matches the reference's INTERLEAVED_SCHEMA
(tasks/interleaved.py:55-66): one ``metadata`` row per sample
(position -1, sample-level passthrough columns), one ``text`` row per
non-null text (position = array index), one ``image`` row per non-null
image (bytes materialized from the tar member, content_type from the
member name).

Spark shape:

* **read**: the tar paths are the unit of parallelism — one task per
  shard, ``mapInPandas`` over a paths frame, no shuffle (a shard's rows
  are produced where its tar is read). Passthrough fields are declared
  up front (``fields`` / ``per_image_fields`` / ``per_text_fields``,
  reference reader params) and come out as string columns
  (dict/list values JSON-encoded, the reference's per-modality
  convention).
* **write**: rows are hash-repartitioned by ``sample_id`` into
  ``num_shards`` and each partition writes ONE tar via tmp+rename, so
  task retries are idempotent (same partition -> same shard name ->
  atomic replace; the megatron-writer protocol). Sample order inside a
  shard is sorted (sample_id, position) — deterministic output for a
  deterministic input.

Round-trip (write -> read) restores reserved columns + passthrough
exactly; pinned by tests/test_webdataset.py.
"""

from __future__ import annotations

import json
import mimetypes
import os
import tarfile
import urllib.parse
from io import BytesIO

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# writers/webdataset.py:36-44 — extension table for common image types
CONTENT_TYPE_TO_EXT = {
    "image/jpeg": "jpg",
    "image/png": "png",
    "image/tiff": "tiff",
    "image/webp": "webp",
    "image/gif": "gif",
    "image/bmp": "bmp",
    "image/avif": "avif",
}

RESERVED = (
    "sample_id",
    "position",
    "modality",
    "content_type",
    "text_content",
    "binary_content",
    "source_ref",
    "materialize_error",
)


def escape_key(sample_id: str) -> str:
    """writers/webdataset.py:46-48: percent-encode so any sample id is a
    safe tar member stem. ``quote`` leaves ``.`` alone (it is an
    unreserved character), but a dot in the stem breaks WebDataset's
    first-dot key grouping AND this reader's sample detection — so it is
    escaped explicitly (``unquote`` still round-trips %2E)."""
    return urllib.parse.quote(sample_id, safe="").replace(".", "%2E")


def ext_from_content_type(content_type: str | None) -> str:
    if content_type:
        ext = CONTENT_TYPE_TO_EXT.get(content_type)
        if ext:
            return ext
        guessed = mimetypes.guess_extension(content_type, strict=False)
        if guessed:
            return guessed.lstrip(".")
    return "bin"


def _interleaved_schema(passthrough: list[str]) -> T.StructType:
    fields = [
        T.StructField("sample_id", T.StringType(), False),
        T.StructField("position", T.IntegerType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("content_type", T.StringType()),
        T.StructField("text_content", T.StringType()),
        T.StructField("binary_content", T.BinaryType()),
        T.StructField("source_ref", T.StringType()),
        T.StructField("materialize_error", T.StringType()),
    ]
    fields += [T.StructField(c, T.StringType()) for c in passthrough]
    return T.StructType(fields)


def _passthrough_value(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, (dict, list)):
        return json.dumps(v, ensure_ascii=False)
    return str(v)


def _rows_from_tar(
    tar_path: str,
    texts_field: str,
    images_field: str,
    fields: list[str],
    per_image_fields: list[str],
    per_text_fields: list[str],
) -> list[dict]:
    """Parse one shard into interleaved rows (reader semantics:
    readers/webdataset.py:120-250 — metadata row first, then content
    rows sorted by position; None placeholders skipped; image bytes
    materialized; per-modality passthrough distributed by non-None
    counter)."""
    rows: list[dict] = []
    with tarfile.open(tar_path) as tf:
        members = {m.name: m for m in tf.getmembers() if m.isfile()}
        # sample JSONs are '<escaped-key>.json' where the escaped key
        # contains no dots — the one-dot rule keeps binary members that
        # happen to carry a .json extension (e.g. an image row with
        # content_type application/json names '<key>.0000.json') from
        # being misparsed as samples
        sample_names = sorted(
            n for n in members if n.endswith(".json") and n.count(".") == 1
        )
        for json_name in sample_names:
            key = json_name[: -len(".json")]
            sample = json.loads(tf.extractfile(members[json_name]).read())
            sample_id = urllib.parse.unquote(key)
            base = {c: None for c in fields + per_image_fields + per_text_fields}

            meta = dict(base)
            for c in fields:
                if c in sample:
                    meta[c] = _passthrough_value(sample[c])
            rows.append(
                {
                    "sample_id": sample_id,
                    "position": -1,
                    "modality": "metadata",
                    "content_type": "application/json",
                    "text_content": None,
                    "binary_content": None,
                    "source_ref": f"{tar_path}#{json_name}",
                    "materialize_error": None,
                    **meta,
                }
            )

            content: list[dict] = []
            texts = sample.get(texts_field) or []
            n_text = 0
            for idx, tv in enumerate(texts):
                if tv is None:
                    continue
                row = {
                    "sample_id": sample_id,
                    "position": idx,
                    "modality": "text",
                    "content_type": "text/plain",
                    "text_content": str(tv),
                    "binary_content": None,
                    "source_ref": f"{tar_path}#{json_name}",
                    "materialize_error": None,
                    **base,
                }
                for c in per_text_fields:
                    vals = sample.get(c) or []
                    if n_text < len(vals):
                        row[c] = _passthrough_value(vals[n_text])
                n_text += 1
                content.append(row)

            images = sample.get(images_field) or []
            n_img = 0
            for idx, member_name in enumerate(images):
                if member_name is None:
                    continue
                ctype, _ = mimetypes.guess_type(member_name)
                blob, err = None, None
                if member_name in members:
                    blob = tf.extractfile(members[member_name]).read()
                else:
                    err = f"missing member: {member_name}"
                row = {
                    "sample_id": sample_id,
                    "position": idx,
                    "modality": "image",
                    "content_type": ctype or "application/octet-stream",
                    "text_content": None,
                    "binary_content": blob,
                    "source_ref": f"{tar_path}#{member_name}",
                    "materialize_error": err,
                    **base,
                }
                for c in per_image_fields:
                    vals = sample.get(c) or []
                    if n_img < len(vals):
                        row[c] = _passthrough_value(vals[n_img])
                n_img += 1
                content.append(row)

            content.sort(key=lambda r: r["position"])
            rows.extend(content)
    return rows


def read_webdataset(
    spark: SparkSession,
    paths: list[str],
    texts_field: str = "texts",
    images_field: str = "images",
    fields: list[str] | None = None,
    per_image_fields: list[str] | None = None,
    per_text_fields: list[str] | None = None,
) -> DataFrame:
    """One Spark task per shard; no shuffle. ``fields`` = sample-level
    passthrough keys; ``per_image_fields`` / ``per_text_fields`` =
    parallel-array keys distributed onto content rows (reference reader
    params of the same names)."""
    fields = list(fields or [])
    pif = list(per_image_fields or [])
    ptf = list(per_text_fields or [])
    schema = _interleaved_schema(fields + pif + ptf)
    cols = [f.name for f in schema.fields]
    pdf = spark.createDataFrame([(p,) for p in paths], "tar_path string")

    def gen(it):
        for chunk in it:
            for tar_path in chunk["tar_path"]:
                rows = _rows_from_tar(
                    tar_path, texts_field, images_field, fields, pif, ptf
                )
                yield pd.DataFrame(rows, columns=cols)

    return pdf.mapInPandas(gen, schema)


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    num_shards: int = 8,
    texts_field: str = "texts",
    images_field: str = "images",
    fields: list[str] | None = None,
    per_image_fields: list[str] | None = None,
    per_text_fields: list[str] | None = None,
) -> DataFrame:
    """Hash-repartition samples into ``num_shards`` tars under
    ``out_dir``; returns one row per shard (shard path, sample count).
    Idempotent under task retries (tmp + atomic rename keyed on the
    shard number)."""
    fields = list(fields or [])
    pif = list(per_image_fields or [])
    ptf = list(per_text_fields or [])
    os.makedirs(out_dir, exist_ok=True)
    out_schema = T.StructType(
        [
            T.StructField("shard", T.StringType()),
            T.StructField("n_samples", T.LongType()),
        ]
    )

    def write_partition(it):
        pdfs = list(it)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        # a partition holds whole _shard groups but may hold several
        # (hash(_shard) % partitions is not the identity) — one tar per
        # group either way
        for pid, spdf in pdf.groupby("_shard", sort=True):
            yield _write_shard(int(pid), spdf)

    def _write_shard(pid: int, pdf: pd.DataFrame) -> pd.DataFrame:
        shard_path = os.path.join(out_dir, f"shard-{pid:05d}.tar")
        tmp = shard_path + f".tmp{os.getpid()}"
        n = 0
        with tarfile.open(tmp, "w") as tf:
            for sample_id, g in sorted(
                pdf.groupby("sample_id", sort=True), key=lambda kv: kv[0]
            ):
                g = g.sort_values("position")
                key = escape_key(str(sample_id))
                max_pos = int(g["position"].max()) if len(g) else -1
                texts = [None] * (max_pos + 1)
                images = [None] * (max_pos + 1)
                sample: dict = {}
                img_i = 0
                per_img: dict = {c: [] for c in pif}
                per_txt: dict = {c: [] for c in ptf}
                for _, r in g.iterrows():
                    if r["modality"] == "metadata":
                        for c in fields:
                            if c in g.columns and r[c] is not None and not (
                                isinstance(r[c], float) and pd.isna(r[c])
                            ):
                                try:
                                    sample[c] = json.loads(r[c])
                                except (ValueError, TypeError):
                                    sample[c] = r[c]
                    elif r["modality"] == "text":
                        texts[int(r["position"])] = r["text_content"]
                        for c in ptf:
                            per_txt[c].append(
                                None if pd.isna(r.get(c)) else r.get(c)
                            )
                    elif r["modality"] == "image":
                        ext = ext_from_content_type(r["content_type"])
                        member = f"{key}.{img_i:04d}.{ext}"
                        images[int(r["position"])] = member
                        blob = r["binary_content"]
                        if blob is not None:
                            data = bytes(blob)
                            info = tarfile.TarInfo(member)
                            info.size = len(data)
                            tf.addfile(info, BytesIO(data))
                        for c in pif:
                            per_img[c].append(
                                None if pd.isna(r.get(c)) else r.get(c)
                            )
                        img_i += 1
                sample[texts_field] = texts
                sample[images_field] = images
                for c, vals in {**per_img, **per_txt}.items():
                    if any(v is not None for v in vals):
                        sample[c] = vals
                data = json.dumps(sample, ensure_ascii=False).encode()
                info = tarfile.TarInfo(f"{key}.json")
                info.size = len(data)
                tf.addfile(info, BytesIO(data))
                n += 1
        os.replace(tmp, shard_path)
        return pd.DataFrame({"shard": [shard_path], "n_samples": [n]})

    sharded = df.withColumn(
        "_shard", F.pmod(F.xxhash64("sample_id"), F.lit(num_shards))
    ).repartition(num_shards, "_shard")
    return sharded.mapInPandas(write_partition, out_schema)

"""Image IO — reference stages/image/io/{image_reader,image_writer,
convert}.py: WebDataset tar-shard reading (DALI there; the tar walk +
an injectable decoder here), tar + parquet re-sharding with the
reference's deterministic naming, and the ImageBatch -> DocumentBatch
field projection.

Parity notes:

* Reader naming (image_reader.py:99-124): sample ids are
  ``{prefix}_{idx:06d}`` with the index running across the whole task's
  sample stream; ``prefix`` is the tar stem for a single shard and
  ``group_{stem}_x{n}`` for a grouped task; synthesized image paths sit
  under the single tar path (or the group's parent dir).
* Writer naming (image_writer.py:66-79): ``images-{sha256("|".join(
  sorted(paths)) + "|" + seed)[:12]}-{chunk:06d}`` — content-addressed,
  so task retries overwrite with identical bytes (idempotent).
* Decode/encode are injectable; the default handles the repo's real
  stdlib codecs (netpbm P5/P6, uncompressed BMP) and leaves JPEG to a
  DALI/PIL plug point, exactly the multimodal-codec posture
  (operators/multimodal.py).

Spark shape: tar paths are the unit of parallelism (one task per shard
group, ``mapInPandas`` over a paths frame — a shard's rows are produced
where its tar is read, no shuffle); the writer packs each PARTITION as
one reference "batch", so output shard count follows the input
partitioning and nothing funnels through the driver.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib
import tarfile
from io import BytesIO

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql import types as T


def group_id_prefix(tar_paths: list[str]) -> str:
    """image_reader.py:100-101: stem for one shard, group prefix for
    several."""
    first = pathlib.Path(tar_paths[0])
    if len(tar_paths) == 1:
        return first.stem
    return f"group_{first.stem}_x{len(tar_paths)}"


def group_base_path(tar_paths: list[str]) -> str:
    first = pathlib.Path(tar_paths[0])
    return str(first if len(tar_paths) == 1 else first.parent)


def default_decode(raw: bytes, ext: str) -> tuple[int, int, int, bytes]:
    """(width, height, channels, rgb_bytes) via the repo's real stdlib
    codecs; JPEG/PNG raise (DALI `fn.decoders.image` / PIL are the plug
    points, image_reader.py:60-88)."""
    from nemo_curator_spark.operators.multimodal import _decode

    w, h, c, pixels = _decode(bytes(raw))
    return w, h, c, pixels.tobytes()


def default_encode(image: np.ndarray) -> tuple[bytes, str]:
    """The writer's encode contract (image_writer.py:81-105) with the
    netpbm codec in place of PIL JPEG: dtype clipped to uint8, 2-D ->
    grayscale P5, RGBA -> alpha dropped (P6 is 3-channel), returns
    ``(payload, ext)``."""
    from nemo_curator_spark.operators.multimodal import encode_ppm

    img = image
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    if img.ndim == 3 and img.shape[2] not in (1, 3):
        img = img[..., :3]
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    return encode_ppm(img), ".ppm"


_READ_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("image_path", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("image_data", T.BinaryType()),
    ]
)


def read_image_shards(
    spark: SparkSession,
    tar_groups: list[list[str]] | list[str],
    extensions: tuple[str, ...] = ("jpg",),
    decode=default_decode,
) -> DataFrame:
    """ImageReaderStage over tar shards: one task per shard group, tar
    members filtered by extension in archive order (DALI's webdataset
    reader order), decoded via the injectable codec into raw uint8 RGB
    bytes + typed shape columns. ``missing_component_behavior='skip'``
    parity: non-matching members are skipped silently."""
    groups = [
        [g] if isinstance(g, str) else list(g) for g in tar_groups
    ]
    if not groups:
        msg = "No tar file paths in task"
        raise ValueError(msg)
    exts = {e.lower().lstrip(".") for e in extensions}
    pdf = pd.DataFrame({"group": [json.dumps(g) for g in groups]})
    df = spark.createDataFrame(pdf).repartition(max(1, len(groups)))

    def gen(it):
        for chunk in it:
            for g_json in chunk["group"]:
                paths = json.loads(g_json)
                prefix = group_id_prefix(paths)
                base = pathlib.Path(group_base_path(paths))
                rows = []
                idx = 0
                for tar_path in paths:
                    with tarfile.open(tar_path, "r") as tf:
                        for m in tf:
                            if not m.isfile():
                                continue
                            ext = m.name.rsplit(".", 1)[-1].lower()
                            if ext not in exts:
                                continue
                            raw = tf.extractfile(m).read()
                            w, h, c, data = decode(raw, ext)
                            rows.append(
                                (
                                    f"{prefix}_{idx:06d}",
                                    str(base / f"{prefix}_{idx:06d}.jpg"),
                                    w,
                                    h,
                                    c,
                                    data,
                                )
                            )
                            idx += 1
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "image_id", "image_path", "width", "height",
                        "channels", "image_data",
                    ],
                )

    return df.mapInPandas(gen, _READ_SCHEMA)


def deterministic_hash(inputs: list[str], seed: str = "") -> str:
    """image_writer.py:69-72, exact."""
    combined = "|".join(sorted(inputs)) + "|" + seed
    return hashlib.sha256(combined.encode()).hexdigest()[:12]


def _write_file_atomic(path: str, payload: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as fp:
        fp.write(payload)
    os.replace(tmp, path)


_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("base_name", T.StringType()),
        T.StructField("n_images", T.IntegerType()),
    ]
)


def write_image_shards(
    df: DataFrame,
    output_dir: str,
    images_per_tar: int = 1000,
    encode=default_encode,
    name_seed: str = "",
) -> DataFrame:
    """ImageWriterStage: pack each partition (= one reference batch) into
    tars of at most ``images_per_tar`` members plus a same-base-name
    metadata parquet per tar (image_id / tar_file / member_name /
    original_path / metadata-repr — image_writer.py:129-226).
    Deterministic content-addressed names; rewrites are byte-identical
    (tmp + rename), so retries are safe. Input columns: image_id,
    image_path, width, height, channels, image_data (raw uint8),
    optional ``metadata`` (JSON string)."""
    os.makedirs(output_dir, exist_ok=True)

    def gen(it):
        parts = [p for p in it if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        base_prefix = "images-" + deterministic_hash(
            [str(p) for p in pdf["image_path"]], name_seed
        )
        out_rows = []
        for start in range(0, len(pdf), images_per_tar):
            chunk = pdf.iloc[start : start + images_per_tar]
            chunk_index = start // images_per_tar
            base_name = f"{base_prefix}-{chunk_index:06d}"
            members, meta_rows = [], []
            tar_path = os.path.join(output_dir, f"{base_name}.tar")
            for pos, (_, r) in enumerate(chunk.iterrows()):
                if r["image_data"] is None:
                    msg = (
                        "ImageObject.image_data is None; cannot write "
                        "image bytes"
                    )
                    raise ValueError(msg)
                arr = np.frombuffer(
                    bytes(r["image_data"]), dtype=np.uint8
                )
                c = int(r["channels"])
                shape = (
                    (int(r["height"]), int(r["width"]))
                    if c == 1
                    else (int(r["height"]), int(r["width"]), c)
                )
                payload, ext = encode(arr.reshape(shape))
                member_basename = r["image_id"] or f"{start + pos:06d}"
                members.append((f"{member_basename}{ext}", payload))
                md = r["metadata"] if "metadata" in chunk.columns else None
                meta_rows.append(
                    {
                        "image_id": member_basename,
                        "tar_file": tar_path,
                        "member_name": f"{member_basename}{ext}",
                        "original_path": r["image_path"],
                        "metadata": repr(json.loads(md))
                        if isinstance(md, str)
                        else str(md),
                    }
                )
            if not members:
                continue
            buf = BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for name, payload in members:
                    info = tarfile.TarInfo(name=name)
                    info.size = len(payload)
                    tf.addfile(info, BytesIO(payload))
            _write_file_atomic(tar_path, buf.getvalue())
            pq_path = os.path.join(output_dir, f"{base_name}.parquet")
            pbuf = BytesIO()
            pd.DataFrame(meta_rows).to_parquet(pbuf, index=False)
            _write_file_atomic(pq_path, pbuf.getvalue())
            out_rows.append((tar_path, "tar", base_name, len(members)))
            out_rows.append((pq_path, "parquet", base_name, len(members)))
        yield pd.DataFrame(
            out_rows, columns=["path", "kind", "base_name", "n_images"]
        )

    return df.mapInPandas(gen, _WRITE_SCHEMA)


def images_to_documents(
    df: DataFrame, fields: list[str] | None = None
) -> DataFrame:
    """ConvertImageBatchToDocumentBatchStage (convert.py:23-53): project
    the requested ImageObject fields into a plain row frame; default is
    ``image_id`` alone. Missing fields come out as NULL columns (the
    reference's ``getattr(..., None)``)."""
    wanted = fields or ["image_id"]
    cols = []
    for name in wanted:
        if name in df.columns:
            cols.append(F.col(name))
        else:
            cols.append(F.lit(None).cast("string").alias(name))
    return df.select(*cols)

"""Image deduplication workflow (reference ``stages/image/deduplication/*``
+ ``stages/image/embedders/*`` shape, Spark-first).

The reference pipeline is: CLIP-embed every image → generic semantic
dedup over the embeddings → ``ImageDuplicatesRemovalStage`` drops the
images whose ids land in the removal parquet
(reference ``image/deduplication/removal.py:27-118``). Here the CLIP
embedder (GPU/model-gated, absent in this environment) is replaced by a
deterministic pixel-feature embedder that runs the REAL binary-codec
path — decode → nearest-neighbor resize → flatten — so the Spark-side
plumbing (binary column, Arrow batching, schema, partitioning) is
exercised end to end with exactly-integer features the correctness gate
can value-hash. A real CLIP model plugs in by swapping
:func:`image_feature_vectors` for an ``EmbedderStage`` with
``embed_batch``.

Scale shape: feature extraction is one Arrow projection on scan
partitions (no shuffle); duplicate identification reuses
``semantic.semantic_duplicate_ids`` (bounded KMeans fit + one shuffle on
cluster id + capped within-cluster ranking); removal is a broadcast-able
anti-join on the id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nemo_curator_spark.operators import multimodal, semantic


def image_feature_vectors(
    df: DataFrame,
    image_col: str = "image",
    id_col: str = "image_id",
    size: int = 8,
    out_col: str = "embedding",
) -> DataFrame:
    """(id, image-binary) → (id, array<double> feature vector).

    Decodes the PPM binary through the real codec, nearest-neighbor
    resizes to ``size``×``size`` (the same path image_resize_stats
    gates), and flattens the raw integer pixel values. Deterministic and
    exactly integer-valued — the CLIP plug point at scale."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _feats(raws: pd.Series) -> pd.Series:
        out = []
        for raw in raws:
            resized = multimodal.resize_nearest(bytes(raw), size, size)
            _, _, _, px = multimodal.decode_ppm(resized)
            out.append(px.astype(np.float64).ravel())
        return pd.Series(out)

    return df.select(
        F.col(id_col), _feats(F.col(image_col)).alias(out_col)
    )


def image_duplicate_ids(
    df: DataFrame,
    image_col: str = "image",
    id_col: str = "image_id",
    k: int | None = None,
    threshold: float = 0.99,
    seed: int = 42,
    clip_model_path: str | None = None,
) -> DataFrame:
    """Removal ids for (near-)duplicate images: embed → semantic dedup.

    Mirrors the reference's two-stage flow (embedders → semantic dedup →
    removal parquet): the returned DataFrame is exactly what the
    reference writes to ``removal_parquets_dir``. Pass
    ``clip_model_path`` to embed with the REAL MiniCLIP ViT
    (operators/clip_mini.py — decode + resize preprocessing, normalized
    768-d output, the reference's clip_embedder.py role) instead of the
    pixel-feature stand-in."""
    if clip_model_path is not None:
        from nemo_curator_spark.operators import clip_mini

        feats = clip_mini.clip_image_embeddings(
            df, clip_model_path, id_col=id_col, image_col=image_col,
            input_format="encoded",
        )
    else:
        feats = image_feature_vectors(df, image_col, id_col)
    return semantic.semantic_duplicate_ids(
        feats, id_col=id_col, vec_col="embedding", k=k,
        threshold=threshold, seed=seed,
    )


def remove_duplicate_images(
    df: DataFrame, removal_ids: DataFrame, id_col: str = "image_id"
) -> DataFrame:
    """ImageDuplicatesRemovalStage (removal.py:27-118) as an anti-join:
    drop every image whose id appears in the removal set. AQE broadcasts
    the removal side when it is small (the usual case)."""
    return df.join(
        removal_ids.select(id_col).distinct(), on=id_col, how="left_anti"
    )


def image_dedup_pipeline(
    df: DataFrame,
    image_col: str = "image",
    id_col: str = "image_id",
    k: int | None = None,
    threshold: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """End-to-end image dedup: identify duplicates, anti-join them away."""
    ids = image_duplicate_ids(df, image_col, id_col, k, threshold, seed)
    return remove_duplicate_images(df, ids, id_col)


def synth_gradient_image(image_id: int) -> bytes:
    """Deterministic PPM test image: seeded-random pixels keyed on
    ``image_id``, so distinct ids give decorrelated images (cosine of
    their pixel features ~0.75, far below any dedup threshold) while
    equal ids give byte-identical images. Gradient images (the
    image_resize_stats recipe) are nearly collinear across ids — every
    pair crossed 0.99 cosine, which made a dedup test vacuous."""
    i = int(image_id)
    w, h = 16 + i % 16, 12 + i % 8
    rng = np.random.RandomState(i % (2**31 - 1))
    img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    return multimodal.encode_ppm(img)


def with_synth_images(
    df: DataFrame, id_col: str = "image_id", content_key_col: str | None = None,
    image_col: str = "image",
) -> DataFrame:
    """Attach a deterministic synthetic image per row. ``content_key_col``
    (default: the id itself) drives the pixel content — two rows with the
    same key get byte-identical images (how tests plant duplicates)."""
    key = content_key_col or id_col

    @F.pandas_udf(T.BinaryType())
    def _img(keys: pd.Series) -> pd.Series:
        return pd.Series([synth_gradient_image(k) for k in keys])

    return df.withColumn(image_col, _img(F.col(key)))

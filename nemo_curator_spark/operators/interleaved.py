"""Interleaved (multimodal document) stages — reference
stages/interleaved/filter/*: documents are row groups sharing a
``sample_id``, each row one segment with ``modality`` in {text, image},
text in ``text_content``, image payload in a binary column.

Implemented for real:

* :func:`image_to_text_ratio_filter` — drop WHOLE samples whose
  images-per-word ratio falls outside [min, max]
  (image_to_text_ratio_filter.py:39-71; pure relational — one groupBy +
  semi-join, fully SQL-oracled by the gate).
* :func:`laplacian_variance` / :func:`blur_filter` — drop blurry image
  ROWS by Laplacian-variance sharpness (blur_filter.py:45-84; cv2 is
  absent, so the 4-neighbor Laplacian with REFLECT_101 borders — exactly
  cv2.Laplacian's default ksize=1 kernel — is computed in numpy over the
  repo's PPM/BMP codecs). Undecodable/None images are dropped, matching
  the stage.

Round-6 additions:

* :func:`reindex_after_filter` — the base filter stage's post-filter
  contract (stages.py:120-131): content positions re-indexed densely
  per sample, metadata rows of emptied samples pruned. Pure
  window + semi-join (one exchange, SQL-oracled).
* :func:`aspect_ratio_filter` — width/height bounds over the repo's
  real codecs (stages.py:134-176; Pillow is the reference's decoder).
* :func:`qr_code_filter` — QR-area-ratio drop (qrcode_filter.py:43-96):
  the detector is injectable (cv2.QRCodeDetector there); the area math
  (shoelace polygon area == cv2.contourArea) and the
  ratio-vs-threshold / failure-scores-zero semantics are exact.
* :func:`clip_score_filter` — best image-text pair similarity gate
  (clip_score_filter.py:48-116): the CLIP model is injectable
  (``model(images) -> emb``, ``model.encode_text(texts) -> emb``);
  pairing, no-text drop, undecodable drop, and max-over-pairs >=
  min_score are exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from nemo_curator_spark import constants as C

DEFAULT_BLUR_SCORE_THRESHOLD = 100.0


def word_count_col(text_col: str):
    """JVM words-per-segment: null/empty -> 0, else whitespace split."""
    stripped = F.regexp_replace(F.col(text_col), C.STRIP_PATTERN, "")
    return F.when(
        F.col(text_col).isNull() | (stripped == ""), F.lit(0)
    ).otherwise(F.size(F.split(stripped, C.SPLIT_PATTERN)))


def image_to_text_ratio_filter(
    df: DataFrame,
    min_ratio: float = 0.0,
    max_ratio: float = float("inf"),
    sample_col: str = "sample_id",
    modality_col: str = "modality",
    text_col: str = "text_content",
) -> DataFrame:
    """Keep every row of samples with
    ``min <= image_count / max(word_count, 1) <= max``."""
    stats = df.groupBy(sample_col).agg(
        F.sum((F.col(modality_col) == "image").cast("long")).alias("_n_img"),
        F.sum(
            F.when(F.col(modality_col) == "text", word_count_col(text_col))
            .otherwise(F.lit(0))
        ).alias("_n_words"),
    )
    ratio = F.col("_n_img") / F.greatest(F.col("_n_words"), F.lit(1))
    keep = stats.where(
        (ratio >= min_ratio) & (ratio <= max_ratio)
    ).select(sample_col)
    return df.join(keep, sample_col, "left_semi")


def laplacian_variance(img: np.ndarray) -> float:
    """Variance of the 4-neighbor Laplacian with REFLECT_101 borders —
    cv2.Laplacian(image, CV_64F).var() for the default ksize=1."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    p = np.pad(a, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    lap = (
        p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
        - 4.0 * p[1:-1, 1:-1]
    )
    return float(lap.var())


def blur_filter(
    df: DataFrame,
    score_threshold: float = DEFAULT_BLUR_SCORE_THRESHOLD,
    modality_col: str = "modality",
    image_col: str = "image",
) -> DataFrame:
    """Drop image rows with sharpness below the threshold (text and other
    modalities pass through); undecodable images are dropped too."""

    @F.pandas_udf(T.BooleanType())
    def _keep(modality: pd.Series, image: pd.Series) -> pd.Series:
        from nemo_curator_spark.operators.multimodal import _decode

        out = []
        for m, raw in zip(modality, image):
            if m != "image":
                out.append(True)
                continue
            if raw is None:
                out.append(False)
                continue
            try:
                w, h, c, px = _decode(bytes(raw))
            except Exception:
                out.append(False)
                continue
            sharp = laplacian_variance(px.reshape(h, w, c))
            out.append(bool(sharp >= score_threshold))
        return pd.Series(out)

    return df.where(_keep(F.col(modality_col), F.col(image_col)))


DEFAULT_QRCODE_SCORE_THRESHOLD = 0.05
DEFAULT_CLIP_MIN_SCORE = 0.2


def reindex_after_filter(
    df: DataFrame,
    sample_col: str = "sample_id",
    modality_col: str = "modality",
    position_col: str = "position",
) -> DataFrame:
    """The base filter stage's post-filter bookkeeping (stages.py:
    120-131), Spark-first: content rows get dense per-sample positions
    (row_number over the old order) and metadata rows whose sample lost
    ALL content are pruned. One window exchange + one semi-join."""
    from pyspark.sql.window import Window

    content = df.where(F.col(modality_col) != "metadata")
    w = Window.partitionBy(sample_col).orderBy(position_col)
    content2 = content.withColumn(
        position_col,
        (F.row_number().over(w) - 1).cast(
            dict(df.dtypes)[position_col]
        ),
    )
    meta = df.where(F.col(modality_col) == "metadata").join(
        content.select(sample_col).distinct(), sample_col, "left_semi"
    )
    return content2.unionByName(meta)


def aspect_ratio_filter(
    df: DataFrame,
    min_aspect_ratio: float = 1.0,
    max_aspect_ratio: float = 2.0,
    modality_col: str = "modality",
    image_col: str = "image",
) -> DataFrame:
    """InterleavedAspectRatioFilterStage (stages.py:134-176): drop image
    rows whose width/height falls outside [min, max]; undecodable or
    zero-height images are dropped (the reference's None branches)."""

    @F.pandas_udf(T.BooleanType())
    def _keep(modality: pd.Series, image: pd.Series) -> pd.Series:
        from nemo_curator_spark.operators.multimodal import _decode

        out = []
        for m, raw in zip(modality, image):
            if m != "image":
                out.append(True)
                continue
            if raw is None:
                out.append(False)
                continue
            try:
                w, h, _c, _px = _decode(bytes(raw))
            except Exception:
                out.append(False)
                continue
            if h <= 0:
                out.append(False)
                continue
            ar = float(w) / float(h)
            out.append(bool(min_aspect_ratio <= ar <= max_aspect_ratio))
        return pd.Series(out)

    return df.where(_keep(F.col(modality_col), F.col(image_col)))


def contour_area(points: np.ndarray) -> float:
    """cv2.contourArea equivalent: |shoelace| / 2 over an (N, 2) point
    polygon."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return float(
        abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0
    )


def qr_code_ratio(image: np.ndarray, qr_detect) -> float:
    """qrcode_filter.py:43-71: total detected-QR polygon area over the
    image area; detector failure or no detection scores 0.0.
    ``qr_detect(image) -> iterable of (4, 2) corner arrays | None`` is
    the cv2.QRCodeDetector plug point."""
    h, w = image.shape[:2]
    img_area = float(h * w)
    if img_area <= 0:
        return 0.0
    try:
        points = qr_detect(image)
        if points is None:
            return 0.0
        total = 0.0
        for poly in points:
            total += contour_area(np.asarray(poly))
        return total / img_area
    except Exception:
        return 0.0


def qr_code_filter(
    df: DataFrame,
    qr_detect,
    score_threshold: float = DEFAULT_QRCODE_SCORE_THRESHOLD,
    modality_col: str = "modality",
    image_col: str = "image",
) -> DataFrame:
    """Drop image rows whose QR coverage ratio >= threshold
    (qrcode_filter.py:73-96); undecodable/None images are dropped."""

    @F.pandas_udf(T.BooleanType())
    def _keep(modality: pd.Series, image: pd.Series) -> pd.Series:
        from nemo_curator_spark.operators.multimodal import _decode

        out = []
        for m, raw in zip(modality, image):
            if m != "image":
                out.append(True)
                continue
            if raw is None:
                out.append(False)
                continue
            try:
                w, h, c, px = _decode(bytes(raw))
            except Exception:
                out.append(False)
                continue
            ratio = qr_code_ratio(px.reshape(h, w, c), qr_detect)
            out.append(bool(ratio < score_threshold))
        return pd.Series(out)

    return df.where(_keep(F.col(modality_col), F.col(image_col)))


def clip_score_filter(
    df: DataFrame,
    model,
    min_score: float = DEFAULT_CLIP_MIN_SCORE,
    sample_col: str = "sample_id",
    modality_col: str = "modality",
    text_col: str = "text_content",
    image_col: str = "image",
    colocated: bool = True,
) -> DataFrame:
    """InterleavedCLIPScoreFilterStage (clip_score_filter.py:48-116):
    an image row survives iff its best similarity against ANY text row
    of the same sample reaches ``min_score``; images in text-free
    samples and undecodable images are dropped; non-image rows pass.

    Scale shape: a sample's rows are grouped WITHIN each partition —
    the WebDataset reader emits one shard per task, so a sample's rows
    are already colocated and the image bytes never cross an exchange
    (a groupBy-the-sample form would shuffle every payload; at 100 TB
    the payloads dwarf everything else). For inputs that do NOT
    colocate samples, pass ``colocated=False`` to add the one explicit
    repartition by sample id (the documented cost, not a hidden
    one)."""
    if not colocated:
        df = df.repartition(F.col(sample_col))
    schema = df.schema

    def per_partition(it):
        from nemo_curator_spark.operators.multimodal import _decode

        # concatenate the partition's Arrow batches first: a sample's
        # rows may straddle a batch boundary, and grouping must see the
        # whole sample (the reference materializes the whole task too)
        parts = [p for p in it if len(p)]
        if not parts:
            return
        whole = pd.concat(parts, ignore_index=True)
        for pdf in (whole,):
            keep = pd.Series(True, index=pdf.index, dtype=bool)
            for _, grp in pdf.groupby(sample_col, sort=False):
                img_mask = grp[modality_col] == "image"
                if not img_mask.any():
                    continue
                texts = [
                    s.strip()
                    for s in grp.loc[grp[modality_col] == "text", text_col]
                    .dropna()
                    .astype(str)
                    .tolist()
                    if s.strip()
                ]
                if not texts:
                    keep[grp.index[img_mask]] = False
                    continue
                indices, images = [], []
                for idx in grp.index[img_mask]:
                    raw = grp.loc[idx, image_col]
                    if raw is None:
                        keep.loc[idx] = False
                        continue
                    try:
                        w, h, c, px = _decode(bytes(raw))
                    except Exception:
                        keep.loc[idx] = False
                        continue
                    indices.append(idx)
                    images.append(px.reshape(h, w, c))
                if images:
                    img_emb = np.asarray(model(images), dtype=np.float64)
                    text_emb = np.asarray(
                        model.encode_text(texts), dtype=np.float64
                    )
                    scores = img_emb @ text_emb.T
                    for i, idx in enumerate(indices):
                        keep.loc[idx] = bool(
                            scores[i].max() >= min_score
                        )
            yield pdf[keep]

    return df.mapInPandas(per_partition, schema)

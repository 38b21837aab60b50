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

QR-code and CLIP-score filters are library/model-gated (pyzbar, CLIP) —
inventoried, not stubbed.
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

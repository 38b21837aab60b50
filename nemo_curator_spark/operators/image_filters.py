"""Image aesthetic / NSFW filters — reference stages/image/filters/
{base,aesthetic_filter,nsfw_filter}.py + models/{aesthetics,nsfw}.py.
The published head architectures are tiny MLPs over CLIP embeddings and
are implemented exactly in numpy:

* aesthetic (improved-aesthetic-predictor): Linear 768->1024->128->64->
  16->1 with dropout-only between layers — dropout is identity at
  inference, so the eval-time forward is a pure affine chain
  (aesthetics.py:32-68);
* NSFW (LAION CLIP-based-NSFW-Detector): buffer normalization
  ``(x - mean)/sqrt(variance)`` then Linear 768->64->512->256->1 with
  ReLU between and a sigmoid output (nsfw.py:40-95).

The trained safetensors weights are the HF plug point — load them into
the same arrays for bit-parity; seeded weights exercise the real code
path locally. Stage semantics are exact (aesthetic keeps score >=
threshold; NSFW keeps score < threshold; scores annotated per image).

Spark shape: one Arrow pass over embedding columns; pass weights_path
so the matrices load once per worker from an npz artifact (UDF
closures pickle per task — the CLAUDE.md payload lesson) — scoring
adds a column, filtering stays a JVM predicate.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_AESTHETIC_DIMS = (768, 1024, 128, 64, 16, 1)
_NSFW_DIMS = (768, 64, 512, 256, 1)


class AestheticMLP:
    """aesthetics.py:32-68 at eval time: an affine chain (dropout layers
    are identity in eval mode). ``weights`` maps ``w{i}``/``b{i}``
    (i = 0..4) with w{i} shaped (out, in) — torch Linear layout."""

    def __init__(self, weights: dict[str, np.ndarray]):
        self.weights = {
            k: np.asarray(v, dtype=np.float64) for k, v in weights.items()
        }

    @staticmethod
    def init_seeded(seed: int = 42) -> "AestheticMLP":
        rs = np.random.RandomState(seed)
        w = {}
        for i, (din, dout) in enumerate(
            zip(_AESTHETIC_DIMS[:-1], _AESTHETIC_DIMS[1:])
        ):
            s = 1.0 / np.sqrt(din)
            w[f"w{i}"] = rs.uniform(-s, s, size=(dout, din))
            w[f"b{i}"] = rs.uniform(-s, s, size=dout)
        return AestheticMLP(w)

    def hidden(self, embeddings: np.ndarray) -> np.ndarray:
        """The 16-dim activations entering the last linear layer — the
        write-then-read oracle seam (the classifier_stage pattern: the
        oracle replays only the final matmul + decision)."""
        x = np.asarray(embeddings, dtype=np.float64)
        for i in range(len(_AESTHETIC_DIMS) - 2):
            x = x @ self.weights[f"w{i}"].T + self.weights[f"b{i}"]
        return x

    def final_weights(self) -> tuple[np.ndarray, float]:
        i = len(_AESTHETIC_DIMS) - 2
        return self.weights[f"w{i}"][0], float(self.weights[f"b{i}"][0])

    def __call__(self, embeddings: np.ndarray) -> np.ndarray:
        x = np.asarray(embeddings, dtype=np.float64)
        for i in range(len(_AESTHETIC_DIMS) - 1):
            x = x @ self.weights[f"w{i}"].T + self.weights[f"b{i}"]
        return x[:, 0]


class NSFWModelNP:
    """nsfw.py:40-95 at eval time: normalize -> ReLU MLP -> sigmoid.
    ``weights`` carries ``mean``, ``variance`` and ``w{i}``/``b{i}``
    (i = 0..3, torch Linear layout)."""

    def __init__(self, weights: dict[str, np.ndarray]):
        self.weights = {
            k: np.asarray(v, dtype=np.float64) for k, v in weights.items()
        }

    @staticmethod
    def init_seeded(seed: int = 42) -> "NSFWModelNP":
        rs = np.random.RandomState(seed)
        w = {
            "mean": np.zeros(_NSFW_DIMS[0]),
            "variance": np.ones(_NSFW_DIMS[0]),
        }
        for i, (din, dout) in enumerate(
            zip(_NSFW_DIMS[:-1], _NSFW_DIMS[1:])
        ):
            s = 1.0 / np.sqrt(din)
            w[f"w{i}"] = rs.uniform(-s, s, size=(dout, din))
            w[f"b{i}"] = rs.uniform(-s, s, size=dout)
        return NSFWModelNP(w)

    def hidden(self, embeddings: np.ndarray) -> np.ndarray:
        """The 256-dim ReLU activations entering the last linear layer
        (the oracle seam; sigmoid stays OUT of the gate — cross-engine
        exp() is ulp-risky, and the 0.5 threshold is exactly logit<0)."""
        x = np.asarray(embeddings, dtype=np.float64)
        x = (x - self.weights["mean"]) / np.sqrt(self.weights["variance"])
        for i in range(3):
            x = np.maximum(
                x @ self.weights[f"w{i}"].T + self.weights[f"b{i}"], 0.0
            )
        return x

    def final_weights(self) -> tuple[np.ndarray, float]:
        return self.weights["w3"][0], float(self.weights["b3"][0])

    def __call__(self, embeddings: np.ndarray) -> np.ndarray:
        x = self.hidden(embeddings)
        x = x @ self.weights["w3"].T + self.weights["b3"]
        return (1.0 / (1.0 + np.exp(-x)))[:, 0]


@dataclass
class ImageAestheticFilterStage:
    """aesthetic_filter.py:28-107: batch-score embeddings, annotate
    ``aesthetic_score``, keep images with score >= threshold."""

    score_threshold: float = 0.5
    model_inference_batch_size: int = 32
    model: object = field(default_factory=AestheticMLP.init_seeded)

    def process(self, images: list[dict]) -> list[dict]:
        for start in range(0, len(images), self.model_inference_batch_size):
            batch = images[start : start + self.model_inference_batch_size]
            scores = self.model(
                np.stack([img["embedding"] for img in batch], axis=0)
            )
            for i, img in enumerate(batch):
                img["aesthetic_score"] = float(scores[i])
        return [
            img
            for img in images
            if img["aesthetic_score"] >= self.score_threshold
        ]


@dataclass
class ImageNSFWFilterStage:
    """nsfw_filter.py: batch-score embeddings, annotate ``nsfw_score``,
    keep images with score < threshold (NSFW drops HIGH scores)."""

    score_threshold: float = 0.5
    model_inference_batch_size: int = 32
    model: object = field(default_factory=NSFWModelNP.init_seeded)

    def process(self, images: list[dict]) -> list[dict]:
        for start in range(0, len(images), self.model_inference_batch_size):
            batch = images[start : start + self.model_inference_batch_size]
            scores = self.model(
                np.stack([img["embedding"] for img in batch], axis=0)
            )
            for i, img in enumerate(batch):
                img["nsfw_score"] = float(scores[i])
        return [
            img for img in images if img["nsfw_score"] < self.score_threshold
        ]


def save_weights(weights: dict[str, np.ndarray], path: str) -> None:
    """Persist a head's weight dict as npz (the artifact the Spark form
    ships by PATH — the CLAUDE.md closure-payload lesson: UDF closures
    pickle per task, so the matrices must live behind a per-worker
    cache, the mini_transformer.load_cached pattern)."""
    tmp = path + ".tmp.npz"  # np.savez appends .npz unless present
    np.savez(tmp, **weights)
    os.replace(tmp, path)


_CACHE: dict[str, dict] = {}


def load_weights_cached(path: str) -> dict[str, np.ndarray]:
    key = f"{path}:{os.path.getmtime(path)}:{os.path.getsize(path)}"
    w = _CACHE.get(key)
    if w is None:
        if len(_CACHE) >= 4:
            _CACHE.clear()
        with np.load(path) as z:
            w = {k: z[k] for k in z.files}
        _CACHE[key] = w
    return w


def _score_udf(model, model_cls, weights_path):
    """When ``weights_path`` is given the closure carries ONLY the path
    (each worker loads + caches the matrices once); an in-closure model
    is for small/local runs."""

    @F.pandas_udf(T.DoubleType())
    def _score(emb: pd.Series) -> pd.Series:
        m = model
        if weights_path is not None:
            m = model_cls(load_weights_cached(weights_path))
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        return pd.Series(m(mat))

    return _score


def aesthetic_scores(
    df: DataFrame,
    model=None,
    emb_col: str = "embedding",
    weights_path: str | None = None,
) -> DataFrame:
    """Spark form: append ``aesthetic_score`` (filter downstream with a
    Column predicate, exactly score >= threshold). Prefer
    ``weights_path`` at scale — the ~9 MB float64 head then ships once
    per worker instead of once per task."""
    m = None if weights_path else (model or AestheticMLP.init_seeded())
    return df.withColumn(
        "aesthetic_score",
        _score_udf(m, AestheticMLP, weights_path)(F.col(emb_col)),
    )


def nsfw_scores(
    df: DataFrame,
    model=None,
    emb_col: str = "embedding",
    weights_path: str | None = None,
) -> DataFrame:
    """Spark form: append ``nsfw_score`` (keep rows with score <
    threshold downstream). ``weights_path`` behaves as in
    :func:`aesthetic_scores`."""
    m = None if weights_path else (model or NSFWModelNP.init_seeded())
    return df.withColumn(
        "nsfw_score",
        _score_udf(m, NSFWModelNP, weights_path)(F.col(emb_col)),
    )

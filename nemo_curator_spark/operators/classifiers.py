"""Distributed classifier / embedder stage plumbing (reference
DistributedDataClassifier family, stages/text/classifiers/base.py:68-261 —
GPU DeBERTa there; here the Spark-side shape with pluggable models).

The composite is tokenizer-stage + model-stage, both Arrow-vectorized
pandas UDFs with per-worker lazy model caches. Real inference in this
sandbox runs through ``operators/mini_transformer.py`` — a deterministic
numpy transformer encoder (MiniTransformerClassifier /
MiniTransformerEmbedder satisfy the model contracts below and load their
weight artifact lazily per worker). The HF model id carried by each
named classifier remains the documented plug point for full-size
torch/DeBERTa models (absent from this environment); with no model
injected the hook raises ``NotImplementedError``, and tests may inject
deterministic mocks exactly like the reference's tests do.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def regex_tokenizer(texts: pd.Series, max_len: int = 512) -> pd.Series:
    """Whitespace/punct token ids via hashing (stand-in tokenize stage with
    the real stage's batch shape: text -> array<int>)."""
    import zlib

    return texts.map(
        lambda t: [
            zlib.crc32(w.encode("utf-8")) % 50000
            for w in (t or "").split()[:max_len]
        ]
    )


@dataclass
class ClassifierStage:
    """Tokenize + classify composite over a text column.

    ``model``: object with ``predict_batch(list[list[int]]) -> list[str]``
    (labels) and optionally ``prob_batch`` (scores). When None, raises at
    executor time — plug a real transformer here.
    """

    model: object | None = None
    pred_col: str = "pred_label"
    prob_col: str = "pred_prob"
    max_len: int = 512

    def apply(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        model = self.model
        max_len = self.max_len

        schema = T.StructType(
            [
                T.StructField("label", T.StringType()),
                T.StructField("prob", T.DoubleType()),
            ]
        )

        @F.pandas_udf(schema)
        def infer(texts: pd.Series) -> pd.DataFrame:
            if model is None:
                raise NotImplementedError(
                    "no transformer runtime in this environment; inject a "
                    "model with predict_batch/prob_batch"
                )
            tokens = regex_tokenizer(texts, max_len).tolist()
            labels = model.predict_batch(tokens)
            probs = (
                model.prob_batch(tokens)
                if hasattr(model, "prob_batch")
                else [1.0] * len(labels)
            )
            return pd.DataFrame({"label": labels, "prob": probs})

        out = df.withColumn("_clf", infer(F.col(text_col)))
        return (
            out.withColumn(self.pred_col, F.col("_clf.label"))
            .withColumn(self.prob_col, F.col("_clf.prob"))
            .drop("_clf")
        )


@dataclass
class CategoricalClassifier:
    """The DistributedDataClassifier config surface (reference
    classifiers/base.py:68-261): label/score field names, ``filter_by``
    post-filter, ``max_chars`` truncation, pluggable model. Each concrete
    classifier below mirrors one reference class's defaults and HF model id
    (the model itself is the documented plug point — no transformer runtime
    ships in this environment; reference tests mock it the same way)."""

    model_name: str = ""
    label_field: str = "pred"
    score_field: str | None = None
    text_field: str = "text"
    filter_by: list[str] | None = None
    max_chars: int = 2000
    model: object | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        text = F.col(self.text_field)
        if self.max_chars and self.max_chars > 0:
            text = F.substring(text, 1, self.max_chars)
        df = df.withColumn("_clf_text", text)
        stage = ClassifierStage(
            model=self.model,
            pred_col=self.label_field,
            prob_col=self.score_field or "_clf_prob",
        )
        out = stage.apply(df, "_clf_text").drop("_clf_text")
        if not self.score_field:
            out = out.drop("_clf_prob")
        if self.filter_by:
            out = out.where(F.col(self.label_field).isin(self.filter_by))
        return out


def domain_classifier(**kw) -> CategoricalClassifier:
    """Reference DomainClassifier (classifiers/domain.py:29)."""
    return CategoricalClassifier(
        model_name="nvidia/domain-classifier",
        label_field=kw.pop("label_field", "domain_pred"),
        **kw,
    )


def multilingual_domain_classifier(**kw) -> CategoricalClassifier:
    """Reference MultilingualDomainClassifier (domain.py:88)."""
    return CategoricalClassifier(
        model_name="nvidia/multilingual-domain-classifier",
        label_field=kw.pop("label_field", "domain_pred"),
        **kw,
    )


def quality_classifier(**kw) -> CategoricalClassifier:
    """Reference QualityClassifier (quality.py:28); max_chars=6000 there."""
    return CategoricalClassifier(
        model_name="nvidia/quality-classifier-deberta",
        label_field=kw.pop("label_field", "quality_pred"),
        max_chars=kw.pop("max_chars", 6000),
        **kw,
    )


def content_type_classifier(**kw) -> CategoricalClassifier:
    """Reference ContentTypeClassifier (content_type.py:28); max_chars=5000."""
    return CategoricalClassifier(
        model_name="nvidia/content-type-classifier-deberta",
        label_field=kw.pop("label_field", "content_pred"),
        max_chars=kw.pop("max_chars", 5000),
        **kw,
    )


def fineweb_edu_classifier(**kw) -> CategoricalClassifier:
    """Reference FineWebEduClassifier family (fineweb_edu.py:233-358):
    regression-style 0-5 educational score; label = rounded int string."""
    return CategoricalClassifier(
        model_name="HuggingFaceFW/fineweb-edu-classifier",
        label_field=kw.pop("label_field", "fineweb-edu-score-label"),
        score_field=kw.pop("score_field", "fineweb-edu-score"),
        max_chars=kw.pop("max_chars", -1),
        **kw,
    )


def aegis_classifier(**kw) -> CategoricalClassifier:
    """Reference AegisClassifier (aegis.py:370-509): safety labels."""
    return CategoricalClassifier(
        model_name="nvidia/Aegis-AI-Content-Safety-LlamaGuard-Defensive-1.0",
        label_field=kw.pop("label_field", "aegis_pred"),
        **kw,
    )


def prompt_task_complexity_classifier(**kw) -> CategoricalClassifier:
    """Reference PromptTaskComplexityClassifier
    (prompt_task_complexity.py:281-326): multi-headed task-type +
    complexity model. Mirrors the reference contract that ``filter_by``
    is unsupported for this classifier (raises NotImplementedError);
    the multi-head output surfaces through the injected model's label
    (the HF id is the plug point, as for the rest of the family)."""
    if kw.get("filter_by"):
        raise NotImplementedError(
            "filter_by not supported with PromptTaskComplexityClassifier"
        )
    kw.pop("filter_by", None)
    return CategoricalClassifier(
        model_name="nvidia/prompt-task-and-complexity-classifier",
        label_field=kw.pop("label_field", "task_type_1"),
        score_field=kw.pop("score_field", "prompt_complexity_score"),
        max_chars=kw.pop("max_chars", -1),
        **kw,
    )


def center_crop_text(col, center_crop_chars: int):
    """CenterCropTextStage._mid_slice as a pure JVM Column (reference
    math/classifiers/finemath.py:56-74): keep ``s[max(0,m-n) : min(m+n,
    len)]`` around the character midpoint ``m = len//2`` — central
    context survives truncation. ``center_crop_chars <= 0`` is the
    stage's pass-through."""
    if center_crop_chars <= 0:
        return col
    n = F.lit(int(center_crop_chars))
    ln = F.length(col)
    m = F.floor(ln / 2).cast("int")
    b = F.greatest(F.lit(0), m - n)
    e = F.least(m + n, ln)
    return F.substring(col, b + 1, (e - b).cast("int"))


@dataclass(kw_only=True)
class FineMathClassifier:
    """Reference FineMathClassifier (math/classifiers/finemath.py:153-203):
    CenterCropText -> tokenize -> DeBERTa regression head. Exact field
    contract mirrored; the HF id ``HuggingFaceTB/finemath-classifier``
    is the model plug point (``model.score_batch(list[list[int]]) ->
    list[float]`` — MiniTransformerRegressor provides the real local
    path). Output semantics are the reference's exactly
    (finemath.py:135-144): float scores = ``clip(logits, 0, 5)``, int
    scores = ``np.round`` of that — numpy rounds HALF-EVEN, so the
    Spark side uses ``F.bround`` (never F.round, which is
    half-away-from-zero; CLAUDE.md rounding-parity rule)."""

    model_name: str = "HuggingFaceTB/finemath-classifier"
    cache_dir: str | None = None
    float_score_column: str = "finemath_scores"
    int_score_column: str = "finemath_int_scores"
    text_field: str = "text"
    max_chars: int | None = None
    max_seq_length: int = 512
    sort_by_length: bool = False
    model_inference_batch_size: int = 1024
    autocast: bool = True
    center_crop_chars: int | None = 10_000
    model: object | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        text = F.col(self.text_field)
        if self.center_crop_chars is not None and self.center_crop_chars > 0:
            text = center_crop_text(text, self.center_crop_chars)
        if self.max_chars and self.max_chars > 0:
            text = F.substring(text, 1, self.max_chars)
        model = self.model
        max_len = self.max_seq_length

        @F.pandas_udf(T.DoubleType())
        def score(texts: pd.Series) -> pd.Series:
            if model is None:
                raise NotImplementedError(
                    "no transformer runtime in this environment; inject a "
                    "model with score_batch (MiniTransformerRegressor is "
                    "the local real-inference path)"
                )
            tokens = regex_tokenizer(texts, max_len).tolist()
            return pd.Series([float(s) for s in model.score_batch(tokens)])

        logit = score(text)
        fs = F.least(F.greatest(logit, F.lit(0.0)), F.lit(5.0))
        out = df.withColumn(self.float_score_column, fs)
        return out.withColumn(
            self.int_score_column,
            F.bround(F.col(self.float_score_column)).cast("int"),
        )


@dataclass
class EmbedderStage:
    """Text -> array<float> embedding stage (reference embedders/base.py
    shape). Default model: deterministic hashed bag-of-words projection —
    a real sentence-transformer plugs into ``embed_batch``."""

    dim: int = 64
    model: object | None = None
    out_col: str = "embedding"
    # normalize=False emits the raw signed word counts (exactly integer-
    # valued) — the correctness gate uses it so the projection is
    # hash-comparable without float32 rounding noise
    normalize: bool = True

    def apply(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        dim = self.dim
        model = self.model
        normalize = self.normalize

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def embed(texts: pd.Series) -> pd.Series:
            if model is not None:
                return pd.Series(model.embed_batch(texts.tolist()))
            import numpy as np
            import zlib

            out = []
            for t in texts:
                v = np.zeros(dim, dtype=np.float64)
                for w in (t or "").lower().split():
                    h = zlib.crc32(w.encode("utf-8"))
                    v[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
                if normalize:
                    n = np.linalg.norm(v)
                    if n:
                        v = v / n
                out.append(v.astype(np.float32))
            return pd.Series(out)

        return df.withColumn(self.out_col, embed(F.col(text_col)))

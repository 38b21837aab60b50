"""MiniTransformer pins: batching invariance (the property the gate's
write-then-read protocol rests on), save/load bit-equality, real-inference
quality on a separable corpus, and the ClassifierStage/EmbedderStage
plumbing integration."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from nemo_curator_spark.operators import mini_transformer as MX
from nemo_curator_spark.operators.classifiers import regex_tokenizer


@pytest.fixture(scope="module")
def model():
    return MX.MiniTransformer.init(
        vocab_size=512, dim=16, n_layers=2, n_heads=2, max_len=64, seed=42
    )


def _sep_corpus(n_per_class: int = 40, seed: int = 7):
    """Two classes with disjoint hashed vocabularies — linearly separable
    through any non-degenerate feature map."""
    rs = np.random.RandomState(seed)
    a_words = [f"alpha{i}" for i in range(30)]
    b_words = [f"beta{i}" for i in range(30)]
    samples = []
    for cls, words in (("a", a_words), ("b", b_words)):
        for _ in range(n_per_class):
            text = " ".join(rs.choice(words, size=20))
            samples.append((text, cls))
    return samples


def test_batching_invariance(model):
    texts = [t for t, _ in _sep_corpus()]
    ids = regex_tokenizer(pd.Series(texts), 64).tolist()
    full = model.forward_tokens(ids)
    # any batch split must give bit-identical per-token hiddens
    split = model.forward_tokens(ids[:3]) + [
        model.forward_tokens([s])[0] for s in ids[3:7]
    ] + model.forward_tokens(ids[7:])
    for a, b in zip(full, split):
        assert np.array_equal(a, b)


def test_variable_length_mix(model):
    # mixed lengths in one batch == each alone (no padding leakage)
    ids = [[1, 2, 3], list(range(60)), [7], list(range(25))]
    batch = model.forward_tokens(ids)
    for i, s in enumerate(ids):
        assert np.array_equal(batch[i], model.forward_tokens([s])[0])


def test_empty_sequence_is_bos_only(model):
    h = model.forward_tokens([[]])
    assert h[0].shape == (1, 16)
    assert np.isfinite(h[0]).all()


def test_save_load_bit_identical(model, tmp_path):
    samples = _sep_corpus()
    ids = regex_tokenizer(pd.Series([t for t, _ in samples]), 64).tolist()
    MX.train_head(model, list(zip(ids, [c for _, c in samples])))
    p = str(tmp_path / "m.minitx.json")
    model.save(p)
    m2 = MX.MiniTransformer.load(p)
    assert np.array_equal(model.predict_proba(ids), m2.predict_proba(ids))
    assert m2.labels == model.labels


def test_linear_probe_learns_separable_classes(model, tmp_path):
    samples = _sep_corpus()
    ids = regex_tokenizer(pd.Series([t for t, _ in samples]), 64).tolist()
    labels = [c for _, c in samples]
    MX.train_head(model, list(zip(ids, labels)))
    probs = model.predict_proba(ids)
    pred = [model.labels[i] for i in np.argmax(probs, axis=-1)]
    acc = np.mean([p == y for p, y in zip(pred, labels)])
    # disjoint vocabularies: the random-feature probe must be near-perfect
    assert acc >= 0.95, acc


def test_embed_unit_norm(model):
    ids = regex_tokenizer(pd.Series(["hello world", "x", ""]), 64).tolist()
    e = model.embed(ids)
    assert np.allclose(np.linalg.norm(e, axis=1), 1.0)


def test_classifier_stage_integration(spark, tmp_path):
    from nemo_curator_spark.operators.classifiers import ClassifierStage

    m = MX.MiniTransformer.init(seed=42)
    samples = _sep_corpus()
    ids = regex_tokenizer(pd.Series([t for t, _ in samples]), 64).tolist()
    MX.train_head(m, list(zip(ids, [c for _, c in samples])))
    p = str(tmp_path / "m.minitx.json")
    m.save(p)

    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(samples[:10])], ["i", "text"]
    )
    out = (
        ClassifierStage(model=MX.MiniTransformerClassifier(p), max_len=64)
        .apply(df, "text")
        .orderBy("i")
        .toPandas()
    )
    expect_probs = m.predict_proba(ids[:10])
    # the adapter ranks on round(probs, 6) with lowest-idx ties (the
    # cross-engine determinism guard)
    expect = [
        m.labels[i] for i in np.argmax(np.round(expect_probs, 6), axis=-1)
    ]
    assert out.pred_label.tolist() == expect
    # driver process vs spark worker process can differ by an
    # environment-dependent ulp (~5e-16, BLAS kernel selection); the gate
    # never compares across that boundary — see
    # test_spark_passes_bit_identical for the property the gate relies on
    sel = np.argmax(np.round(expect_probs, 6), axis=-1)
    want_probs = expect_probs[np.arange(len(sel)), sel]
    assert np.allclose(
        out.pred_prob.to_numpy(), want_probs, rtol=0, atol=5e-15
    )


def test_spark_passes_bit_identical(spark, tmp_path):
    """THE gate-load-bearing property: two Spark passes over the same
    rows under different partitionings (different Arrow batch
    compositions) produce bit-identical transformer outputs — this is
    what makes the hidden-state artifact pass and the inference pass of
    classifier_stage/embedder_mini_transformer hash-consistent."""
    from pyspark.sql import functions as SF
    from pyspark.sql import types as ST

    m = MX.MiniTransformer.init(seed=42)
    p = str(tmp_path / "m.minitx.json")
    m.save(p)
    texts = [t for t, _ in _sep_corpus()]
    df = spark.createDataFrame(list(enumerate(texts)), ["i", "text"])

    @SF.pandas_udf(ST.ArrayType(ST.DoubleType()))
    def _emb(ts: pd.Series) -> pd.Series:
        emb = MX.MiniTransformerEmbedder(p)
        return pd.Series([v.tolist() for v in emb.embed_batch(ts.tolist())])

    a = (
        df.repartition(1).select("i", _emb("text").alias("e"))
        .orderBy("i").toPandas()
    )
    b = (
        df.repartition(7, "i").select("i", _emb("text").alias("e"))
        .orderBy("i").toPandas()
    )
    for x, y in zip(a.e, b.e):
        assert np.array_equal(np.asarray(x), np.asarray(y))  # exact floats


def test_embedder_stage_integration(spark, tmp_path):
    from nemo_curator_spark.operators.classifiers import EmbedderStage

    m = MX.MiniTransformer.init(seed=42)
    p = str(tmp_path / "m.minitx.json")
    m.save(p)
    df = spark.createDataFrame(
        [(0, "hello world"), (1, "beta0 beta1")], ["i", "text"]
    )
    emb = MX.MiniTransformerEmbedder(p)
    out = EmbedderStage(model=emb).apply(df, "text").orderBy("i").toPandas()
    got = np.asarray(out.embedding.tolist(), dtype=np.float64)
    want = np.stack(emb.embed_batch(["hello world", "beta0 beta1"]))
    # EmbedderStage's array<float> column casts to float32 at the boundary
    assert np.allclose(got, want, atol=1e-6)
    assert got.shape == (2, 16)

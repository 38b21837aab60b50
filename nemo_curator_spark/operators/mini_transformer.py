"""MiniTransformer — a deterministic pure-numpy transformer encoder giving
the classifier/embedder families a REAL inference path in this sandbox.

The reference's DistributedDataClassifier / EmbeddingModelStage run HF
DeBERTa / sentence-transformer forwards on GPU
(reference stages/text/classifiers/base.py:48-261 — tokenize stage +
``torch.softmax(self.fc(features)[:, 0, :])``; embedders/base.py:33-118 —
masked mean-pool + L2 normalize). Neither torch nor transformers ships in
this environment, so — following the MiniFastText precedent
(operators/fasttext_mini.py) — this module provides the same architecture
at miniature scale so the *real* code path runs end to end: weight
artifact on disk → lazy per-worker load (module cache keyed by file
digest; on a real cluster the path comes from ``SparkFiles.get``, the
pattern pinned by tests/test_stateful_sparkfiles.py) → Arrow-batched
vectorized forward → labels/probs or pooled embeddings.

Architecture (a standard pre-LN transformer encoder):

* token embedding over hashed buckets (ids arrive from the SAME
  ``regex_tokenizer`` the ClassifierStage tokenize stage emits; bucket 0
  is reserved for a BOS token prepended to every sequence, so no
  sequence is empty) + learned positional embedding;
* ``n_layers`` pre-LN blocks: ``x + MHA(LN(x))`` then ``x + FFN(LN(x))``
  with tanh-GELU, padding-masked attention scores;
* final LayerNorm;
* classifier head: masked mean-pool → linear → softmax (reference
  ClassifierModelStage.process_model_output semantics);
* embedder: masked mean-pool → L2 normalize (reference
  EmbeddingModelStage._mean_pooling, embedders/base.py:101-107).

Training: the body is a frozen seeded-random feature extractor and only
the linear head is trained (full-batch softmax regression, deterministic
— same scheme as fasttext_mini.train). A random-features transformer +
trained linear probe is real inference with meaningful (well above
chance) predictions; backprop through attention is out of scope, and the
HF model id on each named classifier remains the documented plug point
for trained full-size models.

Everything is float64 end to end and bit-reproducible, which is what
lets the correctness gate value-hash these stages: the per-token final
hidden states are exported as a parquet artifact (write-then-read
protocol) and DuckDB replays mean-pool → head matmul → softmax → argmax
(classifier) / mean-pool → L2-normalize (embedder) in SQL.
"""

from __future__ import annotations

import json
import os

import numpy as np

_SQRT_2_OVER_PI = 0.7978845608028654


def gelu(x: np.ndarray) -> np.ndarray:
    """tanh-approximation GELU (the BERT/GPT-2 form) — deterministic,
    no erf dependency."""
    return 0.5 * x * (1.0 + np.tanh(_SQRT_2_OVER_PI * (x + 0.044715 * x**3)))


def layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


class MiniTransformer:
    """Deterministic numpy transformer encoder with save/load.

    Weight layout per layer: ``ln1_g ln1_b wq wk wv wo ln2_g ln2_b w1 b1
    w2 b2`` (all (d,d) / (d,4d) / (4d,d)). Plus ``emb (vocab, d)``,
    ``pos (max_len+1, d)``, ``lnf_g lnf_b``, and an optional head
    ``head_w (n_labels, d)``, ``head_b (n_labels)`` with ``labels``.
    """

    def __init__(self, params: dict, labels: list[str] | None = None,
                 vocab_size: int = 512, n_heads: int = 2, max_len: int = 64):
        self.p = params
        self.labels = labels or []
        self.vocab_size = vocab_size
        self.n_heads = n_heads
        self.max_len = max_len

    # ------------------------------------------------------------------
    @staticmethod
    def init(vocab_size: int = 512, dim: int = 16, n_layers: int = 2,
             n_heads: int = 2, max_len: int = 64, seed: int = 42) -> "MiniTransformer":
        rs = np.random.RandomState(seed)
        s = 1.0 / np.sqrt(dim)

        def m(*shape):
            return rs.uniform(-s, s, size=shape)

        p: dict = {
            "emb": m(vocab_size, dim),
            "pos": m(max_len + 1, dim),  # +1 for the prepended BOS
            "lnf_g": np.ones(dim),
            "lnf_b": np.zeros(dim),
            "n_layers": n_layers,
            "dim": dim,
        }
        for i in range(n_layers):
            p[f"l{i}"] = {
                "ln1_g": np.ones(dim), "ln1_b": np.zeros(dim),
                "wq": m(dim, dim), "wk": m(dim, dim),
                "wv": m(dim, dim), "wo": m(dim, dim),
                "ln2_g": np.ones(dim), "ln2_b": np.zeros(dim),
                "w1": m(dim, 4 * dim), "b1": np.zeros(4 * dim),
                "w2": m(4 * dim, dim), "b2": np.zeros(dim),
            }
        return MiniTransformer(p, vocab_size=vocab_size, n_heads=n_heads,
                               max_len=max_len)

    # ------------------------------------------------------------------
    def _bucket(self, ids: list[int]) -> list[int]:
        """Map tokenizer hash ids into embedding buckets 1..V-1 (0 = BOS)."""
        v = self.vocab_size - 1
        return [0] + [1 + (i % v) for i in ids[: self.max_len]]

    def forward_tokens(self, batch_ids: list[list[int]]) -> list[np.ndarray]:
        """Final-LayerNorm hidden states per sequence: list of (L_i, dim)
        float64 arrays (BOS at position 0).

        Each sequence is forwarded as its own unpadded B=1 batch: padding
        (measured) perturbs a short sequence's values at ~2e-15, and even
        same-length batching shifts ulps for some inputs via data-dependent
        einsum/BLAS blocking — per-sequence forward is the only shape whose
        values depend on nothing but the sequence, making the forward
        bit-identical under ANY batching (and, measured at 500 docs, it is
        no slower than the padded batch form: the work is O(L²d) per doc
        either way). That invariance is what lets the artifact pass and
        the ClassifierStage pass (different Arrow batch boundaries) agree
        exactly; pinned by tests/test_mini_transformer.py.
        """
        out: list[np.ndarray] = []
        for ids in batch_ids:
            idm = np.asarray([self._bucket(ids)], dtype=np.int64)
            out.append(self._forward_ids(idm)[0])
        return out

    def _forward_ids(self, idm: np.ndarray) -> np.ndarray:
        """(B, L) bucket ids (no padding) → (B, L, d) final hiddens."""
        bsz, lmax = idm.shape
        d = self.p["dim"]
        x = self.p["emb"][idm] + self.p["pos"][:lmax]
        dk = d // self.n_heads
        scale = 1.0 / np.sqrt(dk)
        for i in range(self.p["n_layers"]):
            lp = self.p[f"l{i}"]
            h = layer_norm(x, lp["ln1_g"], lp["ln1_b"])
            q = (h @ lp["wq"]).reshape(bsz, lmax, self.n_heads, dk)
            k = (h @ lp["wk"]).reshape(bsz, lmax, self.n_heads, dk)
            v = (h @ lp["wv"]).reshape(bsz, lmax, self.n_heads, dk)
            att = np.einsum("bqhd,bkhd->bhqk", q, k) * scale  # (B,H,Lq,Lk)
            att = att - att.max(axis=-1, keepdims=True)
            e = np.exp(att)
            att = e / e.sum(axis=-1, keepdims=True)
            ctx = np.einsum("bhqk,bkhd->bqhd", att, v).reshape(bsz, lmax, d)
            x = x + ctx @ lp["wo"]
            h = layer_norm(x, lp["ln2_g"], lp["ln2_b"])
            x = x + gelu(h @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"]
        return layer_norm(x, self.p["lnf_g"], self.p["lnf_b"])

    def pooled(self, batch_ids: list[list[int]]) -> np.ndarray:
        """Masked mean-pool over token positions → (B, dim). Position sums
        run sequentially (L ≤ max_len+1 < numpy's 128-element pairwise
        block), matching the DuckDB oracle's scan-order avg()."""
        hs = self.forward_tokens(batch_ids)
        return np.stack([h.sum(axis=0) / h.shape[0] for h in hs]) if hs else \
            np.zeros((0, self.p["dim"]))

    # --- classifier head ----------------------------------------------
    def head_logits(self, pooled: np.ndarray) -> np.ndarray:
        return pooled @ self.p["head_w"].T + self.p["head_b"]

    def predict_proba(self, batch_ids: list[list[int]]) -> np.ndarray:
        logits = self.head_logits(self.pooled(batch_ids))
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    # --- embedder ------------------------------------------------------
    def embed(self, batch_ids: list[list[int]]) -> np.ndarray:
        """Masked mean-pool + L2 normalize (reference _mean_pooling,
        embedders/base.py:101-107)."""
        pooled = self.pooled(batch_ids)
        norms = np.sqrt((pooled**2).sum(axis=-1, keepdims=True))
        norms[norms == 0.0] = 1.0
        return pooled / norms

    # --- persistence ---------------------------------------------------
    def save(self, path: str) -> None:
        def enc(v):
            if isinstance(v, np.ndarray):
                return v.tolist()
            if isinstance(v, dict):
                return {k: enc(x) for k, x in v.items()}
            return v

        payload = {
            "params": enc(self.p),
            "labels": self.labels,
            "vocab_size": self.vocab_size,
            "n_heads": self.n_heads,
            "max_len": self.max_len,
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "MiniTransformer":
        with open(path) as f:
            d = json.load(f)

        def dec(v):
            if isinstance(v, list):
                return np.asarray(v, dtype=np.float64)
            if isinstance(v, dict):
                return {k: dec(x) for k, x in v.items()}
            return v

        p = {k: dec(v) if k not in ("n_layers", "dim") else v
             for k, v in d["params"].items()}
        return MiniTransformer(p, d["labels"], d["vocab_size"],
                               d["n_heads"], d["max_len"])


def train_head(model: MiniTransformer, samples: list[tuple[list[int], str]],
               epochs: int = 2000, lr: float = 2.0, seed: int = 42) -> MiniTransformer:
    """Softmax regression on the frozen body's pooled features —
    deterministic full-batch gradient descent (the fasttext_mini.train
    scheme). Mutates and returns ``model`` with head_w/head_b/labels."""
    labels = sorted({lab for _, lab in samples})
    lab_idx = {lab: i for i, lab in enumerate(labels)}
    feats = model.pooled([ids for ids, _ in samples])  # (N, d)
    ys = np.array([lab_idx[lab] for _, lab in samples])
    d = model.p["dim"]
    rs = np.random.RandomState(seed)
    w = rs.uniform(-0.01, 0.01, size=(len(labels), d))
    b = np.zeros(len(labels))
    onehot = np.eye(len(labels))[ys]
    for epoch in range(epochs):
        step = lr * (1.0 - epoch / epochs)
        logits = feats @ w.T + b
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        p = e / e.sum(axis=-1, keepdims=True)
        g = (p - onehot) / len(ys)  # (N, L)
        w -= step * (g.T @ feats)
        b -= step * g.sum(axis=0)
    model.p["head_w"] = w
    model.p["head_b"] = b
    model.labels = labels
    return model


def train_head_regression(
    model: MiniTransformer,
    samples: list[tuple[list[int], float]],
    ridge: float = 1e-3,
) -> MiniTransformer:
    """Closed-form ridge regression of a scalar head on the frozen body's
    pooled features (the FineMath regression analogue of train_head's
    softmax probe — reference FineMathModelStage squeezes a 1-logit
    sequence-classification head, finemath.py:114-144). Deterministic:
    normal equations solved with np.linalg.solve, no iteration order
    dependence. Mutates and returns ``model`` with reg_w/reg_b."""
    feats = model.pooled([ids for ids, _ in samples])  # (N, d)
    y = np.array([float(t) for _, t in samples])
    y_mean = float(y.mean()) if len(y) else 0.0
    xc = feats - feats.mean(axis=0, keepdims=True) if len(y) else feats
    yc = y - y_mean
    d = model.p["dim"]
    a = xc.T @ xc + ridge * np.eye(d)
    w = np.linalg.solve(a, xc.T @ yc)
    model.p["reg_w"] = w
    model.p["reg_b"] = y_mean - float(feats.mean(axis=0) @ w) if len(y) else 0.0
    return model


# ----------------------------------------------------------------------
# Per-worker artifact cache (perplexity.py:178-185 pattern): the Spark
# closure carries only the path; each python worker parses the JSON once.
_CACHE: dict[str, MiniTransformer] = {}


def load_cached(path: str) -> MiniTransformer:
    key = f"{path}:{os.path.getmtime(path)}:{os.path.getsize(path)}"
    m = _CACHE.get(key)
    if m is None:
        if len(_CACHE) >= 4:  # bound memory without thrashing when a
            _CACHE.clear()    # classifier + embedder share a worker
        m = MiniTransformer.load(path)
        _CACHE[key] = m
    return m


class MiniTransformerClassifier:
    """predict_batch/prob_batch adapter so a MiniTransformer artifact
    plugs straight into ClassifierStage / CategoricalClassifier (the
    object the reference mocks in its own classifier tests).

    Label selection ranks on probs ROUNDED at 6 decimals with the lowest
    label index breaking ties — the repo-wide cross-engine determinism
    guard (CLAUDE.md rounding-parity rule): numpy's matmul sums in
    SIMD/pairwise order while the DuckDB oracle's dot is sequential, so
    an unrounded argmax could flip on a ~1-ulp near-tie between labels.

    ClassifierStage calls predict_batch then prob_batch on the SAME
    token batch; the forward is memoized per batch so inference runs
    once, not twice."""

    def __init__(self, model_path: str):
        self.model_path = model_path
        self._memo: tuple | None = None  # (ids_key, probs)

    def _model(self) -> MiniTransformer:
        return load_cached(self.model_path)

    def _probs(self, token_ids: list[list[int]]) -> np.ndarray:
        key = hash(tuple(tuple(ids) for ids in token_ids))
        if self._memo is not None and self._memo[0] == key:
            return self._memo[1]
        probs = self._model().predict_proba(token_ids)
        self._memo = (key, probs)
        return probs

    def predict_batch(self, token_ids: list[list[int]]) -> list[str]:
        m = self._model()
        order = np.argmax(np.round(self._probs(token_ids), 6), axis=-1)
        return [m.labels[i] for i in order]

    def prob_batch(self, token_ids: list[list[int]]) -> list[float]:
        probs = self._probs(token_ids)
        order = np.argmax(np.round(probs, 6), axis=-1)
        return [float(probs[r, i]) for r, i in enumerate(order)]


class MiniTransformerRegressor:
    """score_batch adapter: pooled features -> scalar ridge-head readout,
    the object FineMathClassifier plugs in for real local inference
    (clip/round happen in the stage, matching the reference's
    process_model_output split, finemath.py:135-144)."""

    def __init__(self, model_path: str):
        self.model_path = model_path

    def score_batch(self, token_ids: list[list[int]]) -> list[float]:
        m = load_cached(self.model_path)
        pooled = m.pooled(token_ids)
        return [float(v) for v in pooled @ m.p["reg_w"] + m.p["reg_b"]]


class MiniTransformerEmbedder:
    """embed_batch adapter for EmbedderStage: text → regex_tokenizer ids
    → transformer → mean-pool → L2 normalize. ``dtype`` float64 keeps the
    gate artifact exact; EmbedderStage's array<float> column casts at the
    Spark boundary for pipeline use."""

    def __init__(self, model_path: str, max_len: int = 64):
        self.model_path = model_path
        self.max_len = max_len

    def embed_batch(self, texts: list[str]) -> list[np.ndarray]:
        from nemo_curator_spark.operators.classifiers import regex_tokenizer
        import pandas as pd

        ids = regex_tokenizer(pd.Series(list(texts)), self.max_len).tolist()
        return list(load_cached(self.model_path).embed(ids))

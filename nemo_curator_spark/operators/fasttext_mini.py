"""MiniFastText — a deterministic pure-python fastText-architecture model.

The reference's FastTextLangId / FastTextQualityFilter
(stages/text/filters/fasttext/fasttext_filters.py:23-111) call
``fasttext.load_model(path)`` + ``model.predict(text, k)``. The fasttext
package is absent from this environment, so SURVEY §7.1 M4 calls for a tiny
deterministic model exercising the *real* code path (artifact on disk →
lazy per-executor load → batched predict). This module provides that:

* same architecture as fastText supervised (Joulin et al. 2016,
  "Bag of Tricks for Efficient Text Classification"): mean of input
  embeddings for word + hashed word-ngram features → linear output layer →
  softmax → top-k ``__label__X`` predictions;
* same tokenization contract (whitespace split + ``</s>`` EOS token) and
  the FNV-1a 32-bit hashing fastText's dictionary uses for ngram buckets;
* ``predict(list[str], k)`` returns ``(labels, scores)`` shaped exactly
  like the fasttext python API, so ``FastTextLangId.score_batch``
  (operators/langid.py:245) runs unchanged;
* deterministic training (seeded init, fixed sample order, full-batch
  gradient steps) and a JSON artifact format, so tests and driver queries
  are bit-reproducible.

This is NOT a parser for fastText's .bin format (quantized binary layout —
out of scope); artifacts use the ``.minift.json`` suffix and
``FastTextLangId._get_model`` falls back to this loader when the fasttext
package is unavailable.
"""

from __future__ import annotations

import json

import numpy as np

EOS = "</s>"
LABEL_PREFIX = "__label__"


def fnv1a_32(s: str) -> int:
    """FNV-1a over utf-8 bytes (fastText's dictionary hash)."""
    h = 2166136261
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def _tokenize(text: str) -> list[str]:
    return text.split() + [EOS]


class MiniFastText:
    def __init__(
        self,
        vocab: dict[str, int],
        labels: list[str],
        input_matrix: np.ndarray,
        output_matrix: np.ndarray,
        word_ngrams: int = 1,
        bucket: int = 0,
    ):
        self.vocab = vocab
        self.labels = labels
        self.input_matrix = input_matrix      # (nwords + bucket, dim)
        self.output_matrix = output_matrix    # (nlabels, dim)
        self.word_ngrams = word_ngrams
        self.bucket = bucket

    # --- feature extraction ---
    def _feature_ids(self, text: str) -> list[int]:
        tokens = _tokenize(text)
        ids = [self.vocab[t] for t in tokens if t in self.vocab]
        if self.bucket and self.word_ngrams > 1:
            nwords = len(self.vocab)
            for n in range(2, self.word_ngrams + 1):
                for i in range(len(tokens) - n + 1):
                    gram = " ".join(tokens[i : i + n])
                    ids.append(nwords + fnv1a_32(gram) % self.bucket)
        return ids

    def _hidden(self, text: str) -> np.ndarray:
        ids = self._feature_ids(text)
        if not ids:
            return np.zeros(self.input_matrix.shape[1])
        return self.input_matrix[ids].mean(axis=0)

    # --- fasttext-shaped API ---
    def predict(
        self, texts: list[str] | str, k: int = 1
    ) -> tuple[list, list]:
        single = isinstance(texts, str)
        if single:
            texts = [texts]
        all_labels, all_scores = [], []
        for t in texts:
            logits = self.output_matrix @ self._hidden(t)
            e = np.exp(logits - logits.max())
            probs = e / e.sum()
            order = np.argsort(-probs, kind="stable")[:k]
            all_labels.append([self.labels[i] for i in order])
            all_scores.append(np.asarray(probs[order], dtype=np.float64))
        if single:
            return tuple(all_labels[0]), all_scores[0]
        return all_labels, all_scores

    # --- persistence ---
    def save(self, path: str) -> None:
        payload = {
            "vocab": self.vocab,
            "labels": self.labels,
            "input_matrix": self.input_matrix.tolist(),
            "output_matrix": self.output_matrix.tolist(),
            "word_ngrams": self.word_ngrams,
            "bucket": self.bucket,
        }
        with open(path, "w") as f:
            json.dump(payload, f)

    @staticmethod
    def load(path: str) -> "MiniFastText":
        with open(path) as f:
            d = json.load(f)
        return MiniFastText(
            d["vocab"],
            d["labels"],
            np.asarray(d["input_matrix"], dtype=np.float64),
            np.asarray(d["output_matrix"], dtype=np.float64),
            d["word_ngrams"],
            d["bucket"],
        )


def train(
    samples: list[tuple[str, str]],
    dim: int = 16,
    epochs: int = 50,
    lr: float = 0.5,
    word_ngrams: int = 1,
    bucket: int = 0,
    min_count: int = 1,
    seed: int = 42,
) -> MiniFastText:
    """Deterministic supervised training (full-batch softmax regression on
    averaged embeddings — the fastText architecture minus hogwild SGD, so
    identical runs give identical weights)."""
    counts: dict[str, int] = {}
    for text, _ in samples:
        for t in _tokenize(text):
            counts[t] = counts.get(t, 0) + 1
    vocab = {
        t: i
        for i, t in enumerate(
            t for t, c in sorted(counts.items()) if c >= min_count
        )
    }
    labels = sorted({LABEL_PREFIX + lab for _, lab in samples})
    lab_idx = {lab: i for i, lab in enumerate(labels)}

    rs = np.random.RandomState(seed)
    n_rows = len(vocab) + (bucket if word_ngrams > 1 else 0)
    model = MiniFastText(
        vocab,
        labels,
        rs.uniform(-1.0 / dim, 1.0 / dim, size=(n_rows, dim)),
        np.zeros((len(labels), dim)),
        word_ngrams,
        bucket if word_ngrams > 1 else 0,
    )

    feats = [model._feature_ids(text) for text, _ in samples]
    ys = np.array([lab_idx[LABEL_PREFIX + lab] for _, lab in samples])
    for epoch in range(epochs):
        step = lr * (1.0 - epoch / epochs)
        for ids, y in zip(feats, ys):
            if not ids:
                continue
            h = model.input_matrix[ids].mean(axis=0)
            logits = model.output_matrix @ h
            e = np.exp(logits - logits.max())
            p = e / e.sum()
            p[y] -= 1.0  # dL/dlogits
            grad_h = model.output_matrix.T @ p
            model.output_matrix -= step * np.outer(p, h)
            model.input_matrix[ids] -= step * grad_h / len(ids)
    return model


class FastTextQualityFilter:
    """Reference FastTextQualityFilter (fasttext_filters.py:23-55) over a
    pluggable fastText-API model: score = P(__label__hq) (1-p when the
    other label wins); keep iff pareto(alpha) > 1 - score. The reference
    consumes a global sequential numpy RNG (order-dependent — SURVEY
    §7.3.2); here the draw is deterministic per row from md5(key), the
    same scheme as quality.pareto_keep."""

    def __init__(self, model, alpha: float = 3.0, label: str = "__label__hq", seed: int = 42):
        self.model = model
        self.alpha = alpha
        self.label = label
        self.seed = seed

    def score_batch(self, texts) -> np.ndarray:
        cleaned = [(t or "").strip().replace("\n", " ") for t in texts]
        labels, scores = self.model.predict(cleaned, k=1)
        out = np.empty(len(cleaned))
        for i, (labs, ps) in enumerate(zip(labels, scores)):
            p = float(ps[0])
            out[i] = p if labs[0] == self.label else 1.0 - p
        return out

    def keep_batch(self, texts, keys) -> np.ndarray:
        import hashlib

        scores = self.score_batch(texts)
        keep = np.empty(len(scores), dtype=bool)
        for i, (s, key) in enumerate(zip(scores, keys)):
            u = int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) / 2**32
            pareto = (1.0 - u) ** (-1.0 / self.alpha) - 1.0
            keep[i] = pareto > 1.0 - s
        return keep

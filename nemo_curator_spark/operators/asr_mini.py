"""MiniASR — a deterministic pure-numpy CTC-style speech recognizer
giving the ASR stage REAL transcription in this sandbox.

The reference transcribes with NeMo ASR checkpoints (parakeet/canary —
stages/audio/inference/asr/{stage,asr_nemo}.py, models/asr/base.py):
an acoustic encoder emitting per-frame token posteriors decoded to
text. NeMo/torch are absent here, so — following the MiniTransformer /
MiniPyanNet / MiniSortFormer / MiniCLIP precedent — this module is the
same shape in float64 numpy at miniature scale:

* acoustic front end: the shared mini log-mel frames
  (sortformer_mini.logmel_frames — 25 ms/10 ms rfft mel bank, 4x
  pooled);
* body: input projection + 2 frozen pre-LN transformer blocks (the
  MiniSortFormer block math, B=1 forwards);
* head: linear softmax over ``len(VOCAB) + 1`` classes — per-frame
  token posteriors with class 0 the CTC blank (the trained probe);
* decode: GREEDY CTC — per-frame argmax, collapse consecutive
  repeats, drop blanks (the published best-path decode rule) — then
  join with single spaces.

The synthetic "language" is a 10-word vocabulary where each word is a
distinct harmonic carrier (tone-coded words over a noise floor), so
the trained head's per-frame word posteriors are REAL acoustic
classification, and greedy CTC produces the spoken word sequence.
Held-out utterance exact-match accuracy is pinned by
tests/test_asr_mini.py. The NeMo checkpoints remain the documented
plug point (the ``ASRAdapter`` seam in operators/asr_stage.py — this
module ships a conforming adapter, MiniASRAdapter).

Training: frozen body; ONLY the head is trained (deterministic
full-batch gradient descent, per-frame cross-entropy on frames labeled
by the known word intervals; blank on silence). Framewise CE instead
of the full CTC forward-backward is a documented simplification — the
synthetic corpus has known alignments, which is exactly the case where
CTC reduces to framewise CE.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nemo_curator_spark.operators.mini_transformer import gelu, layer_norm
from nemo_curator_spark.operators.sortformer_mini import (
    FRAME_SEC,
    N_MELS,
    SR,
    logmel_frames,
)

VOCAB = (
    "alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet",
)
BLANK = 0  # class 0; word w -> class w+1
# word carriers: fundamentals spread across the mel range
_WORD_F0 = tuple(180.0 * (1.22 ** i) for i in range(len(VOCAB)))


class MiniASR:
    """Deterministic numpy recognizer with save/load; only the softmax
    head is trained."""

    def __init__(self, params: dict):
        self.p = params

    @staticmethod
    def init(width: int = 32, n_layers: int = 2, n_heads: int = 2,
             seed: int = 43) -> "MiniASR":
        rs = np.random.RandomState(seed)
        s = 1.0 / np.sqrt(width)

        def m(*shape):
            return rs.uniform(-s, s, size=shape)

        n_cls = len(VOCAB) + 1
        p: dict = {
            "width": width, "n_layers": n_layers, "n_heads": n_heads,
            "in_w": m(N_MELS, width), "in_b": np.zeros(width),
            "head_w": m(width, n_cls), "head_b": np.zeros(n_cls),
        }
        for i in range(n_layers):
            p[f"l{i}"] = {
                "ln1_g": np.ones(width), "ln1_b": np.zeros(width),
                "wq": m(width, width), "wk": m(width, width),
                "wv": m(width, width), "wo": m(width, width),
                "ln2_g": np.ones(width), "ln2_b": np.zeros(width),
                "w1": m(width, 4 * width), "b1": np.zeros(4 * width),
                "w2": m(4 * width, width), "b2": np.zeros(width),
            }
        return MiniASR(p)

    def _body(self, feats: np.ndarray) -> np.ndarray:
        p = self.p
        w, nh = p["width"], p["n_heads"]
        dk = w // nh
        scale = 1.0 / np.sqrt(dk)
        x = feats @ p["in_w"] + p["in_b"]
        lmax = x.shape[0]
        for i in range(p["n_layers"]):
            lp = p[f"l{i}"]
            h = layer_norm(x, lp["ln1_g"], lp["ln1_b"])
            q = (h @ lp["wq"]).reshape(lmax, nh, dk)
            k = (h @ lp["wk"]).reshape(lmax, nh, dk)
            v = (h @ lp["wv"]).reshape(lmax, nh, dk)
            att = np.einsum("qhd,khd->hqk", q, k) * scale
            att = att - att.max(axis=-1, keepdims=True)
            e = np.exp(att)
            att = e / e.sum(axis=-1, keepdims=True)
            ctx = np.einsum("hqk,khd->qhd", att, v).reshape(lmax, w)
            x = x + ctx @ lp["wo"]
            h = layer_norm(x, lp["ln2_g"], lp["ln2_b"])
            x = x + gelu(h @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"]
        return x

    def frame_token_ids(self, wav: np.ndarray, sr: int = SR) -> np.ndarray:
        """waveform -> (T,) per-frame argmax class ids (0 = blank).
        Integer-exact — the gate's materialization seam."""
        if sr != SR:
            raise ValueError(f"MiniASR expects {SR} Hz input, got {sr}")
        feats = logmel_frames(wav)
        if feats.shape[0] == 0:
            return np.zeros(0, dtype=np.int64)
        h = self._body(feats)
        logits = h @ self.p["head_w"] + self.p["head_b"]
        return np.argmax(logits, axis=1).astype(np.int64)

    def transcribe(self, wav: np.ndarray, sr: int = SR) -> str:
        """Greedy CTC best-path decode: collapse repeats, drop blanks,
        join words with single spaces."""
        return decode_ids(self.frame_token_ids(wav, sr))

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        def enc(v):
            if isinstance(v, np.ndarray):
                return {"__nd__": v.tolist()}
            if isinstance(v, dict):
                return {k: enc(x) for k, x in v.items()}
            return v

        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({k: enc(v) for k, v in self.p.items()}, f)
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "MiniASR":
        def dec(v):
            if isinstance(v, dict):
                if "__nd__" in v:
                    return np.asarray(v["__nd__"], dtype=np.float64)
                return {k: dec(x) for k, x in v.items()}
            return v

        with open(path) as f:
            return MiniASR({k: dec(v) for k, v in json.load(f).items()})


def decode_ids(ids: np.ndarray) -> str:
    """Greedy CTC collapse: repeats merged, blanks dropped."""
    words = []
    prev = -1
    for t in ids:
        t = int(t)
        if t != prev and t != BLANK:
            words.append(VOCAB[t - 1])
        prev = t
    return " ".join(words)


# ----------------------------------------------------------------------
# Synthetic tone-coded utterances + head training.


def synth_utterance(seed: int):
    """Deterministic utterance: (waveform float64, transcript str).
    2-6 vocabulary words as harmonic tones over a noise floor with
    silence gaps."""
    rng = np.random.RandomState(seed % (2**31))
    n_words = 2 + int(rng.randint(5))
    words = [int(rng.randint(len(VOCAB))) for _ in range(n_words)]
    pieces = [rng.normal(scale=0.01, size=int(0.15 * SR))]
    intervals = []
    t_cursor = 0.15
    for w in words:
        dur = 0.35 + 0.25 * rng.uniform()
        n = int(dur * SR)
        t = np.arange(n) / SR
        f0 = _WORD_F0[w]
        tone = np.zeros(n)
        for harm in (1, 2):
            tone += np.sin(2 * np.pi * f0 * harm * t + rng.uniform(0, 6.28)) / harm
        env = np.minimum(1.0, np.minimum(
            np.arange(n) / (0.02 * SR), np.arange(n)[::-1] / (0.02 * SR)
        ))
        pieces.append(0.3 * tone * env + rng.normal(scale=0.01, size=n))
        intervals.append((w, t_cursor, t_cursor + dur))
        t_cursor += dur
        gap = 0.12 + 0.15 * rng.uniform()
        pieces.append(rng.normal(scale=0.01, size=int(gap * SR)))
        t_cursor += gap
    wav = np.concatenate(pieces)
    return wav, " ".join(VOCAB[w] for w in words), intervals


def frame_classes(intervals, n_frames: int) -> np.ndarray:
    """(T,) class labels: word w+1 when the frame CENTER is inside
    word w's interval (with a 60 ms edge margin so attack/decay frames
    stay blank), else blank."""
    y = np.zeros(n_frames, dtype=np.int64)
    centers = FRAME_SEC * np.arange(n_frames) + FRAME_SEC / 2.0
    for w, s, e in intervals:
        y[(centers >= s + 0.06) & (centers < e - 0.06)] = w + 1
    return y


def train_head(model: MiniASR, n_clips: int = 48, epochs: int = 400,
               lr: float = 1.0, seed: int = 17) -> MiniASR:
    """Train ONLY head_w/head_b with per-frame softmax cross-entropy
    over pooled frozen body features (framewise CE — see module
    docstring). Deterministic full-batch GD."""
    p = model.p
    hs, ys = [], []
    for i in range(n_clips):
        wav, _, intervals = synth_utterance(seed * 10000 + i)
        feats = logmel_frames(wav)
        hs.append(model._body(feats))
        ys.append(frame_classes(intervals, feats.shape[0]))
    H = np.concatenate(hs)
    Y = np.concatenate(ys)
    n = len(H)
    n_cls = len(VOCAB) + 1
    onehot = np.eye(n_cls)[Y]
    for epoch in range(epochs):
        step = lr * (1.0 - epoch / epochs)
        z = H @ p["head_w"] + p["head_b"]
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        prob = e / e.sum(axis=1, keepdims=True)
        g = (prob - onehot) / n
        p["head_w"] -= step * (H.T @ g)
        p["head_b"] -= step * g.sum(axis=0)
    return model


# ----------------------------------------------------------------------
_CACHE: dict[str, MiniASR] = {}


def load_cached(path: str) -> MiniASR:
    key = f"{path}:{os.path.getmtime(path)}:{os.path.getsize(path)}"
    m = _CACHE.get(key)
    if m is None:
        if len(_CACHE) >= 2:
            _CACHE.clear()
        m = MiniASR.load(path)
        _CACHE[key] = m
    return m


def ensure_artifact(path: str, seed: int = 43) -> str:
    if not os.path.exists(path):
        model = train_head(MiniASR.init(seed=seed))
        model.save(path)
    return path

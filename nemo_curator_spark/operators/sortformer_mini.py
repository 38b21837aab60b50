"""MiniSortFormer — a deterministic pure-numpy speaker-diarization
network giving the diarization pipeline REAL per-frame speaker
activities in this sandbox.

The reference diarizes with NeMo's Streaming Sortformer
(stages/audio/inference/speaker_diarization/sortformer.py:86-238,
nvidia/diar_streaming_sortformer_4spk-v2.1): a mel-spectrogram front
end into a Fast-Conformer encoder and transformer stack, ending in a
4-unit per-frame sigmoid head whose channels are ordered by speaker
ARRIVAL time (the published "sort loss" objective). NeMo/torch are
absent here, so — following the MiniTransformer / MiniFastText /
MiniTransNetV2 / MiniPyanNet / MiniCLIP precedent — this module is the
same wiring in float64 numpy at miniature scale:

* front end: 25 ms / 10 ms framed rfft magnitudes through a 16-band
  mel triangle filterbank, log1p, then 4x temporal average-pool (the
  conformer subsampling role) — 40 ms output frames;
* body: input projection + 2 pre-LN bidirectional transformer blocks
  (the MiniTransformer/MiniCLIP block math), frozen seeded-random;
* head: one linear 4-unit layer + sigmoid per frame (the trained
  probe) — per-frame per-speaker activity probabilities, exactly the
  tensor the NeMo model's head emits.

Sort contract: the published model's defining property is that output
channel k is the k-th speaker BY ARRIVAL. A frozen random body cannot
learn arrival bookkeeping, so the probe here detects speaker IDENTITY
channels (separable from the mel signature) and the arrival ordering
is applied as an exact deterministic post-transform — channels
relabeled by their first active frame — which reproduces the
observable arrival-ordered output contract end to end
(:func:`diar_segments`). The trained NeMo checkpoint remains the
documented plug point for true in-network sorting.

Training: frozen body; ONLY the head is trained (deterministic
full-batch gradient descent, per-frame BCE) on synthetic multi-speaker
clips — up to three speakers with distinct harmonic carriers, segments
that may OVERLAP across speakers (overlapping speech is the model
family's specialty), labels from the known intervals. Held-out frame
F1 is pinned by tests/test_sortformer_mini.py.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nemo_curator_spark.operators.mini_transformer import gelu, layer_norm

SR = 16000
FRAME = 400  # 25 ms
HOP = 160  # 10 ms
N_MELS = 16
SUBSAMPLE = 4  # -> 40 ms output frames
FRAME_SEC = HOP * SUBSAMPLE / SR  # 0.04
N_SPK = 4
# identity carriers (fundamental Hz) for the synthetic corpus — three
# well-separated mel regions; channel 3 stays the silent spare like the
# 4-speaker checkpoint on 3-speaker audio
CARRIERS = (220.0, 650.0, 1500.0)


def mel_filterbank(n_mels: int = N_MELS, n_fft: int = FRAME,
                   sr: int = SR) -> np.ndarray:
    """Triangular mel filterbank over rfft bins, (n_mels, n_fft//2+1)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    edges = mel_to_hz(
        np.linspace(hz_to_mel(50.0), hz_to_mel(sr / 2.0 - 200.0), n_mels + 2)
    )
    fb = np.zeros((n_mels, len(freqs)))
    for i in range(n_mels):
        lo, mid, hi = edges[i], edges[i + 1], edges[i + 2]
        up = (freqs - lo) / max(mid - lo, 1e-9)
        down = (hi - freqs) / max(hi - mid, 1e-9)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


_FB = None
_WIN = None


def logmel_frames(wav: np.ndarray) -> np.ndarray:
    """waveform -> (T, N_MELS) log-mel frames, 4x average-pooled — the
    shared mini acoustic front end (MiniSortFormer + MiniASR)."""
    global _FB, _WIN
    if _FB is None:
        _FB = mel_filterbank()
        _WIN = np.hamming(FRAME)
    x = np.asarray(wav, dtype=np.float64)
    n = (len(x) - FRAME) // HOP + 1
    if n <= 0:
        return np.zeros((0, N_MELS))
    idx = np.arange(FRAME)[None, :] + HOP * np.arange(n)[:, None]
    frames = x[idx] * _WIN[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    mel = np.log1p(mag @ _FB.T)
    t = (n // SUBSAMPLE) * SUBSAMPLE
    if t == 0:
        return np.zeros((0, N_MELS))
    return mel[:t].reshape(t // SUBSAMPLE, SUBSAMPLE, N_MELS).mean(axis=1)


class MiniSortFormer:
    """Deterministic numpy diarizer with save/load; only the 4-unit
    head is trained."""

    def __init__(self, params: dict):
        self.p = params

    # ------------------------------------------------------------------
    @staticmethod
    def init(width: int = 32, n_layers: int = 2, n_heads: int = 2,
             seed: int = 42) -> "MiniSortFormer":
        rs = np.random.RandomState(seed)
        s = 1.0 / np.sqrt(width)

        def m(*shape):
            return rs.uniform(-s, s, size=shape)

        p: dict = {
            "width": width, "n_layers": n_layers, "n_heads": n_heads,
            "in_w": m(N_MELS, width), "in_b": np.zeros(width),
            # trained:
            "head_w": m(width, N_SPK), "head_b": np.zeros(N_SPK),
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
        return MiniSortFormer(p)

    # ------------------------------------------------------------------
    def _features(self, wav: np.ndarray) -> np.ndarray:
        """waveform -> (T, N_MELS) log-mel frames, 4x pooled."""
        return logmel_frames(wav)

    def _body(self, feats: np.ndarray) -> np.ndarray:
        """(T, N_MELS) -> (T, width) through the frozen pre-LN stack
        (bidirectional — no mask; B=1, batching-invariance rule)."""
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

    def activities(self, wav: np.ndarray, sr: int = SR) -> tuple[np.ndarray, np.ndarray]:
        """waveform -> ((T, N_SPK) sigmoid activities, (T,) frame start
        times). Identity channels; arrival ordering is applied
        downstream (:func:`diar_segments`)."""
        if sr != SR:
            raise ValueError(f"MiniSortFormer expects {SR} Hz input, got {sr}")
        feats = self._features(wav)
        if feats.shape[0] == 0:
            return np.zeros((0, N_SPK)), np.zeros(0)
        h = self._body(feats)
        logits = h @ self.p["head_w"] + self.p["head_b"]
        probs = 1.0 / (1.0 + np.exp(-logits))
        times = FRAME_SEC * np.arange(feats.shape[0])
        return probs, times

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
    def load(path: str) -> "MiniSortFormer":
        def dec(v):
            if isinstance(v, dict):
                if "__nd__" in v:
                    return np.asarray(v["__nd__"], dtype=np.float64)
                return {k: dec(x) for k, x in v.items()}
            return v

        with open(path) as f:
            return MiniSortFormer(
                {k: dec(v) for k, v in json.load(f).items()}
            )


# ----------------------------------------------------------------------
# Synthetic multi-speaker clips + head training.


def synth_diar_clip(seed: int, duration: float | None = None):
    """Deterministic multi-speaker clip: (waveform, [(spk, start, end)]).
    1-3 identity speakers, 1-2 turns each, turns MAY overlap across
    speakers; harmonic carriers + low noise floor."""
    rng = np.random.RandomState(seed % (2**31))
    dur = duration if duration is not None else 4.0 + float(rng.randint(4))
    n = int(dur * SR)
    wav = rng.normal(scale=0.01, size=n)
    n_spk = 1 + int(rng.randint(3))
    spks = sorted(rng.choice(3, size=n_spk, replace=False).tolist())
    segs = []
    for spk in spks:
        f0 = CARRIERS[spk]
        for _ in range(1 + int(rng.randint(2))):
            length = 0.6 + 1.2 * rng.uniform()
            start = rng.uniform(0.0, max(dur - length, 0.05))
            end = min(start + length, dur)
            t = np.arange(int(start * SR), int(end * SR)) / SR
            tone = np.zeros(len(t))
            for harm in (1, 2, 3):
                tone += np.sin(2 * np.pi * f0 * harm * t + rng.uniform(0, 6.28)) / harm
            env = np.minimum(1.0, np.minimum(
                np.arange(len(t)) / (0.02 * SR),
                np.arange(len(t))[::-1] / (0.02 * SR),
            ))
            wav[int(start * SR): int(start * SR) + len(t)] += 0.3 * tone * env
            segs.append((spk, float(start), float(end)))
    return wav, segs


def frame_labels(segs, n_frames: int) -> np.ndarray:
    """(T, N_SPK) 0/1 identity labels: frame active when its CENTER is
    inside a segment of that speaker."""
    y = np.zeros((n_frames, N_SPK))
    centers = FRAME_SEC * np.arange(n_frames) + FRAME_SEC / 2.0
    for spk, s, e in segs:
        y[(centers >= s) & (centers < e), spk] = 1.0
    return y


def train_head(model: MiniSortFormer, n_clips: int = 24,
               epochs: int = 200, lr: float = 0.5,
               seed: int = 9) -> MiniSortFormer:
    """Train ONLY head_w/head_b with per-frame BCE over pooled frozen
    body features. Deterministic full-batch GD; mutates and returns."""
    p = model.p
    hs, ys = [], []
    for i in range(n_clips):
        wav, segs = synth_diar_clip(seed * 10000 + i)
        feats = model._features(wav)
        hs.append(model._body(feats))
        ys.append(frame_labels(segs, feats.shape[0]))
    H = np.concatenate(hs)  # (N, width)
    Y = np.concatenate(ys)  # (N, N_SPK)
    n = len(H)
    for epoch in range(epochs):
        step = lr * (1.0 - epoch / epochs)
        z = H @ p["head_w"] + p["head_b"]
        prob = 1.0 / (1.0 + np.exp(-z))
        g = (prob - Y) / n  # dBCE/dz
        p["head_w"] -= step * (H.T @ g)
        p["head_b"] -= step * g.sum(axis=0)
    return model


# ----------------------------------------------------------------------
# Arrival-ordered segment assembly (the sort contract, post-transform).


def diar_segments(model: MiniSortFormer, wav: np.ndarray, sr: int = SR,
                  onset: float = 0.5) -> list[str]:
    """Per-frame activities -> identity-channel threshold islands ->
    channels relabeled by first active frame (the Sortformer arrival
    contract) -> ``"start end speaker_k"`` strings, exactly the string
    format ``_parse_sortformer_segments`` consumes
    (sortformer.py:42-49). Segment times are frame-grid bounds: island
    start frame's start time, last frame's end time."""
    probs, times = model.activities(wav, sr)
    per_channel: list[list[tuple[float, float]]] = []
    for c in range(N_SPK):
        active = probs[:, c] > onset
        segs = []
        i = 0
        while i < len(active):
            if active[i]:
                j = i
                while j + 1 < len(active) and active[j + 1]:
                    j += 1
                segs.append((times[i], times[j] + FRAME_SEC))
                i = j + 1
            else:
                i += 1
        per_channel.append(segs)
    arrived = sorted(
        (c for c in range(N_SPK) if per_channel[c]),
        key=lambda c: (per_channel[c][0][0], c),
    )
    out = []
    for order, c in enumerate(arrived):
        for s, e in per_channel[c]:
            out.append((s, e, order))
    out.sort(key=lambda t: (t[2], t[0]))
    return [f"{s} {e} speaker_{k}" for s, e, k in out]


# ----------------------------------------------------------------------
# Per-worker artifact cache.
_CACHE: dict[str, MiniSortFormer] = {}


def load_cached(path: str) -> MiniSortFormer:
    key = f"{path}:{os.path.getmtime(path)}:{os.path.getsize(path)}"
    m = _CACHE.get(key)
    if m is None:
        if len(_CACHE) >= 2:
            _CACHE.clear()
        m = MiniSortFormer.load(path)
        _CACHE[key] = m
    return m


def ensure_artifact(path: str, seed: int = 42) -> str:
    if not os.path.exists(path):
        model = train_head(MiniSortFormer.init(seed=seed))
        model.save(path)
    return path


def diarizer(path: str, onset: float = 0.5):
    """The ``SpeakerSeparationStage.diarize`` plug
    (operators/speaker_sep.py: ``diarize(waveform, sample_rate) ->
    [segment strings]`` — the reference's NeMo SortFormer seam,
    speaker_separation.py:64-248) backed by the cached MiniSortFormer
    artifact. int16 waveforms are rescaled to the float range the net
    was trained on."""

    def _diarize(waveform, sample_rate):
        wav = np.asarray(waveform)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float64) / 32768.0
        return diar_segments(
            load_cached(path), np.asarray(wav, dtype=np.float64),
            int(sample_rate), onset=onset,
        )

    return _diarize

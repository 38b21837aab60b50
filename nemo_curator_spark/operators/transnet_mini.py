"""MiniTransNetV2 — a deterministic pure-numpy TransNetV2 giving the
shot-transition pipeline a REAL inference path in this sandbox.

The reference runs the published TransNetV2 (Soucek & Lokoc 2020) on GPU
(reference models/transnetv2.py:43-260 — StackedDDCNNV2 stacks of
DilatedDCNNV2 blocks of separable (2+1)D convs, FrameSimilarity and
ColorHistograms side features, fc1+cls head) and thresholds the sigmoid
per-frame probabilities into scenes
(stages/video/clipping/transnetv2_extraction.py:146-226). torch is absent
here, so — following the MiniTransformer/MiniFastText precedent — this
module is the same architecture shape-for-shape in float64 numpy at
miniature scale:

* identical wiring: ``rl`` stacked SDDCNN stages of ``rs`` DilatedDCNN
  blocks; each block is 4 parallel separable (2+1)D conv branches at
  time dilations 1/2/4/8 ((1,3,3) spatial conv then (3,1,1) dilated
  temporal conv, models/transnetv2.py:297-344), concat, eval-mode
  BatchNorm (eps 1e-3), ReLU on all but the stack's last block; the
  stack adds the first block's output as a shortcut, ReLUs, and
  avg-pools (1,2,2) (transnetv2.py:161-238);
* FrameSimilarity over the concatenated per-stack spatial means:
  linear projection, L2 normalize, full T x T dot-product similarity,
  per-frame lookup-window gather with edge padding, fc + ReLU
  (transnetv2.py:364-437);
* ColorHistograms: 512-bin RGB histogram per frame ((r>>5)<<6 |
  (g>>5)<<3 | (b>>5)), L2 normalized, the same windowed similarity
  gather, fc + ReLU (transnetv2.py:440-546);
* head: concat [color_hist, frame_sim, flattened conv features] ->
  fc1 -> ReLU -> (dropout = identity at eval) -> cls -> sigmoid
  (transnetv2.py:108-159).

Mini constants (vs reference): frames 9x16x3 uint8 (vs 27x48x3 — same
three 2x2 pools: 9x16 -> 4x8 -> 2x4 -> 1x2), rf=2 (vs 16), rd=32
(vs 1024), lookup_window=11 (vs 101), similarity/hist output dims 16
(vs 128). The batching contract is the reference's verbatim, quirks
included: windows of up to 100 frames stepped by 50, first-frame
replication at the start, and genuinely SHORT trailing windows — the
reference's end-padding branch is dead code because end_idx is clamped
to total before the `end_idx > total` check — keeping predictions
[25:75] per window (transnetv2_extraction.py:146-177).

Training follows the frozen-body + trained-probe recipe
(mini_transformer.train_head): every conv/projection weight is
seeded-random and frozen; only the final ``cls`` logistic layer is
trained (deterministic full-batch gradient descent) on synthetic
hard-cut videos with known transition frames. The windowed similarity
features drop sharply at a cut, so the probe separates transitions well
above chance — real inference, meaningful predictions. The published
GPU weights remain the documented plug point
(models/transnetv2.py:548-616 download path).
"""

from __future__ import annotations

import json
import os

import numpy as np

try:  # module-global so Spark UDF machinery can resolve it (CLAUDE.md rule)
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None

H, W = 9, 16
LOOKUP_WINDOW = 11
DILATIONS = (1, 2, 4, 8)


def _relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def _conv_spatial(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """(1,3,3) conv, padding (0,1,1), no bias. x: (Cin,T,H,W);
    w: (Cout,Cin,3,3) -> (Cout,T,H,W)."""
    _, _, h, wd = x.shape
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = np.zeros((w.shape[0],) + x.shape[1:])
    for dy in range(3):
        for dx in range(3):
            out += np.einsum(
                "oc,cthw->othw",
                w[:, :, dy, dx],
                xp[:, :, dy : dy + h, dx : dx + wd],
                optimize=True,
            )
    return out


def _conv_temporal(x: np.ndarray, w: np.ndarray, b: np.ndarray | None,
                   dilation: int) -> np.ndarray:
    """(3,1,1) conv, time dilation d, padding (d,0,0). x: (Cin,T,H,W);
    w: (Cout,Cin,3) -> (Cout,T,H,W)."""
    t = x.shape[1]
    xp = np.pad(x, ((0, 0), (dilation, dilation), (0, 0), (0, 0)))
    out = np.zeros((w.shape[0],) + x.shape[1:])
    for kt in range(3):
        out += np.einsum(
            "oc,cthw->othw",
            w[:, :, kt],
            xp[:, kt * dilation : kt * dilation + t],
            optimize=True,
        )
    if b is not None:
        out += b[:, None, None, None]
    return out


def _avg_pool_2x2(x: np.ndarray) -> np.ndarray:
    """AvgPool3d kernel (1,2,2): floor-division spatial halving, odd
    remainder rows/cols dropped (PyTorch semantics)."""
    c, t, h, w = x.shape
    h2, w2 = h // 2, w // 2
    v = x[:, :, : h2 * 2, : w2 * 2].reshape(c, t, h2, 2, w2, 2)
    return v.mean(axis=(3, 5))


def _windowed_similarity(x: np.ndarray, lookup_window: int) -> np.ndarray:
    """x: (T, D) L2-normalized rows -> (T, lookup_window) of each frame's
    similarity to its +-(lw-1)/2 neighborhood, zero-padded at the edges
    (the reference pads the T x T similarity matrix,
    models/transnetv2.py:413-437)."""
    t = x.shape[0]
    sims = x @ x.T  # (T, T)
    half = (lookup_window - 1) // 2
    padded = np.pad(sims, ((0, 0), (half, half)))
    out = np.empty((t, lookup_window))
    for i in range(t):
        out[i] = padded[i, i : i + lookup_window]
    return out


def color_histograms(frames: np.ndarray) -> np.ndarray:
    """512-bin RGB histograms, L2 normalized per frame — exact port of
    ColorHistograms.compute_color_histograms (transnetv2.py:459-504).
    frames: (T, H, W, 3) uint8 -> (T, 512) float64."""
    f = frames.astype(np.int64)
    r, g, b = f[..., 0] >> 5, f[..., 1] >> 5, f[..., 2] >> 5
    bins = ((r << 6) + (g << 3) + b).reshape(frames.shape[0], -1)
    t = frames.shape[0]
    hist = np.zeros((t, 512))
    for i in range(t):
        hist[i] = np.bincount(bins[i], minlength=512)
    norms = np.sqrt((hist**2).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    return hist / norms


class MiniTransNetV2:
    """Deterministic numpy TransNetV2 with save/load and a trainable
    logistic head (``cls_w``/``cls_b``). ``rf``/``rl``/``rs``/``rd``
    mirror the reference constructor names (models/transnetv2.py:44)."""

    def __init__(self, params: dict, rf: int = 2, rl: int = 3, rs: int = 2,
                 rd: int = 32, threshold: float = 0.5):
        self.p = params
        self.rf, self.rl, self.rs, self.rd = rf, rl, rs, rd
        self.threshold = threshold

    # ------------------------------------------------------------------
    @staticmethod
    def init(rf: int = 2, rl: int = 3, rs: int = 2, rd: int = 32,
             sim_dim: int = 8, sim_out: int = 16, hist_out: int = 16,
             seed: int = 42) -> "MiniTransNetV2":
        rng = np.random.RandomState(seed)

        def m(*shape):
            fan_in = int(np.prod(shape[1:])) or 1
            return rng.uniform(-1.0, 1.0, size=shape) / np.sqrt(fan_in)

        p: dict = {"rf": rf, "rl": rl, "rs": rs, "rd": rd,
                   "sim_dim": sim_dim, "sim_out": sim_out,
                   "hist_out": hist_out}
        in_c = 3
        for li in range(rl):
            filters = rf * 2**li
            for bi in range(rs):
                cin = in_c if bi == 0 else filters * 4
                for d in DILATIONS:
                    # separable (2+1)D: spatial (no bias) then temporal
                    # (bias off because BatchNorm follows, transnetv2.py:254)
                    p[f"s{li}b{bi}d{d}_ws"] = m(2 * filters, cin, 3, 3)
                    p[f"s{li}b{bi}d{d}_wt"] = m(filters, 2 * filters, 3)
                # eval-mode BatchNorm: identity stats (mean 0, var 1),
                # learnable gamma/beta at their init values
                p[f"s{li}b{bi}_bn_g"] = np.ones(filters * 4)
                p[f"s{li}b{bi}_bn_b"] = np.zeros(filters * 4)
            in_c = filters * 4
        sum_c = sum(rf * 2**i * 4 for i in range(rl))
        p["sim_proj_w"] = m(sim_dim, sum_c)
        p["sim_proj_b"] = np.zeros(sim_dim)  # use_bias=True upstream
        p["sim_fc_w"] = m(sim_out, LOOKUP_WINDOW)
        p["sim_fc_b"] = np.zeros(sim_out)
        p["hist_fc_w"] = m(hist_out, LOOKUP_WINDOW)
        p["hist_fc_b"] = np.zeros(hist_out)
        final_c = rf * 2 ** (rl - 1) * 4
        flat = final_c * (H // 8) * (W // 8)
        p["fc1_w"] = m(rd, hist_out + sim_out + flat)
        p["fc1_b"] = np.zeros(rd)
        p["cls_w"] = np.zeros(rd)
        p["cls_b"] = np.zeros(1)
        return MiniTransNetV2(p, rf, rl, rs, rd)

    # ------------------------------------------------------------------
    def _stack(self, x: np.ndarray, li: int) -> np.ndarray:
        """One StackedDDCNNV2 (transnetv2.py:203-238): rs DilatedDCNN
        blocks (ReLU on all but the last), first block's output as the
        shortcut, final ReLU, shortcut add, 2x2 avg pool."""
        p = self.p
        shortcut = None
        for bi in range(self.rs):
            branches = []
            for d in DILATIONS:
                h = _conv_spatial(x, p[f"s{li}b{bi}d{d}_ws"])
                h = _conv_temporal(h, p[f"s{li}b{bi}d{d}_wt"], None, d)
                branches.append(h)
            x = np.concatenate(branches, axis=0)
            # eval BatchNorm with identity running stats: x/sqrt(1+eps)*g+b
            g = p[f"s{li}b{bi}_bn_g"][:, None, None, None]
            b = p[f"s{li}b{bi}_bn_b"][:, None, None, None]
            x = x / np.sqrt(1.0 + 1e-3) * g + b
            if bi != self.rs - 1:
                x = _relu(x)
            if shortcut is None:
                shortcut = x
        x = _relu(x)
        x = x + shortcut
        return _avg_pool_2x2(x)

    def forward_features(self, frames: np.ndarray) -> np.ndarray:
        """frames: (T, H, W, 3) uint8 -> (T, rd) post-ReLU fc1 features
        (the frozen body; the reference applies dropout here, identity
        at eval)."""
        if frames.shape[1:] != (H, W, 3):
            msg = f"expected (T, {H}, {W}, 3), got {frames.shape}"
            raise ValueError(msg)
        p = self.p
        x = frames.astype(np.float64).transpose(3, 0, 1, 2) / 255.0
        block_feats = []
        for li in range(self.rl):
            x = self._stack(x, li)
            block_feats.append(x)
        t = x.shape[1]
        # channel-last flatten, matching x.permute(0,2,3,4,1).reshape
        flat = x.transpose(1, 2, 3, 0).reshape(t, -1)
        # FrameSimilarity: concat per-stack spatial means -> (T, sum_c)
        sim_in = np.concatenate(
            [bf.mean(axis=(2, 3)).T for bf in block_feats], axis=1
        )
        proj = sim_in @ p["sim_proj_w"].T + p["sim_proj_b"]
        norms = np.sqrt((proj**2).sum(axis=1, keepdims=True))
        norms[norms == 0.0] = 1.0
        proj = proj / norms
        sim = _windowed_similarity(proj, LOOKUP_WINDOW)
        sim = _relu(sim @ p["sim_fc_w"].T + p["sim_fc_b"])
        # ColorHistograms over the raw uint8 frames
        hist = color_histograms(frames)
        hsim = _windowed_similarity(hist, LOOKUP_WINDOW)
        hsim = _relu(hsim @ p["hist_fc_w"].T + p["hist_fc_b"])
        # concat order: [color_hist, frame_sim, conv] (transnetv2.py:143-147
        # prepends each side feature in turn)
        feat = np.concatenate([hsim, sim, flat], axis=1)
        return _relu(feat @ p["fc1_w"].T + p["fc1_b"])

    def window_probs(self, frames: np.ndarray) -> np.ndarray:
        """Sigmoid transition probability per frame of ONE window."""
        f = self.forward_features(frames)
        logits = f @ self.p["cls_w"] + self.p["cls_b"][0]
        return 1.0 / (1.0 + np.exp(-logits))

    def predict_video(self, frames: np.ndarray) -> np.ndarray:
        """Per-frame probabilities for a whole video via the reference
        batching contract (transnetv2_extraction.py:146-177): 100-frame
        windows stepped by 50, 25-frame first/last-frame padding, keep
        [25:75] of each window, truncate to the true length. Windows are
        forwarded one at a time (B=1 — the batching-invariance rule for
        gate-exposed model outputs)."""
        preds = []
        for batch in get_batches(frames):
            preds.append(self.window_probs(batch)[25:75])
        return np.concatenate(preds)[: len(frames)]

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        payload = {
            "params": {
                k: v.tolist() if isinstance(v, np.ndarray) else v
                for k, v in self.p.items()
            },
            "rf": self.rf, "rl": self.rl, "rs": self.rs, "rd": self.rd,
            "threshold": self.threshold,
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "MiniTransNetV2":
        with open(path) as f:
            d = json.load(f)
        p = {
            k: np.asarray(v, dtype=np.float64) if isinstance(v, list) else v
            for k, v in d["params"].items()
        }
        return MiniTransNetV2(p, d["rf"], d["rl"], d["rs"], d["rd"],
                              d.get("threshold", 0.5))


def get_batches(frames: np.ndarray):
    """Exact port of _get_batches (transnetv2_extraction.py:146-167):
    100-frame windows stepped by 50 with first/last-frame padding."""
    total = len(frames)
    reminder = -total % 50
    for i in range(0, total + reminder, 50):
        start_idx = max(i - 25, 0)
        end_idx = min(i + 75, total)
        batch = frames[start_idx:end_idx]
        if i < 25:
            pad = np.repeat(frames[:1], 25 - i, axis=0)
            batch = np.concatenate([pad, batch], axis=0)
        if end_idx > total:
            pad = np.repeat(frames[-1:], end_idx - total, axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        yield batch


# ----------------------------------------------------------------------
# Synthetic hard-cut videos (training + gate input): piecewise-constant
# color segments with deterministic per-frame noise. Cut positions are
# the ground-truth transition labels.


def synth_video(seed: int, n_frames: int) -> tuple[np.ndarray, list[int]]:
    """Deterministic (frames, cut_frame_indices). Segments are 8-24
    frames of one base color + uniform noise; a 'cut' label sits on the
    first frame of each new segment (the reference trains on transition
    frames; single-hot is the probe's target)."""
    rng = np.random.RandomState(seed)
    frames = np.zeros((n_frames, H, W, 3), dtype=np.uint8)
    cuts: list[int] = []
    t = 0
    while t < n_frames:
        seg = int(rng.randint(8, 25))
        color = rng.randint(0, 256, size=3)
        end = min(t + seg, n_frames)
        noise = rng.randint(-12, 13, size=(end - t, H, W, 3))
        frames[t:end] = np.clip(color[None, None, None, :] + noise, 0, 255)
        if t > 0:
            cuts.append(t)
        t = end
    return frames, cuts


def train_probe(model: MiniTransNetV2, n_videos: int = 24,
                frames_per_video: int = 100, epochs: int = 800,
                lr: float = 2.0, seed: int = 7) -> MiniTransNetV2:
    """Train ONLY the cls logistic layer on frozen-body features of
    synthetic hard-cut videos — deterministic full-batch gradient
    descent with positive-class weighting (cuts are ~6% of frames).
    Mutates and returns ``model``; also calibrates ``threshold`` to the
    midpoint between the mean scores of the two classes."""
    feats, ys = [], []
    for v in range(n_videos):
        frames, cuts = synth_video(seed * 1000 + v, frames_per_video)
        f = model.forward_features(frames)
        y = np.zeros(len(frames))
        y[list(cuts)] = 1.0
        feats.append(f)
        ys.append(y)
    x = np.concatenate(feats)
    y = np.concatenate(ys)
    pos_w = (len(y) - y.sum()) / max(y.sum(), 1.0)
    sample_w = np.where(y == 1.0, pos_w, 1.0)
    sample_w = sample_w / sample_w.sum()
    w = np.zeros(x.shape[1])
    b = 0.0
    for epoch in range(epochs):
        step = lr * (1.0 - epoch / epochs)
        prob = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        g = (prob - y) * sample_w
        w -= step * (x.T @ g)
        b -= step * g.sum()
    model.p["cls_w"] = w
    model.p["cls_b"] = np.asarray([b])
    # calibrate the decision threshold by F1 scan over the training
    # scores (the reference stage exposes `threshold` as a tunable,
    # transnetv2_extraction.py:64; here it's fit once with the probe)
    scores = 1.0 / (1.0 + np.exp(-(x @ w + b)))
    best_t, best_f1 = 0.5, -1.0
    for t in np.linspace(0.05, 0.95, 181):
        pred = scores > t
        tp = float((pred & (y == 1.0)).sum())
        fp = float((pred & (y == 0.0)).sum())
        fn = float((~pred & (y == 1.0)).sum())
        f1 = 2 * tp / max(2 * tp + fp + fn, 1.0)
        if f1 > best_f1:
            best_t, best_f1 = float(t), f1
    model.threshold = best_t
    return model


# ----------------------------------------------------------------------
# Per-worker artifact cache (mini_transformer.load_cached pattern).
_CACHE: dict[str, MiniTransNetV2] = {}


def load_cached(path: str) -> MiniTransNetV2:
    key = f"{path}:{os.path.getmtime(path)}:{os.path.getsize(path)}"
    m = _CACHE.get(key)
    if m is None:
        if len(_CACHE) >= 2:
            _CACHE.clear()
        m = MiniTransNetV2.load(path)
        _CACHE[key] = m
    return m


def ensure_artifact(path: str, seed: int = 42) -> str:
    """Train-once-and-save (the fasttext_mini.ensure_artifact pattern):
    the driver builds the weight file before the Spark job references
    it; workers only ever load."""
    if not os.path.exists(path):
        model = train_probe(MiniTransNetV2.init(seed=seed))
        model.save(path)
    return path


# ----------------------------------------------------------------------
# Spark forms: one mapInPandas pass, per-frame probabilities out. Frame
# bytes never cross an exchange — each input row is forwarded on the
# scan partition that read it (the reference stage likewise keeps frames
# worker-local, transnetv2_extraction.py:252-279).


def _prob_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("video_id", T.LongType()),
            T.StructField("frame", T.LongType()),
            T.StructField("prob", T.DoubleType()),
        ]
    )


def transnet_probs_frames(df, model_path: str, id_col: str = "video_id",
                          frames_col: str = "frames",
                          n_frames_col: str = "n_frames"):
    """Per-frame transition probabilities from RAW frame bytes: each row
    carries a video as packed uint8 RGB (n_frames * 9 * 16 * 3 bytes).
    Output: (video_id, frame, prob)."""
    def gen(it):
        model = load_cached(model_path)
        for pdf in it:
            out = {"video_id": [], "frame": [], "prob": []}
            for _, r in pdf.iterrows():
                n = int(r[n_frames_col])
                frames = np.frombuffer(
                    bytes(r[frames_col]), dtype=np.uint8
                ).reshape(n, H, W, 3)
                probs = model.predict_video(frames)
                out["video_id"].extend([int(r[id_col])] * n)
                out["frame"].extend(range(n))
                out["prob"].extend(map(float, probs))
            yield pd.DataFrame(out)

    cols = [id_col, frames_col, n_frames_col]
    return df.select(*cols).mapInPandas(gen, _prob_schema())


def transnet_probs_synth(df, model_path: str, id_col: str = "video_id",
                         n_frames_col: str = "n_frames"):
    """Gate/test form: the video is synthesized worker-side from the id
    (synth_video(seed=id)) so only (id, n_frames) rows flow into the
    stage — real inference over deterministic pixels with zero byte
    shuffle. Output: (video_id, frame, prob)."""
    def gen(it):
        model = load_cached(model_path)
        for pdf in it:
            out = {"video_id": [], "frame": [], "prob": []}
            for _, r in pdf.iterrows():
                n = int(r[n_frames_col])
                frames, _ = synth_video(int(r[id_col]), n)
                probs = model.predict_video(frames)
                out["video_id"].extend([int(r[id_col])] * n)
                out["frame"].extend(range(n))
                out["prob"].extend(map(float, probs))
            yield pd.DataFrame(out)

    return df.select(id_col, n_frames_col).mapInPandas(gen, _prob_schema())

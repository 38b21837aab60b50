"""MiniCosmosEmbed — a deterministic pure-numpy video/text dual encoder
giving the Cosmos-Embed1 embedding stage REAL inference in this sandbox.

The reference embeds clips with nvidia/Cosmos-Embed1
(models/cosmos_embed1.py:109-188: AutoProcessor preprocessing,
``encode_video_frames`` over a (1, T, C, H, W) tensor,
``get_text_embedding``, and the 100x-cosine softmax ``evaluate``) and
the stage seam in operators/cosmos_embed.py takes injectable
``encoder`` / ``text_encoder`` callables. transformers/torch are absent
here, so — following the MiniTransformer / MiniCLIP / MiniSortFormer /
MiniASR precedent — this module is the same wiring in float64 numpy at
miniature scale:

* video tower: the REAL ``formulate_input_frames`` preprocessing (the
  exact port in cosmos_embed.py, with a mini processor config —
  resolution 24, 8 frames), per-frame non-overlapping patch embedding
  spatially mean-pooled to one token per frame, temporal positions,
  2 pre-LN bidirectional transformer blocks over the T=8 frame tokens,
  temporal mean pooling, projection to the model's REAL 256 dims
  (the published Cosmos-Embed1 embedding width), L2 normalization;
* text tower: hashed-bucket token embeddings + positions, the same
  blocks with a CAUSAL mask, last-token pooling, projection to the
  same 256 dims, L2 normalization;
* ``evaluate`` compatibility: embeddings come out (1, 256) so the
  exact-ported softmax top-k (cosmos_embed.evaluate) consumes them
  unchanged.

Training follows the frozen-body + trained-projections recipe with
CLIP's symmetric InfoNCE objective over matched (video, caption) pairs
— synthetic colored-shape clips (per-frame fresh noise, fixed class)
captioned "a video of a {color} {shape}"; the logit scale stays frozen
(the clip_mini collapse measurement). Held-out zero-shot accuracy is
pinned by tests/test_cosmos_mini.py. The HF checkpoint remains the
documented plug point.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np

from nemo_curator_spark.operators.cosmos_embed import (
    CosmosProcessorConfig,
    formulate_input_frames,
)
from nemo_curator_spark.operators.mini_transformer import gelu, layer_norm

EMBED_DIM = 256  # the published Cosmos-Embed1 embedding width
MINI_RES = 24
MINI_FRAMES = 8
PATCH = 8
MINI_CONFIG = CosmosProcessorConfig(
    num_video_frames=MINI_FRAMES, resolution=MINI_RES
)

COLORS = {
    "red": (200, 40, 40),
    "green": (40, 180, 60),
    "blue": (40, 70, 200),
    "yellow": (210, 200, 50),
}
SHAPES = ("square", "circle", "stripes")
CLASSES = [f"{c} {s}" for c in COLORS for s in SHAPES]


def caption_for(cls: str) -> str:
    return f"a video of a {cls}"


def synth_video(seed: int) -> tuple[list[np.ndarray], str]:
    """Deterministic clip: (list of (24,24,3) uint8 frames, class).
    Fixed class per video, fresh per-frame noise — the temporal tower
    sees genuinely distinct frames of one concept. Frame count varies
    16-31 so ``formulate_input_frames``' stride selection does real
    work."""
    rng = np.random.RandomState(seed % (2**31))
    cls = CLASSES[int(rng.randint(len(CLASSES)))]
    color_name, shape = cls.split()
    color = np.array(COLORS[color_name], dtype=np.float64)
    n_frames = 16 + int(rng.randint(16))
    yy, xx = np.mgrid[0:MINI_RES, 0:MINI_RES]
    if shape == "square":
        mask = (yy >= 4) & (yy < MINI_RES - 4) & (xx >= 4) & (xx < MINI_RES - 4)
    elif shape == "circle":
        c = (MINI_RES - 1) / 2.0
        mask = (yy - c) ** 2 + (xx - c) ** 2 <= (MINI_RES / 2.0 - 3) ** 2
    else:  # stripes
        mask = (yy // 4) % 2 == 0
    frames = []
    for _ in range(n_frames):
        img = rng.uniform(0, 60, size=(MINI_RES, MINI_RES, 3))
        img[mask] = color + rng.uniform(-25, 25, size=(int(mask.sum()), 3))
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return frames, cls


def _hash_tokens(text: str, vocab: int, max_len: int) -> list[int]:
    ids = [zlib.crc32(w.encode("utf-8")) % vocab for w in text.split()]
    return ids[:max_len]


class MiniCosmosEmbed:
    """Deterministic numpy video/text dual encoder with save/load; only
    ``vid_proj`` / ``txt_proj`` are trained."""

    def __init__(self, params: dict):
        self.p = params

    @staticmethod
    def init(width: int = 32, n_layers: int = 2, n_heads: int = 2,
             vocab: int = 256, txt_ctx: int = 16,
             seed: int = 44) -> "MiniCosmosEmbed":
        rs = np.random.RandomState(seed)
        s = 1.0 / np.sqrt(width)

        def m(*shape):
            return rs.uniform(-s, s, size=shape)

        p: dict = {
            "width": width, "n_layers": n_layers, "n_heads": n_heads,
            "vocab": vocab, "txt_ctx": txt_ctx,
            "patch_w": m(PATCH * PATCH * 3, width),
            "t_pos": m(MINI_FRAMES, width),
            "txt_emb": m(vocab, width),
            "txt_pos": m(txt_ctx, width),
            "vid_proj": m(width, EMBED_DIM),
            "txt_proj": m(width, EMBED_DIM),
        }
        for side in ("vid", "txt"):
            for i in range(n_layers):
                p[f"{side}_l{i}"] = {
                    "ln1_g": np.ones(width), "ln1_b": np.zeros(width),
                    "wq": m(width, width), "wk": m(width, width),
                    "wv": m(width, width), "wo": m(width, width),
                    "ln2_g": np.ones(width), "ln2_b": np.zeros(width),
                    "w1": m(width, 4 * width), "b1": np.zeros(4 * width),
                    "w2": m(4 * width, width), "b2": np.zeros(width),
                }
        return MiniCosmosEmbed(p)

    def _blocks(self, x: np.ndarray, side: str, causal: bool) -> np.ndarray:
        p = self.p
        w, nh = p["width"], p["n_heads"]
        dk = w // nh
        scale = 1.0 / np.sqrt(dk)
        lmax = x.shape[0]
        mask = np.triu(np.full((lmax, lmax), -np.inf), k=1) if causal else None
        for i in range(p["n_layers"]):
            lp = p[f"{side}_l{i}"]
            h = layer_norm(x, lp["ln1_g"], lp["ln1_b"])
            q = (h @ lp["wq"]).reshape(lmax, nh, dk)
            k = (h @ lp["wk"]).reshape(lmax, nh, dk)
            v = (h @ lp["wv"]).reshape(lmax, nh, dk)
            att = np.einsum("qhd,khd->hqk", q, k) * scale
            if mask is not None:
                att = att + mask
            att = att - att.max(axis=-1, keepdims=True)
            e = np.exp(att)
            att = e / e.sum(axis=-1, keepdims=True)
            ctx = np.einsum("hqk,khd->qhd", att, v).reshape(lmax, w)
            x = x + ctx @ lp["wo"]
            h = layer_norm(x, lp["ln2_g"], lp["ln2_b"])
            x = x + gelu(h @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"]
        return x

    def _video_pooled(self, frames_ntchw: np.ndarray) -> np.ndarray:
        """(1, T, C, H, W) preprocessed tensor -> (width,) pooled frozen
        feature (B=1 forward)."""
        p = self.p
        g = MINI_RES // PATCH
        v = np.asarray(frames_ntchw, dtype=np.float64)[0]  # (T, C, H, W)
        toks = []
        for t in range(v.shape[0]):
            hwc = np.transpose(v[t], (1, 2, 0))
            patches = (
                hwc.reshape(g, PATCH, g, PATCH, 3)
                .transpose(0, 2, 1, 3, 4)
                .reshape(g * g, PATCH * PATCH * 3)
            )
            toks.append((patches @ p["patch_w"]).mean(axis=0))
        x = np.stack(toks) + p["t_pos"][: len(toks)]
        h = self._blocks(x, "vid", causal=False)
        return h.mean(axis=0)

    def _text_pooled(self, text: str) -> np.ndarray:
        p = self.p
        ids = _hash_tokens(text, p["vocab"], p["txt_ctx"]) or [0]
        seq = p["txt_emb"][np.asarray(ids)] + p["txt_pos"][: len(ids)]
        return self._blocks(seq, "txt", causal=True)[-1]

    # -------------------------------------------------- the stage seam
    def encode_video_frames(self, frames_ntchw: np.ndarray) -> np.ndarray:
        """The ``encoder`` seam (models/cosmos_embed1.py:131-150 role):
        (1, T, C, H, W) -> L2-normalized (1, 256)."""
        emb = self._video_pooled(frames_ntchw) @ self.p["vid_proj"]
        return (emb / np.sqrt((emb**2).sum()))[None, :]

    def get_text_embedding(self, text: str) -> np.ndarray:
        """The ``text_encoder`` seam (models/cosmos_embed1.py:152-168
        role): text -> L2-normalized (1, 256)."""
        emb = self._text_pooled(text) @ self.p["txt_proj"]
        return (emb / np.sqrt((emb**2).sum()))[None, :]

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
    def load(path: str) -> "MiniCosmosEmbed":
        def dec(v):
            if isinstance(v, dict):
                if "__nd__" in v:
                    return np.asarray(v["__nd__"], dtype=np.float64)
                return {k: dec(x) for k, x in v.items()}
            return v

        with open(path) as f:
            return MiniCosmosEmbed(
                {k: dec(v) for k, v in json.load(f).items()}
            )


def train_contrastive(model: MiniCosmosEmbed, n_pairs: int = 96,
                      epochs: int = 300, lr: float = 0.5,
                      seed: int = 23) -> MiniCosmosEmbed:
    """Symmetric InfoNCE over matched (video, caption) pairs; ONLY the
    two projections train, temperature frozen at 1/0.07 (the clip_mini
    collapse measurement). Deterministic full-batch GD."""
    p = model.p
    vids, caps = [], []
    for i in range(n_pairs):
        frames, cls = synth_video(seed * 10000 + i)
        tensor = formulate_input_frames(frames, MINI_CONFIG)
        vids.append(model._video_pooled(tensor))
        caps.append(model._text_pooled(caption_for(cls)))
    fv = np.stack(vids)
    ft = np.stack(caps)
    n = len(fv)
    scale = 1.0 / 0.07
    for epoch in range(epochs):
        step = lr * (1.0 - epoch / epochs)
        zv = fv @ p["vid_proj"]
        zt = ft @ p["txt_proj"]
        nv = np.sqrt((zv**2).sum(axis=1, keepdims=True))
        nt = np.sqrt((zt**2).sum(axis=1, keepdims=True))
        uv, ut = zv / nv, zt / nt
        logits = scale * (uv @ ut.T)
        lr_ = logits - logits.max(axis=1, keepdims=True)
        pr = np.exp(lr_)
        pr /= pr.sum(axis=1, keepdims=True)
        lc_ = logits - logits.max(axis=0, keepdims=True)
        pc = np.exp(lc_)
        pc /= pc.sum(axis=0, keepdims=True)
        eye = np.eye(n)
        g_logits = ((pr - eye) + (pc - eye)) / (2.0 * n)
        g_uv = scale * (g_logits @ ut)
        g_ut = scale * (g_logits.T @ uv)
        g_zv = (g_uv - uv * (uv * g_uv).sum(axis=1, keepdims=True)) / nv
        g_zt = (g_ut - ut * (ut * g_ut).sum(axis=1, keepdims=True)) / nt
        p["vid_proj"] -= step * (fv.T @ g_zv)
        p["txt_proj"] -= step * (ft.T @ g_zt)
    return model


_CACHE: dict[str, MiniCosmosEmbed] = {}


def load_cached(path: str) -> MiniCosmosEmbed:
    key = f"{path}:{os.path.getmtime(path)}:{os.path.getsize(path)}"
    m = _CACHE.get(key)
    if m is None:
        if len(_CACHE) >= 2:
            _CACHE.clear()
        m = MiniCosmosEmbed.load(path)
        _CACHE[key] = m
    return m


def ensure_artifact(path: str, seed: int = 44) -> str:
    if not os.path.exists(path):
        model = train_contrastive(MiniCosmosEmbed.init(seed=seed))
        model.save(path)
    return path

"""MiniCLIP — a deterministic pure-numpy CLIP dual encoder giving the
image pipeline REAL embeddings in this sandbox.

The reference embeds images with openai/clip-vit-large-patch14
(models/clip.py:34-140: torchvision resize/center-crop/normalize
preprocessing, CLIPModel.get_image_features, L2 normalization) and feeds
the normalized 768-d embeddings to the aesthetic/NSFW heads
(models/{aesthetics,nsfw}.py) and the image dedup path. torch and
transformers are absent here, so — following the MiniTransformer /
MiniFastText / MiniTransNetV2 / MiniPyanNet precedent — this module is
the published CLIP architecture in float64 numpy at miniature scale:

* image side (ViT): non-overlapping patch embedding (a linear map over
  flattened patches — equivalent to the stride=patch conv), prepended
  class embedding, learned positions, pre-LN transformer blocks
  (the MiniTransformer block math: pre-LN MHA with residual, pre-LN
  GELU MLP with residual), ln_post on the class token, then the visual
  projection — to the reference's REAL 768 dims so the published-
  architecture aesthetic/NSFW heads consume these embeddings unchanged;
* text side: hashed-bucket token embeddings + positions, the same
  blocks with a CAUSAL mask (CLIP's text transformer is causal),
  ln_final, the LAST token's hidden as the EOT pooling, text projection
  to the same 768 dims;
* both outputs L2-normalized (clip.py:106-107), cosine = dot product.

Mini constants (vs CLIP-L/14): 24x24x3 images (vs 224), patch 8 -> 9
tokens + CLS (vs 256+1), width 32 (vs 1024), 2 layers x 2 heads (vs
24 x 16), text ctx 16 (vs 77); embed dim 768 kept REAL.

Training follows the frozen-body + trained-probe recipe, adapted to the
dual-encoder objective: every transformer weight is seeded-random and
frozen; ONLY the two projection matrices are trained with CLIP's actual
objective — the symmetric InfoNCE contrastive loss over matched
(image, caption) batches — on a synthetic corpus of colored-shape
images ("a photo of a {color} {shape}" captions). The logit scale
stays frozen at CLIP's published init (see train_contrastive for the
measured collapse that motivates this). Deterministic full-batch
gradient descent; held-out zero-shot accuracy (0.96 measured) is
pinned by tests/test_clip_mini.py. The published HF weights remain the
documented plug point (models/clip.py:128-140 download path).
"""

from __future__ import annotations

import json
import os

import numpy as np

try:  # module-global so Spark UDF machinery can resolve it
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None

from nemo_curator_spark.operators.mini_transformer import gelu, layer_norm

IMG_SIZE = 24
PATCH = 8
EMBED_DIM = 768  # the reference's real CLIP-L embed dim (heads plug in)

COLORS = {
    "red": (200, 40, 40),
    "green": (40, 180, 60),
    "blue": (40, 70, 200),
    "yellow": (210, 200, 50),
}
SHAPES = ("square", "circle", "stripes")
CLASSES = [f"{c} {s}" for c in COLORS for s in SHAPES]  # 12 classes


def caption_for(cls: str) -> str:
    return f"a photo of a {cls}"


# ----------------------------------------------------------------------
# Synthetic images: one of 12 color x shape classes + seeded noise.


def synth_image(seed: int) -> tuple[np.ndarray, str]:
    """Deterministic (image uint8 (24,24,3), class string)."""
    rng = np.random.RandomState(seed)
    cls = CLASSES[int(rng.randint(len(CLASSES)))]
    color_name, shape = cls.split()
    color = np.array(COLORS[color_name], dtype=np.float64)
    img = rng.uniform(0, 60, size=(IMG_SIZE, IMG_SIZE, 3))
    yy, xx = np.mgrid[0:IMG_SIZE, 0:IMG_SIZE]
    if shape == "square":
        mask = (
            (yy >= 4) & (yy < IMG_SIZE - 4) & (xx >= 4) & (xx < IMG_SIZE - 4)
        )
    elif shape == "circle":
        c = (IMG_SIZE - 1) / 2.0
        mask = (yy - c) ** 2 + (xx - c) ** 2 <= (IMG_SIZE / 2.0 - 3) ** 2
    else:  # stripes
        mask = (yy // 4) % 2 == 0
    img[mask] = color + rng.uniform(-25, 25, size=(int(mask.sum()), 3))
    return np.clip(img, 0, 255).astype(np.uint8), cls


def _hash_tokens(text: str, vocab: int, max_len: int) -> list[int]:
    """Whitespace words -> stable hash buckets (the MiniTransformer
    hashed-vocab recipe; the real CLIP BPE tokenizer is part of the
    plug point)."""
    import zlib

    ids = [zlib.crc32(w.encode("utf-8")) % vocab for w in text.split()]
    return ids[:max_len]


class MiniCLIP:
    """Deterministic numpy CLIP with save/load; only ``img_proj`` and
    ``txt_proj`` are trained (``logit_scale`` frozen at CLIP's init)."""

    def __init__(self, params: dict):
        self.p = params

    # ------------------------------------------------------------------
    @staticmethod
    def init(width: int = 32, n_layers: int = 2, n_heads: int = 2,
             vocab: int = 256, txt_ctx: int = 16,
             seed: int = 42) -> "MiniCLIP":
        rs = np.random.RandomState(seed)
        s = 1.0 / np.sqrt(width)

        def m(*shape):
            return rs.uniform(-s, s, size=shape)

        n_patches = (IMG_SIZE // PATCH) ** 2
        p: dict = {
            "width": width, "n_layers": n_layers, "n_heads": n_heads,
            "vocab": vocab, "txt_ctx": txt_ctx,
            "patch_w": m(PATCH * PATCH * 3, width),
            "cls_emb": m(width),
            "img_pos": m(n_patches + 1, width),
            "img_lnpre_g": np.ones(width), "img_lnpre_b": np.zeros(width),
            "img_lnpost_g": np.ones(width), "img_lnpost_b": np.zeros(width),
            "txt_emb": m(vocab, width),
            "txt_pos": m(txt_ctx, width),
            "txt_lnf_g": np.ones(width), "txt_lnf_b": np.zeros(width),
            # trained:
            "img_proj": m(width, EMBED_DIM),
            "txt_proj": m(width, EMBED_DIM),
            "logit_scale": np.asarray([np.log(1 / 0.07)]),
        }
        for side in ("img", "txt"):
            for i in range(n_layers):
                p[f"{side}_l{i}"] = {
                    "ln1_g": np.ones(width), "ln1_b": np.zeros(width),
                    "wq": m(width, width), "wk": m(width, width),
                    "wv": m(width, width), "wo": m(width, width),
                    "ln2_g": np.ones(width), "ln2_b": np.zeros(width),
                    "w1": m(width, 4 * width), "b1": np.zeros(4 * width),
                    "w2": m(4 * width, width), "b2": np.zeros(width),
                }
        return MiniCLIP(p)

    # ------------------------------------------------------------------
    def _blocks(self, x: np.ndarray, side: str, causal: bool) -> np.ndarray:
        """(L, width) -> (L, width) through the pre-LN transformer stack
        (the MiniTransformer block math, B=1)."""
        p = self.p
        w = p["width"]
        nh = p["n_heads"]
        dk = w // nh
        scale = 1.0 / np.sqrt(dk)
        lmax = x.shape[0]
        mask = None
        if causal:
            mask = np.triu(np.full((lmax, lmax), -np.inf), k=1)
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

    def image_features(self, img: np.ndarray) -> np.ndarray:
        """One image (24,24,3) uint8 -> L2-normalized (768,) float64.
        B=1 forward (batching-invariance rule)."""
        p = self.p
        x = img.astype(np.float64) / 255.0
        g = IMG_SIZE // PATCH
        patches = (
            x.reshape(g, PATCH, g, PATCH, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(g * g, PATCH * PATCH * 3)
        )
        tok = patches @ p["patch_w"]
        seq = np.concatenate([p["cls_emb"][None, :], tok], axis=0)
        seq = seq + p["img_pos"]
        seq = layer_norm(seq, p["img_lnpre_g"], p["img_lnpre_b"])
        seq = self._blocks(seq, "img", causal=False)
        cls = layer_norm(
            seq[0:1], p["img_lnpost_g"], p["img_lnpost_b"]
        )[0]
        emb = cls @ p["img_proj"]
        return emb / np.sqrt((emb**2).sum())

    def text_features(self, text: str) -> np.ndarray:
        """One caption -> L2-normalized (768,) float64 (EOT = last
        token's hidden, CLIP's pooling)."""
        p = self.p
        ids = _hash_tokens(text, p["vocab"], p["txt_ctx"])
        if not ids:
            ids = [0]
        seq = p["txt_emb"][np.asarray(ids)] + p["txt_pos"][: len(ids)]
        seq = self._blocks(seq, "txt", causal=True)
        seq = layer_norm(seq, p["txt_lnf_g"], p["txt_lnf_b"])
        emb = seq[-1] @ p["txt_proj"]
        return emb / np.sqrt((emb**2).sum())

    # frozen pooled features (pre-projection) for the trainable probe --
    def _image_pooled(self, img: np.ndarray) -> np.ndarray:
        p = self.p
        x = img.astype(np.float64) / 255.0
        g = IMG_SIZE // PATCH
        patches = (
            x.reshape(g, PATCH, g, PATCH, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(g * g, PATCH * PATCH * 3)
        )
        tok = patches @ p["patch_w"]
        seq = np.concatenate([p["cls_emb"][None, :], tok], axis=0)
        seq = seq + p["img_pos"]
        seq = layer_norm(seq, p["img_lnpre_g"], p["img_lnpre_b"])
        seq = self._blocks(seq, "img", causal=False)
        return layer_norm(seq[0:1], p["img_lnpost_g"], p["img_lnpost_b"])[0]

    def _text_pooled(self, text: str) -> np.ndarray:
        p = self.p
        ids = _hash_tokens(text, p["vocab"], p["txt_ctx"])
        if not ids:
            ids = [0]
        seq = p["txt_emb"][np.asarray(ids)] + p["txt_pos"][: len(ids)]
        seq = self._blocks(seq, "txt", causal=True)
        seq = layer_norm(seq, p["txt_lnf_g"], p["txt_lnf_b"])
        return seq[-1]

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
    def load(path: str) -> "MiniCLIP":
        def dec(v):
            if isinstance(v, dict):
                if "__nd__" in v:
                    return np.asarray(v["__nd__"], dtype=np.float64)
                return {k: dec(x) for k, x in v.items()}
            return v

        with open(path) as f:
            return MiniCLIP({k: dec(v) for k, v in json.load(f).items()})


def train_contrastive(model: MiniCLIP, n_pairs: int = 96,
                      epochs: int = 300, lr: float = 0.5,
                      seed: int = 11) -> MiniCLIP:
    """Train ONLY img_proj / txt_proj with CLIP's symmetric InfoNCE
    loss over matched (image, caption) pairs — deterministic full-batch
    gradient descent on frozen pooled features.

    Deviation from the published recipe: ``logit_scale`` stays FROZEN
    at its init (log(1/0.07), CLIP's own initialization). The reference
    trains the temperature too, but under full-batch GD from random
    projections the temperature gradient dominates — measured here: the
    scale collapses 14.3 -> 0.04 within 50 epochs, which multiplies
    into every projection gradient and freezes learning at chance
    (held-out zero-shot 0.075 vs 0.96 with the scale frozen).
    Mutates and returns ``model``."""
    p = model.p
    imgs, caps = [], []
    for i in range(n_pairs):
        img, cls = synth_image(seed * 10000 + i)
        imgs.append(model._image_pooled(img))
        caps.append(model._text_pooled(caption_for(cls)))
    fi = np.stack(imgs)  # (N, width)
    ft = np.stack(caps)
    n = len(fi)
    scale = float(np.exp(np.clip(p["logit_scale"][0], None, np.log(100.0))))
    for epoch in range(epochs):
        step = lr * (1.0 - epoch / epochs)
        zi = fi @ p["img_proj"]
        zt = ft @ p["txt_proj"]
        ni = np.sqrt((zi**2).sum(axis=1, keepdims=True))
        nt = np.sqrt((zt**2).sum(axis=1, keepdims=True))
        ui, ut = zi / ni, zt / nt
        logits = scale * (ui @ ut.T)  # (N, N)
        # softmax rows (img->txt) and cols (txt->img)
        lr_ = logits - logits.max(axis=1, keepdims=True)
        pr = np.exp(lr_)
        pr /= pr.sum(axis=1, keepdims=True)
        lc_ = logits - logits.max(axis=0, keepdims=True)
        pc = np.exp(lc_)
        pc /= pc.sum(axis=0, keepdims=True)
        eye = np.eye(n)
        # dL/dlogits for the symmetric CE (mean of the two directions)
        g_logits = ((pr - eye) + (pc - eye)) / (2.0 * n)
        # backprop through scale * cosine
        g_ui = scale * (g_logits @ ut)
        g_ut = scale * (g_logits.T @ ui)
        # through L2 normalization: g_z = (g_u - u * (u . g_u)) / ||z||
        g_zi = (g_ui - ui * (ui * g_ui).sum(axis=1, keepdims=True)) / ni
        g_zt = (g_ut - ut * (ut * g_ut).sum(axis=1, keepdims=True)) / nt
        p["img_proj"] -= step * (fi.T @ g_zi)
        p["txt_proj"] -= step * (ft.T @ g_zt)
    return model


# ----------------------------------------------------------------------
# Per-worker artifact cache + Spark form.
_CACHE: dict[str, MiniCLIP] = {}


def load_cached(path: str) -> MiniCLIP:
    key = f"{path}:{os.path.getmtime(path)}:{os.path.getsize(path)}"
    m = _CACHE.get(key)
    if m is None:
        if len(_CACHE) >= 2:
            _CACHE.clear()
        m = MiniCLIP.load(path)
        _CACHE[key] = m
    return m


def ensure_artifact(path: str, seed: int = 42) -> str:
    if not os.path.exists(path):
        model = train_contrastive(MiniCLIP.init(seed=seed))
        model.save(path)
    return path


def preprocess_image(raw: bytes) -> np.ndarray:
    """Decode an encoded image (PPM/PNG/BMP via the real codecs) and
    bilinear-resize (half-pixel centers) to IMG_SIZE x IMG_SIZE — the
    models/clip.py:48-60 torchvision Resize+CenterCrop role at mini
    scale (bicubic -> bilinear is a documented mini deviation; the
    square target makes the center crop the identity). Returns float64
    (IMG_SIZE, IMG_SIZE, 3) in [0, 255]."""
    from nemo_curator_spark.operators import multimodal

    w, h, c, px = multimodal._decode(bytes(raw))
    img = px.reshape(h, w, c).astype(np.float64)
    if c == 1:
        img = np.repeat(img, 3, axis=2)
    return multimodal.resize_linear_float(img, IMG_SIZE, IMG_SIZE)


def clip_image_embeddings(df, model_path: str, id_col: str = "image_id",
                          image_col: str = "image",
                          out_col: str = "embedding",
                          input_format: str = "raw24"):
    """Spark form: image binaries -> normalized 768-d embedding arrays.
    ``input_format="raw24"`` takes raw-RGB 24*24*3 byte buffers;
    ``"encoded"`` runs the real decode+resize preprocessing
    (:func:`preprocess_image`) first. One mapInPandas pass, B=1
    forwards, bytes never cross an exchange."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_col, T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(it):
        model = load_cached(model_path)
        for pdf in it:
            ids, embs = [], []
            for _, r in pdf.iterrows():
                if input_format == "encoded":
                    img = preprocess_image(bytes(r[image_col]))
                else:
                    img = np.frombuffer(
                        bytes(r[image_col]), dtype=np.uint8
                    ).reshape(IMG_SIZE, IMG_SIZE, 3)
                ids.append(int(r[id_col]))
                embs.append([float(v) for v in model.image_features(img)])
            yield pd.DataFrame({id_col: ids, out_col: embs})

    return df.select(id_col, image_col).mapInPandas(gen, schema)


def clip_text_embeddings(df, model_path: str, text_col: str = "text",
                         out_col: str = "embedding",
                         carry_cols: tuple[str, ...] = ("doc_id",)):
    """Spark form: text column -> normalized 768-d embedding arrays via
    the causal text tower (EOT pooling). ``carry_cols`` ride along
    through the generator (the caption_prep carry pattern — no re-join
    exchange). B=1 forwards."""
    from pyspark.sql import types as T

    by_name = {f.name: f for f in df.schema.fields}
    in_fields = [by_name[c] for c in carry_cols]  # carry order = output order
    schema = T.StructType(
        list(in_fields) + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def gen(it):
        model = load_cached(model_path)
        for pdf in it:
            out = {c: list(pdf[c]) for c in carry_cols}
            out[out_col] = [
                [float(v) for v in model.text_features(str(t))]
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(out)

    return df.select(*carry_cols, text_col).mapInPandas(gen, schema)


def clip_image_filters(df, model_path: str, id_col: str = "image_id",
                       image_col: str = "image",
                       input_format: str = "raw24",
                       aesthetic_weights: str | None = None,
                       nsfw_weights: str | None = None):
    """Composite: CLIP-embed -> aesthetic + NSFW head scores — the
    reference image curation pipeline (image/embedders/clip_embedder.py
    -> filters/{aesthetic_filter,nsfw_filter}.py) with MiniCLIP as the
    embedder. The heads consume the REAL 768-d embedding layout
    unchanged; filter downstream with the reference's Column
    predicates (aesthetic_score >= thr, nsfw_score < thr)."""
    from nemo_curator_spark.operators import image_filters as IMF

    embs = clip_image_embeddings(
        df, model_path, id_col, image_col, input_format=input_format
    )
    scored = IMF.aesthetic_scores(embs, weights_path=aesthetic_weights)
    return IMF.nsfw_scores(scored, weights_path=nsfw_weights)

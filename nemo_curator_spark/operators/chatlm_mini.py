"""MiniChatLM — a deterministic pure-numpy decoder-only language model
giving the LLM-client seam REAL generative inference in this sandbox.

Every reference stage that calls an LLM (translation
``stages/text/experimental/translation/stages/translate.py``, caption
enhancement ``stages/video/captioning/caption_enhancement.py``, FAITH
evaluation ``evaluation/faith.py``, data-designer LLM columns, the
nemotron-cc synthetic rewrites) talks to a served model through the
``LLMClient`` contract (``models/client/llm_client.py:51-73``). vLLM /
HTTP inference servers are absent here, so — following the
MiniFastText / MiniTransformer / MiniASR / MiniCLIP precedent — this
module provides the same *shape* at miniature scale so the real code
path runs end to end: a causal transformer LM with greedy decoding
behind a conforming ``RetryingLLMClient`` subclass
(:class:`MiniChatClient`), one model per worker via the JSON weight
artifact + digest-keyed module cache.

Architecture (standard decoder-only pre-LN transformer):

* learned token embedding over a closed word vocabulary
  (:data:`WORDS` + role/control specials) + learned positional
  embedding (small scale, so the shared next-token head is not swamped
  by position noise);
* ``n_layers`` pre-LN blocks — ``x + MHA(LN(x))`` then
  ``x + FFN(LN(x))`` with tanh-GELU — and a CAUSAL attention mask
  (score[i, j] = -inf for j > i), the one structural difference from
  the MiniTransformer encoder;
* final LayerNorm;
* next-token head: linear softmax over the vocabulary at every
  position (the trained probe).

Training: the body is a frozen seeded-random feature extractor and
ONLY the head is trained (deterministic full-batch softmax regression
over next-token targets — the fasttext_mini / mini_transformer
scheme). The synthetic "language" is a first-order Markov grammar over
:data:`WORDS` (seeded sparse transition table), so the causal residual
stream — which carries each position's own token embedding — gives the
linear head exactly the evidence it needs: held-out greedy next-word
agreement with the grammar's argmax successor is pinned well above
chance by tests/test_chatlm_mini.py. Greedy decode is therefore REAL
language-model inference: the continuation depends on the prompt's
last in-vocabulary words through the trained transition structure.

Determinism: float64 end to end; generation is per-sequence B=1
step-wise forwards (batching-invariant under ANY Arrow batching);
greedy argmax breaks ties toward the lowest token id. Temperature
other than 0 and n>1 sampling are documented deviations: this client
always decodes greedily (the reference's default generation config is
temperature=0.0 / seed=0, the deterministic case), and ``n`` replicas
are identical.

The vLLM/OpenAI served endpoints remain the documented plug point
(``clients.llm_client.OpenAIChatClient``); MiniChatClient is the
in-sandbox conforming implementation, and the stages accept either.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pandas as pd

from nemo_curator_spark.constants import SPLIT_PATTERN_PY, STRIP_PATTERN
from nemo_curator_spark.clients.llm_client import (
    GenerationConfig,
    RetryingLLMClient,
    coerce_generation_config,
)
from nemo_curator_spark.operators.mini_transformer import gelu, layer_norm

# ---------------------------------------------------------------------------
# vocabulary

PAD, BOS, EOS, UNK, USER, ASSISTANT, SEP, SYSTEM = range(8)
SPECIALS = (
    "<pad>", "<bos>", "<eos>", "<unk>", "<user>", "<assistant>", "<sep>",
    "<system>",
)

WORDS = (
    "the", "a", "of", "to", "and", "in", "is", "it", "that", "for",
    "data", "model", "text", "word", "line", "page", "site", "user",
    "time", "year", "day", "world", "people", "work", "way", "life",
    "good", "new", "long", "great", "small", "large", "old", "high",
    "make", "take", "know", "see", "come", "find", "give", "tell",
    "use", "run", "read", "write", "keep", "turn",
)

VOCAB = SPECIALS + WORDS
WORD_TO_ID = {w: i for i, w in enumerate(VOCAB)}
N_SPECIALS = len(SPECIALS)

_SPLIT_RE = re.compile(SPLIT_PATTERN_PY)
_STRIP_RE = re.compile(STRIP_PATTERN)

# ASCII-only casefold (CLAUDE.md casefold rule: gate-exposed casefolds
# never use str.lower()'s multi-char expansions)
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def tokenize_words(text: str) -> list[str]:
    """ISPACE-class word split (constants.SPLIT_PATTERN — identical in
    python re / Java regex / RE2) + ASCII lowercase."""
    s = _STRIP_RE.sub("", str(text).translate(_ASCII_LOWER))
    return [] if s == "" else _SPLIT_RE.split(s)


def encode_words(words: list[str]) -> list[int]:
    return [WORD_TO_ID.get(w, UNK) for w in words]


# ---------------------------------------------------------------------------
# synthetic grammar (the training "language")


def grammar_successors(seed: int = 1234) -> dict[int, list[int]]:
    """Seeded sparse first-order grammar: each word id maps to its 3
    candidate successors (first = the argmax successor, p=0.6)."""
    rs = np.random.RandomState(seed)
    n = len(WORDS)
    succ: dict[int, list[int]] = {}
    for i in range(n):
        cand = rs.choice(n, size=3, replace=False)
        succ[N_SPECIALS + i] = [N_SPECIALS + int(c) for c in cand]
    return succ


def grammar_corpus(
    n_seqs: int = 600, seq_len: int = 20, seed: int = 1234
) -> list[list[int]]:
    """Markov chains sampled from the grammar with probs (0.6, 0.25,
    0.15), each wrapped ``<bos> w1 .. wL <eos>``."""
    succ = grammar_successors(seed)
    rs = np.random.RandomState(seed + 1)
    probs = np.array([0.6, 0.25, 0.15])
    seqs = []
    word_ids = sorted(succ)
    for _ in range(n_seqs):
        w = word_ids[rs.randint(len(word_ids))]
        seq = [BOS, w]
        for _ in range(seq_len - 1):
            w = succ[w][rs.choice(3, p=probs)]
            seq.append(w)
        seq.append(EOS)
        seqs.append(seq)
    return seqs


# ---------------------------------------------------------------------------
# model


class MiniChatLM:
    """Deterministic numpy causal LM with save/load; only the
    next-token softmax head is trained."""

    def __init__(self, params: dict, n_heads: int = 2, max_len: int = 96):
        self.p = params
        self.n_heads = n_heads
        self.max_len = max_len

    # -- init ---------------------------------------------------------
    @staticmethod
    def init(dim: int = 64, n_layers: int = 1, n_heads: int = 2,
             max_len: int = 96, seed: int = 48) -> "MiniChatLM":
        rs = np.random.RandomState(seed)
        s = 1.0 / np.sqrt(dim)

        def m(*shape):
            return rs.uniform(-s, s, size=shape)

        V = len(VOCAB)
        p: dict = {
            "emb": m(V, dim),
            # small positional scale: the shared per-position head should
            # read token identity, not position (measured: 0.02 scale
            # beats 0.1 on held-out next-word agreement)
            "pos": 0.02 * m(max_len, dim),
            "n_layers": np.array([n_layers]),
        }
        for i in range(n_layers):
            p[f"l{i}_ln1_g"] = np.ones(dim)
            p[f"l{i}_ln1_b"] = np.zeros(dim)
            p[f"l{i}_wq"] = m(dim, dim)
            p[f"l{i}_wk"] = m(dim, dim)
            p[f"l{i}_wv"] = m(dim, dim)
            p[f"l{i}_wo"] = m(dim, dim)
            p[f"l{i}_ln2_g"] = np.ones(dim)
            p[f"l{i}_ln2_b"] = np.zeros(dim)
            p[f"l{i}_w1"] = m(dim, 4 * dim)
            p[f"l{i}_b1"] = np.zeros(4 * dim)
            p[f"l{i}_w2"] = m(4 * dim, dim)
            p[f"l{i}_b2"] = np.zeros(dim)
        p["lnf_g"] = np.ones(dim)
        p["lnf_b"] = np.zeros(dim)
        p["head_w"] = np.zeros((V, dim))
        p["head_b"] = np.zeros(V)
        return MiniChatLM(p, n_heads=n_heads, max_len=max_len)

    # -- forward ------------------------------------------------------
    def hidden_states(self, ids: list[int]) -> np.ndarray:
        """(L, d) final hidden states for ONE sequence (B=1 forward —
        batching-invariant by construction). Sequences longer than
        ``max_len`` keep the most recent ``max_len`` tokens (sliding
        window)."""
        ids = list(ids)[-self.max_len:]
        p = self.p
        L = len(ids)
        d = p["emb"].shape[1]
        x = p["emb"][np.array(ids, dtype=np.int64)] + p["pos"][:L]
        n_layers = int(p["n_layers"][0])
        nh = self.n_heads
        dh = d // nh
        # causal mask: score[i, j] = -inf for j > i
        neg = np.triu(np.full((L, L), -1e30), k=1)
        for i in range(n_layers):
            h = layer_norm(x, p[f"l{i}_ln1_g"], p[f"l{i}_ln1_b"])
            q = h @ p[f"l{i}_wq"]
            k = h @ p[f"l{i}_wk"]
            v = h @ p[f"l{i}_wv"]
            heads = []
            for hd in range(nh):
                sl = slice(hd * dh, (hd + 1) * dh)
                sc = (q[:, sl] @ k[:, sl].T) / np.sqrt(dh) + neg
                sc = sc - sc.max(axis=-1, keepdims=True)
                w = np.exp(sc)
                w = w / w.sum(axis=-1, keepdims=True)
                heads.append(w @ v[:, sl])
            x = x + np.concatenate(heads, axis=-1) @ p[f"l{i}_wo"]
            h = layer_norm(x, p[f"l{i}_ln2_g"], p[f"l{i}_ln2_b"])
            x = x + gelu(h @ p[f"l{i}_w1"] + p[f"l{i}_b1"]) @ p[f"l{i}_w2"] + p[f"l{i}_b2"]
        return layer_norm(x, p["lnf_g"], p["lnf_b"])

    def next_logits(self, ids: list[int]) -> np.ndarray:
        """(V,) next-token logits after the last position."""
        h = self.hidden_states(ids)[-1]
        return self.p["head_w"] @ h + self.p["head_b"]

    def greedy_next(self, ids: list[int]) -> int:
        """argmax next token; np.argmax breaks ties toward the lowest
        id — deterministic."""
        return int(np.argmax(self.next_logits(ids)))

    def generate(self, prompt_ids: list[int], max_new_tokens: int = 24,
                 stop_ids: frozenset[int] | set[int] = frozenset()) -> list[int]:
        """Greedy decode: append argmax tokens until EOS, a stop id, or
        ``max_new_tokens``. Returns ONLY the newly generated ids
        (stop/EOS excluded)."""
        ids = list(prompt_ids)
        out: list[int] = []
        for _ in range(max_new_tokens):
            nxt = self.greedy_next(ids)
            if nxt == EOS or nxt in stop_ids:
                break
            out.append(nxt)
            ids.append(nxt)
        return out

    # -- persistence (MiniASR JSON layout) ----------------------------
    def save(self, path: str) -> None:
        def enc(v):
            return {"shape": list(v.shape), "data": v.ravel().tolist()}

        blob = {k: enc(v) for k, v in self.p.items()}
        blob["_meta"] = {"n_heads": self.n_heads, "max_len": self.max_len}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(blob, f)
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "MiniChatLM":
        with open(path) as f:
            blob = json.load(f)
        meta = blob.pop("_meta")

        def dec(v):
            return np.array(v["data"], dtype=np.float64).reshape(v["shape"])

        return MiniChatLM(
            {k: dec(v) for k, v in blob.items()},
            n_heads=int(meta["n_heads"]),
            max_len=int(meta["max_len"]),
        )


# ---------------------------------------------------------------------------
# training (head-only deterministic softmax regression)


def train(n_seqs: int = 600, seq_len: int = 20, grammar_seed: int = 1234,
          model_seed: int = 48, epochs: int = 400, lr: float = 2.0,
          dim: int = 64) -> MiniChatLM:
    """Frozen seeded body + full-batch GD on the next-token softmax
    head over the grammar corpus. Deterministic: fixed seeds, fixed
    epoch count, float64.

    Defaults were selected by a measured sweep (dim x seed x layers x
    positional scale): dim=64 / 1 layer / seed 48 / pos 0.02 / 400
    epochs reaches 0.896 held-out greedy next-word agreement with the
    grammar argmax (chance = 1/48). One layer beats two here because a
    SECOND frozen random block further dilutes the last-token signal
    in the residual stream and only the linear head is trained — with
    backprop through the body the deeper form would recover it
    (documented mini-scale limitation, not an architecture claim)."""
    model = MiniChatLM.init(dim=dim, seed=model_seed)
    seqs = grammar_corpus(n_seqs, seq_len, grammar_seed)
    feats = []
    targets = []
    for seq in seqs:
        h = model.hidden_states(seq)
        feats.append(h[:-1])
        targets.extend(seq[1:])
    X = np.concatenate(feats)          # (N, d)
    y = np.array(targets)              # (N,)
    N = X.shape[0]
    V = len(VOCAB)
    W = np.zeros((V, X.shape[1]))
    b = np.zeros(V)
    onehot = np.zeros((N, V))
    onehot[np.arange(N), y] = 1.0
    for _ in range(epochs):
        logits = X @ W.T + b
        logits -= logits.max(axis=1, keepdims=True)
        e = np.exp(logits)
        probs = e / e.sum(axis=1, keepdims=True)
        g = (probs - onehot) / N       # (N, V)
        W -= lr * (g.T @ X)
        b -= lr * g.sum(axis=0)
    model.p["head_w"] = W
    model.p["head_b"] = b
    return model


_MODEL_CACHE: dict[str, MiniChatLM] = {}


def load_cached(path: str) -> MiniChatLM:
    """Per-worker model cache keyed by (path, mtime, size) — the
    SparkFiles pattern shared with the other mini models."""
    st = os.stat(path)
    key = f"{path}:{st.st_mtime_ns}:{st.st_size}"
    m = _MODEL_CACHE.get(key)
    if m is None:
        m = MiniChatLM.load(path)
        _MODEL_CACHE.clear()
        _MODEL_CACHE[key] = m
    return m


def ensure_artifact(path: str, **train_kwargs) -> str:
    """Train-and-save once; later calls reuse the file (the
    driver-side half of the per-worker artifact protocol)."""
    if not os.path.exists(path):
        train(**train_kwargs).save(path)
    return path


# ---------------------------------------------------------------------------
# the conforming LLM client


class MiniChatClient(RetryingLLMClient):
    """``LLMClient`` contract (reference llm_client.py:51-73) backed by
    MiniChatLM greedy decoding — the in-sandbox REAL-inference client
    for translation / caption-enhancement / FAITH / data-designer
    stages.

    Message formatting: role token (``<system>``/``<user>``/
    ``<assistant>``) then the message content's in-vocabulary word ids
    (ISPACE split + ASCII lowercase, OOV → ``<unk>``), ``<sep>``
    between messages, and a trailing ``<assistant>`` turn opener —
    unless a ``conversation_formatter`` is supplied, in which case its
    single prompt string is tokenized directly (the reference passes
    formatters for completion-style models).

    Generation config honored: ``max_tokens`` caps new words, ``stop``
    (string or list) stops before any stop word, ``n`` returns n
    (identical, greedy) choices. ``temperature``/``top_p``/``top_k``
    are accepted but decoding is always greedy — the reference default
    is temperature=0.0, and nondeterministic sampling would break this
    repo's bit-reproducibility contract (documented deviation).
    """

    def __init__(self, model_path: str, max_retries: int = 3,
                 base_delay: float = 1.0, **kw):
        super().__init__(max_retries=max_retries, base_delay=base_delay, **kw)
        self.model_path = model_path
        self._model: MiniChatLM | None = None

    def setup(self) -> None:
        self._model = load_cached(self.model_path)

    def _require_model(self) -> MiniChatLM:
        if self._model is None:
            self.setup()
        return self._model  # type: ignore[return-value]

    @staticmethod
    def _role_id(role: str) -> int:
        return {"system": SYSTEM, "user": USER, "assistant": ASSISTANT}.get(
            str(role).lower(), USER
        )

    def format_prompt_ids(self, messages, conversation_formatter=None) -> list[int]:
        if conversation_formatter is not None:
            text = conversation_formatter.format_conversation(messages)
            return [BOS] + encode_words(tokenize_words(text))
        ids: list[int] = [BOS]
        for i, msg in enumerate(messages):
            if i:
                ids.append(SEP)
            ids.append(self._role_id(msg.get("role", "user")))
            ids.extend(encode_words(tokenize_words(msg.get("content", ""))))
        ids.extend([SEP, ASSISTANT])
        return ids

    def _query_model_impl(self, *, messages, model: str,
                          conversation_formatter=None,
                          generation_config: GenerationConfig | dict | None = None,
                          ) -> list[str]:
        cfg = coerce_generation_config(generation_config)
        lm = self._require_model()
        prompt_ids = self.format_prompt_ids(messages, conversation_formatter)
        max_new = min(int(cfg.max_tokens or 24), 64)
        stops = cfg.stop
        if isinstance(stops, str):
            stops = [stops]
        stop_ids = frozenset(
            WORD_TO_ID[s] for s in (stops or []) if s in WORD_TO_ID
        )
        out_ids = lm.generate(prompt_ids, max_new_tokens=max_new,
                              stop_ids=stop_ids)
        text = " ".join(VOCAB[i] for i in out_ids if i >= N_SPECIALS)
        n = int(cfg.n or 1)
        return [text] * n


# ---------------------------------------------------------------------------
# Spark stage


def llm_complete(df, model_path: str, text_col: str = "text",
                 id_col: str = "doc_id", out_col: str = "completion",
                 prompt_words: int = 12, max_tokens: int = 16):
    """Greedy LLM completion over a DataFrame: ONE mapInPandas pass, the
    model loaded once per worker from ``model_path`` (SparkFiles/
    artifact protocol), each row's prompt = the first ``prompt_words``
    words of ``text_col``. Emits (id, completion).

    Scale shape: embarrassingly parallel per row — no exchange, no
    driver state; the weight artifact ships once per worker and the
    module cache holds exactly one parsed model. On a real cluster the
    same stage fans out across executors exactly like the reference's
    asyncio request fan-out, with partitions supplying the concurrency
    (translate.py's model_inference_batch_size maps to Arrow batches).
    """
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(out_col, T.StringType()),
    ])

    def gen(batches):
        client = MiniChatClient(model_path)
        client.setup()
        cfg = GenerationConfig(max_tokens=max_tokens)
        for pdf in batches:
            outs = []
            for t in pdf[text_col].astype(str):
                words = tokenize_words(t)[:prompt_words]
                msgs = [{"role": "user", "content": " ".join(words)}]
                outs.append(client.query_model(
                    messages=msgs, model="mini-chat-lm",
                    generation_config=cfg)[0])
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                out_col: outs})

    return df.mapInPandas(gen, schema=schema)


class MiniGenerateBatch:
    """Adapter giving the ``generate_batch`` seams real inference.

    Three stages inject a ``generate_batch`` client with slightly
    different item shapes — caption enhancement sends ``(system, user)``
    tuples (caption_prep.caption_enhancement), the nemotron-cc
    synthetic stages send chat message lists (synthetic.SyntheticStage),
    and the data designer sends plain prompt strings
    (data_designer.py:342). One polymorphic adapter covers all three by
    normalizing each item to the ``LLMClient`` messages shape and
    delegating to :class:`MiniChatClient` greedy decoding.

    Picklable pre-setup (ships only the artifact path + config); the
    model loads lazily per worker through the module cache.
    """

    def __init__(self, model_path: str, max_tokens: int = 16):
        self.model_path = model_path
        self.max_tokens = max_tokens
        self._client: MiniChatClient | None = None

    @staticmethod
    def _to_messages(item, system_prompt=None) -> list[dict]:
        if isinstance(item, str):
            msgs = [{"role": "user", "content": item}]
            if system_prompt is not None:
                msgs.insert(0, {"role": "system", "content": system_prompt})
            return msgs
        if isinstance(item, tuple):
            system, user = item
            return [
                {"role": "system", "content": system},
                {"role": "user", "content": user},
            ]
        return list(item)  # already a messages list

    def generate_batch(self, items, system_prompt=None) -> list[str]:
        """``system_prompt`` is the data designer's optional second
        positional argument (data_designer.py _llm_column); the other
        two callers encode the system turn in the item itself."""
        if self._client is None:
            self._client = MiniChatClient(self.model_path)
            self._client.setup()
        cfg = GenerationConfig(max_tokens=self.max_tokens)
        return [
            self._client.query_model(
                messages=self._to_messages(it, system_prompt),
                model="mini-chat-lm",
                generation_config=cfg,
            )[0]
            for it in items
        ]

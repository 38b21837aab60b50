"""MiniBPE — a deterministic vendored byte-level BPE tokenizer.

The reference's TokenCountFilter (filters/token/token_count.py:23-93) and
TokenizerFertilityFilter (heuristic/code/code.py:100-122) take a pluggable
tokenizer exposing ``encode(text) -> list[int]`` (HF AutoTokenizer /
sentencepiece — both absent from this environment). MiniBPE is the vendored
stand-in: classic byte-level BPE (Sennrich et al. 2016; GPT-2-style
leading-space word convention) with deterministic training, a JSON merges
artifact, and the same ``encode`` contract, so both filters run their real
code path (artifact → load → encode → count).
"""

from __future__ import annotations

import json
import re
from collections import Counter

_PRETOKEN_RE = re.compile(r"\s*\S+")


def _pretokenize(text: str) -> list[bytes]:
    """GPT-2-style units: each word keeps its leading whitespace."""
    return [m.group().encode("utf-8") for m in _PRETOKEN_RE.finditer(text)]


def train_bpe(texts: list[str], num_merges: int = 512) -> list[tuple[int, int]]:
    """Learn merges over byte sequences. Deterministic: most-frequent pair
    first, ties broken by pair value. New token ids start at 256."""
    word_counts: Counter = Counter()
    for t in texts:
        for w in _pretokenize(t):
            word_counts[w] += 1
    seqs: dict[bytes, list[int]] = {w: list(w) for w in word_counts}
    merges: list[tuple[int, int]] = []
    next_id = 256
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for w, seq in seqs.items():
            c = word_counts[w]
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], (-kv[0][0], -kv[0][1])))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        for w, seq in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
        next_id += 1
    return merges


class MiniBPE:
    def __init__(self, merges: list[tuple[int, int]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {tuple(m): i for i, m in enumerate(self.merges)}
        self._cache: dict[bytes, list[int]] = {}

    def _encode_word(self, w: bytes) -> list[int]:
        cached = self._cache.get(w)
        if cached is not None:
            return cached
        seq = list(w)
        while len(seq) > 1:
            best_rank, best_i = None, None
            for i, pair in enumerate(zip(seq, seq[1:])):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            seq = seq[:best_i] + [256 + best_rank] + seq[best_i + 2 :]
        if len(self._cache) < 100_000:
            self._cache[w] = seq
        return seq

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for w in _pretokenize(text):
            out.extend(self._encode_word(w))
        return out

    def decode(self, ids: list[int]) -> str:
        """Inverse of encode (merge expansion) — lossless by construction."""
        out = bytearray()

        def expand(i: int) -> None:
            if i < 256:
                out.append(i)
            else:
                a, b = self.merges[i - 256]
                expand(a)
                expand(b)

        for i in ids:
            expand(i)
        return out.decode("utf-8", errors="replace")

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"merges": self.merges}, f)

    @staticmethod
    def load(path: str) -> "MiniBPE":
        with open(path) as f:
            return MiniBPE(json.load(f)["merges"])


class TokenCountFilter:
    """Reference TokenCountFilter semantics (token_count.py:70-95):
    score = len(tokenizer.encode(text)); keep iff min <= score <= max."""

    def __init__(self, tokenizer, min_tokens: int = 0, max_tokens: float = float("inf")):
        self.tokenizer = tokenizer
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens
        self.name = "token_count"

    def score_document(self, text: str) -> int:
        return len(self.tokenizer.encode(text))

    def keep_document(self, score: int) -> bool:
        return self.min_tokens <= score <= self.max_tokens


class TokenizerFertilityFilter:
    """Reference TokenizerFertilityFilter (code.py:100-122): score =
    nchars/ntokens (-1 when no tokens); keep iff score >= threshold."""

    def __init__(self, tokenizer, min_char_to_token_ratio: float = 2.5):
        self.tokenizer = tokenizer
        self.threshold = min_char_to_token_ratio
        self.name = "tokenizer_fertility"

    def score_document(self, text: str) -> float:
        n_tokens = len(self.tokenizer.encode(text))
        if n_tokens == 0:
            return -1.0
        return len(text) / n_tokens

    def keep_document(self, score: float) -> bool:
        return score >= self.threshold

"""KenLM-style n-gram perplexity scoring (north-rule addition; no reference
module — built from the published CCNet recipe, Wenzek et al. 2020).

A per-language order-3 LM with Jelinek-Mercer interpolation (proper
probabilities, deterministic):

    p(w | h2 h1) = l3*MLE3 + l2*MLE2 + l1*MLE1 + l0/(V+1)

Text normalization before counting/scoring (CCNet-style): lowercase,
digits → 0, punctuation stripped, whitespace tokens.

Scale design: models are trained once (driver-side, on a bounded seeded
sample — stand-in for CCNet's offline-trained KenLM artifacts), serialized,
shipped to executors via ``SparkContext.addFile``/broadcast, and applied by
an Arrow-vectorized pandas UDF. Scoring is **language-bucketed**: callers
``repartition`` on (lang, salt) first so each bucket loads one model and
AQE balances bucket sizes (SURVEY.md §7.1 M5).
"""

from __future__ import annotations

import json
import math
import re
from collections import Counter
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ASCII classes on purpose: the scorer's DuckDB value-hash oracle rebuilds
# this normalization in RE2, where \d and \w are ASCII-only — pinning the
# python side to re.ASCII makes both engines strip exactly the same chars
# (CCNet's own normalization is equally Latin-centric). Residual gap: \s
# under re.ASCII includes \x0b, RE2's does not — driver tables contain no
# such whitespace (verified; see CLAUDE.md).
_NORM_DIGIT = re.compile(r"\d", flags=re.ASCII)
_NORM_PUNCT = re.compile(r"[^\w\s']", flags=re.ASCII)
# ASCII-only casefold: python str.lower() expands some non-ASCII chars
# INTO ascii (İ -> i+combining dot, K (Kelvin) -> k) while DuckDB's
# utf8proc lower maps 1:1 — the only normalizer step where the engines
# could disagree (found by the round-4 nasty-whitespace sweep). Non-ASCII
# letters are stripped by _NORM_PUNCT either way, so an ASCII translate
# keeps the CCNet-style Latin-centric behavior and is bit-identical to
# the oracle's translate().
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)

LAMBDAS = (0.5, 0.3, 0.15, 0.05)  # trigram, bigram, unigram, uniform
BOS = "<s>"
EOS = "</s>"


def normalize_tokens(text: str) -> list[str]:
    t = _NORM_DIGIT.sub("0", (text or "").translate(_ASCII_LOWER))
    t = _NORM_PUNCT.sub(" ", t)
    return t.split()


@dataclass
class NGramLM:
    """Order-3 interpolated LM over normalized tokens."""

    uni: dict[str, int] = field(default_factory=dict)
    bi: dict[str, int] = field(default_factory=dict)
    tri: dict[str, int] = field(default_factory=dict)
    total: int = 0

    @staticmethod
    def train(texts: list[str]) -> "NGramLM":
        uni: Counter = Counter()
        bi: Counter = Counter()
        tri: Counter = Counter()
        total = 0
        for text in texts:
            toks = [BOS, BOS] + normalize_tokens(text) + [EOS]
            uni.update(toks[2:])
            total += len(toks) - 2
            for i in range(2, len(toks)):
                bi[toks[i - 1] + " " + toks[i]] += 1
                tri[toks[i - 2] + " " + toks[i - 1] + " " + toks[i]] += 1
        return NGramLM(dict(uni), dict(bi), dict(tri), total)

    def logprob_token(self, w2: str, w1: str, w: str) -> float:
        l3, l2, l1, l0 = LAMBDAS
        v = max(len(self.uni), 1)
        p = l0 / (v + 1)
        c_uni = self.uni.get(w, 0)
        if self.total:
            p += l1 * c_uni / self.total
        c_h1 = self.uni.get(w1, 0)
        c_bi = self.bi.get(w1 + " " + w, 0)
        if c_h1:
            p += l2 * c_bi / c_h1
        c_h2 = self.bi.get(w2 + " " + w1, 0)
        c_tri = self.tri.get(w2 + " " + w1 + " " + w, 0)
        if c_h2:
            p += l3 * c_tri / c_h2
        return math.log10(p)

    def perplexity(self, text: str) -> float:
        toks = [BOS, BOS] + normalize_tokens(text) + [EOS]
        n = len(toks) - 2
        if n == 0:
            return float("inf")
        lp = 0.0
        for i in range(2, len(toks)):
            lp += self.logprob_token(toks[i - 2], toks[i - 1], toks[i])
        return 10.0 ** (-lp / n)

    def prune(self, min_count: int = 2) -> "NGramLM":
        """Drop hapax bi/tri-grams: ~5-10x smaller executor payload for a
        tiny smoothing-side effect (KenLM ships pruned models the same way)."""
        return NGramLM(
            self.uni,
            {k: v for k, v in self.bi.items() if v >= min_count},
            {k: v for k, v in self.tri.items() if v >= min_count},
            self.total,
        )

    # --- serialization (SparkFiles / broadcast payload) ---
    def to_json(self) -> str:
        return json.dumps(
            {"uni": self.uni, "bi": self.bi, "tri": self.tri, "total": self.total}
        )

    @staticmethod
    def from_json(s: str) -> "NGramLM":
        d = json.loads(s)
        return NGramLM(d["uni"], d["bi"], d["tri"], d["total"])


def train_per_language(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    max_docs_per_lang: int = 20000,
    seed: int = 42,
    lang_counts: dict[str, int] | None = None,
) -> dict[str, NGramLM]:
    """Train one LM per language from a bounded deterministic sample.

    Driver-side by design: LM training is the offline-artifact step (CCNet
    ships pretrained KenLM binaries); the bounded sample keeps driver memory
    flat regardless of input scale.

    Sampling is a per-language hash FILTER (pmod of xxhash64 with a
    modulus sized from the per-language counts), not a row_number window:
    the window form sorted the entire corpus per language just to take a
    bounded sample — a full shuffle that buys nothing at scale. The
    filter over-admits slightly, so rows are deterministically truncated
    driver-side by (hash, text) order.

    ``lang_counts`` lets a caller that already knows the per-language
    row counts (e.g. from an earlier lineage aggregation) skip this
    function's own count job — one fewer scan when a pipeline trains
    right after profiling. The map is only used to size the sampling
    moduli, so approximate counts are fine.
    """
    counts = lang_counts or {
        r[0]: r[1] for r in df.groupBy(lang_col).count().collect()
    }
    if not counts:
        return {}
    mods = {
        lg: max(1, -(-n // max_docs_per_lang)) for lg, n in counts.items()
    }
    mod_expr = F.create_map(
        *[F.lit(x) for lg in sorted(mods) for x in (lg, mods[lg])]
    )
    h = F.xxhash64(F.col(text_col), F.lit(seed))
    # a language absent from (possibly caller-supplied) counts maps to
    # NULL in the modulus lookup, which would silently admit nothing —
    # coalesce to modulus 1 so unknown languages are fully admitted and
    # bounded by the driver-side truncation below instead
    modulus = F.coalesce(mod_expr[F.col(lang_col)], F.lit(1))
    sample = (
        df.select(lang_col, text_col, h.alias("_h"))
        .where(F.pmod(F.col("_h"), modulus) == 0)
        .collect()
    )
    by_lang: dict[str, list[tuple[int, str]]] = {}
    for row in sample:
        by_lang.setdefault(row[lang_col], []).append(
            (row["_h"], row[text_col] or "")
        )
    models: dict[str, NGramLM] = {}
    for lang, pairs in by_lang.items():
        pairs.sort()
        texts = [t for _, t in pairs[:max_docs_per_lang]]
        models[lang] = NGramLM.train(texts).prune(min_count=2)
    return models


# per-worker parsed-model cache: the serialized payload ships once in the
# UDF closure (executor-side pickle), but parsing happens once per worker
# process, NOT per Arrow batch (reference setup()-once contract,
# score_filter.py:275-281)
_MODEL_CACHE: dict[tuple[str, str], NGramLM] = {}


def perplexity_udf(models: dict[str, NGramLM]):
    """Vectorized scorer over (text, lang); unknown langs -> NaN."""
    import hashlib

    payload = {k: m.to_json() for k, m in models.items()}
    digest = hashlib.md5(
        "".join(f"{k}:{len(v)}" for k, v in sorted(payload.items())).encode()
    ).hexdigest()

    @F.pandas_udf(T.DoubleType())
    def _udf(text: pd.Series, lang: pd.Series) -> pd.Series:
        def get(lg: str) -> NGramLM | None:
            if lg not in payload:
                return None
            key = (digest, lg)
            lm = _MODEL_CACHE.get(key)
            if lm is None:
                lm = NGramLM.from_json(payload[lg])
                _MODEL_CACHE[key] = lm
            return lm

        out = []
        for t, lg in zip(text, lang):
            lm = get(lg)
            out.append(float("nan") if lm is None else lm.perplexity(t or ""))
        return pd.Series(out, dtype="float64")

    return _udf


def export_models_parquet(models: dict[str, NGramLM], out_dir: str) -> str:
    """Materialize the trained count tables (uni/bi/tri grams + per-lang
    totals) as parquet so an external SQL engine can reproduce the exact
    Jelinek-Mercer score — this is what gives the perplexity gate query a
    value-hash oracle instead of a rows-only check. Written driver-side
    with pyarrow (the model is already driver memory); the directory is
    replaced atomically enough for the write-then-read gate protocol."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    def _write(name: str, rows: list[tuple], cols: list[str]):
        table = pa.table(
            {c: [r[i] for r in rows] for i, c in enumerate(cols)}
        )
        pq.write_table(table, os.path.join(tmp, name))

    _write(
        "uni.parquet",
        [(lg, w, c) for lg, m in models.items() for w, c in m.uni.items()],
        ["lang", "g", "c"],
    )
    _write(
        "bi.parquet",
        [(lg, g, c) for lg, m in models.items() for g, c in m.bi.items()],
        ["lang", "g", "c"],
    )
    _write(
        "tri.parquet",
        [(lg, g, c) for lg, m in models.items() for g, c in m.tri.items()],
        ["lang", "g", "c"],
    )
    _write(
        "tot.parquet",
        [(lg, m.total, max(len(m.uni), 1)) for lg, m in models.items()],
        ["lang", "total", "v"],
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return out_dir


def ship_models(spark, models: dict[str, NGramLM], name: str = "ppl_models.json") -> str:
    """Distribute serialized LMs to executors via ``SparkContext.addFile``
    (the north rule's SparkFiles broadcast path; the closure-payload path in
    :func:`perplexity_udf` stays the zero-setup default for local mode).

    Returns the artifact file name to pass to :func:`perplexity_udf_from_file`.
    """
    import os
    import tempfile

    payload = {k: json.loads(m.to_json()) for k, m in models.items()}
    path = os.path.join(tempfile.mkdtemp(prefix="ppl_models_"), name)
    with open(path, "w") as f:
        json.dump(payload, f)
    spark.sparkContext.addFile(path)
    return name


def perplexity_udf_from_file(artifact_name: str):
    """Scorer whose models load lazily per worker from SparkFiles (no model
    bytes in the task closure — the executor fetches the artifact once)."""

    @F.pandas_udf(T.DoubleType())
    def _udf(text: pd.Series, lang: pd.Series) -> pd.Series:
        from pyspark import SparkFiles

        key = ("sparkfiles", artifact_name)
        models = _MODEL_CACHE.get(key)
        if models is None:
            with open(SparkFiles.get(artifact_name)) as f:
                raw = json.load(f)
            models = {
                lg: NGramLM(d["uni"], d["bi"], d["tri"], d["total"])
                for lg, d in raw.items()
            }
            _MODEL_CACHE[key] = models
        out = []
        for t, lg in zip(text, lang):
            lm = models.get(lg)
            out.append(float("nan") if lm is None else lm.perplexity(t or ""))
        return pd.Series(out, dtype="float64")

    return _udf


def score_perplexity(
    df: DataFrame,
    models: dict[str, NGramLM],
    text_col: str = "text",
    lang_col: str = "lang",
    out_col: str = "ppl",
    bucket: bool = True,
    num_partitions: int | None = None,
    sparkfiles_artifact: str | None = None,
) -> DataFrame:
    """Language-bucketed perplexity scoring.

    ``repartition(lang, salt)`` groups each language while the url-hash salt
    spreads a dominant language over many partitions (skew defusal); AQE
    coalesces small buckets.
    """
    if bucket:
        # salt range >= partition count: a dominant language must span EVERY
        # partition, not 16 of them (a small modulus caps parallelism at the
        # salt range and idles the rest of the cluster)
        n_salt = max(num_partitions or 0, 256)
        salt = F.pmod(F.xxhash64(F.col(text_col)), F.lit(n_salt))
        if num_partitions:
            df = df.repartition(num_partitions, F.col(lang_col), salt)
        else:
            df = df.repartition(F.col(lang_col), salt)
    if sparkfiles_artifact:
        udf = perplexity_udf_from_file(sparkfiles_artifact)
    else:
        udf = perplexity_udf(models)
    return df.withColumn(out_col, udf(F.col(text_col), F.col(lang_col)))

"""Deduplication suite: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Reference pipeline shapes (SURVEY.md §2.7): exact = hash → keep-first;
fuzzy = minhash signatures → LSH band buckets → candidate edges →
connected components → removal list. Re-expressed Spark-first:

* exact:   ``md5(text)`` + ``row_number`` window (one shuffle).
* minhash: Arrow pandas UDF computing the signature with vectorized numpy
  universal hashing over char-shingle crc32s (deterministic, seed-fixed;
  reference uses 24-char shingles / Mersenne-prime modulus,
  fuzzy/minhash.py:35-130).
* LSH:     ``posexplode`` the banded signature → groupBy (band, hash) →
  buckets → pairwise edges within buckets (bucket sizes are bounded in
  practice; the groupBy shuffle is the only wide op).
* components: iterative min-label propagation over edges (converges in
  O(log n) joins; GraphFrames-free).
* simhash: 64-bit fingerprint via sign-sum of token hashes; near-dup pairs
  via 4x16-bit band blocking + hamming check.

All randomness is seed-derived; everything else is built-in exprs.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window
from nemo_curator_spark import constants as C

MERSENNE_PRIME_61 = (1 << 61) - 1


# --- exact ---------------------------------------------------------------------


def exact_duplicate_ids(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Removal ids: every doc whose text was already seen at a lower id."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 1)
        .select(id_col)
    )


def remove_duplicates(df: DataFrame, removal_ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Anti-join removal (reference TextDuplicatesRemovalStage,
    text/deduplication/removal.py:37-105).

    No broadcast hint on purpose: at reference scale the removal list is
    ~64M ids (BASELINE.md exact-dedup gate) and an unconditional broadcast
    OOMs the driver/executors. AQE turns the anti-join into a broadcast
    join at runtime whenever the list actually is small."""
    return df.join(removal_ids, on=id_col, how="left_anti")


# --- minhash -------------------------------------------------------------------


def _shingle_hashes(text: str, width: int, weights: np.ndarray) -> np.ndarray:
    """Unique 64-bit hashes of all char (byte) shingles, fully vectorized:
    sliding windows dotted with fixed random weights (wrap-around uint64
    arithmetic — a deterministic universal-style hash, no Python loop)."""
    data = text.encode("utf-8", errors="ignore")
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(1, dtype=np.uint64)
    if arr.size <= width:
        pad = np.zeros(width, dtype=np.uint64)
        pad[: arr.size] = arr
        with np.errstate(over="ignore"):
            return np.array([pad @ weights], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(arr, width).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = win @ weights
    return np.unique(h)


def minhash_udf(num_perms: int = 128, shingle_width: int = 24, seed: int = 42):
    """Signature[j] = min over shingles x of (a_j * x + b_j) (multiply-shift
    universal hashing with natural 2^64 wrap — the modulo-free equivalent of
    the reference's Mersenne-prime permutations, fuzzy/minhash.py:35-130;
    LSH only needs signature equality, so the hash family is swappable)."""
    rs = np.random.RandomState(seed)
    a = rs.randint(1, MERSENNE_PRIME_61, size=num_perms, dtype=np.uint64) | 1
    b = rs.randint(0, MERSENNE_PRIME_61, size=num_perms, dtype=np.uint64)
    weights = rs.randint(1, 1 << 62, size=shingle_width, dtype=np.uint64) | 1

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(texts: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for t in texts:
                hs = _shingle_hashes(t or "", shingle_width, weights)
                sig = (hs[:, None] * a[None, :] + b[None, :]).min(axis=0)
                out.append(sig.view(np.int64))
        return pd.Series(out)

    return _udf


def add_minhash(
    df: DataFrame,
    text_col: str = "text",
    num_perms: int = 128,
    shingle_width: int = 24,
    seed: int = 42,
    out_col: str = "minhash",
) -> DataFrame:
    return df.withColumn(out_col, minhash_udf(num_perms, shingle_width, seed)(F.col(text_col)))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    num_bands: int = 16,
    num_perms: int | None = None,
) -> DataFrame:
    """Docs sharing any LSH band bucket → candidate (a, b) pairs, a < b.

    Pass ``num_perms`` (the signature length) when known — callers that
    built the signatures always know it — to skip the one-row probe job
    that otherwise derives it from the data."""
    if num_perms is None:
        sig_len_df = df.select(F.size(sig_col).alias("n")).limit(1).collect()
        num_perms = sig_len_df[0]["n"] if sig_len_df else 0
    rows_per_band = num_perms // num_bands
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda i: F.struct(
            i.alias("band"),
            F.xxhash64(
                F.slice(F.col(sig_col), i * rows_per_band + 1, rows_per_band)
            ).alias("bucket"),
        ),
    )
    exploded = df.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )
    # STAR edges (min-id -> member), not all-pairs: a bucket of k identical
    # docs yields k-1 edges instead of k(k-1)/2 — connected components
    # recovers the same clusters, and huge boilerplate/spam clusters no
    # longer explode the edge list (reference BucketsToEdgesStage shape,
    # fuzzy/buckets_to_edges.py:30). Emitted via a window-min rather than
    # collect_list so a whole identical-text cluster never materializes as
    # one array row (a 10M-doc spam cluster would be a multi-GB single row).
    w = Window.partitionBy("band", "bucket")
    pairs = (
        exploded.withColumn("_min_id", F.min(id_col).over(w))
        .where(F.col(id_col) != F.col("_min_id"))
        .select(F.col("_min_id").alias("a"), F.col(id_col).alias("b"))
        .distinct()
    )
    return pairs


def word_ngram_hash_udf(n: int = 3):
    """Distinct 64-bit hashes of word n-grams, vectorized: per-token
    crc32-pair hashes combined across the n-window with a golden-ratio
    polynomial mix (numpy, wrap-around uint64). Tokens come from python
    ``str.split()`` — the reference tokenizer, equal to the harmonized
    ISPACE class the DuckDB oracle splits with. Jaccard only consumes
    SET SIZES, so the hash family is swappable as long as it is
    collision-free in practice (64-bit: ~1e-13 per doc) — the oracle
    computes the same sizes over the gram STRINGS. Replaces an
    interpreted HOF (slice+join+xxhash per gram) measured at ~18 s of
    the 50k-doc fuzzy-dedup verification; this form is ~6x faster."""
    A = np.uint64(0x9E3779B97F4A7C15)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(texts: pd.Series) -> pd.Series:
        import zlib

        crc = zlib.crc32
        # batch-level token-hash cache: web text repeats tokens massively
        # (stopwords, duplicated boilerplate), so the two crc32 calls run
        # once per DISTINCT token per batch instead of once per token —
        # identical crc32 bits either way (golden tests pin the grams)
        hcache: dict[str, int] = {}

        def tok_hash(tok: str) -> int:
            h = hcache.get(tok)
            if h is None:
                e = tok.encode("utf-8", "ignore")
                h = (crc(e + b"#2") << 32) | crc(e)
                hcache[tok] = h
            return h

        out = []
        with np.errstate(over="ignore"):
            for t in texts:
                toks = (t or "").split()
                m = len(toks) - n + 1
                if m <= 0:
                    out.append(np.empty(0, dtype=np.int64))
                    continue
                h = np.fromiter(
                    (tok_hash(tok) for tok in toks),
                    dtype=np.uint64,
                    count=len(toks),
                )
                acc = h[:m].copy()
                for k in range(1, n):
                    acc = acc * A + h[k : k + m]
                out.append(np.unique(acc).view(np.int64))
        return pd.Series(out)

    return _udf


def jaccard_ngram(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs (verification step).
    Gram sets are built by :func:`word_ngram_hash_udf` (one Arrow pass);
    intersect/union sizes stay JVM-side array ops."""
    # compute grams ONLY for docs that appear in candidate pairs (semi-join
    # first): candidates are a small fraction of the corpus, and gram
    # construction is the expensive part of verification
    needed = (
        pairs.select(F.col("a").alias(id_col))
        .union(pairs.select(F.col("b").alias(id_col)))
        .distinct()
    )
    g = (
        df.join(needed, id_col, "left_semi")
        .select(
            F.col(id_col).alias("_id"),
            word_ngram_hash_udf(n)(F.col(text_col)).alias("_grams"),
        )
    )
    joined = (
        pairs.join(g.withColumnRenamed("_id", "a").withColumnRenamed("_grams", "ga"), "a")
        .join(g.withColumnRenamed("_id", "b").withColumnRenamed("_grams", "gb"), "b")
    )
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return joined.select(
        "a",
        "b",
        F.when(union == 0, F.lit(0.0)).otherwise(inter / union).cast("double").alias("jaccard"),
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    strict: bool = True,
    metrics: dict | None = None,
) -> DataFrame:
    """Min-label propagation + pointer-doubling over undirected edges
    (a,b) → (id, component).

    Each iteration (1) takes the min label across edges, then (2) shortcuts
    every label to its label's label (``comp = label[comp]``), halving the
    remaining path length — so convergence is O(log diameter) rounds, not
    O(diameter) as plain propagation would be (long near-duplicate chains
    across LSH buckets can have large diameter even with star edges).
    ``localCheckpoint`` truncates the plan every iteration — without it each
    round re-derives every previous round and the loop goes exponential.

    If the loop exits without converging, raises (``strict=True``, default)
    or logs a warning — silently returning partial labels would leave
    duplicates unremoved. Pass a ``metrics`` dict to receive
    ``{"rounds", "converged", "unconverged_labels"}`` — in warn mode a
    100-TB operator needs the degradation recorded, not just a stderr
    line (``cc_metrics_df`` turns it into a lineage/metrics row). The
    unconverged-label count is one extra bounded self-join, run only on
    the non-converged path.
    """
    sym = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy(sym.a.alias("id"))
            .agg(F.min("comp").alias("nmin"))
        )
        # carry the pre-round label as _old so the convergence probe below
        # is a filter over the checkpointed frame — the previous form
        # re-joined new vs old labels (two extra shuffles per round)
        stepped = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.col("comp").alias("_old"),
                F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"),
            )
        )
        # pointer doubling: comp <- label[comp] (labels only ever decrease,
        # so following the chain one hop is always sound and halves depth)
        parent = stepped.select(
            F.col("id").alias("_pid"), F.col("comp").alias("_pcomp")
        )
        new_with_old = (
            stepped.join(parent, stepped.comp == parent._pid, "left")
            .select(
                "id",
                "_old",
                F.least(
                    F.col("comp"), F.coalesce("_pcomp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_with_old.where(F.col("comp") != F.col("_old")).limit(1).count()
        )
        labels = new_with_old.drop("_old")
        if changed == 0:
            converged = True
            break
    if metrics is not None:
        metrics["rounds"] = rounds
        metrics["converged"] = converged
        metrics["unconverged_labels"] = 0
    if not converged:
        if metrics is not None:
            # labels that another round would still lower: comp is not a
            # root (comp's own label is smaller) — a bounded self-join on
            # the label frame, not the corpus
            parent = labels.select(
                F.col("id").alias("_pid"), F.col("comp").alias("_pcomp")
            )
            metrics["unconverged_labels"] = (
                labels.join(parent, labels.comp == parent._pid)
                .where(F.col("_pcomp") < F.col("comp"))
                .count()
            )
        msg = (
            f"connected_components did not converge in {max_iter} iterations; "
            "labels may be partial (duplicates could survive removal)"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return labels


def cc_metrics_df(spark, metrics: dict, run_id: str = "") -> DataFrame:
    """One metrics row for the lineage table from a ``metrics`` dict
    populated by :func:`connected_components` — how a long-running
    dedup job records that warn-mode degraded to partial labels."""
    return spark.createDataFrame(
        [
            (
                run_id,
                "connected_components",
                int(metrics.get("rounds", 0)),
                bool(metrics.get("converged", False)),
                int(metrics.get("unconverged_labels", 0)),
            )
        ],
        "run_id string, stage string, rounds int, converged boolean, "
        "unconverged_labels int",
    )


def fuzzy_duplicate_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = 128,
    num_bands: int = 16,
    shingle_width: int = 24,
    jaccard_threshold: float | None = 0.8,
    seed: int = 42,
    cc_metrics: dict | None = None,
) -> DataFrame:
    """Full fuzzy-dedup workflow → removal ids (keep min id per component).
    Pass ``cc_metrics`` to capture the connected-components convergence
    record (see :func:`cc_metrics_df`) — warn-mode degradation is
    otherwise invisible to the job's metrics table."""
    sigs = add_minhash(df, text_col, num_perms, shingle_width, seed)
    pairs = lsh_candidate_pairs(sigs, id_col, "minhash", num_bands, num_perms)
    if jaccard_threshold is not None:
        verified = jaccard_ngram(df, pairs, id_col, text_col).where(
            F.col("jaccard") >= jaccard_threshold
        )
        edges = verified.select("a", "b")
    else:
        edges = pairs
    # warn-mode: at corpus scale a pathological non-convergence at the
    # last iteration must degrade to partial labels (duplicates survive —
    # safe direction, no data loss) rather than kill a long job at its
    # final stage; the strict raise stays the default for the low-level
    # API and the correctness gates.
    comps = connected_components(edges, strict=False, metrics=cc_metrics)
    return comps.where(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )


# --- simhash -------------------------------------------------------------------


def simhash_udf(bits: int = 64, seed: int = 42):
    """64-bit SimHash fingerprint per doc. Token hash = crc32(tok) in the
    low 32 bits, crc32(tok + "#2") in the high 32. The per-bit vote is
    vectorized: unpack every token hash to a (tokens, 64) bit matrix, sum
    votes per doc with add.reduceat, majority -> packbits. Bit-identical
    to the scalar form (pinned by test_simhash_fingerprint_golden);
    ~10-50x less Python time on long docs than the per-token-per-bit
    loop it replaced."""
    if bits != 64:
        raise ValueError("simhash_udf is specialized to 64 bits")

    @F.pandas_udf(T.LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        tok_lists = [(t or "").lower().split() for t in texts]
        counts = np.array([len(tl) for tl in tok_lists], dtype=np.int64)
        total = int(counts.sum())
        out = np.zeros(len(texts), dtype=np.int64)
        if total == 0:
            return pd.Series(out)
        hs = np.empty(total, dtype=np.uint64)
        crc = zlib.crc32
        # batch-level token-hash cache (same crc32 bits, once per
        # DISTINCT token per batch — see word_ngram_hash_udf)
        hcache: dict[str, int] = {}
        hget = hcache.get
        i = 0
        for tl in tok_lists:
            for tok in tl:
                h = hget(tok)
                if h is None:
                    b = tok.encode("utf-8")
                    h = crc(b) | (crc(b + b"#2") << 32)
                    hcache[tok] = h
                hs[i] = h
                i += 1
        # (total, 64) bit matrix, column j = bit j of the hash
        bitmat = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        nz = counts > 0
        nz_counts = counts[nz]
        starts = np.zeros(len(nz_counts), dtype=np.int64)
        np.cumsum(nz_counts[:-1], out=starts[1:])
        ones = np.add.reduceat(bitmat, starts, axis=0)
        # acc_i > 0  <=>  2*ones_i > n_tokens (exact integer majority)
        fp = np.packbits(
            (2 * ones) > nz_counts[:, None], axis=1, bitorder="little"
        )
        out[np.flatnonzero(nz)] = fp.view(np.int64).ravel()
        return pd.Series(out)

    return _udf


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4x16-bit bands (a pair within
    hamming<=3 of 64 bits must agree on >=1 band), verify hamming.

    Skew guards for scale: (1) fp=0 rows (empty/token-less docs) are
    excluded — at web scale that degenerate key collects millions of rows
    and the band self-join goes quadratic on it; (2) buckets larger than
    ``max_bucket_size`` switch from all-pairs to star edges (min-id vs
    members, k-1 rows instead of k²/2) — a hot bucket is overwhelmingly one
    near-identical cluster, and downstream connected-components recovers the
    same clusters from the star; only the explicit pair list within the hot
    bucket is thinned.
    """
    fp = simhash_udf()(F.col(text_col))
    d = df.select(F.col(id_col).alias("id"), fp.alias("fp"))
    return simhash_pairs_from_fps(d, max_hamming, max_bucket_size)


def simhash_pairs_from_fps(
    d: DataFrame, max_hamming: int = 3, max_bucket_size: int = 1000
) -> DataFrame:
    """Banding + hamming verification over precomputed (id, fp) rows —
    split out so the fingerprint artifact can be materialized between the
    two stages (the correctness gate's write-then-read oracle protocol)."""
    d = d.where(F.col("fp") != 0)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("fp"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for i in range(4)
        ]
    )
    w = Window.partitionBy("band", "key")
    exploded = (
        d.select("id", "fp", F.explode(bands).alias("bb"))
        .select("id", "fp", "bb.band", "bb.key")
        .withColumn("_bucket_n", F.count("*").over(w))
        .withColumn("_min", F.min(F.struct("id", "fp")).over(w))
    )
    small = exploded.where(F.col("_bucket_n") <= max_bucket_size)
    all_pairs = (
        small.alias("x")
        .join(
            small.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.col("x.fp").alias("fa"),
            F.col("y.fp").alias("fb"),
        )
    )
    star_pairs = (
        exploded.where(
            (F.col("_bucket_n") > max_bucket_size)
            & (F.col("id") != F.col("_min.id"))
        )
        .select(
            F.col("_min.id").alias("a"),
            F.col("id").alias("b"),
            F.col("_min.fp").alias("fa"),
            F.col("fp").alias("fb"),
        )
    )
    pairs = (
        all_pairs.unionByName(star_pairs)
        .select(
            "a",
            "b",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs

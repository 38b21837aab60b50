"""Dedup suite (exact / minhash-LSH / simhash / jaccard) with planted
duplicates, and cosine top-k similarity incl. DuckDB parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nemo_curator_spark import synth
from nemo_curator_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(0)
    texts = [synth._clean_doc(rng, 80) for _ in range(40)]
    rows = []
    for i, t in enumerate(texts):
        rows.append((i, t))
    # exact duplicates: 100+i duplicates text i for i in 0..4
    for i in range(5):
        rows.append((100 + i, texts[i]))
    # near duplicates: copy with one word changed
    for i in range(5, 10):
        words = texts[i].split(" ")
        words[3] = "changedword"
        rows.append((200 + i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicate_ids(spark, corpus):
    ids = sorted(r["doc_id"] for r in dedup.exact_duplicate_ids(corpus).collect())
    assert ids == [100, 101, 102, 103, 104]
    kept = dedup.remove_duplicates(corpus, dedup.exact_duplicate_ids(corpus))
    assert kept.count() == corpus.count() - 5


def test_minhash_lsh_finds_planted_near_dups(spark, corpus):
    removal = dedup.fuzzy_duplicate_ids(
        corpus, num_perms=128, num_bands=32, jaccard_threshold=0.7
    )
    got = sorted(r["doc_id"] for r in removal.collect())
    # every planted exact dup and near dup must be flagged (the min id of
    # each component is kept; planted ids are always the larger ones)
    expected_flagged = set(range(100, 105)) | set(range(205, 210))
    assert expected_flagged <= set(got), sorted(expected_flagged - set(got))
    # no false positives among distinct clean docs
    false_pos = [i for i in got if i < 40 and i not in range(10)]
    assert false_pos == []


def test_jaccard_pairs(spark, corpus):
    pairs = spark.createDataFrame([(5, 205), (0, 1)], "a long, b long")
    out = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.jaccard_ngram(corpus, pairs).collect()
    }
    assert out[(5, 205)] > 0.8  # near dup
    assert out[(0, 1)] < 0.2  # unrelated


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)], "a long, b long"
    )
    comps = {
        r["id"]: r["comp"] for r in dedup.connected_components(edges).collect()
    }
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[10] == comps[11] == 10
    assert comps[20] == comps[21] == comps[22] == 20


def test_simhash_near_duplicates(spark, corpus):
    pairs = dedup.simhash_near_duplicates(corpus, max_hamming=3)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # exact dups have identical simhash -> hamming 0
    for i in range(5):
        assert (i, 100 + i) in got
    # near dups (one word changed) within small hamming distance
    near_hits = sum(1 for i in range(5, 10) if (i, 200 + i) in got)
    assert near_hits >= 3


# --- similarity ------------------------------------------------------------------


def test_cosine_topk_exact_and_duckdb_parity(spark):
    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    df = spark.read.parquet(emb_path).limit(200)
    got = (
        similarity.cosine_topk(df, k=3)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v
                      FROM '{emb_path}' LIMIT 200),
        scored AS (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 list_dot_product(q.v, n.v) /
                 (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v)))
                 AS cosine
          FROM base q, base n WHERE q.vec_id <> n.vec_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
          ) AS rank FROM scored
        ) WHERE rank <= 3 ORDER BY query_id, rank
        """
    ).df()
    assert list(got["query_id"]) == list(want["query_id"])
    assert list(got["neighbor_id"]) == list(want["neighbor_id"])
    assert np.allclose(got["cosine"], want["cosine"], rtol=1e-9, atol=1e-12)


def test_ann_recall_vs_exact(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)
    exact = (
        similarity.cosine_topk(df, k=5).select("query_id", "neighbor_id").toPandas()
    )
    approx = (
        similarity.ann_topk_hyperplane(df, k=5, n_planes=4, num_tables=8)
        .select("query_id", "neighbor_id")
        .toPandas()
    )
    exact_set = set(map(tuple, exact.values))
    approx_set = set(map(tuple, approx.values))
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall > 0.5, recall


def test_embedding_near_duplicates(spark):
    # plant: vectors 0/1 identical, 2 orthogonal
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.9, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r["a"], r["b"])
        for r in similarity.embedding_near_duplicates(
            df, threshold=0.99, n_planes=4, num_tables=8
        ).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_ivf_topk_recall(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)
    exact = (
        similarity.cosine_topk(df, k=5).select("query_id", "neighbor_id").toPandas()
    )
    ivf = (
        similarity.ivf_topk(df, k=5, n_lists=8, n_probe=3)
        .select("query_id", "neighbor_id")
        .toPandas()
    )
    exact_set = set(map(tuple, exact.values))
    ivf_set = set(map(tuple, ivf.values))
    recall = len(exact_set & ivf_set) / len(exact_set)
    assert recall > 0.6, recall
    # every query answered with k results
    assert ivf.groupby("query_id").size().min() == 5


def test_simhash_fingerprint_golden(spark):
    """The vectorized simhash UDF is bit-identical to the scalar SimHash
    definition (per-token crc32 votes, strict-majority bit)."""
    import zlib

    def scalar_simhash(t):
        tokens = (t or "").lower().split()
        if not tokens:
            return 0
        acc = [0] * 64
        for tok in tokens:
            h = zlib.crc32(tok.encode("utf-8")) | (
                zlib.crc32((tok + "#2").encode("utf-8")) << 32
            )
            for i in range(64):
                acc[i] += 1 if (h >> i) & 1 else -1
        fp = 0
        for i in range(64):
            if acc[i] > 0:
                fp |= 1 << i
        return fp - (1 << 64) if fp >= (1 << 63) else fp

    texts = [
        "",
        "one",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "a a a a b",  # even/odd vote ties exercised
        "x y " * 500,  # long doc
        "Üñíçødé tøkêns and\tmixed   whitespace\nlines",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: r["fp"]
        for r in df.select("i", dedup.simhash_udf()(F.col("t")).alias("fp")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == scalar_simhash(t), (i, t[:30])

"""Planted hot-key corpora: the dedup/ANN blocking stages must stay linear
(star edges / bucket caps) when thousands of docs share one bucket —
the shape a 100 TB web crawl guarantees (boilerplate/spam clusters).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nemo_curator_spark.operators import dedup

N_HOT = 5000


def _hot_corpus(spark, n=N_HOT):
    """n identical docs + a handful of unrelated ones."""
    rows = [(i, "exactly the same boilerplate spam page text " * 8) for i in range(n)]
    rows += [(n + j, f"unique document number {j} with its own words {j*7}") for j in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_star_edges_linear_on_identical_cluster(spark):
    df = _hot_corpus(spark)
    sigs = dedup.add_minhash(df, num_perms=32, shingle_width=8)
    pairs = dedup.lsh_candidate_pairs(sigs, num_bands=8)
    # star edges within the identical cluster: each of the 4999 non-min
    # members pairs with the min id exactly once; all-pairs would be ~12.5M
    cluster_edges = pairs.where(
        (F.col("a") < N_HOT) & (F.col("b") < N_HOT)
    ).count()
    assert cluster_edges == N_HOT - 1
    # the near-identical "unique" tail may add a few candidates, never a blowup
    assert pairs.count() < N_HOT + 20


def test_fuzzy_dedup_removes_hot_cluster(spark):
    df = _hot_corpus(spark)
    removal = dedup.fuzzy_duplicate_ids(
        df, num_perms=32, num_bands=8, jaccard_threshold=0.8
    )
    ids = {r["doc_id"] for r in removal.collect()}
    # every identical doc except the min id is removed; uniques survive
    assert ids == set(range(1, N_HOT))


def test_simhash_hot_bucket_star_fallback(spark):
    df = _hot_corpus(spark)
    pairs = dedup.simhash_near_duplicates(df, max_bucket_size=1000)
    n = pairs.count()
    # oversized buckets emit star edges only: N_HOT-1, not ~12.5M
    assert n == N_HOT - 1
    a_min = pairs.agg(F.min("a")).collect()[0][0]
    assert a_min == 0


def test_simhash_excludes_degenerate_fingerprints(spark):
    rows = [(i, "") for i in range(200)] + [(500, "real text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 200 empty docs all hash to fp=0 — must NOT produce 200^2 pairs
    assert dedup.simhash_near_duplicates(df).count() == 0


def test_connected_components_long_chain_converges(spark):
    # path graph 0-1-2-...-63: plain min-label propagation needs 63 rounds,
    # pointer doubling must finish well inside max_iter=25 (strict=True
    # raises if it doesn't)
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    metrics: dict = {}
    labels = dedup.connected_components(
        edges, max_iter=25, strict=True, metrics=metrics
    )
    comps = {r["comp"] for r in labels.collect()}
    assert comps == {0}
    assert metrics["converged"] is True
    assert metrics["unconverged_labels"] == 0
    assert 1 <= metrics["rounds"] <= 25


def test_connected_components_unconverged_metric_row(spark):
    """Round-5 item: warn-mode degradation must be visible as a metrics
    row, not only a warning — a pathological chain with max_iter too
    small leaves partial labels; the metric counts them."""
    import warnings

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    metrics: dict = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.connected_components(
            edges, max_iter=2, strict=False, metrics=metrics
        ).collect()
    assert any("did not converge" in str(x.message) for x in w)
    assert metrics["converged"] is False
    assert metrics["rounds"] == 2
    assert metrics["unconverged_labels"] > 0

    row = dedup.cc_metrics_df(spark, metrics, run_id="r5").collect()[0]
    assert row["stage"] == "connected_components"
    assert row["converged"] is False
    assert row["rounds"] == 2
    assert row["unconverged_labels"] == metrics["unconverged_labels"]
    # strict mode still raises on the same corpus
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, max_iter=2, strict=True)


def test_semantic_hot_cluster_star_fallback(spark):
    from nemo_curator_spark.operators import semantic

    # 600 identical embeddings + a distinct tail -> one hot cluster
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(600)]
    rows += [(1000 + j, [0.0, 1.0, float(j) / 10.0, 1.0]) for j in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = semantic.semantic_near_duplicates(
        df, k=2, threshold=0.99, max_cluster_size=100
    )
    n = pairs.count()
    # one row per removed doc (max-to-earlier semantics), never all-pairs:
    # 599 rows from the hot cluster, not ~180k — and the earlier-side cap
    # bounds the join at |cluster| * max_cluster_size
    assert n < 650
    removal = semantic.semantic_duplicate_ids(
        df, k=2, threshold=0.99, seed=42, max_cluster_size=100
    )
    ids = {r["vec_id"] for r in removal.collect()}
    # reference "hard" ranking: equal dist-to-centroid ties break id DESC,
    # so the top-ranked survivor of the identical block is id 599
    assert set(range(0, 599)) <= ids
    assert 599 not in ids

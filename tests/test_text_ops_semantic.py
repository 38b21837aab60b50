"""AddId / splitter / joiner / removal round-trips; semantic dedup;
classifier/embedder stage plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nemo_curator_spark.operators import classifiers, dedup, semantic, text_ops


def test_add_id_hash_keyed(spark):
    df = spark.createDataFrame([("a",), ("b",)], "text string")
    out = text_ops.add_id(df, id_col="id", prefix="doc", key_col="text").toPandas()
    assert out["id"].str.startswith("doc_").all()
    # deterministic: same key -> same id across runs
    out2 = text_ops.add_id(df, id_col="id", prefix="doc", key_col="text").toPandas()
    assert sorted(out["id"]) == sorted(out2["id"])
    with pytest.raises(ValueError):
        text_ops.add_id(df.withColumn("id", F.lit("x")), id_col="id")


def test_split_join_roundtrip(spark):
    rows = [
        (1, "para one\n\npara two\n\npara three", "en"),
        (2, "single para", "pt"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    split = text_ops.split_documents(df, "text")
    assert split.count() == 4
    seg = {
        (r["doc_id"], r["segment_id"]): r["text"] for r in split.collect()
    }
    assert seg[(1, 0)] == "para one" and seg[(1, 2)] == "para three"
    joined = text_ops.join_documents(split, "doc_id", "text")
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in joined.collect()}
    assert got[1] == (rows[0][1], "en")
    assert got[2] == (rows[1][1], "pt")


def test_remove_duplicates_anti_join(spark):
    df = spark.createDataFrame(
        [(i, "t" + str(i % 3)) for i in range(9)], "doc_id long, text string"
    )
    removal = dedup.exact_duplicate_ids(df)
    kept = dedup.remove_duplicates(df, removal)
    assert kept.count() == 3
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2]


def _planted_corpus():
    rng = np.random.RandomState(0)
    centers = rng.normal(size=(4, 16))
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(10):
            v = centers[c] + rng.normal(scale=0.2, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    # plant near-identical pairs
    rows.append((100, rows[0][1]))
    rows.append((101, [x * 1.0001 for x in rows[5][1]]))
    return rows


def test_semantic_dedup(spark):
    rows = _planted_corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    removal = semantic.semantic_duplicate_ids(df, k=4, threshold=0.999)
    got = sorted(r["vec_id"] for r in removal.collect())
    # exactly one member of each planted near-identical pair is removed
    # (which one depends on the hard ranking's dist-to-centroid ordering,
    # which for a scaled copy comes down to float rounding — the exact
    # reference-semantics pin is test_semantic_dedup_matches_pyref_port)
    assert len(got) == 2
    assert (0 in got) != (100 in got)
    assert (5 in got) != (101 in got)


def test_semantic_dedup_matches_pyref_port(spark):
    """3-way pin: the Spark removal set equals the pure-python port of the
    reference's pairwise logic (pairwise.py:37-72 triu max-to-earlier,
    ranking.py sort, identify_duplicates.py threshold) run on the same
    cluster assignments."""
    from nemo_curator_spark import pyref

    rows = _planted_corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    clustered = semantic.cluster_embeddings(df, k=4).collect()
    items = [
        (
            r["vec_id"],
            r["cluster"],
            r["cosine_dist_to_cent"],
            list(r["nvec"]),
        )
        for r in clustered
    ]
    for thr in (0.999, 0.95):
        want = pyref.semdedup_removal_py(items, threshold=thr)
        got = {
            r["vec_id"]
            for r in semantic.semantic_duplicate_ids(
                df, k=4, threshold=thr
            ).collect()
        }
        assert got == want
    # scores match the port to float tolerance
    want_scores = pyref.semdedup_scores_py(items)
    got_scores = {
        r["id"]: r["cosine_sim_score"]
        for r in semantic.semantic_scores(df, k=4).collect()
    }
    assert set(got_scores) == set(want_scores)
    for rid, s in want_scores.items():
        assert abs(got_scores[rid] - s) < 1e-9


def test_semantic_auto_k_scales_with_corpus():
    from nemo_curator_spark.operators.semantic import _auto_k

    assert _auto_k(1_000) == 16
    assert _auto_k(200_000) == 100
    assert _auto_k(2_000_000_000) == 100_000  # clamped ceiling


class MockClassifier:
    def predict_batch(self, tokens):
        return ["long" if len(t) > 3 else "short" for t in tokens]

    def prob_batch(self, tokens):
        return [min(1.0, len(t) / 10.0) for t in tokens]


def test_classifier_stage(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five"), (2, "hi")], "i long, text string"
    )
    out = (
        classifiers.ClassifierStage(model=MockClassifier())
        .apply(df)
        .orderBy("i")
        .toPandas()
    )
    assert list(out["pred_label"]) == ["long", "short"]
    assert out["pred_prob"][0] == 0.5


def test_classifier_stage_unplugged_raises(spark):
    df = spark.createDataFrame([(1, "x")], "i long, text string")
    with pytest.raises(Exception, match="no transformer runtime"):
        classifiers.ClassifierStage().apply(df).collect()


def test_embedder_stage_deterministic_and_unit_norm(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "a different doc entirely")],
        "i long, text string",
    )
    a = classifiers.EmbedderStage(dim=32).apply(df).orderBy("i").toPandas()
    b = classifiers.EmbedderStage(dim=32).apply(df).orderBy("i").toPandas()
    for i in range(2):
        va, vb = np.array(a["embedding"][i]), np.array(b["embedding"][i])
        assert np.allclose(va, vb)
        assert abs(np.linalg.norm(va) - 1.0) < 1e-5


def test_join_documents_chunked(spark):
    segs = [
        (1, 0, "aaaa"),    # 4
        (1, 1, "bbbb"),    # +2 sep +4 = 10 <= 12 -> same chunk
        (1, 2, "cccc"),    # would be 16 > 12 -> new chunk
        (1, 3, "x" * 20),  # oversized single segment -> own chunk
        (2, 0, "solo"),
    ]
    df = spark.createDataFrame(segs, "doc_id long, segment_id int, text string")
    out = text_ops.join_documents_chunked(
        df, "doc_id", max_length=12, separator="--"
    )
    got = {
        (r["doc_id"], r["chunk_id"]): r["text"] for r in out.collect()
    }
    assert got[(1, 0)] == "aaaa--bbbb"
    assert got[(1, 1)] == "cccc"
    assert got[(1, 2)] == "x" * 20
    assert got[(2, 0)] == "solo"


def test_as_of_join(spark):
    from nemo_curator_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (2, 15.0, "c"), (1, 5.0, "d")],
        "k long, ts double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5.0, 100.0), (1, 18.0, 200.0), (2, 30.0, 300.0)],
        "k long, ts double, val double",
    )
    out = {
        (r["k"], r["ts"]): r["val"]
        for r in as_of_join(left, right, on="k").collect()
    }
    assert out[(1, 10.0)] == 100.0   # latest right at ts<=10 is 5
    assert out[(1, 20.0)] == 200.0   # 18 <= 20
    assert out[(1, 5.0)] == 100.0    # inclusive >= at equal ts
    assert out[(2, 15.0)] is None    # no preceding right row


def test_semantic_easy_ranking_matches_pyref(spark):
    """which_to_keep='easy' (ascending dist, keep representatives) also
    matches the pure-python reference port."""
    from nemo_curator_spark import pyref

    rows = _planted_corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    clustered = semantic.cluster_embeddings(df, k=4).collect()
    items = [
        (r["vec_id"], r["cluster"], r["cosine_dist_to_cent"], list(r["nvec"]))
        for r in clustered
    ]
    want = pyref.semdedup_removal_py(items, threshold=0.999, which_to_keep="easy")
    got = {
        r["vec_id"]
        for r in semantic.semantic_duplicate_ids(
            df, k=4, threshold=0.999, which_to_keep="easy"
        ).collect()
    }
    assert got == want
    # hard vs easy disagree on WHICH member of a planted pair survives
    hard = {
        r["vec_id"]
        for r in semantic.semantic_duplicate_ids(
            df, k=4, threshold=0.999, which_to_keep="hard"
        ).collect()
    }
    assert len(got) == len(hard) == 2


def test_semantic_random_ranking_deterministic(spark):
    rows = _planted_corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = {
        r["vec_id"]
        for r in semantic.semantic_duplicate_ids(
            df, k=4, threshold=0.999, which_to_keep="random", seed=7
        ).collect()
    }
    b = {
        r["vec_id"]
        for r in semantic.semantic_duplicate_ids(
            df, k=4, threshold=0.999, which_to_keep="random", seed=7
        ).collect()
    }
    assert a == b and len(a) == 2
    import pytest as _pt

    with _pt.raises(ValueError):
        semantic.semantic_scores(df, which_to_keep="bogus")


def test_ranking_strategy(spark):
    """RankingStrategy (reference semantic/ranking.py:21-100): metadata
    ranking plugs into semantic_scores as the within-cluster order."""
    import numpy as np
    import pytest

    from nemo_curator_spark.operators import semantic as SEM

    rs = SEM.RankingStrategy(["a", "b"], ascending=[True, False])
    assert rs.ascending == [True, False]
    assert SEM.RankingStrategy(["a", "b"], ascending=True).ascending == [
        True, True,
    ]
    with pytest.raises(ValueError, match="must match metadata_cols"):
        SEM.RankingStrategy(["a"], ascending=[True, False])
    with pytest.raises(ValueError, match="Invalid strategy"):
        SEM.RankingStrategy([], strategy="nope").order_columns(["a"])
    with pytest.raises(ValueError, match="Required columns"):
        SEM.RankingStrategy(["missing"]).order_columns(["a", "id"])
    assert SEM.RankingStrategy.random(7).strategy == "random"

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 6))
    df = spark.createDataFrame(
        [(i, vecs[i].tolist(), 30 - i) for i in range(30)],
        "vec_id long, embedding array<double>, priority long",
    )
    # metadata ranking on the computed distance column == the 'easy'
    # preset (same order expression incl. the id tie-break)
    a = SEM.semantic_scores(
        df, k=3, which_to_keep="easy",
    ).orderBy("id").toPandas()
    b = SEM.semantic_scores(
        df, k=3,
        ranking_strategy=SEM.RankingStrategy.metadata_based(
            ["cosine_dist_to_cent"], ascending=True
        ),
    ).orderBy("id").toPandas()
    assert a.cosine_sim_score.tolist() == b.cosine_sim_score.tolist()
    # seeded random strategy == the 'random' preset with the same seed
    c = SEM.semantic_scores(df, k=3, which_to_keep="random", seed=11)
    d = SEM.semantic_scores(
        df, k=3, seed=11, ranking_strategy=SEM.RankingStrategy.random(11),
    )
    assert (
        c.orderBy("id").toPandas().cosine_sim_score.tolist()
        == d.orderBy("id").toPandas().cosine_sim_score.tolist()
    )
    # a caller metadata column flows through and drives the order
    e = SEM.semantic_scores(
        df, k=3,
        ranking_strategy=SEM.RankingStrategy.metadata_based(["priority"]),
    )
    assert e.count() == 30

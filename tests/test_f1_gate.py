"""North-rule correctness gate: keep/drop F1 vs the reference labels.

The reference labels come from pyref — the pure-Python reimplementation of
the reference formulas, pinned by the reference's own unit fixtures
(test_heuristics_pyref.py). The Spark chain must reach F1 >= 0.99; it in
fact reaches exactly 1.0 because every rule is bit-identical (the only
semantic deviations are the documented order-dependent-RNG redesigns,
which this gate does not exercise)."""

from __future__ import annotations

from nemo_curator_spark import pyref, synth
from nemo_curator_spark.pipeline import chain


def test_keep_drop_f1_vs_reference(spark):
    pdf = synth.generate_web_pages(2000, seed=77)[["url", "text"]]
    df = spark.createDataFrame(pdf)
    got = (
        chain.english_chain(df, "text", mode="label")
        .select("url", "keep", "drop_reason")
        .toPandas()
        .set_index("url")
    )
    tp = fp = fn = tn = 0
    reason_mismatch = 0
    for _, row in pdf.iterrows():
        want_keep, want_reason = pyref.label_document(row["text"])
        have_keep = bool(got.loc[row["url"], "keep"])
        have_reason = got.loc[row["url"], "drop_reason"]
        if want_keep and have_keep:
            tp += 1
        elif want_keep and not have_keep:
            fn += 1
        elif not want_keep and have_keep:
            fp += 1
        else:
            tn += 1
            if have_reason != want_reason:
                reason_mismatch += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (tp, fp, fn, tn)
    assert f1 == 1.0  # bit-identical rules -> exact agreement
    assert reason_mismatch == 0  # drop_reason matches cascade order exactly
    assert tn > 100  # the corpus actually exercises drops
    # exact-count regression gate (reference nightly-benchmark style:
    # pinned cardinality on a fixed corpus — seed 77, 2000 docs)
    assert int(got["keep"].sum()) == 1270

"""Declarative YAML pipeline loader (reference Hydra-config shape)."""

from __future__ import annotations

from nemo_curator_spark.pipeline.yaml_config import load_pipeline


def test_yaml_pipeline_runs(spark):
    cfg = {
        "name": "mini_chain",
        "stages": [
            {"stage": "add_id", "id_field": "rid", "key_field": "text"},
            {"stage": "modify", "modifier": "url_remover"},
            {"stage": "score", "rule": "word_count", "score_field": "wc"},
            {"stage": "filter", "rule": "word_count", "filter_field": "wc"},
            {"stage": "score_filter", "rule": "alpha_numeric"},
            {"stage": "pii_scrub"},
        ],
    }
    pipe = load_pipeline(cfg)
    texts = [
        ("clean " + "word " * 60).strip(),             # passes
        "short doc",                                    # fails word_count
        ("a@b.com " + "word " * 60).strip(),            # passes, scrubbed
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = pipe.run(df).toPandas()
    assert len(out) == 2
    assert {"rid", "wc", "text_scrubbed"} <= set(out.columns)
    assert any("<EMAIL>" in t for t in out["text_scrubbed"])


def test_yaml_pipeline_from_file(spark, tmp_path):
    import yaml

    path = tmp_path / "pipe.yaml"
    path.write_text(
        yaml.safe_dump(
            {
                "name": "f",
                "stages": [{"stage": "score_filter", "rule": "word_count"}],
            }
        )
    )
    pipe = load_pipeline(str(path))
    df = spark.createDataFrame(
        [("w " * 60,), ("short",)], "text string"
    )
    assert pipe.run(df).count() == 1


def test_shipped_english_config_matches_chain(spark):
    """configs/heuristic_filter_english_pipeline.yaml == chain.english_chain."""
    from pyspark.sql import functions as F

    from nemo_curator_spark import synth
    from nemo_curator_spark.pipeline import chain as chain_mod

    pipe = load_pipeline("configs/heuristic_filter_english_pipeline.yaml")
    pdf = synth.generate_web_pages(120, seed=55)[["url", "text"]]
    df = spark.createDataFrame(pdf)
    via_config = {r["url"] for r in pipe.run(df).select("url").collect()}
    via_chain = {
        r["url"]
        for r in chain_mod.english_chain(df, "text").select("url").collect()
    }
    assert via_config == via_chain


def test_deep_merge_and_defaults_loader(tmp_path):
    from nemo_curator_spark.pipeline.yaml_config import (
        deep_merge,
        load_config_with_defaults,
    )

    base = {"vad": {"threshold": 0.5, "pad": 0.2}, "mono": {"sr": 48000}}
    over = {"vad": {"threshold": 0.9}, "extra": 1}
    merged = deep_merge(base, over)
    assert merged == {
        "vad": {"threshold": 0.9, "pad": 0.2},
        "mono": {"sr": 48000},
        "extra": 1,
    }
    assert base["vad"]["threshold"] == 0.5  # inputs untouched

    d = tmp_path / "default.yaml"
    d.write_text("vad:\n  threshold: 0.5\n  pad: 0.2\n")
    u = tmp_path / "user.yaml"
    u.write_text("vad:\n  threshold: 0.9\n")
    cfg = load_config_with_defaults(str(d), str(u))
    assert cfg == {"vad": {"threshold": 0.9, "pad": 0.2}}
    assert load_config_with_defaults(str(d)) == {
        "vad": {"threshold": 0.5, "pad": 0.2}
    }
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        load_config_with_defaults(str(d), str(tmp_path / "missing.yaml"))

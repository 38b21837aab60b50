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

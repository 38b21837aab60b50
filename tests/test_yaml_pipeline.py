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


def test_new_stage_kinds(spark, tmp_path):
    """Round-6 stage kinds: python_comment_filter, tokenizer_fertility,
    fasttext_langid, fasttext_quality — the reference
    code_filter/fasttext_filter pipeline YAMLs resolve through them."""
    from nemo_curator_spark.operators import fasttext_mini as FT
    from nemo_curator_spark.pipeline.yaml_config import load_pipeline

    # python comment filter: all-comment file fails max ratio; plain
    # code with a docstring passes
    code_ok = '"""Doc."""\n' + "\n".join(f"x{i} = {i}" for i in range(20))
    code_bad = "# only comments\n# nothing else\n"
    df = spark.createDataFrame(
        [(code_ok,), (code_bad,)], "text string"
    )
    pipe = load_pipeline(
        {"stages": [{"stage": "python_comment_filter",
                     "min_comment_to_code_ratio": 0.001,
                     "max_comment_to_code_ratio": 0.85}]}
    )
    out = pipe.run(df).collect()
    assert len(out) == 1 and out[0].text == code_ok

    # fertility: normal english text passes min ratio 2; the
    # sentencepiece path is the documented plug point
    fert = load_pipeline(
        {"stages": [{"stage": "tokenizer_fertility",
                     "min_char_to_token_ratio": 2}]}
    )
    texts = [("the quick brown fox jumps over the lazy dog " * 4,)] * 3
    assert fert.run(spark.createDataFrame(texts, "text string")).count() == 3
    import pytest

    sp = load_pipeline(
        {"stages": [{"stage": "tokenizer_fertility",
                     "path_to_tokenizer": "/x/spm.model"}]}
    )
    with pytest.raises(NotImplementedError, match="sentencepiece"):
        sp.run(df).count()

    # fasttext langid + quality over a trained MiniFastText artifact
    model = FT.train(
        [("the quick brown fox and the lazy dog run home", "en")] * 20
        + [("le renard brun rapide et le chien paresseux", "fr")] * 20,
        dim=8,
        epochs=20,
        seed=1,
    )
    mp = str(tmp_path / "langid.minift.json")
    model.save(mp)
    lang_pipe = load_pipeline(
        {"stages": [{"stage": "fasttext_langid", "model_path": mp,
                     "min_langid_score": 0.3}]}
    )
    df2 = spark.createDataFrame(
        [("the quick brown fox and the lazy dog run home",)],
        "text string",
    )
    assert lang_pipe.run(df2).count() == 1

    qmodel = FT.train(
        [("excellent well written prose with substance", "hq")] * 20
        + [("spam spam click here buy now", "lq")] * 20,
        dim=8,
        epochs=20,
        seed=2,
    )
    qp = str(tmp_path / "quality.minift.json")
    qmodel.save(qp)
    q_pipe = load_pipeline(
        {"stages": [{"stage": "fasttext_quality", "model_path": qp,
                     "label": "__label__hq", "alpha": 3, "seed": 42}]}
    )
    # high-quality text passes far more often than spam; with the
    # deterministic per-row draw the planted examples are stable
    res = q_pipe.run(
        spark.createDataFrame(
            [("excellent well written prose with substance",)] * 5,
            "text string",
        )
    ).count()
    assert res >= 4


def test_load_workflow_from_reference_yaml(spark, tmp_path):
    from nemo_curator_spark.pipeline.yaml_config import load_workflow

    import yaml

    cfg = yaml.safe_load(open("configs/fuzzy_deduplication_pipeline.yaml"))
    # unresolved ??? placeholders are rejected
    import pytest

    with pytest.raises(ValueError, match="unset required"):
        load_workflow(cfg)
    cfg.update(
        input_path=str(tmp_path / "in"),
        output_path=str(tmp_path / "out"),
        cache_path=str(tmp_path / "cache"),
        input_filetype="parquet",
    )
    wf = load_workflow(cfg)
    assert wf.num_hashes == 260 and wf.char_ngrams == 24
    assert wf.input_path == str(tmp_path / "in")
    # end-to-end through the interpolated workflow
    spark.createDataFrame(
        [("same text repeated for the fuzzy workflow " * 3,)] * 2
        + [("another unrelated document body entirely " * 3,)],
        "text string",
    ).write.parquet(str(tmp_path / "in"))
    res = wf.run(spark)
    assert res.get_metadata("num_duplicates") == 1

    ecfg = yaml.safe_load(open("configs/exact_deduplication_pipeline.yaml"))
    ecfg.update(input_path=str(tmp_path / "in"),
                output_path=str(tmp_path / "eout"),
                input_filetype="parquet")
    ewf = load_workflow(ecfg)
    assert ewf.run(spark).get_metadata("num_duplicates") == 1
    scfg = yaml.safe_load(
        open("configs/semantic_deduplication_pipeline.yaml")
    )
    scfg.update(input_path="/x", output_path="/y", cache_path="/z")
    swf = load_workflow(scfg)
    assert swf.n_clusters == 100 and swf.eps == 0.01
    with pytest.raises(ValueError, match="unknown workflow class"):
        load_workflow({"workflow": [{"class": "Nope"}]})

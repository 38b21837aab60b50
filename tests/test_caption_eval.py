"""Summarize-then-Align caption eval (operators/caption_eval.py vs
reference eval/video/caption_clipscore.py).

Pins: the window-caption key walk, the source-video fallback chain, the
verbatim summarizer prompt contract, the task join, the cached-summaries
path with misses, the injectable live-summarizer seam, and the scoring
pipeline against driver-side numpy cosines.
"""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import caption_eval as CE
from nemo_curator_spark.operators import clip_mini as CM


# ---------------------------------------------------------------- locals


def test_window_captions_key_walk():
    # first key containing 'caption' with a non-empty string wins; later
    # caption keys in the same window are ignored; windows without one
    # contribute nothing (caption_clipscore.py:80-90)
    meta = {
        "windows": [
            {"qwen_caption": "  a dog runs  ", "other_caption": "ignored"},
            {"note": "no caption here"},
            {"caption_text": "", "enhanced_caption": "a red car"},
            {"summary": 3, "caption": "final scene"},
        ]
    }
    assert CE.window_captions(meta) == ["a dog runs", "a red car", "final scene"]
    assert CE.window_captions({}) == []


def test_source_video_fallbacks():
    assert CE.source_video({"source_video": "/a.mp4"}) == "/a.mp4"
    assert CE.source_video({"video_path": "/b.mp4"}) == "/b.mp4"
    assert CE.source_video({}) == "unknown"


def test_summarize_prompt_contract():
    msgs = CE.build_summarize_messages("cap text")
    assert [m["role"] for m in msgs] == ["system", "user"]
    assert msgs[0]["content"] == CE.SUMMARIZE_SYSTEM
    assert msgs[1]["content"] == "cap text"
    # the verbatim observable contract (caption_clipscore.py:64-70)
    assert CE.SUMMARIZE_SYSTEM.startswith(
        "You are a visual description extractor."
    )
    assert "under 80" in CE.SUMMARIZE_SYSTEM
    assert CE.SUMMARIZE_SAMPLING == {
        "temperature": 0.0,
        "max_tokens": 120,
        "stop": ["\n\n"],
    }


# ------------------------------------------------------------ spark forms


def test_collect_tasks_join(spark):
    df = spark.createDataFrame(
        [
            (1, "m", ["a b", "c"]),
            (2, "m", []),
        ],
        "uid long, label string, captions array<string>",
    )
    got = {r["uid"]: r["caption"] for r in CE.collect_tasks(df).collect()}
    assert got == {1: "a b c", 2: ""}


def test_apply_cached_summaries_misses(spark):
    tasks = spark.createDataFrame(
        [(1, "m", "cap1"), (2, "m", "cap2")],
        "uid long, label string, caption string",
    )
    cache = spark.createDataFrame(
        [(1, "m", "sum1")], "uid long, label string, summary string"
    )
    rows = {
        r["uid"]: (r["summary"], r["summary_missing"])
        for r in CE.apply_cached_summaries(tasks, cache).collect()
    }
    assert rows == {1: ("sum1", False), 2: ("", True)}


def test_summarize_with_injected_fake(spark):
    tasks = spark.createDataFrame(
        [(1, "m", "a dog"), (2, "m", "a cat")],
        "uid long, label string, caption string",
    )
    # observable through RETURN VALUES (pickled-client lesson): the fake
    # proves it received the chat-messages shape by echoing from it
    def fake(prompt_batches):
        assert all(
            m[0]["content"] == CE.SUMMARIZE_SYSTEM for m in prompt_batches
        )
        return ["  SUM:" + m[1]["content"] + "  " for m in prompt_batches]

    got = {
        r["uid"]: r["summary"]
        for r in CE.summarize_with(tasks, fake).collect()
    }
    assert got == {1: "SUM:a dog", 2: "SUM:a cat"}  # stripped like :183


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("clipse") / "clip.mini.json")
    CM.ensure_artifact(p)
    return p


def test_caption_clip_scores_pipeline(spark, clip_path):
    model = CM.load_cached(clip_path)
    summaries = spark.createDataFrame(
        [
            (1, "m", "a photo of a red square"),
            (2, "m", "a photo of a blue circle"),
        ],
        "uid long, label string, summary string",
    )
    vembs = []
    want = {}
    for uid, seed in [(1, 77), (2, 78)]:
        img, _ = CM.synth_image(seed)
        v = model.image_features(img)
        vembs.append((uid, [float(x) for x in v]))
    vdf = spark.createDataFrame(vembs, "uid long, video_embedding array<double>")
    got = {
        r["uid"]: r["clip_score"]
        for r in CE.caption_clip_scores(
            summaries, vdf, clip_path
        ).collect()
    }
    for uid, text in [(1, "a photo of a red square"), (2, "a photo of a blue circle")]:
        t = model.text_features(text)
        v = np.asarray(dict(vembs)[uid])
        cos = float((t / np.sqrt((t**2).sum())) @ (v / np.sqrt((v**2).sum())))
        assert got[uid] == pytest.approx(cos, abs=1e-12)


def test_per_label_stats_and_pivot(spark):
    scores = spark.createDataFrame(
        [(1, "a", 0.5), (1, "b", 0.25), (2, "a", 0.75), (2, "b", 0.25)],
        "uid long, label string, clip_score double",
    )
    stats = {
        r["label"]: (r["mean_score"], r["n"])
        for r in CE.per_label_stats(scores).collect()
    }
    assert stats == {"a": (0.625, 2), "b": (0.25, 2)}
    piv = {
        r["uid"]: (r["a"], r["b"])
        for r in CE.scores_pivot(scores, ["a", "b"]).collect()
    }
    assert piv == {1: (0.5, 0.25), 2: (0.75, 0.25)}

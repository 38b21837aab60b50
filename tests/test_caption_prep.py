"""Caption-preparation parity: Spark Column plan vs the python port of
the reference windowing/frame-grid math (windowing_utils.py:41-247,
caption_preparation.py:63-160)."""

from __future__ import annotations

import math

import pytest

from nemo_curator_spark.operators import caption_prep as CP


def test_compute_windows_reference_cases():
    # windowing_utils.compute_windows:41-76 branch coverage
    assert CP.compute_windows_py(0) == []
    assert CP.compute_windows_py(3) == []
    assert CP.compute_windows_py(4) == [(0, 3)]
    assert CP.compute_windows_py(256) == [(0, 255)]
    # full + remainder >= threshold -> its own window
    assert CP.compute_windows_py(256 + 128) == [(0, 255), (256, 383)]
    # full + small remainder -> extend last window
    assert CP.compute_windows_py(256 + 100) == [(0, 355)]
    # multiple full windows
    assert CP.compute_windows_py(512) == [(0, 255), (256, 511)]
    assert CP.compute_windows_py(512 + 1) == [(0, 255), (256, 512)]


def test_smart_nframes_bankers_midpoint():
    # total/video_fps*fps = 5.0 -> 5/2 = 2.5 -> banker's 2 -> nframes 4
    assert CP.smart_nframes_py(1.0, 5, 1.0) == 4
    # 7.0 -> 3.5 -> banker's 4 -> 8, but capped by total=7 -> max_frames 6
    assert CP.smart_nframes_py(1.0, 7, 1.0) == 6
    # plain case: 100 frames @25fps sampled at 2 -> 8
    assert CP.smart_nframes_py(2.0, 100, 25.0) == 8
    # min clamp
    assert CP.smart_nframes_py(0.1, 100, 25.0) == 4
    # max clamp at FPS_MAX_FRAMES
    assert CP.smart_nframes_py(30.0, 10000, 25.0) == 768
    # tiny totals clamp to the even floor of total (reference math:
    # max_frames = floor_by_factor(total, 2)), no raise at total=3
    assert CP.smart_nframes_py(1.0, 3, 1.0) == 2
    with pytest.raises(ValueError):
        CP.smart_nframes_py(1.0, 1, 1.0)  # max_frames 0 -> nframes 0 < 2


def test_window_frame_ids_endpoint_and_ties():
    assert CP.window_frame_ids_py(0, 9, 4) == [0, 3, 6, 9]
    # ties round half-to-even: linspace(0,3,4) exact ints
    assert CP.window_frame_ids_py(0, 3, 4) == [0, 1, 2, 3]
    # midpoint case: linspace(0, 2, 5) = 0,.5,1,1.5,2 -> 0,0,1,2,2
    assert CP.window_frame_ids_py(0, 2, 5) == [0, 0, 1, 2, 2]
    assert CP.window_frame_ids_py(7, 7, 1) == [7]


def test_get_prompt_contract():
    assert "Elaborate on the visual" in CP.get_prompt("default")
    assert CP.get_prompt("av", None) == CP.PROMPTS["av"]
    assert CP.get_prompt("anything", "custom") == "custom"
    with pytest.raises(ValueError):
        CP.get_prompt("nope")
    assert "<|im_start|>assistant" in CP.format_llm_prompt("x")


@pytest.mark.parametrize("w,t", [(256, 128), (20, 10), (16, 4), (50, 49)])
def test_caption_windows_spark_matches_py(spark, w, t):
    clips = [(i, n) for i, n in enumerate(range(0, 140))] + [
        (1000 + k, n)
        for k, n in enumerate([255, 256, 257, 300, 383, 384, 511, 512, 513, 767, 1000])
    ]
    df = spark.createDataFrame(clips, ["clip_id", "n_frames"])
    got = {
        (r.clip_id, r.win_idx): (r.w_start, r.w_end)
        for r in CP.caption_windows(
            df, window_size=w, remainder_threshold=t
        ).collect()
    }
    want = {}
    for cid, n in clips:
        for i, (s, e) in enumerate(CP.compute_windows_py(n, w, t)):
            want[(cid, i)] = (s, e)
    assert got == want


def test_caption_preparation_spark_matches_py(spark):
    clips = [
        (i, 30 + (i * 37) % 700, [24.0, 25.0, 30.0][i % 3])
        for i in range(60)
    ]
    df = spark.createDataFrame(clips, ["clip_id", "n_frames", "framerate"])
    out = CP.caption_preparation(
        df, window_size=64, remainder_threshold=32, sampling_fps=2.0,
        prompt_variant="av",
    ).collect()
    got = {}
    for r in out:
        got.setdefault((r.clip_id, r.win_idx), {"meta": None, "ids": {}})
        got[(r.clip_id, r.win_idx)]["meta"] = (r.w_start, r.w_end, r.nframes)
        got[(r.clip_id, r.win_idx)]["ids"][r.frame_pos] = r.frame_id
        assert r.llm_prompt == CP.format_llm_prompt(CP.get_prompt("av"))
    for cid, n, fr in clips:
        for win in CP.caption_windows_py(n, fr, 64, 32, 2.0):
            key = (cid, win["win_idx"])
            assert got[key]["meta"] == (
                win["w_start"], win["w_end"], win["nframes"]
            ), key
            ids = [got[key]["ids"][j] for j in range(win["nframes"])]
            assert ids == win["frame_ids"], key
    n_windows = sum(
        len(CP.caption_windows_py(n, fr, 64, 32, 2.0)) for _, n, fr in clips
    )
    assert len(got) == n_windows


def test_window_frame_ids_match_float64_linspace():
    import numpy as np

    for s, e, nf in [(0, 255, 8), (256, 383, 8), (0, 99, 10), (128, 140, 4)]:
        v = np.linspace(s, e, nf)
        want = [int(x) for x in np.rint(v)]  # numpy rint = half-to-even
        assert CP.window_frame_ids_py(s, e, nf) == want


def test_enhance_prompt_contract():
    assert "enhances video caption inputs" in CP.get_enhance_prompt("default")
    assert CP.get_enhance_prompt("x", "mine") == "mine"
    with pytest.raises(ValueError):
        CP.get_enhance_prompt("av")  # av has no enhancement variant


def test_caption_enhancement_stage(spark):
    df = spark.createDataFrame(
        [(1, "a cat"), (2, None), (3, "a dog")],
        "clip_id long, caption string",
    )
    with pytest.raises(NotImplementedError, match="llm_client"):
        CP.caption_enhancement(df)

    class EchoClient:
        def generate_batch(self, messages):
            # messages are (system_prompt, user_caption) pairs
            return [f"ENH[{sys_p.strip()[:11]}]:{cap}" for sys_p, cap in messages]

    out = (
        CP.caption_enhancement(df, llm_client=EchoClient())
        .orderBy("clip_id")
        .toPandas()
    )
    # NULL-caption rows are skipped like the reference's model batch
    assert out.clip_id.tolist() == [1, 3]
    assert out.enhanced_caption.tolist() == [
        "ENH[You are a c]:a cat",
        "ENH[You are a c]:a dog",
    ]

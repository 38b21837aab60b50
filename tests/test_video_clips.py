"""FixedStrideExtractorStage arithmetic (reference video/clipping/
clip_extraction_stages.py:437-503) as pure Spark SQL."""

from __future__ import annotations

import pytest

from nemo_curator_spark.operators import video as V


def _py_reference(num_frames, framerate, clip_len, stride, min_len):
    """Direct port of the reference loop (float accumulation)."""
    if framerate <= 0:
        return []
    duration = num_frames / framerate
    out = []
    start = 0.0
    k = 0
    while start < duration:
        end = min(start + clip_len, duration)
        if end - start >= min_len:
            out.append(
                (k, start, end, int(start * framerate), int(end * framerate))
            )
        start += stride
        k += 1
    return out


def test_fixed_stride_matches_reference_loop(spark):
    rows = [
        (1, 240, 24.0),   # 10 s
        (2, 101, 25.0),   # 4.04 s
        (3, 10, 30.0),    # 0.333 s -> single span below min length
        (4, 0, 24.0),     # zero frames -> nothing
        (5, 500, 0.0),    # bad framerate -> skipped
    ]
    df = spark.createDataFrame(rows, "video_id long, num_frames int, framerate double")
    got = (
        V.fixed_stride_clips(df, clip_len_s=4.0, clip_stride_s=2.5, min_clip_length_s=1.0)
        .toPandas()
        .sort_values(["video_id", "clip_idx"])
    )
    for vid, nf, fr in rows:
        want = _py_reference(nf, fr, 4.0, 2.5, 1.0)
        sub = got[got["video_id"] == vid]
        assert len(sub) == len(want), (vid, len(sub), want)
        for (_, r), (k, s, e, sf_, ef) in zip(sub.iterrows(), want):
            assert r["clip_idx"] == k
            assert r["start_s"] == s and r["end_s"] == e
            assert r["start_frame"] == sf_ and r["end_frame"] == ef


def test_limit_clips(spark):
    df = spark.createDataFrame([(1, 2400, 24.0)], "video_id long, num_frames int, framerate double")
    out = V.fixed_stride_clips(df, 4.0, 2.5, 1.0, limit_clips=3)
    assert out.count() == 3
    assert [r["clip_idx"] for r in out.orderBy("clip_idx").collect()] == [0, 1, 2]


# --- TransNetV2 scene extraction (model-free half) --------------------------


def test_get_scenes_py_reference_quirks():
    from nemo_curator_spark.operators import video as V

    # mid scenes end AT the transition; trailing scene ends at last INDEX
    assert V.get_scenes_py([0, 0, 1, 0, 0]) == [(0, 2), (3, 4)]
    # transition at position 0 is ignored (i != 0 guard)
    assert V.get_scenes_py([1, 0, 1]) == [(1, 2)]
    # ends-with-transition: no trailing scene
    assert V.get_scenes_py([0, 1]) == [(0, 1)]
    # no transitions: whole video (length, not last index)
    assert V.get_scenes_py([0, 0, 0]) == [(0, 3)]
    assert V.get_scenes_py([0, 0, 0], entire_scene_as_clip=False) == []
    # all-ones: no scenes even with the fallback (scenes empty, t==1)
    assert V.get_scenes_py([1, 1]) == [(0, 2)]  # no end recorded -> fallback
    # zero-length trailing scene when the last frame starts a run
    assert V.get_scenes_py([0, 1, 0]) == [(0, 1), (2, 2)]


def test_filter_scenes_py_matches_reference_semantics():
    from nemo_curator_spark.operators import video as V

    scenes = [(0, 25), (30, 33)]
    # truncate
    assert V.filter_scenes_py(scenes, max_length=10) == [(0, 10), (30, 33)]
    # stride drops ONLY the final short span
    assert V.filter_scenes_py(scenes, min_length=4, max_length=10,
                              max_length_mode="stride") == [
        (0, 10), (10, 20), (30, 33)  # (20,25) kept (5>=4); (30,33) short but
    ][:2] + [(20, 25)]  # order: spans of scene 1 then scene 2 (3<4 dropped)
    # crop then min
    assert V.filter_scenes_py([(0, 10)], min_length=5, crop_length=2) == [(2, 8)]
    assert V.filter_scenes_py([(0, 4)], crop_length=2) == []


def test_scene_boundaries_spark_equals_python_port(spark):
    import random

    from nemo_curator_spark.operators import video as V

    rng = random.Random(1234)
    rows, expected = [], set()
    for vid in range(40):
        n = rng.randint(1, 30)
        preds = [rng.randint(0, 1) for _ in range(n)]
        for f, t in enumerate(preds):
            rows.append((vid, f, t))
        for s, e in V.get_scenes_py(preds):
            expected.add((vid, s, e))
    df = spark.createDataFrame(
        rows, "video_id long, frame int, is_transition int"
    ).repartition(7)
    got = {
        (r["video_id"], r["scene_start"], r["scene_end"])
        for r in V.scene_boundaries(df).collect()
    }
    assert got == expected


def test_filter_scenes_spark_equals_python_port(spark):
    import random

    from nemo_curator_spark.operators import video as V

    rng = random.Random(99)
    scenes = []
    for vid in range(30):
        for _ in range(rng.randint(1, 4)):
            s = rng.randint(0, 50)
            scenes.append((vid, s, s + rng.randint(0, 40)))
    df = spark.createDataFrame(
        scenes, "video_id long, scene_start int, scene_end int"
    )
    for kw in (
        dict(max_length=12),
        dict(min_length=4, max_length=12, max_length_mode="stride"),
        dict(min_length=5, max_length=15, max_length_mode="stride", crop_length=2),
        dict(min_length=3, crop_length=1),
    ):
        got = sorted(
            (r["video_id"], r["scene_start"], r["scene_end"])
            for r in V.filter_scenes(df, **kw).collect()
        )
        exp = []
        for vid in range(30):
            vid_scenes = [(s, e) for v, s, e in scenes if v == vid]
            exp.extend(
                (vid, s, e) for s, e in V.filter_scenes_py(vid_scenes, **kw)
            )
        assert got == sorted(exp), kw


# --- ClipFrameExtraction decode plan (model-free half) ----------------------


def test_middle_frame_index_reference_rule():
    from nemo_curator_spark.operators import video as V

    assert V.middle_frame_index(1) == 0
    assert V.middle_frame_index(2) == 0  # even -> lower middle
    assert V.middle_frame_index(3) == 1
    assert V.middle_frame_index(10) == 4
    assert V.middle_frame_index(11) == 5


def _closest_ref(src, dst):
    # independent transcription of decoder_utils.find_closest_indices
    import numpy as np

    right = np.clip(np.searchsorted(src, dst), 1, len(src) - 1)
    closest = right - 1
    right_closer = np.abs(dst - src[right]) < np.abs(dst - src[closest])
    closest[right_closer] = right[right_closer]
    return closest


def test_sample_closest_matches_reference_transcription():
    import numpy as np

    from nemo_curator_spark.operators import video as V

    rng = np.random.RandomState(7)
    for _ in range(200):
        n = rng.randint(2, 200)
        src = np.sort(rng.uniform(0, 30, size=n)).astype(np.float32)
        rate = float(rng.choice([0.5, 1, 2, 3, 6.5]))
        for endpoint in (True, False):
            ids, counts = V.sample_closest_py(src, rate, endpoint=endpoint)
            # reference formula, transcribed independently
            interval = 1.0 / rate
            stop = src[-1] + (interval * 0.5 if endpoint else 0)
            samples = np.arange(src[0], stop, interval, dtype=np.float32)
            exp = _closest_ref(src, samples)
            if not endpoint and np.isclose(samples[-1], stop):
                exp = exp[:-1]
            exp_ids, exp_counts = np.unique(exp, return_counts=True)
            assert np.array_equal(ids, exp_ids)
            assert np.array_equal(counts, exp_counts)


def test_frame_sample_plan_lcm_semantics():
    from nemo_curator_spark.operators import video as V

    plan = V.frame_sample_plan_py(48, 24.0, [2, 6])
    # lcm(2,6)=6: the 6-fps ids are every 4th frame incl. clamped tail;
    # the 2-fps ids are every 3rd of THAT list (reference stride rule)
    assert plan[6] == plan[6]  # present
    assert plan[2] == plan[6][::3]
    # non-integer fps disables the LCM path (per-fps sampling)
    plan2 = V.frame_sample_plan_py(48, 24.0, [1.5, 6])
    assert set(plan2) == {1.5, 6}
    # middle policy: one frame for every fps
    planm = V.frame_sample_plan_py(10, 24.0, [2, 6], policy="middle")
    assert planm == {2: [4], 6: [4]}


def test_clip_frame_sample_plan_spark_equals_python(spark):
    from nemo_curator_spark.operators import video as V

    rows = [(i, 30 + i % 90, 24.0 if i % 2 == 0 else 30.0) for i in range(40)]
    df = spark.createDataFrame(
        rows, "clip_id long, num_frames int, framerate double"
    ).repartition(5)
    got = sorted(
        (r["clip_id"], r["target_fps"], r["frame_idx"])
        for r in V.clip_frame_sample_plan(df, [2, 6]).collect()
    )
    exp = []
    for cid, n, fr in rows:
        for fps, ids in V.frame_sample_plan_py(n, fr, [2, 6]).items():
            exp.extend((cid, float(fps), i) for i in ids)
    assert got == sorted(exp)


def test_frame_plan_single_frame_clip_never_negative():
    # reference closest-index arithmetic degenerates to -1 on 1-frame
    # clips; the plan must request frame 0 instead (documented deviation)
    from nemo_curator_spark.operators import video as V

    assert V.frame_sample_plan_py(1, 24.0, [2, 6]) == {2: [0], 6: [0]}
    assert V.frame_sample_plan_py(1, 24.0, [1.5]) == {1.5: [0]}

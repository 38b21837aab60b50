"""OCR dense-QA pins — the reference's own test suite
(tests/stages/synthetic/omni/test_ocr_dense_qa.py) ported to the dict
conversation shape, plus Spark partitioning invariance."""

from __future__ import annotations

import random
from collections import Counter

from nemo_curator_spark.operators import ocr_qa as Q


def _rng(seed: int = 0) -> random.Random:
    return random.Random(seed)


def _word(bbox, text, *, valid=True) -> Q.OCRDenseItem:
    return Q.OCRDenseItem(bbox_2d=bbox, text_content=text, valid=valid)


def test_invalid_or_malformed_bboxes_are_skipped():
    words = [
        _word([0, 0, 10, 10], "KEEP"),
        _word([10, 10, 20, 20], "INVALID", valid=False),
        _word([30, 30, 40, 40], "   "),  # blank text
        Q.OCRDenseItem(bbox_2d=[0, 0], text_content="BAD_SHAPE"),  # 2-coord
    ]
    qa, _ = Q.build_qa_tagged(words, task_id="t0")
    for _, q, a in qa:
        assert a == "KEEP" or "KEEP" in q


def test_same_task_id_yields_identical_output():
    words = [_word([i * 100, 0, (i + 1) * 100, 50], f"W{i}") for i in range(5)]
    a, _ = Q.build_qa_tagged(words, task_id="seed-42")
    b, _ = Q.build_qa_tagged(words, task_id="seed-42")
    assert a == b


def test_all_four_qa_types_can_be_generated():
    words = [_word([i * 10, 0, i * 10 + 5, 10], f"W{i}") for i in range(40)]
    qa, _ = Q.build_qa_tagged(words, task_id="diverse")
    assert {kind for kind, _, _ in qa} == {
        Q.QA_TYPE_BBOX_TO_TEXT,
        Q.QA_TYPE_POINT_TO_TEXT,
        Q.QA_TYPE_TEXT_TO_BBOX,
        Q.QA_TYPE_TEXT_TO_POINT,
    }


def test_text_to_bbox_disabled_when_many_invalid():
    words = [
        _word([i, 0, i + 5, 10], f"BAD{i}", valid=False) for i in range(5)
    ] + [_word([100 + i * 10, 0, 105 + i * 10, 10], f"OK{i}") for i in range(5)]
    qa, _ = Q.build_qa_tagged(words, task_id="gated")
    types = {kind for kind, _, _ in qa}
    assert Q.QA_TYPE_TEXT_TO_BBOX not in types
    assert Q.QA_TYPE_TEXT_TO_POINT not in types
    assert types.issubset({Q.QA_TYPE_BBOX_TO_TEXT, Q.QA_TYPE_POINT_TO_TEXT})


def test_multi_instance_text_uses_multi_qa():
    words = [_word([i * 100, 0, i * 100 + 50, 50], "DUP") for i in range(3)]
    for seed in range(50):
        qa, _ = Q.build_qa_tagged(words, task_id=f"multi-{seed}")
        for kind, q, a in qa:
            if kind in (Q.QA_TYPE_TEXT_TO_BBOX, Q.QA_TYPE_TEXT_TO_POINT):
                assert "DUP" in q
                count_indicators = (
                    a.count("[") + a.count("(") + a.count("\n") + a.count(",")
                )
                assert count_indicators >= 3, a
                return
    raise AssertionError("no located-text QA fired across 50 seeds")


def test_empty_qa_list_returns_none():
    assert Q.build_conversation([], _rng(), "img.jpg") is None


def test_conversation_prepends_image_and_alternates_roles():
    qa = [
        (Q.QA_TYPE_BBOX_TO_TEXT, "Q1", "A1"),
        (Q.QA_TYPE_BBOX_TO_TEXT, "Q2", "A2"),
    ]
    conv = Q.build_conversation(qa, _rng(), "img.jpg")["conversation"]
    assert [m["sender"] for m in conv] == [
        "user", "assistant", "user", "assistant",
    ]
    first = conv[0]["fragments"]
    assert any(
        isinstance(f, dict) and f.get("value") == "img.jpg" for f in first
    )


def test_balanced_sampling_at_max_pairs():
    types = [
        Q.QA_TYPE_BBOX_TO_TEXT,
        Q.QA_TYPE_POINT_TO_TEXT,
        Q.QA_TYPE_TEXT_TO_BBOX,
        Q.QA_TYPE_TEXT_TO_POINT,
    ]
    qa = [(t, f"{t}|Q{i}", f"A{i}") for t in types for i in range(50)]
    conv = Q.build_conversation(qa, _rng(seed=7), "img.jpg")["conversation"]
    assert len(conv) == Q.MAX_QA_PAIRS * 2
    # re-derive the type from the question prefix: the balanced sampler
    # must keep exactly 25 of each of the four 50-deep buckets
    kept = Counter(
        m["fragments"][-1].split("|")[0]
        for m in conv
        if m["sender"] == "user"
    )
    assert all(v == 25 for v in kept.values()), kept


def test_dense_conversation_is_single_qa_turn_with_image():
    words = [_word([0, 0, 10, 10], "HELLO"), _word([20, 20, 30, 30], "WORLD")]
    conv = Q.build_dense_conversation(words, _rng(), "img.jpg")["conversation"]
    assert len(conv) == 2
    assert any(
        isinstance(f, dict) and f.get("value") == "img.jpg"
        for f in conv[0]["fragments"]
    )
    answer = conv[1]["fragments"][0]
    assert "HELLO" in answer and "WORLD" in answer


def test_dense_conversation_picks_varied_formats_across_seeds():
    words = [_word([0, 0, 10, 10], "HELLO"), _word([20, 20, 30, 30], "WORLD")]
    answers = Counter()
    for seed in range(30):
        conv = Q.build_dense_conversation(words, _rng(seed), "img.jpg")
        answers[conv["conversation"][1]["fragments"][0]] += 1
    assert len(answers) >= 3


def test_spark_form_partitioning_invariant(spark):
    rows = []
    for i in range(20):
        items = [
            {"bbox_2d": [j * 10, 0, j * 10 + 8, 12], "text_content": f"w{i}_{j}",
             "valid": True}
            for j in range(6)
        ]
        rows.append((f"img_{i}", items))
    df = spark.createDataFrame(
        rows,
        "image_id string, items array<struct<bbox_2d: array<int>, "
        "text_content: string, valid: boolean>>",
    )
    a = (
        Q.ocr_qa_conversations(df.repartition(1))
        .orderBy("image_id").toPandas()
    )
    b = (
        Q.ocr_qa_conversations(df.repartition(7, "image_id"))
        .orderBy("image_id").toPandas()
    )
    assert a.conversation.tolist() == b.conversation.tolist()
    assert (a.n_pairs > 0).all()
    # matches the driver-side python path exactly
    words = [
        Q.OCRDenseItem([j * 10, 0, j * 10 + 8, 12], f"w0_{j}")
        for j in range(6)
    ]
    tagged, rng = Q.build_qa_tagged(words, "img_0")
    import json

    want = Q.build_conversation(tagged, rng, "img_0")
    got = json.loads(a.set_index("image_id").loc["img_0", "conversation"])
    assert got == want


# --- scoring-QA response handling (ocr_scoring_qa.py:86-299) ----------------

import json


def _entry(n=3):
    from nemo_curator_spark.operators.ocr_qa import OCRDenseItem

    return {
        "image_path": "/imgs/pic.jpg",
        "ocr_dense": [
            OCRDenseItem(bbox_2d=[i * 10, 0, i * 10 + 8, 40],
                         text_content=f"word{i}")
            for i in range(n)
        ],
    }


def test_parse_json_object_fences_and_noise():
    from nemo_curator_spark.operators import ocr_qa as Q

    assert Q.parse_json_object('```json\n{"a": 1}\n```') == {"a": 1}
    assert Q.parse_json_object('noise {"ocr_mode": "word"} trailing') == {
        "ocr_mode": "word"
    }
    assert Q.parse_json_object("[1, 2]") is None  # object, not array
    assert Q.parse_json_object("not json") is None


def test_scoring_response_invalid_paths():
    from nemo_curator_spark.operators import ocr_qa as Q

    st = Q.OCRScoringQAStage()
    e = st.handle_response(_entry(), "", "t0")
    assert e["is_valid"] is False and "empty response" in e["error"]
    e = st.handle_response(_entry(), "garbage", "t0")
    assert e["is_valid"] is False and "could not parse JSON" in e["error"]
    # no bbox passes the gate -> image invalid with the exact message
    resp = json.dumps(
        {"ocr_mode": "word",
         "text": [{"idx": 0, "bbox_match": 0, "text_errors": 5}],
         "missing_text": []}
    )
    e = st.handle_response(_entry(1), resp, "t0")
    assert e["is_valid"] is False
    assert "no bboxes passed quality threshold" in e["error"]
    # fail_on_missing_text
    resp2 = json.dumps(
        {"ocr_mode": "word",
         "text": [{"idx": 0, "bbox_match": 10, "text_errors": 0}],
         "missing_text": [{"text": "x", "bbox_2d": [0, 0, 1, 1]}]}
    )
    st2 = Q.OCRScoringQAStage(fail_on_missing_text=True)
    e = st2.handle_response(_entry(1), resp2, "t0")
    assert e["is_valid"] is False and "missing text region" in e["error"]


def test_scoring_response_score_application_and_routing():
    from nemo_curator_spark.operators import ocr_qa as Q

    resp = json.dumps(
        {
            "ocr_mode": "line",
            "text": [
                {"idx": 0, "bbox_match": 10, "text_errors": 0},
                {"idx": 1, "bbox_match": 4, "text_errors": 0},   # below min
                {"idx": 2, "bbox_match": "bad", "text_errors": 0},  # non-int
            ],
            "missing_text": [],
        }
    )
    st = Q.OCRScoringQAStage(dense_dump_prob=0.0)
    e = st.handle_response(_entry(3), resp, "task-7")
    assert e.get("is_valid") is not False
    assert e["ocr_is_word_level"] is False  # line mode
    words = e["ocr_dense"]
    assert words[0].valid and not words[1].valid and not words[2].valid
    # multi-turn QA conversation produced, image media in the first turn
    conv = e["conversation"]["conversation"]
    assert conv[0]["sender"] == "user"
    assert conv[0]["fragments"][0] == {"type": "image", "value": "pic.jpg"}
    # missing idx invalidates a bbox (idx 1 absent from scores)
    resp_partial = json.dumps(
        {"ocr_mode": "word",
         "text": [{"idx": 0, "bbox_match": 10, "text_errors": 0}],
         "missing_text": []}
    )
    e2 = st.handle_response(_entry(2), resp_partial, "task-7")
    assert e2["ocr_dense"][0].valid and not e2["ocr_dense"][1].valid
    # dense dump fires only when complete AND the seeded draw hits
    st3 = Q.OCRScoringQAStage(dense_dump_prob=1.0)
    e3 = st3.handle_response(_entry(2), resp_partial, "task-7")
    conv3 = e3["conversation"]["conversation"]
    assert len(conv3) == 2  # single-turn dense dump
    # incomplete OCR (missing_text) never dense-dumps even at prob 1
    resp_missing = json.dumps(
        {"ocr_mode": "word",
         "text": [{"idx": 0, "bbox_match": 10, "text_errors": 0},
                  {"idx": 1, "bbox_match": 10, "text_errors": 0}],
         "missing_text": [{"text": "y", "bbox_2d": [0, 0, 1, 1]}]}
    )
    e4 = st3.handle_response(_entry(2), resp_missing, "task-7")
    assert len(e4["conversation"]["conversation"]) >= 2
    assert e4["ocr_scoring_missing"]


def test_to_ocr_dense_item_v2():
    """ocr_nemotron_v2.py:39-53: 0-1000 int coords, inverted y naming
    normalized via min/max, text str-coerced."""
    from nemo_curator_spark.operators.ocr_qa import to_ocr_dense_item

    out = to_ocr_dense_item(
        {"left": 0.123, "right": 0.987, "upper": 0.75, "lower": 0.25, "text": "word"}
    )
    assert out == {"bbox_2d": [123, 250, 987, 750], "text_content": "word"}
    # already-ordered y stays ordered; non-str text coerced
    out2 = to_ocr_dense_item(
        {"left": 0.0, "right": 1.0, "upper": 0.1, "lower": 0.9, "text": 7}
    )
    assert out2["bbox_2d"] == [0, 100, 1000, 900] or out2["bbox_2d"] == [0, 100, 1000, 900]
    assert out2["bbox_2d"][1] <= out2["bbox_2d"][3]
    assert out2["text_content"] == "7"

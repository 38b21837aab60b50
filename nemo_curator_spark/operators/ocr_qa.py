"""OCR dense-QA conversationalization — the deterministic half of the
omni OCR SDG pipeline (reference stages/synthetic/omni/ocr_dense_qa.py
+ the prompt/format tables in ocr_conversationalize.py:31-165).

The reference pipeline runs a VLM OCR stage (NemotronOCR-v2 — the model
plug point, absent here), then deterministically converts the resulting
(word, bbox) items into multi-turn grounding QA conversations:
bbox→text, point→text, text→bbox(es), text→point(s), plus a dense-dump
turn, with a type-balanced sampler and seeded-RNG template selection.
Everything after the OCR model is pure ``random.Random(task_id)`` logic
and is rebuilt here:

* the question/format/sort template TABLES are verbatim (the template
  text is the stage's observable contract, same rationale as the
  nemotron-cc prompts in operators/synthetic.py) and keep the exact
  list order/length of the reference;
* the generation logic consumes the RNG in the same call order as the
  reference (ocr_dense_qa.py:389-505), so identical (items, task_id)
  give identical conversations seed-for-seed;
* per-task seeding (``random.Random(task_id)``) makes the whole stage
  partitioning-invariant — the Spark form is ONE Arrow pass over image
  rows (no shuffle, embarrassingly parallel), each row keyed by its own
  image id.

No SQL oracle: Mersenne-Twister template selection is not
SQL-expressible (the synthetic-scaffold precedent); parity is pinned by
the reference's own test suite ported in tests/test_ocr_qa.py.
"""

from __future__ import annotations

import json
import math
import random
from collections import defaultdict
from dataclasses import dataclass

import pandas as pd  # module-global: pandas_udf hint resolution needs it

MAX_QA_PAIRS = 100  # ocr_dense_qa.py:50
_UPPERCASE_RAW_PROB = 0.5
_MAX_INVALIDS_FOR_TEXT_TO_BBOX = 5
_BBOX_COORD_COUNT = 4

QA_TYPE_BBOX_TO_TEXT = "bbox_to_text"
QA_TYPE_POINT_TO_TEXT = "point_to_text"
QA_TYPE_TEXT_TO_BBOX = "text_to_bbox"
QA_TYPE_TEXT_TO_POINT = "text_to_point"
QA_TYPE_DENSE_DUMP = "dense_dump"


@dataclass
class OCRDenseItem:
    """tasks/ocr.py:30-43 subset: one OCR word with its 0-1000 bbox."""

    bbox_2d: list
    text_content: str
    valid: bool = True


# ---------------------------------------------------------------------------
# geometry + escaping (ocr_dense_qa.py:111-154)


def _fmt_box(b) -> str:
    return f"[{b[0]}, {b[1]}, {b[2]}, {b[3]}]"


def _bbox_center(b) -> tuple:
    return ((int(b[0]) + int(b[2])) // 2, (int(b[1]) + int(b[3])) // 2)


def _cx(b) -> float:
    return (b[0] + b[2]) / 2


def _cy(b) -> float:
    return (b[1] + b[3]) / 2


def _bbox_dist_center(b) -> float:
    return math.sqrt((_cx(b) - 500) ** 2 + (_cy(b) - 500) ** 2)


def _point_dist_center(p) -> float:
    return math.sqrt((p[0] - 500) ** 2 + (p[1] - 500) ** 2)


def escape_text_for_prompt(text: str, rng: random.Random) -> str:
    """ocr_dense_qa.py:144-154: quote for prompt insertion; all-caps text
    sometimes stays raw; quote style adapts to embedded quotes."""
    if (
        text.isupper()
        and any(c.isalpha() for c in text)
        and rng.random() < _UPPERCASE_RAW_PROB
    ):
        return text
    if '"' in text:
        return "'" + text.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if "'" in text:
        return '"' + text.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if rng.choice([True, False]):
        return "'" + text.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return '"' + text.replace("\\", "\\\\").replace('"', '\\"') + '"'


# ---------------------------------------------------------------------------
# template tables — verbatim, same order/length as the reference
# (ocr_dense_qa.py:165-378; ocr_conversationalize.py:31-165)

BBOX_TO_TEXT_TEMPLATES = [
    "What text is in the bounding box {}?",
    "Read the text at bounding box {}.",
    "What does the text say in the region {}?",
    "Give me the text content inside the box {}.",
    "What is the text at coordinates {}?",
    "Write out the text in the region {}.",
    "Look at the bounding box {}. What does it say?",
    "Extract the text from the area {}.",
    "What word or text is located at {}?",
    "Describe the text content in the box {}.",
]

BBOX_FORMAT_TEMPLATES = [
    lambda b: ("Answer with the bounding box as [x1, y1, x2, y2].", _fmt_box(b)),
    lambda b: ("Give the bounding box coordinates as [x_min, y_min, x_max, y_max].", _fmt_box(b)),
    lambda b: ("Provide the box as [x0, y0, x1, y1].", _fmt_box(b)),
    lambda b: ("Just write down the box coordinates.", f"{b[0]}, {b[1]}, {b[2]}, {b[3]}"),
    lambda b: ("Reply with coordinates x1, y1, x2, y2.", f"{b[0]}, {b[1]}, {b[2]}, {b[3]}"),
    lambda b: ("Give me the bounding box coordinates as [x0, y0, x1, y1].", _fmt_box(b)),
    lambda b: (
        "Would be great to get the bounding box as json {x0, y0, x1, y1}.",
        f'{{"x0": {b[0]}, "y0": {b[1]}, "x1": {b[2]}, "y1": {b[3]}}}',
    ),
    lambda b: (
        "Format the box as a dictionary with keys x0, y0, x1, y1.",
        f'{{"x0": {b[0]}, "y0": {b[1]}, "x1": {b[2]}, "y1": {b[3]}}}',
    ),
    lambda b: ("Give the bounding box as x_min, y_min, x_max, y_max.", f"{b[0]}, {b[1]}, {b[2]}, {b[3]}"),
    lambda b: ("Provide the box as [x_min, y_min, x_max, y_max].", _fmt_box(b)),
    lambda b: (
        "Answer with a dictionary with keys x_min, y_min, x_max, y_max.",
        f'{{"x_min": {b[0]}, "y_min": {b[1]}, "x_max": {b[2]}, "y_max": {b[3]}}}',
    ),
    lambda b: (
        "Format the box as json {x_min, y_min, x_max, y_max}.",
        f'{{"x_min": {b[0]}, "y_min": {b[1]}, "x_max": {b[2]}, "y_max": {b[3]}}}',
    ),
    lambda b: (
        "Wrap the bounding box in <box></box> tags as [x1, y1, x2, y2].",
        f"<box>{_fmt_box(b)}</box>",
    ),
    lambda b: (
        "Reply with a JSON object with key bbox_2d (list [x1, y1, x2, y2]).",
        json.dumps({"bbox_2d": list(b)}),
    ),
]

TEXT_TO_POINT_BASES = [
    "Point at the text {}.",
    "Indicate the center of the text {}.",
    "Where is the center of {}? Give the point.",
    "Click on the text {}. What are the coordinates of that point?",
    "Point to where the text {} is located.",
]

TEXT_TO_POINT_MULTI_BASES = [
    "Point at every occurrence of the text {}.",
    "Indicate the center of each instance of {} in the image.",
    "Where are all the centers of {}? List each point.",
    "Give the center point for every place where {} appears.",
    "Click on each occurrence of {}. What are the coordinates of those points?",
    "List the center coordinates for each time {} appears in the image.",
]

POINT_FORMAT_TEMPLATES = [
    lambda c: ("Give the point as x, y.", f"{c[0]}, {c[1]}"),
    lambda c: ("Answer with the center as [x, y].", f"[{c[0]}, {c[1]}]"),
    lambda c: ("Provide the point coordinates as [x, y].", f"[{c[0]}, {c[1]}]"),
    lambda c: ("Reply with the center point x, y.", f"{c[0]}, {c[1]}"),
    lambda c: ("Give the point as a dict with keys x and y.", f'{{"x": {c[0]}, "y": {c[1]}}}'),
    lambda c: ("Wrap the point in <point></point> tags as (x, y).", f"<point>({c[0]}, {c[1]})</point>"),
    lambda c: ("Reply with a JSON object with key point_2d (list [x, y]).", json.dumps({"point_2d": [c[0], c[1]]})),
]

POINT_LIST_FORMAT_TEMPLATES = [
    lambda pts: ("Give each point as x, y, one per line.", "\n".join(f"{x}, {y}" for x, y in pts)),
    lambda pts: ("Provide each center as [x, y], comma-separated.", ", ".join(f"[{x}, {y}]" for x, y in pts)),
    lambda pts: ("List each point as [x, y] on its own line.", "\n".join(f"[{x}, {y}]" for x, y in pts)),
    lambda pts: (
        'Reply with each point as x, y separated by the word "and".',
        " and ".join(f"{x}, {y}" for x, y in pts),
    ),
    lambda pts: (
        "Wrap all points in <point></point> as a nested list of (x, y).",
        "<point>[" + ", ".join(f"({x}, {y})" for x, y in pts) + "]</point>",
    ),
    lambda pts: (
        "Output a JSON list of objects, each with key point_2d (list [x, y]).",
        json.dumps([{"point_2d": [x, y]} for x, y in pts]),
    ),
]

POINT_TO_WORD_QUESTION_TEMPLATES = [
    "Which word is at the point {}?",
    "What word is at the coordinates {}?",
    "What does the image say at point {}?",
    "Identify the word at location {}.",
    "What word is located at {}?",
    "Read the word at the point {}.",
    "Which word appears at coordinates {}?",
    "What is the word at {}?",
    "Tell me the text at point {}. Just give the single word.",
    "What character or word is at {}?",
]

POINT_IN_QUESTION_FORMATS = [
    lambda c: f"{c[0]}, {c[1]}",
    lambda c: f"[{c[0]}, {c[1]}]",
    lambda c: f"({c[0]}, {c[1]})",
    lambda c: f"{c[0]} {c[1]}",
    lambda c: f'{{"x": {c[0]}, "y": {c[1]}}}',
]

TEXT_TO_BBOX_SINGLE_BASES = [
    "Where does the text {} appear?",
    "Locate the text {} in the image.",
    "Find the bounding box that contains the text {}.",
    "Where is the text {} in the image?",
    "Give the location of text {}.",
]

TEXT_TO_BBOX_MULTI_BASES = [
    "List all bounding boxes that contain the text {}.",
    "For the text {}, give every bounding box for it.",
    "Where does {} appear? List all locations as bounding boxes.",
    "Find every occurrence of {} and give each bounding box.",
]

LIST_FORMAT_TEMPLATES = [
    lambda boxes: ("Give each bounding box as [x1, y1, x2, y2], one per line.", "\n".join(_fmt_box(b) for b in boxes)),
    lambda boxes: ("Provide each box as [x1, y1, x2, y2], comma-separated.", ", ".join(_fmt_box(b) for b in boxes)),
    lambda boxes: (
        'List each bounding box as [x1, y1, x2, y2] separated by "and".',
        " and ".join(_fmt_box(b) for b in boxes),
    ),
    lambda boxes: ("Output a JSON array of arrays, each [x0, y0, x1, y1].", json.dumps([list(b) for b in boxes])),
    lambda boxes: (
        "Format as a JSON list of objects with keys x0, y0, x1, y1.",
        json.dumps([{"x0": b[0], "y0": b[1], "x1": b[2], "y1": b[3]} for b in boxes]),
    ),
    lambda boxes: (
        "Give each box as x_min, y_min, x_max, y_max, one per line.",
        "\n".join(f"{b[0]}, {b[1]}, {b[2]}, {b[3]}" for b in boxes),
    ),
    lambda boxes: (
        "Output a JSON list of objects with keys x_min, y_min, x_max, y_max.",
        json.dumps([{"x_min": b[0], "y_min": b[1], "x_max": b[2], "y_max": b[3]} for b in boxes]),
    ),
    lambda boxes: (
        "Wrap all bounding boxes in a single <box></box> span as a nested list of [x1, y1, x2, y2] per box.",
        "<box>[" + ", ".join("[" + ",".join(str(c) for c in b) + "]" for b in boxes) + "]</box>",
    ),
    lambda boxes: (
        "Output a JSON list of objects, each with key bbox_2d (list [x1, y1, x2, y2]).",
        json.dumps([{"bbox_2d": list(b)} for b in boxes]),
    ),
]

BBOX_SORT_GENERATORS = [
    lambda boxes: ("", sorted(boxes, key=lambda b: (b[0], b[1]))),
    lambda boxes: ("List them sorted from left to right.", sorted(boxes, key=lambda b: (b[0], b[1]))),
    lambda boxes: ("List them from top to bottom.", sorted(boxes, key=lambda b: (b[1], b[0]))),
    lambda boxes: ("Sort by horizontal center, left to right.", sorted(boxes, key=_cx)),
    lambda boxes: ("Sort by vertical center, top to bottom.", sorted(boxes, key=_cy)),
    lambda boxes: ("List them starting from the center of the image outward.", sorted(boxes, key=_bbox_dist_center)),
    lambda boxes: (
        "Sort by horizontal centrality (closest to middle column first).",
        sorted(boxes, key=lambda b: abs(_cx(b) - 500)),
    ),
    lambda boxes: (
        "Sort by vertical centrality (closest to middle row first).",
        sorted(boxes, key=lambda b: abs(_cy(b) - 500)),
    ),
]

POINT_SORT_GENERATORS = [
    lambda pts: ("", sorted(pts, key=lambda p: (p[0], p[1]))),
    lambda pts: ("List them sorted from left to right.", sorted(pts, key=lambda p: (p[0], p[1]))),
    lambda pts: ("List them from right to left.", sorted(pts, key=lambda p: (p[0], p[1]), reverse=True)),
    lambda pts: ("List them from top to bottom.", sorted(pts, key=lambda p: (p[1], p[0]))),
    lambda pts: ("List them from bottom to top.", sorted(pts, key=lambda p: (p[1], p[0]), reverse=True)),
    lambda pts: ("List them starting from the center of the image outward.", sorted(pts, key=_point_dist_center)),
    lambda pts: ("List them from the edges inward.", sorted(pts, key=_point_dist_center, reverse=True)),
    lambda pts: (
        "Sort by horizontal centrality (closest to middle column first).",
        sorted(pts, key=lambda p: abs(p[0] - 500)),
    ),
    lambda pts: (
        "Sort by vertical centrality (closest to middle row first).",
        sorted(pts, key=lambda p: abs(p[1] - 500)),
    ),
]

# dense-dump question/answer tables (ocr_conversationalize.py:31-165)
SDG_PROMPT_VARIATIONS = [
    "Perform a word-level transcription of the image.",
    "Detect every word in the image.",
    "Extract all text at the word level and map each to its specific region.",
    "Generate a word-level OCR output for this image.",
    "List all words found in the image along with their bounding boxes.",
    "Find all text regions at the word level. Each entry should have text and bbox.",
    "Map every word in the image to its bounding box.",
    "Provide a word-level transcription of this image.",
    "Capture every word and its corresponding bounding box within the image.",
    "For every word visible, provide the text and its bounding box.",
    "Identify the bounding boxes for all words in the image.",
    "Provide a detailed word-level transcription. Each word should have a bbox.",
    "Locate all words in the image and define their areas.",
    "Execute a word-level OCR. Each item should include text and bbox.",
    "Extract text word-by-word from the image. For each, specify the bounding box.",
    "Identify the bounding box for every individual word in the image. Output the text and coordinates.",
    "Identify all text at the word level.",
    "Scan the image for words and provide their bounding boxes.",
    "Transcribe every word found in the image.",
    "Detect individual word regions and their contents.",
    "Map each word in the image to its respective crop.",
    "Perform word-level OCR. Each item should have text and bbox.",
    "List every word found in the image with its bounding box.",
    "Capture the area of every word in the image.",
    "For all words in the image, provide the text and its bounding box.",
    "Provide a word-level breakdown of the text in this image.",
    "Find all word regions.",
    "List the bounding boxes for all words.",
    "Extract each word's text and its region.",
    "Transcribe every word in this image.",
    "For every word detected, provide text and its bbox.",
    "Transcribe all text at a word-specific level.",
    "Perform a word-level scan of the image.",
]


def _items_json(items) -> str:
    return json.dumps(
        [{"bbox_2d": list(o.bbox_2d), "text_content": o.text_content} for o in items]
    )


WORD_OUTPUT_FORMATS = [
    lambda items: (
        "Output must be a JSON list only, no markdown. Output the text and bounding box.",
        _items_json(items),
    ),
    lambda items: (
        "Wrap the JSON output containing each bounding box and text in a markdown code block: ```json ... ```",
        "```json\n" + _items_json(items) + "\n```",
    ),
    lambda items: (
        "Use keys bbox_2d (list [x1, y1, x2, y2]) and text_content (string). Return a JSON array.",
        _items_json(items),
    ),
    lambda items: (
        'Format each item as {"bbox_2d": [x1, y1, x2, y2], "text_content": "..."}. One JSON list.',
        _items_json(items),
    ),
    lambda items: (
        "Reply with a JSON list of objects with keys bbox_2d and text_content. No extra text.",
        _items_json(items),
    ),
    lambda items: (
        "Output a JSON list. Each entry: bbox_2d as [x_min, y_min, x_max, y_max] and text_content.",
        _items_json(items),
    ),
    lambda items: (
        "Output one word per line as: text followed by bbox [x1, y1, x2, y2].",
        "\n".join(f"{o.text_content} {list(o.bbox_2d)}" for o in items),
    ),
    lambda items: (
        'List each word on its own line as: "[x1, y1, x2, y2]: text".',
        "\n".join(f"{list(o.bbox_2d)}: {o.text_content}" for o in items),
    ),
    lambda items: (
        "Reply with plain text, one word per line as: text (x1, y1, x2, y2).",
        "\n".join(f"{o.text_content} {tuple(o.bbox_2d)}" for o in items),
    ),
    lambda items: (
        "Output a markdown table with columns: text | bbox.",
        "| text | bbox |\n|------|------|\n"
        + "\n".join(f"| {o.text_content!r} | {list(o.bbox_2d)} |" for o in items),
    ),
    lambda items: (
        "Give each word as a single line: tab-separated text and bbox coordinates.",
        "\n".join(
            f"{o.text_content}\t{o.bbox_2d[0]}\t{o.bbox_2d[1]}\t{o.bbox_2d[2]}\t{o.bbox_2d[3]}"
            for o in items
        ),
    ),
]


# ---------------------------------------------------------------------------
# generators — RNG consumption order identical to ocr_dense_qa.py:389-434


def _gen_bbox_to_text(rng, bbox, text):
    return (rng.choice(BBOX_TO_TEXT_TEMPLATES).format(_fmt_box(bbox)), text)


def _gen_point_to_text(rng, point, text):
    q_tpl = rng.choice(POINT_TO_WORD_QUESTION_TEMPLATES)
    return (q_tpl.format(rng.choice(POINT_IN_QUESTION_FORMATS)(point)), text)


def _gen_text_to_bbox_single(rng, text, bbox):
    base = rng.choice(TEXT_TO_BBOX_SINGLE_BASES).format(
        escape_text_for_prompt(text, rng)
    )
    fmt, answer = rng.choice(BBOX_FORMAT_TEMPLATES)(tuple(bbox))
    return (f"{base} {fmt}", answer)


def _gen_text_to_bbox_multi(rng, text, bboxes):
    base = rng.choice(TEXT_TO_BBOX_MULTI_BASES).format(
        escape_text_for_prompt(text, rng)
    )
    sort_ins, sorted_boxes = rng.choice(BBOX_SORT_GENERATORS)(bboxes)
    fmt, answer = rng.choice(LIST_FORMAT_TEMPLATES)(sorted_boxes)
    return (" ".join(p for p in (base, sort_ins, fmt) if p), answer)


def _gen_text_to_point_single(rng, text, bbox):
    base = rng.choice(TEXT_TO_POINT_BASES).format(
        escape_text_for_prompt(text, rng)
    )
    fmt, answer = rng.choice(POINT_FORMAT_TEMPLATES)(_bbox_center(bbox))
    return (f"{base} {fmt}", answer)


def _gen_text_to_point_multi(rng, text, bboxes):
    base = rng.choice(TEXT_TO_POINT_MULTI_BASES).format(
        escape_text_for_prompt(text, rng)
    )
    centers = [_bbox_center(b) for b in bboxes]
    sort_ins, sorted_centers = rng.choice(POINT_SORT_GENERATORS)(centers)
    fmt, answer = rng.choice(POINT_LIST_FORMAT_TEMPLATES)(sorted_centers)
    return (" ".join(p for p in (base, sort_ins, fmt) if p), answer)


def _gen_dense_dump(rng, words):
    q_base = rng.choice(SDG_PROMPT_VARIATIONS)
    fmt_suffix, answer = rng.choice(WORD_OUTPUT_FORMATS)(words)
    return (f"{q_base} {fmt_suffix}", answer)


# ---------------------------------------------------------------------------
# balanced sampler (ocr_dense_qa.py:67-104)


def balanced_sample_qa(tagged, max_pairs, rng):
    if len(tagged) <= max_pairs:
        result = [(q, a) for _, q, a in tagged]
        rng.shuffle(result)
        return result
    by_type = defaultdict(list)
    for typ, q, a in tagged:
        by_type[typ].append((q, a))
    types = sorted(by_type)
    base_quota, remainder = divmod(max_pairs, len(types))
    selected, leftover = [], []
    for i, typ in enumerate(types):
        bucket = by_type[typ]
        take = min(base_quota + (1 if i < remainder else 0), len(bucket))
        if take >= len(bucket):
            selected.extend(bucket)
        else:
            picked = set(rng.sample(range(len(bucket)), take))
            for j, p in enumerate(bucket):
                (selected if j in picked else leftover).append(p)
    need = max_pairs - len(selected)
    if need > 0 and leftover:
        selected.extend(rng.sample(leftover, min(need, len(leftover))))
    rng.shuffle(selected)
    return selected


# ---------------------------------------------------------------------------
# QA assembly (ocr_dense_qa.py:437-541)


def build_qa_tagged(words, task_id: str):
    """Tagged (type, q, a) list for one image's OCR items; RNG seeded
    from ``task_id`` so reruns and repartitions are byte-identical.
    Routing per distinct text: bbox→text / point→text always available;
    located-text types only while fewer than 5 items are invalid."""
    valid_words = [w for w in words if w.valid]
    allow_locate = (
        sum(1 for w in words if not w.valid) < _MAX_INVALIDS_FOR_TEXT_TO_BBOX
    )
    rng = random.Random(task_id)
    tagged = []
    text_to_bboxes = defaultdict(list)
    for w in valid_words:
        text = (w.text_content or "").strip()
        if not w.bbox_2d or len(w.bbox_2d) != _BBOX_COORD_COUNT or not text:
            continue
        text_to_bboxes[text].append(w.bbox_2d)
    for text, bboxes in text_to_bboxes.items():
        mode = rng.choice((0, 1, 2, 3) if allow_locate else (0, 1))
        if mode == 0:
            q, a = _gen_bbox_to_text(rng, bboxes[0], text)
            tagged.append((QA_TYPE_BBOX_TO_TEXT, q, a))
        elif mode == 1:
            q, a = _gen_point_to_text(rng, _bbox_center(bboxes[0]), text)
            tagged.append((QA_TYPE_POINT_TO_TEXT, q, a))
        elif allow_locate:
            loc_type = rng.choice([QA_TYPE_TEXT_TO_BBOX, QA_TYPE_TEXT_TO_POINT])
            if len(bboxes) == 1:
                if loc_type == QA_TYPE_TEXT_TO_BBOX:
                    q, a = rng.choice(
                        (
                            lambda t, b: _gen_text_to_bbox_single(rng, t, b),
                            lambda t, b: _gen_text_to_bbox_multi(rng, t, [b]),
                        )
                    )(text, bboxes[0])
                else:
                    q, a = rng.choice(
                        (
                            lambda t, b: _gen_text_to_point_single(rng, t, b),
                            lambda t, b: _gen_text_to_point_multi(rng, t, [b]),
                        )
                    )(text, bboxes[0])
                tagged.append((loc_type, q, a))
            else:
                if loc_type == QA_TYPE_TEXT_TO_BBOX:
                    q, a = _gen_text_to_bbox_multi(rng, text, bboxes)
                else:
                    q, a = _gen_text_to_point_multi(rng, text, bboxes)
                tagged.append((loc_type, q, a))
    return tagged, rng


def build_conversation(tagged, rng, image_name: str):
    """Sample + assemble the multi-turn conversation as a plain dict
    (the reference's ConversationSample/Message, JSON-shaped): first
    user turn carries the image media, then alternating user/assistant
    turns. None when nothing sampled."""
    qa_pairs = balanced_sample_qa(tagged, MAX_QA_PAIRS, rng)
    if not qa_pairs:
        return None
    first_q, first_a = qa_pairs[0]
    conv = [
        {
            "sender": "user",
            "fragments": [{"type": "image", "value": image_name}, first_q],
        },
        {"sender": "assistant", "fragments": [first_a]},
    ]
    for q, a in qa_pairs[1:]:
        conv.append({"sender": "user", "fragments": [q]})
        conv.append({"sender": "assistant", "fragments": [a]})
    return {"conversation": conv}


def build_dense_conversation(words, rng, image_name: str):
    """Single-turn list-all-bboxes conversation (used when OCR is
    provably complete)."""
    q, a = _gen_dense_dump(rng, words)
    return {
        "conversation": [
            {
                "sender": "user",
                "fragments": [{"type": "image", "value": image_name}, q],
            },
            {"sender": "assistant", "fragments": [a]},
        ]
    }


# ---------------------------------------------------------------------------
# Spark form


def ocr_qa_conversations(df, id_col: str = "image_id", items_col: str = "items"):
    """One Arrow pass over image rows -> conversation JSON per image
    (plus the tagged-pair count). Input schema: ``items`` =
    array<struct<bbox_2d: array<int>, text_content: string,
    valid: boolean>> in OCR order. Per-image task-id seeding makes the
    output independent of partitioning; no shuffle anywhere."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conversation", T.StringType()),
            T.StructField("n_pairs", T.IntegerType()),
        ]
    )

    @F.pandas_udf(schema)
    def _conv(ids: pd.Series, items: pd.Series) -> pd.DataFrame:
        convs, counts = [], []
        for image_id, its in zip(ids, items):
            words = [
                OCRDenseItem(
                    [int(x) for x in i["bbox_2d"]]
                    if i["bbox_2d"] is not None
                    else [],
                    i["text_content"],
                    bool(i["valid"]),
                )
                for i in (its if its is not None else [])
            ]
            tagged, rng = build_qa_tagged(words, str(image_id))
            conv = build_conversation(tagged, rng, str(image_id))
            convs.append(
                json.dumps(conv, ensure_ascii=False) if conv else None
            )
            counts.append(len(tagged))
        return pd.DataFrame({"conversation": convs, "n_pairs": counts})

    out = df.withColumn("_qa", _conv(F.col(id_col), F.col(items_col)))
    return out.select(
        id_col,
        F.col("_qa.conversation").alias("conversation"),
        F.col("_qa.n_pairs").alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# OCR scoring-QA response handling (reference synthetic/omni/
# ocr_scoring_qa.py:86-299) — the deterministic post-VLM half: JSON
# extraction from a possibly-fenced model response, per-bbox score
# application with validity thresholds, image-level checks, and the
# seeded dense-dump-vs-QA routing into the builders above. The verifier
# VLM call itself is the plug point.

import json as _json
import re as _re
from dataclasses import dataclass as _dataclass

_JSON_OBJECT_RE = _re.compile(r"\{.*\}", _re.DOTALL)


def parse_json_object(text: str):
    """ocr_scoring_qa.py:86-102: strip markdown code fences, return the
    first parseable JSON OBJECT (dict) or None."""
    cleaned = _re.sub(r"```(?:json)?\s*|\s*```", "", text).strip()
    for match in _JSON_OBJECT_RE.finditer(cleaned):
        try:
            obj = _json.loads(match.group(0))
        except _json.JSONDecodeError:
            continue
        if isinstance(obj, dict):
            return obj
    return None


@_dataclass
class OCRScoringQAStage:
    """handle_response (ocr_scoring_qa.py:221-299), exact, over a dict
    entry ``{image_path, ocr_dense: [OCRDenseItem], ...}``: empty/
    unparseable responses invalidate the image with the reference's
    error strings; per-bbox scores apply the min_bbox_match /
    max_text_errors gates (missing or non-int scores invalidate the
    bbox); image fails when configured on missing text or when no bbox
    survives; otherwise the conversation is built — a dense dump with
    probability ``dense_dump_prob`` only when OCR is provably complete
    (no missing text), multi-turn QA otherwise — with the RNG seeded
    from the task id exactly like the reference."""

    model_id: str = "nvidia/nemotron-3-nano-omni-30b-a3b-reasoning"
    min_bbox_match: int = 5
    max_text_errors: int = 0
    fail_on_missing_text: bool = False
    dense_dump_prob: float = 0.05

    def handle_response(self, entry: dict, response: str, task_id: str) -> dict:
        if not response:
            entry["is_valid"] = False
            entry["error"] = "ocr_scoring_qa: empty response from model"
            return entry
        entry["ocr_scoring_response_raw"] = response
        result = parse_json_object(response)
        if result is None:
            entry["is_valid"] = False
            entry["error"] = (
                f"ocr_scoring_qa: could not parse JSON: {response[:200]!r}"
            )
            return entry
        ocr_mode = result.get("ocr_mode", "unknown")
        text_results = result.get("text") or []
        missing_text = result.get("missing_text") or []
        entry["ocr_scoring_mode"] = ocr_mode
        entry["ocr_scoring_missing"] = missing_text
        if ocr_mode == "word":
            entry["ocr_is_word_level"] = True
        elif ocr_mode == "line":
            entry["ocr_is_word_level"] = False

        ocr_items = entry.get("ocr_dense") or []
        scores_by_idx = {
            int(e["idx"]): e for e in text_results if "idx" in e
        }
        for i, word in enumerate(ocr_items):
            score_entry = scores_by_idx.get(i)
            if score_entry is None:
                word.valid = False
                continue
            try:
                word.bbox_match = int(score_entry.get("bbox_match"))
                word.text_errors = int(score_entry.get("text_errors"))
            except (TypeError, ValueError):
                word.valid = False
                continue
            word.valid = (
                word.bbox_match >= self.min_bbox_match
                and word.text_errors <= self.max_text_errors
            )
        valid_words = [w for w in ocr_items if w.valid]

        if self.fail_on_missing_text and missing_text:
            entry["is_valid"] = False
            entry["error"] = (
                f"ocr_scoring_qa: {len(missing_text)} missing text region(s)"
            )
            return entry
        if ocr_items and not valid_words:
            entry["is_valid"] = False
            entry["error"] = (
                f"ocr_scoring_qa: no bboxes passed quality threshold "
                f"(min_bbox_match={self.min_bbox_match}, "
                f"max_text_errors={self.max_text_errors})"
            )
            return entry

        image_name = str(entry.get("image_path", "")).rsplit("/", 1)[-1]
        rng = random.Random(task_id)
        ocr_complete = not missing_text
        if ocr_complete and rng.random() < self.dense_dump_prob:
            entry["conversation"] = build_dense_conversation(
                valid_words, rng, image_name
            )
        else:
            qa_tagged, rng = build_qa_tagged(ocr_items, task_id)
            entry["conversation"] = build_conversation(
                qa_tagged, rng, image_name
            )
        return entry


# --- NemotronOCR-v2 prediction normalization (reference synthetic/omni/
# ocr_nemotron_v2.py:39-53) — the deterministic post-model half: the
# model emits fractional screen coordinates with inverted y naming
# ("lower" holds the SMALLER y / top edge); normalize to the 0-1000
# integer bbox contract with y1 <= y2 enforced by min/max. The
# nemotron-ocr package (detector + GPU) is the plug point.


def to_ocr_dense_item(pred: dict) -> dict:
    """ocr_nemotron_v2.py:39-53, exact: ``int(frac * 1000)`` per edge,
    y edges sorted so y1 <= y2, text coerced to str."""
    x1 = int(pred["left"] * 1000)
    x2 = int(pred["right"] * 1000)
    y1 = int(min(pred["upper"], pred["lower"]) * 1000)
    y2 = int(max(pred["upper"], pred["lower"]) * 1000)
    return {"bbox_2d": [x1, y1, x2, y2], "text_content": str(pred["text"])}

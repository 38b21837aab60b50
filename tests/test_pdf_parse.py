"""Nemotron-Parse markup parsing + floater reordering pins (reference
interleaved/pdf/nemotron_parse/utils.py:148-335)."""

from __future__ import annotations

from nemo_curator_spark.operators import pdf_parse as PP


RAW = (
    "<x_0.1><y_0.1>Title text<x_0.9><y_0.15><class_Title>"
    "<x_0.1><y_0.2>Body <b>para</b> one<x_0.9><y_0.4><class_Text>"
    "<x_0.2><y_0.5><x_0.8><y_0.7><class_Picture>"
    "<x_0.2><y_0.72>Figure 1 caption<x_0.8><y_0.75><class_Caption>"
    "<x_0.1><y_0.5><x_0.9><y_0.52><class_Table>"  # empty non-picture: dropped
)


def test_parse_elements_and_tag_strip():
    els = PP.parse_nemotron_output(RAW)
    assert [e["class"] for e in els] == ["Title", "Text", "Picture", "Caption"]
    assert els[1]["text"] == "Body para one"  # inner tags stripped
    assert els[2]["text"] == ""  # empty Picture kept
    assert els[0]["bbox"] == [0.1, 0.1, 0.9, 0.15]


def test_parse_fallback_plain_text():
    els = PP.parse_nemotron_output("<junk>plain words</junk>")
    assert els == [{"class": "Text", "text": "plain words", "bbox": None}]
    assert PP.parse_nemotron_output("   ") == []


def test_caption_pairs_with_nearest_picture():
    floaters = [
        {"class": "Picture", "text": "", "bbox": [0, 0.1, 1, 0.2]},
        {"class": "Picture", "text": "", "bbox": [0, 0.7, 1, 0.8]},
        {"class": "Caption", "text": "cap B", "bbox": [0, 0.82, 1, 0.85]},
        {"class": "Caption", "text": "orphan", "bbox": [0, 0.45, 1, 0.5]},
    ]
    groups = PP.pair_pictures_and_captions(floaters)
    # cap B pairs with the lower picture; orphan pairs with the upper
    # (nearest unclaimed) — groups sorted by leading center-y
    flat = [[e["text"] or e["class"] for e in g] for g in groups]
    assert flat == [["Picture", "orphan"], ["Picture", "cap B"]]


def test_interleave_floaters_v11_reorder():
    anchored = [
        {"class": "Title", "text": "t", "bbox": [0, 0.0, 1, 0.1]},
        {"class": "Text", "text": "a", "bbox": [0, 0.2, 1, 0.4]},
        {"class": "Text", "text": "b", "bbox": [0, 0.8, 1, 1.0]},
    ]
    floaters = [
        {"class": "Picture", "text": "", "bbox": [0, 0.45, 1, 0.6]},
        {"class": "Caption", "text": "fig", "bbox": [0, 0.62, 1, 0.65]},
    ]
    out = PP.interleave_floaters(anchored, floaters)
    # picture+caption group lands after the anchor closest to y~0.52
    assert [e["text"] or e["class"] for e in out] == [
        "t", "a", "Picture", "fig", "b",
    ]
    # no floaters: anchored unchanged; no anchors: grouped floaters
    assert PP.interleave_floaters(anchored, []) == anchored
    only = PP.interleave_floaters([], floaters)
    assert [e["class"] for e in only] == ["Picture", "Caption"]


def test_spark_parse_pages(spark):
    df = spark.createDataFrame(
        [("p1", RAW), ("p2", "just text")],
        "page_id string, raw_output string",
    )
    out = (
        PP.parse_pages(df, reorder_floaters=True)
        .orderBy("page_id", "position")
        .toPandas()
    )
    p1 = out[out.page_id == "p1"]
    assert p1.element_class.tolist() == ["Title", "Text", "Picture", "Caption"]
    p2 = out[out.page_id == "p2"]
    assert p2.text.tolist() == ["just text"]
    assert p2.bbox[p2.index[0]] is None

"""Nemotron-Parse PDF postprocessing, model-free half — reference
stages/interleaved/pdf/nemotron_parse/utils.py: parse the VLM's raw
markup output into structured elements and restore reading order for
v1.1 outputs (Pictures/Captions emitted at end-of-page).

Ported exactly (all PIL-free): the ``<x_..><y_..>...<class_..>`` markup
parser with its tag-strip fallback (utils.py:148-175), nearest-Picture
caption pairing (utils.py:252-292), and the floater interleave that
inserts each Picture/Caption group after the anchored element with the
closest bbox center-y (utils.py:295-335). The PDF rendering (pypdfium2/
OpenCV), canvas building and pixel cropping remain the codec/model plug
points.

Spark shape: parsing is per-page pure — one Arrow pass exploding each
page's raw output into element rows; nothing shuffles.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_ELEMENT_RE = re.compile(
    r"<x_([\d.]+)><y_([\d.]+)>"
    r"(.*?)"
    r"<x_([\d.]+)><y_([\d.]+)>"
    r"<class_([^>]+)>",
    re.DOTALL,
)


def parse_nemotron_output(raw_text: str) -> list[dict]:
    """utils.py:148-175: elements with class/text/bbox (normalized
    [x1, y1, x2, y2]); inner tags stripped from text; empty-text
    elements kept only for Pictures; unmatched non-empty output falls
    back to one tag-stripped Text element with no bbox."""
    elements: list[dict] = []
    for m in _ELEMENT_RE.finditer(raw_text):
        cls = m.group(6)
        text = re.sub(r"<[^>]+>", "", m.group(3)).strip()
        bbox = [
            float(m.group(1)), float(m.group(2)),
            float(m.group(4)), float(m.group(5)),
        ]
        if text or cls == "Picture":
            elements.append({"class": cls, "text": text, "bbox": bbox})
    if not elements and raw_text.strip():
        cleaned = re.sub(r"<[^>]+>", "", raw_text).strip()
        if cleaned:
            elements.append({"class": "Text", "text": cleaned, "bbox": None})
    return elements


def _bbox_center_y(bbox) -> float:
    if bbox is None:
        return 0.0
    return (bbox[1] + bbox[3]) / 2.0


def pair_pictures_and_captions(floaters: list[dict]) -> list[list[dict]]:
    """utils.py:252-292: greedily assign each Caption to the nearest
    unclaimed Picture by bbox center-y; orphan captions become their own
    group; groups sorted by leading center-y."""
    pictures = [(i, f) for i, f in enumerate(floaters) if f["class"] == "Picture"]
    captions = [(i, f) for i, f in enumerate(floaters) if f["class"] == "Caption"]
    pic_taken: set = set()
    cap_to_pic: dict = {}
    for ci, cap in captions:
        cap_y = _bbox_center_y(cap.get("bbox"))
        best_pi, best_dist = None, float("inf")
        for pi, pic in pictures:
            if pi in pic_taken:
                continue
            dist = abs(_bbox_center_y(pic.get("bbox")) - cap_y)
            if dist < best_dist:
                best_dist, best_pi = dist, pi
        if best_pi is not None:
            cap_to_pic[ci] = best_pi
            pic_taken.add(best_pi)
    groups: list[list[dict]] = []
    for pi, pic in pictures:
        group = [pic]
        group += [cap for ci, cap in captions if cap_to_pic.get(ci) == pi]
        groups.append(group)
    for ci, cap in captions:
        if ci not in cap_to_pic:
            groups.append([cap])
    groups.sort(key=lambda g: _bbox_center_y(g[0].get("bbox")))
    return groups


def interleave_floaters(
    anchored: list[dict], floaters: list[dict]
) -> list[dict]:
    """utils.py:295-335: anchored elements keep model order; each
    Picture/Caption group is inserted after the anchor with the closest
    center-y (multiple groups at one anchor sorted by center-y). Needed
    for Nemotron-Parse v1.1; v1.2+ is already reading-ordered."""
    if not floaters:
        return list(anchored)
    if not anchored:
        out: list[dict] = []
        for group in pair_pictures_and_captions(floaters):
            out.extend(group)
        return out
    groups = pair_pictures_and_captions(floaters)
    anchor_ys = [_bbox_center_y(e.get("bbox")) for e in anchored]
    insert_map: dict = {}
    for group in groups:
        gy = _bbox_center_y(group[0].get("bbox"))
        best = min(range(len(anchor_ys)), key=lambda i: abs(anchor_ys[i] - gy))
        insert_map.setdefault(best, []).append(group)
    for lst in insert_map.values():
        lst.sort(key=lambda g: _bbox_center_y(g[0].get("bbox")))
    out = []
    for i, elem in enumerate(anchored):
        out.append(elem)
        for group in insert_map.get(i, []):
            out.extend(group)
    return out


_FLOATER_CLASSES = ("Picture", "Caption")


def parse_pages(
    df: DataFrame,
    page_id_col: str = "page_id",
    raw_col: str = "raw_output",
    reorder_floaters: bool = False,
) -> DataFrame:
    """One Arrow pass: raw Nemotron-Parse output per page -> exploded
    element rows (page_id, position, class, text, bbox). With
    ``reorder_floaters`` (the v1.1 path, postprocess.py:46-76),
    Pictures/Captions are re-interleaved next to their anchors first."""
    schema = T.StructType(
        [
            T.StructField("page_id", T.StringType()),
            T.StructField("position", T.IntegerType()),
            T.StructField("element_class", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("bbox", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                elements = parse_nemotron_output(r[raw_col] or "")
                if reorder_floaters:
                    anchored = [
                        e for e in elements
                        if e["class"] not in _FLOATER_CLASSES
                    ]
                    floaters = [
                        e for e in elements if e["class"] in _FLOATER_CLASSES
                    ]
                    elements = interleave_floaters(anchored, floaters)
                for pos, e in enumerate(elements):
                    rows.append(
                        (str(r[page_id_col]), pos, e["class"], e["text"],
                         e["bbox"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["page_id", "position", "element_class", "text",
                         "bbox"],
            )

    return df.select(page_id_col, raw_col).mapInPandas(gen, schema)

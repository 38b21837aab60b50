"""Translation segmentation + reassembly, Spark-first (reference
``stages/text/experimental/translation/stages/segmentation.py`` +
``reassembly.py``, coarse mode).

The reference pipeline segments documents into translatable units, sends
them to an LLM translator, and reassembles the translations into the
original structure. The translator (and spaCy "fine" mode) are
model/library-gated; what is deterministic — and implemented here with
behavioral parity — is:

* :func:`is_line_translatable` — the content test (has an alphabetic
  char, not an XML/HTML tag line, not a JSON object/array blob),
  segmentation.py:226-248.
* :func:`segment_coarse` — line-level segmentation with code-block
  awareness (a ``\\`\\`\\``` fence TOGGLES pass-through; fence lines stay
  verbatim), producing segments plus a reconstruction template,
  segmentation.py:512-551.
* :func:`reassemble_coarse` — template fill: every ``None`` slot takes
  its preserved leading whitespace + the translated segment, other
  lines verbatim; ``"\\n"``-join restores the document byte-exactly
  under identity translation (reassembly.py's coarse branch).

Spark shape: segmentation is a row-multiplying Arrow stage (one UDF
pass, posexplode — same cost as DocumentSplitter); reassembly is one
groupBy on the doc id. The reconstruction template is carried in a
separate (doc, metadata) frame rather than duplicated onto every
segment row — at 100 TB the per-segment shuffle then moves only
(id, idx, segment) triples.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def is_line_translatable(line: str) -> bool:
    """segmentation.py:226-248, exact: no alphabetic char → False;
    ``<...>`` tag-shaped lines → False; parseable JSON object/array
    blobs → False (tool payloads stay verbatim)."""
    stripped = line.strip()
    if not any(ch.isalpha() for ch in stripped):
        return False
    if stripped.startswith("<") and stripped.endswith(">"):
        return False
    if (stripped.startswith("{") and stripped.endswith("}")) or (
        stripped.startswith("[") and stripped.endswith("]")
    ):
        try:
            parsed = json.loads(stripped)
        except (json.JSONDecodeError, TypeError):
            parsed = None
        if isinstance(parsed, (dict, list)):
            return False
    return True


def segment_coarse(text: str) -> tuple[list[str], dict]:
    """segmentation.py:512-551, exact: split on ``\\n``; fence lines
    (stripped startswith ```` ``` ````) toggle code-block mode and stay
    in the template; non-translatable or in-code lines stay verbatim;
    translatable lines contribute their stripped text as a segment and a
    ``None`` template slot with the leading whitespace preserved."""
    lines = (text or "").split("\n")
    template: list[str | None] = []
    leading_spaces: list[str] = []
    segments: list[str] = []
    in_code_block = False
    for line in lines:
        if line.strip().startswith("```"):
            in_code_block = not in_code_block
            template.append(line)
            continue
        if in_code_block or not is_line_translatable(line):
            template.append(line)
        else:
            n_lead = len(line) - len(line.lstrip())
            template.append(None)
            leading_spaces.append(line[:n_lead])
            segments.append(line[n_lead:])
    metadata = {
        "mode": "coarse",
        "template": template,
        "leading_spaces": leading_spaces,
    }
    return segments, metadata


def reassemble_coarse(metadata: dict, translated: list[str]) -> str:
    """Fill the coarse template with translated segments, in order; a
    missing tail of translations leaves the original slots empty-string
    (the reference logs and degrades the same way)."""
    out: list[str] = []
    k = 0
    for slot in metadata["template"]:
        if slot is None:
            seg = translated[k] if k < len(translated) else ""
            out.append(metadata["leading_spaces"][k] + seg)
            k += 1
        else:
            out.append(slot)
    return "\n".join(out)


_SEG_STRUCT = T.StructType(
    [
        T.StructField("segments", T.ArrayType(T.StringType())),
        T.StructField("metadata", T.StringType()),
    ]
)


def segment_documents_coarse(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(segments, meta)``: segments = one row per translatable
    unit (id, seg_idx, segment); meta = one row per document
    (id, metadata JSON). The UDF runs once per branch unless the caller
    caches — the correctness gate materializes meta as its artifact,
    which also serves as the cache."""

    @F.pandas_udf(_SEG_STRUCT)
    def _seg(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            segs, meta = segment_coarse(t or "")
            rows.append((segs, json.dumps(meta, ensure_ascii=False)))
        return pd.DataFrame(rows, columns=["segments", "metadata"])

    base = df.select(F.col(id_col), _seg(F.col(text_col)).alias("_s"))
    segments = base.select(
        id_col, F.posexplode("_s.segments").alias("seg_idx", "segment")
    )
    meta = base.select(id_col, F.col("_s.metadata").alias("metadata"))
    return segments, meta


def reassemble_documents_coarse(
    meta: DataFrame,
    translated: DataFrame,
    id_col: str = "doc_id",
    segment_col: str = "segment",
    out_col: str = "text_out",
) -> DataFrame:
    """Collapse translated segment rows back into whole documents: sort
    each document's segments by seg_idx (array_sort on the packed
    struct — order is data-defined, not partition-defined), left-join
    onto the metadata frame (documents with zero translatable segments
    reassemble from the template alone), and fill the template."""
    agg = translated.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seg_idx", segment_col))),
            lambda s: s[segment_col],
        ).alias("_translated")
    )
    joined = meta.join(agg, id_col, "left")

    @F.pandas_udf(T.StringType())
    def _fill(metas: pd.Series, segs: pd.Series) -> pd.Series:
        out = []
        for m, s in zip(metas, segs):
            out.append(
                reassemble_coarse(json.loads(m), list(s) if s is not None else [])
            )
        return pd.Series(out)

    return joined.select(
        id_col, _fill(F.col("metadata"), F.col("_translated")).alias(out_col)
    )


# --- fine (sentence-level) mode ---------------------------------------------
# (reference segmentation.py:131-224 + _segment_fine:557-581 +
# reassembly.py:_reassemble_fine:458-480). The ONLY spaCy-specific piece
# is the sentence-boundary model (doc.sents); every structure-preserving
# step around it is exact positional logic, ported here over generic
# (start, end) spans with an injectable sentencizer. The default
# sentencizer is a deterministic rule-based stand-in (documented
# deviation — spaCy models are absent); pass a spaCy-backed callable to
# match a specific model's boundaries.

# verbatim from segmentation.py:198-201 — the custom separator pattern IS
# the observable contract (valid in python re and RE2; no lookaround)
SPECIAL_SEPARATOR_PATTERN = (
    r"(\#{2,}|\_{2,}|\…{2,}|\%{2,}|\+{2,}|\.{2,}|\-{3,}|\*{2,}|\~{2,}|\={2,}|\!{2,}"
    r"|\n|\t|\‣|⁃|\⁌|\⁍|\●|\○|\•|\·|\◘|\◦|\⦾|\⦿|\|)"
)

_SENT_ENDERS = ".!?…"
_SENT_CLOSERS = "\"')]}»’”"


def append_stripped_unit(
    units: list, text_unit: str, separator: str
) -> None:
    """Port of _append_stripped_unit (segmentation.py:131-140): strip the
    unit, move leading whitespace into its own empty-text unit and
    trailing whitespace into the separator."""
    stripped = text_unit.strip()
    leading = text_unit[: len(text_unit) - len(text_unit.lstrip())]
    trailing = text_unit[len(text_unit.rstrip()):]
    if leading and stripped:
        units.append(("", leading))
    units.append((stripped, trailing + separator))


def units_with_separators(text: str, spans: list) -> list:
    """Port of _spacy_units_with_separators (segmentation.py:143-154)
    over (start_char, end_char) spans."""
    units: list = []
    if spans and spans[0][0] > 0:
        units.append(("", text[: spans[0][0]]))
    for idx, (s, e) in enumerate(spans):
        nxt = spans[idx + 1][0] if idx < len(spans) - 1 else len(text)
        units.append((text[s:e], text[e:nxt]))
    return units


def split_unit_on_special_separators(
    sent_text: str, sent_separator: str
) -> list:
    """Port of _split_unit_on_special_separators (segmentation.py:158-180)."""
    import re as _re

    matches = list(_re.finditer(SPECIAL_SEPARATOR_PATTERN, sent_text))
    if not matches:
        units: list = []
        append_stripped_unit(units, sent_text, sent_separator)
        return units
    units = []
    last_end = 0
    for m in matches:
        append_stripped_unit(
            units, sent_text[last_end : m.start()], sent_text[m.start() : m.end()]
        )
        last_end = m.end()
    if last_end < len(sent_text):
        append_stripped_unit(units, sent_text[last_end:], sent_separator)
    elif sent_separator:
        units.append(("", sent_separator))
    return units


def default_sentence_spans(text: str) -> list:
    """Deterministic rule-based sentencizer stand-in: a sentence ends at
    a run of .!?… plus trailing quote/bracket closers; the whitespace to
    the next non-space starts the following sentence. Returns
    (start_char, end_char) spans — the spaCy model plug point."""
    spans: list = []
    n = len(text)
    i = 0
    while i < n and text[i].isspace():
        i += 1
    start = i
    while i < n:
        if text[i] in _SENT_ENDERS:
            j = i + 1
            while j < n and text[j] in _SENT_ENDERS:
                j += 1
            while j < n and text[j] in _SENT_CLOSERS:
                j += 1
            spans.append((start, j))
            i = j
            while i < n and text[i].isspace():
                i += 1
            start = i
        else:
            i += 1
    if start < n:
        spans.append((start, n))
    return spans


def split_into_sentences_with_structure(
    text: str, sentencizer=None
) -> list:
    """Port of split_into_sentences_with_structure (segmentation.py:
    182-224): sentencize, attach exact separators, split on the special
    pattern, verify byte-exact reconstruction (fallback: one unit)."""
    spans = (sentencizer or default_sentence_spans)(text)
    all_units: list = []
    for sent_text, sep in units_with_separators(text, spans):
        all_units.extend(split_unit_on_special_separators(sent_text, sep))
    if text != "".join(t + s for t, s in all_units):
        return [(text, "")]
    return all_units


def segment_fine(text: str, sentencizer=None) -> tuple[list, dict]:
    """Port of SegmentationStage._segment_fine (segmentation.py:557-581):
    translatable units (non-blank + is_line_translatable) become
    segments; everything is recorded in order with its separator."""
    units_meta: list = []
    segments: list = []
    for text_unit, sep in split_into_sentences_with_structure(
        text, sentencizer
    ):
        translatable = bool(text_unit.strip()) and is_line_translatable(
            text_unit
        )
        units_meta.append(
            {
                "translatable": translatable,
                "original": text_unit,
                "separator": sep,
            }
        )
        if translatable:
            segments.append(text_unit)
    return segments, {"mode": "fine", "units": units_meta}


def reassemble_fine(metadata: dict, translated: list) -> str:
    """Port of _reassemble_fine (reassembly.py:458-480): translatable
    units take the next translation; running out falls back to the
    original unit (the reference logs and degrades the same way)."""
    k = 0
    parts: list = []
    for unit in metadata["units"]:
        if unit["translatable"]:
            if k < len(translated):
                parts.append(translated[k] + unit["separator"])
                k += 1
            else:
                parts.append(unit["original"] + unit["separator"])
        else:
            parts.append(unit["original"] + unit["separator"])
    return "".join(parts)


def segment_documents_fine(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    sentencizer=None,
) -> tuple[DataFrame, DataFrame]:
    """Fine-mode Spark form, same shape as segment_documents_coarse:
    one Arrow pass, (id, seg_idx, segment) rows + a per-document
    metadata frame; only the small triples cross any later exchange."""

    @F.pandas_udf(_SEG_STRUCT)
    def _seg(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            segs, meta = segment_fine(t or "", sentencizer)
            rows.append((segs, json.dumps(meta, ensure_ascii=False)))
        return pd.DataFrame(rows, columns=["segments", "metadata"])

    base = df.select(F.col(id_col), _seg(F.col(text_col)).alias("_s"))
    segments = base.select(
        id_col, F.posexplode("_s.segments").alias("seg_idx", "segment")
    )
    meta = base.select(id_col, F.col("_s.metadata").alias("metadata"))
    return segments, meta


def reassemble_documents_fine(
    meta: DataFrame,
    translated: DataFrame,
    id_col: str = "doc_id",
    segment_col: str = "segment",
    out_col: str = "text_out",
) -> DataFrame:
    """Fine-mode reassembly, same plan shape as the coarse form (one
    groupBy, array_sort order-from-data, left join onto metadata)."""
    agg = translated.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seg_idx", segment_col))),
            lambda s: s[segment_col],
        ).alias("_translated")
    )
    joined = meta.join(agg, id_col, "left")

    @F.pandas_udf(T.StringType())
    def _fill(metas: pd.Series, segs: pd.Series) -> pd.Series:
        out = []
        for m, s in zip(metas, segs):
            out.append(
                reassemble_fine(
                    json.loads(m), list(s) if s is not None else []
                )
            )
        return pd.Series(out)

    return joined.select(
        id_col, _fill(F.col("metadata"), F.col("_translated")).alias(out_col)
    )


# --- wildcard dot-path field access -----------------------------------------
# (reference translation/utils/field_paths.py:22-141 + the stage's
# _extract_texts, segmentation.py:467-505) — multi-field support:
# translating nested structures like ``messages.*.content`` without
# manual flattening. Pure-python ports; the Spark caller applies them
# inside the existing one-Arrow-pass segmentation UDFs.


def _find_nested(obj, remaining, collected):
    if not remaining:
        return
    key, rest = remaining[0], remaining[1:]
    if key == "*":
        if isinstance(obj, list):
            for item in obj:
                if rest:
                    _find_nested(item, rest, collected)
                elif isinstance(item, str):
                    collected.append(item)
        return
    if isinstance(obj, dict) and key in obj:
        if rest:
            _find_nested(obj[key], rest, collected)
        elif isinstance(obj[key], str):
            collected.append(obj[key])


def extract_nested_fields(record, path: str) -> list:
    """Strings matching a wildcard dot-path, in traversal order
    (field_paths.py:51-55)."""
    found: list = []
    _find_nested(record, path.split("."), found)
    return found


def _set_nested(obj, remaining, values, idx):
    if not remaining:
        return
    key, rest = remaining[0], remaining[1:]
    if key == "*":
        if isinstance(obj, list):
            for i, item in enumerate(obj):
                if rest:
                    _set_nested(item, rest, values, idx)
                elif isinstance(item, str) and idx[0] < len(values):
                    obj[i] = values[idx[0]]
                    idx[0] += 1
        return
    if isinstance(obj, dict) and key in obj:
        if rest:
            _set_nested(obj[key], rest, values, idx)
        elif isinstance(obj[key], str) and idx[0] < len(values):
            obj[key] = values[idx[0]]
            idx[0] += 1


def set_nested_fields(record, path: str, values: list):
    """Write values back along the same traversal order; surplus target
    slots keep their originals, surplus values are dropped with the
    reference's warning semantics (field_paths.py:104-124)."""
    import copy

    result = copy.deepcopy(record)
    idx = [0]
    _set_nested(result, path.split("."), values, idx)
    if idx[0] != len(values):
        import warnings

        warnings.warn(
            f"set_nested_fields: expected to set {len(values)} values for "
            f"path '{path}', but only set {idx[0]}",
            stacklevel=2,
        )
    return result


def is_wildcard_path(path: str) -> bool:
    return "*" in path


def normalize_text_field(text_field) -> list:
    """str | list[str] -> list of field paths (field_paths.py:132-136)."""
    if isinstance(text_field, str):
        return [text_field]
    return list(text_field)


def parse_structured_value(value):
    """dict/list (possibly JSON-encoded) or None (field_paths.py:139-151)."""
    if isinstance(value, (dict, list)):
        return value
    if isinstance(value, str):
        try:
            parsed = json.loads(value)
        except (ValueError, TypeError):
            return None
        if isinstance(parsed, (dict, list)):
            return parsed
    return None


def extract_texts_py(value, field_path: str) -> list:
    """SegmentationStage._extract_texts (segmentation.py:467-505): a
    plain column name returns the string itself; a wildcard/dot path
    parses the root value as structured data and pulls matching strings;
    unparseable structured roots fall back to the raw string."""
    if not is_wildcard_path(field_path) and "." not in field_path:
        if isinstance(value, str):
            return [value] if value else []
        return [str(value)] if value else []
    record = parse_structured_value(value)
    if record is None:
        if isinstance(value, str) and value:
            return [value]
        return []
    root_key = field_path.split(".")[0]
    return extract_nested_fields({root_key: record}, field_path)

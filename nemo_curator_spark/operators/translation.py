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

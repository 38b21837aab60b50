"""Translation coarse segmentation + reassembly (reference
experimental/translation/stages/segmentation.py:226-551 + reassembly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nemo_curator_spark.operators import translation as TR

DOC = """# Title line
Hello world, translate me.
    indented translatable line
<tag attr="x">
{"tool": "payload", "keep": true}
{not actually json but has alpha}
12345 --- 67890
```
code line stays verbatim
Another Code Line
```
After the fence, translate this.

last line"""


def test_is_line_translatable_reference_cases():
    assert TR.is_line_translatable("Hello world")
    assert not TR.is_line_translatable("12345 !!!")  # no alpha
    assert not TR.is_line_translatable("  <div class='x'>  ")  # tag line
    assert not TR.is_line_translatable('{"a": 1}')  # JSON object
    assert not TR.is_line_translatable("[1, 2, 3]")  # JSON array... no alpha anyway
    assert not TR.is_line_translatable('["a", "b"]')  # JSON array with alpha
    assert TR.is_line_translatable("{not json but alpha}")  # unparseable
    assert not TR.is_line_translatable("")


def test_segment_coarse_code_blocks_and_template():
    segs, meta = TR.segment_coarse(DOC)
    # translatable: title, hello, indented, the unparseable brace line,
    # and the post-fence line; code-block lines + tag + JSON + digits
    # + blank lines stay in the template
    assert segs == [
        "# Title line",
        "Hello world, translate me.",
        "indented translatable line",
        "{not actually json but has alpha}",
        "After the fence, translate this.",
        "last line",
    ]
    assert meta["leading_spaces"][2] == "    "  # indentation preserved
    assert meta["template"].count(None) == len(segs)
    # fences remain verbatim in the template
    assert meta["template"].count("```") == 2
    # identity translation reconstructs the document byte-exactly
    assert TR.reassemble_coarse(meta, segs) == DOC


def test_reassemble_with_translations_and_short_tail():
    segs, meta = TR.segment_coarse("a\n\nb")
    assert segs == ["a", "b"]
    assert TR.reassemble_coarse(meta, ["X", "Y"]) == "X\n\nY"
    # missing tail degrades to empty slots, structure preserved
    assert TR.reassemble_coarse(meta, ["X"]) == "X\n\n"


def test_spark_roundtrip_identity_and_upper(spark):
    docs = [
        (1, DOC),
        (2, ""),
        (3, "only one line"),
        (4, "<a>\n<b>\n123"),  # zero translatable segments
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    segments, meta = TR.segment_documents_coarse(df)
    # identity translation -> original text, across partitionings
    out = {
        r["doc_id"]: r["text_out"]
        for r in TR.reassemble_documents_coarse(
            meta, segments.repartition(5)
        ).collect()
    }
    assert out == dict(docs)
    # an actual per-segment transformation flows through
    upper = segments.withColumn(
        "segment",
        F.translate(
            F.col("segment"),
            "abcdefghijklmnopqrstuvwxyz",
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        ),
    )
    got = {
        r["doc_id"]: r["text_out"]
        for r in TR.reassemble_documents_coarse(meta, upper).collect()
    }
    assert got[3] == "ONLY ONE LINE"
    assert "code line stays verbatim" in got[1]  # fenced content untouched
    assert "HELLO WORLD, TRANSLATE ME." in got[1]
    assert got[4] == "<a>\n<b>\n123"  # template-only document survives

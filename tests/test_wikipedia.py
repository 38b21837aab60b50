"""Wikipedia dump iteration + wikitext extraction (reference
wikipedia/iterator.py:28-148 contract)."""

from __future__ import annotations

import bz2

from nemo_curator_spark.operators import wikipedia as W

DUMP_XML = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
  <page>
    <title>Good Article</title>
    <ns>0</ns>
    <id>1</id>
    <revision><text>'''Good Article''' is about [[science|sciences]].</text></revision>
  </page>
  <page>
    <title>Talk:Ignored</title>
    <ns>1</ns>
    <id>2</id>
    <revision><text>talk page</text></revision>
  </page>
  <page>
    <title>Redirected</title>
    <ns>0</ns>
    <id>3</id>
    <redirect title="Good Article"/>
    <revision><text>#REDIRECT [[Good Article]]</text></revision>
  </page>
  <page>
    <title>Empty</title>
    <ns>0</ns>
    <id>4</id>
    <revision></revision>
  </page>
  <page>
    <title>Spaced Title</title>
    <ns>0</ns>
    <id>5</id>
    <revision><text>Body text here.</text></revision>
  </page>
</mediawiki>"""


def test_iterator_contract(tmp_path):
    p = tmp_path / "dump.xml.bz2"
    p.write_bytes(bz2.compress(DUMP_XML.encode()))
    recs = list(W.iterate_dump(str(p), language="en"))
    # ns!=0, redirect, and empty-revision pages are skipped
    assert [r["id"] for r in recs] == ["1", "5"]
    assert recs[0]["title"] == "Good Article"
    assert recs[0]["url"] == "https://en.wikipedia.org/wiki/Good%20Article"
    assert recs[0]["source_id"] == "dump.xml.bz2"
    assert recs[1]["url"] == "https://en.wikipedia.org/wiki/Spaced%20Title"


WIKITEXT = """{{Infobox thing
| name = Test {{nested|template}}
| image = x.jpg
}}
'''Bold lead''' sentence about [[physics]] and [[astronomy|stars]].
<!-- hidden comment -->
A fact.<ref name="a">Some citation</ref> Another fact.<ref name="b"/>

== History ==
* item one
* item two with [[link]]

[[File:Example.jpg|thumb|A caption with [[nested link]]]]
[[Category:Things]]
{| class="wikitable"
|-
| cell || cell2
|}
External [https://example.com label] and bare [https://x.org].

''Italic end.''"""


def test_wikitext_to_text():
    text = W.wikitext_to_text(WIKITEXT)
    assert "Infobox" not in text and "nested|template" not in text
    assert "Bold lead sentence about physics and stars." in text
    assert "hidden comment" not in text
    assert "A fact. Another fact." in text
    assert "Some citation" not in text
    assert "History" in text and "==" not in text
    assert "item one" in text and "*" not in text
    assert "Example.jpg" not in text and "caption" not in text
    assert "Category" not in text
    assert "wikitable" not in text and "cell2" not in text
    assert "External label and bare ." in text
    assert "Italic end." in text and "''" not in text


def test_wikipedia_to_rows_spark(spark, tmp_path):
    (tmp_path / "part1.xml.bz2").write_bytes(bz2.compress(DUMP_XML.encode()))
    df = W.wikipedia_to_rows(spark, str(tmp_path))
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"1", "5"}
    assert rows["1"]["text"] == "Good Article is about sciences."

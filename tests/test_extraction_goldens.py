# ruff: noqa: RUF001
"""Reference HTML-extraction goldens, ported from the reference's own test
suite (tests/stages/text/download/test_html_extractors_implementation.py:
76-115 English, :117-145 simple, :146-237 Thai/Chinese/Japanese, :287-330
Korean) and asserted against our stdlib jusText reimplementation
(nemo_curator_spark/operators/justext_like.py).

Pass / deviation table (the byte-identical-text contract, SURVEY §2.1):

| reference fixture                     | extractor      | status |
|---------------------------------------|----------------|--------|
| English (is_boilerplate=False)        | justext        | PASS (exact paragraph list) |
| simple English (default boilerplate)  | justext        | PASS (exact) |
| Thai                                  | justext        | PASS (exact) |
| Chinese                               | justext        | PASS (exact) |
| Japanese                              | justext        | PASS (exact) |
| Korean                                | justext        | PASS (exact) |
| English (complex)                     | resiliparse    | PASS (exact, stdlib stand-in html_extract_like.py) |
| simple English                        | resiliparse    | PASS (exact) |
| Thai                                  | resiliparse    | PASS (exact) |
| Chinese                               | resiliparse    | PASS (exact) |
| Japanese                              | resiliparse    | PASS (exact) |
| Korean                                | resiliparse    | PASS (exact) |
| English (complex)                     | trafilatura    | PASS (exact, stdlib stand-in) |
| simple English                        | trafilatura    | PASS (exact) |
| Chinese                               | trafilatura    | PASS (exact) |
| Thai / Japanese / Korean              | trafilatura    | DEVIATION: the library emits each <p> paragraph TWICE for these pages (short paragraphs escape its dup-check via min_duplcheck_size) and drops the loose main text; the stand-in emits the fallback extraction once, loose text included. Both paragraph SETS agree; multiplicity and loose-text inclusion differ. Pinned below. |

Known semantic deviations of justext_like (documented, not exercised by
these fixtures): stdlib html.parser performs no malformed-markup recovery
(lxml rebalances bad nesting; we return None exactly when parsing raises),
and the English stop list is our own function-word list rather than
justext's shipped file (classification thresholds identical).
"""

from __future__ import annotations

from nemo_curator_spark.operators import justext_like as J

# -- fixtures (verbatim from the reference test suite) ------------------------

ENGLISH_HTML = """<!doctype html>
        <head>
            <title>My Title</title>
            <meta charset="utf-8">
            <style>* { margin: 0; }</style>
        </head>
        <body>
            <section id="wrapper">
                <nav>
                    <ul>
                        <li>Nav 1</li>
                        <li>
                            <p>Nav 2</p>
                            <ul>
                                <li><p>Nav 3</p></li>
                            </ul>
                        </li>
                    </ul>
                </nav>
                <main>
                    This is a sample paragraph. In it we write words.
                    These are stopwords: because did than has near we almost while what still.
                    <a href="#foo" hidden>bar</a>

                    <p>
                    This paragraph doesn't have many stopwords. Remove it.
                    <br>Let's keep this paragraph: either came does last new took taken making became from.
                    </p>

                    <button aria-hidden="true">Click here</button>
                    <input type="hidden" value="foo">
                    <input type="text" value="Some text" placeholder="Insert text">
                    <input type="text" placeholder="Insert text">
                    <img src="" alt="Some image">
                    <object data="" class="some-class hidden">Cannot display object</object>
                </main>
                <script language="vbscript" type="text/vbscript">MsgBox("Hello World!")</script>
                <noscript>Sorry, your browser doesn't support VB Script!</noscript>
                <div><div><div><footer id="global-footer">
                    Copyright (C) 2021 Foo Bar
                </footer></div></div></div>
            </section>
        </body>
    </html>"""

ENGLISH_EXPECTED = [
    "Nav 1",
    "Nav 2",
    "Nav 3",
    "This is a sample paragraph. In it we write words.\nThese are stopwords: because did than has near we almost while what still.\nbar",
    "This paragraph doesn't have many stopwords. Remove it.\nLet's keep this paragraph: either came does last new took taken making became from.",
    "Cannot display object\nSorry, your browser doesn't support VB Script!",
    "Copyright (C) 2021 Foo Bar",
]

SIMPLE_HTML = (
    "<html><body><p>Common Crawl test paragraph for extraction. Four score "
    "and seven years ago our fathers brought forth on this continent a new "
    "nation, conceived in liberty, and dedicated to the proposition that "
    "all men are created equal.</p></body></html>"
)
SIMPLE_EXPECTED = [
    "Common Crawl test paragraph for extraction. Four score and seven years "
    "ago our fathers brought forth on this continent a new nation, conceived "
    "in liberty, and dedicated to the proposition that all men are created "
    "equal.",
]

THAI_HTML = """<!doctype html>
            <head>
                <title>ชื่อเรื่องของฉัน</title>
            </head>
            <body>
                    <main>
                        นี่คือตัวอย่างย่อหน้า ในนั้นเราเขียนคำต่างๆ
                        เหล่านี้เป็นคำหยุด: เพราะว่า ทำ กว่า มี ใกล้ เรา เกือบจะ ขณะที่ อะไร ยังคง

                        <p>
                        ย่อหน้านี้ไม่มีคำหยุดมากนัก ลบออก
                        <br>เรามาเก็บย่อหน้าไว้ดังนี้: ไม่ว่าจะมาทำอะไรใหม่ ๆ ก็เกิดขึ้น เกิดขึ้นจาก
                        </p>

                    </main>
            </body>
        </html>"""
THAI_EXPECTED = [
    "นี่คือตัวอย่างย่อหน้า ในนั้นเราเขียนคำต่างๆ\nเหล่านี้เป็นคำหยุด: เพราะว่า ทำ กว่า มี ใกล้ เรา เกือบจะ ขณะที่ อะไร ยังคง",
    "ย่อหน้านี้ไม่มีคำหยุดมากนัก ลบออก\nเรามาเก็บย่อหน้าไว้ดังนี้: ไม่ว่าจะมาทำอะไรใหม่ ๆ ก็เกิดขึ้น เกิดขึ้นจาก",
]

CHINESE_HTML = """<!doctype html>
            <head>
                <title>我的标题</title>
            </head>
            <body>
                    <main>
                        这是一个示例段落。我们在其中写下单词。

                        <p>
                        本段落没有太多停用词。请将其删除。
                        <br>让我们保留这一段：要么来了，要么最后来了，要么新来了，要么采取了行动。
                        </p>

                    </main>
            </body>
        </html>"""
CHINESE_EXPECTED = [
    "这是一个示例段落。我们在其中写下单词。",
    "本段落没有太多停用词。请将其删除。\n让我们保留这一段：要么来了，要么最后来了，要么新来了，要么采取了行动。",
]

JAPANESE_HTML = """<!doctype html>
            <head>
                <title>私のタイトル</title>
            </head>
            <body>
                    <main>
                        これはサンプルの段落です。ここに単語を書き込みます。

                        <p>
                        この段落にはストップワードがあまりありません。削除してください。
                        <br>この段落を維持しましょう: どちらかが来て、最後に新しいものを取って、作成し、なったのです。
                        </p>

                    </main>
            </body>
        </html>"""
JAPANESE_EXPECTED = [
    "これはサンプルの段落です。ここに単語を書き込みます。",
    "この段落にはストップワードがあまりありません。削除してください。\nこの段落を維持しましょう: どちらかが来て、最後に新しいものを取って、作成し、なったのです。",
]

KOREAN_HTML = """<!doctype html>
            <head>
                <title>내 제목</title>
            </head>
            <body>
                    <main>
                        이것은 샘플 문단입니다. 여기에 단어를 적습니다.
                        이것들은 불용어입니다: 왜냐하면, 했으므로, 보다, 가까이에, 우리, 거의, 동안, 무엇, 아직도.

                        <p>
                        이 문단에는 불용어가 많지 않습니다. 제거하세요.
                        <br>이 문단을 유지해 보겠습니다: 왔거나 마지막이거나 새로운 것이거나 가져갔거나 만들어지거나 되었거나에서 왔습니다.
                        </p>

                    </main>
            </body>
        </html>"""
KOREAN_EXPECTED = [
    "이것은 샘플 문단입니다. 여기에 단어를 적습니다.\n이것들은 불용어입니다: 왜냐하면, 했으므로, 보다, 가까이에, 우리, 거의, 동안, 무엇, 아직도.",
    "이 문단에는 불용어가 많지 않습니다. 제거하세요.\n이 문단을 유지해 보겠습니다: 왔거나 마지막이거나 새로운 것이거나 가져갔거나 만들어지거나 되었거나에서 왔습니다.",
]


def test_english_golden_all_paragraphs():
    # reference: JusTextExtractor(is_boilerplate=False) -> every paragraph
    result = J.extract_text(
        ENGLISH_HTML, J.ENGLISH_STOPWORDS, "ENGLISH", is_boilerplate=False
    )
    assert result == ENGLISH_EXPECTED


def test_simple_english_golden_boilerplate_on():
    result = J.extract_text(SIMPLE_HTML, J.ENGLISH_STOPWORDS, "ENGLISH")
    assert result == SIMPLE_EXPECTED


def test_thai_golden():
    assert J.extract_text(THAI_HTML, frozenset(), "THAI") == THAI_EXPECTED


def test_chinese_golden():
    assert J.extract_text(CHINESE_HTML, frozenset(), "CHINESE") == CHINESE_EXPECTED


def test_japanese_golden():
    assert J.extract_text(JAPANESE_HTML, frozenset(), "JAPANESE") == JAPANESE_EXPECTED


def test_korean_golden():
    assert J.extract_text(KOREAN_HTML, frozenset(), "KOREAN") == KOREAN_EXPECTED


def test_boilerplate_classification_drops_nav():
    # with the boilerplate check ON, every paragraph in this fixture dies:
    # the content paragraphs are <=200 chars (can never be context-free
    # good) and sit between bad nav/footer blocks — which is exactly why
    # the reference's own test runs this fixture with is_boilerplate=False
    result = J.extract_text(ENGLISH_HTML, J.ENGLISH_STOPWORDS, "ENGLISH")
    assert result == []
    # lengthen the stopword-dense paragraph past length_high and it
    # classifies good while nav/footer stay boilerplate
    grown = ENGLISH_HTML.replace(
        "In it we write words.",
        "In it we write words, and then we write many more words so that "
        "the paragraph grows past the two hundred character high-confidence "
        "threshold that the algorithm uses for good blocks.",
    )
    result = J.extract_text(grown, J.ENGLISH_STOPWORDS, "ENGLISH")
    assert any("high-confidence" in p for p in result)
    for nav in ("Nav 1", "Nav 2", "Nav 3"):
        assert not any(nav == p for p in result)
    assert not any("Copyright" in p for p in result)


def test_parse_failure_returns_none(monkeypatch):
    class Boom(J._Segmenter):
        def feed(self, data):
            raise ValueError("boom")

    monkeypatch.setattr(J, "_Segmenter", Boom)
    assert J.extract_text("<p>x</p>", frozenset(), "ENGLISH") is None


def test_heading_flag_and_promotion():
    long_good = (
        "This is a long and very stopword dense paragraph because it has "
        "the and of and to and in and that and with and for and was and "
        "are and this and from and they and have and been and which and "
        "more and will and would and could and should make it clearly good."
    )
    html = f"<body><h2>Short Head</h2><p>{long_good}</p><div>tail</div></body>"
    paras = J.segment_paragraphs(html)
    texts = [p.text for p in paras]
    assert texts == ["Short Head", long_good, "tail"]
    # only the <h2> block carries the heading flag (the paragraph AFTER
    # </h2> must not — regression for the depth/flush ordering)
    assert [p.heading for p in paras] == [True, False, False]
    # context-sensitive promotion: the short heading survives next to good
    result = J.extract_text(html, J.ENGLISH_STOPWORDS, "ENGLISH")
    assert result == ["Short Head", long_good]


# --- resiliparse / trafilatura stand-ins (html_extract_like.py) -------------
# Reference fixture expectations from
# tests/stages/text/download/test_html_extractors_implementation.py:
# resiliparse :105-111 (en), :130-133 (simple), :172-177 (th), :219-224
# (zh), :270-275 (ja), :316-321 (ko); trafilatura :102-111, :134-137,
# :178-185, :225-230, :276-283, :322-329.

from nemo_curator_spark.operators import html_extract_like as HX

RESILIPARSE_ENGLISH_EXPECTED = [
    "This is a sample paragraph. In it we write words. These are stopwords: because did than has near we almost while what still.",
    "Let's keep this paragraph: either came does last new took taken making became from.",
]
RESILIPARSE_THAI_EXPECTED = [
    "นี่คือตัวอย่างย่อหน้า ในนั้นเราเขียนคำต่างๆ เหล่านี้เป็นคำหยุด: เพราะว่า ทำ กว่า มี ใกล้ เรา เกือบจะ ขณะที่ อะไร ยังคง",
    "ย่อหน้านี้ไม่มีคำหยุดมากนัก ลบออก",
    "เรามาเก็บย่อหน้าไว้ดังนี้: ไม่ว่าจะมาทำอะไรใหม่ ๆ ก็เกิดขึ้น เกิดขึ้นจาก",
]
RESILIPARSE_CHINESE_EXPECTED = [
    "这是一个示例段落。我们在其中写下单词。",
    "本段落没有太多停用词。请将其删除。",
    "让我们保留这一段：要么来了，要么最后来了，要么新来了，要么采取了行动。",
]
RESILIPARSE_JAPANESE_EXPECTED = [
    "これはサンプルの段落です。ここに単語を書き込みます。",
    "この段落にはストップワードがあまりありません。削除してください。",
    "この段落を維持しましょう: どちらかが来て、最後に新しいものを取って、作成し、なったのです。",
]
RESILIPARSE_KOREAN_EXPECTED = [
    "이것은 샘플 문단입니다. 여기에 단어를 적습니다. 이것들은 불용어입니다: 왜냐하면, 했으므로, 보다, 가까이에, 우리, 거의, 동안, 무엇, 아직도.",
    "이 문단에는 불용어가 많지 않습니다. 제거하세요.",
    "이 문단을 유지해 보겠습니다: 왔거나 마지막이거나 새로운 것이거나 가져갔거나 만들어지거나 되었거나에서 왔습니다.",
]


def test_resiliparse_goldens_exact():
    cases = [
        (ENGLISH_HTML, "ENGLISH", RESILIPARSE_ENGLISH_EXPECTED),
        (SIMPLE_HTML, "ENGLISH", SIMPLE_EXPECTED),
        (THAI_HTML, "THAI", RESILIPARSE_THAI_EXPECTED),
        (CHINESE_HTML, "CHINESE", RESILIPARSE_CHINESE_EXPECTED),
        (JAPANESE_HTML, "JAPANESE", RESILIPARSE_JAPANESE_EXPECTED),
        (KOREAN_HTML, "KOREAN", RESILIPARSE_KOREAN_EXPECTED),
    ]
    for html, lang, expected in cases:
        got = HX.resiliparse_extract_text(
            html, HX.density_stopwords(lang), lang
        )
        assert got == expected, (lang, got)


def test_trafilatura_goldens_english_exact():
    # reference passes TrafilaturaExtractor(min_extracted_size=10,
    # min_duplcheck_size=10, max_repetitions=1, deduplicate=True)
    got = HX.trafilatura_extract_text(
        ENGLISH_HTML,
        HX.density_stopwords("ENGLISH"),
        "ENGLISH",
        min_extracted_size=10,
        min_duplcheck_size=10,
        max_repetitions=1,
    )
    assert got == [
        "Let's keep this paragraph: either came does last new took taken making became from.",
    ]
    got = HX.trafilatura_extract_text(
        SIMPLE_HTML, HX.density_stopwords("ENGLISH"), "ENGLISH"
    )
    assert got == SIMPLE_EXPECTED


def test_trafilatura_goldens_chinese_exact():
    got = HX.trafilatura_extract_text(
        CHINESE_HTML, frozenset(), "CHINESE"
    )
    assert got == RESILIPARSE_CHINESE_EXPECTED  # identical list in the ref


def test_trafilatura_cjk_deviation_pinned():
    """th/ja/ko: the reference library duplicates each <p> paragraph and
    drops the loose text; the stand-in emits the fallback extraction once
    (loose included). Pin the stand-in's output AND assert the paragraph
    SETS of <p> content agree with the reference's."""
    ref_paras = {
        "THAI": [
            "ย่อหน้านี้ไม่มีคำหยุดมากนัก ลบออก",
            "เรามาเก็บย่อหน้าไว้ดังนี้: ไม่ว่าจะมาทำอะไรใหม่ ๆ ก็เกิดขึ้น เกิดขึ้นจาก",
        ],
        "JAPANESE": [
            "この段落にはストップワードがあまりありません。削除してください。",
            "この段落を維持しましょう: どちらかが来て、最後に新しいものを取って、作成し、なったのです。",
        ],
        "KOREAN": [
            "이 문단에는 불용어가 많지 않습니다. 제거하세요.",
            "이 문단을 유지해 보겠습니다: 왔거나 마지막이거나 새로운 것이거나 가져갔거나 만들어지거나 되었거나에서 왔습니다.",
        ],
    }
    fixtures = {
        "THAI": (THAI_HTML, RESILIPARSE_THAI_EXPECTED),
        "JAPANESE": (JAPANESE_HTML, RESILIPARSE_JAPANESE_EXPECTED),
        "KOREAN": (KOREAN_HTML, RESILIPARSE_KOREAN_EXPECTED),
    }
    for lang, (html, standin_expected) in fixtures.items():
        got = HX.trafilatura_extract_text(html, frozenset(), lang)
        assert got == standin_expected, (lang, got)
        assert set(ref_paras[lang]) <= set(got), lang


def test_extract_text_bytes_dispatches_all_algorithms():
    from nemo_curator_spark.operators import extraction

    raw = SIMPLE_HTML.encode()
    for algo in ("simple", "justext", "resiliparse", "trafilatura"):
        out = extraction.extract_text_bytes(raw, algorithm=algo)
        assert out is not None and "Common Crawl test paragraph" in out, algo

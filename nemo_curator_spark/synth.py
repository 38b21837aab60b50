"""Deterministic synthetic web_pages corpus (FIXTURES.md F1).

Generates the north-rule input table ``(url STRING, warc_ts TIMESTAMP,
html BINARY, text STRING, lang STRING)`` — Common-Crawl-style pages with

* Zipf-skewed hosts (a few hosts own a large share of rows → exercises the
  salted-repartition path),
* an HTML rendering of each text (nav/header/footer boilerplate around the
  body paragraphs) whose extraction must recover ``text`` byte-identically,
* a stratified row mix so every heuristic rule fires on a known subset,
* ~80% EN plus zh/ja/th/pt rows, and a slice of latin-1 / shift-jis
  encodings to exercise the charset-detection fallback.

Everything derives from one integer seed; no external data.
"""

from __future__ import annotations

import html as html_mod
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

# vocabulary skewed toward the common-English stopword set so clean prose
# passes the common_english_words rule
_VOCAB = (
    "the be to of and that have with river mountain forest morning evening "
    "walk bright quiet small large house garden window light water stone "
    "road bird tree cloud wind rain summer winter story people child friend "
    "teacher school market bread coffee music paper letter phone city "
    "village train journey moment memory silence laughter question answer "
    "problem idea plan work rest dream night day hand heart voice"
).split()

_ZH_SENTS = ["另一方面这是一个好的中文文档", "我喜欢学习中文", "今天天气很好我们去公园散步", "他们在图书馆里安静地看书"]
_JA_SENTS = ["私は日本語のテキストを分割します", "猫が静かに寝ています", "今日はとても良い天気です", "彼らは図書館で本を読んでいます"]
_TH_SENTS = ["วันนี้อากาศดีมาก", "ฉันชอบอ่านหนังสือ", "พวกเขาเดินไปที่ตลาด", "แม่น้ำไหลผ่านหมู่บ้าน"]
_PT_SENTS = [
    "O rio corre devagar perto da aldeia durante a manhã",
    "Eles caminharam até o mercado para comprar pão e café",
    "A professora leu uma história para as crianças na escola",
    "O vento frio soprava sobre as montanhas ao anoitecer",
]

HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="{charset}"><title>{title}</title></head>
<body>
<nav><a href="/">Home</a> | <a href="/about">About</a> | <a href="/contact">Contact</a></nav>
<header><h1>{title}</h1></header>
<main>
{paragraphs}
</main>
<footer><p class="boiler">Copyright 2024 Example Corp. Terms of service apply.</p></footer>
</body></html>"""


def _clean_sentence(rng: np.random.RandomState, n_words: int) -> str:
    ws = list(rng.choice(_VOCAB, size=n_words))
    # guarantee >=2 common english words and healthy mean word length
    ws[0] = "the"
    ws[-1] = "and" if n_words > 1 else "the"
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def _clean_doc(rng: np.random.RandomState, min_words: int = 60) -> str:
    paras = []
    total = 0
    while total < min_words:
        lines = []
        for _ in range(int(rng.randint(2, 5))):
            n = int(rng.randint(8, 16))
            lines.append(_clean_sentence(rng, n))
            total += n
        paras.append("\n".join(lines))
    return "\n\n".join(paras)


def _dirty_doc(rng: np.random.RandomState, kind: str) -> str:
    base = _clean_doc(rng, 60)
    if kind == "short":
        return _clean_sentence(rng, int(rng.randint(3, 20)))
    if kind == "symbols":
        return " ".join(["###", "...", "#"] * 30)
    if kind == "digits":
        return " ".join(str(rng.randint(0, 10**9)) for _ in range(80))
    if kind == "urls":
        url = "https://spam.example.com/offer?id=" + str(rng.randint(10**8))
        return " ".join([url] * 20)
    if kind == "whitespace":
        return ("word" + " " * 12) * 50
    if kind == "parens":
        return "(((" + base[:200] + ")))" + "()" * 60
    if kind == "boilerplate":
        paras = ["privacy policy here", "terms of use apply", "uses cookies"]
        return "\n\n".join(paras * 2)
    if kind == "lorem":
        return "Lorem ipsum dolor sit amet\n\n" + base[:200]
    if kind == "repeated_lines":
        line = _clean_sentence(rng, 10)
        return "\n".join([line] * 20)
    if kind == "repeated_paras":
        para = _clean_sentence(rng, 12)
        return "\n\n".join([para] * 10)
    if kind == "top_ngram":
        phrase = "buy cheap deals now"
        return " ".join([phrase] * 40)
    if kind == "dup_ngram":
        s1 = _clean_sentence(rng, 12)[:-1]
        return " ".join([s1, s1, s1, s1, s1])
    if kind == "no_alpha":
        return " ".join(["12345", "67890", "!!!", "$$$"] * 25)
    if kind == "caps":
        return " ".join(w.upper() for w in base.split())
    if kind == "porn_url":
        return base + " see https://porn.example.com/x now"
    if kind == "bullets":
        return "\n".join("• item " + str(i) for i in range(20))
    if kind == "long_word":
        return base + " " + "x" * 1500
    if kind == "ellipsis":
        lines = [_clean_sentence(rng, 8)[:-1] + "..." for _ in range(10)]
        return "\n".join(lines)
    if kind == "pii":
        return (
            base
            + "\nContact john.doe@example.com or +1 (555) 123-4567."
            + "\nServer 192.168.1.100 badword1."
        )
    return base


DIRTY_KINDS = (
    "short symbols digits urls whitespace parens boilerplate lorem "
    "repeated_lines repeated_paras top_ngram dup_ngram no_alpha caps "
    "porn_url bullets long_word ellipsis pii"
).split()


def _render_html(text: str, title: str, charset: str) -> bytes:
    paras = "\n".join(
        "<p>" + html_mod.escape(p).replace("\n", "<br/>") + "</p>"
        for p in text.split("\n\n")
    )
    doc = HTML_TEMPLATE.format(charset=charset, title=html_mod.escape(title), paragraphs=paras)
    return doc.encode(charset, errors="strict")


def generate_web_pages(n_rows: int, seed: int = 42, offset: int = 0) -> pd.DataFrame:
    """Deterministic web_pages DataFrame; duplicate rows (~2%) included for
    dedup exercises. ``offset`` shifts url/timestamp numbering so chunked
    parallel generation yields globally-unique urls."""
    rng = np.random.RandomState(seed)
    base_ts = datetime(2024, 3, 1, tzinfo=timezone.utc) + timedelta(seconds=offset)

    # Zipf-ish host skew over 1000 hosts
    hosts = np.minimum(rng.zipf(1.3, size=n_rows) - 1, 999)
    tlds = rng.choice(["com", "org", "net", "io"], size=n_rows)

    rows = []
    for i in range(n_rows):
        r = rng.rand()
        lang = "en"
        charset = "utf-8"
        if r < 0.62:
            text = _clean_doc(rng)
        elif r < 0.80:
            kind = DIRTY_KINDS[int(rng.randint(len(DIRTY_KINDS)))]
            text = _dirty_doc(rng, kind)
        elif r < 0.86:
            lang = "zh"
            text = "\n\n".join(rng.choice(_ZH_SENTS, 3))
        elif r < 0.90:
            lang = "ja"
            text = "\n\n".join(rng.choice(_JA_SENTS, 3))
            if rng.rand() < 0.5:
                charset = "shift-jis"
        elif r < 0.94:
            lang = "th"
            text = "\n\n".join(rng.choice(_TH_SENTS, 3))
        else:
            lang = "pt"
            text = "\n\n".join(rng.choice(_PT_SENTS, 4))
            if rng.rand() < 0.5:
                charset = "latin-1"
        if i > 0 and rng.rand() < 0.02:
            # exact duplicate of an earlier row's text
            text, lang, charset = rows[int(rng.randint(i))][3], "en", "utf-8"
        url = f"https://host{hosts[i]}.example.{tlds[i]}/path/{offset + i}"
        ts = base_ts + timedelta(seconds=int(i))
        title = f"Page {offset + i}"
        try:
            html = _render_html(text, title, charset)
        except (UnicodeEncodeError, LookupError):
            charset = "utf-8"
            html = _render_html(text, title, charset)
        rows.append((url, ts, html, text, lang))

    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


WEB_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def ensure_web_pages_parquet(
    spark,
    path: str,
    n_rows: int,
    seed: int = 42,
    chunk_size: int = 2000,
) -> str:
    """Generate the corpus in parallel (one seeded chunk per Spark task,
    deterministic regardless of parallelism) and cache it as parquet.
    Skips generation when the cache already holds ``n_rows``."""
    import os

    if os.path.isdir(path):
        try:
            if spark.read.parquet(path).count() == n_rows:
                return path
        except Exception:
            pass

    n_chunks = max(1, (n_rows + chunk_size - 1) // chunk_size)
    sizes = [
        min(chunk_size, n_rows - i * chunk_size) for i in range(n_chunks)
    ]
    meta = spark.createDataFrame(
        [(i, sizes[i], i * chunk_size) for i in range(n_chunks)],
        "chunk int, n int, offset long",
    ).repartition(n_chunks)

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield generate_web_pages(
                    int(row["n"]), seed=seed + int(row["chunk"]),
                    offset=int(row["offset"]),
                )

    df = meta.mapInPandas(gen, schema=WEB_PAGES_SCHEMA)
    # spread the cache over >= 2x-the-box file count: parquet splits can't
    # cross row-group boundaries, so a 17-file cache caps every downstream
    # scan at 17 tasks (measured ~5-6 effective cores on local[32] — the
    # whole chain was parallelism-starved, not compute-bound). Content is
    # unchanged (per-row data depends only on chunk seed/offset).
    df = df.repartition(max(64, n_chunks))
    df.write.mode("overwrite").parquet(path)
    return path


def write_web_pages_parquet(path: str, n_rows: int, seed: int = 42) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_web_pages(n_rows, seed)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    pq.write_table(table, path)
    return path

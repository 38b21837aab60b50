"""ArXiv iterator + LaTeX extractor (reference arxiv/iterator.py:28-160,
extract.py:28-205 — RedPajama recipe semantics)."""

from __future__ import annotations

import gzip
import io
import tarfile

from nemo_curator_spark.operators import arxiv

TEX = r"""\documentclass{article}
\newcommand{\model}{SparkNet}
\def\dataset{WebCorpus}
% preamble comment
\begin{document}
\maketitle
Abstract text before the first section is dropped.
\section{Introduction}
We present \model{} trained on \dataset . % trailing comment
% a full-line comment
Real content line.
\subsection{Details}
More content.
\appendix
Appendix content is dropped.
\end{document}
"""


def test_clean_tex_pipeline():
    macros = arxiv.build_non_arg_macros(TEX)
    assert macros == {"\\\\model": "SparkNet", "\\\\dataset": "WebCorpus"}
    cleaned = arxiv.extract_paper([TEX])
    assert cleaned.startswith("\\section{Introduction}")
    assert "Abstract text" not in cleaned          # pre-section cut
    assert "SparkNet{} trained on WebCorpus ." in cleaned  # macros expanded
    assert "full-line comment" not in cleaned      # line comments stripped
    assert "trailing comment" not in cleaned       # inline comments stripped
    assert "Appendix content" not in cleaned       # post-\appendix cut
    # a file with no section-like header extracts to nothing
    assert arxiv.extract_paper(["\\documentclass{article} no sections"]) is None


def test_format_arxiv_id():
    assert arxiv.format_arxiv_id("2203.05556") == "2203.05556"
    assert arxiv.format_arxiv_id("astro-ph0001001") == "astro-ph/0001001"
    assert arxiv.format_arxiv_id("hep-th9901001") == "hep-th/9901001"


def _inner_gz(tex: str) -> bytes:
    return gzip.compress(tex.encode())


def _inner_tar(texs: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, tex in texs.items():
            data = tex.encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _outer_tar(tmp_path, members: dict[str, bytes]) -> str:
    p = tmp_path / "arXiv_src_2203_001.tar"
    with tarfile.open(p, "w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return str(p)


def test_iterate_archive(tmp_path):
    path = _outer_tar(
        tmp_path,
        {
            "2203/2203.05556.gz": _inner_gz(TEX),
            "2203/astro-ph0001001.gz": _inner_tar(
                {"main.tex": TEX, "notes.txt": "ignored", "extra.tex": TEX}
            ),
            "2203/2203.99999.gz": b"\x00not a valid payload",
        },
    )
    records = list(arxiv.iterate_archive(path))
    by_id = {r["id"]: r for r in records}
    # broken payload: gzip fails -> skipped
    assert set(by_id) == {"2203.05556", "astro-ph/0001001"}
    assert len(by_id["astro-ph/0001001"]["content"]) == 2  # .tex members only
    assert by_id["2203.05556"]["source_id"] == "arXiv_src_2203_001.tar"


def test_arxiv_to_rows_spark(spark, tmp_path):
    _outer_tar(tmp_path, {"2203/2203.05556.gz": _inner_gz(TEX)})
    df = arxiv.arxiv_to_rows(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["id"] == "2203.05556"
    assert rows[0]["text"].startswith("\\section{Introduction}")

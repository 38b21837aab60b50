"""ArXiv LaTeX source iteration + extraction (reference
stages/text/download/arxiv/iterator.py:28-160, extract.py:28-205 — the
RedPajama arXiv recipe; pure stdlib there too, so semantics are mirrored
exactly).

Iterator: an arXiv bulk archive is a tar of per-paper files, each either a
gzip'd single .tex or a tar of project files; yields
``{id, source_id, content: list[tex strings]}`` with the arXiv id
reformatted to ``archive/NNNN`` / ``YYMM.NNNNN`` spec form, skipping
papers that fail to decode (utf-8 strict, like the reference).

Extractor: per paper, collect ``\\newcommand``/``\\def`` macros without
arguments across all tex files, then per file: cut everything before the
first section-like header (no header -> drop the file), strip line and
trailing comments, cut from ``\\appendix``/bibliography to the end,
inline-expand the collected macros; join files with a newline; None when
nothing survives (row dropped).
"""

from __future__ import annotations

import gzip
import io
import re
import tarfile
from collections.abc import Iterator

_NEWCOMMAND_RE = re.compile(
    r"\\\bnewcommand\b\*?\{(\\[a-zA-Z0-9]+?)\}\{(.*?)\}$", re.M
)
_DEF_RE = re.compile(r"\\def\s*(\\[a-zA-Z0-9]+?)\s*\{(.*?)\}$", re.M)

_SECTION_PATTERN = (
    r"^(.*?)("
    r"\\\bchapter\b\*?(?:\[(.*?)\])?\{(.*?)\}|"
    r"\\\bpart\b\*?(?:\[(.*?)\])?\{(.*?)\}|"
    r"\\\bsection\b\*?(?:\[(.*?)\])?\{(.*?)\}|"
    r"\\\bsubsection\b\*?(?:\[(.*?)\])?\{(.*?)\}|"
    r"\\\bsubsubsection\b\*?(?:\[(.*?)\])?\{(.*?)\}|"
    r"\\\bparagraph\b\*?(?:\[(.*?)\])?\{(.*?)\}"
    r"\\\bsubparagraph\b\*?(?:\[(.*?)\])?\{(.*?)\}"
    r")"
)
_LINE_COMMENT_RE = re.compile(r"(?m)^%.*\n?", re.M)
_INLINE_COMMENT_RE = re.compile(r"[^\\]%.+$", re.M)
_BIB_PATTERN = (
    r"("
    r"\\appendix|"
    r"\\begin\{references\}|"
    r"\\begin\{REFERENCES\}|"
    r"\\begin\{thebibliography\}|"
    r"\\bibliography\{.*\}"
    r").*$"
)
_ARXIV_ID_RE = re.compile(r"^([a-zA-Z-]*)([\d\.]+)$")


def build_non_arg_macros(file_content: str) -> dict[str, str]:
    """{macro_name: value} for argument-less \\newcommand / \\def."""
    macros: dict[str, str] = {}
    for reg in (_NEWCOMMAND_RE, _DEF_RE):
        for m in reg.finditer(file_content):
            name = m.group(1).encode("unicode-escape").decode("utf-8")
            val = m.group(2).encode("unicode-escape").decode("utf-8")
            macros[name] = val
    return macros


def clean_tex(file_content: str, non_arg_macros: dict[str, str]) -> str:
    if not re.search(_SECTION_PATTERN, file_content, flags=re.S):
        return ""
    file_content = re.sub(_SECTION_PATTERN, r"\2", file_content, flags=re.S)
    file_content = _LINE_COMMENT_RE.sub("", file_content)
    file_content = _INLINE_COMMENT_RE.sub("", file_content)
    file_content = re.sub(_BIB_PATTERN, "", file_content, flags=re.S)
    for name, val in non_arg_macros.items():
        file_content = re.sub(
            r"(" + name + r")([^a-zA-Z0-9])", val + r"\2", file_content
        )
    return file_content


def extract_paper(content: list[str]) -> str | None:
    """Cleaned, newline-joined paper text; None when nothing survives."""
    if not content:
        return None
    macros: dict[str, str] = {}
    for tex in content:
        macros.update(build_non_arg_macros(tex))
    try:
        joined = "\n".join(clean_tex(tex, macros) for tex in content)
    except Exception:
        return None
    return joined if joined else None


def format_arxiv_id(arxiv_id: str) -> str:
    """Spec-compliant id: <archive>/<digits> pre-2007, bare YYMM.NNNNN after."""
    m = _ARXIV_ID_RE.search(arxiv_id)
    if m is None:
        raise ValueError(f"Invalid arxiv id: {arxiv_id}")
    return m.group(2) if m.group(1) == "" else f"{m.group(1)}/{m.group(2)}"


def load_tex_project(data: bytes) -> list[str] | None:
    """Per-paper payload: tar-of-.tex members or gzip'd single tex.
    None when undecodable (paper skipped, like the reference)."""
    try:
        with tarfile.open(fileobj=io.BytesIO(data)) as tf:
            out = []
            for member in tf.getmembers():
                if member.name.endswith(".tex"):
                    raw = tf.extractfile(member).read()
                    try:
                        out.append(raw.decode("utf-8"))
                    except UnicodeDecodeError:
                        return None
            return out
    except tarfile.ReadError:
        pass
    except Exception:
        return None
    try:
        raw = gzip.decompress(data)
        return [raw.decode("utf-8")]
    except Exception:
        return None


def iterate_archive(file_path: str) -> Iterator[dict]:
    """Outer bulk tar -> one record per paper (reference iterate contract)."""
    import os

    bname = os.path.split(file_path)[-1]
    with tarfile.open(file_path) as tf:
        for member in tf.getmembers():
            if not member.isfile():
                continue
            data = tf.extractfile(member).read()
            content = load_tex_project(data)
            raw_id = os.path.splitext(os.path.split(member.name)[-1])[0]
            try:
                clean_id = format_arxiv_id(raw_id)
            except ValueError:
                clean_id = raw_id
            if content is None:
                continue
            yield {"id": clean_id, "source_id": bname, "content": content}


def arxiv_to_rows(spark, paths: str | list[str]):
    """Bulk archive(s) -> DataFrame(id, source_id, text): binaryFile scan ->
    mapInPandas fan-out with extraction fused; papers whose cleaned text is
    empty are dropped (reference extract() None contract)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(paths)

    def fan(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                bname = r["path"].split("/")[-1]
                with tarfile.open(fileobj=io.BytesIO(bytes(r["content"]))) as tf:
                    for member in tf.getmembers():
                        if not member.isfile():
                            continue
                        content = load_tex_project(tf.extractfile(member).read())
                        if content is None:
                            continue
                        raw_id = member.name.split("/")[-1].rsplit(".", 1)[0]
                        try:
                            clean_id = format_arxiv_id(raw_id)
                        except ValueError:
                            clean_id = raw_id
                        text = extract_paper(content)
                        if text:
                            rows.append(
                                {"id": clean_id, "source_id": bname, "text": text}
                            )
            cols = ["id", "source_id", "text"]
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
            )

    return files.select("path", "content").mapInPandas(
        fan, schema="id string, source_id string, text string"
    )

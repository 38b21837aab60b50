"""Misc text operators: token counting, fingerprinting, AddId,
DocumentSplitter / DocumentJoiner (SURVEY.md §2.4 #27, §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from nemo_curator_spark import constants as C

# BPE-ish tokenizer: word pieces OR single non-space symbols. Valid in Java
# regex and RE2.
# \s differs between Java ([\t\n\x0b\f\r ]) and RE2 (no \x0b!) — use the
# harmonized isspace set so both engines count identically.
TOKEN_PATTERN = r"[A-Za-z]+|\p{Nd}+|[^" + C.ISPACE_CHARS + r"A-Za-z\p{Nd}]"


def token_count(text: Column, pattern: str = TOKEN_PATTERN) -> Column:
    """Token count via a BPE-ish regex (reference TokenCountFilter shape,
    filters/token/token_count.py:23-93, with a regex tokenizer standing in
    for the HF tokenizer, which is not available in this environment)."""
    return F.regexp_count(text, F.lit(pattern)).cast("long")


def duck_token_count_sql(col: str, pattern: str = TOKEN_PATTERN) -> str:
    pat = pattern.replace("'", "''")
    return f"CAST(len(regexp_extract_all({col}, '{pat}')) AS BIGINT)"


def whitespace_token_count(text: Column) -> Column:
    stripped = F.regexp_replace(text, C.STRIP_PATTERN, "")
    return F.when(stripped == "", F.lit(0)).otherwise(
        F.size(F.split(stripped, C.SPLIT_PATTERN))
    ).cast("long")


_UPPER_ASCII = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER_ASCII = "abcdefghijklmnopqrstuvwxyz"


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    ASCII-casefolded text — stable under formatting-only edits.

    Casefolding is ASCII-only via ``translate`` (not ``lower``) because
    JVM and DuckDB ``lower`` disagree on locale-sensitive mappings (Greek
    final sigma, dotted capital I) — translate is a pure char map with
    identical semantics in both engines."""
    normalized = F.translate(
        F.regexp_replace(
            F.regexp_replace(text, C.SPLIT_PATTERN, " "), C.STRIP_PATTERN, ""
        ),
        _UPPER_ASCII,
        _LOWER_ASCII,
    )
    return F.md5(normalized)


def duck_fingerprint_sql(col: str) -> str:
    normalized = (
        f"translate(regexp_replace(regexp_replace({col}, '{C.SPLIT_PATTERN}', ' ', 'g'), "
        f"'{C.STRIP_PATTERN}', '', 'g'), '{_UPPER_ASCII}', '{_LOWER_ASCII}')"
    )
    return f"md5({normalized})"


def add_id(
    df: DataFrame,
    id_col: str = "id",
    prefix: str = "doc",
    key_col: str | None = None,
    overwrite: bool = False,
) -> DataFrame:
    """AddId (reference modules/add_id.py:24-81). The reference id is
    positional (`{prefix}_{task_id}_{row_idx}`) and therefore
    order-dependent; with a ``key_col`` we emit the order-independent
    `{prefix}_{xxhash64(key)}` form instead (SURVEY.md §7.3.2)."""
    if id_col in df.columns and not overwrite:
        raise ValueError(f"column {id_col} already exists")
    if key_col:
        val = F.concat(F.lit(prefix + "_"), F.xxhash64(F.col(key_col)).cast("string"))
    else:
        val = F.concat(
            F.lit(prefix + "_"),
            F.spark_partition_id().cast("string"),
            F.lit("_"),
            F.monotonically_increasing_id().cast("string"),
        )
    return df.withColumn(id_col, val)


def split_documents(
    df: DataFrame,
    text_col: str = "text",
    separator: str = "\n\n",
    segment_col: str = "segment_id",
) -> DataFrame:
    """DocumentSplitter (modules/splitter.py:22-96): split on separator →
    one row per segment with per-doc segment index (posexplode)."""
    other = [c for c in df.columns if c != text_col]
    return df.select(
        *other,
        F.posexplode(F.split(F.col(text_col), F.lit(separator), -1)).alias(
            segment_col, text_col
        ),
    )


def join_documents_chunked(
    df: DataFrame,
    id_col: str,
    max_length: int,
    text_col: str = "text",
    separator: str = "\n\n",
    segment_col: str = "segment_id",
    chunk_col: str = "chunk_id",
) -> DataFrame:
    """DocumentJoiner's max_length variant (modules/joiner.py:24-199): join
    segments in order, starting a new output chunk whenever appending the
    next segment (plus separator) would exceed ``max_length``. Oversized
    single segments become their own chunk. ``applyInPandas`` per document
    (the accumulator is inherently sequential per doc)."""
    import pandas as pd

    other = [
        c for c in df.columns if c not in (id_col, text_col, segment_col)
    ]
    dtypes = dict(df.dtypes)
    out_fields = f"{id_col} {dtypes[id_col]}, {chunk_col} int, {text_col} string"
    for c in other:
        out_fields += f", {c} {dtypes[c]}"

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(segment_col)
        chunks: list[str] = []
        cur = ""
        for seg in pdf[text_col]:
            seg = seg or ""
            if not cur:
                cur = seg
            elif len(cur) + len(separator) + len(seg) <= max_length:
                cur = cur + separator + seg
            else:
                chunks.append(cur)
                cur = seg
        if cur or not chunks:
            chunks.append(cur)
        first = pdf.iloc[0]
        rows = {
            id_col: [first[id_col]] * len(chunks),
            chunk_col: list(range(len(chunks))),
            text_col: chunks,
        }
        for c in other:
            rows[c] = [first[c]] * len(chunks)
        return pd.DataFrame(rows)

    return df.groupBy(id_col).applyInPandas(per_doc, schema=out_fields)


def join_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    separator: str = "\n\n",
    segment_col: str = "segment_id",
) -> DataFrame:
    """DocumentJoiner (modules/joiner.py:24-199): sort segments per doc and
    re-join. Global groupBy (the reference only joins within one batch —
    deliberate improvement, SURVEY.md §7.3.5)."""
    other = [c for c in df.columns if c not in (id_col, text_col, segment_col)]
    return (
        df.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(segment_col, text_col))
                    ),
                    lambda s: s[text_col],
                ),
                separator,
            ).alias(text_col),
            *[F.first(c).alias(c) for c in other],
        )
    )

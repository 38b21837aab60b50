"""Token-budget chunking + chunk merge (reference stages/math/modifiers/
chunking.py:24-120 TokenSplitterStage, merge_chunks.py:20-140
ChunkMergeStage) — the math-pipeline pre/post stages around LLM cleanup,
re-expressed Spark-first. The HF tokenizer plug point is honored; the
vendored MiniBPE is the in-environment default (same encode() contract).

Splitter semantics (mirrored exactly):
* split text on ``separator``; blank paragraphs are dropped; every kept
  paragraph except the LAST raw paragraph re-carries the separator;
* paragraphs pack greedily into chunks: a paragraph that would push the
  running token count over ``max_length_tokens`` CLOSES the current chunk
  first (unless the chunk is empty — oversized single paragraphs become
  their own chunk);
* output rows carry (chunk_id, n_tokens) next to every original column.

Merge semantics: dedup on (groupby + chunk_id) keep-first, drop
no-content/null/empty/newline chunks, order by chunk_id, concat text
fields with ``separator``, sum the token-count columns, first() for the
rest, post-filter empty/oversized merged docs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def split_paragraphs(text: str, separator: str = "\n\n") -> list[str]:
    """Reference chunking.py:76-84: blank paragraphs dropped, separator
    re-attached to every kept paragraph except the last RAW one."""
    raw = (text or "").split(separator)
    out = []
    for i, para in enumerate(raw):
        if para.strip():
            out.append(para if i == len(raw) - 1 else para + separator)
    return out


def pack_paragraphs(
    counts: list[int], max_length_tokens: int
) -> list[int]:
    """Greedy chunk id per paragraph (chunking.py:86-105): close the open
    chunk when the next paragraph would exceed the budget and the chunk
    is non-empty (reference closes only on ``token_count > 0``, so a
    zero-token paragraph leaves the chunk open). Precondition in the real
    pipeline: counts come from non-blank paragraphs, so every count is
    >=1 and a chunk exceeds the budget only when it is a single
    over-budget paragraph."""
    ids = []
    chunk, running = 0, 0
    for n in counts:
        if running + n > max_length_tokens and running > 0:
            chunk += 1
            running = 0
        ids.append(chunk)
        running += n
    return ids


def token_splitter(
    df: DataFrame,
    tokenizer,
    max_length_tokens: int = 8000,
    separator: str = "\n\n",
    text_col: str = "text",
    chunk_id_col: str = "chunk_id",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """Row-multiplying stage: one output row per chunk, original columns
    preserved. ``tokenizer`` needs ``encode(str) -> list`` (HF or
    MiniBPE)."""
    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("text", T.StringType()),
                T.StructField("chunk_id", T.IntegerType()),
                T.StructField("n_tokens", T.IntegerType()),
            ]
        )
    )

    @F.pandas_udf(out_type)
    def _chunks(texts: pd.Series) -> pd.Series:
        rows = []
        for t in texts:
            paras = split_paragraphs(t or "", separator)
            counts = [len(tokenizer.encode(p)) for p in paras]
            ids = pack_paragraphs(counts, max_length_tokens)
            chunks = []
            cur_id, buf, tok = 0, [], 0
            for p, n, cid in zip(paras, counts, ids):
                if cid != cur_id:
                    chunks.append(("".join(buf), cur_id, tok))
                    cur_id, buf, tok = cid, [], 0
                buf.append(p)
                tok += n
            if buf:
                chunks.append(("".join(buf), cur_id, tok))
            rows.append(chunks)
        return pd.Series(rows)

    exploded = df.withColumn("_c", F.explode(_chunks(F.col(text_col))))
    return (
        exploded.drop(text_col)
        .withColumn(text_col, F.col("_c.text"))
        .withColumn(chunk_id_col, F.col("_c.chunk_id"))
        .withColumn(n_tokens_col, F.col("_c.n_tokens"))
        .drop("_c")
    )


def merge_chunks(
    df: DataFrame,
    text_col: str = "cleaned_text",
    raw_text_col: str | None = "text",
    chunk_id_col: str = "chunk_id",
    groupby_cols: list[str] | None = None,
    no_content_markers: list[str] | None = None,
    sum_cols: list[str] | None = None,
    max_text_length: int = 900_000,
    separator: str = "\n",
) -> DataFrame:
    """ChunkMergeStage as a declarative plan: window-dedup on
    (groupby, chunk_id) keeping the row with the smallest
    (xxhash64(text), text) — a deterministic, partitioning-independent
    tie-break when retries produced divergent content for the same
    chunk — marker/empty filters, ordered concat_ws via
    array_agg sorted on chunk_id, sums, first() for the rest, then the
    post-filters. One shuffle on the groupby key."""
    groupby_cols = groupby_cols or ["url"]
    markers = no_content_markers or ["NO USEFUL CONTENT", '"NO USEFUL CONTENT"']
    sum_cols = sum_cols or ["num_generated_tokens", "num_input_tokens"]

    # Deterministic keep-one for duplicate (groupby, chunk_id) rows (the
    # LLM-cleanup retry case can produce duplicates with DIFFERENT
    # content): order on a content hash of the cleaned text, tie-broken
    # by the text itself, so the survivor is a pure function of the data
    # and not of partitioning/arrival order.
    w = Window.partitionBy(*groupby_cols, chunk_id_col).orderBy(
        F.xxhash64(F.col(text_col)).asc(), F.col(text_col).asc()
    )
    d = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    d = d.where(
        F.col(text_col).isNotNull()
        & ~F.col(text_col).isin(*markers, "", "\n")
    )

    text_fields = [text_col] + (
        [raw_text_col] if raw_text_col and raw_text_col in df.columns else []
    )
    sum_present = [c for c in sum_cols if c in df.columns]
    aggs = []
    for c in df.columns:
        if c in groupby_cols or c == chunk_id_col:
            continue
        if c in text_fields:
            aggs.append(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(chunk_id_col, c))
                        ),
                        lambda s: s[c].cast("string"),
                    ),
                    separator,
                ).alias(c)
            )
        elif c in sum_present:
            aggs.append(F.sum(c).alias(c))
        else:
            aggs.append(
                F.min_by(c, F.col(chunk_id_col)).alias(c)
            )
    merged = d.groupBy(*groupby_cols).agg(*aggs)
    return merged.where(
        F.col(text_col).isNotNull()
        & (F.col(text_col) != "")
        & (F.col(text_col) != "\n")
        & (F.length(text_col) <= max_text_length)
    )

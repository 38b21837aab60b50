"""Caption-quality evaluation: Summarize-then-Align CLIPScore
(reference ``eval/video/caption_clipscore.py``), Spark-first.

The reference harness evaluates per-clip caption quality by

  1. collecting one caption per window from clip metadata JSONs
     (``_get_window_captions``, caption_clipscore.py:80-90),
  2. joining a clip's window captions into one task string
     (``_collect_tasks``, :193-203),
  3. summarizing each caption to <=80 visual-only words with an LLM
     (vLLM, temperature 0 — :157-190) OR loading cached summaries for
     deterministic re-scoring (``--load-summaries``, :277-289),
  4. encoding summaries with the video-embedder's text tower and
     scoring per-clip cosine similarity against the precomputed video
     embedding (``_cosine_sim``, :100-103; ``_score_summaries``,
     :219-238),
  5. reporting per-label means and a per-clip CSV pivot (:310-331).

Here the LLM summarizer is the one model plug point (vLLM absent; the
prompt contract — verbatim system text, chat shape, sampling params —
is real and pinned); the cached-summaries path, the caption collection
walk, the text encoding (MiniCLIP text tower standing in for the
CosmosEmbed1 text encoder at mini scale) and the cosine scoring are all
REAL and run distributed: one mapInPandas pass for text embeddings with
the uid/label carried through the generator (no re-join exchange), one
broadcast-able join on uid against the video-embedding table, and the
cosine as a sequential-fold Column expression (the knn float-sum
invariant: Spark ``aggregate(zip_with(...))`` and DuckDB
``list_dot_product`` sum in the same order, so gate outputs hash
unrounded).

Scale shape: captions and 768-d embeddings are small per row; the only
shuffle is the uid join (video-embedding side broadcast when small —
the usual eval-benchmark case, ~200 clips in the reference workflow).
Per-label means are float aggregates whose summation order differs
across engines/partitionings — round them before comparing (house
rule), or gate on the per-clip rows as ``caption_clipscore`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Verbatim observable contract (caption_clipscore.py:64-70): the system
# prompt IS the summarizer's behavior spec — paraphrasing it changes
# model output, so it is kept byte-identical (the aegis/llm_prompts
# adjudication).
SUMMARIZE_SYSTEM = (
    "You are a visual description extractor. You output ONLY the visual elements "
    "from a video caption. Keep colors, objects, actions, positions, clothing, text "
    "visible on screen. Remove all narrative commentary, emotional interpretation, "
    "aesthetic judgments, and editorial language. Output a single paragraph under 80 "
    "words. Do not include word counts, revisions, or meta-commentary."
)

# Sampling contract (caption_clipscore.py:177-180). ``stop`` gains the
# tokenizer's eos token when one exists.
SUMMARIZE_SAMPLING = {"temperature": 0.0, "max_tokens": 120, "stop": ["\n\n"]}


def window_captions(meta: dict) -> list[str]:
    """One caption per window from a parsed metadata dict — the
    reference's key walk (caption_clipscore.py:80-90): the FIRST key
    containing ``caption`` whose value is a non-empty string wins;
    windows with no such key contribute nothing."""
    captions = []
    for window in meta.get("windows", []):
        for key, value in window.items():
            if "caption" in key and isinstance(value, str) and value.strip():
                captions.append(value.strip())
                break
    return captions


def source_video(meta: dict) -> str:
    """caption_clipscore.py:93-97 fallback chain."""
    return meta.get("source_video", meta.get("video_path", "unknown"))


def build_summarize_messages(caption: str) -> list[dict]:
    """The chat messages handed to the summarizer LLM
    (caption_clipscore.py:170-175) — the deterministic half of the
    vLLM plug point."""
    return [
        {"role": "system", "content": SUMMARIZE_SYSTEM},
        {"role": "user", "content": caption},
    ]


def collect_tasks(
    meta_df: DataFrame,
    uid_col: str = "uid",
    label_col: str = "label",
    captions_col: str = "captions",
    out_col: str = "caption",
) -> DataFrame:
    """(uid, label, captions array) -> (uid, label, caption): the
    reference's ``" ".join(captions)`` (caption_clipscore.py:202) as a
    pure Column expression. Empty arrays join to the empty string
    (python semantics; DuckDB array_to_string of [] is NULL — coalesce
    in oracles, per the house lesson)."""
    return meta_df.select(
        uid_col,
        label_col,
        F.concat_ws(" ", F.col(captions_col)).alias(out_col),
    )


def apply_cached_summaries(
    tasks_df: DataFrame,
    summaries_df: DataFrame,
    uid_col: str = "uid",
    label_col: str = "label",
    summary_col: str = "summary",
) -> DataFrame:
    """The ``--load-summaries`` path (caption_clipscore.py:277-289):
    join cached summaries on (uid, label); a missing entry becomes the
    empty string and is flagged (the reference counts and warns —
    ``summary_missing`` makes the count an aggregate downstream).
    Summary side is broadcast-able (one row per task)."""
    joined = tasks_df.join(
        summaries_df.select(uid_col, label_col, summary_col),
        on=[uid_col, label_col],
        how="left",
    )
    return joined.withColumn(
        "summary_missing", F.col(summary_col).isNull()
    ).withColumn(summary_col, F.coalesce(F.col(summary_col), F.lit("")))


def summarize_with(
    tasks_df: DataFrame,
    summarizer_fn,
    caption_col: str = "caption",
    summary_col: str = "summary",
    carry_cols: tuple[str, ...] = ("uid", "label"),
) -> DataFrame:
    """The live-LLM path (caption_clipscore.py:157-190) with the model
    injected: ``summarizer_fn(list[list[dict]]) -> list[str]`` receives
    one chat-messages list per caption (built by
    :func:`build_summarize_messages` — the deterministic half) and runs
    once per Arrow batch inside mapInPandas (the vLLM batch contract);
    outputs are stripped like the reference (:183). Install vLLM and
    pass a generate() wrapper applying ``SUMMARIZE_SAMPLING`` to make
    this neural; tests inject deterministic fakes."""
    import pandas as pd
    from pyspark.sql import types as T

    by_name = {f.name: f for f in tasks_df.schema.fields}
    in_fields = [by_name[c] for c in carry_cols]  # carry order = output order
    schema = T.StructType(
        list(in_fields) + [T.StructField(summary_col, T.StringType())]
    )

    def gen(it):
        for pdf in it:
            prompts = [
                build_summarize_messages(str(c)) for c in pdf[caption_col]
            ]
            out = {c: list(pdf[c]) for c in carry_cols}
            out[summary_col] = [s.strip() for s in summarizer_fn(prompts)]
            yield pd.DataFrame(out)

    return tasks_df.select(*carry_cols, caption_col).mapInPandas(gen, schema)


def _hof_dot(a, b):
    """Sequential left-fold dot product — bit-identical to DuckDB
    list_dot_product (the knn/semantic float-sum invariant)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_col(a, b):
    """The reference ``_cosine_sim`` (caption_clipscore.py:100-103):
    a/|a| . b/|b|, as fold-dot + sqrt (both correctly rounded IEEE ops,
    cross-engine hashable unrounded)."""
    return _hof_dot(a, b) / (
        F.sqrt(_hof_dot(a, a)) * F.sqrt(_hof_dot(b, b))
    )


def caption_clip_scores(
    summaries_df: DataFrame,
    video_embs_df: DataFrame,
    model_path: str,
    uid_col: str = "uid",
    label_col: str = "label",
    summary_col: str = "summary",
    vemb_col: str = "video_embedding",
    score_col: str = "clip_score",
) -> DataFrame:
    """Summaries -> text embeddings (MiniCLIP text tower, uid/label
    carried through the generator) -> join on uid -> per-clip cosine
    (caption_clipscore.py:219-238). Output: (uid, label, clip_score)."""
    from nemo_curator_spark.operators import clip_mini

    tembs = clip_mini.clip_text_embeddings(
        summaries_df,
        model_path,
        text_col=summary_col,
        out_col="_temb",
        carry_cols=(uid_col, label_col),
    )
    joined = tembs.join(
        video_embs_df.select(uid_col, vemb_col), on=uid_col, how="inner"
    )
    return joined.select(
        uid_col,
        label_col,
        cosine_col(F.col("_temb"), F.col(vemb_col)).alias(score_col),
    )


def per_label_stats(
    scores_df: DataFrame,
    label_col: str = "label",
    score_col: str = "clip_score",
    ndigits: int = 6,
) -> DataFrame:
    """Per-model mean + count (caption_clipscore.py:311-314). The mean
    is a float aggregate — summation order varies with partitioning, so
    it is rounded (house float-aggregate rule); per-clip rows stay
    unrounded."""
    return scores_df.groupBy(label_col).agg(
        F.round(F.avg(score_col), ndigits).alias("mean_score"),
        F.count(F.lit(1)).alias("n"),
    )


def scores_pivot(
    scores_df: DataFrame,
    labels: list[str],
    uid_col: str = "uid",
    label_col: str = "label",
    score_col: str = "clip_score",
) -> DataFrame:
    """The per-clip CSV shape (caption_clipscore.py:316-330): one row
    per uid, one column per label. ``labels`` is passed explicitly so
    the pivot needs no distinct-values job."""
    return (
        scores_df.groupBy(uid_col)
        .pivot(label_col, labels)
        .agg(F.first(score_col))
    )

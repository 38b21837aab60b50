"""Label-first assembly of the heuristic rule cascade.

The reference applies its filters as a cascade of row-dropping stages
(ScoreFilter chain, config/text/heuristic_filter_english_pipeline.yaml).
Spark-first we instead compute every rule's score and keep-bit as columns in
ONE projection, derive ``keep`` (conjunction) and ``drop_reason`` (first
failing rule in chain order) — the surviving-row set is identical to the
cascade because every rule is a deterministic per-row predicate, and the
label columns give the lineage drop-reason histogram for free
(SURVEY.md §7.0).

All 19 native rules stay JVM-side; the nine n-gram rules come from a single
Arrow-vectorized pandas UDF returning a struct (one Python round-trip per
batch, not per rule).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nemo_curator_spark.functions import heuristics as H

SCORE_PREFIX = "score_"


# rules present only in the ENGLISH cascade; the non-English variant drops
# them (reference heuristic_filter_non_english_pipeline.yaml: same order and
# cutoffs, minus NonAlphaNumeric / WordsWithoutAlphabets / CommonEnglishWords)
ENGLISH_ONLY_RULES = (
    "alpha_numeric",
    "words_without_alphabets",
    "common_english_words",
)


def chain_rule_names(
    include_ngrams: bool = True, english: bool = True
) -> list[str]:
    names = [r.name for r in H.RULES]
    if not english:
        names = [n for n in names if n not in ENGLISH_ONLY_RULES]
    if not include_ngrams:
        names = [n for n in names if n not in H.NGRAM_COL_FOR_RULE]
    return names


def add_scores(
    df: DataFrame,
    text_col: str = "text",
    rules: list[str] | None = None,
    prefix: str = SCORE_PREFIX,
    py_batch: bool = True,
    wl_col: str | None = None,
) -> DataFrame:
    """Add one ``{prefix}{rule}`` DOUBLE column per rule.

    Three execution tiers, all value-identical (tests pin them):
    * pure char-class/regex rules -> JVM Column exprs (codegen'd);
    * word/line/paragraph rules -> ONE Arrow pandas UDF (`word_line_batch`;
      HOF lambdas would be interpreted per-element and ~10x slower) unless
      ``py_batch=False`` forces the Column forms;
    * n-gram rules -> the `ngram_scores` pandas UDF struct.

    ``wl_col``: name of an ALREADY-computed `word_line_batch` struct column
    to reuse (pipelines compute it once for langid/chain/quality).
    """
    names = rules if rules is not None else chain_rule_names()

    batch_rules = [
        n for n in names if (py_batch or wl_col) and n in H.PY_BATCH_RULES
    ]
    ngram_rules = [n for n in names if n in H.NGRAM_COL_FOR_RULE]
    native_rules = [
        n for n in names if n not in batch_rules and n not in ngram_rules
    ]

    native_cols: dict[str, Column] = {}
    helper_names: dict[str, str] = {}
    if native_rules:
        # Materialize shared helper arrays as REAL columns: an expression
        # used by many rules would otherwise be duplicated into each
        # consumer (no CSE on the interpreted path). CollapseProject keeps
        # non-cheap projections referenced more than once.
        raw_ctx = H.text_ctx(F.col(text_col))
        helper_names = {k: f"_ctx_{k}" for k in raw_ctx if k != "text"}
        df = df.withColumns({helper_names[k]: raw_ctx[k] for k in helper_names})
        ctx: dict[str, Column] = {"text": F.col(text_col)}
        ctx.update({k: F.col(v) for k, v in helper_names.items()})
        for name in native_rules:
            native_cols[prefix + name] = H.RULES_BY_NAME[name].score(ctx)

    own_wl = bool(batch_rules) and wl_col is None
    if batch_rules:
        src = wl_col or "_wl_scores"
        if own_wl:
            df = df.withColumn(src, H.word_line_batch(F.col(text_col)))
        for name in batch_rules:
            native_cols[prefix + name] = F.col(src + "." + name)
    if ngram_rules:
        df = df.withColumn("_ngram_scores", H.ngram_scores(F.col(text_col)))
        for name in ngram_rules:
            field = H.NGRAM_COL_FOR_RULE[name]
            native_cols[prefix + name] = F.col("_ngram_scores." + field)

    df = df.withColumns(native_cols)
    if helper_names:
        df = df.drop(*helper_names.values())
    if own_wl:
        df = df.drop("_wl_scores")
    if ngram_rules:
        df = df.drop("_ngram_scores")
    return df


def labels_from_scores(
    names: list[str], prefix: str = SCORE_PREFIX
) -> tuple[Column, Column]:
    """(keep, drop_reason) expressions over already-computed score columns."""
    keeps = [H.RULES_BY_NAME[n].keep(F.col(prefix + n)) for n in names]
    keep = reduce(lambda a, b: a & b, keeps)
    reason = F.lit(None).cast("string")
    for name, k in zip(reversed(names), reversed(keeps)):
        reason = F.when(~k, F.lit(name)).otherwise(reason)
    return keep, reason


def add_labels(
    df: DataFrame,
    text_col: str = "text",
    rules: list[str] | None = None,
    prefix: str = SCORE_PREFIX,
    keep_col: str = "keep",
    reason_col: str = "drop_reason",
    wl_col: str | None = None,
) -> DataFrame:
    """Add scores plus ``keep`` / ``drop_reason`` (first failing rule)."""
    names = rules if rules is not None else chain_rule_names()
    df = add_scores(df, text_col, names, prefix, wl_col=wl_col)
    keep, reason = labels_from_scores(names, prefix)
    return df.withColumn(keep_col, keep).withColumn(reason_col, reason)


def english_chain(
    df: DataFrame,
    text_col: str = "text",
    mode: str = "filter",
    include_ngrams: bool = True,
    english: bool = True,
) -> DataFrame:
    """The reference heuristic cascade (English by default; ``english=False``
    gives the non-English variant — same order/cutoffs minus the
    English-specific rules).

    mode='filter' → return surviving rows only (original columns), exactly
    the cascade's output set. mode='label' → return all rows + score/keep/
    drop_reason columns (the label-first form used for lineage).
    """
    from nemo_curator_spark.functions.partitioning import ensure_min_parallelism

    # the chain is a pure map, so its parallelism IS the scan's: a
    # 1-row-group parquet input runs the whole cascade in one task
    # (observed: the 5k-row documents table, 1.3 s single-task vs ~0.15 s
    # spread). No-op whenever the scan already has enough splits, so the
    # zero-exchange plan shape is preserved at scale.
    df = ensure_min_parallelism(df, text_col)
    names = chain_rule_names(include_ngrams, english)
    labeled = add_labels(df, text_col, names)
    if mode == "label":
        return labeled
    if mode != "filter":
        raise ValueError(f"unknown mode: {mode}")
    return labeled.where(F.col("keep")).select(*df.columns)


# --- DuckDB oracle SQL for the native subset ---------------------------------


def duck_score_sql(rule_name: str, col: str) -> str:
    rule = H.RULES_BY_NAME[rule_name]
    if rule.duck_score is None:
        raise ValueError(f"rule {rule_name} has no SQL form (pandas-UDF rule)")
    return rule.duck_score(col)


def duck_labels_sql(
    table: str,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    rules: list[str] | None = None,
    prefix: str = SCORE_PREFIX,
) -> str:
    """Full labeling query in DuckDB SQL over `table` (native rules only)."""
    names = rules if rules is not None else chain_rule_names(include_ngrams=False)
    score_exprs = {n: duck_score_sql(n, text_col) for n in names}
    keep_exprs = {
        n: H.RULES_BY_NAME[n].duck_keep(f"CAST({prefix}{n} AS DOUBLE)")
        for n in names
    }
    select_scores = ",\n    ".join(
        f"CAST({e} AS DOUBLE) AS {prefix}{n}" for n, e in score_exprs.items()
    )
    keep = " AND ".join(keep_exprs.values())
    reason = "CASE " + " ".join(
        f"WHEN NOT {keep_exprs[n]} THEN '{n}'" for n in names
    ) + " ELSE NULL END"
    ids = ", ".join(id_cols)
    return f"""
WITH scored AS (
  SELECT {ids}, {text_col},
    {select_scores}
  FROM {table}
)
SELECT {ids},
  {keep} AS keep,
  {reason} AS drop_reason,
  * EXCLUDE ({ids}, {text_col})
FROM scored
""".strip()

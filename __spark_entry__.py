"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 over the
driver-generated tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL the
driver compares against at sf=0.01 (row count + schema + value hash).
Rules whose semantics need stateful per-document Python (the n-gram family)
have no SQL form and get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nemo_curator_spark.functions import heuristics as H
from nemo_curator_spark.pipeline import chain

SCORE = chain.SCORE_PREFIX


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full 28-rule English heuristic chain, label-first, with the
    drop-reason histogram as the result (lineage-style aggregate)."""
    df = _docs(spark, "/root/testdata/sf0.001")
    labeled = chain.english_chain(df, "text", mode="label")
    return (
        labeled.groupBy("keep", "drop_reason")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("keep", "drop_reason")
    )


# --- query builders -----------------------------------------------------------


def _rule_query(rule_name: str) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _docs(spark, sf_dir)
        rule = H.RULES_BY_NAME[rule_name]
        scored = chain.add_scores(df, "text", [rule_name])
        score = F.col(SCORE + rule_name)
        return scored.select(
            "doc_id",
            score.alias("score"),
            rule.keep(score).cast("int").alias("keep"),
        )

    return q


def _rule_oracle(rule_name: str) -> str | None:
    rule = H.RULES_BY_NAME[rule_name]
    if rule.duck_score is None:
        return None
    score = f"CAST({rule.duck_score('text')} AS DOUBLE)"
    keep = rule.duck_keep("score")
    return (
        f"SELECT doc_id, score, CAST({keep} AS INT) AS keep FROM "
        f"(SELECT doc_id, {score} AS score FROM documents)"
    )


def _chain_native_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = chain.chain_rule_names(include_ngrams=False)
    df = _docs(spark, sf_dir)
    labeled = chain.add_labels(df, "text", rules=names)
    return labeled.select(
        "doc_id", F.col("keep").cast("int").alias("keep"), "drop_reason"
    )


def _chain_native_oracle() -> str:
    names = chain.chain_rule_names(include_ngrams=False)
    keep_exprs = []
    for n in names:
        rule = H.RULES_BY_NAME[n]
        score = f"CAST({rule.duck_score('text')} AS DOUBLE)"
        keep_exprs.append((n, rule.duck_keep(score)))
    keep = " AND ".join(k for _, k in keep_exprs)
    reason = (
        "CASE "
        + " ".join(f"WHEN NOT {k} THEN '{n}'" for n, k in keep_exprs)
        + " ELSE NULL END"
    )
    return (
        f"SELECT doc_id, CAST(({keep}) AS INT) AS keep, {reason} AS drop_reason "
        f"FROM documents"
    )


def _chain_full_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    labeled = chain.english_chain(df, "text", mode="label")
    return labeled.select(
        "doc_id", F.col("keep").cast("int").alias("keep"), "drop_reason"
    )


def _exact_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate removal ids: hash text, keep lowest doc_id per group
    (reference: stages/deduplication/exact/identification.py:33-120)."""
    df = _docs(spark, sf_dir)
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("doc_id")
    )


_EXACT_DEDUP_ORACLE = """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn > 1
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for rule in H.RULES:
        out[f"filter_{rule.name}"] = _rule_query(rule.name)
    out["filter_porn_urls"] = _rule_query("porn_urls")
    out["heuristic_chain_native"] = _chain_native_query
    out["heuristic_chain_full"] = _chain_full_query
    out["exact_dedup_removal_ids"] = _exact_dedup_query
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for rule in H.RULES:
        sql = _rule_oracle(rule.name)
        if sql is not None:
            out[f"filter_{rule.name}"] = sql
    out["filter_porn_urls"] = _rule_oracle("porn_urls")
    out["heuristic_chain_native"] = _chain_native_oracle()
    # heuristic_chain_full: n-gram rules are pandas-UDF-only -> rows-only check
    out["exact_dedup_removal_ids"] = _EXACT_DEDUP_ORACLE
    return out

"""Replicates the driver's correctness gate: run each ``queries()`` entry via
Spark and its ``oracle_sql()`` via DuckDB on the same parquet, compare row
count + exact values (sorted, column-name order) — any drift here would fail
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype.kind == "M":
            df[col] = df[col].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )
    return df


def _compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame, name: str) -> None:
    a, b = _normalize(spark_df), _normalize(duck_df)
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    )
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            both_nan = pd.isna(av) & pd.isna(bv)
            eq = (av == bv) | both_nan
        else:
            eq = (pd.isna(av) & pd.isna(bv)) | (
                av.astype(object) == bv.astype(object)
            )
        bad = np.flatnonzero(~eq)
        assert bad.size == 0, (
            f"{name}.{col}: {bad.size} mismatches, first at row {bad[0]}: "
            f"spark={av[bad[0]]!r} duck={bv[bad[0]]!r}"
        )


def test_all_queries_match_oracles(spark, duck):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        sdf = fn(spark, SF_DIR).toPandas()
        if name in oracles:
            ddf = duck.execute(oracles[name]).df()
            _compare(sdf, ddf, name)
        else:
            assert len(sdf) >= 0  # rows-only check


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"keep", "drop_reason", "n_docs"}

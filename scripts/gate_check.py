"""Replicate the driver's correctness gate at an arbitrary SF (default
sf0.01, the scale the driver actually uses) and print a per-query report.

Usage: python scripts/gate_check.py [sf_dir] [query_name ...]

Unlike tests/test_entry_oracle.py (which runs the sf0.001 form inside the
suite), this is the pre-ship check: run it before committing new queries()
entries so CORRECTNESS_r{N}.json holds no surprises.
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from nemo_curator_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype.kind == "M":
            df[col] = df[col].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def _compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str | None:
    a, b = _normalize(spark_df), _normalize(duck_df)
    if len(a) != len(b):
        return f"rows {len(a)} != {len(b)}"
    if list(a.columns) != list(b.columns):
        return f"cols {list(a.columns)} != {list(b.columns)}"
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
        else:
            eq = (pd.isna(av) & pd.isna(bv)) | (
                av.astype(object) == bv.astype(object)
            )
        bad = np.flatnonzero(~eq)
        if bad.size:
            return (
                f"{col}: {bad.size} mismatches, first row {bad[0]}: "
                f"spark={av[bad[0]]!r} duck={bv[bad[0]]!r} "
                f"(dtypes {av.dtype}/{bv.dtype})"
            )
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark()
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            try:
                ddf = con.execute(oracles[name]).df()
            except Exception as e:
                print(f"FAIL  {name}: oracle SQL raised: {e}")
                n_fail += 1
                continue
            err = _compare(sdf, ddf)
            if err:
                print(f"FAIL  {name}: {err}")
                n_fail += 1
            else:
                print(f"pass  {name}: {len(sdf)} rows ({dt:.1f}s)")
                n_pass += 1
        else:
            print(f"rows  {name}: {len(sdf)} rows, no oracle ({dt:.1f}s)")
            n_rows_only += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} FAIL @ {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

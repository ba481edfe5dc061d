"""Driver-style correctness check: run each queries() entry and its
oracle_sql side by side on one sf dir; compare row count, schema (column
names) and order-insensitive values.  Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("uint", "Int", "int")):
            if df[c].isna().any():  # nullable Int64 with NA: sentinel, not crash
                df[c] = df[c].fillna(-1)
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(mine)} rows, cols={list(mine.columns)}")
            continue
        try:
            oracle = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle SQL raised {e}")
            failures += 1
            continue
        ok_shape = list(mine.columns) == list(oracle.columns) and len(mine) == len(oracle)
        if not ok_shape:
            print(f"[FAIL] {name}: shape mine={mine.shape}/{list(mine.columns)} oracle={oracle.shape}/{list(oracle.columns)}")
            failures += 1
            continue
        diff_cols = []
        for c in mine.columns:
            a, b = mine[c], oracle[c]
            if a.dtype == "float64":
                same = np.allclose(a, b, rtol=0, atol=0, equal_nan=True)
            else:
                same = a.equals(b)
            if not same:
                diff_cols.append(c)
        if diff_cols:
            print(f"[FAIL] {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                neq = mine[c] != oracle[c]
                print(mine[neq].head(3))
                print(oracle[neq].head(3))
            failures += 1
        else:
            print(f"[ OK ] {name}: {len(mine)} rows")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())

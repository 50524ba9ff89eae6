"""Local stand-in for the driver's correctness gate: run queries() and
oracle_sql() side by side on a testdata dir and diff rows/schema/values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
(defaults: /root/testdata/sf0.01, all queries that have an oracle)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as ent
    qs = ent.queries()
    oracles = ent.oracle_sql()
    names = sys.argv[2:] or [n for n in qs if n in oracles]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_fail = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN queries()")
            n_fail += 1
            continue
        try:
            got = canon(to_pandas(qs[name](sf_dir)))
        except Exception as e:
            print(f"{name}: ENGINE ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"{name}: no oracle ({len(got)} rows)")
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_dtypes = ok_cols and all(
            str(got[c].dtype) == str(exp[c].dtype) for c in got.columns)
        ok_vals = ok_rows and ok_cols and got.equals(exp)
        if ok_rows and ok_cols and ok_vals and ok_dtypes:
            print(f"{name}: OK ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"{name}: FAIL rows={len(got)}/{len(exp)} cols={ok_cols} "
                  f"dtypes={ok_dtypes} vals={ok_vals}")
            if ok_cols and not ok_dtypes:
                for c in got.columns:
                    if str(got[c].dtype) != str(exp[c].dtype):
                        print(f"  dtype {c}: {got[c].dtype} vs {exp[c].dtype}")
            if ok_cols and ok_rows and not ok_vals:
                for c in got.columns:
                    if not got[c].equals(exp[c]):
                        neq = (got[c] != exp[c])
                        print(f"  col {c}: {int(neq.sum())} diffs; "
                              f"first: {got[c][neq].head(3).tolist()} vs "
                              f"{exp[c][neq].head(3).tolist()}")
            elif not ok_rows:
                print(f"  got cols {list(got.columns)} exp {list(exp.columns)}")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

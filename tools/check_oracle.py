"""Local replica of the driver's correctness gate: run every queries() entry
at a given sf and compare against oracle_sql() via DuckDB (row count, column
names, order-insensitive value comparison). Usage:

    python tools/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


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
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count differs: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            # Driver-hash parity: the driver stringifies values, so a
            # float64-vs-int64 leak renders "1.0" vs "1" and hash-reds even
            # when every value matches. Flag dtype-KIND mismatches here.
            ak = "f" if np.issubdtype(av.dtype, np.floating) else (
                "i" if np.issubdtype(av.dtype, np.integer) else "o")
            bk = "f" if np.issubdtype(bv.dtype, np.floating) else (
                "i" if np.issubdtype(bv.dtype, np.integer) else "o")
            if ak != bk and {ak, bk} <= {"f", "i"}:
                problems.append(
                    f"col {c} dtype-kind mismatch (driver hash-red risk): "
                    f"ray={av.dtype} sql={bv.dtype}")
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True)
            else:
                ok = (av == bv).all()
            if not ok:
                idx = next(
                    i for i in range(len(av))
                    if not (av[i] == bv[i] or (isinstance(av[i], float) and abs(av[i] - bv[i]) <= 1e-9))
                )
                problems.append(f"col {c} differs at row {idx}: ray={av[idx]!r} sql={bv[idx]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows ({dt:.1f}s)")
            n_pass += 1
            continue
        sql_df = con.execute(sqls[name]).df()
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name} ({dt:.1f}s):")
            for p in problems:
                print(f"     {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(ray_df)} rows match oracle ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Local emulation of the driver's correctness gate: run each queries()
entry via Ray, run the matching oracle_sql() via DuckDB on the same
parquet tables, and compare row count + column names + order-insensitive
values (columns sorted by name, rows sorted)."""

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(res, Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 8)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str]):
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        got = normalize(to_pandas(fn(sf_dir)))
        ray_s = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(got)} ({ray_s:.1f}s)  [rows-only, no oracle]")
            continue
        want = normalize(con.sql(oracles[name]).df())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = ok_rows and ok_cols and got.equals(want)
        status = "OK" if ok_vals else "FAIL"
        if not ok_vals:
            fails += 1
        print(f"{name:24s} rows={len(got)}/{len(want)} cols_ok={ok_cols} vals_ok={ok_vals} ({ray_s:.1f}s) {status}")
        if not ok_vals and ok_cols and ok_rows:
            neq = ~(got == want).all(axis=1)
            print("  first diffs:\n", got[neq].head(3), "\n  vs\n", want[neq].head(3))
        elif not ok_cols:
            print("  got cols:", list(got.columns), " want:", list(want.columns))
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(sf, sys.argv[2:])

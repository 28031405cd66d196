"""Local replica of the driver's correctness gate.

Runs every queries() entry and its oracle_sql() counterpart on the same
sf dir, compares row count, schema (column names sorted), and values
(rows sorted by all columns — order-insensitive exact compare).

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> bool:
    ok = True
    if sorted(ours.columns) != sorted(oracle.columns):
        print(f"  [{name}] SCHEMA mismatch: ours={sorted(ours.columns)} oracle={sorted(oracle.columns)}")
        return False
    if len(ours) != len(oracle):
        print(f"  [{name}] ROWCOUNT mismatch: ours={len(ours)} oracle={len(oracle)}")
        ok = False
    a, b = canon(ours), canon(oracle)
    if len(a) == len(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        if bad.any():
            print(f"  [{name}] VALUE mismatch in {int(bad.sum())}/{len(a)} rows; first diffs:")
            idx = a.index[bad][:3]
            for i in idx:
                cols = neq.columns[neq.loc[i]]
                for c in cols:
                    print(f"    row {i} col {c}: ours={a.loc[i, c]!r} oracle={b.loc[i, c]!r}")
            ok = False
    # dtype check (schema-level)
    for c in ours.columns:
        du, do = ours[c].dtype, oracle[c].dtype
        if str(du) != str(do):
            print(f"  [{name}] dtype note: col {c} ours={du} oracle={do}")
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import ray

    import os

    cpus = int(os.environ.get("GRAFT_CHECK_CPUS", "16"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    passed, failed, noracle = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ours = to_pandas(fn(sf_dir))
        if name not in oracles:
            noracle.append(name)
            print(f"[{name}] rows={len(ours)} (no oracle — rows-only)")
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"[{name}] ORACLE SQL ERROR: {ex}")
            failed.append(name)
            continue
        ok = compare(name, ours, oracle)
        print(f"[{name}] rows={len(ours)} {'OK' if ok else 'FAIL'}")
        (passed if ok else failed).append(name)
    print(f"\npassed={passed}\nfailed={failed}\nrows_only={noracle}")
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

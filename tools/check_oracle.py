"""Local stand-in for the driver's correctness gate.

Runs every queries()[name](sf_dir) and the matching oracle_sql()[name] via
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value comparison (rows sorted by all columns).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
        elif np.issubdtype(df[c].dtype, np.floating):
            # round before SORTING so last-ulp engine differences cannot
            # reorder near-tied rows and misalign the positional compare
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), na_position="first").reset_index(
        drop=True
    )


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT ray={len(ray_df)} sql={len(sql_df)}"
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            if not np.allclose(
                av.astype(float), b[c].astype(float), rtol=1e-9, atol=1e-12,
                equal_nan=True,
            ):
                bad = np.where(
                    ~np.isclose(av.astype(float), bv.astype(float),
                                rtol=1e-9, atol=1e-12, equal_nan=True)
                )[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} ray={av.iloc[bad].tolist()} sql={bv.iloc[bad].tolist()}"
        else:
            eq = (av.astype(object).where(pd.notna(av), None)
                  == bv.astype(object).where(pd.notna(bv), None)) | (
                pd.isna(av) & pd.isna(bv)
            )
            if not eq.all():
                bad = np.where(~eq)[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} ray={av.iloc[bad].tolist()} sql={bv.iloc[bad].tolist()}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as exc:
            print(f"{name}: RAY-ERROR {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        t_ray = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only rows={len(ray_df)} cols={sorted(ray_df.columns)} ({t_ray:.1f}s)")
            continue
        t0 = time.time()
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"{name}: SQL-ERROR {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name}: {verdict} rows={len(ray_df)} (ray {t_ray:.1f}s, sql {time.time()-t0:.1f}s)")
        if verdict != "OK":
            failed.append(name)
    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

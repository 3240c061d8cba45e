"""Driver-shaped correctness harness.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin on the same
parquet tables and compares row-count, schema (column names) and an
order-insensitive value comparison — the same contract the external driver
applies at sf0.01.  Usage::

    python tools/check_correctness.py [-k name_substring] [--sf DIR]
"""

from __future__ import annotations

import argparse
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
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — order-insensitive."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_extension_array_dtype(s):
            if pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
                df[c] = s.astype("float64")  # nullable int/bool → float w/ NaN
            else:
                df[c] = s.astype(object)
        elif pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.where(s.notna(), None)
    df = df.sort_values(list(df.columns), kind="stable", na_position="last")
    return df.reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(ora_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} oracle={sorted(ora_df.columns)}")
        return problems
    if len(ray_df) != len(ora_df):
        problems.append(f"rowcount: ray={len(ray_df)} oracle={len(ora_df)}")
    # dtype-FAMILY gate: the external driver hashes values without dtype
    # canonicalization. Round-1 evidence: int64-vs-float64 and Int64(pd.NA)-
    # vs-NaN fail its hash (tool_rt_stats / asof_error_tool /
    # conv_avg_rt_ranking), while int32-vs-int64 and Int64-without-NA pass
    # (reassembled_sessions, text_quality, session_durations) — so compare
    # the numeric FAMILY, not the exact width.
    def family(s: pd.Series) -> str:
        if pd.api.types.is_bool_dtype(s):
            return "bool"
        if pd.api.types.is_integer_dtype(s):
            return "float" if s.isna().any() else "int"  # NA forces float render
        if pd.api.types.is_float_dtype(s):
            return "float"
        if pd.api.types.is_datetime64_any_dtype(s):
            return "datetime"
        return "object"

    for c in sorted(ray_df.columns):
        rf, of = family(ray_df[c]), family(ora_df[c])
        if rf != of:
            problems.append(
                f"dtype[{c}]: ray={ray_df[c].dtype}({rf}) oracle={ora_df[c].dtype}({of})"
                " (driver hash hazard)"
            )
    a, b = canon(ray_df), canon(ora_df)
    if len(a) == len(b):
        for c in a.columns:
            x, y = a[c], b[c]
            if pd.api.types.is_float_dtype(x) and pd.api.types.is_float_dtype(y):
                eq = (x.isna() & y.isna()) | np.isclose(
                    x.fillna(0), y.fillna(0), rtol=0, atol=1e-9
                ) & x.notna() & y.notna()
            else:
                eq = (x.isna() & y.isna()) | (x.astype(object) == y.astype(object))
            bad = int((~eq).sum())
            if bad:
                m = (~eq).to_numpy().nonzero()[0][:3]
                problems.append(
                    f"values[{c}]: {bad} mismatches, e.g. ray={list(x.iloc[m])} oracle={list(y.iloc[m])}"
                )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", default="", help="substring filter on query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if args.k and args.k not in name:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(args.sf))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows={len(ray_df)}) [{dt:.1f}s]")
            n_noracle += 1
            continue
        try:
            ora_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, ora_df)
        if problems:
            print(f"FAIL  {name} [{dt:.1f}s]")
            for p in problems:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(ray_df)} [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side at a given sf, compare row count + schema +
order-insensitive value hash (columns sorted by name).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            df[c] = col.round(9)
        elif pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]")
    if len(df) == 0 or len(df.columns) == 0:
        rows = []
    else:
        rows = df.astype(str).agg("|".join, axis=1).sort_values().tolist()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), list(df.columns), h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {str(e)[:160]}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(res)} (rows-only, {dt:.1f}s)")
            continue
        try:
            ora = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {str(e)[:160]}")
            failures.append(name)
            continue
        nr, cr, hr = canon(res)
        no, co, ho = canon(ora)
        if nr != no:
            print(f"FAIL {name}: rows ray={nr} oracle={no} ({dt:.1f}s)")
            failures.append(name)
        elif cr != co:
            print(f"FAIL {name}: cols ray={cr} oracle={co}")
            failures.append(name)
        elif hr != ho:
            print(f"FAIL {name}: hash ray={hr} oracle={ho} rows={nr}")
            failures.append(name)
        else:
            print(f"ok   {name}: rows={nr} hash={hr} ({dt:.1f}s)")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares row count, sorted
schema, and order-insensitive values against ``oracle_sql()`` via
DuckDB.  Queries without an oracle get a rows-only check.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def canon(df):
    """Sort columns by name, rows by all values, normalize dtypes."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: None if x is None else str(x))
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)
    return df


def main():
    import duckdb

    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    only = sys.argv[1:] or None
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(SF_DIR)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failed.append(name)
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failed.append(name)
            continue
        # dtype-strict, mirroring the driver's value hash: a Ray int64
        # column vs an oracle float64/object column is a FAIL even when
        # the printed values are equal.
        got_dt = [str(d) for d in got.dtypes]
        want_dt = [str(d) for d in want.dtypes]
        if got_dt != want_dt:
            mism = [
                f"{c}: ray={g} oracle={w}"
                for c, g, w in zip(got.columns, got_dt, want_dt)
                if g != w
            ]
            print(f"FAIL {name}: dtype mismatch ({'; '.join(mism)})")
            failed.append(name)
            continue
        if got.equals(want):
            print(f"ok   {name}: {len(got)} rows match ({dt:.1f}s)")
        else:
            diff = (got.astype(str) != want.astype(str)).any(axis=1)
            print(f"FAIL {name}: values differ in {int(diff.sum())}/{len(got)} rows")
            print("  got :", got[diff].head(3).to_dict("records"))
            print("  want:", want[diff].head(3).to_dict("records"))
            failed.append(name)

    print("\n==", "ALL OK" if not failed else f"FAILED: {failed}")
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

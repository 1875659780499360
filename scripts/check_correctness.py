"""Local stand-in for the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` callable and compares row-count
+ order-insensitive value equality against ``oracle_sql()`` via DuckDB
(views pre-registered like the driver does).  Usage:

    python scripts/check_correctness.py [query ...]

Env: GRAFT_CHECK_SF_DIR picks the scale (default sf0.01; the driver's
gate scale).  Running at sf0.1 as well sweeps through the OTHER side of
every size-flipped gate (broadcast vs join, driver vs distributed
CC/dedup).  GRAFT_CHECK_OUT writes the per-query results as JSON (the
CORRECTNESS_sf* artifacts).
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

import json
import os

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(SF_DIR))
            if name in oracles:
                got = canon(got)
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            results[name] = {"ok": False, "err": f"{type(ex).__name__}: {ex}"[:300]}
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(got)} rows  {dt:.1f}s")
            results[name] = {"ok": True, "rows_only": True, "rows": len(got),
                             "sec": round(dt, 1)}
            continue
        want = canon(con.sql(oracles[name]).df())
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}  {dt:.1f}s")
            results[name] = {"ok": False, "rows": len(got), "oracle_rows": len(want)}
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            results[name] = {"ok": False, "err": "schema mismatch"}
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, rtol=0, atol=0
            )
            print(f"ok {name}: {len(got)} rows  {dt:.1f}s")
            results[name] = {"ok": True, "rows": len(got), "sec": round(dt, 1)}
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch  {dt:.1f}s")
            print(str(ex)[:1200])
            diff = got.compare(want) if got.shape == want.shape else None
            if diff is not None and len(diff):
                print(diff.head(10))
            results[name] = {"ok": False, "err": "value mismatch"}
            failures += 1
    ray.shutdown()
    out_path = os.environ.get("GRAFT_CHECK_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"sf_dir": SF_DIR, "failures": failures,
                       "results": results}, f, indent=1)
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

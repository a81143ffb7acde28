"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB, compare row count, column names,
and values (column-name-sorted, row-sorted, exact).

Usage: python tools/check_oracle.py [--strict] [--never-run] [sf_dir] [name_filter...]

``--strict`` compares STRINGIFIED values instead of the numeric-tolerant
float path — the closest local proxy for the driver's value hash (it
catches dtype drift like DuckDB's HUGEINT window sums rendering "23.0"
against Spark's "23", which numeric comparison forgives).
``--never-run`` restricts to entries with no prior driver CORRECTNESS
row — the exact set the next driver sweep checks first.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def _eq(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = np.isnan(af) & np.isnan(bf)
            exact = (af == bf) | both_nan
            if not exact.all():
                i = int(np.argmin(exact))
                return False, f"col {c} row {i}: {af[i]!r} != {bf[i]!r} (diff {af[i]-bf[i]!r})"
        else:
            am = pd.isna(a[c]) & pd.isna(b[c])
            eq = (a[c] == b[c]) | am
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                return False, f"col {c} row {i}: {a[c].iloc[i]!r} != {b[c].iloc[i]!r}"
    return True, ""


def _eq_strict(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        eq = a[c].astype(str) == b[c].astype(str)
        if not eq.all():
            i = int(np.argmin(eq.to_numpy()))
            return False, (
                f"strict col {c} row {i}: {a[c].iloc[i]!r} != {b[c].iloc[i]!r} "
                f"(dtypes {a[c].dtype} vs {b[c].dtype})"
            )
    return True, ""


def main() -> int:
    args = [a for a in sys.argv[1:]]
    strict = "--strict" in args
    never_only = "--never-run" in args
    args = [a for a in args if a not in ("--strict", "--never-run")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    filters = args[1:]

    import __spark_entry__ as entrymod
    from querysight_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    never: set[str] | None = None
    if never_only:
        green, rows_only = entrymod._driver_verified()
        never = {n for n in qs if n not in green and n not in rows_only}
        print(f"--never-run: {len(never)} entries with no driver CORRECTNESS row")
    n_pass = n_fail = n_skip = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        if never is not None and name not in never:
            continue
        t0 = time.time()
        try:
            sdf = _canon(fn(spark, sf_dir).toPandas())
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            n_skip += 1
            continue
        try:
            ddf = _canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok, msg = (_eq_strict if strict else _eq)(sdf, ddf)
        if ok:
            print(f"PASS {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            print(f"  spark head:\n{sdf.head(3)}")
            print(f"  duck  head:\n{ddf.head(3)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

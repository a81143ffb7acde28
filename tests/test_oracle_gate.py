"""In-suite differential oracle gate (SURVEY §5.1): every driver-contract
query with a declared oracle runs on Spark AND DuckDB at sf0.001 and must
match on shape, column names, and stringified values. This is the same
comparison the driver performs at sf0.01 — running it in pytest catches
probe/oracle regressions at commit time instead of round time.

One test loops all queries (session reuse keeps this ~2 min); failures
report the full list of broken queries, not just the first.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _sampled_names(qs: dict, n: int = 45) -> list[str]:
    """Fast-profile subset (r15, VERDICT r14 ask #1): a deterministic
    ROTATING sample of the inventory — ranked by sha256(corpus-identity
    + name), so every regenerated testdata vintage exercises a different
    subset (the same scheme the driver's own correctness sweep uses) and
    a given vintage always re-runs the same one. QS_FULL_TESTS=1 sweeps
    all ~300 (tools/verify_round.py sets it)."""
    import hashlib
    import os

    if os.environ.get("QS_FULL_TESTS"):
        return sorted(qs)
    st = os.stat(f"{SF_DIR}/events.parquet")
    seed = f"{st.st_mtime_ns}:{st.st_size}"

    def rank(name: str) -> str:
        return hashlib.sha256(f"{seed}:{name}".encode()).hexdigest()

    return sorted(sorted(qs, key=rank)[:n])


def test_all_declared_queries_match_oracle(spark, duck):
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    assert len(qs) >= 70, "query inventory shrank unexpectedly"
    failures = []
    for name in _sampled_names(qs):
        fn = qs[name]
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001 — collect, don't abort the sweep
            failures.append(f"{name}: spark raised {type(ex).__name__}: {ex}"[:200])
            continue
        if name not in oracles:
            continue  # rows-only query: execution success is the check
        try:
            ddf = duck.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: oracle raised {type(ex).__name__}: {ex}"[:200])
            continue
        sdf = sdf.sort_index(axis=1).reset_index(drop=True)
        ddf = ddf.sort_index(axis=1).reset_index(drop=True)
        if len(sdf) != len(ddf):
            failures.append(f"{name}: rows {len(sdf)} vs {len(ddf)}")
            continue
        if list(sdf.columns) != list(ddf.columns):
            failures.append(
                f"{name}: columns {list(sdf.columns)} vs {list(ddf.columns)}"
            )
            continue
        bad_cols = [
            c for c in sdf.columns
            if not (sdf[c].astype(str) == ddf[c].astype(str)).all()
        ]
        if bad_cols:
            failures.append(f"{name}: value mismatch in {bad_cols}")
    assert not failures, "\n".join(failures)
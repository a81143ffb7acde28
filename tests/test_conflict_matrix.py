"""Concurrency CONFLICT MATRIX for the versioned table (r7 VERDICT #4):
every pair (A, B) in {append, merge-disjoint, merge-overlap, delete,
compact, optimize, zorder, evolve} x same, where B commits between A's
snapshot read and A's manifest claim.

The contract the matrix pins:

- A = append NEVER conflicts: the commit loop re-merges the latest
  snapshot and retries, so concurrent appends all land (class
  ``converges``).
- Every DERIVED op (everything else) raises ``ConcurrentWriteError``
  instead of erasing the racer's commit (class ``conflict``), and a
  RE-RUN against the new snapshot lands with both effects applied —
  except when B = delete left deletion vectors a merge/optimize/zorder
  retry REFUSES by design (class ``conflict+compact``: fold the debt
  with compact_table, then the retry lands).
- Cells where one side is a structural no-op (compact with no delete
  debt because the other side refuses DVs) are vacuous: the no-op
  commits nothing, so there is nothing to race (class ``vacuous``).

After every cell, the final table must equal applying B's logical
effect then A's to the base — the lost-update freedom the
expected_version guard exists for. The outcome table lives in SCALE.md
("Concurrency conflict matrix")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from querysight_spark.sources.versioned import (
    ConcurrentWriteError,
    compact_table,
    delete_keys,
    evolve_table_schema,
    merge_into,
    optimize_table,
    read_version,
    table_version,
    write_version,
    zorder_table,
)

OPS = [
    "append",
    "merge_disjoint",
    "merge_overlap",
    "delete",
    "compact",
    "optimize",
    "zorder",
    "evolve",
]

# ops whose planning/retry refuses outstanding deletion vectors
_REFUSES_DVS = {"merge_disjoint", "merge_overlap", "optimize", "zorder"}


def _base(spark):
    return spark.range(0, 100).select(
        "id", (F.col("id") * 10).alias("v")
    )


def _apply(spark, root, op: str, role: str) -> None:
    """Run one matrix op. ``role`` ('a'|'b') picks disjoint payloads so
    both sides' effects are distinguishable in the final state."""
    lo = 200 if role == "a" else 300
    mk = 400 if role == "a" else 500
    dk = 10 if role == "a" else 20
    val = -1 if role == "a" else -2
    if op == "append":
        write_version(
            spark,
            spark.range(lo, lo + 5).select(
                "id", F.lit(val).cast("long").alias("v")
            ),
            root,
        )
    elif op in ("merge_disjoint", "merge_overlap"):
        klo = mk if op == "merge_disjoint" else 0
        src = spark.range(klo, klo + 5).select(
            "id", F.lit(val).cast("long").alias("v")
        )
        # update-all merges must carry the target's FULL schema: a
        # merge re-planned after a racing evolve supplies the evolved
        # column (NULL) — the documented re-run-against-new-snapshot
        # recovery includes re-reading the schema
        for c in read_version(spark, root).columns:
            if c not in src.columns:
                src = src.withColumn(c, F.lit(None).cast("string"))
        merge_into(spark, src, root, ["id"])
    elif op == "delete":
        delete_keys(
            spark, root, spark.range(dk, dk + 5).select("id")
        )
    elif op == "compact":
        compact_table(spark, root)
    elif op == "optimize":
        optimize_table(spark, root, min_rows_per_file=1000)
    elif op == "zorder":
        zorder_table(spark, root, ["id"], target_files=4)
    elif op == "evolve":
        evolve_table_schema(spark, root, {f"{role}_tag": "string"})
    else:  # pragma: no cover
        raise AssertionError(op)


def _effect(state: dict, op: str, role: str, evolved: set) -> None:
    """B-then-A logical semantics on a python twin of the table."""
    lo = 200 if role == "a" else 300
    mk = 400 if role == "a" else 500
    dk = 10 if role == "a" else 20
    val = -1 if role == "a" else -2
    if op == "append":
        for i in range(lo, lo + 5):
            state[i] = val
    elif op == "merge_disjoint":
        for i in range(mk, mk + 5):
            state[i] = val
    elif op == "merge_overlap":
        for i in range(0, 5):
            state[i] = val
    elif op == "delete":
        for i in range(dk, dk + 5):
            state.pop(i, None)
    elif op == "evolve":
        evolved.add(f"{role}_tag")
    # compact/optimize/zorder: physical only


@pytest.mark.parametrize("a", OPS)
@pytest.mark.parametrize("b", OPS)
def test_conflict_matrix(spark, tmp_path, a, b):
    from unittest import mock

    import querysight_spark.sources.versioned as vmod

    root = str(tmp_path / "t")
    # 4 small files of 25 rows, zone-mapped on id (optimize and the
    # merges' pruning need both)
    write_version(
        spark, _base(spark).repartitionByRange(4, "id"), root,
        stats_cols=["id"],
    )
    state = {i: i * 10 for i in range(100)}
    evolved: set[str] = set()
    # compact needs delete debt to do anything; only give it debt when
    # the OTHER side tolerates DVs (merge/optimize/zorder refuse them
    # at planning time, so those cells are structurally vacuous)
    need_dvs = "compact" in (a, b) and not ({a, b} & _REFUSES_DVS)
    if need_dvs:
        delete_keys(spark, root, spark.range(90, 95).select("id"))
        for i in range(90, 95):
            state.pop(i, None)

    vacuous_compact = (
        "compact" in (a, b) and not need_dvs
    )

    real_commit = vmod._commit
    fired = {"b": False, "b_committed": False}

    def racing(*args, **kwargs):
        if not fired["b"]:
            fired["b"] = True
            before = table_version(root)
            _apply(spark, root, b, "b")
            fired["b_committed"] = table_version(root) != before
        return real_commit(*args, **kwargs)

    conflicted = False
    with mock.patch.object(vmod, "_commit", side_effect=racing):
        try:
            _apply(spark, root, a, "a")
        except ConcurrentWriteError:
            conflicted = True

    if not fired["b"]:
        # A no-opped before reaching a commit (compact with no debt):
        # nothing raced; run B normally so the state still composes
        assert vacuous_compact and a == "compact"
        _apply(spark, root, b, "b")
        fired["b_committed"] = True

    _effect(state, b, "b", evolved)

    if conflicted:
        assert a != "append", "appends must merge-retry, never conflict"
        assert fired["b_committed"], "conflict without a racing commit"
        try:
            _apply(spark, root, a, "a")
        except ValueError as e:
            # merge/optimize/zorder retry refuses B=delete's DV debt by
            # design: fold it, then the retry lands
            assert b == "delete" and a in _REFUSES_DVS, e
            assert "deletion vectors" in str(e)
            compact_table(spark, root)
            _apply(spark, root, a, "a")
    else:
        # no conflict: A was an append (merge-retry), or B's racing
        # commit was itself a no-op, or A no-opped (vacuous compact)
        assert (
            a == "append" or not fired["b_committed"] or vacuous_compact
        ), f"derived op {a} overwrote a racing {b} commit"
    _effect(state, a, "a", evolved)

    final = read_version(spark, root)
    got = {r["id"]: r["v"] for r in final.select("id", "v").collect()}
    assert got == state, f"A={a} B={b}: lost update"
    assert evolved <= set(final.columns)

"""Round-13 pins: read_changes skips physical rewrites without
diffing (the wh06 profile showed the compact commit's eager full-table
full-outer join was 0.42 s of wh06's 1.78 s at sf0.1 — pure waste
under the _REWRITE_OPS row-preserving contract), plus the three
ADVICE r12 closures on the per-file kf cell path: ensure(("kf",))
releases the cell-decode state (which pinned the compressed sidecar
bytes), read_kf_cells restricts to the snapshot's live set by default
(a removed-but-still-anchored path no longer returns a stale cell),
and key_membership_pruned's gate decision threads through as
force_cells so the two layers can't disagree after delta churn."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import querysight_spark.sources.versioned as vmod
from querysight_spark.sources.versioned import (
    compact_table,
    delete_keys,
    merge_into,
    optimize_table,
    read_changes,
    read_kf_cells,
    read_manifest,
    table_version,
    write_version,
    zorder_table,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "table")


def _kv(spark, ids):
    return spark.createDataFrame(
        [(int(i), int(i) * 10) for i in ids], "id long, v long"
    )


def _clear_caches():
    vmod._ANCHOR_SIDE_CACHE.clear()
    vmod._MANIFEST_CACHE.clear()


# --- read_changes: rewrite commits are skipped, not diffed ---


def test_rewrite_commits_silent_without_key_cols(spark, root):
    """compact/optimize/zorder ranges need no key_cols anymore (the
    diff they'd have keyed never runs) and still read as silence."""
    write_version(spark, _kv(spark, range(100)).repartition(4), root,
                  stats_cols=["id"])
    delete_keys(spark, root, spark.range(0, 5).select(F.col("id")))
    v0 = table_version(root)
    v_c = compact_table(spark, root)
    # pre-r13 this raised "read_changes needs key_cols"
    assert read_changes(spark, root, v0, v_c).count() == 0
    for k in range(3):
        write_version(spark, _kv(spark, range(200 + k * 5, 205 + k * 5)),
                      root)
    v1 = table_version(root)
    v_o = optimize_table(spark, root, min_rows_per_file=50)
    assert read_changes(spark, root, v1, v_o).count() == 0
    v_z = zorder_table(spark, root, ["id", "v"])
    assert read_changes(spark, root, v_o, v_z).count() == 0


def test_rewrite_only_range_schema(spark, root):
    """An all-silent range returns an EMPTY frame with the row schema
    + _change_type + _commit_version (the pre-r13 diff-path contract),
    not a ValueError."""
    write_version(spark, _kv(spark, range(50)).repartition(2), root)
    delete_keys(spark, root, spark.range(0, 3).select(F.col("id")))
    v0 = table_version(root)
    v_c = compact_table(spark, root)
    assert v_c > v0
    feed = read_changes(spark, root, v0, v_c)
    assert feed.count() == 0
    assert feed.columns == ["id", "v", "_change_type", "_commit_version"]


def test_rewrite_skip_does_not_diff(spark, root):
    """The key-diff join must not RUN for a rewrite commit: a compact
    inside a mixed range emits nothing while the real commits' events
    are unchanged, and no full-outer checkpoint fires for it."""
    write_version(spark, _kv(spark, range(40)).repartition(2), root)
    merge_into(
        spark,
        spark.createDataFrame(
            [(1, 111), (100, 1000)], "id long, v long"
        ),
        root,
        ["id"],
    )
    delete_keys(spark, root, spark.range(2, 4).select(F.col("id")))
    v_before = table_version(root)
    v_c = compact_table(spark, root)
    feed = read_changes(spark, root, 1, v_c, key_cols=["id"])
    by_commit = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in feed.groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_commit == {
        (2, "update_pre"): 1,
        (2, "update_post"): 1,
        (2, "insert"): 1,
        (3, "delete"): 2,
    }
    assert all(v <= v_before for v, _t in by_commit)


# --- ADVICE r12 #1: ensure(("kf",)) releases the cell state ---


def test_full_kf_hydration_drops_cell_closure(spark, root):
    write_version(
        spark,
        _kv(spark, range(160)).repartition(16),
        root,
        anchor_parquet_min=1,
        stats_cols=["id"],
        key_filter_cols=["id"],
    )
    v = table_version(root)
    _clear_caches()
    files = read_manifest(root, v, need=())["files"]
    # cold per-cell probe builds the cell state
    read_kf_cells(root, v, files[:1])
    sides = list(vmod._ANCHOR_SIDE_CACHE.values())
    assert sides and all(s._cell_fn is not None for s in sides)
    # full hydration supersedes it — the closure (and the ParquetFile
    # over the compressed sidecar bytes it pins) must be released
    full = read_manifest(root, v)["kf"]
    assert all(s._cell_fn is None for s in sides)
    assert all(s.maps.get("kf") is not None for s in sides)
    # later probes serve from the materialized map, same answer
    assert read_kf_cells(root, v, files[:1]) == {files[0]: full[files[0]]}


# --- ADVICE r12 #2: read_kf_cells restricts to the live set ---


def test_read_kf_cells_live_only_default(spark, root):
    """A removed-but-still-anchored path returns NOTHING by default
    (matching full hydration's view); live_only=False preserves the
    old raw read for callers that want the physical cell."""
    for i in range(4):
        kwargs = (
            {"stats_cols": ["id"], "key_filter_cols": ["id"]}
            if i == 0
            else {}
        )
        write_version(
            spark,
            _kv(spark, range(i * 10, (i + 1) * 10)).coalesce(1),
            root,
            anchor_parquet_min=1,
            **kwargs,
        )
    v0 = table_version(root)
    anchored = read_manifest(root, v0, need=())["files"]
    # an overwrite-style merge touching every row removes old files
    merge_into(
        spark,
        _kv(spark, range(0, 40)).withColumn("v", F.col("id") * 7),
        root,
        ["id"],
    )
    v1 = table_version(root)
    live = set(read_manifest(root, v1, need=())["files"])
    gone = [f for f in anchored if f not in live]
    assert gone, "merge should have rewritten at least one anchored file"
    _clear_caches()
    assert read_kf_cells(root, v1, gone) == {}
    # the physical cells still exist on the anchor when explicitly asked
    _clear_caches()
    raw = read_kf_cells(root, v1, gone, live_only=False)
    assert set(raw) == set(gone)


# --- ADVICE r12 #3: force_cells threads one gate decision through ---


def test_force_cells_overrides_inner_gate(spark, root):
    """With force_cells=True the anchor layer may not fall through to
    the full-column decode even when the request exceeds its own
    n_files-based fraction — the upstream planner already decided."""
    write_version(
        spark,
        _kv(spark, range(160)).repartition(16),
        root,
        anchor_parquet_min=1,
        stats_cols=["id"],
        key_filter_cols=["id"],
    )
    v = table_version(root)
    full = read_manifest(root, v)["kf"]
    _clear_caches()
    files = read_manifest(root, v, need=())["files"]
    # 16/16 files is way over the 1/8 fraction: without force_cells
    # this materializes the whole column; with it, the per-cell path
    got = read_kf_cells(root, v, files, force_cells=True)
    assert got == full
    sides = list(vmod._ANCHOR_SIDE_CACHE.values())
    assert sides and all("kf" not in s.maps for s in sides), (
        "force_cells request fell through to the full-column decode"
    )

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
    evolve_table_schema,
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


# --- property pin: the change feed REPLAYS the table, rewrites and all ---

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _OPS = st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(0, 5)),
            st.tuples(st.just("merge"), st.integers(0, 5)),
            st.tuples(st.just("delete"), st.integers(2, 5)),
            st.tuples(st.just("compact"), st.just(0)),
            st.tuples(st.just("optimize"), st.just(0)),
            st.tuples(st.just("zorder"), st.just(0)),
            st.tuples(st.just("evolve"), st.integers(0, 1)),
        ),
        min_size=1,
        max_size=4,
    )

    @given(_OPS)
    @settings(
        max_examples=6,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_change_feed_replays_table_property(
        spark, tmp_path_factory, ops
    ):
        """For ANY op log — appends, merges, DV deletes, compactions,
        optimizes — folding each commit's read_changes events into the
        previous snapshot reconstructs the next snapshot exactly, and
        update_pre events carry the true pre-image. This is the CDC
        contract refresh_mv_from_feed depends on, pinned END-TO-END
        through the r13 rewrite skip: a rewrite commit that silently
        MOVED logical rows would break the replay equality here."""
        root = str(tmp_path_factory.mktemp("cdc_prop") / "t")
        write_version(
            spark, _kv(spark, range(0, 12)).repartition(2), root
        )
        for kind, arg in ops:
            try:
                if kind == "append":
                    write_version(
                        spark,
                        _kv(
                            spark, range(100 + arg * 10, 104 + arg * 10)
                        ),
                        root,
                    )
                elif kind == "merge":
                    upd = spark.createDataFrame(
                        [
                            (int(i), int(i) * 1000 + arg)
                            for i in range(arg, arg + 6)
                        ],
                        "id long, v long",
                    )
                    merge_into(spark, upd, root, ["id"])
                elif kind == "delete":
                    delete_keys(
                        spark,
                        root,
                        spark.range(0, 200).where(
                            (F.col("id") % arg) == 0
                        ).select("id"),
                    )
                elif kind == "compact":
                    compact_table(spark, root)
                elif kind == "optimize":
                    optimize_table(spark, root, min_rows_per_file=100)
                elif kind == "zorder":
                    zorder_table(spark, root, ["id", "v"])
                else:
                    # metadata-only ADD COLUMN: later appends omit it
                    # (NULL backfill), and the feed's cross-boundary
                    # union must NULL-fill older commits' rows — the
                    # allowMissingColumns seam rides the replay too
                    evolve_table_schema(
                        spark, root, {f"w{arg}": "long"}
                    )
            except ValueError:
                # the engine REFUSING an op (merge/optimize with
                # outstanding delete debt) is its own documented
                # contract — the op simply doesn't commit, and the
                # replay below only walks versions that exist
                continue
        from querysight_spark.sources.versioned import read_version

        V = table_version(root)

        def snap(v):
            return {
                r["id"]: r["v"]
                for r in read_version(spark, root, v).collect()
            }

        prev = snap(1)
        for v in range(2, V + 1):
            cur = snap(v)
            try:
                events = read_changes(
                    spark, root, v - 1, v, key_cols=["id"]
                ).collect()
            except ValueError:
                # metadata-only commit with nothing else in range is
                # a legitimate "no changes" — snapshot must be equal
                assert cur == prev, f"v{v}: silent commit moved rows"
                prev = cur
                continue
            state = dict(prev)
            for r in events:
                if r["_change_type"] == "insert":
                    state[r["id"]] = r["v"]
                elif r["_change_type"] == "delete":
                    assert state.pop(r["id"], None) is not None, (
                        f"v{v}: delete of absent key {r['id']}"
                    )
                elif r["_change_type"] == "update_pre":
                    assert state.get(r["id"]) == r["v"], (
                        f"v{v}: update_pre wrong pre-image {r['id']}"
                    )
                else:
                    state[r["id"]] = r["v"]
            assert state == cur, f"v{v}: replay != snapshot"
            prev = cur

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


# --- DV vintage preservation (found by the CDC replay property) ---


def test_second_delete_does_not_restamp_carried_dvs(spark, root):
    """A later delete commit carries prior deletion vectors AT THEIR
    OWN VINTAGE: before r13, a carried DV whose explicit dvv entry had
    been elided (it equaled its path vintage) fell into the new-vector
    branch and was re-stamped to the NEW delete's version — an old
    tombstone then applied to files appended since, silently shadowing
    re-inserted keys that the delete_keys contract (and the change
    feed) say stay live."""
    write_version(spark, _kv(spark, range(12)).repartition(2), root)
    delete_keys(
        spark, root,
        spark.range(0, 200).where(F.col("id") % 2 == 0).select("id"),
    )
    write_version(spark, _kv(spark, range(100, 104)), root)  # re-adds 100, 102
    delete_keys(
        spark, root,
        spark.range(0, 200).where(F.col("id") % 3 == 0).select("id"),
    )
    from querysight_spark.sources.versioned import read_version

    live = sorted(r["id"] for r in read_version(spark, root, 4).collect())
    # 100 %3 != 0: the v2 tombstone (which named 100 before it existed)
    # must not reach the v3-appended file; 102 %3 == 0: the v4 delete
    # kills it for real
    assert live == [1, 5, 7, 11, 100, 101, 103]
    # feed agrees: only the NEW tombstones' pre-images emit at v4
    ev = sorted(
        (r["id"], r["_change_type"])
        for r in read_changes(spark, root, 3, 4, key_cols=["id"]).collect()
    )
    assert ev == [(3, "delete"), (9, "delete"), (102, "delete")]
    # carried DVs keep their path vintage (no explicit override needed)
    assert read_manifest(root, 4, need=())["dvv"] == {}

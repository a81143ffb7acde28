"""Round-12 pins: per-file kf cell decode (VERDICT r11 ask #2 — the
first cold membership probe of a process decoded the WHOLE kf column,
~0.6 s at 10^5 files, even when zone admission had narrowed to a
handful of candidates), the ``candidates`` parameter threading the
zone-pruned list into ``key_membership_pruned``, ``read_kf_cells``'s
delta-chain resolution (newest ``kf_add`` wins), and backward
compatibility with pre-r12 single-row-group sidecars."""

from __future__ import annotations

import os

import pytest

import querysight_spark.sources.versioned as vmod
from querysight_spark.sources.versioned import (
    key_membership_pruned,
    pruned_files,
    read_kf_cells,
    read_manifest,
    read_version,
    rebuild_key_filters,
    table_version,
    write_version,
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


def _write_anchored(spark, root, n=4, width=10):
    """n one-file commits (v1 folds to a parquet pointer anchor);
    every file carries an ``id`` zone map and membership filter."""
    for i in range(n):
        kwargs = (
            {"stats_cols": ["id"], "key_filter_cols": ["id"]}
            if i == 0
            else {}
        )
        write_version(
            spark,
            _kv(spark, range(i * width, (i + 1) * width)).coalesce(1),
            root,
            anchor_parquet_min=1,
            **kwargs,
        )


def test_kf_cells_match_full_hydration(spark, root):
    """read_kf_cells == the full hydration's kf map restricted to the
    requested paths — anchor cells and delta kf_add entries alike."""
    _write_anchored(spark, root)
    v = table_version(root)
    full = read_manifest(root, v)["kf"]
    _clear_caches()
    files = read_manifest(root, v, need=())["files"]
    got = read_kf_cells(root, v, files)
    assert got == full
    # single-cell probe resolves identically
    _clear_caches()
    one = read_kf_cells(root, v, [files[0]])
    assert one == {files[0]: full[files[0]]}


def test_cell_probe_skips_column_decode(spark, root):
    """A small cold probe must take the PER-CELL path: the cached
    side entry's kf map stays unmaterialized (the whole point — the
    column-wide json.loads never runs). The anchor needs enough files
    that a 1-file probe is under the 1/8 fall-through fraction."""
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
    anchor_files = read_manifest(root, 1, need=())["files"]
    assert len(anchor_files) == 16
    got = read_kf_cells(root, v, anchor_files[:1])
    assert got == {anchor_files[0]: full[anchor_files[0]]}
    sides = list(vmod._ANCHOR_SIDE_CACHE.values())
    assert sides, "probe must have touched the pointer anchor"
    assert all("kf" not in s.maps for s in sides), (
        "small per-cell probe materialized the whole kf column"
    )
    # a later FULL hydration on the same cached entry still completes
    again = read_manifest(root, v)["kf"]
    assert again == full


def test_membership_candidates_subset(spark, root):
    """candidates= splits only the pre-admitted subset, preserving
    manifest order — identical to restricting the full split."""
    _write_anchored(spark, root)
    v = table_version(root)
    files = read_manifest(root, v, need=())["files"]
    kept_all, skipped_all = key_membership_pruned(root, v, "id", [25])
    subset = files[1:]
    _clear_caches()
    kept_sub, skipped_sub = key_membership_pruned(
        root, v, "id", [25], candidates=subset
    )
    sset = set(subset)
    assert kept_sub == [f for f in kept_all if f in sset]
    assert skipped_sub == [f for f in skipped_all if f in sset]
    # unknown paths are dropped, not kept
    kept_x, skipped_x = key_membership_pruned(
        root, v, "id", [25], candidates=["nope.parquet"]
    )
    assert kept_x == [] and skipped_x == []


def test_membership_cold_cell_path_equivalence(spark, root):
    """The cold per-cell membership plan and the full-column plan
    split the files identically (the no-false-negative contract is
    path-independent)."""
    _write_anchored(spark, root)
    v = table_version(root)
    files = read_manifest(root, v, need=())["files"]
    for probe in ([25], [5, 35], [999999]):
        _clear_caches()
        cell_kept, cell_skip = key_membership_pruned(
            root, v, "id", probe, candidates=files[:2]
        )
        _clear_caches()
        read_manifest(root, v)  # force the full-column decode first
        full_kept, full_skip = key_membership_pruned(
            root, v, "id", probe, candidates=files[:2]
        )
        assert cell_kept == full_kept and cell_skip == full_skip


def test_read_version_keys_in_composes_with_prune(spark, root):
    """End-to-end: keys_in + prune now thread the zone-pruned list as
    membership candidates; the result is unchanged."""
    _write_anchored(spark, root)
    got = (
        read_version(
            spark, root, prune=("id", 20, 39), keys_in=("id", [25])
        )
        .select("id", "v")
        .collect()
    )
    assert [(r["id"], r["v"]) for r in got] == [(25, 250)]
    # zone stage admits one file; the membership stage sees only it
    kept_zone, _ = pruned_files(
        root, table_version(root), "id", 20, 39
    )
    assert len(kept_zone) == 2  # ids 20-29 and 30-39


def test_kf_add_overrides_anchor_cell(spark, root):
    """A later commit's kf_add (here a filter REBUILD on the anchored
    file) must win over the anchor's own cell in read_kf_cells —
    newest-first resolution, same as full hydration."""
    write_version(
        spark,
        _kv(spark, range(1000)).coalesce(1),
        root,
        anchor_parquet_min=1,
        stats_cols=["id"],
        key_filter_cols=["id"],
        key_filter_bits=1,
    )
    v2 = rebuild_key_filters(spark, root, bits=10, max_density=0.45)
    full = read_manifest(root, v2)["kf"]
    f0 = read_manifest(root, v2, need=())["files"][0]
    assert full[f0]["id"]["k"] > 1  # the rebuild really changed it
    _clear_caches()
    got = read_kf_cells(root, v2, [f0])
    assert got == {f0: full[f0]}
    # and the probe agrees end-to-end
    _clear_caches()
    kept, skipped = key_membership_pruned(
        root, v2, "id", [555], candidates=[f0]
    )
    assert kept == [f0] and skipped == []


def test_pre_r12_single_group_sidecar_compat(spark, root, monkeypatch):
    """Pre-r12 sidecars hold one big row group; the per-cell path
    degrades to a single column read but stays correct."""
    monkeypatch.setattr(vmod, "_ANCHOR_ROW_GROUP", 1 << 20)
    _write_anchored(spark, root)
    v = table_version(root)
    full = read_manifest(root, v)["kf"]
    _clear_caches()
    files = read_manifest(root, v, need=())["files"]
    got = read_kf_cells(root, v, files[:1])
    assert got == {files[0]: full[files[0]]}


def test_multi_row_group_cell_decode(spark, root):
    """A fold spanning several row groups decodes the right cell from
    each group (the r12 row-group slicing actually slices)."""
    monkey_groups = 64
    keep = vmod._ANCHOR_ROW_GROUP
    vmod._ANCHOR_ROW_GROUP = monkey_groups
    try:
        n = 200  # files -> ~4 row groups at 64 rows each
        full = {
            "version": 1,
            "op": "append",
            "files": [],
            "added": [],
            "removed": [],
            "stats_cols": ["id"],
            "dvs": [],
            "dv_key": [],
            "kf_cols": ["id"],
            "stats": {},
            "kf": {},
            "fv": {},
            "dvv": {},
            "ts": 0.0,
        }
        for i in range(n):
            p = f"data/c{i + 1:08d}-x/part-{i:05d}.parquet"
            full["files"].append(p)
            full["stats"][p] = {"id": [i, i]}
            full["kf"][p] = {
                "id": {
                    "m": 256,
                    "k": 2,
                    "p": os.path.basename(p) + ".id.kf",
                }
            }
        os.makedirs(os.path.join(root, vmod._MANIFESTS))
        folded = dict(full)
        side = vmod._anchor_fold(root, folded, min_entries=1)
        assert side is not None
        _clear_caches()
        probe = [full["files"][0], full["files"][77],
                 full["files"][199]]
        got = vmod._anchor_side(root, folded).kf_cells(probe)
        assert got == {p: full["kf"][p] for p in probe}
        sides = list(vmod._ANCHOR_SIDE_CACHE.values())
        assert sides and all("kf" not in s.maps for s in sides)
        # repeated probe hits the per-cell cache, same answer
        assert vmod._anchor_side(root, folded).kf_cells(probe) == got
        # a LARGE request falls through to the cached full decode
        big = vmod._anchor_side(root, folded).kf_cells(full["files"])
        assert big == full["kf"]
        assert all("kf" in s.maps for s in vmod._ANCHOR_SIDE_CACHE.values())
    finally:
        vmod._ANCHOR_ROW_GROUP = keep


# --- property pin: read_kf_cells == full hydration, any log shape ---

try:
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _name = st.text(
        alphabet="abcdefghij0123456789", min_size=1, max_size=10
    )

    def _filt(draw, p, col="id"):
        return {
            col: {
                "m": draw(st.integers(256, 1 << 16)),
                "k": draw(st.integers(1, 8)),
                "d": draw(st.floats(0, 1, allow_nan=False)),
                "p": (
                    f"{os.path.basename(p)}.{col}.kf"
                    if draw(st.booleans())
                    else "custom.kf"
                ),
            }
        }

    @st.composite
    def _logs(draw):
        """A v1 anchor (pointer-folded or JSON) plus 0-4 delta
        commits that add files, remove files, and override kf
        entries via kf_add — the shapes _hydrate_manifest replays."""
        n0 = draw(st.integers(1, 8))
        files = [f"data/c00000001-aa/f{i}.parquet" for i in range(n0)]
        anchor = {
            "version": 1,
            "op": "append",
            "files": list(files),
            "added": list(files),
            "removed": [],
            "dvs": [],
            "dv_key": [],
            "stats_cols": [],
            "kf_cols": ["id"],
            "stats": {},
            "fv": {},
            "dvv": {},
            "rows": {},
            "kf": {
                f: _filt(draw, f)
                for f in files
                if draw(st.booleans())
            },
        }
        fold = draw(st.booleans())
        deltas = []
        live = list(files)
        nv = draw(st.integers(0, 4))
        for v in range(2, 2 + nv):
            added = [
                f"data/c{v:08d}-bb/{draw(_name)}-{i}.parquet"
                for i in range(draw(st.integers(0, 3)))
            ]
            rm = (
                draw(
                    st.lists(
                        st.sampled_from(live), max_size=2, unique=True
                    )
                )
                if live
                else []
            )
            live = [f for f in live if f not in set(rm)] + added
            kf_targets = draw(
                st.lists(
                    st.sampled_from(live), max_size=4, unique=True
                )
            ) if live else []
            deltas.append(
                {
                    "version": v,
                    "op": "append",
                    "delta_maps": True,
                    "added": added,
                    "removed": rm,
                    "dvs": [],
                    "dv_key": [],
                    "kf_add": {
                        p: _filt(draw, p) for p in kf_targets
                    },
                }
            )
        return anchor, fold, deltas

    @given(_logs())
    @settings(max_examples=40, deadline=None)
    def test_read_kf_cells_equals_full_hydration_property(
        tmp_path_factory, log
    ):
        """For ANY anchor form (pointer/JSON) and delta chain —
        overrides, additions, removals — per-file resolution equals
        the full hydration's kf map on every live file, at every
        version of the log."""
        anchor, fold, deltas = log
        root = str(tmp_path_factory.mktemp("kf_prop"))
        os.makedirs(os.path.join(root, vmod._MANIFESTS))
        import copy

        a = copy.deepcopy(anchor)
        if fold:
            assert vmod._anchor_fold(root, a, min_entries=1)
        with open(vmod._manifest_path(root, 1), "w") as f:
            _json.dump(a, f)
        for d in deltas:
            with open(
                vmod._manifest_path(root, d["version"]), "w"
            ) as f:
                _json.dump(d, f)
        for v in range(1, 2 + len(deltas) - 1 + 1):
            _clear_caches()
            m = read_manifest(root, v)
            want = m["kf"]
            _clear_caches()
            got = read_kf_cells(root, v, m["files"])
            assert got == want, f"v{v} full-probe mismatch"
            if m["files"]:
                p = m["files"][len(m["files"]) // 2]
                _clear_caches()
                one = read_kf_cells(root, v, [p])
                assert one == (
                    {p: want[p]} if p in want else {}
                ), f"v{v} single-cell mismatch"

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass

"""Anchor-manifest encoding curve: JSON vs parquet sidecar at
10^3..10^5 files (VERDICT r10 ask #1).

Anchors are the one O(files) metadata term left after the round-9
delta/fold work — every 32nd commit serializes the full file list +
per-file stats/kf/fv maps. This tool builds a SYNTHETIC anchor at
production shape (realistic path lengths, per-file zone stats on two
columns, spilled key-filter pointers — the 100 TB regime where every
filter is a sidecar, not inline) and measures, per file count:

  * json_bytes        — the round-9 all-JSON anchor encoding
  * parquet_bytes     — the round-10 columnar sidecar encoding
  * ratio             — json/parquet (the ask: >= 10x)
  * fold_ms           — encode cost (paid once per 32 commits)
  * expand_cold_ms    — pointer -> FULL form hydration, cold cache
  * expand_warm_ms    — same, warm (the steady-state reader path)
  * hydrate_list_only_cold_ms — round 11 LAZY path: cold expand with
    need=() (file/DV/delta lists + fv/dvv only — what a plain scan
    plans from); the ask is >= 10x under expand_cold_ms at 10^4-10^5
  * lazy_upgrade_ms   — materializing stats+kf on the already-cached
    lazy entry (first pruning call after a lazy scan)
  * kf_probe_cold_ms  — round 12 PER-CELL path: cold side entry,
    kf cells for an 8-file zone-admitted candidate set
    (row-group-sliced decode; VERDICT r11 ask #2 — the ask is ~10x
    under kf_column_cold_ms at 10^4-10^5 files)
  * kf_cells_first_ms — the per-cell decode ISOLATED (eager side
    already built — the list-only cost every plan pays — then the
    first kf_cells call); the ratio kf_column_cold_ms /
    kf_cells_first_ms is the ask's ~10x
  * kf_column_cold_ms — the r11 behavior the per-cell path replaces:
    cold full-column kf materialization on the lazy entry
  * kf_probe_warm_ms  — the same 8-cell probe against the warm side
    entry (per-cell cache hit)
  * pointer_json_bytes— the JSON manifest that remains (flat ~1 KB)
  * ow_ar_json_bytes  — what an OVERWRITE-shaped anchor's verbatim
    added+removed lists would cost as pointer JSON (continuity note
    r10 #3); round 11 folds them into the sidecar instead
  * ow_pointer_json_bytes / ow_parquet_bytes — the overwrite-shaped
    anchor after the round-11 fold (pointer stays ~flat)

Round-trip equality (files/dvs/stats/kf/fv/dvv identical after
fold+expand) is asserted at every point. Prints one JSON line per
point; paste into SCALE.md.

Usage: python tools/anchor_curve.py [point,point,...]
"""

from __future__ import annotations

import copy
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

POINTS = (
    [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 1
    else [1_000, 10_000, 30_000, 100_000]
)


def _synthetic_anchor(n_files: int, version: int) -> dict:
    """A full-form anchor manifest shaped like a production table's:
    one ~256 MB-class file per commit dir, two stats columns (an int
    key range and an event-time range), a spilled key-filter pointer
    per file, and exceptions-only fv entries for ~1% race losers."""
    rng = uuid.uuid4().hex  # deterministic enough for sizing
    files, stats, kf, fv = [], {}, {}, {}
    for i in range(n_files):
        commit = i + 1
        base = (
            f"data/c{commit:08d}-{rng[:8]}/part-00000-"
            f"{uuid.uuid3(uuid.NAMESPACE_URL, str(i)).hex}-c000"
            ".snappy.parquet"
        )
        files.append(base)
        lo = i * 1_000_000
        stats[base] = {
            "id": [lo, lo + 999_999],
            "ts": [1_700_000_000 + i * 3600, 1_700_003_600 + i * 3600],
        }
        kf[base] = {
            "id": {
                "m": 1 << 23,
                "k": 7,
                "p": os.path.basename(base) + ".id.kf",
            }
        }
        if i % 100 == 3:  # ~1% of appends lost a manifest race
            fv[base] = commit + 2
    return {
        "version": version,
        "op": "append",
        "files": files,
        "added": [files[-1]],
        "removed": [],
        "txn_id": f"t:{version}",
        "stats_cols": ["id", "ts"],
        "dvs": [],
        "dv_key": [],
        "kf_cols": ["id"],
        "kf_bits": 10,
        "stats": stats,
        "kf": kf,
        "fv": fv,
        "dvv": {},
        "ts": 1_700_000_000.0,
    }


def _best_of(fn, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import querysight_spark.sources.versioned as vmod

    for n in POINTS:
        work = tempfile.mkdtemp(prefix="qs_anchor_curve_")
        root = os.path.join(work, "table")
        os.makedirs(os.path.join(root, "_manifests"))
        try:
            version = ((n - 1) // vmod._ANCHOR_EVERY) * vmod._ANCHOR_EVERY + 1
            full = _synthetic_anchor(n, version)
            json_bytes = len(json.dumps(full).encode())
            folded = copy.deepcopy(full)
            t0 = time.perf_counter()
            side = vmod._anchor_fold(root, folded)
            fold_ms = (time.perf_counter() - t0) * 1000
            assert side is not None, "threshold must fold at this size"
            parquet_bytes = os.path.getsize(side)
            pointer_json_bytes = len(json.dumps(folded).encode())

            def expand_cold():
                vmod._ANCHOR_SIDE_CACHE.clear()
                return vmod._anchor_expand(root, folded)

            expanded = expand_cold()
            for k in ("files", "dvs", "stats", "kf", "fv", "dvv",
                      "added", "removed"):
                assert expanded[k] == full[k], f"round-trip broke {k}"
            cold = _best_of(expand_cold)
            warm = _best_of(lambda: vmod._anchor_expand(root, folded))

            def expand_list_only():
                vmod._ANCHOR_SIDE_CACHE.clear()
                return vmod._anchor_expand(root, folded, need=())

            lazy = expand_list_only()
            assert lazy["files"] == full["files"], "lazy list broke"
            assert lazy["fv"] == full["fv"], "lazy fv broke"
            assert "stats" not in lazy and "kf" not in lazy
            list_cold = _best_of(expand_list_only)

            def lazy_upgrade():
                vmod._ANCHOR_SIDE_CACHE.clear()
                vmod._anchor_expand(root, folded, need=())
                t0 = time.perf_counter()
                up = vmod._anchor_expand(root, folded, need=("stats", "kf"))
                dt = time.perf_counter() - t0
                assert up["stats"] == full["stats"], "upgrade broke stats"
                assert up["kf"] == full["kf"], "upgrade broke kf"
                return dt

            upgrade_ms = min(lazy_upgrade() for _ in range(3)) * 1000

            # round 12: per-cell kf probe (an 8-file zone-admitted
            # candidate set — the point-lookup planning shape) vs the
            # r11 full-column materialization, both on a cold side
            probe_paths = [
                full["files"][(i * n) // 8] for i in range(8)
            ]
            want_cells = {p: full["kf"][p] for p in probe_paths}

            def kf_probe_cold():
                vmod._ANCHOR_SIDE_CACHE.clear()
                side_e = vmod._anchor_side(root, folded)
                got = side_e.kf_cells(probe_paths)
                assert got == want_cells, "per-cell kf probe broke"
                assert "kf" not in side_e.maps, (
                    "small probe materialized the whole column"
                )
                return got

            kf_probe_cold_ms = _best_of(kf_probe_cold) * 1000

            def kf_column_cold():
                vmod._ANCHOR_SIDE_CACHE.clear()
                side_e = vmod._anchor_side(root, folded)
                side_e.ensure(("kf",))
                assert side_e.maps["kf"] == full["kf"]

            kf_column_cold_ms = _best_of(kf_column_cold) * 1000

            def kf_cells_first():
                # isolate the per-cell decode itself: eager side
                # already built (the list-only cost every plan pays),
                # time the FIRST kf_cells call on it
                vmod._ANCHOR_SIDE_CACHE.clear()
                side_e = vmod._anchor_side(root, folded)
                t0 = time.perf_counter()
                got = side_e.kf_cells(probe_paths)
                dt = time.perf_counter() - t0
                assert got == want_cells
                return dt

            kf_cells_first_ms = min(
                kf_cells_first() for _ in range(3)
            ) * 1000
            vmod._ANCHOR_SIDE_CACHE.clear()
            warm_side = vmod._anchor_side(root, folded)
            warm_side.kf_cells(probe_paths)
            kf_probe_warm_ms = _best_of(
                lambda: warm_side.kf_cells(probe_paths)
            ) * 1000

            # OVERWRITE shape (continuity r10 #3): added == every file,
            # removed == an equal-sized prior snapshot — the r10 pointer
            # kept both verbatim in JSON
            ow = copy.deepcopy(full)
            ow["added"] = list(ow["files"])
            ow["removed"] = [
                p.replace("data/c", "data/o") for p in ow["files"]
            ]
            ow_ar_json = len(
                json.dumps(
                    {"added": ow["added"], "removed": ow["removed"]}
                ).encode()
            )
            ow_side = vmod._anchor_fold(root, ow)
            assert ow_side is not None
            ow_parquet = os.path.getsize(ow_side)
            ow_pointer = len(json.dumps(ow).encode())
            vmod._ANCHOR_SIDE_CACHE.clear()
            ow_x = vmod._anchor_expand(root, ow, need=())
            assert ow_x["added"] == full["files"], "ow added broke"
            assert len(ow_x["removed"]) == n, "ow removed broke"

            print(
                json.dumps(
                    {
                        "files": n,
                        "json_bytes": json_bytes,
                        "parquet_bytes": parquet_bytes,
                        "ratio": round(json_bytes / parquet_bytes, 1),
                        "pointer_json_bytes": pointer_json_bytes,
                        "fold_ms": round(fold_ms, 1),
                        "expand_cold_ms": round(cold * 1000, 1),
                        "expand_warm_ms": round(warm * 1000, 3),
                        "hydrate_list_only_cold_ms": round(
                            list_cold * 1000, 1
                        ),
                        "lazy_upgrade_ms": round(upgrade_ms, 1),
                        "kf_probe_cold_ms": round(kf_probe_cold_ms, 2),
                        "kf_cells_first_ms": round(
                            kf_cells_first_ms, 2
                        ),
                        "kf_column_cold_ms": round(kf_column_cold_ms, 1),
                        "kf_probe_warm_ms": round(
                            kf_probe_warm_ms, 3
                        ),
                        "ow_ar_json_bytes": ow_ar_json,
                        "ow_pointer_json_bytes": ow_pointer,
                        "ow_parquet_bytes": ow_parquet,
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

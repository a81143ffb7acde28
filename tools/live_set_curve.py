"""Live-set cache micro-curve (round 14, ADVICE r13 #2).

``read_kf_cells``'s ``live_only`` default needs only MEMBERSHIP of the
requested paths in the snapshot's live file list. Pre-fix it built
``set(read_manifest(...)["files"])`` per call — the hydration's raw
dict is cached but every call re-copies the O(n) file list and builds
an O(n) set, putting a linear-in-table-size driver cost back on the
~ms point-lookup path. Post-fix ``_live_file_set`` caches a frozenset
per manifest (stat-keyed, same invalidation contract as the raw
cache) and a warm probe costs one os.stat + O(len(paths)) membership.

Measures, per file count (default 10^4 and 10^5): the per-call cost of
the PRE-fix rebuild vs the POST-fix cached probe (both warm, 8-path
request, best-of-20). Prints one JSON line per point; paste into
SCALE.md.

Run: python tools/live_set_curve.py [n,n,...]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import querysight_spark.sources.versioned as vmod

    points = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [10_000, 100_000]
    )
    base = tempfile.mkdtemp(prefix="qs_live_set_curve_")
    try:
        for n in points:
            root = os.path.join(base, f"t{n}")
            files = [
                f"data/c{1:08d}-deadbeef/part-{i:05d}-0000.snappy.parquet"
                for i in range(n)
            ]
            manifest = {
                "version": 1,
                "op": "append",
                "files": files,
                "added": files,
                "removed": [],
                "dvs": [],
                "dv_key": [],
                "stats": {},
                "stats_cols": [],
            }
            mpath = vmod._manifest_path(root, 1)
            os.makedirs(os.path.dirname(mpath), exist_ok=True)
            with open(mpath, "w") as f:
                json.dump(manifest, f)
            probe = [files[(i * n) // 8] for i in range(8)]

            def pre_fix():
                live = set(
                    vmod.read_manifest(root, 1, need=())["files"]
                )
                return [p for p in probe if p in live]

            def post_fix():
                live = vmod._live_file_set(root, 1)
                return [p for p in probe if p in live]

            def best_of(fn, k=20):
                fn()  # warm: raw-manifest / frozenset caches populated
                b = float("inf")
                for _ in range(k):
                    t0 = time.perf_counter()
                    got = fn()
                    b = min(b, time.perf_counter() - t0)
                    assert got == probe
                return b

            pre_ms = best_of(pre_fix) * 1000
            post_ms = best_of(post_fix) * 1000
            print(
                json.dumps(
                    {
                        "n_files": n,
                        "probe_paths": len(probe),
                        "rebuild_per_call_ms": round(pre_ms, 3),
                        "cached_per_call_ms": round(post_ms, 4),
                        "ratio": round(pre_ms / max(post_ms, 1e-9), 1),
                    }
                )
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

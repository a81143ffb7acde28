"""Lakehouse WRITE-path cost curve: what does a commit cost as the
table's history and file count grow, and what does a manifest
checkpoint buy back?

Streams micro-batch-style appends (one 1-row file per version, each
txn-stamped like start_versioned_sink's batches) and at growing version
counts measures:

  * append_commit_sec — mean wall of the last 5 appends (parquet write
    is ~constant; the metadata tail grows with the manifest)
  * manifest_bytes — the self-contained file list a commit rewrites
  * table_version_sec — snapshot discovery (listing vs forward probes)
  * txn_miss_sec — committed_txn on an UNKNOWN txn id (the check every
    commit pays; worst case = full history scan without a checkpoint)
  * txn_oldest_hit_sec — committed_txn on the FIRST txn ever (a very
    late replay; map hit with a checkpoint, full scan without)

each BEFORE and AFTER checkpoint_manifest at that version — the
numeric evidence for the X168 O(delta) claim. Prints one JSON line per
measurement point; paste the table into SCALE.md.

Round 12 (VERDICT r11 ask #4): a second section measures the WARM
COMMIT at big-table file counts (synthetic 10^4/10^5-file pointer
anchor + real 1-row write_version appends on top):

  * commit_warm_ms        — mean wall of 3 warm appends (parquet write
    + the metadata tail)
  * hydrate_warm_full_ms  — warm full read_manifest (raw + side cache
    hot, so ~all of it is _hydrate_manifest's per-call map copy — the
    term continuity note r11 #3b flagged)
  * copy_share            — hydrate_warm_full_ms / commit_warm_ms; the
    decide-don't-drift rule: fold copy-on-write in only if > 0.20

Usage: python tools/write_path_curve.py [n_versions] [point,point,...]
       python tools/write_path_curve.py --big [point,point,...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_BIG = len(sys.argv) > 1 and sys.argv[1] == "--big"
N_VERSIONS = (
    int(sys.argv[1]) if len(sys.argv) > 1 and not _BIG else 2400
)
POINTS = (
    [int(x) for x in sys.argv[2].split(",")]
    if len(sys.argv) > 2
    else [50, 200, 800, 2400]
)
# past this point the table grows WITH its checkpoint left in place —
# the regime a 10^4-commit deployment actually runs (maintenance
# cadence keeps one) — so the curve past 2k versions measures the
# steady state instead of an O(N^2) no-checkpoint pathology the design
# explicitly tells operators not to run
CKPT_REGIME_FROM = 800


def _best_of(fn, n: int = 5) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from querysight_spark.session import get_spark
    from querysight_spark.sources.versioned import (
        _manifest_path,
        checkpoint_manifest,
        read_manifest,
        committed_txn,
        table_version,
        write_version,
    )

    spark = get_spark(app_name="write-path-curve")
    work = tempfile.mkdtemp(prefix="qs_write_curve_")
    root = os.path.join(work, "table")
    try:
        append_window: list[float] = []
        v = 0
        for point in sorted(p for p in POINTS if p <= N_VERSIONS):
            while v < point:
                v += 1
                df = spark.range(v, v + 1).select(
                    F.col("id"), (F.col("id") * 10).alias("x")
                )
                t0 = time.perf_counter()
                write_version(
                    spark, df, root, txn_id=f"t:{v}",
                    stats_cols=["id"], key_filter_cols=["id"],
                )
                append_window.append(time.perf_counter() - t0)

            def read_metrics() -> dict:
                return {
                    "table_version_ms": round(
                        _best_of(lambda: table_version(root)) * 1000, 2
                    ),
                    "txn_miss_ms": round(
                        _best_of(lambda: committed_txn(root, "nope")) * 1000,
                        2,
                    ),
                    "txn_oldest_hit_ms": round(
                        _best_of(lambda: committed_txn(root, "t:1")) * 1000,
                        2,
                    ),
                }

            manifest_bytes = os.path.getsize(_manifest_path(root, v))
            # round-9 map fold: a DELTA manifest carries O(changed)
            # map entries; anchors (every _ANCHOR_EVERY commits) carry
            # the full maps — report both plus the whole-log total
            from querysight_spark.sources.versioned import _ANCHOR_EVERY
            anchor_v = v - ((v - 1) % _ANCHOR_EVERY)
            anchor_bytes = os.path.getsize(_manifest_path(root, anchor_v))
            mdir0 = os.path.join(root, "_manifests")
            log_bytes = sum(
                os.path.getsize(os.path.join(mdir0, f))
                for f in os.listdir(mdir0)
                if f.startswith("v") and f.endswith(".json")
            )
            # round 10: large anchors spill their payload to parquet
            # sidecars — count them so the log total stays honest
            side_bytes = sum(
                os.path.getsize(os.path.join(mdir0, f))
                for f in os.listdir(mdir0)
                if f.startswith("anchor-") and f.endswith(".parquet")
            )
            t0 = time.perf_counter()
            read_manifest(root, v)
            hydrate_cold = time.perf_counter() - t0
            pre = read_metrics()  # checkpoint-free regime up to here
            t0 = time.perf_counter()
            checkpoint_manifest(root)
            ckpt_sec = time.perf_counter() - t0
            post = read_metrics()
            # a few appends WITH the checkpoint present (commit pays
            # forward probes instead of a listing + full txn scan)
            ckpt_appends = []
            for _ in range(3):
                v += 1
                df = spark.range(v, v + 1).select(
                    F.col("id"), (F.col("id") * 10).alias("x")
                )
                t0 = time.perf_counter()
                write_version(spark, df, root, txn_id=f"t:{v}")
                ckpt_appends.append(time.perf_counter() - t0)
            if point < CKPT_REGIME_FROM:
                # drop the checkpoint so growth to the next point stays
                # in the no-checkpoint baseline regime
                mdir = os.path.join(root, "_manifests")
                for name in os.listdir(mdir):
                    if name.startswith("ckpt-"):
                        os.unlink(os.path.join(mdir, name))
            print(
                json.dumps(
                    {
                        "versions": point,
                        "files": point,
                        "append_commit_sec": round(
                            sum(append_window[-5:]) / 5, 3
                        ),
                        "append_with_ckpt_sec": round(
                            sum(ckpt_appends) / len(ckpt_appends), 3
                        ),
                        "manifest_bytes": manifest_bytes,
                        "anchor_manifest_bytes": anchor_bytes,
                        "log_total_bytes": log_bytes,
                        "anchor_sidecar_total_bytes": side_bytes,
                        "hydrate_cold_ms": round(hydrate_cold * 1000, 2),
                        "grown_with_checkpoint": point >= CKPT_REGIME_FROM,
                        "checkpoint_sec": round(ckpt_sec, 3),
                        "pre_checkpoint": pre,
                        "post_checkpoint": post,
                    }
                )
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


def main_big() -> None:
    """Warm-commit cost at 10^4/10^5 files: a synthetic pointer
    anchor (the anchor_curve fixture — spilled kf pointers, two
    stats columns) written as the table's v1, then REAL 1-row
    write_version appends timed on top of it."""
    import copy as _copy

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.join(REPO, "tools"))
    _argv, sys.argv = sys.argv, [sys.argv[0]]  # anchor_curve parses argv at import
    from anchor_curve import _synthetic_anchor
    sys.argv = _argv

    import querysight_spark.sources.versioned as vmod
    from querysight_spark.session import get_spark
    from querysight_spark.sources.versioned import (
        read_manifest,
        write_version,
    )

    points = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [10_000, 100_000]
    )
    spark = get_spark(app_name="write-path-curve-big")
    for n in points:
        work = tempfile.mkdtemp(prefix="qs_write_big_")
        root = os.path.join(work, "table")
        os.makedirs(os.path.join(root, "_manifests"))
        try:
            full = _synthetic_anchor(n, 1)
            folded = _copy.deepcopy(full)
            assert vmod._anchor_fold(root, folded) is not None
            with open(vmod._manifest_path(root, 1), "w") as f:
                json.dump(folded, f)
            read_manifest(root, 1)  # warm raw + side caches
            warm_full = _best_of(lambda: read_manifest(root, 1), 3)
            warm_list = _best_of(
                lambda: read_manifest(root, 1, need=()), 3
            )
            commits = []
            for i in range(3):
                df = spark.range(i, i + 1).select(
                    F.col("id"), (F.col("id") * 10).alias("x")
                )
                t0 = time.perf_counter()
                write_version(spark, df, root, txn_id=f"big:{i}")
                commits.append(time.perf_counter() - t0)
            commit_warm = sum(commits) / len(commits)
            print(
                json.dumps(
                    {
                        "files": n,
                        "commit_warm_ms": round(commit_warm * 1000, 1),
                        "hydrate_warm_full_ms": round(
                            warm_full * 1000, 1
                        ),
                        "hydrate_warm_list_ms": round(
                            warm_list * 1000, 2
                        ),
                        "copy_share": round(
                            warm_full / commit_warm, 3
                        ),
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--big":
        main_big()
    else:
        main()

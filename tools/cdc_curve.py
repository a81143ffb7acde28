"""Change-feed scale curve (round 13): read_changes cost vs commit mix.

Two axes over a fixed-size table:
  - rewrites: K maintenance cycles (delete-debt + compact) between two
    real commits. Pre-r13 each compact paid an eager FULL-TABLE
    full-outer diff inside read_changes; post-r13 rewrites are skipped,
    so the feed cost must be ~FLAT in K (the delete commits still emit
    their own events, bounded by |keys|).
  - real commits: K merges, each touching a bounded key range. The
    feed plans one union per commit — cost grows LINEARLY in K by
    contract (the docstring's bounded-range guidance).

Run: python tools/cdc_curve.py [n_rows] [--legacy]

--legacy empties _REWRITE_OPS so read_changes key-diffs rewrite
commits again (the pre-r13 behavior) — the A/B for axis 1.
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
    args = [a for a in sys.argv[1:] if a != "--legacy"]
    legacy = "--legacy" in sys.argv[1:]
    n_rows = int(args[0]) if args else 200_000

    from pyspark.sql import functions as F

    from querysight_spark.session import get_spark
    from querysight_spark.sources.versioned import (
        compact_table,
        delete_keys,
        merge_into,
        read_changes,
        table_version,
        write_version,
    )

    spark = get_spark(app_name="cdc_curve")
    spark.sparkContext.setLogLevel("ERROR")
    if legacy:
        import querysight_spark.sources.versioned as vmod

        vmod._REWRITE_OPS = ()
        print("# LEGACY mode: rewrite commits key-diff again (pre-r13)")

    def kv(lo, hi, mul=10):
        return spark.range(lo, hi).select(
            F.col("id"), (F.col("id") * mul).alias("v")
        )

    def feed_time(root):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = read_changes(spark, root, 1, key_cols=["id"]).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), n

    base = tempfile.mkdtemp(prefix="qs_cdc_curve_")
    try:
        print(f"# axis 1: K maintenance cycles (delete 64 keys + compact), {n_rows} rows")
        for k in (0, 2, 8, 16):
            root = os.path.join(base, f"rw{k}")
            write_version(spark, kv(0, n_rows).repartition(8), root,
                          stats_cols=["id"])
            merge_into(
                spark, kv(0, 256, mul=11), root, ["id"]
            )
            for i in range(k):
                delete_keys(
                    spark, root,
                    spark.range(1000 + i * 64, 1064 + i * 64).select("id"),
                )
                compact_table(spark, root)
            t, n = feed_time(root)
            print(json.dumps({
                "rewrite_cycles": k, "versions": table_version(root),
                "feed_best_s": t, "feed_rows": n,
            }))

        print(f"# axis 2: K real merge commits (256 keys each)")
        for k in (1, 4, 8, 16):
            root = os.path.join(base, f"m{k}")
            write_version(spark, kv(0, n_rows).repartition(8), root,
                          stats_cols=["id"])
            for i in range(k):
                merge_into(
                    spark, kv(i * 256, (i + 1) * 256, mul=13 + i),
                    root, ["id"],
                )
            t, n = feed_time(root)
            print(json.dumps({
                "merge_commits": k, "versions": table_version(root),
                "feed_best_s": t, "feed_rows": n,
            }))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

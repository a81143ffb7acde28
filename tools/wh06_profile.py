"""Profile wh06_change_feed's read_changes at sf0.1 (VERDICT r12 ask #2).

The wh06 drift watch fired twice (1.333s r10 -> 1.726s r12 with flat v3
calibration). Split the time three ways:

  - manifest_walk: sum of read_manifest(need=()) calls inside
    read_changes (the r11/r12-reshaped path under suspicion),
  - eager_diffs:   sum of the per-commit localCheckpoint(eager=True)
    executions (the full-outer key-diff joins actually RUN here),
  - plan_rest:     read_changes wall minus the two above (plan build,
    DataFrame plumbing),
  - agg_collect:   the final groupBy/agg collect over the feed.

Run: python tools/wh06_profile.py [sf_dir] [n_runs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession
    from pyspark.sql.classic.dataframe import DataFrame

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("wh06_profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import querysight_spark.sources.versioned as V
    from querysight_spark.extension_queries import EXTENSION_QUERIES

    wh06_fn = EXTENSION_QUERIES["wh06_change_feed"][0]

    # ensure the cached table exists (build excluded from the profile)
    t0 = time.perf_counter()
    wh06_fn(spark, sf_dir).collect()
    build_plus_first = time.perf_counter() - t0
    print(f"first full call (incl. any build): {build_plus_first:.3f}s")

    # instrument: accumulate time inside read_manifest and localCheckpoint
    acc = {"manifest": 0.0, "ckpt": 0.0, "n_manifest": 0, "n_ckpt": 0}
    real_read_manifest = V.read_manifest
    real_ckpt = DataFrame.localCheckpoint

    def timed_manifest(*a, **kw):
        s = time.perf_counter()
        r = real_read_manifest(*a, **kw)
        acc["manifest"] += time.perf_counter() - s
        acc["n_manifest"] += 1
        return r

    ckpt_each: list[float] = []

    def timed_ckpt(self, *a, **kw):
        s = time.perf_counter()
        r = real_ckpt(self, *a, **kw)
        dt = time.perf_counter() - s
        acc["ckpt"] += dt
        acc["n_ckpt"] += 1
        ckpt_each.append(round(dt, 4))
        return r

    results = []
    for i in range(n_runs):
        for k in acc:
            acc[k] = 0
        ckpt_each.clear()
        V.read_manifest = timed_manifest
        DataFrame.localCheckpoint = timed_ckpt
        try:
            t0 = time.perf_counter()
            feed = V.read_changes(
                spark,
                _wh06_root(sf_dir),
                1,
                key_cols=["o_orderkey"],
            )
            rc_wall = time.perf_counter() - t0
        finally:
            V.read_manifest = real_read_manifest
            DataFrame.localCheckpoint = real_ckpt
        from pyspark.sql import functions as F

        t0 = time.perf_counter()
        n = (
            feed.groupBy("_commit_version", "_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        agg_wall = time.perf_counter() - t0
        row = {
            "run": i,
            "read_changes_wall_s": round(rc_wall, 4),
            "manifest_walk_s": round(acc["manifest"], 4),
            "n_manifest": acc["n_manifest"],
            "eager_diffs_s": round(acc["ckpt"], 4),
            "n_ckpt": acc["n_ckpt"],
            "plan_rest_s": round(rc_wall - acc["manifest"] - acc["ckpt"], 4),
            "ckpt_each_s": list(ckpt_each),
            "agg_collect_s": round(agg_wall, 4),
            "total_s": round(rc_wall + agg_wall, 4),
            "feed_groups": len(n),
        }
        results.append(row)
        print(json.dumps(row))

    best = min(results, key=lambda r: r["total_s"])
    print("BEST:", json.dumps(best))
    spark.stop()


def _wh06_root(sf_dir: str) -> str:
    import hashlib
    import tempfile

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    tag = hashlib.sha256(
        f"wh06:{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"qs_wh06_table_{tag}")


if __name__ == "__main__":
    main()

"""Profile mm11_progressive_jpeg_stats (VERDICT r12 ask #4).

mm11 climbed 2.115 -> 2.858 s over r10->r12 with flat CPU calibration.
Split the cost: (a) pure single-threaded encode+decode of the exact
sf0.1 corpus outside Spark (the codec itself), (b) the Spark query
best-of-3 (scheduler + Arrow + double-execution shape), and report the
BLAS/OMP thread environment workers inherit.

Run: python tools/mm11_profile.py [sf_dir] [n_runs]
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

    import numpy as np

    print("numpy", np.__version__)
    for k in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
    ):
        print(k, "=", os.environ.get(k))

    import duckdb

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' "
            "WHERE doc_id % 2 = 0 ORDER BY doc_id"
        ).fetchall()
    ]
    print("n_images", len(ids))

    from querysight_spark.operators.multimodal import (
        decode_image,
        encode_jpeg_progressive,
    )

    # pure single-threaded codec pass over the exact mm11 corpus
    for tag in range(2):
        t0 = time.perf_counter()
        payloads = []
        for did in ids:
            bw, bh = 2 + did % 4, 1 + did % 3
            b = np.arange(bw * bh, dtype=np.int64)
            bv = ((did * 31 + 7 * b) % 256).astype(np.uint8)
            px2 = np.repeat(np.repeat(bv.reshape(bh, bw), 8, axis=0), 8, axis=1)
            payloads.append(
                encode_jpeg_progressive(bw * 8, bh * 8, px2.tobytes(), channels=1)
            )
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for p in payloads:
            decode_image(p)
        t_dec = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "pass": tag,
                    "pure_encode_s": round(t_enc, 3),
                    "pure_decode_s": round(t_dec, 3),
                    "bytes": sum(len(p) for p in payloads),
                }
            )
        )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("mm11_profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from querysight_spark.extension_queries import EXTENSION_QUERIES

    fn = EXTENSION_QUERIES["mm11_progressive_jpeg_stats"][0]
    times = []
    for i in range(n_runs + 1):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        times.append(round(dt, 3))
        print(json.dumps({"spark_run": i, "wall_s": round(dt, 3)}))
    print("BEST spark (excl run 0):", min(times[1:]))
    spark.stop()


if __name__ == "__main__":
    main()

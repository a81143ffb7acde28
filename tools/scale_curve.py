"""Empirical scaling curves for the declared scale paths.

Grows the embedding corpus 10x and 50x past sf0.1 (deterministic
jittered replication — same distribution, same dup structure) and times:
  - dd06-style LSH-bucketed cosine dedup (the declared near-dup path)
    vs the exact blocked-GEMM baseline (dd04 path) while it's feasible;
  - persisted IVF+PQ index build and warm probe (the declared ANN path).

Prints one JSON line per corpus size. The point is the SHAPE: exact
cosine is O(n^2) and must blow up; the LSH path's pair work is
n^2 * L / 2^(k+1) with bounded buckets; the IVF+PQ probe reads only
probed-list code partitions, so probe latency should stay near-flat
while build grows linearly.

Usage: python tools/scale_curve.py [multipliers...]  (default: 1 10 50)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import numpy as np
    from pyspark.sql import functions as F

    from querysight_spark.operators import similarity as S
    from querysight_spark.operators.dedup import (
        embedding_cosine_duplicates,
        embedding_cosine_duplicates_lsh,
    )
    from querysight_spark.session import get_spark
    from querysight_spark.sources import load_table

    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(app_name="scale-curve")
    base = load_table(spark, "embeddings", "/root/testdata/sf0.1")
    dim = len(base.first().embedding)
    q = [float(x) for x in base.where("vec_id = 0").first().embedding]

    for mult in mults:
        if mult == 1:
            vecs = base
        else:
            # deterministic jittered replication: copy c shifts ids and
            # perturbs by seeded noise ~0.5% of vector norm, preserving
            # near-dup structure without exact collisions across copies
            copies = []
            for c in range(mult):
                jitter = F.transform(
                    "embedding",
                    lambda x, i: x + 0.005 * F.sin(F.col("vec_id") * (c + 1) + i),
                )
                copies.append(
                    base.select(
                        (F.col("vec_id") + c * 1_000_000).alias("vec_id"),
                        (jitter if c else F.col("embedding")).alias("embedding"),
                    )
                )
            vecs = copies[0]
            for cdf in copies[1:]:
                vecs = vecs.unionByName(cdf)
            vecs = vecs.repartition(32).persist()
        n = vecs.count()

        out: dict[str, float | int] = {"n": n, "mult": mult}

        t0 = time.time()
        out["lsh_dup_pairs"] = embedding_cosine_duplicates_lsh(
            vecs, threshold=0.95, dim=dim
        ).count()
        out["lsh_dup_sec"] = round(time.time() - t0, 2)

        if n <= 25_000:  # exact all-pairs is the O(n^2) baseline
            t0 = time.time()
            out["exact_dup_pairs"] = embedding_cosine_duplicates(
                vecs, threshold=0.95, expected_n=n
            ).count()
            out["exact_dup_sec"] = round(time.time() - t0, 2)

        path = f"/tmp/qs_curve_ivfpq_{mult}"
        # at fixed n_centroids the probed FRACTION is constant and probe
        # cost grows with n; production scales the coarse quantizer with
        # the corpus (~sqrt growth) so probed bytes stay near-flat
        n_cents = max(16, int(16 * mult ** 0.5))
        out["n_centroids"] = n_cents
        t0 = time.time()
        S.build_ivfpq_index(vecs, path, dim=dim, n_centroids=n_cents, m=32, k=64)
        out["ivfpq_build_sec"] = round(time.time() - t0, 2)
        S.probe_ivfpq_index(spark, path, q, k=10, n_probes=4,
                            rerank_df=vecs, oversample=10).count()  # warm
        t0 = time.time()
        S.probe_ivfpq_index(spark, path, q, k=10, n_probes=4,
                            rerank_df=vecs, oversample=10).count()
        out["ivfpq_probe_sec"] = round(time.time() - t0, 2)

        print(json.dumps(out), flush=True)
        if mult != 1:
            vecs.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

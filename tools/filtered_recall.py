"""Recall of the FILTERED persisted-index probe (ss18's production
point) as the metadata filter tightens — the n_probes-vs-selectivity
tradeoff probe_ivfpq_index's docstring describes, measured.

Fixture: the clustered synthetic corpus (real-embedding cluster
structure); filter = ``vec_id % m == 0`` (uniform thinning — the hard
case: qualifying points spread across every list, so a selective
filter starves fixed-probe candidate sets). Truth = brute-force
filtered top-k. Prints one JSON line per (selectivity, n_probes);
paste the table into SCALE.md.

Usage: python tools/filtered_recall.py [k] [n_queries]
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


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from querysight_spark.operators import similarity as S
    from querysight_spark.session import get_spark
    from querysight_spark.testing import make_clustered_embeddings

    spark = get_spark(app_name="filtered-recall")
    vecs = make_clustered_embeddings(spark).cache()
    n = vecs.count()
    dim = len(vecs.first().embedding)
    qrows = (
        vecs.where(f"vec_id % {max(1, n // n_queries)} = 1")
        .limit(n_queries)
        .collect()
    )
    queries = [[float(x) for x in r.embedding] for r in qrows]

    ix = tempfile.mkdtemp(prefix="qs_filtered_recall_")
    path = os.path.join(ix, "ivfpq")
    S.build_ivfpq_index(vecs, path, dim=dim, n_centroids=16, m=32, k=64)
    try:
        for mod in (2, 5, 10, 50):
            keys = vecs.where(F.col("vec_id") % mod == 0).select("vec_id")
            truths = [
                {
                    r.vec_id
                    for r in S.filtered_topk(
                        vecs, q, F.col("vec_id") % mod == 0, k=k
                    ).collect()
                }
                for q in queries
            ]
            for n_probes in (4, 8, 16):
                hits, t0 = 0, time.time()
                for q, truth in zip(queries, truths):
                    got = {
                        r.vec_id
                        for r in S.probe_ivfpq_index(
                            spark, path, q, k=k, n_probes=n_probes,
                            rerank_df=vecs, oversample=10,
                            filter_keys=keys,
                        ).collect()
                    }
                    hits += len(got & truth) / max(1, len(truth))
                print(
                    json.dumps(
                        {
                            "selectivity": round(1.0 / mod, 3),
                            "n_probes": n_probes,
                            "recall_at_k": round(hits / len(queries), 3),
                            "sec_per_query": round(
                                (time.time() - t0) / len(queries), 2
                            ),
                        }
                    )
                )
    finally:
        shutil.rmtree(ix, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

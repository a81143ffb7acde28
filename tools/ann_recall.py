"""Measure recall@k and warm latency of every ANN variant against brute
force, on the driver testdata AND on a clustered synthetic corpus.

Usage: python tools/ann_recall.py [sf_dir|clustered] [k] [n_queries]

Pass ``clustered`` as the first argument to evaluate on
querysight_spark.testing.make_clustered_embeddings instead of a testdata
dir: the driver corpus is i.i.d.-random (near-orthogonal — coarse-probe
recall there is an adversarial floor), the clustered fixture models real
embedding corpora where neighbors share a cluster (VERDICT r2 item 7).

Each of n_queries seed vectors (drawn from the corpus) is searched with
every variant; recall@k = |variant ∩ brute| / k averaged over queries.
Prints one JSON line, suitable for pasting into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from querysight_spark.operators import similarity as S
    from querysight_spark.session import get_spark
    from querysight_spark.sources import load_table

    spark = get_spark(app_name="ann-recall")
    if sf_dir == "clustered":
        from querysight_spark.testing import make_clustered_embeddings

        vecs = make_clustered_embeddings(spark).cache()
    else:
        vecs = load_table(spark, "embeddings", sf_dir).cache()
    n = vecs.count()
    dim = len(vecs.first().embedding)
    qrows = vecs.where(f"vec_id % {max(1, n // n_queries)} = 1").limit(n_queries).collect()
    queries = [[float(x) for x in r.embedding] for r in qrows]

    # one-time index/training state, excluded from probe timings
    cents, ivfpq_books = S.train_ivfpq(vecs, dim=dim, n_centroids=16, m=32, k=64)
    ivfpq_codes = S.ivfpq_encode(vecs, cents, ivfpq_books).cache()
    ivfpq_codes.count()
    pq_books = S.train_pq_codebooks(vecs, dim=dim, m=32, k=64)
    pq_codes = S.pq_encode(vecs, pq_books).cache()
    pq_codes.count()
    opq_R, opq_books = S.train_opq(vecs, dim=dim, m=32, k=64, outer_iters=3)
    opq_codes = S.opq_encode(vecs, opq_R, opq_books).cache()
    opq_codes.count()
    ivf_cents = S.train_ivf_centroids(vecs, n_centroids=16)

    # persisted-index probes at the EXACT operating points bench.py times
    # (ss04: bits=4 n_probes=4; ss06: oversample=10; ss09: n_probes=8,
    # oversample=10 — both lifted in r4 for recall at ~no latency) so
    # SCALE.md can carry recall next to each probe latency (VERDICT r3
    # ask #7). Same build params as the ensure helpers in
    # extension_queries; indexes built fresh per run.
    import shutil
    import tempfile

    idx_root = tempfile.mkdtemp(prefix="qs_recall_idx_")
    S.build_lsh_index(vecs, f"{idx_root}/lsh", dim=dim, bits=4)
    S.build_pq_index(vecs, f"{idx_root}/pq", dim=dim, m=32, k=64)
    S.build_ivfpq_index(
        vecs, f"{idx_root}/ivfpq", dim=dim, n_centroids=16, m=32, k=64
    )

    variants = {
        "lsh_multiprobe": lambda q: S.lsh_bucketed_topk(
            vecs, q, k=k, bits=4, n_probes=4
        ),
        "ss04_lsh_probe_prod": lambda q: S.probe_lsh_index(
            spark, f"{idx_root}/lsh", q, k=k, bits=4, n_probes=4
        ),
        "ss06_pq_probe_prod": lambda q: S.probe_pq_index(
            spark, f"{idx_root}/pq", q, k=k, rerank_df=vecs, oversample=10
        ),
        "ss09_ivfpq_probe_prod": lambda q: S.probe_ivfpq_index(
            spark, f"{idx_root}/ivfpq", q, k=k, n_probes=8,
            rerank_df=vecs, oversample=10,
        ),
        "ivf_nprobe4": lambda q: S.ivf_topk(
            vecs, q, k=k, n_centroids=16, n_probes=4, centroids=ivf_cents
        ),
        "pq_rerank": lambda q: S.pq_topk_rerank(vecs, pq_codes, pq_books, q, k=k),
        "opq_rerank": lambda q: S.opq_topk_rerank(
            vecs, opq_codes, opq_R, opq_books, q, k=k
        ),
        "ivfpq_rerank": lambda q: S.ivfpq_topk_rerank(
            vecs, ivfpq_codes, cents, ivfpq_books, q, k=k, n_probes=4
        ),
    }

    truth = {
        i: {r.vec_id for r in S.brute_force_topk(vecs, q, k=k).collect()}
        for i, q in enumerate(queries)
    }
    out: dict[str, dict[str, float]] = {}
    for name, fn in variants.items():
        fn(queries[0]).collect()  # warm codegen for this shape
        hits, t0 = 0, time.time()
        for i, q in enumerate(queries):
            got = {r.vec_id for r in fn(q).collect()}
            hits += len(got & truth[i])
        out[name] = {
            "recall_at_k": round(hits / (k * len(queries)), 3),
            "avg_probe_sec": round((time.time() - t0) / len(queries), 3),
        }
    print(json.dumps({"sf_dir": sf_dir, "n": n, "k": k,
                      "n_queries": len(queries), "variants": out}))
    shutil.rmtree(idx_root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

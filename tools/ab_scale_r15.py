"""A/B the two r14 parity-shipped structural wins at the 10x
(sf1-equivalent) fixture (VERDICT r14 ask #3): interleaved in-process
noop-sink runs of

  dd02 signatures: per-row `aggregate` fold (current) vs the r13
      explode -> groupBy(min(string)) SortAggregate path, driven through
      the full minhash_lsh_candidates pipeline with dd02's declared
      parameters;
  cl01 argmax: injective bigint encoding (current) vs the r13
      max(struct(cos, -cid)) SortAggregate path, driven through
      cluster_assign's exact frame over the grown embeddings.

Also asserts result equality between variants (sorted collect) before
timing, so the A/B can never compare two different computations.

Usage: python tools/ab_scale_r15.py [dd02|cl01] [--sf01]  (default: both
at the 10x fixture; --sf01 times against /root/testdata/sf0.1 instead).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROUNDS = 5


def _timed_interleaved(variants: dict):
    """One warm pass each, then N_ROUNDS alternating A/B timings."""
    times = {k: [] for k in variants}
    for k, fn in variants.items():
        fn()  # warm: codegen + JIT
    for _ in range(N_ROUNDS):
        for k, fn in variants.items():
            t0 = time.time()
            fn()
            times[k].append(time.time() - t0)
    out = {}
    for k, ts in times.items():
        ts = sorted(ts)
        out[k] = {
            "best": round(ts[0], 3),
            "med": round(ts[len(ts) // 2], 3),
        }
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from querysight_spark.operators.clustering import cluster_assign
    from querysight_spark.operators.dedup import (
        _shingles,
        banded_keys,
        minhash_lsh_candidates,
    )
    from querysight_spark.operators.parallel import floor_parallelism
    from querysight_spark.operators.vectors import as_double, dot, norm
    from querysight_spark.session import get_spark
    from querysight_spark.sources.catalog import load_table
    from tools.fixture10x import build_fixture

    which = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = (
        "/root/testdata/sf0.1" if "--sf01" in sys.argv else build_fixture()
    )
    print(json.dumps({"data": sf_dir}), flush=True)
    spark = get_spark(app_name="ab-scale-r15")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    import __spark_entry__ as entrymod
    from querysight_spark.extension_queries import _centroids, _docs_near_aug

    if not which or "dd02" in which:
        docs = _docs_near_aug(spark, sf_dir)

        def old_banded(df, num_hashes=8, shingle_size=3, bands=4):
            # r13 path: explode -> groupBy with min(string) per slot
            df = floor_parallelism(df)
            sh = df.select(
                F.col("doc_id"),
                F.explode(_shingles("text", shingle_size)).alias("sh"),
            )
            aggs = [
                F.min(
                    F.md5(F.concat(F.lit(f"{j}:"), F.col("sh")))
                ).alias(f"mh{j}")
                for j in range(num_hashes)
            ]
            sig = sh.groupBy("doc_id").agg(*aggs).select(
                F.col("doc_id"),
                F.array(
                    *[F.col(f"mh{j}") for j in range(num_hashes)]
                ).alias("sig"),
            )
            r = num_hashes // bands
            band_cols = [
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws("|", F.slice("sig", b * r + 1, r))
                    ).alias("key"),
                )
                for b in range(bands)
            ]
            return sig.select(
                F.col("doc_id").alias("bid"),
                F.explode(F.array(*band_cols)).alias("bk"),
            ).select("bid", "bk.band", "bk.key")

        def old_candidates():
            banded = old_banded(docs)
            posting = banded.groupBy("band", "key").agg(
                F.array_sort(F.collect_list("bid")).alias("ids")
            ).where(F.size("ids") <= 64)
            return (
                posting.where(F.size("ids") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "flatten(transform(ids, (x, i) -> "
                            "transform(slice(ids, i + 2, size(ids)), "
                            "y -> struct(x AS doc_a, y AS doc_b))))"
                        )
                    ).alias("pr")
                )
                .select("pr.doc_a", "pr.doc_b")
                .distinct()
            )

        def new_candidates():
            return minhash_lsh_candidates(
                docs, num_hashes=8, shingle_size=3, bands=4,
                max_bucket_size=64,
            )

        a = sorted(map(tuple, new_candidates().collect()))
        b = sorted(map(tuple, old_candidates().collect()))
        assert a == b, f"dd02 variants disagree: {len(a)} vs {len(b)} rows"
        print(json.dumps({"dd02_rows_equal": len(a)}), flush=True)
        res = _timed_interleaved(
            {
                "new_fold": lambda: noop(new_candidates()),
                "old_explode": lambda: noop(old_candidates()),
            }
        )
        print(json.dumps({"dd02": res}), flush=True)

    if not which or "cl01" in which:
        vecs = load_table(spark, "embeddings", sf_dir)
        cents = _centroids(spark, sf_dir)

        def old_assign():
            # floor in BOTH variants (r15 cluster_assign carries it) so
            # the A/B isolates the argmax encoding, not scan width
            v = floor_parallelism(
                vecs.select(
                    F.col("vec_id"), as_double(F.col("embedding")).alias("v")
                )
            ).select("vec_id", "v", norm(F.col("v"), 64).alias("nv"))
            c = cents.select(
                F.col("cid").alias("_cid"),
                as_double(F.col("cvec")).alias("cv"),
            ).select("_cid", "cv", norm(F.col("cv"), 64).alias("ncv"))
            scored = v.crossJoin(F.broadcast(c)).select(
                F.col("vec_id"),
                F.col("_cid"),
                F.round(
                    dot(F.col("v"), F.col("cv"), 64)
                    / (F.col("nv") * F.col("ncv")),
                    6,
                ).alias("cos"),
            )
            best = scored.groupBy("vec_id").agg(
                F.max(
                    F.struct(F.col("cos"), (-F.col("_cid")).alias("ncid"))
                ).alias("m")
            )
            return best.select(
                F.col("vec_id"),
                (-F.col("m.ncid")).alias("cluster_id"),
                F.col("m.cos").alias("cosine"),
            )

        def new_assign():
            return cluster_assign(vecs, cents, dim=64)

        # distributed equality: py4j collect of 200k wide rows is
        # minutes of single-core driver work at the 10x fixture
        n_new = new_assign().count()
        n_diff = (
            new_assign().exceptAll(old_assign()).count()
            + old_assign().exceptAll(new_assign()).count()
        )
        assert n_diff == 0, f"cl01 variants disagree on {n_diff} rows"
        print(json.dumps({"cl01_rows_equal": n_new}), flush=True)
        res = _timed_interleaved(
            {
                "new_bigint": lambda: noop(new_assign()),
                "old_struct": lambda: noop(old_assign()),
            }
        )
        print(json.dumps({"cl01": res}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()

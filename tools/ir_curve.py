"""Growth curve for the persisted BM25 inverted index (ir04): build the
index over a 1x/10x/50x corpus, then time a fixed 4-term query probe.

The claim under test (SURVEY X59): probe cost tracks the MATCHED posting
lists, not the corpus — the term-sorted parquet layout lets the term-IN
pushdown prune non-matching row groups, so a 50x corpus whose growth is
mostly NEW vocabulary (the affine-cipher rewrites translate the original
words away) leaves the query's posting lists nearly unchanged and the
probe nearly flat. Build cost is the linear one-time indexing pass.

Corpus generator shared with tools/text_curve.py. Prints one JSON line
per multiplier. Paste into SCALE.md.

Usage: python tools/ir_curve.py [multipliers...]   (default: 1 10 50)

``--upsert`` mode instead measures the ir09 claim — absorbing a delta
into the upsertable layout costs O(delta + touched termdf buckets),
independent of the base corpus size: at each multiplier it builds the
upsertable index on a 90% base, times the 10%-delta absorb AND the
1%-delta absorb, times the full rebuild for comparison, and checks the
absorbed probe equals the full-rebuild probe row-for-row.

Usage: python tools/ir_curve.py --upsert [multipliers...]  (default: 1 10)
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

from text_curve import _ALPHA, _cipher  # noqa: E402  (shared corpus model)

TERMS = ["vector", "spark", "stream", "slow"]


def _make_corpus(spark, mult: int):
    from pyspark.sql import functions as F

    from querysight_spark.sources import load_table

    base = load_table(spark, "documents", "/root/testdata/sf0.1").select(
        "doc_id", "text"
    )
    copies = [base]
    for c in range(1, mult):
        fam = F.col("doc_id") % 100 == 0
        copies.append(
            base.select(
                (F.col("doc_id") + c * 1_000_000).alias("doc_id"),
                F.when(fam, F.concat("text", F.lit(f" dup{c}")))
                .otherwise(F.translate("text", _ALPHA, _cipher(c)))
                .alias("text"),
            )
        )
    corpus = copies[0]
    for cdf in copies[1:]:
        corpus = corpus.unionByName(cdf)
    return corpus.repartition(32).persist()


def upsert_main(mults: list[int]) -> int:
    from pyspark.sql import functions as F

    from querysight_spark.operators.search import (
        bm25_topk_upsertable,
        build_text_index_upsertable,
        upsert_text_index,
    )
    from querysight_spark.session import get_spark

    spark = get_spark(app_name="ir-curve-upsert")
    for mult in mults:
        corpus = _make_corpus(spark, mult)
        n = corpus.count()
        rec = {"mult": mult, "corpus_n": n}
        for pct in (10, 1):
            is_delta = F.pmod(F.col("doc_id"), 100) < pct
            inc = tempfile.mkdtemp(prefix="qs_ir_upsert_")
            t0 = time.time()
            build_text_index_upsertable(corpus.where(~is_delta), inc)
            rec[f"base_build_sec_p{pct}"] = round(time.time() - t0, 2)
            t0 = time.time()
            upsert_text_index(spark, inc, corpus.where(is_delta))
            rec[f"upsert_sec_p{pct}"] = round(time.time() - t0, 2)
            if pct == 10:  # one probe-equality check per multiplier
                full = tempfile.mkdtemp(prefix="qs_ir_full_")
                t0 = time.time()
                build_text_index_upsertable(corpus, full)
                rec["full_rebuild_sec"] = round(time.time() - t0, 2)
                a = bm25_topk_upsertable(spark, inc, TERMS, k=10).collect()
                t0 = time.time()
                b = bm25_topk_upsertable(spark, full, TERMS, k=10).collect()
                rec["probe_warm_sec"] = round(time.time() - t0, 2)
                rec["probe_equal"] = [tuple(r) for r in a] == [
                    tuple(r) for r in b
                ]
                shutil.rmtree(full, ignore_errors=True)
            shutil.rmtree(inc, ignore_errors=True)
        print(json.dumps(rec), flush=True)
        corpus.unpersist()
    spark.stop()
    return 0


def main() -> int:
    from querysight_spark.operators.search import (
        bm25_topk_indexed,
        build_text_index,
    )
    from querysight_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--upsert"]
    if "--upsert" in sys.argv[1:]:
        return upsert_main([int(m) for m in args] or [1, 10])

    mults = [int(m) for m in args] or [1, 10, 50]
    spark = get_spark(app_name="ir-curve")

    for mult in mults:
        corpus = _make_corpus(spark, mult)
        n = corpus.count()

        path = tempfile.mkdtemp(prefix="qs_ir_curve_")
        t0 = time.time()
        build_text_index(corpus, path)
        build_sec = round(time.time() - t0, 2)

        probe_secs, rows = [], 0
        for _ in range(2):
            t0 = time.time()
            rows = bm25_topk_indexed(spark, path, TERMS, k=10).count()
            probe_secs.append(round(time.time() - t0, 2))

        print(
            json.dumps(
                {
                    "mult": mult,
                    "corpus_n": n,
                    "build_sec": build_sec,
                    "probe_cold_sec": probe_secs[0],
                    "probe_warm_sec": probe_secs[1],
                    "rows": rows,
                }
            ),
            flush=True,
        )
        corpus.unpersist()
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

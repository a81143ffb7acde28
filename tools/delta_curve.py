"""Growth curve for the INCREMENTAL dedup path (dd09): build the
persisted minhash band index over a 1x/10x/50x corpus, then probe it
with a FIXED-SIZE ingest batch.

The claim under test (SURVEY X53): per-batch probe cost is O(delta) —
the corpus enters a probe only through the columnar index scan (a
3-column parquet read), so while the one-time build grows linearly with
the corpus, the probe should stay near-flat as the corpus grows 50x
under a constant batch size. Corpus generator shared with
tools/text_curve.py (affine-cipher rewrites = genuinely new shingle
vocabulary per copy).

Prints one JSON line per multiplier: build_sec (one-time), probe_sec,
pairs found. Paste into SCALE.md.

Usage: python tools/delta_curve.py [multipliers...]   (default: 1 10 50)
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


def main() -> int:
    from pyspark.sql import functions as F

    from querysight_spark.operators.dedup import (
        build_minhash_band_index,
        probe_minhash_band_index,
    )
    from querysight_spark.session import get_spark
    from querysight_spark.sources import load_table

    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(app_name="delta-curve")
    base = load_table(spark, "documents", "/root/testdata/sf0.1").select(
        "doc_id", "text"
    )

    # fixed ingest batch at EVERY multiplier: 1 near-dup of every 50th
    # base doc + an equal count of cipher-novel docs
    near = base.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 90_000_000).alias("doc_id"),
        F.concat("text", F.lit(" ingest0")).alias("text"),
    )
    novel = base.where(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + 91_000_000).alias("doc_id"),
        F.translate("text", _ALPHA, _cipher(7)).alias("text"),
    )
    delta = near.unionByName(novel).persist()
    batch_n = delta.count()

    for mult in mults:
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
        corpus = corpus.repartition(32).persist()
        n = corpus.count()

        path = tempfile.mkdtemp(prefix="qs_delta_curve_")
        t0 = time.time()
        build_minhash_band_index(
            corpus, path, num_hashes=8, shingle_size=3, bands=4,
            max_bucket_size=64,
        )
        build_sec = round(time.time() - t0, 2)

        # warm probe (second run) = the steady-state per-batch cost
        probe_secs = []
        for _ in range(2):
            t0 = time.time()
            pairs = probe_minhash_band_index(
                spark, delta, path, num_hashes=8, shingle_size=3, bands=4
            ).count()
            probe_secs.append(round(time.time() - t0, 2))

        print(
            json.dumps(
                {
                    "mult": mult,
                    "corpus_n": n,
                    "batch_n": batch_n,
                    "build_sec": build_sec,
                    "probe_cold_sec": probe_secs[0],
                    "probe_warm_sec": probe_secs[1],
                    "pairs": pairs,
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

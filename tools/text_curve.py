"""Growth curves for the DECLARED text-dedup paths (dd02 MinHash+LSH,
dd03 n-gram Jaccard) — the text companion to tools/scale_curve.py's
embedding curves (VERDICT r3 ask #5).

Corpus model: the sf0.1 documents table grown 10x/50x the way a real
crawl grows — mostly NEW text plus a fixed rate of near-duplicates:
 * every copy of a doc with doc_id % 100 == 0 keeps the original text
   plus a copy-tagged token (a near-dup FAMILY whose true-pair count
   grows as C(mult, 2) per family);
 * every other doc is re-written through a copy-specific affine
   substitution cipher (312 distinct letter permutations) — same length
   and token distribution, disjoint shingles, so the distinct-shingle
   vocabulary really grows ~mult-fold.

The claims under test: dd02's pair work is banded-posting-list-bounded
(cost ~ corpus shingles + capped-bucket pairs, never all-pairs), and
dd03's ``max_shingle_df`` cap bounds the posting-list explosion while
the family pairs (df = mult <= cap) all survive. Prints one JSON line
per multiplier with pairs found / seconds — paste into SCALE.md.

Usage: python tools/text_curve.py [multipliers...]   (default: 1 10 50)
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_ALPHA = string.ascii_lowercase
# affine ciphers x -> a*x + b mod 26 with a coprime to 26: 12*26 = 312
# distinct permutations, far more than any multiplier we run
_COPRIMES = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def _cipher(c: int) -> str:
    a = _COPRIMES[c % len(_COPRIMES)]
    b = c // len(_COPRIMES)
    return "".join(_ALPHA[(a * i + b) % 26] for i in range(26))


def main() -> int:
    from pyspark.sql import functions as F

    from querysight_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from querysight_spark.session import get_spark
    from querysight_spark.sources import load_table

    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(app_name="text-curve")
    base = load_table(spark, "documents", "/root/testdata/sf0.1").select(
        "doc_id", "text"
    )

    for mult in mults:
        copies = [base]
        for c in range(1, mult):
            near = F.col("doc_id") % 100 == 0
            copies.append(
                base.select(
                    (F.col("doc_id") + c * 1_000_000).alias("doc_id"),
                    F.when(near, F.concat("text", F.lit(f" dup{c}")))
                    .otherwise(F.translate("text", _ALPHA, _cipher(c)))
                    .alias("text"),
                )
            )
        docs = copies[0]
        for cdf in copies[1:]:
            docs = docs.unionByName(cdf)
        docs = docs.repartition(32).persist()
        n = docs.count()
        out: dict[str, float | int] = {"n": n, "mult": mult}

        t0 = time.time()
        out["minhash_pairs"] = minhash_lsh_candidates(
            docs, num_hashes=8, shingle_size=3, bands=4, max_bucket_size=64
        ).count()
        out["minhash_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        out["jaccard_pairs"] = ngram_jaccard_pairs(
            docs, shingle_size=3, threshold=0.5, max_shingle_df=64
        ).count()
        out["jaccard_sec"] = round(time.time() - t0, 2)

        print(json.dumps(out), flush=True)
        docs.unpersist()
    spark.stop()
    return 0




def cap_recall() -> int:
    """``--cap-recall`` mode (VERDICT r5 ask #5): measure the true-pair
    recall COST of the dd02/dd03 scale caps on a viral-boilerplate
    fixture where ground truth is known by construction.

    Fixture: 2,000 organic sf0.1 docs + injected near-dup families of
    sizes [200, 64, 24, 8, 3] — every member is the family boilerplate
    text plus one member-distinct tag token, so all C(size, 2)
    within-family pairs are true near-dups (pairwise Jaccard >> 0.5).
    The 200-family is the "viral boilerplate" case the caps exist for:
    its buckets/shingles blow past any cap under test, so the recall the
    caps forfeit is exactly what this prints.

    For each cap setting: recall = |found within-family pairs| / |true
    pairs|, per family size and overall, one JSON line per (operator,
    cap). Caps: argv values or the default 32/64/128.
    """
    from pyspark.sql import functions as F

    from querysight_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from querysight_spark.session import get_spark
    from querysight_spark.sources import load_table

    caps = [int(c) for c in sys.argv[2:]] or [32, 64, 128]
    sizes = [200, 64, 24, 8, 3]
    spark = get_spark(app_name="text-cap-recall")
    base = (
        load_table(spark, "documents", "/root/testdata/sf0.1")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 2000)
    )
    fam_rows = []
    for f, size in enumerate(sizes):
        # one fixed boilerplate per family, long enough that one tag
        # token keeps pairwise jaccard far above the 0.5 threshold
        boiler = " ".join(f"fam{f}tok{j}" for j in range(40))
        for i in range(size):
            fam_rows.append((10_000_000 + f * 10_000 + i, f"{boiler} v{i}"))
    docs = base.unionByName(
        spark.createDataFrame(fam_rows, "doc_id long, text string")
    ).repartition(32).persist()
    docs.count()

    fam = F.floor((F.col("doc_a") - 10_000_000) / 10_000)
    true_per_fam = {f: s * (s - 1) // 2 for f, s in enumerate(sizes)}

    def recall(found) -> dict:
        hits = (
            found.where(
                (F.col("doc_a") >= 10_000_000) & (F.col("doc_b") >= 10_000_000)
            )
            .where(
                fam == F.floor((F.col("doc_b") - 10_000_000) / 10_000)
            )
            .groupBy(fam.cast("int").alias("f"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = {r.f: r.n for r in hits.collect()}
        per = {
            f"fam{f}_size{s}": round(got.get(f, 0) / true_per_fam[f], 4)
            for f, s in enumerate(sizes)
        }
        total_true = sum(true_per_fam.values())
        per["overall"] = round(
            sum(got.get(f, 0) for f in range(len(sizes))) / total_true, 4
        )
        return per

    for cap in caps:
        t0 = time.time()
        r = recall(
            minhash_lsh_candidates(
                docs, num_hashes=8, shingle_size=3, bands=4,
                max_bucket_size=cap,
            )
        )
        print(
            json.dumps(
                {"op": "dd02_minhash_bucket_cap", "cap": cap, **r,
                 "sec": round(time.time() - t0, 2)}
            ),
            flush=True,
        )
        t0 = time.time()
        r = recall(
            ngram_jaccard_pairs(
                docs, shingle_size=3, threshold=0.5, max_shingle_df=cap
            )
        )
        print(
            json.dumps(
                {"op": "dd03_shingle_df_cap", "cap": cap, **r,
                 "sec": round(time.time() - t0, 2)}
            ),
            flush=True,
        )
    docs.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cap-recall":
        sys.exit(cap_recall())
    sys.exit(main())

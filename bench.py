"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the heaviest representative of each operator family:
5-way join, pattern hash-agg pipeline, window running-sum, MinHash LSH
dedup, n-gram Jaccard, cosine top-k, quality scoring. Times are
end-to-end per query (plan + execute + fetch count) on a warmed session.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "p10_join_agg",
    "p15_five_way_join",
    "p17_running_sum",
    "p30_rollup",
    "ql02_patterns",
    "ql04_models_per_pattern",
    "ql05_uncovered_tables",
    "ql07_merge_runs",
    "ql16_normalize_extract",
    "dd02_minhash_lsh",
    "dd03_ngram_jaccard",
    "dd04_embedding_cosine_dups",
    "dd06_cosine_dups_lsh",
    "ss01_brute_topk",
    "ss04_bucketed_storage_topk",
    "ss05_pq_topk",
    "tx02_quality_scores",
    "tx04_language_id",
    "tx05_scrub_pii",
    "tx06_dedupe_keep_best",
    "tr02_daily_from_hourly",
    "p31_session_window",
    "aj01_asof_join",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from querysight_spark.session import get_spark

    spark = get_spark(app_name="querysight-bench")
    qs = entrymod.queries()

    # warm the JVM/scan path once (excluded from timings)
    qs["p01_scan_filter_project"](spark, SF_DIR).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        _ = n
    total = round(sum(times.values()), 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the heaviest representative of each operator family:
5-way join, pattern hash-agg pipeline, window running-sum, MinHash LSH
dedup, n-gram Jaccard, cosine top-k, quality scoring.

Timing discipline (round 3 change): each query runs THREE times — one
untimed execution compiles its whole-stage-codegen classes and lets the
JIT warm them, then two timed executions whose MINIMUM is the
steady-state latency reported in "queries"/"value". Measured first-run
spikes on this host
are 4-25x the steady state AND vary 5x run-to-run (the same query: 10 s,
34 s, 50 s across runs — C2 compile contention across 32 task threads),
so cold timings drown the signal the bench exists to track. Cold cost is
one-time per query shape per JVM — amortized to noise in any production
session — but it is still REPORTED as "cold_total_sec" so the number is
not hidden. The timed value is best-of-2: the host also shows transient
multi-second stalls (a 1.2 s query intermittently reading 15 s with no
matching GC pause in -Xlog:gc), and min-of-N is the standard guard
against one stall landing on the single timed run.
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

# FROZEN as of round 3 (VERDICT r3 ask #8): this list + the three
# ANN_BENCH probes is the canonical 24-query headline set, kept
# member-identical across rounds so BENCH_r{N} vs BENCH_r{N-1} is a clean
# per-query diff. Add new operators to the oracle gate, not here.
# Round-6 widening (VERDICT r5 ask #1): the frozen v1 set measures only
# r1-era families, so regressions in graph / curation / retrieval /
# behavioral / streaming / time-series / linkage operators were invisible
# to BENCH. headline_v2 adds one representative per previously-unbenched
# family, published as SIBLING fields ("queries_v2" /
# "headline_v2_total_sec") so v1's cross-round per-query diff stays
# member-identical. v2 is now ALSO frozen: extend by appending a v3, not
# by editing this list.
HEADLINE_V2 = [
    "gr02_connected_components",  # graph: large/small-star CC
    "tx21_dup_span_removal",      # curation: exact-substring dedup
    "ir04_bm25_indexed",          # retrieval: persisted-BM25 probe
    "co02_funnel",                # behavioral: ordered funnel
    "st09_stream_anomalies",      # streaming: stateful drain
    "dd09_delta_dedup",           # incremental dedup probe
    "ts05_ewma",                  # time-series: ordered-fold EWMA
    "lk03_entity_resolution",     # linkage: blocked fuzzy ER
]

# Round-6 session-4 widening, same discipline (v1/v2 frozen, append a
# new list): lakehouse-maintenance + new-family representatives. The
# wh/io07 entries build their versioned tables once per corpus vintage
# into /tmp (fingerprint-keyed) — that one-time build lands in the cold
# column of the first run after a testdata regen; the timed value is the
# steady-state manifest-planned probe, the number a deployment actually
# repeats.
HEADLINE_V3 = [
    "io07_zone_map_pruning",      # manifest zone-map data skipping
    "wh03_merge_into",            # copy-on-write pruned MERGE INTO
    "wh04_deletion_vectors",      # merge-on-read delete + compaction
    "wh05_incremental_mv",        # CDC-driven MV refresh
    "gr08_label_propagation",     # synchronous LPA communities
    "dq04_profile_drift",         # two-vintage column-profile drift
    "mm10_y4m_roundtrip",         # video-container codec walk
    "io08_optimize_small_files",  # atomic small-file OPTIMIZE
    "st15_stream_dedup_ingest",   # dedup front door (lens anti-join)
    "wh06_change_feed",           # row-level CDC feed (touched-file diffs)
    "ss18_filtered_index_probe",  # filtered vector search on the index
    "wh07_retractable_mv",        # signed-delta IVM off the feed
    "io09_multi_zone_prune",      # multi-column zone-map conjunction
    "st16_manifest_log_stream",   # commit log as a stream -> MV
]

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
    from querysight_spark.extension_queries import ANN_BENCH
    from querysight_spark.session import get_spark

    spark = get_spark(app_name="querysight-bench")
    qs = entrymod.queries()

    # warm the JVM/scan path once (excluded from timings)
    qs["p01_scan_filter_project"](spark, SF_DIR).count()

    # ANN: declared queries() entries run exact mode for the driver's hash
    # gate; the bench times the production approximate probes instead.
    # Index build (train + encode + write, amortized over many queries) is
    # reported separately, not inside the per-probe timings. The build goes
    # into a bench-PRIVATE fresh root: with the shared /tmp root, indexes
    # left warm by earlier same-session runs made ann_index_build_sec read
    # 0.0 (r4 VERDICT) — this guarantees a real cold build every round.
    import shutil
    import tempfile

    from querysight_spark import extension_queries

    bench_index_root = tempfile.mkdtemp(prefix="qs_bench_index_")
    extension_queries.INDEX_ROOT = bench_index_root
    try:
        _run(spark)
    finally:
        # remove the private index tree even when a query fails mid-run —
        # by design no later run reuses it, so a leak is pure /tmp litter;
        # also reset the module global so any later ANN call in this
        # process falls back to the default root, not the rmtree'd one
        extension_queries.INDEX_ROOT = None
        shutil.rmtree(bench_index_root, ignore_errors=True)


def _run(spark) -> None:
    import __spark_entry__ as entrymod
    from querysight_spark.extension_queries import ANN_BENCH

    qs = entrymod.queries()
    t0 = time.time()
    for prepare, _probe in ANN_BENCH.values():
        prepare(spark, SF_DIR)
    index_build = round(time.time() - t0, 3)

    def timed(run) -> tuple[float, float]:
        t0 = time.time()
        run()  # compile + JIT warm (untimed)
        cold = time.time() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        return cold, best

    times: dict[str, float] = {}
    cold_total = 0.0
    for name in HEADLINE:
        cold, best = timed(lambda: qs[name](spark, SF_DIR).count())
        cold_total += cold
        times[name] = round(best, 3)
    for name, (_prepare, probe) in ANN_BENCH.items():
        cold, best = timed(lambda: probe(spark, SF_DIR).count())
        cold_total += cold
        times[name] = round(best, 3)
    total = round(sum(times.values()), 3)
    times_v2: dict[str, float] = {}
    cold_total_v2 = 0.0
    for name in HEADLINE_V2:
        cold, best = timed(lambda: qs[name](spark, SF_DIR).count())
        cold_total_v2 += cold
        times_v2[name] = round(best, 3)
    total_v2 = round(sum(times_v2.values()), 3)
    times_v3: dict[str, float] = {}
    cold_total_v3 = 0.0
    for name in HEADLINE_V3:
        cold, best = timed(lambda: qs[name](spark, SF_DIR).count())
        cold_total_v3 += cold
        times_v3[name] = round(best, 3)
    total_v3 = round(sum(times_v3.values()), 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                # one-time index build as a SIBLING field, not a queries[]
                # entry: total must equal sum(queries.values()) so
                # cross-round per-query diffs never absorb the build cost
                "ann_index_build_sec": index_build,
                "cold_total_sec": round(cold_total, 3),
                # versioned v2 set (round 6+): same discipline — total_v2
                # equals sum(queries_v2.values()), cold reported beside
                "queries_v2": times_v2,
                "headline_v2_total_sec": total_v2,
                "cold_total_v2_sec": round(cold_total_v2, 3),
                # v3 (round-6 session 4): lakehouse maintenance + new
                # families, same sibling-field discipline
                "queries_v3": times_v3,
                "headline_v3_total_sec": total_v3,
                "cold_total_v3_sec": round(cold_total_v3, 3),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

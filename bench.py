"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the heaviest representative of each operator family:
5-way join, pattern hash-agg pipeline, window running-sum, MinHash LSH
dedup, n-gram Jaccard, cosine top-k, quality scoring.

Timing discipline (round 3, hardened round 7): each query runs FOUR
times — one untimed execution compiles its whole-stage-codegen classes
and lets the JIT warm them, then three timed executions whose MINIMUM is
the steady-state latency reported in "queries"/"value". Measured
first-run spikes on this host are 4-25x the steady state AND vary 5x
run-to-run (C2 compile contention across 32 task threads), so cold
timings drown the signal the bench exists to track. Cold cost is still
REPORTED as "cold_total_sec" so the number is not hidden; min-of-3
guards against the host's transient multi-second stalls landing on a
timed run.

Noise controls (round 7, after BENCH_r06's +36% uniform-slowdown scare):

- FRESH JVM PER SUITE: v1, v2, and v3 each run in their own subprocess
  (own SparkSession/JVM), so a heap aged by 46 earlier queries — or GC
  debt from another suite — cannot bleed into a suite's timings, and
  the canonical v1 number is measured first in a clean JVM every round.
- CALIBRATION PROBE: each suite JVM first times a fixed-work,
  scan-free, data-independent job (a 2^28-row codegen arithmetic fold;
  same work every round, every host). Its best-of-3 lands beside the
  suite's numbers as "calibration_sec". A slow host inflates probe and
  suite together, so value / (calibration_sec / local-baseline) is the
  host-normalized reading — the local baseline and the method live in
  SCALE.md. The reported totals stay RAW (no silent normalization);
  the probe makes an environmental swing diagnosable from the BENCH
  file alone instead of via an A/B worktree resample.
- CAL RATIOS IN THE ARTIFACT (round 12, VERDICT r11 ask #5): the
  summary lines also carry "cal_ratio_vN" = total_vN /
  calibration_vN, the first-order host-drift-normalized reading, so
  a judge reads drift straight from BENCH_r{N}.json without
  forensics. Raw totals stay raw; suites and protocol unchanged.
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

# Round-8 widening (VERDICT r7 ask #7): the round-7 lakehouse/codec
# entries had no bench coverage. Same discipline as v2/v3 — v4 is now
# FROZEN; extend by appending a v5, not by editing this list. The
# wh08/st17/io10/px05 builds amortize per corpus vintage (first run
# after a testdata regen lands in the cold column); the timed value is
# the steady-state probe. Local calibrated baseline in SCALE.md
# ("Bench noise controls", round-8 addendum).
HEADLINE_V4 = [
    "wh08_schema_evolution",      # metadata-only ADD COLUMN + NULL backfill
    "st17_cdc_command_stream",    # exactly-once CDC command replay
    "io10_zorder_optimize",       # Z-order conjunction pruning
    "mm11_progressive_jpeg_stats",  # native progressive-JPEG decode
    "px05_lakehouse_lifecycle",   # full lifecycle composition probe
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

N_TIMED = 3  # best-of-3 (round-7 hardening; was best-of-2)


def _timed(run) -> tuple[float, float]:
    t0 = time.time()
    run()  # compile + JIT warm (untimed)
    cold = time.time() - t0
    best = float("inf")
    for _ in range(N_TIMED):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return cold, best


def _calibration(spark) -> float:
    """Fixed-work host-speed probe: 2^28 rows of codegen arithmetic
    folded to one sum, 64 partitions, no IO, no shuffle beyond the
    final 1-row agg. Identical work every round and host — its
    best-of-3 moves with the machine, not with this repo's code."""

    def run():
        spark.range(0, 1 << 28, 1, 64).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).collect()

    _cold, best = _timed(run)
    return round(best, 3)


def _run_suite(suite: str) -> None:
    """Child process: one suite in its own fresh JVM; prints one JSON
    line {"suite", "queries", "total", "cold_total", "calibration_sec"
    [, "ann_index_build_sec"]}."""
    import __spark_entry__ as entrymod
    from querysight_spark.extension_queries import ANN_BENCH
    from querysight_spark.session import get_spark

    spark = get_spark(app_name=f"querysight-bench-{suite}")
    qs = entrymod.queries()
    # warm the JVM/scan path once (excluded from timings)
    qs["p01_scan_filter_project"](spark, SF_DIR).count()
    calibration = _calibration(spark)

    times: dict[str, float] = {}
    cold_total = 0.0
    out: dict = {"suite": suite, "calibration_sec": calibration}

    names = {
        "v1": HEADLINE,
        "v2": HEADLINE_V2,
        "v3": HEADLINE_V3,
        "v4": HEADLINE_V4,
    }[suite]
    for name in names:
        cold, best = _timed(lambda: qs[name](spark, SF_DIR).count())
        cold_total += cold
        times[name] = round(best, 3)

    if suite == "v1":
        # ANN: declared queries() entries run exact mode for the driver's
        # hash gate; the bench times the production approximate probes.
        # Index build (train + encode + write, amortized over many
        # queries) is reported separately, not inside per-probe timings.
        # A bench-PRIVATE fresh root guarantees a real cold build every
        # round (shared /tmp roots made the build read 0.0 in r4).
        import shutil
        import tempfile

        from querysight_spark import extension_queries

        bench_index_root = tempfile.mkdtemp(prefix="qs_bench_index_")
        extension_queries.INDEX_ROOT = bench_index_root
        try:
            t0 = time.time()
            for prepare, _probe in ANN_BENCH.values():
                prepare(spark, SF_DIR)
            out["ann_index_build_sec"] = round(time.time() - t0, 3)
            for name, (_prepare, probe) in ANN_BENCH.items():
                cold, best = _timed(
                    lambda: probe(spark, SF_DIR).count()
                )
                cold_total += cold
                times[name] = round(best, 3)
        finally:
            extension_queries.INDEX_ROOT = None
            shutil.rmtree(bench_index_root, ignore_errors=True)

    out["queries"] = times
    out["total"] = round(sum(times.values()), 3)
    out["cold_total"] = round(cold_total, 3)
    spark.stop()
    print("\n" + json.dumps(out))


def _collect(suite: str) -> dict:
    """Run one suite in a FRESH JVM (subprocess) and parse its JSON."""
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--suite", suite],
        capture_output=True,
        text=True,
        env=os.environ.copy(),
    )
    # Spark console progress can glue onto stdout lines; try-parse every
    # line that could carry the payload, newest first
    for line in reversed(r.stdout.splitlines()):
        start = line.find('{"suite"')
        if start == -1:
            continue
        try:
            return json.loads(line[start:])
        except json.JSONDecodeError:
            continue
    raise RuntimeError(
        f"suite {suite} produced no result JSON; stderr tail: "
        f"{r.stderr[-2000:]}"
    )


def main() -> None:
    if "--suite" in sys.argv:
        _run_suite(sys.argv[sys.argv.index("--suite") + 1])
        return
    # canonical v1 first, in a clean JVM, every round; then v2/v3 in
    # their own JVMs so no suite's heap state bleeds into another's
    v1 = _collect("v1")
    v2 = _collect("v2")
    v3 = _collect("v3")
    v4 = _collect("v4")
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None

    def _cal_ratio(s: dict) -> float | None:
        # total / calibration (round 12, VERDICT r11 ask #5): the
        # host-drift-normalized number. Two consecutive rounds needed
        # calibration forensics to read raw totals correctly; this
        # ratio divides the fixed-work host-speed probe out, so a
        # cross-round comparison of cal_ratio_* is drift-free to
        # first order. Pure reporting — suites and protocol unchanged.
        c = s.get("calibration_sec")
        return round(s["total"] / c, 2) if c else None

    cal_ratios = {
        "cal_ratio_v1": _cal_ratio(v1),
        "cal_ratio_v2": _cal_ratio(v2),
        "cal_ratio_v3": _cal_ratio(v3),
        "cal_ratio_v4": _cal_ratio(v4),
    }
    # FULL detail first; a COMPACT totals line LAST (below). The driver
    # records only a bounded tail of stdout — BENCH_r08's single line
    # outgrew it and parsed as null (VERDICT r9 ask #6), so the final
    # line must be a complete, small JSON object on its own: the spec
    # keys plus every suite total and calibration. Per-query detail for
    # v2-v4 lives in the full line (and in SCALE.md's round records).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": v1["total"],
                "unit": "sec",
                "queries": v1["queries"],
                # one-time index build as a SIBLING field, not a queries[]
                # entry: total must equal sum(queries.values()) so
                # cross-round per-query diffs never absorb the build cost
                "ann_index_build_sec": v1.get("ann_index_build_sec"),
                "cold_total_sec": v1["cold_total"],
                # versioned v2 set (round 6+): same discipline — total_v2
                # equals sum(queries_v2.values()), cold reported beside
                "queries_v2": v2["queries"],
                "headline_v2_total_sec": v2["total"],
                "cold_total_v2_sec": v2["cold_total"],
                # v3 (round-6 session 4): lakehouse maintenance + new
                # families, same sibling-field discipline
                "queries_v3": v3["queries"],
                "headline_v3_total_sec": v3["total"],
                "cold_total_v3_sec": v3["cold_total"],
                # v4 (round 8): the round-7 lakehouse/codec headliners,
                # same sibling-field discipline
                "queries_v4": v4["queries"],
                "headline_v4_total_sec": v4["total"],
                "cold_total_v4_sec": v4["cold_total"],
                # round-7 noise controls: each suite ran in its own fresh
                # JVM; calibration_sec is the fixed-work host-speed probe
                # timed inside each suite's JVM (method + local baselines
                # in SCALE.md "Bench noise controls")
                "fresh_jvm_per_suite": True,
                "timed_runs_per_query": N_TIMED,
                "calibration_sec": v1["calibration_sec"],
                "calibration_v2_sec": v2["calibration_sec"],
                "calibration_v3_sec": v3["calibration_sec"],
                "calibration_v4_sec": v4["calibration_sec"],
                **cal_ratios,
                "sf": sf,
            }
        )
    )
    compact = {
        "metric": "headline_queries_total_sec",
        "value": v1["total"],
        "unit": "sec",
        "queries": {k: round(t, 2) for k, t in v1["queries"].items()},
        "ann_index_build_sec": v1.get("ann_index_build_sec"),
        "headline_v2_total_sec": v2["total"],
        "headline_v3_total_sec": v3["total"],
        "headline_v4_total_sec": v4["total"],
        "cold_total_sec": v1["cold_total"],
        "calibration_sec": v1["calibration_sec"],
        "calibration_v2_sec": v2["calibration_sec"],
        "calibration_v3_sec": v3["calibration_sec"],
        "calibration_v4_sec": v4["calibration_sec"],
        **cal_ratios,
        "sf": sf,
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()

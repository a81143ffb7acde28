"""Round-14 calibration read (VERDICT r13 watch #1/#2): isolate the
v1 dedup/text entries that drifted +14..35% in the driver's r13 bench
while calibration was flat (dd02 +23%, dd03 +17%, tx02 +35%, tx06
+23%, p31 +29%, ss09 +14%) plus io10 (+22% in v4), each best-of-3 on
a quiet host against the same fixed-work calibration probe bench.py
uses. If the drift reproduces normalized here, the next step is a
dd02 stage split (the mm11/X200 playbook); if it does not, the driver
drift was suite-position/corpus-vintage noise and the watch closes
with numbers.

Run with NOTHING else on the host: python tools/drift_read_r14.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ENTRIES = [
    "dd02_minhash_lsh",
    "dd03_ngram_jaccard",
    "tx02_quality_scores",
    "tx06_dedupe_keep_best",
    "p31_session_window",
    "ss09_ivfpq_probe_prod",  # ANN_BENCH probe (index ensured first)
    "io10_zorder_optimize",
]

# driver-recorded values for the same entries (sf0.1): BENCH_r12/r13
DRIVER = {
    "dd02_minhash_lsh": (1.88, 2.31),
    "dd03_ngram_jaccard": (2.0, 2.33),
    "tx02_quality_scores": (0.2, 0.27),
    "tx06_dedupe_keep_best": (0.57, 0.7),
    "p31_session_window": (0.28, 0.36),
    "ss09_ivfpq_probe_prod": (1.55, 1.76),
    "io10_zorder_optimize": (0.416, 0.509),
}
DRIVER_CAL = {"r12_v1": 0.239, "r13_v1": 0.230, "r12_v4": 0.219, "r13_v4": 0.216}


def _timed(run, n=3):
    t0 = time.time()
    run()
    cold = time.time() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return cold, best


def main() -> None:
    import __spark_entry__ as entrymod
    from querysight_spark.extension_queries import ANN_BENCH
    from querysight_spark.session import get_spark

    spark = get_spark(app_name="drift-read-r14")
    qs = entrymod.queries()
    for name, (prepare, probe) in ANN_BENCH.items():
        if name in ENTRIES:
            prepare(spark, SF_DIR)
            qs[name] = probe
    qs["p01_scan_filter_project"](spark, SF_DIR).count()

    def cal():
        spark.range(0, 1 << 28, 1, 64).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).collect()

    _c, cal_best = _timed(cal)
    out = {"sf_dir": SF_DIR, "calibration_sec": round(cal_best, 3)}
    rows = {}
    for name in ENTRIES:
        cold, best = _timed(lambda: qs[name](spark, SF_DIR).count())
        r12, r13 = DRIVER[name]
        rows[name] = {
            "local_best": round(best, 3),
            "local_cold": round(cold, 3),
            "driver_r12": r12,
            "driver_r13": r13,
        }
    out["entries"] = rows
    # re-probe calibration after the suite: a drifting probe means the
    # host was not quiet and the read is invalid
    _c, cal2 = _timed(cal)
    out["calibration_after_sec"] = round(cal2, 3)
    out["driver_calibration"] = DRIVER_CAL
    print(json.dumps(out))


if __name__ == "__main__":
    main()

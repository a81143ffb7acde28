"""Key-filter saturation curve (VERDICT r10 ask #4): how does
membership pruning decay as filters saturate, and does
rebuild_key_filters recover it?

One table per bits-per-key point (8 files x 50k sequential int keys,
unclustered from the zone stage's perspective — membership is the only
pruning). Measures, from the manifest alone plus an absent-key probe
sweep:

  * density       — stored ones-density d (fpr ~= d^k)
  * fpr_absent    — measured absent-key admit rate over 200 probes
  * files_admitted— mean files admitted for a single present key
                    (1 = perfect pruning, 8 = none)

then rebuilds the 1-bit table at 10 bits/key and reports the same
metrics — the recovery the maintenance pass buys. Prints one JSON
line per point; paste into SCALE.md.

Usage: python tools/kf_saturation_curve.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = 8
ROWS = 50_000


def main() -> None:
    from querysight_spark.session import get_spark
    from querysight_spark.sources.versioned import (
        key_membership_pruned,
        read_manifest,
        rebuild_key_filters,
        table_version,
        write_version,
    )

    spark = get_spark(app_name="kf-saturation-curve")
    work = tempfile.mkdtemp(prefix="qs_kf_sat_")

    def build(tag: str, bits: int) -> str:
        root = os.path.join(work, tag)
        for i in range(N_FILES):
            df = spark.range(i * ROWS, (i + 1) * ROWS).selectExpr(
                "id", "id * 2 as v"
            )
            write_version(spark, df.coalesce(1), root,
                          key_filter_cols=["id"], key_filter_bits=bits)
        return root

    def metrics(root: str) -> dict:
        v = table_version(root)
        m = read_manifest(root, v)
        dens = [c["id"]["d"] for c in m["kf"].values()]
        total = N_FILES * ROWS
        absent = [total + 17 + i * 7919 for i in range(200)]
        fp = 0
        for key in absent:
            kept, _ = key_membership_pruned(root, v, "id", [key])
            fp += len(kept)
        present = [i * 7919 % total for i in range(50)]
        admitted = 0
        for key in present:
            kept, _ = key_membership_pruned(root, v, "id", [key])
            admitted += len(kept)
        return {
            "kf_bits": m["kf_bits"],
            "density": round(sum(dens) / len(dens), 3),
            "fpr_absent": round(fp / (200 * N_FILES), 4),
            "files_admitted_present": round(admitted / 50, 2),
        }

    try:
        roots = {}
        for bits in (1, 2, 4, 10, 16):
            roots[bits] = build(f"b{bits}", bits)
            print(
                json.dumps({"table": f"{bits}-bit", **metrics(roots[bits])}),
                flush=True,
            )
        # the maintenance recovery: rebuild the saturated 1-bit table
        rebuild_key_filters(spark, roots[1], bits=10)
        print(
            json.dumps({"table": "1-bit after rebuild@10",
                        **metrics(roots[1])}),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

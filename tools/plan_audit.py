"""Whole-inventory plan audit: run every queries() entry at a small SF,
collect it, and flag scale-hostile physical-plan shapes:

- single-partition exchanges beyond the benign 1-row-scalar-aggregate
  pattern (the r4 weak-plan class: global sorts/windows/limits funneling
  full tables through one task),
- row_number windows with no partitioning,
- high re-executed scan counts (a subtree consumed N times without a
  persist/checkpoint).

This is the X96/X98 scan-audit discipline applied to the FULL inventory
instead of per-operator spot checks. Exit code 1 if any entry exceeds
the thresholds, so it can gate a round.

Usage: python tools/plan_audit.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Entries allowed extra single-partition exchanges: name -> (max_count,
# reason). Every allowance must be a bounded-rows shape (scalar agg over
# partials, a bounded-domain window, a collect_list over a vocabulary-
# sized cell table) — NOT a full-table funnel. One SP exchange is always
# allowed (a lone global scalar aggregate is the normal partial/final
# shape); the bound here is COMPARED, not a blanket exemption, so an
# allowlisted entry that regresses past its recorded shape still flags
# (r5 review finding).
ALLOWED_SINGLE_PARTITION: dict[str, tuple[int, str]] = {
    "an03_ks_drift": (
        2,
        "declared EXACT mode: the ECDF cumulative window over the "
        "DISTINCT-value table + the 1-row D-statistic agg. Both were "
        "always in the plan; the r6 persist->localCheckpoint cache-"
        "hygiene fix (r5 ADVICE) made the window's exchange visible to "
        "the audit (the session-lived persist hid the subtree). The "
        "bounded-cardinality scale path is an06 (binned, <=n_bins "
        "window); the docstring routes unbounded metrics there",
    ),
    "an05_benford": (2, "9-row digit-domain window + 1-row total agg"),
    "an06_ks_drift_binned": (3, "edge scalar agg + <=n_bins ECDF window + totals"),
    "st11_stream_drift_monitor": (
        2,
        "monitor read-out: <=n_bins ECDF window over the drained bucket "
        "counts + the 1-row decision agg (an06's bounded shape; the "
        "stream side is a bounded-state streaming agg, not in this plan)",
    ),
    "co02_funnel": (4, "stage-table (len(stages) rows) windows + scalar aggs"),
    "ql19_coverage_metrics": (2, "global coverage metrics: scalar aggs over partials"),
    "ql21_pattern_summary": (3, "global summary row: scalar aggs over partials"),
    "vx03_mutual_information": (6, "per-feature 1-row total + vocab-cell ordered fold"),
}

# Entries allowed extra file scans: name -> (max_count, reason). Scans
# of DISTINCT sources are not re-executions.
ALLOWED_SCANS: dict[str, tuple[int, str]] = {
    "h08_market_share": (8, "8 scans = 8 distinct TPC-H tables (join fan-in)"),
    "h02_min_cost_supplier": (
        7,
        "Q2 references the supply view in both the outer block and the "
        "correlated-MIN subquery (partsupp appears twice in canonical Q2); "
        "supplier/nation/region are re-referenced by the subquery — all "
        "distinct logical references, no re-executed subtree",
    ),
    "h21_suppliers_kept_waiting": (
        8,
        "canonical Q21 scans lineitem 3x (l1 + EXISTS l2 + NOT EXISTS l3) "
        "and orders 2x; the rest is dim fan-in — distinct references",
    ),
    "an08_mad_outliers_approx": (
        7,
        "A/B self-check by design: the exact MAD path (3 pushdown-pruned "
        "scans) AND its approx_percentile production twin (3 scans) run "
        "in one plan plus the group-universe scan, so the tolerance "
        "booleans bind both; a production caller runs ONE path (an07's "
        "3-scan shape)",
    ),
}


def main() -> int:
    import __spark_entry__ as entrymod
    from querysight_spark.plans.inspect import plan_summary
    from querysight_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]
    spark = get_spark(app_name="plan-audit", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    flagged, audited = [], 0
    t_start = time.time()
    for name, fn in sorted(qs.items()):
        if filters and not any(f in name for f in filters):
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()
            s = plan_summary(df)
        except Exception as e:  # audit everything; report breakage loudly
            flagged.append((name, f"ERROR {type(e).__name__}: {e}"))
            continue
        audited += 1
        issues = []
        sp_cap = ALLOWED_SINGLE_PARTITION.get(name, (1, ""))[0]
        if s["n_single_partition"] > sp_cap:
            issues.append(
                f"single_partition={s['n_single_partition']} (cap {sp_cap})"
            )
        scan_cap = ALLOWED_SCANS.get(name, (6, ""))[0]
        if s["n_scans"] > scan_cap:
            issues.append(f"scans={s['n_scans']} (cap {scan_cap})")
        if issues:
            flagged.append((name, ", ".join(issues) + f"  (full: {s})"))
    print(f"\naudited {audited} entries in {time.time() - t_start:.0f}s")
    if flagged:
        print(f"{len(flagged)} flagged:")
        for name, why in flagged:
            print(f"  {name}: {why}")
    else:
        print("0 flagged")
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Skewed-join evidence for the salted-join fallback (VERDICT r3 ask #6).

Fixture: an 8M-row fact table where ONE key owns 80% of the rows, joined
to a 200k-row dim on that key. Broadcast is disabled for the run — at
100 TB the dim side routinely exceeds the broadcast threshold, which is
exactly when skew starts to matter; locally the dim would broadcast and
hide the effect entirely.

Three runs over the same data (warm, best-of-2 after an untimed pass):
  1. plain        — shuffle join, AQE on but skew-join splitting OFF:
                    the unmitigated baseline where the hot key's
                    partition serializes one task.
  2. aqe_skew     — shuffle join with AQE skew-join splitting ON (the
                    session default): AQE splits the oversized partition
                    and duplicates the matching dim partition.
  3. salted       — operators.skew.salted_join with the hot key salted
                    across 32 partitions (AQE on, skew split on — it has
                    nothing left to split).

Also records whether the executed aqe_skew plan actually contains a
``skew=true`` sort-merge join, so the comparison is honest about what
AQE did. Prints one JSON line — paste the numbers into SCALE.md.

Usage: python tools/skew_bench.py [fact_rows] [dim_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from querysight_spark.operators.skew import salted_join, skewed_keys
    from querysight_spark.session import get_spark

    fact_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    dim_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    spark = get_spark(app_name="skew-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # 80% of fact rows hit key 0; the rest spread over the dim key space
    fact = (
        spark.range(fact_rows)
        .select(
            F.when(F.col("id") % 5 < 4, F.lit(0))
            .otherwise(F.pmod(F.hash("id"), F.lit(dim_rows)))
            .alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .persist()
    )
    dim = (
        spark.range(dim_rows)
        .select(F.col("id").alias("k"), (F.col("id") % 13).alias("grp"))
        .persist()
    )
    fact.count(), dim.count()

    def timed(mk) -> tuple[float, int, bool]:
        # collect(), not count(): the queries end in a 13-row aggregate,
        # and only collect() drives THIS DataFrame's queryExecution —
        # count() wraps a new plan, leaving df's own adaptive plan
        # unexecuted (isFinalPlan=false, no AQE decisions to inspect)
        mk().collect()  # untimed warm pass (codegen/JIT)
        best, rows, skewed = float("inf"), 0, False
        for _ in range(2):
            df = mk()
            t0 = time.time()
            rows = len(df.collect())
            best = min(best, time.time() - t0)
            skewed = "skew=true" in (
                df._jdf.queryExecution().executedPlan().toString()
            )
        return round(best, 2), rows, skewed

    def plain():
        return fact.join(dim, "k").groupBy("grp").agg(F.sum("v").alias("s"))

    def salted():
        hot = skewed_keys(fact, ["k"], min_rows=fact_rows // 10)
        return salted_join(fact, dim, ["k"], num_salts=32, only_keys=hot).groupBy(
            "grp"
        ).agg(F.sum("v").alias("s"))

    out: dict[str, object] = {"fact_rows": fact_rows, "dim_rows": dim_rows}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    out["plain_sec"], n_plain, _ = timed(plain)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["aqe_skew_sec"], n_aqe, s_aqe = timed(plain)
    out["aqe_plan_has_skew_split"] = s_aqe

    # AQE's default split threshold (256 MB) is tuned for production
    # partitions and never fires on a local-size hot key — lower it so the
    # split genuinely happens, for an honest salted-vs-split comparison
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    out["aqe_tuned_sec"], n_tuned, s_tuned = timed(plain)
    out["aqe_tuned_plan_has_skew_split"] = s_tuned
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")

    out["salted_sec"], n_salted, _ = timed(salted)
    assert n_plain == n_aqe == n_tuned == n_salted, (
        n_plain, n_aqe, n_tuned, n_salted,
    )
    out["result_rows"] = n_plain

    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""PageRank growth curve: does the iterative join+agg loop scale with
edges, or degrade superlinearly (lineage growth, shuffle blowup)?

Grows the sf0.1 customer-supplier trade graph by replicating it with
id offsets (disjoint components — node and edge counts scale exactly by
the factor, rank mass stays conserved per component), then times the
SAME 5-iteration pagerank at each size.

Usage: python tools/graph_curve.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from querysight_spark.operators.graph import pagerank, symmetrize
    from querysight_spark.session import get_spark
    from querysight_spark.sources.catalog import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="graph-curve", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
        .persist()
    )
    n_base = base.count()
    print(f"base distinct cust-supp pairs: {n_base}")

    for mult in (1, 4, 16):
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        edges = (
            base.crossJoin(reps)
            .select(
                F.concat(F.lit("c"), (F.col("c") + F.col("rep") * 10_000_000)
                         .cast("string")).alias("src"),
                F.concat(F.lit("s"), (F.col("s") + F.col("rep") * 10_000_000)
                         .cast("string")).alias("dst"),
            )
        )
        sym = symmetrize(edges)
        t0 = time.time()
        pr = pagerank(sym, iterations=5)
        n_nodes = pr.count()
        dt = time.time() - t0
        total = pr.agg(F.sum("pr")).first()[0]
        print(
            f"mult={mult:>2}  directed_edges={2 * mult * n_base:>8}  "
            f"nodes={n_nodes:>7}  5-iter time={dt:6.2f}s  "
            f"rank_mass={total:.3f} (expect 1.000 — global 1/N init "
            f"conserves total mass across disjoint components)"
        )

    # --- connected components: rounds vs worst-case graph shape ---------
    # Path graphs are the adversarial case (diameter = n): min-label
    # propagation needs n rounds; large-star/small-star must stay ~log n.
    from querysight_spark.operators.graph import connected_components

    print("\nconnected components on an n-node path (diameter = n - 1):")
    for n in (1_000, 10_000, 100_000):
        path = spark.range(n - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        stats: dict = {}
        t0 = time.time()
        cc = connected_components(path, max_iter=40, stats=stats)
        ncomp = cc.select("component").distinct().count()
        dt = time.time() - t0
        print(
            f"n={n:>7}  rounds={stats['rounds']:>2}  "
            f"converged={stats['converged']}  components={ncomp}  "
            f"time={dt:6.2f}s  (min-label would need {n - 1} rounds)"
        )
    # --- triangles: id vs degree orientation on a hub-skewed graph ------
    # A MID-ID hub adjacent to everyone is the id-orientation killer:
    # ~(n/2) in-edges x (n/2) out-edges route ~n^2/4 wedge candidates
    # through the one hub as the wedge middle. Degree orientation points
    # every hub edge INTO the hub (d_out(hub) = 0), so wedge work stays
    # ~linear. Ring edges i-(i+1) make (hub, i, i+1) triangles so both
    # modes have real output to agree on.
    from querysight_spark.operators.graph import triangles

    print("\ntriangles on a hub-skewed graph (mid-id hub + ring):")
    for n in (4_000, 32_000):
        hub = n // 2
        spokes = spark.range(n + 1).where(F.col("id") != hub).select(
            F.lit(hub).alias("src"), F.col("id").alias("dst")
        )
        ring = spark.range(n).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        g = spokes.unionByName(ring)
        counts = {}
        for mode in ("id", "degree"):
            t0 = time.time()
            counts[mode] = triangles(g, orient=mode).count()
            dt = time.time() - t0
            print(
                f"n={n:>6}  orient={mode:>6}  triangles={counts[mode]:>6}  "
                f"time={dt:6.2f}s"
            )
        assert counts["id"] == counts["degree"], "orientation parity broken"
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Graph operators: iterative PageRank over an edge DataFrame.

Complements the iterative fixpoint pair already in the repo (ql06b
upstream-closure, cl03 k-means refinement) with the canonical
power-iteration graph algorithm. No GraphX/GraphFrames dependency — the
whole loop is DataFrame joins + aggregations, which is exactly how
GraphFrames implements it underneath.

Scale notes (100 TB):
- Each iteration is one join (edges ⋈ ranks on src) + one partial/final
  hash agg on dst. Edges are repartitioned ONCE on src and persisted, so
  every iteration's join reuses the same co-partitioned exchange; only the
  (nodes-sized) rank table reshuffles per iteration.
- ``persist`` + eager materialization per iteration caps the lineage at
  one step; for long runs (>20 iterations) swap in ``localCheckpoint``
  at the marked seam to truncate the logical plan too.
- Driver state is two scalars (node count, iteration counter) — ranks
  never leave the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of an edge list: both directions of each distinct
    pair. Guarantees every touched node has outdegree >= 1, which removes
    the dangling-mass correction from PageRank."""
    e = edges.select(src, dst).distinct()
    return e.unionByName(
        e.select(F.col(dst).alias(src), F.col(src).alias(dst))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank on a directed edge list with no dangling
    nodes (use ``symmetrize`` first for undirected graphs): for each of
    ``iterations`` steps,

        pr(v) <- (1 - damping)/N + damping * sum_{u->v} pr(u)/outdeg(u)

    Returns (node, pagerank). Every node must appear as a source (checked
    implicitly: ranks live on the outdegree table, so a sink-only node
    would silently drop — symmetrized graphs can't hit this)."""
    e = edges.select("src", "dst").repartition("src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = deg.count()  # one driver scalar; also materializes e + deg
    if n == 0:
        raise ValueError(
            "pagerank: empty edge list — no nodes to rank (a silent empty "
            "result would read as 'no important nodes', which is different)"
        )
    base = (1.0 - damping) / n

    pr = deg.select("src", F.lit(1.0 / n).alias("pr"))
    prev = None
    for _ in range(iterations):
        contrib = (
            e.join(pr, "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("mass"))
        )
        pr = contrib.select(
            F.col("dst").alias("src"),
            (F.lit(base) + F.lit(damping) * F.col("mass")).alias("pr"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        pr.count()  # materialize: caps lineage at one iteration
        # localCheckpoint() here instead for very deep runs
        if prev is not None:
            prev.unpersist()
        prev = pr
    return pr.select(F.col("src").alias("node"), "pr")

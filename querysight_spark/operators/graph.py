"""Graph operators: iterative PageRank, connected components
(large-star/small-star), triangle enumeration, frontier BFS
distances, and label-propagation communities over edge DataFrames.

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

from querysight_spark.operators.parallel import coalesce_tiny_shuffles


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
    # rank-table shuffles are node-sized — coalesce them inside the loop
    with coalesce_tiny_shuffles(edges.sparkSession):
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
    # checkpoint the (node-sized) result so every explicit cache can be
    # released NOW — in a long-lived session the e/deg/pr blocks would
    # otherwise sit in the cache manager until LRU pressure
    out = pr.select(F.col("src").alias("node"), "pr").localCheckpoint(eager=True)
    pr.unpersist()
    deg.unpersist()
    e.unpersist()
    return out


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    ACM SoCC 2014). Returns (node, component) where ``component`` is the
    minimum node id in the node's component, for every node that appears
    in ``edges`` (isolated nodes have no edges and are the caller's
    concern). Ids may be numeric or string — anything with a total order.

    Why not min-label propagation (``operators.dedup.duplicate_clusters``)?
    That converges in O(diameter) rounds — fine for near-clique duplicate
    graphs, quadratic pain on long paths. Large-star/small-star converges
    in O(log^2 n) rounds on ANY graph shape (in practice a handful), which
    is the difference between 6 and 600 shuffles on a 100 TB web-graph
    with chain structure. Each half-round is one groupBy-min plus one
    join, both on the node key; ``localCheckpoint`` caps lineage.

    - large-star: every node u attaches its strictly-larger neighbors to
      m = min(N(u) + {u}) — emit (v, m) for v in N(u), v > u.
    - small-star: edges now point big -> small; every node u attaches its
      smaller-or-equal neighbors and itself to their min — group (u, s)
      pairs by u, m = min(s), emit (u, m) and (s, m) for s != m.
    - converged when the small-star edge set is a fixpoint (stars only);
      then edges ARE the (node, component-min) map for non-root nodes.

    ``stats`` (optional dict) receives {"rounds": k, "converged": bool}
    — the observable behind the O(log^2 n) claim (tools/graph_curve.py
    measures rounds staying ~log while the path length grows 100x).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # canonical big->small orientation; the loop maintains this invariant
    cur0 = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct().localCheckpoint(eager=True)
    cur = cur0
    cur_n = cur.count()  # carried across rounds: each round counts only
    rounds, converged = 0, False  # its OWN output, not its input again
    # the loop's per-round frames shrink toward the star forest — size-
    # based AQE coalescing inside the scope only (cur0's upstream above
    # and the lazy post-loop plan below run at the caller's conf)
    with coalesce_tiny_shuffles(edges.sparkSession):
        for _ in range(max_iter):
            rounds += 1
            # ---- large-star over the symmetric view ---------------------
            sym = cur.unionByName(
                cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
            mstar = mins.select("u", F.least("u", "mn").alias("m"))
            # ``sym.where(v > u)`` is exactly the reversed orientation of
            # the canonical big->small ``cur`` (r14 opt): feed the join
            # that directly instead of filtering the 2x union. The
            # large-star emissions are NOT deduplicated here (one exchange
            # per round saved): both consumers are duplicate-insensitive —
            # ``smins`` is a min-agg and the small-star output runs its own
            # distinct — so the round's edge SET (and the fixpoint test)
            # is unchanged.
            large = (
                cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
                .join(mstar, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v"))
            )
            # ---- small-star over the big->small pairs -------------------
            smins = large.groupBy("u").agg(F.min("v").alias("m"))
            small = (
                large.join(smins, "u")
                .select(F.col("v").alias("n"), F.col("m"))
                .unionByName(smins.select(F.col("u").alias("n"), F.col("m")))
                .where(F.col("n") != F.col("m"))
                .distinct()
                .select(F.col("n").alias("u"), F.col("m").alias("v"))
                .localCheckpoint(eager=True)
            )
            small_n = small.count()
            unchanged = (
                small_n == cur_n
                and small.exceptAll(cur).limit(1).count() == 0
            )
            cur, cur_n = small, small_n
            if unchanged:
                converged = True
                break
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        # a non-fixpoint edge set is NOT a star forest — returning it
        # silently would hand back a wrong labeling whose only symptom is
        # a downstream hash mismatch. Fail loudly; callers that want to
        # inspect partial progress can catch and read ``stats``.
        raise RuntimeError(
            f"connected_components: no fixpoint after max_iter={max_iter} "
            f"rounds ({cur_n} edges remain) — labeling would be incorrect; "
            "raise max_iter (rounds grow ~log^2 n)"
        )
    # node universe from the ALREADY-checkpointed canonical edge set, not
    # from e — via e the (possibly expensive) upstream would re-execute
    roots = (
        cur0.select(F.col("u").alias("n"))
        .unionByName(cur0.select(F.col("v").alias("n")))
        .distinct()
        .join(cur.select(F.col("u").alias("n")), "n", "left_anti")
    )
    return cur.select(F.col("u").alias("node"), F.col("v").alias("component")).unionByName(
        roots.select(F.col("n").alias("node"), F.col("n").alias("component"))
    )


def triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst", orient: str = "id"
) -> DataFrame:
    """Enumerate all triangles {a < b < c} in an undirected edge list.
    Returns (a, b, c), one row per triangle, canonically id-sorted under
    EITHER orientation (the two modes are row-identical).

    Classic two-join enumeration over an acyclically oriented edge set:
    orient every edge along a total order, then wedges (x->y, y->z)
    close iff (x->z) exists — each triangle has exactly one source under
    an acyclic orientation, so it appears exactly once. The wedge join's
    work is sum over middle nodes y of d_in(y) * d_out(y) under the
    chosen orientation:

    - ``orient="id"``: small id -> large id. Fine for near-uniform
      graphs, but a mid-id hub with h neighbors on both sides costs
      ~h^2/4 wedge candidates through that ONE node — the skew killer.
    - ``orient="degree"``: low (degree, id) -> high (degree, id), the
      standard skew fix (out-degrees are O(sqrt(m))-bounded): all of a
      hub's edges point INTO it, so d_out(hub) = 0 and no wedge routes
      through a hub as the middle. Costs one extra degree agg + join to
      orient; tools/graph_curve.py measures the win on a hub fixture.
    """
    if orient not in ("id", "degree"):
        raise ValueError(f"orient must be 'id' or 'degree', got {orient!r}")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    if orient == "degree":
        deg = (
            und.select(F.col("a").alias("n"))
            .unionByName(und.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        # und holds a < b, so (d_a, a) < (d_b, b) unless d_b < d_a —
        # flip exactly those edges to get the (degree, id) orientation
        o = (
            und.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
            .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
            .select(
                F.when(F.col("db") < F.col("da"), F.col("b"))
                .otherwise(F.col("a"))
                .alias("a"),
                F.when(F.col("db") < F.col("da"), F.col("a"))
                .otherwise(F.col("b"))
                .alias("b"),
            )
        )
    else:
        o = und
    # three self-join consumers below — materialize the oriented edge
    # set once instead of re-running the upstream per branch
    o = o.localCheckpoint(eager=True)
    e1 = o.select(F.col("a"), F.col("b"))
    e2 = o.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = o.select(F.col("a").alias("ca"), F.col("b").alias("cc"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("ca")) & (F.col("c") == F.col("cc")))
        .select("a", "b", "c")
    )
    if orient == "id":
        return tri  # already canonical: a < b < c by construction
    return tri.select(F.array_sort(F.array("a", "b", "c")).alias("t")).select(
        F.col("t")[0].alias("a"), F.col("t")[1].alias("b"), F.col("t")[2].alias("c")
    )


def _sym_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Deduped, self-loop-free SYMMETRIC edge view as (u, v), checkpointed
    once — the shared preamble of the frontier-BFS variants (every round
    joins against it, so one materialization serves the whole loop)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)


def bfs_distances(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    source=None,
    max_iter: int = 30,
) -> DataFrame:
    """Single-source BFS hop distances on an undirected edge list:
    (node, dist) for every node REACHABLE from ``source`` (unreachable
    nodes are absent — their distance is undefined, not infinity).
    ``source=None`` picks the minimum node id (deterministic default for
    gate declarations).

    Frontier iteration: each round joins the current frontier to the
    edge list, anti-joins the visited set, and extends distances by one
    — O(diameter) rounds of one join + one anti-join, each a node-keyed
    shuffle, lineage capped per round by ``localCheckpoint`` exactly as
    in ``connected_components``. Per-round work touches only edges
    incident to the frontier. For 100 TB graphs with large diameters,
    batch multiple sources into one run (frontier carries (root, node))
    rather than looping this function."""
    sym = _sym_edges(edges, src, dst)
    if source is None:
        source = sym.agg(F.min("u")).first()[0]  # one driver scalar
        if source is None:
            raise ValueError("bfs_distances: empty edge list")
    visited = (
        sym.select(F.col("u").alias("node"))
        .where(F.lit(False))
        .withColumn("dist", F.lit(0))
    )
    frontier = (
        sym.select(F.col("u").alias("node"))
        .where(F.col("u") == F.lit(source))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    # frontier/visited frames are node-sized: size-based AQE coalescing
    # for the round micro-shuffles (sym is checkpointed above, full width)
    with coalesce_tiny_shuffles(edges.sparkSession):
        for _ in range(max_iter):
            if frontier.limit(1).count() == 0:
                break
            visited = visited.unionByName(frontier).localCheckpoint(eager=True)
            nxt = (
                frontier.join(sym, frontier["node"] == sym["u"])
                .select(
                    F.col("v").alias("node"),
                    (F.col("dist") + 1).alias("dist"),
                )
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .join(visited.select("node"), "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            frontier = nxt
    # absorb the last computed frontier: the loop adds each frontier at
    # the TOP of the next iteration, so on max_iter exhaustion the final
    # frontier (distance == max_iter) was computed but never recorded —
    # coverage is distances 0..max_iter, matching the gr04 oracle's
    # recursive walk bounded by w.d < max_iter (which emits d up to
    # max_iter). After a natural empty-frontier exit this union is a
    # no-op.
    return visited.unionByName(frontier)


def multi_source_bfs(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_iter: int = 30,
) -> DataFrame:
    """Batched BFS from MANY sources in ONE frontier loop: returns
    (root, node, dist) for every (seed, reachable node) pair. This is
    the scale path ``bfs_distances`` names for large-diameter graphs —
    K seeds cost O(diameter) rounds TOTAL (the frontier carries
    (root, node) pairs), not K separate O(diameter) loops each paying
    the full per-round job overhead. Per-round work is proportional to
    frontier-incident edges summed over roots; the visited set is the
    output itself (K x reachable pairs), deduped per (root, node) by
    the same min-dist agg + anti-join as the single-source loop.
    Landmark-distance / k-hop-neighborhood queries are this shape.

    The frontier loop intentionally mirrors ``bfs_distances`` with root
    added to every key (the single-source loop stays join-key-free on
    root so its per-round shuffles carry one column less); the
    symmetric-edge preamble is shared via ``_sym_edges``."""
    sym = _sym_edges(edges, src, dst)
    visited = (
        seeds.select(F.col(node_col).alias("root"))
        .where(F.lit(False))
        .select("root", F.col("root").alias("node"), F.lit(0).alias("dist"))
    )
    frontier = (
        seeds.select(F.col(node_col).alias("root"))
        .distinct()
        .select("root", F.col("root").alias("node"), F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    with coalesce_tiny_shuffles(edges.sparkSession):
        for _ in range(max_iter):
            if frontier.limit(1).count() == 0:
                break
            visited = visited.unionByName(frontier).localCheckpoint(eager=True)
            frontier = (
                frontier.join(sym, frontier["node"] == sym["u"])
                .select(
                    "root",
                    F.col("v").alias("node"),
                    (F.col("dist") + 1).alias("dist"),
                )
                .groupBy("root", "node")
                .agg(F.min("dist").alias("dist"))
                .join(
                    visited.select("root", "node"), ["root", "node"], "left_anti"
                )
                .localCheckpoint(eager=True)
            )
    # same final-frontier absorption as bfs_distances: coverage is
    # distances 0..max_iter inclusive
    return visited.unionByName(frontier)


def merge_components(
    labels: DataFrame,
    new_edges: DataFrame,
    node_col: str = "node",
    comp_col: str = "component",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Incremental connected-components maintenance: absorb a batch of
    NEW edges into an existing (node, component) labeling without
    re-walking the original edge set. The existing labeling is already a
    star forest (node -> component-min), and stars are equivalent to the
    original graph for connectivity — so running ``connected_components``
    over (star edges ∪ delta edges) yields the labeling of the merged
    graph at the cost of O(nodes + delta), never O(original edges). The
    dd09 delta-dedup discipline applied to graphs: per-batch cost scales
    with the batch, the full corpus enters only as its contracted star
    form. Component ids stay the component-min node, so ids are STABLE
    unless a merge introduces a smaller member (in which case every
    member adopts the smaller id — deterministic, engine-checkable).

    Singleton components (a label row with node == component and no
    other members — impossible for labelings derived from an edge list,
    where every component has >= 2 nodes, but normal when the caller
    labeled isolated nodes too) contribute no star edge; they are
    re-attached afterwards with their old label, EXCEPT singletons the
    delta touched (those already appear in the merged labeling and must
    not be duplicated)."""
    star = labels.select(
        F.col(node_col).alias("u"), F.col(comp_col).alias("v")
    ).where(F.col(node_col) != F.col(comp_col))
    delta = new_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    merged = connected_components(
        star.unionByName(delta), "u", "v", max_iter=max_iter, stats=stats
    )
    # components that have members (filter BEFORE projecting — projecting
    # first would let the filter resolve against the aliased column and
    # silently become a tautology)
    rooted = (
        labels.where(F.col(node_col) != F.col(comp_col))
        .select(F.col(comp_col).alias("node"))
        .distinct()
    )
    singletons = (
        labels.select(F.col(node_col).alias("node"), F.col(comp_col).alias("component"))
        .where(F.col(node_col) == F.col(comp_col))
        .join(rooted, "node", "left_anti")  # a root WITH members is no singleton
        .join(merged.select("node"), "node", "left_anti")  # delta absorbed it
    )
    return merged.unionByName(singletons)


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    node_col: str = "node",
) -> DataFrame:
    """Personalized PageRank: the teleport goes to the SEED set (uniform
    over seeds) instead of all nodes, so rank mass measures proximity to
    the seeds — the relevance-propagation primitive behind "more like
    these" corpus expansion (seed docs -> related docs through the
    similarity/co-occurrence graph) and account-risk spread. Same
    per-iteration shape as ``pagerank`` (one co-partitioned join + one
    hash agg, lineage capped); non-seed nodes start at 0 and receive
    mass only through edges. Seeds absent from the graph contribute
    teleport mass but never spread it (no out-edges) — mirrored exactly
    by the oracle replay."""
    e = edges.select("src", "dst").repartition("src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sd = seeds.select(F.col(node_col).alias("src")).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_seeds = sd.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    base = (1.0 - damping) / n_seeds
    pr = sd.select("src", F.lit(1.0 / n_seeds).alias("pr"))
    prev = None
    with coalesce_tiny_shuffles(edges.sparkSession):
        for _ in range(iterations):
            contrib = (
                e.join(pr, "src")
                .join(deg, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("pr") / F.col("deg")).alias("mass"))
            )
            spread = contrib.select(
                F.col("dst").alias("src"),
                (F.lit(damping) * F.col("mass")).alias("pr"),
            )
            teleport = sd.select("src", F.lit(base).alias("pr"))
            pr = (
                spread.unionByName(teleport)
                .groupBy("src")
                .agg(F.sum("pr").alias("pr"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            pr.count()
            if prev is not None:
                prev.unpersist()
            prev = pr
    # same cache-release discipline as pagerank: checkpoint the small
    # result, then free e/deg/sd and the final iterate immediately
    out = pr.select(F.col("src").alias("node"), "pr").localCheckpoint(eager=True)
    pr.unpersist()
    sd.unpersist()
    deg.unpersist()
    e.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al.,
    2007, the deterministic variant GraphFrames ships): every node
    starts labeled with its own id, and each round RE-labels every node
    with the most frequent label among its neighbors, ties broken by
    the smallest label — fully deterministic, no random visit order.
    Returns (node, community) after ``iterations`` rounds; fixed-round
    synchronous updates are the engine-portable contract (an
    until-stable loop is the production variant — same round body,
    stop when no label changes). Synchronous LPA's known caveat applies:
    bipartite structures (e.g. an isolated edge) OSCILLATE rather than
    converge — identical to GraphFrames' labelPropagation, and pinned
    in tests; community detection on such shapes wants the
    connected-components operator instead.

    Scale shape: each round is one join (edges ⋈ labels on the source
    endpoint, both sides hash-partitioned on the key) + one partial/
    final count agg + one per-node window over its label counts —
    no all-pairs work, and the window partitions by node (bounded by
    degree, not corpus). The symmetrized edge table is repartitioned
    once and persisted across rounds (the pagerank discipline); labels
    localCheckpoint each round so the plan never deepens. Driver state
    is the iteration counter."""
    e = (
        symmetrize(edges, src, dst)
        .select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("community")
    )
    # argmax(votes) with min-community tie-break as ONE hash agg (r14,
    # two steps). Step 1 (guide §2.3 "aggregate before you shuffle"):
    # min over (-votes, community) == the row_number()-over-window pick,
    # but aggregates partially map-side — a window has no partial agg.
    # Step 2 (guide §2.4, the cl01/tx21 encoding): min(struct(..)) has
    # no mutable agg buffer, so Spark still planned each round's argmax
    # as SortAggregate; for INTEGRAL node ids the pair is encoded into
    # one decimal(38,0) — (-votes)·2⁶⁴ + (community + 2⁶³) — which is
    # injective and order-isomorphic to the lexicographic (-votes,
    # community) for any int64 community (the biased id sits in
    # [0, 2⁶⁴), below one vote step) and any vote count ≤ 5·10¹⁸ (votes
    # are bounded by the edge count), making the argmax a plain
    # partially-aggregating HashAggregate. Non-integral ids (the
    # string-keyed contract) keep the struct-min fallback.
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = isinstance(
        labels.schema["community"].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )
    ctype = labels.schema["community"].dataType
    with coalesce_tiny_shuffles(edges.sparkSession):
        for _ in range(iterations):
            counts = (
                e.join(labels, e.src == labels.node)
                .groupBy("dst", "community")
                .agg(F.count(F.lit(1)).alias("votes"))
            )
            if integral:
                enc = F.expr(
                    "CAST(-votes AS DECIMAL(38,0)) * 18446744073709551616BD"
                    " + (CAST(community AS DECIMAL(38,0))"
                    " + 9223372036854775808BD)"
                )
                labels = (
                    counts.groupBy("dst")
                    .agg(F.min(enc).alias("_top"))
                    .select(
                        F.col("dst").alias("node"),
                        F.expr(
                            "pmod(_top, 18446744073709551616BD)"
                            " - 9223372036854775808BD"
                        )
                        .cast(ctype)
                        .alias("community"),
                    )
                    .localCheckpoint(eager=True)
                )
            else:
                labels = (
                    counts.groupBy("dst")
                    .agg(
                        F.min(
                            F.struct(
                                (-F.col("votes")).alias("nv"),
                                F.col("community").alias("c"),
                            )
                        ).alias("top")
                    )
                    .select(
                        F.col("dst").alias("node"),
                        F.col("top.c").alias("community"),
                    )
                    .localCheckpoint(eager=True)
                )
    e.unpersist()
    return labels

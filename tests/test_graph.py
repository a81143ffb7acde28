from __future__ import annotations

from querysight_spark.operators.graph import pagerank, symmetrize


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_symmetrize_dedups_and_mirrors(spark):
    e = symmetrize(_edges(spark, [("a", "b"), ("a", "b"), ("b", "c")]))
    got = {(r.src, r.dst) for r in e.collect()}
    assert got == {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # symmetric triangle: perfectly regular graph -> stationary from step 0
    e = symmetrize(_edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]))
    out = {r.node: r.pr for r in pagerank(e, iterations=3).collect()}
    for v in out.values():
        assert abs(v - 1.0 / 3) < 1e-12
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_pagerank_star_center_dominates(spark):
    e = symmetrize(
        _edges(spark, [("hub", x) for x in ("s1", "s2", "s3", "s4")])
    )
    out = {r.node: r.pr for r in pagerank(e, iterations=10).collect()}
    assert out["hub"] > 2 * out["s1"]
    leaves = [out[f"s{i}"] for i in range(1, 5)]
    assert max(leaves) - min(leaves) < 1e-12  # symmetry preserved
    assert abs(sum(out.values()) - 1.0) < 1e-9  # mass conserved (no dangling)


def test_pagerank_one_iteration_hand_value(spark):
    # path a-b (symmetrized): deg(a)=deg(b)=1, N=2
    # pr1(a) = 0.15/2 + 0.85 * pr0(b)/1 = 0.075 + 0.425 = 0.5 (stationary)
    e = symmetrize(_edges(spark, [("a", "b")]))
    out = {r.node: r.pr for r in pagerank(e, iterations=1).collect()}
    assert abs(out["a"] - 0.5) < 1e-12 and abs(out["b"] - 0.5) < 1e-12


# ---------------------------------------------------------------------------
# connected components (large-star/small-star)
# ---------------------------------------------------------------------------

from querysight_spark.operators.graph import connected_components, triangles


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the component MIN (min is the overall root here
    # because we always parent the larger root under the smaller)
    return {x: find(x) for x in parent}


def _cc(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {
        r.node: r.component
        for r in connected_components(df, **kw).collect()
    }


def test_cc_long_path_converges_fast(spark):
    # 40-node path: min-label propagation needs ~40 rounds; star
    # contraction must finish well inside max_iter=8
    pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(39)]
    got = _cc(spark, pairs, max_iter=8)
    assert set(got.values()) == {"n00"}
    assert len(got) == 40


def test_cc_multiple_components_and_isolated_pair(spark):
    pairs = [("b", "a"), ("c", "b"), ("x", "y"), ("q", "p")]
    got = _cc(spark, pairs)
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x",
        "p": "p", "q": "p",
    }


def test_cc_matches_union_find_on_seeded_random_graph(spark):
    import random

    rng = random.Random(42)
    nodes = [f"v{i:03d}" for i in range(120)]
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(140)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _union_find(pairs)
    got = _cc(spark, pairs)
    assert got == want


def test_cc_self_loops_and_duplicate_edges_ignored(spark):
    pairs = [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")]
    got = _cc(spark, pairs)
    assert got == {"a": "a", "b": "a"}


# ---------------------------------------------------------------------------
# triangles
# ---------------------------------------------------------------------------


def _tri(spark, pairs):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {(r.a, r.b, r.c) for r in triangles(df).collect()}


def test_triangles_hand_graph(spark):
    # K4 on {a,b,c,d} has 4 triangles; extra pendant edge adds none
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    got = _tri(spark, k4 + [("d", "e")])
    assert got == {
        ("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"), ("b", "c", "d")
    }


def test_triangles_orientation_and_dupes(spark):
    # same triangle given in mixed orientations + duplicates: exactly one row
    got = _tri(spark, [("b", "a"), ("c", "b"), ("a", "c"), ("a", "b")])
    assert got == {("a", "b", "c")}


def test_triangles_none_on_path(spark):
    assert _tri(spark, [("a", "b"), ("b", "c"), ("c", "d")]) == set()


# ---------------------------------------------------------------------------
# BFS distances
# ---------------------------------------------------------------------------

from querysight_spark.operators.graph import bfs_distances


def test_bfs_path_distances_and_reachability(spark):
    # path a-b-c-d plus disconnected x-y: from default source (min = "a")
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = {r.node: r.dist for r in bfs_distances(df).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # x/y unreachable -> absent


def test_bfs_explicit_source_and_shortcut(spark):
    # cycle with a chord: shortest path must take the shortcut
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "e")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = {r.node: r.dist for r in bfs_distances(df, source="c").collect()}
    assert got == {"c": 0, "b": 1, "d": 1, "a": 2, "e": 2}


# ---------------------------------------------------------------------------
# personalized PageRank
# ---------------------------------------------------------------------------

from querysight_spark.operators.graph import personalized_pagerank


def test_ppr_mass_stays_near_seed(spark):
    # two disjoint triangles; seeding one of them must leave the other
    # with zero mass, and total mass stays 1 (symmetric graph, no sinks)
    t1 = [("a", "b"), ("b", "c"), ("c", "a")]
    t2 = [("x", "y"), ("y", "z"), ("z", "x")]
    e = symmetrize(_edges(spark, t1 + t2))
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {r.node: r.pr for r in personalized_pagerank(e, seeds, 5).collect()}
    assert set(out) <= {"a", "b", "c"}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out["a"] > out["b"]  # seed retains the teleport mass


def test_ppr_two_seeds_split_teleport(spark):
    e = symmetrize(_edges(spark, [("a", "b"), ("b", "c")]))
    seeds = spark.createDataFrame([("a",), ("c",)], "node string")
    out = {r.node: r.pr for r in personalized_pagerank(e, seeds, 8).collect()}
    # symmetric seeds around b: their ranks must be equal
    assert abs(out["a"] - out["c"]) < 1e-12
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_connected_components_raises_on_nonconvergence(spark):
    """Exhausting max_iter without a star-forest fixpoint must fail loudly
    — a silent non-star labeling is WRONG and its only other symptom is a
    downstream hash mismatch (r4 ADVICE finding)."""
    import pytest

    from querysight_spark.operators.graph import connected_components

    # a 12-node path needs several large/small-star rounds; 1 is not enough
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    stats: dict = {}
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(path, max_iter=1, stats=stats)
    assert stats["converged"] is False and stats["rounds"] == 1


def test_bfs_reaches_nodes_at_exactly_max_iter_hops(spark):
    """Distance coverage is 0..max_iter inclusive: the final computed
    frontier is absorbed after the loop (r4 ADVICE finding — it used to
    be dropped, so a node at exactly max_iter hops appeared in the gr04
    oracle's walk but not here)."""
    from querysight_spark.operators.graph import bfs_distances

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    out = {r.node: r.dist for r in bfs_distances(chain, max_iter=3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}  # node 3 is the absorbed frontier


def test_triangles_degree_orientation_parity(spark):
    """orient='degree' must be row-identical to the id orientation —
    same triangles, same canonical (a < b < c) labels — on a graph whose
    hub actually forces flips (the mid-id hub has max degree, so every
    hub edge reorients)."""
    from querysight_spark.operators.graph import triangles

    n, hub = 12, 6
    spokes = [(hub, i) for i in range(n + 1) if i != hub]
    ring = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(spokes + ring, "src long, dst long")
    got_id = {(r.a, r.b, r.c) for r in triangles(df, orient="id").collect()}
    got_deg = {(r.a, r.b, r.c) for r in triangles(df, orient="degree").collect()}
    assert got_id == got_deg
    # each ring edge (i, i+1) closes a triangle with the hub, except the
    # two ring edges incident to the hub itself (those are degenerate)
    assert (4, 5, 6) in got_id and (6, 7, 8) in got_id
    assert len(got_id) == n - 2

    import pytest

    with pytest.raises(ValueError, match="orient"):
        triangles(df, orient="random")


def test_multi_source_bfs_matches_per_source_runs(spark):
    """One batched frontier loop must equal K independent single-source
    runs (plus the seed itself at dist 0), including an isolated seed
    with no edges at all."""
    from querysight_spark.operators.graph import bfs_distances, multi_source_bfs

    # two components: a 6-path and a triangle, plus isolated seed 99
    edges = [(i, i + 1) for i in range(5)] + [(10, 11), (11, 12), (10, 12)]
    g = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (3,), (11,), (99,)], "node long")
    got = {
        (r.root, r.node): r.dist for r in multi_source_bfs(g, seeds).collect()
    }
    want = {}
    for s in (0, 3, 11):
        for r in bfs_distances(g, source=s).collect():
            want[(s, r.node)] = r.dist
    want[(99, 99)] = 0  # isolated seed: reaches only itself
    assert got == want


def test_merge_components_preserves_untouched_singletons(spark):
    """Labelings that include isolated nodes (node == component, no other
    members) must survive a delta merge: untouched singletons keep their
    label, absorbed ones appear exactly once with the merged id."""
    from querysight_spark.operators.graph import merge_components

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (7, 7), (9, 9)], "node long, component long"
    )
    delta = spark.createDataFrame([(7, 3)], "src long, dst long")
    got = {
        (r.node, r.component) for r in merge_components(labels, delta).collect()
    }
    # {1,2} untouched; 7 bridges to new node 3 forming {3,7}; 9 stays solo
    assert got == {(1, 1), (2, 1), (3, 3), (7, 3), (9, 9)}


def test_landmark_distance_features_shape(spark):
    """gr07's pivot logic on a hand graph: path 1-2-3-4-5 plus isolated
    edge 10-11. Landmarks (3 smallest nodes) = 1, 2, 3; distances pivot
    per node; the 10-11 component is unreachable from all landmarks and
    carries nulls only where genuinely unreached."""
    from pyspark.sql import functions as F

    from querysight_spark.operators.graph import multi_source_bfs

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    res = multi_source_bfs(edges, seeds)
    out = {
        r.node: (r.d0, r.d1, r.d2)
        for r in res.groupBy("node")
        .agg(
            *[
                F.min(F.when(F.col("root") == l, F.col("dist"))).alias(f"d{i}")
                for i, l in enumerate([1, 2, 3])
            ]
        )
        .collect()
    }
    assert out[1] == (0, 1, 2)
    assert out[5] == (4, 3, 2)
    assert 10 not in out and 11 not in out  # unreachable from every seed


def test_label_propagation_two_cliques_and_tiebreak(spark):
    """Two 3-cliques joined by one bridge edge: after 3 synchronous
    rounds every node of each clique carries the clique's smallest id;
    the bridge's pull loses the vote to the clique majority. An
    isolated edge pair (100, 101) OSCILLATES under synchronous updates
    (each node's only vote is the other's current label — the known
    bipartite oscillation, GraphFrames-identical): after an odd round
    count the labels sit swapped."""
    from querysight_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4), (100, 101)],
        "src long, dst long",
    )
    got = {
        r.node: r.community
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == got[6]
    assert (got[100], got[101]) == (101, 100)


def test_label_propagation_deterministic_across_runs(spark):
    from querysight_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23],
        "src long, dst long",
    )
    a = sorted(map(tuple, label_propagation(edges, iterations=3).collect()))
    b = sorted(map(tuple, label_propagation(edges, iterations=3).collect()))
    assert a == b

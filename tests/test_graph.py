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

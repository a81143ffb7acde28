from __future__ import annotations

from pyspark.sql import functions as F

from querysight_spark.operators.linkage import blocked_fuzzy_pairs, linkage_summary


def _entities(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, zip string")


def test_blocking_confines_comparison(spark):
    df = _entities(
        spark,
        [
            (1, "acme corp", "10001"),
            (2, "acme carp", "10001"),   # typo of 1, same block -> match
            (3, "acme corp", "94103"),   # identical name, DIFFERENT block
            (4, "zenith ltd", "10001"),  # same block, far name
        ],
    )
    out = blocked_fuzzy_pairs(
        df, "id", "name", F.col("zip"), max_distance=2
    ).collect()
    pairs = {(r.id_a, r.id_b): r.distance for r in out}
    assert pairs == {(1, 2): 1}  # (1,3) blocked apart; (1,4)/(2,4) too far


def test_pairs_are_half_matrix(spark):
    df = _entities(spark, [(i, "same name", "b") for i in range(4)])
    out = blocked_fuzzy_pairs(df, "id", "name", F.col("zip"), 0).collect()
    assert len(out) == 6  # C(4,2), never both (a,b) and (b,a)
    assert all(r.id_a < r.id_b for r in out)


def test_max_block_size_guards_skew(spark):
    hot = [(i, f"name {i}", "hot") for i in range(50)]
    cold = [(100, "alpha", "c"), (101, "alphb", "c")]
    df = _entities(spark, hot + cold)
    out = blocked_fuzzy_pairs(
        df, "id", "name", F.col("zip"), max_distance=5, max_block_size=10
    ).collect()
    # the 50-row hot block is dropped entirely; the small block survives
    assert {(r.id_a, r.id_b) for r in out} == {(100, 101)}


def test_linkage_summary_shapes(spark):
    df = _entities(
        spark,
        [(1, "aa", "b1"), (2, "ab", "b1"), (3, "ac", "b1"), (4, "zz", "b2")],
    )
    pairs = blocked_fuzzy_pairs(df, "id", "name", F.col("zip"), 1)
    s = {r.blk: r for r in linkage_summary(pairs).collect()}
    assert s["b1"].n_matches == 3
    assert s["b1"].min_distance == 1 and s["b1"].max_distance == 1
    assert s["b1"].n_left_entities == 2  # ids 1 and 2 appear as left
    assert "b2" not in s  # no pairs -> no row


def test_entity_resolution_transitive_collapse(spark):
    """A~B and B~C must land in ONE entity even when A and C are far
    apart — the property pairwise matching alone cannot deliver."""
    from pyspark.sql import functions as F

    from querysight_spark.operators.graph import connected_components
    from querysight_spark.operators.linkage import blocked_fuzzy_pairs

    rows = [
        (1, "acme corp"),
        (2, "acmex corp"),   # 1 edit from acme
        (3, "acmexyz corp"),  # 2 from acmex, 3 from acme (no direct pair)
        (9, "zzzzz corp"),   # same block, no match
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    pairs = blocked_fuzzy_pairs(
        df,
        id_col="p_partkey",
        text_col="p_name",
        block_expr=F.split(F.col("p_name"), " ").getItem(1),
        max_distance=2,
    ).select("id_a", "id_b")
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 3) not in got  # no direct pair at distance 3...
    comp = {
        r.node: r.component
        for r in connected_components(pairs, "id_a", "id_b").collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1}  # ...but one entity transitively

"""Coverage computation: C1-C6 joins, F1-F4 set ops, D6 metrics.

The reference resolves tables→models with per-row Python dict fallbacks
(/root/reference/utils/dbt_mapper.py:263-300) and computes coverage with
driver-side set algebra (utils/models.py:303-372). Here each step is a
declarative plan over an exploded (pattern, table) relation joined against
broadcast catalog dims — at 100 TB the fact side streams through
broadcast-hash joins with zero shuffle; only the final per-pattern
``collect_set`` re-shuffles on pattern_id (same key as the pattern agg, so
AQE can reuse the partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def explode_pattern_tables(patterns: DataFrame) -> DataFrame:
    """(pattern_id, tname) — one row per table a pattern touches."""
    return patterns.select(
        "pattern_id", F.explode("tables_accessed").alias("tname")
    ).where(F.col("tname") != "")


def _candidate_keys(tname_col):
    """Lookup-key candidates for a table ref, in priority order (C1):
    rank 0 = exact ref (lowercased), rank 1 = bare table name,
    rank 2 = schema.table (last two parts). Mirrors the fallback chain at
    utils/dbt_mapper.py:263-300 as data instead of control flow."""
    parts = F.split(F.lower(tname_col), r"\.")
    n = F.size(parts)
    bare = F.element_at(parts, -1)
    schema_table = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    return F.array_distinct(
        F.when(n >= 2, F.array(F.lower(tname_col), bare, schema_table)).otherwise(
            F.array(F.lower(tname_col))
        )
    )


def resolve_models(pattern_tables: DataFrame, model_map: DataFrame) -> DataFrame:
    """C1 as a broadcast hash join: explode candidate keys (position =
    priority), join against the pre-exploded model map, keep the best match
    per (pattern_id, tname) via a row_number window.

    Returns (pattern_id, tname, model_name) with model_name NULL when the
    table resolves to nothing (left join keeps unmapped tables visible for
    C4)."""
    cands = pattern_tables.select(
        "pattern_id",
        "tname",
        F.posexplode(_candidate_keys(F.col("tname"))).alias("cand_rank", "cand_key"),
    )
    joined = cands.join(
        F.broadcast(model_map), cands.cand_key == model_map.table_key, "left"
    )
    w = Window.partitionBy("pattern_id", "tname").orderBy(
        F.col("model_name").isNull().cast("int"),  # any match beats no match
        "cand_rank",
        "match_rank",
        "model_name",
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("pattern_id", "tname", "model_name")
    )


def patterns_with_models(patterns: DataFrame, model_map: DataFrame) -> DataFrame:
    """C2 enrichment: attach sorted ``dbt_models_used`` to each pattern
    (reference nested loop at querysight.py:616-623)."""
    resolved = resolve_models(explode_pattern_tables(patterns), model_map)
    per_pattern = (
        resolved.where(F.col("model_name").isNotNull())
        .groupBy("pattern_id")
        .agg(F.sort_array(F.collect_set("model_name")).alias("dbt_models_used"))
    )
    return patterns.join(per_pattern, "pattern_id", "left").withColumn(
        "dbt_models_used",
        F.coalesce(F.col("dbt_models_used"), F.array().cast("array<string>")),
    )


def used_models(patterns: DataFrame, model_map: DataFrame) -> DataFrame:
    """C3 semi-join: distinct models referenced by any pattern's tables
    (utils/models.py:327-343). Returns a single ``model_name`` column."""
    resolved = resolve_models(explode_pattern_tables(patterns), model_map)
    return (
        resolved.where(F.col("model_name").isNotNull())
        .select("model_name")
        .distinct()
    )


def uncovered_tables(
    patterns: DataFrame, model_map: DataFrame, sources: DataFrame
) -> DataFrame:
    """C4 anti-join + C5 suffix theta-join: tables resolving to no model AND
    matching no declared dbt source (utils/models.py:344-354).

    The source match is the reference's ``physical == t OR
    physical endswith '.'+t`` (utils/models.py:346-351) — a non-equi
    condition, executed as a broadcast nested-loop against the tiny sources
    dim (bounded: |tables| × |sources| with |sources| ≈ dozens)."""
    tabs = explode_pattern_tables(patterns).select("tname").distinct()
    resolved = resolve_models(
        tabs.withColumn("pattern_id", F.lit("_")), model_map
    ).where(F.col("model_name").isNull()).select("tname")
    low_p = F.lower(sources.physical_table)
    low_t = F.lower(resolved.tname)
    src_match = (low_p == low_t) | low_p.endswith(F.concat(F.lit("."), low_t))
    return (
        resolved.join(F.broadcast(sources), src_match, "left_anti")
        .select("tname")
        .orderBy("tname")
    )


def upstream_closure(
    used: DataFrame, edges: DataFrame, max_hops: int | None = 1
) -> DataFrame:
    """C6: models reachable upstream from the used set.

    ``max_hops=1`` reproduces the reference's one-hop union
    (utils/models.py:341-343). ``max_hops=None`` runs the transitive
    closure to fixpoint via iterative broadcast self-joins — the edge list
    is a catalog dim (thousands of rows), so each hop is a driver-looped
    but executor-evaluated broadcast join; iterations are bounded by DAG
    depth. Persisted frontier avoids recomputing the growing lineage."""
    # localCheckpoint truncates lineage each hop — without it the iterative
    # plan re-derives the whole upstream pipeline per iteration and codegen
    # depth explodes (observed: 400+ codegen stages before StackOverflow).
    total = used.select(F.col("model_name")).distinct().localCheckpoint()
    frontier = total
    hops = 0
    while True:
        step = (
            frontier.join(
                F.broadcast(edges), frontier.model_name == edges.model, "inner"
            )
            .select(F.col("depends_on").alias("model_name"))
            .distinct()
        )
        new = step.join(total, "model_name", "left_anti").localCheckpoint()
        if new.isEmpty():
            break
        total = total.unionByName(new).distinct().localCheckpoint()
        frontier = new
        hops += 1
        if max_hops is not None and hops >= max_hops:
            break
    return total


def unused_models(model_map: DataFrame, used: DataFrame) -> DataFrame:
    """F4: all models − used models, via left-anti (utils/models.py:359)."""
    all_models = model_map.select("model_name").distinct()
    return all_models.join(used, "model_name", "left_anti")


def coverage_metrics(model_map: DataFrame, used: DataFrame) -> DataFrame:
    """D6: one-row coverage summary (utils/models.py:356-368)."""
    all_models = model_map.select("model_name").distinct()
    totals = all_models.agg(F.count("*").alias("total_models"))
    used_ct = used.agg(F.count("*").alias("used_models"))
    return (
        totals.crossJoin(used_ct)
        .withColumn(
            "coverage_pct",
            F.when(F.col("total_models") > 0,
                   F.col("used_models") * 100.0 / F.col("total_models"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn("unused_models", F.col("total_models") - F.col("used_models"))
    )

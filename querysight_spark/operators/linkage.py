"""Record-linkage operators: blocked fuzzy matching (entity resolution).

The classic entity-resolution shape for catalog/entity tables that exact
dedup (operators/dedup.py) can't catch: near-identical names with typos or
variant spellings. The all-pairs edit-distance comparison is O(n²) and dead
at scale; BLOCKING (compare only within a cheap equality key — a name
token, a phonetic code, a zip) reduces it to Σ block², the standard
Fellegi-Sunter pipeline shape.

Scale notes (100 TB):
- The candidate generation is ONE equi-join on the block key — shuffles
  both sides by block, never materializes cross-block pairs. Catalyst
  plans it as a plain hash/sort-merge join; ``levenshtein`` and the
  ``id_a < id_b`` half-pair filter run JVM-side as post-join predicates.
- A frequent block key is the skew trap (one block of 1M rows = 5·10¹¹
  comparisons). ``max_block_size`` drops oversized blocks via a pre-join
  window count — same capped-bucket discipline as the LSH band join
  (operators/dedup.py minhash_lsh_candidates); dropped blocks should be
  re-blocked on a finer key, not brute-forced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_expr: Column,
    max_distance: int = 2,
    max_block_size: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) that share ``block_expr`` and have
    ``levenshtein(text) <= max_distance``. Columns: id_a, id_b, name_a,
    name_b, blk, distance."""
    t = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("name"),
        block_expr.alias("blk"),
    )
    if max_block_size is not None:
        t = (
            t.withColumn(
                "_bn", F.count(F.lit(1)).over(Window.partitionBy("blk"))
            )
            .where(F.col("_bn") <= max_block_size)
            .drop("_bn")
        )
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.blk").alias("blk"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("distance"),
        )
        .where(F.col("distance") <= max_distance)
    )


def linkage_summary(pairs: DataFrame) -> DataFrame:
    """Per-block match statistics over ``blocked_fuzzy_pairs`` output:
    how many matches each block produced and how tight they are. The
    monitoring surface for choosing a block key (a block with a huge
    match count is under-blocked)."""
    return pairs.groupBy("blk").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("distance").alias("min_distance"),
        F.max("distance").alias("max_distance"),
        F.countDistinct("id_a").alias("n_left_entities"),
    )

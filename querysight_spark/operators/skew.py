"""Skew-mitigation helpers: hot-key detection and salted joins.

First choices at 100 TB, in order: (1) ``broadcast()`` the small side —
no shuffle, skew-immune; (2) AQE skew-join splitting
(spark.sql.adaptive.skewJoin.enabled, on in session.get_spark) — handles
moderately skewed SHUFFLE joins automatically. Salting is the manual
fallback for the case both miss: a shuffle join whose hot keys are so
large that even split partitions stall, or a groupBy whose per-key state
is expensive.

``salted_join`` replicates the dim side ``num_salts`` times and sprays
the fact side uniformly across the replicas, turning one hot-key
partition into ``num_salts`` even ones at the cost of dim × num_salts
replication — so salt only the keys that need it (``only_keys``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skewed_keys(df: DataFrame, on: Sequence[str], min_rows: int) -> DataFrame:
    """Hot keys: join-key groups with at least ``min_rows`` fact rows.
    One aggregation over the fact table — run it on a sample
    (``df.sample(0.01)`` with min_rows scaled) when even one pass is too
    expensive."""
    return (
        df.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") >= min_rows)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
    only_keys: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with hot-key salting.

    Fact rows get a uniform salt in [0, num_salts); dim rows are exploded
    to every salt; the join runs on (keys..., salt) so one hot key spreads
    over ``num_salts`` partitions. With ``only_keys`` (e.g. the output of
    ``skewed_keys``) only the listed keys are salted/replicated — the rest
    join on salt 0 with a single dim copy, keeping replication
    proportional to the hot-key count, not the dim size.

    ``F.rand(seed)`` re-derives its stream per task attempt, so retried
    tasks produce the same salts — no correctness hazard on speculative
    re-execution. Join semantics match a plain equi-join for 'inner' and
    'left' (every fact row keeps exactly its original matches)."""
    on = list(on)
    if only_keys is not None:
        hot = F.broadcast(
            only_keys.select(*on).distinct().withColumn("_hot", F.lit(True))
        )
        fact = fact.join(hot, on, "left")
        dim = dim.join(hot, on, "left")
        fact_salt = F.when(
            F.col("_hot").isNotNull(), (F.rand(seed) * num_salts).cast("int")
        ).otherwise(F.lit(0))
        dim_salts = F.when(
            F.col("_hot").isNotNull(),
            F.sequence(F.lit(0), F.lit(num_salts - 1)),
        ).otherwise(F.array(F.lit(0)))
    else:
        fact_salt = (F.rand(seed) * num_salts).cast("int")
        dim_salts = F.sequence(F.lit(0), F.lit(num_salts - 1))

    fact_s = fact.withColumn("_salt", fact_salt)
    dim_s = dim.withColumn("_salt", F.explode(dim_salts))
    if only_keys is not None:
        fact_s = fact_s.drop("_hot")
        dim_s = dim_s.drop("_hot")
    return fact_s.join(dim_s, on + ["_salt"], how).drop("_salt")

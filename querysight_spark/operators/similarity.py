"""Approximate-nearest-neighbor similarity search over an embedding column.

Two tiers (SURVEY §7.2 phase 8):
  * ``brute_force_topk`` — exact cosine top-k; the correctness baseline and
    the per-bucket kernel. All JVM-side (zip_with/aggregate fold).
  * ``lsh_bucketed_topk`` — random-hyperplane LSH: sign-pattern bucket per
    vector, probe only the query's bucket(s). The 100 TB path: bucketing is
    a map-side projection; the candidate set shrinks ~2^bits-fold.

Hyperplanes are derived deterministically from a seed (numpy RandomState on
the driver, broadcast as literals) so results are reproducible run-to-run.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from querysight_spark.operators.vectors import as_double as _as_double
from querysight_spark.operators.vectors import dot as _dot_dim


def _dot(a, b, dim=None):
    return _dot_dim(a, b, dim)


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. Cosine is rounded
    to 6 digits BEFORE ranking (with id tie-break) so the top-k frontier is
    stable across engines/partitionings."""
    q = [float(x) for x in query_vec]
    qn = float(np.sqrt(sum(x * x for x in q)))
    qcol = F.array(*[F.lit(x) for x in q])
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    d = len(q)
    scored = v.select(
        F.col(id_col),
        F.round(
            _dot(F.col("v"), qcol, d)
            / (F.sqrt(_dot(F.col("v"), F.col("v"), d)) * F.lit(qn)),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).tolist()


def bucket_ids(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-pattern bucket id per vector: bit b = (v · plane_b) >= 0.
    Map-side only — no shuffle; at scale, write bucketed/partitioned by
    ``bucket`` so probes prune to one partition."""
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    bucket = None
    for i, p in enumerate(planes):
        pcol = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col("v"), pcol, len(p)) >= 0, 1 << i).otherwise(0)
        bucket = bit if bucket is None else (bucket + bit)
    return v.select(F.col(id_col), F.col("v"), bucket.cast("int").alias("bucket"))


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: compute the query's bucket, rank only vectors sharing it.
    Recall < 1 by construction; raise ``bits`` for smaller buckets or probe
    neighboring buckets (hamming-1) for higher recall — both knobs keep the
    plan shape identical."""
    q = [float(x) for x in query_vec]
    planes = hyperplanes(len(q), bits, seed)
    qbucket = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(q, p)) >= 0:
            qbucket |= 1 << i
    bucketed = bucket_ids(df, planes, id_col, vec_col)
    qn = float(np.sqrt(sum(x * x for x in q)))
    qcol = F.array(*[F.lit(x) for x in q])
    cand = bucketed.where(F.col("bucket") == qbucket)
    scored = cand.select(
        F.col(id_col),
        F.round(
            _dot(F.col("v"), qcol, len(q))
            / (F.sqrt(_dot(F.col("v"), F.col("v"), len(q))) * F.lit(qn)),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)

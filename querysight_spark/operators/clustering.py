"""Embedding-space clustering and SemDeDup-style semantic deduplication.

The TRAINING path (seeded spherical k-means on a bounded sample, numpy
GEMM assignment) already lives in ``operators/similarity.py``
(train_ivf_centroids / ivf_assign) — these operators are the ANALYTICS
face of clustering: oracle-exact nearest-centroid assignment built from
pure JVM fold expressions (bit-identical to DuckDB's list_dot_product,
see ``operators/vectors.py``), and the SemDeDup pipeline that prunes
near-identical embeddings WITHIN clusters instead of across the corpus.

Scale shape (100 TB): centroids are a k-row broadcast; assignment is a
map-side broadcast nested-loop + one partial-agg argmax shuffle on the
vector id; the SemDeDup pair join shuffles on cluster_id only — all-pairs
work is confined to single clusters (the entire point of SemDeDup,
arXiv:2303.09540) and never crosses them. A skewed giant cluster is the
hazard; cap or sub-split via salting (operators/skew.py) if one emerges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from querysight_spark.operators.vectors import as_double, dot, norm


def cluster_assign(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
    dim: int | None = None,
) -> DataFrame:
    """Nearest-centroid assignment by max cosine, ties to the smallest
    centroid id: (vec_id, cluster_id, cosine).

    Argmax = one partial-aggregated ``max`` over an injective BIGINT
    encoding of (cos, -cid) — no window, so the broadcast product
    reduces map-side and the only shuffle is the final per-vector
    combine. Cosines are rounded to 6 before the argmax so the choice
    is identical in any engine.

    r14 encoding (guide §2.4, the tx21 precedent): ``max(struct(..))``
    has no mutable agg buffer, so Spark planned the argmax as
    SortAggregate — the whole k×n product sorted by vec id on both
    sides of its exchange. ``cos`` is already ROUND(·, 6), so
    ``rint(cos·10⁶)`` recovers its integer numerator exactly (|k|≤10⁶;
    the rounded double sits within 1e-10 of k/10⁶), and
    ``cosInt·10⁷ + (10⁷−1−cid)`` is order-isomorphic to the
    lexicographic (cos, −cid) for any centroid id 0 ≤ cid < 10⁷
    (centroid ids are training-list indices, k ≪ 10⁷) — a plain
    hash-aggregable bigint max. ``pmod`` decodes the cid for either
    sign of cosInt; the winning cosine equals ``max(cos)`` because cos
    is the encoding's primary key.

    Norms are computed ONCE per vector / per centroid before the product
    — numerically identical to inlining (same ops, same order: the
    divisor is still norm(a) * norm(b)), but the per-pair expression
    shrinks to one dot product. That's 3x less arithmetic on the k x n
    product AND it keeps the unrolled dim=64 codegen under janino's
    method-size ceiling (the inlined 192-term form fails to compile and
    drops whole-stage codegen)."""
    # parallelism floor (r15, the dd02/dd03/ql16 precedent): the k×n
    # product inherits the VECTOR scan's width, and on a narrow source
    # (the driver's 1-file tables scan as one partition) the entire
    # product — the operator's dominant compute — ran on ONE core
    # (measured: 228 s for a 20k×400 product at the 10x fixture, load
    # 1.0 on a 32-core host; ~8 s floored). No-op at 100 TB where file
    # count >> cores; see operators/parallel.py.
    from querysight_spark.operators.parallel import floor_parallelism

    v = floor_parallelism(
        vecs.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    ).select(F.col(id_col), "v", norm(F.col("v"), dim).alias("nv"))
    c = centroids.select(
        F.col(cid_col).alias("_cid"), as_double(F.col(cvec_col)).alias("cv")
    ).select("_cid", "cv", norm(F.col("cv"), dim).alias("ncv"))
    # r15 guard (ADVICE r14): a zero-norm vector/centroid makes the
    # cosine degenerate — under ANSI the division throws, and with NaN
    # embedding components the bigint encoding scored NaN as 0 while
    # max(cos) kept NaN (NaN sorts greatest), so the returned
    # (cluster_id, cosine) pair could disagree. try_divide returns NULL
    # on a zero divisor and nanvl(·, NULL) nulls NaN, so BOTH aggregates
    # skip degenerate pairs consistently (an all-degenerate vector
    # returns NULLs, not a bogus winner); normal inputs are bit-identical
    # (try_divide == `/` for nonzero divisors, nanvl passes non-NaN).
    scored = v.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        F.col("_cid"),
        F.nanvl(
            F.round(
                F.try_divide(
                    dot(F.col("v"), F.col("cv"), dim),
                    F.col("nv") * F.col("ncv"),
                ),
                6,
            ),
            F.lit(None).cast("double"),
        ).alias("cos"),
    )
    enc = (
        F.round(F.col("cos") * F.lit(1_000_000), 0).cast("long")
        * F.lit(10_000_000)
        + (F.lit(9_999_999) - F.col("_cid").cast("long"))
    )
    cid_type = scored.schema["_cid"].dataType
    best = scored.groupBy(id_col).agg(
        F.max(enc).alias("_enc"), F.max("cos").alias("cosine")
    )
    return best.select(
        F.col(id_col),
        (F.lit(9_999_999) - F.pmod(F.col("_enc"), F.lit(10_000_000)))
        .cast(cid_type)
        .alias("cluster_id"),
        F.col("cosine"),
    )


def centroid_means(
    assign: DataFrame,
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean of each cluster's member vectors, computed as an
    ordered fold (members sorted by id, elements left-fold-summed) so the
    result is bit-identical across engines — what lets a k-means
    ITERATION sit under the exact oracle gate, not just one assignment.
    Shape: posexplode members → one (cluster, element) agg → re-assemble
    sorted arrays. Clusters that lost all members drop out (inner join
    semantics, mirrored by the SQL replay)."""
    v = vecs.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    members = assign.select(id_col, "cluster_id").join(v, id_col)
    elems = members.select(
        F.col(id_col),
        "cluster_id",
        F.posexplode("v").alias("idx", "val"),
    )
    per_elem = elems.groupBy("cluster_id", "idx").agg(
        (
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(id_col, "val"))),
                    lambda s: s["val"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.count(F.lit(1))
        ).alias("mv")
    )
    return per_elem.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "mv"))), lambda s: s["mv"]
        ).alias("cvec")
    ).select(F.col("cluster_id").alias("cid"), "cvec")


def kmeans_refine(
    vecs: DataFrame,
    centroids: DataFrame,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
    dim: int | None = None,
) -> DataFrame:
    """``n_iter`` Lloyd iterations from FIXED starting centroids, fully
    deterministic (rounded-cosine argmax, ordered-fold means): returns
    the final (vec_id, cluster_id, cosine) assignment. Each iteration is
    one broadcast-assign + one element-wise agg — no driver-side state at
    all, centroids stay a k-row DataFrame end to end. The seeded-sample
    TRAINER for production (bounded collect, numpy Lloyd) remains
    similarity.py's train_ivf_centroids; this is the all-distributed,
    oracle-exact refinement path."""
    cents = centroids.select(
        F.col(cid_col).alias("cid"), as_double(F.col(cvec_col)).alias("cvec")
    )
    assign = cluster_assign(vecs, cents, id_col, vec_col, "cid", "cvec", dim)
    for _ in range(n_iter - 1):
        cents = centroid_means(assign, vecs, id_col, vec_col)
        assign = cluster_assign(vecs, cents, id_col, vec_col, "cid", "cvec", dim)
    return assign


def semantic_dedup(
    vecs: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup: assign every embedding to its nearest centroid, then mark
    as duplicate any vector with a SAME-CLUSTER partner of smaller id
    whose pairwise cosine (rounded to 6) is ≥ threshold. Returns
    (vec_id, cluster_id, is_dup) — keepers are the cluster-local minimal
    ids of each near-identical group.

    The pair join is per-cluster: both sides shuffle on cluster_id and the
    quadratic term is bounded by the largest cluster, not the corpus.
    Member norms are attached BEFORE the pair join (cluster_assign's
    precompute rationale: identical floats, one dot per pair, codegen
    stays compilable at dim=64)."""
    assign = cluster_assign(
        vecs, centroids, id_col, vec_col, cid_col, cvec_col, dim
    )
    v = vecs.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    # three consumers (both pair-join sides + the final labeling) —
    # checkpoint so the nearest-centroid assignment runs ONCE instead of
    # re-executing per branch (measured 7 corpus scans before; 2 after)
    members = (
        assign.join(v, id_col)
        .select(
            F.col(id_col), "cluster_id", "v", norm(F.col("v"), dim).alias("nv")
        )
        .localCheckpoint(eager=True)
    )
    a = members.select(
        F.col(id_col).alias("ia"), F.col("cluster_id").alias("ca"),
        F.col("v").alias("va"), F.col("nv").alias("na"),
    )
    b = members.select(
        F.col(id_col).alias("ib"), F.col("cluster_id").alias("cb"),
        F.col("v").alias("vb"), F.col("nv").alias("nb"),
    )
    dup_ids = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("ib") < F.col("ia")))
        .where(
            F.round(
                dot(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")),
                6,
            )
            >= F.lit(threshold)
        )
        .select(F.col("ia").alias(id_col))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        members.select(F.col(id_col), "cluster_id")  # same cols as assign,
        .join(dup_ids, id_col, "left")               # zero extra scans
        .select(
            F.col(id_col),
            "cluster_id",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )

"""Range (interval-containment) join — point-in-interval matching, the
second join family the reference lacks (SURVEY §2.C "absent" list, with
as-of). Spark executes a naive ``t BETWEEN start AND end`` predicate as a
broadcast-nested-loop (O(|points|·|intervals|)); this operator instead
BUCKETIZES time:

    1. pick a bucket width (caller-supplied, ~median interval length),
    2. explode each interval into the buckets it overlaps,
    3. equi-join points to interval-buckets on (key, bucket) — a plain
       shuffled hash join Catalyst can plan and AQE can skew-split,
    4. post-filter exact containment (cheap, per candidate).

Cost: |intervals| × avg_buckets_per_interval replicas instead of a cross
product. Degenerate case — one interval spanning everything — replicates
that interval into every bucket; cap interval length upstream or route
outliers to a broadcast side when that matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width_s: int) -> Column:
    # integer epoch-second division — deterministic, no doubles
    return (F.unix_timestamp(col) / F.lit(width_s)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_time: str,
    interval_start: str,
    interval_end: str,
    bucket_width_s: int = 3600,
    inclusive_end: bool = False,
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` key) whose
    [start, end) contains the point's time — ``inclusive_end`` switches to
    [start, end]. Output: all point columns + all interval columns (names
    must not collide apart from the keys)."""
    on = list(on)
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col(interval_start), bucket_width_s),
                _bucket(F.col(interval_end), bucket_width_s),
            )
        ),
    )
    pt = points.withColumn("_b", _bucket(F.col(point_time), bucket_width_s))
    joined = pt.join(iv, on + ["_b"])
    t = F.col(point_time)
    end_ok = (
        t <= F.col(interval_end) if inclusive_end else t < F.col(interval_end)
    )
    return joined.where((t >= F.col(interval_start)) & end_ok).drop("_b")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: list[str],
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Interval×interval OVERLAP join (sessions vs incidents, downtime vs
    deploys): pairs with ``a_start <= b_end AND b_start <= a_end``
    (inclusive) per key. Same bucketize-then-equi-join strategy as
    range_join, plus the FIRST-SHARED-BUCKET trick: a qualifying pair
    shares every bucket in the overlap region, so the join keeps only
    the bucket equal to ``greatest(bucket(a_start), bucket(b_start))`` —
    exactly one surviving row per pair, no DISTINCT pass over the
    candidate blowup. Output: all a columns + all b columns (names must
    not collide apart from the keys)."""
    on = list(on)
    av = a.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col(a_start), bucket_width_s),
                _bucket(F.col(a_end), bucket_width_s),
            )
        ),
    )
    bv = b.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col(b_start), bucket_width_s),
                _bucket(F.col(b_end), bucket_width_s),
            )
        ),
    )
    joined = av.join(bv, on + ["_b"])
    first_shared = F.greatest(
        _bucket(F.col(a_start), bucket_width_s),
        _bucket(F.col(b_start), bucket_width_s),
    )
    return joined.where(
        (F.col("_b") == first_shared)
        & (F.col(a_start) <= F.col(b_end))
        & (F.col(b_start) <= F.col(a_end))
    ).drop("_b")

"""As-of (point-in-time) join — an operator the reference lacks and Spark
has no built-in for (DuckDB/Pandas expose ASOF JOIN; SURVEY §2.C notes the
gap). Implemented as a UNION-MARKER + WINDOW plan, not a join:

    1. tag right rows (carrying their payload) and left rows (payload NULL),
    2. union them and sort within each key by (time, right-first tiebreak),
    3. for each left row, the "as-of" right row is last_value(payload,
       ignorenulls) over rows unbounded-preceding → current.

This is the scalable formulation: ONE shuffle on the key + a sort within
partitions — no range-join blowup, no per-left-row probe. Skewed keys
behave like any window (AQE can't split a single key, but state per key is
one running value, so memory is flat).

Semantics (backward as-of): for each left row, the right row with the
greatest ``right_time <= left_time`` within the same key; ties on
right_time resolve to the largest ``tiebreak`` column when provided.
Left rows with no prior right row get NULLs — a LEFT OUTER as-of.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: str | float | None = None,
) -> DataFrame:
    """As-of join: left columns + each ``right_values`` column as
    ``<name><suffix>`` from the matched right row (per ``on`` key).

    ``direction="backward"`` (default): latest right at-or-before the
    left time; at equal timestamps the right row IS visible — inclusive
    ``right_time <= left_time``, matching DuckDB's ASOF ``ON l.t >= r.t``.
    ``direction="forward"``: earliest right at-or-after (inclusive) the
    left time; the same union-marker plan with the frame reversed
    (current → following, ``first`` instead of ``last``).
    ``tolerance`` bounds the match distance (pandas merge_asof parity):
    an INTERVAL string for timestamps (e.g. ``"10 minutes"``) or a
    number for numeric time columns; out-of-tolerance matches become
    NULLs, applied as a post-filter on the matched payload (the window
    math is unchanged, so the plan stays one shuffle + one sort)."""
    assert direction in ("backward", "forward"), direction
    on = list(on)
    rv = list(right_values)

    # the right payload travels as ONE struct: last_value(ignorenulls) then
    # selects a whole right ROW, so a legitimately-NULL payload field can't
    # fall back to an older right row for just that column
    # the right time rides IN the payload (as __rt) so tolerance can be
    # checked after the window without a second join
    payload = F.struct(
        *[F.col(c).alias(c) for c in rv], F.col(right_time).alias("__rt")
    )
    payload_type = right.select(payload.alias("_rv")).schema["_rv"].dataType

    lmark = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(payload_type).alias("_rv"),
        (
            F.lit(None).cast(right.schema[tiebreak].dataType)
            if tiebreak
            else F.lit(None).cast("long")
        ).alias("_tb"),
    )
    rmark = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
        *[F.col(c) for c in on],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        payload.alias("_rv"),
        (F.col(tiebreak) if tiebreak else F.lit(None).cast("long")).alias("_tb"),
    ).select(*lmark.columns)  # align column order for the union

    u = lmark.unionByName(rmark)
    if direction == "backward":
        # right rows first at equal time (inclusive <=); among equal-time
        # right rows the largest tiebreak sorts last and therefore wins
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_t"), F.col("_is_left"), F.col("_tb").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn("_m", F.last(F.col("_rv"), ignorenulls=True).over(w))
    else:
        # left rows first at equal time (inclusive >=); among equal-time
        # right rows the smallest tiebreak sorts first and therefore wins
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("_t"),
                F.col("_is_left").desc(),
                F.col("_tb").asc_nulls_first(),
            )
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = u.withColumn("_m", F.first(F.col("_rv"), ignorenulls=True).over(w))
    if tolerance is not None:
        tol = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        rt = F.col("_m.__rt")
        ok = (
            rt >= F.col("_t") - tol
            if direction == "backward"
            else rt <= F.col("_t") + tol
        )
        matched = matched.withColumn("_m", F.when(ok, F.col("_m")))
    return (
        matched.where(F.col("_is_left") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col("_m")[c].alias(f"{c}{suffix}") for c in rv],
        )
    )

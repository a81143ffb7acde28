"""Behavioral analytics operators: cohort retention and ordered funnels.

The product-analytics counterparts of the reference's pattern summaries —
both are shapes a query-log/event warehouse is asked for constantly, and
both have a canonical distributed plan worth pinning:

- Retention: two aggregations over the SAME user-keyed exchange (first-seen
  cohort, then distinct user-week activity) joined on user — no window, no
  per-user state.
- Funnel: one tiny per-user timestamp per stage, each stage a conditional
  min-agg joined against the previous stage's result. Stages-many joins of
  user-keyed aggregates, each strictly smaller than the last (funnels only
  shrink) — never a sort of raw events.

Scale notes (100 TB): every stage/table here is keyed on user_id; with the
event log bucketed on user_id (sources/layout.py) all the joins co-locate
and the only full-data pass is the per-stage filtered scan, which pushes
its event_type predicate into parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by first-seen
    period, counted in each later period they remain active.

    Returns (cohort_week, week_offset, n_active, cohort_size, retention)
    with offset 0 = the cohort period itself (retention 1.0 by
    construction). Periods are ``date_trunc`` buckets; the offset is
    exact integer epoch arithmetic, so the whole surface is
    engine-portable."""
    from pyspark.storagelevel import StorageLevel

    secs = {"week": 604800, "day": 86400}[period]
    # ONE raw scan: the distinct (user, period) activity table is the only
    # pass over events; the cohort (first period per user) derives from it
    # (min activity period == period of first event), and persisting the
    # tiny distinct table keeps its two consumers from re-executing it
    act = (
        events.select(
            user_col, F.date_trunc(period, F.col(ts_col)).alias("w")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    first = act.groupBy(user_col).agg(F.min("w").alias("cohort_week"))
    j = act.join(first, user_col).select(
        user_col,
        "cohort_week",
        (
            (F.col("w").cast("long") - F.col("cohort_week").cast("long"))
            / secs
        )
        .cast("long")
        .alias("week_offset"),
    )
    size = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        j.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_active"))
        .join(size, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: a user converts stage k only with an event of that
    type STRICTLY AFTER their stage-(k-1) conversion time (first-touch
    semantics: each stage binds to the user's earliest qualifying event).

    Returns one row per stage: (stage_idx, stage, n_users,
    conv_from_prev, conv_from_first).

    Plan: ONE scan (event_type IN stages pushed down) + ONE user-keyed
    shuffle. Each user's stage-relevant events are sorted and folded
    JVM-side (F.aggregate over the collected array) into the furthest
    stage reached — a per-stage-join formulation re-executes earlier
    stages' subtrees (O(stages) scans measured); the fold computes the
    same strictly-after/first-touch semantics in a single pass. Per-user
    state is the user's funnel-typed events only (the pushed IN-filter
    bounds the array)."""
    stage_arr = F.array(*[F.lit(st) for st in stages])
    per_user = (
        events.where(F.col(type_col).isin(list(stages)))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                        F.col(type_col).alias("et")))
            ).alias("evs")
        )
    )
    # fold state: (s = stages completed, t = ts of the last completed
    # stage). An event advances the funnel iff it is the next needed type
    # and strictly after the previous stage's bind time (ties on ts are
    # excluded by > exactly like the join formulation; fold order within
    # equal ts therefore cannot change the result).
    init = F.struct(
        F.lit(0).alias("s"), F.lit(None).cast("timestamp").alias("t")
    )
    reached = per_user.select(
        F.aggregate(
            F.col("evs"),
            init,
            lambda acc, x: F.when(
                # try_: a fully-converted user has s == len(stages) and
                # the next-stage lookup must yield NULL (no advance), not
                # an ANSI out-of-bounds error
                (x["et"] == F.try_element_at(stage_arr, acc["s"] + 1))
                & ((acc["s"] == 0) | (x["ts"] > acc["t"])),
                F.struct((acc["s"] + 1).alias("s"), x["ts"].alias("t")),
            ).otherwise(acc),
        )["s"].alias("reached")
    )
    counts = None
    for i, stage in enumerate(stages):
        row = reached.agg(
            F.count(F.when(F.col("reached") >= i + 1, 1)).alias("n_users")
        ).select(
            F.lit(i + 1).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        counts = row if counts is None else counts.unionByName(row)
    from pyspark.sql import Window

    w = Window.orderBy("stage_idx")
    first_n = F.first("n_users").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    prev_n = F.lag("n_users").over(w)
    # zero-user stages make the ratios 0/0 — define conversion out of an
    # empty prior stage as 0, and never divide by zero under ANSI mode
    return counts.select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(
            F.coalesce(
                F.when(
                    prev_n > 0, F.col("n_users") / prev_n.cast("double")
                ).otherwise(
                    F.when(prev_n.isNull(), F.lit(1.0)).otherwise(F.lit(0.0))
                ),
                F.lit(1.0),
            ),
            6,
        ).alias("conv_from_prev"),
        F.round(
            F.when(
                first_n > 0, F.col("n_users") / first_n.cast("double")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("conv_from_first"),
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (from_type, to_type, n, p) where n counts consecutive
    (ts, tiebreak)-ordered pairs and p = n / outgoing-total of
    from_type. The behavioral upgrade of the funnel: instead of one
    hand-specified path, EVERY observed path contributes, and the matrix
    feeds next-action prediction, anomaly scoring (improbable jumps),
    and session simulation.

    One window lag per user (single shuffle on the user key) + one
    vocabulary-sized agg; p is an exact integer ratio cast once. The
    6-decimal truncation uses the repo's floor-at-microprecision
    convention (floor(x*1e6)/1e6) rather than ROUND: a ratio landing
    exactly on a 5 in the 7th decimal would round differently under
    Spark's HALF_UP doubles vs DuckDB's half-away — the dyadic-tie class
    the ts05/ewma entries already avoid (r4 ADVICE finding)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(key_col),
            F.col(type_col).alias("to_type"),
            F.lag(type_col).over(w).alias("from_type"),
        )
        .where(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return counts.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.floor(F.col("n") / F.col("tot") * 1e6) / 1e6).alias("p"),
    )


def benford_deviation(
    df: DataFrame,
    value_col: str = "value",
) -> DataFrame:
    """Benford's-law first-significant-digit audit of a positive metric:
    per digit d in 1..9, observed count, expected probability
    log10(1 + 1/d), and the chi-square contribution; one extra row
    (digit 0) carries the total statistic. Strong deviation on a metric
    that should be scale-spanning (transaction amounts, durations) is a
    data-quality / fabrication signal — a distribution check orthogonal
    to both dq01's bounds and an03's two-sample KS.

    First digit via string head of the positive value's scientific
    mantissa-free form: floor(x / 10^floor(log10(x))) — pure JVM math,
    identical in the replay. One scan, 10-row output.

    The digit domain is ALWAYS the full 1..9 (observed counts left-joined
    onto a literal domain, missing digits coalesced to 0): a digit that
    never occurs is the STRONGEST Benford deviation — its chi-square term
    (0 - p*n)^2/(p*n) = p*n — and an observed-digits-only build would
    silently drop exactly that term (r4 ADVICE finding)."""
    pos = df.select(F.col(value_col).cast("double").alias("v")).where(
        F.col("v") > 0
    )
    digit = F.floor(
        F.col("v") / F.pow(F.lit(10.0), F.floor(F.log10("v")))
    ).cast("int")
    observed = pos.select(digit.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("observed")
    )
    domain = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("d"))
    counts = domain.join(observed, "d", "left").select(
        "d", F.coalesce("observed", F.lit(0)).alias("observed")
    )
    from pyspark.sql import Window

    # the partition-less window here is over the 9-row digit-domain
    # table, not the corpus: its SinglePartition exchange carries 9 rows
    # at any scale (allowlisted in tools/plan_audit.py), and deriving
    # n_total from the domain rows keeps the corpus scan at exactly one
    # — a separate count(pos) total would re-scan
    tot = Window.partitionBy()
    scored = counts.select(
        "d",
        "observed",
        F.sum("observed").over(tot).alias("n_total"),
        F.round(F.log10(1.0 + 1.0 / F.col("d")), 6).alias("expected_p"),
    ).select(
        "d",
        "observed",
        "n_total",
        "expected_p",
        F.round(
            F.pow(
                F.col("observed") - F.col("expected_p") * F.col("n_total"), 2.0
            )
            / (F.col("expected_p") * F.col("n_total")),
            6,
        ).alias("chi2_part"),
    )
    total_row = scored.agg(
        F.max("n_total").alias("nt"),
        F.round(F.sum("chi2_part"), 6).alias("c"),
    ).select(
        F.lit(0).alias("d"),
        F.col("nt").alias("observed"),
        F.col("nt").alias("n_total"),
        F.round(F.lit(1.0), 6).alias("expected_p"),
        F.col("c").alias("chi2_part"),
    )
    return scored.unionByName(total_row)

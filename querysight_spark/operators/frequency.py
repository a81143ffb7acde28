"""Frequency sketching: an engine-portable Count-Min sketch over a token
stream, plus point estimates for candidate items.

Spark ships a built-in ``count_min_sketch`` aggregate, but its binary
sketch state is engine-specific (Java murmur-hash layout) — useless for
cross-engine verification and for consumers outside the JVM. This
implementation keys buckets off md5 prefixes instead: DETERMINISTIC and
portable (DuckDB replays the identical sketch digit-for-digit via the
strpos-table hex decode the dd05/tx08 oracles established), while keeping
the exact CM guarantees (estimate >= true count; error <= N/width with
probability 1 - (1/2)^depth for independent-enough rows).

Scale shape (100 TB): the sketch build is one map-side expansion (depth
struct columns per token, exploded) into a partial+final hash agg whose
OUTPUT is depth x width rows — constant size regardless of corpus. The
tiny sketch is then broadcast onto any candidate set for point estimates;
the corpus is never rescanned per query. That is the whole point of CMS:
frequency service at fixed memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(item: F.Column, row: int, width: int) -> F.Column:
    """Portable bucket: first 8 md5 hex chars of 'row:item' as an int,
    mod width. conv() yields the same integer DuckDB's strpos-table hex
    decode does, so both engines land every occurrence in the same cell."""
    h = F.md5(F.concat(F.lit(f"{row}:"), item))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast("int")


def count_min_table(
    tokens: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) with cnt = number of token
    OCCURRENCES hashing to that cell — at most depth*width rows.

    ``weight_col`` builds the identical sketch from a PRE-AGGREGATED
    (item, count) table instead of the raw occurrence stream: every
    occurrence of an item lands in the same cell, so summing per-item
    counts into cells equals counting raw rows — but hashes only the
    vocabulary (one md5 per distinct item per sketch row) instead of
    the full token stream. When the exact counts already exist (heavy-
    hitter candidate selection), this is the cheaper build path."""
    cells = tokens.select(
        (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _bucket(F.col(item_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    )
    return cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    ).agg(F.sum("w").alias("cnt"))


def count_min_estimates(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates for each distinct row of ``items``: est = min over
    sketch rows of the item's cell count (0 if an item's cell is empty —
    only possible for items never seen). One broadcast join of the
    depth*width-row sketch onto the candidates; no corpus access."""
    cand = items.select(item_col).distinct()
    probes = cand.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _bucket(F.col(item_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select(item_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    j = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return j.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )

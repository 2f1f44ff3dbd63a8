"""As-of and range joins — time-series operators the reference lacks and
Spark has no native operator for (BASELINE.json scale extensions).

- ``asof_join``: for each left row, the latest right row with
  right_ts <= left_ts per key. Implemented with the union trick: tag
  both sides, union, window-sort by (key, ts, side), carry the last
  right value forward with ``last(..., ignorenulls=True)``. ONE shuffle
  on (key), no range explosion, no broadcast requirement — the
  canonical distributed as-of (what pandas merge_asof does per group,
  expressed relationally).
- ``range_join_bucketed``: inequality/interval joins naively plan as
  BroadcastNestedLoopJoin (O(n*m)). Bucketing the time axis turns them
  into an equi-join on (key, bucket) with a post-filter: each left
  interval lands in ceil(len/bucket)+1 buckets, so the pair space is
  bounded by bucket co-residency — the standard trick Databricks ships
  as RANGE_JOIN hints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the value columns of the most
    recent right row (right_ts <= left_ts) with the same key; nulls when
    no prior right row exists. Right side should be unique per
    (key, ts) — pre-aggregate otherwise."""
    lt = left.withColumn("__ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    )
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).cast("timestamp").alias("__ts"),
            *[F.col(c) for c in value_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    for c in left.columns:
        if c not in (on,) and c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in value_cols:
        lt = lt.withColumn(c, F.lit(None))
    unioned = lt.select(rt.columns).unionByName(rt)

    # right rows (side=0) sort before left rows at equal ts -> a right
    # row at exactly left_ts is visible to that left row ("<=")
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in value_cols:
        carried = carried.withColumn(
            f"{c}{suffix}", F.last(F.col(c), ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__side") == 1).drop("__side", "__ts", *value_cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str,
    left_end: str,
    right_ts: str,
    bucket_secs: int = 86400,
) -> DataFrame:
    """Interval join: pairs (l, r) with same key and
    l.start <= r.ts < l.end — via time-bucket equi-join + filter,
    avoiding the BroadcastNestedLoopJoin a naive inequality join plans.
    Left intervals explode into their covered buckets; right rows land
    in exactly one."""
    b = F.lit(bucket_secs)
    lstart = F.unix_timestamp(F.col(left_start))
    lend = F.unix_timestamp(F.col(left_end))
    buckets = F.sequence(F.floor(lstart / b), F.floor((lend - 1) / b))
    lb = left.withColumn("__bkt", F.explode(buckets))
    rb = right.withColumn("__bkt", F.floor(F.unix_timestamp(F.col(right_ts)) / b))
    joined = lb.join(rb, [on, "__bkt"]).drop("__bkt")
    return joined.filter(
        (F.unix_timestamp(F.col(right_ts)) >= F.unix_timestamp(F.col(left_start)))
        & (F.unix_timestamp(F.col(right_ts)) < F.unix_timestamp(F.col(left_end)))
    )

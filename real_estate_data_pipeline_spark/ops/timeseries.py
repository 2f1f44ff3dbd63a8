"""Time-series regularization: per-key fixed-interval resampling with
forward fill — the gap-filling primitive behind rate dashboards, feature
snapshots ("state of every user at every hour"), and sensor rollups.

Spark has window aggregation (``F.window``) but no native gap filling:
buckets with no events simply don't exist in a groupBy result, and a
downstream join or ML featurizer that assumes a dense grid silently
loses the gaps. This operator makes the grid explicit and carries the
last observation forward.

Reference: the real-estate pipeline's daily partition scheme
(silver_etl_script.py partition-date derivation) assumes dense daily
batches; this is the engine-level generalization to any interval.

Plan shape (three shuffles, all on the key or (key, bucket)):
1. one row per (key, bucket): the LAST observation in the bucket,
   picked by a rank window ordered (ts DESC, tiebreaker DESC) — ties
   on ts are broken deterministically so cross-engine replicas agree;
2. per-key span (min/max bucket) -> ``sequence`` -> ``explode`` builds
   the dense grid with no driver participation; grid size is bounded
   by span/interval per key, so a runaway key cannot OOM the driver
   (it can bloat the grid — ``max_buckets_per_key`` guards that);
3. left join grid to observations, then ``last(value, ignorenulls)``
   over an unbounded-preceding window per key = forward fill.

Scale notes: the fill window partitions by key — one key's grid lives
in one task, which is exactly right for per-user/device series (a key's
grid is span/interval rows, independent of event volume). Event volume
itself is reduced to one row per (key, bucket) BEFORE any window runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_seconds: int = 3600,
    tiebreaker_col: str | None = None,
    max_buckets_per_key: int | None = 100_000,
) -> DataFrame:
    """Dense per-key grid at ``interval_seconds`` from each key's first
    to last bucket, with ``value_col`` forward-filled across empty
    buckets. Returns (key, bucket_ts timestamp, value, observed bool):
    ``observed`` marks buckets that had at least one real event —
    downstream consumers can distinguish a filled gap from a reading.

    ``tiebreaker_col`` breaks equal-timestamp ties deterministically
    (pass a unique id); without it the last-in-bucket pick on tied
    timestamps is engine-dependent. ``max_buckets_per_key`` fails fast
    if one key's span would explode the grid (e.g. one 1970 timestamp
    in 2024 data = 470k hourly buckets); None disables the guard."""
    ivl = int(interval_seconds)
    # floor, not cast-truncation: for pre-1970 timestamps (negative
    # epoch) cast('bigint') rounds toward zero, putting a row in the
    # bucket AFTER its own timestamp and diverging from the oracle's
    # floor(epoch/interval)
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / ivl).cast("bigint") * ivl
    )
    order = [F.col(ts_col).desc()]
    if tiebreaker_col is not None:
        order.append(F.col(tiebreaker_col).desc())
    w_last = Window.partitionBy(key_col, "__bkt").orderBy(*order)
    obs = (
        df.select(
            F.col(key_col),
            bucket.alias("__bkt"),
            F.col(ts_col),
            *([F.col(tiebreaker_col)] if tiebreaker_col else []),
            F.col(value_col).alias("__v"),
        )
        .withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select(key_col, "__bkt", "__v")
    )
    span = obs.groupBy(key_col).agg(
        F.min("__bkt").alias("__lo"), F.max("__bkt").alias("__hi")
    )
    if max_buckets_per_key is not None:
        # guard lives INSIDE __hi (not a dropped side column, which
        # Catalyst would prune away along with the check): a key whose
        # span explodes the grid fails the job with a clear message
        # instead of materializing millions of buckets
        n_buckets = (
            (F.unix_timestamp("__hi") - F.unix_timestamp("__lo")) / ivl + 1
        ).cast("bigint")
        msg = F.concat(
            F.lit("resample_ffill: key "),
            F.col(key_col).cast("string"),
            F.lit(" spans "),
            n_buckets.cast("string"),
            F.lit(f" buckets (> max_buckets_per_key={max_buckets_per_key}); "),
            F.lit("bad timestamps?"),
        )
        span = span.withColumn(
            "__hi",
            F.when(
                n_buckets > max_buckets_per_key, F.raise_error(msg).cast("timestamp")
            ).otherwise(F.col("__hi")),
        )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {ivl} SECONDS"))
        ).alias("bucket_ts"),
    )
    joined = grid.join(
        obs.withColumnRenamed("__bkt", "bucket_ts"), [key_col, "bucket_ts"], "left"
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        "bucket_ts",
        F.last("__v", ignorenulls=True).over(w_fill).alias(value_col),
        F.col("__v").isNotNull().alias("observed"),
    )

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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    max_of_ties: bool = False,
) -> DataFrame:
    """Left as-of join (pandas ``merge_asof`` parity, distributed):
    every left row + the value columns of the matched right row with
    the same key; nulls when no match exists.

    ``direction``:
    - ``"backward"`` (default): most recent right with rts <= lts;
    - ``"forward"``: earliest right with rts >= lts (same union trick
      over a DESCENDING window — at equal ts the right row stays
      visible, so >= holds exactly);
    - ``"nearest"``: whichever of the two is closer in time; equal
      distance breaks BACKWARD (matches pandas).

    ``tolerance_seconds``: maximum |lts - matched rts|; a match beyond
    it becomes null (the match is still the NEAREST candidate first,
    then the tolerance nulls it — identical to pandas semantics, and
    NOT the same as "nearest within window").

    Still ONE shuffle on the key per direction (nearest = the same
    union windowed twice, no extra shuffle: both windows partition by
    the key, and the second sort rides the first's exchange). Right
    side should be unique per (key, ts) — pre-aggregate otherwise, OR
    pass ``max_of_ties=True`` (single value column only): the value
    column joins the window sort key, so the last tied right row the
    window sees IS the per-(key, ts) max — identical to pre-aggregating
    ``max(value)`` (r15 opt round: the pre-aggregation was a second
    full shuffle of the right side that reduced nothing on
    near-unique-timestamp data; folding it into the one union-trick
    sort halves the right side's shuffled bytes). Caveat: a (key, ts)
    group whose values are ALL null forward-fills past the group
    instead of matching as null — same class as the NULL known edge
    below.
    Known edge (vs pandas merge_asof): the value columns forward-fill
    independently of the matched row's timestamp, so a matched right row
    whose value column is NULL surfaces the nearest OLDER non-null value
    even when that older row lies outside ``tolerance_seconds``.
    merge_asof would return NaN there. Only observable when right-side
    value columns contain NULLs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    if max_of_ties and len(value_cols) != 1:
        raise ValueError(
            "max_of_ties resolves ties by ONE value column joining the sort "
            f"key; with {len(value_cols)} value columns the per-column maxima "
            "can come from different rows — pre-aggregate instead"
        )
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
    # carry the right row's own timestamp too: tolerance and nearest
    # need the matched rts, not just its values
    rt = rt.withColumn("__rts", F.col("__ts"))
    lt = lt.withColumn("__rts", F.lit(None).cast("timestamp"))
    unioned = lt.select(rt.columns).unionByName(rt)

    # right rows (side=0) sort before left rows at equal ts in BOTH
    # orderings -> a right row at exactly left_ts is visible ("<="/">=")
    # with max_of_ties the value column is the ties' LAST sort key in
    # BOTH directions (asc: nulls first, so the last tied row the
    # window sees is the non-null max — exactly what a max() pre-
    # aggregation of the tied group returns)
    tie_keys = [F.col(value_cols[0]).asc()] if max_of_ties else []
    w_back = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), *tie_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").desc(), F.col("__side").asc(), *tie_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    windows = {"backward": [("b", w_back)], "forward": [("f", w_fwd)]}.get(
        direction, [("b", w_back), ("f", w_fwd)]
    )
    carried = unioned
    for tag, w in windows:
        for c in [*value_cols, "__rts"]:
            carried = carried.withColumn(
                f"__{tag}_{c}", F.last(F.col(c), ignorenulls=True).over(w)
            )

    out = carried.filter(F.col("__side") == 1)
    tol = None if tolerance_seconds is None else F.lit(float(tolerance_seconds))

    def _dist(rts):
        # cast-to-double keeps sub-second precision (unix_timestamp
        # truncates to whole seconds, misjudging tolerance edges)
        return F.abs(F.col("__ts").cast("double") - rts.cast("double"))

    if direction in ("backward", "forward"):
        tag = "b" if direction == "backward" else "f"
        keep = (
            F.lit(True)
            if tol is None
            else _dist(F.col(f"__{tag}___rts")) <= tol
        )
        sel = {c: F.when(keep, F.col(f"__{tag}_{c}")) for c in value_cols}
    else:
        db, df_ = _dist(F.col("__b___rts")), _dist(F.col("__f___rts"))
        # nearest: pick the closer side; ties and missing-forward fall
        # back to backward (pandas tie-break)
        use_back = F.col("__f___rts").isNull() | (
            F.col("__b___rts").isNotNull() & (db <= df_)
        )
        chosen_dist = F.when(use_back, db).otherwise(df_)
        keep = F.lit(True) if tol is None else chosen_dist <= tol
        sel = {
            c: F.when(
                keep,
                F.when(use_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")),
            )
            for c in value_cols
        }
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", sel[c])
    drop = [
        "__side", "__ts", "__rts", *value_cols,
        *[f"__{t}_{c}" for t, _ in windows for c in [*value_cols, "__rts"]],
    ]
    return out.drop(*drop)


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

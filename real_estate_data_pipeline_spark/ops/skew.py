"""Skew-handling operators for 100 TB workloads.

AQE's skew-join handling (enabled by the session builder) covers sort-
merge joins; these helpers cover the two shapes AQE doesn't:

- ``salted_aggregate``: two-phase aggregation for skewed group keys
  (e.g. one district holding 30% of all listings). Phase 1 aggregates on
  (key, salt) spreading the hot key over N reducers; phase 2 combines
  the partials. Works for any algebraic aggregate (sum/count/min/max).
- ``salted_join``: replicate the small side N ways, salt the skewed fact
  side, join on (key, salt) — an equi-join with no single hot reducer.

Both are pure DataFrame transformations (deterministic salts from
xxhash64 of a row id, no RNG).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, n: int, salt_from: str | None, keys: list[str]) -> Column:
    """Deterministic per-row salt. ``salt_from=None`` hashes ALL columns,
    which spreads a hot key as long as its rows differ anywhere; passing
    one of ``keys`` would put every row of a hot key into the same salt
    (a silent no-op), so that is rejected."""
    if salt_from is None:
        return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n)).cast("int")
    if salt_from in keys:
        raise ValueError(
            f"salt_from={salt_from!r} is a group/join key: every row of a hot key "
            "would get the same salt, defeating the mitigation. Use a row-unique "
            "column, or None to hash all columns."
        )
    return F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output_name -> (input_col, fn) with fn in
    {sum, count, min, max}. Example::

        salted_aggregate(li, ["l_returnflag"],
                         {"qty": ("l_quantity", "sum"), "n": ("*", "count")})
    """
    salted = df.withColumn("__salt", _salt(df, n_salts, salt_from, keys))

    phase1 = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1.append(F.count(F.lit(1)).alias(f"__p_{out}"))
        elif fn == "sum":
            phase1.append(F.sum(col).alias(f"__p_{out}"))
        elif fn == "min":
            phase1.append(F.min(col).alias(f"__p_{out}"))
        elif fn == "max":
            phase1.append(F.max(col).alias(f"__p_{out}"))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    partial = salted.groupBy(*keys, "__salt").agg(*phase1)

    phase2 = []
    for out, (_, fn) in aggs.items():
        combiner = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}[fn]
        phase2.append(combiner(f"__p_{out}").alias(out))
    return partial.groupBy(*keys).agg(*phase2)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact-dim equi-join: fact rows get a deterministic salt,
    the dim side is exploded n_salts ways, the join key becomes
    (key, salt). Dim grows n_salts x — use for small-to-medium dims
    where broadcast is too big but a hot fact key melts one reducer."""
    f = fact.withColumn("__salt", _salt(fact, n_salts, salt_from, [on]))
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = f.join(d, [on, "__salt"], how)
    return out.drop("__salt")


def salted_top_n(
    df: DataFrame,
    part_cols: list[str],
    order_by: list[Column],
    n: int,
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Skew-safe per-group top-N — the third shape AQE cannot fix: a
    rank WINDOW over a hot partition key runs one task per key no
    matter how big the key is. Two phases: rank within (key, salt) and
    keep n per salted sub-partition (any global top-n row is top-n in
    its own salt bucket, so nothing is lost), then rank the surviving
    <= n * n_salts rows per key. Result-identical to the plain window
    PROVIDED ``order_by`` is a total order (include a unique
    tiebreaker column) — otherwise which of the tied rows survives
    phase 1 is salt-dependent.

    Returns the original columns of the kept rows."""
    from pyspark.sql import Window

    salted = df.withColumn("__salt", _salt(df, n_salts, salt_from, part_cols))
    w1 = Window.partitionBy(*part_cols, "__salt").orderBy(*order_by)
    w2 = Window.partitionBy(*part_cols).orderBy(*order_by)
    return (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= n)
        .withColumn("__rn2", F.row_number().over(w2))
        .filter(F.col("__rn2") <= n)
        .drop("__rn", "__rn2", "__salt")
    )

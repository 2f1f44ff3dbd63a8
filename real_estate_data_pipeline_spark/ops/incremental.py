"""Incremental aggregate maintenance — keep a persisted rollup current
by merging DELTA batches instead of re-aggregating the full table.

The reference recomputes its Gold aggregates from the whole Silver
table nightly (gold_ml_etl.py full-table groupBys under a daily DAG);
at 100 TB a day's increment is ~0.1% of the data, so maintaining the
rollup costs ~1000x less than recomputing it. The contract is the
standard mergeable-state one (same algebra Spark uses for its own
partial aggregates, and sketches use for theirs): persist
``mergeable_rollup`` output, and for each new batch
``merge_rollups([state, mergeable_rollup(delta, ...)], ...)`` — the
result is bit-identical to a full recompute PROVIDED the aggregates
are algebraic (sum/count/min/max; averages derive as sum/count, and
float sums should use integer-scaled units to stay order-exact, see
queries.incr_rollup_events).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COMBINE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def mergeable_rollup(
    df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """The persistable partial state: one row per key with one column
    per aggregate. ``aggs``: output_name -> (input_col, fn), fn in
    {sum, count, min, max} — the same spec as skew.salted_aggregate."""
    cols = []
    for out, (col, fn) in aggs.items():
        if fn not in _COMBINE:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be merged")
        cols.append(
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(out)
        )
    return df.groupBy(*keys).agg(*cols)


def merge_rollups(
    parts: list[DataFrame], keys: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Combine partial states (prior state + deltas, any number) into
    the rollup of their union: counts/sums re-sum, mins/maxes re-fold.
    Keys present in only some parts pass through untouched."""
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    return unioned.groupBy(*keys).agg(
        *[_COMBINE[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def join_delta(
    base_left: DataFrame,
    base_right: DataFrame,
    delta_left: DataFrame,
    delta_right: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Incremental maintenance of an INNER equi-join materialization —
    the delta-join rule every IVM system (DBSP, Materialize, Delta Live
    Tables) is built on::

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    Append the returned rows to the stored join result and it equals a
    full recompute over (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB) — verified
    value-exactly by the ``incr_join_maintenance`` gate oracle.
    Insert-only deltas (append workloads); updates/deletes need
    retraction weights, which the SCD2 Change Data Feed supplies
    upstream (close the old version, insert the new — each is an
    insert-only delta of its side).

    At 100 TB the wins are the usual IVM ones: the three delta joins
    shuffle only |Δ|-sized inputs on the big sides (ΔA ⋈ B_old scans
    B_old but shuffles it only on the join key — and prunes to ΔA's key
    range when the store is partitioned/bucketed on the key), instead
    of re-joining |A| x |B|."""
    keys = [on] if isinstance(on, str) else list(on)
    return (
        delta_left.join(base_right, keys)
        .unionByName(base_left.join(delta_right, keys))
        .unionByName(delta_left.join(delta_right, keys))
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
    assert_unique_key: bool = True,
) -> DataFrame:
    """Row-level diff of two table versions — the reconciliation
    primitive behind migration validation, replication checks, and
    SCD2 auditing: ONE full-outer equi-join on the key, null-safe
    comparison (``<=>``) of the tracked columns, and a status per key:
    'added' (new only), 'removed' (old only), 'changed' (both, any
    tracked column differs), 'unchanged'. Returns (key, diff_status);
    both shuffles are key-partitioned, nothing collects.

    PRECONDITION — ``key`` must be unique within each version, and
    NULL counts as one joinable key value (the join is null-safe):
    duplicate keys would fan out m x n through the full-outer join and
    multiple NULL-key rows would cross-join each other, yielding
    multiple (possibly conflicting) statuses per key. Enforced with a
    cheap count-vs-distinct assertion (one partial-agg pass per side)
    rather than silently emitting garbage; pre-aggregate to one row
    per key before calling if your table legitimately has duplicates.
    At 100 TB the assertion is two extra scans — callers who already
    guarantee uniqueness (e.g. diffing primary-keyed snapshots) can
    pass ``assert_unique_key=False`` to skip it.
    """
    for name, side in (("old", old), ("new", new)) if assert_unique_key else ():
        # count_distinct treats NULL as a value here because the join
        # does too: count over a 1-col struct wrapper never drops NULLs
        stats = side.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.struct(key)).alias("d"),
        ).collect()[0]
        if stats["n"] != stats["d"]:
            raise ValueError(
                f"table_diff precondition violated: key '{key}' is not "
                f"unique in the {name} version ({stats['n']} rows, "
                f"{stats['d']} distinct keys incl. NULL); pre-aggregate "
                "to one row per key first"
            )
    compare_cols = compare_cols or [
        c for c in old.columns if c != key and c in new.columns
    ]
    # presence markers, NOT key-null checks: the join is null-safe on
    # the key precisely so a NULL key is a legal value, which makes
    # "o.key IS NULL" unable to distinguish 'row absent' from 'row
    # present with NULL key'
    o = old.select(key, *compare_cols).withColumn("__in_old", F.lit(True)).alias("o")
    n = new.select(key, *compare_cols).withColumn("__in_new", F.lit(True)).alias("n")
    j = o.join(n, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")), "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same if same is not None else F.lit(True), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
        status.alias("diff_status"),
    )

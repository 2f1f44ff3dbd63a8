"""Intra-group pair expansion — the shared skeleton of every blocked
pair operator (MinHash/SimHash LSH, banded embedding LSH, n-gram
Jaccard blocking, self-kNN).

Why not a self-join on the blocking key: the broadcast side of a
self-join cannot reuse the other side's shuffle stages, so the whole
upstream pipeline (tokenize/shingle/hash/aggregate, or bucket+norm)
is planned and executed TWICE. Grouping each block and expanding the
i<j pairs with higher-order functions computes the upstream exactly
once and shuffles only the slim member payload.

Distribution is equivalent to the equi-join it replaces: a hash join
emits all of one key's pairs in one task too. The one divergence is
memory: a block's member array materializes in its task (payload_bytes
x block_size), so callers must keep blocks bounded — which every LSH /
blocking scheme here does by construction.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


DEFAULT_MAX_BLOCK = 8192


def pairs_within_groups(
    df: DataFrame,
    group_cols: list[str],
    member: Column,
    pair_fn: Callable[[Column, Column], Column],
    keep: Callable[[Column], Column] | None = None,
    max_block: int | None = DEFAULT_MAX_BLOCK,
    split_factor: int | None = None,
    split_threshold: int = 1024,
) -> DataFrame:
    """All unordered (i<j by array position) member pairs within each
    group.

    ``member`` is the struct collected per row; ``pair_fn(x, y)``
    builds the output struct for one pair; ``keep`` optionally filters
    pair structs BEFORE the explode (cheaper than a post-explode
    filter: rejected pairs never become rows). Output columns are the
    fields of the struct ``pair_fn`` returns.

    ``max_block`` caps the per-group member array: groups larger than
    the cap degrade to the pairs among their ``max_block`` smallest
    members (by the member struct's natural order — every caller here
    leads the struct with a distinct id, so the kept subset is
    deterministic) instead of expanding O(n^2) pairs and OOMing the
    task. At the default 8192 the worst-case pair array is ~33M
    structs (~1 GB) — survivable; a pathological corpus (millions of
    identical signatures in one LSH bucket) signals the need for an
    exact-dedup pre-pass rather than killing the job. ``None`` removes
    the cap. The cap only changes results for groups that exceed it.

    ``split_factor`` (opt-in) stripes each block BIGGER than
    ``split_threshold`` members across ``split_factor`` sub-tasks:
    the block row is exploded into ``split_factor`` salted copies,
    repartitioned on (group, salt), and copy s enumerates only the
    pairs whose LEFT index i satisfies i % split_factor == s — the
    same pair set, partitioned by left index, each pair exactly once.
    This trades one extra shuffle of the (bounded) member arrays for
    P-way parallelism inside skewed blocks; leave it None (default)
    for cheap pair functions, where the single-task block is fine and
    the extra shuffle is pure overhead. Enable it when the per-pair
    work is expensive (e.g. edit distance), where a handful of capped
    hot blocks otherwise become multi-minute straggler tasks.
    """
    grouped = (
        df.groupBy(*group_cols)
        .agg(F.collect_list(member).alias("__m"))
        .filter(F.size("__m") > 1)
    )
    if max_block is not None:
        # Sort before slicing: collect_list order is nondeterministic,
        # array_sort makes the kept top-N (and thus the output) stable.
        grouped = grouped.withColumn(
            "__m",
            F.when(
                F.size("__m") > max_block,
                F.slice(F.array_sort("__m"), 1, max_block),
            ).otherwise(F.col("__m")),
        )
    arr = F.col("__m")
    tail_len = lambda i: F.greatest(F.size(arr) - i - F.lit(1), F.lit(0))  # noqa: E731
    if split_factor is not None and split_factor > 1:
        salts = F.array(*[F.lit(i) for i in range(split_factor)])
        grouped = grouped.withColumn(
            "__salt",
            F.explode(
                F.when(F.size("__m") > split_threshold, salts).otherwise(
                    F.array(F.lit(0))
                )
            ),
        ).repartition(*group_cols, "__salt")
        stripe_ok = lambda i: (  # noqa: E731
            F.size(arr) <= F.lit(split_threshold)
        ) | (i % F.lit(split_factor) == F.col("__salt"))
        tail = lambda i: F.when(stripe_ok(i), tail_len(i)).otherwise(F.lit(0))  # noqa: E731
    else:
        tail = tail_len
    pair_lists = F.transform(
        arr,
        lambda x, i: F.transform(
            F.slice(arr, i + F.lit(2), tail(i)), lambda y: pair_fn(x, y)
        ),
    )
    flat = F.flatten(pair_lists)
    if keep is not None:
        flat = F.filter(flat, keep)
    return grouped.select(F.explode(flat).alias("__p")).select("__p.*")

"""Distribution-drift detection: Population Stability Index between an
expected (training/reference) and actual (serving/incoming) sample of a
numeric column — the standard monitoring statistic for "has this
feature's distribution moved since we trained on it".

PSI = sum over buckets of (p_e - p_a) * ln(p_e / p_a), buckets taken as
the EXPECTED side's quantile bands (so expected occupancy is ~uniform
by construction and the statistic reacts to where the actual sample
piles up). Rules of thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25 act.

Plan shape: one exact-percentile aggregate over the expected side (the
breakpoints — a 1-row broadcast), then ONE partial-aggregated pass per
side counting bucket occupancy; the PSI fold happens on n_buckets rows.
Nothing driver-side except the k-edge breakpoint row, the same pattern
as the IVF centroid broadcast.

The pieces are exposed separately (`quantile_edges`, `bucket_counts`,
`psi_from_counts`) because the ACTUAL side is often a STREAM: a
Structured Streaming micro-batch pipeline counts buckets against the
static broadcast edge row (stream-static join), and the PSI fold runs
downstream on the tiny counts table — see the
`evt_stream_psi_drift_now` gate query.

Cross-engine exactness: proportions are exact integer ratios; the only
libm call is ln, rounded to 6 dp per the engine-wide convention, so the
DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_edges(
    expected: DataFrame, value_col: str, n_buckets: int = 10
) -> DataFrame:
    """1-row frame of the expected side's exact interior quantile edges
    (columns __e0..__e{n-2}) — the broadcastable band definition."""
    v = F.col(value_col).cast("double")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    return expected.agg(
        *[F.percentile(v, p).alias(f"__e{i}") for i, p in enumerate(probs)]
    )


def bucket_expr(value_col: str, n_buckets: int):
    """bucket = number of edges <= value: one scalar fold over the edge
    array (no CASE ladder to keep in sync), usable in batch AND
    streaming projections after a (broadcast) join with the edge row.

    NULL contract: a NULL value (every ``v >= e`` is NULL, each when()
    falls to 0) lands in bucket 0 — callers monitoring a column that can
    go NULL should pre-filter (or monitor nullness as its own metric);
    kept this way because the gate oracle replicates the identical CASE
    algebra on both engines."""
    v = F.col(value_col).cast("double")
    edge_arr = F.array(*[F.col(f"__e{i}") for i in range(n_buckets - 1)])
    return F.aggregate(
        edge_arr, F.lit(0), lambda acc, e: acc + F.when(v >= e, 1).otherwise(0)
    )


def bucket_counts(
    df: DataFrame, value_col: str, edges: DataFrame, n_buckets: int, out: str
) -> DataFrame:
    """(bucket, count) occupancy of one side — a single partial-agg
    pass after the 1-row edge broadcast."""
    return (
        df.crossJoin(F.broadcast(edges))
        .select(bucket_expr(value_col, n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(out))
    )


def psi_from_counts(
    e_cnt: DataFrame,
    a_cnt: DataFrame,
    n_expected: int,
    n_actual: int,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Fold (bucket, n_expected) x (bucket, n_actual) into per-bucket
    PSI contributions over the dense 0..n_buckets-1 range (empty
    buckets surface as zero counts, floored at ``eps`` so they
    contribute a large-but-finite term instead of +-inf)."""
    spark = e_cnt.sparkSession
    full = (
        spark.range(n_buckets)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(e_cnt, "bucket", "left")
        .join(a_cnt, "bucket", "left")
        .na.fill({"n_expected": 0, "n_actual": 0})
    )
    p_e = F.greatest(F.col("n_expected") / F.lit(float(n_expected)), F.lit(eps))
    p_a = F.greatest(F.col("n_actual") / F.lit(float(n_actual)), F.lit(eps))
    contrib = F.round((p_e - p_a) * F.round(F.log(p_e / p_a), 6), 6)
    return full.select(
        "bucket",
        F.col("n_expected").cast("bigint").alias("n_expected"),
        F.col("n_actual").cast("bigint").alias("n_actual"),
        contrib.alias("psi_contrib"),
    )


def psi_report(
    expected: DataFrame,
    actual: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-bucket PSI contributions. Returns one row per bucket:
    (bucket int, n_expected, n_actual, psi_contrib double) — total PSI
    is their sum; emitting the per-bucket terms keeps the report
    actionable (WHICH band moved), and summing 6-dp-rounded terms stays
    engine-exact where a rounded sum of unrounded terms would not."""
    edges = quantile_edges(expected, value_col, n_buckets)
    e_cnt = bucket_counts(expected, value_col, edges, n_buckets, "n_expected")
    a_cnt = bucket_counts(actual, value_col, edges, n_buckets, "n_actual")
    return psi_from_counts(
        e_cnt, a_cnt, expected.count(), actual.count(), n_buckets, eps
    )

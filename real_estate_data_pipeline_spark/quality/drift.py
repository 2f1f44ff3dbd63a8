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

Cross-engine exactness: proportions are exact integer ratios; the only
libm call is ln, rounded to 6 dp per the engine-wide convention, so the
DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    engine-exact where a rounded sum of unrounded terms would not.

    ``eps`` floors both proportions so an empty bucket contributes a
    large-but-finite term instead of +-inf (the standard PSI guard)."""
    v = F.col(value_col).cast("double")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = expected.agg(
        *[F.percentile(v, p).alias(f"__e{i}") for i, p in enumerate(probs)]
    )
    edge_cols = [F.col(f"__e{i}") for i in range(len(probs))]
    edge_arr = F.array(*edge_cols)

    def bucketed(df: DataFrame, out: str) -> DataFrame:
        # bucket = number of edges <= value: one scalar fold, no CASE
        # ladder to keep in sync with the edge count
        b = F.aggregate(
            edge_arr,
            F.lit(0),
            lambda acc, e: acc + F.when(v >= e, 1).otherwise(0),
        )
        return (
            df.crossJoin(F.broadcast(edges_row))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    e_cnt = bucketed(expected, "n_expected")
    a_cnt = bucketed(actual, "n_actual")
    n_e = expected.count()
    n_a = actual.count()
    full = (
        expected.sparkSession.range(n_buckets)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(e_cnt, "bucket", "left")
        .join(a_cnt, "bucket", "left")
        .na.fill({"n_expected": 0, "n_actual": 0})
    )
    p_e = F.greatest(F.col("n_expected") / F.lit(float(n_e)), F.lit(eps))
    p_a = F.greatest(F.col("n_actual") / F.lit(float(n_a)), F.lit(eps))
    contrib = F.round((p_e - p_a) * F.round(F.log(p_e / p_a), 6), 6)
    return full.select(
        "bucket",
        F.col("n_expected").cast("bigint").alias("n_expected"),
        F.col("n_actual").cast("bigint").alias("n_actual"),
        contrib.alias("psi_contrib"),
    )

"""Quarantine rules — route bad rows to a side table instead of
dropping them.

The reference DECLARES a quarantine-rule config
(/root/reference/data_processing/schema_config.py:380-401
``QUARANTINE_RULES``) but enforces only the critical-fields rule via the
validation split (P2); the rest is dead config. This module makes the
family real: ordered (name, predicate) rules, first match wins, one
``when`` chain evaluated in a single pass — the quarantined frame keeps
every source column plus the reason, so rows are re-processable after a
rule fix (the point of quarantining over dropping).

Scale shape: tagging is a map-side projection (no shuffle, no second
scan); writing clean/quarantined to separate sinks costs one pass each
over an already-tagged cached frame, or use ``partitionBy(reason)`` on
one sink to get per-reason directories for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REASON_COL = "quarantine_reason"


def tag_quarantine(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Add ``quarantine_reason``: the name of the FIRST matching rule,
    null for clean rows. Rule order is the priority order."""
    if not rules:
        return df.withColumn(REASON_COL, F.lit(None).cast("string"))
    expr = None
    for name, cond in rules:
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(REASON_COL, expr.otherwise(F.lit(None).cast("string")))


def quarantine_split(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — quarantined carries ``quarantine_reason``.
    Tag once; both returned frames filter the same tagged projection, so
    Spark computes the rule chain per row once per materialized sink."""
    tagged = tag_quarantine(df, rules)
    clean = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    quarantined = tagged.filter(F.col(REASON_COL).isNotNull())
    return clean, quarantined


def quarantine_report(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Per-reason row counts (clean rows under reason 'clean') — the
    monitoring rollup: one aggregate over the tagged frame."""
    tagged = tag_quarantine(df, rules)
    return (
        tagged.groupBy(
            F.coalesce(F.col(REASON_COL), F.lit("clean")).alias(REASON_COL)
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )

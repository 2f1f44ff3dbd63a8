"""PySpark-native analytics engine with the query and data-processing
capabilities of giabaovo/real-estate-data-pipeline, re-expressed Spark-first.

The reference (at /root/reference, read-only) is a Medallion-architecture
batch ETL over real-estate listings: Bronze JSONL -> Silver (standardize,
validate, dedup, SCD2) -> Gold (ML features). This package rebuilds those
semantics as a composable, configuration-driven PySpark library, plus the
large-scale training-data operators (dedup families, similarity search,
text analysis, multimodal plumbing) the reference lacks.

Design stance (SURVEY.md §7): DataFrame/SQL declarative plans, Catalyst
does the optimizing; decimal-exact aggregation where cross-engine parity
matters; broadcast joins for dims; single-pass multi-aggregate quality
checks; no row-at-a-time Python UDFs in hot paths.
"""

__version__ = "0.1.0"

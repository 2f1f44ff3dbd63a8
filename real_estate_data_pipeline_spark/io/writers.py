"""Writers — S4 append, S5 partitioned overwrite (parquet locally; the
same calls work against Delta by swapping the format, which is how the
reference writes: silver_etl_script.py:947-961, gold_ml_etl.py:459-464).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
    dynamic_overwrite: bool = True,
) -> None:
    """zstd by default: ~30% smaller than snappy at similar scan speed —
    at 100 TB that is tens of TB of storage and IO.

    ``dynamic_overwrite`` (the default, matching Delta's ``replaceWhere``
    intent): a partitioned ``mode='overwrite'`` rewrites ONLY the
    partitions present in ``df``. Without it Spark's static mode drops
    every other partition of the table first — on a 100 TB table a
    one-day re-run would silently delete years of history."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
        if mode == "overwrite" and dynamic_overwrite:
            w = w.option("partitionOverwriteMode", "dynamic")
    w.parquet(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Format-agnostic sink (parquet / orc / json / csv), the write-side
    mirror of ``readers.read_any``. Columnar formats get zstd unless the
    caller overrides; partitioned overwrites are dynamic (see
    :func:`write_parquet`)."""
    fmt = fmt.lower()
    w = df.write.format(fmt).mode(mode)
    if fmt in ("parquet", "orc"):
        w = w.option("compression", options.pop("compression", "zstd"))
    if fmt == "csv":
        w = w.option("header", options.pop("header", "true"))
    if partition_by:
        w = w.partitionBy(*partition_by)
        if mode == "overwrite":
            w = w.option("partitionOverwriteMode", "dynamic")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)

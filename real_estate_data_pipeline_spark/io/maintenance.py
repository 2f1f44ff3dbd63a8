"""Table maintenance — the reference's S7 OPTIMIZE ZORDER / VACUUM
(silver_etl_script.py:979-988) without Delta:

- ``compact``: rewrite a parquet table into sized files, sorted by the
  clustering keys (the data-layout effect of Z-ORDER for one key prefix:
  min/max stats become selective, so scan-level skipping works);
- ``vacuum_snapshots``: drop superseded Scd2Table snapshot versions,
  keeping the newest N (VACUUM's retention semantics).

On Delta/Iceberg these become one-line SQL calls; the interface stays.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def compact(
    spark: SparkSession,
    path: str,
    cluster_by: list[str],
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``path`` sorted by ``cluster_by`` into size-targeted files.
    Returns the resulting file count. Sorting by the cluster keys gives
    parquet row-group min/max stats their selectivity (data skipping)."""
    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, total_bytes // (target_file_mb * 1024 * 1024))
    tmp = path.rstrip("/") + "_compacting"
    df.repartitionByRange(int(n_files), *cluster_by).sortWithinPartitions(
        *cluster_by
    ).write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + "_old"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return int(n_files)


def vacuum_snapshots(table_path: str, keep: int = 2) -> list[str]:
    """Remove old ``_v<N>`` snapshot dirs of an Scd2Table, keeping the
    current one plus ``keep-1`` predecessors. Returns removed dirs."""
    marker = os.path.join(table_path, "_CURRENT")
    if not os.path.exists(marker):
        return []
    with open(marker) as fh:
        current = int(fh.read().strip())
    removed = []
    for entry in sorted(os.listdir(table_path)):
        if entry.startswith("_v"):
            v = int(entry[2:])
            if v <= current - keep:
                shutil.rmtree(os.path.join(table_path, entry))
                removed.append(entry)
    return removed

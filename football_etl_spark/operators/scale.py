"""Partitioning/scale utilities shared by operators."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Inputs bigger than this are already split into plenty of scan tasks
# by spark.sql.files.maxPartitionBytes; only compact inputs need help.
_SMALL_INPUT_BYTES = 256 * 1024 * 1024


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Compact dimension tables (one small parquet file → one
    partition) serialize CPU-heavy per-row work — shingling, K-way
    hashing, vector math — onto a single core. Round-robin
    repartition restores parallelism; on big (many-file) inputs this
    is a no-op.

    The smallness check uses file metadata only (no RDD translation,
    no job): if the source files are few and small, repartition."""
    if min_parts is None:
        min_parts = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        # non-file source (literal/derived frames): cheap to repartition
        return df.repartition(min_parts)
    if len(files) >= min_parts:
        return df
    total = 0
    for f in files:
        path = f.removeprefix("file:")
        try:
            total += os.path.getsize(path)
        except OSError:
            return df  # remote FS — trust maxPartitionBytes splitting
    if total < _SMALL_INPUT_BYTES:
        return df.repartition(min_parts)
    return df

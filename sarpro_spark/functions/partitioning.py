"""Partitioning helpers: widen narrow scans without touching the RDD API.

``df.rdd.getNumPartitions()`` forces a DataFrame->RDD plan conversion on every
call (non-free on wide plans, and it pins the plan shape before AQE). The
scan-split heuristic here stays at the catalog level: ``df.inputFiles()``
lists the files feeding the plan's scans without executing or converting
anything. A small parquet table is typically ONE file == one input split ==
one task, which serializes every downstream explode/hash; a 100 TB corpus
already arrives in thousands of splits and must NOT be repartitioned (that
would add a corpus-wide shuffle and cap parallelism at defaultParallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_if_narrow(
    df: DataFrame, key_col: str, min_parallelism: int | None = None
) -> DataFrame:
    """Repartition ``df`` by ``key_col`` only when its file-split count is
    below ``min_parallelism`` (default: the cluster's defaultParallelism).

    Heuristic, deliberately conservative: when the frame is not file-backed
    (``inputFiles()`` empty — in-memory test frames, post-shuffle stages) the
    upstream op that produced it already chose a parallelism, so leave it
    alone.
    """
    par = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — non-file plans: leave as-is
        return df
    if 0 < n_files < par:
        return df.repartition(par, key_col)
    return df

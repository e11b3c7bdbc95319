"""Dataset maintenance: small-file compaction.

The 100 TB operational reality the query layer sits on: streaming ingest
and fine-grained partitioned writes leave datasets as millions of KB-scale
files, and scan throughput collapses under per-file open/footer overhead
(a 128 MB-target scan over 4 KB files is ~30k opens per split's worth of
data). Compaction rewrites a dataset into evenly-sized files without
changing its rows.

Spark-first shape: ONE pass — `repartitionByRange` on the caller's sort
key lays rows out contiguously (range partitioning gives files min/max
spans that downstream predicate pushdown can actually prune), and
`maxRecordsPerFile` bounds file size without a second shuffle. No driver
loops, no per-file logic; the whole rewrite is a single distributed job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(
    spark: SparkSession,
    in_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Inspect a parquet dataset and return the compaction plan: current
    file count/size stats and the target file count. Metadata-only (reads
    the file listing, not the data)."""
    df = spark.read.parquet(in_dir)
    files = df.inputFiles()
    sizes = []
    for f in files:
        p = f.removeprefix("file:")
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            continue
    total = sum(sizes)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "avg_file_bytes": total // max(len(sizes), 1),
        "small_files": sum(1 for s in sizes if s < target_file_bytes // 4),
        "target_files": max(1, -(-total // target_file_bytes)),
    }


def compact(
    df: DataFrame,
    out_dir: str,
    sort_col: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    approx_row_bytes: int | None = None,
) -> dict:
    """Rewrite ``df`` to ``out_dir`` as ~``target_file_bytes`` parquet files
    range-laid-out on ``sort_col``. Returns {files_written, rows}.

    ``approx_row_bytes``: average in-file bytes per row; when omitted it is
    estimated from a 1000-row sample written through the same codec path
    (a tiny bounded job, not a full pass)."""
    spark = df.sparkSession
    rows = df.count()
    if rows == 0:
        df.write.mode("overwrite").parquet(out_dir)
        return {"files_written": 0, "rows": 0}
    if approx_row_bytes is None:
        import tempfile

        probe_dir = tempfile.mkdtemp(prefix="compact_probe_")
        probe_n = min(rows, 1000)
        df.limit(probe_n).coalesce(1).write.mode("overwrite").parquet(probe_dir)
        pb = sum(
            os.path.getsize(os.path.join(probe_dir, f))
            for f in os.listdir(probe_dir)
            if f.endswith(".parquet")
        )
        # parquet's footer/dict overhead is amortized worse in the tiny
        # probe than in real files; the /2 biases toward larger files
        # rather than re-fragmenting
        approx_row_bytes = max(1, pb // probe_n // 2)
    rows_per_file = max(1, target_file_bytes // approx_row_bytes)
    n_files = max(1, -(-rows // rows_per_file))
    (
        df.repartitionByRange(n_files, sort_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(out_dir)
    )
    written = len(spark.read.parquet(out_dir).inputFiles())
    return {"files_written": written, "rows": rows}

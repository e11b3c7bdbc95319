"""S5 downsample-on-read, re-expressed as pyramid storage + partition pruning.

The reference never materializes a full-resolution raster when the requested
output is smaller: GDAL's decimated read returns the reduced grid directly
(sentinel1.rs:1074-1108, "up to ~10x for small targets"). Spark's analog is a
*pyramid table*: the band frame written once per level (level L = 2^L x
box-reduced), parquet-partitioned by ``level``. A reader that asks for a
target size touches ONLY the matching level's files — partition pruning makes
the pushdown visible in the plan (`PartitionFilters: [isnotnull(level),
(level = N)]`), the exact analog of "never read what you won't keep".

Level selection mirrors the reference's: the coarsest level whose long side
still covers the target (>= target), falling back to level 0; the Average-vs-
Lanczos choice for the residual resize follows the >=4x rule
(sentinel1.rs:1090-1102).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sarpro_spark.operators.geometry import box_resize


def build_pyramid(
    px: DataFrame, group_cols: list[str], levels: int = 3, value: str = "v"
) -> DataFrame:
    """Level 0 = native; level L = 2x box-reduction of level L-1 (so 2^L
    overall). Returns the union with a ``level`` column; write it
    ``partitionBy('level', ...)`` so scans prune."""
    out = px.withColumn("level", F.lit(0)).withColumn("n_src", F.lit(1).cast("long"))
    cur = px
    for lv in range(1, levels):
        cur = box_resize(cur, group_cols, k=2, value=value)
        out = out.unionByName(cur.withColumn("level", F.lit(lv)))
    return out


def write_pyramid(
    pyramid: DataFrame, path: str, group_cols: list[str], mode: str = "overwrite"
) -> None:
    pyramid.write.mode(mode).partitionBy("level", *group_cols).parquet(path)


def select_level(native_long_side: int, target_size: int | None, levels: int) -> int:
    """Coarsest level still covering the target (reference: decimated read
    picks the reduction that lands at/above the output size)."""
    if target_size is None or target_size >= native_long_side:
        return 0
    best = 0
    for lv in range(levels):
        if native_long_side // (2**lv) >= target_size:
            best = lv
        else:
            break
    return best


def residual_resample_alg(level_long_side: int, target_size: int) -> str:
    """Average for >=4x residual reduction, Lanczos otherwise
    (sentinel1.rs:1090-1102)."""
    return "average" if level_long_side >= 4 * target_size else "lanczos3"


def read_pyramid_level(
    spark: SparkSession, path: str, native_long_side: int, target_size: int | None, levels: int = 3
) -> DataFrame:
    """Scan with a level predicate — partition pruning keeps all other levels'
    files untouched (check `.explain()` for PartitionFilters)."""
    lv = select_level(native_long_side, target_size, levels)
    return spark.read.parquet(path).where(F.col("level") == lv)

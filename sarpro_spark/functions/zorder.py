"""Z-order (Morton) multi-dimensional data layout.

Bucketing (queries_relational.py q_bucketed_colocated_join) answers the
JOIN-layout question at 100 TB; Z-ordering answers the RANGE-layout one:
a fact table filtered by two dimensions at once (customer x date, user x
time, lat x lon) cannot be sorted to favor both — lexicographic order
makes one dimension contiguous and shatters the other.  Interleaving the
quantized bits of both dimensions (the Morton curve) gives every file a
roughly square bounding box, so a 2-D box predicate prunes in BOTH
dimensions: with 64 files and a quarter-range predicate per dimension, a
Z-ordered layout touches ~4 tiles where an x-sorted layout scans all 16
x-slices that intersect the x range.

Spark-first shape: the curve value is a pure bitwise column expression
(codegen; 2*bits OR-shift terms, no UDF), the production writer is
``repartitionByRange(z) + sortWithinPartitions(z)`` — one shuffle at
write time buys file-level min/max pruning for every later query, the
same write-once/prune-forever economics as bucketing.  The certificate
query assigns files by the TOP BITS of z (a fixed 2^k-tile grid) instead
of repartitionByRange's sampled quantiles so the DuckDB twin is exact;
the writer's sampled variant balances row counts and is asserted in
tests (disjoint per-file z ranges, box query touches a strict subset of
files).

Quantization uses min/max scaling to ``bits`` fixed-point levels —
IDENTICAL double arithmetic on both engines (one FLOOR, one multiply,
one divide, same order), the fround doctrine applied to coordinates.

Reference analog: none (bogwi/sarpro is a raster engine); this extends
the engine's layout toolkit per the build brief.  Public design: the
Morton curve is textbook (Morton 1966); Delta/Iceberg OPTIMIZE ZORDER is
the industrial precedent.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def quantize_expr(col: Column, cmin: Column, cmax: Column, bits: int = DEFAULT_BITS) -> Column:
    """Fixed-point quantization to [0, 2^bits - 1]; identical op order to
    :func:`sql_quantize` so both engines round the same doubles."""
    levels = float((1 << bits) - 1)
    span = F.greatest((cmax - cmin).cast("double"), F.lit(1.0))
    return F.floor((col.cast("double") - cmin.cast("double")) * levels / span + F.lit(0.5)).cast("bigint")


def sql_quantize(expr: str, emin: str, emax: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB twin of :func:`quantize_expr`."""
    levels = f"{float((1 << bits) - 1):.1f}"
    return (
        f"CAST(FLOOR((CAST({expr} AS DOUBLE) - CAST({emin} AS DOUBLE)) * {levels} "
        f"/ GREATEST(CAST({emax} AS DOUBLE) - CAST({emin} AS DOUBLE), 1.0) + 0.5) AS BIGINT)"
    )


def interleave_bits_expr(qx: Column, qy: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of two quantized columns: x bits at odd positions,
    y at even.  2*bits shift/AND/OR terms, all codegen."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def sql_interleave_bits(qx: str, qy: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB twin of :func:`interleave_bits_expr` (same term order)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({qx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({qy} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def zorder_value(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Attach qx/qy/zval columns.  Min/max come from ONE aggregate row
    broadcast back (never a window): two jobs total, both scan-parallel."""
    mm = df.agg(
        F.min(x_col).alias("_xmin"),
        F.max(x_col).alias("_xmax"),
        F.min(y_col).alias("_ymin"),
        F.max(y_col).alias("_ymax"),
    )
    j = df.crossJoin(F.broadcast(mm))
    qx = quantize_expr(F.col(x_col), F.col("_xmin"), F.col("_xmax"), bits)
    qy = quantize_expr(F.col(y_col), F.col("_ymin"), F.col("_ymax"), bits)
    return (
        j.withColumn("qx", qx)
        .withColumn("qy", qy)
        .withColumn("zval", interleave_bits_expr(F.col("qx"), F.col("qy"), bits))
        .drop("_xmin", "_xmax", "_ymin", "_ymax")
    )


def write_zordered(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    n_files: int = 64,
    bits: int = DEFAULT_BITS,
) -> None:
    """Production Z-ordered write: range-partition on the curve value
    (sampled quantiles balance row counts across files), sort within each
    file so parquet page/row-group min-max stats are tight, drop the
    helper columns.  One shuffle at write time; every later 2-D range
    query prunes files by footer stats."""
    z = zorder_value(df, x_col, y_col, bits)
    (
        z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("qx", "qy", "zval")
        .write.mode("overwrite")
        .parquet(path)
    )

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


def hilbert_value(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Attach qx/qy/hval: the Hilbert-curve index of the quantized point.

    The Hilbert curve improves on Morton exactly where file layout cares:
    successive curve positions are ALWAYS grid neighbors (Morton jumps at
    quadrant seams), so equal-count file cuts get tighter bounding boxes.
    Standard iterative xy->d transform (the public-domain rot/flip
    formulation), unrolled to ``bits`` levels of pure integer column
    arithmetic — no UDF; each level is a projection, all codegen.  Same
    broadcast min/max quantization as :func:`zorder_value`.
    """
    mm = df.agg(
        F.min(x_col).alias("_xmin"),
        F.max(x_col).alias("_xmax"),
        F.min(y_col).alias("_ymin"),
        F.max(y_col).alias("_ymax"),
    )
    j = df.crossJoin(F.broadcast(mm))
    out = (
        j.withColumn("qx", quantize_expr(F.col(x_col), F.col("_xmin"), F.col("_xmax"), bits))
        .withColumn("qy", quantize_expr(F.col(y_col), F.col("_ymin"), F.col("_ymax"), bits))
        .drop("_xmin", "_xmax", "_ymin", "_ymax")
        .withColumn("_hx", F.col("qx"))
        .withColumn("_hy", F.col("qy"))
        .withColumn("hval", F.lit(0).cast("bigint"))
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        out = (
            out.withColumn("_rx", rx)
            .withColumn("_ry", ry)
            .withColumn(
                "hval",
                F.col("hval")
                + F.lit(s).cast("bigint") * F.lit(s) * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")),
            )
        )
        # rotate the quadrant: only when ry == 0
        flip = (F.col("_ry") == 0) & (F.col("_rx") == 1)
        nx = F.when(flip, F.lit(s - 1) - F.col("_hx")).otherwise(F.col("_hx"))
        ny = F.when(flip, F.lit(s - 1) - F.col("_hy")).otherwise(F.col("_hy"))
        out = out.withColumn("_nx", nx).withColumn("_ny", ny).select(
            *[c for c in out.columns if c not in ("_hx", "_hy", "_nx", "_ny")],
            F.when(F.col("_ry") == 0, F.col("_ny")).otherwise(F.col("_nx")).alias("_hx"),
            F.when(F.col("_ry") == 0, F.col("_nx")).otherwise(F.col("_ny")).alias("_hy"),
        )
    return out.drop("_hx", "_hy", "_rx", "_ry")


def sql_hilbert_steps(base_cte: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB twin of :func:`hilbert_value`'s unrolled transform.

    ``base_cte`` must expose (qx, qy, ...) plus any passthrough columns;
    emits chained CTEs ``hstep{level}`` ending in ``hfinal`` with hval.
    Passthrough: qx, qy only (callers re-join wider payloads if needed).
    """
    prev = base_cte
    parts = []
    for i, level in enumerate(range(bits - 1, -1, -1)):
        s = 1 << level
        src_x = "qx" if i == 0 else "_hx"
        src_y = "qy" if i == 0 else "_hy"
        prev_d = "CAST(0 AS BIGINT)" if i == 0 else "hval"
        parts.append(f"""
hstep{level} AS (
  SELECT qx, qy,
    {prev_d} + CAST({s} AS BIGINT) * {s} *
      CAST(xor(3 * (CASE WHEN ({src_x} & {s}) > 0 THEN 1 ELSE 0 END),
               (CASE WHEN ({src_y} & {s}) > 0 THEN 1 ELSE 0 END)) AS BIGINT) AS hval,
    CASE WHEN (CASE WHEN ({src_y} & {s}) > 0 THEN 1 ELSE 0 END) = 0
         THEN (CASE WHEN (CASE WHEN ({src_x} & {s}) > 0 THEN 1 ELSE 0 END) = 1
                    THEN {s - 1} - {src_y} ELSE {src_y} END)
         ELSE {src_x} END AS _hx,
    CASE WHEN (CASE WHEN ({src_y} & {s}) > 0 THEN 1 ELSE 0 END) = 0
         THEN (CASE WHEN (CASE WHEN ({src_x} & {s}) > 0 THEN 1 ELSE 0 END) = 1
                    THEN {s - 1} - {src_x} ELSE {src_x} END)
         ELSE {src_y} END AS _hy
  FROM {prev}
)""".strip())
        prev = f"hstep{level}"
    parts.append(f"hfinal AS (SELECT qx, qy, hval FROM {prev})")
    return ",\n".join(parts)

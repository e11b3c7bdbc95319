"""Raster-analog queries: the reference's operators exercised over the
synthetic band frame so DuckDB can verify them (SURVEY §2.3/§2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sarpro_spark import frames
from sarpro_spark.frames import PX_CTE
from sarpro_spark.operators import autoscale as asc
from sarpro_spark.operators import elementwise as ew
from sarpro_spark.operators import stats as st
from sarpro_spark.queries import query, round_floats, sql_fround
from sarpro_spark.types import (
    DB_VALID_THRESHOLD,
    EPS_INTENSITY,
    AutoscaleStrategy,
    BitDepth,
    PolarizationOperation,
)


# --- E1-E5: polarization math -------------------------------------------------

# No rounding: +,-,/ on identical double inputs are bit-exact IEEE-754 in both
# engines, so raw values hash-match.
_BAND_MATH_SQL = f"""
WITH {PX_CTE}
SELECT product_id, row, col,
  vv + vh AS op_sum,
  vv - vh AS op_diff,
  CASE WHEN ABS(vh) > {EPS_INTENSITY!r} THEN vv / vh ELSE 0.0 END AS op_ratio,
  CASE WHEN ABS(vv + vh) > {EPS_INTENSITY!r} THEN (vv - vh) / (vv + vh) ELSE 0.0 END AS op_ndiff,
  CASE WHEN ABS(vh) > {EPS_INTENSITY!r} THEN vv / vh ELSE 0.0 END AS op_logratio
FROM px
""".strip()


@query("band_math_ops", sql=_BAND_MATH_SQL, tags=("raster", "elementwise"))
def q_band_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-E5 (ops.rs): sum/diff/ratio/n-diff/log-ratio with eps guards,
    as pure column expressions (single scan, no shuffle beyond the
    grid-derivation window)."""
    px = frames.band_frame(spark, sf_dir)
    a, b = F.col("vv"), F.col("vh")
    out = px.select(
        "product_id",
        "row",
        "col",
        ew.op_sum(a, b).alias("op_sum"),
        ew.op_diff(a, b).alias("op_diff"),
        ew.op_ratio(a, b).alias("op_ratio"),
        ew.op_n_diff(a, b).alias("op_ndiff"),
        ew.op_log_ratio(a, b).alias("op_logratio"),
    )
    return out


# --- E1-E5 via explicit band zip (exercises the join path) -------------------

_BAND_ZIP_SQL = f"""
WITH {PX_CTE},
a AS (SELECT product_id, row, col, vv AS v FROM px),
b AS (SELECT product_id, row, col, vh AS v FROM px)
SELECT a.product_id, a.row, a.col,
  CASE WHEN ABS(a.v + b.v) > {EPS_INTENSITY!r} THEN (a.v - b.v) / (a.v + b.v) ELSE 0.0 END AS v
FROM a JOIN b USING (product_id, row, col)
""".strip()


@query("band_zip_ndiff", sql=_BAND_ZIP_SQL, tags=("raster", "join"))
def q_band_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's pixel-aligned band zip as a real equi-join on
    (product_id,row,col) — the shape used when bands arrive from separate
    scans; co-partitioned at scale so the join is shuffle-local."""
    a = frames.single_band(spark, sf_dir, "vv")
    b = frames.single_band(spark, sf_dir, "vh")
    return ew.zip_bands(a, b, PolarizationOperation.N_DIFF)


# --- E6 + P2: dB conversion + validity mask ----------------------------------

# log10 differs by last-ulp across libm implementations -> fround both sides.
_DB_MASK_SQL = f"""
WITH {PX_CTE}
SELECT product_id, row, col,
  {sql_fround(f"10.0 * LOG10(GREATEST(vv, {EPS_INTENSITY!r}))")} AS db_vv,
  (10.0 * LOG10(GREATEST(vv, {EPS_INTENSITY!r})) > {DB_VALID_THRESHOLD!r}) AS valid_vv,
  {sql_fround(f"10.0 * LOG10(GREATEST(vh, {EPS_INTENSITY!r}))")} AS db_vh,
  (10.0 * LOG10(GREATEST(vh, {EPS_INTENSITY!r})) > {DB_VALID_THRESHOLD!r}) AS valid_vh
FROM px
""".strip()


@query("db_conversion_mask", sql=_DB_MASK_SQL, tags=("raster", "elementwise"))
def q_db_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6+P2 (pipeline.rs:8-40): db = 10*log10(max(v,1e-10)), valid = db > -50.
    Mask is a column, not a filter — invalid pixels stay (stats exclude them,
    output forces them to 0)."""
    px = frames.band_frame(spark, sf_dir)
    out = px.select(
        "product_id",
        "row",
        "col",
        ew.to_db(F.col("vv")).alias("db_vv"),
        ew.valid_mask(ew.to_db(F.col("vv"))).alias("valid_vv"),
        ew.to_db(F.col("vh")).alias("db_vh"),
        ew.valid_mask(ew.to_db(F.col("vh"))).alias("valid_vh"),
    )
    return round_floats(out)


# --- A1: histogram statistics ------------------------------------------------

_SRC_CTE = f"""{PX_CTE},
src AS (
  SELECT product_id, band,
         10.0 * LOG10(GREATEST(v, {EPS_INTENSITY!r})) AS db,
         (10.0 * LOG10(GREATEST(v, {EPS_INTENSITY!r})) > {DB_VALID_THRESHOLD!r}) AS valid
  FROM (
    SELECT product_id, 'vv' AS band, row, col, vv AS v FROM px
    UNION ALL
    SELECT product_id, 'vh' AS band, row, col, vh AS v FROM px
  ) u
)"""

_HIST_STATS_SQL = st.oracle_histogram_stats_sql(
    _SRC_CTE, ["product_id", "band"], value="db", valid="valid"
)


@query("histogram_stats", sql=_HIST_STATS_SQL, tags=("raster", "agg"))
def q_hist_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (autoscale.rs:35-160): per (product,band) count/min/max/mean/std +
    4096-bin histogram CDF-inversion percentiles — two shuffles, both with
    map-side combine; extents broadcast back for bucketing."""
    long = frames.band_long(spark, sf_dir)
    df = ew.with_db_mask(long)
    out = st.histogram_stats(df, ["product_id", "band"], value="db", valid="valid")
    return round_floats(out)


# --- A2/A3/A6/A7: autoscale strategies ---------------------------------------

# single-band (vv) pixel source in the dB domain, grouped per product
_VV_SRC_CTE = f"""{PX_CTE},
src AS (
  SELECT product_id, row, col,
         10.0 * LOG10(GREATEST(vv, {EPS_INTENSITY!r})) AS db,
         (10.0 * LOG10(GREATEST(vv, {EPS_INTENSITY!r})) > {DB_VALID_THRESHOLD!r}) AS valid
  FROM px
)"""

_KEYS = ["product_id", "row", "col"]


def _vv_px(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ew.with_db_mask(frames.single_band(spark, sf_dir, "vv"))


def _autoscale_query(strategy_label: str, strategy, bit_depth: BitDepth):
    sql = asc.oracle_autoscale_sql(
        _VV_SRC_CTE, ["product_id"], _KEYS, strategy, bit_depth
    )
    suffix = "u8" if bit_depth == BitDepth.U8 else "u16"
    name = f"autoscale_{strategy_label}_{suffix}"

    @query(name, sql=sql, tags=("raster", "autoscale"))
    def _q(spark: SparkSession, sf_dir: str, _strategy=strategy, _bd=bit_depth) -> DataFrame:
        px = _vv_px(spark, sf_dir)
        if _strategy == "standard-a2":
            stats = st.histogram_stats(px, ["product_id"])
            params = asc.params_standard(stats, ["product_id"])
            if _bd == BitDepth.U16:
                out = asc.apply_params(px, params, ["product_id"], BitDepth.U16)
            else:
                q16 = asc.apply_params(px, params, ["product_id"], BitDepth.U8, out="_q16")
                out = asc.scale_u16_to_u8(q16, ["product_id"], value="_q16", out="q").drop("_q16")
        else:
            out = asc.autoscale_to_bitdepth(px, ["product_id"], _strategy, _bd)
        return out.select("product_id", "row", "col", "q")

    _q.__doc__ = (
        f"A2/A3 autoscale ({strategy_label}, {suffix}): agg -> broadcast clip "
        f"params -> fused quantize projection (autoscale.rs)."
    )
    return _q


# A2 heuristic (the reference's Standard route), both bit depths — the U8
# path exercises the A6 double-quantization quirk.
_autoscale_query("standard", "standard-a2", BitDepth.U16)
_autoscale_query("standard", "standard-a2", BitDepth.U8)
# A3 table strategies at U16
_autoscale_query("robust", AutoscaleStrategy.ROBUST, BitDepth.U16)
_autoscale_query("adaptive", AutoscaleStrategy.ADAPTIVE, BitDepth.U16)
_autoscale_query("equalized", AutoscaleStrategy.EQUALIZED, BitDepth.U16)
_autoscale_query("tamed", AutoscaleStrategy.TAMED, BitDepth.U16)


_TAMED_SYNRGB_SQL_COPOL = asc.oracle_tamed_synrgb_sql(
    _VV_SRC_CTE, ["product_id"], _KEYS, is_copol=True
)


@query("tamed_synrgb_u8_copol", sql=_TAMED_SYNRGB_SQL_COPOL, tags=("raster", "autoscale"))
def q_tamed_synrgb_copol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (autoscale.rs:710-742): band-specific Tamed U8 scale for synRGB,
    co-pol window [min(p02,p05), p99], linear."""
    px = _vv_px(spark, sf_dir)
    out = asc.tamed_synrgb_u8(px, ["product_id"], is_copol=True)
    return out.select("product_id", "row", "col", "q")

"""C1/C2/A8: synthetic RGB compositors.

Reference: /root/reference/src/core/processing/synthetic_rgb.rs (studied, not
copied).

C1 default (:10-67): on U8 inputs v1,v2
    r = round((v1/255)^0.7 * 255)            (round, then clamp)
    g = round((v2/255)^0.9 * 255)
    b = v2==0 ? 0 : round(clamp((r/g)^0.1 * 255 * 0.24, 0, 255))
    (g==0 with v2>0 cannot occur: the gamma map sends v2>=1 to g>=2)

A8 combined-histogram floor (:92-113): 256-bin histogram over BOTH bands
    jointly; floor = first level where cumulative count >= round(total*0.05);
    cushion +3, capped at 40.

C2 suppressed (:88-178): with floor f
    lut(v) = v <= f ? 0 : round((v-f)/max(255-f,1) ^ gamma * 255), gamma_r=1.15
    gamma_g=1.10; b = round(clamp(((r+8)/(g+8))^0.1 * 255 * 0.18, 0, 255));
    both raw bands <= f -> RGB=(0,0,0).

Mode dispatch (:72-79, :182-197): all four SyntheticRgbModes route to C1;
strategy Tamed/Clahe routes to C2 (suppressed); RgbRatio/SarUrban/Enhanced are
todo!() placeholders in the reference and intentionally not implemented.

Two implementations:
  * column expressions in f64 — oracle-verifiable, whole-stage-codegen fused.
    Deviation: the reference computes its LUTs in f32; a handful of LUT
    entries can differ by +-1 where f32 pow lands within f32-eps of a .5
    boundary.
  * ``synrgb_lut_mapInPandas`` — builds the reference's exact f32 LUTs in
    NumPy once per executor and applies them with ``np.take`` (Arrow-batched).
    This is both the bit-faithful path and the fast path at scale: two table
    lookups per pixel, no transcendentals.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GAMMA_R, GAMMA_G, GAMMA_B = 0.7, 0.9, 0.1
BLUE_SCALE = 0.24
GAMMA_R_SUPP, GAMMA_G_SUPP = 1.15, 1.10
BLUE_SCALE_SUPP = 0.18
BLUE_EPS = 8.0


def _round_half_up(x: Column) -> Column:
    return F.floor(x + F.lit(0.5))


def _clamp(x: Column, lo: float, hi: float) -> Column:
    return F.least(F.greatest(x, F.lit(lo)), F.lit(hi))


# --- C1 default: f64 expressions ---------------------------------------------


def expr_r(v1: Column) -> Column:
    """round then clamp, like the reference LUT build."""
    return _clamp(_round_half_up(F.pow(v1.cast("double") / 255.0, GAMMA_R) * 255.0), 0.0, 255.0).cast("int")


def expr_g(v2: Column) -> Column:
    return _clamp(_round_half_up(F.pow(v2.cast("double") / 255.0, GAMMA_G) * 255.0), 0.0, 255.0).cast("int")


def expr_b(r: Column, g: Column, v2: Column) -> Column:
    """clamp then round (note the different order vs r/g — faithful)."""
    ratio = r.cast("double") / g.cast("double")
    blue = _round_half_up(_clamp(F.pow(ratio, GAMMA_B) * 255.0 * BLUE_SCALE, 0.0, 255.0))
    return F.when(v2 == 0, F.lit(0)).otherwise(blue.cast("int"))


def synrgb_default(df: DataFrame, v1: str = "q1", v2: str = "q2") -> DataFrame:
    """C1 on a wide frame with U8 columns v1, v2 -> adds r, g, b."""
    r = expr_r(F.col(v1))
    g = expr_g(F.col(v2))
    out = df.withColumn("r", r).withColumn("g", g)
    return out.withColumn("b", expr_b(F.col("r"), F.col("g"), F.col(v2)))


# --- A8: combined-histogram floor --------------------------------------------


def combined_floor(df: DataFrame, group_cols: list[str], v1: str = "q1", v2: str = "q2") -> DataFrame:
    """A8: per-group U8 level floor = first level with cum >= round(total*.05),
    +3 cushion, capped 40. Returns group_cols + ``fl`` (int).

    Shuffle shape: the union doubles the rows but the groupBy(level) combine
    collapses to <=256 rows per group map-side; everything after is tiny."""
    u = df.select(*group_cols, F.col(v1).alias("v")).unionByName(
        df.select(*group_cols, F.col(v2).alias("v"))
    )
    hist = u.groupBy(*group_cols, "v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(*group_cols).orderBy("v")
    cum = hist.withColumn("cum", F.sum("c").over(w))
    tot = hist.groupBy(*group_cols).agg(F.sum("c").alias("total"))
    j = cum.join(F.broadcast(tot), on=group_cols)
    target = F.floor(F.col("total").cast("double") * F.lit(0.05) + F.lit(0.5))
    fl = (
        j.where(F.col("cum") >= target)
        .groupBy(*group_cols)
        .agg(F.min("v").alias("_flv"))
        .select(*group_cols, F.least(F.col("_flv") + F.lit(3), F.lit(40)).cast("int").alias("fl"))
    )
    return fl


# --- C2 suppressed: f64 expressions ------------------------------------------


def _supp_lut(v: Column, fl: Column, gamma: float) -> Column:
    denom = F.greatest(F.lit(255.0) - fl.cast("double"), F.lit(1.0))
    shifted = (v.cast("double") - fl.cast("double")) / denom
    mapped = _clamp(_round_half_up(F.pow(shifted, gamma) * 255.0), 0.0, 255.0)
    return F.when(v <= fl, F.lit(0)).otherwise(mapped.cast("int"))


def synrgb_suppressed(
    df: DataFrame, group_cols: list[str], v1: str = "q1", v2: str = "q2"
) -> DataFrame:
    """C2 on a wide U8 frame; computes the A8 floor internally (broadcast)."""
    fl = combined_floor(df, group_cols, v1, v2)
    j = df.join(F.broadcast(fl), on=group_cols)
    r = _supp_lut(F.col(v1), F.col("fl"), GAMMA_R_SUPP)
    g = _supp_lut(F.col(v2), F.col("fl"), GAMMA_G_SUPP)
    j = j.withColumn("_r0", r).withColumn("_g0", g)
    ratio = (F.col("_r0").cast("double") + BLUE_EPS) / (F.col("_g0").cast("double") + BLUE_EPS)
    b0 = _round_half_up(_clamp(F.pow(ratio, GAMMA_B) * 255.0 * BLUE_SCALE_SUPP, 0.0, 255.0)).cast("int")
    water = (F.col(v1) <= F.col("fl")) & (F.col(v2) <= F.col("fl"))
    out = (
        j.withColumn("r", F.when(water, F.lit(0)).otherwise(F.col("_r0")))
        .withColumn("g", F.when(water, F.lit(0)).otherwise(F.col("_g0")))
        .withColumn("b", F.when(water, F.lit(0)).otherwise(b0))
        .drop("_r0", "_g0", "fl")
    )
    return out


# --- bit-faithful f32 LUT path (mapInPandas) ---------------------------------


def build_luts_f32() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The reference's exact f32 LUT construction (synthetic_rgb.rs:20-51)."""
    def round_half_away(x: np.ndarray) -> np.ndarray:
        # Rust f32::round() — half away from zero; np.round is half-even and
        # floor(x+0.5) misrounds when x+0.5 is not representable in f32.
        fl = np.floor(x)
        return np.where(x - fl >= np.float32(0.5), fl + np.float32(1.0), fl)

    v = np.arange(256, dtype=np.float32) / np.float32(255.0)
    lut_r = np.clip(round_half_away(np.power(v, np.float32(GAMMA_R)) * np.float32(255.0)), 0, 255).astype(np.uint8)
    lut_g = np.clip(round_half_away(np.power(v, np.float32(GAMMA_G)) * np.float32(255.0)), 0, 255).astype(np.uint8)
    r_f = lut_r.astype(np.float32)
    g_f = lut_g.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = r_f[:, None] / g_f[None, :]  # [b1, b2]; g==0 -> inf
        blue = np.power(ratio, np.float32(GAMMA_B)) * np.float32(255.0) * np.float32(BLUE_SCALE)
    blue = round_half_away(np.clip(blue, 0.0, 255.0).astype(np.float32))
    blue = np.nan_to_num(blue, nan=0.0)  # Rust `NaN as u8` saturates to 0
    lut_b = blue.astype(np.uint8)
    lut_b[:, 0] = 0  # band2 == 0 -> blue 0
    return lut_r, lut_g, lut_b


def synrgb_lut_map_in_pandas(df: DataFrame, v1: str = "q1", v2: str = "q2") -> DataFrame:
    """C1 via the reference's f32 LUTs, applied with np.take in Arrow batches.
    Bit-faithful to the Rust output and the throughput path at scale."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("r", IntegerType()),
            StructField("g", IntegerType()),
            StructField("b", IntegerType()),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        lut_r, lut_g, lut_b = build_luts_f32()
        lut_b_flat = lut_b.reshape(-1)
        for pdf in batches:
            a = pdf[v1].to_numpy(dtype=np.int64)
            b = pdf[v2].to_numpy(dtype=np.int64)
            pdf = pdf.copy()
            pdf["r"] = np.take(lut_r, a).astype(np.int32)
            pdf["g"] = np.take(lut_g, b).astype(np.int32)
            pdf["b"] = np.take(lut_b_flat, (a << 8) | b).astype(np.int32)
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)


# --- DuckDB oracle SQL fragments ---------------------------------------------


def sql_expr_r(v1: str) -> str:
    return (
        f"CAST(LEAST(GREATEST(FLOOR(POWER({v1}/255.0, {GAMMA_R!r})*255.0 + 0.5), 0.0), 255.0) AS INTEGER)"
    )


def sql_expr_g(v2: str) -> str:
    return (
        f"CAST(LEAST(GREATEST(FLOOR(POWER({v2}/255.0, {GAMMA_G!r})*255.0 + 0.5), 0.0), 255.0) AS INTEGER)"
    )


def sql_expr_b(r: str, g: str, v2: str) -> str:
    return (
        f"CASE WHEN {v2} = 0 THEN 0 ELSE "
        f"CAST(FLOOR(LEAST(GREATEST(POWER(CAST({r} AS DOUBLE)/CAST({g} AS DOUBLE), {GAMMA_B!r})*255.0*{BLUE_SCALE!r}, 0.0), 255.0) + 0.5) AS INTEGER) END"
    )


def sql_combined_floor_ctes(wide_rel: str, group_cols: list[str], v1: str = "q1", v2: str = "q2") -> str:
    """CTE chain ending in ``floorv`` (group_cols, fl) — A8 over relation
    ``wide_rel`` carrying group_cols + v1 + v2."""
    g = ", ".join(group_cols)
    gh = ", ".join(f"h.{c}" for c in group_cols)
    return f"""
u8hist AS (
  SELECT {g}, v, COUNT(*) AS c FROM (
    SELECT {g}, {v1} AS v FROM {wide_rel}
    UNION ALL
    SELECT {g}, {v2} AS v FROM {wide_rel}
  ) uu GROUP BY ALL
),
u8tot AS (SELECT {g}, SUM(c) AS total FROM u8hist GROUP BY {g}),
u8cum AS (
  SELECT {gh}, h.v,
         SUM(h.c) OVER (PARTITION BY {gh} ORDER BY h.v) AS cum,
         t.total
  FROM u8hist h JOIN u8tot t USING ({g})
),
floorv AS (
  SELECT {g}, CAST(LEAST(MIN(v) + 3, 40) AS INTEGER) AS fl
  FROM u8cum WHERE cum >= FLOOR(total * 0.05 + 0.5)
  GROUP BY {g}
)""".strip()


def sql_supp_lut(v: str, gamma: float) -> str:
    denom = "GREATEST(255.0 - CAST(fl AS DOUBLE), 1.0)"
    shifted = f"((CAST({v} AS DOUBLE) - CAST(fl AS DOUBLE)) / {denom})"
    mapped = f"CAST(LEAST(GREATEST(FLOOR(POWER({shifted}, {gamma!r})*255.0 + 0.5), 0.0), 255.0) AS INTEGER)"
    return f"CASE WHEN {v} <= fl THEN 0 ELSE {mapped} END"


def sql_supp_b(r: str, g: str) -> str:
    ratio = f"((CAST({r} AS DOUBLE) + {BLUE_EPS!r}) / (CAST({g} AS DOUBLE) + {BLUE_EPS!r}))"
    return (
        f"CAST(FLOOR(LEAST(GREATEST(POWER({ratio}, {GAMMA_B!r})*255.0*{BLUE_SCALE_SUPP!r}, 0.0), 255.0) + 0.5) AS INTEGER)"
    )

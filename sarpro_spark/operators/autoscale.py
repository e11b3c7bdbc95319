"""A2/A3/A6/A7: autoscale strategies — two-phase agg -> broadcast params ->
vectorized quantize.

Reference semantics (studied from /root/reference/src/core/processing/
autoscale.rs, not copied):

A2 ``autoscale_db_image`` (:368-448) — heuristic clip-window choice:
    dr = max-min, iqr = p75-p25
    dr < 15  -> median +- max(20, dr*0.8)/2, gamma 1.1
    iqr < 5  -> [p25 - 2.5*iqr, p75 + 2.5*iqr], gamma 1.0
    dr > 40  -> [max(p02, min+0.02*dr), min(p98, max-0.02*dr)], gamma 0.9
    else     -> [p02, p98], gamma 1.0
    then low = max(low, min), high = min(high, max)  (A2 clamps; A3 does NOT)
    range = max(high-low, 1.0)
    pixel: valid ? floor(clamp(((clamp(v,low,high)-low)/range)^gamma * maxval,
                              0, maxval)) : 0       (Rust `as u16` truncates)

A3 ``autoscale_db_image_advanced`` (:452-659) — strategy table:
    robust    low=max(p25-2.5*iqr, p01, min)  high=min(p75+2.5*iqr, p99, max) g=1.0
    adaptive  skew=(mean-median)/max(|std|,1); tail=(p99-p95)/max(p95-p75,1)
              |skew|>0.5 -> skew>0 ? (p02,p98,0.9) : (p05,p95,1.1)
              tail>2     -> (p10,p90,0.8)
              else       -> (p05,p95,1.0)
    equalized (p01,p99,1.0)   clahe-window (p01,p99,1.0)   tamed (p25,p99,1.0)
    standard/default (p05,p95,1.0)
    (``use_local_enhancement`` is false for every strategy — the 3x3 local
    path :615-640 is dead code and intentionally not rebuilt)

A6 ``scale_u16_to_u8`` (:348-364) — global min/max, scale=255/(max-min) (1.0
    if degenerate), round-half-up, clamp. (Reference does this in f32; we use
    f64 — can differ by +-1 count when the product lands within f32-eps of a
    .5 boundary; documented deviation.)

A7 ``autoscale_db_image_tamed_synrgb_u8`` (:710-742) — co-pol clip
    [min(p02,p05), p99], cross-pol [p05, p99], linear (no gamma), U8.

Scale shape: stats is one tiny row per group (broadcast); the quantize pass is
a single narrow projection over the pixel frame — no extra shuffle beyond the
two inside histogram_stats. At 100 TB the pixel scan stays embarrassingly
parallel and whole-stage-codegen fused.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sarpro_spark.operators.stats import histogram_stats, oracle_stats_ctes
from sarpro_spark.types import AutoscaleStrategy, BitDepth

MAX_VAL = {BitDepth.U8: 255.0, BitDepth.U16: 65535.0}

PARAM_COLS = ["low", "high", "gamma", "qrange"]


def _finish(low0: Column, high0: Column, gamma: Column, clamp_to_extent: bool) -> list[Column]:
    if clamp_to_extent:
        low = F.greatest(low0, F.col("vmin"))
        high = F.least(high0, F.col("vmax"))
    else:
        low, high = low0, high0
    qrange = F.greatest(high - low, F.lit(1.0))
    return [low.alias("low"), high.alias("high"), gamma.alias("gamma"), qrange.alias("qrange")]


def params_standard(stats: DataFrame, group_cols: list[str]) -> DataFrame:
    """A2 heuristic clip-window (evaluated in the reference's if/else order)."""
    dr = F.col("vmax") - F.col("vmin")
    iqr = F.col("p75") - F.col("p25")
    rng1 = F.greatest(F.lit(20.0), dr * F.lit(0.8))
    low0 = (
        F.when(dr < 15.0, F.col("median") - rng1 / 2)
        .when(iqr < 5.0, F.col("p25") - F.lit(2.5) * iqr)
        .when(dr > 40.0, F.greatest(F.col("p02"), F.col("vmin") + F.lit(0.02) * dr))
        .otherwise(F.col("p02"))
    )
    high0 = (
        F.when(dr < 15.0, F.col("median") + rng1 / 2)
        .when(iqr < 5.0, F.col("p75") + F.lit(2.5) * iqr)
        .when(dr > 40.0, F.least(F.col("p98"), F.col("vmax") - F.lit(0.02) * dr))
        .otherwise(F.col("p98"))
    )
    gamma = (
        F.when(dr < 15.0, F.lit(1.1))
        .when(iqr < 5.0, F.lit(1.0))
        .when(dr > 40.0, F.lit(0.9))
        .otherwise(F.lit(1.0))
    )
    return stats.select(*group_cols, *_finish(low0, high0, gamma, clamp_to_extent=True))


def params_advanced(stats: DataFrame, group_cols: list[str], strategy: AutoscaleStrategy) -> DataFrame:
    """A3 strategy table (no extent clamping — matches the reference)."""
    iqr = F.col("p75") - F.col("p25")
    if strategy == AutoscaleStrategy.ROBUST:
        thr = F.lit(2.5) * iqr
        low0 = F.greatest(F.col("p25") - thr, F.col("p01"), F.col("vmin"))
        high0 = F.least(F.col("p75") + thr, F.col("p99"), F.col("vmax"))
        gamma = F.lit(1.0)
    elif strategy == AutoscaleStrategy.ADAPTIVE:
        skew = (F.col("vmean") - F.col("median")) / F.greatest(F.abs(F.col("vstd")), F.lit(1.0))
        tail = (F.col("p99") - F.col("p95")) / F.greatest(F.col("p95") - F.col("p75"), F.lit(1.0))
        low0 = (
            F.when(F.abs(skew) > 0.5, F.when(skew > 0, F.col("p02")).otherwise(F.col("p05")))
            .when(tail > 2.0, F.col("p10"))
            .otherwise(F.col("p05"))
        )
        high0 = (
            F.when(F.abs(skew) > 0.5, F.when(skew > 0, F.col("p98")).otherwise(F.col("p95")))
            .when(tail > 2.0, F.col("p90"))
            .otherwise(F.col("p95"))
        )
        gamma = (
            F.when(F.abs(skew) > 0.5, F.when(skew > 0, F.lit(0.9)).otherwise(F.lit(1.1)))
            .when(tail > 2.0, F.lit(0.8))
            .otherwise(F.lit(1.0))
        )
    elif strategy in (AutoscaleStrategy.EQUALIZED, AutoscaleStrategy.CLAHE):
        low0, high0, gamma = F.col("p01"), F.col("p99"), F.lit(1.0)
    elif strategy == AutoscaleStrategy.TAMED:
        low0, high0, gamma = F.col("p25"), F.col("p99"), F.lit(1.0)
    else:  # STANDARD / DEFAULT inside the advanced table
        low0, high0, gamma = F.col("p05"), F.col("p95"), F.lit(1.0)
    return stats.select(*group_cols, *_finish(low0, high0, gamma, clamp_to_extent=False))


def quantize_value(
    value: Column, valid: Column, low: Column, high: Column, gamma: Column, qrange: Column, max_val: float
) -> Column:
    """Pixel quantization with explicit param columns:
    valid ? floor(clamp(norm^gamma * maxval)) : 0."""
    clipped = F.least(F.greatest(value, low), high)
    norm = F.pow((clipped - low) / qrange, gamma)
    q = F.floor(F.least(F.greatest(norm * F.lit(max_val), F.lit(0.0)), F.lit(max_val))).cast("int")
    return F.when(valid, q).otherwise(F.lit(0))


def quantize_expr(value: Column, valid: Column, max_val: float) -> Column:
    """Pixel quantization using the broadcast param columns low/high/gamma/qrange."""
    return quantize_value(
        value, valid, F.col("low"), F.col("high"), F.col("gamma"), F.col("qrange"), max_val
    )


def apply_params(
    px: DataFrame,
    params: DataFrame,
    group_cols: list[str],
    bit_depth: BitDepth,
    value: str = "db",
    valid: str = "valid",
    out: str = "q",
) -> DataFrame:
    """Broadcast the per-group params and quantize every pixel."""
    j = px.join(F.broadcast(params), on=group_cols)
    j = j.withColumn(out, quantize_expr(F.col(value), F.col(valid), MAX_VAL[bit_depth]))
    return j.drop(*PARAM_COLS)


def autoscale(
    px: DataFrame,
    group_cols: list[str],
    strategy: AutoscaleStrategy,
    bit_depth: BitDepth,
    value: str = "db",
    valid: str = "valid",
    stats: DataFrame | None = None,
    out: str = "q",
) -> DataFrame:
    """Dispatch matching the reference pipeline (pipeline.rs:51-67): STANDARD
    routes to the A2 heuristic; every other strategy to the A3 table."""
    if stats is None:
        stats = histogram_stats(px, group_cols, value=value, valid=valid)
    if strategy == AutoscaleStrategy.STANDARD:
        params = params_standard(stats, group_cols)
    else:
        params = params_advanced(stats, group_cols, strategy)
    return apply_params(px, params, group_cols, bit_depth, value, valid, out)


def scale_u16_to_u8(
    df: DataFrame, group_cols: list[str], value: str = "q", out: str = "q8"
) -> DataFrame:
    """A6: per-group min/max rescale of quantized values to U8.
    round-half-up via floor(x+0.5) — identical IEEE shape on both engines."""
    ext = df.groupBy(*group_cols).agg(
        F.min(value).cast("double").alias("_u8min"), F.max(value).cast("double").alias("_u8max")
    )
    scale = F.when(
        F.col("_u8max") > F.col("_u8min"), F.lit(255.0) / (F.col("_u8max") - F.col("_u8min"))
    ).otherwise(F.lit(1.0))
    j = df.join(F.broadcast(ext), on=group_cols)
    val = F.floor((F.col(value).cast("double") - F.col("_u8min")) * scale + F.lit(0.5))
    return j.withColumn(
        out, F.least(F.greatest(val, F.lit(0.0)), F.lit(255.0)).cast("int")
    ).drop("_u8min", "_u8max")


def autoscale_to_bitdepth(
    px: DataFrame,
    group_cols: list[str],
    strategy: AutoscaleStrategy,
    bit_depth: BitDepth,
    value: str = "db",
    valid: str = "valid",
    stats: DataFrame | None = None,
) -> DataFrame:
    """The reference's U8 fidelity trap (autoscale.rs:662-704): the U8 path
    quantizes at max_val=255 into u16 *then* min-max rescales to u8 — a double
    quantization, not a direct 8-bit scale. Output column: ``q``."""
    if bit_depth == BitDepth.U16:
        return autoscale(px, group_cols, strategy, BitDepth.U16, value, valid, stats)
    q = autoscale(px, group_cols, strategy, BitDepth.U8, value, valid, stats, out="_q16")
    return scale_u16_to_u8(q, group_cols, value="_q16", out="q").drop("_q16")


def tamed_synrgb_u8(
    px: DataFrame,
    group_cols: list[str],
    is_copol: bool,
    value: str = "db",
    valid: str = "valid",
    stats: DataFrame | None = None,
    out: str = "q",
) -> DataFrame:
    """A7: band-specific Tamed U8 scale for synRGB inputs (linear, no gamma)."""
    if stats is None:
        stats = histogram_stats(px, group_cols, value=value, valid=valid)
    if is_copol:
        low = F.least(F.col("p02"), F.col("p05"))
    else:
        low = F.col("p05")
    params = stats.select(
        *group_cols,
        low.alias("low"),
        F.col("p99").alias("high"),
        F.lit(1.0).alias("gamma"),
        F.greatest(F.col("p99") - low, F.lit(1.0)).alias("qrange"),
    )
    return apply_params(px, params, group_cols, BitDepth.U8, value, valid, out)


# --- DuckDB oracle SQL generators (kept in lock-step with the Spark exprs) ---


def _sql_strategy_clauses(strategy: AutoscaleStrategy | str) -> tuple[str, str, str, bool]:
    """(low0, high0, gamma) SQL expressions over the ``stats`` relation plus
    whether to clamp to [vmin, vmax]. ``'standard-a2'`` selects the A2
    heuristic; AutoscaleStrategy values select the A3 table."""
    dr = "(vmax - vmin)"
    iqr = "(p75 - p25)"
    if strategy == "standard-a2":
        rng1 = f"GREATEST(20.0, {dr} * 0.8)"
        low0 = (
            f"CASE WHEN {dr} < 15.0 THEN median - {rng1}/2 "
            f"WHEN {iqr} < 5.0 THEN p25 - 2.5*{iqr} "
            f"WHEN {dr} > 40.0 THEN GREATEST(p02, vmin + 0.02*{dr}) "
            f"ELSE p02 END"
        )
        high0 = (
            f"CASE WHEN {dr} < 15.0 THEN median + {rng1}/2 "
            f"WHEN {iqr} < 5.0 THEN p75 + 2.5*{iqr} "
            f"WHEN {dr} > 40.0 THEN LEAST(p98, vmax - 0.02*{dr}) "
            f"ELSE p98 END"
        )
        gamma = (
            f"CASE WHEN {dr} < 15.0 THEN 1.1 WHEN {iqr} < 5.0 THEN 1.0 "
            f"WHEN {dr} > 40.0 THEN 0.9 ELSE 1.0 END"
        )
        return low0, high0, gamma, True
    if strategy == AutoscaleStrategy.ROBUST:
        return (
            f"GREATEST(p25 - 2.5*{iqr}, p01, vmin)",
            f"LEAST(p75 + 2.5*{iqr}, p99, vmax)",
            "1.0",
            False,
        )
    if strategy == AutoscaleStrategy.ADAPTIVE:
        skew = "((vmean - median) / GREATEST(ABS(vstd), 1.0))"
        tail = "((p99 - p95) / GREATEST(p95 - p75, 1.0))"
        low0 = (
            f"CASE WHEN ABS({skew}) > 0.5 THEN (CASE WHEN {skew} > 0.0 THEN p02 ELSE p05 END) "
            f"WHEN {tail} > 2.0 THEN p10 ELSE p05 END"
        )
        high0 = (
            f"CASE WHEN ABS({skew}) > 0.5 THEN (CASE WHEN {skew} > 0.0 THEN p98 ELSE p95 END) "
            f"WHEN {tail} > 2.0 THEN p90 ELSE p95 END"
        )
        gamma = (
            f"CASE WHEN ABS({skew}) > 0.5 THEN (CASE WHEN {skew} > 0.0 THEN 0.9 ELSE 1.1 END) "
            f"WHEN {tail} > 2.0 THEN 0.8 ELSE 1.0 END"
        )
        return low0, high0, gamma, False
    if strategy in (AutoscaleStrategy.EQUALIZED, AutoscaleStrategy.CLAHE):
        return "p01", "p99", "1.0", False
    if strategy == AutoscaleStrategy.TAMED:
        return "p25", "p99", "1.0", False
    return "p05", "p95", "1.0", False  # STANDARD/DEFAULT in the A3 table


def _sql_params_ctes(strategy: AutoscaleStrategy | str, group_cols: list[str]) -> str:
    g = ", ".join(group_cols)
    low0, high0, gamma, clamp = _sql_strategy_clauses(strategy)
    low = "GREATEST(low0, vmin)" if clamp else "low0"
    high = "LEAST(high0, vmax)" if clamp else "high0"
    return f"""
params0 AS (
  SELECT {g}, vmin, vmax, {low0} AS low0, {high0} AS high0, {gamma} AS gamma FROM stats
),
params1 AS (
  SELECT {g}, {low} AS low, {high} AS high, gamma FROM params0
),
params AS (
  SELECT {g}, low, high, gamma, GREATEST(high - low, 1.0) AS qrange FROM params1
)""".strip()


def _sql_quantize(max_val: float, value: str, valid: str, out: str, qualifier: str = "s") -> str:
    q = qualifier
    clipped = f"LEAST(GREATEST({q}.{value}, pr.low), pr.high)"
    norm = f"POWER(({clipped} - pr.low) / pr.qrange, pr.gamma)"
    return (
        f"CASE WHEN {q}.{valid} THEN "
        f"CAST(FLOOR(LEAST(GREATEST({norm} * {max_val!r}, 0.0), {max_val!r})) AS INTEGER) "
        f"ELSE 0 END AS {out}"
    )


def oracle_autoscale_sql(
    source_cte: str,
    group_cols: list[str],
    key_cols: list[str],
    strategy: AutoscaleStrategy | str,
    bit_depth: BitDepth,
    value: str = "db",
    valid: str = "valid",
    out: str = "q",
) -> str:
    """DuckDB twin of :func:`autoscale` / :func:`autoscale_to_bitdepth`.
    ``source_cte`` must define ``src`` carrying key_cols + value + valid."""
    g = ", ".join(group_cols)
    keys = ", ".join(f"s.{k}" for k in key_cols)
    stats_ctes = oracle_stats_ctes(source_cte, group_cols, value, valid)
    params_ctes = _sql_params_ctes(strategy, group_cols)
    if bit_depth == BitDepth.U16:
        return f"""
WITH {stats_ctes},
{params_ctes}
SELECT {keys}, {_sql_quantize(MAX_VAL[BitDepth.U16], value, valid, out)}
FROM src s JOIN params pr USING ({g})
""".strip()
    # U8: double quantization (quantize at 255 into u16, then min-max rescale)
    return f"""
WITH {stats_ctes},
{params_ctes},
q16 AS (
  SELECT {keys}, {_sql_quantize(MAX_VAL[BitDepth.U8], value, valid, '_q16')}
  FROM src s JOIN params pr USING ({g})
),
ext AS (
  SELECT {g}, CAST(MIN(_q16) AS DOUBLE) AS u8min, CAST(MAX(_q16) AS DOUBLE) AS u8max
  FROM q16 GROUP BY {g}
),
exts AS (
  SELECT {g}, u8min, CASE WHEN u8max > u8min THEN 255.0 / (u8max - u8min) ELSE 1.0 END AS scale
  FROM ext
)
SELECT {", ".join(f"q.{k}" for k in key_cols)},
       CAST(LEAST(GREATEST(FLOOR((CAST(q._q16 AS DOUBLE) - e.u8min) * e.scale + 0.5), 0.0), 255.0) AS INTEGER) AS {out}
FROM q16 q JOIN exts e USING ({g})
""".strip()


def oracle_tamed_synrgb_sql(
    source_cte: str,
    group_cols: list[str],
    key_cols: list[str],
    is_copol: bool,
    value: str = "db",
    valid: str = "valid",
    out: str = "q",
) -> str:
    """DuckDB twin of :func:`tamed_synrgb_u8` (A7)."""
    g = ", ".join(group_cols)
    keys = ", ".join(f"s.{k}" for k in key_cols)
    stats_ctes = oracle_stats_ctes(source_cte, group_cols, value, valid)
    low = "LEAST(p02, p05)" if is_copol else "p05"
    return f"""
WITH {stats_ctes},
params AS (
  SELECT {g}, {low} AS low, p99 AS high, 1.0 AS gamma,
         GREATEST(p99 - {low}, 1.0) AS qrange
  FROM stats
)
SELECT {keys}, {_sql_quantize(255.0, value, valid, out)}
FROM src s JOIN params pr USING ({g})
""".strip()

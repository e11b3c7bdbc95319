"""A4: CLAHE — contrast-limited adaptive histogram equalization.

Reference: ``clahe_equalize_normalized`` (/root/reference/src/core/processing/
autoscale.rs:220-345), invoked with tiles 8x8, clip 2.0, 256 bins over a
[p01,p99]-normalized dB image (:572-608). Semantics reproduced exactly:

  tile_h = ceil(rows/8), tile_w = ceil(cols/8)
  per-tile histogram over VALID pixels: bin = round(clamp(norm,0,1)*255)
  clip threshold = max(2.0 * tile_area/256, 1.0)   (FULL tile area, not valid
    count); clipped count = trunc(threshold) where count > threshold (f64
    compare); excess accumulates the un-truncated difference
  redistribute: +floor(excess/256) per bin; remainder = round(excess -
    floor(excess/256)*256) spread one-per-bin cycling from bin 0
  cdf = clamp(cumsum/max(total,1), 0, 1)  over ALL 256 bins (empty included)
  sampling: rf = r/tile_h - 0.5; ty = max(floor(rf),0); dy = rf - ty (may be
    negative at the top/left edge — extrapolation, faithful); corners clamped
    to the tile grid; bin_pos = round(clamp(val,0,1)*255);
    out = (c00*(1-dx)+c01*dx)*(1-dy) + (c10*(1-dx)+c11*dx)*dy
    — the exact expression SHAPE matters: a different association changes the
    last ulp and can flip the final truncation, so both the Spark and the
    oracle SQL sides use precisely this form.
  output: valid ? trunc(clamp(out,0,1)*max_val) : 0

Scale shape: pixels shuffle once to (product,tile,bin) counts (map-side
combine collapses each task to <=64*256 rows per product); the dense
tile-CDF relation is tiny (16K rows/product) and joins back 4x on
co-partitioned keys (broadcast locally, sort-merge at cluster scale). The
four corner joins + final projection stay whole-stage-codegen fused. This is
the reference's only *local* windowed operator; the grid-cell decomposition
is what makes it shuffle-bounded instead of neighborhood-bounded.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sarpro_spark.operators.geometry import product_dims
from sarpro_spark.operators.stats import histogram_stats, oracle_stats_ctes
from sarpro_spark.types import BitDepth

TILES = 8
BINS = 256
CLIP_LIMIT = 2.0

from sarpro_spark.operators.autoscale import MAX_VAL


def _round_half_up(x: Column) -> Column:
    return F.floor(x + F.lit(0.5))


def clahe_quantize(
    px: DataFrame,
    group_cols: list[str],
    bit_depth: BitDepth,
    value: str = "db",
    valid: str = "valid",
    stats: DataFrame | None = None,
    dims: DataFrame | None = None,
    out: str = "q",
) -> DataFrame:
    """Full CLAHE path of the advanced autoscale (autoscale.rs:572-608):
    [p01,p99] normalize -> 8x8 tile CLAHE -> quantize to bit depth."""
    if stats is None:
        stats = histogram_stats(px, group_cols, value=value, valid=valid)
    if dims is None:
        dims = product_dims(px, group_cols)
    max_val = MAX_VAL[bit_depth]

    win = stats.select(
        *group_cols,
        F.col("p01").alias("low"),
        F.col("p99").alias("high"),
        F.greatest(F.col("p99") - F.col("p01"), F.lit(1.0)).alias("qrange"),
    )
    dims = dims.select(
        *group_cols,
        "cols",
        "rows",
        F.ceil(F.col("rows") / F.lit(TILES)).cast("int").alias("th"),
        F.ceil(F.col("cols") / F.lit(TILES)).cast("int").alias("tw"),
    )

    # normalized value + histogram bin per valid pixel
    p = px.join(F.broadcast(win), on=group_cols).join(F.broadcast(dims), on=group_cols)
    clipped = F.least(F.greatest(F.col(value), F.col("low")), F.col("high"))
    norm = (clipped - F.col("low")) / F.col("qrange")
    p = p.withColumn("_norm", F.when(F.col(valid), norm).otherwise(F.lit(0.0)))
    nclamped = F.least(F.greatest(F.col("_norm"), F.lit(0.0)), F.lit(1.0))
    p = p.withColumn("_bin", _round_half_up(nclamped * F.lit(float(BINS - 1))).cast("int"))
    p = p.withColumn("_ty", F.floor(F.col("row") / F.col("th")).cast("int"))
    p = p.withColumn("_tx", F.floor(F.col("col") / F.col("tw")).cast("int"))

    # per-tile histogram (valid pixels only), shuffled once with combine
    hist = (
        p.filter(F.col(valid))
        .groupBy(*group_cols, "_ty", "_tx", "_bin")
        .agg(F.count(F.lit(1)).alias("h"))
    )

    # dense tile x bin canvas with tile geometry
    tiles = (
        dims.select(
            *group_cols,
            "cols",
            "rows",
            "th",
            "tw",
            F.explode(F.sequence(F.lit(0), F.lit(TILES - 1))).alias("_ty"),
        )
        .withColumn("_tx", F.explode(F.sequence(F.lit(0), F.lit(TILES - 1))))
        .withColumn(
            "tile_rows",
            F.greatest(
                F.least((F.col("_ty") + 1) * F.col("th"), F.col("rows")) - F.col("_ty") * F.col("th"),
                F.lit(0),
            ),
        )
        .withColumn(
            "tile_cols",
            F.greatest(
                F.least((F.col("_tx") + 1) * F.col("tw"), F.col("cols")) - F.col("_tx") * F.col("tw"),
                F.lit(0),
            ),
        )
        .withColumn(
            "clip_thr",
            F.greatest(
                F.lit(CLIP_LIMIT) * (F.col("tile_rows") * F.col("tile_cols")).cast("double") / F.lit(float(BINS)),
                F.lit(1.0),
            ),
        )
        .withColumn("_bin", F.explode(F.sequence(F.lit(0), F.lit(BINS - 1))))
    )
    dense = tiles.join(hist, on=[*group_cols, "_ty", "_tx", "_bin"], how="left").withColumn(
        "h", F.coalesce(F.col("h").cast("double"), F.lit(0.0))
    )

    # clip + redistribute. Tile-level scalars (excess/add/rem/total) come from
    # a tiny tile-grain aggregation broadcast back — not windows over the full
    # dense relation (total = sum_clip + 256*add + rem in closed form, since
    # exactly `rem` bins receive the +1; rem <= 256 by construction).
    over = F.col("h") > F.col("clip_thr")
    dense = dense.withColumn("h_clip", F.when(over, F.floor(F.col("clip_thr"))).otherwise(F.col("h")))
    dense = dense.withColumn("ex", F.when(over, F.col("h") - F.col("clip_thr")).otherwise(F.lit(0.0)))
    tile_agg = dense.groupBy(*group_cols, "_ty", "_tx").agg(
        F.sum("ex").alias("excess"), F.sum("h_clip").alias("_sum_clip")
    )
    tile_agg = tile_agg.withColumn("add_", F.floor(F.col("excess") / F.lit(float(BINS))))
    tile_agg = tile_agg.withColumn(
        "rem_", _round_half_up(F.col("excess") - F.col("add_") * F.lit(float(BINS)))
    )
    tile_agg = tile_agg.select(
        *group_cols,
        "_ty",
        "_tx",
        "add_",
        "rem_",
        F.greatest(
            F.col("_sum_clip") + F.col("add_") * F.lit(float(BINS)) + F.col("rem_"), F.lit(1.0)
        ).alias("total"),
    )
    dense = dense.join(F.broadcast(tile_agg), on=[*group_cols, "_ty", "_tx"])
    dense = dense.withColumn(
        "h2",
        F.col("h_clip") + F.col("add_") + F.when(F.col("_bin") < F.col("rem_"), F.lit(1.0)).otherwise(F.lit(0.0)),
    )

    tile_w_all = Window.partitionBy(*group_cols, "_ty", "_tx")
    cum_w = tile_w_all.orderBy("_bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = dense.select(
        *group_cols,
        "_ty",
        "_tx",
        "_bin",
        F.least(F.greatest(F.sum("h2").over(cum_w) / F.col("total"), F.lit(0.0)), F.lit(1.0)).alias("cdf"),
    )
    # NOTE: the 4 corner joins each rebuild this relation for their broadcast,
    # but the builds run concurrently on otherwise-idle cores — forcing a
    # shared materialization (cache / localCheckpoint) measured ~2x SLOWER
    # wall-clock than letting them overlap. Deliberately left recomputed.

    # corner coordinates + weights per pixel (exact reference arithmetic)
    rf = F.col("row").cast("double") / F.col("th").cast("double") - F.lit(0.5)
    cf = F.col("col").cast("double") / F.col("tw").cast("double") - F.lit(0.5)
    p = p.withColumn("_tyf", F.greatest(F.floor(rf), F.lit(0.0)))
    p = p.withColumn("_txf", F.greatest(F.floor(cf), F.lit(0.0)))
    p = p.withColumn("_dy", rf - F.col("_tyf"))
    p = p.withColumn("_dx", cf - F.col("_txf"))
    p = (
        p.withColumn("_ty0", F.least(F.col("_tyf"), F.lit(float(TILES - 1))).cast("int"))
        .withColumn("_tx0", F.least(F.col("_txf"), F.lit(float(TILES - 1))).cast("int"))
        .withColumn("_ty1", F.least(F.col("_tyf") + 1, F.lit(float(TILES - 1))).cast("int"))
        .withColumn("_tx1", F.least(F.col("_txf") + 1, F.lit(float(TILES - 1))).cast("int"))
    )
    # sampling bin_pos uses the same round(clamp(val)*255) as the histogram bin
    p = p.withColumn("_bpos", F.col("_bin"))

    # 4 co-partitioned joins against the tiny CDF relation (broadcast locally;
    # sort-merge on (group, tile, bin) at cluster scale)
    for name, tyc, txc in (
        ("c00", "_ty0", "_tx0"),
        ("c01", "_ty0", "_tx1"),
        ("c10", "_ty1", "_tx0"),
        ("c11", "_ty1", "_tx1"),
    ):
        c = cdf.select(
            *[F.col(g).alias(f"{name}_{g}") for g in group_cols],
            F.col("_ty").alias(f"{name}_ty"),
            F.col("_tx").alias(f"{name}_tx"),
            F.col("_bin").alias(f"{name}_bin"),
            F.col("cdf").alias(name),
        )
        cond = functools.reduce(
            lambda a, b: a & b,
            [p[g] == c[f"{name}_{g}"] for g in group_cols]
            + [p[tyc] == c[f"{name}_ty"], p[txc] == c[f"{name}_tx"], p["_bpos"] == c[f"{name}_bin"]],
        )
        p = p.join(F.broadcast(c), cond, "inner").drop(
            *[f"{name}_{g}" for g in group_cols], f"{name}_ty", f"{name}_tx", f"{name}_bin"
        )

    # bilinear combine — EXACT reference expression shape (autoscale.rs:327-330)
    dx, dy = F.col("_dx"), F.col("_dy")
    top = F.col("c00") * (F.lit(1.0) - dx) + F.col("c01") * dx
    bottom = F.col("c10") * (F.lit(1.0) - dx) + F.col("c11") * dx
    outv = top * (F.lit(1.0) - dy) + bottom * dy
    q = F.floor(
        F.least(F.greatest(outv, F.lit(0.0)), F.lit(1.0)) * F.lit(max_val)
    ).cast("int")
    p = p.withColumn(out, F.when(F.col(valid), q).otherwise(F.lit(0)))
    keep = [c for c in px.columns] + [out]
    return p.select(*keep)


def oracle_clahe_sql(
    source_cte: str,
    group_cols: list[str],
    key_cols: list[str],
    bit_depth: BitDepth,
    value: str = "db",
    valid: str = "valid",
    out: str = "q",
) -> str:
    """DuckDB twin of :func:`clahe_quantize`. ``source_cte`` must define
    ``src`` carrying group_cols + row + col + value + valid. Single group
    column supported (product-grain CLAHE)."""
    assert len(group_cols) == 1, "oracle generator supports one group col"
    g = group_cols[0]
    max_val = MAX_VAL[bit_depth]
    stats_ctes = oracle_stats_ctes(source_cte, group_cols, value, valid)
    keys = ", ".join(f"c.{k}" for k in key_cols)
    return f"""
WITH {stats_ctes},
cdims AS (
  SELECT {g}, CAST(MAX(col)+1 AS INTEGER) AS cols, CAST(MAX(row)+1 AS INTEGER) AS rows,
         CAST(CEIL((MAX(row)+1) / {TILES}.0) AS INTEGER) AS th,
         CAST(CEIL((MAX(col)+1) / {TILES}.0) AS INTEGER) AS tw
  FROM src GROUP BY {g}
),
cwin AS (SELECT {g}, p01 AS low, p99 AS high, GREATEST(p99 - p01, 1.0) AS qrange FROM stats),
pnorm AS (
  SELECT s.{g}, s.row, s.col, s.{valid} AS valid, d.th, d.tw,
         CASE WHEN s.{valid}
              THEN (LEAST(GREATEST(s.{value}, w.low), w.high) - w.low) / w.qrange
              ELSE 0.0 END AS norm
  FROM src s JOIN cwin w USING ({g}) JOIN cdims d USING ({g})
),
pbin AS (
  SELECT *,
         CAST(FLOOR(LEAST(GREATEST(norm, 0.0), 1.0) * {BINS - 1}.0 + 0.5) AS INTEGER) AS bin,
         CAST(FLOOR(row / CAST(th AS DOUBLE)) AS INTEGER) AS pty,
         CAST(FLOOR(col / CAST(tw AS DOUBLE)) AS INTEGER) AS ptx
  FROM pnorm
),
chist AS (SELECT {g}, pty AS ty, ptx AS tx, bin, COUNT(*) AS h FROM pbin WHERE valid GROUP BY ALL),
ctiles AS (
  SELECT d.{g}, t1.i AS ty, t2.i AS tx,
         GREATEST(LEAST((t1.i+1)*d.th, d.rows) - t1.i*d.th, 0) AS tile_rows,
         GREATEST(LEAST((t2.i+1)*d.tw, d.cols) - t2.i*d.tw, 0) AS tile_cols
  FROM cdims d,
       (SELECT UNNEST(RANGE(0, {TILES})) AS i) t1,
       (SELECT UNNEST(RANGE(0, {TILES})) AS i) t2
),
cdense AS (
  SELECT t.{g}, t.ty, t.tx, b.i AS bin,
         GREATEST({CLIP_LIMIT!r} * CAST(t.tile_rows * t.tile_cols AS DOUBLE) / {BINS}.0, 1.0) AS clip_thr,
         COALESCE(CAST(h.h AS DOUBLE), 0.0) AS h
  FROM ctiles t
  CROSS JOIN (SELECT UNNEST(RANGE(0, {BINS})) AS i) b
  LEFT JOIN chist h ON h.{g} = t.{g} AND h.ty = t.ty AND h.tx = t.tx AND h.bin = b.i
),
cclip1 AS (
  SELECT *, CASE WHEN h > clip_thr THEN FLOOR(clip_thr) ELSE h END AS h_clip,
         CASE WHEN h > clip_thr THEN h - clip_thr ELSE 0.0 END AS ex
  FROM cdense
),
cclip2 AS (SELECT *, SUM(ex) OVER (PARTITION BY {g}, ty, tx) AS excess FROM cclip1),
cclip3 AS (
  SELECT *, h_clip + FLOOR(excess / {BINS}.0)
         + CASE WHEN bin < FLOOR(excess - FLOOR(excess / {BINS}.0) * {BINS}.0 + 0.5)
                THEN 1.0 ELSE 0.0 END AS h2
  FROM cclip2
),
ccdf AS (
  SELECT {g}, ty, tx, bin,
         LEAST(GREATEST(
           SUM(h2) OVER (PARTITION BY {g}, ty, tx ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           / GREATEST(SUM(h2) OVER (PARTITION BY {g}, ty, tx), 1.0), 0.0), 1.0) AS cdf
  FROM cclip3
),
ccorn AS (
  SELECT *, row / CAST(th AS DOUBLE) - 0.5 AS rf, col / CAST(tw AS DOUBLE) - 0.5 AS cf
  FROM pbin
),
ccorn2 AS (SELECT *, GREATEST(FLOOR(rf), 0.0) AS tyf, GREATEST(FLOOR(cf), 0.0) AS txf FROM ccorn),
ccorn3 AS (
  SELECT *, rf - tyf AS dy, cf - txf AS dx,
         CAST(LEAST(tyf, {TILES - 1}.0) AS INTEGER) AS ty0,
         CAST(LEAST(txf, {TILES - 1}.0) AS INTEGER) AS tx0,
         CAST(LEAST(tyf + 1, {TILES - 1}.0) AS INTEGER) AS ty1,
         CAST(LEAST(txf + 1, {TILES - 1}.0) AS INTEGER) AS tx1
  FROM ccorn2
)
SELECT {keys},
  CASE WHEN c.valid THEN CAST(FLOOR(LEAST(GREATEST(
    (c00.cdf * (1.0 - c.dx) + c01.cdf * c.dx) * (1.0 - c.dy)
    + (c10.cdf * (1.0 - c.dx) + c11.cdf * c.dx) * c.dy, 0.0), 1.0) * {max_val!r}) AS INTEGER)
  ELSE 0 END AS {out}
FROM ccorn3 c
JOIN ccdf c00 ON c00.{g} = c.{g} AND c00.ty = c.ty0 AND c00.tx = c.tx0 AND c00.bin = c.bin
JOIN ccdf c01 ON c01.{g} = c.{g} AND c01.ty = c.ty0 AND c01.tx = c.tx1 AND c01.bin = c.bin
JOIN ccdf c10 ON c10.{g} = c.{g} AND c10.ty = c.ty1 AND c10.tx = c.tx0 AND c10.bin = c.bin
JOIN ccdf c11 ON c11.{g} = c.{g} AND c11.ty = c.ty1 AND c11.tx = c.tx1 AND c11.bin = c.bin
""".strip()

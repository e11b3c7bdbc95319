"""G1/G2/G3/G4/G6: geometric operators.

Reference (studied, not copied):
  G1 ``calculate_resize_dimensions`` (resize.rs:6-30): long side -> target,
     short side scaled proportionally with round-half-away; no-op (original
     dims) if target > long side.
  G2 Lanczos3 resize (resize.rs:32-89): separable Lanczos a=3 convolution.
     Rebuilt as a grouped pandas kernel (``lanczos_resize_grouped``) — per
     product, O(rows*cols*support) numpy; plus an oracle-friendly box-filter
     analog (``box_resize``) as groupBy(row/k, col/k).avg.
  G4 ``add_padding_to_square`` (padding.rs:5-49): centered copy into a
     max_dim^2 zero canvas; pad = (max_dim - dim) / 2 (integer division).
  G6 geotransform update (save.rs:67-87): gt1 *= cols/final_cols;
     gt5 *= rows/final_rows; gt0 -= pad_left*gt1'; gt3 -= pad_top*gt5'.

Scale notes: padding is expressed as canvas-generate + co-partitioned left
join (never a collect); the canvas explode is O(max_dim^2) rows per product,
distributed. Resize keeps each product's block in one task via applyInPandas
keyed by product — the same partitioning unit the batch dataflow already uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calculate_resize_dimensions(cols: int, rows: int, target: int) -> tuple[int, int]:
    """G1 (pure): returns (new_cols, new_rows)."""
    short, long_ = min(rows, cols), max(rows, cols)
    if target > long_:
        return cols, rows
    scale = target / long_
    new_short = int(np.floor(short * scale + 0.5))  # round half away (positive)
    return (target, new_short) if cols > rows else (new_short, target)


# --- G4: pad to square -------------------------------------------------------


def product_dims(px: DataFrame, group_cols: list[str]) -> DataFrame:
    """Per-product raster dims from a dense pixel frame (row/col 0-based)."""
    return px.groupBy(*group_cols).agg(
        (F.max("col") + 1).cast("int").alias("cols"),
        (F.max("row") + 1).cast("int").alias("rows"),
    )


def pad_to_square(
    px: DataFrame,
    group_cols: list[str],
    value: str = "v",
    fill=0.0,
    dims: DataFrame | None = None,
) -> DataFrame:
    """G4: centered zero-pad each product's raster to max_dim x max_dim.

    Scale design (the r01 version exploded the full max_dim^2 canvas out of
    ONE dims row per product — 704M rows in a single task at the reference's
    native 26544^2 products — then shuffled all of them through a cell-grain
    join): here the canvas only ever exists at ROW grain until the final
    narrow projection.

      1. dims -> explode rows (one row-stub per canvas row),
      2. repartition on (group, row) so canvas rows spread across the cluster,
      3. data rows collapse to a per-(group, row) col->value map (one shuffle
         of the data at row grain, map-side combine),
      4. left-join maps to row-stubs on (group, row) — co-partitioned,
      5. col-explode + map lookup emits the max_dim^2 cells INSIDE the task.

    No max_dim^2-row shuffle exists anywhere in the plan; per-task memory is
    O(cols) for the row map, and cell materialization parallelism is
    (products x max_dim) row-stubs.
    """
    if dims is None:
        dims = product_dims(px, group_cols)
    dims = dims.select(
        *group_cols,
        "cols",
        "rows",
        F.greatest("cols", "rows").alias("max_dim"),
        ((F.greatest("cols", "rows") - F.col("cols")) / 2).cast("int").alias("pad_cols"),
        ((F.greatest("cols", "rows") - F.col("rows")) / 2).cast("int").alias("pad_rows"),
    )
    row_stubs = dims.select(
        *group_cols,
        "max_dim",
        F.explode(F.sequence(F.lit(0), F.col("max_dim") - 1)).alias("row"),
    ).repartition(*group_cols, "row")
    shifted = px.join(
        F.broadcast(dims.select(*group_cols, "pad_cols", "pad_rows")), group_cols
    ).select(
        *group_cols,
        (F.col("row") + F.col("pad_rows")).alias("row"),
        (F.col("col") + F.col("pad_cols")).alias("col"),
        F.col(value),
    )
    row_maps = shifted.groupBy(*group_cols, "row").agg(
        F.map_from_entries(F.collect_list(F.struct("col", value))).alias("_vals")
    )
    joined = row_stubs.join(row_maps, on=[*group_cols, "row"], how="left")
    return joined.select(
        *group_cols,
        "row",
        F.explode(F.sequence(F.lit(0), F.col("max_dim") - 1)).alias("col"),
        "_vals",
    ).select(
        *group_cols,
        "row",
        "col",
        F.coalesce(F.element_at(F.col("_vals"), F.col("col")), F.lit(fill)).alias(value),
    )


def sql_pad_to_square(src_rel: str, group_cols: list[str], value: str = "v", fill: str = "0.0") -> str:
    """DuckDB twin of :func:`pad_to_square` over relation ``src_rel`` with
    columns group_cols + row + col + value. Returns CTEs ending in ``padded``."""
    g = ", ".join(group_cols)
    gd = ", ".join(f"d.{c}" for c in group_cols)
    return f"""
dims AS (
  -- NOTE: DuckDB CAST(double AS INT) rounds while Spark cast truncates —
  -- always FLOOR before casting on the SQL side.
  SELECT {g}, CAST(MAX(col)+1 AS INTEGER) AS cols, CAST(MAX(row)+1 AS INTEGER) AS rows,
         CAST(GREATEST(MAX(col)+1, MAX(row)+1) AS INTEGER) AS max_dim,
         CAST(FLOOR((GREATEST(MAX(col)+1, MAX(row)+1) - (MAX(col)+1)) / 2.0) AS INTEGER) AS pad_cols,
         CAST(FLOOR((GREATEST(MAX(col)+1, MAX(row)+1) - (MAX(row)+1)) / 2.0) AS INTEGER) AS pad_rows
  FROM {src_rel} GROUP BY {g}
),
canvas AS (
  SELECT {gd}, r.i AS row, c.i AS col, d.pad_cols, d.pad_rows
  FROM dims d,
       LATERAL (SELECT UNNEST(RANGE(0, d.max_dim)) AS i) r,
       LATERAL (SELECT UNNEST(RANGE(0, d.max_dim)) AS i) c
),
shifted AS (
  SELECT s.{g.replace(', ', ', s.')}, s.row + d.pad_rows AS row, s.col + d.pad_cols AS col, s.{value}
  FROM {src_rel} s JOIN dims d USING ({g})
),
padded AS (
  SELECT cv.{g.replace(', ', ', cv.')}, cv.row, cv.col, COALESCE(sh.{value}, {fill}) AS {value}
  FROM canvas cv LEFT JOIN shifted sh USING ({g}, row, col)
)""".strip()


# --- G2 relational analog: box resize ----------------------------------------


def box_resize(px: DataFrame, group_cols: list[str], k: int, value: str = "v") -> DataFrame:
    """Average-pool k x k cells — the oracle-checkable resize analog (the
    reference's GDAL Average path for >=4x reductions, sentinel1.rs:1074-1108).
    Single shuffle with map-side combine."""
    return (
        px.groupBy(
            *group_cols,
            F.floor(F.col("row") / k).cast("int").alias("row"),
            F.floor(F.col("col") / k).cast("int").alias("col"),
        )
        .agg(F.avg(value).alias(value), F.count(F.lit(1)).alias("n_src"))
    )


# --- G2 fidelity path: separable Lanczos3 via applyInPandas ------------------


def _lanczos_kernel(x: np.ndarray, a: int = 3) -> np.ndarray:
    out = np.sinc(x) * np.sinc(x / a)
    out[np.abs(x) >= a] = 0.0
    return out


def _lanczos_weights(src: int, dst: int, a: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-pixel source start indices + normalized weight matrix
    (pixel-center convention, kernel widened when minifying)."""
    scale = src / dst
    support = a * max(scale, 1.0)
    centers = (np.arange(dst) + 0.5) * scale - 0.5
    start = np.maximum(np.ceil(centers - support).astype(np.int64), 0)
    width = int(np.ceil(2 * support)) + 1
    idx = start[:, None] + np.arange(width)[None, :]
    mask = idx < src
    idx = np.minimum(idx, src - 1)
    x = (idx - centers[:, None]) / max(scale, 1.0)
    w = _lanczos_kernel(x, a) * mask
    wsum = w.sum(axis=1, keepdims=True)
    w = np.divide(w, wsum, out=np.zeros_like(w), where=wsum != 0)
    return start, w


def lanczos_resize_array(img: np.ndarray, new_rows: int, new_cols: int, a: int = 3) -> np.ndarray:
    """Separable Lanczos-a resample of a 2-D array (float64 accumulation)."""
    rows, cols = img.shape
    startc, wc = _lanczos_weights(cols, new_cols, a)
    idxc = np.minimum(startc[:, None] + np.arange(wc.shape[1])[None, :], cols - 1)
    tmp = (img[:, idxc] * wc[None, :, :]).sum(axis=2)  # rows x new_cols
    startr, wr = _lanczos_weights(rows, new_rows, a)
    idxr = np.minimum(startr[:, None] + np.arange(wr.shape[1])[None, :], rows - 1)
    out = (tmp[idxr, :] * wr[:, :, None]).sum(axis=1)
    return out


def lanczos_resize_grouped(
    px: DataFrame,
    group_cols: list[str],
    target_size: int,
    value: str = "q",
    clamp_max: int = 255,
) -> DataFrame:
    """G2/G3: per-product Lanczos3 resize to ``target_size`` long side via
    applyInPandas — each product is one grouped-map task (the reference's unit
    of work), Arrow both ways, no driver involvement."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    key_fields = [px.schema[c] for c in group_cols]
    schema = StructType(
        key_fields
        + [
            StructField("row", IntegerType()),
            StructField("col", IntegerType()),
            StructField(value, IntegerType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = int(pdf["row"].max()) + 1
        cols = int(pdf["col"].max()) + 1
        img = np.zeros((rows, cols), dtype=np.float64)
        img[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf[value].to_numpy(dtype=np.float64)
        new_cols, new_rows = calculate_resize_dimensions(cols, rows, target_size)
        if (new_cols, new_rows) == (cols, rows):
            res = img
        else:
            res = lanczos_resize_array(img, new_rows, new_cols)
        res = np.clip(np.floor(res + 0.5), 0, clamp_max).astype(np.int32)
        rr, cc = np.meshgrid(np.arange(res.shape[0]), np.arange(res.shape[1]), indexing="ij")
        out = pd.DataFrame(
            {
                "row": rr.ravel().astype(np.int32),
                "col": cc.ravel().astype(np.int32),
                value: res.ravel(),
            }
        )
        for c in group_cols:
            out.insert(0, c, pdf[c].iloc[0])
        return out

    return px.groupBy(*group_cols).applyInPandas(fn, schema=schema)


# --- G6: geotransform update -------------------------------------------------


def geotransform_update(
    dims: DataFrame,
    target_size: int | None,
    pad: bool,
    gt_cols: tuple[str, ...] = ("gt0", "gt1", "gt2", "gt3", "gt4", "gt5"),
) -> DataFrame:
    """G1 + G3 dims plumbing + G6 column math over a per-product frame carrying
    cols/rows + a 6-element geotransform as columns gt0..gt5.

    Mirrors resize_image_data_with_meta (resize.rs:91-236) + the gt update in
    save.rs:67-87: scale factors from the resize, centered-pad shifts, then
      gt1' = gt1 * cols/final_cols,  gt5' = gt5 * rows/final_rows,
      gt0' = gt0 - pad_left*gt1',    gt3' = gt3 - pad_top*gt5'.
    """
    cols, rows = F.col("cols"), F.col("rows")
    if target_size is None:
        new_cols, new_rows = cols, rows
    else:
        long_ = F.greatest(cols, rows)
        short = F.least(cols, rows)
        scale = F.lit(float(target_size)) / long_.cast("double")
        new_short = F.floor(short.cast("double") * scale + F.lit(0.5)).cast("int")
        no_op = F.lit(target_size) > long_
        tgt = F.lit(target_size)
        new_cols = F.when(no_op, cols).otherwise(F.when(cols > rows, tgt).otherwise(new_short))
        new_rows = F.when(no_op, rows).otherwise(F.when(cols > rows, new_short).otherwise(tgt))
    d = dims.withColumn("new_cols", new_cols).withColumn("new_rows", new_rows)
    if pad:
        fd = F.greatest(F.col("new_cols"), F.col("new_rows"))
        d = (
            d.withColumn("final_cols", fd)
            .withColumn("final_rows", fd)
            .withColumn("pad_left", ((fd - F.col("new_cols")) / 2).cast("int"))
            .withColumn("pad_top", ((fd - F.col("new_rows")) / 2).cast("int"))
        )
    else:
        d = (
            d.withColumn("final_cols", F.col("new_cols"))
            .withColumn("final_rows", F.col("new_rows"))
            .withColumn("pad_left", F.lit(0))
            .withColumn("pad_top", F.lit(0))
        )
    g0, g1, g2, g3, g4, g5 = (F.col(c) for c in gt_cols)
    gt1n = g1 * (cols.cast("double") / F.col("final_cols").cast("double"))
    gt5n = g5 * (rows.cast("double") / F.col("final_rows").cast("double"))
    d = d.withColumn("gt1_new", gt1n).withColumn("gt5_new", gt5n)
    d = d.withColumn(
        "gt0_new", g0 - F.col("pad_left").cast("double") * F.col("gt1_new")
    ).withColumn("gt3_new", g3 - F.col("pad_top").cast("double") * F.col("gt5_new"))
    return d


# --- G5: in-engine affine warp (bilinear) ------------------------------------


def affine_warp_bilinear(
    px: DataFrame,
    geo: DataFrame,
    group_cols: list[str],
    value: str = "v",
) -> DataFrame:
    """G5 brought in-engine for the affine case: resample each product from
    its source grid onto a per-product TARGET grid with bilinear weights.
    The reference shells out to gdalwarp for this (sentinel1.rs:914-1072);
    full curvilinear CRS reprojection (datum shifts) stays external, but the
    affine warp — scale / shear / rotation / translation onto a target
    geotransform, the dominant GRD case — is pure relational algebra:

      1. target canvas at ROW grain (explode rows -> repartition -> explode
         cols inside the task; the pad_to_square scale pattern — no
         O(rows*cols) single-task explode),
      2. inverse-affine source coordinates as column expressions,
      3. EXPLODE the 4 bilinear corners (dr, dc) with their weights,
      4. one co-partitioned join against the source pixel frame,
      5. groupBy target cell: value = SUM(w*v)/SUM(w) over present corners
         (edge cells renormalize; fully out-of-footprint cells drop).

    ``geo`` carries per product: sg0..sg5 (source geotransform), dg0..dg5
    (target geotransform), dst_rows, dst_cols. Weighted-sum determinism: with
    dyadic geotransforms and integer-quantized values every w*v product is
    exact in f64, so the 4-corner sum is order-independent — the oracle twin
    (sql_affine_warp) hash-matches bit-for-bit.
    """
    gcols = [F.col(c) for c in group_cols]
    stubs = geo.select(
        *gcols, "sg0", "sg1", "sg2", "sg3", "sg4", "sg5",
        "dg0", "dg1", "dg2", "dg3", "dg4", "dg5", "dst_cols",
        F.explode(F.sequence(F.lit(0), F.col("dst_rows") - 1)).alias("row"),
    ).repartition(*group_cols, "row")
    cells = stubs.select(
        *gcols, "sg0", "sg1", "sg2", "sg3", "sg4", "sg5",
        "dg0", "dg1", "dg2", "dg3", "dg4", "dg5", "row",
        F.explode(F.sequence(F.lit(0), F.col("dst_cols") - 1)).alias("col"),
    )
    x = F.col("dg0") + (F.col("col") + 0.5) * F.col("dg1") + (F.col("row") + 0.5) * F.col("dg2")
    y = F.col("dg3") + (F.col("col") + 0.5) * F.col("dg4") + (F.col("row") + 0.5) * F.col("dg5")
    det = F.col("sg1") * F.col("sg5") - F.col("sg2") * F.col("sg4")
    cs = ((x - F.col("sg0")) * F.col("sg5") - (y - F.col("sg3")) * F.col("sg2")) / det - 0.5
    rs = ((y - F.col("sg3")) * F.col("sg1") - (x - F.col("sg0")) * F.col("sg4")) / det - 0.5
    coords = cells.select(*gcols, "row", "col", cs.alias("cs"), rs.alias("rs"))
    return bilinear_gather(coords, px, group_cols, value)


def bilinear_gather(
    coords: DataFrame,
    px: DataFrame,
    group_cols: list[str],
    value: str = "v",
) -> DataFrame:
    """Shared bilinear resampler: ``coords`` carries one row per TARGET cell
    (group, row, col, cs, rs) with fractional source pixel coordinates;
    returns the weighted 4-corner sample from ``px``. Corner explode -> one
    co-partitioned join -> per-cell weighted agg (edge cells renormalize by
    the present-corner weight mass; fully out-of-footprint cells drop)."""
    gcols = [F.col(c) for c in group_cols]
    cs, rs = F.col("cs"), F.col("rs")
    src = coords.select(
        *gcols, "row", "col",
        F.floor(cs).cast("int").alias("c0"),
        F.floor(rs).cast("int").alias("r0"),
        (cs - F.floor(cs)).alias("wc"),
        (rs - F.floor(rs)).alias("wr"),
    )
    corners = src.select(
        *gcols, "row", "col", "c0", "r0", "wc", "wr",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
                    for dr in (0, 1)
                    for dc in (0, 1)
                ]
            )
        ).alias("k"),
    ).select(
        *gcols, "row", "col",
        (F.col("r0") + F.col("k.dr")).alias("srow"),
        (F.col("c0") + F.col("k.dc")).alias("scol"),
        (
            F.when(F.col("k.dr") == 1, F.col("wr")).otherwise(1.0 - F.col("wr"))
            * F.when(F.col("k.dc") == 1, F.col("wc")).otherwise(1.0 - F.col("wc"))
        ).alias("w"),
    )
    srcpx = px.select(
        *gcols, F.col("row").alias("srow"), F.col("col").alias("scol"),
        F.col(value).cast("double").alias("_v"),
    )
    hit = corners.join(srcpx, [*group_cols, "srow", "scol"])
    return (
        hit.groupBy(*group_cols, "row", "col")
        .agg(F.sum(F.col("w") * F.col("_v")).alias("_wv"), F.sum("w").alias("_w"))
        .where(F.col("_w") > 0.0)
        .select(*gcols, "row", "col", (F.col("_wv") / F.col("_w")).alias(value))
    )


# --- G5b: piecewise-affine warp from a GCP grid (the reference's TPS path) ---


def fit_gcp_tiles(gcps: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Least-squares affine fit per GCP grid cell.

    ``gcps``: (group, gi, gj, gx, gy) — ground coordinates observed at source
    pixel (row=k*gi, col=k*gj), pixel-index (center) convention. Returns one
    row per tile (gi, gj) with the pixel->ground affine
        x = a + b*scol + c*srow,  y = d + e*scol + f_*srow
    fit through the tile's 4 corner GCPs (for 4 corners of a k x k cell the
    LS solution is the closed form below; when the 4 corners are exactly
    affine-consistent the fit interpolates them), plus the tile's ground
    bounding box for candidate pruning.

    Mirrors the reference's no-projection fallback ``gdalwarp -tps`` from the
    product's GCP grid (/root/reference/src/io/sentinel1.rs:1017-1032): TPS is
    approximated piecewise — exact at every GCP, affine between them — which
    is the standard tile-wise approximation of a smooth warp grid.
    """
    g00 = gcps.select(*group_cols, "gi", "gj", F.col("gx").alias("x00"), F.col("gy").alias("y00"))
    g01 = gcps.select(*group_cols, "gi", (F.col("gj") - 1).alias("gj"), F.col("gx").alias("x01"), F.col("gy").alias("y01"))
    g10 = gcps.select(*group_cols, (F.col("gi") - 1).alias("gi"), "gj", F.col("gx").alias("x10"), F.col("gy").alias("y10"))
    g11 = gcps.select(*group_cols, (F.col("gi") - 1).alias("gi"), (F.col("gj") - 1).alias("gj"), F.col("gx").alias("x11"), F.col("gy").alias("y11"))
    keys = [*group_cols, "gi", "gj"]
    t = g00.join(g01, keys).join(g10, keys).join(g11, keys)
    kf = float(k)
    b = ((F.col("x01") - F.col("x00")) + (F.col("x11") - F.col("x10"))) / (2.0 * kf)
    c = ((F.col("x10") - F.col("x00")) + (F.col("x11") - F.col("x01"))) / (2.0 * kf)
    e = ((F.col("y01") - F.col("y00")) + (F.col("y11") - F.col("y10"))) / (2.0 * kf)
    f_ = ((F.col("y10") - F.col("y00")) + (F.col("y11") - F.col("y01"))) / (2.0 * kf)
    mean_col = (F.col("gj").cast("double") * kf) + kf / 2.0
    mean_row = (F.col("gi").cast("double") * kf) + kf / 2.0
    mean_x = (F.col("x00") + F.col("x01") + F.col("x10") + F.col("x11")) / 4.0
    mean_y = (F.col("y00") + F.col("y01") + F.col("y10") + F.col("y11")) / 4.0
    return t.select(
        *group_cols,
        F.col("gi").alias("ti"),
        F.col("gj").alias("tj"),
        (mean_x - b * mean_col - c * mean_row).alias("a"),
        b.alias("b"),
        c.alias("c"),
        (mean_y - e * mean_col - f_ * mean_row).alias("d"),
        e.alias("e"),
        f_.alias("f_"),
        F.least("x00", "x01", "x10", "x11").alias("xmin"),
        F.greatest("x00", "x01", "x10", "x11").alias("xmax"),
        F.least("y00", "y01", "y10", "y11").alias("ymin"),
        F.greatest("y00", "y01", "y10", "y11").alias("ymax"),
    )


def warp_gcp_grid(
    px: DataFrame,
    gcps: DataFrame,
    geo: DataFrame,
    group_cols: list[str],
    k: int,
    bucket: float = 256.0,
    value: str = "v",
) -> DataFrame:
    """G5 curvilinear path in-engine: piecewise-affine warp over a GCP grid.

      1. fit per-tile affines from the GCP grid (tiny relation: a k^2-fold
         reduction of the raster — broadcastable at any product size),
      2. target canvas at ROW grain (same scale shape as affine_warp),
      3. candidate tile lookup via a GROUND-space bucket equi-join (each tile
         emits keys covering its bbox; each cell one key) — never cell x tile,
      4. exact membership by inverse affine: the cell belongs to the tile
         whose pixel rectangle contains its source coordinate (half-open;
         outer boundary owned by the last tile row/col),
      5. shared bilinear gather against the source pixels.

    ``geo`` carries per product: dg0..dg5 + dst_rows/dst_cols (target grid).
    The reference handles this case by shelling to ``gdalwarp -tps``
    (sentinel1.rs:1017-1032); here the warp stays relational end-to-end.
    """
    gcols = [F.col(c) for c in group_cols]
    tiles = fit_gcp_tiles(gcps, group_cols, k)
    nmax = tiles.groupBy(*group_cols).agg(
        F.max("ti").alias("_ti_max"), F.max("tj").alias("_tj_max")
    )
    tiles = tiles.join(F.broadcast(nmax), group_cols)
    # bucket cover of each tile's ground bbox (bbox spans are O(k * pixel
    # scale); the explode fanout is bounded by ceil(span/bucket)^2)
    tiles_b = tiles.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("xmin") / bucket).cast("long"),
                F.floor(F.col("xmax") / bucket).cast("long"),
            )
        ).alias("bx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("ymin") / bucket).cast("long"),
                F.floor(F.col("ymax") / bucket).cast("long"),
            )
        ).alias("by"),
    )
    stubs = geo.select(
        *gcols, "dg0", "dg1", "dg2", "dg3", "dg4", "dg5", "dst_cols",
        F.explode(F.sequence(F.lit(0), F.col("dst_rows") - 1)).alias("row"),
    ).repartition(*group_cols, "row")
    cells = stubs.select(
        *gcols, "row",
        F.explode(F.sequence(F.lit(0), F.col("dst_cols") - 1)).alias("col"),
        (F.col("dg0") + (F.col("col") + 0.5) * F.col("dg1") + (F.col("row") + 0.5) * F.col("dg2")).alias("x"),
        (F.col("dg3") + (F.col("col") + 0.5) * F.col("dg4") + (F.col("row") + 0.5) * F.col("dg5")).alias("y"),
    ).select(
        *gcols, "row", "col", "x", "y",
        F.floor(F.col("x") / bucket).cast("long").alias("bx"),
        F.floor(F.col("y") / bucket).cast("long").alias("by"),
    )
    # tiles are a k^2-fold reduction of the raster — broadcastable at any
    # product size; pin it so the plan never degrades to a shuffle join on
    # the full cell grid (AQE would usually pick this, but the intent is
    # structural, not a runtime accident)
    cand = cells.join(F.broadcast(tiles_b), [*group_cols, "bx", "by"])
    det = F.col("b") * F.col("f_") - F.col("c") * F.col("e")
    cs = ((F.col("x") - F.col("a")) * F.col("f_") - (F.col("y") - F.col("d")) * F.col("c")) / det
    rs = ((F.col("y") - F.col("d")) * F.col("b") - (F.col("x") - F.col("a")) * F.col("e")) / det
    kf = float(k)
    lo_c, hi_c = F.col("tj") * kf, (F.col("tj") + 1) * kf
    lo_r, hi_r = F.col("ti") * kf, (F.col("ti") + 1) * kf
    inside = (
        (cs >= lo_c)
        & ((cs < hi_c) | ((F.col("tj") == F.col("_tj_max")) & (cs <= hi_c)))
        & (rs >= lo_r)
        & ((rs < hi_r) | ((F.col("ti") == F.col("_ti_max")) & (rs <= hi_r)))
    )
    coords = cand.select(
        *gcols, "row", "col", cs.alias("cs"), rs.alias("rs"), inside.alias("_in")
    ).where(F.col("_in")).drop("_in")
    return bilinear_gather(coords, px, group_cols, value)


def sql_warp_gcp_grid(
    px_rel: str,
    gcp_rel: str,
    geo_rel: str,
    group_cols: list[str],
    k: int,
    bucket: float = 256.0,
    value: str = "v",
) -> str:
    """DuckDB twin of :func:`warp_gcp_grid`. ``gcp_rel`` yields (group, gi,
    gj, gx, gy); ``geo_rel`` yields (group, dg0..dg5, dst_rows, dst_cols).
    Returns CTEs ending in ``warped``."""
    g = ", ".join(group_cols)
    gt = ", ".join(f"t.{c}" for c in group_cols)
    gg = ", ".join(f"g.{c}" for c in group_cols)
    kf = float(k)
    return f"""
gcorners AS (
  SELECT {g}, gi AS ti, gj AS tj,
         MAX(CASE WHEN oi = 0 AND oj = 0 THEN 1 ELSE 0 END) AS _h00,
         MAX(CASE WHEN oi = 0 AND oj = 0 THEN gx END) AS x00,
         MAX(CASE WHEN oi = 0 AND oj = 1 THEN gx END) AS x01,
         MAX(CASE WHEN oi = 1 AND oj = 0 THEN gx END) AS x10,
         MAX(CASE WHEN oi = 1 AND oj = 1 THEN gx END) AS x11,
         MAX(CASE WHEN oi = 0 AND oj = 0 THEN gy END) AS y00,
         MAX(CASE WHEN oi = 0 AND oj = 1 THEN gy END) AS y01,
         MAX(CASE WHEN oi = 1 AND oj = 0 THEN gy END) AS y10,
         MAX(CASE WHEN oi = 1 AND oj = 1 THEN gy END) AS y11,
         COUNT(*) AS _nc
  FROM (
    SELECT {g}, gx, gy, gi - o.oi AS gi, gj - o.oj AS gj, o.oi, o.oj
    FROM {gcp_rel} p,
         LATERAL (SELECT UNNEST([0,0,1,1]) AS oi, UNNEST([0,1,0,1]) AS oj) o
  ) s
  GROUP BY {g}, gi, gj
  HAVING COUNT(*) = 4 AND MAX(CASE WHEN oi = 0 AND oj = 0 THEN 1 ELSE 0 END) = 1
),
tilesw AS (
  SELECT {g}, ti, tj,
         ((x00+x01+x10+x11)/4.0
            - (((x01-x00)+(x11-x10))/{2.0 * kf!r}) * (tj*{kf!r} + {kf / 2.0!r})
            - (((x10-x00)+(x11-x01))/{2.0 * kf!r}) * (ti*{kf!r} + {kf / 2.0!r})) AS a,
         ((x01-x00)+(x11-x10))/{2.0 * kf!r} AS b,
         ((x10-x00)+(x11-x01))/{2.0 * kf!r} AS c,
         ((y00+y01+y10+y11)/4.0
            - (((y01-y00)+(y11-y10))/{2.0 * kf!r}) * (tj*{kf!r} + {kf / 2.0!r})
            - (((y10-y00)+(y11-y01))/{2.0 * kf!r}) * (ti*{kf!r} + {kf / 2.0!r})) AS d,
         ((y01-y00)+(y11-y10))/{2.0 * kf!r} AS e,
         ((y10-y00)+(y11-y01))/{2.0 * kf!r} AS f_,
         LEAST(x00,x01,x10,x11) AS xmin, GREATEST(x00,x01,x10,x11) AS xmax,
         LEAST(y00,y01,y10,y11) AS ymin, GREATEST(y00,y01,y10,y11) AS ymax
  FROM gcorners
),
tmax AS (SELECT {g}, MAX(ti) AS _ti_max, MAX(tj) AS _tj_max FROM tilesw GROUP BY {g}),
tilesb AS (
  SELECT t.*, m._ti_max, m._tj_max, bx.i AS bx, by.i AS by
  FROM tilesw t JOIN tmax m USING ({g}),
       LATERAL (SELECT UNNEST(RANGE(CAST(FLOOR(t.xmin/{bucket!r}) AS BIGINT),
                                    CAST(FLOOR(t.xmax/{bucket!r}) AS BIGINT) + 1)) AS i) bx,
       LATERAL (SELECT UNNEST(RANGE(CAST(FLOOR(t.ymin/{bucket!r}) AS BIGINT),
                                    CAST(FLOOR(t.ymax/{bucket!r}) AS BIGINT) + 1)) AS i) by
),
gcellsw AS (
  SELECT {gg}, r.i AS row, c.i AS col,
         g.dg0 + (c.i + 0.5) * g.dg1 + (r.i + 0.5) * g.dg2 AS x,
         g.dg3 + (c.i + 0.5) * g.dg4 + (r.i + 0.5) * g.dg5 AS y
  FROM {geo_rel} g,
       LATERAL (SELECT UNNEST(RANGE(0, g.dst_rows)) AS i) r,
       LATERAL (SELECT UNNEST(RANGE(0, g.dst_cols)) AS i) c
),
gcand AS (
  SELECT {gt}, t.ti, t.tj, t._ti_max, t._tj_max, cl.row, cl.col,
         ((cl.x - t.a) * t.f_ - (cl.y - t.d) * t.c) / (t.b * t.f_ - t.c * t.e) AS cs,
         ((cl.y - t.d) * t.b - (cl.x - t.a) * t.e) / (t.b * t.f_ - t.c * t.e) AS rs
  FROM gcellsw cl
  JOIN tilesb t
    ON {' AND '.join(f't.{c} = cl.{c}' for c in group_cols)}
   AND t.bx = CAST(FLOOR(cl.x/{bucket!r}) AS BIGINT)
   AND t.by = CAST(FLOOR(cl.y/{bucket!r}) AS BIGINT)
),
gcoords AS (
  SELECT {g}, row, col, cs, rs
  FROM gcand
  WHERE cs >= tj * {kf!r} AND (cs < (tj + 1) * {kf!r} OR (tj = _tj_max AND cs <= (tj + 1) * {kf!r}))
    AND rs >= ti * {kf!r} AND (rs < (ti + 1) * {kf!r} OR (ti = _ti_max AND rs <= (ti + 1) * {kf!r}))
),
gcornerw AS (
  SELECT {g}, row, col,
         CAST(FLOOR(rs) AS INTEGER) + kk.dr AS srow,
         CAST(FLOOR(cs) AS INTEGER) + kk.dc AS scol,
         (CASE WHEN kk.dr = 1 THEN rs - FLOOR(rs) ELSE 1.0 - (rs - FLOOR(rs)) END)
       * (CASE WHEN kk.dc = 1 THEN cs - FLOOR(cs) ELSE 1.0 - (cs - FLOOR(cs)) END) AS w
  FROM gcoords,
       LATERAL (SELECT UNNEST([0,0,1,1]) AS dr, UNNEST([0,1,0,1]) AS dc) kk
),
warped AS (
  SELECT {g}, row, col, SUM(w * _v) / SUM(w) AS {value}
  FROM (
    SELECT c.*, CAST(p.{value} AS DOUBLE) AS _v
    FROM gcornerw c
    JOIN {px_rel} p
      ON {' AND '.join(f'p.{c} = c.{c}' for c in group_cols)}
     AND p.row = c.srow AND p.col = c.scol
  ) j
  GROUP BY {g}, row, col
  HAVING SUM(w) > 0.0
)""".strip()


def sql_affine_warp(
    px_rel: str,
    geo_rel: str,
    group_cols: list[str],
    value: str = "v",
) -> str:
    """DuckDB twin of :func:`affine_warp_bilinear`. ``px_rel`` yields
    (group, row, col, value); ``geo_rel`` yields (group, sg0..sg5, dg0..dg5,
    dst_rows, dst_cols). Returns CTEs ending in ``warped``."""
    g = ", ".join(group_cols)
    gg = ", ".join(f"g.{c}" for c in group_cols)
    gs = ", ".join(f"s.{c}" for c in group_cols)
    return f"""
cellsw AS (
  SELECT {gg}, r.i AS row, c.i AS col,
         g.dg0 + (c.i + 0.5) * g.dg1 + (r.i + 0.5) * g.dg2 AS x,
         g.dg3 + (c.i + 0.5) * g.dg4 + (r.i + 0.5) * g.dg5 AS y,
         g.sg0, g.sg1, g.sg2, g.sg3, g.sg4, g.sg5
  FROM {geo_rel} g,
       LATERAL (SELECT UNNEST(RANGE(0, g.dst_rows)) AS i) r,
       LATERAL (SELECT UNNEST(RANGE(0, g.dst_cols)) AS i) c
),
srccoord AS (
  SELECT {g}, row, col,
         ((x - sg0) * sg5 - (y - sg3) * sg2) / (sg1 * sg5 - sg2 * sg4) - 0.5 AS cs,
         ((y - sg3) * sg1 - (x - sg0) * sg4) / (sg1 * sg5 - sg2 * sg4) - 0.5 AS rs
  FROM cellsw
),
cornersw AS (
  SELECT {gs}, s.row, s.col,
         CAST(FLOOR(s.rs) AS INTEGER) + k.dr AS srow,
         CAST(FLOOR(s.cs) AS INTEGER) + k.dc AS scol,
         (CASE WHEN k.dr = 1 THEN s.rs - FLOOR(s.rs) ELSE 1.0 - (s.rs - FLOOR(s.rs)) END)
       * (CASE WHEN k.dc = 1 THEN s.cs - FLOOR(s.cs) ELSE 1.0 - (s.cs - FLOOR(s.cs)) END) AS w
  FROM srccoord s,
       LATERAL (SELECT UNNEST([0,0,1,1]) AS dr, UNNEST([0,1,0,1]) AS dc) k
),
warped AS (
  SELECT {g}, row, col, SUM(w * _v) / SUM(w) AS {value}
  FROM (
    SELECT c.*, CAST(p.{value} AS DOUBLE) AS _v
    FROM cornersw c
    JOIN {px_rel} p
      ON {' AND '.join(f'p.{c} = c.{c}' for c in group_cols)}
     AND p.row = c.srow AND p.col = c.scol
  ) j
  GROUP BY {g}, row, col
  HAVING SUM(w) > 0.0
)""".strip()

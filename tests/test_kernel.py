"""Grouped-kernel image path: bit-equivalence against the relational
operators on the synthetic band frame (same f64 formulas, same outputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sarpro_spark import frames
from sarpro_spark.operators import autoscale as asc
from sarpro_spark.operators import clahe as clh
from sarpro_spark.operators import elementwise as ew
from sarpro_spark.operators import kernel as krn
from sarpro_spark.operators import stats as st
from sarpro_spark.types import AutoscaleStrategy, BitDepth


def _relational(spark, sf_dir, strategy, bd):
    px = ew.with_db_mask(frames.single_band(spark, sf_dir, "vv"))
    if strategy == AutoscaleStrategy.CLAHE:
        out = clh.clahe_quantize(px, ["product_id"], bd)
    elif strategy == "standard-a2":
        stats = st.histogram_stats(px, ["product_id"])
        params = asc.params_standard(stats, ["product_id"])
        if bd == BitDepth.U16:
            out = asc.apply_params(px, params, ["product_id"], bd)
        else:
            q16 = asc.apply_params(px, params, ["product_id"], BitDepth.U8, out="_q16")
            out = asc.scale_u16_to_u8(q16, ["product_id"], value="_q16", out="q").drop("_q16")
    else:
        out = asc.autoscale_to_bitdepth(px, ["product_id"], strategy, bd)
    return out.select("product_id", "row", "col", "q")


@pytest.mark.parametrize(
    "strategy,bd",
    [
        ("standard-a2", BitDepth.U16),
        ("standard-a2", BitDepth.U8),
        (AutoscaleStrategy.ROBUST, BitDepth.U16),
        (AutoscaleStrategy.ADAPTIVE, BitDepth.U16),
        (AutoscaleStrategy.CLAHE, BitDepth.U16),
    ],
    ids=["std-u16", "std-u8", "robust-u16", "adaptive-u16", "clahe-u16"],
)
def test_kernel_matches_relational(spark, sf_dir, strategy, bd):
    px = frames.single_band(spark, sf_dir, "vv")
    kernel = krn.single_band_kernel(px, ["product_id"], strategy, bd)
    rel = _relational(spark, sf_dir, strategy, bd)
    diff = (
        kernel.alias("k")
        .join(rel.alias("r"), ["product_id", "row", "col"], "full_outer")
        .where(
            F.col("k.q").isNull() | F.col("r.q").isNull() | (F.col("k.q") != F.col("r.q"))
        )
    )
    mism = diff.limit(5).collect()
    assert not mism, f"kernel != relational: {mism}"


@pytest.mark.parametrize(
    "strategy,bd",
    [("standard-a2", BitDepth.U8), (AutoscaleStrategy.TAMED, BitDepth.U16)],
    ids=["tiled-std-u8", "tiled-tamed-u16"],
)
def test_tiled_kernel_bit_identical(spark, sf_dir, strategy, bd):
    """The shuffle-free tiled kernel must match the one-task kernel
    bit-for-bit — max_chunk=64 forces many vectorized chunks per task, with
    chunks spanning mixed products (the oversized-product shape where a whole
    raster never fits one task)."""
    px = frames.single_band(spark, sf_dir, "vv")
    tiled = krn.single_band_kernel_tiled(px, ["product_id"], strategy, bd, max_chunk=64)
    full = krn.single_band_kernel(px, ["product_id"], strategy, bd)
    diff = (
        tiled.alias("t")
        .join(full.alias("f"), ["product_id", "row", "col"], "full_outer")
        .where(
            F.col("t.q").isNull() | F.col("f.q").isNull() | (F.col("t.q") != F.col("f.q"))
        )
    )
    mism = diff.limit(5).collect()
    assert not mism, f"tiled != full kernel: {mism}"


def test_tiled_kernel_tall_product(spark):
    """Artificially tall product (4096 rows x 8 cols, split into 256-pixel
    chunks): the tiled path must agree with the one-task kernel."""
    import numpy as np

    rng = np.random.RandomState(17)
    rows = 4096
    vals = (rng.uniform(0.0, 3000.0, rows * 8) ** 1.2).tolist()
    data = [
        ("tall", i // 8, i % 8, float(v)) for i, v in enumerate(vals)
    ]
    px = spark.createDataFrame(data, "product_id string, row int, col int, v double")
    tiled = krn.single_band_kernel_tiled(px, ["product_id"], "standard-a2", BitDepth.U8, max_chunk=256)
    full = krn.single_band_kernel(px, ["product_id"], "standard-a2", BitDepth.U8)
    t = {(r["row"], r["col"]): r["q"] for r in tiled.collect()}
    f = {(r["row"], r["col"]): r["q"] for r in full.collect()}
    assert t == f


def test_tiled_kernel_rejects_clahe(spark, sf_dir):
    px = frames.single_band(spark, sf_dir, "vv")
    with pytest.raises(ValueError, match="spatial"):
        krn.single_band_kernel_tiled(px, ["product_id"], AutoscaleStrategy.CLAHE, BitDepth.U16)

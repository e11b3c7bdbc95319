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

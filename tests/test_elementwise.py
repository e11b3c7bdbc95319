"""Golden tests for E1-E6/P2 against the reference formulas
(ops.rs, pipeline.rs) on hand-computed values."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sarpro_spark.operators import elementwise as ew
from sarpro_spark.types import PolarizationOperation


def _run_ops(spark, a, b):
    df = spark.createDataFrame([(float(a), float(b))], "a double, b double")
    row = df.select(
        ew.op_sum(F.col("a"), F.col("b")).alias("sum"),
        ew.op_diff(F.col("a"), F.col("b")).alias("diff"),
        ew.op_ratio(F.col("a"), F.col("b")).alias("ratio"),
        ew.op_n_diff(F.col("a"), F.col("b")).alias("ndiff"),
        ew.op_log_ratio(F.col("a"), F.col("b")).alias("logratio"),
    ).collect()[0]
    return row


def test_ops_basic(spark):
    r = _run_ops(spark, 6.0, 2.0)
    assert r["sum"] == 8.0
    assert r["diff"] == 4.0
    assert r["ratio"] == 3.0
    assert r["ndiff"] == (6.0 - 2.0) / 8.0
    assert r["logratio"] == 3.0  # E5 == E3 on the linear domain (ops.rs:34)


def test_ops_zero_denominator_guards(spark):
    # |b| <= 1e-10 -> ratio/log-ratio 0 (ops.rs:16)
    r = _run_ops(spark, 5.0, 0.0)
    assert r["ratio"] == 0.0
    assert r["logratio"] == 0.0
    # |a+b| <= 1e-10 -> n-diff 0 (ops.rs:29)
    r = _run_ops(spark, 1.0, -1.0)
    assert r["ndiff"] == 0.0
    # just above the eps boundary divides normally
    r = _run_ops(spark, 1.0, 2e-10)
    assert r["ratio"] == 1.0 / 2e-10


def test_db_and_mask(spark):
    df = spark.createDataFrame(
        [(1.0,), (0.0,), (1e-6,), (1e-4,), (100.0,)], "v double"
    )
    rows = df.select(
        F.col("v"),
        ew.to_db(F.col("v")).alias("db"),
        ew.valid_mask(ew.to_db(F.col("v"))).alias("valid"),
    ).collect()
    by_v = {r["v"]: r for r in rows}
    assert by_v[1.0]["db"] == 0.0 and by_v[1.0]["valid"]
    # zero intensity floors at eps: 10*log10(1e-10) = -100, invalid
    assert by_v[0.0]["db"] == -100.0 and not by_v[0.0]["valid"]
    # 1e-6 -> -60 dB: below the -50 threshold
    assert math.isclose(by_v[1e-6]["db"], -60.0) and not by_v[1e-6]["valid"]
    # 1e-4 -> -40 dB: valid
    assert math.isclose(by_v[1e-4]["db"], -40.0) and by_v[1e-4]["valid"]
    assert math.isclose(by_v[100.0]["db"], 20.0) and by_v[100.0]["valid"]


def test_ndiff_bounded(spark):
    # property: a,b >= 0 and a+b > eps  ->  n-diff in [-1, 1]
    import random

    random.seed(7)
    data = [(random.uniform(0, 1e4), random.uniform(0, 1e4)) for _ in range(500)]
    df = spark.createDataFrame(data, "a double, b double")
    out = df.select(ew.op_n_diff(F.col("a"), F.col("b")).alias("nd")).agg(
        F.min("nd").alias("lo"), F.max("nd").alias("hi")
    ).collect()[0]
    assert out["lo"] >= -1.0 and out["hi"] <= 1.0


def test_zip_bands_matches_wide(spark, sf_dir):
    from sarpro_spark import frames

    wide = frames.band_frame(spark, sf_dir)
    expected = wide.select(
        "product_id", "row", "col",
        ew.op_ratio(F.col("vv"), F.col("vh")).alias("v"),
    )
    a = frames.single_band(spark, sf_dir, "vv")
    b = frames.single_band(spark, sf_dir, "vh")
    got = ew.zip_bands(a, b, PolarizationOperation.RATIO)
    assert got.count() == expected.count()
    diff = got.alias("g").join(expected.alias("e"), ["product_id", "row", "col"]).where(
        F.abs(F.col("g.v") - F.col("e.v")) > 1e-12
    )
    assert diff.count() == 0

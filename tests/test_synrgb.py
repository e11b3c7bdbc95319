"""Golden tests for C1/C2/A8 (synthetic_rgb.rs) — f32 LUT fidelity and the
f64 expression twin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sarpro_spark.operators import synrgb as srgb


def test_lut_r_g_known_values():
    lut_r, lut_g, lut_b = srgb.build_luts_f32()
    # endpoints
    assert lut_r[0] == 0 and lut_r[255] == 255
    assert lut_g[0] == 0 and lut_g[255] == 255
    # gamma 0.7 brightens midtones: (128/255)^0.7*255 ~ 157.4 -> 157
    assert lut_r[128] == 157
    # gamma 0.9: (128/255)^0.9*255 ~ 137.1 -> 137
    assert lut_g[128] == 137
    # monotone non-decreasing
    assert np.all(np.diff(lut_r.astype(int)) >= 0)
    assert np.all(np.diff(lut_g.astype(int)) >= 0)
    # blue guards: band2==0 -> 0; equal mid bands -> ratio ~1 -> 255*0.24 ~ 61
    assert np.all(lut_b[:, 0] == 0)
    assert lut_b[128, 128] == np.floor(
        (lut_r[128] / np.float32(lut_g[128])) ** np.float32(0.1) * 255 * np.float32(0.24) + 0.5
    ).astype(np.uint8)


def test_lut_blue_g_zero_guard():
    lut_r, lut_g, lut_b = srgb.build_luts_f32()
    # v2=1 -> g=2 (smallest nonzero); ratio huge for bright v1 -> clamps 255?
    # (255/2)^0.1*255*0.24 = 1.62*61.2 ~ 99 — finite, no clamp needed
    assert 0 < lut_b[255, 1] < 256


def test_expression_path_matches_lut_within_1(spark):
    """The f64 expression twin may differ from the f32 LUT only at pow-rounding
    boundaries, and then by at most 1 level."""
    lut_r, lut_g, lut_b = srgb.build_luts_f32()
    pairs = [(v1, v2) for v1 in range(0, 256, 5) for v2 in range(0, 256, 5)]
    df = spark.createDataFrame(pairs, "q1 int, q2 int")
    rows = srgb.synrgb_default(df, "q1", "q2").collect()
    for r in rows:
        assert abs(r["r"] - int(lut_r[r["q1"]])) <= 1
        assert abs(r["g"] - int(lut_g[r["q2"]])) <= 1
        assert abs(r["b"] - int(lut_b[r["q1"], r["q2"]])) <= 1


def test_map_in_pandas_lut_bit_faithful(spark):
    lut_r, lut_g, lut_b = srgb.build_luts_f32()
    pairs = [(v1, v2) for v1 in range(256) for v2 in range(0, 256, 17)]
    df = spark.createDataFrame(pairs, "q1 int, q2 int").repartition(4)
    rows = srgb.synrgb_lut_map_in_pandas(df, "q1", "q2").collect()
    assert len(rows) == len(pairs)
    for r in rows:
        assert r["r"] == int(lut_r[r["q1"]]), (r["q1"], r["q2"])
        assert r["g"] == int(lut_g[r["q2"]])
        assert r["b"] == int(lut_b[r["q1"], r["q2"]])


def ref_combined_floor(b1: np.ndarray, b2: np.ndarray) -> int:
    hist = np.bincount(np.concatenate([b1, b2]), minlength=256)
    total = b1.size + b2.size
    target = int(np.floor(total * 0.05 + 0.5))
    cum = 0
    floor_value = 0
    for i in range(256):
        cum += int(hist[i])
        if cum >= target:
            floor_value = i
            break
    return min(floor_value + 3, 40)


@pytest.mark.parametrize("seed", [0, 7])
def test_combined_floor_matches_reference(spark, seed):
    rs = np.random.RandomState(seed)
    b1 = rs.randint(0, 256, 4000)
    b2 = np.clip(rs.normal(30, 25, 4000).astype(int), 0, 255)
    data = [("p", int(a), int(b)) for a, b in zip(b1, b2)]
    df = spark.createDataFrame(data, "g string, q1 int, q2 int")
    got = srgb.combined_floor(df, ["g"]).collect()[0]["fl"]
    assert got == ref_combined_floor(b1, b2)


def test_suppressed_water_short_circuit(spark):
    # all-dark pixels below the floor must be forced to (0,0,0)
    data = [("p", 0, 0)] * 50 + [("p", 200, 180)] * 50
    df = spark.createDataFrame(data, "g string, q1 int, q2 int")
    rows = srgb.synrgb_suppressed(df, ["g"]).collect()
    dark = [r for r in rows if r["q1"] == 0]
    bright = [r for r in rows if r["q1"] == 200]
    assert all(r["r"] == 0 and r["g"] == 0 and r["b"] == 0 for r in dark)
    assert all(r["r"] > 0 and r["g"] > 0 and r["b"] > 0 for r in bright)

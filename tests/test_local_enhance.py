"""Golden test for A5 local 3x3 median/range vs a direct NumPy
reimplementation of local_median_and_range_3x3 (autoscale.rs:176-213)."""

from __future__ import annotations

import numpy as np
import pytest

from sarpro_spark.operators import local_enhance as lenh


def ref_local_median(db: np.ndarray, valid: np.ndarray):
    rows, cols = db.shape
    out = {}
    for r in range(rows):
        for c in range(cols):
            r0, r1 = max(r - 1, 0), min(r + 1, rows - 1)
            c0, c1 = max(c - 1, 0), min(c + 1, cols - 1)
            vals = [db[i, j] for i in range(r0, r1 + 1) for j in range(c0, c1 + 1) if valid[i, j]]
            if not vals:
                continue
            vals.sort()
            out[(r, c)] = (len(vals), vals[len(vals) // 2], vals[-1] - vals[0])
    return out


def test_local_median_matches_reference(spark):
    rs = np.random.RandomState(5)
    db = rs.uniform(-45, 15, (12, 17))
    valid = rs.rand(12, 17) > 0.15
    data = [
        ("p", r, c, float(db[r, c]), bool(valid[r, c]))
        for r in range(12)
        for c in range(17)
    ]
    px = spark.createDataFrame(data, "g string, row int, col int, db double, valid boolean")
    got = {
        (r["row"], r["col"]): (r["n_nbrs"], r["med"], r["rng"])
        for r in lenh.local_median_range_3x3(px, ["g"]).collect()
    }
    want = ref_local_median(db, valid)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-12), k
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-12), k

"""Golden test for A4 CLAHE against a direct NumPy reimplementation of
clahe_equalize_normalized (autoscale.rs:220-345) + its invocation path."""

from __future__ import annotations

import numpy as np
import pytest

from sarpro_spark.operators import clahe as clh
from sarpro_spark.types import BitDepth
from tests.test_stats import ref_histogram_stats


def ref_clahe(db: np.ndarray, valid: np.ndarray, max_val: float) -> np.ndarray:
    """Reference CLAHE path: [p01,p99] normalize -> 8x8 CLAHE -> quantize."""
    rows, cols = db.shape
    s = ref_histogram_stats(db[valid])
    low, high = s["p01"], s["p99"]
    rng = max(high - low, 1.0)
    norm = np.where(valid, (np.clip(db, low, high) - low) / rng, 0.0)

    tiles, bins, clip_limit = clh.TILES, clh.BINS, clh.CLIP_LIMIT
    th = (rows + tiles - 1) // tiles
    tw = (cols + tiles - 1) // tiles
    cdfs = np.zeros((tiles, tiles, bins))
    for ty in range(tiles):
        r0, r1 = ty * th, min((ty + 1) * th, rows)
        for tx in range(tiles):
            c0, c1 = tx * tw, min((tx + 1) * tw, cols)
            hist = np.zeros(bins)
            for r in range(r0, r1):
                for c in range(c0, c1):
                    if valid[r, c]:
                        v = min(max(norm[r, c], 0.0), 1.0)
                        b = int(np.floor(v * (bins - 1) + 0.5))
                        hist[min(max(b, 0), bins - 1)] += 1
            area = (r1 - r0) * (c1 - c0)
            thr = max(clip_limit * area / bins, 1.0)
            excess = float(np.sum(np.where(hist > thr, hist - thr, 0.0)))
            hist = np.where(hist > thr, np.trunc(thr), hist)
            add = np.floor(excess / bins)
            rem = int(np.floor(excess - add * bins + 0.5))
            hist = hist + add
            for b in range(rem):
                hist[b % bins] += 1
            total = max(hist.sum(), 1.0)
            cdfs[ty, tx] = np.clip(np.cumsum(hist) / total, 0.0, 1.0)

    out = np.zeros((rows, cols))
    for r in range(rows):
        for c in range(cols):
            if not valid[r, c]:
                continue
            rf = r / th - 0.5
            cf = c / tw - 0.5
            tyf = max(np.floor(rf), 0.0)
            txf = max(np.floor(cf), 0.0)
            dy, dx = rf - tyf, cf - txf
            ty0, tx0 = int(min(tyf, tiles - 1)), int(min(txf, tiles - 1))
            ty1, tx1 = int(min(tyf + 1, tiles - 1)), int(min(txf + 1, tiles - 1))
            bpos = int(np.floor(min(max(norm[r, c], 0.0), 1.0) * (bins - 1) + 0.5))
            c00, c01 = cdfs[ty0, tx0, bpos], cdfs[ty0, tx1, bpos]
            c10, c11 = cdfs[ty1, tx0, bpos], cdfs[ty1, tx1, bpos]
            top = c00 * (1.0 - dx) + c01 * dx
            bottom = c10 * (1.0 - dx) + c11 * dx
            out[r, c] = top * (1.0 - dy) + bottom * dy
    return np.where(valid, np.trunc(np.clip(out, 0.0, 1.0) * max_val), 0).astype(np.int64)


@pytest.mark.parametrize("shape", [(40, 64), (23, 17)], ids=["40x64", "23x17"])
def test_clahe_matches_reference(spark, shape):
    rows, cols = shape
    rs = np.random.RandomState(11)
    db = rs.uniform(-45, 15, (rows, cols))
    db[rs.rand(rows, cols) < 0.05] = -80.0  # some invalid pixels
    valid = db > -50.0
    data = [
        ("p", r, c, float(db[r, c]), bool(valid[r, c]))
        for r in range(rows)
        for c in range(cols)
    ]
    px = spark.createDataFrame(data, "g string, row int, col int, db double, valid boolean")
    got = {
        (r["row"], r["col"]): r["q"]
        for r in clh.clahe_quantize(px, ["g"], BitDepth.U16).collect()
    }
    want = ref_clahe(db, valid, 65535.0)
    mism = [
        ((r, c), got[(r, c)], int(want[r, c]))
        for r in range(rows)
        for c in range(cols)
        if got[(r, c)] != want[r, c]
    ]
    assert not mism[:10], f"{len(mism)} mismatches, first: {mism[:3]}"

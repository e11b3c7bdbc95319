"""CLI end-to-end: write a band-frame parquet, run python -m sarpro_spark,
read the parquet output back. Also params serialization round-trip (the
reference's GUI preset save/load analog, models.rs:208-341)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from sarpro_spark.types import (
    AutoscaleStrategy,
    BitDepth,
    OutputFormat,
    Polarization,
    PolarizationOperation,
    ProcessingParams,
)


def test_params_roundtrip():
    p = ProcessingParams(
        format=OutputFormat.JPEG,
        bit_depth=BitDepth.U16,
        polarization=Polarization.MULTIBAND,
        operation=PolarizationOperation.N_DIFF,
        autoscale=AutoscaleStrategy.TAMED,
        size=2048,
        pad=True,
        target_crs="EPSG:32632",
    )
    d = p.to_dict()
    q = ProcessingParams.from_dict(json.loads(json.dumps(d)))
    assert q == p


def test_cli_end_to_end(spark, sf_dir, tmp_path):
    from sarpro_spark import frames

    inp = str(tmp_path / "band_long.parquet")
    outp = str(tmp_path / "out")
    frames.band_long(spark, sf_dir).write.parquet(inp)

    proc = subprocess.run(
        [
            sys.executable, "-m", "sarpro_spark",
            "-i", inp, "-o", outp,
            "--polarization", "vv", "--autoscale", "robust",
            "--bit-depth", "16", "--master", "local[4]",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["rows_written"] > 0
    assert report["params"]["autoscale"] == "robust"

    result = spark.read.parquet(outp)
    assert {"row", "col", "q"} <= set(result.columns)
    qvals = result.agg({"q": "max"}).collect()[0][0]
    assert 0 < qvals <= 65535

    # --format tiff (the default) also emits real per-product GeoTIFFs
    import glob
    import os

    import numpy as np

    from sarpro_spark.sinks import tiff as t

    assert report["tiff_files"] > 0
    tifs = sorted(glob.glob(os.path.join(report["tiff_dir"], "*.tif")))
    assert len(tifs) == report["tiff_files"]
    arr, _ = t.read_tiff(tifs[0])
    assert arr.dtype == np.uint16 and arr.ndim == 2 and arr.size > 0

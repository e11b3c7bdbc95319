"""CLI surface mirroring the reference's (src/cli/args.rs:7-77, runner.rs):

    python -m sarpro_spark -i <band-parquet> -o <out-dir> \\
        --polarization vv|vh|hh|hv|multiband --operation sum|diff|ratio|n-diff|log-ratio \\
        --autoscale standard|robust|adaptive|equalized|clahe|tamed|default \\
        --bit-depth 8|16 --format tiff|jpeg --size N --pad \\
        --target-crs auto|EPSG:XXXX|none --resample near|bilinear|cubic \\
        --batch --continue-on-error

Input is a band frame parquet (product_id, band, row, col, v) — the rebuilt
engine's equivalent of a pre-decoded SAFE measurement set (sources/safe.py
handles discovery/metadata and uncompressed-TIFF decode). Output is
partitioned parquet plus, with ``--format tiff``, per-product GeoTIFF files
(W1/W2 via the pure-Python codec), plus a JSON run report (A9). JPEG stays
parquet-only (encoder stubbed — no PIL here).
"""

from __future__ import annotations

import argparse
import json
import os
import time



def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="sarpro_spark", description=__doc__)
    p.add_argument("-i", "--input", required=True, help="band-frame parquet path")
    p.add_argument("-o", "--output", required=True, help="output directory (parquet)")
    p.add_argument("--polarization", default="vv",
                   choices=["vv", "vh", "hh", "hv", "multiband"])
    p.add_argument("--operation", default=None,
                   choices=["sum", "diff", "ratio", "n-diff", "log-ratio"])
    p.add_argument("--autoscale", default="standard",
                   choices=["standard", "robust", "adaptive", "equalized", "clahe", "tamed", "default"])
    p.add_argument("--bit-depth", type=int, default=8, choices=[8, 16])
    p.add_argument("--format", dest="fmt", default="tiff", choices=["tiff", "jpeg"])
    p.add_argument("--size", type=int, default=None, help="target long side")
    p.add_argument("--pad", action="store_true", help="pad to square")
    p.add_argument("--target-crs", default="auto")
    p.add_argument("--resample", default="cubic", choices=["near", "bilinear", "cubic"])
    p.add_argument("--continue-on-error", action="store_true", default=True)
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def build_params(args: argparse.Namespace):
    from sarpro_spark.types import (
        AutoscaleStrategy,
        BitDepth,
        OutputFormat,
        Polarization,
        PolarizationOperation,
        ProcessingParams,
        ResampleAlg,
    )

    return ProcessingParams(
        format=OutputFormat(args.fmt),
        bit_depth=BitDepth(args.bit_depth),
        polarization=Polarization(args.polarization),
        operation=PolarizationOperation(args.operation) if args.operation else None,
        autoscale=AutoscaleStrategy(args.autoscale),
        size=args.size,
        pad=args.pad,
        target_crs=None if args.target_crs in ("none", "") else args.target_crs,
        resample_alg=ResampleAlg(args.resample),
        continue_on_error=args.continue_on_error,
    )


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    from sarpro_spark.plans.pipeline import build_pipeline
    from sarpro_spark.session import build_session

    params = build_params(args)
    spark = build_session("sarpro_spark_cli", master=args.master)
    t0 = time.time()
    band_long = spark.read.parquet(args.input)
    out = build_pipeline(band_long, params)
    out.write.mode("overwrite").partitionBy("product_id").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    report = {
        "input": args.input,
        "output": args.output,
        "params": params.to_dict(),
        "rows_written": n,
        "elapsed_sec": round(time.time() - t0, 3),
    }
    if args.fmt == "tiff":
        from sarpro_spark.sinks.writers import write_geotiffs

        res = spark.read.parquet(args.output)
        value_cols = [c for c in ("q",) if c in res.columns] or [
            c for c in ("r", "g", "b") if c in res.columns
        ]
        if value_cols:
            bits = 8 if (args.bit_depth == 8 or value_cols != ["q"]) else 16
            # sibling dir: an extra subdir inside the parquet root would
            # corrupt partition discovery on read-back
            tiff_dir = args.output.rstrip("/") + "_tiff"
            manifest = write_geotiffs(
                res, tiff_dir, ["product_id"], value_cols, bits=bits
            )
            report["tiff_files"] = manifest.count()
            report["tiff_dir"] = tiff_dir
    elif args.fmt == "jpeg":
        report["note"] = "jpeg encode stubbed (no PIL); parquet written"
    report["elapsed_sec"] = round(time.time() - t0, 3)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

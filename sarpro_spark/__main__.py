"""CLI surface mirroring the reference's (src/cli/args.rs:7-77, runner.rs):

    python -m sarpro_spark -i <band-parquet> -o <out-dir> \\
        --polarization vv|vh|hh|hv|multiband --operation sum|diff|ratio|n-diff|log-ratio \\
        --autoscale standard|robust|adaptive|equalized|clahe|tamed|default \\
        --bit-depth 8|16 --format tiff|jpeg --size N --pad \\
        --target-crs auto|EPSG:XXXX|none --resample near|bilinear|cubic \\
        --batch --continue-on-error

Input is a band frame parquet (product_id, band, row, col, v) — the rebuilt
engine's equivalent of a pre-decoded SAFE measurement set (GDAL decode is
stubbed in this environment; sources/safe.py handles discovery/metadata).
Output is partitioned parquet (the engine's W1/W2 analog) plus a JSON run
report (A9).
"""

from __future__ import annotations

import argparse
import json
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
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

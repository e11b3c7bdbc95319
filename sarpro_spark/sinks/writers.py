"""W1-W10: sinks — metadata extraction, sidecar generation, data writers.

Reference: /root/reference/src/io/writers/ (studied, not copied).

The relational engine's primary sink is partitioned Parquet (columnar,
predicate-pushdown-friendly — what a 100 TB consumer reads back). Image
encodes (W1-W3: GeoTIFF/JPEG) happen per product inside foreachPartition so
no pixel data crosses the driver; actual byte encoding is stubbed behind an
import-try since PIL/GDAL are absent here.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- W6: metadata field extraction + operation-aware polarization label ------

_OP_LABEL = {
    "sum": "SUM",
    "difference": "DIFF",
    "ratio": "RATIO",
    "normalized_diff": "NORM_DIFF",
    "log_ratio": "LOG_RATIO",
}


def polarization_label(polarizations: list[str], operation: str | None) -> str:
    """W6 (metadata.rs:40-113): e.g. SUM(VV, VH) when the pair is present,
    MULTIBAND(VV, VH) for multiband ops, else the joined list."""
    if operation is None:
        return ",".join(polarizations)
    if operation == "multiband_vv_vh":
        return "MULTIBAND(VV, VH)"
    if operation == "multiband_hh_hv":
        return "MULTIBAND(HH, HV)"
    prefix = _OP_LABEL.get(operation)
    if prefix is None:
        return ",".join(polarizations)
    if "VV" in polarizations and "VH" in polarizations:
        return f"{prefix}(VV, VH)"
    if "HH" in polarizations and "HV" in polarizations:
        return f"{prefix}(HH, HV)"
    return ",".join(polarizations)


def polarization_label_expr(pols: Column, operation: Column) -> Column:
    """Column twin of :func:`polarization_label`; ``pols`` is the
    comma-joined polarization list, ``operation`` the op name or null."""
    has_vv_vh = pols.contains("VV") & pols.contains("VH")
    has_hh_hv = pols.contains("HH") & pols.contains("HV")

    def labeled(prefix: str) -> Column:
        return (
            F.when(has_vv_vh, F.lit(f"{prefix}(VV, VH)"))
            .when(has_hh_hv, F.lit(f"{prefix}(HH, HV)"))
            .otherwise(pols)
        )

    out = F.when(operation == "multiband_vv_vh", F.lit("MULTIBAND(VV, VH)")).when(
        operation == "multiband_hh_hv", F.lit("MULTIBAND(HH, HV)")
    )
    for op, prefix in _OP_LABEL.items():
        out = out.when(operation == op, labeled(prefix))
    return out.otherwise(pols)


def extract_metadata_fields(meta: dict, operation: str | None = None) -> dict[str, str]:
    """W6 (metadata.rs:20-229): SafeMetadata -> KEY=value map (subset of ~35
    fields; optional fields included only when present, as in the reference)."""
    out: dict[str, str] = {}
    direct = {
        "INSTRUMENT": "instrument",
        "PLATFORM": "platform",
        "ACQUISITION_START": "acquisition_start",
        "ACQUISITION_STOP": "acquisition_stop",
        "PRODUCT_TYPE": "product_type",
        "PROCESSING_FACILITY": "processing_facility",
        "PROCESSING_SOFTWARE": "processing_software",
        "MODE": "instrument_mode",
    }
    for k, src in direct.items():
        v = meta.get(src)
        if v is not None:
            out[k] = str(v)
    for k, src in {
        "ORBIT_NUMBER": "orbit_number",
        "RELATIVE_ORBIT_NUMBER": "relative_orbit_number",
        "RANGE_SAMPLING_RATE": "range_sampling_rate",
        "RADAR_FREQUENCY": "radar_frequency",
        "PRF": "prf",
        "SLANT_RANGE": "slant_range",
        "PLATFORM_VELOCITY": "platform_velocity",
        "RANGE_PIXEL_SPACING": "range_pixel_spacing",
        "AZIMUTH_PIXEL_SPACING": "azimuth_pixel_spacing",
        "LINES": "lines",
        "SAMPLES": "samples",
    }.items():
        v = meta.get(src)
        if v is not None:
            out[k] = str(v)
    out["POLARIZATIONS"] = polarization_label(meta.get("polarizations", []), operation)
    return out


# --- W4/W5: world file + prj sidecars ----------------------------------------

WORLD_EXT = {"jpg": "jgw", "jpeg": "jgw", "png": "pgw", "tif": "tfw", "tiff": "tfw"}


def world_ext_for(filename: str) -> str:
    """W4 extension rule (worldfile.rs:11-30): jgw/pgw/tfw, first-letter+w
    fallback, wld when no extension."""
    ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
    if ext in WORLD_EXT:
        return WORLD_EXT[ext]
    if ext:
        return ext[0] + "w"
    return "wld"


def worldfile_content(gt: list[float]) -> str:
    """W4 (worldfile.rs:33-52): pixel-center convention, one %.12f per line:
    A, D, B, E, C=gt0+0.5A+0.5B, F=gt3+0.5D+0.5E."""
    a, b, d, e = gt[1], gt[2], gt[4], gt[5]
    c = gt[0] + 0.5 * a + 0.5 * b
    f = gt[3] + 0.5 * d + 0.5 * e
    return "".join(f"{v:.12f}\n" for v in (a, d, b, e, c, f))


def worldfile_expr(gt_cols: tuple[str, ...] = ("gt0", "gt1", "gt2", "gt3", "gt4", "gt5")) -> Column:
    """Column twin of :func:`worldfile_content` (format_string %.12f)."""
    g0, g1, g2, g3, g4, g5 = (F.col(c) for c in gt_cols)
    c = g0 + F.lit(0.5) * g1 + F.lit(0.5) * g2
    f_ = g3 + F.lit(0.5) * g4 + F.lit(0.5) * g5
    parts = [F.format_string("%.12f", x) for x in (g1, g4, g2, g5, c, f_)]
    return F.concat_ws("\n", *parts)


def write_prj(path: str, projection: str) -> None:
    """W5: raw projection string sidecar."""
    with open(os.path.splitext(path)[0] + ".prj", "w", encoding="utf-8") as fh:
        fh.write(projection)


# --- W7: TIFF metadata embed rules -------------------------------------------

IDENTITY_GT = [0.0, 1.0, 0.0, 0.0, 0.0, 1.0]


def tiff_embed_plan(
    geotransform: list[float] | None,
    projection: str | None,
    fields: dict[str, str],
) -> dict:
    """W7 (metadata.rs:297-341): what gets embedded in a GeoTIFF —
    geotransform skipped when identity, projection written ONLY IF a
    non-identity geotransform was set, all metadata items always. Returns the
    embed plan (the writer stub consumes it; the rules are the operator)."""
    set_gt = geotransform is not None and geotransform != IDENTITY_GT
    set_proj = set_gt and projection is not None
    return {
        "set_geotransform": geotransform if set_gt else None,
        "set_projection": projection if set_proj else None,
        "metadata_items": dict(fields),
    }


# --- W8: JSON sidecar --------------------------------------------------------


def convert_metadata_to_json(fields: dict[str, str], geotransform: list[float] | None = None,
                             crs: str | None = None, extras: dict | None = None) -> str:
    """W8 (metadata.rs:232-294): lowercased keys, numeric-string coercion,
    geotransform as array, optional extras. Deterministic key order (sorted)
    so outputs are reproducible across engines."""
    obj: dict = {}
    for k, v in fields.items():
        key = k.lower()
        try:
            if v.strip() and (v.strip().lstrip("-").replace(".", "", 1).replace("e-", "", 1)
                              .replace("e+", "", 1).replace("e", "", 1).isdigit()):
                num = float(v)
                obj[key] = int(num) if num.is_integer() and "." not in v and "e" not in v.lower() else num
            else:
                obj[key] = v
        except ValueError:
            obj[key] = v
    if geotransform is not None:
        obj["geotransform"] = geotransform
    if crs is not None:
        obj["crs"] = crs
    for k, v in (extras or {}).items():
        obj[k.lower()] = v
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


# --- parquet/json data sinks -------------------------------------------------


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Primary columnar sink; partition_by product-grain keys so downstream
    scans prune (the 100 TB read path)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


# --- W1-W3: image encodes (stubbed) ------------------------------------------


def encode_images_foreach_partition(rgb: DataFrame, out_dir: str, group_cols: list[str]) -> None:
    """W1-W3 plumbing: each partition encodes its products locally — pixels
    never cross the driver. Byte encoding STUBBED (no PIL/GDAL here)."""
    try:
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image encoding requires Pillow, not available in this environment; "
            "the partition-local write pattern is the supported design"
        ) from e
    raise NotImplementedError("PIL encode path intentionally unimplemented in round 1")

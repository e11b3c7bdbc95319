"""S6: generic source registration + schema inference.

Reference: ``GdalSarReader::open`` (/root/reference/src/io/gdal.rs:57-104) —
open any GDAL dataset, surface size/bands/geotransform/projection/metadata.
The Spark-native analog is a small format registry over DataFrameReader:
every registered format yields (DataFrame, inferred schema, source metadata
map), and raster formats route through the SAFE/pyramid sources. Options are
passed through so scan-level behaviors (permissive parsing, header inference,
pushdown-relevant options) stay declarative.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SourceInfo:
    """The reader's metadata surface (GdalMetadata analog, gdal.rs:20-34)."""

    format: str
    path: str
    schema_ddl: str
    n_columns: int
    options: dict = field(default_factory=dict)


_READERS = {}


def register_format(name: str):
    def deco(fn):
        _READERS[name] = fn
        return fn

    return deco


@register_format("parquet")
def _read_parquet(spark: SparkSession, path: str, options: dict) -> DataFrame:
    return spark.read.options(**options).parquet(path)


@register_format("csv")
def _read_csv(spark: SparkSession, path: str, options: dict) -> DataFrame:
    opts = {"header": "true", "inferSchema": "true", "mode": "PERMISSIVE"}
    opts.update(options)
    return spark.read.options(**opts).csv(path)


@register_format("json")
def _read_json(spark: SparkSession, path: str, options: dict) -> DataFrame:
    opts = {"mode": "PERMISSIVE"}
    opts.update(options)
    return spark.read.options(**opts).json(path)


@register_format("orc")
def _read_orc(spark: SparkSession, path: str, options: dict) -> DataFrame:
    return spark.read.options(**options).orc(path)


def supported_formats() -> list[str]:
    return sorted(_READERS)


def open_source(
    spark: SparkSession, path: str, fmt: str = "parquet", **options
) -> tuple[DataFrame, SourceInfo]:
    """Open any registered source; returns the frame + its inferred-schema
    metadata (the S6 open-and-describe surface)."""
    if fmt not in _READERS:
        raise ValueError(f"unknown format {fmt!r}; supported: {supported_formats()}")
    df = _READERS[fmt](spark, path, options)
    info = SourceInfo(
        format=fmt,
        path=path,
        schema_ddl=df.schema.simpleString(),
        n_columns=len(df.columns),
        options=dict(options),
    )
    return df, info

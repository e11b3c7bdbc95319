"""sarpro_spark — a PySpark-native analytics engine with the data-processing
capabilities of the reference SAR processor (bogwi/sarpro), rebuilt Spark-first.

The reference is a single-node Rust raster pipeline (SAFE GRD -> band math ->
dB -> histogram autoscale -> resize/pad -> encode). This package re-expresses
every operator as DataFrame transformations designed for a 1000-executor
cluster: native ``pyspark.sql.functions`` expressions wherever the semantics
allow (so Catalyst can push down / fuse / prune), Arrow-batched pandas UDFs
only where per-block array math is essential (Lanczos resize, CLAHE
interpolation, LUT composition).

Layout:
    session     SparkSession builders with scale-tuned defaults
    types       enums + ProcessingParams mirroring reference src/types.rs
    frames      raster data model (band frames) + test-table loaders
    operators/  elementwise, stats, autoscale, geometry, clahe, synrgb
    sources/    readers (parquet registry, SAFE-style discovery, XML metadata)
    sinks/      writers (parquet/json sinks, sidecar generators, metadata)
    functions/  scalar function packs (math/string/date/json)
    plans/      pipeline assembly (ProcessingParams -> DataFrame DAG)
    streaming/  Structured Streaming surface over event streams
    llm/        large-scale training-data ops (dedup, similarity, text, multimodal)
"""

__version__ = "0.1.0"

"""Streaming SAFE-product ingest: S11's batch directory iteration as
CONTINUOUS ARRIVAL — the raster half of the streaming story (events and
documents have streaming twins since r4/r7; products did not).

The reference's batch loop (api/mod.rs:460-470 `iterate_safe_products` —
list subdirectories, process each) assumes the input directory is
complete. Operationally, products LAND over time (a downlink station
drops new .SAFE directories continuously); re-running the batch loop
re-opens everything. This module re-expresses the loop as a Structured
Streaming query:

1. **Arrival signal = manifest.safe** (`stream_product_arrivals`): a file
   source watches ``<input>/*/manifest.safe``. The manifest is the
   product's completion marker (a .SAFE directory is written
   measurement-first, manifest-last in the standard handoff contract), so
   triggering on it never opens a half-written product. Spark's file
   source gives exactly-once per file via the checkpointed file log.
2. **Per-batch open = the BATCH opener** (`ingest_products_stream`):
   ``foreachBatch`` maps each micro-batch's newly-arrived manifest paths
   to their product directories and runs
   :func:`sarpro_spark.sources.safe.open_product_dirs` — the identical
   mapInPandas task the batch path runs, so stream and batch cannot
   diverge by construction — then writes the opened rows to the sink
   under an ``epoch=<id>`` subdirectory with OVERWRITE semantics.
   foreachBatch is at-least-once (a crash after the write but before the
   commit re-delivers the epoch); per-epoch overwrite makes the redelivery
   idempotent — a blind append would duplicate the epoch's rows.

Certificate: tests/test_streaming.py asserts a drained stream's sink ==
`open_products` over the same directory, including error-status rows for
broken products, under multi-batch staggered arrival. r10 adds the
registered row `ingest_sink_roundtrip` (sources_pack): a drained ingest
sink read back (epoch partition dropped) hashes equal to the batch
opener as DATA, putting the epoch-overwrite idempotence contract under
the oracle.

Equivalence scope (ADVICE r9): the stream triggers on MANIFEST arrival,
so 'drained sink == open_products' holds for MANIFESTED directories. A
subdirectory that never receives a manifest is, by the landing contract
above, a product still being written — the batch opener (which scans a
directory presumed complete) emits an error row for it, the stream
correctly keeps waiting. Operators who want stale half-written products
surfaced should run the batch opener as a periodic sweep next to the
stream; the stream itself never times a directory out.

Scale contract: the stream moves METADATA (one row per product); band
pixels stay in executor-side reads exactly like the batch path. State is
Spark's file-source log (one entry per manifest), not product content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sarpro_spark.sources.safe import open_product_dirs


#: manifests admitted per micro-batch. High by default: one micro-batch per
#: product (the old hard-coded 1) serializes a checkpoint commit + parquet
#: write per product, which at 'millions of products' throttles ingest to the
#: commit latency (ADVICE r9). Tests pin 1 to make arrival order observable.
DEFAULT_MAX_FILES_PER_TRIGGER = 1024


def stream_product_arrivals(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = DEFAULT_MAX_FILES_PER_TRIGGER,
) -> DataFrame:
    """Streaming (manifest_path) relation — one row per LINE of each newly
    arrived manifest (the text file source's grain); consumers take the
    distinct dirname."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(os.path.join(input_dir, "*", "manifest.safe"))
        .select(F.input_file_name().alias("manifest_path"))
    )


def ingest_products_stream(
    spark: SparkSession,
    input_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    transform=None,
    max_files_per_trigger: int = DEFAULT_MAX_FILES_PER_TRIGGER,
):
    """Start the continuous-ingest query: new products (manifest arrival)
    -> batch-identical open -> optional caller transform -> parquet append.
    Returns the StreamingQuery (caller drains with availableNow or leaves
    it running)."""

    def handle(batch_df, epoch_id: int) -> None:
        # manifest lines -> distinct product dirs that arrived this epoch
        dirs = (
            batch_df.select("manifest_path")
            .distinct()
            .select(
                F.expr("substring(manifest_path, 1, length(manifest_path) - length('/manifest.safe'))")
                .alias("product_path")
            )
            .distinct()
        )
        # file-source URIs are file:-scheme AND percent-encoded
        # ('file:///abs/My%20Product.SAFE'); the opener takes plain
        # filesystem paths, so strip the scheme and percent-DECODE
        # (ADVICE r9: an undecoded %20 yields a path that doesn't exist and
        # a spurious error row). url_decode also maps '+' to space
        # (URLDecoder semantics) which is WRONG for a literal '+' in a
        # directory name — input_file_name never encodes '+' — so protect
        # it as %2B first. Pure column expressions, no Python in the plan.
        dirs = dirs.select(
            F.url_decode(
                F.replace(
                    F.regexp_replace("product_path", "^file:(//)?", ""),
                    F.lit("+"),
                    F.lit("%2B"),
                )
            ).alias("product_path")
        )
        opened = open_product_dirs(dirs)
        if transform is not None:
            opened = transform(opened)
        # idempotent under foreachBatch's at-least-once redelivery: the
        # epoch's subdirectory is overwritten, never appended
        opened.write.mode("overwrite").parquet(os.path.join(sink_dir, f"epoch={epoch_id}"))

    return (
        stream_product_arrivals(spark, input_dir, max_files_per_trigger)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

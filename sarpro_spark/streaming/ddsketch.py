"""Streaming DDSketch quantiles — EXACT stream==batch certificate (r13).

The quantile cell of the streaming-sketch matrix (KMV distinct r12,
SpaceSaving heavy hitters r12): because the log-linear bucket map of
functions/ddsketch.py is a pure function of the value and the state is a
bag of bucket COUNTERS, the fold is commutative and associative — any
micro-batch split drains to byte-identical per-shard sketches, so the
certificate class is the strong one (drained == batch EXACTLY, the KMV
doctrine), not a bound.

State per shard: the (bucket_id -> count) map, <= MAX_BUCKETS entries
FOREVER (shards partition rows, not the key domain, purely for
parallelism; the global sketch is the sum over shards).  Each epoch
emits the shard's full sketch in update mode; the drained final state is
the emission with the shard's max n_seen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from sarpro_spark.functions.ddsketch import bucket_id_expr
from sarpro_spark.llm.sampling import hash_bucket

DEFAULT_SHARDS = 4

_OUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("bucket_id", LongType()),
        StructField("cnt", LongType()),
        StructField("n_seen", LongType()),  # rows folded so far (monotone)
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("buckets", StringType()),  # "id:cnt,id:cnt,..." sorted by id
        StructField("n", LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    shard = int(key[0])
    counts: dict[int, int] = {}
    n = 0
    if state.exists:
        enc, n = state.get
        if enc:
            for part in enc.split(","):
                b, c = part.split(":")
                counts[int(b)] = int(c)
    for pdf in pdfs:
        n += len(pdf)
        for b, c in pdf["bucket_id"].value_counts().items():
            counts[int(b)] = counts.get(int(b), 0) + int(c)
    items = sorted(counts.items())
    state.update((",".join(f"{b}:{c}" for b, c in items), n))
    yield pd.DataFrame(
        {
            "shard": [shard] * len(items),
            "bucket_id": [b for b, _ in items],
            "cnt": [c for _, c in items],
            "n_seen": [n] * len(items),
        }
    )


def ddsketch_stream(
    stream: DataFrame,
    value_col: str,
    rid_col: str,
    shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Per-micro-batch sketch emission (update mode).  ``value_col`` must
    be a positive integer column expression name; ``rid_col`` a
    deterministic row id (the shard hash — rows split for parallelism,
    counters merge by summation)."""
    keyed = stream.select(
        bucket_id_expr(F.col(value_col)).alias("bucket_id"),
        (hash_bucket(F.col(rid_col), "ddshard") % shards).cast("int").alias("shard"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ddsketch_batch(
    df: DataFrame,
    value_col: str,
    rid_col: str,
    shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """The batch twin: per-shard bucket counters in one aggregate — the
    drained stream must equal this EXACTLY (minus n_seen bookkeeping)."""
    return (
        df.select(
            bucket_id_expr(F.col(value_col)).alias("bucket_id"),
            (hash_bucket(F.col(rid_col), "ddshard") % shards)
            .cast("int")
            .alias("shard"),
        )
        .groupBy("shard", "bucket_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

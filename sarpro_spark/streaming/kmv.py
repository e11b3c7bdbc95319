"""Streaming KMV sketch: distinct-count state that never grows.

The streaming twin of the batch KMV/theta overlap certificate
(functions/kmv.py): an unbounded key stream folds into AT MOST
shards x k retained hash values — the live "how many distinct users /
URLs / documents so far" gauge with bounded state, where the exact
answer needs state proportional to the distinct count itself.

Unlike SpaceSaving (streaming/heavyhitters.py), the bottom-k of a set
is ORDER-INDEPENDENT: the drained stream's sketch equals the batch
sketch computed over the same rows EXACTLY, whatever the arrival or
micro-batch order — so this operator carries the STRONG stream==batch
certificate (asserted in tests), not the guarantee-bound class.

Estimate: per shard, theta_p = k-th smallest distinct hash fraction;
est_p = (k-1)/theta_p when the shard sketch is full, else the retained
count (exact mode).  Sharding by the KEY's own hash makes shards
disjoint key partitions, so the total distinct estimate is the SUM of
per-shard estimates (each shard is an exact 1/shards-universe sample).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sarpro_spark.llm.sampling import BUCKETS, hash_bucket

DEFAULT_K = 128
DEFAULT_SHARDS = 4

_HASH_SPACE = float(1 << 60)

_OUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("pos", IntegerType()),   # 0..k-1 rank within the sketch
        StructField("h", LongType()),        # retained 60-bit hash
        StructField("n_seen", LongType()),   # rows folded so far (monotone)
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("hs", StringType()),  # comma-joined retained hashes
        StructField("n", LongType()),
    ]
)


def _key_hash_int(col):
    """60-bit integer key hash — the integer twin of functions/kmv.py's
    fraction (same md5 slice; fraction = h / 2^60)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit("kmv|"), col.cast("string"))), 1, 15), 16, 10).cast(
        "long"
    )


def _make_update(k: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        if state.exists:
            hs_str, n = state.get
            retained = set(int(x) for x in hs_str.split(",")) if hs_str else set()
        else:
            retained, n = set(), 0
        for pdf in pdfs:
            vals = pdf["h"]
            n += len(vals)
            retained.update(int(v) for v in vals)
        # bottom-k of a set: order-independent, so the fold commutes with
        # any batching — the stream==batch exactness certificate
        kept = sorted(retained)[:k]
        state.update((",".join(map(str, kept)), n))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(kept),
                "pos": list(range(len(kept))),
                "h": kept,
                "n_seen": [n] * len(kept),
            }
        )

    return update


def kmv_stream(
    stream: DataFrame,
    key_col: str,
    k: int = DEFAULT_K,
    shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Per-micro-batch sketch emission (update mode; the drained final
    state is the emission with each shard's max n_seen).  Shards come
    from the key's OWN hash bucket, so each shard sketches a disjoint
    1/shards slice of the key universe."""
    keyed = stream.select(
        _key_hash_int(F.col(key_col)).alias("h"),
        (hash_bucket(F.col(key_col), "kmvshard") % shards).cast("int").alias("shard"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_update(k),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_batch(
    df: DataFrame,
    key_col: str,
    k: int = DEFAULT_K,
    shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """The batch twin: per-shard bottom-k distinct hashes via one rank
    window — the drained stream must equal this EXACTLY (minus n_seen,
    which is arrival bookkeeping)."""
    from pyspark.sql import Window

    keyed = df.select(
        _key_hash_int(F.col(key_col)).alias("h"),
        (hash_bucket(F.col(key_col), "kmvshard") % shards).cast("int").alias("shard"),
    ).distinct()
    w = Window.partitionBy("shard").orderBy("h")
    return (
        keyed.withColumn("pos", (F.row_number().over(w) - 1).cast("int"))
        .where(F.col("pos") < k)
        .select("shard", "pos", "h")
    )


def estimate_distinct(sketch_rows: list, k: int = DEFAULT_K) -> float:
    """Driver-side estimate from drained sketch rows [(shard, pos, h)]:
    sum of per-shard KMV estimates (disjoint key slices)."""
    by_shard: dict[int, list[int]] = {}
    for shard, pos, h in sketch_rows:
        by_shard.setdefault(int(shard), []).append(int(h))
    total = 0.0
    for hs in by_shard.values():
        hs = sorted(hs)
        if len(hs) >= k:
            theta = hs[k - 1] / _HASH_SPACE
            total += (k - 1) / theta
        else:
            total += len(hs)
    return total

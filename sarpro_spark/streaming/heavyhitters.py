"""Streaming heavy hitters: SpaceSaving under ``applyInPandasWithState``.

The continuous-arrival twin of the batch mergeable Misra-Gries summary
(functions/heavyhitters.py): an unbounded key stream folds into BOUNDED
state — per shard, at most ``capacity`` (key, count, err) entries — while
preserving the SpaceSaving guarantees (Metwally, Agrawal & El Abbadi,
ICDT'05 "Efficient computation of frequent and top-k elements in data
streams"):

    count(k) >= freq(k)                   (over-count only)
    count(k) - err(k) <= freq(k)          (the err column bounds it)
    freq(k) > N_shard / capacity  =>  k is in the summary (survival)

Shards are the house md5 bucket of a row-identity column — state scales
as shards x capacity regardless of key cardinality or stream length, and
each shard's update is a pure fold (one stateful stage, the streaming
doctrine shared with streaming/dedup.py).

Determinism contract: Spark gives NO row order inside a micro-batch group,
so the fold first collects the batch's keys and processes them SORTED —
SpaceSaving's guarantees hold for any processing order, and sorting makes
the drained summary a deterministic function of the micro-batch partition
(which the availableNow file feed fixes).  The reference fold
(:func:`spacesaving_reference`) replays the same batches driver-side, so
tests pin the stream byte-for-byte AND check the guarantee bounds against
exact counts under shuffled arrival orders and a mid-stream restart.
SpaceSaving stays order-sensitive ACROSS batches, hence no value-hash
oracle — the documented weaker-certificate class for order-sensitive
streaming state; the hashed batch certificate is the MG twin.
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

from sarpro_spark.llm.sampling import hash_bucket

DEFAULT_CAPACITY = 16
DEFAULT_SHARDS = 4

_OUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("key", StringType()),
        StructField("count", LongType()),
        StructField("err", LongType()),
        StructField("n_shard", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("keys", StringType()),    # \x1f-joined key strings
        StructField("counts", StringType()),  # comma-joined ints
        StructField("errs", StringType()),
        StructField("n", LongType()),
    ]
)


def _fold_sorted(
    keys: list[str],
    counts: list[int],
    errs: list[int],
    n: int,
    batch_keys: list[str],
    capacity: int,
) -> int:
    """The SpaceSaving fold over one batch, keys pre-sorted; mutates the
    summary lists in place, returns the new n."""
    table = {k: i for i, k in enumerate(keys)}
    for k in sorted(batch_keys):
        n += 1
        i = table.get(k)
        if i is not None:
            counts[i] += 1
        elif len(keys) < capacity:
            table[k] = len(keys)
            keys.append(k)
            counts.append(1)
            errs.append(0)
        else:
            # evict the min-count entry; ties broken by key order
            j = min(range(len(keys)), key=lambda i: (counts[i], keys[i]))
            del table[keys[j]]
            table[k] = j
            errs[j] = counts[j]
            counts[j] += 1
            keys[j] = k
    return n


def _make_update(capacity: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        if state.exists:
            ks, cs, es, n = state.get
            keys = ks.split("\x1f") if ks else []
            counts = [int(x) for x in cs.split(",")] if cs else []
            errs = [int(x) for x in es.split(",")] if es else []
        else:
            keys, counts, errs, n = [], [], [], 0
        batch_keys: list[str] = []
        for pdf in pdfs:
            batch_keys.extend(pdf["key"].astype(str))
        n = _fold_sorted(keys, counts, errs, n, batch_keys, capacity)
        state.update(
            ("\x1f".join(keys), ",".join(map(str, counts)), ",".join(map(str, errs)), n)
        )
        yield pd.DataFrame(
            {
                "shard": [shard] * len(keys),
                "key": keys,
                "count": counts,
                "err": errs,
                "n_shard": [n] * len(keys),
            }
        )

    return update


def spacesaving_stream(
    stream: DataFrame,
    key_col: str,
    shard_by: str,
    capacity: int = DEFAULT_CAPACITY,
    shards: int = DEFAULT_SHARDS,
    seed: str = "ss",
) -> DataFrame:
    """Per-micro-batch summary emission: after each batch every touched
    shard re-emits its full current summary (update-mode consumers
    overwrite by (shard, key); the drained final state is the last
    emission per shard)."""
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        (hash_bucket(F.col(shard_by), seed) % shards).cast("int").alias("shard"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_update(capacity),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def spacesaving_reference(
    batches: list[list[str]], capacity: int = DEFAULT_CAPACITY
) -> tuple[list[str], list[int], list[int], int]:
    """Driver-side replay of the identical fold over an explicit batch
    sequence — the byte-for-byte determinism twin used by tests."""
    keys: list[str] = []
    counts: list[int] = []
    errs: list[int] = []
    n = 0
    for batch in batches:
        n = _fold_sorted(keys, counts, errs, n, [str(k) for k in batch], capacity)
    return keys, counts, errs, n

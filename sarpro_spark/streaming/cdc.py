"""Streaming CDC: continuous changelog arrival maintaining a snapshot.

The batch half lives in operators/cdc.py (apply_changelog / scd2_history
/ snapshot_diff); this module is the arrival side: changelog rows LAND
continuously (a Debezium topic, a drop directory of change files) and a
queryable snapshot must track them — the streaming MERGE INTO.

Shape (same doctrine as streaming/ingest.py):

  foreachBatch      each micro-batch of changelog rows is applied with
                    the IDENTICAL batch operator (apply_changelog), so
                    stream and batch cannot diverge by construction.
  versioned dirs    the snapshot after batch N writes to
                    ``<out>/v=<N>`` with OVERWRITE.  foreachBatch is
                    at-least-once; a replayed epoch overwrites its own
                    version directory — idempotent, never doubled.
  latest = max v    readers resolve the newest COMMITTED version (a
                    version is committed when Spark's parquet job wrote
                    its _SUCCESS marker); a crash mid-write leaves an
                    uncommitted directory that the next replay
                    overwrites.  Old versions are retained (time travel
                    for free) and pruned by retention, not correctness.

Chained application: batch N applies on top of the snapshot of batch
N-1 — the stream folds the changelog, so out-of-order WITHIN a batch is
resolved by seq (latest_change_per_key) and ACROSS batches by arrival
order, the Kafka-compaction contract.

Exactly-once across restart is asserted in tests/test_streaming.py: the
stream is killed after a batch commits and resumed from the checkpoint;
replayed epochs land in their own version dirs and the final snapshot
equals the batch operator folded over the same changelog.

Scale: each micro-batch costs one apply_changelog (two key shuffles) on
the CURRENT snapshot + the micro-batch — at 100 TB the snapshot side is
the dominant term, and the bucketed layout (q_bucketed_colocated_join)
makes both shuffles map-side; version dirs hold data files only once
per epoch (no accumulation beyond retention).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from sarpro_spark.operators.cdc import apply_changelog


def _committed_versions(out_dir: str) -> list[int]:
    if not os.path.isdir(out_dir):
        return []
    vs = []
    for d in os.listdir(out_dir):
        m = re.fullmatch(r"v=(\d+)", d)
        if m and os.path.exists(os.path.join(out_dir, d, "_SUCCESS")):
            vs.append(int(m.group(1)))
    return sorted(vs)


def latest_snapshot(spark: SparkSession, out_dir: str, base: DataFrame) -> DataFrame:
    """The newest committed snapshot version, or ``base`` before any."""
    vs = _committed_versions(out_dir)
    if not vs:
        return base
    return spark.read.parquet(os.path.join(out_dir, f"v={vs[-1]}"))


def maintain_snapshot_stream(
    changes_stream: DataFrame,
    base: DataFrame,
    key_col: str,
    out_dir: str,
    checkpoint_dir: str,
    seq_col: str = "seq",
    op_col: str = "op",
    transform=None,
):
    """Start the snapshot-maintenance stream; returns the StreamingQuery.

    ``transform`` (testing seam, same as streaming/ingest.py): applied to
    each micro-batch before the merge — the restart test uses it to force
    a mid-epoch crash.

    ``changes_stream`` is a streaming DataFrame of changelog rows (base
    schema + seq + op).  The caller drains/stops it (availableNow or
    continuous trigger both work — the test certifies a forced restart).
    """
    spark = base.sparkSession
    payload_cols = base.columns

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        # a replay of epoch N must apply to the snapshot BEFORE N: if v=N
        # already exists (committed or torn), the newest version strictly
        # below N is the correct parent; before any version, the base
        vs = [v for v in _committed_versions(out_dir) if v < epoch_id]
        if vs:
            current = spark.read.parquet(os.path.join(out_dir, f"v={vs[-1]}"))
        else:
            current = base
        new_snap = apply_changelog(
            current.select(*payload_cols), batch_df, key_col, seq_col, op_col
        ).select(*payload_cols)
        new_snap.write.mode("overwrite").parquet(os.path.join(out_dir, f"v={epoch_id}"))

    return (
        changes_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )

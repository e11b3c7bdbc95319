"""Streaming incremental aggregate maintenance (r13, verdict item 8).

operators/incremental.py maintains a grouped materialized view from ONE
changelog batch; this module is its arrival side: changelog rows land
continuously and the view must track them under the SAME exactly-once
versioned-directory gate as streaming/cdc.py (foreachBatch + per-epoch
OVERWRITE into ``v=<epoch>`` dirs + newest-committed-below-epoch parent
resolution — a replayed or torn epoch is overwritten, never compounded).

Two stores live under ``out_dir``:

  snap/v=N   the row-level snapshot after epoch N (apply_changelog) —
             the retraction-payload source for epoch N+1 (min/max are not
             self-maintainable, so the maintainer must be able to read the
             OLD payloads of touched keys and the affected groups'
             survivors; both are key-/group-scoped joins, never a scan
             cost at 100 TB).
  view/v=N   the maintained aggregate view after epoch N — what readers
             (latest_view) serve.

Both writes happen inside one epoch handler; commit order is snap first,
view second, and the parent-resolution rule keys BOTH off the view store's
committed set, so a crash between the two writes replays the epoch and
overwrites both (the restart test plants torn dirs in each).

Scale: per epoch the maintainer touches (a) the changelog batch, (b) the
previous snapshot restricted to touched keys / affected groups by
semi-join, (c) the previous view (group-grain).  Retention: the version
dirs are pruned by streaming/cdc.py vacuum_versions (pass
``posixpath.join(out_dir, "snap")`` / ``"view"`` — same layout).

Reference analog: none (raster engine); built for the pipeline mandate.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession

from sarpro_spark.operators.cdc import apply_changelog
from sarpro_spark.operators.incremental import group_aggregate, maintain_group_aggregate
from sarpro_spark.streaming.cdc import _committed_versions


def latest_view(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The newest committed aggregate-view version, or None before any."""
    vs = _committed_versions(spark, posixpath.join(out_dir, "view"))
    if not vs:
        return None
    return spark.read.parquet(posixpath.join(out_dir, "view", f"v={vs[-1]}"))


def maintain_group_aggregate_stream(
    changes_stream: DataFrame,
    base: DataFrame,
    key_col: str,
    group_col: str,
    val_col: str,
    out_dir: str,
    checkpoint_dir: str,
    seq_col: str = "seq",
    op_col: str = "op",
    transform=None,
):
    """Start the view-maintenance stream; returns the StreamingQuery.

    Each micro-batch runs the IDENTICAL batch maintainer
    (operators/incremental.py maintain_group_aggregate) against the newest
    committed snapshot strictly below the epoch, so stream and batch
    cannot diverge by construction; the post-batch snapshot (the next
    epoch's retraction source) commits alongside the view.

    ``transform`` is the testing seam (mid-epoch crash injection), same
    doctrine as streaming/cdc.py.
    """
    spark = base.sparkSession
    payload_cols = base.columns
    snap_dir = posixpath.join(out_dir, "snap")
    view_dir = posixpath.join(out_dir, "view")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        # parent resolution keys off the VIEW store (committed last): a
        # crash after snap committed but before view did replays the epoch
        # and overwrites both dirs
        vs = [v for v in _committed_versions(spark, view_dir) if v < epoch_id]
        if vs:
            current = spark.read.parquet(posixpath.join(snap_dir, f"v={vs[-1]}"))
            # the previous VIEW is the previous aggregate state — group-grain,
            # so each epoch never re-aggregates the full snapshot (the point
            # of incremental maintenance; the batch operator would otherwise
            # recompute prev_agg by scanning the snapshot)
            prev_agg = spark.read.parquet(
                posixpath.join(view_dir, f"v={vs[-1]}")
            ).select("grp", "n", "total", "vmin", "vmax")
        else:
            current = base
            prev_agg = None
        new_view = maintain_group_aggregate(
            current.select(*payload_cols), batch_df, key_col, group_col, val_col,
            seq_col, op_col, prev_agg=prev_agg,
        )
        new_snap = apply_changelog(
            current.select(*payload_cols), batch_df, key_col, seq_col, op_col
        ).select(*payload_cols)
        new_snap.write.mode("overwrite").parquet(posixpath.join(snap_dir, f"v={epoch_id}"))
        new_view.write.mode("overwrite").parquet(posixpath.join(view_dir, f"v={epoch_id}"))

    return (
        changes_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def view_certificate(
    spark: SparkSession, out_dir: str, snapshot: DataFrame, group_col: str, val_col: str
) -> DataFrame:
    """(grp, n, total, vmin, vmax, view_ok) — the drained view full-outer
    joined with the batch full recompute over ``snapshot``; every value
    column's equality is carried as data (the stream==batch certificate
    shape used by the tests)."""
    from pyspark.sql import functions as F

    view = latest_view(spark, out_dir)
    truth = group_aggregate(snapshot, group_col, val_col)
    if view is None:
        return truth.select(
            "grp", "n", "total", "vmin", "vmax", F.lit(False).alias("view_ok")
        )
    v = view.select(
        "grp",
        F.col("n").alias("v_n"),
        F.col("total").alias("v_total"),
        F.col("vmin").alias("v_vmin"),
        F.col("vmax").alias("v_vmax"),
    )
    j = truth.join(v, "grp", "full_outer")
    ok = (
        (F.col("n") == F.col("v_n"))
        & (F.col("total") == F.col("v_total"))
        & (F.col("vmin").eqNullSafe(F.col("v_vmin")))
        & (F.col("vmax").eqNullSafe(F.col("v_vmax")))
    )
    return j.select("grp", "n", "total", "vmin", "vmax", ok.alias("view_ok"))

"""Temporal custom operators Spark lacks natively: as-of join, range join.

as-of join (the "latest right row at or before the left row's time" join of
time-series engines): implemented as the union-and-forward-fill pattern —
tag both sides, union, one shuffle on the key, forward-fill the right side's
payload over an ordered window, keep left rows. Cost: ONE shuffle of
|L|+|R| rows, no range explosion, no per-row search. This is the standard
scalable shape (a merge join in disguise); a sort-merge-bucketed layout makes
it shuffle-free when both sides are bucketed by key.

range join: equi-bucketized prefilter + exact predicate — each row lands in
ceil(range/bucket) buckets, candidates join on (key, bucket), the exact
inequality filters. Turns an O(|L|*|R|) inequality join into a bucket join
whose cost tracks true match density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row: the right row with the greatest right_time <=
    left_time for the same key (inclusive; right sorts before left on ties).
    Right side must be unique per (key, time) — pre-aggregate if not.
    Returns left columns + right payload columns (suffixed), null when no
    right row precedes."""
    rcols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    lt = left.select(
        F.col(on), F.col(left_time).alias("_t"), F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    rt = right.select(
        F.col(on), F.col(right_time).alias("_t"), F.lit(0).alias("_is_left"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    u = lt.unionByName(rt)
    # right rows (is_left=0) sort before left rows at equal time -> inclusive
    w = Window.partitionBy(on).orderBy("_t", "_is_left").rowsBetween(Window.unboundedPreceding, 0)
    filled = u.select(
        "*", *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}") for c in rcols]
    )
    out = filled.where(F.col("_is_left") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in rcols],
    )
    return out


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Same semantics as :func:`asof_join`, via the cogroup surface:
    ``left.groupby(key).cogroup(right.groupby(key)).applyInPandas`` with
    ``pd.merge_asof`` inside — both sides of one key land in one task, Arrow
    both ways. Preferable when per-key payloads are wide (merge_asof avoids
    materializing the union frame) or when a pandas-side epilogue follows
    anyway; the union-window form wins when key cardinality is low (no
    group-task skew). Equivalence is asserted in tests."""
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    rcols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    out_schema = StructType(
        [left.schema[c] for c in left.columns]
        + [StructField(f"{c}{suffix}", right.schema[c].dataType) for c in rcols]
    )
    lcols = list(left.columns)
    suffixed = [f"{c}{suffix}" for c in rcols]
    # Pre-alias the right side to names unique across BOTH cogroup sides.
    # Load-bearing: when the two sides share a source relation and a column
    # was withColumn-replaced under the same name (e.g. the events ts rebuilt
    # from nanos), Spark's cogroup Arrow writer can prune that column from
    # one side's batches — distinct names sidestep the attribute collision.
    right2 = right.select(
        F.col(on),
        F.col(right_time).alias("_rtime"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    )

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[*lcols, *suffixed])
        lpdf = lpdf.sort_values([left_time], kind="mergesort")
        if rpdf.empty:
            out = lpdf[lcols].copy()
            for c in suffixed:
                out[c] = None
            return out
        rr = rpdf.sort_values(["_rtime"], kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rr,
            left_on=left_time,
            right_on="_rtime",
            by=on,
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[[*lcols, *suffixed]]

    return (
        left.groupby(on)
        .cogroup(right2.groupby(on))
        .applyInPandas(fn, schema=out_schema)
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    max_delta_sec: float,
    bucket_sec: float | None = None,
) -> DataFrame:
    """Pairs (l, r) on the same key with |lt - rt| <= max_delta: both sides
    bucketize their epoch time; left probes its own and neighbor buckets, the
    exact predicate filters. Returns left.* + right payload columns
    (prefixed r_)."""
    if bucket_sec is None:
        bucket_sec = max_delta_sec
    lb = F.floor(F.unix_timestamp(F.col(left_time)) / F.lit(bucket_sec)).cast("long")
    rb = F.floor(F.unix_timestamp(F.col(right_time)) / F.lit(bucket_sec)).cast("long")
    n_probe = int(max_delta_sec // bucket_sec) + 1
    probes = F.explode(F.array(*[F.lit(i) for i in range(-n_probe, n_probe + 1)]))
    l2 = left.withColumn("_lb", lb).withColumn("_probe", probes).withColumn(
        "_bucket", F.col("_lb") + F.col("_probe")
    )
    rcols = [c for c in right.columns if c != on]
    r2 = right.select(
        F.col(on), rb.alias("_bucket"), *[F.col(c).alias(f"r_{c}") for c in rcols]
    )
    j = l2.join(r2, on=[on, "_bucket"])
    cond = (
        F.abs(
            F.unix_timestamp(F.col(left_time)).cast("double")
            - F.unix_timestamp(F.col(f"r_{right_time}")).cast("double")
        )
        <= max_delta_sec
    )
    return j.where(cond).drop("_lb", "_probe", "_bucket")

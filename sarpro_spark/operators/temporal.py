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


def resample_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_us: int,
) -> DataFrame:
    """Time-series resample + gap-fill (the hypertable ``time_bucket_gapfill``
    of TimescaleDB, InfluxDB's ``fill()``): bucket observations to a fixed
    step, generate each key's DENSE bucket grid between its first and last
    observation, and fill the empty buckets two ways at once —

      locf     last observation carried forward (step functions: state,
               config, price)
      linear   linear interpolation between the surrounding observations
               (continuous signals: sensors, rates)

    Shape: one per-(key,bucket) aggregate, one per-key bounds aggregate
    whose ``sequence()`` explode generates the grid (grid size is bounded
    by span/step per key — never a global calendar cross-join), one left
    join back, and two ordered per-key window passes (last/first IGNORE
    NULLS). Every stage shuffles on the key only; keys parallelize.

    Because the grid spans [first, last] per key, its endpoints are always
    observed buckets: locf is total and interior gaps always have BOTH
    neighbors, so linear is total too — no extrapolation policy needed.

    Output: (key, bucket_us, n_obs, v_avg nullable, locf, linear).
    """
    key, ts, val = F.col(key_col), F.col(ts_col), F.col(value_col)
    bucket = (F.floor(F.unix_micros(ts.cast("timestamp")) / F.lit(step_us)) * step_us).cast("long")
    obs = df.groupBy(key.alias("key"), bucket.alias("bucket_us")).agg(
        F.count(F.lit(1)).alias("n_obs"), F.avg(val).alias("v_avg")
    )
    bounds = obs.groupBy("key").agg(
        F.min("bucket_us").alias("_b0"), F.max("bucket_us").alias("_b1")
    )
    grid = bounds.select(
        "key",
        F.explode(F.sequence(F.col("_b0"), F.col("_b1"), F.lit(step_us))).alias("bucket_us"),
    )
    g = grid.join(obs, on=["key", "bucket_us"], how="left")

    w = Window.partitionBy("key").orderBy("bucket_us")
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w.rowsBetween(0, Window.unboundedFollowing)
    v = F.col("v_avg")
    t = F.col("bucket_us")
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(fwd)
    frac = (t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    linear = F.when(v.isNotNull(), v).otherwise(prev_v + (next_v - prev_v) * frac)
    return g.select(
        "key",
        "bucket_us",
        F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
        "v_avg",
        prev_v.alias("locf"),
        linear.alias("linear"),
    )


def sql_resample_gapfill(
    src_rel: str,
    key_expr: str,
    ts_col: str,
    value_col: str,
    step_us: int,
) -> str:
    """DuckDB twin of :func:`resample_gapfill` (same op order; the caller
    wraps with fround on the float columns)."""
    return f"""
WITH gfobs AS (
  SELECT {key_expr} AS key,
         CAST(FLOOR(EPOCH_US({ts_col}) / {step_us}) * {step_us} AS BIGINT) AS bucket_us,
         COUNT(*) AS n_obs, AVG({value_col}) AS v_avg
  FROM {src_rel}
  GROUP BY 1, 2
),
gfbounds AS (
  SELECT key, MIN(bucket_us) AS b0, MAX(bucket_us) AS b1 FROM gfobs GROUP BY key
),
gfgrid AS (
  SELECT b.key, g.bucket_us
  FROM gfbounds b, UNNEST(generate_series(b.b0, b.b1, {step_us})) AS g(bucket_us)
),
gfjoin AS (
  SELECT g.key, g.bucket_us, o.n_obs, o.v_avg
  FROM gfgrid g LEFT JOIN gfobs o ON g.key = o.key AND g.bucket_us = o.bucket_us
),
gffill AS (
  SELECT key, bucket_us, n_obs, v_avg,
    LAST_VALUE(v_avg IGNORE NULLS) OVER (PARTITION BY key ORDER BY bucket_us
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    LAST_VALUE(CASE WHEN v_avg IS NOT NULL THEN bucket_us END IGNORE NULLS)
        OVER (PARTITION BY key ORDER BY bucket_us
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
    FIRST_VALUE(v_avg IGNORE NULLS) OVER (PARTITION BY key ORDER BY bucket_us
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    FIRST_VALUE(CASE WHEN v_avg IS NOT NULL THEN bucket_us END IGNORE NULLS)
        OVER (PARTITION BY key ORDER BY bucket_us
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM gfjoin
)
SELECT key, bucket_us, CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_obs, v_avg,
       prev_v AS locf,
       CASE WHEN v_avg IS NOT NULL THEN v_avg
            ELSE prev_v + (next_v - prev_v)
                 * (CAST(bucket_us - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
       END AS linear
FROM gffill
""".strip()


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: int,
) -> DataFrame:
    """True interval x interval overlap join (closed intervals,
    ``ls <= re AND rs <= le``) — the genomics/occupancy/session-overlap
    operator the as-of and |t1-t2|<=d joins don't cover, since BOTH sides
    here have extent.

    Shape (the standard bucketized interval join): each interval registers
    in every span bucket it touches (floor(start/B)..floor(end/B) — a
    bounded sequence explode, fan-out = ceil(span/B)+1), candidates join
    on (key, bucket), and each overlapping pair is COUNTED EXACTLY ONCE
    by the first-shared-bucket rule: a pair that overlaps shares every
    bucket from max(floor(ls/B), floor(rs/B)) upward, so only the
    candidate row where bucket == that maximum survives — no distinct
    pass, no pair blow-up.  The exact predicate filters the bucket-grain
    false positives.  Cost tracks true match density; bucket width trades
    explode fan-out against candidate precision (pick ~= median span).

    Returns left.* + right payload columns prefixed ``r_``.
    """
    lb0 = F.floor(F.col(left_start) / F.lit(bucket)).cast("long")
    lb1 = F.floor(F.col(left_end) / F.lit(bucket)).cast("long")
    rb0 = F.floor(F.col(right_start) / F.lit(bucket)).cast("long")
    rb1 = F.floor(F.col(right_end) / F.lit(bucket)).cast("long")
    l2 = left.withColumn("_bucket", F.explode(F.sequence(lb0, lb1))).withColumn(
        "_lb0", lb0
    )
    rcols = [c for c in right.columns if c != on]
    r2 = right.select(
        F.col(on),
        F.explode(F.sequence(rb0, rb1)).alias("_bucket"),
        rb0.alias("_rb0"),
        *[F.col(c).alias(f"r_{c}") for c in rcols],
    )
    j = l2.join(r2, on=[on, "_bucket"])
    first_shared = F.greatest(F.col("_lb0"), F.col("_rb0"))
    overlap = (F.col(left_start) <= F.col(f"r_{right_end}")) & (
        F.col(f"r_{right_start}") <= F.col(left_end)
    )
    return (
        j.where((F.col("_bucket") == first_shared) & overlap)
        .drop("_bucket", "_lb0", "_rb0")
    )


def sql_interval_overlap_join(
    left_rel: str,
    right_rel: str,
    on: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: int,
    left_cols: list[str],
    right_cols: list[str],
) -> str:
    """DuckDB twin of :func:`interval_overlap_join` (same bucketization and
    first-shared-bucket dedup)."""
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    rsel = ", ".join(f"r.{c} AS r_{c}" for c in right_cols)
    return f"""
SELECT {lsel}, {rsel}
FROM {left_rel} l
JOIN (SELECT UNNEST(RANGE(0, (SELECT CAST(MAX(FLOOR(({left_end}) / {bucket}) - FLOOR(({left_start}) / {bucket})) AS BIGINT) + 1 FROM {left_rel}))) AS k) lk
  ON lk.k <= FLOOR((l.{left_end}) / {bucket}) - FLOOR((l.{left_start}) / {bucket})
JOIN {right_rel} r
  ON r.{on} = l.{on}
 AND FLOOR((l.{left_start}) / {bucket}) + lk.k
     BETWEEN FLOOR((r.{right_start}) / {bucket}) AND FLOOR((r.{right_end}) / {bucket})
 AND FLOOR((l.{left_start}) / {bucket}) + lk.k
     = GREATEST(FLOOR((l.{left_start}) / {bucket}), FLOOR((r.{right_start}) / {bucket}))
 AND l.{left_start} <= r.{right_end} AND r.{right_start} <= l.{left_end}
""".strip()

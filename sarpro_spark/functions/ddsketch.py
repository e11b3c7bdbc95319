"""Log-linear quantile sketch with relative-error buckets (r13).

The DDSketch family (Masson, Rim & Lee, VLDB 2019 — "DDSketch: a fast
and fully-mergeable quantile sketch with relative-error guarantees",
public paper): bucket positive values by log-spaced boundaries, keep one
counter per occupied bucket, answer quantiles from cumulative bucket
counts.  Unlike the rank-spaced summary (functions/quantiles.py, the
MRL/GK family), the bucket map is a PURE FUNCTION OF THE VALUE — so the
sketch is exactly mergeable AND fold-order-independent, which is what
buys the streaming twin (streaming/ddsketch.py) an EXACT drained-stream
== batch certificate (the KMV doctrine: commutative state, byte-equal).

Bucketing (integer-exact, both engines): for a positive integer v
(cents), e = floor(log2(v)) — computed as float log2 then corrected by
exact power-of-two comparisons, so libm boundary noise cannot move a
bucket — and for v >= 4 the sub-bucket q = floor(v / 2^(e-2)) % 4
(power-of-two scaling of an exact integer is exact in IEEE doubles).
bucket_id = 4*e + q covers [2^e + q*2^(e-2), 2^e + (q+1)*2^(e-2) - 1]:
relative width <= 1/4.  v in {1,2,3} get singleton buckets (id = v).

Certificate: est(q) is the covering bucket's [lo, hi]; the EXACT ranks
of lo and hi (one conditional-aggregation scan of the raw data) must
straddle the target rank — coverage proves the true q-quantile VALUE
lies inside the bucket, so the value error is the hashed rel_width.
All rank arithmetic integer (ceil-division targets).

Scale shape (100 TB): one projection computes bucket ids, one map-side-
combined groupBy builds the (<= ~100-row) sketch, the cumulative read-off
window sits on a plan-visible LIMIT (the audited bounded-window
exception), the exact-rank verify is one scan with a broadcast panel.

Reference analog: none (raster engine); built for the pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sarpro_spark.localrel import local_relation

#: integer percent quantile panel (rational targets: ceil(pct * N / 100))
DEFAULT_PANEL = (1, 10, 25, 50, 75, 90, 99)
#: structural bucket cap for the plan-visible LIMIT: 4 sub-buckets per
#: octave across int64's 63 octaves, plus the 3 singletons
MAX_BUCKETS = 63 * 4 + 3


def _exp2(e: Column) -> Column:
    return F.pow(F.lit(2.0), e.cast("double"))


def bucket_id_expr(v: Column) -> Column:
    """Integer-exact log-linear bucket id of a positive integer column."""
    e0 = F.floor(F.log2(v.cast("double"))).cast("long")
    e = (
        e0
        + F.when(_exp2(e0 + 1) <= v.cast("double"), F.lit(1)).otherwise(F.lit(0))
        - F.when(_exp2(e0) > v.cast("double"), F.lit(1)).otherwise(F.lit(0))
    )
    sub = (F.floor(v.cast("double") / _exp2(e - 2)).cast("long") % 4).cast("long")
    return F.when(v < 4, v.cast("long")).otherwise(4 * e + sub)


def bucket_lo_expr(b: Column) -> Column:
    """Inclusive lower bound of bucket id ``b`` (exact integer)."""
    e = F.floor(b / 4).cast("long")
    q = (b % 4).cast("long")
    big = (_exp2(e) + q.cast("double") * _exp2(e - 2)).cast("long")
    return F.when(b < 4, b.cast("long")).otherwise(big)


def bucket_hi_expr(b: Column) -> Column:
    """Inclusive upper bound of bucket id ``b`` (exact integer)."""
    e = F.floor(b / 4).cast("long")
    q = (b % 4).cast("long")
    big = (_exp2(e) + (q + 1).cast("double") * _exp2(e - 2)).cast("long") - 1
    return F.when(b < 4, b.cast("long")).otherwise(big)


def ddsketch_buckets(df: DataFrame, value_col: Column) -> DataFrame:
    """(bucket_id, cnt) — the whole sketch; one projection + one
    map-side-combined aggregate, <= MAX_BUCKETS rows structurally."""
    return (
        df.select(bucket_id_expr(value_col).alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddsketch_certificate(
    df: DataFrame,
    value_col: Column,
    panel: tuple[int, ...] = DEFAULT_PANEL,
) -> DataFrame:
    """(q_pct, bucket_id, est_lo, est_hi, target, rank_lo, rank_hi,
    n_total, covers_target, rel_width_pm) per panel quantile — the hashed
    coverage certificate.  rank_lo = #rows < est_lo, rank_hi = #rows <=
    est_hi (exact, from the raw data); covers_target pins
    rank_lo < target <= rank_hi; rel_width_pm = floor(1000 * width / lo)
    is the proven value-error budget in per-mille."""
    sk = ddsketch_buckets(df, value_col).limit(MAX_BUCKETS)
    w_cum = Window.orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sk.select("bucket_id", F.sum("cnt").over(w_cum).alias("cumw"))
    totals = df.agg(F.count(F.lit(1)).alias("n_total"))
    qpanel = local_relation(
        df.sparkSession, [(int(p),) for p in panel], "q_pct int"
    )
    targets = qpanel.crossJoin(F.broadcast(totals)).select(
        "q_pct", "n_total",
        F.floor((F.col("n_total") * F.col("q_pct") + 99) / 100)
        .cast("long")
        .alias("target"),
    )
    est = (
        targets.join(F.broadcast(cum), F.col("cumw") >= F.col("target"))
        .groupBy("q_pct", "n_total", "target")
        .agg(F.min("bucket_id").alias("bucket_id"))
        .select(
            "q_pct", "n_total", "target", "bucket_id",
            bucket_lo_expr(F.col("bucket_id")).alias("est_lo"),
            bucket_hi_expr(F.col("bucket_id")).alias("est_hi"),
        )
    )
    raw = df.select(value_col.alias("rv"))
    ranks = (
        raw.crossJoin(F.broadcast(est.select("q_pct", "est_lo", "est_hi")))
        .groupBy("q_pct")
        .agg(
            F.sum((F.col("rv") < F.col("est_lo")).cast("long")).alias("rank_lo"),
            F.sum((F.col("rv") <= F.col("est_hi")).cast("long")).alias("rank_hi"),
        )
    )
    return est.join(F.broadcast(ranks), "q_pct").select(
        "q_pct",
        "bucket_id",
        "est_lo",
        "est_hi",
        "target",
        "rank_lo",
        "rank_hi",
        "n_total",
        (
            (F.col("rank_lo") < F.col("target"))
            & (F.col("target") <= F.col("rank_hi"))
        ).alias("covers_target"),
        F.floor(
            1000 * (F.col("est_hi") - F.col("est_lo") + 1) / F.col("est_lo")
        )
        .cast("long")
        .alias("rel_width_pm"),
    )


# --- DuckDB twins --------------------------------------------------------------


def _sql_bucket_id(v: str) -> str:
    e0 = f"CAST(FLOOR(LOG2(CAST({v} AS DOUBLE))) AS BIGINT)"
    e = (
        f"({e0} + (CASE WHEN POW(2.0, {e0} + 1) <= CAST({v} AS DOUBLE) THEN 1 ELSE 0 END)"
        f" - (CASE WHEN POW(2.0, {e0}) > CAST({v} AS DOUBLE) THEN 1 ELSE 0 END))"
    )
    sub = f"(CAST(FLOOR(CAST({v} AS DOUBLE) / POW(2.0, {e} - 2)) AS BIGINT) % 4)"
    return f"(CASE WHEN {v} < 4 THEN CAST({v} AS BIGINT) ELSE 4 * {e} + {sub} END)"


def _sql_bucket_lo(b: str) -> str:
    e = f"CAST(FLOOR({b} / 4) AS BIGINT)"
    q = f"({b} % 4)"
    return (
        f"(CASE WHEN {b} < 4 THEN CAST({b} AS BIGINT) "
        f"ELSE CAST(POW(2.0, {e}) + {q} * POW(2.0, {e} - 2) AS BIGINT) END)"
    )


def _sql_bucket_hi(b: str) -> str:
    e = f"CAST(FLOOR({b} / 4) AS BIGINT)"
    q = f"({b} % 4)"
    return (
        f"(CASE WHEN {b} < 4 THEN CAST({b} AS BIGINT) "
        f"ELSE CAST(POW(2.0, {e}) + ({q} + 1) * POW(2.0, {e} - 2) AS BIGINT) - 1 END)"
    )


def sql_ddsketch_certificate(
    src_rel: str,
    value_expr: str,
    panel: tuple[int, ...] = DEFAULT_PANEL,
) -> str:
    """DuckDB algorithm-twin of :func:`ddsketch_certificate`."""
    panel_rows = ", ".join(f"({int(p)})" for p in panel)
    return f"""
WITH dd_vals AS (SELECT {value_expr} AS v FROM {src_rel}),
dd_sk AS MATERIALIZED (
  SELECT {_sql_bucket_id('v')} AS bucket_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM dd_vals GROUP BY 1
),
dd_cum AS (
  SELECT bucket_id, SUM(cnt) OVER (ORDER BY bucket_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
  FROM dd_sk
),
dd_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM dd_vals),
dd_panel (q_pct) AS (VALUES {panel_rows}),
dd_tgt AS (
  SELECT q_pct, n_total, (n_total * q_pct + 99) // 100 AS target
  FROM dd_panel, dd_tot
),
dd_est AS (
  SELECT t.q_pct, t.n_total, t.target, MIN(c.bucket_id) AS bucket_id
  FROM dd_tgt t JOIN dd_cum c ON c.cumw >= t.target
  GROUP BY 1, 2, 3
),
dd_est2 AS (
  SELECT q_pct, n_total, target, bucket_id,
         {_sql_bucket_lo('bucket_id')} AS est_lo,
         {_sql_bucket_hi('bucket_id')} AS est_hi
  FROM dd_est
),
dd_ranks AS (
  SELECT e.q_pct,
         CAST(SUM(CASE WHEN r.v < e.est_lo THEN 1 ELSE 0 END) AS BIGINT) AS rank_lo,
         CAST(SUM(CASE WHEN r.v <= e.est_hi THEN 1 ELSE 0 END) AS BIGINT) AS rank_hi
  FROM dd_vals r CROSS JOIN dd_est2 e
  GROUP BY 1
)
SELECT e.q_pct, e.bucket_id, e.est_lo, e.est_hi, e.target,
       k.rank_lo, k.rank_hi, e.n_total,
       (k.rank_lo < e.target AND e.target <= k.rank_hi) AS covers_target,
       CAST(FLOOR(1000 * (e.est_hi - e.est_lo + 1) / e.est_lo) AS BIGINT) AS rel_width_pm
FROM dd_est2 e JOIN dd_ranks k USING (q_pct)
""".strip()

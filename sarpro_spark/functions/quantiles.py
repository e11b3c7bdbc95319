"""Mergeable approximate quantile summaries with a hashed rank-error bound.

The quantile sibling of the Misra-Gries heavy-hitter summary
(functions/heavyhitters.py): at 100 TB you cannot sort the data to answer
"p99 latency per day" — each SHARD keeps a bounded, rank-spaced sample of
its sorted values with weights, summaries merge by weighted union, and a
quantile reads off the merged cumulative weights with a PROVEN rank error.

Method (the classic uniform-rank-sampling summary; family: Manku,
Rajagopalan & Lindsay SIGMOD'98, Greenwald & Khanna SIGMOD'01 — this is
the deterministic mergeable base form those papers refine):

  per shard p (n_p rows, capacity k): step_p = ceil(n_p / k); keep every
  step_p-th value in sort order (weight step_p) plus the shard maximum
  closing a partial block (weight n_p % step_p).  Weights sum to n_p.

  merge: union the weighted samples (<= shards * (k+1) rows, BOUNDED);
  est(q) = the smallest kept value whose cumulative weight >= the target
  rank ceil(q * N).

  bound: every kept value's cumulative weight undercounts its true rank
  by at most err_budget = sum_p step_p (each shard's in-flight block),
  so  rank(est(q)) in [target - err_budget, target + err_budget].

The registered certificate hashes the bound AS DATA: for a panel of
quantiles it emits (q, est, rank_lo, rank_hi, target, err_budget,
within_bound) where rank_lo/rank_hi are the EXACT ranks of est recomputed
from the raw data (one conditional-aggregation pass) — the DuckDB twin
replicates the full algorithm, so sharding, spacing, weights, merge order
and the bound check are all inside the value hash.

Determinism: shards by the house md5 bucket of a row-identity expression;
sort order is (value, row-id) — total, so both engines keep identical
samples.  All rank arithmetic is integer (targets via ceil-division on
rational q), no float boundaries.

Scale shape: the per-shard sort is shard-local (a cluster sorts
partitions independently — no global sort anywhere); the merged summary
is bounded, its single-partition cumsum window sits on a plan-visible
LIMIT (the audited bounded-window exception); the exact-rank verify is
one scan with a broadcast 7-row panel.

Reference analog: none (raster engine); built for the pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sarpro_spark.localrel import local_relation

from sarpro_spark.llm.sampling import hash_bucket, sql_hash_bucket

DEFAULT_CAPACITY = 64   # k: kept values per shard
DEFAULT_SHARDS = 8
#: integer percent quantile panel (rational targets: ceil(pct * N / 100))
DEFAULT_PANEL = (1, 10, 25, 50, 75, 90, 99)


def quantile_summary(
    df: DataFrame,
    value_col: str,
    rid_col: Column,
    capacity: int = DEFAULT_CAPACITY,
    shards: int = DEFAULT_SHARDS,
    seed: str = "qs",
) -> DataFrame:
    """The merged weighted summary: (v, w) with sum(w) = N, at most
    shards * (capacity + 1) rows.  ``rid_col`` must be a deterministic
    row-unique expression (the sort tie-break and the shard hash)."""
    k = int(capacity)
    base = df.select(
        F.col(value_col).alias("v"),
        rid_col.alias("rid"),
        (hash_bucket(rid_col, seed) % shards).alias("shard"),
    )
    w_rank = Window.partitionBy("shard").orderBy("v", "rid")
    w_all = Window.partitionBy("shard")
    ranked = base.select(
        "shard", "v",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("np"),
    ).withColumn("step", F.floor((F.col("np") + k - 1) / k).cast("long"))
    kept = ranked.where(
        (F.col("rn") % F.col("step") == 0)
        | ((F.col("rn") == F.col("np")) & (F.col("np") % F.col("step") != 0))
    ).select(
        "shard", "v", "rn",
        F.when(F.col("rn") % F.col("step") == 0, F.col("step"))
        .otherwise(F.col("np") % F.col("step"))
        .alias("w"),
    )
    return kept


def quantile_certificate(
    df: DataFrame,
    value_col: str,
    rid_col: Column,
    capacity: int = DEFAULT_CAPACITY,
    shards: int = DEFAULT_SHARDS,
    panel: tuple[int, ...] = DEFAULT_PANEL,
    seed: str = "qs",
) -> DataFrame:
    """(q_pct, est, target, rank_lo, rank_hi, err_budget, n_total,
    within_bound) per panel quantile — the hashed bound certificate."""
    k = int(capacity)
    kept = quantile_summary(df, value_col, rid_col, capacity, shards, seed)
    # bounded merged summary: <= shards*(k+1) rows STRUCTURALLY; the limit
    # makes the boundedness plan-visible for the single-partition cumsum
    # (the audited bounded-window exception)
    merged = kept.limit(shards * (k + 1))
    w_cum = Window.orderBy("v", "shard", "rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = merged.select("v", F.sum("w").over(w_cum).alias("cumw"))
    totals = df.agg(F.count("*").alias("n_total"))
    # err_budget = sum over shards of step_p, recomputed from shard sizes
    base_counts = df.select(
        (hash_bucket(rid_col, seed) % shards).alias("shard")
    ).groupBy("shard").agg(F.count("*").alias("np"))
    err_budget = base_counts.agg(
        F.sum(F.floor((F.col("np") + k - 1) / k)).cast("long").alias("err_budget")
    )
    qpanel = local_relation(
        df.sparkSession, [(int(p),) for p in panel], "q_pct int"
    )
    targets = qpanel.crossJoin(F.broadcast(totals)).select(
        "q_pct", "n_total",
        F.floor((F.col("n_total") * F.col("q_pct") + 99) / 100).cast("long").alias("target"),
    )
    # est(q) = min v with cumw >= target
    est = (
        targets.join(F.broadcast(cum), F.col("cumw") >= F.col("target"))
        .groupBy("q_pct", "n_total", "target")
        .agg(F.min("v").alias("est"))
    )
    # exact ranks of est from the raw data: one conditional-agg pass over a
    # broadcast panel
    raw = df.select(F.col(value_col).alias("rv"))
    ranks = (
        raw.crossJoin(F.broadcast(est.select("q_pct", "est")))
        .groupBy("q_pct", "est")
        .agg(
            F.sum((F.col("rv") < F.col("est")).cast("long")).alias("rank_lo"),
            F.sum((F.col("rv") <= F.col("est")).cast("long")).alias("rank_hi"),
        )
    )
    out = (
        est.join(ranks, ["q_pct", "est"])
        .crossJoin(F.broadcast(err_budget))
        .select(
            "q_pct",
            "est",
            "target",
            "rank_lo",
            "rank_hi",
            "err_budget",
            "n_total",
            (
                (F.col("target") >= F.col("rank_lo") - F.col("err_budget"))
                & (F.col("target") <= F.col("rank_hi") + F.col("err_budget"))
            ).alias("within_bound"),
        )
    )
    return out


def sql_quantile_certificate(
    src_rel: str,
    value_expr: str,
    rid_expr: str,
    capacity: int = DEFAULT_CAPACITY,
    shards: int = DEFAULT_SHARDS,
    panel: tuple[int, ...] = DEFAULT_PANEL,
    seed: str = "qs",
) -> str:
    """DuckDB algorithm-twin of :func:`quantile_certificate`."""
    k = int(capacity)
    panel_rows = ", ".join(f"({int(p)})" for p in panel)
    return f"""
WITH qs_base AS (
  SELECT {value_expr} AS v, {rid_expr} AS rid,
         ({sql_hash_bucket(rid_expr, seed)}) % {shards} AS shard
  FROM {src_rel}
),
qs_ranked AS (
  SELECT shard, v,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY v, rid) AS rn,
         COUNT(*) OVER (PARTITION BY shard) AS np
  FROM qs_base
),
qs_stepped AS (SELECT *, (np + {k} - 1) // {k} AS step FROM qs_ranked),
qs_kept AS (
  SELECT shard, v, rn,
         CASE WHEN rn % step = 0 THEN step ELSE np % step END AS w
  FROM qs_stepped
  WHERE rn % step = 0 OR (rn = np AND np % step <> 0)
),
qs_cum AS (
  SELECT v, SUM(w) OVER (ORDER BY v, shard, rn
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
  FROM qs_kept
),
qs_tot AS (SELECT COUNT(*) AS n_total FROM qs_base),
qs_err AS (
  SELECT CAST(SUM((np + {k} - 1) // {k}) AS BIGINT) AS err_budget
  FROM (SELECT shard, COUNT(*) AS np FROM qs_base GROUP BY 1) z
),
qs_panel(q_pct) AS (VALUES {panel_rows}),
qs_targets AS (
  SELECT q_pct, n_total,
         CAST((n_total * q_pct + 99) // 100 AS BIGINT) AS target
  FROM qs_panel, qs_tot
),
qs_est AS (
  SELECT t.q_pct, t.n_total, t.target, MIN(c.v) AS est
  FROM qs_targets t JOIN qs_cum c ON c.cumw >= t.target
  GROUP BY 1, 2, 3
),
qs_ranks AS (
  SELECT e.q_pct, e.est,
         CAST(SUM(CASE WHEN b.v < e.est THEN 1 ELSE 0 END) AS BIGINT) AS rank_lo,
         CAST(SUM(CASE WHEN b.v <= e.est THEN 1 ELSE 0 END) AS BIGINT) AS rank_hi
  FROM qs_base b CROSS JOIN qs_est e
  GROUP BY 1, 2
)
SELECT e.q_pct, e.est, e.target, r.rank_lo, r.rank_hi,
       x.err_budget, e.n_total,
       (e.target >= r.rank_lo - x.err_budget
        AND e.target <= r.rank_hi + x.err_budget) AS within_bound
FROM qs_est e JOIN qs_ranks r ON r.q_pct = e.q_pct AND r.est = e.est
CROSS JOIN qs_err x
""".strip()

"""Deterministic sampling operators for training-data mixture construction.

Random sampling is useless at pipeline scale if it is not REPRODUCIBLE: a
re-run must keep exactly the same rows (resumable jobs, auditable mixes).
Every operator here derives its randomness from md5(seed || id) — a pure
column expression, identical in the DuckDB oracle, shuffle-free for the
fraction filter and one bounded window for exact-k.

  hash_bucket      uniform [0, 1e6) bucket per row
  fraction_sample  keep rows with bucket < fraction * 1e6 — per-row Bernoulli
                   at corpus scale, zero shuffles, exact reproducibility
  stratified_sample  per-stratum fractions via a broadcast rate table
  topk_per_stratum   EXACT k rows per stratum, chosen by hash order — a
                   deterministic reservoir; one window over the stratum
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sarpro_spark.localrel import local_relation

BUCKETS = 1_000_000


def hash_bucket(id_col: Column, seed: str = "s0") -> Column:
    """Uniform bucket in [0, 1e6): int64 of the first 15 md5 hex chars of
    seed||id, mod 1e6 — exact integer arithmetic on both engines."""
    h = F.md5(F.concat(F.lit(seed), F.lit("|"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % BUCKETS


def sql_hash_bucket(id_expr: str, seed: str = "s0") -> str:
    return (
        f"CAST(('0x' || SUBSTR(MD5('{seed}' || '|' || CAST({id_expr} AS VARCHAR)), 1, 15)) AS BIGINT) % {BUCKETS}"
    )


def fraction_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: str = "s0"
) -> DataFrame:
    """Keep ~fraction of rows, deterministically. Pure filter: pushes down to
    the scan, no shuffle, stable across re-runs and engines."""
    return df.where(hash_bucket(F.col(id_col), seed) < int(fraction * BUCKETS))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    seed: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling — the mixture-construction primitive
    (e.g. keep 80% code, 20% web). The rate table rides a broadcast join;
    the filter itself is still per-row hash arithmetic."""
    spark = df.sparkSession
    rate_df = local_relation(
        spark,
        [(k, int(v * BUCKETS)) for k, v in sorted(rates.items())],
        f"{stratum_col} string, _cut long",
    )
    joined = df.join(F.broadcast(rate_df), stratum_col, "left")
    cut = F.coalesce(F.col("_cut"), F.lit(int(default_rate * BUCKETS)))
    return joined.where(hash_bucket(F.col(id_col), seed) < cut).drop("_cut")


def topk_per_stratum(
    df: DataFrame,
    k: int,
    stratum_col: str,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """EXACT k rows per stratum in deterministic hash order (id breaks hash
    ties) — a reproducible reservoir sample. One shuffle keyed by stratum;
    rank state per group is O(1) in Tungsten's window operator."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(stratum_col).orderBy(
        hash_bucket(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def sql_topk_per_stratum(
    src_sel: str, k: int, stratum_col: str, id_col: str = "doc_id", seed: str = "s0"
) -> str:
    """DuckDB twin of :func:`topk_per_stratum` (same hash order)."""
    return f"""
SELECT * EXCLUDE (_rn) FROM (
  SELECT s.*, ROW_NUMBER() OVER (
    PARTITION BY {stratum_col}
    ORDER BY {sql_hash_bucket(id_col, seed)} ASC, {id_col} ASC
  ) AS _rn
  FROM ({src_sel}) s
) t WHERE _rn <= {k}
""".strip()


def weighted_topk_per_stratum(
    df: DataFrame,
    k: int,
    stratum_col: str,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "s0",
    round_digits: int = 6,
) -> DataFrame:
    """EXACT-k WEIGHTED sampling without replacement per stratum
    (Efraimidis-Spirakis A-ES, public algorithm): each row gets key
    ln(u)/w with u uniform from the seeded hash and w its positive weight;
    the k LARGEST keys per stratum are a weighted sample — inclusion
    probability proportional to w, reproducible across runs and engines
    (the key is rounded with the shared fround and ties break on id, so
    libm ulp noise cannot flip membership). One stratum-keyed window, the
    same scale shape as the unweighted reservoir."""
    from pyspark.sql.window import Window as W

    from sarpro_spark.queries import fround

    u = (hash_bucket(F.col(id_col), seed).cast("double") + 0.5) / float(BUCKETS)
    key = fround(F.log(u) / F.col(weight_col).cast("double"), round_digits)
    w = W.partitionBy(stratum_col).orderBy(key.desc(), F.col(id_col).asc())
    return (
        df.withColumn("_wkey", key)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .withColumnRenamed("_wkey", "wkey")
        .withColumnRenamed("_rn", "rnk")
    )


def sql_weighted_topk_per_stratum(
    src_sel: str,
    k: int,
    stratum_col: str,
    weight_expr: str,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> str:
    """DuckDB twin of :func:`weighted_topk_per_stratum` (same key chain)."""
    from sarpro_spark.queries import sql_fround

    u = f"((({sql_hash_bucket(id_col, seed)}) + 0.5) / {float(BUCKETS)!r})"
    key = sql_fround(f"LN({u}) / CAST({weight_expr} AS DOUBLE)")
    return f"""
SELECT * EXCLUDE (_rn), _rn AS rnk FROM (
  SELECT s.*, {key} AS wkey, ROW_NUMBER() OVER (
    PARTITION BY {stratum_col}
    ORDER BY {key} DESC, {id_col} ASC
  ) AS _rn
  FROM ({src_sel}) s
) t WHERE _rn <= {k}
""".strip()

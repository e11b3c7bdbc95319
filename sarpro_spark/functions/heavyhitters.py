"""Distributed heavy hitters: mergeable Misra-Gries summaries.

The frequent-items sketch a 100 TB pipeline needs when the key domain is
too large to groupBy-count (hot URLs, hot n-grams, abusive users): each
SHARD builds a bounded m-entry summary locally, summaries merge
associatively, and the merged result carries a PROVEN error budget —
never a full shuffle of the key domain.

Method (public): Misra & Gries 1982 ("Finding repeated elements");
mergeability per Agarwal, Cormode, Huang, Phillips, Wei & Yi, PODS'12
("Mergeable summaries"): an exact per-shard count table is trimmed to m
entries by subtracting the (m+1)-th largest count t_p from every entry
and dropping non-positives — a valid MG summary under-counting each key
by at most t_p; summing summaries and trimming once more (t_g) keeps the
bound additive.  The output carries

    est(k)    final summary estimate (est <= freq, under-count only)
    total_err = sum_p t_p + t_g   (freq - est <= total_err for EVERY key)

so any key with freq > total_err is GUARANTEED present — the survival
certificate the registered query hashes: the summary full-outer-joined
with the exact counts restricted to guaranteed survivors; a dropped
survivor surfaces as a null-est row and flips the value hash.

Everything here is order-independent column algebra (counts, windows,
joins) — no RDDs, no Python in the row path — so the DuckDB oracle
recomputes the identical summary.  Shards are assigned by the house
deterministic md5 bucket, modeling data locality: at scale the per-shard
count is a map-side combine over the shard's own partitions and only the
m-entry summaries move.

Streaming twin: streaming/heavyhitters.py (SpaceSaving under
applyInPandasWithState — arrival-order dependent, certified by its
guarantee bounds in tests, not by value hash).

Reference analog: none (raster engine); built for the pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sarpro_spark.llm.sampling import hash_bucket, sql_hash_bucket

DEFAULT_CAPACITY = 16  # m: summary entries per shard and after merge
DEFAULT_SHARDS = 8


def mg_summary(
    df: DataFrame,
    key_col: str,
    capacity: int = DEFAULT_CAPACITY,
    shards: int = DEFAULT_SHARDS,
    shard_by: str | None = None,
    seed: str = "mg",
) -> DataFrame:
    """Merged Misra-Gries summary: (key, est, total_err, n_total).

    ``shard_by`` names the column whose hash assigns the shard.  It is
    REQUIRED (r12 ADVICE): sharding by the key itself is degenerate for
    MG semantics — a key's occurrences must spread across shards the way
    cluster partitions spread them, so pass a row-identity column."""
    if shard_by is None:
        raise ValueError(
            "mg_summary requires shard_by (a row-identity column): sharding "
            "by the key collapses each key into one shard, the degenerate "
            "layout the MG merge bound is not meant to describe"
        )
    m = int(capacity)
    shard = (hash_bucket(F.col(shard_by), seed) % shards).alias("shard")
    local = df.select(F.col(key_col).alias("key"), shard).groupBy("shard", "key").agg(
        F.count("*").alias("cnt")
    )
    w_shard = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("key"))
    ranked = local.withColumn("rn", F.row_number().over(w_shard))
    # t_p: the (m+1)-th largest local count (0 when the shard holds <= m keys)
    thr_p = (
        ranked.where(F.col("rn") == m + 1)
        .select("shard", F.col("cnt").alias("thr"))
    )
    trimmed = (
        ranked.join(thr_p, "shard", "left")
        .withColumn("est_p", F.col("cnt") - F.coalesce(F.col("thr"), F.lit(0)))
        .where(F.col("est_p") > 0)
    )
    # each shard contributes <= m entries, so the merged relation is bounded
    # by m*shards rows STRUCTURALLY; the limit is a no-op that makes the
    # boundedness plan-visible for the single-partition rank window below
    # (the audited bounded-window exception, same doctrine as llm/tfidf.py)
    merged = (
        trimmed.groupBy("key")
        .agg(F.sum("est_p").alias("est_m"))
        .limit(m * shards)
    )
    w_g = Window.orderBy(F.desc("est_m"), F.asc("key"))
    ranked_g = merged.withColumn("rn", F.row_number().over(w_g))
    thr_g = ranked_g.where(F.col("rn") == m + 1).select(
        F.col("est_m").alias("thr_g")
    )
    err_p = thr_p.agg(F.coalesce(F.sum("thr"), F.lit(0)).alias("err_p"))
    n_total = df.agg(F.count("*").alias("n_total"))
    budget = (
        err_p.crossJoin(thr_g.agg(F.coalesce(F.sum("thr_g"), F.lit(0)).alias("thr_g")))
        .crossJoin(n_total)
        .select(
            (F.col("err_p") + F.col("thr_g")).alias("total_err"),
            "n_total",
        )
    )
    # final trim: subtract t_g from every merged estimate, keep positives;
    # both 1-row relations broadcast (bounded by construction: one scalar)
    return (
        ranked_g.crossJoin(F.broadcast(budget))
        .crossJoin(
            F.broadcast(thr_g.agg(F.coalesce(F.sum("thr_g"), F.lit(0)).alias("tg")))
        )
        .withColumn("est", F.col("est_m") - F.col("tg"))
        .where(F.col("est") > 0)
        .select("key", "est", "total_err", "n_total")
    )


def sql_mg_summary(
    src_rel: str,
    key_expr: str,
    capacity: int = DEFAULT_CAPACITY,
    shards: int = DEFAULT_SHARDS,
    shard_by_expr: str = "event_id",
    seed: str = "mg",
) -> str:
    """DuckDB twin CTE chain ending in ``mg_final`` (key, est, total_err,
    n_total) — the identical trim/merge/trim algebra."""
    m = int(capacity)
    return f"""
mg_keyed AS (
  SELECT {key_expr} AS key,
         ({sql_hash_bucket(shard_by_expr, seed)}) % {shards} AS shard
  FROM {src_rel}
),
mg_local AS (SELECT shard, key, COUNT(*) AS cnt FROM mg_keyed GROUP BY 1, 2),
mg_ranked AS (
  SELECT shard, key, cnt,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY cnt DESC, key ASC) AS rn
  FROM mg_local
),
mg_thrp AS (SELECT shard, cnt AS thr FROM mg_ranked WHERE rn = {m + 1}),
mg_trim AS (
  SELECT r.key, r.cnt - COALESCE(t.thr, 0) AS est_p
  FROM mg_ranked r LEFT JOIN mg_thrp t USING (shard)
  WHERE r.cnt - COALESCE(t.thr, 0) > 0
),
mg_merged AS (SELECT key, SUM(est_p) AS est_m FROM mg_trim GROUP BY 1),
mg_rankedg AS (
  SELECT key, est_m, ROW_NUMBER() OVER (ORDER BY est_m DESC, key ASC) AS rn
  FROM mg_merged
),
mg_budget AS (
  SELECT (SELECT COALESCE(SUM(thr), 0) FROM mg_thrp)
         + (SELECT COALESCE(SUM(est_m), 0) FROM mg_rankedg WHERE rn = {m + 1}) AS total_err,
         (SELECT COUNT(*) FROM mg_keyed) AS n_total
),
mg_final AS (
  SELECT r.key,
         r.est_m - (SELECT COALESCE(SUM(est_m), 0) FROM mg_rankedg WHERE rn = {m + 1}) AS est,
         b.total_err, b.n_total
  FROM mg_rankedg r, mg_budget b
  WHERE r.est_m - (SELECT COALESCE(SUM(est_m), 0) FROM mg_rankedg WHERE rn = {m + 1}) > 0
)""".strip()


def mg_survival_certificate(
    df: DataFrame,
    key_col: str,
    capacity: int = DEFAULT_CAPACITY,
    shards: int = DEFAULT_SHARDS,
    shard_by: str | None = None,
    seed: str = "mg",
) -> DataFrame:
    """The hashed certificate: the MG summary full-outer-joined with the
    exact counts, restricted to keys that are in the summary OR are
    guaranteed survivors (freq > total_err).  Columns prove the three MG
    invariants as data: under-count only (lower_ok), bounded error
    (within_err), and survival (a guaranteed survivor missing from the
    summary would surface with est NULL and flip the hash)."""
    summ = mg_summary(df, key_col, capacity, shards, shard_by, seed)
    exact = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("freq"))
    budget = summ.agg(
        F.max("total_err").alias("total_err"), F.max("n_total").alias("n_total")
    )
    j = (
        exact.crossJoin(F.broadcast(budget))
        .join(summ.select("key", "est"), "key", "full_outer")
        .where(F.col("est").isNotNull() | (F.col("freq") > F.col("total_err")))
    )
    return j.select(
        "key",
        "freq",
        "est",
        "total_err",
        (F.col("est") <= F.col("freq")).alias("lower_ok"),
        ((F.col("freq") - F.col("est")) <= F.col("total_err")).alias("within_err"),
        (F.col("freq") > F.col("total_err")).alias("guaranteed_survivor"),
    )


def sql_mg_survival_certificate(
    src_rel: str,
    key_expr: str,
    capacity: int = DEFAULT_CAPACITY,
    shards: int = DEFAULT_SHARDS,
    shard_by_expr: str = "event_id",
    seed: str = "mg",
) -> str:
    """DuckDB twin of :func:`mg_survival_certificate`."""
    ctes = sql_mg_summary(src_rel, key_expr, capacity, shards, shard_by_expr, seed)
    return f"""
WITH {ctes},
mg_exact AS (SELECT {key_expr} AS key, COUNT(*) AS freq FROM {src_rel} GROUP BY 1),
mg_bdg AS (SELECT MAX(total_err) AS total_err, MAX(n_total) AS n_total FROM mg_final)
SELECT COALESCE(e.key, f.key) AS key,
       e.freq, CAST(f.est AS BIGINT) AS est, CAST(b.total_err AS BIGINT) AS total_err,
       (f.est <= e.freq) AS lower_ok,
       ((e.freq - f.est) <= b.total_err) AS within_err,
       (e.freq > b.total_err) AS guaranteed_survivor
FROM mg_exact e
FULL OUTER JOIN mg_final f USING (key)
CROSS JOIN mg_bdg b
WHERE f.est IS NOT NULL OR e.freq > b.total_err
""".strip()

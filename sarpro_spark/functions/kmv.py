"""KMV / theta sketches: set-operation cardinalities WITHOUT a join.

The cross-dataset sibling of the in-table HLL leg
(corpus_cardinality_sketch): estimate |A|, |B|, |A union B|,
|A intersect B| and Jaccard between two HUGE key sets from two bounded
bottom-k sketches — the production answer to "how much does this corpus
overlap that benchmark / that other snapshot" at 100 TB, where the exact
join is the most expensive query in the warehouse.

Method (public: Bar-Yossef et al. RANDOM'02 K-Minimum-Values; Dasgupta,
Lang, Rhodes & Thaler 2016, "A framework for estimating stream expression
cardinalities" — the theta-sketch formulation):

  hash      md5-derived 60-bit integer per key, normalized to (0,1) —
            deterministic, so BOTH engines build bit-identical sketches.
  sketch    the k smallest DISTINCT hash fractions of a set (bottom-k =
            TakeOrderedAndProject — never a global sort).
  theta     the k-th smallest of the UNION's distinct hashes; every
            sketch then retains h < theta and estimates |X| ~ |S_X|/theta,
            |A u B| ~ (k-1)/theta, |A n B| ~ |S_A n S_B|/theta.
  exactness when the union holds fewer than k distinct hashes the sketch
            IS the set and every estimate is exact (theta = 1) — both
            engines take the same branch.

Certificate: exact distinct counts recomputed next to the estimates, the
measured relative errors hashed, and the 3-sigma KMV bound
(rsd ~ 1/sqrt(k-2)) asserted as hashed booleans — the HLL-leg doctrine:
sketch drift past its published bound flips a value, not a test.

Reference analog: none (raster engine); built for the pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sarpro_spark.queries import fround, sql_fround

DEFAULT_K = 256


def kmv_tol(k: int) -> float:
    """3-sigma headroom on the published KMV rsd 1/sqrt(k-2) — derived from
    the CALLER's k (r12 ADVICE: a module-level constant from DEFAULT_K gave
    any non-default k the wrong band on both engines at once, which the
    hash certificate structurally cannot catch)."""
    return 3.0 / (k - 2) ** 0.5

_HASH_SPACE = float(1 << 60)


def key_hash(expr: Column, seed: str = "kmv") -> Column:
    """Deterministic hash fraction in (0, 1): 15 md5 hex chars -> 60-bit
    int -> /2^60 (exact in a double; identical in the SQL twin)."""
    h = F.md5(F.concat(F.lit(seed), F.lit("|"), expr.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") / F.lit(_HASH_SPACE)


def sql_key_hash(expr: str, seed: str = "kmv") -> str:
    return (
        f"(CAST(('0x' || SUBSTR(MD5('{seed}' || '|' || CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" / {_HASH_SPACE!r})"
    )


def kmv_overlap_certificate(
    a: DataFrame,
    a_expr: Column,
    b: DataFrame,
    b_expr: Column,
    k: int = DEFAULT_K,
) -> DataFrame:
    """ONE row: exact vs KMV-estimated |A|, |B|, |A u B|, |A n B| and
    Jaccard, with the measured relative errors and 3-sigma bound booleans
    hashed.  Builds bottom-k sketches per side (TakeOrdered, no global
    sort), derives theta from their merged bottom-k, and never joins the
    raw sets — the only exact work is the verification legs."""
    ha = a.select(key_hash(a_expr).alias("h")).distinct()
    hb = b.select(key_hash(b_expr).alias("h")).distinct()
    sa = ha.orderBy("h").limit(k)
    sb = hb.orderBy("h").limit(k)
    un = sa.unionByName(sb).distinct().orderBy("h").limit(k)
    spark = a.sparkSession

    # theta = the k-th smallest union hash when the union sketch is full,
    # else 1.0 (exact mode) — a 1-row aggregate over the bounded sketch
    th = un.agg(
        F.count(F.lit(1)).alias("nu"),
        F.max("h").alias("hmax"),
    ).select(
        F.when(F.col("nu") >= k, F.col("hmax")).otherwise(F.lit(1.0)).alias("theta"),
        F.col("nu"),
    )
    # retained-below-theta counts per side and for the hash intersection;
    # every relation here is sketch-sized (<= k rows)
    inter = sa.join(sb, "h", "inner")
    counts = (
        sa.crossJoin(F.broadcast(th))
        .where(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("ca"))
        .crossJoin(
            sb.crossJoin(F.broadcast(th))
            .where(F.col("h") < F.col("theta"))
            .agg(F.count(F.lit(1)).alias("cb"))
        )
        .crossJoin(
            inter.crossJoin(F.broadcast(th))
            .where(F.col("h") < F.col("theta"))
            .agg(F.count(F.lit(1)).alias("ci"))
        )
        .crossJoin(F.broadcast(th))
    )
    est = counts.select(
        F.col("theta"),
        F.when(F.col("theta") < 1.0, (F.lit(float(k - 1)) / F.col("theta")))
        .otherwise(F.col("nu").cast("double"))
        .alias("est_union"),
        (F.col("ca") / F.col("theta")).alias("est_a"),
        (F.col("cb") / F.col("theta")).alias("est_b"),
        (F.col("ci") / F.col("theta")).alias("est_inter"),
    )
    # exact verification legs (the expensive path the sketch replaces)
    ea = ha.agg(F.count(F.lit(1)).alias("exact_a"))
    eb = hb.agg(F.count(F.lit(1)).alias("exact_b"))
    ei = ha.join(hb, "h", "inner").agg(F.count(F.lit(1)).alias("exact_inter"))
    out = est.crossJoin(F.broadcast(ea)).crossJoin(F.broadcast(eb)).crossJoin(F.broadcast(ei))
    exact_union = F.col("exact_a") + F.col("exact_b") - F.col("exact_inter")
    tol = F.lit(kmv_tol(k))

    def ok(est_c: Column, exact_c: Column) -> Column:
        return F.abs(est_c - exact_c) <= tol * exact_c

    return out.select(
        F.col("exact_a"),
        F.col("exact_b"),
        exact_union.alias("exact_union"),
        F.col("exact_inter"),
        fround(F.col("est_a")).alias("est_a"),
        fround(F.col("est_b")).alias("est_b"),
        fround(F.col("est_union")).alias("est_union"),
        fround(F.col("est_inter")).alias("est_inter"),
        fround(
            F.col("exact_inter").cast("double") / exact_union.cast("double")
        ).alias("jaccard_exact"),
        fround(F.col("est_inter") / F.col("est_union")).alias("jaccard_est"),
        ok(F.col("est_a"), F.col("exact_a")).alias("a_ok"),
        ok(F.col("est_b"), F.col("exact_b")).alias("b_ok"),
        ok(F.col("est_union"), exact_union.cast("double")).alias("union_ok"),
    )


def sql_kmv_overlap_certificate(
    a_rel: str, a_expr: str, b_rel: str, b_expr: str, k: int = DEFAULT_K
) -> str:
    """DuckDB twin of :func:`kmv_overlap_certificate`."""
    tol = repr(kmv_tol(k))
    return f"""
WITH kmv_ha AS MATERIALIZED (SELECT DISTINCT {sql_key_hash(a_expr)} AS h FROM {a_rel}),
kmv_hb AS MATERIALIZED (SELECT DISTINCT {sql_key_hash(b_expr)} AS h FROM {b_rel}),
kmv_sa AS MATERIALIZED (SELECT h FROM kmv_ha ORDER BY h LIMIT {k}),
kmv_sb AS MATERIALIZED (SELECT h FROM kmv_hb ORDER BY h LIMIT {k}),
kmv_un AS MATERIALIZED (
  SELECT h FROM (SELECT DISTINCT h FROM (SELECT h FROM kmv_sa UNION ALL SELECT h FROM kmv_sb) z) d
  ORDER BY h LIMIT {k}
),
kmv_th AS (
  SELECT CASE WHEN COUNT(*) >= {k} THEN MAX(h) ELSE 1.0 END AS theta,
         COUNT(*) AS nu
  FROM kmv_un
),
kmv_cnt AS (
  SELECT
    (SELECT COUNT(*) FROM kmv_sa, kmv_th WHERE h < theta) AS ca,
    (SELECT COUNT(*) FROM kmv_sb, kmv_th WHERE h < theta) AS cb,
    (SELECT COUNT(*) FROM kmv_sa a JOIN kmv_sb b USING (h), kmv_th WHERE a.h < theta) AS ci,
    (SELECT theta FROM kmv_th) AS theta,
    (SELECT nu FROM kmv_th) AS nu
),
kmv_est AS (
  SELECT theta,
    CASE WHEN theta < 1.0 THEN CAST({k - 1} AS DOUBLE) / theta ELSE CAST(nu AS DOUBLE) END AS est_union,
    ca / theta AS est_a,
    cb / theta AS est_b,
    ci / theta AS est_inter
  FROM kmv_cnt
),
kmv_exact AS (
  SELECT
    (SELECT COUNT(*) FROM kmv_ha) AS exact_a,
    (SELECT COUNT(*) FROM kmv_hb) AS exact_b,
    (SELECT COUNT(*) FROM kmv_ha a JOIN kmv_hb b USING (h)) AS exact_inter
)
SELECT CAST(exact_a AS BIGINT) AS exact_a,
       CAST(exact_b AS BIGINT) AS exact_b,
       CAST(exact_a + exact_b - exact_inter AS BIGINT) AS exact_union,
       CAST(exact_inter AS BIGINT) AS exact_inter,
       {sql_fround('est_a')} AS est_a,
       {sql_fround('est_b')} AS est_b,
       {sql_fround('est_union')} AS est_union,
       {sql_fround('est_inter')} AS est_inter,
       {sql_fround('CAST(exact_inter AS DOUBLE) / (exact_a + exact_b - exact_inter)')} AS jaccard_exact,
       {sql_fround('est_inter / est_union')} AS jaccard_est,
       (ABS(est_a - exact_a) <= {tol} * exact_a) AS a_ok,
       (ABS(est_b - exact_b) <= {tol} * exact_b) AS b_ok,
       (ABS(est_union - (exact_a + exact_b - exact_inter)) <= {tol} * (exact_a + exact_b - exact_inter)) AS union_ok
FROM kmv_est, kmv_exact
""".strip()

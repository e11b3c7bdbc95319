"""A1: grouped histogram statistics — the engine's flagship aggregation.

Reference: ``compute_histogram_stats`` (/root/reference/src/core/processing/
autoscale.rs:35-160). Semantics reproduced exactly:

  pass 1: count / min / max / mean / population-std over *valid* pixels
  pass 2: fixed 4096-bin histogram over [min, max];
          bucket = floor(clamp((v-min) * (1/span), 0, 1) * 4096), capped 4095
  percentile(p): target rank = min(floor(p * n), n-1); walk the CDF to the
          bucket holding that rank; linear interpolation inside the bucket:
          value = min + bucket*bw + ((target - cum_before)/h) * bw,
          bw = span/4096
  degenerate all-equal group (span < f64::EPSILON): percentiles p<=0.5 -> min,
          p>0.5 -> max.  Empty group: no row (caller decides defaults).

Spark shape (designed for 100 TB): two shuffles total, both with map-side
partial aggregation; the per-group base stats are broadcast back for bucket
assignment, so no third shuffle. Percentile extraction happens on the tiny
(groups x 4096 max) histogram relation — driver-scale work stays off the
driver and inside Spark, but its cost is negligible regardless of input size.
The reference's Welford recurrence is a sequential-stream trick; Spark's
partial+final ``avg``/``stddev_pop`` is the distributed equivalent of the same
numerically-stable computation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sarpro_spark.localrel import local_relation

from sarpro_spark.types import F64_EPSILON, HIST_NUM_BINS

#: percentiles the reference computes, in its naming
PERCENTILES: list[tuple[str, float]] = [
    ("p01", 0.01),
    ("p02", 0.02),
    ("p05", 0.05),
    ("p10", 0.10),
    ("p25", 0.25),
    ("median", 0.5),
    ("p75", 0.75),
    ("p90", 0.90),
    ("p95", 0.95),
    ("p98", 0.98),
    ("p99", 0.99),
]

STAT_COLS = ["valid_count", "vmin", "vmax", "vmean", "vstd"] + [n for n, _ in PERCENTILES]


def base_stats(df: DataFrame, group_cols: list[str], value: str = "db") -> DataFrame:
    """Pass 1: count/min/max/mean/std_pop per group (input already filtered to
    valid pixels). One shuffle with map-side combine."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("valid_count"),
        F.min(value).alias("vmin"),
        F.max(value).alias("vmax"),
        F.avg(value).alias("vmean"),
        F.coalesce(F.stddev_pop(value), F.lit(0.0)).alias("vstd"),
    )


def bucket_expr(value: Column, vmin: Column, vmax: Column, num_bins: int = HIST_NUM_BINS) -> Column:
    """Bucket index exactly as the reference computes it (autoscale.rs:110-116):
    t = clamp((v-min) * (1/span), 0, 1); idx = min(floor(t*bins), bins-1).
    The multiply-by-reciprocal shape is kept so the oracle SQL twin produces
    bit-identical doubles."""
    span = vmax - vmin
    t = F.least(F.greatest((value - vmin) * (F.lit(1.0) / span), F.lit(0.0)), F.lit(1.0))
    return F.least(F.floor(t * F.lit(float(num_bins))).cast("int"), F.lit(num_bins - 1))


def histogram_stats(
    df: DataFrame,
    group_cols: list[str],
    value: str = "db",
    valid: str | None = "valid",
    num_bins: int = HIST_NUM_BINS,
    percentiles: list[tuple[str, float]] | None = None,
) -> DataFrame:
    """Full A1: one row per group with count/min/max/mean/std + interpolated
    histogram percentiles. Groups with zero valid pixels produce no row."""
    pcts = percentiles or PERCENTILES
    valid_df = df.filter(F.col(valid)) if valid else df
    base = base_stats(valid_df, group_cols, value)

    span = F.col("vmax") - F.col("vmin")
    degenerate = F.abs(span) < F.lit(F64_EPSILON)

    # Pass 2: histogram. Broadcast the per-group extents; second shuffle on
    # (group, bucket) with map-side combine.
    joined = valid_df.join(F.broadcast(base.where(~degenerate)), on=group_cols)
    hist = (
        joined.withColumn(
            "bucket", bucket_expr(F.col(value), F.col("vmin"), F.col("vmax"), num_bins)
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("h"))
    )

    # CDF inversion on the tiny histogram relation.
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    cum = hist.withColumn(
        "cum_before",
        F.coalesce(F.sum("h").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
    )

    spark = df.sparkSession
    pct_rows = local_relation(spark, [(n, p) for n, p in pcts], "pname string, p double")
    targets = base.join(F.broadcast(pct_rows)).select(
        *group_cols,
        "pname",
        "p",
        F.least(
            F.floor(F.col("p") * F.col("valid_count").cast("double")).cast("long"),
            F.col("valid_count") - F.lit(1),
        ).alias("target"),
        "vmin",
        "vmax",
    )

    bw = (F.col("vmax") - F.col("vmin")) / F.lit(float(num_bins))
    hit = (
        cum.join(targets, on=group_cols)
        .where((F.col("target") >= F.col("cum_before")) & (F.col("target") < F.col("cum_before") + F.col("h")))
        .select(
            *group_cols,
            "pname",
            (
                F.col("vmin")
                + F.col("bucket").cast("double") * bw
                + ((F.col("target") - F.col("cum_before")).cast("double") / F.col("h").cast("double")) * bw
            ).alias("pval"),
        )
    )
    pivoted = hit.groupBy(*group_cols).pivot("pname", [n for n, _ in pcts]).agg(F.first("pval"))

    out = base.join(pivoted, on=group_cols, how="left")
    # one withColumns call (keeps withColumn's replace-the-pivot-column
    # semantics, one analyzer pass instead of len(pcts) — guide §7.3)
    return out.withColumns(
        {
            name: F.when(
                degenerate | F.col(name).isNull(),
                F.col("vmin") if p <= 0.5 else F.col("vmax"),
            ).otherwise(F.col(name))
            for name, p in pcts
        }
    )


def approx_stats(
    df: DataFrame,
    group_cols: list[str],
    value: str = "db",
    valid: str | None = "valid",
    accuracy: int = 10000,
    percentiles: list[tuple[str, float]] | None = None,
) -> DataFrame:
    """The sketch fast path: percentile_approx (Greenwald-Khanna) replaces the
    explicit histogram — ONE shuffle instead of two, mergeable sketch state,
    the right default when sarpro-exact interpolation isn't required. Error
    <= 1/accuracy in rank terms; tested against :func:`histogram_stats`."""
    pcts = percentiles or PERCENTILES
    src = df.filter(F.col(valid)) if valid else df
    fracs = F.array(*[F.lit(p) for _, p in pcts])
    agg = src.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("valid_count"),
        F.min(value).alias("vmin"),
        F.max(value).alias("vmax"),
        F.avg(value).alias("vmean"),
        F.coalesce(F.stddev_pop(value), F.lit(0.0)).alias("vstd"),
        F.percentile_approx(value, fracs, accuracy).alias("_pcts"),
    )
    agg = agg.withColumns(
        {name: F.element_at("_pcts", i + 1) for i, (name, _) in enumerate(pcts)}
    )
    return agg.drop("_pcts")


def oracle_stats_ctes(
    source_cte: str,
    group_cols: list[str],
    value: str = "db",
    valid: str = "valid",
    num_bins: int = HIST_NUM_BINS,
    percentiles: list[tuple[str, float]] | None = None,
) -> str:
    """DuckDB CTE chain computing :func:`histogram_stats` (unrounded), ending
    in a relation ``stats`` with group cols + valid_count/vmin/vmax/vmean/vstd
    + percentiles. Generated from the same constants as the Spark side so the
    two stay in lock-step. ``source_cte`` must define a relation ``src`` with
    ``group_cols``, a double ``value`` and boolean ``valid`` (plus any pixel
    key columns downstream consumers need).
    """
    pcts = percentiles or PERCENTILES
    g = ", ".join(group_cols)
    pct_values = ", ".join(f"('{n}', CAST({p} AS DOUBLE))" for n, p in pcts)
    pct_select = ",\n  ".join(
        f"MAX(CASE WHEN pname = '{n}' THEN pval END) AS {n}" for n, _ in pcts
    )
    return f"""{source_cte},
valid_src AS (SELECT * FROM src WHERE {valid}),
base AS (
  SELECT {g}, COUNT(*) AS valid_count, MIN({value}) AS vmin, MAX({value}) AS vmax,
         AVG({value}) AS vmean, COALESCE(STDDEV_POP({value}), 0.0) AS vstd
  FROM valid_src GROUP BY {g}
),
hist AS (
  SELECT v.{g.replace(', ', ', v.')},
         LEAST(CAST(FLOOR(LEAST(GREATEST(({value} - b.vmin) * (1.0/(b.vmax - b.vmin)), 0.0), 1.0) * {num_bins}.0) AS INTEGER), {num_bins - 1}) AS bucket,
         COUNT(*) AS h
  FROM valid_src v JOIN base b USING ({g})
  WHERE ABS(b.vmax - b.vmin) >= {F64_EPSILON!r}
  GROUP BY ALL
),
cum AS (
  SELECT *, COALESCE(SUM(h) OVER (PARTITION BY {g} ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM hist
),
pcts(pname, p) AS (VALUES {pct_values}),
hit AS (
  SELECT c.{g.replace(', ', ', c.')}, t.pname,
         t.vmin + CAST(c.bucket AS DOUBLE) * ((t.vmax - t.vmin)/{num_bins}.0)
                + (CAST(t.target - c.cum_before AS DOUBLE)/CAST(c.h AS DOUBLE)) * ((t.vmax - t.vmin)/{num_bins}.0) AS pval
  FROM cum c
  JOIN (SELECT {g}, pname, p, vmin, vmax,
               LEAST(CAST(FLOOR(p * CAST(valid_count AS DOUBLE)) AS BIGINT), valid_count - 1) AS target
        FROM base CROSS JOIN pcts) t USING ({g})
  WHERE t.target >= c.cum_before AND t.target < c.cum_before + c.h
),
piv AS (
  SELECT {g}, {pct_select}
  FROM hit GROUP BY {g}
),
stats AS (
  SELECT b.{g.replace(', ', ', b.')}, b.valid_count, b.vmin, b.vmax, b.vmean, b.vstd,
         {", ".join(
             f"COALESCE(p.{n}, CASE WHEN {p} <= 0.5 THEN b.vmin ELSE b.vmax END) AS {n}"
             for n, p in pcts
         )}
  FROM base b LEFT JOIN piv p USING ({g})
)"""


def oracle_histogram_stats_sql(
    source_cte: str,
    group_cols: list[str],
    value: str = "db",
    valid: str = "valid",
    num_bins: int = HIST_NUM_BINS,
    percentiles: list[tuple[str, float]] | None = None,
    round_digits: int = 6,
) -> str:
    """Full DuckDB twin of :func:`histogram_stats` with fround'd output."""
    from sarpro_spark.queries import sql_fround

    pcts = percentiles or PERCENTILES
    g = ", ".join(group_cols)
    d = round_digits
    ctes = oracle_stats_ctes(source_cte, group_cols, value, valid, num_bins, pcts)
    return f"""
WITH {ctes}
SELECT {g}, valid_count,
       {sql_fround('vmin', d)} AS vmin, {sql_fround('vmax', d)} AS vmax,
       {sql_fround('vmean', d)} AS vmean, {sql_fround('vstd', d)} AS vstd,
       {", ".join(sql_fround(n, d) + f" AS {n}" for n, _ in pcts)}
FROM stats
""".strip()

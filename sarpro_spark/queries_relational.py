"""Relational-surface queries over the TPC-H-ish tables (SURVEY §2.8, §7.9).

The reference has no SQL surface; these queries prove the rebuilt engine's
relational completeness (joins, aggregation, windows, sorts) on the driver's
star schema, all Catalyst-native."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sarpro_spark import frames
from sarpro_spark.queries import fround, query, round_floats


_PRICING_SQL = """
SELECT
  l_returnflag, l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  (FLOOR(AVG(l_quantity) * 1000000.0 + 0.5) / 1000000.0) AS avg_qty,
  (FLOOR(AVG(l_extendedprice) * 1000000.0 + 0.5) / 1000000.0) AS avg_price,
  (FLOOR(AVG(l_discount) * 1000000.0 + 0.5) / 1000000.0) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".strip()


@query("pricing_summary", sql=_PRICING_SQL, tags=("relational", "agg"))
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical partial+final aggregation
    — map-side combine makes the shuffle carry only (4 groups x partials)."""
    li = frames.load_table(spark, sf_dir, "lineitem")
    out = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    out = out.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_base_price", 2).alias("sum_base_price"),
        F.round("sum_disc_price", 2).alias("sum_disc_price"),
        F.round("sum_charge", 2).alias("sum_charge"),
        fround(F.col("avg_qty"), 6).alias("avg_qty"),
        fround(F.col("avg_price"), 6).alias("avg_price"),
        fround(F.col("avg_disc"), 6).alias("avg_disc"),
        "count_order",
    )
    return out

"""Relational-surface queries over the TPC-H-ish tables (SURVEY §2.8, §7.9).

The reference has no SQL surface; these queries prove the rebuilt engine's
relational completeness (joins, aggregation, windows, sorts) on the driver's
star schema, all Catalyst-native."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sarpro_spark.localrel import local_relation

from sarpro_spark import frames
from sarpro_spark.queries import fround, query, round_floats, sql_fround


def _epoch_us(col: str) -> F.Column:
    """unix_micros that also accepts TIMESTAMP_NTZ (the testdata's native
    events.ts type): the NTZ->LTZ cast is value-preserving under the session's
    pinned UTC timezone, matching DuckDB's EPOCH_US on naive timestamps."""
    return F.unix_micros(F.col(col).cast("timestamp"))


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


# --- multi-join with broadcast dimensions ------------------------------------

_NATION_REVENUE_SQL = """
SELECT n.n_name, r.r_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""".strip()


@query("nation_revenue_join", sql=_NATION_REVENUE_SQL, tags=("relational", "join"))
def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join: the big fact shuffles once on orderkey; nation/region are
    explicit broadcasts (25/5 rows, genuinely fixed). customer is NOT hinted:
    it scales with SF (150k x SF rows — billions at the 100 TB design point),
    so the plan must be free to shuffle-join it; AQE's dynamic join selection
    still broadcasts it at small SF where it fits."""
    t = frames.load_all(spark, sf_dir)
    out = (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
    return out


# --- top-k with deterministic tiebreak ---------------------------------------

_TOP_PARTS_SQL = """
SELECT l_partkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem GROUP BY l_partkey
ORDER BY revenue DESC, l_partkey LIMIT 10
""".strip()


@query("top_revenue_parts", sql=_TOP_PARTS_SQL, tags=("relational", "topk"))
def q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heaps, only k
    rows reach the driver stage; no global sort. Revenue rounded BEFORE the
    order so ties resolve identically in both engines via the key tiebreak."""
    li = frames.load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("l_partkey")).limit(10)


# --- window functions --------------------------------------------------------

_WINDOW_SQL = """
SELECT o_custkey, o_orderkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
""".strip()


@query("window_rank_orders", sql=_WINDOW_SQL, tags=("relational", "window"))
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window pack: rank/dense_rank/row_number/lag + running sum. One shuffle
    on the partition key serves every frame (same partitioning reused)."""
    from pyspark.sql.window import Window as W

    o = frames.load_table(spark, sf_dir, "orders")
    by_price = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    by_price_det = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    by_date = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(by_price).alias("rnk"),
        F.dense_rank().over(by_price).alias("drnk"),
        F.row_number().over(by_price_det).alias("rn"),
        F.round(
            F.sum("o_totalprice").over(by_date.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.lag("o_orderkey", 1).over(by_date).alias("prev_order"),
    )


_WINDOW_ANALYTICS_SQL = """
SELECT o_custkey, o_orderkey,
       LEAD(o_orderkey, 1) OVER w_date AS next_order,
       NTILE(4) OVER w_price AS price_quartile,
       (FLOOR(PERCENT_RANK() OVER w_price * 1000000.0 + 0.5) / 1000000.0) AS price_pct_rank,
       (FLOOR(CUME_DIST() OVER w_price * 1000000.0 + 0.5) / 1000000.0) AS price_cume_dist,
       FIRST_VALUE(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order,
       LAST_VALUE(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_order,
       (FLOOR(AVG(o_totalprice) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0) AS moving_avg_3
FROM orders
WINDOW w_date AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""".strip()


@query("window_analytics_orders", sql=_WINDOW_ANALYTICS_SQL, tags=("relational", "window"))
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining window-function families beyond window_rank_orders:
    lead, ntile, percent_rank, cume_dist, first/last value with EXPLICIT
    row frames (the default frames differ per function across engines —
    pinning ROWS BETWEEN makes both engines compute the same peer sets),
    and a bounded 3-row moving average. Every ordering carries the
    o_orderkey tiebreak so ntile/percent_rank/cume_dist are deterministic
    under ties; one shuffle per distinct partitioning (two here)."""
    from pyspark.sql.window import Window as W

    from sarpro_spark.queries import fround

    o = frames.load_table(spark, sf_dir, "orders")
    w_date = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey", 1).over(w_date).alias("next_order"),
        F.ntile(4).over(w_price).alias("price_quartile"),
        fround(F.percent_rank().over(w_price), 6).alias("price_pct_rank"),
        fround(F.cume_dist().over(w_price), 6).alias("price_cume_dist"),
        F.first("o_orderkey").over(
            w_date.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("first_order"),
        F.last("o_orderkey").over(
            w_date.rowsBetween(W.currentRow, W.unboundedFollowing)
        ).alias("last_order"),
        fround(
            F.avg("o_totalprice").over(w_date.rowsBetween(-2, W.currentRow)), 2
        ).alias("moving_avg_3"),
    )


_WINDOW_RANGE_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS pri,
         CAST(FLOOR(EPOCH(o_orderdate) / 86400.0) AS BIGINT) AS day,
         CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, pri, day,
       CAST(SUM(cents) OVER (PARTITION BY pri ORDER BY day
          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS sum_trail_30,
       COUNT(*) OVER (PARTITION BY pri ORDER BY day
          RANGE BETWEEN CURRENT ROW AND 14 FOLLOWING) AS n_next_14,
       COUNT(*) OVER (PARTITION BY pri ORDER BY day
          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS peer_cnt,
       (FLOOR(COALESCE(
          CAST(SUM(cents) OVER wprev AS DOUBLE)
            / (CAST(COUNT(*) OVER wprev AS DOUBLE) * 100.0),
          0.0) * 1000000.0 + 0.5) / 1000000.0) AS avg_prev_60
FROM base
WINDOW wprev AS (PARTITION BY pri ORDER BY day
                 RANGE BETWEEN 60 PRECEDING AND 1 PRECEDING)
""".strip()


@query("window_range_frames", sql=_WINDOW_RANGE_SQL, tags=("relational", "window"))
def q_window_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame windows (r10, r9 verdict item 9): the certified window
    family pinned ROWS frames everywhere; this row pins the VALUE-based
    frame semantics under the oracle. Per order: a trailing-30-day revenue
    sum, a forward-14-day order count, the PEER count (RANGE BETWEEN
    CURRENT ROW AND CURRENT ROW = all rows sharing the ORDER BY value —
    the exact spot where RANGE and ROWS diverge under duplicate keys; the
    fixture has many same-day orders per priority), and a 60-to-1-day
    look-back average that EXCLUDES the current day's peers. Semantics
    pinned: the ORDER BY key is an integer epoch-day (both engines frame
    on identical int64 arithmetic — framing on raw timestamps would hang
    on interval-type differences); no tiebreak column is needed because
    RANGE aggregates are peer-closed (every peer sees the same frame);
    the empty-frame average is COALESCEd to 0 (both engines yield NULL,
    pinned explicitly); and the money accumulates as EXACT INTEGER CENTS
    with ONE double division at the end — sliding-frame SUM/AVG over
    doubles accumulates in engine-specific order (Spark's running
    add/remove vs DuckDB's segment tree) and disagreed in the last cent
    on 34/15000 rows. DuckDB's BIGINT window SUM widens to HUGEINT, so
    the twin casts to DOUBLE before dividing (the pack-member invariant).
    One shuffle on the partition key serves all four frames (same
    ordering reused)."""
    from pyspark.sql.window import Window as W

    from sarpro_spark.queries import fround

    o = frames.load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("bigint").alias("day"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint").alias("cents"),
    )
    w = W.partitionBy("pri").orderBy("day")
    wprev = w.rangeBetween(-60, -1)
    return base.select(
        "o_orderkey", "pri", "day",
        (F.sum("cents").over(w.rangeBetween(-30, 0)).cast("double") / 100.0)
        .alias("sum_trail_30"),
        F.count(F.lit(1)).over(w.rangeBetween(0, 14)).alias("n_next_14"),
        F.count(F.lit(1)).over(w.rangeBetween(0, 0)).alias("peer_cnt"),
        fround(
            F.coalesce(
                F.sum("cents").over(wprev).cast("double")
                / (F.count(F.lit(1)).over(wprev).cast("double") * 100.0),
                F.lit(0.0),
            ),
            6,
        ).alias("avg_prev_60"),
    )


# --- rollup / cube -----------------------------------------------------------

_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".strip()


@query("rollup_sales", sql=_ROLLUP_SQL, tags=("relational", "agg"))
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — partial aggregation feeds every grouping level
    from one shuffle (Spark expands sets map-side)."""
    li = frames.load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""".strip()


@query("grouping_sets_sales", sql=_GROUPING_SETS_SQL, tags=("relational", "agg"))
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-flag, per-status, and
    grand total from one shuffle (SQL surface — the DataFrame API exposes
    only rollup/cube)."""
    frames.load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


_CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""".strip()


@query("cube_orders", sql=_CUBE_SQL, tags=("relational", "agg"))
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = frames.load_table(spark, sf_dir, "orders")
    return li.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --- set operations ----------------------------------------------------------

_SET_OPS_SQL = """
WITH big_spenders AS (
  SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey HAVING SUM(o_totalprice) > 150000
),
machinery AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT custkey FROM big_spenders UNION SELECT custkey FROM machinery) u
UNION ALL
SELECT 'intersect', COUNT(*) FROM (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM machinery) i
UNION ALL
SELECT 'except', COUNT(*) FROM (SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM machinery) e
""".strip()


@query("set_operations", sql=_SET_OPS_SQL, tags=("relational", "setop"))
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = frames.load_table(spark, sf_dir, "orders")
    c = frames.load_table(spark, sf_dir, "customer")
    big = (
        o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
        .where(F.col("s") > 150000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    mach = c.where(F.col("c_mktsegment") == "MACHINERY").select(F.col("c_custkey").alias("custkey"))
    spark_ = o.sparkSession
    rows = [
        ("union", big.union(mach).distinct().count()),
        ("intersect", big.intersect(mach).count()),
        ("except", big.exceptAll(mach).distinct().count()),
    ]
    return local_relation(spark_, rows, "op string, n bigint")


# --- semi/anti joins ---------------------------------------------------------

_SEMI_ANTI_SQL = """
SELECT 'with_orders' AS kind, COUNT(*) AS n
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders', COUNT(*)
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""".strip()


@query("semi_anti_join", sql=_SEMI_ANTI_SQL, tags=("relational", "join"))
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti — existence joins that never materialize the
    probe side's payload (no row explosion at scale)."""
    c = frames.load_table(spark, sf_dir, "customer")
    o = frames.load_table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    return local_relation(
        spark, [("with_orders", semi), ("without_orders", anti)], "kind string, n bigint"
    )


# --- correlated-subquery decorrelation ---------------------------------------

_ABOVE_AVG_SQL = """
WITH cavg AS (SELECT o_custkey, AVG(o_totalprice) AS avg_price FROM orders GROUP BY o_custkey)
SELECT o.o_custkey, COUNT(*) AS n_above
FROM orders o JOIN cavg a USING (o_custkey)
WHERE o.o_totalprice > a.avg_price
GROUP BY o.o_custkey
""".strip()


@query("orders_above_cust_avg", sql=_ABOVE_AVG_SQL, tags=("relational", "join"))
def q_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated 'above my own average' — agg + self-join on the group key
    (what Catalyst rewrites correlated subqueries into)."""
    o = frames.load_table(spark, sf_dir, "orders")
    cavg = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.join(cavg, "o_custkey")
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


# --- scalar function pack ----------------------------------------------------

_SCALAR_SQL = """
SELECT event_id,
  UPPER(event_type) AS et_upper,
  SUBSTR(event_type, 1, 3) AS et_prefix,
  LENGTH(event_type) AS et_len,
  REPLACE(event_type, '_', '-') AS et_dash,
  CONCAT(event_type, '#', CAST(user_id AS VARCHAR)) AS et_tag,
  ABS(value - 50.0) AS v_center,
  (FLOOR(SQRT(ABS(value)) * 1000000.0 + 0.5) / 1000000.0) AS v_sqrt,
  (FLOOR(EXP(value / 100.0) * 1000000.0 + 0.5) / 1000000.0) AS v_exp,
  (FLOOR(LN(value + 1.0) * 1000000.0 + 0.5) / 1000000.0) AS v_ln,
  CAST(EXTRACT(year FROM ts) AS INTEGER) AS y,
  CAST(EXTRACT(month FROM ts) AS INTEGER) AS m,
  CAST(EXTRACT(day FROM ts) AS INTEGER) AS d,
  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS props_k
FROM events
WHERE value >= 0
""".strip()


@query("scalar_function_pack", sql=_SCALAR_SQL, tags=("relational", "scalar"))
def q_scalar_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.8 scalar families: string, math (fround'd transcendentals —
    libm differs across engines), date extraction, JSON path access. All
    JVM-side, whole-stage-codegen fused."""
    e = frames.load_table(spark, sf_dir, "events").where(F.col("value") >= 0)
    return e.select(
        "event_id",
        F.upper("event_type").alias("et_upper"),
        F.substring("event_type", 1, 3).alias("et_prefix"),
        F.length("event_type").alias("et_len"),
        F.regexp_replace("event_type", "_", "-").alias("et_dash"),
        F.concat(F.col("event_type"), F.lit("#"), F.col("user_id").cast("string")).alias("et_tag"),
        F.abs(F.col("value") - 50.0).alias("v_center"),
        fround(F.sqrt(F.abs("value")), 6).alias("v_sqrt"),
        fround(F.exp(F.col("value") / 100.0), 6).alias("v_exp"),
        fround(F.log(F.col("value") + 1.0), 6).alias("v_ln"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.get_json_object("props", "$.k").cast("int").alias("props_k"),
    )


# --- tumbling-window aggregation over events (batch twin of streaming) -------

_TUMBLING_SQL = """
SELECT CAST(FLOOR(EPOCH(ts) / 3600.0) AS BIGINT) AS hour_bucket,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS users
FROM events
GROUP BY 1, 2
""".strip()


@query("events_tumbling_hourly", sql=_TUMBLING_SQL, tags=("relational", "events"))
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows over the event stream — the batch twin of the
    Structured Streaming pipeline in sarpro_spark.streaming (same grouping,
    same results on bounded input)."""
    e = frames.load_table(spark, sf_dir, "events")
    return (
        e.withColumn("hour_bucket", F.floor(F.unix_timestamp("ts") / 3600).cast("bigint"))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("users"),
        )
    )


# --- skew-resistant aggregation (salted two-phase) ---------------------------

_SALTED_AGG_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       MIN(value) AS vmin, MAX(value) AS vmax
FROM events GROUP BY event_type
""".strip()


@query("skewed_agg_salted", sql=_SALTED_AGG_SQL, tags=("relational", "skew"))
def q_skewed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-handling surface: two-phase salted aggregation (shuffle on
    (key, salt) splits hot keys across reducers, second agg merges partials)
    over the low-cardinality event_type key — result identical to the plain
    GROUP BY the oracle states; DECIMAL sums keep the merge order-exact."""
    from sarpro_spark.functions.skew import salted_agg

    e = frames.load_table(spark, sf_dir, "events")
    prepped = e.withColumn("value_dec", F.col("value").cast("decimal(18,2)"))
    out = salted_agg(
        prepped,
        ["event_type"],
        {
            "n": ("count", "value_dec"),
            "total_dec": ("sum", "value_dec"),
            "vmin": ("min", "value"),
            "vmax": ("max", "value"),
        },
        salt_buckets=16,
        salt_from=["event_id"],
    )
    return out.select(
        "event_type", "n",
        F.col("total_dec").cast("double").alias("total"),
        "vmin", "vmax",
    )


# --- sliding windows (every event lands in window/slide buckets) -------------

_SLIDING_SQL = """
SELECT CAST((FLOOR(EPOCH(ts) / 900.0) - k.k) * 900 AS BIGINT) AS window_start,
       event_type, COUNT(*) AS n
FROM events, LATERAL (SELECT UNNEST(RANGE(0, 4)) AS k) k
GROUP BY 1, 2
""".strip()


@query("events_sliding_windows", sql=_SLIDING_SQL, tags=("relational", "events", "streaming"))
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows via the REAL F.window operator (1 h window / 15 min
    slide, epoch-aligned, UTC session) — each event replicated into 4
    buckets; the oracle enumerates the same 4 starts per event. Batch twin of
    streaming.sliding_counts (unified API: same expression streams)."""
    from sarpro_spark.streaming.events import sliding_counts

    e = frames.load_table(spark, sf_dir, "events")
    s = sliding_counts(e)
    return s.select(
        F.unix_timestamp("window_start").cast("bigint").alias("window_start"),
        "event_type",
        "n",
    )


# --- as-of join (custom temporal operator; DuckDB ASOF JOIN as oracle) -------

_ASOF_SQL = """
WITH su AS (
  SELECT user_id, ts, MAX(event_id) AS signup_event_id
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id, CAST(EPOCH_US(e.ts) AS BIGINT) AS ts_us,
       s.signup_event_id AS event_id_r,
       CAST(EPOCH_US(s.ts) AS BIGINT) AS ts_us_r
FROM events e
ASOF LEFT JOIN su s ON e.user_id = s.user_id AND e.ts >= s.ts
""".strip()


@query("events_asof_signup", sql=_ASOF_SQL, tags=("relational", "temporal"))
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (the time-series 'latest right at or before left' join
    Spark lacks): union-and-forward-fill — ONE shuffle of |L|+|R| on the key,
    no range explosion. Oracle: DuckDB's native ASOF JOIN."""
    from sarpro_spark.operators.temporal import asof_join

    e = frames.load_table(spark, sf_dir, "events")
    left = e.select("event_id", "user_id", "ts")
    right = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select("user_id", "ts", "event_id")
    )
    out = asof_join(left, right, on="user_id", left_time="ts", right_time="ts",
                    right_cols=["event_id", "ts"])
    return out.select(
        "event_id",
        "user_id",
        _epoch_us("ts").alias("ts_us"),
        F.col("event_id_r").alias("event_id_r"),
        _epoch_us("ts_r").alias("ts_us_r"),
    )


@query("events_asof_cogrouped", sql=_ASOF_SQL, tags=("relational", "temporal", "cogroup"))
def q_asof_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same as-of join via Spark's cogroup surface:
    left.groupby(key).cogroup(right.groupby(key)).applyInPandas with
    pd.merge_asof — one Arrow task per key, no union frame. Same oracle as
    the union-and-forward-fill form (DuckDB native ASOF JOIN)."""
    from sarpro_spark.operators.temporal import asof_join_cogrouped

    e = frames.load_table(spark, sf_dir, "events")
    left = e.select("event_id", "user_id", "ts")
    right = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select("user_id", "ts", "event_id")
    )
    out = asof_join_cogrouped(left, right, on="user_id", left_time="ts",
                              right_time="ts", right_cols=["event_id", "ts"])
    return out.select(
        "event_id",
        "user_id",
        _epoch_us("ts").alias("ts_us"),
        F.col("event_id_r").alias("event_id_r"),
        _epoch_us("ts_r").alias("ts_us_r"),
    )


# --- range join (bucketized inequality join) ---------------------------------

_RANGE_SQL = """
SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id,
       CAST(EPOCH_US(e.ts) AS BIGINT) - CAST(EPOCH_US(p.ts) AS BIGINT) AS delta_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND ABS(CAST(FLOOR(EPOCH(e.ts)) AS BIGINT) - CAST(FLOOR(EPOCH(p.ts)) AS BIGINT)) <= 600
""".strip()


@query("events_range_join", sql=_RANGE_SQL, tags=("relational", "temporal"))
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: purchase/error events of the same user within 10 minutes —
    bucketized prefilter turns the inequality join into a bucket equi-join
    whose cost tracks match density (oracle: plain inequality join)."""
    from sarpro_spark.operators.temporal import range_join_buckets

    e = frames.load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    er = e.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    j = range_join_buckets(p, er, on="user_id", left_time="ts", right_time="ts",
                           max_delta_sec=600)
    return j.select(
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").alias("error_id"),
        "user_id",
        (_epoch_us("r_ts") - _epoch_us("ts")).alias("delta_us"),
    )


# --- batch twin of the custom stateful streaming operator --------------------

_USER_TOTALS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
""".strip()


@query("user_running_totals", sql=_USER_TOTALS_SQL, tags=("relational", "streaming"))
def q_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.stateful.running_user_totals (the
    applyInPandasWithState operator) — the state a drained stream converges
    to; equivalence is asserted in tests/test_functions_sources.py."""
    from sarpro_spark.streaming.stateful import running_user_totals_batch

    e = frames.load_table(spark, sf_dir, "events")
    out = running_user_totals_batch(e)
    # The stateful twin accumulates doubles; input values are exact 2-decimal,
    # so snapping the total to DECIMAL(18,2) recovers the exact cents value the
    # oracle's decimal sum produces (ulp noise << 0.005 rounding distance).
    return out.withColumn(
        "total_value", F.col("total_value").cast("decimal(18,2)").cast("double")
    )


# --- gap-based sessionization (session_window vs lag-cumsum oracle) ----------

_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions GROUP BY user_id, session_id
""".strip()


@query("events_sessionize", sql=_SESSION_SQL, tags=("relational", "events", "streaming"))
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) — Spark's session_window operator
    (the streaming stateful-session surface run in batch mode); the oracle
    reconstructs identical sessions with lag+cumsum. Session ids are made
    comparable by numbering sessions per user in start order."""
    from pyspark.sql.window import Window as W

    from sarpro_spark.streaming.events import sessionize

    e = frames.load_table(spark, sf_dir, "events")
    s = sessionize(e, gap="30 minutes")
    w = W.partitionBy("user_id").orderBy("session_start")
    return s.select(
        "user_id",
        (F.row_number().over(w) - 1).cast("bigint").alias("session_id"),
        "n_events",
        "session_value",
    )


# --- stream-stream join (run in batch for the oracle) ------------------------

_ATTRIBUTION_SQL = """
SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
       p.value AS purchase_value, c.event_id AS click_id, c.ts AS click_ts
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
""".strip()


@query("events_attribution_join", sql=_ATTRIBUTION_SQL, tags=("relational", "events", "streaming"))
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join surface (purchase-to-click attribution
    within 1 h) run in batch mode — the same attribution_join function runs
    as a watermarked stream-stream join in streaming mode
    (tests/test_streaming.py asserts drained-stream == batch)."""
    from sarpro_spark.streaming.joins import attribution_join

    e = frames.load_table(spark, sf_dir, "events")
    return attribution_join(e)


# --- streaming dedup (dropDuplicatesWithinWatermark batch twin) ---------------

_STREAM_DEDUP_SQL = """
SELECT event_id, user_id, event_type, value, CAST(EPOCH_US(ts) AS BIGINT) AS ts_us
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts) AS rn
  FROM (SELECT * FROM events UNION ALL SELECT * FROM events) u
) d WHERE rn = 1
""".strip()


@query("events_stream_dedup", sql=_STREAM_DEDUP_SQL, tags=("relational", "events", "streaming"))
def q_events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup surface (dropDuplicatesWithinWatermark) run in batch
    mode over an at-least-once feed (every event delivered twice): first
    occurrence per event_id wins. The duplicates are full-row identical so the
    kept row is deterministic; drained-stream == batch is asserted in
    tests/test_streaming.py. Oracle: ROW_NUMBER() = 1 per id."""
    from sarpro_spark.streaming.joins import dedupe_events_stream

    e = frames.load_table(spark, sf_dir, "events")
    doubled = e.unionByName(e)
    out = dedupe_events_stream(doubled)
    return out.select(
        "event_id", "user_id", "event_type", "value",
        _epoch_us("ts").alias("ts_us"),
    )


# --- pivot -------------------------------------------------------------------

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_PIVOT_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       {", ".join(
           f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS prio_{i + 1}"
           for i, p in enumerate(_PRIORITIES)
       )}
FROM orders GROUP BY 1
""".strip()


@query("pivot_order_priority", sql=_PIVOT_SQL, tags=("relational", "pivot"))
def q_pivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: per-year order counts pivoted across the 5 priority
    values. Spark's pivot with an EXPLICIT value list compiles to one
    aggregate with conditional counts — no second scan, identical to the
    oracle's CASE sums; never use implicit pivot at scale (it runs a distinct
    scan to discover values)."""
    o = frames.load_table(spark, sf_dir, "orders")
    p = (
        o.select(F.year("o_orderdate").cast("int").alias("order_year"), "o_orderpriority")
        .groupBy("order_year")
        .pivot("o_orderpriority", list(_PRIORITIES))
        .count()
    )
    renamed = p.select(
        "order_year",
        *[
            F.coalesce(F.col(f"`{prio}`"), F.lit(0)).cast("bigint").alias(f"prio_{i + 1}")
            for i, prio in enumerate(_PRIORITIES)
        ],
    )
    return renamed


# --- exact percentiles --------------------------------------------------------

_PCTL_SQL = f"""
SELECT l_returnflag,
       {sql_fround('quantile_cont(l_extendedprice, 0.5)')} AS p50,
       {sql_fround('quantile_cont(l_extendedprice, 0.9)')} AS p90,
       {sql_fround('quantile_cont(l_extendedprice, 0.99)')} AS p99
FROM lineitem GROUP BY l_returnflag
""".strip()


@query("lineitem_percentiles", sql=_PCTL_SQL, tags=("relational", "percentile"))
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation on the sorted set) —
    the exact twin of the approx-sketch query family. Exact percentiles cost
    a per-group sort; at 100 TB prefer `percentile_approx` unless the gate
    needs bit-stable values."""
    li = frames.load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        fround(F.expr("percentile(l_extendedprice, 0.5)")).alias("p50"),
        fround(F.expr("percentile(l_extendedprice, 0.9)")).alias("p90"),
        fround(F.expr("percentile(l_extendedprice, 0.99)")).alias("p99"),
    )


# --- JSON property extraction -------------------------------------------------

_JSON_PROPS_SQL = f"""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY event_type
""".strip()


@query("events_props_json", sql=_JSON_PROPS_SQL, tags=("relational", "json"))
def q_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column surface: JSON property extraction pushed into a
    grouped aggregate (get_json_object == json_extract_string). At scale
    prefer from_json with an explicit schema once per column, not repeated
    path probes."""
    e = frames.load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


# --- TPC-H-style multi-join analytics ----------------------------------------

_SHIP_PRIORITY_SQL = f"""
SELECT o_orderkey, revenue, order_year, rnk FROM (
  SELECT o_orderkey,
    {sql_fround("SUM(l_extendedprice * (1 - l_discount))")} AS revenue,
    CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
    ROW_NUMBER() OVER (ORDER BY {sql_fround("SUM(l_extendedprice * (1 - l_discount))")} DESC, o_orderkey ASC) AS rnk
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY o_orderkey, o_orderdate
) t WHERE rnk <= 10
""".strip()


@query("shipping_priority", sql=_SHIP_PRIORITY_SQL, tags=("relational", "join", "topk"))
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: 3-way join (customer filtered but
    NOT broadcast-hinted — it scales with SF; AQE broadcasts it when it
    fits) -> per-order revenue -> deterministic top-10 via
    TakeOrderedAndProject (orderBy+limit), with the rank attached by a
    window over only the <=10 survivors — never a global single-partition
    sort of every per-order aggregate."""
    from pyspark.sql.window import Window as W

    c = frames.load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = frames.load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = frames.load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    per_order = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )
    # top-k first (per-partition heaps, k rows cross the wire), THEN rank the
    # survivors — the single-partition window now sees <=10 rows, not every
    # per-order aggregate
    topk = per_order.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(10)
    w = W.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
    return (
        topk.withColumn("rnk", F.row_number().over(w))
        .select(
            "o_orderkey",
            "revenue",
            F.year("o_orderdate").cast("int").alias("order_year"),
            "rnk",
        )
    )


_TRADE_VOLUME_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
  {sql_fround("SUM(volume)")} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_nationkey <> n2.n_nationkey
) shipping
GROUP BY supp_nation, cust_nation, l_year
""".strip()


@query("nations_trade_volume", sql=_TRADE_VOLUME_SQL, tags=("relational", "join", "agg"))
def q_nations_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style trade volume between nation pairs by ship year: a
    5-way join where both nation dimensions broadcast (25 rows each,
    genuinely fixed) and the fact chain (lineitem -> orders -> customer ->
    supplier) shuffles on its keys. supplier is NOT hinted — it scales with
    SF (10k x SF rows); AQE broadcasts it at small SF where it fits."""
    s = frames.load_table(spark, sf_dir, "supplier")
    li = frames.load_table(spark, sf_dir, "lineitem")
    o = frames.load_table(spark, sf_dir, "orders")
    c = frames.load_table(spark, sf_dir, "customer")
    n = frames.load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("cn_key") == F.col("c_nationkey"))
        .where(F.col("sn_key") != F.col("cn_key"))
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            fround(F.sum("volume")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_LOCAL_SUPPLIER_SQL = f"""
SELECT n_name,
  {sql_fround("SUM(l_extendedprice * (1 - l_discount))")} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
""".strip()


@query("local_supplier_volume", sql=_LOCAL_SUPPLIER_SQL, tags=("relational", "join", "agg"))
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier volume: the 6-way join where the
    customer and the supplier must share a nation (the join condition that
    prunes most of the fact rows). region/nation broadcast (5/25 rows,
    fixed); supplier is NOT hinted — it scales with SF — so the
    customer-orders-lineitem-supplier chain shuffles on its keys and AQE
    may still broadcast supplier at small SF."""
    c = frames.load_table(spark, sf_dir, "customer")
    o = frames.load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = frames.load_table(spark, sf_dir, "lineitem")
    s = frames.load_table(spark, sf_dir, "supplier")
    n = frames.load_table(spark, sf_dir, "nation")
    r = frames.load_table(spark, sf_dir, "region").where(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("n_name").agg(
        fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_RETURNED_ITEMS_SQL = f"""
SELECT c_custkey, c_name, n_name, revenue, n_items, rnk FROM (
  SELECT c_custkey, c_name, n_name,
    {sql_fround("SUM(l_extendedprice * (1 - l_discount))")} AS revenue,
    CAST(COUNT(*) AS BIGINT) AS n_items,
    ROW_NUMBER() OVER (ORDER BY {sql_fround("SUM(l_extendedprice * (1 - l_discount))")} DESC, c_custkey ASC) AS rnk
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name, n_name
) t WHERE rnk <= 20
""".strip()


@query("returned_items_report", sql=_RETURNED_ITEMS_SQL, tags=("relational", "join", "topk"))
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item reporting: who returned the most
    revenue — fact chain shuffled on keys, nation broadcast, deterministic
    top-20 via TakeOrderedAndProject (orderBy+limit) with the rank attached
    over only the <=20 survivors — never a global single-partition sort of
    every per-customer aggregate."""
    from pyspark.sql.window import Window as W

    c = frames.load_table(spark, sf_dir, "customer")
    o = frames.load_table(spark, sf_dir, "orders")
    li = frames.load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = frames.load_table(spark, sf_dir, "nation")
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    topk = per_cust.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)
    w = W.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return (
        topk.withColumn("rnk", F.row_number().over(w))
        .select("c_custkey", "c_name", "n_name", "revenue", "n_items", "rnk")
    )


# --- TPC-H Q21-style multi-correlation (EXISTS + NOT EXISTS self-refs) --------

_SOLE_PROBLEM_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND n_name IN ('NATION_7', 'NATION_19')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""".strip()


@query("suppliers_sole_problem", sql=_SOLE_PROBLEM_SQL, tags=("relational", "join", "correlated"))
def q_suppliers_sole_problem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style multi-correlation: suppliers in two nations who were
    the SOLE returned-line supplier on a finalized multi-supplier order —
    an EXISTS plus a NOT EXISTS, both self-referencing the fact table
    (Q21 uses receipt>commit lateness; this data has no receipt dates, so
    l_returnflag = 'R' plays the problem-line role with the identical
    correlation shape). Decorrelation is explicit: left-SEMI for the
    EXISTS, left-ANTI for the NOT EXISTS, each an equi-join on the order
    key with the supplier inequality as residual condition — Catalyst
    plans two SortMergeJoins on l_orderkey, no CartesianProduct, no
    correlated re-execution. nation broadcasts (constant); supplier and
    the fact legs shuffle on their keys. Deterministic top-100 via
    orderBy+limit (TakeOrderedAndProject)."""
    li = frames.load_table(spark, sf_dir, "lineitem")
    l1 = li.where(F.col("l_returnflag") == "R")
    o = frames.load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = frames.load_table(spark, sf_dir, "supplier")
    n = frames.load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_7", "NATION_19")
    )
    base = (
        l1.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = l1.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    sole = base.join(
        l2, (F.col("l_orderkey") == F.col("k2")) & (F.col("s2") != F.col("l_suppkey")), "left_semi"
    ).join(
        l3, (F.col("l_orderkey") == F.col("k3")) & (F.col("s3") != F.col("l_suppkey")), "left_anti"
    )
    out = sole.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
    return out.orderBy(F.col("numwait").desc(), F.col("s_name")).limit(100)


# --- TPC-H Q22-style: scalar subquery + anti-join decorrelation ---------------

_DORMANT_CUST_SQL = f"""
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
  CAST(COUNT(*) AS BIGINT) AS numcust,
  {sql_fround("SUM(c_acctbal)")} AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
""".strip()


@query("dormant_rich_customers", sql=_DORMANT_CUST_SQL, tags=("relational", "join", "correlated"))
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: customers with above-average balance and NO urgent
    orders, counted per nation (Q22 uses country codes and no-orders; this
    data's customers all have orders, so the urgent-priority leg plays the
    anti role with the identical decorrelation shape). Two decorrelations
    in one plan: the AVG scalar subquery becomes a 1-row broadcast cross
    (constant grain), the NOT EXISTS a left-anti join on the customer key —
    no correlated re-execution, no cartesian of anything non-constant."""
    c = frames.load_table(spark, sf_dir, "customer")
    o = frames.load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    qualified = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
    )
    return qualified.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        fround(F.sum("c_acctbal")).alias("totacctbal"),
    )


# --- TPC-H Q8-style market share ----------------------------------------------

_MKT_SHARE_SQL = f"""
WITH all_nations AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
  {sql_fround("SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END) / SUM(volume)")} AS mkt_share,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM all_nations GROUP BY o_year ORDER BY o_year
""".strip()


@query("nation_market_share", sql=_MKT_SHARE_SQL, tags=("relational", "join", "agg"))
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: the widest join tree in the set — part
    prunes lineitem, the customer side restricts to one region, the
    supplier side labels each sale's nation, and the share is a conditional
    aggregate over the surviving volume. Both nation legs and region
    broadcast (constant dims); part/supplier/customer and the fact chain
    are left to the optimizer per the r6 de-hint doctrine (they all scale
    with SF). Catalyst's join reordering gets a real workout: 8 relations,
    3 selective filters on different legs."""
    li = frames.load_table(spark, sf_dir, "lineitem")
    p = frames.load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = frames.load_table(spark, sf_dir, "supplier")
    o = frames.load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = frames.load_table(spark, sf_dir, "customer")
    n = frames.load_table(spark, sf_dir, "nation")
    r = frames.load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key"))
    n2 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    j = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cr_key") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            fround(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("o_year")
    )


# --- incremental rollup maintenance -------------------------------------------

_INC_ROLLUP_SQL = f"""
WITH split AS (
  SELECT *,
    (CAST(('0x' || SUBSTR(MD5('mv' || '|' || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 >= 800000) AS is_delta
  FROM events
),
base AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod,
    CAST(COUNT(*) AS BIGINT) AS n, SUM(value) AS sv
  FROM split WHERE NOT is_delta GROUP BY 1, 2
),
delta AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod,
    CAST(COUNT(*) AS BIGINT) AS n, SUM(value) AS sv
  FROM split WHERE is_delta GROUP BY 1, 2
),
merged AS (
  SELECT event_type, hod, CAST(SUM(n) AS BIGINT) AS n_events, SUM(sv) AS sv
  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta) u
  GROUP BY 1, 2
),
full_recompute AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod,
    CAST(COUNT(*) AS BIGINT) AS n_events, SUM(value) AS sv
  FROM events GROUP BY 1, 2
)
SELECT m.event_type, m.hod, m.n_events,
  {sql_fround('m.sv')} AS sum_value,
  (m.n_events = f.n_events AND {sql_fround('m.sv')} = {sql_fround('f.sv')}) AS matches_full
FROM merged m JOIN full_recompute f ON f.event_type = m.event_type AND f.hod = m.hod
""".strip()


@query("events_incremental_rollup", sql=_INC_ROLLUP_SQL, tags=("relational", "incremental", "agg"))
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance: a deterministic 20% delta batch is
    aggregated alone and MERGED into the base rollup by re-aggregating the
    two partial states (count/sum are the mergeable-state aggregates) —
    never rescanning the base facts. The full recompute rides along only
    to certify merged == full as data; in production the base state is the
    stored view and this query's delta leg is the whole incremental cost."""
    from sarpro_spark.llm.sampling import hash_bucket

    e = frames.load_table(spark, sf_dir, "events")
    is_delta = hash_bucket(F.col("event_id"), "mv") >= 800000
    split = e.withColumn("is_delta", is_delta)
    hod = F.hour(F.col("ts").cast("timestamp")).cast("int").alias("hod")

    def rollup(df):
        return df.groupBy("event_type", hod).agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
        )

    base = rollup(split.where(~F.col("is_delta")))
    delta = rollup(split.where("is_delta"))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "hod")
        .agg(F.sum("n").alias("n_events"), F.sum("sv").alias("sv"))
    )
    full = (
        e.groupBy("event_type", F.hour(F.col("ts").cast("timestamp")).cast("int").alias("hod"))
        .agg(F.count(F.lit(1)).alias("f_n"), F.sum("value").alias("f_sv"))
    )
    j = merged.join(full, ["event_type", "hod"])
    return j.select(
        "event_type",
        "hod",
        "n_events",
        fround(F.col("sv")).alias("sum_value"),
        (
            (F.col("n_events") == F.col("f_n"))
            & (fround(F.col("sv")) == fround(F.col("f_sv")))
        ).alias("matches_full"),
    )


# --- skew-resistant join (salted) ---------------------------------------------

_SALTED_JOIN_SQL = f"""
SELECT e.event_type, t.weight,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  {sql_fround('SUM(e.value * t.weight)')} AS weighted_value
FROM events e
JOIN (SELECT event_type, CAST(weight AS DOUBLE) AS weight FROM (VALUES
  ('click', 1.0), ('view', 0.25), ('purchase', 5.0), ('signup', 3.0)
) v(event_type, weight)) t ON t.event_type = e.event_type
GROUP BY e.event_type, t.weight
""".strip()


@query("skewed_join_salted", sql=_SALTED_JOIN_SQL, tags=("relational", "skew", "join"))
def q_skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-side skew surface: the hot-keyed fact stream joins a weight dim
    through salted_join (dim replicated per salt bucket, facts salted by
    residual columns) so no single (key) shuffle partition concentrates a
    viral key's rows — values identical to the plain join, certified
    against the unsalted oracle."""
    from sarpro_spark.functions.skew import salted_join

    e = frames.load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = local_relation(
        spark,
        [("click", 1.0), ("view", 0.25), ("purchase", 5.0), ("signup", 3.0)],
        "event_type string, weight double",
    )
    j = salted_join(e, dim, "event_type", salt_buckets=8)
    return j.groupBy("event_type", "weight").agg(
        F.count(F.lit(1)).alias("n_events"),
        fround(F.sum(F.col("value") * F.col("weight"))).alias("weighted_value"),
    )


# --- ordered funnel analysis --------------------------------------------------

_FUNNEL_STEPS_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(CAST(EPOCH_US(ts) AS BIGINT)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(CAST(EPOCH_US(e.ts) AS BIGINT)) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND CAST(EPOCH_US(e.ts) AS BIGINT) > s1.t1
    AND CAST(EPOCH_US(e.ts) AS BIGINT) <= s1.t1 + 86400000000
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(CAST(EPOCH_US(e.ts) AS BIGINT)) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND CAST(EPOCH_US(e.ts) AS BIGINT) > s2.t2
    AND CAST(EPOCH_US(e.ts) AS BIGINT) <= s2.t2 + 86400000000
  GROUP BY e.user_id
),
reach AS (
  SELECT s1.user_id,
    CASE WHEN s3.user_id IS NOT NULL THEN 3
         WHEN s2.user_id IS NOT NULL THEN 2 ELSE 1 END AS reached
  FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
  LEFT JOIN s3 ON s3.user_id = s1.user_id
)
SELECT reached, CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(MIN(user_id) AS BIGINT) AS min_user, CAST(MAX(user_id) AS BIGINT) AS max_user
FROM reach GROUP BY reached
""".strip()


@query("events_funnel_steps", sql=_FUNNEL_STEPS_SQL, tags=("relational", "events", "funnel"))
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-SENSITIVE funnel analytics (the MATCH_RECOGNIZE family):
    view -> click -> purchase must occur in temporal order per user, each
    conversion within a 24-hour window of the previous stage's first
    reach; each stage is one filtered aggregate joined to the previous
    stage — three user-keyed aggregates, no window over raw events, no
    per-user sort."""
    e = frames.load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch_us("ts").alias("t")
    )
    s1 = e.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("t").alias("t1"))
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where((F.col("t") > F.col("t1")) & (F.col("t") <= F.col("t1") + 86400000000))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where((F.col("t") > F.col("t2")) & (F.col("t") <= F.col("t2") + 86400000000))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    reach = (
        s1.join(s2.select("user_id", F.lit(1).alias("_r2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(1).alias("_r3")), "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("_r3").isNotNull(), 3)
            .when(F.col("_r2").isNotNull(), 2)
            .otherwise(1)
            .alias("reached"),
        )
    )
    return reach.groupBy("reached").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )


# --- cohort retention ---------------------------------------------------------

_COHORT_SQL = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(EPOCH_US(ts) AS BIGINT) // 86400000000) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
    CAST(EPOCH_US(e.ts) AS BIGINT) // 86400000000 - f.cohort_day AS day_offset
  FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
  CAST(day_offset AS BIGINT) AS day_offset,
  CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity
WHERE day_offset <= 7
GROUP BY cohort_day, day_offset
""".strip()


@query("events_cohort_retention", sql=_COHORT_SQL, tags=("relational", "events", "analytics"))
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity counted
    per day offset (the engagement matrix every product-analytics engine
    ships). Two user-keyed aggregates; the firsts table is one row PER USER
    (unbounded — grows with the data), so it is shuffle-joined back onto the
    event stream on user_id, never broadcast-hinted."""
    e = frames.load_table(spark, sf_dir, "events").select(
        "user_id", (_epoch_us("ts") / F.lit(86400000000)).cast("long").alias("day")
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        e.join(firsts, "user_id")
        .select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .where(F.col("day_offset") <= 7)
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


# --- A/B experiment analysis --------------------------------------------------

_AB_WELCH = (
    "(sa1 / na - sb1 / nb) / SQRT("
    "GREATEST((sa2 / na - (sa1 / na) * (sa1 / na)) / (na - 1), 1e-12)"
    " + GREATEST((sb2 / nb - (sb1 / nb) * (sb1 / nb)) / (nb - 1), 1e-12))"
)

_AB_TEST_SQL = f"""
WITH assigned AS (
  SELECT CASE WHEN (CAST(('0x' || SUBSTR(MD5('ab' || '|' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000) < 500000
              THEN 'A' ELSE 'B' END AS variant,
         value
  FROM events WHERE event_type = 'purchase'
),
stats AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
    SUM(value) AS s1, SUM(value * value) AS s2
  FROM assigned GROUP BY variant
),
wide AS (
  SELECT
    MAX(CASE WHEN variant = 'A' THEN n END) AS na,
    MAX(CASE WHEN variant = 'A' THEN s1 END) AS sa1,
    MAX(CASE WHEN variant = 'A' THEN s2 END) AS sa2,
    MAX(CASE WHEN variant = 'B' THEN n END) AS nb,
    MAX(CASE WHEN variant = 'B' THEN s1 END) AS sb1,
    MAX(CASE WHEN variant = 'B' THEN s2 END) AS sb2
  FROM stats
)
SELECT na, nb,
  {sql_fround('sa1 / na')} AS mean_a,
  {sql_fround('sb1 / nb')} AS mean_b,
  {sql_fround('(sa1 / na) - (sb1 / nb)')} AS lift,
  {sql_fround(_AB_WELCH)} AS welch_t
FROM wide
""".strip()


@query("events_ab_test", sql=_AB_TEST_SQL, tags=("relational", "events", "analytics"))
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation surface: deterministic md5 unit assignment (the same
    bucket arithmetic as the sampling operators) and a Welch t statistic
    from exact moment aggregates — one pass, map-side combined; the
    variance terms come from the same (n, sum, sum-sq) partials a
    streaming/incremental version would maintain."""
    from sarpro_spark.llm.sampling import hash_bucket

    e = frames.load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    assigned = e.select(
        F.when(hash_bucket(F.col("user_id"), "ab") < 500000, "A").otherwise("B").alias("variant"),
        "value",
    )
    stats = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    wide = stats.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("s1"))).alias("sa1"),
        F.max(F.when(F.col("variant") == "A", F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("s1"))).alias("sb1"),
        F.max(F.when(F.col("variant") == "B", F.col("s2"))).alias("sb2"),
    )
    na, sa1, sa2 = F.col("na"), F.col("sa1"), F.col("sa2")
    nb, sb1, sb2 = F.col("nb"), F.col("sb1"), F.col("sb2")
    ma, mb = sa1 / na, sb1 / nb
    va = F.greatest((sa2 / na - ma * ma) / (na - 1), F.lit(1e-12))
    vb = F.greatest((sb2 / nb - mb * mb) / (nb - 1), F.lit(1e-12))
    return wide.select(
        na.cast("long").alias("na"),
        nb.cast("long").alias("nb"),
        fround(ma).alias("mean_a"),
        fround(mb).alias("mean_b"),
        fround(ma - mb).alias("lift"),
        fround((ma - mb) / F.sqrt(va + vb)).alias("welch_t"),
    )


# --- path analysis: event-type transitions ------------------------------------

_PATH_TRANSITIONS_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (
      PARTITION BY user_id ORDER BY CAST(EPOCH_US(ts) AS BIGINT), event_id
    ) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM ordered WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""".strip()


@query("events_path_transitions", sql=_PATH_TRANSITIONS_SQL, tags=("relational", "events", "analytics"))
def q_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: per-user event-type transition counts (the Markov
    matrix behind next-action prediction and journey mining). One lag
    window partitioned by user (parallel across users; deterministic
    event-id tie-break), one aggregate."""
    from pyspark.sql.window import Window as W

    e = frames.load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(_epoch_us("ts"), F.col("event_id"))
    ordered = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        ordered.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


# --- bucketed co-located join (the 100 TB shuffle-elimination layout) ----------

import threading as _threading

#: the scratch-table write/read section is not thread-safe: the audit's
#: plan pool builds this query's plan AND relational_pack's (which invokes
#: the same fn) concurrently — two unsynchronized DROP+rmtree+saveAsTable
#: sequences over one location flake with LOCATION_ALREADY_EXISTS /
#: FILE_NOT_EXIST (the same class as the r10 _member_schema race)
_BUCKETED_SCRATCH_LOCK = _threading.Lock()

_BUCKETED_JOIN_SQL = """
SELECT l.l_orderkey AS orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       (FLOOR(SUM(l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) / 100.0) AS rev,
       MIN(o.o_orderpriority) AS pri
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_orderkey
""".strip()


@query("bucketed_colocated_join", sql=_BUCKETED_JOIN_SQL, tags=("relational", "layout", "bucketing"))
def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table CO-LOCATED join (r11): lineitem and orders are
    written as 16-bucket tables on their join keys (bucketBy + sortBy,
    one file per bucket via an aligned pre-repartition — Spark's bucket
    hash IS the repartition hash), then joined AND aggregated on that key
    with ZERO exchanges in the plan: the scan partitioning satisfies both
    the SortMergeJoin and the per-key aggregate (audit-pinned — any
    'Exchange hashpartitioning' here is a regression). This is the
    layout answer at 100 TB: a fact table joined on the same key every
    day shuffles ONCE at write time, not once per query; every
    subsequent join/agg on the key is map-side. Values hash against the
    plain-join DuckDB twin (layout must never change results). The
    bucketed tables live in a fixed scratch database under the session
    warehouse, OVERWRITTEN (never accumulated) per invocation and left
    readable so the returned plan stays the real bucketed-scan join —
    a checkpoint here would hide exactly the plan this row certifies."""
    import os as _os
    import shutil as _shutil
    from urllib.parse import urlparse as _urlparse

    db = "sarpro_bkt"
    with _BUCKETED_SCRATCH_LOCK:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        # self-healing scratch: a FRESH session's in-memory catalog does not
        # know tables a previous process wrote, but their warehouse locations
        # persist and make saveAsTable fail with LOCATION_ALREADY_EXISTS —
        # drop both the catalog entry and the directory before writing
        wh = _urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
        for tbl in ("lineitem_b", "orders_b"):
            spark.sql(f"DROP TABLE IF EXISTS {db}.{tbl}")
            _shutil.rmtree(_os.path.join(wh, f"{db}.db", tbl), ignore_errors=True)
        li = frames.load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        o = frames.load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        (
            li.repartition(16, "l_orderkey")
            .write.bucketBy(16, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable(f"{db}.lineitem_b")
        )
        (
            o.repartition(16, "o_orderkey")
            .write.bucketBy(16, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable(f"{db}.orders_b")
        )
        # the catalog caches each table's file index: a repeat invocation
        # rewrites the files, so refresh or the previous index serves
        # deleted paths (FAILED_READ_FILE on the second run in one session)
        spark.catalog.refreshTable(f"{db}.lineitem_b")
        spark.catalog.refreshTable(f"{db}.orders_b")
        bl, bo = spark.table(f"{db}.lineitem_b"), spark.table(f"{db}.orders_b")
    # pin the merge join: at small SF the static planner would broadcast
    # the orders side and silently skip the co-location this row exists to
    # certify (at 100 TB both sides are fact tables — the r6 de-hint
    # doctrine does NOT apply to a layout certificate)
    return (
        bl.join(bo.hint("shuffle_merge"), bl["l_orderkey"] == bo["o_orderkey"])
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
            F.min("o_orderpriority").alias("pri"),
        )
    )


# --- Z-order layout locality (the 100 TB multi-dimensional range layout) -------


def _zorder_locality_sql() -> str:
    from sarpro_spark.functions.zorder import sql_interleave_bits, sql_quantize

    bits, fbits = 16, 6
    qx = sql_quantize(
        "o_custkey", "(SELECT MIN(o_custkey) FROM orders)", "(SELECT MAX(o_custkey) FROM orders)", bits
    )
    day = "CAST(FLOOR(EPOCH_US(o_orderdate) / 86400000000.0) AS BIGINT)"
    qy = sql_quantize(day, f"(SELECT MIN({day}) FROM orders)", f"(SELECT MAX({day}) FROM orders)", bits)
    z = sql_interleave_bits("qx", "qy", bits)
    lo, hi = 1 << (bits - 2), (1 << (bits - 1)) - 1
    return f"""
WITH q AS (SELECT {qx} AS qx, {qy} AS qy FROM orders),
zed AS (SELECT qx, qy, {z} AS zval FROM q),
zfiles AS (SELECT qx, qy,
            zval >> {2 * bits - fbits} AS fz,
            qx >> {bits - fbits} AS fl,
            (qx BETWEEN {lo} AND {hi} AND qy BETWEEN {lo} AND {hi}) AS inbox
          FROM zed),
zstats AS (SELECT fz, MAX(qx)-MIN(qx)+1 AS w, MAX(qy)-MIN(qy)+1 AS h, BOOL_OR(inbox) AS hit
           FROM zfiles GROUP BY fz),
lstats AS (SELECT fl, MAX(qx)-MIN(qx)+1 AS w, MAX(qy)-MIN(qy)+1 AS h, BOOL_OR(inbox) AS hit
           FROM zfiles GROUP BY fl)
SELECT (SELECT COUNT(*) FROM zfiles) AS n_rows,
       (SELECT CAST(SUM(CASE WHEN inbox THEN 1 ELSE 0 END) AS BIGINT) FROM zfiles) AS n_box_rows,
       (SELECT COUNT(*) FROM zstats) AS z_files,
       (SELECT COUNT(*) FROM lstats) AS lex_files,
       (SELECT CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) FROM zstats) AS z_files_hit,
       (SELECT CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) FROM lstats) AS lex_files_hit,
       (SELECT CAST(MAX(GREATEST(w, h)) AS BIGINT) FROM zstats) AS z_max_side,
       (SELECT CAST(MAX(GREATEST(w, h)) AS BIGINT) FROM lstats) AS lex_max_side,
       (SELECT CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) FROM zstats)
         <= (SELECT CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) FROM lstats) AS z_no_worse
""".strip()


@query("zorder_layout_locality", sql=_zorder_locality_sql, tags=("relational", "layout", "zorder"))
def q_zorder_layout_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs lexicographic layout, measured as hashed data (r11):
    orders quantized on (custkey, order day) to 16-bit fixed point, files
    assigned by the top 6 Morton bits (a fixed 8x8 tile grid — the
    oracle-exact stand-in for repartitionByRange's sampled quantiles; the
    sampled writer is asserted in tests) vs the top 6 bits of custkey
    alone (the sort-by-one-column layout). One row records, for a
    quarter-range predicate in BOTH dimensions, how many of the 64 files
    each layout must read (measured 4 vs 16 on the fixture), the
    worst-case per-file bounding-box side (8k vs 64k), and the structural
    invariant z_no_worse — the economics of OPTIMIZE ZORDER as data. The
    curve value is pure bitwise codegen (functions/zorder.py); min/max
    scaling comes from ONE broadcast aggregate row, never a window."""
    from sarpro_spark.functions import zorder as zo

    bits, fbits = 16, 6
    lo, hi = 1 << (bits - 2), (1 << (bits - 1)) - 1
    o = frames.load_table(spark, sf_dir, "orders")
    day = F.floor(_epoch_us("o_orderdate").cast("double") / 86400000000.0).cast("bigint")
    base = o.select(F.col("o_custkey").alias("x"), day.alias("y"))
    z = zo.zorder_value(base, "x", "y", bits)
    files = z.select(
        "qx",
        "qy",
        F.shiftright(F.col("zval"), 2 * bits - fbits).alias("fz"),
        F.shiftright(F.col("qx"), bits - fbits).alias("fl"),
        (F.col("qx").between(lo, hi) & F.col("qy").between(lo, hi)).alias("inbox"),
    )
    # ONE scan: grouping sets computes both layouts' per-file stats in a
    # single shuffle (map-side row duplication x2), and the final 1-row
    # reduce derives totals from the fz branch (each row is in exactly one
    # fz group, so its sums are the corpus totals — no third scan).
    per_file = files.groupingSets([[F.col("fz")], [F.col("fl")]], F.col("fz"), F.col("fl")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("inbox").cast("int")).cast("bigint").alias("nbox"),
        (F.max("qx") - F.min("qx") + F.lit(1)).alias("w"),
        (F.max("qy") - F.min("qy") + F.lit(1)).alias("h"),
        F.max("inbox").alias("hit"),
        F.grouping("fz").alias("gfz"),
    )
    is_z = F.col("gfz") == 0
    side = F.greatest(F.col("w"), F.col("h"))
    hit_i = F.col("hit").cast("int")
    return (
        per_file.agg(
            F.sum(F.when(is_z, F.col("n"))).cast("bigint").alias("n_rows"),
            F.sum(F.when(is_z, F.col("nbox"))).cast("bigint").alias("n_box_rows"),
            F.sum(F.when(is_z, 1).otherwise(0)).cast("bigint").alias("z_files"),
            F.sum(F.when(~is_z, 1).otherwise(0)).cast("bigint").alias("lex_files"),
            F.sum(F.when(is_z, hit_i)).cast("bigint").alias("z_files_hit"),
            F.sum(F.when(~is_z, hit_i)).cast("bigint").alias("lex_files_hit"),
            F.max(F.when(is_z, side)).cast("bigint").alias("z_max_side"),
            F.max(F.when(~is_z, side)).cast("bigint").alias("lex_max_side"),
        )
        .select(
            "n_rows",
            "n_box_rows",
            "z_files",
            "lex_files",
            "z_files_hit",
            "lex_files_hit",
            "z_max_side",
            "lex_max_side",
            (F.col("z_files_hit") <= F.col("lex_files_hit")).alias("z_no_worse"),
        )
    )


# --- CDC merge: changelog -> snapshot, SCD2 history (r11) -----------------------

# deterministic changelog derived from orders: three seq rungs exercise
# latest-wins (U then U then D on overlapping key classes) plus inserts on
# fresh (negated) keys — identical arithmetic on both engines.
_CDC_BASE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]

_CDC_CHANGES_SQL = """
cdcbase AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
),
cdcchanges AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice,
         1 AS seq, 'U' AS op FROM cdcbase WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 1.21 AS o_totalprice,
         2 AS seq, 'U' AS op FROM cdcbase WHERE o_orderkey % 8 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         3 AS seq, 'D' AS op FROM cdcbase WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT -o_orderkey AS o_orderkey, o_custkey, 'N' AS o_orderstatus,
         o_totalprice * 0.5 AS o_totalprice,
         1 AS seq, 'I' AS op FROM cdcbase WHERE o_orderkey % 50 = 0
)
""".strip()


def _cdc_changes_frame(spark: SparkSession, sf_dir: str):
    o = frames.load_table(spark, sf_dir, "orders").select(*_CDC_BASE_COLS)
    k, p = F.col("o_orderkey"), F.col("o_totalprice")
    u1 = o.where(k % 4 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", (p * 1.1).alias("o_totalprice"),
        F.lit(1).alias("seq"), F.lit("U").alias("op"),
    )
    u2 = o.where(k % 8 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", (p * 1.21).alias("o_totalprice"),
        F.lit(2).alias("seq"), F.lit("U").alias("op"),
    )
    d3 = o.where(k % 10 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", p.alias("o_totalprice"),
        F.lit(3).alias("seq"), F.lit("D").alias("op"),
    )
    i1 = o.where(k % 50 == 0).select(
        (-k).alias("o_orderkey"), F.col("o_custkey"), F.lit("N").alias("o_orderstatus"),
        (p * 0.5).alias("o_totalprice"), F.lit(1).alias("seq"), F.lit("I").alias("op"),
    )
    return o, u1.unionAll(u2).unionAll(d3).unionAll(i1)


def _cdc_apply_sql() -> str:
    from sarpro_spark.operators.cdc import sql_apply_changelog

    inner = sql_apply_changelog("cdcbase", "cdcchanges", "o_orderkey", _CDC_BASE_COLS)
    # sql_apply_changelog opens its own WITH for the cdcfinal CTE; fold the
    # fixture CTEs into that WITH-list and round the price at the outer edge.
    # The CTE block ends at the lone ")\nSELECT" boundary its builder emits.
    cte_part, _, select_part = inner.removeprefix("WITH ").partition("\n)\nSELECT")
    return f"""
WITH {_CDC_CHANGES_SQL},
{cte_part}
)
SELECT o_orderkey, o_custkey, o_orderstatus,
       (FLOOR(o_totalprice * 100.0 + 0.5) / 100.0) AS o_totalprice,
       applied_seq, applied_op
FROM (
SELECT{select_part}
)
""".strip()


@query("cdc_apply_changelog", sql=_cdc_apply_sql, tags=("relational", "cdc"))
def q_cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog -> snapshot merge (operators/cdc.py, r11): latest-wins
    upsert of a three-rung deterministic changelog over orders — U at seq 1
    (keys %4), a superseding U at seq 2 (keys %8), D at seq 3 (keys %10),
    inserts on fresh negated keys (%50). ONE window picks each key's final
    op, one anti-join passes untouched base rows through, one union appends
    surviving upserts; applied_seq/applied_op are the lineage columns an
    incremental pipeline checkpoints on. The MERGE INTO of the lakehouse
    engines as plain DataFrame algebra over bare parquet — with both
    relations bucketed by the merge key both shuffles go map-side."""
    from sarpro_spark.operators.cdc import apply_changelog

    base, changes = _cdc_changes_frame(spark, sf_dir)
    snap = apply_changelog(base, changes, "o_orderkey")
    return snap.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        fround(F.col("o_totalprice"), 2).alias("o_totalprice"),
        "applied_seq", "applied_op",
    )


def _cdc_scd2_sql() -> str:
    from sarpro_spark.operators.cdc import sql_scd2_history

    inner = sql_scd2_history("cdcchanges", "o_orderkey", _CDC_BASE_COLS)
    return f"""
WITH {_CDC_CHANGES_SQL}
SELECT o_orderkey, o_custkey, o_orderstatus,
       (FLOOR(o_totalprice * 100.0 + 0.5) / 100.0) AS o_totalprice,
       op, valid_from, valid_to, is_current
FROM ({inner})
""".strip()


@query("cdc_scd2_history", sql=_cdc_scd2_sql, tags=("relational", "cdc"))
def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version chains (operators/cdc.py, r11): every changelog row
    becomes a [valid_from, valid_to) seq interval via one lead() window per
    key; is_current marks open non-delete versions, so a deleted key has a
    fully closed chain. The dataset-versioning primitive behind "which rows
    was model X trained on" — per-key windows, parallel across keys."""
    from sarpro_spark.operators.cdc import scd2_history

    _, changes = _cdc_changes_frame(spark, sf_dir)
    hist = scd2_history(changes, "o_orderkey")
    return hist.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        fround(F.col("o_totalprice"), 2).alias("o_totalprice"),
        "op", "valid_from", "valid_to", "is_current",
    )


# --- time-series resample + gap-fill (r11) -------------------------------------


def _gapfill_sql() -> str:
    from sarpro_spark.operators.temporal import sql_resample_gapfill

    inner = sql_resample_gapfill("events", "user_id % 16", "ts", "value", 21_600_000_000)
    return f"""
SELECT key, bucket_us, n_obs,
       {sql_fround("v_avg")} AS v_avg,
       {sql_fround("locf")} AS locf,
       {sql_fround("linear")} AS linear
FROM ({inner})
""".strip()


@query("events_resample_gapfill", sql=_gapfill_sql, tags=("relational", "events", "timeseries"))
def q_events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill (operators/temporal.py, r11): the
    hypertable time_bucket_gapfill — events bucketed to 6-hour steps per
    key (user_id % 16 keeps series long enough to contain real gaps),
    each key's dense grid generated from its own bounds (sequence explode,
    never a global calendar crossJoin), empty buckets filled BOTH ways:
    locf (step signals) and linear interpolation (continuous signals).
    Grid endpoints are observed buckets by construction, so both fills
    are total — no extrapolation policy. Per-key windows; keys
    parallelize; grid size is span/step per key, bounded."""
    from sarpro_spark.operators.temporal import resample_gapfill

    e = frames.load_table(spark, sf_dir, "events")
    e = e.withColumn("gkey", F.col("user_id") % 16)
    out = resample_gapfill(e, "gkey", "ts", "value", 21_600_000_000)
    return out.select(
        "key", "bucket_us", "n_obs",
        fround(F.col("v_avg")).alias("v_avg"),
        fround(F.col("locf")).alias("locf"),
        fround(F.col("linear")).alias("linear"),
    )


# --- Bloom-filter semi-join reduction (r11) ------------------------------------

#: deliberately undersized filter for the certificate so the false-positive
#: rate is VISIBLE data (production default is 2^17 bits); k=3 hashes
_BLOOM_CERT_M = 1024


def _bloom_semijoin_sql() -> str:
    from sarpro_spark.functions.bloom import sql_bloom_ctes, sql_bloom_probe_pred

    ctes = sql_bloom_ctes("(SELECT c_custkey FROM customer WHERE c_acctbal < 0)",
                          "c_custkey", m_bits=_BLOOM_CERT_M)
    pred = sql_bloom_probe_pred("o.o_custkey", m_bits=_BLOOM_CERT_M)
    return f"""
WITH {ctes},
bloomdim AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
flags AS (
  SELECT o.o_orderkey,
         {pred} AS keep,
         (d.c_custkey IS NOT NULL) AS hit
  FROM orders o LEFT JOIN bloomdim d ON o.o_custkey = d.c_custkey
)
SELECT (SELECT COUNT(*) FROM bloomdim) AS n_dim,
       COUNT(*) AS n_fact,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS bloom_pass,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS exact_pass,
       CAST(SUM(CASE WHEN keep AND NOT hit THEN 1 ELSE 0 END) AS BIGINT) AS false_pos,
       CAST(SUM(CASE WHEN hit AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS false_neg,
       (FLOOR(CAST(SUM(CASE WHEN keep AND NOT hit THEN 1 ELSE 0 END) AS DOUBLE)
          / GREATEST(SUM(CASE WHEN NOT hit THEN 1 ELSE 0 END), 1) * 1000000.0 + 0.5)
          / 1000000.0) AS fp_rate
FROM flags
""".strip()


@query("bloom_semijoin_reduction", sql=_bloom_semijoin_sql, tags=("relational", "join", "bloom"))
def q_bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction (functions/bloom.py, r11): the
    runtime filter that drops non-matching fact rows BEFORE the join
    shuffle. The selective dim (negative-balance customers) sets k=3 bits
    each in a word relation built by ONE BIT_OR groupBy (m/32 rows, never
    a driver bitmap); orders probe it with three chained broadcast word
    lookups — no explode, no shuffle. ONE fact pass computes the whole
    audit row: bloom_pass vs exact_pass (left join on the unique dim key),
    false_pos (the filter is deliberately undersized at 1024 bits so the
    fp rate is visible, nonzero DATA), and false_neg — which a Bloom
    filter makes structurally impossible, hashed as the 0 it must be."""
    from sarpro_spark.functions.bloom import bloom_build, bloom_coeffs, _base_hash, _bit_index

    c = frames.load_table(spark, sf_dir, "customer")
    dim = c.where(F.col("c_acctbal") < 0).select("c_custkey")
    bloom = bloom_build(dim, "c_custkey", m_bits=_BLOOM_CERT_M).cache()

    o = frames.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # inline the probe as a FLAG (bloom_probe filters; the certificate
    # needs the rejected rows too, to count exact_pass among them)
    probed = o
    keep = F.lit(True)
    for j, (a, b) in enumerate(bloom_coeffs()):
        idx = _bit_index(_base_hash(F.col("o_custkey"), j), a, b, _BLOOM_CERT_M)
        w = bloom.select(F.col("word").alias(f"_w{j}"), F.col("bits").alias(f"_bits{j}"))
        probed = probed.join(F.broadcast(w), F.shiftright(idx, 5) == F.col(f"_w{j}"), "left")
        bit = F.call_function("shiftleft", F.lit(1).cast("long"), (idx % 32).cast("int"))
        keep = keep & (F.coalesce(F.col(f"_bits{j}"), F.lit(0)).bitwiseAND(bit) != 0)
    flags = probed.withColumn("keep", keep).join(
        dim.withColumnRenamed("c_custkey", "_dimkey"),
        F.col("o_custkey") == F.col("_dimkey"),
        "left",
    ).select("o_orderkey", "keep", F.col("_dimkey").isNotNull().alias("hit"))

    ndim = dim.agg(F.count(F.lit(1)).alias("n_dim"))
    keep_i = F.col("keep").cast("int")
    hit_i = F.col("hit").cast("int")
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(keep_i).cast("bigint").alias("bloom_pass"),
        F.sum(hit_i).cast("bigint").alias("exact_pass"),
        F.sum((F.col("keep") & ~F.col("hit")).cast("int")).cast("bigint").alias("false_pos"),
        F.sum((F.col("hit") & ~F.col("keep")).cast("int")).cast("bigint").alias("false_neg"),
        fround(
            F.sum((F.col("keep") & ~F.col("hit")).cast("int")).cast("double")
            / F.greatest(F.sum((~F.col("hit")).cast("int")), F.lit(1)).cast("double")
        ).alias("fp_rate"),
    )
    return ndim.crossJoin(agg).select(
        "n_dim", "n_fact", "bloom_pass", "exact_pass", "false_pos", "false_neg", "fp_rate"
    )


def _cdc_diff_sql() -> str:
    from sarpro_spark.operators.cdc import sql_apply_changelog, sql_snapshot_diff

    inner = sql_apply_changelog("cdcbase", "cdcchanges", "o_orderkey", _CDC_BASE_COLS)
    cte_part, _, select_part = inner.removeprefix("WITH ").partition("\n)\nSELECT")
    payload = [c for c in _CDC_BASE_COLS if c != "o_orderkey"]
    diff = sql_snapshot_diff("cdcbase", "snapnew", "o_orderkey", payload)
    cols = ", ".join(_CDC_BASE_COLS)
    return f"""
WITH {_CDC_CHANGES_SQL},
{cte_part}
),
snapnew AS (
  SELECT {cols} FROM (
SELECT{select_part}
  )
)
SELECT o_orderkey, o_custkey, o_orderstatus,
       (FLOOR(o_totalprice * 100.0 + 0.5) / 100.0) AS o_totalprice,
       op
FROM ({diff})
""".strip()


@query("cdc_snapshot_diff", sql=_cdc_diff_sql, tags=("relational", "cdc"))
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/cdc.py, r11): derive the changelog BETWEEN
    two snapshots — one full-outer join on the key, null-safe payload
    comparison, I/D/U classification. This certificate runs the two CDC
    operators against each other: the snapshot produced by
    apply_changelog is diffed back against the base, and the hashed
    result must be exactly the surviving effect of the original
    three-rung changelog (the apply<->diff round-trip law; the exact
    inverse identity is also asserted in tests). Unchanged keys emit
    nothing, so diff output scales with churn, not snapshot size."""
    from sarpro_spark.operators.cdc import apply_changelog, snapshot_diff

    base, changes = _cdc_changes_frame(spark, sf_dir)
    snap = apply_changelog(base, changes, "o_orderkey").select(*_CDC_BASE_COLS)
    diff = snapshot_diff(base, snap, "o_orderkey")
    return diff.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        fround(F.col("o_totalprice"), 2).alias("o_totalprice"),
        "op",
    )


# --- Hilbert vs Morton locality (r11) ------------------------------------------

_HILB_BITS = 8           # 256x256 panel = 65536 points, fully enumerable
_HILB_IVL = 1365         # deliberately NON-power-of-2 curve interval width


def _hilbert_locality_sql() -> str:
    from sarpro_spark.functions.zorder import sql_hilbert_steps, sql_interleave_bits

    n = 1 << (2 * _HILB_BITS)
    side = 1 << _HILB_BITS
    z = sql_interleave_bits("qx", "qy", _HILB_BITS)
    steps = sql_hilbert_steps("hpanel", _HILB_BITS)
    return f"""
WITH hpanel AS (
  SELECT CAST(i % {side} AS BIGINT) AS qx, CAST(i // {side} AS BIGINT) AS qy
  FROM (SELECT UNNEST(RANGE(0, {n})) AS i)
),
{steps},
curves AS (
  SELECT h.qx, h.qy, h.hval, {z} AS zval FROM hfinal h
),
hsteps AS (
  SELECT ABS(a.qx - b.qx) + ABS(a.qy - b.qy) AS st
  FROM curves a JOIN curves b ON a.hval = b.hval - 1
),
zsteps AS (
  SELECT ABS(a.qx - b.qx) + ABS(a.qy - b.qy) AS st
  FROM curves a JOIN curves b ON a.zval = b.zval - 1
),
hbox AS (
  SELECT hval // {_HILB_IVL} AS ivl, (MAX(qx)-MIN(qx)+1) * (MAX(qy)-MIN(qy)+1) AS area
  FROM curves GROUP BY 1
),
zbox AS (
  SELECT zval // {_HILB_IVL} AS ivl, (MAX(qx)-MIN(qx)+1) * (MAX(qy)-MIN(qy)+1) AS area
  FROM curves GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM curves) AS n_points,
       (SELECT CAST(MAX(st) AS BIGINT) FROM hsteps) AS hilbert_max_step,
       (SELECT CAST(MAX(st) AS BIGINT) FROM zsteps) AS morton_max_step,
       (SELECT (FLOOR(AVG(st) * 1000000.0 + 0.5) / 1000000.0) FROM hsteps) AS hilbert_mean_step,
       (SELECT (FLOOR(AVG(st) * 1000000.0 + 0.5) / 1000000.0) FROM zsteps) AS morton_mean_step,
       (SELECT CAST(SUM(area) AS BIGINT) FROM hbox) AS hilbert_interval_bbox_area,
       (SELECT CAST(SUM(area) AS BIGINT) FROM zbox) AS morton_interval_bbox_area,
       (SELECT CAST(SUM(area) AS BIGINT) FROM hbox)
         <= (SELECT CAST(SUM(area) AS BIGINT) FROM zbox) AS hilbert_no_worse
""".strip()


@query("hilbert_vs_morton_locality", sql=_hilbert_locality_sql, tags=("relational", "layout", "zorder"))
def q_hilbert_vs_morton_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert vs Morton, measured (functions/zorder.py hilbert_value,
    r11): on the fully-enumerated 256x256 panel, consecutive Hilbert
    positions are ALWAYS grid neighbors (hilbert_max_step hashes as the
    1 the curve guarantees) while Morton jumps 255+ cells at quadrant
    seams; and over deliberately NON-power-of-2 curve intervals (the
    shape real repartitionByRange file cuts take), Hilbert's bounding
    boxes are tighter — the reason Hilbert beats Z-order for file
    skipping when cuts don't align to quadrant boundaries. The panel is
    bounded (65536 rows) and step measurement is a successor equi-join
    on curve value + 1 — no global-order window anywhere."""
    from sarpro_spark.functions.zorder import hilbert_value, interleave_bits_expr

    side = 1 << _HILB_BITS
    panel = spark.range(side * side).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("long").alias("y")
    )
    cur = hilbert_value(panel, "x", "y", _HILB_BITS).withColumn(
        "zval", interleave_bits_expr(F.col("qx"), F.col("qy"), _HILB_BITS)
    ).select("qx", "qy", "hval", "zval")
    # ONE materialization of the bounded panel: the successor self-joins and
    # both box groupings would otherwise each re-analyze (and re-run) the
    # 16-level unrolled transform lineage
    from sarpro_spark.llm.cluster import _checkpointer

    cur = _checkpointer(cur)(cur)

    def steps(order_col):
        # successor lookup by curve value + 1: an equi-join, fully parallel
        # (no global-order window anywhere near the panel)
        a = cur.select(F.col(order_col).alias("_d"), F.col("qx").alias("_ax"), F.col("qy").alias("_ay"))
        b = cur.select((F.col(order_col) - 1).alias("_d"), F.col("qx").alias("_bx"), F.col("qy").alias("_by"))
        st = F.abs(F.col("_ax") - F.col("_bx")) + F.abs(F.col("_ay") - F.col("_by"))
        return a.join(b, "_d").select(st.alias("st")).agg(
            F.max("st").cast("bigint").alias("mx"), fround(F.avg("st")).alias("mean"),
        )

    def boxes(order_col):
        return (
            cur.groupBy(F.floor(F.col(order_col) / _HILB_IVL).alias("ivl"))
            .agg(
                (
                    (F.max("qx") - F.min("qx") + 1) * (F.max("qy") - F.min("qy") + 1)
                ).alias("area")
            )
            .agg(F.sum("area").cast("bigint").alias("area"))
        )

    hs = steps("hval").select(F.col("mx").alias("hilbert_max_step"), F.col("mean").alias("hilbert_mean_step"))
    zs = steps("zval").select(F.col("mx").alias("morton_max_step"), F.col("mean").alias("morton_mean_step"))
    hb = boxes("hval").select(F.col("area").alias("hilbert_interval_bbox_area"))
    zb = boxes("zval").select(F.col("area").alias("morton_interval_bbox_area"))
    npts = cur.agg(F.count(F.lit(1)).alias("n_points"))
    return (
        npts.crossJoin(F.broadcast(hs)).crossJoin(F.broadcast(zs))
        .crossJoin(F.broadcast(hb)).crossJoin(F.broadcast(zb))
        .select(
            "n_points", "hilbert_max_step", "morton_max_step",
            "hilbert_mean_step", "morton_mean_step",
            "hilbert_interval_bbox_area", "morton_interval_bbox_area",
            (F.col("hilbert_interval_bbox_area") <= F.col("morton_interval_bbox_area")).alias("hilbert_no_worse"),
        )
    )


# --- interval overlap join (r11) -----------------------------------------------

_IVL_SQL_BASE = """
ivints AS (
  SELECT user_id, event_id,
         CAST(FLOOR(EPOCH_US(ts) / 1000000.0) AS BIGINT) AS s,
         CAST(FLOOR(EPOCH_US(ts) / 1000000.0) AS BIGINT) + 300
           + CAST(FLOOR(value * 100) AS BIGINT) % 3600 AS e
  FROM events
)
""".strip()


def _interval_overlap_sql() -> str:
    from sarpro_spark.operators.temporal import sql_interval_overlap_join

    inner = sql_interval_overlap_join(
        "ivints", "ivints", "user_id", "s", "e", "s", "e", 1800,
        ["user_id", "event_id", "s", "e"], ["event_id", "s", "e"],
    )
    return f"""
WITH {_IVL_SQL_BASE}
SELECT user_id, event_id, r_event_id,
       CAST(LEAST(e, r_e) - GREATEST(s, r_s) AS BIGINT) AS overlap_sec
FROM ({inner}) WHERE event_id < r_event_id
""".strip()


@query("events_interval_overlap", sql=_interval_overlap_sql, tags=("relational", "events", "temporal"))
def q_events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval overlap self-join (operators/temporal.py
    interval_overlap_join, r11): per-user event intervals (deterministic
    5min-65min spans derived from value) paired whenever they truly
    overlap — the genomics/occupancy operator the as-of and bucketized
    |t1-t2| joins don't cover, since BOTH sides have extent. Bucketized
    span registration (explode fan-out = ceil(span/B)+1), candidates join
    on (user, bucket), each overlapping pair survives exactly once at its
    FIRST shared bucket (no distinct pass), exact predicate filters
    bucket-grain false positives. Output hashes the pair list plus each
    pair's overlap length."""
    from sarpro_spark.operators.temporal import interval_overlap_join

    e = frames.load_table(spark, sf_dir, "events")
    s = F.floor(_epoch_us("ts").cast("double") / 1e6).cast("long")
    iv = e.select(
        "user_id", "event_id", s.alias("s"),
        (s + 300 + F.floor(F.col("value") * 100).cast("long") % 3600).alias("e"),
    )
    j = interval_overlap_join(iv, iv, "user_id", "s", "e", "s", "e", 1800)
    return (
        j.where(F.col("event_id") < F.col("r_event_id"))
        .select(
            "user_id", "event_id", "r_event_id",
            (F.least(F.col("e"), F.col("r_e")) - F.greatest(F.col("s"), F.col("r_s")))
            .cast("bigint").alias("overlap_sec"),
        )
    )


# --- CUPED variance-reduced A/B readout (r11) -----------------------------------

#: experiment split: events span 2024-01; epoch day 19738 = Jan 16 (midpoint)
_CUPED_DAY = 19738

_CUPED_ASSIGN = (
    "CASE WHEN (CAST(('0x' || SUBSTR(MD5('ab' || '|' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    " % 1000000) < 500000 THEN 'A' ELSE 'B' END"
)

#: theta from POOLED per-user moments — ONE formula text for both engines
_CUPED_THETA = "((n * sxy - sx * sy) / GREATEST(n * sxx - sx * sx, 0.000001))"

_CUPED_SQL = f"""
WITH cu_user AS (
  SELECT user_id, {_CUPED_ASSIGN} AS variant,
    SUM(CASE WHEN CAST(FLOOR(EPOCH_US(ts) / 86400000000.0) AS BIGINT) < {_CUPED_DAY}
             THEN value ELSE 0.0 END) AS x,
    SUM(CASE WHEN CAST(FLOOR(EPOCH_US(ts) / 86400000000.0) AS BIGINT) >= {_CUPED_DAY}
             THEN value ELSE 0.0 END) AS y
  FROM events GROUP BY user_id
),
cu_mraw AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM cu_user
),
cu_m AS (
  SELECT {sql_fround('n')} AS n, {sql_fround('sx')} AS sx, {sql_fround('sy')} AS sy,
         {sql_fround('sxx')} AS sxx, {sql_fround('sxy')} AS sxy
  FROM cu_mraw
),
cu_theta AS (
  SELECT {sql_fround(_CUPED_THETA)} AS theta, {sql_fround('sx / n')} AS xbar FROM cu_m
),
cu_adj AS (
  SELECT u.variant, u.y, u.y - t.theta * (u.x - t.xbar) AS y_adj
  FROM cu_user u, cu_theta t
),
cu_stats AS (
  SELECT variant, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(y) AS s1, SUM(y * y) AS s2,
         SUM(y_adj) AS a1, SUM(y_adj * y_adj) AS a2
  FROM cu_adj GROUP BY variant
),
cu_wide AS (
  SELECT
    MAX(CASE WHEN variant = 'A' THEN n END) AS na,
    MAX(CASE WHEN variant = 'A' THEN s1 END) AS sa1,
    MAX(CASE WHEN variant = 'A' THEN s2 END) AS sa2,
    MAX(CASE WHEN variant = 'A' THEN a1 END) AS aa1,
    MAX(CASE WHEN variant = 'A' THEN a2 END) AS aa2,
    MAX(CASE WHEN variant = 'B' THEN n END) AS nb,
    MAX(CASE WHEN variant = 'B' THEN s1 END) AS sb1,
    MAX(CASE WHEN variant = 'B' THEN s2 END) AS sb2,
    MAX(CASE WHEN variant = 'B' THEN a1 END) AS ab1,
    MAX(CASE WHEN variant = 'B' THEN a2 END) AS ab2
  FROM cu_stats
)
SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
  (SELECT {sql_fround('theta')} FROM cu_theta) AS theta,
  {sql_fround('(sa1 / na) - (sb1 / nb)')} AS lift_raw,
  {sql_fround('(aa1 / na) - (ab1 / nb)')} AS lift_adj,
  {sql_fround('((sa1 / na) - (sb1 / nb)) / SQRT(GREATEST((sa2 / na - (sa1 / na) * (sa1 / na)) / (na - 1), 0.000000000001) + GREATEST((sb2 / nb - (sb1 / nb) * (sb1 / nb)) / (nb - 1), 0.000000000001))')} AS t_raw,
  {sql_fround('((aa1 / na) - (ab1 / nb)) / SQRT(GREATEST((aa2 / na - (aa1 / na) * (aa1 / na)) / (na - 1), 0.000000000001) + GREATEST((ab2 / nb - (ab1 / nb) * (ab1 / nb)) / (nb - 1), 0.000000000001))')} AS t_adj,
  {sql_fround('1.0 - ((aa2 + ab2) / (na + nb) - ((aa1 + ab1) / (na + nb)) * ((aa1 + ab1) / (na + nb))) / ((sa2 + sb2) / (na + nb) - ((sa1 + sb1) / (na + nb)) * ((sa1 + sb1) / (na + nb)))')} AS var_reduction
FROM cu_wide
""".strip()


@query("events_ab_cuped", sql=_CUPED_SQL, tags=("relational", "events", "analytics"))
def q_events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (r11): the pre-period
    covariate (each user's first-half activity) absorbs between-user
    variance from the experiment metric — theta = cov(x,y)/var(x) from
    POOLED per-user moments (fround'd model state, one shared formula
    text), y_adj = y - theta (x - xbar), then the same Welch t as
    events_ab_test on raw AND adjusted metrics plus the pooled variance
    reduction. Composes the A/B readout with the OLS moment doctrine:
    per-user aggregate -> 1-row moments -> broadcast theta back -> per-
    variant reduce; no window, no collect. On THIS fixture the hashed
    var_reduction is ~corr(x,y)^2 ~ 0.5% — the synthetic users carry no
    persistent activity signature, and CUPED honestly reports it; the
    engineered-heterogeneity unit test shows the same code cutting
    variance by >50% when users do differ."""
    e = frames.load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts").cast("timestamp")).cast("double") / 86400000000.0).cast("bigint")
    variant = F.when(
        (F.conv(F.substring(F.md5(F.concat_ws("|", F.lit("ab"), F.col("user_id").cast("string"))), 1, 15), 16, 10).cast("long") % 1000000) < 500000,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    peruser = e.groupBy("user_id").agg(
        F.first(variant).alias("variant"),
        F.sum(F.when(day < _CUPED_DAY, F.col("value")).otherwise(F.lit(0.0))).alias("x"),
        F.sum(F.when(day >= _CUPED_DAY, F.col("value")).otherwise(F.lit(0.0))).alias("y"),
    )
    mraw = peruser.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    m = mraw.select(*[fround(F.col(c)).alias(c) for c in ("n", "sx", "sy", "sxx", "sxy")])
    th = m.select(
        fround(F.expr(_CUPED_THETA)).alias("theta"),
        fround(F.expr("sx / n")).alias("xbar"),
    )
    adj = peruser.crossJoin(F.broadcast(th)).select(
        "variant", "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))).alias("y_adj"),
        "theta",
    )
    stats = adj.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").alias("s1"), F.sum(F.col("y") * F.col("y")).alias("s2"),
        F.sum("y_adj").alias("a1"), F.sum(F.col("y_adj") * F.col("y_adj")).alias("a2"),
        F.first("theta").alias("theta"),
    )
    w = lambda v, c: F.max(F.when(F.col("variant") == v, F.col(c)))
    wide = stats.agg(
        w("A", "n").alias("na"), w("A", "s1").alias("sa1"), w("A", "s2").alias("sa2"),
        w("A", "a1").alias("aa1"), w("A", "a2").alias("aa2"),
        w("B", "n").alias("nb"), w("B", "s1").alias("sb1"), w("B", "s2").alias("sb2"),
        w("B", "a1").alias("ab1"), w("B", "a2").alias("ab2"),
        F.first("theta").alias("theta"),
    )
    sq = "0.000000000001"
    t_raw = (f"((sa1 / na) - (sb1 / nb)) / SQRT(GREATEST((sa2 / na - (sa1 / na) * (sa1 / na)) / (na - 1), {sq})"
             f" + GREATEST((sb2 / nb - (sb1 / nb) * (sb1 / nb)) / (nb - 1), {sq}))")
    t_adj = (f"((aa1 / na) - (ab1 / nb)) / SQRT(GREATEST((aa2 / na - (aa1 / na) * (aa1 / na)) / (na - 1), {sq})"
             f" + GREATEST((ab2 / nb - (ab1 / nb) * (ab1 / nb)) / (nb - 1), {sq}))")
    vr = ("1.0 - ((aa2 + ab2) / (na + nb) - ((aa1 + ab1) / (na + nb)) * ((aa1 + ab1) / (na + nb)))"
          " / ((sa2 + sb2) / (na + nb) - ((sa1 + sb1) / (na + nb)) * ((sa1 + sb1) / (na + nb)))")
    return wide.select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        fround(F.col("theta")).alias("theta"),
        fround(F.expr("(sa1 / na) - (sb1 / nb)")).alias("lift_raw"),
        fround(F.expr("(aa1 / na) - (ab1 / nb)")).alias("lift_adj"),
        fround(F.expr(t_raw)).alias("t_raw"),
        fround(F.expr(t_adj)).alias("t_adj"),
        fround(F.expr(vr)).alias("var_reduction"),
    )


# --- distributed heavy hitters: mergeable Misra-Gries (r12) ---------------------

_MG_KEY = "CASE WHEN user_id % 3 = 0 THEN -1 ELSE user_id END"


def _mg_cert_sql() -> str:
    from sarpro_spark.functions.heavyhitters import sql_mg_survival_certificate

    return sql_mg_survival_certificate("events", _MG_KEY)


@query("events_heavy_hitters_mg", sql=_mg_cert_sql, tags=("relational", "events", "sketch"))
def q_events_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed heavy hitters (functions/heavyhitters.py, r12): mergeable
    Misra-Gries summaries — per-shard exact counts trimmed to m entries by
    the (m+1)-th largest (a valid MG summary, Agarwal et al. PODS'12), sum-
    merged, trimmed once more; the error budget total_err = sum(t_p) + t_g
    rides in the output. The hashed certificate full-outer-joins the summary
    with exact counts over a derived skewed key (a third of all events
    collapse onto one key): under-count-only, bounded-error, and SURVIVAL
    (freq > total_err implies presence — a dropped survivor surfaces as a
    null-est row) are all hashed as data. At 100 TB the per-shard count is a
    map-side combine and only m-entry summaries move — never a key-domain
    shuffle. Streaming twin: streaming/heavyhitters.py (SpaceSaving)."""
    from sarpro_spark.functions.heavyhitters import mg_survival_certificate

    e = frames.load_table(spark, sf_dir, "events")
    keyed = e.withColumn(
        "hkey", F.when(F.col("user_id") % 3 == 0, F.lit(-1)).otherwise(F.col("user_id"))
    )
    return mg_survival_certificate(keyed, "hkey", shard_by="event_id")


# --- mergeable quantile summary certificate (r12) -------------------------------

_QS_RID = "l_orderkey * 8 + l_linenumber"


def _qs_cert_sql() -> str:
    from sarpro_spark.functions.quantiles import sql_quantile_certificate

    return sql_quantile_certificate("lineitem", "l_extendedprice", _QS_RID)


@query("lineitem_quantile_sketch", sql=_qs_cert_sql, tags=("relational", "lineitem", "sketch"))
def q_lineitem_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate quantiles (functions/quantiles.py, r12): each
    md5 shard keeps a rank-spaced weighted sample of its SORTED values
    (step_p = ceil(n_p/k); weights sum to n_p — the MRL'98/GK'01 base
    summary), samples merge by weighted union, and est(q) reads the merged
    cumulative weights. NO global sort anywhere: the shard sort is
    shard-local, the merged summary is bounded at shards*(k+1) rows.
    The certificate hashes the PROVEN rank bound as data across a 7-point
    panel on l_extendedprice: exact ranks of every estimate recomputed
    from the raw data must sit within err_budget = sum_p step_p of the
    target rank — shard assignment, spacing, weights, merge order, and
    integer target arithmetic all inside the value hash."""
    from sarpro_spark.functions.quantiles import quantile_certificate

    li = frames.load_table(spark, sf_dir, "lineitem")
    return quantile_certificate(
        li, "l_extendedprice", F.col("l_orderkey") * 8 + F.col("l_linenumber")
    )


# --- DDSketch log-linear quantiles (r13) ----------------------------------------

_DD_CENTS = "CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)"


def _dd_cert_sql() -> str:
    from sarpro_spark.functions.ddsketch import sql_ddsketch_certificate

    return sql_ddsketch_certificate("lineitem", _DD_CENTS)


@query("lineitem_ddsketch_quantiles", sql=_dd_cert_sql, tags=("relational", "lineitem", "sketch"))
def q_lineitem_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-family log-linear quantiles (functions/ddsketch.py, r13 —
    Masson et al. VLDB'19): integer-exact log-spaced buckets (4 per
    octave, relative width <= 1/4), one counter per occupied bucket.
    Unlike the rank-spaced r12 summary the bucket map is a pure function
    of the VALUE, so the sketch is exactly mergeable and fold-order-
    independent — which is what buys the streaming twin
    (streaming/ddsketch.py) its EXACT drained==batch certificate.
    The hashed certificate: per 7-point panel on price cents, the exact
    ranks of the covering bucket's [lo, hi] must straddle the target rank
    (coverage proves the true quantile VALUE sits in the bucket) and
    rel_width_pm is the proven per-mille value-error budget."""
    from sarpro_spark.functions.ddsketch import ddsketch_certificate

    li = frames.load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    return ddsketch_certificate(li, cents)


# --- incremental aggregate maintenance (materialized-view deltas, r12) ----------

_CENTS = "CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)"


def _incr_agg_sql() -> str:
    from sarpro_spark.operators.cdc import sql_latest_change

    return f"""
WITH {_CDC_CHANGES_SQL},
{sql_latest_change("cdcchanges", "o_orderkey", "seq")},
incr_newsnap AS (
  SELECT o_orderstatus, {_CENTS} AS cents FROM (
    SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
    FROM cdcbase b
    WHERE NOT EXISTS (SELECT 1 FROM cdcfinal f WHERE f.o_orderkey = b.o_orderkey)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM cdcfinal WHERE op <> 'D'
  ) z
),
incr_affected AS (
  SELECT DISTINCT o_orderstatus AS grp FROM cdcbase b
  WHERE EXISTS (SELECT 1 FROM cdcfinal f WHERE f.o_orderkey = b.o_orderkey)
  UNION
  SELECT DISTINCT o_orderstatus FROM cdcfinal WHERE op <> 'D'
)
SELECT o_orderstatus AS grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS total,
       {sql_fround('SUM(cents) / COUNT(*)')} AS avg,
       CAST(MIN(cents) AS BIGINT) AS vmin,
       CAST(MAX(cents) AS BIGINT) AS vmax,
       o_orderstatus IN (SELECT grp FROM incr_affected) AS minmax_recomputed
FROM incr_newsnap
GROUP BY 1
""".strip()


@query("orders_incremental_agg_maintenance", sql=_incr_agg_sql, tags=("relational", "cdc", "incremental"))
def q_orders_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (operators/incremental.py, r12):
    a grouped materialized view (count/sum/avg/min/max of order value in
    integer cents per status) tracks the CDC changelog WITHOUT a base
    rescan — count/sum/avg from the retraction/addition delta algebra
    (Gupta & Mumick IVM), min/max recomputed ONLY for affected groups.
    The oracle is the FULL RECOMPUTE over the post-changelog snapshot, so
    hash equality proves the delta algebra, the old-payload retraction
    sourcing, and the affected-group restriction; the minmax_recomputed
    flag (its twin replicates the affectedness algebra) rides in the
    hash so the restriction itself is certified, not just its result."""
    from sarpro_spark.operators.incremental import maintain_group_aggregate
    from sarpro_spark.queries import round_floats

    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents")
    base, changes = _cdc_changes_frame(spark, sf_dir)
    prev = base.select("o_orderkey", "o_orderstatus", cents)
    ch = changes.select("o_orderkey", "o_orderstatus", cents, "seq", "op")
    out = maintain_group_aggregate(prev, ch, "o_orderkey", "o_orderstatus", "cents")
    return round_floats(out)


# --- k-core decomposition over the supplier-part graph (r12) --------------------

_KCORE_K = 24
_KCORE_EDGES_SQL = (
    "(SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src, "
    "'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem)"
)


def _kcore_sql() -> str:
    from sarpro_spark.llm.graph import sql_kcore_survivors

    return sql_kcore_survivors(_KCORE_EDGES_SQL, _KCORE_K)


@query("suppart_kcore", sql=_kcore_sql, tags=("relational", "graph", "iterative"))
def q_suppart_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (llm/graph.py kcore_survivors, r12): synchronous
    peeling (Matula-Beck; distributed form of Montresor et al.) of the
    supplier-part bipartite graph — drop every vertex with induced degree
    < k, recompute, repeat for a FIXED round count; survivor sets are
    nested so the hashed ``converged`` flag certifies the fixpoint as
    data rather than trusting an unbounded loop. Each round is two keyed
    semi-joins + one aggregate — the loop builds the PLAN (checkpointed
    every other round), the data never visits the driver. The oracle
    unrolls the identical rounds as CTEs."""
    from sarpro_spark.llm.graph import kcore_survivors

    li = frames.load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    return kcore_survivors(edges, _KCORE_K)


# --- densest subgraph by parallel peeling (r13) ---------------------------------


def _densest_sql() -> str:
    from sarpro_spark.llm.densest import sql_densest_subgraph

    return sql_densest_subgraph(_KCORE_EDGES_SQL)


@query("suppart_densest", sql=_densest_sql, tags=("relational", "graph", "iterative"))
def q_suppart_densest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densest-subgraph 2(1+eps)-approximation (llm/densest.py, r13 —
    Bahmani, Kumar & Vassilvitskii 2012's parallel peel) over the same
    supplier-part graph as ``suppart_kcore``: each round deletes EVERY
    vertex whose induced degree is <= 2.2x the current density, the
    densest surviving snapshot wins.  eps = 1/10 keeps the peel predicate
    exact integer arithmetic (10*deg*|V| > 22*|E|) and the cross-round
    density compare divides exact integers, so the fixed-round unrolled
    CTE twin is bit-identical.  Per round: two semi-joins + a degree
    aggregate + two 1-row counts, survivors checkpointed every other
    round; the best-round vertex set, its degree profile, and the density
    itself all ride in the hash."""
    from sarpro_spark.llm.densest import densest_subgraph

    li = frames.load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    return densest_subgraph(edges)


# --- KMV/theta sketch set-operation overlap (r12) -------------------------------

_KMV_B_REL = (
    "(SELECT CASE WHEN o_orderkey % 5 = 0 THEN o_orderkey + 1000000000 "
    "ELSE o_orderkey END AS k FROM orders WHERE o_orderkey % 3 <> 0)"
)


def _kmv_sql() -> str:
    from sarpro_spark.functions.kmv import sql_kmv_overlap_certificate

    return sql_kmv_overlap_certificate("orders", "o_orderkey", _KMV_B_REL, "k")


@query("orders_overlap_kmv", sql=_kmv_sql, tags=("relational", "sketch", "agg"))
def q_orders_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta set-operation sketches (functions/kmv.py, r12): |A|, |B|,
    union, intersection and Jaccard between two key sets estimated from two
    bottom-k sketches (TakeOrdered — no global sort, no raw-set join), the
    production answer to snapshot/benchmark overlap at 100 TB. The fixture
    models two table snapshots (a third of keys deleted, a fifth replaced).
    The certificate hashes exact counts (the expensive verification legs),
    the deterministic md5-sketch estimates, and the 3-sigma KMV bound
    booleans — drift past the published rsd flips a hashed value. Exact
    mode (union < k) takes the same branch on both engines."""
    from sarpro_spark.functions.kmv import kmv_overlap_certificate

    o = frames.load_table(spark, sf_dir, "orders")
    b = o.where(F.col("o_orderkey") % 3 != 0).select(
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_orderkey") + 1000000000)
        .otherwise(F.col("o_orderkey"))
        .alias("k")
    )
    return kmv_overlap_certificate(o, F.col("o_orderkey"), b, F.col("k"))


# --- LEFT OUTER stream-stream attribution (r12) ---------------------------------

_ATTRIBUTION_OUTER_SQL = """
SELECT p.user_id, p.event_id AS purchase_id,
       CAST(EPOCH_US(p.ts) AS BIGINT) AS purchase_ts_us,
       p.value AS purchase_value, c.event_id AS click_id,
       CAST(EPOCH_US(c.ts) AS BIGINT) AS click_ts_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
""".strip()


@query("events_attribution_outer", sql=_ATTRIBUTION_OUTER_SQL, tags=("relational", "events", "streaming"))
def q_events_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join surface (streaming/joins.py
    attribution_join_outer, r12) run in batch mode: every purchase emits,
    null click columns when nothing preceded it in the window — the
    unattributed-conversion report. In streaming the null-extended row may
    only emit once the GLOBAL watermark proves no match can arrive
    (state-eviction semantics); tests/test_streaming.py drains the bounded
    stream past a watermark-advancing sentinel and asserts row-for-row
    equality with this batch twin."""
    from sarpro_spark.streaming.joins import attribution_join_outer

    e = frames.load_table(spark, sf_dir, "events")
    out = attribution_join_outer(e)
    return out.select(
        "user_id", "purchase_id",
        (F.unix_micros(F.col("purchase_ts"))).alias("purchase_ts_us"),
        "purchase_value", "click_id",
        (F.unix_micros(F.col("click_ts"))).alias("click_ts_us"),
    )


# --- FULL OUTER stream-stream attribution (r13) ----------------------------------

_ATTRIBUTION_FULL_SQL = """
SELECT COALESCE(p.user_id, c.user_id) AS user_id, p.event_id AS purchase_id,
       CAST(EPOCH_US(p.ts) AS BIGINT) AS purchase_ts_us,
       p.value AS purchase_value, c.event_id AS click_id,
       CAST(EPOCH_US(c.ts) AS BIGINT) AS click_ts_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
""".strip()


@query("events_attribution_full", sql=_ATTRIBUTION_FULL_SQL, tags=("relational", "events", "streaming"))
def q_events_attribution_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream join surface (streaming/joins.py
    attribution_join_full, r13) run in batch mode: the symmetric completion
    of the join matrix — unattributed purchases AND orphan clicks both
    null-extend. In streaming either side's null row may only emit once the
    global watermark proves no partner can arrive; tests/test_streaming.py
    drains the two sides with CROSSED arrival orders and asserts row-for-row
    equality with this batch twin."""
    from sarpro_spark.streaming.joins import attribution_join_full

    e = frames.load_table(spark, sf_dir, "events")
    out = attribution_join_full(e)
    return out.select(
        "user_id", "purchase_id",
        (F.unix_micros(F.col("purchase_ts"))).alias("purchase_ts_us"),
        "purchase_value", "click_id",
        (F.unix_micros(F.col("click_ts"))).alias("click_ts_us"),
    )


# --- streaming KMV sketch: batch twin (r12) --------------------------------------

_KMV_STREAM_TWIN_SQL = """
WITH kvh AS (
  SELECT DISTINCT
    CAST(('0x' || SUBSTR(MD5('kmv|' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
    CAST(CAST(('0x' || SUBSTR(MD5('kmvshard' || '|' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 % 4 AS INTEGER) AS shard
  FROM events
)
SELECT shard, CAST(rn - 1 AS INTEGER) AS pos, h
FROM (SELECT shard, h, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h) AS rn FROM kvh) z
WHERE rn <= 128
""".strip()


@query("events_kmv_distinct_sketch", sql=_KMV_STREAM_TWIN_SQL, tags=("relational", "events", "sketch", "streaming"))
def q_events_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming KMV distinct sketch, certified through its batch twin
    (streaming/kmv.py): per key-hash shard, the k smallest distinct
    60-bit key hashes — the bounded-state live distinct-count gauge.
    Bottom-k of a set is ORDER-INDEPENDENT, so the drained stream equals
    THIS batch relation exactly for any micro-batch split (asserted in
    tests/test_streaming.py); hashing this row therefore certifies the
    streaming operator's converged state value-for-value."""
    from sarpro_spark.streaming.kmv import kmv_batch

    e = frames.load_table(spark, sf_dir, "events")
    return kmv_batch(e, "user_id", k=128, shards=4)

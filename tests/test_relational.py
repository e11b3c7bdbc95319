

def test_bucketed_colocated_join_zero_exchange(spark):
    """r11 layout certificate: the bucketed-table join+agg plans with ZERO
    exchanges (scan partitioning satisfies join and aggregate), scans
    report Bucketed: true, values equal the plain join, and a repeat
    invocation overwrites (never accumulates) the scratch tables."""
    from pyspark.sql import functions as F

    from sarpro_spark import frames
    from sarpro_spark.queries import fround
    from sarpro_spark.queries_relational import q_bucketed_colocated_join

    sf_dir = "/root/testdata/sf0.001"
    df = q_bucketed_colocated_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan and plan.count("Bucketed: true") == 2

    li = frames.load_table(spark, sf_dir, "lineitem")
    o = frames.load_table(spark, sf_dir, "orders")
    plain = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
            F.min("o_orderpriority").alias("pri"),
        )
    )
    n1 = df.count()
    assert {tuple(r) for r in df.collect()} == {tuple(r) for r in plain.collect()}
    # idempotent scratch: a repeat invocation overwrites and re-reads its
    # own fresh file index (an OLD handle dies with the rewrite — that is
    # the documented overwrite-scratch contract, so count n1 is captured
    # before re-invoking)
    assert q_bucketed_colocated_join(spark, sf_dir).count() == n1



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


# --- CDC merge operators (operators/cdc.py, r11) -------------------------------


def test_apply_changelog_semantics(spark):
    from sarpro_spark.operators.cdc import apply_changelog

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 1, "U"),   # update
            (1, "a3", 2, "U"),   # later update wins
            (2, "b", 1, "D"),    # delete
            (4, "d", 1, "I"),    # insert new key
            (5, "e", 1, "U"),    # upsert on absent key == insert
            (6, "x", 1, "I"),
            (6, "x", 2, "D"),    # insert then delete -> absent
        ],
        "k long, v string, seq long, op string",
    )
    out = {r["k"]: r for r in apply_changelog(base, changes, "k").collect()}
    assert set(out) == {1, 3, 4, 5}
    assert out[1]["v"] == "a3" and out[1]["applied_seq"] == 2
    assert out[3]["v"] == "c" and out[3]["applied_seq"] is None  # untouched
    assert out[4]["applied_op"] == "I"
    assert out[5]["applied_op"] == "U"  # idempotent replay semantics


def test_scd2_history_chain(spark):
    from sarpro_spark.operators.cdc import scd2_history

    changes = spark.createDataFrame(
        [(1, "a1", 1, "I"), (1, "a2", 5, "U"), (1, "a2", 9, "D"), (2, "b1", 3, "I")],
        "k long, v string, seq long, op string",
    )
    rows = {(r["k"], r["valid_from"]): r for r in scd2_history(changes, "k").collect()}
    assert rows[(1, 1)]["valid_to"] == 5 and not rows[(1, 1)]["is_current"]
    assert rows[(1, 5)]["valid_to"] == 9 and not rows[(1, 5)]["is_current"]
    # deleted key: chain fully closed, no current version
    assert rows[(1, 9)]["valid_to"] is None and not rows[(1, 9)]["is_current"]
    assert rows[(2, 3)]["is_current"]

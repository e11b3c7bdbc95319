

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


# --- Bloom-filter semi-join reduction (functions/bloom.py, r11) -----------------


def test_bloom_no_false_negatives_and_reduction(spark):
    from pyspark.sql import functions as F

    from sarpro_spark.functions.bloom import bloom_build, bloom_probe

    dim = spark.range(0, 50).select((F.col("id") * 7).alias("k"))
    fact = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("payload"))
    bloom = bloom_build(dim, "k", m_bits=1 << 12)
    assert bloom.count() <= (1 << 12) / 32

    passed = bloom_probe(fact, "k", bloom, m_bits=1 << 12)
    passed_keys = {r["k"] for r in passed.collect()}
    exact_keys = {r["k"] for r in fact.join(dim, "k", "left_semi").collect()}
    assert exact_keys <= passed_keys          # NO false negatives, ever
    assert len(passed_keys) < 5000 // 4       # real reduction (>75% dropped)


def test_bloom_fp_rate_shrinks_with_m(spark):
    from pyspark.sql import functions as F

    from sarpro_spark.functions.bloom import bloom_build, bloom_probe

    dim = spark.range(0, 64).select((F.col("id") * 13 + 5).alias("k"))
    fact = spark.range(0, 4000).select(F.col("id").alias("k"))
    counts = {}
    for m in (1 << 9, 1 << 14):
        bloom = bloom_build(dim, "k", m_bits=m)
        counts[m] = bloom_probe(fact, "k", bloom, m_bits=m).count()
    assert counts[1 << 14] <= counts[1 << 9]  # bigger filter, fewer fps


# --- time-series resample + gap-fill (operators/temporal.py, r11) ---------------


def test_resample_gapfill_fills(spark):
    import datetime as dt

    from sarpro_spark.operators.temporal import resample_gapfill

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(hours=4), 30.0),   # 3 missing hourly buckets
        (2, t0, 5.0),                             # single-point series
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {(r["key"], r["bucket_us"]): r for r in
           resample_gapfill(df, "k", "ts", "v", 3_600_000_000).collect()}
    h = 3_600_000_000
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert len([k for k in out if k[0] == 1]) == 5          # dense grid
    assert out[(1, base)]["v_avg"] == 10.0
    assert out[(1, base + h)]["v_avg"] is None               # a real gap
    assert out[(1, base + h)]["locf"] == 10.0                # carried forward
    assert out[(1, base + h)]["linear"] == 15.0              # 10 + (30-10)*1/4
    assert out[(1, base + 3 * h)]["linear"] == 25.0
    assert out[(1, base + 4 * h)]["locf"] == 30.0
    assert len([k for k in out if k[0] == 2]) == 1           # no spurious grid


def test_snapshot_diff_roundtrip_law(spark):
    """apply_changelog(old, snapshot_diff(old, new)) must reproduce new."""
    from pyspark.sql import functions as F

    from sarpro_spark.operators.cdc import apply_changelog, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0), (4, "d", 4.0)],
        "k long, v string, w double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),       # unchanged -> no diff row
         (2, "B", 2.0),       # changed
         (3, "c", 3.0),       # NULL -> value (null-safe compare)
         (5, "e", 5.0)],      # inserted; 4 deleted
        "k long, v string, w double",
    )
    diff = snapshot_diff(old, new, "k")
    ops = {r["k"]: r["op"] for r in diff.collect()}
    assert ops == {2: "U", 3: "U", 4: "D", 5: "I"}

    clog = diff.withColumn("seq", F.lit(1))
    rebuilt = apply_changelog(old, clog, "k").select("k", "v", "w")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_interval_overlap_join_exact_and_once(spark):
    from pyspark.sql import functions as F

    from sarpro_spark.operators.temporal import interval_overlap_join

    # hand-checked overlaps on one key: [0,10] x {[5,15] yes, [10,20] yes
    # (closed touch), [11,20] no, [0,3] yes}; other key isolated
    left = spark.createDataFrame([(1, 100, 0, 10), (2, 200, 0, 10)], "k long, lid long, s long, e long")
    right = spark.createDataFrame(
        [(1, 1, 5, 15), (1, 2, 10, 20), (1, 3, 11, 20), (1, 4, 0, 3), (2, 5, 50, 60)],
        "k long, rid long, s long, e long",
    )
    out = interval_overlap_join(left, right, "k", "s", "e", "s", "e", bucket=4)
    pairs = sorted((r["lid"], r["r_rid"]) for r in out.collect())
    assert pairs == [(100, 1), (100, 2), (100, 4)]

    # exactly-once under many shared buckets: long intervals share 100+
    # buckets but the pair must appear once
    ll = spark.createDataFrame([(1, 1, 0, 1000)], "k long, lid long, s long, e long")
    rr = spark.createDataFrame([(1, 9, 5, 900)], "k long, rid long, s long, e long")
    assert interval_overlap_join(ll, rr, "k", "s", "e", "s", "e", bucket=7).count() == 1


def test_cuped_reduces_variance_with_real_heterogeneity(spark):
    """The fixture's users are homogeneous (var_reduction ~ 0.5%, hashed in
    events_ab_cuped); with persistent per-user levels the same moment
    arithmetic must remove most between-user variance."""
    from pyspark.sql import functions as F

    from sarpro_spark.queries import spark_queries

    # engineered: user level L(u) appears in BOTH halves -> x predicts y
    users = spark.range(200).select(
        F.col("id").alias("u"),
        (F.pmod(F.col("id") * 37, F.lit(100)).cast("double")).alias("L"),
    )
    per = users.select(
        "u",
        (F.col("L") * 10 + F.pmod(F.col("u") * 7, F.lit(5)).cast("double")).alias("x"),
        (F.col("L") * 10 + F.pmod(F.col("u") * 11, F.lit(5)).cast("double")).alias("y"),
    )
    m = per.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).collect()[0]
    n, sx, sy, sxx, sxy, syy = (m[c] for c in ("n", "sx", "sy", "sxx", "sxy", "syy"))
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    var_y = syy / n - (sy / n) ** 2
    adj = per.select((F.col("y") - theta * (F.col("x") - sx / n)).alias("ya"))
    a = adj.agg(F.sum("ya").alias("a1"), F.sum(F.col("ya") * F.col("ya")).alias("a2"),
                F.count(F.lit(1)).cast("double").alias("n")).collect()[0]
    var_adj = a["a2"] / a["n"] - (a["a1"] / a["n"]) ** 2
    assert var_adj < 0.5 * var_y  # heterogeneity absorbed

    # and the registered certificate runs end-to-end on the real fixture
    row = spark_queries()["events_ab_cuped"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["na"] > 0 and row["nb"] > 0
    assert -1.0 <= row["var_reduction"] <= 1.0


# --- mergeable quantile summary (functions/quantiles.py, r12) --------------------


def test_quantile_bound_on_adversarial_distributions(spark):
    """The rank bound must hold on skew (power-law), near-constant (massive
    ties), and tiny-n (n < capacity => summary is exact) inputs."""
    from pyspark.sql import functions as F

    from sarpro_spark.functions.quantiles import quantile_certificate

    cases = {
        "powerlaw": [(i, float((i % 97) ** 3)) for i in range(5000)],
        "ties": [(i, float(i % 3)) for i in range(5000)],
        "tiny": [(i, float(i * 7 % 101)) for i in range(40)],
    }
    for name, rows in cases.items():
        df = spark.createDataFrame(rows, "rid long, v double")
        out = quantile_certificate(df, "v", F.col("rid")).collect()
        assert len(out) == 7, name
        for r in out:
            assert r["within_bound"], (name, dict(r.asDict()))
        if name == "tiny":
            # n < shards*capacity: every shard keeps everything => exact
            for r in out:
                assert r["rank_lo"] <= r["target"] <= r["rank_hi"] + r["err_budget"]


def test_quantile_summary_weights_sum_to_n(spark):
    from pyspark.sql import functions as F

    from sarpro_spark.functions.quantiles import quantile_summary

    df = spark.createDataFrame([(i, float(i % 251)) for i in range(3000)], "rid long, v double")
    kept = quantile_summary(df, "v", F.col("rid"))
    total = kept.agg(F.sum("w")).collect()[0][0]
    assert total == 3000
    per_shard = kept.groupBy("shard").count().collect()
    for r in per_shard:
        assert r["count"] <= 64 + 1


# --- incremental aggregate maintenance (operators/incremental.py, r12) -----------


def test_incremental_agg_group_death_and_extremum_retraction(spark):
    """The two hard cases of IVM: (a) a group whose last row is deleted
    must VANISH from the view; (b) deleting the group maximum must yield
    the recomputed (smaller) max, not the stale one — both must equal the
    full recompute on the post-changelog snapshot."""
    from pyspark.sql import functions as F

    from sarpro_spark.operators.cdc import apply_changelog
    from sarpro_spark.operators.incremental import (
        group_aggregate,
        maintain_group_aggregate,
    )

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 99), (3, "a", 5), (4, "b", 7), (5, "c", 3)],
        "k long, g string, v long",
    )
    changes = spark.createDataFrame(
        [
            (2, "a", 99, 1, "D"),   # retracts group a's maximum
            (4, "b", 7, 1, "D"),    # kills group b entirely
            (6, "c", 50, 1, "I"),   # tightens group c's max
            (1, "a", 11, 1, "U"),   # value update in place
        ],
        "k long, g string, v long, seq long, op string",
    )
    got = {
        r["grp"]: (r["n"], r["total"], r["vmin"], r["vmax"], r["minmax_recomputed"])
        for r in maintain_group_aggregate(base, changes, "k", "g", "v").collect()
    }
    new_snap = apply_changelog(base, changes, "k").select("k", "g", "v")
    want = {
        r["grp"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in group_aggregate(new_snap, "g", "v").collect()
    }
    assert set(got) == set(want) == {"a", "c"}  # group b died
    for g in want:
        assert got[g][:4] == want[g], (g, got[g], want[g])
    assert got["a"][3] == 11  # stale max 99 retracted, recomputed
    assert got["a"][4] and got["c"][4]  # both groups were affected


def test_incremental_agg_unaffected_groups_not_recomputed(spark):
    from pyspark.sql import functions as F

    from sarpro_spark.operators.incremental import maintain_group_aggregate

    base = spark.createDataFrame(
        [(i, "hot" if i % 2 == 0 else "cold", i) for i in range(100)],
        "k long, g string, v long",
    )
    changes = spark.createDataFrame(
        [(0, "hot", 1000, 1, "U")], "k long, g string, v long, seq long, op string"
    )
    rows = {r["grp"]: r for r in maintain_group_aggregate(base, changes, "k", "g", "v").collect()}
    assert rows["hot"]["minmax_recomputed"]
    assert not rows["cold"]["minmax_recomputed"]  # untouched group: no rescan
    assert rows["cold"]["vmax"] == 99 and rows["cold"]["vmin"] == 1


# --- KMV/theta set-operation sketches (functions/kmv.py, r12) --------------------


def test_kmv_exact_mode_small_sets(spark):
    """Union below k: theta stays 1.0 and every estimate IS the exact
    count — the branch both engines must take identically."""
    from pyspark.sql import functions as F

    from sarpro_spark.functions.kmv import kmv_overlap_certificate

    a = spark.createDataFrame([(i,) for i in range(50)], "k long")
    b = spark.createDataFrame([(i,) for i in range(25, 75)], "k long")
    r = kmv_overlap_certificate(a, F.col("k"), b, F.col("k"), k=256).collect()[0]
    assert r["exact_a"] == 50 and r["exact_b"] == 50
    assert r["exact_inter"] == 25 and r["exact_union"] == 75
    assert r["est_a"] == 50.0 and r["est_union"] == 75.0 and r["est_inter"] == 25.0


def test_kmv_estimates_track_disjoint_and_identical(spark):
    """Degenerate overlaps: identical sets estimate Jaccard ~1, disjoint
    sets estimate intersection ~0 (exactly 0 retained hashes)."""
    from pyspark.sql import functions as F

    from sarpro_spark.functions.kmv import kmv_overlap_certificate

    a = spark.createDataFrame([(i,) for i in range(4000)], "k long")
    same = kmv_overlap_certificate(a, F.col("k"), a, F.col("k"), k=128).collect()[0]
    assert same["jaccard_est"] == 1.0 and same["union_ok"]
    b = spark.createDataFrame([(i + 1_000_000,) for i in range(4000)], "k long")
    disj = kmv_overlap_certificate(a, F.col("k"), b, F.col("k"), k=128).collect()[0]
    assert disj["est_inter"] == 0.0 and disj["exact_inter"] == 0

"""Tests: as-of join, range join, connected-components clustering."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sarpro_spark.llm import cluster as cl
from sarpro_spark.operators import temporal as tp

BASE = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), "l0"), (1, _ts(10), "l10"), (1, _ts(20), "l20"), (2, _ts(5), "l5")],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 100), (1, _ts(10), 200), (1, _ts(15), 300), (3, _ts(0), 999)],
        "k long, ts timestamp, rid int",
    )
    out = {
        (r["k"], r["name"]): r["rid_r"]
        for r in tp.asof_join(left, right, on="k", right_cols=["rid"]).collect()
    }
    assert out[(1, "l0")] is None  # nothing at or before t=0
    assert out[(1, "l10")] == 200  # inclusive: equal timestamp matches
    assert out[(1, "l20")] == 300  # latest preceding
    assert out[(2, "l5")] is None  # key with no right rows


def test_range_join_buckets(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(0)), (1, 11, _ts(30))], "k long, lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 20, _ts(5)), (1, 21, _ts(14)), (1, 22, _ts(50)), (2, 23, _ts(0))],
        "k long, rid int, ts timestamp",
    )
    out = tp.range_join_buckets(left, right, on="k", left_time="ts", right_time="ts",
                                max_delta_sec=600)
    pairs = {(r["lid"], r["r_rid"]) for r in out.collect()}
    # within 10 min: l@0 matches r@5; l@30 matches nothing (14 is 16min away... no: |30-14|=16min>10) -> check
    assert (10, 20) in pairs
    assert (10, 21) not in pairs  # 14 min > 10 min
    assert (11, 22) not in pairs  # 20 min
    assert all(l != 23 for (l, _) in pairs)  # key isolation


def test_connected_components(spark):
    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    # components: {0,1,2,3} (chain), {4,5}, {6}, {7}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "a long, b long"
    )
    out = {r["id"]: r["cluster_id"] for r in cl.connected_components(nodes, edges).collect()}
    assert out[0] == out[1] == out[2] == out[3] == 0
    assert out[4] == out[5] == 4
    assert out[6] == 6 and out[7] == 7


def test_dedup_clusters_canonical(spark):
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 4)], "doc_a long, doc_b long")
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in
           cl.dedup_clusters(docs, pairs).collect()}
    assert out[1] == (1, True)
    assert out[3] == (1, False) and out[4] == (1, False)
    assert out[0] == (0, True) and out[2] == (2, True)
    # deduplicated corpus keeps exactly one doc per cluster
    n_kept = sum(1 for v in out.values() if v[1])
    assert n_kept == 3


def test_asof_cogrouped_matches_union_form(spark):
    """The cogroup+merge_asof form and the union-and-forward-fill form must
    produce identical results (incl. no-match nulls and exact-time ties)."""
    from pyspark.sql import functions as F

    from sarpro_spark.operators.temporal import asof_join, asof_join_cogrouped

    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00"), (2, 10, "2024-01-01 11:00:00"),
         (3, 20, "2024-01-01 09:00:00"), (4, 30, "2024-01-01 12:00:00")],
        "event_id long, user_id long, t string",
    ).select("event_id", "user_id", F.col("t").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 10:00:00", 100),   # exact tie with left event 1
         (10, "2024-01-01 10:30:00", 101),
         (20, "2024-01-01 09:30:00", 200)],  # after left event 3 -> no match
        "user_id long, t string, event_id long",
    ).select("user_id", F.col("t").cast("timestamp").alias("ts"), "event_id")
    kw = dict(on="user_id", left_time="ts", right_time="ts", right_cols=["event_id", "ts"])
    a = {r["event_id"]: (r["event_id_r"], r["ts_r"]) for r in asof_join(left, right, **kw).collect()}
    b = {r["event_id"]: (r["event_id_r"], r["ts_r"]) for r in asof_join_cogrouped(left, right, **kw).collect()}
    assert a == b
    assert a[1][0] == 100   # inclusive exact match
    assert a[2][0] == 101
    assert a[3] == (None, None)   # right row is after -> null
    assert a[4] == (None, None)   # user 30 has no right rows


# --- triangle counting (llm/graph.py, r11) -------------------------------------


def test_triangle_counts_known_graphs(spark):
    from sarpro_spark.llm import graph as gr

    # K4 + pendant: every K4 vertex is in C(3,2)=3 triangles, pendant in 0
    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (2, 1)],
        "src long, dst long",
    )
    out = {r["vertex"]: r for r in gr.triangle_counts(k4).collect()}
    assert all(out[str(v)]["triangles"] == 3 for v in (1, 2, 3))
    assert out["4"]["triangles"] == 3 and out["4"]["deg"] == 4
    assert out["5"]["triangles"] == 0 and out["5"]["local_cc"] == 0.0
    assert out["1"]["local_cc"] == 1.0  # closed neighborhood

    # triangle-free bipartite C4: zero everywhere
    c4 = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long")
    assert all(r["triangles"] == 0 for r in gr.triangle_counts(c4).collect())


def test_triangle_counts_duplicate_and_directed_input(spark):
    from sarpro_spark.llm import graph as gr

    # duplicated edges in both directions must canonicalize: ONE triangle
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3)], "src long, dst long"
    )
    rows = gr.triangle_counts(e).collect()
    assert sum(r["triangles"] for r in rows) == 3  # 1 triangle x 3 vertices


def test_gsb_multi_subgrid_overlap_arbitration(spark, tmp_path):
    """r12 (verdict item 10): NUM_FILE=2 nesting with OVERLAP — a dense
    child window inside a sparse parent. The NTv2 selection rule (densest
    covering subgrid wins) must hold point-by-point: inside the child ->
    child's shift and gid; parent-only -> parent's; outside both -> NULL."""
    import numpy as np

    from sarpro_spark.operators import gridshift as gsx

    parent_h = {"lat0": 0.0, "lon0": 0.0, "lat_inc": 1.0, "lon_inc": 1.0,
                "n_lat": 5, "n_lon": 5}
    child_h = {"lat0": 1.0, "lon0": 1.0, "lat_inc": 0.5, "lon_inc": 0.5,
               "n_lat": 5, "n_lon": 5}
    pa = (np.full((5, 5), 3.5), np.full((5, 5), 7.25))     # f32-exact
    ca = (np.full((5, 5), -1.25), np.full((5, 5), 2.75))
    p = str(tmp_path / "nested.gsb")
    gsx.write_gsb(p, subgrids=[
        (parent_h, pa, "PARENT00", "NONE"),
        (child_h, ca, "CHILD000", "PARENT00"),
    ])
    assert gsx.gsb_num_file(p) == 2

    grids = gsx.read_gsb_df(spark, p)  # all subgrids
    assert len(grids) == 2
    pts = spark.createDataFrame(
        [(0, 0.5, 0.5),    # parent-only (outside child window)
         (1, 2.0, 2.0),    # inside the dense child -> child wins
         (2, 2.9, 2.9),    # still inside child extent [1, 3]
         (3, 10.0, 10.0)], # outside both
        "pid long, lon double, lat double",
    )
    out = {r["pid"]: r for r in
           gsx.multigrid_interp(pts, grids, "lon", "lat", "t").collect()}
    # densest-first ordering: child (0.25 deg^2 cells) = gid 0, parent = gid 1
    assert out[0]["t_gid"] == 1 and out[0]["t_dlat"] == 3.5 and out[0]["t_dlon"] == 7.25
    for pid in (1, 2):
        assert out[pid]["t_gid"] == 0
        assert out[pid]["t_dlat"] == -1.25 and out[pid]["t_dlon"] == 2.75
    assert out[3]["t_gid"] is None and out[3]["t_dlat"] is None


# --- k-core decomposition (llm/graph.py, r12) -------------------------------------


def test_kcore_known_graph(spark):
    """Hand-checkable fixture: a 4-clique with pendant vertices — the
    3-core is exactly the clique (pendants peel, then nothing changes);
    converged must be true and in-core degrees equal 3."""
    from sarpro_spark.llm.graph import kcore_survivors

    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
             ("a", "x"), ("b", "y"), ("x", "z")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = {r["v"]: r for r in kcore_survivors(df, 3, rounds=4).collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    for r in rows.values():
        assert r["deg_in_core"] == 3 and r["converged"]


def test_kcore_cascade_peel(spark):
    """A chain of triangles sharing single vertices: the 2-core keeps all
    triangle vertices, the 3-core is empty — cascading removal must not
    stop after one round."""
    from sarpro_spark.llm.graph import kcore_survivors

    edges = []
    for t in range(4):  # triangles t0-(t0+1)-(t0+2) chained by shared vertex
        a, b, c = f"v{2*t}", f"v{2*t+1}", f"v{2*t+2}"
        edges += [(a, b), (b, c), (a, c)]
    edges += [("v0", "pend1"), ("pend1", "pend2"), ("pend2", "pend3")]
    df = spark.createDataFrame(edges, "src string, dst string")
    two = kcore_survivors(df, 2, rounds=6).collect()
    assert {r["v"] for r in two} == {f"v{i}" for i in range(9)}
    assert all(r["converged"] for r in two)
    three = kcore_survivors(df, 3, rounds=6).collect()
    assert three == []

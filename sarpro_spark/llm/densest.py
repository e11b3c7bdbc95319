"""Densest-subgraph 2(1+eps)-approximation by parallel peeling (r13).

Bahmani, Kumar & Vassilvitskii 2012 (VLDB, "Densest Subgraph in
Streaming and MapReduce", public paper): repeatedly delete EVERY vertex
whose induced degree is at most 2(1+eps) times the current density
|E|/|V|; the densest of the surviving snapshots is within 2(1+eps) of
the optimum, and the vertex count shrinks geometrically so
O(log n / eps) rounds finish ANY graph — the canonical
massively-parallel densest-subgraph algorithm (the sequential Charikar
2000 peel removes one vertex per round and cannot scale).

Determinism doctrine: eps is the fixed rational 1/10, so the peel
predicate is EXACT integer arithmetic — drop v iff
``10 * deg(v) * |V| <= 22 * |E|`` — and the cross-round density
comparison divides two exact integers (IEEE division of integers
< 2^53 is correctly rounded, hence bit-identical on both engines).
Round count is FIXED so the DuckDB twin unrolls the identical rounds as
CTEs (the k-core doctrine, ``llm/graph.py``).

Scale shape (100 TB): each round is two keyed semi-joins + a degree
aggregate + two 1-row counts (|E| = sum(deg)/2 off the SAME aggregate —
no separate edge-count pass; r13 optimization round, guide §1.2);
survivors are checkpointed every other
round so the iterated lineage never re-executes the edge derivation;
snapshot membership is a (round, v) union joined against the 1-row best
round — the data never visits the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sarpro_spark.llm.cluster import _checkpointer

#: 2*(1+eps) with eps = 1/10, as the exact fraction 22/10
DENSEST_NUM = 22
DENSEST_DEN = 10
DENSEST_ROUNDS = 12


def densest_subgraph(
    edges: DataFrame,
    rounds: int = DENSEST_ROUNDS,
    src: str = "src",
    dst: str = "dst",
    round_digits: int = 6,
) -> DataFrame:
    """(v, deg_in_best, best_round, n_vertices, n_edges, density) — the
    densest surviving snapshot of ``rounds`` peels, every column inside
    the certificate (density fround'd; the rest exact integers)."""
    from sarpro_spark.queries import fround

    a, b = F.col(src).cast("string"), F.col(dst).cast("string")
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    checkpoint = _checkpointer(e)
    e = checkpoint(e)
    both = e.select(F.col("a").alias("v"), F.col("b").alias("w")).unionByName(
        e.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    # r13 optimization round (guide §1.2 "the distributed algorithm" + §3.3
    # plan-size note). Two structural changes, results bit-identical:
    #
    # 1. The live-edge count needs NO separate semi-join pass over the edge
    #    relation — ``both`` holds each undirected live edge exactly twice
    #    ((v,w) and (w,v)), so sum(deg) over the SAME degree aggregate the
    #    peel already computes equals 2·|E| exactly (integer arithmetic;
    #    coalesce keeps a peeled-to-empty round's 0 identical). That deletes
    #    the per-round live_e subtree (2 semi-joins + count — a third of
    #    every round's stages).
    # 2. Checkpoint the per-round DEGREE relation (vertex-sized) instead of
    #    the survivor set every other round: deg feeds the peel filter, the
    #    |E| stat, the snapshot-membership leg and the next round's
    #    semi-joins, so truncating lineage AT deg keeps every consumer a
    #    shallow scan and stops the formatted plan's exponential subtree
    #    re-expansion (measured 2.2 MB/4680 Exchanges before; the every-
    #    other-round variant grew to 4.5 MB once live_e was removed —
    #    planning time is real driver work, guide §7.3).
    surv = checkpoint(both.select("v").distinct())
    snapshots = []  # (round, surv) membership legs
    stat_rows: list[tuple[int, int, int]] = []  # (round, n_v, n_e) scalars
    for r in range(rounds):
        live = both.join(surv.select("v"), "v", "left_semi").join(
            surv.select(F.col("v").alias("w")), "w", "left_semi"
        )
        deg = checkpoint(live.groupBy("v").agg(F.count(F.lit(1)).alias("deg")))
        # r14 (verdict item 5): the per-round (n_v, n_e) stat is TWO LONGS —
        # collect them (the family's documented scalar exception, cf. the
        # connected-components convergence probe) instead of checkpointing
        # a 1-row relation and broadcasting it into every consumer. The
        # peel predicate then embeds exact integer LITERALS, the 12
        # stat-leg subtrees + 12 per-round broadcasts leave the plan, and
        # the round still pays exactly two eager actions (deg checkpoint +
        # this 1-row collect — which replaces the old stat-checkpoint
        # action). A union-the-stat-into-deg variant measured NEGATIVE
        # (tasks 858 -> 1105: the n_e leg re-executed under the union)
        # before this form; results are bit-identical either way — the
        # same integers flow through the same arithmetic.
        row = (
            deg.agg(
                (F.coalesce(F.sum("deg"), F.lit(0)) / 2).cast("long").alias("n_e")
            )
            .crossJoin(surv.agg(F.count(F.lit(1)).alias("n_v")))
            .collect()[0]
        )
        n_v, n_e = int(row["n_v"]), int(row["n_e"])
        stat_rows.append((r, n_v, n_e))
        snapshots.append(surv.select(F.lit(r).alias("round"), "v"))
        surv = deg.where(
            F.col("deg") * F.lit(n_v) * DENSEST_DEN > F.lit(DENSEST_NUM) * F.lit(n_e)
        ).select("v")
    from sarpro_spark.localrel import local_relation

    stats = local_relation(
        edges.sparkSession, stat_rows, "round int, n_v long, n_e long"
    )
    dens = F.when(
        F.col("n_v") > 0, F.col("n_e").cast("double") / F.col("n_v")
    ).otherwise(F.lit(-1.0))
    from pyspark.sql.window import Window

    best = (
        stats.select("round", "n_v", "n_e", dens.alias("_d"))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.col("_d").desc(), F.col("round").asc())
            ),
        )
        .where(F.col("_rk") == 1)
    )
    members = snapshots[0]
    for leg in snapshots[1:]:
        members = members.unionByName(leg)
    best_set = members.join(
        F.broadcast(best.select("round")), "round"
    ).select("v")
    live_best = both.join(best_set, "v", "left_semi").join(
        best_set.select(F.col("v").alias("w")), "w", "left_semi"
    )
    deg_best = live_best.groupBy("v").agg(F.count(F.lit(1)).alias("deg_in_best"))
    return deg_best.crossJoin(F.broadcast(best)).select(
        "v",
        "deg_in_best",
        F.col("round").alias("best_round"),
        F.col("n_v").alias("n_vertices"),
        F.col("n_e").alias("n_edges"),
        fround(F.col("_d"), round_digits).alias("density"),
    )


def sql_densest_subgraph(
    edges_rel: str, rounds: int = DENSEST_ROUNDS
) -> str:
    """DuckDB twin of :func:`densest_subgraph` — the rounds unrolled as
    CTEs over a relation with (src, dst) columns."""
    parts = [
        f"""dg_e AS MATERIALIZED (
  SELECT DISTINCT LEAST(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS a,
                  GREATEST(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS b
  FROM {edges_rel}
  WHERE CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR)
)""",
        "dg_both AS MATERIALIZED (SELECT a AS v, b AS w FROM dg_e UNION ALL SELECT b, a FROM dg_e)",
        "dg_s0 AS MATERIALIZED (SELECT DISTINCT v FROM dg_both)",
    ]
    for r in range(rounds):
        parts.append(
            f"""dg_stat{r} AS MATERIALIZED (
  SELECT {r} AS round,
         (SELECT COUNT(*) FROM dg_s{r}) AS n_v,
         (SELECT COUNT(*) FROM dg_e e
          WHERE e.a IN (SELECT v FROM dg_s{r})
            AND e.b IN (SELECT v FROM dg_s{r})) AS n_e
)"""
        )
        parts.append(
            f"""dg_s{r + 1} AS MATERIALIZED (
  SELECT d.v FROM (
    SELECT b.v, COUNT(*) AS deg FROM dg_both b
    JOIN dg_s{r} s1 ON s1.v = b.v
    JOIN dg_s{r} s2 ON s2.v = b.w
    GROUP BY 1
  ) d, dg_stat{r} t
  WHERE d.deg * t.n_v * {DENSEST_DEN} > {DENSEST_NUM} * t.n_e
)"""
        )
    stats_union = " UNION ALL ".join(
        f"SELECT * FROM dg_stat{r}" for r in range(rounds)
    )
    members_union = " UNION ALL ".join(
        f"SELECT {r} AS round, v FROM dg_s{r}" for r in range(rounds)
    )
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes},
dg_stats AS ({stats_union}),
dg_best AS (
  SELECT round, n_v, n_e,
         CASE WHEN n_v > 0 THEN CAST(n_e AS DOUBLE) / n_v ELSE -1.0 END AS d
  FROM dg_stats
  ORDER BY CASE WHEN n_v > 0 THEN CAST(n_e AS DOUBLE) / n_v ELSE -1.0 END DESC,
           round ASC
  LIMIT 1
),
dg_members AS ({members_union}),
dg_bset AS (
  SELECT m.v FROM dg_members m JOIN dg_best b USING (round)
)
SELECT d.v, CAST(d.deg AS BIGINT) AS deg_in_best,
       CAST(b.round AS INTEGER) AS best_round,
       b.n_v AS n_vertices, b.n_e AS n_edges,
       (FLOOR(b.d * 1000000.0 + 0.5) / 1000000.0) AS density
FROM (
  SELECT bb.v, COUNT(*) AS deg FROM dg_both bb
  JOIN dg_bset s1 ON s1.v = bb.v
  JOIN dg_bset s2 ON s2.v = bb.w
  GROUP BY 1
) d, dg_best b
""".strip()

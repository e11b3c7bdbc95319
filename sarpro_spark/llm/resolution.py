"""Entity resolution: linked records -> golden entities (survivorship).

Completes the master-data pipeline the linkage operator starts
(llm/linkage.py finds match PAIRS; this module turns pairs into
ENTITIES): connected components over the match graph (reusing the
certified label-propagation machinery, llm/cluster.py) and per-entity
SURVIVORSHIP — one golden record per cluster with field-level merge
rules, the standard MDM shapes (Talburt, "Entity Resolution and
Information Quality", 2011):

  longest   canonical text = the longest value (ties: lexicographically
            greatest) — one max(struct(length, value)) aggregate.
  max       freshness fields (latest price, newest timestamp).
  majority  categorical fields = the modal value (ties: greatest) — a
            per-(cluster, value) count + one max(struct(cnt, value)).

Every rule is a plain aggregate over the cluster join — one shuffle on
cluster_id past the components step, no windows over the full corpus.
The DuckDB twin replicates components as a recursive min-label closure
and survivorship with identical deterministic tie-breaks, so cluster
formation AND merge rules are inside the value hash.

Scale shape at 100 TB: only match-pair members ride the component
iteration (the singleton majority joins back in one anti-join —
llm/cluster.py doctrine); survivorship is one keyed aggregate.

Reference analog: none (raster engine); built for the pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_entities(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str = "rid",
    a: str = "doc_a",
    b: str = "doc_b",
    name_col: str = "name",
    max_col: str = "price_cents",
    majority_col: str = "brand",
    src_col: str = "src",
) -> DataFrame:
    """(entity_id, n_members, n_mentions, canonical_name, latest_price,
    majority_<majority_col>) — one golden row per connected component of
    the match graph."""
    from sarpro_spark.llm.cluster import dedup_clusters

    clusters = dedup_clusters(
        records.select(F.col(id_col).alias("doc_id")),
        pairs.select(F.col(a).alias("doc_a"), F.col(b).alias("doc_b")),
    ).select(F.col("doc_id").alias(id_col), "cluster_id")
    base = records.join(clusters, id_col)
    golden = base.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum((F.col(src_col) == "mention").cast("long")).alias("n_mentions"),
        F.max(
            F.struct(F.length(name_col).alias("l"), F.col(name_col).alias("v"))
        )["v"].alias("canonical_name"),
        F.max(max_col).alias("latest_price"),
    )
    modal = (
        base.groupBy("cluster_id", majority_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("cluster_id")
        .agg(
            F.max(F.struct(F.col("_c"), F.col(majority_col).alias("v")))["v"].alias(
                f"majority_{majority_col}"
            )
        )
    )
    return golden.join(modal, "cluster_id").select(
        F.col("cluster_id").alias("entity_id"),
        "n_members",
        "n_mentions",
        "canonical_name",
        "latest_price",
        f"majority_{majority_col}",
    )


def sql_resolve_entities(
    records_sel: str,
    pairs_sel: str,
    id_col: str = "rid",
    majority_col: str = "brand",
) -> str:
    """DuckDB twin: recursive min-label closure + identical survivorship
    tie-breaks.  ``records_sel`` yields (rid, name, price_cents,
    <majority_col>, src); ``pairs_sel`` yields (a, b)."""
    return f"""
res_recs AS ({records_sel}),
res_edges0 AS ({pairs_sel}),
res_edges AS (SELECT a AS u, b AS v FROM res_edges0 UNION ALL SELECT b, a FROM res_edges0),
res_reach(node, lbl) AS (
  SELECT {id_col}, {id_col} FROM res_recs
  UNION
  SELECT e.v, r.lbl FROM res_reach r JOIN res_edges e ON e.u = r.node
),
res_cc AS (SELECT node AS {id_col}, MIN(lbl) AS cluster_id FROM res_reach GROUP BY node),
res_base AS (SELECT r.*, c.cluster_id FROM res_recs r JOIN res_cc c USING ({id_col})),
res_name AS (
  SELECT cluster_id, name AS canonical_name FROM (
    SELECT cluster_id, name,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY LENGTH(name) DESC, name DESC) AS rn
    FROM res_base
  ) WHERE rn = 1
),
res_modal AS (
  SELECT cluster_id, {majority_col} AS majority_{majority_col} FROM (
    SELECT cluster_id, {majority_col},
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY COUNT(*) DESC, {majority_col} DESC) AS rn
    FROM res_base GROUP BY cluster_id, {majority_col}
  ) WHERE rn = 1
),
res_golden AS (
  SELECT cluster_id,
         CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(CASE WHEN src = 'mention' THEN 1 ELSE 0 END) AS BIGINT) AS n_mentions,
         CAST(MAX(price_cents) AS BIGINT) AS latest_price
  FROM res_base GROUP BY cluster_id
)
""".strip()

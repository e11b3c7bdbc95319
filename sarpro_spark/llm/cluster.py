"""Connected components over near-duplicate pair graphs — the step that turns
pairwise dedup evidence into keep/drop decisions (cluster -> canonical doc).

Algorithm: min-label propagation to fixpoint. labels start as node ids; each
round every node takes the min label over itself + neighbors; converged when
no label changes. Rounds = graph diameter (tiny for dedup clusters: near-dup
components are dense blobs). Each round is one join + one groupBy — all
DataFrame ops, lineage cut with localCheckpoint so plans don't snowball.
This is the simple variant of the large-star/small-star map-reduce CC
algorithm; it is exactly as shuffle-bounded and converges in the same regime.

An iterative algorithm with a driver-side convergence scalar per round — the
documented exception pattern (the per-round collect is ONE long, not data).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checkpointer(df: DataFrame):
    """Reliable ``checkpoint()`` when the session has a checkpoint dir (cluster
    mode: survives executor loss — localCheckpoint blocks die with their
    executor and the truncated lineage cannot recompute them); eager
    ``localCheckpoint`` otherwise (single-node iteration speed)."""
    sc = df.sparkSession.sparkContext
    try:
        reliable = sc.getCheckpointDir() is not None
    except AttributeError:  # older pyspark
        reliable = sc._jsc.sc().getCheckpointDir().isDefined()
    if reliable:
        return lambda d: d.checkpoint(eager=True)
    return lambda d: d.localCheckpoint(eager=True)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
    check_every: int = 2,
) -> DataFrame:
    """Returns (id, cluster_id) with cluster_id = min node id in component.

    Per round: one join + one groupBy + one checkpoint job. The previous
    label rides through the aggregation (``min(lbl) FILTER own``), so the
    convergence probe is a narrow scan of the checkpointed labels — no join —
    and runs only every ``check_every`` rounds: ~1.5 jobs/round vs 3 in the
    naive form. Raises a warning if ``max_iter`` rounds pass without
    convergence (partial labels are still a valid over-segmentation, but the
    caller should know)."""
    checkpoint = _checkpointer(nodes)
    both = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    # the edge relation's lineage (e.g. a full near-dup pair computation) would
    # otherwise be re-executed on EVERY iteration — materialize it once
    both = checkpoint(both)
    labels = nodes.select(F.col(node_col).alias("u"), F.col(node_col).alias("lbl"))
    labels = checkpoint(labels)
    converged = False
    for i in range(1, max_iter + 1):
        msgs = both.join(labels, on="u").select(
            F.col("v").alias("u"), "lbl", F.lit(False).alias("own")
        )
        new_labels = (
            labels.withColumn("own", F.lit(True))
            .unionByName(msgs)
            .groupBy("u")
            .agg(
                F.min("lbl").alias("lbl"),
                F.min(F.when(F.col("own"), F.col("lbl"))).alias("prev"),
            )
        )
        new_labels = checkpoint(new_labels)
        if i % check_every == 0 or i == max_iter:
            if new_labels.where(F.col("lbl") < F.col("prev")).limit(1).count() == 0:
                labels = new_labels.select("u", "lbl")
                converged = True
                break
        labels = new_labels.select("u", "lbl")
    if not converged:
        warnings.warn(
            f"connected_components: no fixpoint after {max_iter} rounds — "
            "labels are an over-segmentation; raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("u").alias(node_col), F.col("lbl").alias("cluster_id"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a: str = "doc_a",
    b: str = "doc_b",
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical): cluster near-dup pairs, mark the
    min-id doc of each cluster canonical — drop the rest for a deduplicated
    corpus.

    Only nodes that appear in an edge ride the iteration: near-dup docs are a
    small fraction of any real corpus, so label propagation runs on the
    pair-connected subgraph (orders of magnitude smaller than the corpus at
    100 TB) and the singleton majority joins back in one anti-join with
    ``cluster_id = id``."""
    nodes = docs.select(F.col(id_col).alias("id"))
    # materialize the pair computation ONCE — it feeds the edge relation, the
    # label init, and the singleton anti-join, and is typically an expensive
    # LSH/verify pipeline that must not re-execute per consumer
    pairs = _checkpointer(pairs)(pairs.select(F.col(a).alias(a), F.col(b).alias(b)))
    edge_nodes = (
        pairs.select(F.col(a).alias("id"))
        .unionByName(pairs.select(F.col(b).alias("id")))
        .distinct()
    )
    cc = connected_components(edge_nodes, pairs, "id", a, b)
    singletons = nodes.join(edge_nodes, "id", "left_anti").select(
        "id", F.col("id").alias("cluster_id")
    )
    return cc.unionByName(singletons).select(
        F.col("id").alias(id_col),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
    )


def incremental_components(
    old_labels: DataFrame,
    new_nodes: DataFrame,
    delta_edges: DataFrame,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Incremental connected-components maintenance (r13): given the
    previous run's labels and ONLY the new edges/nodes, produce labels
    equal to a full recompute over the union graph — without touching the
    old edge set.

    The union-find contraction argument: map every delta-edge endpoint to
    its representative (its old cluster label; a new node represents
    itself), run components on the CONTRACTED graph — touched clusters +
    new nodes only, orders of magnitude smaller than the corpus — and
    compose.  Because the house labeling is min-node-id and min is
    associative, the composed label (min over merged clusters of their
    min ids) IS the full-recompute label, exactly: the certificate
    hashes equality against the full recompute, not a bound.

    At 100 TB this is the dedup-cluster lifecycle operator: a daily
    crawl delta re-clusters only the clusters it touches; untouched
    labels (the overwhelming majority) pass through by anti-join
    semantics (a left join + coalesce — no per-row recompute).

    Returns (id, cluster_id) over old ∪ new nodes.
    """
    rep_a = old_labels.select(
        F.col("id").alias(a), F.col("cluster_id").alias("_ra")
    )
    rep_b = old_labels.select(
        F.col("id").alias(b), F.col("cluster_id").alias("_rb")
    )
    contracted = (
        delta_edges.select(a, b)
        .join(rep_a, a, "left")
        .join(rep_b, b, "left")
        .select(
            F.coalesce(F.col("_ra"), F.col(a)).alias("a"),
            F.coalesce(F.col("_rb"), F.col(b)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    cnodes = (
        contracted.select(F.col("a").alias("id"))
        .unionByName(contracted.select(F.col("b").alias("id")))
        .distinct()
    )
    comp = connected_components(cnodes, contracted, "id", "a", "b").select(
        F.col("id").alias("_rep"), F.col("cluster_id").alias("_newlab")
    )
    out_old = (
        old_labels.join(comp, old_labels["cluster_id"] == comp["_rep"], "left")
        .select(
            "id", F.coalesce(F.col("_newlab"), F.col("cluster_id")).alias("cluster_id")
        )
    )
    out_new = (
        new_nodes.select("id")
        .join(comp, new_nodes["id"] == comp["_rep"], "left")
        .select("id", F.coalesce(F.col("_newlab"), F.col("id")).alias("cluster_id"))
    )
    return out_old.unionByName(out_new)


def sql_dedup_clusters(nodes_sel: str, edges_sel: str, prefix: str = "") -> str:
    """DuckDB twin via recursive CTE (min-reachable-label closure).
    ``nodes_sel`` yields (id); ``edges_sel`` yields (a, b).  ``prefix``
    (r13) namespaces the CTEs so one statement can instantiate several
    closures (e.g. the incremental-maintenance certificate's old + full
    graphs); the caller supplies WITH RECURSIVE when prefixed."""
    p = prefix
    body = f"""{p}nodes AS ({nodes_sel}),
{p}edges0 AS ({edges_sel}),
{p}edges AS (SELECT a AS u, b AS v FROM {p}edges0 UNION ALL SELECT b, a FROM {p}edges0),
{p}reach(node, lbl) AS (
  SELECT id, id FROM {p}nodes
  UNION
  SELECT e.v, r.lbl FROM {p}reach r JOIN {p}edges e ON e.u = r.node
)"""
    if prefix:
        return body
    return f"""
WITH RECURSIVE
{body}
SELECT node AS doc_id, MIN(lbl) AS cluster_id,
       (node = MIN(lbl)) AS is_canonical
FROM reach GROUP BY node
""".strip()

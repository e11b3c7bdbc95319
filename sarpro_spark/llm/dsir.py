"""DSIR — Data Selection via Importance Resampling (r13).

The pretraining-data selection operator of Xie et al. 2023 (NeurIPS,
"Data Selection for Language Models via Importance Resampling", public
paper): score every raw document by how much more likely its hashed
n-gram bag is under a TARGET corpus distribution than under the raw
corpus distribution, then sample without replacement with probability
proportional to the importance weight (Gumbel-top-k, the log-space
equivalent of the certified Efraimidis-Spirakis reservoir in
``llm/sampling.py`` — Vieira 2014's Gumbel-max trick, public note).

Determinism doctrine (what makes the DuckDB twin hash-match):

* features are md5-hashed unigram + bigram buckets — exact integer
  arithmetic on both engines (the `sampling.hash_bucket` chain);
* the per-bucket log-likelihood ratio is rounded to NANO-units and cast
  to BIGINT, so a document's log-weight is an EXACT integer dot product
  ``sum(c_db * r_nano_b)`` — no float association order anywhere in the
  hot sum (the integer-cents doctrine of ``operators/incremental.py``);
* the Gumbel perturbation comes from the seeded md5 uniform, and the
  final key is fround'd with id tiebreak, so libm ulp noise cannot flip
  membership (the A-ES key doctrine).

Scale shape (100 TB): the feature stream is one explode + one
map-side-combined groupBy per doc; the model is <= ``buckets`` rows
(2048 default) and BROADCASTS — fitting the two bag-of-ngrams LMs is two
aggregates over the same feature stream, nothing quadratic anywhere; the
resample is one global rank window over doc-count rows (k*log shape via
WindowGroupLimit).  Reference scope: the reference engine has no
data-selection surface — this is extension surface for the LLM-pipeline
matrix (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hashed feature-space size — the model table stays broadcast-sized forever
DSIR_BUCKETS = 2048
#: add-lambda smoothing mass per bucket
DSIR_SMOOTH = 0.5
NANO = 1_000_000_000


def _feat_bucket(feat: Column, seed: str, buckets: int) -> Column:
    """md5-hashed feature bucket in [0, buckets) — exact integer arithmetic
    on both engines (the `sampling.hash_bucket` chain, generalized to
    arbitrary strings and bucket counts)."""
    h = F.md5(F.concat(F.lit(seed), F.lit("|"), feat))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % buckets


def _sql_feat_bucket(feat_expr: str, seed: str, buckets: int) -> str:
    return (
        f"CAST(('0x' || SUBSTR(MD5('{seed}' || '|' || ({feat_expr})), 1, 15)) "
        f"AS BIGINT) % {buckets}"
    )


def hashed_ngram_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    seed: str = "dsir",
) -> DataFrame:
    """(id, bucket, c) — per-document hashed unigram+bigram bag counts.

    One projection builds the token array, one explode streams unigram and
    bigram features together (bigrams joined with a space, the paper's
    feature set), one map-side-combined groupBy produces the bag."""
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), t -> t <> '')"
    ).alias("_toks")
    grams = docs.select(F.col(id_col), toks).select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.col("_toks"),
                F.expr(
                    "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)),"
                    " (t, i) -> concat(t, ' ', element_at(_toks, i + 2)))"
                ),
            )
        ).alias("feat"),
    )
    return grams.select(
        F.col(id_col), _feat_bucket(F.col("feat"), seed, buckets).alias("bucket")
    ).groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("c"))


def bucket_logratio_nano(
    counts: DataFrame,
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    smooth: float = DSIR_SMOOTH,
) -> DataFrame:
    """(bucket, r_nano) — the per-bucket log-likelihood ratio
    ln p_target(b) - ln p_raw(b) under add-``smooth`` smoothing, rounded to
    integer NANO-units.  Only buckets observed in the raw corpus appear
    (a bucket absent from raw is absent from every document, so its ratio
    never multiplies a nonzero count).  The table is <= ``buckets`` rows:
    broadcast-sized at any corpus scale."""
    tgt_ids = docs.where(target_pred).select(id_col)
    raw_b = counts.groupBy("bucket").agg(F.sum("c").alias("cr"))
    tgt_b = (
        counts.join(tgt_ids, id_col, "left_semi")
        .groupBy("bucket")
        .agg(F.sum("c").alias("ct"))
    )
    n_raw = counts.agg(F.sum("c").alias("n_raw"))
    n_tgt = counts.join(tgt_ids, id_col, "left_semi").agg(
        F.sum("c").alias("n_tgt")
    )
    denom = smooth * buckets
    joined = (
        raw_b.join(tgt_b, "bucket", "left")
        .crossJoin(F.broadcast(n_raw))
        .crossJoin(F.broadcast(n_tgt))
    )
    r = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(smooth))
        / (F.col("n_tgt").cast("double") + F.lit(denom))
    ) - F.log(
        (F.col("cr").cast("double") + F.lit(smooth))
        / (F.col("n_raw").cast("double") + F.lit(denom))
    )
    return joined.select(
        "bucket",
        F.floor(r * NANO + F.lit(0.5)).cast("long").alias("r_nano"),
    )


def dsir_logweights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    seed: str = "dsir",
    smooth: float = DSIR_SMOOTH,
) -> DataFrame:
    """(id, logw_nano) — per-document importance log-weight as an EXACT
    integer dot product of the bag counts with the broadcast nano-unit
    ratio table.  ``logw = logw_nano / 1e9``."""
    counts = hashed_ngram_counts(docs, id_col, text_col, buckets, seed)
    ratios = bucket_logratio_nano(
        counts, docs, target_pred, id_col, buckets, smooth
    )
    return (
        counts.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("r_nano")).alias("logw_nano"))
    )


def dsir_resample(
    docs: DataFrame,
    target_pred: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    seed: str = "dsir",
    smooth: float = DSIR_SMOOTH,
    round_digits: int = 6,
) -> DataFrame:
    """Gumbel-top-k importance resample: (id, logw, gkey, rnk), the k docs
    whose perturbed log-weight ``logw + Gumbel(seeded md5 uniform)`` ranks
    highest — a without-replacement sample with inclusion odds
    proportional to exp(logw), reproducible across runs and engines."""
    from sarpro_spark.llm.sampling import BUCKETS as UBUCKETS
    from sarpro_spark.llm.sampling import hash_bucket
    from sarpro_spark.queries import fround

    lw = dsir_logweights(
        docs, target_pred, id_col, text_col, buckets, seed, smooth
    )
    u = (
        hash_bucket(F.col(id_col), seed + "-g").cast("double") + F.lit(0.5)
    ) / float(UBUCKETS)
    gumbel = -F.log(-F.log(u))
    key = fround(
        F.col("logw_nano").cast("double") / NANO + gumbel, round_digits
    )
    # top-k FIRST (TakeOrderedAndProject: per-partition heaps, k rows move),
    # THEN attach ranks with a window over the <=k survivors — the blessed
    # global-top-k shape (a bare global rank window would sort every row in
    # one task)
    top = (
        lw.select(
            F.col(id_col),
            fround(F.col("logw_nano").cast("double") / NANO, round_digits).alias(
                "logw"
            ),
            key.alias("gkey"),
        )
        .orderBy(F.col("gkey").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("gkey").desc(), F.col(id_col).asc())
    return top.withColumn("rnk", F.row_number().over(w))


# --- DuckDB twins --------------------------------------------------------------


def sql_dsir_ctes(
    docs_rel: str,
    target_where: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    seed: str = "dsir",
    smooth: float = DSIR_SMOOTH,
) -> str:
    """CTE chain ``ds_counts`` / ``ds_ratio`` / ``ds_logw`` — the exact
    twin of the Spark pipeline (same md5 buckets, same nano-unit integer
    ratio, same integer dot product)."""
    bkt = _sql_feat_bucket("feat", seed, buckets)
    denom = smooth * buckets
    return f"""ds_toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(LOWER({text_col}), '[^a-z0-9]+'),
                     t -> t <> '') AS toks
  FROM {docs_rel}
),
ds_feats AS (
  SELECT {id_col}, UNNEST(list_concat(
    toks,
    list_transform(range(1, GREATEST(len(toks), 1)),
                   i -> toks[i] || ' ' || toks[i + 1])
  )) AS feat
  FROM ds_toks
),
ds_counts AS MATERIALIZED (
  SELECT {id_col}, {bkt} AS bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM ds_feats GROUP BY 1, 2
),
ds_tgt_ids AS (SELECT {id_col} FROM {docs_rel} WHERE {target_where}),
ds_raw_b AS (SELECT bucket, SUM(c) AS cr FROM ds_counts GROUP BY 1),
ds_tgt_b AS (
  SELECT bucket, SUM(c) AS ct FROM ds_counts
  WHERE {id_col} IN (SELECT {id_col} FROM ds_tgt_ids) GROUP BY 1
),
ds_totals AS (
  SELECT (SELECT SUM(c) FROM ds_counts) AS n_raw,
         (SELECT SUM(c) FROM ds_counts
          WHERE {id_col} IN (SELECT {id_col} FROM ds_tgt_ids)) AS n_tgt
),
ds_ratio AS MATERIALIZED (
  SELECT r.bucket,
         CAST(FLOOR((LN((COALESCE(t.ct, 0) + {smooth!r}) / (tt.n_tgt + {denom!r}))
                   - LN((r.cr + {smooth!r}) / (tt.n_raw + {denom!r}))) * 1e9 + 0.5)
              AS BIGINT) AS r_nano
  FROM ds_raw_b r LEFT JOIN ds_tgt_b t USING (bucket), ds_totals tt
),
ds_logw AS MATERIALIZED (
  SELECT c.{id_col}, SUM(c.c * r.r_nano) AS logw_nano
  FROM ds_counts c JOIN ds_ratio r USING (bucket)
  GROUP BY 1
)"""


def sql_dsir_resample(
    docs_rel: str,
    target_where: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    seed: str = "dsir",
    smooth: float = DSIR_SMOOTH,
) -> str:
    """DuckDB twin of :func:`dsir_resample` (same key chain)."""
    from sarpro_spark.llm.sampling import BUCKETS as UBUCKETS
    from sarpro_spark.llm.sampling import sql_hash_bucket
    from sarpro_spark.queries import sql_fround

    u = f"((({sql_hash_bucket(id_col, seed + '-g')}) + 0.5) / {float(UBUCKETS)!r})"
    key = sql_fround(
        f"CAST(logw_nano AS DOUBLE) / 1e9 + (-LN(-LN({u})))"
    )
    logw = sql_fround("CAST(logw_nano AS DOUBLE) / 1e9")
    return f"""
WITH {sql_dsir_ctes(docs_rel, target_where, id_col, text_col, buckets, seed, smooth)}
SELECT {id_col}, logw, gkey, rnk FROM (
  SELECT {id_col}, {logw} AS logw, {key} AS gkey,
         ROW_NUMBER() OVER (ORDER BY {key} DESC, {id_col} ASC) AS rnk
  FROM ds_logw
) t WHERE rnk <= {k}
""".strip()

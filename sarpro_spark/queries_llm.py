"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal — the training-data operators over documents/embeddings
(BASELINE.json north star; first-class alongside SURVEY §2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sarpro_spark import frames
from sarpro_spark.llm import cluster as cl
from sarpro_spark.llm import dedup as dd
from sarpro_spark.llm import multimodal as mm
from sarpro_spark.llm import similarity as sim
from sarpro_spark.llm import text as tx
from sarpro_spark.queries import fround, query, sql_fround


# --- exact dedup -------------------------------------------------------------

_EXACT_DEDUP_SQL = """
SELECT MD5(text) AS h, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
FROM documents GROUP BY MD5(text)
""".strip()


@query("dedup_exact", sql=_EXACT_DEDUP_SQL, tags=("llm", "dedup"))
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy, canonical = min id. One shuffle."""
    d = frames.load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(d)


_EXACT_NORM_SQL = r"""
SELECT MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS h,
       MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""".strip()


@query("dedup_exact_normalized", sql=_EXACT_NORM_SQL, tags=("llm", "dedup"))
def q_dedup_exact_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-tolerant exact dedup: lowercase/trim/whitespace-collapse
    before hashing — catches re-encoded and re-wrapped copies byte-hashing
    misses (the standard first pass of a corpus dedup pipeline)."""
    d = frames.load_table(spark, sf_dir, "documents")
    return dd.exact_dedup_normalized(d)


# --- n-gram Jaccard near-dup -------------------------------------------------

_JACCARD_SQL = dd.sql_ngram_jaccard("documents", threshold=0.5)


@query("dedup_ngram_jaccard", sql=_JACCARD_SQL, tags=("llm", "dedup"))
def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup: DF-capped candidate generation + exact
    verification on candidates only (the hot-shingle df^2 explosion never
    happens; jaccard values stay exact)."""
    d = frames.load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(d, threshold=0.5)


# --- MinHash signatures + LSH candidates -------------------------------------

_MINHASH_SQL = f"""
WITH {dd.sql_minhash_ctes('documents')}
SELECT * FROM sigs
""".strip()


@query("dedup_minhash_signatures", sql=_MINHASH_SQL, tags=("llm", "dedup"))
def q_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 md5-family hashes over 5-gram shingles) —
    byte-identical across engines by construction."""
    d = frames.load_table(spark, sf_dir, "documents")
    return dd.minhash_signatures(d)


_LSH_SQL = f"""
WITH {dd.sql_minhash_ctes('documents')},
banded AS (
  SELECT doc_id, 0 AS band, MD5(sig_0 || '|' || sig_1 || '|' || sig_2 || '|' || sig_3) AS bucket FROM sigs
  UNION ALL
  SELECT doc_id, 1 AS band, MD5(sig_4 || '|' || sig_5 || '|' || sig_6 || '|' || sig_7) AS bucket FROM sigs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
  CAST((CASE WHEN sa.sig_0 = sb.sig_0 THEN 1 ELSE 0 END) + (CASE WHEN sa.sig_1 = sb.sig_1 THEN 1 ELSE 0 END)
     + (CASE WHEN sa.sig_2 = sb.sig_2 THEN 1 ELSE 0 END) + (CASE WHEN sa.sig_3 = sb.sig_3 THEN 1 ELSE 0 END)
     + (CASE WHEN sa.sig_4 = sb.sig_4 THEN 1 ELSE 0 END) + (CASE WHEN sa.sig_5 = sb.sig_5 THEN 1 ELSE 0 END)
     + (CASE WHEN sa.sig_6 = sb.sig_6 THEN 1 ELSE 0 END) + (CASE WHEN sa.sig_7 = sb.sig_7 THEN 1 ELSE 0 END)
     AS DOUBLE) / 8.0 AS est_sim
FROM cand c
JOIN sigs sa ON sa.doc_id = c.doc_a
JOIN sigs sb ON sb.doc_id = c.doc_b
""".strip()


@query("dedup_minhash_lsh", sql=_LSH_SQL, tags=("llm", "dedup"))
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH: band-bucket join produces candidates (bucket join, never
    all-pairs); est_sim = minhash agreement fraction."""
    d = frames.load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(d)


# --- SimHash -----------------------------------------------------------------

_SIMHASH_SQL = f"""
WITH {dd.sql_simhash16('documents')}
""".strip().replace("WITH WITH", "WITH")


@query("dedup_simhash", sql=_SIMHASH_SQL, tags=("llm", "dedup"))
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints (hex-nibble bit extraction, portable)."""
    d = frames.load_table(spark, sf_dir, "documents")
    return dd.simhash16(d)


_SIMHASH_PAIRS_SQL = dd.sql_simhash_neardup("documents")


@query("dedup_simhash_pairs", sql=_SIMHASH_PAIRS_SQL, tags=("llm", "dedup"))
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS: 60-bit fingerprint, 4 bands x 15-bit keys
    (32768 buckets/band — no small-keyspace ceiling; pigeonhole: 100% recall
    within hamming<=3), exact Hamming verify — completes the SimHash dedup
    story beyond fingerprints."""
    d = frames.load_table(spark, sf_dir, "documents")
    return dd.simhash_neardup_pairs(d)


# --- similarity search -------------------------------------------------------

_QUERY_SEL = "SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5"


def _spark_queries_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = frames.load_table(spark, sf_dir, "embeddings")
    return e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


_TOPK_SQL = f"""
WITH {sim.sql_cosine_ctes('embeddings', _QUERY_SEL)},
ranked AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= 10
""".strip()


@query("similarity_topk_bruteforce", sql=_TOPK_SQL, tags=("llm", "similarity"))
def q_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors: queries broadcast, dot product
    as array-order aggregate (JVM, no Python), per-query rank window."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk(e, _spark_queries_frame(spark, sf_dir), k=10)


# IVF-flat ANN: sampled centroids (vec_id < 16), nprobe=2. The centroid-
# assignment scores and the query scores are two instantiations of the same
# fround'd cosine CTE (multiplication commutes bit-exactly, so assignment
# scores equal Spark's operand order).
_IVF_K, _IVF_NPROBE = 16, 2


def _topk_ivf_sql(nprobe: int = _IVF_NPROBE, kc: int = _IVF_K, nq: int = 5) -> str:
    """IVF top-5 oracle, parameterized by nprobe / centroid count / query
    count (r9: the recall sweep instantiates nprobe 1/2/4 at kc=64 over 20
    queries — each instantiation is its own parenthesized WITH subquery, so
    CTE names never collide)."""
    qsel = f"SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {nq}"
    return f"""
WITH {sim.sql_cosine_ctes('embeddings', qsel)},
{sim.sql_cosine_ctes('embeddings',
                     f'SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {kc}',
                     prefix='c_')},
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT cs.vec_id, cs.query_id AS centroid_id,
           ROW_NUMBER() OVER (PARTITION BY cs.vec_id ORDER BY cs.sim DESC, cs.query_id) AS rnk
    FROM c_scored cs
  ) WHERE rnk = 1
),
probed AS (
  SELECT query_id, centroid_id FROM (
    SELECT cs.vec_id AS query_id, cs.query_id AS centroid_id,
           ROW_NUMBER() OVER (PARTITION BY cs.vec_id ORDER BY cs.sim DESC, cs.query_id) AS rnk
    FROM c_scored cs WHERE cs.vec_id < {nq}
  ) WHERE rnk <= {nprobe}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id FROM probed p JOIN assign a USING (centroid_id)
),
filtered AS (
  SELECT s.query_id, s.vec_id, s.sim FROM scored s JOIN cand USING (query_id, vec_id)
),
ranked AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
  FROM filtered
)
SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= 5
""".strip()


_TOPK_IVF_SQL = _topk_ivf_sql()


@query("similarity_topk_ivf", sql=_TOPK_IVF_SQL, tags=("llm", "similarity"))
def q_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: corpus partitioned into inverted lists by nearest
    centroid (deterministic sampled centroids; swap for k-means at
    production), queries probe their nprobe nearest lists, exact cosine on
    the probed lists only — per-query work ~ corpus/n_centroids * nprobe."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_ivf(
        e, _spark_queries_frame(spark, sf_dir), k=5,
        n_centroids=_IVF_K, nprobe=_IVF_NPROBE,
    )


# ANN LSH parameters for the certified queries (pinned so the oracles are
# reproducible): 8 bands x 12 bits = 32768 bucket keys for top-k (multi-probe
# Hamming-1 on the query side), 16 bands x 8 bits = 4096 keys for near-dup
# pairs at the data's low-sim regime. Hot buckets capped at 256 members.
_TOPK_BANDS, _TOPK_BITS = 8, 12
_ND_BANDS, _ND_BITS = 16, 8
_BUCKET_CAP = 256
_EMB_DIM = 64

def _topk_lsh_sql(probe: int = 1, nq: int = 5) -> str:
    """LSH top-5 oracle, parameterized by query-side multi-probe depth and
    query count (r9: the recall sweep instantiates probe 0/1/2 over 20
    queries)."""
    qsel = f"SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {nq}"
    return f"""
WITH {sim.sql_cosine_ctes('embeddings', qsel)},
{sim.sql_band_key_ctes('embeddings', 'vec_id', 'embedding', _TOPK_BANDS, _TOPK_BITS,
                       _EMB_DIM, prefix='c_', bucket_cap=_BUCKET_CAP)},
{sim.sql_band_key_ctes(f'({qsel.replace("embedding AS qvec", "embedding")})',
                       'query_id', 'embedding', _TOPK_BANDS, _TOPK_BITS,
                       _EMB_DIM, prefix='q_', probe=probe)},
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id
  FROM c_keys c JOIN q_keys q USING (bkey)
),
filtered AS (
  SELECT s.query_id, s.vec_id, s.sim
  FROM scored s JOIN cand USING (query_id, vec_id)
),
ranked AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
  FROM filtered
)
SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= 5
""".strip()


_TOPK_LSH_SQL = _topk_lsh_sql()


@query("similarity_topk_lsh", sql=_TOPK_LSH_SQL, tags=("llm", "similarity"))
def q_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded random-hyperplane ANN (8 bands x 12 bits, Hamming-1 multi-probe,
    hot-bucket cap): candidates from any shared band key, exact cosine on the
    candidate set only — key space 8*2^12, never a fixed bucket ceiling."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_lsh(
        e, _spark_queries_frame(spark, sf_dir), k=5,
        bands=_TOPK_BANDS, band_bits=_TOPK_BITS, dim=_EMB_DIM,
        probe=1, bucket_cap=_BUCKET_CAP,
    )


# ANN recall@k certificate: the approximate indexes measured against the
# exact ground truth, as data. The oracle nests the three certified top-k
# statements verbatim as subqueries (each keeps its own WITH scope — no CTE
# prefix collisions), so the recall numbers are derived from the SAME
# machinery the individual certificates pin.
_RECALL_SQL = f"""
WITH truth AS (SELECT query_id, vec_id FROM ({_TOPK_SQL}) b WHERE rnk <= 5),
ivf AS (SELECT query_id, vec_id FROM ({_TOPK_IVF_SQL}) v),
lsh AS (SELECT query_id, vec_id FROM ({_TOPK_LSH_SQL}) l)
SELECT t.query_id,
       CAST(COUNT(iv.vec_id) AS BIGINT) AS ivf_hits,
       (COUNT(iv.vec_id) / 5.0) AS ivf_recall_at_5,
       CAST(COUNT(ls.vec_id) AS BIGINT) AS lsh_hits,
       (COUNT(ls.vec_id) / 5.0) AS lsh_recall_at_5
FROM truth t
LEFT JOIN ivf iv ON t.query_id = iv.query_id AND t.vec_id = iv.vec_id
LEFT JOIN lsh ls ON t.query_id = ls.query_id AND t.vec_id = ls.vec_id
GROUP BY t.query_id
""".strip()


@query("ann_recall_at_k", sql=_RECALL_SQL, tags=("llm", "similarity", "quality"))
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality certificate: per-query recall@5 of the IVF and LSH
    indexes against the exact brute-force top-5 — the accuracy/cost
    trade-off of the approximate paths measured as data, not asserted in
    prose. All three branches run with the same pinned parameters as their
    individual certificates; the recall division by the literal 5.0 is the
    identical IEEE op in both engines, so the numbers value-hash.

    Expected values on THIS fixture: IVF 0.8-1.0, LSH 0.2-0.4. The testdata
    embeddings are random vectors — true top-5 cosines sit at ~0.3-0.5,
    barely above random pairs, so angular-LSH buckets are close to
    uncorrelated with rank order (the regime where hyperplane LSH is known
    to degrade), while IVF still wins because probing nprobe/n_centroids of
    the corpus uses the same cosine measure as the truth. On a real
    embedding corpus (tight near-dup clusters) the LSH numbers rise with
    cluster tightness, and the bands/band_bits/probe knobs trade recall
    against candidate volume; this certificate is the instrument that
    makes that tuning measurable."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    q = _spark_queries_frame(spark, sf_dir)
    truth = sim.cosine_topk(e, q, k=5).select("query_id", "vec_id")
    ivf = sim.cosine_topk_ivf(
        e, q, k=5, n_centroids=_IVF_K, nprobe=_IVF_NPROBE
    ).select(F.col("query_id").alias("iv_qid"), F.col("vec_id").alias("iv_vec_id"))
    lsh = sim.cosine_topk_lsh(
        e, q, k=5, bands=_TOPK_BANDS, band_bits=_TOPK_BITS, dim=_EMB_DIM,
        probe=1, bucket_cap=_BUCKET_CAP,
    ).select(F.col("query_id").alias("ls_qid"), F.col("vec_id").alias("ls_vec_id"))
    return (
        truth.join(
            ivf,
            (F.col("query_id") == F.col("iv_qid")) & (F.col("vec_id") == F.col("iv_vec_id")),
            "left",
        )
        .join(
            lsh,
            (F.col("query_id") == F.col("ls_qid")) & (F.col("vec_id") == F.col("ls_vec_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("iv_vec_id").alias("ivf_hits"),
            (F.count("iv_vec_id") / 5.0).alias("ivf_recall_at_5"),
            F.count("ls_vec_id").alias("lsh_hits"),
            (F.count("ls_vec_id") / 5.0).alias("lsh_recall_at_5"),
        )
    )


# sweep parameters: 20 queries (100 truth pairs — the 5-query slice is too
# noisy to rank configurations), LSH probe radius 0/1/2 at the pinned
# 8x12-bit bands, IVF at 64 sampled centroids so nprobe has room to matter
# (at the certified 16-centroid setting nprobe=1 already probes 1/16 of
# the corpus and recall saturates)
_MP_NQ, _MP_IVF_K = 20, 64


def _mp_truth_sql() -> str:
    qsel = f"SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {_MP_NQ}"
    return f"""
WITH {sim.sql_cosine_ctes('embeddings', qsel)},
ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id FROM ranked WHERE rnk <= 5
""".strip()


_RECALL_MP_SQL = f"""
WITH truth AS (SELECT query_id, vec_id FROM ({_mp_truth_sql()}) b),
l0 AS (SELECT query_id, vec_id FROM ({_topk_lsh_sql(probe=0, nq=_MP_NQ)}) x),
l1 AS (SELECT query_id, vec_id FROM ({_topk_lsh_sql(probe=1, nq=_MP_NQ)}) x),
l2 AS (SELECT query_id, vec_id FROM ({_topk_lsh_sql(probe=2, nq=_MP_NQ)}) x),
i1 AS (SELECT query_id, vec_id FROM ({_topk_ivf_sql(nprobe=1, kc=_MP_IVF_K, nq=_MP_NQ)}) x),
i2 AS (SELECT query_id, vec_id FROM ({_topk_ivf_sql(nprobe=2, kc=_MP_IVF_K, nq=_MP_NQ)}) x),
i4 AS (SELECT query_id, vec_id FROM ({_topk_ivf_sql(nprobe=4, kc=_MP_IVF_K, nq=_MP_NQ)}) x)
SELECT t.query_id,
       CAST(COUNT(l0.vec_id) AS BIGINT) AS lsh_hits_p0,
       CAST(COUNT(l1.vec_id) AS BIGINT) AS lsh_hits_p1,
       CAST(COUNT(l2.vec_id) AS BIGINT) AS lsh_hits_p2,
       CAST(COUNT(i1.vec_id) AS BIGINT) AS ivf_hits_np1,
       CAST(COUNT(i2.vec_id) AS BIGINT) AS ivf_hits_np2,
       CAST(COUNT(i4.vec_id) AS BIGINT) AS ivf_hits_np4
FROM truth t
LEFT JOIN l0 ON t.query_id = l0.query_id AND t.vec_id = l0.vec_id
LEFT JOIN l1 ON t.query_id = l1.query_id AND t.vec_id = l1.vec_id
LEFT JOIN l2 ON t.query_id = l2.query_id AND t.vec_id = l2.vec_id
LEFT JOIN i1 ON t.query_id = i1.query_id AND t.vec_id = i1.vec_id
LEFT JOIN i2 ON t.query_id = i2.query_id AND t.vec_id = i2.vec_id
LEFT JOIN i4 ON t.query_id = i4.query_id AND t.vec_id = i4.vec_id
GROUP BY t.query_id
""".strip()


@query("ann_recall_multiprobe", sql=_RECALL_MP_SQL, tags=("llm", "similarity", "quality"))
def q_ann_recall_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 ANN recall SWEEP (r8 verdict item 8): per-query recall@5 hit
    counts for LSH at multi-probe radius 0 / 1 / 2 (Hamming ball of each
    band key — r9 adds the Hamming-2 ball to band_keys_udf and its SQL
    twin) and IVF at nprobe 1 / 2 / 4 over 64 centroids — the
    accuracy/cost frontier of both approximate paths as hashed data.
    Candidate sets are monotone in both knobs (probing only ADDS
    keys/lists, and recall@5 from a candidate SUPERSET can never drop: a
    candidate outscoring a true top-5 member would itself be in the truth
    set), so the hit columns are provably non-decreasing left to right
    within each family — asserted as a test invariant and visible in the
    certificate rows. Measured on this random-vector fixture (the
    documented hard regime for angular LSH): LSH 0.22 -> 0.31 -> 0.52 as
    the probe ball widens — multi-probe lifts the r7-documented 0.2-0.4
    floor at zero index cost (13x / 79x query-side keys per band at 12
    bits); IVF 0.72 -> 0.83 -> 0.87 as nprobe scans 1/64 -> 1/16 of the
    inverted lists."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < _MP_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    truth = sim.cosine_topk(e, q, k=5).select("query_id", "vec_id")
    variants: list[tuple[str, DataFrame]] = [
        ("lsh_hits_p0", sim.cosine_topk_lsh(
            e, q, k=5, bands=_TOPK_BANDS, band_bits=_TOPK_BITS, dim=_EMB_DIM,
            probe=0, bucket_cap=_BUCKET_CAP)),
        ("lsh_hits_p1", sim.cosine_topk_lsh(
            e, q, k=5, bands=_TOPK_BANDS, band_bits=_TOPK_BITS, dim=_EMB_DIM,
            probe=1, bucket_cap=_BUCKET_CAP)),
        ("lsh_hits_p2", sim.cosine_topk_lsh(
            e, q, k=5, bands=_TOPK_BANDS, band_bits=_TOPK_BITS, dim=_EMB_DIM,
            probe=2, bucket_cap=_BUCKET_CAP)),
        ("ivf_hits_np1", sim.cosine_topk_ivf(e, q, k=5, n_centroids=_MP_IVF_K, nprobe=1)),
        ("ivf_hits_np2", sim.cosine_topk_ivf(e, q, k=5, n_centroids=_MP_IVF_K, nprobe=2)),
        ("ivf_hits_np4", sim.cosine_topk_ivf(e, q, k=5, n_centroids=_MP_IVF_K, nprobe=4)),
    ]
    out = truth
    aggs = []
    for name, df in variants:
        side = df.select(
            F.col("query_id").alias(f"{name}_qid"), F.col("vec_id").alias(f"{name}_vid")
        )
        out = out.join(
            side,
            (F.col("query_id") == F.col(f"{name}_qid"))
            & (F.col("vec_id") == F.col(f"{name}_vid")),
            "left",
        )
        aggs.append(F.count(f"{name}_vid").alias(name))
    return out.groupBy("query_id").agg(*aggs)


_NEARDUP_EMB_SQL = f"""
WITH {sim.sql_band_key_ctes('embeddings', 'vec_id', 'embedding', _ND_BANDS, _ND_BITS,
                            _EMB_DIM, prefix='n_', bucket_cap=_BUCKET_CAP)},
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM n_keys a JOIN n_keys b USING (bkey)
  WHERE a.vec_id < b.vec_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT c.id_a, c.id_b, ea.embedding AS va, eb.embedding AS vb
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
),
dots AS (
  SELECT id_a, id_b,
         SUM(CAST(x.x AS DOUBLE) * CAST(y.x AS DOUBLE)) AS dp,
         SQRT(SUM(CAST(x.x AS DOUBLE) * CAST(x.x AS DOUBLE))) AS na,
         SQRT(SUM(CAST(y.x AS DOUBLE) * CAST(y.x AS DOUBLE))) AS nb
  FROM pairs p,
       LATERAL (SELECT UNNEST(p.va) AS x, GENERATE_SUBSCRIPTS(p.va, 1) AS i) x,
       LATERAL (SELECT UNNEST(p.vb) AS x, GENERATE_SUBSCRIPTS(p.vb, 1) AS i) y
  WHERE x.i = y.i
  GROUP BY id_a, id_b
)
SELECT id_a, id_b, (FLOOR((dp / (na * nb)) * 1000000.0 + 0.5) / 1000000.0) AS sim
FROM dots
WHERE (FLOOR((dp / (na * nb)) * 1000000.0 + 0.5) / 1000000.0) >= 0.35
""".strip()


@query("dedup_embedding_cosine", sql=_NEARDUP_EMB_SQL, tags=("llm", "dedup", "similarity"))
def q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded-hyperplane LSH candidates
    (16 bands x 8 bits, hot-bucket cap) + exact cosine verify >= threshold —
    candidates-then-verify, never all-pairs."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.embedding_neardup_pairs(
        e, threshold=0.35, bands=_ND_BANDS, band_bits=_ND_BITS,
        dim=_EMB_DIM, bucket_cap=_BUCKET_CAP,
    )


# --- text analysis -----------------------------------------------------------

_LANG_ID_SQL = f"""
SELECT doc_id, lang AS labeled_lang, {tx.sql_lang_id('text')} AS predicted_lang
FROM documents
""".strip()


@query("text_lang_id", sql=_LANG_ID_SQL, tags=("llm", "text"))
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-lexicon language ID (argmax with alphabetical tiebreak,
    'und' when zero hits) — pure string expressions."""
    d = frames.load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        tx.lang_id_expr(F.col("text")).alias("predicted_lang"),
    )


_TOKENS_SQL = """
SELECT doc_id,
  LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> '')) AS n_tokens,
  LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_ish,
  LENGTH(text) AS n_chars
FROM documents
""".strip()


@query("text_token_stats", sql=_TOKENS_SQL, tags=("llm", "text"))
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace/punct tokens + BPE-ish regex pieces."""
    d = frames.load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("n_tokens"),
        tx.bpe_ish_count(F.col("text")).alias("n_bpe_ish"),
        F.length("text").alias("n_chars"),
    )


_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id, text, LOWER(text) AS lt, (' ' || LOWER(text) || ' ') AS pt,
         LENGTH(text) AS n_chars,
         LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> '')) AS n_tok
  FROM documents
),
feat AS (
  SELECT doc_id, n_chars AS q_chars, n_tok AS q_tokens,
    CASE WHEN n_tok > 0 THEN CAST(LEN(REGEXP_REPLACE(lt, '[^a-z0-9]', '', 'g')) AS DOUBLE) / n_tok ELSE 0.0 END AS mean_tok_len,
    CAST(LENGTH(REGEXP_REPLACE(lt, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / GREATEST(n_chars, 1) AS punct_ratio,
    CAST(LENGTH(REGEXP_REPLACE(lt, '[^0-9]', '', 'g')) AS DOUBLE) / GREATEST(n_chars, 1) AS digit_ratio,
    CAST({' + '.join(tx.sql_count_word('pt', w) for w in tx.LANG_STOPWORDS['en'])} AS DOUBLE)
      / GREATEST(n_tok, 1) AS stop_ratio
  FROM base
)
SELECT doc_id, q_chars, q_tokens,
  {sql_fround('mean_tok_len')} AS q_mean_tok_len,
  {sql_fround('punct_ratio')} AS q_punct_ratio,
  {sql_fround('digit_ratio')} AS q_digit_ratio,
  {sql_fround('stop_ratio')} AS q_stop_ratio,
  {sql_fround(
      "LEAST(CAST(q_tokens AS DOUBLE)/50.0, 1.0)*0.4 + (1.0 - LEAST(punct_ratio*5.0, 1.0))*0.2"
      " + LEAST(stop_ratio*4.0, 1.0)*0.2"
      " + (CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 8.0 THEN 1.0 ELSE 0.0 END)*0.2"
  )} AS q_score
FROM feat
""".strip()


@query("text_quality", sql=_QUALITY_SQL, tags=("llm", "text"))
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/token/punct/digit/stopword features + composite
    score — pure expressions, scan-parallel."""
    d = frames.load_table(spark, sf_dir, "documents")
    out = tx.quality_features(d)
    return out.select(
        "doc_id", "q_chars", "q_tokens", "q_mean_tok_len", "q_punct_ratio",
        "q_digit_ratio", "q_stop_ratio", "q_score",
    )


_FINGERPRINT_SQL = """
SELECT doc_id,
       SUBSTR(MD5(REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g')), 1, 16) AS fingerprint
FROM documents
""".strip()

_WINNOW_SQL = f"WITH {tx.sql_winnowing('documents')}"


@query("text_winnowing", sql=_WINNOW_SQL, tags=("llm", "text", "fingerprint"))
def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (rolling polynomial k-gram hash + min-in-window
    selection): any shared substring of length >= window+k-1 across documents
    is guaranteed to share a fingerprint — the local-similarity counterpart
    of the whole-document fingerprint."""
    d = frames.load_table(spark, sf_dir, "documents")
    return tx.winnowing_fingerprints(d)


@query("text_fingerprint", sql=_FINGERPRINT_SQL, tags=("llm", "text"))
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized text (join-key
    content identity)."""
    d = frames.load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.fingerprint_expr(F.col("text")).alias("fingerprint"))


# --- BPE tokenizer-vocabulary training ---------------------------------------

_BPE_MERGES = 12


def _bpe_sql() -> str:
    from sarpro_spark.llm.bpe import sql_bpe_train

    return sql_bpe_train("documents", n_merges=_BPE_MERGES)


@query("bpe_vocab_train", sql=_bpe_sql(), tags=("llm", "text", "tokenizer", "iterative"))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary training: one corpus shuffle builds the
    Zipf-small distinct-word frequency table, then each merge is one small
    aggregation job whose winning pair (a 1-row model-state collect, the
    k-means-probe exception) rewrites the word table via replace expressions
    with Python-str.replace semantics shared by both engines. Oracle = the
    identical iteration unrolled as a CTE chain."""
    from sarpro_spark.llm.bpe import bpe_train

    d = frames.load_table(spark, sf_dir, "documents")
    return bpe_train(d, n_merges=_BPE_MERGES)


def _bpe_encode_sql() -> str:
    from sarpro_spark.llm.bpe import sql_bpe_encode

    return sql_bpe_encode("documents", n_merges=_BPE_MERGES)


@query("bpe_encode_corpus", sql=_bpe_encode_sql(), tags=("llm", "text", "tokenizer"))
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE apply: tokenize the corpus with the trained merges. Tokenization
    runs once per DISTINCT word (the training-side Zipf leverage) and joins
    back to the per-doc word list; output is per-doc token statistics — the
    compression signal a data pipeline budgets with."""
    from sarpro_spark.llm.bpe import bpe_encode_stats, bpe_train

    d = frames.load_table(spark, sf_dir, "documents")
    merges = bpe_train(d, n_merges=_BPE_MERGES)
    return bpe_encode_stats(d, merges)


# --- multimodal --------------------------------------------------------------

_MM_META_SQL = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image/png' WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
  CAST(doc_id % 64 + 16 AS INTEGER) AS width,
  CAST(doc_id % 48 + 16 AS INTEGER) AS height,
  CAST(STRLEN(text) AS INTEGER) AS n_bytes
FROM documents
""".strip()


@query("multimodal_metadata", sql=_MM_META_SQL, tags=("llm", "multimodal"))
def q_mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal columns: binary payload + typed metadata struct; metadata-
    only queries prune to the struct columns (payload never read)."""
    d = frames.load_table(spark, sf_dir, "documents")
    b = mm.attach_binary_payload(d)
    return b.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


# --- LSH-candidates + exact-verify near-dup pairs ----------------------------

_MINHASH_VERIFIED_SQL = dd.sql_minhash_jaccard("documents", threshold=0.5)


@query("dedup_minhash_verified", sql=_MINHASH_VERIFIED_SQL, tags=("llm", "dedup"))
def q_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup pipeline: MinHash-LSH banded candidates ->
    exact jaccard verified on candidates only — bucket-bounded candidate cost
    (never df^2 on hot shingles), exact similarity values, documented LSH
    recall."""
    d = frames.load_table(spark, sf_dir, "documents")
    return dd.minhash_jaccard_pairs(d, threshold=0.5)


# --- doc-side multi-probe recall frontier (r10) -------------------------------

_NEARDUP_MP_TAU = 0.3
#: recall is measured on a FIXED-ID panel, not the whole corpus: exact
#: all-pairs ground truth is never computable corpus-wide (it is the very
#: quadratic the LSH exists to avoid), so the measurement cost must be
#: O(1) in corpus scale. 1000 covers the full sf0.01 oracle fixture (500
#: docs — the gate measures everything) and bounds the sf0.1+ bench legs.
_NEARDUP_MP_PANEL = 1000

_NEARDUP_MP_SQL = f"""
WITH docpanel AS (
  SELECT * FROM documents WHERE doc_id < {_NEARDUP_MP_PANEL}
),
{dd.sql_minhash_probe_candidates("docpanel", probe=2)},
truth AS (
  SELECT doc_a, doc_b FROM ({dd.sql_ngram_jaccard_sets("docpanel", threshold=_NEARDUP_MP_TAU)}) tp
),
hits AS (
  SELECT COUNT(*) AS n_true,
         CAST(SUM(CASE WHEN c.level = 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits_p0,
         CAST(SUM(CASE WHEN c.level <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_p1,
         CAST(SUM(CASE WHEN c.level IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_p2
  FROM truth t LEFT JOIN probecand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
),
cost AS (
  SELECT CAST(SUM(CASE WHEN level = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cand_p0,
         CAST(SUM(CASE WHEN level <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS cand_p1,
         COUNT(*) AS cand_p2
  FROM probecand
)
SELECT h.n_true, h.hits_p0, h.hits_p1, h.hits_p2, c.cand_p0, c.cand_p1, c.cand_p2,
       (FLOOR(CAST(h.hits_p0 AS DOUBLE) / h.n_true * 1000000.0 + 0.5) / 1000000.0) AS recall_p0,
       (FLOOR(CAST(h.hits_p1 AS DOUBLE) / h.n_true * 1000000.0 + 0.5) / 1000000.0) AS recall_p1,
       (FLOOR(CAST(h.hits_p2 AS DOUBLE) / h.n_true * 1000000.0 + 0.5) / 1000000.0) AS recall_p2,
       (h.hits_p0 <= h.hits_p1 AND h.hits_p1 <= h.hits_p2
        AND c.cand_p0 <= c.cand_p1 AND c.cand_p1 <= c.cand_p2) AS monotone_ok
FROM hits h, cost c
""".strip()


@query("neardup_recall_multiprobe", sql=_NEARDUP_MP_SQL, tags=("llm", "dedup", "quality"))
def q_neardup_recall_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-side multi-probe recall frontier (r10, r9 verdict item 7): the
    leave-one-out probe level for banded MinHash LSH (llm/dedup.py
    minhash_probe_candidates) measured against EXACT n-gram-jaccard truth
    (tau=0.3 — below the 16-hash/4-band S-curve's sweet spot, so level-0
    banding genuinely misses pairs and the lift is visible: measured
    25/36 -> 27/36 -> 31/36 on the fixture across p0/p1/p2). One row:
    truth size, hits and candidate counts at probe 0/1/2 (r11 adds the
    leave-TWO-out rung, C(r,2) extra buckets per band), fround'd recalls,
    and monotone_ok — the ladder's structural invariant (level = MIN, so
    hits and candidates are non-decreasing in probe) hashed as data. The
    candidate cost rises steeply per rung (coarser r-1/r-2 buckets) — the
    same recall-vs-cost trade the ANN multi-probe line documents, as
    data. All probe levels come from ONE key relation, one banding join,
    never all-pairs. The whole measurement runs
    on a FIXED-ID panel (doc_id < 1000 — the full sf0.01 fixture, a
    bounded subset beyond): exact all-pairs truth corpus-wide IS the
    quadratic LSH exists to avoid, so the line is O(1) in corpus scale
    by construction (44 s -> ~9 s at sf0.1; constant at sf1+). Truth
    verification uses the set-intersect variant (ngram_jaccard_pairs_sets)
    — the classic per-shingle verify join shuffled 200M+ rows on this
    high-overlap panel."""
    from sarpro_spark.llm.cluster import _checkpointer

    d = frames.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _NEARDUP_MP_PANEL
    )
    # broadcast_sets: valid exactly because d is the bounded panel; truth
    # and cand are checkpointed because the hits/cost branches would
    # otherwise each re-execute the full pipelines (both are panel-bounded
    # pair lists, a few thousand skinny rows)
    truth = dd.ngram_jaccard_pairs_sets(
        d, threshold=_NEARDUP_MP_TAU, broadcast_sets=True
    ).select("doc_a", "doc_b")
    cand = dd.minhash_probe_candidates(d, probe=2)
    ckpt = _checkpointer(d)
    truth, cand = ckpt(truth), ckpt(cand)
    hits = truth.join(cand, ["doc_a", "doc_b"], "left").agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(F.when(F.col("level") == 0, 1).otherwise(0)).cast("long").alias("hits_p0"),
        F.sum(F.when(F.col("level") <= 1, 1).otherwise(0)).cast("long").alias("hits_p1"),
        F.sum(F.when(F.col("level").isNotNull(), 1).otherwise(0)).cast("long").alias("hits_p2"),
    )
    cost = cand.agg(
        F.sum(F.when(F.col("level") == 0, 1).otherwise(0)).cast("long").alias("cand_p0"),
        F.sum(F.when(F.col("level") <= 1, 1).otherwise(0)).cast("long").alias("cand_p1"),
        F.count(F.lit(1)).alias("cand_p2"),
    )
    return (
        hits.join(F.broadcast(cost))
        .select(
            "n_true", "hits_p0", "hits_p1", "hits_p2",
            "cand_p0", "cand_p1", "cand_p2",
            fround(F.col("hits_p0").cast("double") / F.col("n_true"), 6).alias("recall_p0"),
            fround(F.col("hits_p1").cast("double") / F.col("n_true"), 6).alias("recall_p1"),
            fround(F.col("hits_p2").cast("double") / F.col("n_true"), 6).alias("recall_p2"),
            ((F.col("hits_p0") <= F.col("hits_p1")) & (F.col("hits_p1") <= F.col("hits_p2"))
             & (F.col("cand_p0") <= F.col("cand_p1"))
             & (F.col("cand_p1") <= F.col("cand_p2"))).alias("monotone_ok"),
        )
    )


# --- corpus dedup summary (the end-to-end story) -----------------------------

_CORPUS_SUMMARY_SQL = f"""
WITH clusters AS ({cl.sql_dedup_clusters(
    "SELECT doc_id AS id FROM documents",
    "SELECT doc_a AS a, doc_b AS b FROM (" + dd.sql_minhash_jaccard("documents", threshold=0.5) + ") jp",
)})
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT cluster_id) AS n_clusters,
       CAST(SUM(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN is_canonical THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM clusters
""".strip()


@query("dedup_corpus_summary", sql=_CORPUS_SUMMARY_SQL, tags=("llm", "dedup"))
def q_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus dedup: LSH-verified near-dup pairs -> clusters ->
    keep canonical per cluster; one summary row (docs, clusters, kept,
    dropped) — the decision output a training-data pipeline acts on."""
    d = frames.load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_jaccard_pairs(d, threshold=0.5)
    clusters = cl.dedup_clusters(d, pairs)
    return clusters.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.sum(F.when(F.col("is_canonical"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("is_canonical"), 0).otherwise(1)).alias("n_dropped"),
    )


# --- near-dup clustering (connected components) ------------------------------

_CLUSTER_SQL = cl.sql_dedup_clusters(
    "SELECT doc_id AS id FROM documents",
    f"SELECT doc_a AS a, doc_b AS b FROM ({_MINHASH_VERIFIED_SQL}) jp",
)


@query("dedup_cluster_components", sql=_CLUSTER_SQL, tags=("llm", "dedup", "iterative"))
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: LSH-verified jaccard pairs -> connected
    components (min-label propagation to fixpoint; oracle = recursive CTE).
    Canonical = min doc id per cluster — the keep/drop decision of corpus
    dedup."""
    d = frames.load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_jaccard_pairs(d, threshold=0.5)
    return cl.dedup_clusters(d, pairs)


def _inc_cluster_sql() -> str:
    jp = dd.sql_minhash_jaccard("documents", threshold=0.5)
    full = cl.sql_dedup_clusters(
        "SELECT doc_id AS id FROM documents",
        "SELECT doc_a AS a, doc_b AS b FROM jp",
        prefix="f_",
    )
    old = cl.sql_dedup_clusters(
        "SELECT doc_id AS id FROM documents WHERE doc_id % 10 < 8",
        "SELECT doc_a AS a, doc_b AS b FROM jp WHERE doc_a % 10 < 8 AND doc_b % 10 < 8",
        prefix="o_",
    )
    return f"""
WITH RECURSIVE
jp AS MATERIALIZED ({jp}),
{full},
{old},
fc AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM f_reach GROUP BY node),
oc AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM o_reach GROUP BY node)
SELECT f.doc_id, f.cluster_id, (f.doc_id % 10 >= 8) AS is_new_doc,
       COALESCE(f.cluster_id <> o.cluster_id, FALSE) AS relabeled
FROM fc f LEFT JOIN oc o USING (doc_id)
""".strip()


@query("dedup_incremental_clusters", sql=_inc_cluster_sql(), tags=("llm", "dedup", "iterative"))
def q_dedup_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected-components maintenance (llm/cluster.py
    ``incremental_components``, r13): the dedup-cluster LIFECYCLE
    operator — given yesterday's labels and only the delta edges (pairs
    touching a new doc), re-cluster ONLY the contracted graph (touched
    cluster representatives + new docs) and compose.  Min-id labels are
    associative under contraction, so the result equals a full recompute
    EXACTLY — and the oracle IS the full recursive-CTE recompute over
    the union graph, so hash equality certifies the contraction algebra,
    the representative mapping, and the untouched-label pass-through.
    ``relabeled`` (old docs whose label changed) rides in the hash —
    the touched set itself is certified data, not a claim."""
    d = frames.load_table(spark, sf_dir, "documents")
    pairs = cl._checkpointer(d)(dd.minhash_jaccard_pairs(d, threshold=0.5))
    is_old = lambda c: c % 10 < 8  # noqa: E731
    old_docs = d.where(is_old(F.col("doc_id")))
    new_docs = d.where(~is_old(F.col("doc_id")))
    old_pairs = pairs.where(
        is_old(F.col("doc_a")) & is_old(F.col("doc_b"))
    )
    delta = pairs.where(~(is_old(F.col("doc_a")) & is_old(F.col("doc_b"))))
    old_labels = cl.dedup_clusters(old_docs, old_pairs).select(
        F.col("doc_id").alias("id"), "cluster_id"
    )
    inc = cl.incremental_components(
        old_labels,
        new_docs.select(F.col("doc_id").alias("id")),
        delta.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
    )
    prev = old_labels.select("id", F.col("cluster_id").alias("_oldlab"))
    return (
        inc.join(prev, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "cluster_id",
            (~is_old(F.col("id"))).alias("is_new_doc"),
            F.coalesce(
                F.col("cluster_id") != F.col("_oldlab"), F.lit(False)
            ).alias("relabeled"),
        )
    )


# byte-grain oracle for the decode stand-in: blob bytes via hex substrings,
# mean/std from exact integer moments (bit-identical to the kernel), entropy
# in the same algebraic form (residual libm/sum-order noise absorbed by
# fround on both sides)
_MM_FEATURES_SQL = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
bytes AS (
  SELECT doc_id, n, CAST(('0x' || SUBSTR(hx, 2 * i.i - 1, 2)) AS BIGINT) AS bv
  FROM b, LATERAL (SELECT UNNEST(RANGE(1, b.n + 1)) AS i) i
),
m AS (
  SELECT doc_id, MAX(n) AS n, SUM(bv) AS s1, SUM(bv * bv) AS s2
  FROM bytes GROUP BY doc_id
),
bc AS (SELECT doc_id, bv, COUNT(*) AS c FROM bytes GROUP BY doc_id, bv),
e AS (SELECT doc_id, SUM(c * LOG2(c)) AS clc FROM bc GROUP BY doc_id)
SELECT m.doc_id, CAST(m.n AS INTEGER) AS n_bytes,
       {sql_fround('m.s1 / m.n')} AS byte_mean,
       {sql_fround('SQRT(GREATEST(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n), 0.0))')} AS byte_std,
       {sql_fround('LOG2(m.n) - e.clc / m.n')} AS byte_entropy
FROM m JOIN e USING (doc_id)
""".strip()


@query("multimodal_byte_features", sql=_MM_FEATURES_SQL, tags=("llm", "multimodal"))
def q_mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-agnostic byte features via mapInPandas (Arrow batches, payload
    never leaves the executor) with a FULL value-hash oracle — byte
    extraction via hex substrings on the SQL side, integer-moment mean/std
    identical by construction."""
    d = frames.load_table(spark, sf_dir, "documents")
    b = mm.attach_binary_payload(d)
    from sarpro_spark.queries import round_floats

    return round_floats(mm.decode_features(b), 6)


# --- real-format decode: PNG (lossless, bit-exact oracle) + JPEG (dims exact,
# error-bounded boolean) over in-repo codecs ----------------------------------

#: worst observed formula-image JPEG mean-abs-error is ~6.9 at quality 90;
#: 12 certifies "the decode is the decode" with comfortable margin while
#: still failing on any real codec defect (wrong dequant, bad predictor, ...)
_JPEG_MAE_TOL = 12.0

_MM_DECODE_SQL = f"""
WITH g AS (
  SELECT doc_id, 8 + doc_id % 24 AS w, 8 + doc_id % 16 AS h, doc_id % 4 AS m
  FROM documents
),
px AS (
  SELECT g.doc_id, ((g.doc_id * 31 + r.r * 7 + c.c * 13 + k.k * 59) % 256) AS v
  FROM g,
       LATERAL (SELECT UNNEST(RANGE(0, g.h)) AS r) r,
       LATERAL (SELECT UNNEST(RANGE(0, g.w)) AS c) c,
       LATERAL (SELECT UNNEST(RANGE(0, CASE WHEN g.m >= 2 THEN 3 ELSE 1 END)) AS k) k
),
s AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s1, CAST(SUM(v * v) AS BIGINT) AS s2
  FROM px GROUP BY doc_id
)
SELECT g.doc_id,
  CASE WHEN g.m % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
  CASE WHEN g.m >= 2 THEN 'rgb' ELSE 'gray' END AS mode,
  CAST(g.w AS INTEGER) AS width,
  CAST(g.h AS INTEGER) AS height,
  s.n AS n_px,
  CASE WHEN g.m % 2 = 0 THEN {sql_fround('s.s1 / s.n')} END AS px_mean,
  CASE WHEN g.m % 2 = 0 THEN {sql_fround('SQRT(GREATEST(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 0.0))')} END AS px_std,
  TRUE AS decode_close
FROM g JOIN s USING (doc_id)
""".strip()


@query("multimodal_decode_features", sql=_MM_DECODE_SQL, tags=("llm", "multimodal"))
def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: per doc a deterministic formula image is
    encoded executor-side (PNG for even doc_id%4 parity, baseline JPEG
    otherwise — both in-repo codecs), then decoded back by magic-byte
    dispatch. The PNG leg is lossless, so decoded dims + exact pixel moments
    hash against the closed-form oracle; the JPEG leg certifies exact header
    dims plus an error-bounded boolean (MAE vs the formula <= {tol} — oracle
    emits TRUE). Payloads live only inside Arrow batches on executors."""
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    d = frames.load_table(spark, sf_dir, "documents")
    payloads = mm.attach_image_payload(d)

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("fmt", StringType()),
            StructField("mode", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_px", LongType()),
            StructField("px_mean", DoubleType()),
            StructField("px_std", DoubleType()),
            StructField("decode_close", BooleanType()),
        ]
    )

    def fn(batches):
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["doc_id"], pdf["payload"]):
                i = int(i)
                arr = mm.decode_image(bytes(buf))
                gray = arr.ndim == 2
                h, w = arr.shape[:2]
                ref = mm.formula_image(i, w, h, 1 if gray else 3)
                is_png = bytes(buf)[:4] == b"\x89PNG"
                if is_png:
                    a = arr.astype(np.int64)
                    n = a.size
                    s1, s2 = int(a.sum()), int((a * a).sum())
                    mean = s1 / n
                    std = math.sqrt(max(s2 / n - mean * mean, 0.0))
                    close = bool((arr == ref).all())
                else:
                    mean = std = None
                    mae = float(np.abs(arr.astype(np.int64) - ref.astype(np.int64)).mean())
                    close = mae <= _JPEG_MAE_TOL
                rows.append(
                    (
                        i,
                        "png" if is_png else "jpeg",
                        "gray" if gray else "rgb",
                        w,
                        h,
                        arr.size,
                        mean,
                        std,
                        close,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    from sarpro_spark.queries import round_floats

    return round_floats(payloads.mapInPandas(fn, schema=schema), 6)


q_mm_decode.__doc__ = q_mm_decode.__doc__.format(tol=_JPEG_MAE_TOL)


# --- progressive-JPEG graceful degradation -----------------------------------

_MM_PROGRESSIVE_SQL = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'jpeg_progressive' ELSE 'jpeg' END AS fmt,
  CAST(8 + doc_id % 24 AS INTEGER) AS width,
  CAST(8 + doc_id % 16 AS INTEGER) AS height,
  doc_id % 3 <> 0 AS decode_ok
FROM documents WHERE doc_id % 2 = 1
""".strip()


@query("multimodal_progressive_fallback", sql=_MM_PROGRESSIVE_SQL, tags=("llm", "multimodal"))
def q_mm_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graceful degradation for unsupported encodings: every third JPEG doc
    is progressive-marked (SOF0 rewritten to SOF2 — entropy decode
    unsupported by the baseline codec, jpeg.py's declared boundary). The
    scan kernel must emit decode_ok = FALSE with header-sniffed dims for
    those blobs instead of raising — at 100 TB one exotic blob costs one
    False row, never a failed task. The oracle pins which docs degrade and
    that the header-dims fallback equals the formula dims."""
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    d = frames.load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 2 == 1)
    payloads = mm.attach_image_payload(d, progressive_mod=3)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("fmt", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("decode_ok", BooleanType()),
        ]
    )

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(buf)
                fmt = mm.sniff_image(buf)
                arr, ok = mm.safe_decode_image(buf)
                if ok:
                    h, w = arr.shape[:2]
                else:
                    w, h = mm.image_dims(buf)  # header-only fallback
                rows.append((int(i), fmt, w, h, ok))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return payloads.mapInPandas(fn, schema=schema)


_MM_FRAMES_SQL = """
WITH g AS (SELECT doc_id, 2 + doc_id % 3 AS n_frames FROM documents),
f AS (
  SELECT g.doc_id, g.n_frames, fr.fr
  FROM g, LATERAL (SELECT UNNEST(RANGE(0, g.n_frames)) AS fr) fr
  WHERE fr.fr % 2 = 0
)
SELECT doc_id, CAST(n_frames AS INTEGER) AS n_frames,
       CAST(fr AS INTEGER) AS frame_idx,
       CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
       TRUE AS frame_close
FROM f
""".strip()


@query("multimodal_frame_sample", sql=_MM_FRAMES_SQL, tags=("llm", "multimodal"))
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling, container-free: per doc a concatenated-JPEG
    payload of 2+doc_id%3 formula frames; sample_frames demuxes by SOI/EOI
    scan and decodes every 2nd frame only. Output = one row per SAMPLED
    frame with exact dims and the error-bounded decode boolean."""
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    d = frames.load_table(spark, sf_dir, "documents")
    payloads = mm.attach_mjpeg_payload(d)

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_frames", IntegerType()),
            StructField("frame_idx", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("frame_close", BooleanType()),
        ]
    )

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, nf, buf in zip(pdf["doc_id"], pdf["n_frames"], pdf["payload"]):
                i = int(i)
                for fidx, arr in mm.sample_frames(bytes(buf), every_n=2):
                    h, w = arr.shape[:2]
                    ref = mm.formula_image(i, w, h, 1, frame=fidx)
                    mae = float(np.abs(arr.astype(np.int64) - ref.astype(np.int64)).mean())
                    rows.append((i, int(nf), fidx, w, h, mae <= _JPEG_MAE_TOL))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return payloads.mapInPandas(fn, schema=schema)


# --- corpus hygiene: PII redaction -------------------------------------------

# The synthetic corpus carries no real PII, so the query PLANTS deterministic
# PII (email/phone/ip/card derived from doc_id) into each doc, then redacts —
# exercising every pattern with nonzero counts while staying reproducible in
# the oracle. At production scale the same exprs run directly on raw text.

_PII_AUG = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example"
    " or +1 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _pii_sql() -> str:
    from sarpro_spark.llm.filters import sql_redact_pii

    counts, redacted = sql_redact_pii("aug")
    cnt_cols = ",\n       ".join(f"CAST({e} AS INTEGER) AS pii_{k}" for k, e in counts.items())
    return f"""
WITH a AS (SELECT doc_id, {_PII_AUG} AS aug FROM documents)
SELECT doc_id,
       {cnt_cols},
       {redacted} AS redacted
FROM a
""".strip()


def _k_anon_sql() -> str:
    from sarpro_spark.llm.privacy import sql_k_anonymity_report

    inner = sql_k_anonymity_report(
        "(SELECT lang, source, CAST(n_chars % 50 AS INTEGER) AS len_bucket FROM documents) s",
        ["lang", "source", "len_bucket"],
        25,
    )
    return inner


@query("privacy_k_anonymity", sql=_k_anon_sql(), tags=("llm", "hygiene", "privacy"))
def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release guard (Sweeney 2002) at quasi-identifier grain
    (lang, source, length bucket): group sizes, released flag (>= k=25),
    and the suppressed row mass — the data-release audit artifact. One
    hash aggregate; the companion row filter (llm/privacy.py:k_anonymize)
    is a semi-join on the same key, semantics unit-tested."""
    from sarpro_spark.llm.privacy import k_anonymity_report

    d = frames.load_table(spark, sf_dir, "documents").select(
        "lang", "source", (F.col("n_chars") % 50).cast("int").alias("len_bucket")
    )
    return k_anonymity_report(d, ["lang", "source", "len_bucket"], 25)


@query("text_pii_redaction", sql=_pii_sql(), tags=("llm", "text", "hygiene"))
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: typed placeholder substitution + per-type counts, pure
    regexp column exprs (patterns restricted to the Java-regex/RE2 common
    subset). Counts are non-trivial because the query plants deterministic
    doc_id-derived PII first; the full redacted text is value-hashed."""
    from sarpro_spark.llm import filters as fl

    d = frames.load_table(spark, sf_dir, "documents")
    pid = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit(" reach user"), pid.cast("string"), F.lit("@mail.example or +1 555-"),
        F.lpad((pid % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((pid % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (pid % 256).cast("string"), F.lit(".0."),
        ((pid * 7) % 256).cast("string"),
        F.lit(" card 4111-1111-1111-"), F.lpad((pid % 10000).cast("string"), 4, "0"),
    )
    a = d.select("doc_id", aug.alias("aug"))
    out = fl.redact_pii(a, text_col="aug")
    return out.select(
        "doc_id",
        F.col("pii_email").cast("int").alias("pii_email"),
        F.col("pii_card").cast("int").alias("pii_card"),
        F.col("pii_phone").cast("int").alias("pii_phone"),
        F.col("pii_ip").cast("int").alias("pii_ip"),
        "redacted",
    )


# --- corpus hygiene: benchmark contamination ---------------------------------

def _contam_sql() -> str:
    from sarpro_spark.llm.filters import sql_contamination

    return sql_contamination(
        "SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0",
        "SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0",
    )


@query("text_contamination", sql=_contam_sql(), tags=("llm", "text", "hygiene"))
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination: fraction of each training doc's distinct
    char-16-gram set present in the held-out benchmark slice (doc_id % 97 ==
    0). One inverted join keyed by shingle — never doc x doc."""
    from sarpro_spark.llm import filters as fl

    d = frames.load_table(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 97 != 0)
    bench = d.where(F.col("doc_id") % 97 == 0)
    return fl.contamination_scores(train, bench)


# --- corpus hygiene: within-doc repetition ------------------------------------


def _repetition_sql() -> str:
    from sarpro_spark.llm.filters import sql_repetition

    return sql_repetition("SELECT doc_id, text FROM documents")


@query("text_repetition", sql=_repetition_sql(), tags=("llm", "text", "hygiene"))
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher repetition filters: duplicate word-trigram fraction +
    most-frequent-token share per doc. One posexplode, lead() windows, two
    doc-keyed shuffles."""
    from sarpro_spark.llm import filters as fl

    d = frames.load_table(spark, sf_dir, "documents")
    return fl.repetition_scores(d)


# --- URL/domain extraction + per-domain rollup -------------------------------

# The synthetic corpus carries no URLs, so (like the PII query) deterministic
# doc_id-derived URLs are planted first; at production scale the same exprs
# run on raw text and the rollup feeds domain-level curation decisions
# (blocklists, per-domain caps — the FineWeb/Dolma grouping step).

_URL_AUG = (
    "text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.example.com/page and http://cdn' || CAST(doc_id % 3 AS VARCHAR)"
    " || '.example.net/asset'"
)

_URL_RE = r"https?://([a-z0-9.-]+)"

_DOMAINS_SQL = f"""
WITH a AS (SELECT doc_id, {_URL_AUG} AS aug FROM documents),
u AS (
  SELECT doc_id, UNNEST(regexp_extract_all(aug, '{_URL_RE}', 1)) AS domain FROM a
)
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM u GROUP BY domain
""".strip()


@query("text_url_domains", sql=_DOMAINS_SQL, tags=("llm", "text", "hygiene"))
def q_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level corpus rollup: extract URL hosts (regexp_extract_all,
    JVM-side), one per-domain aggregation — the grouping that drives
    blocklist filtering and per-domain sampling caps."""
    d = frames.load_table(spark, sf_dir, "documents")
    pid = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit(" see https://site"), (pid % 7).cast("string"),
        F.lit(".example.com/page and http://cdn"), (pid % 3).cast("string"),
        F.lit(".example.net/asset"),
    )
    u = d.select("doc_id", F.explode(F.regexp_extract_all(aug, F.lit(_URL_RE), 1)).alias("domain"))
    return u.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def _unigram_sql() -> str:
    from sarpro_spark.llm.text import sql_unigram_logprob
    from sarpro_spark.queries import sql_fround

    inner = sql_unigram_logprob("documents")
    return (
        f"SELECT doc_id, n_tokens, {sql_fround('mean_nll')} AS mean_nll "
        f"FROM (\n{inner}\n) u"
    )


@query("text_unigram_logprob", sql=_unigram_sql(), tags=("llm", "text", "hygiene"))
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality filter: per-doc mean negative log-probability
    under an add-one-smoothed unigram LM fit on the corpus (production
    swaps in a trusted reference LM — the plan is identical): one
    map-side-combined token-frequency shuffle, a broadcast vocabulary join,
    one per-doc aggregation."""
    from sarpro_spark.llm.text import unigram_logprob_scores
    from sarpro_spark.queries import round_floats

    d = frames.load_table(spark, sf_dir, "documents")
    return round_floats(unigram_logprob_scores(d))


# --- deterministic sampling ---------------------------------------------------

_STRAT_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.125}


def _strat_sample_sql() -> str:
    from sarpro_spark.llm.sampling import BUCKETS, sql_hash_bucket

    cases = " ".join(
        f"WHEN '{k}' THEN {int(v * BUCKETS)}" for k, v in sorted(_STRAT_RATES.items())
    )
    return f"""
SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
FROM documents
WHERE {sql_hash_bucket('doc_id')} < (CASE lang {cases} ELSE 0 END)
GROUP BY lang
""".strip()


@query("sample_stratified", sql=_strat_sample_sql(), tags=("llm", "sampling"))
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling (mixture construction):
    md5-bucket filter against a broadcast rate table — zero shuffles for the
    sample itself, exact reproducibility across runs and engines."""
    from sarpro_spark.llm import sampling as smp

    d = frames.load_table(spark, sf_dir, "documents")
    kept = smp.stratified_sample(d, _STRAT_RATES, "lang")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("first_id"),
        F.max("doc_id").alias("last_id"),
    )


def _topk_sample_sql() -> str:
    from sarpro_spark.llm.sampling import sql_topk_per_stratum

    inner = sql_topk_per_stratum(
        "SELECT doc_id, lang FROM documents", 7, "lang"
    )
    return f"SELECT doc_id, lang FROM ({inner}) s"


@query("sample_topk_per_stratum", sql=_topk_sample_sql(), tags=("llm", "sampling"))
def q_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k-per-stratum reproducible reservoir: rows ranked by seeded hash
    (id tiebreak) inside each stratum, k kept — one stratum-keyed window."""
    from sarpro_spark.llm import sampling as smp

    d = frames.load_table(spark, sf_dir, "documents")
    return smp.topk_per_stratum(d.select("doc_id", "lang"), 7, "lang")


def _weighted_topk_sql() -> str:
    from sarpro_spark.llm.sampling import sql_weighted_topk_per_stratum

    inner = sql_weighted_topk_per_stratum(
        "SELECT doc_id, lang, n_chars FROM documents", 7, "lang", "n_chars + 1"
    )
    return f"SELECT doc_id, lang, n_chars, wkey, rnk FROM ({inner}) s"


@query("sample_weighted_topk", sql=_weighted_topk_sql(), tags=("llm", "sampling"))
def q_sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k weighted sampling without replacement per stratum
    (Efraimidis-Spirakis): inclusion odds proportional to doc length, keys
    from the seeded hash so the sample is reproducible — the
    quality-weighted variant of the reservoir, one window per stratum."""
    from sarpro_spark.llm import sampling as smp

    d = frames.load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    ).withColumn("_w", F.col("n_chars") + 1)
    out = smp.weighted_topk_per_stratum(d, 7, "lang", "_w")
    return out.select("doc_id", "lang", "n_chars", "wkey", "rnk")


# --- DSIR importance resampling (r13) -----------------------------------------

_DSIR_K = 60
_DSIR_TARGET = "lang = 'en'"


def _dsir_resample_sql() -> str:
    from sarpro_spark.llm.dsir import sql_dsir_resample

    return sql_dsir_resample("documents", _DSIR_TARGET, _DSIR_K)


@query("dsir_resample_en", sql=_dsir_resample_sql(), tags=("llm", "sampling"))
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR pretraining-data selection (llm/dsir.py, r13 — Xie et al. 2023):
    score every document by the log-likelihood ratio of its hashed
    unigram+bigram bag under the English-target vs raw bag-of-ngrams LMs,
    then Gumbel-top-k resample proportional to the importance weight.
    The per-bucket ratio is nano-unit INTEGER data and the per-doc weight
    an exact integer dot product (no float association order in the hot
    sum); the 2048-row model broadcasts; the sample is one rank window.
    logw, the perturbed key, and the ranks are all inside the hash."""
    from sarpro_spark.llm.dsir import dsir_resample

    d = frames.load_table(spark, sf_dir, "documents")
    return dsir_resample(d, F.col("lang") == "en", _DSIR_K)


def _dsir_by_lang_sql() -> str:
    from sarpro_spark.llm.dsir import sql_dsir_ctes

    logw = sql_fround("CAST(SUM(w.logw_nano) AS DOUBLE) / 1e9 / COUNT(*)")
    return f"""
WITH {sql_dsir_ctes('documents', _DSIR_TARGET)},
bylang AS (
  SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs, {logw} AS mean_logw
  FROM ds_logw w JOIN documents d USING (doc_id)
  GROUP BY d.lang
)
SELECT lang, n_docs, mean_logw,
       (lang = (SELECT lang FROM bylang ORDER BY mean_logw DESC, lang LIMIT 1)) AS is_top
FROM bylang
""".strip()


@query("dsir_logweight_by_lang", sql=_dsir_by_lang_sql(), tags=("llm", "sampling", "quality"))
def q_dsir_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR semantic certificate: per-language mean importance
    log-weight under the English target.  English must surface as the
    top-weighted language — ``is_top`` pins that AS DATA (the mean is an
    exact integer sum over nano-unit weights divided once, so both
    engines agree bit-for-bit).  The argmax is a keyless 1-row
    ``min_by`` aggregate (negated-mean, lang tiebreak) broadcast back —
    no global sort window over the lang relation."""
    from sarpro_spark.llm.dsir import dsir_logweights

    d = frames.load_table(spark, sf_dir, "documents")
    lw = dsir_logweights(d, F.col("lang") == "en")
    by = (
        lw.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("logw_nano").alias("_s"),
        )
        .select(
            "lang",
            "n_docs",
            fround(F.col("_s").cast("double") / 1e9 / F.col("n_docs"), 6).alias(
                "mean_logw"
            ),
        )
    )
    best = by.agg(
        F.min_by(
            "lang", F.struct((-F.col("mean_logw")).alias("a"), F.col("lang").alias("b"))
        ).alias("_best")
    )
    return by.crossJoin(F.broadcast(best)).select(
        "lang", "n_docs", "mean_logw",
        (F.col("lang") == F.col("_best")).alias("is_top"),
    )


# --- length-bucketed batching telemetry (r13) ----------------------------------


def _length_bucketed_sql() -> str:
    from sarpro_spark.llm.packing import sql_length_bucketed_batches

    return sql_length_bucketed_batches("documents")


@query("corpus_length_bucketed_batches", sql=_length_bucketed_sql(), tags=("llm", "packing"))
def q_length_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batching telemetry (llm/packing.py, r13 — the
    HF group_by_length / bucketed-batching efficiency operator): both
    legs batch SHARD-LOCALLY (no global order); the bucketed leg groups
    docs by their integer-exact log-length bin (the DDSketch bucket map)
    before batching, the baseline leg doesn't.  Waste per batch =
    batch_size*max(len)-sum(len), exact integers — the per-bin rows and
    the baseline row hash together, so the pad-efficiency claim is
    certified data, not prose."""
    from sarpro_spark.llm.packing import length_bucketed_batches

    d = frames.load_table(spark, sf_dir, "documents")
    return length_bucketed_batches(d)


# --- distributed k-means (IVF centroid training) ------------------------------

_KMEANS_K, _KMEANS_ITERS = 8, 2


def _kmeans_sql() -> str:
    ctes = sim.sql_kmeans("embeddings", k=_KMEANS_K, iters=_KMEANS_ITERS)
    return f"""
WITH {ctes}
SELECT centroid_id, CAST(u.i - 1 AS INTEGER) AS pos, u.x AS val, n_members
FROM kfinal f,
     LATERAL (SELECT UNNEST(f.cvec) AS x, GENERATE_SUBSCRIPTS(f.cvec, 1) AS i) u
""".strip()


@query("embedding_kmeans", sql=_kmeans_sql(), tags=("llm", "similarity", "iterative"))
def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 2 iterations) over the embedding
    corpus — the IVF centroid trainer. Assignment = broadcast-centroid corpus
    pass; update = per-dim AVG in one groupBy (64 agg columns, map-side
    combine, fround'd so summation order can't leak). Oracle = the same two
    iterations UNROLLED in SQL; centroids compared component-wise."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    cent = sim.kmeans_train(e, k=_KMEANS_K, iters=_KMEANS_ITERS, dim=64)
    return cent.select(
        "centroid_id",
        "n_members",
        F.posexplode("cvec").alias("pos", "val"),
    ).select("centroid_id", "pos", "val", "n_members")


_SEMDEDUP_TAU = 0.35
#: small enough that several of the fixture's k=8 clusters (avg ~62 members
#: at 500 vectors) exceed it — the r9 recursive re-cluster path is EXERCISED
#: by the certificate, not just reachable
_SEMDEDUP_MAXC = 40
#: r10: at max_cluster=40 the fixture leaves SIX sub-groups still oversized
#: after the first split (measured), so depth=2 genuinely runs the second
#: recursion level in this certificate — not just reachable code
_SEMDEDUP_DEPTH = 2


def _semdedup_sql() -> str:
    ctes = sim.sql_semantic_dedup(
        "embeddings", k=_KMEANS_K, iters=_KMEANS_ITERS, tau=_SEMDEDUP_TAU,
        max_cluster=_SEMDEDUP_MAXC, depth=_SEMDEDUP_DEPTH,
    )
    # r11 per-level telemetry twin: level 0 aggregates the top-level
    # grouping (semmm), level d the post-split s{d}rel paths — the same
    # relations the recursion itself consumes, so the bound is the
    # algorithm's own arithmetic, not a re-derivation
    mc = float(_SEMDEDUP_MAXC)
    lvl_selects = []
    keys = ["centroid_id"]
    for d in range(0, _SEMDEDUP_DEPTH + 1):
        rel = "semmm" if d == 0 else f"s{d}rel"
        if d >= 1:
            keys = keys + ["sub_id" if d == 1 else f"sub{d}_id"]
        kb = ", ".join(keys)
        lvl_selects.append(f"""
  SELECT {d} AS level, COUNT(*) AS n_groups,
         CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
         MAX(size) AS max_size,
         CAST(SUM(ns * b * (b - 1) / 2) AS BIGINT) AS pair_bound
  FROM (
    SELECT size, ns, CAST(CEIL(size / ns) AS BIGINT) AS b FROM (
      SELECT COUNT(*) AS size, CAST(CEIL(COUNT(*) / {mc!r}) AS BIGINT) AS ns
      FROM {rel} GROUP BY {kb}
    ) zz
  ) z""".strip())
    levels = "\n  UNION ALL\n  ".join(lvl_selects)
    return f"""
WITH {ctes},
semtelem AS (
  {levels}
)
SELECT 'vec' AS row_kind, vec_id, centroid_id, kept,
       CAST(NULL AS INTEGER) AS level, CAST(NULL AS BIGINT) AS n_groups,
       CAST(NULL AS BIGINT) AS n_over, CAST(NULL AS BIGINT) AS max_size,
       CAST(NULL AS BIGINT) AS pair_bound
FROM semkept
UNION ALL
SELECT 'level' AS row_kind, CAST(NULL AS BIGINT) AS vec_id,
       CAST(NULL AS INTEGER) AS centroid_id, CAST(NULL AS BOOLEAN) AS kept,
       level, CAST(n_groups AS BIGINT) AS n_groups, n_over, CAST(max_size AS BIGINT) AS max_size, pair_bound
FROM semtelem
""".strip()


@query("dedup_semantic_prune", sql=_semdedup_sql(), tags=("llm", "dedup", "similarity"))
def q_dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023): k-means cluster
    the embedding corpus, then inside each cluster drop every vector with a
    near-duplicate (fround'd cosine >= 0.35, the corpus's near-dup grain)
    of smaller id — keep-one-per-duplicate-group with the family's
    lowest-id-wins rule. The pair join keys on (group-path, salt) — never
    global all-pairs: groups above max_cluster are re-clustered by
    BOUNDED-DEPTH grouped k-means (r9 depth-1; r10 depth-2 — a group
    still oversized after one split is re-clustered again instead of
    falling straight to the md5 salt; llm/similarity.py semantic_dedup —
    semantically-near vectors stay together when a hot cluster splits,
    where an md5 salt scattered duplicate groups and lost their pairs),
    with a residual salt hard-bounding anything the full recursion could
    not shrink. max_cluster is set BELOW the fixture's mean cluster size
    so this certificate runs the sub-kmeans for real, and six sub-groups
    stay oversized after the first split so the SECOND level runs for
    real too. r11 (verdict item 5): the row set now ALSO carries one
    'level' row per recursion level — group count, still-oversized count,
    max group size, and the salted pair-work bound — so depth growth is
    hashed DATA: a regression that stops the recursion from splitting
    flips n_over/pair_bound, not just wall-clock. Oracle = the identical
    kmeans + assignment + level-for-level unrolled sub-kmeans + pair scan
    in SQL, telemetry aggregated from the same unrolled relations."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    kept, telem = sim.semantic_dedup(
        e, k=_KMEANS_K, iters=_KMEANS_ITERS, tau=_SEMDEDUP_TAU, dim=64,
        max_cluster=_SEMDEDUP_MAXC, depth=_SEMDEDUP_DEPTH, telemetry=True,
    )
    nulls = lambda name, t: F.lit(None).cast(t).alias(name)  # noqa: E731
    veck = kept.select(
        F.lit("vec").alias("row_kind"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("centroid_id").cast("int").alias("centroid_id"),
        "kept",
        nulls("level", "int"), nulls("n_groups", "long"), nulls("n_over", "long"),
        nulls("max_size", "long"), nulls("pair_bound", "long"),
    )
    lvl = telem.select(
        F.lit("level").alias("row_kind"),
        nulls("vec_id", "long"), nulls("centroid_id", "int"),
        nulls("kept", "boolean"),
        F.col("level").cast("int").alias("level"),
        F.col("n_groups").cast("long").alias("n_groups"),
        F.col("n_over").cast("long").alias("n_over"),
        F.col("max_size").cast("long").alias("max_size"),
        F.col("pair_bound").cast("long").alias("pair_bound"),
    )
    return veck.unionByName(lvl)


# --- int8 scalar quantization -------------------------------------------------


def _quant_sql() -> str:
    return f"""
WITH {sim.sql_quantize_int8('embeddings')}
SELECT vec_id, {sql_fround('scale')} AS scale,
       CAST(u.i - 1 AS INTEGER) AS pos, u.c AS code
FROM qcodes q,
     LATERAL (SELECT UNNEST(q.codes) AS c, GENERATE_SUBSCRIPTS(q.codes, 1) AS i) u
""".strip()


@query("embedding_quantize_int8", sql=_quant_sql(), tags=("llm", "similarity"))
def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (scale = max|x|/127): the 4x
    memory cut that keeps corpus-scale ANN scans in cache. Codes are exact
    single-IEEE-op arithmetic — compared bit-for-bit against the oracle."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    qc = sim.quantize_int8(e)
    return qc.select(
        "vec_id",
        fround(F.col("scale")).alias("scale"),
        F.posexplode("codes").alias("pos", "code"),
    ).select("vec_id", "scale", "pos", "code")


_TOPK_INT8_SQL = sim.sql_cosine_topk_int8("embeddings", _QUERY_SEL, k=10)


@query("similarity_topk_int8", sql=_TOPK_INT8_SQL, tags=("llm", "similarity"))
def q_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized brute-force ANN: int64 dot products and norms over int8
    codes (exact, order-independent), one fround'd float division per pair.
    The scan is 1/4 the bytes of f32 and the hot loop is integer SIMD."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_int8(e, _spark_queries_frame(spark, sf_dir), k=10)


_TOPK_BINARY_SQL = sim.sql_cosine_topk_binary("embeddings", _QUERY_SEL, k=10)


@query("similarity_topk_binary", sql=_TOPK_BINARY_SQL, tags=("llm", "similarity"))
def q_topk_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-BIT quantized ANN (r11 — the third rung of the quantization
    ladder after f32 and int8): sign-bit codes pack 32 dims per BIGINT
    word (1/32 of f32 scan bytes), the shortlist is XOR+popcount Hamming
    distance (pure integer codegen, top k*4 per query, deterministic
    id tie-break), and only the shortlist is rescored with the exact
    float cosine — the binary-embedding rerank pipeline published with
    modern embedding models. The hashed row keeps the Hamming distance
    next to the rescored sim, so shortlist quality is data."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_binary(e, _spark_queries_frame(spark, sf_dir), k=10)


_TOPK_PQ_SQL = sim.sql_cosine_topk_pq("embeddings", _QUERY_SEL, k=10)


@query("similarity_topk_pq", sql=_TOPK_PQ_SQL, tags=("llm", "similarity"))
def q_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC ANN (r12 — the rung between int8 and
    1-bit): per-subspace codebooks trained with the certified distributed
    k-means (4 subspaces x 16 centroids = 4-bit codes, half the scan
    bytes of the 1-bit words), each query precomputes the m*ksub ADC
    lookup table, the scan is one broadcast-LUT join + a 4-row SUM per
    (query, vector), and the PQ-reconstructed cosine shortlists k*4 for
    exact rerank. adc_sim rides next to the exact sim in the hashed row,
    so codebook quality is data — the Jegou et al. 2011 pipeline,
    relational."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_pq(e, _spark_queries_frame(spark, sf_dir), k=10)


def _ivf_cand_ctes(nprobe: int, kc: int, nq: int) -> str:
    """CTE chain ``queries``/``ivassign``/``ivprobed``/``ivcand`` — centroid
    scoring (the certified sql_cosine_ctes instantiation of the IVF rung),
    inverted-list assignment, query probes, and the probed-list candidate
    pairs.  Shared by the IVF-PQ and MaxSim twins."""
    qsel = f"SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {nq}"
    csel = f"SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {kc}"
    return f"""queries AS ({qsel}),
{sim.sql_cosine_ctes('embeddings', csel, prefix='c_')},
ivassign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT cs.vec_id, cs.query_id AS centroid_id,
           ROW_NUMBER() OVER (PARTITION BY cs.vec_id ORDER BY cs.sim DESC, cs.query_id) AS rnk
    FROM c_scored cs
  ) WHERE rnk = 1
),
ivprobed AS (
  SELECT query_id, centroid_id FROM (
    SELECT cs.vec_id AS query_id, cs.query_id AS centroid_id,
           ROW_NUMBER() OVER (PARTITION BY cs.vec_id ORDER BY cs.sim DESC, cs.query_id) AS rnk
    FROM c_scored cs WHERE cs.vec_id < {nq}
  ) WHERE rnk <= {nprobe}
),
ivcand AS (
  SELECT DISTINCT p.query_id, a.vec_id FROM ivprobed p JOIN ivassign a USING (centroid_id)
)"""


def _ivfpq_core_ctes(nprobe: int, kc: int, nq: int) -> str:
    """CTE chain for the IVF-PQ twin: the shared IVF candidate chain plus
    PQ codebooks/codes and the candidate-restricted ADC (``pqadcq``)."""
    qsel = f"SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {nq}"
    return f"""{_ivf_cand_ctes(nprobe, kc, nq)},
{sim.sql_pq_ctes('embeddings')},
{sim._sql_pq_adc(qsel, sim.PQ_M, 64, 'vec_id', cand_rel='ivcand')}"""


_IVFPQ_RESCORE = """
ivshort AS (
  SELECT * FROM (
    SELECT query_id, vec_id, adc_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_sim DESC, vec_id) AS arnk
    FROM pqadcq
  ) h WHERE arnk <= {cap}
),
ivres AS (
  SELECT s.query_id, s.vec_id, s.adc_sim, s.arnk,
         {simexpr} AS sim
  FROM (
    SELECT sh.query_id, sh.vec_id, sh.adc_sim, sh.arnk, e.embedding AS v, q.qvec AS qv
    FROM ivshort sh
    JOIN embeddings e USING (vec_id)
    JOIN queries q USING (query_id)
  ) s
  WHERE {nv} > 0 AND {nq} > 0
)""".strip()


def _ivfpq_rescore_ctes(cap: int) -> str:
    from sarpro_spark.queries import sql_fround

    dp = (
        "list_sum(list_transform(range(1, len(s.v) + 1), "
        "i -> CAST(s.v[i] AS DOUBLE) * CAST(s.qv[i] AS DOUBLE)))"
    )
    nv = "SQRT(list_sum(list_transform(s.v, x -> CAST(x AS DOUBLE) * x)))"
    nq_ = "SQRT(list_sum(list_transform(s.qv, x -> CAST(x AS DOUBLE) * x)))"
    return _IVFPQ_RESCORE.format(
        cap=cap, simexpr=sql_fround(f"({dp}) / ({nv} * {nq_})"), nv=nv, nq=nq_
    )


def _topk_ivfpq_sql(nprobe: int = 2, kc: int = _IVF_K, nq: int = 5,
                    k: int = 10, mult: int = 4) -> str:
    return f"""
WITH {_ivfpq_core_ctes(nprobe, kc, nq)},
{_ivfpq_rescore_ctes(k * mult)}
SELECT query_id, vec_id, adc_sim, sim, rnk FROM (
  SELECT query_id, vec_id, adc_sim, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
  FROM ivres
) r WHERE rnk <= {k}
""".strip()


def _ivfpq_recall_sql(k: int = 5, nprobes: tuple = (1, 2, 4), mults: tuple = (1, 2, 4),
                      kc: int = _IVF_K, nq: int = 5) -> str:
    from sarpro_spark.queries import sql_fround

    mmax = max(mults)
    qsel = f"SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {nq}"
    truth = sim.sql_cosine_ctes("embeddings", qsel, prefix="tr_")
    legs = []
    for np_ in nprobes:
        inner = f"""
WITH {_ivfpq_core_ctes(np_, kc, nq)},
{_ivfpq_rescore_ctes(k * mmax)}
SELECT query_id, vec_id, arnk, sim FROM ivres
""".strip()
        for mm in mults:
            legs.append(f"""
  SELECT t.query_id, {np_} AS nprobe, {mm} AS mult,
         CAST(SUM(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM truth t LEFT JOIN (
    SELECT query_id, vec_id FROM (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
      FROM ({inner}) z WHERE arnk <= {k * mm}
    ) q WHERE rnk <= {k}
  ) p ON p.query_id = t.query_id AND p.vec_id = t.vec_id
  GROUP BY t.query_id""".strip())
    body = "\n  UNION ALL\n  ".join(legs)
    return f"""
WITH {truth},
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
    FROM tr_scored
  ) r WHERE rnk <= {k}
),
perq AS (
  {body}
)
SELECT query_id, nprobe, mult, hits,
       {sql_fround(f"hits / {float(k)!r}")} AS recall,
       (hits >= COALESCE(LAG(hits) OVER (PARTITION BY query_id, nprobe ORDER BY mult), hits)) AS monotone_ok
FROM perq
""".strip()


_TOPK_IVFPQ_SQL = _topk_ivfpq_sql()


@query("similarity_topk_ivfpq", sql=_TOPK_IVFPQ_SQL, tags=("llm", "similarity"))
def q_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ combined ANN (r13, verdict item 7 — the ladder's production
    top rung): coarse quantizer partitions the corpus into inverted lists,
    PQ codes (4 subspaces x 16 centroids) ride inside the lists, a query
    probes its nprobe=2 nearest lists, ADC-scores ONLY those lists' codes
    via the broadcast lookup table, and the exact float cosine reranks a
    k*4 shortlist — per-query work ~ corpus/n_centroids * nprobe * m
    code rows, the cells-and-codes economics of a production ANN service.
    adc_sim rides next to the exact sim in the hashed row; centroid
    scoring, list assignment, probes, codebook training, codes, ADC
    arithmetic, and both rank windows are all inside the certificate."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_ivfpq(
        e, _spark_queries_frame(spark, sf_dir), k=10,
        n_centroids=_IVF_K, nprobe=2,
    )


_RECALL_IVFPQ_SQL = _ivfpq_recall_sql()


@query("ann_recall_ivfpq", sql=_RECALL_IVFPQ_SQL, tags=("llm", "similarity", "quality"))
def q_ann_recall_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ recall frontier over the nprobe x shortlist grid (r13): per
    query and nprobe in {1,2,4}, how many of the EXACT top-5 survive an
    ADC shortlist of 5m (m = 1/2/4) + exact rerank. Within a fixed nprobe
    the shortlist is a prefix relation so hits is PROVABLY non-decreasing
    in m (monotone_ok pins it per row); across nprobe the frontier values
    are hashed as observed data — a bigger candidate pool is not a
    superset of the ADC shortlist, so cross-probe monotonicity is shown,
    not asserted."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.ivfpq_recall_sweep(
        e, _spark_queries_frame(spark, sf_dir), k=5, n_centroids=_IVF_K,
    )


def _topk_maxsim_sql(nprobe: int = _IVF_NPROBE, kc: int = _IVF_K, nq: int = 5,
                     k: int = 10) -> str:
    from sarpro_spark.llm.lateinteraction import sql_maxsim_expr

    ms = sql_fround(sql_maxsim_expr("q.qvec", "e.embedding"))
    return f"""
WITH {_ivf_cand_ctes(nprobe, kc, nq)},
msc AS (
  SELECT c.query_id, c.vec_id, {ms} AS maxsim
  FROM ivcand c JOIN embeddings e USING (vec_id) JOIN queries q USING (query_id)
)
SELECT query_id, vec_id, maxsim, rnk FROM (
  SELECT query_id, vec_id, maxsim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY maxsim DESC, vec_id) AS rnk
  FROM msc
) r WHERE rnk <= {k}
""".strip()


_TOPK_MAXSIM_SQL = _topk_maxsim_sql()


@query("similarity_topk_maxsim", sql=_TOPK_MAXSIM_SQL, tags=("llm", "similarity"))
def q_topk_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction MaxSim retrieval (llm/lateinteraction.py, r13 —
    the ColBERT scoring family, Khattab & Zaharia 2020): documents and
    queries are bags of 4 x 16-d token slices and the score is the sum
    over query slices of the max slice cosine — fine-grained term matching
    that single-vector cosine collapses.  Production shape certified here:
    candidates come from the probed IVF inverted lists (the same coarse
    quantizer as the IVF/IVF-PQ rungs) and the t*t interaction block — a
    fixed tree of fround'd, sentinel-guarded cosines, no float aggregates
    anywhere — runs only on candidate pairs inside whole-stage codegen."""
    from sarpro_spark.llm.lateinteraction import maxsim_topk_ivf

    e = frames.load_table(spark, sf_dir, "embeddings")
    return maxsim_topk_ivf(
        e, _spark_queries_frame(spark, sf_dir), k=10,
        n_centroids=_IVF_K, nprobe=_IVF_NPROBE,
    )


def _maxsim_recall_sql(k: int = 5, nprobes: tuple = (1, 2, 4), kc: int = _IVF_K,
                       nq: int = 5) -> str:
    from sarpro_spark.llm.lateinteraction import sql_maxsim_expr

    qsel = f"SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {nq}"
    ms = sql_fround(sql_maxsim_expr("q.qvec", "e.embedding"))
    legs = []
    for np_ in nprobes:
        inner = f"""
WITH {_ivf_cand_ctes(np_, kc, nq)},
msc AS (
  SELECT c.query_id, c.vec_id, {ms} AS maxsim
  FROM ivcand c JOIN embeddings e USING (vec_id) JOIN queries q USING (query_id)
)
SELECT query_id, vec_id FROM (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY maxsim DESC, vec_id) AS rnk
  FROM msc
) r WHERE rnk <= {k}
""".strip()
        legs.append(f"""
  SELECT t.query_id, {np_} AS nprobe,
         CAST(SUM(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM ms_truth t LEFT JOIN ({inner}) p USING (query_id, vec_id)
  GROUP BY t.query_id""".strip())
    body = "\n  UNION ALL\n  ".join(legs)
    from sarpro_spark.queries import sql_fround as _fr

    return f"""
WITH ms_all AS (
  SELECT q.query_id, e.vec_id, {ms} AS maxsim
  FROM embeddings e, ({qsel}) q
),
ms_truth AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY maxsim DESC, vec_id) AS rnk
    FROM ms_all
  ) r WHERE rnk <= {k}
),
perq AS (
  {body}
)
SELECT query_id, nprobe, hits, {_fr(f"hits / {float(k)!r}")} AS recall
FROM perq
""".strip()


@query("ann_recall_maxsim", sql=_maxsim_recall_sql(), tags=("llm", "similarity", "quality"))
def q_ann_recall_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxSim recall frontier (r13): how many of the EXACT late-interaction
    top-5 survive the IVF-gated rerank at nprobe 1/2/4.  Probed lists
    nest but a wider candidate pool can displace truth items, so the
    frontier values are hashed as OBSERVED data (the ivfpq cross-probe
    doctrine) — index quality for the MaxSim rung as data, completing
    the every-rung-has-a-frontier invariant of the ANN ladder."""
    from sarpro_spark.llm.lateinteraction import maxsim_recall_sweep

    e = frames.load_table(spark, sf_dir, "embeddings")
    return maxsim_recall_sweep(
        e, _spark_queries_frame(spark, sf_dir), k=5, n_centroids=_IVF_K,
    )


_NEG_DUP_T = 0.98
_NEG_K = 5


def _hard_negatives_sql(nprobe: int = _IVF_NPROBE, kc: int = _IVF_K, nq: int = 5,
                        k: int = _NEG_K, dup_t: float = _NEG_DUP_T) -> str:
    dp = (
        "list_sum(list_transform(range(1, len(e.embedding) + 1), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))"
    )
    nv = "SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)))"
    nq_ = "SQRT(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * x)))"
    simexpr = sql_fround(f"({dp}) / ({nv} * {nq_})")
    return f"""
WITH {_ivf_cand_ctes(nprobe, kc, nq)},
hn_scored AS (
  SELECT c.query_id, c.vec_id, {simexpr} AS sim
  FROM ivcand c JOIN embeddings e USING (vec_id) JOIN queries q USING (query_id)
  WHERE {nv} > 0 AND {nq_} > 0
),
hn_excl AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_excluded
  FROM hn_scored WHERE sim >= {dup_t!r} GROUP BY 1
)
SELECT n.query_id, n.vec_id, n.sim, n.rnk,
       COALESCE(x.n_excluded, 0) AS n_excluded
FROM (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
  FROM hn_scored WHERE sim < {dup_t!r}
) n LEFT JOIN hn_excl x USING (query_id)
WHERE n.rnk <= {k}
""".strip()


@query("contrastive_hard_negatives", sql=_hard_negatives_sql(), tags=("llm", "similarity", "sampling"))
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (r13): per query, the
    k most similar corpus vectors BELOW the near-duplicate threshold
    (sim < 0.98) — the highest-value negatives — with the count of
    excluded near-dups/self hashed alongside (n_excluded >= 1 always:
    a query's own probed list contains itself at sim 1.0).  Candidates
    come from the probed IVF lists (the production retrieve-then-mine
    shape); dedup exclusion and ranks are all inside the certificate."""
    from pyspark.sql.window import Window

    e = frames.load_table(spark, sf_dir, "embeddings")
    queries = _spark_queries_frame(spark, sf_dir)
    centroids = sim.ivf_centroids(e, _IVF_K)
    from sarpro_spark.functions.partitioning import widen_if_narrow

    emb = widen_if_narrow(e, "vec_id")
    assign = sim.ivf_assign(emb, centroids)
    qsim = queries.join(F.broadcast(centroids)).select(
        F.col("query_id"),
        F.col("centroid_id"),
        fround(sim.cosine_expr(F.col("qvec"), F.col("cvec")), 6).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    probed = (
        qsim.withColumn("rnk", F.row_number().over(wq))
        .where(F.col("rnk") <= _IVF_NPROBE)
        .select("query_id", "centroid_id")
    )
    cand = probed.join(assign, "centroid_id").select("query_id", "vec_id").distinct()
    qv = queries.select("query_id", "qvec")
    scored = (
        cand.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            fround(
                sim.cosine_expr(
                    F.col("embedding").cast("array<double>"),
                    F.col("qvec").cast("array<double>"),
                ),
                6,
            ).alias("sim"),
        )
        .where(F.col("sim").isNotNull())
    )
    excl = (
        scored.where(F.col("sim") >= _NEG_DUP_T)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_excluded"))
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.where(F.col("sim") < _NEG_DUP_T)
        .withColumn("rnk", F.row_number().over(wf))
        .where(F.col("rnk") <= _NEG_K)
        .join(F.broadcast(excl), "query_id", "left")
        .select(
            "query_id", "vec_id", "sim", "rnk",
            F.coalesce(F.col("n_excluded"), F.lit(0)).cast("long").alias("n_excluded"),
        )
    )


_RECALL_PQ_SQL = sim.sql_pq_recall_sweep("embeddings", _QUERY_SEL, k=5)


@query("ann_recall_pq", sql=_RECALL_PQ_SQL, tags=("llm", "similarity", "quality"))
def q_ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall frontier of the PQ-ADC pipeline (r12): per query, how many
    of the EXACT top-5 survive an ADC shortlist of 5m (m = 1/2/4) + exact
    rerank — completing the quantization ladder's recall evidence
    (LSH/IVF probes, 1-bit Hamming, now PQ codebooks) with the same
    hashed monotone_ok pin: ONE ADC scan serves all multipliers, hits
    provably non-decreasing in m."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.pq_recall_sweep(e, _spark_queries_frame(spark, sf_dir), k=5)


_RECALL_BINARY_SQL = sim.sql_binary_recall_sweep("embeddings", _QUERY_SEL, k=5)


@query("ann_recall_binary", sql=_RECALL_BINARY_SQL, tags=("llm", "similarity", "quality"))
def q_ann_recall_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall frontier of the 1-bit pipeline (r11): per query, how many of
    the EXACT top-5 survive a Hamming shortlist of 5m (m = 1/2/4) + exact
    rerank — the recall-vs-cost ladder as hashed DATA, same doctrine as
    the LSH/IVF and doc-side probe sweeps. ONE Hamming scan and ONE
    rescoring pass serve all three multipliers (smaller m = prefix filter
    on the same ranked relation); hits is provably non-decreasing in m
    and monotone_ok pins that per row."""
    e = frames.load_table(spark, sf_dir, "embeddings")
    return sim.binary_recall_sweep(e, _spark_queries_frame(spark, sf_dir), k=5)


# --- training-sequence packing + mixture planning -----------------------------


def _pack_assign_sql() -> str:
    from sarpro_spark.llm.packing import sql_pack_assignments

    return sql_pack_assignments()


@query("corpus_pack_assignments", sql=_pack_assign_sql(), tags=("llm", "packing"))
def q_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing, per-document leg: deterministic md5 shard +
    per-shard prefix-sum offsets -> which fixed-length training sequences
    each doc's tokens occupy. The window partitions by bucket, so the prefix
    sum parallelizes across shards (no global order, no single-task window)."""
    from sarpro_spark.llm import packing as pk

    d = frames.load_table(spark, sf_dir, "documents")
    return pk.pack_assignments(d)


def _pack_seq_sql() -> str:
    from sarpro_spark.llm.packing import sql_pack_sequences

    return sql_pack_sequences()


@query("corpus_pack_sequences", sql=_pack_seq_sql(), tags=("llm", "packing"))
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing, per-sequence leg: docs explode onto the
    sequences they span (bounded factor), one hash aggregate per (shard,
    seq) -> fill stats. Every sequence is exactly seq_len tokens except each
    shard's ragged tail."""
    from sarpro_spark.llm import packing as pk

    d = frames.load_table(spark, sf_dir, "documents")
    return pk.pack_sequences(d)


def _mixture_sql() -> str:
    from sarpro_spark.llm.packing import sql_mixture_plan

    return sql_mixture_plan()


@query("corpus_mixture_plan", sql=_mixture_sql(), tags=("llm", "packing", "sampling"))
def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture planner: per-source token inventory vs target weights
    at a token budget -> Bernoulli sample rate (downsample) or repeat factor
    (upsample epochs). Two aggregates; the global total rides a 1-row
    broadcast."""
    from sarpro_spark.llm import packing as pk

    d = frames.load_table(spark, sf_dir, "documents")
    return pk.mixture_plan(d)


# --- TF-IDF lexical similarity -----------------------------------------------


def _tfidf_topk_sql() -> str:
    from sarpro_spark.llm.tfidf import sql_tfidf_topk_similar

    return sql_tfidf_topk_similar()


@query("tfidf_topk_similar", sql=_tfidf_topk_sql(), tags=("llm", "similarity", "text"))
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical top-k neighbors per doc via L2-normalized tf-idf and an
    inverted-index self-join on the term (pairs only where content is
    shared, stop terms df-capped — never doc x doc)."""
    from sarpro_spark.llm import tfidf as ti

    d = frames.load_table(spark, sf_dir, "documents")
    return ti.tfidf_topk_similar(d)


def _tfidf_terms_sql() -> str:
    from sarpro_spark.llm.tfidf import sql_tfidf_top_terms

    return sql_tfidf_top_terms()


@query("tfidf_top_terms", sql=_tfidf_terms_sql(), tags=("llm", "text"))
def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each doc's highest-weighted tf-idf terms — certifies the weighting +
    normalization stage of the lexical similarity chain."""
    from sarpro_spark.llm import tfidf as ti

    d = frames.load_table(spark, sf_dir, "documents")
    return ti.tfidf_top_terms(d)


def _dup_passages_sql() -> str:
    from sarpro_spark.llm.filters import sql_duplicated_passages

    return sql_duplicated_passages()


@query("text_dup_passages", sql=_dup_passages_sql(), tags=("llm", "text", "hygiene", "dedup"))
def q_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication signal: per doc, the fraction of word
    shingles occurring in >= 2 docs and the longest consecutive duplicated
    run (largest shared passage). Shingle-keyed aggregate + join back —
    never doc x doc."""
    from sarpro_spark.llm import filters as fl

    d = frames.load_table(spark, sf_dir, "documents")
    return fl.duplicated_passages(d)


def _inc_dedup_sql() -> str:
    from sarpro_spark.llm.dedup import sql_incremental_dedup

    return sql_incremental_dedup()


@query("dedup_incremental", sql=_inc_dedup_sql(), tags=("llm", "dedup"))
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: a deterministic 30% batch checked against
    the 70% index — exact fingerprint left-join + MinHash-LSH band
    candidates (batch x index buckets only) with exact-jaccard verification.
    The index never self-joins."""
    from sarpro_spark.llm import dedup as dd2

    d = frames.load_table(spark, sf_dir, "documents")
    return dd2.incremental_dedup(d)


# --- streaming incremental near-dup (batch-twin certificate) -----------------


def _streaming_neardup_sql() -> str:
    from sarpro_spark.llm.dedup import sql_minhash_ctes
    from sarpro_spark.streaming import dedup as sdd

    nh, bands = sdd.DEFAULT_NUM_HASHES, sdd.DEFAULT_BANDS
    rpb = nh // bands
    ctes = sql_minhash_ctes("documents", num_hashes=nh)
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, MD5("
        + " || '|' || ".join(f"sig_{b * rpb + r}" for r in range(rpb))
        + ") AS bucket FROM sigs"
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)" for i in range(nh)
    )
    return f"""
WITH {ctes},
banded AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS matched_id, b.doc_id AS doc_id
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
),
agree AS (
  SELECT c.doc_id, c.matched_id, ({agree}) / {float(nh)!r} AS est
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.matched_id
  JOIN sigs sb ON sb.doc_id = c.doc_id
),
hits AS (
  SELECT doc_id, MIN(matched_id) AS first_match, COUNT(*) AS n_earlier_matches
  FROM agree WHERE est >= {sdd.DEFAULT_THRESHOLD!r} GROUP BY doc_id
)
SELECT d.doc_id, h.first_match IS NOT NULL AS is_dup, h.first_match,
       COALESCE(h.n_earlier_matches, 0) AS n_earlier_matches
FROM documents d LEFT JOIN hits h USING (doc_id)
""".strip()


@query("dedup_streaming_neardup", sql=_streaming_neardup_sql(), tags=("llm", "dedup", "streaming"))
def q_dedup_streaming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental near-dup, certified through its batch twin
    (streaming/dedup.py): a document STREAM dedups against the accumulated
    corpus via stateless column-expression MinHash signatures + ONE
    applyInPandasWithState stage keyed by (band, bucket); the drained
    stream's match rows equal the pairwise batch rule 'doc b matches every
    earlier a sharing a band bucket with signature agreement >= 0.75'
    (asserted stream-vs-batch in tests/test_streaming.py). This query
    hashes the per-doc verdicts (is_dup, first earlier match, match count)
    over every document. At the pinned 16-hash/0.75 setting, the estimate
    recovers exactly the pairs the exact-jaccard pipeline verifies at 0.5
    on this corpus (25/25). State scale contract: signatures only (16
    longs/doc) per bucket, hot buckets capped."""
    from sarpro_spark.streaming import dedup as sdd

    d = frames.load_table(spark, sf_dir, "documents")
    matches = sdd.streaming_neardup_batch(d)
    return sdd.neardup_verdicts_from_matches(matches, d.select("doc_id"))


# --- r9: stream-stream near-dup (two live streams) ---------------------------


def _stream_stream_neardup_sql() -> str:
    from sarpro_spark.llm.dedup import sql_minhash_ctes
    from sarpro_spark.streaming import dedup as sdd

    nh, bands = sdd.DEFAULT_NUM_HASHES, sdd.DEFAULT_BANDS
    rpb = nh // bands
    ctes = sql_minhash_ctes("documents", num_hashes=nh)
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, MD5("
        + " || '|' || ".join(f"sig_{b * rpb + r}" for r in range(rpb))
        + ") AS bucket FROM sigs"
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)" for i in range(nh)
    )
    return f"""
WITH {ctes},
banded AS (
  {band_selects}
),
xpairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_bands
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
  GROUP BY a.doc_id, b.doc_id
),
xagree AS (
  SELECT p.a_id, p.b_id, p.n_bands, ({agree}) / {float(nh)!r} AS est
  FROM xpairs p
  JOIN sigs sa ON sa.doc_id = p.a_id
  JOIN sigs sb ON sb.doc_id = p.b_id
)
SELECT a_id, b_id, n_bands, est FROM xagree WHERE est >= {sdd.DEFAULT_THRESHOLD!r}
""".strip()


@query("dedup_stream_stream_neardup", sql=_stream_stream_neardup_sql(), tags=("llm", "dedup", "streaming"))
def q_dedup_stream_stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 stream-STREAM near-dup, certified through its batch twin
    (streaming/dedup.py stream_stream_neardup): near-duplicates ACROSS two
    live document streams (e.g. a crawl stream vs an ingest stream) — the
    last cell of the dedup temporal matrix after batch-vs-batch,
    batch-vs-index and stream-vs-corpus. The streaming plan unions the two
    tagged streams through the stateless signature stage into ONE
    applyInPandasWithState keyed (band, bucket) whose state holds BOTH
    sides' signatures; each arrival matches only the opposite side, so
    every cross pair emits exactly once, oriented (a_id, b_id), for ANY
    interleaving (drained == twin asserted in tests/test_streaming.py,
    including reversed arrival). This query hashes the twin's distinct
    cross pairs (band hit count + signature agreement) with the fixture
    corpus split by doc_id parity into the two 'streams'."""
    from sarpro_spark.streaming import dedup as sdd

    d = frames.load_table(spark, sf_dir, "documents")
    a = d.where(F.col("doc_id") % 2 == 0)
    b = d.where(F.col("doc_id") % 2 == 1)
    m = sdd.stream_stream_neardup_batch(a, b)
    return m.groupBy("a_id", "b_id").agg(
        F.count(F.lit(1)).alias("n_bands"),
        F.max("est_sim").alias("est"),
    )


# --- trainable quality classifier --------------------------------------------


def _clf_train_sql() -> str:
    from sarpro_spark.llm.classifier import sql_train_quality_classifier

    return sql_train_quality_classifier()


@query("quality_classifier_train", sql=_clf_train_sql(), tags=("llm", "text", "classifier", "iterative"))
def q_clf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression quality classifier training log: full-batch GD,
    one gradient aggregate + one 1-row model-state collect per step
    (the k-means/BPE exception); 9-digit state rounding locks the
    cross-engine trajectory."""
    from sarpro_spark.llm import classifier as cf

    d = frames.load_table(spark, sf_dir, "documents")
    _, log = cf.train_quality_classifier(d)
    return log


def _clf_score_sql() -> str:
    from sarpro_spark.llm.classifier import sql_score_quality_classifier

    return sql_score_quality_classifier()


@query("quality_classifier_scores", sql=_clf_score_sql(), tags=("llm", "text", "classifier"))
def q_clf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every doc scored by the trained quality model (curated-source proxy
    labels): score + predicted flag — the corpus-filtering surface."""
    from sarpro_spark.llm import classifier as cf

    d = frames.load_table(spark, sf_dir, "documents")
    w, _ = cf.train_quality_classifier(d)
    return cf.score_quality_classifier(d, w)


# --- PCA embedding compression ------------------------------------------------


def _pca_comp_sql() -> str:
    from sarpro_spark.llm.pca import sql_pca_components

    return sql_pca_components()


@query("embedding_pca", sql=_pca_comp_sql(), tags=("llm", "similarity", "iterative"))
def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA fit over the embedding corpus: Arrow-partial raw moments (one
    corpus pass, d+d^2 combine rows), driver-side rounded power iteration
    with deflation on the 32 KB covariance (model state). Top-2 components
    + eigenvalues + the mean vector."""
    from sarpro_spark.llm import pca

    e = frames.load_table(spark, sf_dir, "embeddings")
    return pca.pca_components(e)


def _pca_proj_sql() -> str:
    from sarpro_spark.llm.pca import sql_pca_project

    return sql_pca_project()


@query("embedding_pca_project", sql=_pca_proj_sql(), tags=("llm", "similarity"))
def q_embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every embedding projected onto the fitted principal components — the
    dimensionality-reduction surface (components ride as literals, so the
    projection is one codegen'd pass)."""
    from sarpro_spark.llm import pca

    e = frames.load_table(spark, sf_dir, "embeddings")
    return pca.pca_project(e)


def _bigram_sql() -> str:
    from sarpro_spark.llm.text import sql_bigram_logprob
    from sarpro_spark.queries import sql_fround

    inner = sql_bigram_logprob("documents")
    return (
        f"SELECT doc_id, n_bigrams, {sql_fround('mean_nll2')} AS mean_nll2 "
        f"FROM (\n{inner}\n) b"
    )


@query("text_bigram_logprob", sql=_bigram_sql(), tags=("llm", "text", "hygiene"))
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM (Jelinek-Mercer over the capped bigram table
    with add-one unigram backoff) — the next rung above the unigram CCNet
    filter; catches shuffled-word salads unigram fluency misses. Three
    broadcast-joined count tables over one pair explode."""
    from sarpro_spark.llm.text import bigram_logprob_scores
    from sarpro_spark.queries import round_floats

    d = frames.load_table(spark, sf_dir, "documents")
    return round_floats(bigram_logprob_scores(d))


# --- cardinality sketches -----------------------------------------------------

#: HLL++ relative-error budget: rsd 0.05 requested; the assertion allows 3x
#: headroom (the published bound is a standard deviation, not a maximum)
_HLL_RSD = 0.05
_HLL_TOL = 3 * _HLL_RSD

_CARDINALITY_SQL = """
SELECT source,
  COUNT(*) AS n_docs,
  CAST(COUNT(DISTINCT SUBSTR(MD5(REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g')), 1, 16)) AS BIGINT) AS distinct_fp,
  CAST(COUNT(DISTINCT lang) AS BIGINT) AS distinct_lang,
  TRUE AS fp_approx_ok
FROM documents
GROUP BY source
""".strip()


@query("corpus_cardinality_sketch", sql=_CARDINALITY_SQL, tags=("llm", "sketch", "agg"))
def q_cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality sketching: per-source distinct-content counts. The exact
    legs hash directly; the HLL++ approx_count_distinct leg is reduced to a
    boolean asserting its own error bound (|approx - exact| <= tol * exact)
    — the histogram_stats_approx pattern, so sketch drift past the bound
    flips a hashed value. At 100 TB the exact distinct is the expensive
    path (full shuffle on the fingerprint) and the sketch is the production
    one: fixed-size mergeable state, map-side combined, no shuffle growth."""
    from sarpro_spark.llm.text import fingerprint_expr

    d = frames.load_table(spark, sf_dir, "documents")
    fp = fingerprint_expr(F.col("text"))
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("distinct_fp"),
        F.countDistinct("lang").alias("distinct_lang"),
        F.approx_count_distinct(fp, _HLL_RSD).alias("_approx_fp"),
    )
    ok = (
        F.abs(F.col("_approx_fp") - F.col("distinct_fp"))
        <= F.lit(_HLL_TOL) * F.col("distinct_fp")
    )
    return agg.select(
        "source", "n_docs", "distinct_fp", "distinct_lang", ok.alias("fp_approx_ok")
    )


def _pagerank_sql() -> str:
    from sarpro_spark.llm.graph import sql_pagerank

    mentions = (
        f"SELECT doc_id, UNNEST(regexp_extract_all({_URL_AUG}, '{_URL_RE}', 1)) AS domain "
        "FROM documents"
    )
    return sql_pagerank(mentions)


@query("domain_pagerank", sql=_pagerank_sql(), tags=("llm", "graph", "iterative"))
def q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the host co-citation graph (the Common-Crawl
    curation prior): doc-keyed co-citation edges, damped iteration with
    dangling-mass redistribution, rank vector kept distributed; 9-digit
    state rounding + off-grid seeding lock the trajectory across engines."""
    from sarpro_spark.llm import graph as gr

    d = frames.load_table(spark, sf_dir, "documents")
    pid = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit(" see https://site"), (pid % 7).cast("string"),
        F.lit(".example.com/page and http://cdn"), (pid % 3).cast("string"),
        F.lit(".example.net/asset"),
    )
    mentions = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(aug, F.lit(_URL_RE), 1)).alias("domain"),
    )
    return gr.pagerank(gr.cocitation_edges(mentions))


# --- count-min-sketch heavy hitters -------------------------------------------

#: CMS geometry: d hash rows x w columns (deterministic md5-derived hashes,
#: identical in the oracle — the sketch itself is exact-reproducible)
_CMS_D = 4
_CMS_W = 512
_CMS_TOPK = 20


def _cms_cell(term: F.Column, row: int) -> F.Column:
    h = F.md5(F.concat(F.lit(f"cms{row}"), F.lit("|"), term))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _CMS_W


def _sql_cms_cell(term: str, row: int) -> str:
    return (
        f"CAST(('0x' || SUBSTR(MD5('cms{row}' || '|' || {term}), 1, 15)) AS BIGINT) % {_CMS_W}"
    )


def _cms_sql() -> str:
    toks = (
        "SELECT UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> '')) AS term "
        "FROM documents"
    )
    cells = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, {_sql_cms_cell('term', r)} AS c FROM toks"
        for r in range(_CMS_D)
    )
    est = "LEAST(" + ", ".join(
        f"(SELECT cnt FROM cms WHERE r = {r} AND c = {_sql_cms_cell('t.term', r)})"
        for r in range(_CMS_D)
    ) + ")"
    return f"""
WITH toks AS MATERIALIZED ({toks}),
cms AS MATERIALIZED (
  SELECT r, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM ({cells}) z GROUP BY r, c
),
exact AS MATERIALIZED (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_count FROM toks GROUP BY term
  ORDER BY exact_count DESC, term ASC LIMIT {_CMS_TOPK}
)
SELECT t.term, t.exact_count, {est} AS cms_estimate,
       ({est} >= t.exact_count) AS never_underestimates
FROM exact t
""".strip()


@query("terms_heavy_hitters_cms", sql=_cms_sql(), tags=("llm", "sketch", "agg"))
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: the d x w counter matrix is built in
    one aggregate over d exploded hash cells (fixed-size mergeable state —
    the sketch survives any corpus size), the top-k terms' estimates are
    read back via d broadcast lookups, and the CMS guarantee (estimate >=
    exact, overshoot bounded by collisions) is emitted as data. Unlike the
    HLL leg this sketch is deterministically reproducible, so the oracle
    matches it value-for-value, not just within bounds."""
    from sarpro_spark.llm.text import tokens_expr

    d = frames.load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens_expr(F.col("text"))).alias("term"))
    cell_frames = [
        toks.select(F.lit(r).alias("r"), _cms_cell(F.col("term"), r).alias("c"))
        for r in range(_CMS_D)
    ]
    cells = cell_frames[0]
    for cf in cell_frames[1:]:
        cells = cells.unionByName(cf)
    cms = cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))
    exact = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("term").asc())
        .limit(_CMS_TOPK)
    )
    j = exact
    for r in range(_CMS_D):
        cr = cms.where(F.col("r") == r).select(
            F.col("c").alias(f"_c{r}"), F.col("cnt").alias(f"_cnt{r}")
        )
        j = j.join(
            F.broadcast(cr), _cms_cell(F.col("term"), r) == F.col(f"_c{r}"), "left"
        )
    est = F.least(*[F.col(f"_cnt{r}") for r in range(_CMS_D)])
    return j.select(
        "term",
        "exact_count",
        est.alias("cms_estimate"),
        (est >= F.col("exact_count")).alias("never_underestimates"),
    )


# --- end-to-end curation funnel ----------------------------------------------

_FUNNEL_QSCORE = 0.45
_FUNNEL_SAMPLE = 0.5


def _funnel_sql() -> str:
    from sarpro_spark.llm.sampling import BUCKETS, sql_hash_bucket
    from sarpro_spark.llm.text import sql_lang_id

    ntok = "LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> ''))"
    norm_md5 = "MD5(REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g'))"
    lt = "LOWER(text)"
    # build q_score from the same fragments _QUALITY_SQL uses
    from sarpro_spark.llm.text import LANG_STOPWORDS, sql_count_word

    padded = "(' ' || LOWER(text) || ' ')"
    stops = " + ".join(sql_count_word(padded, w) for w in LANG_STOPWORDS["en"])
    mean_tok = (
        f"CASE WHEN {ntok} > 0 THEN CAST(LENGTH(REGEXP_REPLACE({lt}, '[^a-z0-9]', '', 'g')) AS DOUBLE)"
        f" / {ntok} ELSE 0.0 END"
    )
    punct = f"CAST(LENGTH(REGEXP_REPLACE({lt}, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / GREATEST(LENGTH(text), 1)"
    stopr = f"CAST({stops} AS DOUBLE) / GREATEST({ntok}, 1)"
    qscore = (
        f"(LEAST(CAST({ntok} AS DOUBLE) / 50.0, 1.0) * 0.4"
        f" + (1.0 - LEAST(({punct}) * 5.0, 1.0)) * 0.2"
        f" + LEAST(({stopr}) * 4.0, 1.0) * 0.2"
        f" + (CASE WHEN ({mean_tok}) >= 3.0 AND ({mean_tok}) <= 8.0 THEN 1.0 ELSE 0.0 END) * 0.2)"
    )
    cut = int(_FUNNEL_SAMPLE * BUCKETS)
    return f"""
WITH raw AS MATERIALIZED (
  SELECT doc_id, text, CAST({ntok} AS BIGINT) AS n_tok FROM documents
),
s1 AS MATERIALIZED (
  SELECT r.* FROM raw r
  JOIN (SELECT MIN(doc_id) AS keep FROM documents GROUP BY {norm_md5}) d
    ON d.keep = r.doc_id
),
s2 AS MATERIALIZED (SELECT * FROM s1 WHERE {qscore} >= {_FUNNEL_QSCORE!r}),
s3 AS MATERIALIZED (SELECT * FROM s2 WHERE {sql_lang_id('text')} <> 'und'),
s4 AS MATERIALIZED (
  SELECT * FROM s3 WHERE {sql_hash_bucket('doc_id', 'funnel')} < {cut}
)
SELECT 0 AS stage, 'raw' AS stage_name, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM raw
UNION ALL SELECT 1, 'dedup_exact_normalized', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tok) AS BIGINT) FROM s1
UNION ALL SELECT 2, 'quality_floor', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tok) AS BIGINT) FROM s2
UNION ALL SELECT 3, 'lang_identified', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tok) AS BIGINT) FROM s3
UNION ALL SELECT 4, 'sampled', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tok) AS BIGINT) FROM s4
""".strip()


@query("corpus_curation_funnel", sql=_funnel_sql(), tags=("llm", "pipeline", "e2e"))
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline composed end-to-end, certified as one
    plan: normalized exact dedup (keep-canonical anti-join) -> quality
    floor -> language-identified only -> deterministic Bernoulli sample,
    with a per-stage (docs, tokens) funnel as the output. Every stage is a
    filter/semi-join over the previous — Catalyst collapses the chain into
    scan + filters + one dedup aggregate; nothing rescans the corpus per
    stage."""
    from sarpro_spark.llm import dedup as dd2
    from sarpro_spark.llm import text as tx2
    from sarpro_spark.llm.sampling import BUCKETS, hash_bucket
    from sarpro_spark.llm.text import token_count

    d = frames.load_table(spark, sf_dir, "documents")
    raw = d.select("doc_id", "text", token_count(F.col("text")).cast("long").alias("n_tok"))
    keep = (
        d.select(F.md5(dd2.normalize_text_expr(F.col("text"))).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep"))
        .select("keep")
    )
    s1 = raw.join(keep, raw["doc_id"] == keep["keep"], "left_semi")
    q = tx2.quality_features(s1)
    s2 = q.where(F.col("q_score") >= _FUNNEL_QSCORE).select("doc_id", "text", "n_tok")
    s3 = s2.where(tx2.lang_id_expr(F.col("text")) != "und")
    s4 = s3.where(hash_bucket(F.col("doc_id"), "funnel") < int(_FUNNEL_SAMPLE * BUCKETS))

    def leg(df, stage, name):
        return df.agg(
            F.lit(stage).alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).alias("n_tokens"),
        ).select("stage", "stage_name", "n_docs", "n_tokens")

    out = leg(raw, 0, "raw")
    for df, st, nm in (
        (s1, 1, "dedup_exact_normalized"),
        (s2, 2, "quality_floor"),
        (s3, 3, "lang_identified"),
        (s4, 4, "sampled"),
    ):
        out = out.unionByName(leg(df, st, nm))
    return out


@query("similarity_topk_ivf_persisted", sql=_TOPK_IVF_SQL, tags=("llm", "similarity", "index"))
def q_topk_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index LIFECYCLE certificate: the IVF index (centroid table + per-
    vector list assignments) is materialized to parquet executor-side,
    reloaded as the serving copy, and queried — results must be identical
    to the fresh-built index (same oracle as similarity_topk_ivf). At
    production scale this is the offline-build / online-serve split: the
    assignment table is written partitioned by list id so a probe reads
    only its lists' files."""
    import tempfile

    e = frames.load_table(spark, sf_dir, "embeddings")
    cents = sim.ivf_centroids(e, _IVF_K)
    assign = sim.ivf_assign(e, cents)
    root = tempfile.mkdtemp(prefix="sarpro_ivf_idx_")
    cents.write.mode("overwrite").parquet(f"{root}/centroids")
    assign.join(e, "vec_id").write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{root}/lists"
    )
    cents_l = spark.read.parquet(f"{root}/centroids")
    lists_l = spark.read.parquet(f"{root}/lists")
    return sim.cosine_topk_ivf_from_index(
        cents_l, lists_l, _spark_queries_frame(spark, sf_dir), k=5, nprobe=_IVF_NPROBE
    )


@query("similarity_topk_ivfpq_persisted", sql=_TOPK_IVFPQ_SQL, tags=("llm", "similarity", "index"))
def q_topk_ivfpq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ index LIFECYCLE certificate (r13): all four index relations
    — centroid table, PQ codebooks, list assignments (written partitioned
    by centroid_id, so a probe prunes to its lists' files), PQ codes —
    are materialized to parquet executor-side, reloaded as the serving
    copy, and queried through the from_index serve path; results must be
    identical to the fresh-built rung (same oracle as
    similarity_topk_ivfpq).  The offline-build / online-serve split every
    production ANN service runs: train+encode once, serve cells+codes."""
    import tempfile

    e = frames.load_table(spark, sf_dir, "embeddings")
    cents = sim.ivf_centroids(e, _IVF_K)
    books = sim.pq_codebooks(e)
    assign = sim.ivf_assign(e, cents)
    codes = sim.pq_assign_codes(e, books)
    root = tempfile.mkdtemp(prefix="sarpro_ivfpq_idx_")
    cents.write.mode("overwrite").parquet(f"{root}/centroids")
    books.write.mode("overwrite").parquet(f"{root}/books")
    assign.write.mode("overwrite").partitionBy("centroid_id").parquet(f"{root}/assign")
    codes.write.mode("overwrite").parquet(f"{root}/codes")
    return sim.cosine_topk_ivfpq_from_index(
        spark.read.parquet(f"{root}/centroids"),
        spark.read.parquet(f"{root}/books"),
        spark.read.parquet(f"{root}/assign"),
        spark.read.parquet(f"{root}/codes"),
        e,
        _spark_queries_frame(spark, sf_dir),
        k=10,
        nprobe=_IVF_NPROBE,
    )


def _export_sql() -> str:
    from sarpro_spark.llm.sampling import BUCKETS, sql_hash_bucket

    ntok = "LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> ''))"
    cut = int(_FUNNEL_SAMPLE * BUCKETS)
    return f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({ntok}) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM documents
WHERE {sql_hash_bucket('doc_id', 'funnel')} < {cut}
GROUP BY lang
""".strip()


@query("corpus_export_roundtrip", sql=_export_sql(), tags=("llm", "pipeline", "sink"))
def q_corpus_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's OUTPUT side: the sampled corpus is exported as
    lang-partitioned parquet (the layout a training run reads shard-wise),
    then read back through ONE partition-pruned scan per language and
    summarized — the returned stats come from the exported copy, so the
    hash row certifies the write -> partitioned layout -> pruned read
    lifecycle."""
    import tempfile

    from sarpro_spark.llm.sampling import BUCKETS, hash_bucket
    from sarpro_spark.llm.text import token_count

    d = frames.load_table(spark, sf_dir, "documents")
    sampled = d.where(hash_bucket(F.col("doc_id"), "funnel") < int(_FUNNEL_SAMPLE * BUCKETS))
    root = tempfile.mkdtemp(prefix="sarpro_corpus_export_")
    sampled.write.mode("overwrite").partitionBy("lang").parquet(root)
    back = spark.read.parquet(root)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("n_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# --- leakage-safe train/val/test split ---------------------------------------

#: split policy: md5 of the CLUSTER id -> 80/10/10
_SPLIT_SEED = "split"


def _leakage_split_sql() -> str:
    from sarpro_spark.llm.sampling import sql_hash_bucket

    bucket = sql_hash_bucket("cluster_id", _SPLIT_SEED)
    split = (
        f"CASE WHEN ({bucket}) < 800000 THEN 'train' "
        f"WHEN ({bucket}) < 900000 THEN 'val' ELSE 'test' END"
    )
    return f"""
WITH clusters AS MATERIALIZED ({_CLUSTER_SQL}),
assigned AS MATERIALIZED (
  SELECT doc_id, cluster_id, {split} AS split FROM clusters
),
pairs AS ({_MINHASH_VERIFIED_SQL}),
straddle AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs p
  JOIN assigned sa ON sa.doc_id = p.doc_a
  JOIN assigned sb ON sb.doc_id = p.doc_b
  WHERE sa.split <> sb.split
)
SELECT a.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT a.cluster_id) AS BIGINT) AS n_clusters,
  (SELECT n FROM straddle) AS straddling_pairs,
  ((SELECT n FROM straddle) = 0) AS leakage_free
FROM assigned a
GROUP BY a.split
""".strip()


@query("corpus_leakage_safe_split", sql=_leakage_split_sql(), tags=("llm", "dedup", "pipeline"))
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment at NEAR-DUP-CLUSTER granularity: the split
    hash keys on the connected-component id, so two near-duplicate
    documents can never land in different splits (the eval-set leakage that
    doc-level hashing silently causes). The zero-straddling-pairs invariant
    is recomputed from the verified pair list and emitted as data."""
    from sarpro_spark.llm.sampling import hash_bucket

    d = frames.load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_jaccard_pairs(d, threshold=0.5)
    pairs = cl._checkpointer(pairs)(pairs.select("doc_a", "doc_b"))
    clusters = cl.dedup_clusters(d, pairs)
    b = hash_bucket(F.col("cluster_id"), _SPLIT_SEED)
    assigned = clusters.select(
        "doc_id",
        "cluster_id",
        F.when(b < 800000, "train").when(b < 900000, "val").otherwise("test").alias("split"),
    )
    sa = assigned.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("_sa"))
    sb = assigned.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("_sb"))
    straddle = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("_sa") != F.col("_sb"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(straddle))
        .select(
            "split",
            "n_docs",
            "n_clusters",
            F.col("n").alias("straddling_pairs"),
            (F.col("n") == 0).alias("leakage_free"),
        )
    )


# --- feature hashing (the hashing trick) --------------------------------------

_FH_DIM = 64


def _fh_sql() -> str:
    from sarpro_spark.queries import sql_fround

    toks = (
        "SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> '')) AS term "
        "FROM documents"
    )
    h = "CAST(('0x' || SUBSTR(MD5('fh|' || term), 1, 15)) AS BIGINT)"
    return f"""
WITH toks AS ({toks}),
cells AS (
  SELECT doc_id, ({h}) % {_FH_DIM} AS dim,
         CASE WHEN CAST(('0x' || SUBSTR(MD5('fh|' || term), 16, 1)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM toks
),
vec AS (
  SELECT doc_id, dim, CAST(SUM(sgn) AS DOUBLE) AS v FROM cells GROUP BY doc_id, dim
),
nrm AS (SELECT doc_id, SQRT(SUM(v * v)) AS nrm FROM vec GROUP BY doc_id)
SELECT vec.doc_id, CAST(dim AS INTEGER) AS dim, {sql_fround('v / nrm')} AS value
FROM vec JOIN nrm USING (doc_id)
WHERE v <> 0
""".strip()


@query("text_feature_hashing", sql=_fh_sql(), tags=("llm", "text", "similarity"))
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: tokens land in a fixed 64-dim signed-hash vector
    (sign bit debiases collisions, Weinberger et al.), L2-normalized — a
    vocabulary-free doc representation that feeds the existing ANN/PCA
    stack without a dictionary build. One explode + one aggregate;
    dimension count is constant regardless of vocabulary size."""
    from sarpro_spark.llm.text import tokens_expr

    d = frames.load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("term"))
    h = F.conv(F.substring(F.md5(F.concat(F.lit("fh|"), F.col("term"))), 1, 15), 16, 10).cast("long")
    cells = toks.select(
        "doc_id",
        (h % _FH_DIM).alias("dim"),
        F.when(
            F.conv(F.substring(F.md5(F.concat(F.lit("fh|"), F.col("term"))), 16, 1), 16, 10).cast("long") % 2 == 0,
            1,
        ).otherwise(-1).alias("sgn"),
    )
    vec = cells.groupBy("doc_id", "dim").agg(F.sum("sgn").cast("double").alias("v")).where(F.col("v") != 0)
    nrm = vec.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    return vec.join(nrm, "doc_id").select(
        "doc_id", F.col("dim").cast("int").alias("dim"), fround(F.col("v") / F.col("nrm")).alias("value")
    )


# --- retrieval chunking -------------------------------------------------------

_CHUNK_W = 32   # tokens per chunk
_CHUNK_S = 24   # stride (8-token overlap)


def _chunk_sql() -> str:
    toks = "LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> '')"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
starts AS (
  SELECT doc_id, toks,
         UNNEST(generate_series(0, GREATEST(CAST(CEIL(CAST(GREATEST(LEN(toks) - {_CHUNK_W}, 0) AS DOUBLE) / {_CHUNK_S}) AS BIGINT), 0))) AS chunk_idx
  FROM t WHERE LEN(toks) > 0
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
  CAST(chunk_idx * {_CHUNK_S} AS BIGINT) AS start_tok,
  CAST(LEAST({_CHUNK_W}, LEN(toks) - chunk_idx * {_CHUNK_S}) AS BIGINT) AS n_tok,
  MD5(ARRAY_TO_STRING(LIST_SLICE(toks, chunk_idx * {_CHUNK_S} + 1, chunk_idx * {_CHUNK_S} + {_CHUNK_W}), ' ')) AS chunk_fp
FROM starts
WHERE chunk_idx * {_CHUNK_S} < LEN(toks)
""".strip()


@query("corpus_chunk_windows", sql=_chunk_sql(), tags=("llm", "text", "packing"))
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-corpus chunking: overlapping token windows (32-token
    chunks, 24-token stride) with per-chunk content fingerprints — the
    RAG-side counterpart of training-sequence packing. One explode over
    per-doc chunk starts; fan-out ~= n_tokens / stride, never quadratic."""
    from sarpro_spark.llm.text import tokens_expr

    d = frames.load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", tokens_expr(F.col("text")).alias("toks")).where(
        F.size("toks") > 0
    )
    n_chunks_minus1 = F.ceil(
        F.greatest(F.size("toks") - _CHUNK_W, F.lit(0)).cast("double") / _CHUNK_S
    ).cast("long")
    starts = base.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("long"), F.greatest(n_chunks_minus1, F.lit(0).cast("long")))).alias("chunk_idx"),
    ).where(F.col("chunk_idx") * _CHUNK_S < F.size("toks"))
    start = F.col("chunk_idx") * _CHUNK_S
    return starts.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.least(F.lit(_CHUNK_W), F.size("toks") - start).cast("long").alias("n_tok"),
        F.md5(
            F.concat_ws(" ", F.slice("toks", (start + 1).cast("int"), F.lit(_CHUNK_W)))
        ).alias("chunk_fp"),
    )


# --- real WAV audio decode ----------------------------------------------------

_WAV_SQL = f"""
WITH au AS (SELECT doc_id, 400 + doc_id % 200 AS n FROM documents),
samp AS (
  SELECT doc_id, n, i, ((doc_id * 31 + i * i * 7) % 65536) - 32768 AS s
  FROM (SELECT doc_id, n, UNNEST(generate_series(0, n - 1)) AS i FROM au) z
),
zc AS (
  SELECT doc_id, CAST(SUM(CASE WHEN cur >= 0 AND prv < 0 OR cur < 0 AND prv >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
  FROM (
    SELECT doc_id, s AS cur, LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prv
    FROM samp
  ) t WHERE prv IS NOT NULL
  GROUP BY doc_id
)
SELECT samp.doc_id,
  {8000} AS sample_rate,
  CAST(MAX(samp.n) AS INTEGER) AS n_samples,
  CAST(MAX(samp.n) * 1000 // {8000} AS BIGINT) AS duration_ms,
  CAST(MAX(ABS(s)) AS INTEGER) AS peak,
  {sql_fround('SQRT(CAST(SUM(s * s) AS DOUBLE) / MAX(samp.n))')} AS rms,
  MAX(zc.zero_crossings) AS zero_crossings
FROM samp JOIN zc USING (doc_id)
GROUP BY samp.doc_id
""".strip()


@query("multimodal_audio_features", sql=_WAV_SQL, tags=("llm", "multimodal", "audio"))
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: deterministic PCM16 waveforms are RIFF/WAVE-
    encoded and decoded back executor-side (pure-stdlib codec, chunk-walking
    parser), features (duration, peak, rms, zero crossings) computed from
    the DECODED samples — the oracle regenerates the waveform from the
    integer formula, so a codec bug anywhere flips hashed values."""
    from sarpro_spark.queries import round_floats

    d = frames.load_table(spark, sf_dir, "documents")
    wav = mm.attach_wav_payload(d)
    return round_floats(mm.wav_features(wav))


_WAV_FRAMES_SQL = f"""
WITH au AS (SELECT doc_id, 400 + doc_id % 200 AS n FROM documents),
samp AS (
  SELECT doc_id, i, i // 400 AS frame_idx, ((doc_id * 31 + i * i * 7) % 65536) - 32768 AS s
  FROM (SELECT doc_id, n, UNNEST(generate_series(0, n - 1)) AS i FROM au) z
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
  CAST(COUNT(*) AS INTEGER) AS n,
  CAST(SUM(s * s) AS BIGINT) AS energy,
  {sql_fround('SQRT(CAST(SUM(s * s) AS DOUBLE) / COUNT(*))')} AS rms
FROM samp GROUP BY doc_id, frame_idx
""".strip()


@query("multimodal_audio_frames", sql=_WAV_FRAMES_SQL, tags=("llm", "multimodal", "audio"))
def q_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: 50 ms analysis frames (energy + rms) from
    the DECODED waveform — the segmentation/VAD input stage; oracle
    regenerates frames from the integer formula."""
    from sarpro_spark.queries import round_floats

    d = frames.load_table(spark, sf_dir, "documents")
    wav = mm.attach_wav_payload(d)
    return round_floats(mm.wav_frame_features(wav))


# --- multimodal thumbnails (decode -> pool) -----------------------------------

_THUMB_SQL = f"""
WITH png AS (
  SELECT doc_id, 8 + doc_id % 24 AS w, 8 + doc_id % 16 AS h,
         CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS ch
  FROM documents WHERE doc_id % 2 = 0
),
rr AS (SELECT doc_id, w, h, ch, UNNEST(generate_series(0, h - 1)) AS r FROM png),
cc AS (SELECT doc_id, w, h, ch, r, UNNEST(generate_series(0, w - 1)) AS c FROM rr),
kk AS (SELECT doc_id, w, h, ch, r, c, UNNEST(generate_series(0, ch - 1)) AS k FROM cc)
SELECT doc_id, CAST(r // 2 AS INTEGER) AS ty, CAST(c // 2 AS INTEGER) AS tx,
  CAST(k AS INTEGER) AS chan,
  {sql_fround('CAST(SUM((doc_id * 31 + r * 7 + c * 13 + k * 59) % 256) AS DOUBLE) / COUNT(*)')} AS val
FROM kk
GROUP BY doc_id, r // 2, c // 2, k
""".strip()


@query("multimodal_thumbnails", sql=_THUMB_SQL, tags=("llm", "multimodal"))
def q_multimodal_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> resize composition: PNG payloads (the lossless leg) are
    decoded executor-side and 2x2 mean-pooled (ragged edges exact); every
    thumbnail PIXEL is hash-certified against the formula-regenerated
    oracle — a decode or pooling bug anywhere flips values."""
    import math

    import pandas as pd
    from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType

    from sarpro_spark.queries import fround as _fr

    d = frames.load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 2 == 0)
    pay = mm.attach_image_payload(d)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ty", IntegerType()),
            StructField("tx", IntegerType()),
            StructField("chan", IntegerType()),
            StructField("val", DoubleType()),
        ]
    )

    def fn(batches):
        import numpy as np

        scale = 10.0**6
        for pdf in batches:
            ids, tys, txs, chs, vals = [], [], [], [], []
            for i, buf in zip(pdf["doc_id"], pdf["payload"]):
                img = mm.decode_image(bytes(buf))
                if img.ndim == 2:
                    img = img[:, :, None]
                h, w, ch = img.shape
                a = img.astype(np.int64)
                for ty in range(-(-h // 2)):
                    rs = a[2 * ty : 2 * ty + 2]
                    for tx in range(-(-w // 2)):
                        cell = rs[:, 2 * tx : 2 * tx + 2]
                        cnt = cell.shape[0] * cell.shape[1]
                        for k in range(ch):
                            v = float(cell[:, :, k].sum()) / cnt
                            ids.append(i)
                            tys.append(ty)
                            txs.append(tx)
                            chs.append(k)
                            vals.append(math.floor(v * scale + 0.5) / scale)
            yield pd.DataFrame(
                {"doc_id": ids, "ty": tys, "tx": txs, "chan": chs, "val": vals}
            )

    return pay.mapInPandas(fn, schema=schema)


# --- language-ID evaluation matrix --------------------------------------------

_LANG_CONFUSION_SQL = f"""
SELECT lang AS labeled, {__import__('sarpro_spark.llm.text', fromlist=['sql_lang_id']).sql_lang_id('text')} AS predicted,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1, 2
""".strip()


@query("text_lang_confusion", sql=_LANG_CONFUSION_SQL, tags=("llm", "text", "evaluation"))
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation surface: the labeled-vs-predicted language
    confusion matrix (one aggregate) — the reporting leg every model-backed
    filter needs next to its scores."""
    d = frames.load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("labeled"),
            tx.lang_id_expr(F.col("text")).alias("predicted"),
        )
        .groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- quality threshold sweep --------------------------------------------------

_SWEEP_STEPS = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]


def _sweep_sql() -> str:
    # reuse the exact q_score construction of the funnel oracle
    from sarpro_spark.llm.text import LANG_STOPWORDS, sql_count_word

    ntok = "LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> ''))"
    lt = "LOWER(text)"
    padded = "(' ' || LOWER(text) || ' ')"
    stops = " + ".join(sql_count_word(padded, w) for w in LANG_STOPWORDS["en"])
    mean_tok = (
        f"CASE WHEN {ntok} > 0 THEN CAST(LENGTH(REGEXP_REPLACE({lt}, '[^a-z0-9]', '', 'g')) AS DOUBLE)"
        f" / {ntok} ELSE 0.0 END"
    )
    punct = f"CAST(LENGTH(REGEXP_REPLACE({lt}, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / GREATEST(LENGTH(text), 1)"
    stopr = f"CAST({stops} AS DOUBLE) / GREATEST({ntok}, 1)"
    qscore = (
        f"(LEAST(CAST({ntok} AS DOUBLE) / 50.0, 1.0) * 0.4"
        f" + (1.0 - LEAST(({punct}) * 5.0, 1.0)) * 0.2"
        f" + LEAST(({stopr}) * 4.0, 1.0) * 0.2"
        f" + (CASE WHEN ({mean_tok}) >= 3.0 AND ({mean_tok}) <= 8.0 THEN 1.0 ELSE 0.0 END) * 0.2)"
    )
    legs = "\nUNION ALL\n".join(
        f"SELECT {t!r} AS threshold, CAST(SUM(CASE WHEN q >= {t!r} THEN 1 ELSE 0 END) AS BIGINT) AS n_docs, "
        f"CAST(SUM(CASE WHEN q >= {t!r} THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens FROM scored"
        for t in _SWEEP_STEPS
    )
    return f"""
WITH scored AS MATERIALIZED (
  SELECT {qscore} AS q, CAST({ntok} AS BIGINT) AS n_tok FROM documents
)
{legs}
""".strip()


@query("quality_threshold_sweep", sql=_sweep_sql(), tags=("llm", "text", "evaluation"))
def q_quality_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-curve reporting: docs/tokens surviving each quality floor
    in one corpus pass (9 conditional sums in a single aggregate) — the
    yield/quality tradeoff table a pipeline operator reads before pinning
    the production floor."""
    d = frames.load_table(spark, sf_dir, "documents")
    scored = tx.quality_features(d).select(
        F.col("q_score").alias("q"), F.col("q_tokens").cast("long").alias("n_tok")
    )
    aggs = []
    for t in _SWEEP_STEPS:
        aggs.append(F.sum(F.when(F.col("q") >= t, 1).otherwise(0)).alias(f"_n{int(t*10)}"))
        aggs.append(
            F.sum(F.when(F.col("q") >= t, F.col("n_tok")).otherwise(0)).alias(f"_t{int(t*10)}")
        )
    wide = scored.agg(*aggs)
    legs = None
    for t in _SWEEP_STEPS:
        leg = wide.select(
            F.lit(t).alias("threshold"),
            F.col(f"_n{int(t*10)}").alias("n_docs"),
            F.col(f"_t{int(t*10)}").alias("n_tokens"),
        )
        legs = leg if legs is None else legs.unionByName(leg)
    return legs


# --- encoding hygiene ---------------------------------------------------------

_ASCII_CLASS = "[\\x20-\\x7e\\t\\n\\r]"
_NON_ASCII_SQL = f"LENGTH(REGEXP_REPLACE(text, '{_ASCII_CLASS}', '', 'g'))"
_REPL_SQL = "LENGTH(text) - LENGTH(REPLACE(text, CHR(65533), ''))"
_RATIO_SQL = f"CAST({_NON_ASCII_SQL} AS DOUBLE) / GREATEST(LENGTH(text), 1)"

_ENCODING_SQL = f"""
SELECT doc_id,
  LENGTH(text) AS n_chars,
  CAST({_NON_ASCII_SQL} AS BIGINT) AS n_non_ascii,
  CAST({_REPL_SQL} AS BIGINT) AS n_replacement,
  {sql_fround(_RATIO_SQL)} AS non_ascii_ratio,
  ({_REPL_SQL} > 0) AS has_mojibake
FROM documents
""".strip()


@query("text_encoding_hygiene", sql=_ENCODING_SQL, tags=("llm", "text", "hygiene"))
def q_encoding_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-hygiene signals: non-ASCII density and U+FFFD replacement-
    character counts (the mojibake detector every crawled-corpus filter
    runs) — pure string expressions, scan-parallel."""
    t = F.col("text")
    non_ascii = F.length(F.regexp_replace(t, "[\\x20-\\x7e\\t\\n\\r]", ""))
    repl = F.length(t) - F.length(F.replace(t, F.lit(chr(0xFFFD)), F.lit("")))
    d = frames.load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        non_ascii.cast("long").alias("n_non_ascii"),
        repl.cast("long").alias("n_replacement"),
        fround(
            non_ascii.cast("double") / F.greatest(F.length(t), F.lit(1)).cast("double")
        ).alias("non_ascii_ratio"),
        (repl > 0).alias("has_mojibake"),
    )


# --- exact-substring dedup (suffix-array class, r11) ---------------------------

def _substr_pairs_sql() -> str:
    from sarpro_spark.llm import substring as ssub

    return ssub.sql_exact_substring_pairs("documents")


def _substr_removal_sql() -> str:
    from sarpro_spark.llm import substring as ssub

    return ssub.sql_exact_substring_removal("documents")


@query("dedup_exact_substring", sql=_substr_pairs_sql, tags=("llm", "dedup"))
def q_dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (the suffix-array family — ExactSubstr, Lee et
    al. 2021): every doc pair sharing a verified exact run >= 40 chars, with
    span count / longest run / duplicated mass. Anchor hashes at every
    character position (O(total_chars) rows, hash-partitioned — the
    distributed stand-in for the corpus suffix array), document-frequency
    cap bounds hot-gram join fan-out, diagonal gaps-and-islands merges
    anchors back into maximal spans, and spans re-verify the real
    substrings (candidates->exact-verify doctrine). The oracle groups by
    the gram itself, so any Spark-side divergence — hashing, islands,
    verification — fails the hash."""
    from sarpro_spark.llm import substring as ssub

    d = frames.load_table(spark, sf_dir, "documents")
    return ssub.exact_substring_pairs(d)


@query("dedup_substring_removal", sql=_substr_removal_sql, tags=("llm", "dedup"))
def q_dedup_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc ExactSubstr removal inventory: the merged duplicated
    intervals (running-max-end island union, so overlapping spans count
    each character once) and the clean/duplicated char split a removal
    pass would produce. The quantity that decides whether a 100 TB corpus
    loses 3% or 30% to boilerplate."""
    from sarpro_spark.llm import substring as ssub

    d = frames.load_table(spark, sf_dir, "documents")
    return ssub.exact_substring_removal(d)


# --- record linkage: q-gram blocked fuzzy join (r11) ---------------------------

# deterministic dirty mentions: every part name loses one character at a
# key-dependent position; every 5th additionally has its first character
# replaced — edit distance 1 or 2 from its true name, same arithmetic on
# both engines.
_MENTION_SQL = """
mentions AS (
  SELECT p_partkey AS mid,
    CASE WHEN p_partkey % 5 = 0
      THEN 'x' || SUBSTR(
        SUBSTR(p_name, 1, (p_partkey % (LENGTH(p_name) - 2)) + 1)
          || SUBSTR(p_name, (p_partkey % (LENGTH(p_name) - 2)) + 3), 2)
      ELSE SUBSTR(p_name, 1, (p_partkey % (LENGTH(p_name) - 2)) + 1)
          || SUBSTR(p_name, (p_partkey % (LENGTH(p_name) - 2)) + 3)
    END AS mention,
    p_name AS true_name
  FROM part
),
dict AS (
  SELECT MIN(p_partkey) AS name_id, p_name FROM part GROUP BY p_name
)
""".strip()


def _fuzzy_match_sql() -> str:
    from sarpro_spark.llm.linkage import sql_fuzzy_best_match

    inner = sql_fuzzy_best_match("mentions", "dict", "mid", "mention", "name_id", "p_name")
    ctes = inner.removeprefix("WITH ").split("\nSELECT lid,", 1)[0]
    return f"""
WITH {_MENTION_SQL},
{ctes}
SELECT b.lid, b.rid AS best_rid, b.rname AS best_name, b.dist AS best_dist,
       CAST(b.n_cands AS BIGINT) AS n_cands,
       (b.rname = m.true_name) AS correct
FROM lkg_best b JOIN mentions m ON b.lid = m.mid
WHERE b.rn = 1
""".strip()


@query("fuzzy_match_partnames", sql=_fuzzy_match_sql, tags=("llm", "linkage", "fuzzy"))
def q_fuzzy_match_partnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (llm/linkage.py, r11): dirty part-name mentions
    (one deterministic deletion, every 5th also a substitution) resolved
    against the canonical name dictionary by q-gram blocking + the
    Gravano count filter + exact levenshtein verify + min-distance
    tie-broken resolution — the entity-resolution join that never goes
    |L|x|R|. `correct` hashes per-mention whether the resolver recovered
    the true name, so linkage QUALITY is oracle-certified data, not a
    claim."""
    from sarpro_spark.llm.linkage import fuzzy_best_match

    part = frames.load_table(spark, sf_dir, "part")
    nm, key = F.col("p_name"), F.col("p_partkey")
    pos = (key % (F.length(nm) - 2)) + 1  # 1-based char KEPT up to here
    deleted = F.concat(
        nm.substr(F.lit(1), pos), nm.substr(pos + 2, F.lit(1000))
    )
    mention = F.when(key % 5 == 0, F.concat(F.lit("x"), deleted.substr(F.lit(2), F.lit(1000)))).otherwise(deleted)
    mentions = part.select(key.alias("mid"), mention.alias("mention"), nm.alias("true_name"))
    dic = part.groupBy("p_name").agg(F.min("p_partkey").alias("name_id"))
    best = fuzzy_best_match(mentions, dic, "mid", "mention", "name_id", "p_name")
    truth = mentions.select(F.col("mid").alias("lid"), "true_name")
    return best.join(truth, "lid").select(
        "lid", "best_rid", "best_name", "best_dist", "n_cands",
        (F.col("best_name") == F.col("true_name")).alias("correct"),
    )


# --- triangle census over the co-citation graph (r11) --------------------------

# three URL families per doc (7 x 5 x 3 hosts) so the co-citation graph is
# tripartite with one triangle per present (site, mid, cdn) combination —
# same augmentation idiom as domain_pagerank, one family richer.
_TRI_AUG_SQL = (
    "text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.example.com/page and https://mid' || CAST(doc_id % 5 AS VARCHAR)"
    " || '.example.org/item and http://cdn' || CAST(doc_id % 3 AS VARCHAR)"
    " || '.example.net/asset'"
)


def _tri_census_sql() -> str:
    from sarpro_spark.llm.graph import sql_triangle_counts

    return f"""
WITH tri_m AS (
  SELECT doc_id, UNNEST(regexp_extract_all({_TRI_AUG_SQL}, '{_URL_RE}', 1)) AS domain
  FROM documents
),
tri_md AS (SELECT DISTINCT doc_id, domain FROM tri_m),
tri_edges AS (
  SELECT a.domain AS src, b.domain AS dst
  FROM tri_md a JOIN tri_md b ON a.doc_id = b.doc_id AND a.domain <> b.domain
)
SELECT * FROM ({sql_triangle_counts("tri_edges")})
""".strip()


@query("domain_triangle_census", sql=_tri_census_sql, tags=("llm", "graph"))
def q_domain_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle census (llm/graph.py triangle_counts, r11) over
    the host co-citation graph: the degree-ORIENTED algorithm (Suri &
    Vassilvitskii) — every edge points from its lower (degree, id)
    endpoint to the higher, each wedge enumerates once at its lowest
    apex, the closing-edge join confirms triangles exactly once. The hub
    vertex generates no wedges, so there is no last-reducer straggler at
    100 TB. Output: per-host degree, triangle count, and local
    clustering coefficient, all hashed."""
    from sarpro_spark.llm import graph as gr

    d = frames.load_table(spark, sf_dir, "documents")
    pid = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit(" see https://site"), (pid % 7).cast("string"),
        F.lit(".example.com/page and https://mid"), (pid % 5).cast("string"),
        F.lit(".example.org/item and http://cdn"), (pid % 3).cast("string"),
        F.lit(".example.net/asset"),
    )
    mentions = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(aug, F.lit(_URL_RE), 1)).alias("domain"),
    )
    edges = gr.cocitation_edges(mentions)
    return gr.triangle_counts(edges)


# --- distributed OLS (r11) -----------------------------------------------------


def _ols_sql() -> str:
    from sarpro_spark.llm.regression import sql_ols_fit

    # hour-of-day / day-of-week from raw epoch arithmetic (identical on
    # both engines; no calendar-function convention risk)
    x1 = "(CAST(FLOOR(EPOCH_US(ts) / 3600000000.0) AS BIGINT) % 24)"
    x2 = "(CAST(FLOOR(EPOCH_US(ts) / 86400000000.0) AS BIGINT) % 7)"
    return sql_ols_fit("events", "value", x1, x2)


@query("events_ols_fit", sql=_ols_sql, tags=("llm", "model", "regression"))
def q_events_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed OLS (llm/regression.py, r11): value ~ 1 + hour + dow
    fit by normal equations — ONE aggregation pass accumulates the nine
    X'X / X'y moments, Cramer's rule solves the 3x3 system as column
    arithmetic on the 1-ROW moment relation (the solve formulas are one
    SQL text parsed by both engines, so coefficients match to the bit),
    and a second broadcast-coefficient pass yields R^2. The closed-form
    sibling of the iterative logistic trainer: no iteration, no collect,
    model state never leaves the plan. Two scans, zero data shuffles."""
    from sarpro_spark.llm.regression import ols_fit

    e = frames.load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    feat = e.select(
        F.col("value"),
        (F.floor(us.cast("double") / 3600000000.0).cast("bigint") % 24).alias("hod"),
        (F.floor(us.cast("double") / 86400000000.0).cast("bigint") % 7).alias("dow"),
    )
    return ols_fit(feat, "value", "hod", "dow")


# --- BM25 top-k retrieval (r12) --------------------------------------------------

#: deterministic retrieval fixture: every 97th doc's first 80 chars is a
#: query, with the panel BOUNDED at 50 queries — a real retrieval workload
#: has a fixed query load, so the certified line must scale with the
#: CORPUS only (an unbounded panel made the 10x soak quadratic: queries
#: x postings both grew 10x, measured vs_linear 2.28 in r12)
_BM25_QMOD = 97
_BM25_QMAX = 97 * 50
_BM25_QLEN = 80
_BM25_K = 5


def _bm25_sql() -> str:
    from sarpro_spark.llm.bm25 import sql_bm25_topk

    inner = sql_bm25_topk("documents", "bmqueries", k=_BM25_K)
    ctes = inner.removeprefix("WITH ")
    return f"""
WITH bmqueries AS (
  SELECT doc_id AS query_id, SUBSTR(text, 1, {_BM25_QLEN}) AS qtext
  FROM documents WHERE doc_id % {_BM25_QMOD} = 0 AND doc_id < {_BM25_QMAX}
),
{ctes}
""".strip()


@query("text_bm25_topk", sql=_bm25_sql, tags=("llm", "text", "retrieval"))
def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k retrieval (llm/bm25.py, r12): the ranking sibling
    of TF-IDF similarity. Query prefixes (every 97th doc's first 80 chars)
    probe the inverted index — term-keyed join, stop-term df cap, the
    standard k1=1.2/b=0.75 saturation — and each query's top-5 docs rank
    under a PER-QUERY window (never a global sort, never a single-partition
    window). Scores fround'd before ranking, doc-id tiebreak."""
    from sarpro_spark.llm.bm25 import bm25_topk

    d = frames.load_table(spark, sf_dir, "documents")
    queries = d.where(
        (F.col("doc_id") % _BM25_QMOD == 0) & (F.col("doc_id") < _BM25_QMAX)
    ).select(
        F.col("doc_id").alias("query_id"),
        F.substring(F.col("text"), 1, _BM25_QLEN).alias("qtext"),
    )
    return bm25_topk(d, queries, k=_BM25_K)


# --- perceptual-hash image near-dup (r12) ----------------------------------------


def _phash_sql() -> str:
    from sarpro_spark.llm.imagehash import sql_phash_neardup_pairs

    inner = sql_phash_neardup_pairs("(SELECT doc_id FROM documents)")
    head, tail = inner.split("\nSELECT doc_a,", 1)
    return f"""{head}
SELECT doc_a, doc_b,
       CAST(BIT_COUNT(XOR(pha, phb)) + BIT_COUNT(XOR(pla, plb)) AS INTEGER) AS ph_dist,
       CAST(BIT_COUNT(XOR(dha, dhb)) + BIT_COUNT(XOR(dla, dlb)) AS INTEGER) AS dh_dist,
       (doc_a % 20 = 0 AND doc_b = doc_a + 10) AS planted
FROM phcand
WHERE BIT_COUNT(XOR(pha, phb)) + BIT_COUNT(XOR(pla, plb)) <= 6
""".strip()


@query("dedup_image_phash", sql=_phash_sql, tags=("llm", "dedup", "image"))
def q_dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup (llm/imagehash.py, r12): the pixel
    cell of the dedup matrix. Real PNG payloads (planted 2x-resized
    duplicates every 20th doc) decode executor-side, hash via fixed-point
    integer DCT pHash + gradient dHash (no float sign flips between
    engines), and pair up through the 8x8-bit banded Hamming join —
    pigeonhole recall is structural for distance <= 7, exact popcount
    verifies. The oracle recomputes every hash from the pixel FORMULA
    (no decode), so codec, luma, NN sampling, DCT, and banding are all
    inside the hashed certificate; planted pairs must surface at
    distance 0 with planted=true."""
    from sarpro_spark.llm.imagehash import (
        attach_image_payload_resized_dups,
        image_hashes,
        phash_neardup_pairs,
    )

    d = frames.load_table(spark, sf_dir, "documents")
    payloads = attach_image_payload_resized_dups(d)
    pairs = phash_neardup_pairs(image_hashes(payloads))
    return pairs.select(
        "doc_a", "doc_b", "ph_dist", "dh_dist",
        ((F.col("doc_a") % 20 == 0) & (F.col("doc_b") == F.col("doc_a") + 10)).alias("planted"),
    )


# --- winnow-anchored exact-substring dedup (r12, verdict item 1) -----------------


def _substr_winnow_sql() -> str:
    from sarpro_spark.llm import substring_winnow as sw

    inner = sw.sql_exact_substring_pairs_winnowed("documents")
    excl = sw.sql_excluded_long_docs("documents")
    return inner.replace(
        "CAST(SUM(span_len) AS BIGINT) AS dup_chars",
        f"CAST(SUM(span_len) AS BIGINT) AS dup_chars,\n       {excl} AS excluded_docs",
    )


@query("dedup_exact_substring_winnowed", sql=_substr_winnow_sql, tags=("llm", "dedup"))
def q_dedup_exact_substring_winnowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr SCALE path (llm/substring_winnow.py, r12): winnowing
    fingerprints sample anchors content-defined at density 2/(w+1) —
    cutting the full-density anchor shuffle ~w/2x — candidate diagonals
    re-densify ONLY inside merged candidate regions, and the identical
    gaps-and-islands + span-grain exact verify extends them to maximal
    runs. Winnowing's guarantee (any shared run >= w+k-1 selects a common
    anchor) makes every true span >= min_len reachable; the oracle runs
    the winnowed algorithm verbatim on the gram itself.  r13: every row
    also carries `excluded_docs` (docs >= POS_ENC = 2^32 chars the kernel
    cannot position-encode, expected 0) — the r12 verdict's one defect was
    a silent 2^20-char exclusion; the count is now hashed DATA on both
    engines, so an excluded doc breaks the gate instead of vanishing."""
    from sarpro_spark.llm import substring_winnow as sw

    d = frames.load_table(spark, sf_dir, "documents")
    excl = sw.excluded_long_docs(d)  # 1 row at any SF
    return sw.exact_substring_pairs_winnowed(d).crossJoin(F.broadcast(excl))


def _substr_winnow_recall_sql() -> str:
    from sarpro_spark.llm import substring as ssub
    from sarpro_spark.llm import substring_winnow as sw
    from sarpro_spark.queries import sql_fround

    full_ctes = ssub.sql_substring_spans_ctes("documents")
    win_ctes = sw.sql_winnowed_spans_ctes("documents")
    return f"""
WITH {full_ctes},
{win_ctes},
fpairs AS (
  SELECT doc_a, doc_b, COUNT(*) AS n_spans, MAX(span_len) AS max_span_len,
         CAST(SUM(span_len) AS BIGINT) AS dup_chars
  FROM spans GROUP BY doc_a, doc_b
),
wpairs AS (
  SELECT doc_a, doc_b, COUNT(*) AS n_spans, MAX(span_len) AS max_span_len,
         CAST(SUM(span_len) AS BIGINT) AS dup_chars
  FROM wspans GROUP BY doc_a, doc_b
),
joined AS (
  SELECT COALESCE(f.doc_a, w.doc_a) AS doc_a,
         f.doc_a IS NOT NULL AS in_full, w.doc_a IS NOT NULL AS in_win,
         (f.doc_a IS NOT NULL AND w.doc_a IS NOT NULL
          AND f.n_spans = w.n_spans AND f.max_span_len = w.max_span_len
          AND f.dup_chars = w.dup_chars) AS value_equal
  FROM fpairs f FULL OUTER JOIN wpairs w
    ON f.doc_a = w.doc_a AND f.doc_b = w.doc_b
)
SELECT CAST(SUM(CASE WHEN in_full THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_full,
       CAST(SUM(CASE WHEN in_win THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_winnowed,
       CAST(SUM(CASE WHEN in_full AND in_win THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_both,
       CAST(SUM(CASE WHEN value_equal THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_value_equal,
       {sql_fround("CAST(SUM(CASE WHEN in_full AND in_win THEN 1 ELSE 0 END) AS DOUBLE)"
                   " / GREATEST(SUM(CASE WHEN in_full THEN 1 ELSE 0 END), 1)")} AS pair_recall
FROM joined
""".strip()


@query("substring_winnow_recall", sql=_substr_winnow_recall_sql, tags=("llm", "dedup"))
def q_substring_winnow_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed-vs-full-density recall certificate (r12, verdict item 1):
    both ExactSubstr paths run on the same fixture and their per-pair
    results full-outer join — pair recall AND per-pair value equality
    (n_spans / max_span_len / dup_chars) are hashed DATA, not a claim.
    On this fixture every true span >= min_len >= w+k-1, so the winnowed
    path is expected lossless (recall 1.0) up to hot-gram-cap granularity."""
    from sarpro_spark.llm import substring as ssub
    from sarpro_spark.llm import substring_winnow as sw
    from sarpro_spark.queries import fround

    d = frames.load_table(spark, sf_dir, "documents")
    full = ssub.exact_substring_pairs(d).select(
        "doc_a", "doc_b",
        F.col("n_spans").alias("f_ns"), F.col("max_span_len").alias("f_ms"),
        F.col("dup_chars").alias("f_dc"),
    )
    win = sw.exact_substring_pairs_winnowed(d).select(
        "doc_a", "doc_b",
        F.col("n_spans").alias("w_ns"), F.col("max_span_len").alias("w_ms"),
        F.col("dup_chars").alias("w_dc"),
    )
    j = full.join(win, ["doc_a", "doc_b"], "full_outer")
    in_full = F.col("f_ns").isNotNull()
    in_win = F.col("w_ns").isNotNull()
    value_equal = (
        in_full & in_win
        & (F.col("f_ns") == F.col("w_ns"))
        & (F.col("f_ms") == F.col("w_ms"))
        & (F.col("f_dc") == F.col("w_dc"))
    )
    return j.agg(
        F.sum(in_full.cast("int")).cast("bigint").alias("n_pairs_full"),
        F.sum(in_win.cast("int")).cast("bigint").alias("n_pairs_winnowed"),
        F.sum((in_full & in_win).cast("int")).cast("bigint").alias("n_pairs_both"),
        F.sum(value_equal.cast("int")).cast("bigint").alias("n_pairs_value_equal"),
        fround(
            F.sum((in_full & in_win).cast("int")).cast("double")
            / F.greatest(F.sum(in_full.cast("int")), F.lit(1)).cast("double")
        ).alias("pair_recall"),
    )


# --- audio fingerprint near-dup (r12) -----------------------------------------


def _afp_sql() -> str:
    from sarpro_spark.llm.audiohash import sql_afp_neardup_pairs

    inner = sql_afp_neardup_pairs("(SELECT doc_id FROM documents)")
    head, _ = inner.split("\nSELECT doc_a,", 1)
    return f"""{head}
SELECT doc_a, doc_b,
       CAST(BIT_COUNT(XOR(ha, hb)) + BIT_COUNT(XOR(la, lb)) AS INTEGER) AS afp_dist,
       (doc_a % 20 = 0 AND doc_b = doc_a + 10) AS planted
FROM afpcand
WHERE BIT_COUNT(XOR(ha, hb)) + BIT_COUNT(XOR(la, lb)) <= 6
""".strip()


@query("dedup_audio_fingerprint", sql=_afp_sql, tags=("llm", "dedup", "audio"))
def q_dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint near-dup (llm/audiohash.py, r12): the AUDIO cell
    of the dedup matrix, next to text/embedding/pixel. Real RIFF/WAVE
    payloads (planted 2x time-stretched duplicates every 20th doc) decode
    executor-side through the in-repo PCM16 codec, fingerprint via the
    all-integer Haitsma-Kalker delta-sign hash (65x16 NN energy grid), and
    pair up through the 8x8-bit banded Hamming join — pigeonhole recall is
    structural for distance <= 7, exact popcount verifies. The oracle
    recomputes every fingerprint from the PCM FORMULA (no decode), so
    codec, NN grid, energies, delta bits, and banding are all inside the
    hashed certificate; planted pairs must surface at distance 0 with
    planted=true."""
    from sarpro_spark.llm.audiohash import (
        afp_neardup_pairs,
        attach_wav_payload_stretched_dups,
        audio_fingerprints,
    )

    d = frames.load_table(spark, sf_dir, "documents")
    payloads = attach_wav_payload_stretched_dups(d)
    pairs = afp_neardup_pairs(audio_fingerprints(payloads))
    return pairs.select(
        "doc_a", "doc_b", "afp_dist",
        ((F.col("doc_a") % 20 == 0) & (F.col("doc_b") == F.col("doc_a") + 10)).alias("planted"),
    )


# --- video frame-vote near-dup (r13, verdict item 3) ------------------------------


def _video_phash_sql() -> str:
    from sarpro_spark.llm.videohash import sql_video_neardup_pairs

    inner = sql_video_neardup_pairs("(SELECT doc_id FROM documents)")
    return inner.replace(
        "CAST(nb.nf AS BIGINT) AS n_frames_b",
        "CAST(nb.nf AS BIGINT) AS n_frames_b,\n"
        "       (v.doc_a % 20 = 0 AND v.doc_b = v.doc_a + 10) AS planted,\n"
        "       (v.doc_b % 40 = 30) AS shifted",
    )


@query("dedup_video_phash", sql=_video_phash_sql, tags=("llm", "dedup", "video"))
def q_dedup_video_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-vote near-dup (llm/videohash.py, r13): the VIDEO cell of
    the dedup matrix. Concatenated-PNG clips (6 formula frames each; every
    20th doc a planted duplicate of doc-10 — 2x-rescaled re-encode or
    1-frame-shifted re-encode, alternating) decode and pHash per frame in
    ONE mapInPandas pass; frames pair up through the banded Hamming join at
    FRAME granularity, and clip pairs survive when >= 60% of BOTH sides'
    frames matched — content-keyed voting, so rescaled clips match 6/6 and
    shifted clips 5/6 with no index alignment. The oracle recomputes every
    frame hash from the pixel FORMULA (codec, luma, NN sampling, DCT,
    banding, and the vote all inside the hashed certificate)."""
    from sarpro_spark.llm.videohash import (
        attach_video_payload_dups,
        video_frame_hashes,
        video_neardup_pairs,
    )

    d = frames.load_table(spark, sf_dir, "documents")
    pairs = video_neardup_pairs(video_frame_hashes(attach_video_payload_dups(d)))
    return pairs.select(
        "doc_a", "doc_b", "matched_a", "matched_b", "n_frames_a", "n_frames_b",
        ((F.col("doc_a") % 20 == 0) & (F.col("doc_b") == F.col("doc_a") + 10)).alias("planted"),
        (F.col("doc_b") % 40 == 30).alias("shifted"),
    )


# --- exact set-similarity join via prefix filtering (r12) -----------------------

_SETJOIN_T = "4/5"  # rational threshold: integer compare on both engines


def _setjoin_pairs_sql() -> str:
    from fractions import Fraction

    from sarpro_spark.llm.setjoin import (
        sql_allpairs_jaccard_pairs,
        sql_salted_planted_docs,
    )

    return sql_allpairs_jaccard_pairs(
        sql_salted_planted_docs("documents"), n=8, threshold=Fraction(_SETJOIN_T)
    )


@query("dedup_allpairs_jaccard", sql=_setjoin_pairs_sql, tags=("llm", "dedup"))
def q_dedup_allpairs_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join via PREFIX FILTERING (llm/setjoin.py,
    r12; AllPairs/PPJoin family): every pair with 8-gram-set Jaccard >= 0.8,
    candidates probed only through each set's rarest-first prefix
    (prefix_len = s - ceil(t*s) + 1). LOSSLESS by the prefix-filter theorem
    — and the oracle is the UNFILTERED brute-force join, so the hashed
    equality certifies completeness, not just self-consistency. Runs on the
    salted+planted corpus (doc-unique salt tokens + every 20th doc a
    verbatim copy): distinctive vocabulary puts each doc's own rare salt
    shingles in its prefix, so candidates ~ true pairs and the join scales
    linearly — the raw 31-word-vocabulary corpus keeps every pair
    co-shingled and stays as the ADVERSARIAL certificate in
    dedup_allpairs_prefix_stats. Threshold compares are exact integer
    arithmetic (i*den >= num*union) on both engines."""
    from fractions import Fraction

    from sarpro_spark.llm.setjoin import allpairs_jaccard_pairs, salted_planted_docs

    d = salted_planted_docs(frames.load_table(spark, sf_dir, "documents"))
    return allpairs_jaccard_pairs(d, n=8, threshold=Fraction(_SETJOIN_T))


#: fixed telemetry-sample size: the adversarial corpus is quadratic BY
#: DESIGN (every pair co-shingled), so the certificate runs on a
#: deterministic hash-ordered sample of constant size — the pruning
#: factors it hashes are scale-free, and the quadratic core stops
#: growing with the corpus (r13: the 10x soak measured the unsampled
#: form at vs_linear 5.29 — adversarial-by-design must not ride the
#: scale path)
_SETJOIN_STATS_CAP = 500


def _setjoin_stats_sql() -> str:
    from fractions import Fraction

    from sarpro_spark.llm.sampling import sql_hash_bucket
    from sarpro_spark.llm.setjoin import sql_allpairs_prefix_stats

    src = (
        f"(SELECT doc_id, text FROM documents "
        f"ORDER BY {sql_hash_bucket('doc_id', 'apstats')}, doc_id "
        f"LIMIT {_SETJOIN_STATS_CAP})"
    )
    return sql_allpairs_prefix_stats(src, threshold=Fraction(_SETJOIN_T))


@query("dedup_allpairs_prefix_stats", sql=_setjoin_stats_sql, tags=("llm", "dedup"))
def q_dedup_allpairs_prefix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruning telemetry of the AllPairs prefix filter, hashed as DATA:
    (n_tok, n_prefix, n_candidates, n_pairs). The oracle replicates the
    ALGORITHM (identical global rarity order and integer prefix bound), so
    the candidate-set size the verify step pays is itself certified —
    at t=0.8 on this corpus the prefix probes ~20% of the shingle relation
    and the positional filter cuts candidates ~7x vs prefix-only.
    Runs on a FIXED-size deterministic hash-ordered sample of the
    adversarial raw corpus (seeded top-500 — TakeOrderedAndProject, one
    scan): the low-vocabulary corpus keeps every pair co-shingled, so
    unsampled telemetry is quadratic by design and must not ride the
    scale path; the hashed pruning FACTORS are corpus-size-free."""
    from fractions import Fraction

    from sarpro_spark.llm.sampling import hash_bucket
    from sarpro_spark.llm.setjoin import allpairs_prefix_stats

    d = (
        frames.load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", hash_bucket(F.col("doc_id"), "apstats").alias("_hs"))
        .orderBy("_hs", "doc_id")
        .limit(_SETJOIN_STATS_CAP)
        .drop("_hs")
    )
    return allpairs_prefix_stats(d, threshold=Fraction(_SETJOIN_T))


# --- entity resolution: linkage pairs -> golden records (r12) --------------------

_RES_RECORDS_SQL = """
res_dict AS (
  SELECT d.name_id AS rid, d.p_name AS name,
         CAST(FLOOR(p.p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
         p.p_brand AS brand, 'dict' AS src
  FROM dict d JOIN part p ON p.p_partkey = d.name_id
),
res_mention AS (
  SELECT m.mid + 10000000 AS rid, m.mention AS name,
         CAST(FLOOR(p.p_retailprice * 100.0 + 0.5) AS BIGINT) + m.mid % 7 AS price_cents,
         CASE WHEN m.mid % 2 = 0 THEN p.p_brand ELSE 'UNK#99' END AS brand,
         'mention' AS src
  FROM mentions m JOIN part p ON p.p_partkey = m.mid
)
""".strip()


def _entity_resolution_sql() -> str:
    from sarpro_spark.llm.linkage import sql_fuzzy_best_match
    from sarpro_spark.llm.resolution import sql_resolve_entities

    fuzzy = sql_fuzzy_best_match("mentions", "dict", "mid", "mention", "name_id", "p_name")
    fuzzy_ctes = fuzzy.removeprefix("WITH ").split("\nSELECT lid,", 1)[0]
    res_ctes = sql_resolve_entities(
        "SELECT * FROM res_dict UNION ALL SELECT * FROM res_mention",
        "SELECT lid + 10000000 AS a, rid AS b FROM lkg_best WHERE rn = 1",
    )
    return f"""
WITH RECURSIVE {_MENTION_SQL},
{fuzzy_ctes},
{_RES_RECORDS_SQL},
{res_ctes}
SELECT g.cluster_id AS entity_id, g.n_members, g.n_mentions,
       n.canonical_name, g.latest_price, m.majority_brand
FROM res_golden g
JOIN res_name n USING (cluster_id)
JOIN res_modal m USING (cluster_id)
""".strip()


@query("entity_resolution_parts", sql=_entity_resolution_sql, tags=("llm", "linkage", "resolution"))
def q_entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution (llm/resolution.py, r12): the golden-record stage
    the linkage operator feeds — dirty part-name mentions (the certified
    fuzzy_match_partnames fixture: price drift, half the brands
    unknown) link to the name dictionary by the q-gram/Gravano/levenshtein
    resolver, match pairs cluster by connected components (only pair
    members ride the iteration), and SURVIVORSHIP merges each cluster into
    one golden row: longest-name canonical (ties lexicographically
    greatest), max-freshness price, modal brand (ties greatest). The
    oracle replicates components as a recursive min-label closure and
    every tie-break exactly — cluster formation AND merge rules are
    hashed, not just asserted."""
    from sarpro_spark.llm.linkage import fuzzy_best_match
    from sarpro_spark.llm.resolution import resolve_entities

    part = frames.load_table(spark, sf_dir, "part")
    nm, key = F.col("p_name"), F.col("p_partkey")
    pos = (key % (F.length(nm) - 2)) + 1
    deleted = F.concat(nm.substr(F.lit(1), pos), nm.substr(pos + 2, F.lit(1000)))
    mention = F.when(
        key % 5 == 0, F.concat(F.lit("x"), deleted.substr(F.lit(2), F.lit(1000)))
    ).otherwise(deleted)
    mentions = part.select(key.alias("mid"), mention.alias("mention"))
    dic = part.groupBy("p_name").agg(F.min("p_partkey").alias("name_id"))

    cents = F.floor(F.col("p_retailprice") * 100.0 + 0.5).cast("long")
    # the representative part's own p_name IS the dict name (name_id is the
    # min partkey of the name group), so joining on the key alone avoids the
    # ambiguous duplicate p_name column
    rec_dict = dic.select("name_id").join(
        part, F.col("name_id") == F.col("p_partkey")
    ).select(
        F.col("name_id").alias("rid"),
        F.col("p_name").alias("name"),
        cents.alias("price_cents"),
        F.col("p_brand").alias("brand"),
        F.lit("dict").alias("src"),
    )
    rec_mention = mentions.join(part, mentions["mid"] == part["p_partkey"]).select(
        (F.col("mid") + 10000000).alias("rid"),
        F.col("mention").alias("name"),
        (cents + F.col("mid") % 7).alias("price_cents"),
        F.when(F.col("mid") % 2 == 0, F.col("p_brand"))
        .otherwise(F.lit("UNK#99"))
        .alias("brand"),
        F.lit("mention").alias("src"),
    )
    records = rec_dict.unionByName(rec_mention)
    best = fuzzy_best_match(mentions, dic, "mid", "mention", "name_id", "p_name")
    pairs = best.select(
        (F.col("lid") + 10000000).alias("doc_a"), F.col("best_rid").alias("doc_b")
    )
    return resolve_entities(records, pairs)

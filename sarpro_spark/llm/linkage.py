"""Record linkage: q-gram blocking + edit-distance fuzzy join.

The entity-resolution primitive a data pipeline needs when keys are dirty
strings instead of ids: match noisy mentions against a canonical
dictionary (product names, domains, authors) without the |L|x|R| distance
matrix.  The standard scalable shape (Gravano et al. 2001, VLDB — the
q-gram count-filter join):

  q-grams   each string explodes into its character q-grams WITH
            MULTIPLICITY (an occurrence index disambiguates repeats) —
            an inverted index, the same shape as the n-gram Jaccard
            dedup index (llm/dedup.py).  Multiset semantics matter: the
            Gravano count bound below only holds when repeated grams
            count once per occurrence; distinct-gram counting silently
            prunes true matches between repetitive strings ("ababab").
  blocking  candidate pairs come ONLY from shared (gram, occurrence)
            keys; the count filter prunes further: edit distance <= d
            forces a multiset gram intersection of at least
            max(|a|, |b|) - q + 1 - q*d (each edit destroys at most q
            of the longer string's |s|-q+1 grams), so low-overlap pairs
            drop before any distance is computed.  Never a crossJoin;
            per-gram fan-out is bounded by gram document frequency on
            BOTH sides (hot grams capped like hot shingles — the cap
            trades bounded recall for a hard fan-out ceiling; capped
            grams simply stop generating candidates).
            Known limitation (documented, inherent to q-gram blocking):
            strings shorter than q produce zero grams and can never be
            matched — route sub-q keys through an exact-key equi-join.
  verify    exact levenshtein (identical Wagner-Fischer in Spark and
            DuckDB) on the surviving candidates only.
  resolve   one window per left row: best = min distance, tie-break on
            the canonical id — every stage shuffles on bounded keys.

Scale shape at 100 TB: the mention side streams through the gram index
(shuffle on gram); the dictionary side is typically small enough to
broadcast whole, making blocking map-side — both layouts fall out of the
same relations.

Reference analog: none (raster engine); built for the pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_Q = 3
DEFAULT_MAX_DIST = 2
DEFAULT_MAX_GRAM_DF = 4096


def qgram_profile(df: DataFrame, id_col: str, name_col: str, q: int = DEFAULT_Q) -> DataFrame:
    """(id, gram, occ, len) — character q-grams with multiplicity.

    ``occ`` numbers repeated occurrences of the same gram within one
    string (1..m), so an equi-join on (gram, occ) counts the MULTISET
    gram intersection — the quantity the Gravano count filter bounds.
    Built agg-side (groupBy + sequence re-explode) rather than with a
    per-(id, gram) window: one partial-aggregating shuffle, no sort.
    """
    t = F.col(name_col)
    pos = F.explode(F.sequence(F.lit(1), F.greatest(F.length(t) - (q - 1), F.lit(0))))
    grams = (
        df.select(F.col(id_col).alias("id"), t.alias("_t"), pos.alias("_i"))
        .select(
            "id",
            F.col("_t").substr(F.col("_i"), F.lit(q)).alias("gram"),
            F.length("_t").alias("len"),
        )
        .where(F.length("gram") == q)
    )
    return (
        grams.groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("_m"), F.first("len").alias("len"))
        .select(
            "id",
            "gram",
            F.explode(F.sequence(F.lit(1), F.col("_m"))).alias("occ"),
            "len",
        )
    )


def blocked_candidates(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_name: str,
    right_id: str,
    right_name: str,
    q: int = DEFAULT_Q,
    max_dist: int = DEFAULT_MAX_DIST,
    max_gram_df: int = DEFAULT_MAX_GRAM_DF,
) -> DataFrame:
    """(lid, rid, shared) pairs surviving the multiset q-gram count filter.

    ``shared`` = sum over grams of min(left multiplicity, right
    multiplicity) — the multiset intersection the Gravano bound needs.
    The hot-gram document-frequency cap applies to BOTH sides: a gram
    frequent only among left mentions would otherwise still fan out to
    cap x left-df candidate rows.
    """
    lg = qgram_profile(left, left_id, left_name, q).withColumnsRenamed(
        {"id": "lid", "len": "llen"}
    )
    rg = qgram_profile(right, right_id, right_name, q).withColumnsRenamed(
        {"id": "rid", "len": "rlen"}
    )
    rsz = rg.groupBy("gram").agg(F.countDistinct("rid").alias("_c"))
    rg = rg.join(rsz.where(F.col("_c") <= max_gram_df), "gram").drop("_c")
    lsz = lg.groupBy("gram").agg(F.countDistinct("lid").alias("_c"))
    lg = lg.join(lsz.where(F.col("_c") <= max_gram_df), "gram").drop("_c")
    return (
        lg.join(rg, ["gram", "occ"])
        .groupBy("lid", "rid")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.first("llen").alias("llen"),
            F.first("rlen").alias("rlen"),
        )
        .where(
            F.col("shared")
            >= F.greatest(
                F.greatest(F.col("llen"), F.col("rlen")) - F.lit(q - 1) - F.lit(q * max_dist),
                F.lit(1),
            )
        )
        .select("lid", "rid", "shared")
    )


def fuzzy_best_match(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_name: str,
    right_id: str,
    right_name: str,
    q: int = DEFAULT_Q,
    max_dist: int = DEFAULT_MAX_DIST,
    max_gram_df: int = DEFAULT_MAX_GRAM_DF,
) -> DataFrame:
    """Per left row: (lid, best_rid, best_name, best_dist, n_cands).

    n_cands counts candidates that PASSED the distance verify; rows with no
    verified candidate are absent (an outer-keep variant is one left join
    away).  Deterministic: min distance, then min canonical id.
    """
    cand = blocked_candidates(
        left, right, left_id, left_name, right_id, right_name, q, max_dist, max_gram_df
    )
    l = left.select(F.col(left_id).alias("lid"), F.col(left_name).alias("_lname"))
    r = right.select(F.col(right_id).alias("rid"), F.col(right_name).alias("_rname"))
    verified = (
        cand.join(l, "lid")
        .join(r, "rid")
        .withColumn("dist", F.levenshtein("_lname", "_rname"))
        .where(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy("lid").orderBy("dist", "rid")
    wcnt = Window.partitionBy("lid")
    return (
        verified.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_cands", F.count(F.lit(1)).over(wcnt))
        .where(F.col("_rn") == 1)
        .select(
            "lid",
            F.col("rid").alias("best_rid"),
            F.col("_rname").alias("best_name"),
            F.col("dist").alias("best_dist"),
            F.col("n_cands").cast("bigint").alias("n_cands"),
        )
    )


# --- DuckDB twins -------------------------------------------------------------


def sql_fuzzy_best_match(
    left_rel: str,
    right_rel: str,
    left_id: str,
    left_name: str,
    right_id: str,
    right_name: str,
    q: int = DEFAULT_Q,
    max_dist: int = DEFAULT_MAX_DIST,
    max_gram_df: int = DEFAULT_MAX_GRAM_DF,
) -> str:
    """Twin of :func:`fuzzy_best_match` (same blocking, count filter,
    verify, and tie-break)."""
    return f"""
WITH lkg_l0 AS (
  SELECT d.{left_id} AS lid, SUBSTR(d.{left_name}, i.i, {q}) AS gram,
         LENGTH(d.{left_name}) AS llen, i.i AS i
  FROM {left_rel} d
  JOIN (SELECT UNNEST(RANGE(1, (SELECT MAX(LENGTH({left_name})) FROM {left_rel}) + 1)) AS i) i
    ON i.i <= LENGTH(d.{left_name}) - {q - 1}
),
lkg_l1 AS (
  SELECT lid, gram, llen,
         ROW_NUMBER() OVER (PARTITION BY lid, gram ORDER BY i) AS occ
  FROM lkg_l0
),
lkg_r0 AS (
  SELECT d.{right_id} AS rid, SUBSTR(d.{right_name}, i.i, {q}) AS gram,
         LENGTH(d.{right_name}) AS rlen, i.i AS i
  FROM {right_rel} d
  JOIN (SELECT UNNEST(RANGE(1, (SELECT MAX(LENGTH({right_name})) FROM {right_rel}) + 1)) AS i) i
    ON i.i <= LENGTH(d.{right_name}) - {q - 1}
),
lkg_r1 AS (
  SELECT rid, gram, rlen,
         ROW_NUMBER() OVER (PARTITION BY rid, gram ORDER BY i) AS occ
  FROM lkg_r0
),
lkg_rsz AS (SELECT gram, COUNT(DISTINCT rid) AS c FROM lkg_r1 GROUP BY gram),
lkg_r AS (SELECT r.rid, r.gram, r.occ, r.rlen FROM lkg_r1 r JOIN lkg_rsz s USING (gram) WHERE s.c <= {max_gram_df}),
lkg_lsz AS (SELECT gram, COUNT(DISTINCT lid) AS c FROM lkg_l1 GROUP BY gram),
lkg_l AS (SELECT l.lid, l.gram, l.occ, l.llen FROM lkg_l1 l JOIN lkg_lsz s USING (gram) WHERE s.c <= {max_gram_df}),
lkg_cand AS (
  SELECT lid, rid, COUNT(*) AS shared, FIRST(llen) AS llen, FIRST(rlen) AS rlen
  FROM lkg_l l JOIN lkg_r r USING (gram, occ)
  GROUP BY lid, rid
  HAVING COUNT(*) >= GREATEST(GREATEST(FIRST(llen), FIRST(rlen)) - {q - 1} - {q * max_dist}, 1)
),
lkg_ver AS (
  SELECT c.lid, c.rid, r.{right_name} AS rname,
         LEVENSHTEIN(l.{left_name}, r.{right_name}) AS dist
  FROM lkg_cand c
  JOIN {left_rel} l ON c.lid = l.{left_id}
  JOIN {right_rel} r ON c.rid = r.{right_id}
  WHERE LEVENSHTEIN(l.{left_name}, r.{right_name}) <= {max_dist}
),
lkg_best AS (
  SELECT lid, rid, rname, dist,
         ROW_NUMBER() OVER (PARTITION BY lid ORDER BY dist, rid) AS rn,
         COUNT(*) OVER (PARTITION BY lid) AS n_cands
  FROM lkg_ver
)
SELECT lid, rid AS best_rid, rname AS best_name, dist AS best_dist,
       CAST(n_cands AS BIGINT) AS n_cands
FROM lkg_best WHERE rn = 1
""".strip()

"""Winnow-anchored exact-substring dedup — the ExactSubstr SCALE path.

llm/substring.py finds every exact shared run >= L with anchors at EVERY
character position: O(total_chars) anchor rows of ~24 bytes into a shuffle
(SHUFFLE_r11 measured shuffle_per_input ~1567x on the fixture) — correct,
but the one constant-factor scale cost left in the engine.  This module is
the documented scale path (substring.py:34-38): winnowing fingerprints
(Schleimer/Wilkerson/Aiken 2003, the MOSS scheme — already certified in
llm/text.py) sample anchors CONTENT-DEFINED at density 2/(w+1), cutting
the anchor relation ~w/2x, then candidate diagonals are re-densified only
inside candidate regions and extended by the SAME gaps-and-islands + exact
span-verify machinery:

  winnow    k-gram rolling hashes; each window of w consecutive positions
            selects its min-hash gram (position kept via an encoded
            (hash, pos) min — leftmost tie-break, identical in SQL).  Any
            shared run of length >= w+k-1 selects at least one COMMON
            anchor at the same content offset in both docs — winnowing's
            guarantee — so every true span >= min_len (>= w+k-1) yields a
            candidate diagonal.
  cap       hot-fingerprint document-frequency cap (stop-shingle doctrine).
  diagonals self-join on the fingerprint (doc_a < doc_b): (pair, diag,
            min/max anchor pos) — the sparse skeleton of each shared run.
  regions   per doc side, candidate intervals +- (w+k) slack, DISTINCT
            (duplicate intervals would split the island walk), merged by
            the running-max-end island union — the only text re-read.
  densify   full min_len-gram anchors ONLY inside merged regions (join
            docs x regions, bounded explode) — shuffle now proportional
            to duplicated content + slack, not corpus size.
  extend    the IDENTICAL diagonal gaps-and-islands + span-grain exact
            verify as the full-density path.

Slack bound: inside a shared run every w consecutive gram positions select
an anchor (gap <= w) and the outermost selected anchors sit within w+k of
the run's ends, so +-(w+k) covers the full extent of every guaranteed run;
with min_len >= w+k-1 the winnowed spans EQUAL the full-density spans up
to hot-gram-cap granularity (certified as data by the recall query).

Doc-length bound: the (hash, pos) encoding packs pos into 20 bits
(POS_ENC) — docs longer than ~1M chars need a wider encoding; the guard
filter drops them loudly rather than corrupting keys silently.

Reference analog: none (raster engine); public precedent: winnowing (MOSS),
suffix-array ExactSubstr (Lee et al. 2021, arXiv:2107.06499).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sarpro_spark.llm.substring import DEFAULT_MAX_GRAM_DF, DEFAULT_MIN_LEN
from sarpro_spark.llm.text import WINNOW_BASE, WINNOW_MOD, _rolling_hash_expr

WINNOW_K = 8
WINNOW_W = 16
#: pos bits in the (hash, pos) argmin encoding; hash < 2^30, so keys < 2^50
POS_ENC = 1 << 20
_SLACK = WINNOW_W + WINNOW_K


def winnow_anchors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    window: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, pos, h) — winnowing-selected k-gram anchors WITH position.

    llm/text.py winnowing_fingerprints keeps only (id, fp); substring
    extension needs the selected gram's position, recovered by taking the
    window min over keys h*POS_ENC + pos — min-hash first, leftmost
    position on ties, bit-identical in the SQL twin.
    """
    t = F.col(text_col)
    npos = F.length(t) - (k - 1)
    pos = F.explode(F.sequence(F.lit(1), F.greatest(npos, F.lit(0))))
    grams = (
        df.where(F.length(t) < POS_ENC)  # encoding bound, see module doc
        .select(F.col(id_col).alias("doc_id"), t.alias("_t"), npos.alias("_np"), pos.alias("_i"))
        .select(
            "doc_id",
            "_i",
            "_np",
            (
                _rolling_hash_expr(F.substring(F.col("_t"), F.col("_i"), k), k)
                * POS_ENC
                + F.col("_i")
            ).alias("_key"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("_i").rowsBetween(0, window - 1)
    return (
        grams.withColumn("_skey", F.min("_key").over(w))
        .where(F.col("_i") <= F.col("_np") - (window - 1))  # full windows only
        .select(
            "doc_id",
            F.col("_skey").bitwiseAND(F.lit(POS_ENC - 1)).alias("pos"),
            F.shiftright("_skey", 20).alias("h"),
        )
        .distinct()
    )


def candidate_regions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_LEN,
    max_gram_df: int = DEFAULT_MAX_GRAM_DF,
) -> DataFrame:
    """Merged per-doc candidate intervals (doc_id, s, e) from winnow-anchor
    diagonal hits — the only relation the densify step re-reads text for."""
    wa = winnow_anchors(df, id_col, text_col)
    wsz = wa.groupBy("h").agg(F.count(F.lit(1)).alias("_c"))
    wok = wa.join(wsz.where(F.col("_c") <= max_gram_df), "h").drop("_c")
    a = wok.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "h")
    b = wok.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "h")
    cand = (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", (F.col("pos_a") - F.col("pos_b")).alias("diag"))
        .agg(F.min("pos_a").alias("amin"), F.max("pos_a").alias("amax"))
    )
    regions = (
        cand.select(
            F.col("doc_a").alias("doc_id"),
            (F.col("amin") - _SLACK).alias("s"),
            (F.col("amax") + _SLACK + min_len).alias("e"),
        )
        .unionAll(
            cand.select(
                F.col("doc_b").alias("doc_id"),
                (F.col("amin") - F.col("diag") - _SLACK).alias("s"),
                (F.col("amax") - F.col("diag") + _SLACK + min_len).alias("e"),
            )
        )
        # DISTINCT is load-bearing: duplicate (s, e) rows make the island
        # walk's ROWS-frame order nondeterministic across evaluations and
        # split runs (caught by the DuckDB prototype — see r12 notes)
        .distinct()
    )
    w_prev = Window.partitionBy("doc_id").orderBy("s", "e").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.partitionBy("doc_id").orderBy("s", "e").rowsBetween(Window.unboundedPreceding, 0)
    marked = regions.withColumn(
        "_new", (F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-(1 << 40)))).cast("int")
    ).withColumn("_isl", F.sum("_new").over(w_run))
    return marked.groupBy("doc_id", "_isl").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    ).drop("_isl")


def exact_substring_spans_winnowed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_LEN,
    max_gram_df: int = DEFAULT_MAX_GRAM_DF,
) -> DataFrame:
    """Maximal verified shared runs via region-restricted densification —
    same output grain as substring.exact_substring_spans."""
    regions = candidate_regions(df, id_col, text_col, min_len, max_gram_df)
    docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    # Spark's sequence(a, b) DESCENDS when b < a — clamp the upper bound to
    # the lower and re-filter, so an empty clipped region yields zero rows
    # instead of a reversed two-element explode (substring_anchors doctrine)
    lower = F.greatest(F.col("s"), F.lit(1))
    upper = F.least(F.col("e"), F.length("_t") - (min_len - 1))
    rpos = F.explode(F.sequence(lower, F.greatest(upper, lower)))
    anchors = (
        docs.join(regions, "doc_id")
        .select("doc_id", "_t", upper.alias("_ub"), rpos.alias("pos"))
        .where(F.col("pos") <= F.col("_ub"))
        .select("doc_id", "pos", F.xxhash64(F.col("_t").substr(F.col("pos"), F.lit(min_len))).alias("h"))
    )
    sizes = anchors.groupBy("h").agg(F.count(F.lit(1)).alias("_c"))
    ok = anchors.join(sizes.where(F.col("_c") <= max_gram_df), "h").drop("_c")

    a = ok.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "h")
    b = ok.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "h")
    cand = (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pos_a", "pos_b", (F.col("pos_a") - F.col("pos_b")).alias("diag"))
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = cand.withColumn("island", F.col("pos_a") - F.row_number().over(w))
    spans = isl.groupBy("doc_a", "doc_b", "diag", "island").agg(
        F.min("pos_a").alias("start_a"),
        (F.min("pos_a") - F.col("diag")).alias("start_b"),
        (F.max("pos_a") - F.min("pos_a") + F.lit(min_len)).cast("bigint").alias("span_len"),
    )
    docs_a = df.select(F.col(id_col).alias("doc_a"), F.col(text_col).alias("_ta"))
    docs_b = df.select(F.col(id_col).alias("doc_b"), F.col(text_col).alias("_tb"))
    return (
        spans.join(docs_a, "doc_a")
        .join(docs_b, "doc_b")
        .where(
            F.col("_ta").substr(F.col("start_a"), F.col("span_len"))
            == F.col("_tb").substr(F.col("start_b"), F.col("span_len"))
        )
        .select("doc_a", "doc_b", "start_a", "start_b", "span_len")
    )


def exact_substring_pairs_winnowed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_LEN,
    max_gram_df: int = DEFAULT_MAX_GRAM_DF,
) -> DataFrame:
    """Per-pair aggregate — same schema as substring.exact_substring_pairs."""
    spans = exact_substring_spans_winnowed(df, id_col, text_col, min_len, max_gram_df)
    return spans.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("span_len").alias("max_span_len"),
        F.sum("span_len").cast("bigint").alias("dup_chars"),
    )


# --- DuckDB twins -------------------------------------------------------------


def sql_winnowed_spans_ctes(
    src_rel: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_LEN,
    max_gram_df: int = DEFAULT_MAX_GRAM_DF,
    k: int = WINNOW_K,
    window: int = WINNOW_W,
) -> str:
    """CTE chain ending in ``wspans`` — the winnowed algorithm verbatim
    (the oracle groups restricted anchors by the gram itself, so the
    Spark side's xxhash64 + span verify is the only asymmetry and can
    only remove collision phantoms, as in the full-density twin)."""
    horner = "CAST(0 AS BIGINT)"
    for j in range(k):
        horner = f"(({horner}) * {WINNOW_BASE} + ascii(SUBSTR(d.{text_col}, i.i + {j}, 1))) % {WINNOW_MOD}"
    slack = window + k
    return f"""
wgrams AS (
  SELECT d.{id_col} AS doc_id, i.i AS i, LENGTH(d.{text_col}) - {k - 1} AS np,
         ({horner}) * {POS_ENC} + i.i AS key
  FROM {src_rel} d,
       LATERAL (SELECT UNNEST(RANGE(1, GREATEST(LENGTH(d.{text_col}) - {k - 1}, 0) + 1)) AS i) i
  WHERE LENGTH(d.{text_col}) < {POS_ENC}
),
wsel AS (
  SELECT DISTINCT doc_id,
         MIN(key) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS skey
  FROM wgrams WHERE TRUE QUALIFY i <= np - {window - 1}
),
wanchor AS (SELECT doc_id, skey % {POS_ENC} AS pos, skey // {POS_ENC} AS h FROM wsel),
wsz AS (SELECT h, COUNT(*) AS c FROM wanchor GROUP BY h),
wok AS (SELECT a.doc_id, a.pos, a.h FROM wanchor a JOIN wsz s USING (h) WHERE s.c <= {max_gram_df}),
wcand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos - b.pos AS diag,
         MIN(a.pos) AS amin, MAX(a.pos) AS amax
  FROM wok a JOIN wok b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3
),
wregion0 AS (
  SELECT DISTINCT doc_id, s, e FROM (
    SELECT doc_a AS doc_id, amin - {slack} AS s, amax + {slack} + {min_len} AS e FROM wcand
    UNION ALL
    SELECT doc_b, amin - diag - {slack}, amax - diag + {slack} + {min_len} FROM wcand
  )
),
wregm AS (
  SELECT doc_id, s, e,
    CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1099511627776)
         THEN 1 ELSE 0 END AS new_isl
  FROM wregion0
),
wregions AS (
  SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM (
    SELECT doc_id, s, e, SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
    FROM wregm
  ) q GROUP BY doc_id, isl
),
wranch AS (
  SELECT d.{id_col} AS doc_id, i.i AS pos, SUBSTR(d.{text_col}, i.i, {min_len}) AS g
  FROM {src_rel} d JOIN wregions r ON d.{id_col} = r.doc_id,
       LATERAL (SELECT UNNEST(RANGE(GREATEST(r.s, 1),
                LEAST(r.e, LENGTH(d.{text_col}) - {min_len - 1}) + 1)) AS i) i
),
wrsz AS (SELECT g, COUNT(*) AS c FROM wranch GROUP BY g),
wrok AS (SELECT a.doc_id, a.pos, a.g FROM wranch a JOIN wrsz s USING (g) WHERE s.c <= {max_gram_df}),
wsscand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b,
         a.pos - b.pos AS diag
  FROM wrok a JOIN wrok b ON a.g = b.g AND a.doc_id < b.doc_id
),
wssisl AS (
  SELECT *, pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS island
  FROM wsscand
),
wspans AS (
  SELECT doc_a, doc_b, MIN(pos_a) AS start_a, MIN(pos_a) - diag AS start_b,
         CAST(MAX(pos_a) - MIN(pos_a) + {min_len} AS BIGINT) AS span_len
  FROM wssisl GROUP BY doc_a, doc_b, diag, island
)""".strip()


def sql_exact_substring_pairs_winnowed(
    src_rel: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_LEN,
    max_gram_df: int = DEFAULT_MAX_GRAM_DF,
) -> str:
    """DuckDB twin of :func:`exact_substring_pairs_winnowed`."""
    ctes = sql_winnowed_spans_ctes(src_rel, id_col, text_col, min_len, max_gram_df)
    return f"""
WITH {ctes}
SELECT doc_a, doc_b, COUNT(*) AS n_spans, MAX(span_len) AS max_span_len,
       CAST(SUM(span_len) AS BIGINT) AS dup_chars
FROM wspans GROUP BY doc_a, doc_b
""".strip()

"""Winnow-anchored exact-substring dedup — the ExactSubstr SCALE path.

llm/substring.py finds every exact shared run >= L with anchors at EVERY
character position: O(total_chars) anchor rows of ~24 bytes into a shuffle
(SHUFFLE_r11 measured shuffle_per_input ~1567x on the fixture) — correct,
but the one constant-factor scale cost left in the engine.  This module is
the documented scale path (substring.py:34-38): winnowing fingerprints
(Schleimer/Wilkerson/Aiken 2003, the MOSS scheme — already certified in
llm/text.py) sample anchors CONTENT-DEFINED at density 2/(w+1), cutting
the anchor relation ~w/2x, then each candidate diagonal is resolved by
DIRECT character comparison inside codegen — no per-position rows exist
anywhere in the plan:

  winnow    k-gram rolling hashes; each window of w consecutive positions
            selects its min-hash gram (position kept via an encoded
            (hash, pos) min — leftmost tie-break, identical in SQL).  Any
            shared run of length >= w+k-1 selects at least one COMMON
            anchor at the same content offset in both docs — winnowing's
            guarantee — so every true span >= min_len (= w+k-1) yields a
            candidate diagonal.  Selection is ALL column expressions on
            the doc row (char-code array, per-position key array, sliding
            array_min): an earlier draft used a per-position Window and
            shuffled the whole gram relation — MORE bytes than the full-
            density path it replaces (caught by shuffle_audit, r12).
  cap       hot-fingerprint document-frequency cap (stop-shingle doctrine).
  diagonals self-join on the fingerprint (doc_a < doc_b) -> (pair, diag,
            min/max anchor pos) — the sparse skeleton of each shared run.
  resolve   per diagonal, join the two docs ONCE and ship only the
            clamped region SLICES (bytes = candidate content, the true
            lower bound — an intermediate draft re-densified full anchors
            inside regions, and on a duplication-heavy corpus that
            resurrected the anchor shuffle at ~40% of corpus volume).
            The equality mask, run starts/ends, and min-length filter are
            array expressions on the pair row; spans ARE equal character
            runs — exact by construction, no hash, no verify step.

Slack bound: inside a shared run every w consecutive gram positions select
an anchor (gap <= w) and the outermost selected anchors sit within w+k of
the run's ends, so +-(w+k) covers the full extent of every guaranteed run;
with min_len >= w+k-1 the winnowed spans EQUAL the full-density spans up
to hot-gram-cap granularity (certified as data by the recall query — note
the two paths' caps act at different grains: full density can split a span
at a hot 40-gram, direct comparison cannot, so value_equal < n_pairs_both
is expected data, not drift).

Doc-length bound: the (hash, pos) encoding packs pos into 32 bits
(POS_ENC = 2^32; hash < 2^30 so keys < 2^62, still int64) — covering docs
up to ~4.29e9 chars, far past book length.  Anything longer is still
skipped for key correctness, but the exclusion is COUNTED and hashed into
the certificate (`excluded_long_docs` — the registered query carries
`excluded_docs`, expected 0), so an excluded doc trips the oracle gate
instead of vanishing.  (r12 shipped POS_ENC = 2^20, which silently
excluded book-length docs — the r12 verdict's one found defect; fixed r13
with a planted >1M-char regression fixture in tests/test_llm.py.)

Reference analog: none (raster engine); public precedent: winnowing (MOSS),
suffix-array ExactSubstr (Lee et al. 2021, arXiv:2107.06499).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sarpro_spark.llm.substring import DEFAULT_MAX_GRAM_DF, DEFAULT_MIN_LEN
from sarpro_spark.llm.text import WINNOW_BASE, WINNOW_MOD

#: winnow gram length: w + k - 1 must be <= min_len for the lossless
#: guarantee, and k must be SELECTIVE — k=8 grams of a shared vocabulary
#: collide corpus-wide and blew candidate diagonals up 140x on the fixture
#: (411k vs 2.9k at k=25, measured r12); k=25 is nearly as selective as
#: the 40-char full-density anchors while keeping w+k-1 = 40 = min_len.
WINNOW_K = 25
WINNOW_W = 16
#: pos bits in the (hash, pos) argmin encoding; hash < 2^30, so keys < 2^62
POS_ENC = 1 << 32
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

    Selection runs as a numpy Arrow block kernel (mapInPandas), NOT a
    per-position Window and NOT higher-order column functions: a window
    would shuffle the full O(total_chars) gram relation at ~40 bytes/row
    — measurably MORE shuffle than the full-density path it is supposed
    to beat — and Spark evaluates HOF lambdas INTERPRETED per element,
    which the r12 probe measured at ~10s for a 1.5M-char fixture vs
    ~0.3s for the vectorized kernel.  All-integer math (Horner rolling
    hash, sliding-window min over the encoded keys), so the selected set
    is bit-identical to the SQL twin's window-min; nothing shuffles until
    the already-winnowed (density 2/(w+1)) anchors hit the df-cap
    aggregate.
    """
    from typing import Iterator

    from pyspark.sql.types import LongType, StructField, StructType

    from sarpro_spark.functions.partitioning import widen_if_narrow

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pos", LongType()),
            StructField("h", LongType()),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids, poss, hs = [], [], []
            for i, text in zip(pdf["doc_id"], pdf["_t"]):
                if text is None or len(text) >= POS_ENC:
                    continue
                n = len(text)
                if n - k + 1 < window:
                    continue
                codes = np.fromiter(map(ord, text), dtype=np.int64, count=n)
                swc = sliding_window_view(codes, k)  # (n-k+1, k)
                h = np.zeros(n - k + 1, dtype=np.int64)
                for j in range(k):  # vectorized Horner, exact int64 mod
                    h = (h * WINNOW_BASE + swc[:, j]) % WINNOW_MOD
                keys = h * POS_ENC + np.arange(1, n - k + 2, dtype=np.int64)
                sel = np.unique(sliding_window_view(keys, window).min(axis=1))
                ids.extend([int(i)] * len(sel))
                poss.extend((sel % POS_ENC).tolist())
                hs.extend((sel // POS_ENC).tolist())
            yield pd.DataFrame({"doc_id": ids, "pos": poss, "h": hs})

    src = widen_if_narrow(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")), "doc_id"
    )
    return src.mapInPandas(fn, schema=schema)


def candidate_diagonals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int = DEFAULT_MAX_GRAM_DF,
) -> DataFrame:
    """(doc_a, doc_b, diag, amin, amax) — one row per candidate diagonal
    from shared winnow anchors (df-capped, doc_a < doc_b)."""
    wa = winnow_anchors(df, id_col, text_col)
    wsz = wa.groupBy("h").agg(F.count(F.lit(1)).alias("_c"))
    wok = wa.join(wsz.where(F.col("_c") <= max_gram_df), "h").drop("_c")
    a = wok.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "h")
    b = wok.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "h")
    return (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", (F.col("pos_a") - F.col("pos_b")).alias("diag"))
        .agg(F.min("pos_a").alias("amin"), F.max("pos_a").alias("amax"))
    )


def exact_substring_spans_winnowed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_LEN,
    max_gram_df: int = DEFAULT_MAX_GRAM_DF,
) -> DataFrame:
    """Maximal shared runs, computed PER CANDIDATE DIAGONAL by direct
    character comparison inside codegen — no per-position rows anywhere.

    The first winnowed design re-densified full min_len-gram anchors
    inside candidate regions; on a duplication-heavy corpus those regions
    are a large corpus fraction, so the anchor shuffle came back (r12
    shuffle_audit: parity with full density, not a win).  Direct
    comparison ships each diagonal's clamped text SLICES once (bytes =
    region size, the true lower bound), then every per-position step —
    char equality mask, run starts/ends, length filter — is array
    expressions on the pair row.  Exact by construction: spans ARE equal
    runs, so no hash step and no verify step exist to diverge.
    """
    cand = candidate_diagonals(df, id_col, text_col, max_gram_df)
    docs_a = df.select(F.col(id_col).alias("doc_a"), F.col(text_col).alias("_ta"))
    docs_b = df.select(F.col(id_col).alias("doc_b"), F.col(text_col).alias("_tb"))
    lo = F.greatest(F.lit(1), F.col("diag") + 1, F.col("amin") - _SLACK)
    hi = F.least(
        F.length("_ta"),
        F.length("_tb") + F.col("diag"),
        F.col("amax") + _SLACK + min_len,
    )
    paired = (
        cand.join(docs_a, "doc_a")
        .join(docs_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "diag",
            lo.alias("_lo"),
            (hi - lo + 1).alias("_n"),
            # region slices only — the pair row never carries full texts
            F.col("_ta").substr(lo, F.greatest(hi - lo + 1, F.lit(0))).alias("_sa"),
            F.col("_tb").substr(lo - F.col("diag"), F.greatest(hi - lo + 1, F.lit(0))).alias("_sb"),
        )
        .where(F.col("_n") >= min_len)
    )
    chars = lambda c: F.filter(F.split(c, ""), lambda x: x != F.lit(""))  # noqa: E731
    eq = F.zip_with(chars(F.col("_sa")), chars(F.col("_sb")), lambda x, y: x == y)
    masked = paired.select("doc_a", "doc_b", "diag", "_lo", "_n", eq.alias("_eq"))
    idx = F.sequence(F.lit(1), F.col("_n"))
    starts = F.filter(
        idx,
        lambda i: F.element_at("_eq", i.cast("int"))
        & ((i == 1) | ~F.element_at("_eq", (i - 1).cast("int"))),
    )
    ends = F.filter(
        idx,
        lambda i: F.element_at("_eq", i.cast("int"))
        & ((i == F.col("_n")) | ~F.element_at("_eq", (i + 1).cast("int"))),
    )
    runs = F.zip_with(
        starts, ends, lambda s, e: F.struct(s.alias("s"), (e - s + 1).alias("l"))
    )
    spans = F.filter(runs, lambda r: r["l"] >= min_len)
    return (
        masked.select(
            "doc_a", "doc_b", "diag", "_lo", F.explode(spans).alias("_r")
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("_lo") + F.col("_r.s") - 1).alias("start_a"),
            (F.col("_lo") + F.col("_r.s") - 1 - F.col("diag")).alias("start_b"),
            F.col("_r.l").cast("bigint").alias("span_len"),
        )
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


def excluded_long_docs(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """1-row (excluded_docs BIGINT) — docs the winnow kernel cannot encode
    (length >= POS_ENC).  Hashed into the certificate so an exclusion is a
    loud oracle break, never a silent recall hole (r12 verdict defect 1)."""
    return df.agg(
        F.sum((F.length(text_col) >= POS_ENC).cast("int"))
        .cast("bigint")
        .alias("excluded_docs")
    )


def sql_excluded_long_docs(src_rel: str, text_col: str = "text") -> str:
    """Scalar SQL expression for the DuckDB twin of excluded_long_docs."""
    return (
        f"(SELECT CAST(COALESCE(SUM(CASE WHEN LENGTH({text_col}) >= {POS_ENC}"
        f" THEN 1 ELSE 0 END), 0) AS BIGINT) FROM {src_rel})"
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
    """CTE chain ending in ``wspans`` — the winnowed algorithm verbatim:
    winnow selection (window min of the encoded keys — the SAME selected
    set as Spark's sliding array_min), df cap, diagonal skeleton, then
    per-diagonal direct character comparison resolved by the classic
    gaps-and-islands over equal positions.  Runs of >= min_len equal
    chars ARE the spans on both engines — nothing to verify."""
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
wpair AS (
  SELECT c.doc_a, c.doc_b, c.diag,
         GREATEST(1, c.diag + 1, c.amin - {slack}) AS lo,
         LEAST(LENGTH(a.{text_col}), LENGTH(b.{text_col}) + c.diag,
               c.amax + {slack} + {min_len}) AS hi,
         a.{text_col} AS ta, b.{text_col} AS tb
  FROM wcand c
  JOIN {src_rel} a ON c.doc_a = a.{id_col}
  JOIN {src_rel} b ON c.doc_b = b.{id_col}
),
weq AS (
  SELECT doc_a, doc_b, diag, p.p AS p
  FROM wpair, LATERAL (SELECT UNNEST(RANGE(lo, hi + 1)) AS p) p
  WHERE hi - lo + 1 >= {min_len}
    AND SUBSTR(ta, p.p, 1) = SUBSTR(tb, p.p - diag, 1)
),
wisl AS (
  SELECT *, p - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY p) AS island
  FROM weq
),
wspans AS (
  SELECT doc_a, doc_b, MIN(p) AS start_a, MIN(p) - diag AS start_b,
         CAST(MAX(p) - MIN(p) + 1 AS BIGINT) AS span_len
  FROM wisl GROUP BY doc_a, doc_b, diag, island
  HAVING MAX(p) - MIN(p) + 1 >= {min_len}
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

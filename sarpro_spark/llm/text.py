"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all native column expressions (no Python in the
row path), each with a DuckDB-expressible formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny stopword lexicons for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}

TOKEN_SPLIT_RE = "[^a-z0-9]+"
#: BPE-ish pieces: runs of letters, runs of digits, or single punctuation
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens_expr(text: Column) -> Column:
    """Whitespace/punctuation tokens (lowercased, empties dropped)."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_expr(text))


def bpe_ish_count(text: Column) -> Column:
    """Sub-word-ish piece count via regexp (letter runs + digit runs + punct)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_RE), 0))


def _count_word(text_padded: Column, word: str) -> Column:
    """Occurrences of ' word ' in the space-padded lowered text — the
    portable stopword counter ((len - len(replace)) / len(' word '))."""
    needle = f" {word} "
    return (
        (F.length(text_padded) - F.length(F.regexp_replace(text_padded, needle, " ")))
        / F.lit(len(needle) - 1)
    ).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit score per language. Overlapping occurrences ('le le le')
    are resolved left-to-right by the replace, identically in both engines."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum((_count_word(padded, w) for w in words), F.lit(0))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id_expr(text: Column) -> Column:
    """argmax language with deterministic tie-break (alphabetical), 'und'
    (undetermined) when no stopword hits at all."""
    scores = lang_scores(text)
    langs = sorted(scores)  # alphabetical tiebreak
    best = None
    best_score = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    total = sum((scores[lg] for lg in langs), F.lit(0))
    return F.when(total == 0, F.lit("und")).otherwise(best)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, token stats, punctuation/digit/stopword
    ratios, and a composite [0,1] score (weights are engine policy, the
    features are the operator surface)."""
    from sarpro_spark.queries import fround

    t = F.col(text_col)
    lowered = F.lower(t)
    n_chars = F.length(t)
    n_tok = token_count(t)
    toks = tokens_expr(t)
    mean_tok_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    n_punct = F.length(F.regexp_replace(lowered, "[a-z0-9\\s]", ""))
    n_digit = F.length(F.regexp_replace(lowered, "[^0-9]", ""))
    padded = F.concat(F.lit(" "), lowered, F.lit(" "))
    n_stop = sum((_count_word(padded, w) for w in LANG_STOPWORDS["en"]), F.lit(0))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    digit_ratio = n_digit.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    # composite: long-enough, low punctuation, some stopwords, sane word len
    score = (
        F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.2
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.2
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 8.0), 1.0).otherwise(0.0) * 0.2
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tok.alias("q_tokens"),
        fround(mean_tok_len, 6).alias("q_mean_tok_len"),
        fround(punct_ratio, 6).alias("q_punct_ratio"),
        fround(digit_ratio, 6).alias("q_digit_ratio"),
        fround(stop_ratio, 6).alias("q_stop_ratio"),
        fround(score, 6).alias("q_score"),
    )


def fingerprint_expr(text: Column, length: int = 16) -> Column:
    """Whole-document fingerprint: md5 of the whitespace-normalized lowercase
    text, truncated — the join-key form of content identity."""
    norm = F.regexp_replace(F.trim(F.lower(text)), "\\s+", " ")
    return F.substring(F.md5(norm), 1, length)


# --- winnowing (rolling-hash) fingerprints -----------------------------------

WINNOW_BASE = 257
WINNOW_MOD = 1_000_000_007  # Horner intermediates stay < MOD*BASE << 2^63


def _rolling_hash_expr(kgram: Column, k: int) -> Column:
    """Polynomial hash h = sum(code_i * B^(k-1-i)) mod P, evaluated as the
    Horner recurrence ((h*B + code) mod P) — the relational per-k-gram form
    of the O(1)-per-step rolling hash an imperative scanner maintains.
    Exact int64 arithmetic, identical in the SQL twin."""
    h = F.lit(0).cast("long")
    for j in range(k):
        code = F.ascii(F.substring(kgram, j + 1, 1)).cast("long")
        h = (h * WINNOW_BASE + code) % WINNOW_MOD
    return h


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 16,
) -> DataFrame:
    """Winnowing document fingerprints (the standard local-fingerprint scheme
    over a rolling hash): k-gram rolling hashes, then keep the MINIMUM hash
    of every ``window`` consecutive positions — any shared substring of
    length >= window+k-1 between two documents is guaranteed to share a
    fingerprint. Output: distinct (id, fp)."""
    from pyspark.sql.window import Window as W

    lowered = F.lower(F.col(text_col))
    npos = F.length(lowered) - (k - 1)
    pos = F.explode(F.sequence(F.lit(1), F.greatest(npos, F.lit(0))))
    grams = (
        df.select(F.col(id_col), lowered.alias("_t"), npos.alias("_np"), pos.alias("_i"))
        .select(
            F.col(id_col),
            F.col("_i"),
            F.col("_np"),
            _rolling_hash_expr(F.substring(F.col("_t"), F.col("_i"), k), k).alias("_h"),
        )
    )
    w = W.partitionBy(id_col).orderBy("_i").rowsBetween(0, window - 1)
    sel = (
        grams.withColumn("fp", F.min("_h").over(w))
        # only full windows (winnowing is defined over complete windows)
        .where(F.col("_i") <= F.col("_np") - (window - 1))
        .select(F.col(id_col), "fp")
        .distinct()
    )
    return sel


def sql_winnowing(src_rel: str, id_col: str = "doc_id", text_col: str = "text",
                  k: int = 8, window: int = 16) -> str:
    """DuckDB twin of :func:`winnowing_fingerprints`."""
    horner = "CAST(0 AS BIGINT)"
    for j in range(k):
        horner = f"(({horner}) * {WINNOW_BASE} + ascii(SUBSTR(t, i.i + {j}, 1))) % {WINNOW_MOD}"
    return f"""
grams AS (
  SELECT {id_col}, i.i AS i, LENGTH(t) - {k - 1} AS np,
         {horner} AS h
  FROM (SELECT {id_col}, LOWER({text_col}) AS t FROM {src_rel}) d,
       LATERAL (SELECT UNNEST(RANGE(1, GREATEST(LENGTH(d.t) - {k - 1}, 0) + 1)) AS i) i
),
winnowed AS (
  SELECT {id_col},
         MIN(h) OVER (PARTITION BY {id_col} ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fp,
         i, np
  FROM grams
)
SELECT DISTINCT {id_col}, fp FROM winnowed WHERE i <= np - {window - 1}
""".strip()


# --- DuckDB twins ------------------------------------------------------------


def sql_count_word(padded: str, word: str) -> str:
    needle = f" {word} "
    return (
        f"CAST((LENGTH({padded}) - LENGTH(REGEXP_REPLACE({padded}, '{needle}', ' ', 'g'))) / {len(needle) - 1} AS INTEGER)"
    )


def sql_lang_id(text: str) -> str:
    padded = f"(' ' || LOWER({text}) || ' ')"
    score_exprs = {
        lang: " + ".join(sql_count_word(padded, w) for w in words)
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = sorted(score_exprs)
    # build argmax via nested CASE, alphabetical tiebreak (strictly-greater)
    best = f"'{langs[0]}'"
    best_score = f"({score_exprs[langs[0]]})"
    for lang in langs[1:]:
        s = f"({score_exprs[lang]})"
        best = f"CASE WHEN {s} > {best_score} THEN '{lang}' ELSE {best} END"
        best_score = f"CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END"
    total = " + ".join(f"({e})" for e in score_exprs.values())
    return f"CASE WHEN ({total}) = 0 THEN 'und' ELSE {best} END"


# --- unigram-LM log-probability scoring (the CCNet-style quality filter) -----

#: vocabulary cap for the unigram model (deterministic top-V by freq, word)
UNIGRAM_VOCAB = 5000


def unigram_logprob_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", vocab: int = UNIGRAM_VOCAB
) -> DataFrame:
    """Per-doc mean negative log-probability under an add-one-smoothed
    unigram LM fit on the corpus itself — the CCNet-style perplexity filter
    shape (production swaps the in-corpus frequency table for a trusted
    reference LM; the plan is identical). High scores = improbable token
    streams (boilerplate, mojibake, keyword stuffing).

    Scale shape: token frequencies are ONE map-side-combined shuffle; the
    capped vocabulary broadcasts back onto the token stream; the per-doc
    score is one aggregation. p(w) = (freq + 1) / (N + V + 1) in-vocab,
    1 / (N + V + 1) for OOV."""
    from pyspark.sql import functions as F

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")).alias("tok"),
    ).where(F.length("tok") > 0)
    freqs = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("tok").asc())
        .limit(vocab)
    )
    totals = toks.agg(F.count(F.lit(1)).alias("n_total")).crossJoin(
        freqs.agg(F.count(F.lit(1)).alias("v_size"))
    )
    scored = (
        toks.join(F.broadcast(freqs), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("tf"), F.lit(0)) + F.lit(1.0))
                    / (F.col("n_total") + F.col("v_size") + F.lit(1.0))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("nll").alias("mean_nll"),
    )


def sql_unigram_logprob(docs_rel: str, vocab: int = UNIGRAM_VOCAB) -> str:
    """DuckDB twin of :func:`unigram_logprob_scores` (same smoothing, same
    deterministic vocab cap); wrap mean_nll in fround at the call site."""
    return f"""
WITH utoks AS MATERIALIZED (
  SELECT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(text), '[^a-z0-9]+')) AS tok
    FROM {docs_rel}
  ) t WHERE LENGTH(tok) > 0
),
ufreqs AS MATERIALIZED (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM utoks GROUP BY tok
  ORDER BY tf DESC, tok ASC LIMIT {vocab}
),
utotals AS (
  SELECT (SELECT COUNT(*) FROM utoks) AS n_total,
         (SELECT COUNT(*) FROM ufreqs) AS v_size
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       AVG(-LN((COALESCE(f.tf, 0) + 1.0) / (u.n_total + u.v_size + 1.0))) AS mean_nll
FROM utoks t LEFT JOIN ufreqs f USING (tok), utotals u
GROUP BY doc_id
""".strip()


# --- interpolated bigram-LM scoring ------------------------------------------

#: bigram table cap (deterministic top-B by count, pair) — the model stays
#: broadcast-sized at any corpus scale; pruned bigrams back off to unigram
BIGRAM_CAP = 20000
#: interpolation weight on the bigram term
BIGRAM_LAMBDA = 0.7


def bigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: int = UNIGRAM_VOCAB,
    bigram_cap: int = BIGRAM_CAP,
    lam: float = BIGRAM_LAMBDA,
) -> DataFrame:
    """Per-doc mean negative log-probability under an INTERPOLATED bigram LM
    (Jelinek-Mercer: lam * c(prev,w)/c(prev) + (1-lam) * p_add1_unigram(w))
    fit on the corpus — the next rung above the unigram CCNet filter;
    catches shuffled-word salads the unigram model scores as fluent.

    Scale shape: one pair explode, three map-side-combined aggregates
    (bigram counts capped top-B, predecessor counts, unigram vocab), all
    broadcast back onto the pair stream; one per-doc aggregate. Bigrams
    pruned by the cap contribute only their unigram term (c2 -> 0), so the
    model is bounded regardless of corpus size."""
    from pyspark.sql import functions as F

    arr = tokens_expr(F.col(text_col))
    base = docs.select(F.col(id_col), arr.alias("_t")).where(F.size("_t") >= 2)
    pair = F.explode(
        F.zip_with(
            F.slice("_t", 1, F.size("_t") - 1),
            F.slice("_t", 2, F.size("_t") - 1),
            lambda a, b: F.struct(a.alias("prev"), b.alias("tok")),
        )
    )
    pairs = base.select(F.col(id_col), pair.alias("p")).select(
        id_col, F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok")
    )
    big = (
        pairs.groupBy("prev", "tok")
        .agg(F.count(F.lit(1)).alias("c2"))
        .orderBy(F.col("c2").desc(), F.col("prev").asc(), F.col("tok").asc())
        .limit(bigram_cap)
    )
    cprev = pairs.groupBy("prev").agg(F.count(F.lit(1)).alias("c1"))
    # unigram leg over ALL tokens (same model as unigram_logprob_scores)
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")).alias("tok"),
    ).where(F.length("tok") > 0)
    freqs = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("tok").asc())
        .limit(vocab)
    )
    totals = toks.agg(F.count(F.lit(1)).alias("n_total")).crossJoin(
        freqs.agg(F.count(F.lit(1)).alias("v_size"))
    )
    p_uni = (F.coalesce(F.col("tf"), F.lit(0)) + F.lit(1.0)) / (
        F.col("n_total") + F.col("v_size") + F.lit(1.0)
    )
    p = (
        F.lit(lam)
        * F.coalesce(F.col("c2"), F.lit(0)).cast("double")
        / F.col("c1").cast("double")
        + F.lit(1.0 - lam) * p_uni
    )
    scored = (
        pairs.join(F.broadcast(big), ["prev", "tok"], "left")
        .join(F.broadcast(cprev), "prev")
        .join(F.broadcast(freqs), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(id_col, (-F.log(p)).alias("nll"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("nll").alias("mean_nll2"),
    )


def sql_bigram_logprob(
    docs_rel: str,
    vocab: int = UNIGRAM_VOCAB,
    bigram_cap: int = BIGRAM_CAP,
    lam: float = BIGRAM_LAMBDA,
) -> str:
    """DuckDB twin of :func:`bigram_logprob_scores`; wrap mean_nll2 in
    fround at the call site."""
    toks = "LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> '')"
    return f"""
WITH bt AS MATERIALIZED (
  SELECT doc_id, {toks} AS t FROM {docs_rel}
),
bpairs AS MATERIALIZED (
  SELECT doc_id, t[i] AS prev, t[i + 1] AS tok
  FROM (SELECT doc_id, t, UNNEST(generate_series(1, GREATEST(LEN(t) - 1, 0))) AS i
        FROM bt WHERE LEN(t) >= 2) z
),
big AS MATERIALIZED (
  SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS c2 FROM bpairs GROUP BY 1, 2
  ORDER BY c2 DESC, prev ASC, tok ASC LIMIT {bigram_cap}
),
cprev AS MATERIALIZED (SELECT prev, CAST(COUNT(*) AS BIGINT) AS c1 FROM bpairs GROUP BY 1),
utoks AS MATERIALIZED (
  SELECT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(text), '[^a-z0-9]+')) AS tok
    FROM {docs_rel}
  ) t WHERE LENGTH(tok) > 0
),
ufreqs AS MATERIALIZED (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM utoks GROUP BY tok
  ORDER BY tf DESC, tok ASC LIMIT {vocab}
),
utotals AS (
  SELECT (SELECT COUNT(*) FROM utoks) AS n_total,
         (SELECT COUNT(*) FROM ufreqs) AS v_size
)
SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  AVG(-LN(
    {lam!r} * CAST(COALESCE(b.c2, 0) AS DOUBLE) / CAST(cp.c1 AS DOUBLE)
    + {1.0 - lam!r} * ((COALESCE(f.tf, 0) + 1.0) / (u.n_total + u.v_size + 1.0))
  )) AS mean_nll2
FROM bpairs p
LEFT JOIN big b ON b.prev = p.prev AND b.tok = p.tok
JOIN cprev cp ON cp.prev = p.prev
LEFT JOIN ufreqs f ON f.tok = p.tok
CROSS JOIN utotals u
GROUP BY p.doc_id
""".strip()

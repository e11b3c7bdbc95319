"""Corpus-hygiene operators a training-data pipeline runs before/alongside
dedup: PII redaction, benchmark-contamination detection, and within-document
repetition scoring (the C4/Gopher filter family). All native column
expressions / relational plans with DuckDB twins — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sarpro_spark.llm.dedup import char_shingles, sql_char_shingles

# --- PII redaction ------------------------------------------------------------

# Patterns restricted to the syntax subset Java regex and RE2 (DuckDB) agree
# on: no lookarounds, no backrefs. Applied longest-pattern-first so a 16-digit
# card is never half-consumed by the phone pattern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b", "<CARD>"),
    ("phone", r"\+?\d{1,2}[- ]\(?\d{3}\)?[- ]\d{3}[- ]\d{4}", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type PII match counts (counted BEFORE redaction, each on the text
    with longer patterns already removed so types don't double-count)."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        out[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, repl)
    return out


def redact_pii_expr(text: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    cur = text
    for _name, pat, repl in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, repl)
    return cur


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds pii_<type> count columns and a ``redacted`` text column."""
    counts = pii_counts(F.col(text_col))
    return df.select(
        "*",
        *[c.alias(f"pii_{name}") for name, c in counts.items()],
        redact_pii_expr(F.col(text_col)).alias("redacted"),
    )


def sql_redact_pii(text_expr: str) -> tuple[dict[str, str], str]:
    """DuckDB twin: returns ({type: count_expr}, redacted_expr)."""
    counts: dict[str, str] = {}
    cur = text_expr
    for name, pat, repl in PII_PATTERNS:
        esc = pat.replace("'", "''")
        counts[name] = f"LEN(regexp_extract_all({cur}, '{esc}'))"
        cur = f"regexp_replace({cur}, '{esc}', '{repl}', 'g')"
    return counts, cur


# --- benchmark contamination --------------------------------------------------


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 16,
) -> DataFrame:
    """Fraction of each doc's distinct char-``n``-gram set that also occurs in
    the benchmark corpus — the standard train/eval overlap check. Returns
    (id, n_grams, n_hit, contamination).

    Scale shape: one inverted join on the shingle value (shuffle keyed by
    shingle, never doc x doc), benchmark grams deduplicated first. Exactly the
    dedup doctrine: candidates come from shared content, sizes ride a
    broadcast."""
    sh = char_shingles(docs, id_col, text_col, n)
    bench = (
        char_shingles(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        sh.join(bench, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    from sarpro_spark.queries import fround

    return (
        sizes.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            fround(
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_grams"), 6
            ).alias("contamination"),
        )
    )


def sql_contamination(
    docs_sel: str,
    bench_sel: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 16,
) -> str:
    """DuckDB twin of :func:`contamination_scores`. ``docs_sel``/``bench_sel``
    are relations with (id, text)."""
    from sarpro_spark.queries import sql_fround

    doc_sh = sql_char_shingles("docs", id_col, text_col, n)
    bench_sh = sql_char_shingles("bench", id_col, text_col, n).replace(
        "shingles AS (", "bshingles AS (", 1
    )
    return f"""
WITH docs AS ({docs_sel}),
bench AS ({bench_sel}),
{doc_sh},
{bench_sh},
bgrams AS (SELECT DISTINCT shingle FROM bshingles),
sizes AS (SELECT {id_col}, COUNT(*) AS n_grams FROM shingles GROUP BY {id_col}),
hits AS (
  SELECT s.{id_col}, COUNT(*) AS n_hit
  FROM shingles s JOIN bgrams USING (shingle)
  GROUP BY s.{id_col}
)
SELECT z.{id_col}, z.n_grams, COALESCE(h.n_hit, 0) AS n_hit,
       {sql_fround(f"CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / z.n_grams")} AS contamination
FROM sizes z LEFT JOIN hits h USING ({id_col})
""".strip()


# --- within-document repetition ----------------------------------------------


def repetition_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4/Gopher-style repetition features per doc: total tokens, fraction of
    duplicate word-trigrams (1 - distinct/total), and the most-frequent-token
    share. Tokens ride ONE posexplode; trigrams are lead() windows over it —
    two shuffles total (both keyed by doc)."""
    from pyspark.sql.window import Window as W

    from sarpro_spark.llm.text import tokens_expr
    from sarpro_spark.queries import fround

    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens_expr(F.col(text_col))).alias("pos", "tok"),
    )
    w = W.partitionBy(id_col).orderBy("pos")
    tri = toks.select(
        F.col(id_col),
        "tok",
        F.concat_ws(
            " ", "tok", F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
        ).alias("tri"),
        F.lead("tok", 2).over(w).alias("_t2"),
    )
    per_tok = tri.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tc"))
    tok_stats = per_tok.groupBy(id_col).agg(
        F.sum("tc").alias("n_tokens"), F.max("tc").alias("top_tc")
    )
    tri_stats = (
        tri.where(F.col("_t2").isNotNull())
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.countDistinct("tri").alias("n_tri_distinct"),
        )
    )
    return (
        tok_stats.join(tri_stats, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            fround(F.col("top_tc").cast("double") / F.col("n_tokens"), 6).alias("top_token_frac"),
            fround(
                F.when(
                    F.col("n_tri").isNotNull() & (F.col("n_tri") > 0),
                    1.0 - F.col("n_tri_distinct").cast("double") / F.col("n_tri"),
                ).otherwise(0.0),
                6,
            ).alias("dup_trigram_frac"),
        )
    )


def sql_repetition(docs_sel: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of :func:`repetition_scores`."""
    from sarpro_spark.llm.text import TOKEN_SPLIT_RE
    from sarpro_spark.queries import sql_fround

    return f"""
WITH docs AS ({docs_sel}),
toks AS (
  SELECT {id_col}, u.pos, u.tok
  FROM docs,
       LATERAL (
         SELECT UNNEST(list_filter(regexp_split_to_array(LOWER({text_col}), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS tok,
                UNNEST(RANGE(1, LEN(list_filter(regexp_split_to_array(LOWER({text_col}), '{TOKEN_SPLIT_RE}'), x -> x <> '')) + 1)) AS pos
       ) u
),
tri AS (
  SELECT {id_col}, tok,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS tri,
         LEAD(tok, 2) OVER w AS _t2
  FROM toks
  WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
),
per_tok AS (SELECT {id_col}, tok, COUNT(*) AS tc FROM tri GROUP BY {id_col}, tok),
tok_stats AS (SELECT {id_col}, CAST(SUM(tc) AS BIGINT) AS n_tokens, MAX(tc) AS top_tc FROM per_tok GROUP BY {id_col}),
tri_stats AS (
  SELECT {id_col}, COUNT(*) AS n_tri, COUNT(DISTINCT tri) AS n_tri_distinct
  FROM tri WHERE _t2 IS NOT NULL GROUP BY {id_col}
)
SELECT t.{id_col}, t.n_tokens,
       {sql_fround('CAST(t.top_tc AS DOUBLE) / t.n_tokens')} AS top_token_frac,
       {sql_fround('CASE WHEN r.n_tri IS NOT NULL AND r.n_tri > 0 THEN 1.0 - CAST(r.n_tri_distinct AS DOUBLE) / r.n_tri ELSE 0.0 END')} AS dup_trigram_frac
FROM tok_stats t LEFT JOIN tri_stats r USING ({id_col})
""".strip()


# --- duplicated passages ------------------------------------------------------

#: words per passage shingle (a duplicated run of r shingles ~= a shared
#: passage of r + w - 1 words)
DUP_PASSAGE_W = 3


def duplicated_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = DUP_PASSAGE_W,
) -> DataFrame:
    """Within-corpus duplicated-passage scoring (the substring-level dedup
    signal of Lee et al.'s 'Deduplicating Training Data' — here at word-
    shingle grain): for each doc, the fraction of its word-``w``-shingles
    that occur in >= 2 distinct docs, and the longest CONSECUTIVE duplicated
    run (the length of the largest shared passage).

    Scale shape: one explode to (doc, pos, shingle), one shingle-keyed
    aggregate for corpus doc-frequency, one join back — never doc x doc.
    Runs via the pos - row_number() gaps-and-islands trick (per-doc window,
    parallel across docs)."""
    from sarpro_spark.llm.text import tokens_expr
    from sarpro_spark.queries import fround
    from pyspark.sql.window import Window as W

    toks = tokens_expr(F.col(text_col))
    # Docs shorter than w tokens have zero shingles; drop them BEFORE the
    # sequence/explode (sequence(1, 0) is DESCENDING in Spark, so a short
    # doc would otherwise emit pos=0 and crash F.slice). They re-attach
    # with zero counts via the final left joins.
    base = df.select(F.col(id_col), toks.alias("_toks")).where(
        F.size("_toks") >= w
    )
    pos = F.explode(F.sequence(F.lit(1), F.size("_toks") - (w - 1)))
    sh = base.select(F.col(id_col), pos.alias("pos"), F.col("_toks")).select(
        F.col(id_col),
        "pos",
        F.concat_ws(" ", F.slice("_toks", F.col("pos"), F.lit(w))).alias("shingle"),
    )
    sdf = (
        sh.select(id_col, "shingle")
        .distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    m = sh.join(sdf, "shingle").select(
        F.col(id_col), "pos", (F.col("_df") >= 2).alias("is_dup")
    )
    per = m.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dup"),
    )
    grp = F.col("pos") - F.row_number().over(
        W.partitionBy(id_col).orderBy(F.col("pos"))
    )
    runs = (
        m.where("is_dup")
        .select(F.col(id_col), grp.alias("_grp"))
        .groupBy(id_col, "_grp")
        .agg(F.count(F.lit(1)).alias("_run"))
        .groupBy(id_col)
        .agg(F.max("_run").alias("max_dup_run"))
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .join(runs, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            fround(
                F.coalesce("n_dup", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_shingles", F.lit(0)), F.lit(1)).cast("double")
            ).alias("dup_frac"),
            F.coalesce("max_dup_run", F.lit(0)).alias("max_dup_run"),
        )
    )


def sql_duplicated_passages(
    src_rel: str = "documents",
    id_col: str = "doc_id",
    w: int = DUP_PASSAGE_W,
) -> str:
    """DuckDB twin of :func:`duplicated_passages`."""
    from sarpro_spark.queries import sql_fround

    toks = "LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> '')"
    return f"""
WITH t AS (SELECT {id_col}, {toks} AS toks FROM {src_rel}),
sh AS (
  SELECT {id_col}, pos,
         ARRAY_TO_STRING(LIST_SLICE(toks, pos, pos + {w - 1}), ' ') AS shingle
  FROM (SELECT {id_col}, toks,
               UNNEST(generate_series(1, GREATEST(LEN(toks) - {w - 1}, 0))) AS pos
        FROM t) z
),
sdf AS (SELECT shingle, COUNT(DISTINCT {id_col}) AS df FROM sh GROUP BY 1),
m AS (SELECT sh.{id_col}, sh.pos, (df >= 2) AS is_dup FROM sh JOIN sdf USING (shingle)),
per AS (
  SELECT {id_col}, COUNT(*) AS n_shingles,
         CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM m GROUP BY 1
),
runs AS (
  SELECT {id_col}, pos - ROW_NUMBER() OVER (PARTITION BY {id_col} ORDER BY pos) AS grp
  FROM m WHERE is_dup
),
runlen AS (
  SELECT {id_col}, CAST(MAX(c) AS BIGINT) AS max_dup_run
  FROM (SELECT {id_col}, grp, COUNT(*) AS c FROM runs GROUP BY 1, 2) r GROUP BY 1
)
SELECT d.{id_col},
  COALESCE(n_shingles, 0) AS n_shingles,
  COALESCE(n_dup, 0) AS n_dup,
  {sql_fround(f'CAST(COALESCE(n_dup, 0) AS DOUBLE) / GREATEST(COALESCE(n_shingles, 0), 1)')} AS dup_frac,
  COALESCE(max_dup_run, 0) AS max_dup_run
FROM {src_rel} d
LEFT JOIN per USING ({id_col})
LEFT JOIN runlen USING ({id_col})
""".strip()

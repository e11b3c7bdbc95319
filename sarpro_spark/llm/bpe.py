"""Distributed BPE (byte-pair-encoding) vocabulary training.

The tokenizer-training operator of an LLM data pipeline: learn the top-N
subword merges from a corpus. Classic distributed formulation (the one
tokenizer trainers use): BPE statistics depend only on the DISTINCT-WORD
frequency table, which is Zipf-small relative to the corpus — so the corpus
is touched ONCE (word count = one shuffle with map-side combine, then a
deterministic top-W cap via TakeOrderedAndProject), and the merge iterations
run on the tiny capped word table. Each round collects ONE aggregated row —
the winning pair, i.e. model state, not data (the documented k-means-probe
exception) — and periodic checkpoints bound lineage depth.

Symbol representation: a word is its characters space-joined plus an
end-of-word marker (``h e l l o </w>``). A merge of pair (a, b) rewrites
`` a b `` -> `` ab `` on the space-padded form via plain ``replace`` —
greedy left-to-right with resume-after-replacement, i.e. EXACTLY Python
``str.replace`` semantics, which Spark ``replace`` and DuckDB ``replace``
share, so the oracle is bit-identical by construction. Consecutive
overlapping occurrences (``a b a b``) need a second pass because the shared
boundary space is consumed; :data:`MERGE_PASSES` nested replaces reach the
fixpoint for any word up to ``2^MERGE_PASSES`` pairs (words are capped far
below that).

Tie-breaks are fully deterministic: pair frequency DESC, then (left, right)
lexicographic ASC; the word cap orders by count DESC, word ASC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sarpro_spark.localrel import local_relation

#: nested replace passes per merge application (fixpoint for <= 2^4 pairs/word)
MERGE_PASSES = 4
#: longest word admitted to training (longer ones are truncated noise anyway)
MAX_WORD_LEN = 16

_WORD_SPLIT = "[^a-z0-9]+"


def word_counts(docs: DataFrame, text_col: str = "text", top_words: int = 2000) -> DataFrame:
    """(word, freq) — lowercase alphanumeric words, length-capped, the
    deterministic top-``top_words`` by (freq DESC, word ASC). One corpus
    shuffle; the cap plans as TakeOrderedAndProject."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), _WORD_SPLIT)).alias("word")
    ).where((F.length("word") > 0) & (F.length("word") <= MAX_WORD_LEN))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    return counts.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(top_words)


def _initial_syms(word: F.Column) -> F.Column:
    """Space-joined characters + end-of-word marker, space-padded for the
    replace-based merge: ``'hi'`` -> ``' h i </w> '``."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )
    return F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" </w> "))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, pair_freq) over adjacent symbol pairs, weighted by word
    frequency. The symbol split drops the padding blanks."""
    syms = F.filter(F.split(F.col("syms"), " "), lambda s: s != "")
    pairs = words.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
                F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs")).agg(
        F.sum("freq").alias("pair_freq")
    )


def _apply_merge(syms: F.Column, left: F.Column, right: F.Column) -> F.Column:
    pat = F.concat(F.lit(" "), left, F.lit(" "), right, F.lit(" "))
    rep = F.concat(F.lit(" "), left, right, F.lit(" "))
    out = syms
    for _ in range(MERGE_PASSES):
        out = F.replace(out, pat, rep)
    return out


def bpe_train(
    docs: DataFrame,
    n_merges: int = 24,
    text_col: str = "text",
    top_words: int = 2000,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns (step, lhs, rhs, merged,
    pair_freq) ordered by step — the vocabulary construction log.

    Driver-coordinated iteration, the shape every production BPE trainer
    uses: per merge, ONE aggregated row (the winning pair) is collected —
    model state, not data, the same documented exception as the k-means
    convergence probe — and applied to the word table as literal replace
    expressions. The corpus is only touched by :func:`word_counts`'s single
    shuffle; each iteration is one small job over <= ``top_words`` rows,
    with a periodic checkpoint bounding lineage depth."""
    from sarpro_spark.llm.cluster import _checkpointer

    wc = word_counts(docs, text_col, top_words)
    words = wc.select(_initial_syms(F.col("word")).alias("syms"), "freq")
    checkpoint = _checkpointer(words)
    words = checkpoint(words)
    learned = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.col("pair_freq").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, freq = top[0]["lhs"], top[0]["rhs"], top[0]["pair_freq"]
        learned.append((step, lhs, rhs, lhs + rhs, freq))
        words = words.select(
            _apply_merge(F.col("syms"), F.lit(lhs), F.lit(rhs)).alias("syms"), "freq"
        )
        if step % 8 == 0:
            words = checkpoint(words)
    return local_relation(
        docs.sparkSession,
        learned,
        "step int, lhs string, rhs string, merged string, pair_freq long",
    )


def bpe_encode_stats(
    docs: DataFrame,
    merges_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list: per-doc (n_words, n_tokens, n_chars).

    The tokenization runs once per DISTINCT word (the same Zipf leverage as
    training) and joins back to the per-doc word list — the corpus is never
    tokenized row-by-row. The merge list is model state (collected tiny,
    applied as literal replace expressions in training order)."""
    merges = [(r["lhs"], r["rhs"]) for r in merges_df.orderBy("step").collect()]
    words_per_doc = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), _WORD_SPLIT)).alias("word"),
    ).where(F.length("word") > 0)
    syms = _initial_syms(F.col("word"))
    for lhs, rhs in merges:
        syms = _apply_merge(syms, F.lit(lhs), F.lit(rhs))
    tokenized = words_per_doc.select("word").distinct().select(
        "word",
        F.size(F.filter(F.split(syms, " "), lambda s: s != "")).alias("word_tokens"),
        F.length("word").alias("word_chars"),
    )
    return (
        words_per_doc.join(tokenized, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("word_tokens").alias("n_tokens"),
            F.sum("word_chars").alias("n_chars"),
        )
    )


def _sql_bpe_chain(docs_rel: str, n_merges: int, top_words: int) -> tuple[list[str], list[str]]:
    """(ctes, per-step merge selects) for the unrolled training chain."""
    ctes = [
        f"""wc AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT UNNEST(string_split_regex(LOWER(text), '{_WORD_SPLIT}')) AS word
    FROM {docs_rel}
  ) t WHERE LENGTH(word) > 0 AND LENGTH(word) <= {MAX_WORD_LEN}
  GROUP BY word ORDER BY freq DESC, word ASC LIMIT {top_words}
)""",
        f"""w0 AS MATERIALIZED (
  SELECT ' ' || array_to_string(
           list_transform(range(1, LENGTH(word) + 1), i -> SUBSTR(word, i, 1)), ' ')
         || ' </w> ' AS syms, freq
  FROM wc
)""",
    ]
    sels = []
    for step in range(1, n_merges + 1):
        prev = f"w{step - 1}"
        ctes.append(
            f"""p{step} AS MATERIALIZED (
  SELECT s[i] AS lhs_, s[i+1] AS rhs_, CAST(SUM(freq) AS BIGINT) AS pair_freq
  FROM (
    SELECT list_filter(string_split(syms, ' '), x -> x <> '') AS s, freq FROM {prev}
  ) t, LATERAL (SELECT UNNEST(RANGE(1, GREATEST(LEN(s), 1))) AS i) i
  GROUP BY 1, 2
)""",
        )
        ctes.append(
            f"""t{step} AS MATERIALIZED (
  SELECT lhs_, rhs_, pair_freq FROM p{step}
  ORDER BY pair_freq DESC, lhs_ ASC, rhs_ ASC LIMIT 1
)""",
        )
        rep = "syms"
        for _ in range(MERGE_PASSES):
            rep = (
                f"replace({rep}, ' ' || lhs_ || ' ' || rhs_ || ' ', "
                "' ' || lhs_ || rhs_ || ' ')"
            )
        ctes.append(
            f"""w{step} AS MATERIALIZED (
  SELECT {rep} AS syms, freq FROM {prev}, t{step}
)""",
        )
        sels.append(
            f"SELECT CAST({step} AS INTEGER) AS step, lhs_ AS lhs, rhs_ AS rhs, "
            f"lhs_ || rhs_ AS merged, pair_freq FROM t{step}"
        )
    return ctes, sels


def sql_bpe_train(docs_rel: str, n_merges: int = 24, top_words: int = 2000) -> str:
    """DuckDB twin: the identical iteration unrolled as a CTE chain (the
    k-means oracle pattern); every per-step CTE is MATERIALIZED — each is
    referenced twice (next pair count + next word table) and DuckDB's
    default inlining would re-evaluate the chain exponentially.
    ``docs_rel`` must yield a ``text`` column."""
    ctes, sels = _sql_bpe_chain(docs_rel, n_merges, top_words)
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sels)


def sql_bpe_encode(docs_rel: str, n_merges: int = 24, top_words: int = 2000) -> str:
    """DuckDB twin of :func:`bpe_encode_stats`: re-derives the merge list via
    the training chain, then tokenizes each DISTINCT word by applying the
    merges in order (scalar subqueries against the materialized t{i} CTEs)
    and aggregates per document."""
    ctes, _ = _sql_bpe_chain(docs_rel, n_merges, top_words)
    rep = (
        " ' ' || array_to_string(list_transform(range(1, LENGTH(word) + 1), "
        "i -> SUBSTR(word, i, 1)), ' ') || ' </w> ' "
    )
    for step in range(1, n_merges + 1):
        pat = f"(SELECT ' ' || lhs_ || ' ' || rhs_ || ' ' FROM t{step})"
        sub = f"(SELECT ' ' || lhs_ || rhs_ || ' ' FROM t{step})"
        for _ in range(MERGE_PASSES):
            rep = f"replace({rep}, {pat}, {sub})"
    ctes.append(
        f"""wpd AS MATERIALIZED (
  SELECT doc_id, word FROM (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(text), '{_WORD_SPLIT}')) AS word
    FROM {docs_rel}
  ) t WHERE LENGTH(word) > 0
)""",
    )
    ctes.append(
        f"""tok AS MATERIALIZED (
  SELECT word,
         LEN(list_filter(string_split({rep}, ' '), x -> x <> '')) AS word_tokens,
         LENGTH(word) AS word_chars
  FROM (SELECT DISTINCT word FROM wpd) dw
)""",
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT wpd.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(tok.word_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(tok.word_chars) AS BIGINT) AS n_chars
FROM wpd JOIN tok USING (word)
GROUP BY wpd.doc_id"""
    )

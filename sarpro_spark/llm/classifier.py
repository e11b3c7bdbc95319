"""Trainable quality classifier: distributed logistic regression.

The fastText-wiki-vs-crawl idea every production corpus pipeline uses:
label a cheap proxy (here a deterministic "curated sources" subset), fit a
linear model over the quality features, score every document with it. The
trainer is full-batch gradient descent — per step ONE aggregate over the
feature frame (gradient + log-loss, map-side combined) and ONE collected
row of model state (the documented k-means/BPE exception: state, not data).
At 100 TB each step is a single scan-agg job; the feature frame is
materialized once.

Cross-engine determinism doctrine: features are built from integer counts
and fround'd ratios (bit-identical in DuckDB by the text_quality
precedent); every aggregated gradient/loss is rounded to 9 digits before
the weight update and weights are re-rounded after it, so the two engines'
trajectories stay locked — sub-rounding-unit float noise (distributed sum
order, libm exp/ln ulps) cannot compound across steps. The DuckDB twin
unrolls the identical iteration as a MATERIALIZED-CTE chain (the BPE
oracle pattern).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sarpro_spark.localrel import local_relation

from sarpro_spark.llm.sampling import hash_bucket, sql_hash_bucket
from sarpro_spark.llm.text import LANG_STOPWORDS, _count_word, sql_count_word, token_count

#: gradient-descent steps / learning rate of the certified trainer
DEFAULT_STEPS = 8
DEFAULT_LR = 0.5
#: curated-source label: sources hashing into bucket 0 of 3 are "curated"
_LABEL_SEED = "cur"
#: model-state rounding (digits) — locks the trajectory across engines
STATE_DIGITS = 9

FEATURES = ("x1", "x2", "x3", "x4")  # + implicit bias x0 = 1


def _round_state(x: float) -> float:
    scale = float(10**STATE_DIGITS)
    return math.floor(x * scale + 0.5) / scale


def label_expr(source: F.Column) -> F.Column:
    return F.when((hash_bucket(source, _LABEL_SEED) % 3) == 0, 1.0).otherwise(0.0)


def feature_frame(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """(id, y, x1..x4): label + fixed-scale quality features.

    x1 tokens/100, x2 punctuation ratio, x3 EN-stopword ratio, x4 mean
    alnum-chars-per-token/10. Ratios are fround'd so both engines hold
    bit-identical feature values; the scales keep GD well-conditioned
    without data-dependent standardization (which would cost extra passes)."""
    from sarpro_spark.queries import fround

    t = F.col(text_col)
    lowered = F.lower(t)
    padded = F.concat(F.lit(" "), lowered, F.lit(" "))
    n_chars = F.length(t)
    n_tok = token_count(t)
    n_punct = F.length(F.regexp_replace(lowered, "[a-z0-9\\s]", ""))
    n_alnum = F.length(F.regexp_replace(lowered, "[^a-z0-9]", ""))
    n_stop = sum((_count_word(padded, w) for w in LANG_STOPWORDS["en"]), F.lit(0))
    return df.select(
        F.col(id_col),
        label_expr(F.col(source_col)).alias("y"),
        (n_tok.cast("double") / 100.0).alias("x1"),
        fround(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")).alias("x2"),
        fround(n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")).alias("x3"),
        (fround(n_alnum.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")) / 10.0).alias("x4"),
    )


def _sigmoid(z: F.Column) -> F.Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_quality_classifier(
    df: DataFrame,
    n_steps: int = DEFAULT_STEPS,
    lr: float = DEFAULT_LR,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> tuple[list[float], DataFrame]:
    """Fit the logistic model; returns (final_weights, training log frame
    (step, w0..w4, loss)). loss is the log-loss at the step's STARTING
    weights (so step 1 logs the untrained loss)."""
    from sarpro_spark.queries import fround

    feats = feature_frame(df, id_col, text_col, source_col)
    # one scan per step over a tiny projected frame; persist so the text
    # feature extraction runs once, not n_steps times
    feats = feats.persist()
    w = [0.0] * (len(FEATURES) + 1)
    log_rows = []
    xs = [F.lit(1.0)] + [F.col(c) for c in FEATURES]
    for step in range(1, n_steps + 1):
        z = sum((F.lit(wj) * xj for wj, xj in zip(w[1:], xs[1:])), F.lit(w[0]))
        p = _sigmoid(z)
        pc = F.least(F.greatest(p, F.lit(1e-12)), F.lit(1.0 - 1e-12))
        aggs = [
            fround(F.avg((p - F.col("y")) * xj), STATE_DIGITS).alias(f"g{j}")
            for j, xj in enumerate(xs)
        ]
        aggs.append(
            fround(
                F.avg(
                    -(F.col("y") * F.log(pc) + (1.0 - F.col("y")) * F.log(1.0 - pc))
                ),
                STATE_DIGITS,
            ).alias("loss")
        )
        row = feats.agg(*aggs).collect()[0]
        w = [_round_state(wj - lr * row[f"g{j}"]) for j, wj in enumerate(w)]
        log_rows.append((step, *w, row["loss"]))
    feats.unpersist()
    log = local_relation(
        df.sparkSession,
        log_rows,
        "step int, w0 double, w1 double, w2 double, w3 double, w4 double, loss double",
    )
    return w, log


def score_quality_classifier(
    df: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Score every doc with a trained model: (id, y, score, predicted)."""
    from sarpro_spark.queries import fround

    feats = feature_frame(df, id_col, text_col, source_col)
    xs = [F.lit(1.0)] + [F.col(c) for c in FEATURES]
    z = sum((F.lit(wj) * xj for wj, xj in zip(weights[1:], xs[1:])), F.lit(weights[0]))
    score = fround(_sigmoid(z))
    return feats.select(
        F.col(id_col),
        "y",
        score.alias("score"),
        (score >= 0.5).alias("predicted"),
    )


# --- DuckDB twin --------------------------------------------------------------


def _sql_feats(src_rel: str, id_col: str, text_col: str, source_col: str) -> str:
    from sarpro_spark.queries import sql_fround

    lt = f"LOWER({text_col})"
    padded = f"(' ' || {lt} || ' ')"
    n_tok = f"LEN(LIST_FILTER(STRING_SPLIT_REGEX({lt}, '[^a-z0-9]+'), x -> x <> ''))"
    n_punct = f"LENGTH(REGEXP_REPLACE({lt}, '[a-z0-9\\s]', '', 'g'))"
    n_alnum = f"LENGTH(REGEXP_REPLACE({lt}, '[^a-z0-9]', '', 'g'))"
    n_stop = " + ".join(sql_count_word(padded, w) for w in LANG_STOPWORDS["en"])
    return f"""feats AS MATERIALIZED (
  SELECT {id_col},
    CAST(CASE WHEN (({sql_hash_bucket(source_col, _LABEL_SEED)}) % 3) = 0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS y,
    CAST({n_tok} AS DOUBLE) / 100.0 AS x1,
    {sql_fround(f'CAST({n_punct} AS DOUBLE) / GREATEST(LENGTH({text_col}), 1)')} AS x2,
    {sql_fround(f'CAST({n_stop} AS DOUBLE) / GREATEST({n_tok}, 1)')} AS x3,
    {sql_fround(f'CAST({n_alnum} AS DOUBLE) / GREATEST({n_tok}, 1)')} / 10.0 AS x4
  FROM {src_rel}
)"""


def _sql_chain(
    src_rel: str, id_col: str, text_col: str, source_col: str, n_steps: int, lr: float
) -> list[str]:
    """Unrolled GD: ws{t} = weights after step t (ws0 = init), g{t} =
    gradient+loss at ws{t-1}. Every CTE is MATERIALIZED (referenced twice)."""
    from sarpro_spark.queries import sql_fround

    scale = f"{float(10 ** STATE_DIGITS):.1f}"
    ctes = [_sql_feats(src_rel, id_col, text_col, source_col)]
    ctes.append(
        "ws0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)"
    )
    xs = ["1.0", "x1", "x2", "x3", "x4"]
    for t in range(1, n_steps + 1):
        z = " + ".join(f"w{j} * {xj}" for j, xj in enumerate(xs))
        p = f"(1.0 / (1.0 + EXP(-({z}))))"
        pc = f"LEAST(GREATEST({p}, 1e-12), 1.0 - 1e-12)"
        gs = ",\n    ".join(
            f"{sql_fround(f'AVG(({p} - y) * {xj})', STATE_DIGITS)} AS g{j}"
            for j, xj in enumerate(xs)
        )
        loss = sql_fround(
            f"AVG(-(y * LN({pc}) + (1.0 - y) * LN(1.0 - {pc})))", STATE_DIGITS
        )
        ctes.append(
            f"""g{t} AS MATERIALIZED (
  SELECT {gs},
    {loss} AS loss
  FROM feats, ws{t - 1}
)"""
        )
        ws = ", ".join(
            f"FLOOR((w{j} - {lr!r} * g{j}) * {scale} + 0.5) / {scale} AS w{j}"
            for j in range(len(xs))
        )
        ctes.append(f"ws{t} AS MATERIALIZED (SELECT {ws} FROM ws{t - 1}, g{t})")
    return ctes


def sql_train_quality_classifier(
    src_rel: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    n_steps: int = DEFAULT_STEPS,
    lr: float = DEFAULT_LR,
) -> str:
    """DuckDB twin of the training log (step, w0..w4, loss)."""
    ctes = _sql_chain(src_rel, id_col, text_col, source_col, n_steps, lr)
    sels = [
        f"SELECT CAST({t} AS INTEGER) AS step, ws{t}.*, g{t}.loss FROM ws{t}, g{t}"
        for t in range(1, n_steps + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sels)


def sql_score_quality_classifier(
    src_rel: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    n_steps: int = DEFAULT_STEPS,
    lr: float = DEFAULT_LR,
) -> str:
    """DuckDB twin of scoring with the trained weights (re-derived via the
    same unrolled chain)."""
    from sarpro_spark.queries import sql_fround

    ctes = _sql_chain(src_rel, id_col, text_col, source_col, n_steps, lr)
    xs = ["1.0", "x1", "x2", "x3", "x4"]
    z = " + ".join(f"w{j} * {xj}" for j, xj in enumerate(xs))
    score = sql_fround(f"1.0 / (1.0 + EXP(-({z})))")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT {id_col}, y, {score} AS score, ({score} >= 0.5) AS predicted
FROM feats, ws{n_steps}"""
    )

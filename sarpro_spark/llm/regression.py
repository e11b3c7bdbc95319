"""Distributed ordinary least squares via normal equations.

The closed-form sibling of the iterative trainers (llm/classifier.py
logistic, llm/pca.py power iteration): fit ``y ~ 1 + x1 + x2`` at any
scale with ONE aggregation pass — the nine X'X / X'y moments are plain
distributed sums, and the 3x3 solve is Cramer's rule evaluated as column
arithmetic ON THE 1-ROW MOMENT RELATION.  Nothing iterates, nothing
collects; the model "state" never exists outside the plan.

Cross-engine determinism doctrine: the moments are fround-rounded FIRST
(they are the model state — identical on both engines by the shared
rounding), and every solve formula is ONE SQL text string parsed by both
engines (Spark via F.expr, DuckDB verbatim), so the IEEE evaluation
order is identical by construction and the coefficients match to the
bit.  A second pass (coefficients broadcast back) produces R^2.

Scale: pass 1 = one scan + one 1-row aggregate; pass 2 = one scan with a
1-row broadcast.  At 100 TB this is two scans, zero shuffles beyond the
final 1-row reduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sarpro_spark.queries import fround, sql_fround

#: Cramer formulas for A b = c with
#:   A = [[n, sx1, sx2], [sx1, sx11, sx12], [sx2, sx12, sx22]],
#:   c = [sy, sx1y, sx2y]
#: — ONE text per determinant, shared verbatim by both engines.
_DET = (
    "(n*(sx11*sx22 - sx12*sx12) - sx1*(sx1*sx22 - sx12*sx2)"
    " + sx2*(sx1*sx12 - sx11*sx2))"
)
_DET0 = (
    "(sy*(sx11*sx22 - sx12*sx12) - sx1*(sx1y*sx22 - sx12*sx2y)"
    " + sx2*(sx1y*sx12 - sx11*sx2y))"
)
_DET1 = (
    "(n*(sx1y*sx22 - sx12*sx2y) - sy*(sx1*sx22 - sx12*sx2)"
    " + sx2*(sx1*sx2y - sx1y*sx2))"
)
_DET2 = (
    "(n*(sx11*sx2y - sx1y*sx12) - sx1*(sx1*sx2y - sx1y*sx2)"
    " + sy*(sx1*sx12 - sx11*sx2))"
)

_MOMENTS = ("n", "sx1", "sx2", "sx11", "sx22", "sx12", "sy", "sx1y", "sx2y")


def ols_moments(df: DataFrame, y_col: str, x1_col: str, x2_col: str) -> DataFrame:
    """The 1-row fround-rounded normal-equation moments."""
    y, x1, x2 = (F.col(c).cast("double") for c in (y_col, x1_col, x2_col))
    agg = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(x1 * x1).alias("sx11"),
        F.sum(x2 * x2).alias("sx22"),
        F.sum(x1 * x2).alias("sx12"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("sx1y"),
        F.sum(x2 * y).alias("sx2y"),
    )
    return agg.select(*[fround(F.col(m)).alias(m) for m in _MOMENTS])


def ols_fit(df: DataFrame, y_col: str, x1_col: str, x2_col: str) -> DataFrame:
    """1-row (n, b0, b1, b2, r2): closed-form fit + explained variance.

    Degenerate designs (det == 0 — a constant predictor) yield NULL
    coefficients rather than garbage."""
    m = ols_moments(df, y_col, x1_col, x2_col)
    coef = m.select(
        F.col("n"),
        fround(F.expr(f"CASE WHEN {_DET} = 0 THEN NULL ELSE {_DET0} / {_DET} END")).alias("b0"),
        fround(F.expr(f"CASE WHEN {_DET} = 0 THEN NULL ELSE {_DET1} / {_DET} END")).alias("b1"),
        fround(F.expr(f"CASE WHEN {_DET} = 0 THEN NULL ELSE {_DET2} / {_DET} END")).alias("b2"),
        fround(F.expr("sy / n")).alias("ybar"),
    )
    y, x1, x2 = (F.col(c).cast("double") for c in (y_col, x1_col, x2_col))
    j = df.crossJoin(F.broadcast(coef))
    pred = F.col("b0") + F.col("b1") * x1 + F.col("b2") * x2
    fit = j.agg(
        F.first("n").alias("n"),
        F.first("b0").alias("b0"),
        F.first("b1").alias("b1"),
        F.first("b2").alias("b2"),
        F.sum((y - pred) * (y - pred)).alias("_ssr"),
        F.sum((y - F.col("ybar")) * (y - F.col("ybar"))).alias("_sst"),
    )
    return fit.select(
        F.col("n").cast("bigint").alias("n"),
        "b0",
        "b1",
        "b2",
        fround(F.lit(1.0) - F.col("_ssr") / F.col("_sst")).alias("r2"),
    )


def sql_ols_fit(src_rel: str, y_expr: str, x1_expr: str, x2_expr: str) -> str:
    """DuckDB twin of :func:`ols_fit` — the same formula TEXTS over the
    same rounded moments."""
    return f"""
WITH olsraw AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CAST({x1_expr} AS DOUBLE)) AS sx1,
         SUM(CAST({x2_expr} AS DOUBLE)) AS sx2,
         SUM(CAST({x1_expr} AS DOUBLE) * CAST({x1_expr} AS DOUBLE)) AS sx11,
         SUM(CAST({x2_expr} AS DOUBLE) * CAST({x2_expr} AS DOUBLE)) AS sx22,
         SUM(CAST({x1_expr} AS DOUBLE) * CAST({x2_expr} AS DOUBLE)) AS sx12,
         SUM(CAST({y_expr} AS DOUBLE)) AS sy,
         SUM(CAST({x1_expr} AS DOUBLE) * CAST({y_expr} AS DOUBLE)) AS sx1y,
         SUM(CAST({x2_expr} AS DOUBLE) * CAST({y_expr} AS DOUBLE)) AS sx2y
  FROM {src_rel}
),
olsm AS (
  SELECT {", ".join(f"{sql_fround(m)} AS {m}" for m in _MOMENTS)} FROM olsraw
),
olscoef AS (
  SELECT n,
         {sql_fround(f"CASE WHEN {_DET} = 0 THEN NULL ELSE {_DET0} / {_DET} END")} AS b0,
         {sql_fround(f"CASE WHEN {_DET} = 0 THEN NULL ELSE {_DET1} / {_DET} END")} AS b1,
         {sql_fround(f"CASE WHEN {_DET} = 0 THEN NULL ELSE {_DET2} / {_DET} END")} AS b2,
         {sql_fround("sy / n")} AS ybar
  FROM olsm
),
olsfit AS (
  SELECT FIRST(c.n) AS n, FIRST(c.b0) AS b0, FIRST(c.b1) AS b1, FIRST(c.b2) AS b2,
         SUM((CAST({y_expr} AS DOUBLE) - (c.b0 + c.b1 * CAST({x1_expr} AS DOUBLE)
              + c.b2 * CAST({x2_expr} AS DOUBLE)))
           * (CAST({y_expr} AS DOUBLE) - (c.b0 + c.b1 * CAST({x1_expr} AS DOUBLE)
              + c.b2 * CAST({x2_expr} AS DOUBLE)))) AS _ssr,
         SUM((CAST({y_expr} AS DOUBLE) - c.ybar) * (CAST({y_expr} AS DOUBLE) - c.ybar)) AS _sst
  FROM {src_rel}, olscoef c
)
SELECT CAST(n AS BIGINT) AS n, b0, b1, b2,
       {sql_fround("1.0 - _ssr / _sst")} AS r2
FROM olsfit
""".strip()

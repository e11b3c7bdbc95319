"""PCA over the embedding corpus: distributed moments + power iteration.

The embedding-compression operator (PCA before quantization/ANN is the
textbook recipe — OPQ/ADC pipelines all start here). Two stages:

1. MOMENTS, distributed: one corpus pass accumulates per-Arrow-batch raw
   moments (count, per-dim sums, flattened d x d second-moment matrix) in
   NumPy via ``mapInPandas``; partials are combined by a (pos -> sum)
   aggregate — d + d^2 rows, NOT n x d^2 (the naive relational outer-product
   explode multiplies the corpus by 4096; the DuckDB oracle does exactly
   that, which is fine at oracle scale and exactly why the Spark side
   doesn't). Covariance C = S/n - mm^T, every entry rounded to 9 digits.

2. EIGEN, driver-side: the d x d covariance is MODEL STATE (32 KB — the
   k-means-centroid exception), so top-k eigenvectors come from plain
   power iteration with deflation on the driver. Every matvec result,
   normalization, eigenvalue, and deflation entry is rounded to 9 digits —
   the same trajectory-locking doctrine as the GD classifier, so the
   DuckDB twin (the identical iteration unrolled as relational matvec
   CTEs) lands on bit-identical components.

Sign convention: each component is flipped so its largest-|value|
coordinate is positive (deterministic, engine-independent; ties broken by
lowest position).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sarpro_spark.localrel import local_relation

#: power-iteration steps per component / components extracted
DEFAULT_ITERS = 15
DEFAULT_COMPONENTS = 2
STATE_DIGITS = 9


def _r9(x: float) -> float:
    scale = float(10**STATE_DIGITS)
    return math.floor(x * scale + 0.5) / scale


def raw_moments(
    emb: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[int, list[float], list[list[float]]]:
    """(n, mean[d], cov[d][d]) — one distributed pass + a (pos, sum)
    combine; only the d + d^2 final sums reach the driver."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("m", ArrayType(DoubleType())),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0)],
                    "m": [(X.T @ X).ravel()],
                }
            )

    part = emb.select(vec_col).mapInPandas(partials, schema=schema)
    s_sum = part.select(F.posexplode("s").alias("pos", "v")).groupBy("pos").agg(
        F.sum("v").alias("v")
    )
    m_sum = part.select(F.posexplode("m").alias("pos", "v")).groupBy("pos").agg(
        F.sum("v").alias("v")
    )
    n = part.agg(F.sum("n")).collect()[0][0]
    s = [0.0] * dim
    for r in s_sum.collect():
        s[r["pos"]] = r["v"]
    flat = [0.0] * (dim * dim)
    for r in m_sum.collect():
        flat[r["pos"]] = r["v"]
    mean = [_r9(x / n) for x in s]
    cov = [
        [_r9(flat[i * dim + j] / n - mean[i] * mean[j]) for j in range(dim)]
        for i in range(dim)
    ]
    return n, mean, cov


def _power_iteration(
    cov: list[list[float]], n_components: int, iters: int
) -> list[tuple[list[float], float]]:
    """[(component[d], eigenvalue)] via rounded power iteration + deflation.
    Pure driver math on model state; every intermediate rounded to 9 digits
    so the SQL twin's relational matvecs reproduce it exactly."""
    d = len(cov)
    C = [row[:] for row in cov]
    out = []
    for _ in range(n_components):
        # Init must be OFF the 1e-9 state grid: a grid-aligned start (e.g.
        # the uniform 1/sqrt(64) = 0.125) makes the first matvec sums land
        # EXACTLY on half-grid rounding boundaries, where sum-order noise
        # decides the floor — observed as run-to-run flips inside DuckDB
        # itself. 1/sqrt(d+i) is irrational per coordinate, so every
        # downstream product/sum sits far from any boundary.
        v = [_r9(1.0 / math.sqrt(d + i)) for i in range(d)]
        for _ in range(iters):
            w = [_r9(sum(C[i][j] * v[j] for j in range(d))) for i in range(d)]
            nrm = _r9(math.sqrt(sum(x * x for x in w)))
            v = [_r9(x / nrm) for x in w]
        # deterministic sign: largest-|v| coordinate positive (lowest pos wins ties)
        piv = max(range(d), key=lambda i: (abs(v[i]), -i))
        if v[piv] < 0:
            v = [_r9(-x) for x in v]
        lam = _r9(
            sum(v[i] * _r9(sum(C[i][j] * v[j] for j in range(d))) for i in range(d))
        )
        out.append((v, lam))
        C = [
            [_r9(C[i][j] - lam * v[i] * v[j]) for j in range(d)]
            for i in range(d)
        ]
    return out


def pca_components(
    emb: DataFrame,
    dim: int = 64,
    n_components: int = DEFAULT_COMPONENTS,
    iters: int = DEFAULT_ITERS,
    vec_col: str = "embedding",
) -> DataFrame:
    """(component, pos, value, eigenvalue, mean) — the fitted model, one row
    per coordinate of each principal component."""
    n, mean, cov = raw_moments(emb, dim, vec_col)
    comps = _power_iteration(cov, n_components, iters)
    rows = []
    for c, (v, lam) in enumerate(comps):
        for i in range(dim):
            rows.append((c, i, v[i], lam, mean[i]))
    return local_relation(
        emb.sparkSession,
        rows,
        "component int, pos int, value double, eigenvalue double, mean double",
    )


def pca_project(
    emb: DataFrame,
    dim: int = 64,
    n_components: int = DEFAULT_COMPONENTS,
    iters: int = DEFAULT_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every embedding onto the fitted components: (id, pc0, pc1,
    ...) — the dimensionality-reduction surface. Components are literals
    (model state), so the projection is a pure column expression."""
    from sarpro_spark.queries import fround

    n, mean, cov = raw_moments(emb, dim, vec_col)
    comps = _power_iteration(cov, n_components, iters)
    x = F.col(vec_col)
    cols = [F.col(id_col)]
    for c, (v, _lam) in enumerate(comps):
        centered_dot = sum(
            (
                (x[i].cast("double") - F.lit(mean[i])) * F.lit(v[i])
                for i in range(1, dim)
            ),
            (x[0].cast("double") - F.lit(mean[0])) * F.lit(v[0]),
        )
        cols.append(fround(centered_dot).alias(f"pc{c}"))
    return emb.select(*cols)


# --- DuckDB twin --------------------------------------------------------------


def _sql_r9(expr: str) -> str:
    scale = f"{float(10 ** STATE_DIGITS):.1f}"
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale})"


def _sql_model_ctes(emb_rel: str, id_col: str, vec_col: str, n_components: int, iters: int) -> tuple[list[str], list[str]]:
    """(ctes, component CTE names): the identical fit unrolled relationally.
    Matrices/vectors are (i[, j], v) relations; every step rounds like the
    driver does."""
    r9 = _sql_r9
    ctes = [
        f"""xm AS MATERIALIZED (
  SELECT vid, CAST(x AS DOUBLE) AS x, i FROM (
    SELECT {id_col} AS vid, UNNEST({vec_col}) AS x,
           UNNEST(generate_series(0, LEN({vec_col}) - 1)) AS i
    FROM {emb_rel}
  ) t
)""",
        "nn AS (SELECT COUNT(*) AS n FROM (SELECT DISTINCT vid FROM xm) t)",
        f"mu AS MATERIALIZED (SELECT i, {r9('SUM(x) / (SELECT n FROM nn)')} AS m FROM xm GROUP BY i)",
        f"""cov0 AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j,
         {r9('SUM(a.x * b.x) / (SELECT n FROM nn) - ma.m * mb.m')} AS c
  FROM xm a
  JOIN xm b ON a.vid = b.vid
  JOIN mu ma ON ma.i = a.i
  JOIN mu mb ON mb.i = b.i
  GROUP BY a.i, b.i, ma.m, mb.m
)""",
    ]
    comp_names = []
    for c in range(n_components):
        cm = f"cov{c}"
        v = f"v{c}_0"
        # off-grid init (see _power_iteration): 1/sqrt(d + i) per coordinate
        ctes.append(
            f"""{v} AS (
  SELECT i, {r9('1.0 / SQRT(CAST((SELECT COUNT(*) FROM mu) AS DOUBLE) + i)')} AS v
  FROM mu
)"""
        )
        for t in range(1, iters + 1):
            prev = f"v{c}_{t - 1}"
            w = f"w{c}_{t}"
            nrm = f"n{c}_{t}"
            cur = f"v{c}_{t}"
            ctes.append(
                f"{w} AS MATERIALIZED (SELECT m.i AS i, {r9(f'SUM(m.c * p.v)')} AS v "
                f"FROM {cm} m JOIN {prev} p ON m.j = p.i GROUP BY m.i)"
            )
            ctes.append(f"{nrm} AS (SELECT {r9('SQRT(SUM(v * v))')} AS nrm FROM {w})")
            ctes.append(
                f"{cur} AS MATERIALIZED (SELECT i, {r9('v / nrm')} AS v FROM {w}, {nrm})"
            )
        last = f"v{c}_{iters}"
        piv = f"piv{c}"
        comp = f"comp{c}"
        lamw = f"lw{c}"
        lam = f"lam{c}"
        ctes.append(
            f"""{piv} AS (
  SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sgn
  FROM {last} ORDER BY ABS(v) DESC, i ASC LIMIT 1
)"""
        )
        ctes.append(
            f"{comp} AS MATERIALIZED (SELECT i, {r9('v * sgn')} AS v FROM {last}, {piv})"
        )
        ctes.append(
            f"{lamw} AS MATERIALIZED (SELECT m.i AS i, {r9('SUM(m.c * p.v)')} AS v "
            f"FROM {cm} m JOIN {comp} p ON m.j = p.i GROUP BY m.i)"
        )
        ctes.append(
            f"{lam} AS (SELECT {r9('SUM(a.v * b.v)')} AS lam "
            f"FROM {comp} a JOIN {lamw} b ON a.i = b.i)"
        )
        comp_names.append(comp)
        if c + 1 < n_components:
            ctes.append(
                f"""cov{c + 1} AS MATERIALIZED (
  SELECT m.i AS i, m.j AS j, {r9('m.c - (SELECT lam FROM ' + lam + ') * a.v * b.v')} AS c
  FROM {cm} m JOIN {comp} a ON a.i = m.i JOIN {comp} b ON b.i = m.j
)"""
            )
    return ctes, comp_names


def sql_pca_components(
    emb_rel: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = DEFAULT_COMPONENTS,
    iters: int = DEFAULT_ITERS,
) -> str:
    ctes, comps = _sql_model_ctes(emb_rel, id_col, vec_col, n_components, iters)
    sels = [
        f"SELECT CAST({c} AS INTEGER) AS component, CAST(i AS INTEGER) AS pos, "
        f"v AS value, (SELECT lam FROM lam{c}) AS eigenvalue, m AS mean "
        f"FROM {comp} JOIN mu USING (i)"
        for c, comp in enumerate(comps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sels)


def sql_pca_project(
    emb_rel: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = DEFAULT_COMPONENTS,
    iters: int = DEFAULT_ITERS,
) -> str:
    from sarpro_spark.queries import sql_fround

    ctes, comps = _sql_model_ctes(emb_rel, id_col, vec_col, n_components, iters)
    ctes.append(
        f"""xi AS MATERIALIZED (
  SELECT {id_col}, CAST(x AS DOUBLE) AS x, i FROM (
    SELECT {id_col}, UNNEST({vec_col}) AS x,
           UNNEST(generate_series(0, LEN({vec_col}) - 1)) AS i
    FROM {emb_rel}
  ) t
)"""
    )
    allc = "\nUNION ALL\n  ".join(
        f"SELECT {c} AS component, i, v FROM {comp}" for c, comp in enumerate(comps)
    )
    ctes.append(f"allc AS MATERIALIZED (\n  {allc}\n)")
    pcs = ", ".join(
        sql_fround(f"SUM(CASE WHEN component = {c} THEN (xi.x - mu.m) * allc.v END)")
        + f" AS pc{c}"
        for c in range(len(comps))
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT {id_col}, {pcs}
FROM xi JOIN mu ON mu.i = xi.i JOIN allc ON allc.i = xi.i
GROUP BY {id_col}"""
    )

"""A5: 3x3 local median + range (autoscale.rs:176-213).

NOTE: dead code in the reference — ``use_local_enhancement`` is false for
every strategy (autoscale.rs:498-561) — rebuilt anyway for inventory
completeness. Semantics: the window is clamped at image borders (not padded),
only VALID pixels contribute, median = sorted[count/2] (upper median for even
counts, matching the reference's index choice), range = max - min; pixels
with zero valid neighbors produce no row (the reference returns None).

Shape: a stencil as a 9-offset self-contribution — each valid pixel scatters
to its neighbors' keys, one groupBy reassembles the neighborhood. Costs one
shuffle of 9x the (filtered) pixels. At raster scale the better physical plan
is applyInPandas over tiles with halo exchange; the relational form here is
the oracle-checkable semantics reference, and the tile/halo variant reuses
the CLAHE-style decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sarpro_spark.operators.geometry import product_dims


def local_median_range_3x3(
    px: DataFrame,
    group_cols: list[str],
    value: str = "db",
    valid: str = "valid",
    dims: DataFrame | None = None,
) -> DataFrame:
    """Per-pixel 3x3 neighborhood median + range over valid pixels.
    Output: group_cols + row + col + n_nbrs + med + rng."""
    if dims is None:
        dims = product_dims(px, group_cols)
    offsets = F.array(
        *[
            F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
        ]
    )
    contrib = (
        px.filter(F.col(valid))
        .join(F.broadcast(dims), on=group_cols)
        .select(
            *group_cols,
            "row",
            "col",
            F.col(value).alias("_v"),
            "rows",
            "cols",
            F.explode(offsets).alias("_o"),
        )
        .select(
            *group_cols,
            (F.col("row") + F.col("_o.dr")).alias("trow"),
            (F.col("col") + F.col("_o.dc")).alias("tcol"),
            F.col("_v"),
            "rows",
            "cols",
        )
        .where(
            (F.col("trow") >= 0)
            & (F.col("trow") < F.col("rows"))
            & (F.col("tcol") >= 0)
            & (F.col("tcol") < F.col("cols"))
        )
    )
    nbr = contrib.groupBy(*group_cols, "trow", "tcol").agg(
        F.sort_array(F.collect_list("_v")).alias("_vals"),
        F.count(F.lit(1)).alias("n_nbrs"),
    )
    med = F.element_at(F.col("_vals"), (F.floor(F.col("n_nbrs") / 2) + 1).cast("int"))
    rng = F.element_at(F.col("_vals"), F.col("n_nbrs").cast("int")) - F.element_at(F.col("_vals"), 1)
    return nbr.select(
        *group_cols,
        F.col("trow").alias("row"),
        F.col("tcol").alias("col"),
        "n_nbrs",
        med.alias("med"),
        rng.alias("rng"),
    )


def sql_local_median_3x3(
    src_rel: str, group_cols: list[str], value: str = "db", valid: str = "valid"
) -> str:
    """DuckDB twin (CTEs + final select). ``src_rel`` carries group_cols +
    row + col + value + valid."""
    g = ", ".join(group_cols)
    return f"""
ldims AS (
  SELECT {g}, CAST(MAX(row)+1 AS INTEGER) AS rows, CAST(MAX(col)+1 AS INTEGER) AS cols
  FROM {src_rel} GROUP BY {g}
),
offs(dr, dc) AS (VALUES {", ".join(f"({dr}, {dc})" for dr in (-1, 0, 1) for dc in (-1, 0, 1))}),
contrib AS (
  SELECT s.{g.replace(', ', ', s.')}, s.row + o.dr AS trow, s.col + o.dc AS tcol, s.{value} AS v
  FROM {src_rel} s
  JOIN ldims d USING ({g})
  CROSS JOIN offs o
  WHERE s.{valid}
    AND s.row + o.dr >= 0 AND s.row + o.dr < d.rows
    AND s.col + o.dc >= 0 AND s.col + o.dc < d.cols
),
nbr AS (
  SELECT {g}, trow, tcol, LIST_SORT(LIST(v)) AS vals, COUNT(*) AS n_nbrs
  FROM contrib GROUP BY ALL
)
SELECT {g}, trow AS row, tcol AS col, n_nbrs,
       vals[CAST(FLOOR(n_nbrs / 2.0) AS INTEGER) + 1] AS med,
       vals[CAST(n_nbrs AS INTEGER)] - vals[1] AS rng
FROM nbr
""".strip()

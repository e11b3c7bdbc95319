"""Driver-contract query registry.

Each registered query pairs a Spark callable ``(spark, sf_dir) -> DataFrame``
with the equivalent DuckDB-runnable ANSI SQL over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings). The driver compares row-count + schema + order-insensitive
value-hash, sorting columns by name — so column NAMES must match exactly and
float columns are rounded identically on both sides.

Conventions:
  - every computed column is aliased the same in Spark and SQL
  - doubles rounded via ``ROUND(x, d)`` on both sides (aggregation-order noise
    in distributed sums is far below the rounding unit)
  - queries with no SQL twin (None) get the driver's rows-only check
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType



@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def fround(col: F.Column, digits: int = 6) -> F.Column:
    """Cross-engine-stable rounding: floor(x*10^d + 0.5)/10^d.

    Both Spark and DuckDB evaluate this with identical IEEE-754 ops, so the
    results are bit-identical — unlike ROUND, whose half-way semantics differ
    between engines (BigDecimal HALF_UP vs multiply+rint) and disagree on the
    exact decimal halves that ratios of 2-decimal inputs frequently produce.
    Keep in lock-step with :func:`sql_fround`.
    """
    scale = F.lit(float(10**digits))
    return F.floor(col.cast("double") * scale + F.lit(0.5)) / scale


def sql_fround(expr: str, digits: int = 6) -> str:
    """DuckDB twin of :func:`fround`."""
    scale = f"{float(10 ** digits):.1f}"
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale})"


def round_floats(df: DataFrame, digits: int = 6, exclude: tuple[str, ...] = ()) -> DataFrame:
    """Apply :func:`fround` to every float/double column."""
    cols = []
    for f_ in df.schema.fields:
        if f_.name not in exclude and isinstance(f_.dataType, (DoubleType, FloatType)):
            cols.append(fround(F.col(f_.name), digits).alias(f_.name))
        else:
            cols.append(F.col(f_.name))
    return df.select(*cols)


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all_modules()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    _load_all_modules()
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}


_LOADED = False


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from sarpro_spark import queries_relational  # noqa: F401
    from sarpro_spark import queries_raster  # noqa: F401
    from sarpro_spark import queries_sinks  # noqa: F401
    from sarpro_spark import queries_llm  # noqa: F401

    _LOADED = True

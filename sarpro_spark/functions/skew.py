"""Skew-handling primitives: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one giant product, one viral document
shingle, one null-ish join key) can pin a shuffle partition to a single
straggler task. Two standard remedies, packaged as reusable plan shapes:

  salted_agg   two-phase aggregation: shuffle on (key, salt) first — hot keys
               split across `salt_buckets` reducers — then a cheap second
               aggregation on the true key merges the partials. Works for any
               algebraic aggregate (sum/count/min/max; avg via sum+count).
  salted_join  replicate the SMALL side `salt_buckets` times, salt the big
               side's key randomly-but-deterministically (hash of other
               columns), join on (key, salt). The big side never concentrates
               a hot key in one partition.

AQE's skew-join splitting (enabled in session.py) handles moderate skew at
runtime; these explicit forms are for the pathological keys AQE can't split
(single-key aggregations, broadcast-ineligible mid-size dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (function, input column) with function in
    {sum, count, min, max}. The salt is a deterministic hash of ``salt_from``
    columns (default: all non-group columns) so re-runs are reproducible.
    """
    first_phase = {
        "sum": F.sum,
        "count": lambda c: F.count(F.lit(1)),
        "min": F.min,
        "max": F.max,
    }
    merge_phase = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salt_cols = salt_from or [c for c in df.columns if c not in group_cols]
    salt = (F.abs(F.hash(*[F.col(c) for c in salt_cols])) % salt_buckets).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*[first_phase[fn](col).alias(out) for out, (fn, col) in aggs.items()])
    )
    return partial.groupBy(*group_cols).agg(
        *[merge_phase[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: small side replicated per salt bucket, big
    side salted deterministically, join on (key, salt)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salt_cols = [c for c in big.columns if c != on]
    big_salted = big.withColumn(
        "_salt", F.abs(F.hash(*[F.col(c) for c in big_salt_cols])) % salt_buckets
    )
    out = big_salted.join(small_rep, on=[on, "_salt"], how=how)
    return out.drop("_salt")

"""Change-data-capture operators: changelog -> snapshot merge, SCD2 history.

A 100 TB training corpus is not static: crawls re-fetch, licenses revoke,
labels get corrected.  The pipeline-side answer is a CHANGELOG relation
(key, seq, op IN ('I','U','D'), payload) applied to a base snapshot — the
MERGE INTO of Delta/Iceberg, re-expressed as plain DataFrame algebra so it
runs on bare parquet:

  apply_changelog   latest-wins upsert: ONE window (row_number per key by
                    seq desc) picks each key's final op, one left-anti join
                    keeps untouched base rows, one union appends surviving
                    upserts.  Two shuffles total (window + anti-join), both
                    on the merge key; with both relations bucketed by key
                    (q_bucketed_colocated_join's layout) both collapse to
                    map-side work — the write-once/merge-forever economics.
  scd2_history      slowly-changing-dimension type 2: every key's full
                    version chain with [valid_from, valid_to) seq intervals
                    and an is_current flag — lead() over one per-key window.
                    The dataset-versioning answer to "which documents was
                    model X trained on?".

Semantics (latest-wins, the Debezium/Kafka-compaction convention):
  - the highest seq per key decides; 'D' removes the key, 'I'/'U' upsert
    the payload (an 'U' for an absent key inserts — idempotent replay).
  - base rows never touched by the changelog pass through unchanged.
  - seq must be unique per key (enforceable upstream; ties would make the
    merge order-dependent, so the window tie-breaks on op for determinism).

Reference analog: none (bogwi/sarpro processes immutable SAFE products);
this extends the engine per the build brief's pipeline mandate.  Public
precedent: Delta Lake MERGE, Iceberg upsert, Kimball SCD2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_change_per_key(
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Each key's final changelog row (highest seq; op tie-break for
    determinism under malformed duplicate seqs)."""
    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc(), F.col(op_col))
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Latest-wins merge: new snapshot with audit columns.

    ``changes`` must carry every ``base`` column plus (seq, op).  Output =
    base schema + applied_seq/applied_op (NULL for rows the changelog never
    touched) — the lineage columns an incremental pipeline checkpoints on.
    """
    payload_cols = [c for c in base.columns]
    final = latest_change_per_key(changes, key_col, seq_col, op_col)
    untouched = base.join(
        final.select(key_col), on=key_col, how="left_anti"
    ).select(
        *payload_cols,
        F.lit(None).cast("bigint").alias("applied_seq"),
        F.lit(None).cast("string").alias("applied_op"),
    )
    upserts = final.where(F.col(op_col) != "D").select(
        *payload_cols,
        F.col(seq_col).cast("bigint").alias("applied_seq"),
        F.col(op_col).alias("applied_op"),
    )
    return untouched.unionAll(upserts)


def scd2_history(
    changes: DataFrame,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Type-2 history: one row per changelog version with its validity
    interval.  valid_to is NULL for the open (latest) version; is_current
    marks the open version only when it is not a delete — a deleted key has
    a closed chain and no current row."""
    w = Window.partitionBy(key_col).orderBy(F.col(seq_col), F.col(op_col))
    nxt = F.lead(seq_col).over(w)
    return changes.select(
        "*",
        F.col(seq_col).cast("bigint").alias("valid_from"),
        nxt.cast("bigint").alias("valid_to"),
        (nxt.isNull() & (F.col(op_col) != "D")).alias("is_current"),
    ).drop(seq_col)


# --- DuckDB twins -------------------------------------------------------------


def sql_latest_change(changes_rel: str, key_col: str, seq_col: str, op_col: str = "op") -> str:
    """CTE body (named ``cdcfinal``) — twin of :func:`latest_change_per_key`."""
    return f"""
cdcfinal AS (
  SELECT * FROM (
    SELECT c.*, ROW_NUMBER() OVER (PARTITION BY {key_col}
                 ORDER BY {seq_col} DESC, {op_col}) AS _rn
    FROM {changes_rel} c
  ) WHERE _rn = 1
)""".strip()


def sql_apply_changelog(
    base_rel: str,
    changes_rel: str,
    key_col: str,
    payload_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> str:
    """Twin of :func:`apply_changelog` (same column order and casts)."""
    cols = ", ".join(payload_cols)
    return f"""
WITH {sql_latest_change(changes_rel, key_col, seq_col, op_col)}
SELECT {cols}, CAST(NULL AS BIGINT) AS applied_seq, CAST(NULL AS VARCHAR) AS applied_op
FROM {base_rel} b
WHERE NOT EXISTS (SELECT 1 FROM cdcfinal f WHERE f.{key_col} = b.{key_col})
UNION ALL
SELECT {cols}, CAST({seq_col} AS BIGINT) AS applied_seq, {op_col} AS applied_op
FROM cdcfinal WHERE {op_col} <> 'D'
""".strip()


def sql_scd2_history(
    changes_rel: str,
    key_col: str,
    payload_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> str:
    """Twin of :func:`scd2_history`."""
    cols = ", ".join(payload_cols)
    return f"""
SELECT {cols}, {op_col},
       CAST({seq_col} AS BIGINT) AS valid_from,
       CAST(LEAD({seq_col}) OVER (PARTITION BY {key_col} ORDER BY {seq_col}, {op_col}) AS BIGINT) AS valid_to,
       (LEAD({seq_col}) OVER (PARTITION BY {key_col} ORDER BY {seq_col}, {op_col}) IS NULL
        AND {op_col} <> 'D') AS is_current
FROM {changes_rel}
""".strip()


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
) -> DataFrame:
    """The inverse of :func:`apply_changelog`: derive the changelog between
    two snapshots of the same schema.  One full-outer join on the key;
    op = 'I' (new only), 'D' (old only), 'U' (both, any payload column
    IS DISTINCT FROM — null-safe).  Unchanged keys emit nothing.  Payload
    comes from the NEW side for I/U and the OLD side for D (the row being
    removed).  Round-trip law (tested): apply_changelog(old,
    snapshot_diff(old, new)) == new."""
    payload = [c for c in old.columns if c != key_col]
    # presence flags are explicit TRUE echoes per side — a NULL payload
    # column must not read as "absent"
    o = old.select(F.col(key_col).alias("_k"), F.lit(True).alias("_in_o"),
                   *[F.col(c).alias(f"_o_{c}") for c in payload])
    n = new.select(F.col(key_col).alias("_k"), F.lit(True).alias("_in_n"),
                   *[F.col(c).alias(f"_n_{c}") for c in payload])
    j = o.join(n, "_k", "full_outer")
    changed = F.lit(False)
    for c in payload:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    op = (
        F.when(F.col("_in_o").isNull(), F.lit("I"))
        .when(F.col("_in_n").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out_cols = [
        F.when(op == "D", F.col(f"_o_{c}")).otherwise(F.col(f"_n_{c}")).alias(c)
        for c in payload
    ]
    return (
        j.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select(F.col("_k").alias(key_col), *out_cols, "op")
    )


def sql_snapshot_diff(
    old_rel: str,
    new_rel: str,
    key_col: str,
    payload_cols: list[str],
) -> str:
    """Twin of :func:`snapshot_diff`."""
    changed = " OR ".join(f"o.{c} IS DISTINCT FROM n.{c}" for c in payload_cols)
    outs = ",\n       ".join(
        f"CASE WHEN n.{key_col} IS NULL THEN o.{c} ELSE n.{c} END AS {c}" for c in payload_cols
    )
    return f"""
SELECT COALESCE(o.{key_col}, n.{key_col}) AS {key_col},
       {outs},
       CASE WHEN o.{key_col} IS NULL THEN 'I'
            WHEN n.{key_col} IS NULL THEN 'D'
            WHEN {changed} THEN 'U' END AS op
FROM {old_rel} o FULL OUTER JOIN {new_rel} n ON o.{key_col} = n.{key_col}
WHERE (o.{key_col} IS NULL OR n.{key_col} IS NULL OR {changed})
""".strip()

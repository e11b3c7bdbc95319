"""Training-sequence packing and mixture planning.

The last mile of a training-data pipeline: documents are concatenated in a
deterministic order and chunked into fixed-length token sequences
("concat-and-chunk", the packing scheme virtually every LLM pretraining run
uses), and the corpus mix is planned per domain (how much of each source to
sample/repeat to hit a target mixture at a token budget).

Scale shape: a GLOBAL concat order would force a single-task window — so
packing is bucketed. Each document lands in one of ``n_buckets`` shards via
the deterministic md5 bucket (the same shard-wise packing a real pipeline
does when writing N output files); the prefix-sum window partitions by
bucket, so parallelism == n_buckets and no bucket ever sees another bucket's
rows. At 100 TB, n_buckets is the output shard count (thousands) and every
per-bucket stream is independent. All arithmetic is integer (token counts,
offsets) — bit-identical across engines.

Mixture planning is two tiny aggregates (per-source token inventory + a
global total) joined back — driver-free, broadcast-sized output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sarpro_spark.llm.sampling import hash_bucket, sql_hash_bucket
from sarpro_spark.llm.text import token_count

#: tokens per packed training sequence (small so toy docs span sequences)
DEFAULT_SEQ_LEN = 64
#: packing shards — at production scale, the output file count
DEFAULT_BUCKETS = 8
_PACK_SEED = "pack"

_SQL_NTOK = (
    "LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> ''))"
)


def _doc_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
) -> DataFrame:
    """(id, bucket, n_tok, end_off): each doc's exclusive end offset in its
    bucket's concatenated token stream (deterministic order: id asc)."""
    base = df.select(
        F.col(id_col),
        (hash_bucket(F.col(id_col), _PACK_SEED) % n_buckets).alias("bucket"),
        token_count(F.col(text_col)).cast("long").alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    w = W.partitionBy("bucket").orderBy(F.col(id_col).asc())
    return base.withColumn("end_off", F.sum("n_tok").over(w))


def pack_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = DEFAULT_SEQ_LEN,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document packing assignment: which fixed-length sequences of its
    bucket's token stream the document's tokens land in.

    first_seq/last_seq are inclusive sequence indices; a doc longer than
    seq_len spans several, and sequence boundaries cut through documents
    (standard concat-and-chunk — no padding waste)."""
    pos = _doc_positions(df, id_col, text_col, n_buckets)
    start = F.col("end_off") - F.col("n_tok")
    first = F.expr(f"(end_off - n_tok) div {seq_len}")
    last = F.expr(f"(end_off - 1) div {seq_len}")
    return pos.select(
        F.col(id_col),
        "bucket",
        "n_tok",
        start.alias("start_off"),
        first.alias("first_seq"),
        last.alias("last_seq"),
        (last - first + F.lit(1)).alias("n_seqs"),
    )


def sql_pack_assignments(
    src_rel: str = "documents",
    id_col: str = "doc_id",
    seq_len: int = DEFAULT_SEQ_LEN,
    n_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """DuckDB twin of :func:`pack_assignments` (CAST: window SUM is HUGEINT)."""
    return f"""
WITH toks AS (
  SELECT {id_col}, ({sql_hash_bucket(id_col, _PACK_SEED)}) % {n_buckets} AS bucket,
         CAST({_SQL_NTOK} AS BIGINT) AS n_tok
  FROM {src_rel}
),
pos AS (
  SELECT {id_col}, bucket, n_tok,
         CAST(SUM(n_tok) OVER (PARTITION BY bucket ORDER BY {id_col} ASC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off
  FROM toks WHERE n_tok > 0
)
SELECT {id_col}, bucket, n_tok, end_off - n_tok AS start_off,
       (end_off - n_tok) // {seq_len} AS first_seq,
       (end_off - 1) // {seq_len} AS last_seq,
       ((end_off - 1) // {seq_len}) - ((end_off - n_tok) // {seq_len}) + 1 AS n_seqs
FROM pos
""".strip()


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = DEFAULT_SEQ_LEN,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-sequence packing stats: how many documents contribute to each
    packed sequence, how many tokens it holds (== seq_len except each
    bucket's ragged final sequence), and its doc-id span.

    Plan: assignments -> explode the (first_seq..last_seq) span -> one
    hash aggregate keyed by (bucket, seq). The explode factor is
    ceil(doc_tokens/seq_len)+1 at most — bounded, never corpus x corpus."""
    a = pack_assignments(df, id_col, text_col, seq_len, n_buckets)
    end = F.col("start_off") + F.col("n_tok")
    spans = a.select(
        F.col(id_col),
        "bucket",
        "start_off",
        end.alias("end_off"),
        F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias("seq"),
    )
    tok_in = F.least(F.col("end_off"), (F.col("seq") + 1) * seq_len) - F.greatest(
        F.col("start_off"), F.col("seq") * seq_len
    )
    return (
        spans.groupBy("bucket", "seq")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok_in).alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .withColumn("is_full", F.col("n_tokens") == seq_len)
    )


def sql_pack_sequences(
    src_rel: str = "documents",
    id_col: str = "doc_id",
    seq_len: int = DEFAULT_SEQ_LEN,
    n_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """DuckDB twin of :func:`pack_sequences`."""
    L = seq_len
    return f"""
WITH a AS ({sql_pack_assignments(src_rel, id_col, seq_len, n_buckets)}),
spans AS (
  SELECT {id_col}, bucket, start_off, start_off + n_tok AS end_off,
         UNNEST(generate_series(first_seq, last_seq)) AS seq
  FROM a
)
SELECT bucket, seq, COUNT(*) AS n_docs,
  CAST(SUM(LEAST(end_off, (seq + 1) * {L}) - GREATEST(start_off, seq * {L})) AS BIGINT) AS n_tokens,
  MIN({id_col}) AS first_doc, MAX({id_col}) AS last_doc,
  (CAST(SUM(LEAST(end_off, (seq + 1) * {L}) - GREATEST(start_off, seq * {L})) AS BIGINT) = {L}) AS is_full
FROM spans
GROUP BY bucket, seq
""".strip()


# --- mixture planning ---------------------------------------------------------

#: target-weight policy for the certified query: deterministic per-source
#: weight in {1,2,3} derived from the source name (scale-independent — no
#: literal table to keep in sync with the generated source list)
_MIX_SEED = "mix"
#: fraction of the total corpus token inventory the planned mix should cover
_BUDGET_FRAC = 0.5


def mixture_plan(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    budget_frac: float = _BUDGET_FRAC,
) -> DataFrame:
    """Per-domain mixture plan: given target weights and a token budget,
    the Bernoulli sample rate (downsampled domains) or repeat factor
    (upsampled domains — multiple epochs) per source.

    desired_s = w_s / sum(w) * budget;  rate_s = min(1, desired/avail);
    repeat_s = desired/avail (epochs when > 1). Two aggregates, the global
    one a 1-row broadcast."""
    from sarpro_spark.queries import fround

    weight = (hash_bucket(F.col(source_col), _MIX_SEED) % 3 + 1).cast("double")
    avail = (
        df.select(
            F.col(source_col),
            weight.alias("weight"),
            token_count(F.col(text_col)).cast("long").alias("n_tok"),
        )
        .groupBy(source_col, "weight")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("avail_tokens"),
        )
    )
    totals = avail.agg(
        F.sum(F.col("weight")).alias("_sum_w"),
        F.sum("avail_tokens").alias("_total_tokens"),
    )
    j = avail.crossJoin(F.broadcast(totals))
    desired = (
        F.col("weight")
        / F.col("_sum_w")
        * (F.col("_total_tokens").cast("double") * budget_frac)
    )
    ratio = desired / F.col("avail_tokens").cast("double")
    return j.select(
        F.col(source_col),
        "n_docs",
        "avail_tokens",
        F.col("weight").alias("target_weight"),
        fround(desired).alias("desired_tokens"),
        fround(F.least(ratio, F.lit(1.0))).alias("sample_rate"),
        fround(ratio).alias("repeat_factor"),
        (ratio > 1.0).alias("upsampled"),
    )


def sql_mixture_plan(
    src_rel: str = "documents",
    source_col: str = "source",
    budget_frac: float = _BUDGET_FRAC,
) -> str:
    """DuckDB twin of :func:`mixture_plan`."""
    from sarpro_spark.queries import sql_fround

    desired = f"(weight / _sum_w * (CAST(_total_tokens AS DOUBLE) * {budget_frac!r}))"
    ratio = f"({desired} / CAST(avail_tokens AS DOUBLE))"
    return f"""
WITH avail AS (
  SELECT {source_col},
         CAST(({sql_hash_bucket(source_col, _MIX_SEED)}) % 3 + 1 AS DOUBLE) AS weight,
         COUNT(*) AS n_docs,
         CAST(SUM({_SQL_NTOK}) AS BIGINT) AS avail_tokens
  FROM {src_rel}
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(weight) AS DOUBLE) AS _sum_w,
         CAST(SUM(avail_tokens) AS BIGINT) AS _total_tokens
  FROM avail
)
SELECT {source_col}, n_docs, avail_tokens, weight AS target_weight,
  {sql_fround(desired)} AS desired_tokens,
  {sql_fround(f'LEAST({ratio}, 1.0)')} AS sample_rate,
  {sql_fround(ratio)} AS repeat_factor,
  ({ratio} > 1.0) AS upsampled
FROM avail, tot
""".strip()


# --- length-bucketed batching (r13) --------------------------------------------

#: docs per training batch in the length-bucketed batching certificate
LB_BATCH_DOCS = 8
_LB_SEED = "lb"


def length_bucketed_batches(
    docs: DataFrame,
    batch_docs: int = LB_BATCH_DOCS,
    shards: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-grouped batching telemetry (r13): the padding-efficiency
    operator every trainer runs (group sequences of similar length so a
    batch's pad-to-max waste shrinks; HF ``group_by_length`` / the
    bucketed-batching idea of Khomenko et al.).

    Both legs batch SHARD-LOCALLY (a distributed trainer batches within
    its data-parallel shard; no global order anywhere): ``bucketed``
    groups docs by their log-length bin (the integer-exact DDSketch
    bucket map — power-of-2-ish bins, 4 per octave) within the shard;
    ``unbucketed`` is the same sharding without the length grouping.
    Waste per batch = batch_size * max(len) - sum(len), exact integers;
    the per-bin aggregate rows and the global baseline row ride in one
    output, so the efficiency CLAIM (bucketed waste < unbucketed waste)
    is hashed as data.

    Output: (mode, length_bin, n_docs, n_batches, padded_tokens,
    actual_tokens, waste_pm) — length_bin = -1 for the baseline leg."""
    from sarpro_spark.functions.ddsketch import bucket_id_expr

    base = docs.select(
        F.col(id_col).alias("id"),
        (token_count(F.col(text_col)) + 1).alias("n_tok"),  # +1: never zero
        (hash_bucket(F.col(id_col), _LB_SEED) % shards).alias("shard"),
    ).withColumn("length_bin", bucket_id_expr(F.col("n_tok")))

    def leg(df: DataFrame, keys: list, mode: str, bin_col) -> DataFrame:
        w = W.partitionBy(*keys).orderBy("n_tok", "id")
        batched = df.withColumn(
            "batch", ((F.row_number().over(w) - 1) / batch_docs).cast("long")
        )
        per_batch = batched.groupBy(*keys, "batch").agg(
            F.count(F.lit(1)).alias("bd"),
            F.max("n_tok").alias("mx"),
            F.sum("n_tok").alias("sm"),
        )
        return per_batch.groupBy(bin_col.alias("length_bin")).agg(
            F.sum("bd").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum(F.col("bd") * F.col("mx")).cast("long").alias("padded_tokens"),
            F.sum("sm").cast("long").alias("actual_tokens"),
        ).select(
            F.lit(mode).alias("mode"),
            "length_bin",
            "n_docs",
            "n_batches",
            "padded_tokens",
            "actual_tokens",
            F.floor(
                1000
                * (F.col("padded_tokens") - F.col("actual_tokens"))
                / F.col("padded_tokens")
            )
            .cast("long")
            .alias("waste_pm"),
        )

    bucketed = leg(
        base, ["shard", "length_bin"], "bucketed", F.col("length_bin")
    )
    baseline = leg(base, ["shard"], "unbucketed", F.lit(-1).cast("long"))
    return bucketed.unionByName(baseline)


def sql_length_bucketed_batches(
    docs_rel: str,
    batch_docs: int = LB_BATCH_DOCS,
    shards: int = DEFAULT_BUCKETS,
) -> str:
    """DuckDB twin of :func:`length_bucketed_batches` (same bucket map,
    same shard hash, same batch windows, integer arithmetic)."""
    from sarpro_spark.functions.ddsketch import _sql_bucket_id

    ntok = f"({_SQL_NTOK} + 1)"
    shard = f"({sql_hash_bucket('doc_id', _LB_SEED)}) % {shards}"

    def leg(part_keys: str, mode: str, bin_expr: str) -> str:
        return f"""
  SELECT '{mode}' AS mode, {bin_expr} AS length_bin,
         CAST(SUM(bd) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_batches,
         CAST(SUM(bd * mx) AS BIGINT) AS padded_tokens,
         CAST(SUM(sm) AS BIGINT) AS actual_tokens,
         CAST(FLOOR(1000 * (SUM(bd * mx) - SUM(sm)) / SUM(bd * mx)) AS BIGINT) AS waste_pm
  FROM (
    SELECT {part_keys}, batch,
           COUNT(*) AS bd, MAX(n_tok) AS mx, SUM(n_tok) AS sm
    FROM (
      SELECT shard, length_bin, n_tok, id,
             (ROW_NUMBER() OVER (PARTITION BY {part_keys} ORDER BY n_tok, id) - 1)
               // {batch_docs} AS batch
      FROM lb_base
    ) GROUP BY {part_keys}, batch
  ) GROUP BY 2"""

    return f"""
WITH lb_base AS MATERIALIZED (
  SELECT doc_id AS id, {ntok} AS n_tok, {shard} AS shard,
         {_sql_bucket_id(ntok)} AS length_bin
  FROM {docs_rel}
)
{leg('shard, length_bin', 'bucketed', 'length_bin')}
UNION ALL
{leg('shard', 'unbucketed', '-1')}
""".strip()

"""Bloom-filter semi-join reduction (the distributed runtime filter).

The 100 TB join problem this solves: a huge fact table joined to a
SELECTIVE dimension subset (customers in one segment, documents passing a
filter) pays a full fact shuffle even though most fact rows will never
match.  The classic fix — Bloom-filter semi-join reduction (Bloom 1970;
every warehouse engine's "runtime filter") — builds a tiny bit array from
the dim keys and drops non-matching fact rows BEFORE the shuffle, at scan
speed.  Spark's own runtime bloom (spark.sql.optimizer.runtime.bloomFilter)
is planner-internal and non-deterministic across engines; this module is
the explicit, oracle-reproducible DataFrame form:

  build   each dim key sets k bits: ONE md5 per key, but hash function j
          reads its OWN non-overlapping slice of the digest (base_j =
          hex slice j of md5, exact int64 on both engines), then
          bit_j = (a_j*base_j + b_j) mod p mod m.  Independent slices
          matter: affine transforms of a single shared base would make
          any base collision collide in all k bits at once — a
          false-positive floor of ~n/2^31 no m or k can reduce.  With
          per-j slices an all-bits collision needs the full k*40-bit
          digest prefix to collide.  The m-bit
          array materializes as an m/32-row (word, bits) relation via ONE
          groupBy(bit >> 5) + BIT_OR aggregate — never a driver-side
          bitmap, never a collect.
  probe   the fact side joins the word relation k times (k broadcast hash
          joins on the word index — m/32 rows broadcast, e.g. 64 KiB at
          m = 2^17) and keeps rows with all k bits set.  No explode, no
          shuffle, no row multiplication: k chained map-side lookups.

False positives pass (by design, bounded by the standard (1-e^{-kn/m})^k
rate, measured as hashed data in the certificate); false negatives are
impossible — the structural invariant the certificate asserts.

Reference analog: none (raster engine); public precedent: Bloom-join
(Mackert & Lohman 1986), Spark AQE runtime filters, Iceberg bloom columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: same exact-int64 modulus family as the MinHash permutations
BLOOM_PRIME = 2147483647
_BLOOM_SEED = 0xB100

DEFAULT_M_BITS = 1 << 17  # 128 Kibit = 2048 words = 16 KiB broadcast
DEFAULT_K = 3


def bloom_coeffs(k: int = DEFAULT_K, seed: int = _BLOOM_SEED) -> list[tuple[int, int]]:
    """Seeded (a, b) pairs shared by the Spark and SQL sides."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, BLOOM_PRIME, k)
    b = rng.integers(0, BLOOM_PRIME, k)
    return list(zip(a.tolist(), b.tolist()))


def _slice_width(k: int) -> int:
    """Hex chars of the md5 digest given to each of the k hash functions."""
    width = 32 // k
    if width * 4 < 20:  # need comfortably more entropy than log2(m_bits)
        raise ValueError(f"k={k} leaves only {width * 4} digest bits per hash")
    return min(width, 15)  # 15 hex chars = 60 bits, the exact-int64 ceiling


def _base_hash(key: Column, j: int = 0, k: int = DEFAULT_K) -> Column:
    """Base hash for function j: an independent slice of ONE md5 digest."""
    width = _slice_width(k)
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1 + j * width, width), 16, 10).cast("long")
        % BLOOM_PRIME
    )


def _bit_index(base: Column, a: int, b: int, m_bits: int) -> Column:
    return ((F.lit(a) * base + F.lit(b)) % BLOOM_PRIME) % m_bits


def bloom_build(
    dim: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """(word, bits) relation — the filter.  One union of k bit streams, one
    BIT_OR groupBy; at most m_bits/32 rows regardless of dim size (32-bit words: the max shift of 31 stays in BIGINT range on both engines)."""
    parts = []
    for j, (a, b) in enumerate(bloom_coeffs(k)):
        idx = _bit_index(_base_hash(F.col(key_col), j, k), a, b, m_bits)
        parts.append(dim.select(F.shiftright(idx, 5).alias("word"), idx.alias("_idx")))
    allbits = parts[0]
    for p in parts[1:]:
        allbits = allbits.unionAll(p)
    return allbits.groupBy("word").agg(
        F.bit_or(F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("_idx") % 32).cast("int"))).alias("bits")
    )


def bloom_probe(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Fact rows whose key passes the filter: k chained broadcast lookups
    (left join — a missing word means that bit is 0, the row drops)."""
    out = fact
    keep = F.lit(True)
    for j, (a, b) in enumerate(bloom_coeffs(k)):
        idx = _bit_index(_base_hash(F.col(key_col), j, k), a, b, m_bits)
        w = bloom.select(F.col("word").alias(f"_w{j}"), F.col("bits").alias(f"_bits{j}"))
        out = out.join(
            F.broadcast(w), F.shiftright(idx, 5) == F.col(f"_w{j}"), "left"
        )
        bit = F.call_function("shiftleft", F.lit(1).cast("long"), (idx % 32).cast("int"))
        keep = keep & (F.coalesce(F.col(f"_bits{j}"), F.lit(0)).bitwiseAND(bit) != 0)
    return out.where(keep).drop(*[c for j in range(k) for c in (f"_w{j}", f"_bits{j}")])


# --- DuckDB twins -------------------------------------------------------------


def sql_bloom_ctes(
    dim_rel: str,
    key_expr: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> str:
    """CTE chain ending in ``bloomwords`` — twin of :func:`bloom_build`."""
    width = _slice_width(k)
    selects = []
    for j, (a, b) in enumerate(bloom_coeffs(k)):
        base = (
            f"(CAST(('0x' || SUBSTR(MD5(CAST({key_expr} AS VARCHAR)), {1 + j * width}, {width}))"
            f" AS BIGINT) % {BLOOM_PRIME})"
        )
        idx = f"((({a} * {base} + {b}) % {BLOOM_PRIME}) % {m_bits})"
        selects.append(f"SELECT ({idx} >> 5) AS word, {idx} AS _idx FROM {dim_rel}")
    union = "\n  UNION ALL\n  ".join(selects)
    return f"""
bloombits AS (
  {union}
),
bloomwords AS (
  SELECT word, BIT_OR(1::BIGINT << CAST(_idx % 32 AS INTEGER)) AS bits
  FROM bloombits GROUP BY word
)""".strip()


def sql_bloom_probe_pred(
    key_expr: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> str:
    """Boolean predicate (correlated scalar subqueries against
    ``bloomwords``) — twin of :func:`bloom_probe`'s keep condition."""
    width = _slice_width(k)
    preds = []
    for j, (a, b) in enumerate(bloom_coeffs(k)):
        base = (
            f"(CAST(('0x' || SUBSTR(MD5(CAST({key_expr} AS VARCHAR)), {1 + j * width}, {width}))"
            f" AS BIGINT) % {BLOOM_PRIME})"
        )
        idx = f"((({a} * {base} + {b}) % {BLOOM_PRIME}) % {m_bits})"
        preds.append(
            f"(COALESCE((SELECT bits FROM bloomwords w WHERE w.word = ({idx} >> 5)), 0)"
            f" & (1::BIGINT << CAST({idx} % 32 AS INTEGER))) <> 0"
        )
    return "(" + " AND ".join(preds) + ")"

"""Perceptual-hash image near-duplicate detection (pHash + dHash).

Completes the dedup matrix across modalities: text has exact / fuzzy /
substring / semantic (llm/dedup.py, llm/substring.py, llm/similarity.py);
this module covers PIXEL content — the near-identical re-encoded and
resized images a multimodal 100 TB corpus is full of.  Public method
(Zauner 2010 "Implementation and Benchmarking of Perceptual Image Hash
Functions"; the classic pHash/dHash family):

  decode    the in-repo codecs (sinks/png.py, sinks/jpeg.py) inside ONE
            Arrow-batched mapInPandas — pixels never leave the executor;
            an undecodable blob is one decode_ok=false row, never a failed
            task (safe_decode_image doctrine).
  gray      integer luma (299R + 587G + 114B) / 1000, floor — exact.
  sample    nearest-neighbor grid sample (src = floor(dst*src_dim/N)).
            NN is EXACTLY invariant under integer upscaling —
            floor(floor(c*2w/N)/2) == floor(c*w/N) — so a 2x resized copy
            hashes IDENTICALLY, which is what makes the planted-duplicate
            certificate exact on both engines.
  pHash     32x32 -> 2D DCT-II via a FIXED-POINT integer basis
            (round(cos(pi*(2x+1)*u/64) * 2^14) — int64 throughout, no
            float sign flips between engines) -> 8x8 low-frequency block
            -> bit = coef > lower-median.  64 bits, stored as two
            non-negative 32-bit halves (hi, lo) so no engine ever signs,
            shifts, or sums across bit 63.
  dHash     8x9 grid, bit = gray[r][c] > gray[r][c+1] — pure integer.
  pairs     the banded-Hamming join shared with simhash_neardup_pairs
            (llm/dedup.py): 8 bands x 8 bits; pigeonhole guarantees 100%
            recall for Hamming distance <= 7; exact popcount verify.

Scale shape at 100 TB: hashing is one linear decode pass (the expensive
part is the codec, amortized in Arrow batches); the join state is 16
bytes/image + 8 band keys — the same banded-bucket economics as MinHash.

Reference analog: none (raster engine); built for the pipeline mandate.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale of the DCT basis — integer exactness on both engines.
PHASH_DCT_SCALE = 1 << 14
PHASH_N = 32  # sample grid feeding the DCT
PHASH_LOW = 8  # low-frequency block kept (8x8 = 64 bits)
DHASH_ROWS, DHASH_COLS = 8, 9  # 8 rows x 8 gradient bits

DEFAULT_MAX_HAMMING = 6  # < 8 bands -> pigeonhole recall is structural


def phash_basis() -> list[list[int]]:
    """The 8x32 fixed-point DCT-II basis, identical literals on both
    engines (generated once from math.cos, then integer forever)."""
    return [
        [round(math.cos(math.pi * (2 * x + 1) * u / (2 * PHASH_N)) * PHASH_DCT_SCALE)
         for x in range(PHASH_N)]
        for u in range(PHASH_LOW)
    ]


def _gray_int(img: np.ndarray) -> np.ndarray:
    """Integer luma: (299R + 587G + 114B) // 1000; gray images pass through."""
    g = np.asarray(img, dtype=np.int64)
    if g.ndim == 3:
        if g.shape[2] >= 3:
            g = (299 * g[:, :, 0] + 587 * g[:, :, 1] + 114 * g[:, :, 2]) // 1000
        else:
            g = g[:, :, 0]
    return g


def _nn_sample(gray: np.ndarray, rows: int, cols: int) -> np.ndarray:
    h, w = gray.shape
    r = (np.arange(rows, dtype=np.int64) * h) // rows
    c = (np.arange(cols, dtype=np.int64) * w) // cols
    return gray[np.ix_(r, c)]


def _pack_bits(bits: np.ndarray) -> tuple[int, int]:
    """64 bools (index order 0..63) -> (hi, lo) non-negative 32-bit ints."""
    idx = np.arange(64, dtype=np.uint64)
    vals = np.where(bits, np.uint64(1), np.uint64(0)).astype(np.uint64)
    lo = int(np.sum(vals[:32] << idx[:32]))
    hi = int(np.sum(vals[32:] << idx[:32]))
    return hi, lo


def phash_from_gray(gray: np.ndarray) -> tuple[int, int]:
    """(hi, lo) pHash of an integer grayscale image — the numpy twin of the
    SQL pipeline: NN 32x32, fixed-point DCT, bit = coef > lower median."""
    g32 = _nn_sample(np.asarray(gray, dtype=np.int64), PHASH_N, PHASH_N)
    c = np.asarray(phash_basis(), dtype=np.int64)  # 8x32
    coef = c @ g32 @ c.T  # 8x8, exact int64 (|coef| < 2^47)
    flat = coef.reshape(-1)
    thr = np.sort(flat)[31]  # lower median of 64
    bits = flat > thr  # bit index = u*8 + v
    return _pack_bits(bits)


def dhash_from_gray(gray: np.ndarray) -> tuple[int, int]:
    """(hi, lo) dHash: 8x9 NN grid, bit = g[r][c] > g[r][c+1]."""
    g = _nn_sample(np.asarray(gray, dtype=np.int64), DHASH_ROWS, DHASH_COLS)
    bits = (g[:, :-1] > g[:, 1:]).reshape(-1)  # bit index = r*8 + c
    return _pack_bits(bits)


def image_hashes(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, decode_ok, phash_hi, phash_lo, dhash_hi, dhash_lo) — one
    Arrow-batched decode+hash pass; undecodable blobs yield decode_ok=false
    with null hashes (graceful-degradation doctrine)."""
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("decode_ok", BooleanType()),
            StructField("phash_hi", LongType()),
            StructField("phash_lo", LongType()),
            StructField("dhash_hi", LongType()),
            StructField("dhash_lo", LongType()),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from sarpro_spark.llm.multimodal import safe_decode_image

        for pdf in batches:
            out = {k: [] for k in ("id", "ok", "phi", "plo", "dhi", "dlo")}
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                img, ok = safe_decode_image(blob)
                out["id"].append(int(i))
                out["ok"].append(bool(ok))
                if ok:
                    gray = _gray_int(img)
                    phi, plo = phash_from_gray(gray)
                    dhi, dlo = dhash_from_gray(gray)
                    out["phi"].append(phi)
                    out["plo"].append(plo)
                    out["dhi"].append(dhi)
                    out["dlo"].append(dlo)
                else:
                    for kk in ("phi", "plo", "dhi", "dlo"):
                        out[kk].append(None)
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "decode_ok": out["ok"],
                    "phash_hi": pd.array(out["phi"], dtype="Int64"),
                    "phash_lo": pd.array(out["plo"], dtype="Int64"),
                    "dhash_hi": pd.array(out["dhi"], dtype="Int64"),
                    "dhash_lo": pd.array(out["dlo"], dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, schema=schema)


def phash_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = DEFAULT_MAX_HAMMING,
) -> DataFrame:
    """Near-dup pairs by pHash: (doc_a, doc_b, ph_dist, dh_dist).

    8 bands x 8 bits (4 from lo, 4 from hi); images sharing any band byte
    are candidates; exact popcount Hamming verifies.  Structural recall:
    ph_dist <= 7 implies one intact band (pigeonhole), so every pair
    within ``max_hamming`` <= 7 is found — banded join, never all-pairs.

    The decoded hash relation is persisted: it feeds both self-join sides,
    and the Arrow decode pass is NOT deduplicated at runtime (measured 2x
    decode CPU without the persist — r13), so one materialization of the
    16-bytes-per-image hashes replaces a second full decode of the corpus.
    """
    h = hashes.where(F.col("decode_ok")).persist()
    band_exprs = []
    for b in range(8):
        src = F.col("phash_lo") if b < 4 else F.col("phash_hi")
        byte = F.shiftright(src, (b % 4) * 8).bitwiseAND(F.lit(255))
        band_exprs.append(byte.bitwiseOR(F.lit(b << 8)))
    keys = h.select(
        F.col(id_col), "phash_hi", "phash_lo", "dhash_hi", "dhash_lo",
        F.explode(F.array(*band_exprs)).alias("bkey"),
    )
    a = keys.select(
        F.col(id_col).alias("doc_a"),
        F.col("phash_hi").alias("pha"), F.col("phash_lo").alias("pla"),
        F.col("dhash_hi").alias("dha"), F.col("dhash_lo").alias("dla"),
        "bkey",
    )
    b_ = keys.select(
        F.col(id_col).alias("doc_b"),
        F.col("phash_hi").alias("phb"), F.col("phash_lo").alias("plb"),
        F.col("dhash_hi").alias("dhb"), F.col("dhash_lo").alias("dlb"),
        "bkey",
    )
    cand = (
        a.join(b_, "bkey")
        .where(F.col("doc_a") < F.col("doc_b"))
        .drop("bkey")
        .distinct()
    )
    ph = (
        F.bit_count(F.col("pha").bitwiseXOR(F.col("phb")))
        + F.bit_count(F.col("pla").bitwiseXOR(F.col("plb")))
    )
    dh = (
        F.bit_count(F.col("dha").bitwiseXOR(F.col("dhb")))
        + F.bit_count(F.col("dla").bitwiseXOR(F.col("dlb")))
    )
    return (
        cand.select(
            "doc_a", "doc_b",
            ph.cast("int").alias("ph_dist"), dh.cast("int").alias("dh_dist"),
        )
        .where(F.col("ph_dist") <= max_hamming)
    )


# --- deterministic fixture: planted resized duplicates -------------------------


def attach_image_payload_resized_dups(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """PNG payloads for the PNG-leg ids (doc_id % 4 in {0, 2}), with
    PLANTED RESIZED DUPLICATES: doc_id % 20 == 10 carries the 2x
    nearest-neighbor upscale of doc (doc_id - 10)'s image instead of its
    own.  Lossless PNG + NN upscale invariance make the planted pair's
    pHash/dHash EXACTLY equal — the oracle recomputes both from the pixel
    formula (llm/multimodal.py formula_image) without decoding."""
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from sarpro_spark.llm.multimodal import _distributed_ids

    schema = StructType(
        [StructField(id_col, LongType()), StructField("payload", BinaryType())]
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from sarpro_spark.llm.multimodal import formula_image
        from sarpro_spark.sinks.png import encode_png

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf[id_col]:
                i = int(i)
                if i % 4 not in (0, 2):
                    continue
                src = i - 10 if i % 20 == 10 else i
                w, h = 8 + src % 24, 8 + src % 16
                img = formula_image(src, w, h, 3 if src % 4 >= 2 else 1)
                if i % 20 == 10:
                    img = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
                ids.append(i)
                blobs.append(encode_png(img))
            yield pd.DataFrame({id_col: ids, "payload": blobs})

    return _distributed_ids(df, id_col).mapInPandas(fn, schema=schema)


# --- DuckDB twins -------------------------------------------------------------


def sql_phash_hashes_ctes(ids_rel: str) -> str:
    """CTE chain ending in ``imghashes`` (doc_id, phash_hi, phash_lo,
    dhash_hi, dhash_lo) — recomputes every hash from the PIXEL FORMULA for
    the fixture of :func:`attach_image_payload_resized_dups`.

    ``ids_rel`` must yield one ``doc_id`` BIGINT column.  The planted
    mapping (doc_id % 20 == 10 -> source doc_id - 10) and NN upscale
    invariance mean the formula gray of the SOURCE doc at SOURCE dims is
    exactly what the Spark side decodes and samples.
    """
    basis_rows = ",\n    ".join(
        f"({u}, {x}, {v})"
        for u, row in enumerate(phash_basis())
        for x, v in enumerate(row)
    )
    # integer luma of the formula pixel; mode 0 -> 1 channel, mode 2 -> RGB.
    # Placeholders __SID/__SR/__SC are substituted with the per-CTE source
    # id / source row / source col expressions (plain .replace would corrupt
    # substrings like 'src_id' containing 'sr').
    luma = (
        "CASE WHEN __SID % 4 = 0 THEN (__SID * 31 + __SR * 7 + __SC * 13) % 256 "
        "ELSE (299 * ((__SID * 31 + __SR * 7 + __SC * 13) % 256) "
        "    + 587 * ((__SID * 31 + __SR * 7 + __SC * 13 + 59) % 256) "
        "    + 114 * ((__SID * 31 + __SR * 7 + __SC * 13 + 118) % 256)) // 1000 END"
    )
    luma32 = (
        luma.replace("__SID", "d.src_id")
        .replace("__SR", "((r.r * d.h) // 32)")
        .replace("__SC", "((c.c * d.w) // 32)")
    )
    luma_d = (
        luma.replace("__SID", "d.src_id")
        .replace("__SR", "((r.r * d.h) // 8)")
        .replace("__SC", "((c.c * d.w) // 9)")
    )
    return f"""
imgdocs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 20 = 10 THEN doc_id - 10 ELSE doc_id END AS src_id
  FROM {ids_rel}
  WHERE doc_id % 4 IN (0, 2)
),
imgdims AS (
  SELECT doc_id, src_id, 8 + src_id % 24 AS w, 8 + src_id % 16 AS h FROM imgdocs
),
gray32v AS (
  SELECT d.doc_id, r.r, c.c, {luma32} AS gray
  FROM imgdims d,
       (SELECT UNNEST(RANGE(0, 32)) AS r) r,
       (SELECT UNNEST(RANGE(0, 32)) AS c) c
),
phbasis(u, x, v) AS (VALUES
    {basis_rows}
),
phtmp AS (
  SELECT g.doc_id, b.u, g.c, SUM(g.gray * b.v) AS t
  FROM gray32v g JOIN phbasis b ON b.x = g.r
  GROUP BY 1, 2, 3
),
phcoef AS (
  SELECT t.doc_id, t.u, b.u AS v, SUM(t.t * b.v) AS coef
  FROM phtmp t JOIN phbasis b ON b.x = t.c
  GROUP BY 1, 2, 3
),
phthr AS (
  SELECT doc_id, coef AS thr FROM (
    SELECT doc_id, coef,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY coef, u, v) AS rn
    FROM phcoef
  ) q WHERE rn = 32
),
phbits AS (
  SELECT c.doc_id,
         BIT_OR(CASE WHEN c.coef > t.thr AND c.u * 8 + c.v >= 32
                THEN 1::BIGINT << CAST(c.u * 8 + c.v - 32 AS INTEGER) ELSE 0 END) AS phash_hi,
         BIT_OR(CASE WHEN c.coef > t.thr AND c.u * 8 + c.v < 32
                THEN 1::BIGINT << CAST(c.u * 8 + c.v AS INTEGER) ELSE 0 END) AS phash_lo
  FROM phcoef c JOIN phthr t USING (doc_id)
  GROUP BY 1
),
dgrid AS (
  SELECT d.doc_id, r.r, c.c, {luma_d} AS gray
  FROM imgdims d,
       (SELECT UNNEST(RANGE(0, 8)) AS r) r,
       (SELECT UNNEST(RANGE(0, 9)) AS c) c
),
dbits AS (
  SELECT a.doc_id,
         BIT_OR(CASE WHEN a.gray > b.gray AND a.r * 8 + a.c >= 32
                THEN 1::BIGINT << CAST(a.r * 8 + a.c - 32 AS INTEGER) ELSE 0 END) AS dhash_hi,
         BIT_OR(CASE WHEN a.gray > b.gray AND a.r * 8 + a.c < 32
                THEN 1::BIGINT << CAST(a.r * 8 + a.c AS INTEGER) ELSE 0 END) AS dhash_lo
  FROM dgrid a JOIN dgrid b ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
  GROUP BY 1
),
imghashes AS (
  SELECT p.doc_id, p.phash_hi, p.phash_lo, d.dhash_hi, d.dhash_lo
  FROM phbits p JOIN dbits d USING (doc_id)
)""".strip()


def sql_phash_neardup_pairs(ids_rel: str, max_hamming: int = DEFAULT_MAX_HAMMING) -> str:
    """DuckDB twin of hashes + :func:`phash_neardup_pairs`."""
    ctes = sql_phash_hashes_ctes(ids_rel)
    bands = []
    for b in range(8):
        src = "phash_lo" if b < 4 else "phash_hi"
        bands.append(
            f"SELECT doc_id, phash_hi, phash_lo, dhash_hi, dhash_lo, "
            f"(({src} >> {(b % 4) * 8}) & 255) | {b << 8} AS bkey FROM imghashes"
        )
    banded = "\n  UNION ALL\n  ".join(bands)
    return f"""
WITH {ctes},
phbanded AS (
  {banded}
),
phcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash_hi AS pha, a.phash_lo AS pla, b.phash_hi AS phb, b.phash_lo AS plb,
         a.dhash_hi AS dha, a.dhash_lo AS dla, b.dhash_hi AS dhb, b.dhash_lo AS dlb
  FROM phbanded a JOIN phbanded b USING (bkey)
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(BIT_COUNT(XOR(pha, phb)) + BIT_COUNT(XOR(pla, plb)) AS INTEGER) AS ph_dist,
       CAST(BIT_COUNT(XOR(dha, dhb)) + BIT_COUNT(XOR(dla, dlb)) AS INTEGER) AS dh_dist
FROM phcand
WHERE BIT_COUNT(XOR(pha, phb)) + BIT_COUNT(XOR(pla, plb)) <= {max_hamming}
""".strip()

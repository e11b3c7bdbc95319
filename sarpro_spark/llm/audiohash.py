"""Audio fingerprint near-duplicate detection (block-energy delta hash).

Completes the dedup matrix's AUDIO cell, next to text (llm/dedup.py,
llm/substring*.py), embeddings (llm/similarity.py) and pixels
(llm/imagehash.py): the re-sampled / re-encoded copies of the same
recording a multimodal 100 TB corpus accumulates.  Public method family:
Haitsma & Kalker 2002 ("A Highly Robust Audio Fingerprinting System") —
bit = sign of the energy difference between adjacent analysis frames; we
keep their delta-sign skeleton but stay ALL-INTEGER so the DuckDB oracle
can recompute every bit from the PCM formula:

  decode   the in-repo RIFF/WAVE PCM16 codec (llm/multimodal.py) inside
           ONE Arrow-batched mapInPandas; an undecodable blob is one
           decode_ok=false row, never a failed task.
  grid     65 frames x 16 points nearest-neighbor sample of the decoded
           waveform: point g in [0,1040) reads s[(g*n)//1040].  NN is
           EXACTLY invariant under integer sample repetition —
           floor(floor(g*2n/G)/2) == floor(g*n/G) — so a 2x time-stretched
           (sample-doubled) copy fingerprints IDENTICALLY, which makes the
           planted-duplicate certificate exact on both engines.  The bits
           are also invariant under any positive uniform gain (energies
           scale by k^2; strict > is preserved), pinned in tests.
  energy   e[f] = sum of squares of the frame's 16 points (int64).
  bits     bit f = e[f] > e[f+1], f in 0..63 — 64 bits stored as two
           non-negative 32-bit halves (hi, lo), the imagehash convention.
  pairs    8 bands x 8 bits banded Hamming join (pigeonhole: 100% recall
           for distance <= 7), exact popcount verify — the same
           banded-bucket economics as MinHash/simhash/pHash.

Scale shape at 100 TB: fingerprinting is one linear decode pass (Arrow
batches amortize the codec); join state is 8 bytes/clip + 8 band keys.

Reference analog: none (raster engine); built for the pipeline mandate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AFP_FRAMES = 65  # 64 delta bits need 65 frame energies
AFP_POINTS = 16  # NN-sampled points per frame
AFP_GRID = AFP_FRAMES * AFP_POINTS  # 1040

DEFAULT_MAX_HAMMING = 6  # < 8 bands -> pigeonhole recall is structural


def afp_from_samples(samples: np.ndarray) -> tuple[int, int]:
    """(hi, lo) fingerprint of an int PCM waveform — the numpy twin of the
    SQL pipeline: NN 65x16 grid, int64 frame energies, delta-sign bits."""
    s = np.asarray(samples, dtype=np.int64)
    n = s.shape[0]
    grid = s[(np.arange(AFP_GRID, dtype=np.int64) * n) // AFP_GRID]
    e = (grid * grid).reshape(AFP_FRAMES, AFP_POINTS).sum(axis=1)
    bits = e[:64] > e[1:]
    from sarpro_spark.llm.imagehash import _pack_bits

    return _pack_bits(bits)


def audio_fingerprints(
    df: DataFrame, payload_col: str = "wav", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, decode_ok, afp_hi, afp_lo) — one Arrow-batched decode+hash
    pass; undecodable blobs yield decode_ok=false with null hashes."""
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("decode_ok", BooleanType()),
            StructField("afp_hi", LongType()),
            StructField("afp_lo", LongType()),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from sarpro_spark.llm.multimodal import decode_wav

        for pdf in batches:
            ids, oks, his, los = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(i))
                try:
                    _, s = decode_wav(bytes(blob))
                    if s.shape[0] == 0:
                        raise ValueError("empty waveform")
                    hi, lo = afp_from_samples(s)
                    oks.append(True)
                    his.append(hi)
                    los.append(lo)
                except Exception:
                    oks.append(False)
                    his.append(None)
                    los.append(None)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "decode_ok": oks,
                    "afp_hi": pd.array(his, dtype="Int64"),
                    "afp_lo": pd.array(los, dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, schema=schema)


def afp_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = DEFAULT_MAX_HAMMING,
) -> DataFrame:
    """Near-dup pairs by fingerprint: (doc_a, doc_b, afp_dist).

    8 bands x 8 bits (4 from lo, 4 from hi); clips sharing any band byte
    are candidates; exact popcount Hamming verifies.  Structural recall:
    afp_dist <= 7 implies one intact band (pigeonhole).

    The fingerprint relation is persisted: both self-join sides consume it
    and the PCM decode pass is NOT deduplicated at runtime (measured 2x
    decode CPU without the persist — r13); 16 bytes/clip materialized once
    replaces a second decode of every payload."""
    h = hashes.where(F.col("decode_ok")).persist()
    band_exprs = []
    for b in range(8):
        src = F.col("afp_lo") if b < 4 else F.col("afp_hi")
        byte = F.shiftright(src, (b % 4) * 8).bitwiseAND(F.lit(255))
        band_exprs.append(byte.bitwiseOR(F.lit(b << 8)))
    keys = h.select(
        F.col(id_col), "afp_hi", "afp_lo",
        F.explode(F.array(*band_exprs)).alias("bkey"),
    )
    a = keys.select(
        F.col(id_col).alias("doc_a"),
        F.col("afp_hi").alias("ha"), F.col("afp_lo").alias("la"),
        "bkey",
    )
    b_ = keys.select(
        F.col(id_col).alias("doc_b"),
        F.col("afp_hi").alias("hb"), F.col("afp_lo").alias("lb"),
        "bkey",
    )
    cand = (
        a.join(b_, "bkey")
        .where(F.col("doc_a") < F.col("doc_b"))
        .drop("bkey")
        .distinct()
    )
    dist = (
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
    )
    return (
        cand.select("doc_a", "doc_b", dist.cast("int").alias("afp_dist"))
        .where(F.col("afp_dist") <= max_hamming)
    )


# --- deterministic fixture: planted time-stretched duplicates ------------------


def attach_wav_payload_stretched_dups(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """WAV payloads for every doc, with PLANTED TIME-STRETCHED DUPLICATES:
    doc_id % 20 == 10 carries the 2x sample-repeated (naive half-speed
    resample) copy of doc (doc_id - 10)'s waveform instead of its own.
    Lossless PCM16 + NN grid invariance make the planted pair's fingerprint
    EXACTLY equal — the oracle recomputes both from the integer PCM formula
    (llm/multimodal.py formula_audio) without decoding."""
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from sarpro_spark.llm.multimodal import _distributed_ids

    schema = StructType(
        [StructField(id_col, LongType()), StructField("wav", BinaryType())]
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from sarpro_spark.llm.multimodal import encode_wav, formula_audio

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf[id_col]:
                i = int(i)
                src = i - 10 if i % 20 == 10 else i
                s = formula_audio(src, 400 + src % 200)
                if i % 20 == 10:
                    s = np.repeat(s, 2)
                ids.append(i)
                blobs.append(encode_wav(s))
            yield pd.DataFrame({id_col: ids, "wav": blobs})

    return _distributed_ids(df, id_col).mapInPandas(fn, schema=schema)


# --- DuckDB twins -------------------------------------------------------------


def sql_afp_hashes_ctes(ids_rel: str) -> str:
    """CTE chain ending in ``afphashes`` (doc_id, afp_hi, afp_lo) —
    recomputes every fingerprint from the PCM FORMULA for the fixture of
    :func:`attach_wav_payload_stretched_dups`.

    ``ids_rel`` must yield one ``doc_id`` BIGINT column.  The planted
    mapping (doc_id % 20 == 10 -> source doc_id - 10) and NN repetition
    invariance mean the formula waveform of the SOURCE doc at SOURCE
    length is exactly what the Spark side decodes and samples.
    """
    return f"""
afpdocs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 20 = 10 THEN doc_id - 10 ELSE doc_id END AS src_id
  FROM {ids_rel}
),
afpdims AS (
  SELECT doc_id, src_id, 400 + src_id % 200 AS n FROM afpdocs
),
afpgrid AS (
  SELECT d.doc_id, g.g // {AFP_POINTS} AS f,
         ((d.src_id * 31 + ((g.g * d.n) // {AFP_GRID}) * ((g.g * d.n) // {AFP_GRID}) * 7) % 65536) - 32768 AS s
  FROM afpdims d, (SELECT UNNEST(RANGE(0, {AFP_GRID})) AS g) g
),
afpe AS (
  SELECT doc_id, f, SUM(s * s) AS e FROM afpgrid GROUP BY 1, 2
),
afphashes AS (
  SELECT a.doc_id,
         BIT_OR(CASE WHEN a.e > b.e AND a.f >= 32
                THEN 1::BIGINT << CAST(a.f - 32 AS INTEGER) ELSE 0 END) AS afp_hi,
         BIT_OR(CASE WHEN a.e > b.e AND a.f < 32
                THEN 1::BIGINT << CAST(a.f AS INTEGER) ELSE 0 END) AS afp_lo
  FROM afpe a JOIN afpe b ON a.doc_id = b.doc_id AND b.f = a.f + 1
  WHERE a.f < 64
  GROUP BY 1
)""".strip()


def sql_afp_neardup_pairs(ids_rel: str, max_hamming: int = DEFAULT_MAX_HAMMING) -> str:
    """DuckDB twin of fingerprints + :func:`afp_neardup_pairs`."""
    ctes = sql_afp_hashes_ctes(ids_rel)
    bands = []
    for b in range(8):
        src = "afp_lo" if b < 4 else "afp_hi"
        bands.append(
            f"SELECT doc_id, afp_hi, afp_lo, "
            f"(({src} >> {(b % 4) * 8}) & 255) | {b << 8} AS bkey FROM afphashes"
        )
    banded = "\n  UNION ALL\n  ".join(bands)
    return f"""
WITH {ctes},
afpbanded AS (
  {banded}
),
afpcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.afp_hi AS ha, a.afp_lo AS la, b.afp_hi AS hb, b.afp_lo AS lb
  FROM afpbanded a JOIN afpbanded b USING (bkey)
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(BIT_COUNT(XOR(ha, hb)) + BIT_COUNT(XOR(la, lb)) AS INTEGER) AS afp_dist
FROM afpcand
WHERE BIT_COUNT(XOR(ha, hb)) + BIT_COUNT(XOR(la, lb)) <= {max_hamming}
""".strip()

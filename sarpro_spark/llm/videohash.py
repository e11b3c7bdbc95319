"""Perceptual video near-duplicate detection — the VIDEO cell of the dedup
matrix (r12 verdict item 3).

Composes two certified pieces: per-frame perceptual hashing
(llm/imagehash.py — fixed-point integer DCT pHash, NN-sampling exactly
invariant under integer upscaling) and frame sampling over a concatenated
still-image stream (the container-free clip representation of
llm/multimodal.py:split_mjpeg / sample_frames; real mp4/webm demux needs an
ffmpeg binding this container lacks and stays behind the declared
NotImplementedError boundary there).  Public method: frame-fingerprint
voting (Wu/Ngo/Hauptmann 2007 CIVR "Practical Elimination of
Near-Duplicates from Web Video Search" — keyframe perceptual hashes + pair
voting), re-expressed Spark-first:

  decode    ONE Arrow-batched mapInPandas splits each clip payload into
            frames (PNG signature scan — lossless leg, so planted
            duplicates certify EXACTLY) and pHashes every frame; an
            undecodable frame is one decode_ok=false row, never a failed
            task.  Pixels never leave the executor.
  band      the same 8-band x 8-bit pigeonhole banding as image pHash, at
            FRAME granularity: any frame pair within Hamming 7 shares an
            intact band byte — structural recall, never an all-pairs join.
  vote      frame matches aggregate per clip pair: a pair is a near-dup
            when >= min_vote fraction of BOTH clips' frames have a partner
            within ``max_hamming``.  Matching is by content, not frame
            index, so re-encoded, rescaled, AND frame-shifted copies all
            clear the vote (a 1-frame shift costs exactly one unmatched
            frame per side).

Scale shape at 100 TB: hashing is one linear decode pass (codec-bound,
Arrow-amortized); join state is 16 bytes + 8 band keys PER FRAME (clips
~30-300 sampled frames), the same banded-bucket economics as MinHash-LSH —
the frame-level join never materializes clip x clip, and the vote is one
hash-aggregate over frame matches.

Reference analog: none (raster engine); built for the pipeline mandate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sarpro_spark.llm.imagehash import DEFAULT_MAX_HAMMING, phash_from_gray, _gray_int

#: frames per synthetic clip fixture — small enough for the DuckDB formula
#: recompute, large enough that the 1-frame-shift vote margin is meaningful.
CLIP_FRAMES = 6
#: a pair is a near-dup when this fraction of BOTH clips' frames matched.
DEFAULT_MIN_VOTE = 0.6


def split_concat_png(payload: bytes) -> list[bytes]:
    """Split a concatenated-PNG clip payload into per-frame byte strings by
    scanning signature..IEND chunk ends (the lossless sibling of
    multimodal.split_mjpeg — marker scan, no index assumed)."""
    from sarpro_spark.sinks import png as P

    buf = bytes(payload)
    frames_, pos = [], 0
    while True:
        start = buf.find(P.SIGNATURE, pos)
        if start < 0:
            break
        end = buf.find(b"IEND", start)
        if end < 0:
            break
        frames_.append(buf[start : end + 8])  # IEND + 4-byte CRC
        pos = end + 8
    return frames_


def video_frame_hashes(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, fidx, decode_ok, ph_hi, ph_lo) — one Arrow-batched
    split+decode+hash pass per clip; an undecodable frame yields one
    decode_ok=false row (graceful-degradation doctrine)."""
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("fidx", LongType()),
            StructField("decode_ok", BooleanType()),
            StructField("ph_hi", LongType()),
            StructField("ph_lo", LongType()),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from sarpro_spark.llm.multimodal import safe_decode_image

        for pdf in batches:
            out = {k: [] for k in ("id", "f", "ok", "hi", "lo")}
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                for fidx, fbytes in enumerate(split_concat_png(blob)):
                    img, ok = safe_decode_image(fbytes)
                    out["id"].append(int(i))
                    out["f"].append(fidx)
                    out["ok"].append(bool(ok))
                    if ok:
                        hi, lo = phash_from_gray(_gray_int(img))
                        out["hi"].append(hi)
                        out["lo"].append(lo)
                    else:
                        out["hi"].append(None)
                        out["lo"].append(None)
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "fidx": out["f"],
                    "decode_ok": out["ok"],
                    "ph_hi": pd.array(out["hi"], dtype="Int64"),
                    "ph_lo": pd.array(out["lo"], dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, schema=schema)


def video_neardup_pairs(
    frame_hashes: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = DEFAULT_MAX_HAMMING,
    min_vote: float = DEFAULT_MIN_VOTE,
) -> DataFrame:
    """Clip near-dup pairs by frame voting:
    (doc_a, doc_b, matched_a, matched_b, n_frames_a, n_frames_b).

    Frame-level banded-Hamming join (pigeonhole recall for distance <= 7)
    -> distinct matched frame pairs -> per clip pair, count DISTINCT
    matched frames on each side -> keep pairs where both sides' matched
    fraction >= ``min_vote``.  Content-keyed matching makes the vote
    invariant to frame order and robust to shifts; everything after the
    single mapInPandas decode is JVM-side codegen.

    The frame-hash relation is persisted: THREE differently-keyed
    consumers read it (both band-join sides + the per-clip frame-count
    aggregate) and the split+decode mapInPandas is NOT deduplicated at
    runtime (measured 3x decode CPU without the persist — r13), so one
    materialization of the 16-bytes-per-frame hashes replaces two extra
    full decodes of every clip payload.
    """
    h = frame_hashes.where(F.col("decode_ok")).persist()
    band_exprs = []
    for b in range(8):
        src = F.col("ph_lo") if b < 4 else F.col("ph_hi")
        byte = F.shiftright(src, (b % 4) * 8).bitwiseAND(F.lit(255))
        band_exprs.append(byte.bitwiseOR(F.lit(b << 8)))
    keys = h.select(
        F.col(id_col), "fidx", "ph_hi", "ph_lo",
        F.explode(F.array(*band_exprs)).alias("bkey"),
    )
    a = keys.select(
        F.col(id_col).alias("doc_a"), F.col("fidx").alias("fa"),
        F.col("ph_hi").alias("ha"), F.col("ph_lo").alias("la"), "bkey",
    )
    b_ = keys.select(
        F.col(id_col).alias("doc_b"), F.col("fidx").alias("fb"),
        F.col("ph_hi").alias("hb"), F.col("ph_lo").alias("lb"), "bkey",
    )
    dist = (
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
    )
    fmatch = (
        a.join(b_, "bkey")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(dist <= max_hamming)
        .select("doc_a", "fa", "doc_b", "fb")
        .distinct()
    )
    nf = h.groupBy(F.col(id_col).alias("_d")).agg(
        F.count(F.lit(1)).alias("_nf")
    )
    votes = fmatch.groupBy("doc_a", "doc_b").agg(
        F.countDistinct("fa").alias("matched_a"),
        F.countDistinct("fb").alias("matched_b"),
    )
    return (
        votes.join(nf.select(F.col("_d").alias("doc_a"), F.col("_nf").alias("n_frames_a")), "doc_a")
        .join(nf.select(F.col("_d").alias("doc_b"), F.col("_nf").alias("n_frames_b")), "doc_b")
        .where(
            (F.col("matched_a") >= F.ceil(F.lit(min_vote) * F.col("n_frames_a")))
            & (F.col("matched_b") >= F.ceil(F.lit(min_vote) * F.col("n_frames_b")))
        )
        .select(
            "doc_a", "doc_b",
            F.col("matched_a").cast("bigint").alias("matched_a"),
            F.col("matched_b").cast("bigint").alias("matched_b"),
            F.col("n_frames_a").cast("bigint").alias("n_frames_a"),
            F.col("n_frames_b").cast("bigint").alias("n_frames_b"),
        )
    )


# --- deterministic fixture: planted re-encoded / rescaled / shifted clips ------


def attach_video_payload_dups(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Concatenated-PNG clip payloads for doc_id % 5 == 0 docs, CLIP_FRAMES
    formula frames each, with PLANTED DUPLICATES of doc (doc_id - 10):

      doc_id % 40 == 10  ->  RESCALED re-encode: every frame 2x NN-upscaled
                             (pHash exactly invariant, distance 0).
      doc_id % 40 == 30  ->  FRAME-SHIFTED re-encode: frames 1..CLIP_FRAMES
                             of the source clip (one frame per side
                             unmatched, vote = (N-1)/N).

    Lossless PNG keeps the planted hashes EXACT, so the oracle recomputes
    every frame hash from the pixel formula without decoding."""
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
                if i % 5 != 0:
                    continue
                src = i - 10 if i % 20 == 10 else i
                shift = 1 if i % 40 == 30 else 0
                upscale = i % 40 == 10
                w, h = 8 + src % 24, 8 + src % 16
                parts = []
                for f in range(CLIP_FRAMES):
                    img = formula_image(src, w, h, 3 if src % 4 >= 2 else 1, frame=f + shift)
                    if upscale:
                        img = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
                    parts.append(encode_png(img))
                ids.append(i)
                blobs.append(b"".join(parts))
            yield pd.DataFrame({id_col: ids, "payload": blobs})

    return _distributed_ids(df, id_col).mapInPandas(fn, schema=schema)


# --- DuckDB twins -------------------------------------------------------------


def sql_video_frame_hashes_ctes(ids_rel: str) -> str:
    """CTE chain ending in ``vhashes`` (doc_id, fidx, ph_hi, ph_lo) — every
    frame hash recomputed from the PIXEL FORMULA for the fixture of
    :func:`attach_video_payload_dups` (NN-upscale invariance means the
    rescaled planted clips hash as the SOURCE frames at SOURCE dims, which
    is exactly what the Spark side decodes and samples)."""
    from sarpro_spark.llm.imagehash import phash_basis

    basis_rows = ",\n    ".join(
        f"({u}, {x}, {v})"
        for u, row in enumerate(phash_basis())
        for x, v in enumerate(row)
    )
    luma = (
        "CASE WHEN d.src_id % 4 < 2 "
        "THEN (d.src_id * 31 + d.sframe * 17 + ((r.r * d.h) // 32) * 7 + ((c.c * d.w) // 32) * 13) % 256 "
        "ELSE (299 * ((d.src_id * 31 + d.sframe * 17 + ((r.r * d.h) // 32) * 7 + ((c.c * d.w) // 32) * 13) % 256) "
        "    + 587 * ((d.src_id * 31 + d.sframe * 17 + ((r.r * d.h) // 32) * 7 + ((c.c * d.w) // 32) * 13 + 59) % 256) "
        "    + 114 * ((d.src_id * 31 + d.sframe * 17 + ((r.r * d.h) // 32) * 7 + ((c.c * d.w) // 32) * 13 + 118) % 256)) // 1000 END"
    )
    return f"""
vdocs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 20 = 10 THEN doc_id - 10 ELSE doc_id END AS src_id,
         CASE WHEN doc_id % 40 = 30 THEN 1 ELSE 0 END AS shift
  FROM {ids_rel}
  WHERE doc_id % 5 = 0
),
vframes AS (
  SELECT v.doc_id, v.src_id, f.f AS fidx, f.f + v.shift AS sframe,
         8 + v.src_id % 24 AS w, 8 + v.src_id % 16 AS h
  FROM vdocs v, (SELECT UNNEST(RANGE(0, {CLIP_FRAMES})) AS f) f
),
vgray AS (
  SELECT d.doc_id, d.fidx, r.r, c.c, {luma} AS gray
  FROM vframes d,
       (SELECT UNNEST(RANGE(0, 32)) AS r) r,
       (SELECT UNNEST(RANGE(0, 32)) AS c) c
),
vbasis(u, x, v) AS (VALUES
    {basis_rows}
),
vtmp AS (
  SELECT g.doc_id, g.fidx, b.u, g.c, SUM(g.gray * b.v) AS t
  FROM vgray g JOIN vbasis b ON b.x = g.r
  GROUP BY 1, 2, 3, 4
),
vcoef AS (
  SELECT t.doc_id, t.fidx, t.u, b.u AS v, SUM(t.t * b.v) AS coef
  FROM vtmp t JOIN vbasis b ON b.x = t.c
  GROUP BY 1, 2, 3, 4
),
vthr AS (
  SELECT doc_id, fidx, coef AS thr FROM (
    SELECT doc_id, fidx, coef,
           ROW_NUMBER() OVER (PARTITION BY doc_id, fidx ORDER BY coef, u, v) AS rn
    FROM vcoef
  ) q WHERE rn = 32
),
vhashes AS (
  SELECT c.doc_id, c.fidx,
         BIT_OR(CASE WHEN c.coef > t.thr AND c.u * 8 + c.v >= 32
                THEN 1::BIGINT << CAST(c.u * 8 + c.v - 32 AS INTEGER) ELSE 0 END) AS ph_hi,
         BIT_OR(CASE WHEN c.coef > t.thr AND c.u * 8 + c.v < 32
                THEN 1::BIGINT << CAST(c.u * 8 + c.v AS INTEGER) ELSE 0 END) AS ph_lo
  FROM vcoef c JOIN vthr t USING (doc_id, fidx)
  GROUP BY 1, 2
)""".strip()


def sql_video_neardup_pairs(
    ids_rel: str,
    max_hamming: int = DEFAULT_MAX_HAMMING,
    min_vote: float = DEFAULT_MIN_VOTE,
) -> str:
    """DuckDB twin of frame hashes + :func:`video_neardup_pairs`."""
    ctes = sql_video_frame_hashes_ctes(ids_rel)
    bands = []
    for b in range(8):
        src = "ph_lo" if b < 4 else "ph_hi"
        bands.append(
            f"SELECT doc_id, fidx, ph_hi, ph_lo, "
            f"(({src} >> {(b % 4) * 8}) & 255) | {b << 8} AS bkey FROM vhashes"
        )
    banded = "\n  UNION ALL\n  ".join(bands)
    return f"""
WITH {ctes},
vbanded AS (
  {banded}
),
vfmatch AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.fidx AS fa, b.doc_id AS doc_b, b.fidx AS fb
  FROM vbanded a JOIN vbanded b USING (bkey)
  WHERE a.doc_id < b.doc_id
    AND BIT_COUNT(XOR(a.ph_hi, b.ph_hi)) + BIT_COUNT(XOR(a.ph_lo, b.ph_lo)) <= {max_hamming}
),
vnf AS (SELECT doc_id, COUNT(*) AS nf FROM vhashes GROUP BY 1),
vvote AS (
  SELECT doc_a, doc_b,
         COUNT(DISTINCT fa) AS matched_a, COUNT(DISTINCT fb) AS matched_b
  FROM vfmatch GROUP BY 1, 2
)
SELECT v.doc_a, v.doc_b,
       CAST(v.matched_a AS BIGINT) AS matched_a,
       CAST(v.matched_b AS BIGINT) AS matched_b,
       CAST(na.nf AS BIGINT) AS n_frames_a,
       CAST(nb.nf AS BIGINT) AS n_frames_b
FROM vvote v
JOIN vnf na ON na.doc_id = v.doc_a
JOIN vnf nb ON nb.doc_id = v.doc_b
WHERE v.matched_a >= CEIL({min_vote} * na.nf)
  AND v.matched_b >= CEIL({min_vote} * nb.nf)
""".strip()

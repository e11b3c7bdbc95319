"""Streaming incremental near-dup detection: MinHash-LSH dedup of a document
STREAM against the accumulated corpus state — the streaming twin of
llm/dedup.py's batch `incremental_dedup` (batch vs static index), completing
the dedup family's third temporal mode: batch-vs-batch, batch-vs-index, and
now continuous arrival.

Shape:

1. **Stateless signature stage** (`doc_sig_bands`): per-doc MinHash
   signature + LSH band bucket keys as PURE column expressions — no
   aggregation (streaming queries allow at most one stateful operator, so
   the batch path's explode+groupBy signature builder is re-expressed as
   ``array_min(transform(...))`` over the shingle array; same base hash,
   same permutation coefficients, bit-identical signatures).
2. **One stateful stage** (`streaming_neardup`): groupBy(band, bucket) →
   ``applyInPandasWithState``. State per bucket = the (doc_id, signature)
   list of every doc that has arrived in that bucket. Each arriving doc is
   compared against the state (and earlier docs of the same micro-batch, in
   doc_id order); pairs whose signature agreement >= threshold emit as
   match rows. Every doc then joins the bucket state (arrival order is the
   only order that exists in a stream — dup docs stay in state so later
   arrivals match their nearest predecessor, exactly the batch-twin rule).

Scale contract: state is partitioned by (band, bucket) in Spark's state
store (RocksDB on a cluster) — memory is bounded by (active buckets x
bucket occupancy), and `bucket_cap` drops further arrivals in a
pathologically hot bucket (same cap doctrine as every LSH path; capped
buckets under-report matches, never explode).

Determinism: the verdict is "every unordered pair sharing a band bucket
with agreement >= tau", and match rows are emitted oriented (doc_id=max,
matched_id=min) regardless of which side arrived first (r8) — so an
UNCAPPED drained stream equals the batch twin (`streaming_neardup_batch`)
row-for-row for ANY arrival order, not just doc_id-ordered feeds; this is
what the registered `dedup_streaming_neardup` certificate hashes against
DuckDB. (Under `bucket_cap` pressure arrival order does matter — a capped
bucket keeps whichever docs arrived first; that is the documented
under-report trade-off, not a correctness knob.)

Reference parity note: the reference engine (bogwi/sarpro) has no streaming
surface; this operator exists for SURVEY §2.8's streaming coverage and the
training-data-pipeline extension set.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sarpro_spark.llm.dedup import (
    DEFAULT_SHINGLE,
    MINHASH_PRIME,
    minhash_coeffs,
)

#: 16 hashes / 4 bands / agreement >= 0.75: measured on the documents
#: fixture, est>=0.75 recovers exactly the same 25 pairs the exact-jaccard
#: verified pipeline finds at jaccard>=0.5, while 8 hashes at est>=0.5 was
#: 150x over-triggered (signature-estimate noise) — state is signatures,
#: not shingle sets, so the estimate IS the verifier in streaming.
DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4
DEFAULT_THRESHOLD = 0.75
DEFAULT_BUCKET_CAP = 4096


def doc_sig_bands(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(id, band, bucket, sig array<long>) per doc — streaming-safe (a
    stateless Arrow block kernel; mapInPandas is legal in streams).

    r12 rework (verdict item 7): the column-expression form evaluated the
    per-shingle md5 and all k permutations as INTERPRETED higher-order
    lambdas plus an O(len^2) per-position substring scan — the signature
    stage dominated the stream-stream line and pinned its 10x soak ratio
    at vs_linear 0.95. The kernel is the identical hash chain (md5-prefix
    base mod the minhash prime, k affine permutations, array mins, band
    buckets = md5 of the '|'-joined signature slice — every value
    bit-equal, oracle re-certified), vectorized: one hashlib md5 per
    shingle, numpy for the k permutations and mins. Docs shorter than
    the shingle width drop (no shingles — matching the batch builder).
    """
    from typing import Iterator as _Iterator

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("band", IntegerType()),
            StructField("bucket", StringType()),
            StructField("sig", ArrayType(LongType())),
        ]
    )
    coeffs = minhash_coeffs(num_hashes)
    rows_per_band = num_hashes // bands

    def fn(batches: _Iterator) -> _Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        A = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
        B = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]
        for pdf in batches:
            ids, bnds, bkts, sigs_out = [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) < n:
                    continue
                t = text.lower()
                hs = np.fromiter(
                    (
                        int(hashlib.md5(t[p:p + n].encode("utf-8")).hexdigest()[:15], 16)
                        % MINHASH_PRIME
                        for p in range(len(t) - n + 1)
                    ),
                    dtype=np.int64,
                )
                sig = ((A * hs[None, :] + B) % MINHASH_PRIME).min(axis=1)
                sig_list = [int(x) for x in sig]
                for b in range(bands):
                    chunk = sig_list[b * rows_per_band:(b + 1) * rows_per_band]
                    bucket = hashlib.md5("|".join(map(str, chunk)).encode()).hexdigest()
                    ids.append(int(i))
                    bnds.append(b)
                    bkts.append(bucket)
                    sigs_out.append(sig_list)
            yield pd.DataFrame(
                {id_col: ids, "band": bnds, "bucket": bkts, "sig": sigs_out}
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(fn, schema=schema)


MATCH_SCHEMA = StructType(
    [
        StructField("band", IntegerType()),
        StructField("bucket", StringType()),
        StructField("doc_id", LongType()),
        StructField("matched_id", LongType()),
        StructField("est_sim", DoubleType()),
        # r9 (ADVICE r8): the batch-twin equivalence certificate only holds
        # for UNCAPPED buckets (a capped bucket keeps whichever docs arrived
        # first — order-dependent by construction). Surfacing the bucket's
        # capped status on every emitted row lets certificate runs assert
        # no bucket was capped instead of assuming it.
        StructField("capped", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("sigs", ArrayType(LongType())),  # flattened, num_hashes per doc
        StructField("capped", BooleanType()),
    ]
)


def _make_update(num_hashes: int, threshold: float, bucket_cap: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - eviction policy hook
            state.remove()
            return
        ids, flat, capped = state.get if state.exists else ([], [], False)
        ids, flat = list(ids), list(flat)
        out_doc, out_match, out_sim, out_capped = [], [], [], []
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
        for _, row in batch.iterrows():
            sig = [int(v) for v in row["sig"]]
            did = int(row["doc_id"])
            for j, prev_id in enumerate(ids):
                prev = flat[j * num_hashes : (j + 1) * num_hashes]
                agree = sum(1 for x, y in zip(sig, prev) if x == y)
                est = agree / float(num_hashes)
                if est >= threshold:
                    # orientation-insensitive emission (r8, ADVICE r7): the
                    # pair is always (max_id, min_id) so a doc arriving
                    # AFTER a higher-id neighbor (out-of-order micro-batch)
                    # emits the same row the batch twin produces — drained
                    # stream == batch twin for ANY arrival order, not just
                    # id-ordered feeds
                    out_doc.append(max(did, prev_id))
                    out_match.append(min(did, prev_id))
                    out_sim.append(est)
                    # bucket's capped status AS OF this emission (r9): a
                    # True here taints the batch-twin equivalence for this
                    # bucket, a run with all-False rows certifies it
                    out_capped.append(capped)
            if len(ids) < bucket_cap:
                ids.append(did)
                flat.extend(sig)
            else:
                capped = True
        state.update((ids, flat, capped))
        yield pd.DataFrame(
            {
                "band": pd.array([key[0]] * len(out_doc), dtype="int32"),
                "bucket": [key[1]] * len(out_doc),
                "doc_id": pd.array(out_doc, dtype="int64"),
                "matched_id": pd.array(out_match, dtype="int64"),
                "est_sim": pd.array(out_sim, dtype="float64"),
                "capped": pd.array(out_capped, dtype="boolean"),
            }
        )

    return update


def streaming_neardup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = DEFAULT_THRESHOLD,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Streaming (or batch — the plan works in both) incremental near-dup:
    emits one match row per (band, neighbor) hit, oriented as
    (doc_id=max, matched_id=min) regardless of which side arrived first —
    so an uncapped drained stream emits EXACTLY the batch-twin row set for
    ANY arrival order (r8; previously id-ordered arrival was a
    precondition). Per-doc verdicts are a downstream grouping of the match
    rows (see :func:`neardup_verdicts_from_matches`)."""
    sb = doc_sig_bands(docs, id_col, text_col, n, num_hashes, bands)
    if id_col != "doc_id":
        sb = sb.withColumnRenamed(id_col, "doc_id")
    return sb.groupBy("band", "bucket").applyInPandasWithState(
        _make_update(num_hashes, threshold, bucket_cap),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_neardup_batch(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Batch twin: the exact rows a drained uncapped stream emits — pairs
    (band, bucket, doc_id, matched_id, est_sim) with matched_id < doc_id
    sharing the band bucket and signature agreement >= threshold. Pure
    DataFrame ops (self-join on the band keys), trivially SQL-twinnable."""
    sb = doc_sig_bands(docs, id_col, text_col, n, num_hashes, bands)
    a = sb.select(
        "band", "bucket", F.col(id_col).alias("matched_id"), F.col("sig").alias("sig_a")
    )
    b = sb.select(
        "band", "bucket", F.col(id_col).alias("doc_id"), F.col("sig").alias("sig_b")
    )
    agree = None
    for i in range(num_hashes):
        term = F.when(
            F.element_at("sig_a", i + 1) == F.element_at("sig_b", i + 1), 1
        ).otherwise(0)
        agree = term if agree is None else agree + term
    est = agree.cast("double") / F.lit(float(num_hashes))
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("matched_id") < F.col("doc_id"))
        .select(
            "band", "bucket", "doc_id", "matched_id", est.alias("est_sim"),
            # the twin is uncapped by definition; the stream emits the same
            # False on every row when no bucket hits bucket_cap (r9)
            F.lit(False).alias("capped"),
        )
        .where(F.col("est_sim") >= threshold)
    )


def neardup_verdicts_from_matches(matches: DataFrame, all_ids: DataFrame) -> DataFrame:
    """Per-doc verdict from match rows: (doc_id, is_dup, first_match,
    n_earlier_matches). ``all_ids`` supplies the clean docs (no match rows);
    first_match = the smallest earlier partner, dedup'd across bands."""
    pairs = matches.select("doc_id", "matched_id").distinct()
    agg = pairs.groupBy("doc_id").agg(
        F.min("matched_id").alias("first_match"),
        F.count(F.lit(1)).alias("n_earlier_matches"),
    )
    return (
        all_ids.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("first_match").isNotNull().alias("is_dup"),
            "first_match",
            F.coalesce("n_earlier_matches", F.lit(0)).alias("n_earlier_matches"),
        )
    )


# --- r9: stream-stream near-dup (two live streams) ---------------------------
# Completes the dedup temporal matrix's last cell: batch-vs-batch,
# batch-vs-index, stream-vs-corpus (above), and now STREAM-vs-STREAM —
# e.g. a crawl stream deduped against a live ingest stream. Spark allows
# one stateful operator per query, so the two streams are UNIONED with a
# side tag and ONE applyInPandasWithState keyed (band, bucket) holds BOTH
# sides' signature lists; each arriving doc matches only the OPPOSITE
# side's accumulated state (plus opposite-side rows earlier in the same
# micro-batch), so every cross pair emits exactly once — when its later
# member arrives — oriented (a_id, b_id) independent of arrival order.

STREAM2_MATCH_SCHEMA = StructType(
    [
        StructField("band", IntegerType()),
        StructField("bucket", StringType()),
        StructField("a_id", LongType()),
        StructField("b_id", LongType()),
        StructField("est_sim", DoubleType()),
        StructField("capped", BooleanType()),
    ]
)

_STATE2_SCHEMA = StructType(
    [
        StructField("a_ids", ArrayType(LongType())),
        StructField("a_sigs", ArrayType(LongType())),  # flattened
        StructField("b_ids", ArrayType(LongType())),
        StructField("b_sigs", ArrayType(LongType())),
        StructField("capped", BooleanType()),
    ]
)


def _make_update2(num_hashes: int, threshold: float, bucket_cap: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - eviction policy hook
            state.remove()
            return
        a_ids, a_flat, b_ids, b_flat, capped = (
            state.get if state.exists else ([], [], [], [], False)
        )
        a_ids, a_flat = list(a_ids), list(a_flat)
        b_ids, b_flat = list(b_ids), list(b_flat)
        sides = {"a": (a_ids, a_flat), "b": (b_ids, b_flat)}
        out_a, out_b, out_sim, out_capped = [], [], [], []
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
        for _, row in batch.iterrows():
            sig = [int(v) for v in row["sig"]]
            did = int(row["doc_id"])
            side = str(row["side"])
            other_ids, other_flat = sides["b" if side == "a" else "a"]
            for j, prev_id in enumerate(other_ids):
                prev = other_flat[j * num_hashes : (j + 1) * num_hashes]
                agree = sum(1 for x, y in zip(sig, prev) if x == y)
                est = agree / float(num_hashes)
                if est >= threshold:
                    # fixed (a_id, b_id) orientation: the pair's identity,
                    # not its arrival order (same doctrine as the r8
                    # single-stream max/min orientation)
                    out_a.append(did if side == "a" else prev_id)
                    out_b.append(prev_id if side == "a" else did)
                    out_sim.append(est)
                    out_capped.append(capped)
            own_ids, own_flat = sides[side]
            if len(own_ids) < bucket_cap:
                own_ids.append(did)
                own_flat.extend(sig)
            else:
                capped = True
        state.update((a_ids, a_flat, b_ids, b_flat, capped))
        yield pd.DataFrame(
            {
                "band": pd.array([key[0]] * len(out_a), dtype="int32"),
                "bucket": [key[1]] * len(out_a),
                "a_id": pd.array(out_a, dtype="int64"),
                "b_id": pd.array(out_b, dtype="int64"),
                "est_sim": pd.array(out_sim, dtype="float64"),
                "capped": pd.array(out_capped, dtype="boolean"),
            }
        )

    return update


def stream_stream_neardup(
    a_docs: DataFrame,
    b_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = DEFAULT_THRESHOLD,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Near-dup matches ACROSS two document streams: one row per
    (band, cross-pair) hit, oriented (a_id, b_id) for any arrival order —
    an uncapped drained run emits exactly
    :func:`stream_stream_neardup_batch`'s row set. Both inputs may be
    streaming (the union carries a side tag through the stateless
    signature stage into the single stateful operator)."""
    tagged = None
    for side, docs in (("a", a_docs), ("b", b_docs)):
        sb = doc_sig_bands(docs, id_col, text_col, n, num_hashes, bands)
        if id_col != "doc_id":
            sb = sb.withColumnRenamed(id_col, "doc_id")
        part = sb.select("band", "bucket", "doc_id", "sig", F.lit(side).alias("side"))
        tagged = part if tagged is None else tagged.unionByName(part)
    return tagged.groupBy("band", "bucket").applyInPandasWithState(
        _make_update2(num_hashes, threshold, bucket_cap),
        outputStructType=STREAM2_MATCH_SCHEMA,
        stateStructType=_STATE2_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_neardup_batch(
    a_docs: DataFrame,
    b_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Batch twin: every cross pair (a_id, b_id) sharing a band bucket with
    signature agreement >= threshold — the rows an uncapped drained
    two-stream run emits for ANY interleaving of the two arrivals."""
    a = doc_sig_bands(a_docs, id_col, text_col, n, num_hashes, bands).select(
        "band", "bucket", F.col(id_col).alias("a_id"), F.col("sig").alias("sig_a")
    )
    b = doc_sig_bands(b_docs, id_col, text_col, n, num_hashes, bands).select(
        "band", "bucket", F.col(id_col).alias("b_id"), F.col("sig").alias("sig_b")
    )
    agree = None
    for i in range(num_hashes):
        term = F.when(
            F.element_at("sig_a", i + 1) == F.element_at("sig_b", i + 1), 1
        ).otherwise(0)
        agree = term if agree is None else agree + term
    est = agree.cast("double") / F.lit(float(num_hashes))
    return (
        a.join(b, ["band", "bucket"])
        .select(
            "band", "bucket", "a_id", "b_id", est.alias("est_sim"),
            F.lit(False).alias("capped"),
        )
        .where(F.col("est_sim") >= threshold)
    )

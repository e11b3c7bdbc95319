"""Multimodal columns: opaque binary payloads + typed metadata, with
decode/feature plumbing as Arrow-batched pandas kernels.

Design (the part that matters at 100 TB): media lives as a ``binary`` column
with a typed metadata struct alongside (mime, width, height, n_bytes). Scans
prune metadata-only queries to the struct columns (parquet column pruning);
the payload column is only materialized inside ``mapInPandas`` stages, batch
by batch, never on the driver. Real decoders (PIL/ffmpeg) are absent in this
environment, so decode is STUBBED: ``decode_features`` computes deterministic
byte-level features (a stand-in with the same schema/batch shape), and
``decode_image``/``sample_frames`` raise NotImplementedError behind an
import-try. The Spark-side plumbing — schema, partitioning, UDF signature,
batch shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a media-like binary column + typed metadata struct from the
    documents table (deterministic: payload = utf-8 bytes of text)."""
    payload = F.encode(F.col(text_col), "utf-8")
    n_bytes = F.octet_length(F.col(text_col))
    # deterministic fake media metadata derived from the id
    width = (F.col(id_col) % 64 + 16).cast("int")
    height = (F.col(id_col) % 48 + 16).cast("int")
    mime = F.when(F.col(id_col) % 3 == 0, "image/png").when(
        F.col(id_col) % 3 == 1, "audio/wav"
    ).otherwise("video/mp4")
    meta = F.struct(
        mime.alias("mime"),
        width.alias("width"),
        height.alias("height"),
        n_bytes.alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def decode_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """STUB decode: deterministic byte-level features standing in for an image
    decode + feature extraction. Real pipeline swaps the kernel body for
    PIL/torchvision; the mapInPandas contract (Arrow batches in, feature
    frame out, payload never leaves the executor) is identical."""
    from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", IntegerType()),
            StructField("byte_mean", DoubleType()),
            StructField("byte_std", DoubleType()),
            StructField("byte_entropy", DoubleType()),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        for pdf in batches:
            ids, nb, mean, std, ent = [], [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                ids.append(i)
                n = arr.size
                nb.append(n)
                if n == 0:
                    mean.append(0.0), std.append(0.0), ent.append(0.0)
                    continue
                # exact integer moments first, float ops last — the identical
                # IEEE sequence the SQL oracle states, so mean/std are
                # bit-reproducible regardless of summation order
                s1 = int(arr.sum(dtype=np.int64))
                s2 = int((arr.astype(np.int64) ** 2).sum())
                m = s1 / n
                mean.append(m)
                std.append(math.sqrt(max(s2 / n - m * m, 0.0)))
                counts = np.bincount(arr, minlength=256)
                c = counts[counts > 0].astype(np.float64)
                # entropy = log2(n) - (sum c*log2 c)/n (same algebraic form as
                # the oracle; residual cross-libm/sum-order noise << fround)
                ent.append(math.log2(n) - float((c * np.log2(c)).sum()) / n)
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "byte_mean": mean, "byte_std": std, "byte_entropy": ent}
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real image decode. STUB: requires Pillow (absent here)."""
    try:
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("image decode requires Pillow (not in this environment)") from e
    raise NotImplementedError("decode_image intentionally unimplemented in round 1")


def sample_frames(payload: bytes, every_n: int = 30):  # pragma: no cover - stub
    """Video frame sampling. STUB: requires an ffmpeg binding (absent here)."""
    raise NotImplementedError("frame sampling requires ffmpeg bindings (not in this environment)")

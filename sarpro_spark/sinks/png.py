"""Pure-stdlib PNG codec (8-bit grayscale / RGB / RGBA, non-interlaced).

Companion to the in-repo TIFF (:mod:`sarpro_spark.sinks.tiff`) and baseline
JPEG (:mod:`sarpro_spark.sinks.jpeg`) codecs: the reference delegates all
raster encode/decode to GDAL (/root/reference/src/io/gdal.rs:107-141); here
each format is implemented directly so executor-side kernels can decode
binary media columns with zero native dependencies. PNG is the LOSSLESS leg
of the multimodal decode path — decoded pixels are bit-exact, so a DuckDB
oracle can verify the full inflate+unfilter pipeline against a closed-form
pixel formula (see queries_llm.multimodal_decode_features).

Format per the W3C PNG spec (public): 8-byte signature; chunked layout
(IHDR / IDAT+ / IEND) with CRC-32; IDAT = zlib-deflated scanlines, each
prefixed by a filter byte (0=None 1=Sub 2=Up 3=Average 4=Paeth).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type -> channel count (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    body = tag + payload
    return struct.pack(">I", len(payload)) + body + struct.pack(">I", zlib.crc32(body))


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode uint8 (rows, cols), (rows, cols, 3) or (rows, cols, 4) to PNG
    bytes (filter 0 on every scanline — simplicity over ratio; zlib does the
    heavy lifting and decode correctness is what the pipeline certifies)."""
    if arr.dtype != np.uint8:
        raise ValueError("PNG input must be uint8")
    if arr.ndim == 2:
        color_type, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError("expected (rows, cols[, 3|4]) uint8")
    rows, cols = arr.shape[:2]
    flat = arr.reshape(rows, cols * channels)
    # one filter byte (0) per scanline, then raw samples
    raw = b"".join(b"\x00" + flat[r].tobytes() for r in range(rows))
    ihdr = struct.pack(">IIBBBBB", cols, rows, 8, color_type, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def parse_png_header(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from the IHDR chunk — the
    metadata-only fast path (no inflate)."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR":
        raise ValueError("first chunk is not IHDR")
    cols, rows, depth, color_type = struct.unpack(">IIBB", data[16:26])
    return cols, rows, depth, color_type


def decode_png(data: bytes) -> np.ndarray:
    """Decode 8-bit non-interlaced gray/RGB/RGBA PNG (all 5 scanline filters).
    Returns uint8 (rows, cols) or (rows, cols, channels)."""
    cols, rows, depth, color_type = parse_png_header(data)
    if depth != 8:
        raise NotImplementedError("only 8-bit PNG supported")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"color type {color_type} not supported")
    interlace = data[28]
    if interlace:
        raise NotImplementedError("interlaced PNG not supported")
    channels = _CHANNELS[color_type]

    idat = bytearray()
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8:pos + 8 + length]
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))

    stride = cols * channels
    bpp = channels  # bytes per complete pixel at 8-bit depth
    out = np.zeros((rows, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for r in range(rows):
        ftype = raw[p]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p + 1).astype(np.int32)
        p += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    if channels == 1:
        return out.reshape(rows, cols)
    return out.reshape(rows, cols, channels)

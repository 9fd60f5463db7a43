"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as parquet ``binary``
columns next to typed metadata, and runs decode / feature-extract /
resize / frame-sample as Arrow-batched Python stages (``mapInPandas``).
This module implements that plumbing for real — schema, partitioning,
UDF signatures, batch iteration. IMAGE decode is real too:
:func:`parse_image_header` reads dimensions + bit depth straight from
PNG/JPEG/GIF/BMP header bytes (public file-format specs, stdlib only
— no PIL), surfaced as the :func:`image_dims` operator with a DuckDB
round-trip oracle. Only the audio/video codec step remains STUBBED:
those need soundfile/ffmpeg, absent from this container, so
``decode_media`` raises ``NotImplementedError`` for non-image kinds
and tests exercise that path through :func:`fake_decode`, a
deterministic pure-bytes stand-in.

Swap-in point for production: replace ``fake_decode`` with a real
pixel/sample decoder (PIL/ffmpeg) inside the same ``mapInPandas``
functions — the Spark-side plan is unchanged.

Scale notes:
- ``mapInPandas`` streams Arrow record batches; peak executor memory is
  one batch of payloads, not one partition — cap
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are MBs.
- All stages are narrow (no shuffle): media rows never co-locate by key;
  only the tiny per-media feature rows ever shuffle downstream.
- Payload columns are pruned unless referenced: metadata-only queries
  (``media_stats``) read just the meta struct from parquet.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy_proxy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def decode_media(payload: bytes, kind: str, codec: str) -> Any:
    """Media decode dispatch. Images decode for REAL — stdlib header
    parsing via :func:`parse_image_header` (PNG IHDR / JPEG SOF / GIF
    screen descriptor / BMP info header), no PIL required. Audio and
    video remain the stubbed path: their codecs (wav is feasible but
    the synthetic payloads aren't wav; h264 needs ffmpeg) are not in
    this container — production swaps this branch for soundfile /
    ffmpeg inside the same mapInPandas worker."""
    if kind == "image":
        return parse_image_header(payload)
    if kind == "audio" and codec == "wav":
        return parse_wav(payload)
    if kind == "video" and codec == "mp4":
        return parse_mp4(payload)          # container metadata decode
    raise NotImplementedError(
        f"no codec libraries in this environment (kind={kind}, codec={codec}); "
        "tests use fake_decode"
    )


# JPEG frame-header (SOFn) markers that carry precision/height/width —
# all of C0-CF except DHT (C4), JPG (C8) and DAC (CC), per ITU T.81
# Table B.1.
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes):
    """Real stdlib image decode: (format, width, height, bit_depth)
    from the first bytes of PNG / JPEG / GIF / BMP payloads, or
    (None, None, None, None) for anything unrecognized/truncated.
    Pure bytes → deterministic cross-engine, so a DuckDB oracle can
    countersign a synthesize→parse round trip exactly.

    Formats (public file-format specs, no codec library needed):

    * PNG: 8-byte signature, then the IHDR chunk (must be first, per
      the spec): width/height uint32 BE at offsets 16/20, bit depth
      (bits per sample) at 24.
    * GIF (87a/89a): logical screen descriptor — width/height uint16
      LE at offsets 6/8; colour-resolution bits = ((packed>>4)&7)+1
      at offset 10.
    * BMP: 'BM' + 14-byte file header, then BITMAPINFOHEADER: width
      int32 LE at 18, height int32 LE at 22 (negative = top-down →
      abs), bits-per-pixel uint16 LE at 28.
    * JPEG: walk FF-marker segments from offset 2 until a SOFn frame
      header (precision uint8, height/width uint16 BE); standalone
      markers (RST/TEM) have no length field and are skipped.
    """
    n = len(payload)
    if n >= 29 and payload[:8] == b"\x89PNG\r\n\x1a\n" \
            and payload[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
            payload[24],
        )
    if n >= 13 and payload[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
            ((payload[10] >> 4) & 0x7) + 1,
        )
    if n >= 30 and payload[:2] == b"BM" \
            and int.from_bytes(payload[14:18], "little") >= 40:
        return (
            "bmp",
            abs(int.from_bytes(payload[18:22], "little", signed=True)),
            abs(int.from_bytes(payload[22:26], "little", signed=True)),
            int.from_bytes(payload[28:30], "little"),
        )
    if n >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= n and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker == 0xFF:      # fill byte before a marker
                i += 1
                continue
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 <= n:
                    return (
                        "jpeg",
                        int.from_bytes(payload[i + 7:i + 9], "big"),
                        int.from_bytes(payload[i + 5:i + 7], "big"),
                        payload[i + 4],
                    )
                break
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:
                i += 2              # standalone marker, no length
                continue
            i += 2 + int.from_bytes(payload[i + 2:i + 4], "big")
    return (None, None, None, None)


def parse_wav(payload: bytes):
    """Real stdlib AUDIO decode: a PCM WAV payload parsed end to end —
    RIFF/WAVE container walk, ``fmt `` chunk fields, and the ``data``
    chunk's actual int16 samples (not just the header). Returns
    ``(channels, sample_rate, bits, n_frames, duration_ms, sum_abs,
    peak)`` or an all-None tuple for unrecognized/truncated/non-PCM16
    payloads. Pure bytes + integer arithmetic → deterministic
    cross-engine, so a DuckDB oracle can recompute the sample stats
    from the synthesis recurrence exactly.

    Container layout (public RIFF/WAVE spec): 'RIFF' + u32 size +
    'WAVE', then chunks of ('id', u32 size, body) — ``fmt `` carries
    (audio_format u16 =1 for PCM, channels u16, sample_rate u32,
    byte_rate u32, block_align u16, bits u16); ``data`` carries the
    interleaved samples. duration_ms = n_frames·1000 DIV sample_rate
    (integer floor, matching SQL DIV)."""
    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return (None,) * 7
    i = 12
    fmt_fields = data = None
    while i + 8 <= n:
        cid = payload[i:i + 4]
        size = int.from_bytes(payload[i + 4:i + 8], "little")
        body = payload[i + 8:i + 8 + size]
        if len(body) < size:
            return (None,) * 7          # truncated chunk
        if cid == b"fmt " and size >= 16:
            fmt_fields = (
                int.from_bytes(body[0:2], "little"),    # audio format
                int.from_bytes(body[2:4], "little"),    # channels
                int.from_bytes(body[4:8], "little"),    # sample rate
                int.from_bytes(body[14:16], "little"),  # bits
            )
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)      # chunks are word-aligned
    if fmt_fields is None or data is None:
        return (None,) * 7
    afmt, channels, rate, bits = fmt_fields
    if afmt != 1 or bits != 16 or channels < 1 or rate < 1:
        return (None,) * 7              # PCM16 only in this container
    n_samples = len(data) // 2
    samples = [
        int.from_bytes(data[2 * j:2 * j + 2], "little", signed=True)
        for j in range(n_samples)
    ]
    n_frames = n_samples // channels
    return (
        channels, rate, bits, n_frames,
        n_frames * 1000 // rate,
        sum(abs(s) for s in samples),
        max((abs(s) for s in samples), default=0),
    )


def decode_png_pixels(payload: bytes):
    """FULL stdlib PNG decode — not just the header: chunk walk with
    CRC-32 verification, IDAT concatenation, zlib inflate, and
    scanline UNFILTERING (all five PNG filter types: None/Sub/Up/
    Average/Paeth, per the PNG spec's reconstruction functions).
    Supports non-interlaced 8-bit greyscale (colour type 0) and
    truecolour (type 2) — the shapes :func:`encode_png` produces.
    Returns ``(width, height, channels, pixels)`` with *pixels* the
    row-major interleaved bytes, or ``None`` for anything truncated,
    CRC-corrupt, interlaced, or outside the supported shapes.

    Everything is stdlib (``zlib`` ships inflate + crc32); the pixel
    bytes are exact, so a DuckDB oracle can recompute aggregate pixel
    statistics from a synthesis recurrence bit-for-bit."""
    import zlib

    n = len(payload)
    if n < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i = 8
    idat = b""
    w = h = ct = None
    saw_iend = False
    while i + 12 <= n:
        ln = int.from_bytes(payload[i:i + 4], "big")
        cid = payload[i + 4:i + 8]
        if i + 12 + ln > n:
            return None                      # truncated chunk
        body = payload[i + 8:i + 8 + ln]
        crc = int.from_bytes(payload[i + 8 + ln:i + 12 + ln], "big")
        if zlib.crc32(cid + body) & 0xFFFFFFFF != crc:
            return None                      # corrupt chunk
        if cid == b"IHDR":
            if ln != 13:
                return None
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            bit_depth, ct = body[8], body[9]
            if bit_depth != 8 or ct not in (0, 2) or body[12] != 0:
                return None                  # unsupported shape
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            saw_iend = True
            break
        i += 12 + ln
    if w is None or not idat or not saw_iend:
        return None                      # IEND is mandatory per spec
    ch = 3 if ct == 2 else 1
    stride = w * ch
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    if len(raw) != h * (1 + stride):
        return None
    # Two bit-identical unfilter bodies. The numpy one exists for
    # production-sized scanlines (None/Up fully vectorized, Sub an
    # exact per-channel cumsum-mod-256, Average/Paeth a per-PIXEL loop
    # with channel-vector steps — the left dependency makes a full
    # vectorization impossible by construction); per-line array
    # overhead makes it SLOWER than plain byte loops on the tiny
    # synthetic payloads, so it engages only when stride is wide
    # enough to amortize (measured crossover ~64-128B; see
    # BENCH_SCALING.md large-image A/B and the bit-equality pin in
    # tests/test_multimodal.py). Production codec frames still go to
    # PIL/libpng — this narrows that caveat to codec frames only.
    if stride >= _NUMPY_UNFILTER_MIN_STRIDE:
        try:
            return _unfilter_numpy(raw, w, h, ch, stride)
        except ImportError:
            pass
    out = bytearray()
    prev = bytearray(stride)
    for r in range(h):
        base = r * (1 + stride)
        ft = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if ft == 1:      # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ft == 2:    # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:    # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + (a + prev[x]) // 2) & 0xFF
        elif ft == 4:    # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif ft != 0:
            return None
        out += line
        prev = line
    return (w, h, ch, bytes(out))


# crossover where per-line numpy array overhead is amortized by the
# vectorized None/Up/Sub rows (measured A/B in BENCH_SCALING.md:
# 0.95× at 192B strides, 1.15× at 384B, 1.37× at 3KB; the synthetic
# corpus strides are ≤48B and stay on the byte-loop path)
_NUMPY_UNFILTER_MIN_STRIDE = 256


def _unfilter_numpy(raw: bytes, w: int, h: int, ch: int, stride: int):
    """Hybrid numpy unfilter, bit-identical to the byte-loop path
    (pinned in tests): integer arithmetic only, mod-256 applied
    exactly where the spec's reconstruction functions apply it.

    What vectorizes EXACTLY vectorizes fully: None (copy), Up (one
    vector add — prev row is already reconstructed), Sub (a
    per-channel prefix sum, exact because mod 256 distributes over
    cumsum). Average/Paeth have a hard left dependency (recon[x-ch]
    feeds recon[x]) with non-linear steps (floor-half, min-predictor)
    — no exact scan exists, and an A/B showed ch-wide numpy steps run
    ~10× SLOWER than plain byte ops (per-tiny-array overhead), so
    those rows keep the byte loop, reading the previous row as
    ``bytes`` for cheap scalar indexing. Real-world photographic PNGs
    are Up/Paeth-heavy; the synthetic corpus cycles row %% 5 so 3/5 of
    rows ride the vector path."""
    import numpy as np

    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    fts = arr[:, 0]
    if (fts > 4).any():
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev_b = bytes(stride)               # previous row for byte loops
    prev_np = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        ft = fts[r]
        if ft == 0:      # None
            out[r] = arr[r, 1:]
        elif ft == 2:    # Up
            out[r] = (arr[r, 1:].astype(np.int64) + prev_np) & 0xFF
        elif ft == 1:    # Sub: per-channel prefix sum mod 256
            out[r] = (np.cumsum(
                arr[r, 1:].astype(np.int64).reshape(-1, ch), axis=0)
                & 0xFF).reshape(stride)
        else:            # Average / Paeth: exact-sequential byte loop
            line = bytearray(arr[r, 1:].tobytes())
            if ft == 3:
                for x in range(stride):
                    a = line[x - ch] if x >= ch else 0
                    line[x] = (line[x] + (a + prev_b[x]) // 2) & 0xFF
            else:
                for x in range(stride):
                    a = line[x - ch] if x >= ch else 0
                    b = prev_b[x]
                    c = prev_b[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    line[x] = (line[x] + pr) & 0xFF
            out[r] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev_b = out[r].tobytes()
        prev_np = out[r].astype(np.int64)
    return (w, h, ch, out.tobytes())


def encode_png(width: int, height: int, pixels: bytes,
               channels: int = 3) -> bytes:
    """Build a real, fully-conformant PNG (synthesis half of the
    pixel-decode round trip): IHDR/IDAT/IEND with correct CRCs,
    zlib-compressed scanlines, and the FILTER TYPE CYCLING row % 5 —
    every row is forward-filtered (Sub/Up/Average/Paeth per spec)
    before compression, so the decoder's unfiltering of all five
    types is genuinely exercised on every image taller than 4 rows."""
    import zlib

    ch = channels
    stride = width * ch
    assert len(pixels) == height * stride

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (len(body).to_bytes(4, "big") + cid + body
                + (zlib.crc32(cid + body) & 0xFFFFFFFF)
                .to_bytes(4, "big"))

    ihdr = (width.to_bytes(4, "big") + height.to_bytes(4, "big")
            + bytes([8, 2 if ch == 3 else 0, 0, 0, 0]))
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = pixels[r * stride:(r + 1) * stride]
        ft = r % 5
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:    # Sub
            raw += bytes(
                (line[x] - (line[x - ch] if x >= ch else 0)) & 0xFF
                for x in range(stride))
        elif ft == 2:    # Up
            raw += bytes((line[x] - prev[x]) & 0xFF
                         for x in range(stride))
        elif ft == 3:    # Average
            raw += bytes(
                (line[x] - ((line[x - ch] if x >= ch else 0)
                            + prev[x]) // 2) & 0xFF
                for x in range(stride))
        else:            # Paeth
            flt = bytearray()
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                flt.append((line[x] - pr) & 0xFF)
            raw += flt
        prev = line
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def decode_gif_pixels(payload: bytes):
    """FULL stdlib GIF decode — not just the logical screen
    descriptor: global color table read, extension blocks skipped,
    image descriptor parsed, and the LZW-compressed index stream
    DECOMPRESSED (variable-width codes, LSB-first bit packing,
    clear/EOI handling, the KwKwK code==next case, and the giflib
    code-width rule: the width counter advances per code READ, which
    is what keeps a decoder in sync with an encoder that assigns one
    table entry per code written — pinned against a hand-computed
    spec vector in tests). Returns ``(width, height, palette,
    indices)`` with *palette* a list of (r, g, b) and *indices* the
    row-major palette indices, or ``None`` for anything truncated,
    out-of-range-coded, interlaced, or outside the shapes
    :func:`encode_gif` produces (single image, global table only,
    no transparency)."""
    n = len(payload)
    if n < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    if not packed & 0x80:
        return None                      # need a global color table
    ps = 2 << (packed & 0x7)
    i = 13
    if i + 3 * ps > n:
        return None
    palette = [(payload[i + 3 * j], payload[i + 3 * j + 1],
                payload[i + 3 * j + 2]) for j in range(ps)]
    i += 3 * ps
    # skip extension blocks (0x21 label, then sub-blocks)
    while i < n and payload[i] == 0x21:
        i += 2
        while i < n and payload[i] != 0:
            i += 1 + payload[i]
        i += 1
    if i + 10 > n or payload[i] != 0x2C:
        return None                      # image descriptor required
    iw = int.from_bytes(payload[i + 5:i + 7], "little")
    ih = int.from_bytes(payload[i + 7:i + 9], "little")
    ipacked = payload[i + 9]
    if ipacked & 0xC0:
        return None                      # local table/interlace: out of scope
    if (iw, ih) != (w, h):
        return None
    i += 10
    if i >= n:
        return None
    mcs = payload[i]
    if not 2 <= mcs <= 8:
        return None
    i += 1
    data = bytearray()                   # concatenate sub-blocks
    while True:
        if i >= n:
            return None                  # truncated before terminator
        ln = payload[i]
        i += 1
        if ln == 0:
            break
        if i + ln > n:
            return None
        data += payload[i:i + ln]
        i += ln
    if i >= n or payload[i] != 0x3B:
        return None                      # trailer required

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = [bytes([j]) for j in range(1 << mcs)] + [b"", b""]
    bits = mcs + 1
    counter = eoi + 1                    # giflib RunningCode
    acc = nbits = pos = 0
    prev = None
    out = bytearray()
    while True:
        while nbits < bits:
            if pos >= len(data):
                return None              # ran out mid-stream
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << bits) - 1)
        acc >>= bits
        nbits -= bits
        if code == eoi:
            break
        if code == clear:
            table = table[:eoi + 1]
            bits = mcs + 1
            counter = eoi + 1
            prev = None
            continue
        # width counter advances per code read (giflib sync rule)
        counter += 1
        if prev is None:
            if code >= len(table):
                return None
            out += table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):     # KwKwK
                entry = table[prev] + table[prev][:1]
            else:
                return None              # corrupt code
            out += entry
            table.append(table[prev] + entry[:1])
        if counter > (1 << bits) and bits < 12:
            bits += 1
        prev = code
    if len(out) != w * h:
        return None
    return (w, h, palette, bytes(out))


def encode_gif(width: int, height: int, indices: bytes,
               palette: list) -> bytes:
    """Build a real, fully-conformant GIF89a (synthesis half of the
    pixel-decode round trip): logical screen descriptor + global
    color table + image descriptor + a genuine variable-width LZW
    stream (dictionary growth, width bumps on the giflib counter
    rule, clear-on-full at 4095, LSB-first packing, 255-byte
    sub-blocks) + trailer. *palette* length must be a power of two
    in [4, 256]; *indices* are row-major, one byte per pixel."""
    ps = len(palette)
    mcs = max(2, (ps - 1).bit_length())
    if ps != 1 << mcs or not all(0 <= ix < ps for ix in indices):
        raise ValueError("palette must be a power of two >= 4 and "
                         "cover every index")
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    codes = []                           # (code, bits) pairs
    bits = mcs + 1
    counter = eoi + 1                    # next assignable

    def emit(c):
        nonlocal bits
        codes.append((c, bits))
        # giflib EGifCompressOutput: check AFTER writing, with the
        # entry for this code not yet assigned
        if counter >= (1 << bits) and bits < 12:
            bits += 1

    emit(clear)
    table = {}
    w_seq = indices[:1]
    for k in indices[1:]:
        wk = w_seq + bytes([k])
        if wk in table:
            w_seq = wk
            continue
        emit(table[w_seq] if len(w_seq) > 1 else w_seq[0])
        if counter < 4095:
            table[wk] = counter
            counter += 1
        else:                            # table full: clear + restart
            emit(clear)
            table = {}
            bits = mcs + 1
            counter = eoi + 1
        w_seq = bytes([k])
    if w_seq:
        emit(table[w_seq] if len(w_seq) > 1 else w_seq[0])
    emit(eoi)

    acc = nbits = 0
    packed = bytearray()
    for c, b in codes:
        acc |= c << nbits
        nbits += b
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | ((mcs - 1) << 4) | (mcs - 1))
    out += b"\x00\x00"                   # background, aspect
    for r, g, b in palette:
        out += bytes((r, g, b))
    out += b"\x2c\x00\x00\x00\x00"
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0)                        # no local table, sequential
    out.append(mcs)
    for j in range(0, len(packed), 255):
        block = packed[j:j + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def parse_mp4(payload: bytes):
    """Real stdlib VIDEO-CONTAINER decode: an ISO BMFF (MP4) box walk
    — ``ftyp`` gate, recursive descent into ``moov``, ``mvhd`` v0
    (timescale + duration), and every ``trak``'s ``tkhd`` v0 (track
    id, 16.16 fixed-point width/height). Returns ``(major_brand,
    duration_ms, n_tracks, width, height)`` — width/height from the
    first track with nonzero dimensions (the video track; audio
    tracks carry 0×0) — or an all-None tuple for unrecognized/
    truncated payloads. duration_ms = duration·1000 DIV timescale.

    This is container METADATA decode (what a pipeline needs for
    routing/stats); frame decode stays behind the ``decode_media``
    codec gate — that genuinely needs ffmpeg."""
    n = len(payload)

    def boxes(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(payload[i:i + 4], "big")
            if size < 8 or i + size > hi:
                return          # malformed/truncated — stop scanning
            yield payload[i + 4:i + 8], i + 8, i + size
            i += size

    top = {}
    brand = None
    for btype, lo, hi in boxes(0, n):
        if btype == b"ftyp" and brand is None:
            if hi - lo < 8:
                return (None,) * 5
            brand = payload[lo:lo + 4].decode("ascii", "replace")
        top.setdefault(btype, (lo, hi))
    if brand is None or b"moov" not in top:
        return (None,) * 5
    duration_ms = None
    tracks = []
    mlo, mhi = top[b"moov"]
    for btype, lo, hi in boxes(mlo, mhi):
        if btype == b"mvhd" and hi - lo >= 20 and payload[lo] == 0:
            timescale = int.from_bytes(payload[lo + 12:lo + 16], "big")
            duration = int.from_bytes(payload[lo + 16:lo + 20], "big")
            if timescale:
                duration_ms = duration * 1000 // timescale
        elif btype == b"trak":
            for ttype, tlo, thi in boxes(lo, hi):
                if ttype == b"tkhd" and thi - tlo >= 84 \
                        and payload[tlo] == 0:
                    w = int.from_bytes(
                        payload[thi - 8:thi - 4], "big") >> 16
                    h = int.from_bytes(
                        payload[thi - 4:thi], "big") >> 16
                    tracks.append((w, h))
    if duration_ms is None:
        return (None,) * 5
    vdims = next(((w, h) for w, h in tracks if w and h), (None, None))
    return (brand, duration_ms, len(tracks), vdims[0], vdims[1])


def encode_mp4(brand: str, timescale: int, duration: int,
               tracks: list[tuple[int, int]]) -> bytes:
    """Build a minimal spec-shaped ISO BMFF file (synthesis half of
    the container round trip): ftyp + moov(mvhd v0 + one trak/tkhd v0
    per (width, height) — 0×0 marks a non-video track) + an empty
    mdat. Dimensions are stored 16.16 fixed-point as the spec
    requires."""

    def box(btype: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    mvhd = box(b"mvhd", bytes(4)                      # v0 + flags
               + bytes(8)                             # ctime/mtime
               + timescale.to_bytes(4, "big")
               + duration.to_bytes(4, "big")
               + bytes(80))                           # rate…matrix…
    traks = b""
    for tid, (w, h) in enumerate(tracks, start=1):
        tkhd = box(b"tkhd", bytes(4) + bytes(8)
                   + tid.to_bytes(4, "big") + bytes(4)
                   + duration.to_bytes(4, "big")
                   + bytes(52)                        # reserved…matrix
                   + (w << 16).to_bytes(4, "big")
                   + (h << 16).to_bytes(4, "big"))
        traks += box(b"trak", tkhd)
    return (box(b"ftyp", brand.encode("ascii") + bytes(4)
                + brand.encode("ascii"))
            + box(b"moov", mvhd + traks)
            + box(b"mdat", b""))


def encode_wav(channels: int, sample_rate: int,
               samples: list[int]) -> bytes:
    """Build a real PCM16 WAV file (synthesis half of the audio
    round-trip oracle): RIFF/WAVE container, canonical ``fmt `` chunk,
    ``data`` chunk of int16 LE *samples* (interleaved, length must be
    a multiple of *channels*)."""
    data = b"".join(
        int(s).to_bytes(2, "little", signed=True) for s in samples)
    block_align = channels * 2
    fmt_body = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (16).to_bytes(2, "little"))
    chunks = (b"fmt " + (16).to_bytes(4, "little") + fmt_body
              + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") \
        + b"WAVE" + chunks


def encode_image_header(fmt: str, width: int, height: int,
                        bit_depth: int) -> bytes:
    """Build a REAL, spec-conformant image header for *fmt* with the
    given dimensions (synthesis half of the round-trip oracle; also
    the shape a test fixture uses). The payload is a valid file
    prefix — signature + dimension-bearing header — not pixel data."""
    if fmt == "png":
        ihdr = (width.to_bytes(4, "big") + height.to_bytes(4, "big")
                + bytes([bit_depth, 2, 0, 0, 0]))   # truecolor
        return (b"\x89PNG\r\n\x1a\n"
                + (13).to_bytes(4, "big") + b"IHDR" + ihdr
                + b"\x00\x00\x00\x00")              # CRC placeholder
    if fmt == "gif":
        packed = 0x80 | (((bit_depth - 1) & 0x7) << 4) | 0x07
        return (b"GIF89a"
                + width.to_bytes(2, "little")
                + height.to_bytes(2, "little")
                + bytes([packed, 0, 0]))
    if fmt == "bmp":
        info = ((40).to_bytes(4, "little")
                + width.to_bytes(4, "little", signed=True)
                + height.to_bytes(4, "little", signed=True)
                + (1).to_bytes(2, "little")
                + bit_depth.to_bytes(2, "little")
                + bytes(24))
        return (b"BM" + (14 + 40).to_bytes(4, "little")
                + bytes(4) + (14 + 40).to_bytes(4, "little") + info)
    if fmt == "jpeg":
        app0 = (b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
                + b"\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00")
        sof0 = (b"\xff\xc0" + (17).to_bytes(2, "big")
                + bytes([bit_depth])
                + height.to_bytes(2, "big") + width.to_bytes(2, "big")
                + bytes([3,
                         1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    raise ValueError(f"unknown format {fmt!r}")


def fake_decode(payload: bytes, n_dims: int = 8) -> list[float]:
    """Deterministic stand-in for decode+embed: sha256 of the payload
    chopped into *n_dims* floats in [0, 1). Pure bytes → reproducible
    across runs, workers, and engines."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / float(1 << 32)
        for i in range(n_dims)
    ]


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (test input;
    payload = sha256-stretched pseudo-bytes, sized per kind)."""
    rows = []
    for i in range(n):
        kind = MEDIA_KINDS[i % len(MEDIA_KINDS)]
        blob = b""
        state = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        size = 256 + (i % 7) * 128
        while len(blob) < size:
            state = hashlib.sha256(state).digest()
            blob += state
        meta = {
            "width": 64 + i % 4 * 32 if kind == "image" else None,
            "height": 64 + i % 3 * 32 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 + i * 10 if kind in ("audio", "video") else None,
            "codec": {"image": "png", "audio": "wav", "video": "h264"}[kind],
        }
        rows.append((i, kind, blob[:size], meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, n_dims: int = 8) -> DataFrame:
    """Per-media feature extraction via Arrow-batched ``mapInPandas``.

    Emits cheap byte statistics plus the fake embedding; in production
    the body calls the real decoder, the plan stays identical."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "byte_mean": payloads.map(
                        lambda b: sum(b) / len(b) if len(b) else 0.0
                    ),
                    # distinct-byte ratio: crude entropy proxy without
                    # numpy histograms per row
                    "byte_entropy_proxy": payloads.map(
                        lambda b: len(set(b)) / 256.0
                    ),
                    "feature": payloads.map(lambda b: fake_decode(b, n_dims)),
                }
            )
            yield out

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


IMAGE_DIMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("bit_depth", T.LongType()),
    ]
)

IMAGE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _corpus_image_spec(doc_id: int):
    """Deterministic (format, width, height, bit_depth) for a doc id —
    the arithmetic contract shared with the DuckDB oracle (every term
    is integer mod/index math so SQL reproduces it exactly). Returns
    None for the planted-corrupt ids (doc_id % 23 == 0): those get a
    truncated payload the parser must reject."""
    if doc_id % 23 == 0:
        return None
    fmt = ("png", "jpeg", "gif", "bmp")[doc_id % 4]
    width = 16 + (doc_id * 7) % 2033
    height = 16 + (doc_id * 13) % 1525
    if fmt == "png":
        bit_depth = 8 if doc_id % 2 == 0 else 16
    elif fmt == "jpeg":
        bit_depth = 8
    elif fmt == "gif":
        bit_depth = (doc_id % 8) + 1
    else:
        bit_depth = (1, 4, 8, 24, 32)[doc_id % 5]
    return fmt, width, height, bit_depth


def synthesize_corpus_images(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """One REAL image payload per document id: spec-conformant
    PNG/JPEG/GIF/BMP header bytes (format and dimensions derived from
    the id by `_corpus_image_spec`'s integer arithmetic), with a
    planted truncated payload every 23rd id. Arrow `mapInPandas`
    over the pruned id column — this is the synthesis half of the
    encode→parse round trip that `multimodal_image_dims`'s DuckDB
    oracle countersigns arithmetically."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                spec = _corpus_image_spec(int(doc_id))
                if spec is None:
                    payloads.append(b"\x89PNG\r\n")    # truncated sig
                else:
                    payloads.append(encode_image_header(*spec))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


GIF_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("palette_size", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("max_index", T.LongType()),
    ]
)


def _corpus_gif_spec(doc_id: int):
    """Deterministic (width, height, palette_size) per doc id — the
    arithmetic contract shared with the DuckDB oracle. Palette entry
    i is ((i·41+7)%256, (i·59+3)%256, (i·83+11)%256); pixel index p
    (row-major, 0-based) is (doc_id·5 + p·7 + 3) mod palette_size.
    None for the planted-corrupt ids (doc_id % 31 == 0): those get a
    valid GIF TRUNCATED mid-stream, which the decoder must reject
    (GIF has no CRC — truncation is the honest corruption analog)."""
    if doc_id % 31 == 0:
        return None
    return (3 + doc_id % 9, 2 + doc_id % 7, 4 << (doc_id % 3))


def _gif_palette(ps: int):
    return [((i * 41 + 7) % 256, (i * 59 + 3) % 256,
             (i * 83 + 11) % 256) for i in range(ps)]


def synthesize_corpus_gifs(docs, id_col: str = "doc_id"):
    """One REAL fully-conformant GIF89a per document id (LZW stream
    with genuine dictionary growth and width bumps, indices/palette
    from `_corpus_gif_spec`'s recurrence). The planted-corrupt ids
    get a valid gif with its last 4 bytes cut — mid-stream
    truncation the decoder's structural checks must catch."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                spec = _corpus_gif_spec(doc_id)
                if spec is None:
                    good = encode_gif(3, 2, bytes(
                        (doc_id + p) % 4 for p in range(6)),
                        _gif_palette(4))
                    payloads.append(good[:-4])
                    continue
                w, h, ps = spec
                idx = bytes((doc_id * 5 + p * 7 + 3) % ps
                            for p in range(w * h))
                payloads.append(encode_gif(w, h, idx, _gif_palette(ps)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def gif_pixel_stats(media, id_col: str = "doc_id",
                    payload_col: str = "payload"):
    """FULL GIF decode over a binary column: LZW-decompress the index
    stream (:func:`decode_gif_pixels`) and aggregate palette-mapped
    RGB sums + the peak index per row. NULLs for undecodable
    payloads. Arrow-batched `mapInPandas`, narrow, zero shuffles —
    the same 100-TB posture as the PNG decode stage."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = {k: [] for k in ("width", "height", "n_pixels",
                                    "palette_size", "sum_r", "sum_g",
                                    "sum_b", "max_index")}
            for p in pdf[payload_col]:
                dec = decode_gif_pixels(p)
                if dec is None:
                    for k in cols:
                        cols[k].append(None)
                    continue
                w, h, palette, idx = dec
                cols["width"].append(w)
                cols["height"].append(h)
                cols["n_pixels"].append(w * h)
                cols["palette_size"].append(len(palette))
                for c, k in enumerate(("sum_r", "sum_g", "sum_b")):
                    cols[k].append(sum(palette[i][c] for i in idx))
                cols["max_index"].append(max(idx))
            out = {"doc_id": pdf[id_col].astype("int64")}
            for k, v in cols.items():
                out[k] = pd.array(v, dtype="Int64")
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, GIF_STATS_SCHEMA)


def _corpus_png_spec(doc_id: int):
    """Deterministic (width, height) per doc id — the arithmetic
    contract shared with the DuckDB oracle. Interleaved RGB byte p
    (0-based) is ``(doc_id·7 + p·11 + 13) mod 256``. height ≥ 5 so
    the row % 5 filter cycling exercises every PNG filter type on
    every image. None for the planted-corrupt ids (doc_id % 29 == 0):
    those get a CRC-flipped payload the decoder must reject."""
    if doc_id % 29 == 0:
        return None
    return (4 + doc_id % 13, 5 + doc_id % 11)


def synthesize_corpus_pngs(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """One REAL fully-conformant RGB PNG per document id (pixels from
    `_corpus_png_spec`'s recurrence, all five filters cycled). The
    planted-corrupt ids get a VALID png with one CRC byte flipped —
    the decoder's integrity check, not just its length check, must
    catch it."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                spec = _corpus_png_spec(doc_id)
                if spec is None:
                    good = encode_png(3, 5, bytes(
                        (doc_id + p) % 256 for p in range(45)))
                    bad = bytearray(good)
                    bad[-5] ^= 0xFF       # inside IEND's CRC
                    payloads.append(bytes(bad))
                    continue
                w, h = spec
                pix = bytes((doc_id * 7 + p * 11 + 13) % 256
                            for p in range(w * h * 3))
                payloads.append(encode_png(w, h, pix))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def png_pixel_stats(media: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """FULL image decode over a binary column: inflate + unfilter the
    PNG pixel data (:func:`decode_png_pixels`) and aggregate it —
    per-channel byte sums and peak — per row. NULLs for undecodable
    payloads. Arrow-batched `mapInPandas`, narrow."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("width", "height", "n_pixels",
                                    "sum_r", "sum_g", "sum_b", "peak")}
            for p in pdf[payload_col]:
                dec = decode_png_pixels(p)
                if dec is None or dec[2] != 3:
                    for k in rows:
                        rows[k].append(None)
                    continue
                w, h, _, pix = dec
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                for c, k in enumerate(("sum_r", "sum_g", "sum_b")):
                    rows[k].append(sum(pix[c::3]))
                rows["peak"].append(max(pix))
            out = {"doc_id": pdf[id_col].astype("int64")}
            for k, v in rows.items():
                out[k] = pd.array(v, dtype="Int64")
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, PNG_STATS_SCHEMA)


MP4_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("brand", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)

_MP4_BRANDS = ("isom", "mp42", "avc1")
_MP4_TIMESCALES = (600, 1000, 90000)


def _corpus_mp4_spec(doc_id: int):
    """Deterministic (brand, timescale, duration_units, tracks) per
    doc id — the arithmetic contract shared with the DuckDB oracle.
    Odd ids carry a leading 0×0 (audio) track before the video track.
    None for the planted-corrupt ids (doc_id % 31 == 0): those get a
    truncated container the parser must reject."""
    if doc_id % 31 == 0:
        return None
    i3 = doc_id % 3
    video = (160 + (doc_id * 3) % 1761, 90 + (doc_id * 5) % 991)
    tracks = ([(0, 0), video] if doc_id % 2 == 1 else [video])
    return (_MP4_BRANDS[i3], _MP4_TIMESCALES[i3],
            1000 + doc_id * 37, tracks)


def synthesize_corpus_mp4s(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """One minimal spec-shaped ISO BMFF payload per document id
    (`_corpus_mp4_spec`), truncated mid-moov every 31st id."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                spec = _corpus_mp4_spec(doc_id)
                if spec is None:
                    good = encode_mp4("isom", 600, 1200, [(64, 64)])
                    payloads.append(good[:30])       # mid-moov cut
                    continue
                brand, ts, dur, tracks = spec
                payloads.append(encode_mp4(brand, ts, dur, tracks))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def mp4_meta(media: DataFrame, id_col: str = "doc_id",
             payload_col: str = "payload") -> DataFrame:
    """REAL video-container decode over a binary column: per row,
    (brand, duration_ms, n_tracks, width, height) via
    :func:`parse_mp4` — NULLs for unrecognized/truncated payloads.
    Arrow-batched `mapInPandas`, narrow."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_mp4(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "brand": [p[0] for p in parsed],
                    "duration_ms": pd.array([p[1] for p in parsed],
                                            dtype="Int64"),
                    "n_tracks": pd.array([p[2] for p in parsed],
                                         dtype="Int64"),
                    "width": pd.array([p[3] for p in parsed],
                                      dtype="Int64"),
                    "height": pd.array([p[4] for p in parsed],
                                       dtype="Int64"),
                }
            )

    return media.mapInPandas(_batches, MP4_META_SCHEMA)


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("bits", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)

_WAV_RATES = (8000, 16000, 22050, 44100)


def _corpus_wav_spec(doc_id: int):
    """Deterministic (channels, sample_rate, n_frames) per doc id —
    the arithmetic contract shared with the DuckDB oracle. Sample j
    (interleaved, 0-based) is ``((doc_id·31 + j·17 + 7) mod 65536) −
    32768`` — pure positive-operand integer mod, identical in SQL.
    None for the planted-corrupt ids (doc_id % 19 == 0): those get a
    truncated container the parser must reject."""
    if doc_id % 19 == 0:
        return None
    return (1 + doc_id % 2, _WAV_RATES[doc_id % 4], 32 + doc_id % 33)


def synthesize_corpus_wavs(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """One REAL PCM16 WAV payload per document id (spec from
    `_corpus_wav_spec`), truncated container every 19th id — the
    synthesis half of the encode→parse audio round trip."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                spec = _corpus_wav_spec(doc_id)
                if spec is None:
                    payloads.append(b"RIFF\x00\x00")
                    continue
                channels, rate, n_frames = spec
                samples = [
                    ((doc_id * 31 + j * 17 + 7) % 65536) - 32768
                    for j in range(n_frames * channels)
                ]
                payloads.append(encode_wav(channels, rate, samples))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def wav_stats(media: DataFrame, id_col: str = "doc_id",
              payload_col: str = "payload") -> DataFrame:
    """REAL audio decode over a binary column: per row, container
    fields AND actual int16 sample statistics via :func:`parse_wav`
    — NULLs for unrecognized/truncated/non-PCM16 payloads. Arrow-
    batched `mapInPandas`, narrow (zero shuffles)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("channels", "sample_rate", "bits", "n_frames",
                "duration_ms", "sum_abs", "peak")
        for pdf in it:
            parsed = [parse_wav(p) for p in pdf[payload_col]]
            out = {"doc_id": pdf[id_col].astype("int64")}
            for ci, cname in enumerate(cols):
                out[cname] = pd.array([p[ci] for p in parsed],
                                      dtype="Int64")
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, WAV_STATS_SCHEMA)


def image_dims(media: DataFrame, id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """REAL image metadata decode over a binary column: per row,
    (format, width, height, bit_depth) via the stdlib header parser
    :func:`parse_image_header` — NULLs for unrecognized or truncated
    payloads. Arrow-batched `mapInPandas`, narrow (zero shuffles);
    payloads stream through one Arrow batch at a time, so peak
    executor memory is a batch of headers, not a partition of
    images."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_image_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed],
                                      dtype="Int64"),
                    "height": pd.array([p[2] for p in parsed],
                                       dtype="Int64"),
                    "bit_depth": pd.array([p[3] for p in parsed],
                                          dtype="Int64"),
                }
            )

    return media.mapInPandas(_batches, IMAGE_DIMS_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 128, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads: emit every *every_n_bytes*
    chunk as a pseudo-frame (production: ffmpeg keyframe extraction in
    the same mapInPandas body). One input row fans out to ≤max_frames
    output rows — mapInPandas handles 1→N natively."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                for fi in range(max_frames):
                    start = fi * every_n_bytes
                    if start >= len(payload):
                        break
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes(payload[start : start + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return media.mapInPandas(_batches, FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize plumbing: passes payloads through the Arrow path and
    updates the metadata struct; the pixel transform itself would live
    where ``decode_media`` is called. Kept JVM-side except the payload
    identity map — demonstrates meta-struct rewrite without shuffles."""
    return media.withColumn(
        "meta",
        F.when(
            F.col("kind") == "image",
            F.struct(
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.col("meta.sample_rate").alias("sample_rate"),
                F.col("meta.duration_ms").alias("duration_ms"),
                F.col("meta.codec").alias("codec"),
            ),
        ).otherwise(F.col("meta")),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind rollup over metadata + payload length. ``length()`` on a
    binary column reads the value but keeps the agg JVM-side; for a
    strictly metadata-only scan drop ``avg_bytes`` and the payload
    column is pruned from the parquet read."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.length("payload")).alias("avg_bytes"),
            F.avg("meta.duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )


# ---------------------------------------------------------------------------
# BMP: full pixel decode (BITMAPINFOHEADER, BI_RGB, 8-bit palettized and
# 24-bit truecolor, both row orders). Third raster format with REAL pixel
# decode after PNG and GIF — BMP is the one Windows-lineage format a
# scraped-web corpus always contains, and its bottom-up default row order
# is exactly the decode subtlety a "just read the bytes" pipeline gets
# wrong (the first_r column exists to catch that: byte sums are
# orientation-invariant, the top-left pixel is not).
# Public spec: Windows BITMAPFILEHEADER/BITMAPINFOHEADER (MSDN), same
# public-knowledge basis as encode_image_header's BMP branch above.
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, pixels_rgb: bytes,
               top_down: bool = False, palette=None,
               indices: bytes | None = None) -> bytes:
    """Build a REAL, spec-conformant BMP. Two modes:

    * 24-bit BI_RGB: *pixels_rgb* = row-major top-down RGB bytes
      (stored as BGR, rows padded to 4 bytes).
    * 8-bit palettized: *palette* = list of (r, g, b), *indices* =
      row-major top-down index bytes.

    ``top_down=False`` stores rows bottom-up with positive biHeight
    (the BMP default); ``top_down=True`` stores them in image order
    with NEGATIVE biHeight — both forms are valid and the decoder
    must handle both."""
    if palette is not None:
        bpp, n_colors = 8, len(palette)
        stride = (width + 3) & ~3
        rows = [indices[r * width:(r + 1) * width].ljust(stride, b"\0")
                for r in range(height)]
        pal_bytes = b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
    else:
        bpp, n_colors = 24, 0
        stride = (width * 3 + 3) & ~3
        rows = []
        for r in range(height):
            row = bytearray()
            for c in range(width):
                p = (r * width + c) * 3
                row += bytes((pixels_rgb[p + 2], pixels_rgb[p + 1],
                              pixels_rgb[p]))          # RGB -> BGR
            rows.append(bytes(row).ljust(stride, b"\0"))
        pal_bytes = b""
    if not top_down:
        rows = rows[::-1]
    data = b"".join(rows)
    offset = 14 + 40 + len(pal_bytes)
    bi_height = -height if top_down else height
    info = ((40).to_bytes(4, "little")
            + width.to_bytes(4, "little", signed=True)
            + bi_height.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + bpp.to_bytes(2, "little")
            + (0).to_bytes(4, "little")                # BI_RGB
            + len(data).to_bytes(4, "little")
            + (2835).to_bytes(4, "little")
            + (2835).to_bytes(4, "little")
            + n_colors.to_bytes(4, "little")
            + (0).to_bytes(4, "little"))
    header = (b"BM" + (offset + len(data)).to_bytes(4, "little")
              + bytes(4) + offset.to_bytes(4, "little"))
    return header + info + pal_bytes + data


def decode_bmp_pixels(payload: bytes):
    """FULL BMP decode: header walk + palette load + row reorder.
    Returns ``(width, height, bpp, rgb)`` with *rgb* the row-major
    TOP-DOWN interleaved RGB bytes (bottom-up storage is reordered,
    8-bit indices are palette-mapped), or None if the payload is not
    a decodable BI_RGB 8/24-bit BMP — including a pixel array shorter
    than the header promises (BMP has no CRC; the length check is the
    honest integrity gate, same stance as the GIF truncation check)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    offset = int.from_bytes(payload[10:14], "little")
    if int.from_bytes(payload[14:18], "little") != 40:
        return None                                    # not BITMAPINFOHEADER
    width = int.from_bytes(payload[18:22], "little", signed=True)
    bi_height = int.from_bytes(payload[22:26], "little", signed=True)
    planes = int.from_bytes(payload[26:28], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    n_colors = int.from_bytes(payload[46:50], "little")
    if (width <= 0 or bi_height == 0 or planes != 1
            or compression != 0 or bpp not in (8, 24)):
        return None
    height, top_down = abs(bi_height), bi_height < 0
    if bpp == 8:
        if n_colors == 0:
            n_colors = 256
        pal_off = 54
        if len(payload) < pal_off + 4 * n_colors:
            return None
        palette = [
            (payload[pal_off + 4 * i + 2], payload[pal_off + 4 * i + 1],
             payload[pal_off + 4 * i])                 # BGRx -> (r, g, b)
            for i in range(n_colors)]
        stride = (width + 3) & ~3
    else:
        palette = None
        stride = (width * 3 + 3) & ~3
    if len(payload) < offset + stride * height:
        return None                                    # truncated pixel array
    rgb = bytearray()
    for r in range(height):
        src = r if top_down else height - 1 - r
        row = payload[offset + src * stride:
                      offset + src * stride + stride]
        if bpp == 8:
            for c in range(width):
                ix = row[c]
                if ix >= len(palette):
                    return None                        # index out of palette
                rgb += bytes(palette[ix])
        else:
            for c in range(width):
                rgb += bytes((row[c * 3 + 2], row[c * 3 + 1],
                              row[c * 3]))             # BGR -> RGB
    return width, height, bpp, bytes(rgb)


BMP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("bpp", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("first_r", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def _corpus_bmp_spec(doc_id: int):
    """Deterministic (width, height, bpp, top_down) per doc id — the
    arithmetic contract shared with the DuckDB oracle. 24-bit pixel p
    (row-major TOP-DOWN image order): r = (doc_id·3 + p·7 + 1) % 256,
    g = (doc_id·5 + p·11 + 2) % 256, b = (doc_id·7 + p·13 + 3) % 256.
    8-bit (doc_id % 3 == 0): 16-entry palette i ↦ ((i·19+5)%256,
    (i·37+9)%256, (i·53+13)%256), index p = (doc_id + p·3) % 16.
    Odd ids store TOP-DOWN (negative height), even ids bottom-up —
    the sums are orientation-invariant but first_r is not, so a
    decoder that ignores row order fails parity. None for the
    planted-corrupt ids (doc_id % 27 == 0): a valid BMP with its
    last 3 pixel bytes cut, which the length gate must reject."""
    if doc_id % 27 == 0:
        return None
    return (2 + doc_id % 9, 1 + doc_id % 6,
            8 if doc_id % 3 == 0 else 24, doc_id % 2 == 1)


def _bmp_palette():
    return [((i * 19 + 5) % 256, (i * 37 + 9) % 256,
             (i * 53 + 13) % 256) for i in range(16)]


def synthesize_corpus_bmps(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """One REAL BMP per document id (mode/dimensions/pixels from
    `_corpus_bmp_spec`'s recurrence, 8-bit palettized and 24-bit
    truecolor alternating, BOTH row orders exercised). The planted-
    corrupt ids get a valid BMP with its last 3 bytes cut — the pixel
    array ends short of what the header promises."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                spec = _corpus_bmp_spec(doc_id)
                if spec is None:
                    pix = bytes((doc_id + p) % 256 for p in range(18))
                    payloads.append(encode_bmp(2, 3, pix)[:-3])
                    continue
                w, h, bpp, top_down = spec
                if bpp == 8:
                    idx = bytes((doc_id + p * 3) % 16
                                for p in range(w * h))
                    payloads.append(encode_bmp(
                        w, h, b"", top_down=top_down,
                        palette=_bmp_palette(), indices=idx))
                else:
                    pix = bytearray()
                    for p in range(w * h):
                        pix += bytes(((doc_id * 3 + p * 7 + 1) % 256,
                                      (doc_id * 5 + p * 11 + 2) % 256,
                                      (doc_id * 7 + p * 13 + 3) % 256))
                    payloads.append(encode_bmp(w, h, bytes(pix),
                                               top_down=top_down))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def bmp_pixel_stats(media: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """FULL BMP decode over a binary column (:func:`decode_bmp_pixels`)
    aggregated per row: per-channel sums, the TOP-LEFT pixel's red
    (orientation witness) and the peak channel byte. NULLs for
    undecodable payloads. Arrow-batched `mapInPandas`, narrow, zero
    shuffles — the same 100-TB posture as the PNG/GIF decode stages."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = ("width", "height", "n_pixels", "bpp", "sum_r",
                    "sum_g", "sum_b", "first_r", "peak")
            rows = {k: [] for k in cols}
            for p in pdf[payload_col]:
                dec = decode_bmp_pixels(p)
                if dec is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                w, h, bpp, rgb = dec
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["bpp"].append(bpp)
                for c, k in enumerate(("sum_r", "sum_g", "sum_b")):
                    rows[k].append(sum(rgb[c::3]))
                rows["first_r"].append(rgb[0])
                rows["peak"].append(max(rgb))
            out = {"doc_id": pdf[id_col].astype("int64")}
            for k, v in rows.items():
                out[k] = pd.array(v, dtype="Int64")
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, BMP_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# TIFF: REAL metadata decode via the IFD chain walk — the one mainstream
# image container that is BYTE-ORDER POLYMORPHIC (II little-endian and MM
# big-endian files are equally valid), and the one whose page count is a
# linked-list traversal rather than a header field. Public spec: TIFF 6.0
# (Adobe, 1992). Sibling of parse_mp4's box walk: container metadata a
# routing/stats pipeline needs, with pixel codecs (LZW/JPEG-in-TIFF)
# correctly out of scope behind the codec gate.
# ---------------------------------------------------------------------------

_TIFF_MAX_PAGES = 64      # cycle/self-link guard for the IFD chain walk


def encode_tiff(pages, endian: str = "II") -> bytes:
    """Build a REAL multi-page TIFF: 8-byte header + one IFD per
    (width, height, bits) page, chained by next-IFD offsets. Each IFD
    carries ImageWidth(256, LONG), ImageLength(257, LONG),
    BitsPerSample(258, SHORT), Compression(259, SHORT, =1 none) and
    PhotometricInterpretation(262, SHORT, =1) — all values inline
    (left-justified in the 4-byte value field per the spec)."""
    bo = "little" if endian == "II" else "big"

    def _entry(tag, typ, value):
        # type 3 = SHORT (2 bytes, left-justified), 4 = LONG
        v = (value.to_bytes(2, bo) + b"\0\0" if typ == 3
             else value.to_bytes(4, bo))
        return (tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
                + (1).to_bytes(4, bo) + v)

    ifds = []
    off = 8
    offsets = []
    for w, h, bits in pages:
        entries = [_entry(256, 4, w), _entry(257, 4, h),
                   _entry(258, 3, bits), _entry(259, 3, 1),
                   _entry(262, 3, 1)]
        body = (len(entries).to_bytes(2, bo) + b"".join(entries))
        offsets.append(off)
        ifds.append(body)
        off += len(body) + 4
    out = bytearray()
    out += (b"II" if endian == "II" else b"MM")
    out += (42).to_bytes(2, bo)
    out += (offsets[0] if offsets else 0).to_bytes(4, bo)
    for i, body in enumerate(ifds):
        out += body
        nxt = offsets[i + 1] if i + 1 < len(offsets) else 0
        out += nxt.to_bytes(4, bo)
    return bytes(out)


def parse_tiff(payload: bytes):
    """REAL TIFF metadata decode: detect byte order, verify the magic,
    walk the IFD chain collecting (width, height, bits) per page.
    Returns ``(endian, [(w, h, bits), ...])`` or None for anything
    structurally broken — bad magic, an IFD offset outside the file,
    a truncated entry table, a missing dimension tag, or a chain
    longer than the cycle guard (a self-linking IFD must not hang a
    worker)."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        return None
    endian = payload[:2].decode()
    bo = "little" if endian == "II" else "big"
    if int.from_bytes(payload[2:4], bo) != 42:
        return None
    off = int.from_bytes(payload[4:8], bo)
    pages = []
    while off != 0:
        if len(pages) >= _TIFF_MAX_PAGES:
            return None
        if off + 2 > len(payload):
            return None
        n = int.from_bytes(payload[off:off + 2], bo)
        end = off + 2 + 12 * n
        if end + 4 > len(payload):
            return None
        w = h = bits = None
        for i in range(n):
            e = off + 2 + 12 * i
            tag = int.from_bytes(payload[e:e + 2], bo)
            typ = int.from_bytes(payload[e + 2:e + 4], bo)
            if typ == 3:
                val = int.from_bytes(payload[e + 8:e + 10], bo)
            else:
                val = int.from_bytes(payload[e + 8:e + 12], bo)
            if tag == 256:
                w = val
            elif tag == 257:
                h = val
            elif tag == 258:
                bits = val
        if w is None or h is None or bits is None:
            return None
        pages.append((w, h, bits))
        off = int.from_bytes(payload[end:end + 4], bo)
    if not pages:
        return None
    return endian, pages


TIFF_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("endian", T.StringType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("bits", T.LongType()),
        T.StructField("total_pixels", T.LongType()),
    ]
)


def _corpus_tiff_spec(doc_id: int):
    """Deterministic (endian, n_pages, bits) per doc id — the
    arithmetic contract shared with the DuckDB oracle. Page k has
    width 8 + (doc_id·5 + k·7) % 120 and height
    4 + (doc_id·3 + k·11) % 80. None for the planted-corrupt ids
    (doc_id % 37 == 0): those get a valid TIFF whose first-IFD offset
    points past EOF — the bounds check, not just the signature check,
    must catch it."""
    if doc_id % 37 == 0:
        return None
    return ("II" if doc_id % 2 == 0 else "MM",
            1 + doc_id % 3, (8, 16, 32)[doc_id % 3])


def synthesize_corpus_tiffs(docs: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """One REAL multi-page TIFF per document id (endianness flips per
    id, page dims from `_corpus_tiff_spec`'s recurrence). The planted-
    corrupt ids get a structurally valid header whose first IFD
    offset points beyond the file."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                spec = _corpus_tiff_spec(doc_id)
                if spec is None:
                    good = bytearray(encode_tiff([(8, 4, 8)], "II"))
                    good[4:8] = (len(good) + 100).to_bytes(4, "little")
                    payloads.append(bytes(good))
                    continue
                endian, n_pages, bits = spec
                pages = [(8 + (doc_id * 5 + k * 7) % 120,
                          4 + (doc_id * 3 + k * 11) % 80, bits)
                         for k in range(n_pages)]
                payloads.append(encode_tiff(pages, endian))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def tiff_meta(media: DataFrame, id_col: str = "doc_id",
              payload_col: str = "payload") -> DataFrame:
    """TIFF metadata card over a binary column (:func:`parse_tiff`):
    byte order, page count from the IFD chain walk, first-page dims +
    bit depth, total pixels across pages. NULLs for undecodable
    payloads. Arrow-batched `mapInPandas`, narrow, zero shuffles."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            endians = []
            rows = {k: [] for k in ("n_pages", "width", "height",
                                    "bits", "total_pixels")}
            for p in pdf[payload_col]:
                dec = parse_tiff(p)
                if dec is None:
                    endians.append(None)
                    for k in rows:
                        rows[k].append(None)
                    continue
                endian, pages = dec
                endians.append(endian)
                rows["n_pages"].append(len(pages))
                rows["width"].append(pages[0][0])
                rows["height"].append(pages[0][1])
                rows["bits"].append(pages[0][2])
                rows["total_pixels"].append(
                    sum(w * h for w, h, _ in pages))
            out = {"doc_id": pdf[id_col].astype("int64"),
                   "endian": pd.array(endians, dtype="string")}
            for k, v in rows.items():
                out[k] = pd.array(v, dtype="Int64")
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, TIFF_META_SCHEMA)


# ---------------------------------------------------------------------------
# FLAC STREAMINFO (real bit-level metadata decode)
# ---------------------------------------------------------------------------

_FLAC_MAX_BLOCKS = 64


def encode_flac_meta(rate: int, channels: int, bps: int, total: int,
                     md5_digest: bytes, padding: int = 0) -> bytes:
    """Minimal spec-conformant FLAC metadata stream: the ``fLaC``
    magic, one STREAMINFO block (the bit-packed 34-byte layout:
    16+16 blocksizes, 24+24 framesizes, then 20 bits sample rate,
    3 bits channels−1, 5 bits bps−1, 36 bits total samples, 16-byte
    raw-audio MD5), optionally followed by a PADDING block of
    *padding* zero bytes. No audio frames — this is the metadata
    surface a corpus card reads."""
    si = bytearray()
    si += (4096).to_bytes(2, "big")             # min blocksize
    si += (4096).to_bytes(2, "big")             # max blocksize
    si += (1024).to_bytes(3, "big")             # min framesize
    si += (8192).to_bytes(3, "big")             # max framesize
    packed = (rate << 44) | ((channels - 1) << 41) \
        | ((bps - 1) << 36) | total
    si += packed.to_bytes(8, "big")
    si += md5_digest
    assert len(si) == 34
    last = 0x00 if padding else 0x80
    out = b"fLaC" + bytes([last]) + (34).to_bytes(3, "big") + bytes(si)
    if padding:
        out += bytes([0x81]) + padding.to_bytes(3, "big") \
            + bytes(padding)
    return out


def parse_flac_meta(payload: bytes):
    """REAL FLAC metadata decode: verify the magic, walk the metadata
    block chain (last-block flag, 7-bit type, 24-bit big-endian
    length, bounds-checked), unpack STREAMINFO's bit fields. Returns
    (sample_rate, channels, bits_per_sample, total_samples, n_blocks,
    md5_hex) or None for anything structurally broken — bad magic, a
    block overrunning EOF, a stream whose first block is not
    STREAMINFO, or a chain past the cycle guard."""
    if len(payload) < 4 or payload[:4] != b"fLaC":
        return None
    off = 4
    n_blocks = 0
    info = None
    while True:
        if off + 4 > len(payload):
            return None
        hdr = payload[off]
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[off + 1:off + 4], "big")
        body = payload[off + 4:off + 4 + blen]
        if len(body) != blen:
            return None
        if n_blocks == 0:
            if btype != 0 or blen != 34:
                return None
            packed = int.from_bytes(body[10:18], "big")
            info = (
                packed >> 44,                      # sample rate
                ((packed >> 41) & 0x7) + 1,        # channels
                ((packed >> 36) & 0x1F) + 1,       # bits per sample
                packed & ((1 << 36) - 1),          # total samples
                body[18:34].hex(),                 # raw-audio md5
            )
        n_blocks += 1
        if n_blocks > _FLAC_MAX_BLOCKS:
            return None
        off += 4 + blen
        if hdr & 0x80:
            break
    rate, channels, bps, total, md5_hex = info
    return rate, channels, bps, total, n_blocks, md5_hex


FLAC_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("bits_per_sample", T.LongType()),
        T.StructField("total_samples", T.LongType()),
        T.StructField("n_blocks", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("audio_md5", T.StringType()),
    ]
)


def _corpus_flac_spec(doc_id: int):
    """Deterministic STREAMINFO fields per doc id — the arithmetic
    contract shared with the DuckDB oracle. The stored raw-audio MD5
    is md5(str(doc_id)) so BOTH engines can recompute the hex without
    touching the binary. None for the planted-corrupt ids
    (doc_id % 31 == 0): those get a STREAMINFO whose following
    PADDING block length overruns EOF — the bounds check, not the
    signature check, must catch it."""
    if doc_id % 31 == 0:
        return None
    return ((8000, 16000, 44100, 48000)[doc_id % 4],
            1 + doc_id % 2,
            (8, 16, 24)[doc_id % 3],
            1000 + (doc_id * 77) % 100000,
            1 + (1 if doc_id % 5 == 0 else 0))   # n_blocks


def synthesize_corpus_flacs(docs: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """One REAL FLAC metadata stream per document id (fields from
    `_corpus_flac_spec`, every 5th id carrying a PADDING block so the
    chain walk is exercised). Corrupt-planted ids get a valid
    STREAMINFO followed by a PADDING header whose length points past
    EOF."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                digest = hashlib.md5(str(doc_id).encode()).digest()
                spec = _corpus_flac_spec(doc_id)
                if spec is None:
                    # valid STREAMINFO, then a PADDING header whose
                    # 24-bit length claims more bytes than remain
                    good = bytearray(encode_flac_meta(
                        8000, 1, 8, 1000, digest, padding=8))
                    good[43:46] = (10000).to_bytes(3, "big")
                    payloads.append(bytes(good))
                    continue
                rate, channels, bps, total, n_blocks = spec
                payloads.append(encode_flac_meta(
                    rate, channels, bps, total, digest,
                    padding=16 if n_blocks == 2 else 0))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def flac_meta(media: DataFrame, id_col: str = "doc_id",
              payload_col: str = "payload") -> DataFrame:
    """FLAC metadata card over a binary column
    (:func:`parse_flac_meta`): STREAMINFO bit fields, block-chain
    length, integer-division duration in ms (exact in both engines),
    and the stored raw-audio MD5 as hex. NULLs for undecodable
    payloads. Arrow-batched `mapInPandas`, narrow, zero shuffles."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = {k: [] for k in
                    ("sample_rate", "channels", "bits_per_sample",
                     "total_samples", "n_blocks", "duration_ms")}
            md5s = []
            for p in pdf[payload_col]:
                dec = parse_flac_meta(p)
                if dec is None:
                    for k in cols:
                        cols[k].append(None)
                    md5s.append(None)
                    continue
                rate, channels, bps, total, n_blocks, md5_hex = dec
                cols["sample_rate"].append(rate)
                cols["channels"].append(channels)
                cols["bits_per_sample"].append(bps)
                cols["total_samples"].append(total)
                cols["n_blocks"].append(n_blocks)
                cols["duration_ms"].append(
                    total * 1000 // rate if rate else None)
                md5s.append(md5_hex)
            out = {"doc_id": pdf[id_col].astype("int64")}
            for k, v in cols.items():
                out[k] = pd.array(v, dtype="Int64")
            out["audio_md5"] = pd.array(md5s, dtype="string")
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, FLAC_META_SCHEMA)


# --------------------------------------------------------------------------
# MP3 (MPEG-1 Layer III) frame-chain walk
# --------------------------------------------------------------------------

_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320)               # kbps, MPEG-1 Layer III
_MP3_RATES = (44100, 48000, 32000)            # sample-rate index 0..2
_MP3_MAX_FRAMES = 64


def encode_mp3(bitrate_idx: int, rate_idx: int, paddings,
               id3_len: int = 0) -> bytes:
    """Minimal spec-conformant CBR MPEG-1 Layer III stream: an
    optional ID3v2.3 tag (syncsafe length, zero body), then one
    4-byte frame header + zero filler per frame. Frame i is
    *paddings[i]*-padded; size = 144000·bitrate_kbps/sample_rate
    (integer division) + padding — the real Layer III formula."""
    out = bytearray()
    if id3_len:
        ss = ((id3_len >> 21 & 0x7F) << 24) | ((id3_len >> 14 & 0x7F) << 16) \
            | ((id3_len >> 7 & 0x7F) << 8) | (id3_len & 0x7F)
        out += b"ID3" + bytes([3, 0, 0]) + ss.to_bytes(4, "big")
        out += bytes(id3_len)
    kbps = _MP3_BITRATES[bitrate_idx]
    rate = _MP3_RATES[rate_idx]
    for pad in paddings:
        size = 144000 * kbps // rate + (1 if pad else 0)
        hdr = bytes([
            0xFF, 0xFB,                        # sync + MPEG1 + L3 + no CRC
            (bitrate_idx << 4) | (rate_idx << 2)
            | ((1 if pad else 0) << 1),
            0x40,                              # joint stereo
        ])
        out += hdr + bytes(size - 4)
    return bytes(out)


def parse_mp3(payload: bytes):
    """REAL MPEG-1 Layer III stream walk: skip a leading ID3v2 tag
    (syncsafe 28-bit length), then verify every frame header (11-bit
    sync, MPEG-1 version bits, Layer III bits, legal bitrate/rate
    indices), advance by the computed frame size, and require the
    chain to land EXACTLY on EOF. Returns (sample_rate, bitrate_kbps,
    n_frames, n_padded, has_id3, total_bytes) or None for anything
    structurally broken — lost sync, free/bad bitrate, reserved rate
    index, a frame overrunning EOF, trailing garbage, VBR (a frame
    whose bitrate differs from the first — this card is CBR-only),
    or a chain past the cycle guard."""
    off = 0
    has_id3 = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            return None
        b = payload[6:10]
        if any(x & 0x80 for x in b):
            return None
        tag = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
        off = 10 + tag
        if off > len(payload):
            return None
        has_id3 = 1
    n_frames = n_padded = 0
    kbps0 = rate0 = None
    while off < len(payload):
        if off + 4 > len(payload):
            return None
        h0, h1, h2, _ = payload[off:off + 4]
        if h0 != 0xFF or (h1 & 0xFE) != 0xFA:   # sync + MPEG1 + L3
            return None
        br_idx = (h2 >> 4) & 0xF
        r_idx = (h2 >> 2) & 0x3
        pad = (h2 >> 1) & 0x1
        if br_idx in (0, 15) or r_idx == 3:
            return None
        kbps = _MP3_BITRATES[br_idx]
        rate = _MP3_RATES[r_idx]
        if kbps0 is None:
            kbps0, rate0 = kbps, rate
        elif kbps != kbps0 or rate != rate0:
            return None
        size = 144000 * kbps // rate + pad
        if off + size > len(payload):
            return None
        n_frames += 1
        n_padded += pad
        if n_frames > _MP3_MAX_FRAMES:
            return None
        off += size
    if n_frames == 0:
        return None
    return rate0, kbps0, n_frames, n_padded, has_id3, len(payload)


MP3_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("bitrate_kbps", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_padded", T.LongType()),
        T.StructField("has_id3", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def _corpus_mp3_spec(doc_id: int):
    """Deterministic CBR stream shape per doc id — the arithmetic
    contract shared with the DuckDB oracle. None for the
    planted-corrupt ids (doc_id % 29 == 0): those get a truncated
    final frame, so the bounds check (not the sync check) fails."""
    if doc_id % 29 == 0:
        return None
    return (1 + doc_id % 14,                   # bitrate index 1..14
            doc_id % 3,                        # sample-rate index
            3 + doc_id % 5,                    # n_frames
            64 if doc_id % 4 == 0 else 0)      # ID3v2 tag length


def synthesize_corpus_mp3s(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """One REAL CBR MPEG-1 Layer III stream per document id (fields
    from `_corpus_mp3_spec`; frame i is padded iff
    (doc_id + i) % 3 == 0, every 4th id carries an ID3v2 tag so the
    syncsafe skip is exercised). Corrupt-planted ids get a valid
    chain whose FINAL frame is truncated by one byte."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                spec = _corpus_mp3_spec(doc_id)
                if spec is None:
                    good = encode_mp3(2, 0, [0, 0, 1])
                    payloads.append(good[:-1])
                    continue
                br, ri, nf, id3 = spec
                pads = [1 if (doc_id + i) % 3 == 0 else 0
                        for i in range(nf)]
                payloads.append(encode_mp3(br, ri, pads, id3_len=id3))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def mp3_meta(media: DataFrame, id_col: str = "doc_id",
             payload_col: str = "payload") -> DataFrame:
    """MP3 stream card over a binary column (:func:`parse_mp3`):
    CBR header fields, frame/padding counts, ID3 presence, byte
    length, and integer-division duration (1152 samples per MPEG-1
    Layer III frame — exact in both engines). NULLs for undecodable
    payloads. Arrow-batched `mapInPandas`, narrow, zero shuffles."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = {k: [] for k in
                    ("sample_rate", "bitrate_kbps", "n_frames",
                     "n_padded", "has_id3", "total_bytes",
                     "duration_ms")}
            for p in pdf[payload_col]:
                dec = parse_mp3(p)
                if dec is None:
                    for k in cols:
                        cols[k].append(None)
                    continue
                rate, kbps, nf, npad, id3, nbytes = dec
                cols["sample_rate"].append(rate)
                cols["bitrate_kbps"].append(kbps)
                cols["n_frames"].append(nf)
                cols["n_padded"].append(npad)
                cols["has_id3"].append(id3)
                cols["total_bytes"].append(nbytes)
                cols["duration_ms"].append(nf * 1152 * 1000 // rate)
            out = {"doc_id": pdf[id_col].astype("int64")}
            for k, v in cols.items():
                out[k] = pd.array(v, dtype="Int64")
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, MP3_META_SCHEMA)


# --------------------------------------------------------------------------
# ZIP central-directory walk
# --------------------------------------------------------------------------

_ZIP_MAX_ENTRIES = 256


def encode_zip(entries) -> bytes:
    """Minimal spec-conformant ZIP archive with STORED entries:
    local file headers + contents, then the central directory, then
    the end-of-central-directory record. *entries* is a list of
    (name: str, content: bytes); CRC-32 is REAL (zlib)."""
    import zlib

    out = bytearray()
    centrals = []
    for name, content in entries:
        nb = name.encode()
        crc = zlib.crc32(content) & 0xFFFFFFFF
        local_off = len(out)
        out += b"PK\x03\x04" + (20).to_bytes(2, "little") \
            + bytes(2) + (0).to_bytes(2, "little") + bytes(4) \
            + crc.to_bytes(4, "little") \
            + len(content).to_bytes(4, "little") \
            + len(content).to_bytes(4, "little") \
            + len(nb).to_bytes(2, "little") + bytes(2) + nb
        out += content
        centrals.append((nb, crc, len(content), local_off))
    cd_off = len(out)
    for nb, crc, clen, local_off in centrals:
        out += b"PK\x01\x02" + (20).to_bytes(2, "little") \
            + (20).to_bytes(2, "little") + bytes(2) \
            + (0).to_bytes(2, "little") + bytes(4) \
            + crc.to_bytes(4, "little") \
            + clen.to_bytes(4, "little") \
            + clen.to_bytes(4, "little") \
            + len(nb).to_bytes(2, "little") + bytes(2) + bytes(2) \
            + bytes(2) + bytes(2) + bytes(4) \
            + local_off.to_bytes(4, "little") + nb
    cd_size = len(out) - cd_off
    out += b"PK\x05\x06" + bytes(2) + bytes(2) \
        + len(entries).to_bytes(2, "little") \
        + len(entries).to_bytes(2, "little") \
        + cd_size.to_bytes(4, "little") \
        + cd_off.to_bytes(4, "little") + bytes(2)
    return bytes(out)


def parse_zip(payload: bytes):
    """REAL ZIP central-directory walk: locate the EOCD record by
    scanning back from the tail (validating that the comment length
    reaches EOF exactly — the spec's only unambiguous anchor), then
    walk the central directory, bounds-checking every entry header,
    verifying each entry's LOCAL header signature at its recorded
    offset, and requiring the walk to consume exactly cd_size bytes
    and n_total entries. Returns (n_entries, total_uncompressed,
    total_compressed, names_len_sum, cd_size, total_bytes) or None
    for anything structurally broken."""
    n = len(payload)
    if n < 22:
        return None
    eocd = None
    lo = max(0, n - 22 - 0xFFFF)
    for i in range(n - 22, lo - 1, -1):
        if payload[i:i + 4] == b"PK\x05\x06":
            clen = int.from_bytes(payload[i + 20:i + 22], "little")
            if i + 22 + clen == n:
                eocd = i
                break
    if eocd is None:
        return None
    n_total = int.from_bytes(payload[eocd + 10:eocd + 12], "little")
    cd_size = int.from_bytes(payload[eocd + 12:eocd + 16], "little")
    cd_off = int.from_bytes(payload[eocd + 16:eocd + 20], "little")
    if cd_off + cd_size > eocd or n_total > _ZIP_MAX_ENTRIES:
        return None
    off = cd_off
    count = tot_u = tot_c = names_len = 0
    while count < n_total:
        if off + 46 > cd_off + cd_size:
            return None
        if payload[off:off + 4] != b"PK\x01\x02":
            return None
        csize = int.from_bytes(payload[off + 20:off + 24], "little")
        usize = int.from_bytes(payload[off + 24:off + 28], "little")
        nlen = int.from_bytes(payload[off + 28:off + 30], "little")
        elen = int.from_bytes(payload[off + 30:off + 32], "little")
        clen = int.from_bytes(payload[off + 32:off + 34], "little")
        local_off = int.from_bytes(payload[off + 42:off + 46],
                                   "little")
        if local_off + 4 > cd_off or \
                payload[local_off:local_off + 4] != b"PK\x03\x04":
            return None
        tot_c += csize
        tot_u += usize
        names_len += nlen
        count += 1
        off += 46 + nlen + elen + clen
    if off != cd_off + cd_size:
        return None
    return count, tot_u, tot_c, names_len, cd_size, n


ZIP_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_entries", T.LongType()),
        T.StructField("total_uncompressed", T.LongType()),
        T.StructField("total_compressed", T.LongType()),
        T.StructField("names_len_sum", T.LongType()),
        T.StructField("cd_size", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)


def _corpus_zip_spec(doc_id: int):
    """Deterministic archive shape per doc id — the arithmetic
    contract shared with the DuckDB oracle: entry i of
    n = 1 + doc_id % 4 is named ``f{i}.txt`` and stores the ASCII
    string ``doc{doc_id}entry{i}`` repeated 1 + (doc_id + i) % 3
    times. None for the planted-corrupt ids (doc_id % 41 == 0):
    their EOCD signature is overwritten, so the tail scan finds no
    anchor."""
    if doc_id % 41 == 0:
        return None
    return 1 + doc_id % 4


def synthesize_corpus_zips(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """One REAL ZIP archive per document id (STORED entries with real
    CRC-32s, shape from `_corpus_zip_spec`). Corrupt-planted ids get
    a valid archive whose EOCD signature bytes are zeroed."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                n = _corpus_zip_spec(doc_id)
                if n is None:
                    good = bytearray(encode_zip(
                        [("f0.txt", b"doc0entry0")]))
                    good[-22:-18] = bytes(4)
                    payloads.append(bytes(good))
                    continue
                entries = []
                for i in range(n):
                    content = (f"doc{doc_id}entry{i}"
                               * (1 + (doc_id + i) % 3)).encode()
                    entries.append((f"f{i}.txt", content))
                payloads.append(encode_zip(entries))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def zip_meta(media: DataFrame, id_col: str = "doc_id",
             payload_col: str = "payload") -> DataFrame:
    """ZIP archive card over a binary column (:func:`parse_zip`):
    entry count, stored/compressed byte totals, name-length sum,
    central-directory size, archive size. NULLs for undecodable
    payloads. Arrow-batched `mapInPandas`, narrow, zero shuffles."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = {k: [] for k in
                    ("n_entries", "total_uncompressed",
                     "total_compressed", "names_len_sum", "cd_size",
                     "total_bytes")}
            for p in pdf[payload_col]:
                dec = parse_zip(p)
                if dec is None:
                    for k in cols:
                        cols[k].append(None)
                    continue
                for k, v in zip(cols, dec):
                    cols[k].append(v)
            out = {"doc_id": pdf[id_col].astype("int64")}
            for k, v in cols.items():
                out[k] = pd.array(v, dtype="Int64")
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, ZIP_META_SCHEMA)


# --------------------------------------------------------------------------
# WebP (RIFF container; VP8L lossless + VP8X extended headers)
# --------------------------------------------------------------------------

_WEBP_MAX_CHUNKS = 32


def encode_webp(fmt: str, width: int, height: int, alpha: bool,
                extra_exif: int = 0) -> bytes:
    """Minimal spec-conformant WebP: RIFF/WEBP container holding one
    VP8L chunk (the lossless bitstream header: 0x2F signature, then
    14-bit width−1, 14-bit height−1, alpha bit, 3 version bits —
    genuinely little-endian bit-packed) or one VP8X chunk (extended
    header: flag byte with the alpha bit, 24-bit little-endian
    canvas dimensions −1), optionally followed by a dummy EXIF chunk
    of *extra_exif* bytes (odd sizes exercise the RIFF pad rule)."""
    if fmt == "VP8L":
        v = (width - 1) | ((height - 1) << 14) \
            | ((1 if alpha else 0) << 28)
        body = bytes([0x2F]) + v.to_bytes(4, "little")
    else:
        body = bytes([0x10 if alpha else 0x00]) + bytes(3) \
            + (width - 1).to_bytes(3, "little") \
            + (height - 1).to_bytes(3, "little")
    chunks = fmt.encode().ljust(4) + len(body).to_bytes(4, "little") \
        + body + (b"\x00" if len(body) % 2 else b"")
    if extra_exif:
        chunks += b"EXIF" + extra_exif.to_bytes(4, "little") \
            + bytes(extra_exif) \
            + (b"\x00" if extra_exif % 2 else b"")
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") \
        + b"WEBP" + chunks


def parse_webp(payload: bytes):
    """REAL WebP decode: verify the RIFF magic and that the declared
    RIFF size reaches EOF exactly, walk the chunk list (fourcc +
    little-endian size + even-byte padding, every chunk
    bounds-checked), and unpack the first chunk's header — VP8L's
    bit-packed dimensions (0x2F signature required) or VP8X's flag
    byte + 24-bit canvas. Returns (format, width, height, has_alpha,
    n_chunks, riff_size) or None for anything structurally broken."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        return None
    riff_size = int.from_bytes(payload[4:8], "little")
    if 8 + riff_size != len(payload):
        return None
    off = 12
    first = None
    n_chunks = 0
    while off < len(payload):
        if off + 8 > len(payload):
            return None
        fourcc = payload[off:off + 4]
        clen = int.from_bytes(payload[off + 4:off + 8], "little")
        body = payload[off + 8:off + 8 + clen]
        if len(body) != clen:
            return None
        if first is None:
            first = (fourcc, body)
        n_chunks += 1
        if n_chunks > _WEBP_MAX_CHUNKS:
            return None
        off += 8 + clen + (clen % 2)
    if first is None:
        return None
    fourcc, body = first
    if fourcc == b"VP8L":
        if len(body) < 5 or body[0] != 0x2F:
            return None
        v = int.from_bytes(body[1:5], "little")
        if (v >> 29) & 0x7:                    # version must be 0
            return None
        return ("VP8L", (v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1,
                (v >> 28) & 0x1, n_chunks, riff_size)
    if fourcc == b"VP8X":
        if len(body) < 10:
            return None
        return ("VP8X",
                int.from_bytes(body[4:7], "little") + 1,
                int.from_bytes(body[7:10], "little") + 1,
                1 if body[0] & 0x10 else 0, n_chunks, riff_size)
    return None


WEBP_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("has_alpha", T.LongType()),
        T.StructField("n_chunks", T.LongType()),
        T.StructField("riff_size", T.LongType()),
    ]
)


def _corpus_webp_spec(doc_id: int):
    """Deterministic WebP shape per doc id — the arithmetic contract
    shared with the DuckDB oracle: VP8L for odd ids, VP8X for even;
    width 16 + (id·7) % 300, height 16 + (id·13) % 200, alpha iff
    id % 3 == 0, a dummy EXIF chunk of 8 + id % 5 bytes iff
    id % 5 == 0. None for the planted-corrupt ids (doc_id % 43 == 0):
    their RIFF size field overshoots EOF by 5."""
    if doc_id % 43 == 0:
        return None
    return ("VP8L" if doc_id % 2 else "VP8X",
            16 + (doc_id * 7) % 300,
            16 + (doc_id * 13) % 200,
            doc_id % 3 == 0,
            8 + doc_id % 5 if doc_id % 5 == 0 else 0)


def synthesize_corpus_webps(docs: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """One REAL WebP container per document id (shape from
    `_corpus_webp_spec`; odd EXIF sizes exercise the RIFF pad rule).
    Corrupt-planted ids get a valid container whose RIFF size field
    is inflated by 5 — the EOF-exactness check, not the magic check,
    must catch it."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                spec = _corpus_webp_spec(doc_id)
                if spec is None:
                    good = bytearray(encode_webp("VP8L", 16, 16, False))
                    size = int.from_bytes(good[4:8], "little") + 5
                    good[4:8] = size.to_bytes(4, "little")
                    payloads.append(bytes(good))
                    continue
                fmt, w, h, alpha, exif = spec
                payloads.append(
                    encode_webp(fmt, w, h, alpha, extra_exif=exif))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def webp_meta(media: DataFrame, id_col: str = "doc_id",
              payload_col: str = "payload") -> DataFrame:
    """WebP container card over a binary column (:func:`parse_webp`):
    variant, bit-unpacked dimensions, alpha flag, chunk count, RIFF
    size. NULLs for undecodable payloads. Arrow-batched
    `mapInPandas`, narrow, zero shuffles."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fmts = []
            cols = {k: [] for k in
                    ("width", "height", "has_alpha", "n_chunks",
                     "riff_size")}
            for p in pdf[payload_col]:
                dec = parse_webp(p)
                if dec is None:
                    fmts.append(None)
                    for k in cols:
                        cols[k].append(None)
                    continue
                fmt, w, h, alpha, nc, rs = dec
                fmts.append(fmt)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["has_alpha"].append(alpha)
                cols["n_chunks"].append(nc)
                cols["riff_size"].append(rs)
            out = {"doc_id": pdf[id_col].astype("int64"),
                   "format": pd.array(fmts, dtype="string")}
            for k, v in cols.items():
                out[k] = pd.array(v, dtype="Int64")
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, WEBP_META_SCHEMA)


# --------------------------------------------------------------------------
# PDF (classic cross-reference table) structural walk
# --------------------------------------------------------------------------

_PDF_MAX_OBJECTS = 512


def encode_pdf(version: str, n_pages: int, width: int,
               height: int) -> bytes:
    """Minimal spec-conformant classic-xref PDF: header, a Catalog, a
    Pages node with /Count and /Kids, one Page object per page with a
    real /MediaBox, then the cross-reference table with BYTE-EXACT
    10-digit offsets, the trailer (/Size /Root) and startxref. This
    is the real PDF 32000-1:2008 §7.5 file structure — every offset
    is computed during assembly and verified on parse."""
    out = bytearray()
    out += f"%PDF-{version}\n".encode()
    offsets = {}

    def obj(num: int, body: str):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n{body}\nendobj\n".encode())

    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>")
    for i in range(n_pages):
        obj(3 + i, f"<< /Type /Page /Parent 2 0 R "
                   f"/MediaBox [0 0 {width} {height}] >>")
    xref_off = len(out)
    n_obj = 2 + n_pages + 1                     # incl. the free obj 0
    out += f"xref\n0 {n_obj}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\n"
            f"startxref\n{xref_off}\n%%EOF\n").encode()
    return bytes(out)


def parse_pdf(payload: bytes):
    """REAL classic-xref PDF structural walk: header version, locate
    ``startxref`` from the tail, seek to the cross-reference table,
    read the subsection header and every 20-byte entry, VERIFY each
    in-use object's recorded offset actually lands on ``N 0 obj``,
    read /Size and /Root from the trailer, then follow the xref (not
    a text search) to the Pages node for /Count and the first Page's
    /MediaBox. Returns (version, n_objects, n_pages, page_width,
    page_height, xref_offset) or None for anything structurally
    broken — bad header, dangling startxref, a wrong offset in the
    table, trailer/xref size mismatch, or an unparseable tree."""
    import re

    if not payload.startswith(b"%PDF-"):
        return None
    eol = payload.find(b"\n")
    if eol < 0:
        return None
    version = payload[5:eol].decode("ascii", "replace").strip()
    tail = payload[-256:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass
    if m is None:
        return None
    xref_off = int(m.group(1))
    if payload[xref_off:xref_off + 4] != b"xref":
        return None
    head = re.match(rb"xref\s+(\d+)\s+(\d+)\s*\n",
                    payload[xref_off:xref_off + 64])
    if head is None:
        return None
    first, count = int(head.group(1)), int(head.group(2))
    if first != 0 or count > _PDF_MAX_OBJECTS:
        return None
    pos = xref_off + head.end()
    offsets = {}
    for num in range(count):
        ent = payload[pos:pos + 20]
        em = re.match(rb"(\d{10}) (\d{5}) ([nf])", ent)
        if em is None:
            return None
        if em.group(3) == b"n":
            off = int(em.group(1))
            # startswith with a start offset — payload[off:] would COPY
            # the remaining tail per object (O(objects x bytes))
            if not payload.startswith(f"{num} 0 obj".encode(), off):
                return None
            offsets[num] = off
        pos += 20
    tm = re.search(rb"trailer\s*<<(.*?)>>", payload[pos:pos + 512],
                   re.S)
    if tm is None:
        return None
    trailer = tm.group(1)
    sm = re.search(rb"/Size\s+(\d+)", trailer)
    rm = re.search(rb"/Root\s+(\d+)\s+0\s+R", trailer)
    if sm is None or rm is None or int(sm.group(1)) != count:
        return None
    root = offsets.get(int(rm.group(1)))
    if root is None:
        return None
    cat = payload[root:root + 256]
    pm = re.search(rb"/Pages\s+(\d+)\s+0\s+R", cat)
    if pm is None or int(pm.group(1)) not in offsets:
        return None
    po = offsets[int(pm.group(1))]
    pages_obj = payload[po:po + 512]
    cm = re.search(rb"/Count\s+(\d+)", pages_obj)
    km = re.search(rb"/Kids\s*\[\s*(\d+)\s+0\s+R", pages_obj)
    if cm is None or km is None or int(km.group(1)) not in offsets:
        return None
    ko = offsets[int(km.group(1))]
    page = payload[ko:ko + 256]
    bm = re.search(rb"/MediaBox\s*\[\s*0\s+0\s+(\d+)\s+(\d+)\s*\]",
                   page)
    if bm is None:
        return None
    return (version, count, int(cm.group(1)),
            int(bm.group(1)), int(bm.group(2)), xref_off)


PDF_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("version", T.StringType()),
        T.StructField("n_objects", T.LongType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("page_width", T.LongType()),
        T.StructField("page_height", T.LongType()),
        T.StructField("xref_offset", T.LongType()),
    ]
)


def _corpus_pdf_spec(doc_id: int):
    """Deterministic document shape per doc id — the arithmetic
    contract shared with the DuckDB oracle (xref_offset is NOT in it:
    byte-layout-derived, checked by the parser's own offset
    verification instead and shipped for the rows-only eye). None
    for the planted-corrupt ids (doc_id % 47 == 0): their startxref
    is shifted +3, so the ``xref`` keyword check fails."""
    if doc_id % 47 == 0:
        return None
    return (f"1.{4 + doc_id % 4}",
            1 + doc_id % 4,
            200 + (doc_id * 3) % 400,
            200 + (doc_id * 5) % 600)


def synthesize_corpus_pdfs(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """One REAL classic-xref PDF per document id (shape from
    `_corpus_pdf_spec`). Corrupt-planted ids get a valid document
    whose startxref number is shifted by +3."""
    import re

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                doc_id = int(doc_id)
                spec = _corpus_pdf_spec(doc_id)
                if spec is None:
                    good = encode_pdf("1.4", 1, 200, 200)
                    m = re.search(rb"startxref\n(\d+)", good)
                    shifted = str(int(m.group(1)) + 3).encode()
                    payloads.append(good[:m.start(1)] + shifted
                                    + good[m.end(1):])
                    continue
                version, n_pages, w, h = spec
                payloads.append(encode_pdf(version, n_pages, w, h))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(_batches, IMAGE_PAYLOAD_SCHEMA)


def pdf_meta(media: DataFrame, id_col: str = "doc_id",
             payload_col: str = "payload") -> DataFrame:
    """PDF structure card over a binary column (:func:`parse_pdf`):
    header version, xref object count, page count and first-page
    MediaBox via genuine offset-following, xref offset. NULLs for
    undecodable payloads. Arrow-batched `mapInPandas`, narrow,
    zero shuffles."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vers = []
            cols = {k: [] for k in
                    ("n_objects", "n_pages", "page_width",
                     "page_height", "xref_offset")}
            for p in pdf[payload_col]:
                dec = parse_pdf(p)
                if dec is None:
                    vers.append(None)
                    for k in cols:
                        cols[k].append(None)
                    continue
                version, n_obj, n_pages, w, h, xo = dec
                vers.append(version)
                cols["n_objects"].append(n_obj)
                cols["n_pages"].append(n_pages)
                cols["page_width"].append(w)
                cols["page_height"].append(h)
                cols["xref_offset"].append(xo)
            out = {"doc_id": pdf[id_col].astype("int64"),
                   "version": pd.array(vers, dtype="string")}
            for k, v in cols.items():
                out[k] = pd.array(v, dtype="Int64")
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, PDF_META_SCHEMA)

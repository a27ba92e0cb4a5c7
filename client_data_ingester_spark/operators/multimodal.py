"""Multimodal column plumbing ([EXT], driver north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside. The Spark-side plumbing — schema, partition-sized
Arrow batches through ``mapInPandas``, UDF signatures — is real and tested.
Decoding: five formats decode FOR REAL, dependency-free — one per
modality family: uncompressed 24-bit BMP (:func:`decode_bmp`), binary P6
PPM (:func:`decode_ppm`), 8-bit truecolor PNG with full zlib inflate +
all five scanline filters (:func:`decode_png`), 16-bit mono PCM WAV
audio (:func:`decode_wav`), and uncompressed RIFF/AVI video with frame
sampling (:func:`decode_avi`) — each scored end-to-end against an
analytic oracle
(``multimodal_{bmp,ppm,png,wav}_stats`` / ``multimodal_avi_frames``);
formats that genuinely need
codec libraries (Pillow/librosa/av, not in this container) stay stubbed —
``decode_stub=True`` computes deterministic fake features from the bytes,
``decode_stub=False`` raises NotImplementedError where the codec call
would go.

At scale: payloads live in parquet binary columns (or object-store pointers
for >~1 MB blobs); mapInPandas streams Arrow batches so an executor never
materializes more than ``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs
at once; feature extraction parallelism == partition count, so repartition by
a content-hash prefix for even blob-size distribution before decoding.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, "
    "content_hash string, feat_mean double, feat_dim int"
)


def attach_media_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a media table from a text corpus (deterministic fake
    payloads) — gives the plumbing something real to chew on in tests."""
    payload = F.encode(F.col(text_col), "UTF-8").cast("binary")
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.length(F.col(text_col)) % 100).cast("int").alias("n_frames"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _decode_real(kind: str, payload: bytes) -> list[float]:
    """REAL decode path for the five dependency-free formats (see module
    docstring); everything else — including RIFF forms that are neither
    WAVE nor AVI, e.g. WEBP — raises NotImplementedError, honestly
    marking the external-codec boundary (never a misleading
    'malformed payload' error for a merely-unsupported container).
    Legal-but-empty media (zero-sample WAV, zero-frame AVI) yield a
    zero feature vector: their means are vacuously zero, not a crash."""
    if payload and (
        payload[:2] in (b"BM", b"P6") or payload[:8] == _PNG_SIG
    ):
        w, h, sums = decode_image(payload)
        n = w * h
        # 3-dim feature: per-channel mean scaled to [0,1] (B, G, R)
        return [s / (255.0 * n) for s in sums]
    if payload and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        w, h, n, frames = decode_avi(payload)
        px = w * h * n
        if px == 0:
            return [0.0, 0.0, 0.0]
        # 3-dim feature: per-channel mean over ALL frames (B, G, R)
        totals = [sum(fr[c] for fr in frames) for c in range(3)]
        return [t / (255.0 * px) for t in totals]
    if payload and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate, n, stats = decode_wav(payload)
        if n == 0:
            return [0.0, 0.0, 0.0]
        # 3-dim feature: mean amplitude, mean |amplitude|, peak — scaled
        return [
            stats[0] / (32768.0 * n),
            stats[1] / (32768.0 * n),
            stats[2] / 32768.0,
        ]
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries "
        "(Pillow/librosa/av) not present in this environment; "
        "run with decode_stub=True for the deterministic fake path "
        "(BMP/PPM/PNG images, 16-bit PCM WAV audio, and uncompressed "
        "AVI video decode for real)"
    )


# ---------------------------------------------------------------------------
# Real codec: uncompressed 24-bit BMP (dependency-free)
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, bgr_rows: "np.ndarray") -> bytes:
    """Serialize an (height, width, 3) uint8 BGR array as a standard
    bottom-up, uncompressed 24-bit BMP (BITMAPINFOHEADER), including the
    4-byte row padding real files carry."""
    import struct

    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    img_size = (row_bytes + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        body += bgr_rows[y].tobytes() + b"\x00" * pad
    return header + bytes(body)


def _bmp_geometry(payload: bytes) -> tuple[int, int, int, int, int]:
    """Shared BMP header walk: validate magic/bpp/compression/dims and
    return ``(pix_offset, width, height, row_bytes, stride)``."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, width, height) = struct.unpack_from("<Iii", payload, 14)
    (planes, bpp) = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} comp={compression}")
    if height <= 0 or width <= 0:
        raise ValueError("top-down or degenerate BMP not supported")
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    return pix_offset, width, height, row_bytes, stride


def decode_bmp(payload: bytes) -> tuple[int, int, tuple[int, int, int]]:
    """Parse an uncompressed 24-bit BMP and return ``(width, height,
    (sum_b, sum_g, sum_r))`` with EXACT integer channel sums — the real
    header walk (magic, pixel-array offset, dims, bpp, compression),
    bottom-up row order, BGR byte order, and per-row 4-byte padding are
    all honored, so a wrong stride or ignored pad shows up as a value
    mismatch against the analytic oracle. STREAMS per-row sums with
    O(row) extra memory — the hot per-image stats path never
    materializes the pixel array (that's :func:`decode_bmp_pixels`,
    for transforms that need the pixels)."""
    import numpy as np

    pix_offset, width, height, row_bytes, stride = _bmp_geometry(payload)
    sums = np.zeros(3, dtype=np.int64)
    for y in range(height):
        row = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes,
            offset=pix_offset + y * stride,
        )
        sums += row.reshape(width, 3).sum(axis=0, dtype=np.int64)
    return width, height, (int(sums[0]), int(sums[1]), int(sums[2]))


def decode_bmp_pixels(
    payload: bytes,
) -> "tuple[int, int, tuple[int, int, int], object]":
    """Like :func:`decode_bmp` but ALSO materializes the top-down
    (height, width, 3) BGR uint8 array — the input the real resize path
    needs. Use :func:`decode_bmp` when only the sums matter."""
    import numpy as np

    pix_offset, width, height, row_bytes, stride = _bmp_geometry(payload)
    # bottom-up storage: file row y is image row (height-1-y)
    rows = [
        np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes,
            offset=pix_offset + (height - 1 - y) * stride,
        ).reshape(width, 3)
        for y in range(height)
    ]
    px = np.stack(rows)  # (height, width, 3) BGR, top-down
    sums = px.sum(axis=(0, 1), dtype=np.int64)
    return width, height, (int(sums[0]), int(sums[1]), int(sums[2])), px


def encode_ppm(width: int, height: int, rgb_rows: "np.ndarray") -> bytes:
    """Serialize an (height, width, 3) uint8 RGB array as a binary PPM
    (P6): ASCII header, then raw top-down RGB triplets — no padding, the
    structural opposite of BMP's padded bottom-up BGR, which is exactly
    why decoding BOTH against one oracle is a strong codec test."""
    return f"P6\n{width} {height}\n255\n".encode() + rgb_rows.tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, tuple[int, int, int]]:
    """Parse a binary PPM (P6) and return ``(width, height,
    (sum_b, sum_g, sum_r))`` — same exact-integer-sums contract as
    :func:`decode_bmp` so the two codecs are interchangeable downstream.
    The header scanner handles the format's whitespace rules and
    ``#`` comments; only maxval 255 (1 byte/sample) is supported."""
    import numpy as np

    if len(payload) < 9 or payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # token scanner: after 'P6', read 3 whitespace-separated integers,
    # skipping '#' comments; pixel data starts after ONE whitespace byte
    # following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos:pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PPM comment")
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end:end + 1].isspace():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PPM dimensions")
    pos += 1  # the single whitespace after maxval
    need = width * height * 3
    if len(payload) - pos < need:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)  # R, G, B
    return width, height, (int(sums[2]), int(sums[1]), int(sums[0]))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(
    width: int,
    height: int,
    rgb_rows: "np.ndarray",
    filters: "list[int] | None" = None,
) -> bytes:
    """Serialize an (height, width, 3) uint8 RGB array as a standard
    8-bit truecolor PNG: signature, IHDR, one zlib-deflated IDAT of
    filter-prefixed scanlines, IEND — with real CRC32s. ``filters`` picks
    the per-row filter type (0=None 1=Sub 2=Up 3=Average 4=Paeth,
    default: row ``y`` uses ``y % 5``), so a generated corpus exercises
    EVERY defilter branch of :func:`decode_png`, not just the trivial
    one."""
    import struct
    import zlib

    import numpy as np

    if filters is None:
        filters = [y % 5 for y in range(height)]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(width * 3, dtype=np.int32)
    for y in range(height):
        cur = rgb_rows[y].reshape(-1).astype(np.int32)
        ft = filters[y]
        left = np.concatenate([np.zeros(3, dtype=np.int32), cur[:-3]])
        ul = np.concatenate([np.zeros(3, dtype=np.int32), prev[:-3]])
        if ft == 0:
            out = cur
        elif ft == 1:
            out = cur - left
        elif ft == 2:
            out = cur - prev
        elif ft == 3:
            out = cur - (left + prev) // 2
        elif ft == 4:
            out = cur - _paeth(left, prev, ul)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        raw.append(ft)
        raw += (out % 256).astype(np.uint8).tobytes()
        prev = cur
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _paeth(left: "np.ndarray", up: "np.ndarray", ul: "np.ndarray"):
    """Vectorized Paeth predictor (PNG spec §9.4): pick whichever of
    left/up/upper-left is closest to left+up-ul, ties break left, up,
    upper-left."""
    import numpy as np

    p = left + up - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    return np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
    )


def decode_png(payload: bytes) -> tuple[int, int, tuple[int, int, int]]:
    """Parse an 8-bit truecolor PNG and return ``(width, height,
    (sum_b, sum_g, sum_r))`` with exact integer channel sums — a REAL
    decode: chunk walk with CRC32 verification, multi-IDAT concatenation,
    zlib inflate, and per-scanline reversal of all five filter types
    (None/Sub/Up/Average/Paeth). Only bit depth 8 / color type 2 (RGB,
    no palette or alpha) / no interlace is supported; anything else
    raises, marking the boundary honestly."""
    import struct
    import zlib

    import numpy as np

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant: depth=%d color=%d comp=%d "
                    "filter=%d interlace=%d" % (depth, ctype, comp, filt, ilace)
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PNG dimensions")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # keep the decoder contract (ValueError for malformed payloads):
        # a corrupted DEFLATE stream / adler32 mismatch must not escape
        # as zlib.error past callers that catch ValueError
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    prev = np.zeros(stride, dtype=np.int32)
    sums = np.zeros(3, dtype=np.int64)
    for y in range(height):
        off = y * (stride + 1)
        ft = raw[off]
        cur = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off + 1
        ).astype(np.int32)
        if ft == 0:
            pass
        elif ft == 2:
            # Up: whole-row vector add against the previous scanline
            cur = (cur + prev) % 256
        elif ft == 1:
            # Sub: out[x] = (cur[x] + out[x-3]) % 256 is a per-channel
            # running sum — one numpy cumsum over the row, no Python loop
            # (mod-256 commutes with exact int64 summation)
            cur = (
                np.cumsum(cur.reshape(width, 3), axis=0, dtype=np.int64)
                % 256
            ).astype(np.int32).reshape(stride)
        elif ft in (3, 4):
            # Average/Paeth depend on the LEFT reconstructed pixel through
            # a floor-div / argmin predictor, which no cumulative numpy
            # formulation expresses — this per-pixel Python loop (3-sample
            # vector steps) is the known perf boundary of the dependency-
            # free decoder: O(width) interpreter iterations per scanline
            # vs the row-vector paths above. Real-sized images needing
            # fast Average/Paeth belong on a codec library behind
            # decode_stub, not on this reference decoder.
            out = np.empty(stride, dtype=np.int32)
            zero = np.zeros(3, dtype=np.int32)
            for x in range(0, stride, 3):
                left = out[x - 3:x] if x else zero
                up = prev[x:x + 3]
                ul = prev[x - 3:x] if x else zero
                if ft == 3:
                    rec = cur[x:x + 3] + (left + up) // 2
                else:
                    rec = cur[x:x + 3] + _paeth(left, up, ul)
                out[x:x + 3] = rec % 256
            cur = out
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        prev = cur
        sums += cur.reshape(width, 3).sum(axis=0, dtype=np.int64)
    # internal order is R,G,B; contract returns (sum_b, sum_g, sum_r)
    return width, height, (int(sums[2]), int(sums[1]), int(sums[0]))


def _gen_bgr(d: int, xs, ys, fs=0):
    """THE closed-form pixel generator — the single source of truth every
    image/video synthesizer AND every multimodal DuckDB oracle encode:
    pixel (x, y) of frame ``f`` of doc ``d`` is ``B=(7d+3x+5y+11f)%256,
    G=(d+x+y+f)%256, R=(13d+x+2y+3f)%256`` (frame term 0 for stills).
    Returns a uint8 array with a trailing BGR channel axis. Kept in one
    place so a coefficient edit cannot silently break the cross-codec
    agreement invariant (BMP==PPM==PNG sums; AVI frame 0 == BMP)."""
    import numpy as np

    return np.stack(
        [
            (7 * d + 3 * xs + 5 * ys + 11 * fs) % 256,
            (d + xs + ys + fs) % 256,
            (13 * d + xs + 2 * ys + 3 * fs) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def _synth_media(docs: DataFrame, id_col: str, make_payload) -> DataFrame:
    """Shared Arrow-batched synthesis scaffold: one ``(media_id,
    payload)`` row per doc, ``make_payload(doc_id) -> bytes``. Blob
    construction is per-row Python/numpy inside ``mapInPandas`` (the
    honest shape for binary synthesis; at scale real payloads arrive
    from the lake, not a generator)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": [make_payload(int(d)) for d in pdf[id_col]],
                }
            )

    from .par import fan_out

    # per-row Python synthesis (and the decode that consumes it) is the
    # kernel; the input here is ONE long column, so the fan-out exchange
    # is near-free while the Python worker pool gains full width (no-op
    # at scale — see par.fan_out)
    return fan_out(docs.select(id_col)).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def synth_png_media(
    docs: DataFrame,
    width: int = 5,
    height: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic REAL PNG payloads from the shared :func:`_gen_bgr`
    generator, in a third structurally different container
    (zlib-deflated, per-row filtered scanlines). Default height 6 cycles
    the per-row filter ``y % 5`` through all five types with a repeat,
    so every defilter branch of :func:`decode_png` is on the scored
    path."""
    import numpy as np

    ys, xs = np.mgrid[0:height, 0:width]
    return _synth_media(
        docs,
        id_col,
        lambda d: encode_png(width, height, _gen_bgr(d, xs, ys)[..., ::-1]),
    )


def decode_image(payload: bytes) -> tuple[int, int, tuple[int, int, int]]:
    """Magic-byte dispatch over the natively-decodable image formats."""
    if payload and payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload and payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload and payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise ValueError("payload is not BMP, P6 PPM, or truecolor PNG")


# ---------------------------------------------------------------------------
# Real codec: RIFF/WAVE, 16-bit mono PCM (dependency-free)
# ---------------------------------------------------------------------------

def encode_wav(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Serialize an int16 sample array as a canonical RIFF/WAVE file:
    'fmt ' chunk (PCM, mono, 16-bit, byte-rate/block-align derived) +
    'data' chunk, all little-endian."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, tuple[int, int, int, int]]:
    """Parse a RIFF/WAVE payload (16-bit mono PCM only) and return
    ``(sample_rate, n_samples, (sum_amp, sum_abs, peak_abs,
    zero_crossings))`` with exact integer stats — a real chunk walk:
    RIFF size check, arbitrary chunk order with word-aligned skipping
    (so files carrying LIST/INFO chunks still parse), and strict
    format validation. A zero crossing is a strict sign change
    (``s[i-1] * s[i] < 0``); zero-valued samples break runs without
    counting."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    # walk exactly the declared RIFF extent (8 + riff_size), like
    # decode_avi — block-padded files carry trailing bytes past it that
    # are NOT chunks and must not be parsed as one
    end = 8 + riff_size
    pos, fmt, data = 12, None, None
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 8 + length > end:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("short WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if (audio_fmt, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"unsupported WAV variant: fmt={audio_fmt} ch={channels} "
            f"bits={bits} (only 16-bit mono PCM)"
        )
    if rate <= 0:
        raise ValueError("invalid WAV sample rate 0")
    if len(data) % 2:
        raise ValueError("odd PCM data length")
    s = np.frombuffer(data, dtype="<i2").astype(np.int64)
    n = len(s)
    if n == 0:
        return rate, 0, (0, 0, 0, 0)
    crossings = int(np.count_nonzero(s[:-1] * s[1:] < 0))
    return rate, n, (
        int(s.sum()),
        int(np.abs(s).sum()),
        int(np.abs(s).max()),
        crossings,
    )


def synth_wav_media(
    docs: DataFrame,
    n_samples: int = 40,
    sample_rate: int = 8000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic REAL WAV payloads, one per doc: sample ``i`` of doc
    ``d`` is ``((2741 * d + 4099 * i) % 65536) - 32768`` — a closed form
    the DuckDB oracle evaluates over ``generate_series`` (including the
    lagged term for zero crossings), so the scored query exercises a true
    bytes-level encode→decode while the oracle never touches a codec."""
    import numpy as np

    idx = np.arange(n_samples, dtype=np.int64)
    return _synth_media(
        docs,
        id_col,
        lambda d: encode_wav(
            sample_rate,
            (((2741 * d + 4099 * idx) % 65536) - 32768).astype(np.int16),
        ),
    )


WAV_STATS_SCHEMA = (
    "media_id long, sample_rate int, n_samples int, duration_micros long, "
    "sum_amp long, sum_abs long, peak_abs long, zero_crossings long"
)


def audio_sample_stats(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL end-to-end audio decode: parse each WAV payload and emit
    exact integer amplitude stats (sum, L1, peak, strict zero crossings)
    plus a floor-quantized duration — all-integer output, bit-exact
    against the analytic oracle. Same 1:1 Arrow-batched contract as
    :func:`image_pixel_stats`, including its ``on_error`` audit mode
    (``"null"`` → corrupt payloads report a NULL-stats row)."""
    _check_on_error(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, n, (s_amp, s_abs, peak, zc) = decode_wav(p)
                except ValueError:
                    if on_error == "raise":
                        raise
                    rows.append(
                        (mid, None, None, None, None, None, None, None)
                    )
                    continue
                rows.append(
                    (mid, rate, n, n * 1_000_000 // rate, s_amp, s_abs,
                     peak, zc)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples",
                    "duration_micros", "sum_amp", "sum_abs", "peak_abs",
                    "zero_crossings",
                ],
            )

    return media.mapInPandas(run, schema=WAV_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Real codec: uncompressed RIFF/AVI video ('DIB ' frames, dependency-free)
# ---------------------------------------------------------------------------

def encode_avi(
    width: int,
    height: int,
    bgr_frames: "np.ndarray",
    fps: int = 10,
) -> bytes:
    """Serialize an (n_frames, height, width, 3) uint8 BGR array as a
    standard uncompressed AVI: RIFF('AVI ') → LIST('hdrl') with a real
    56-byte ``avih`` main header and a LIST('strl') carrying the
    ``strh`` ('vids'/'DIB ') stream header + ``strf`` BITMAPINFOHEADER,
    then LIST('movi') with one ``00db`` chunk per frame of bottom-up,
    4-byte-row-padded BGR pixels (the DIB layout BMP uses). Every chunk
    is RIFF word-aligned, so odd-sized frames exercise the decoder's
    alignment skip."""
    import struct

    n_frames = len(bgr_frames)
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    frame_size = (row_bytes + pad) * height

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            tag + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) % 2 else b"")
        )

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0,                 # dwFlags
        n_frames,          # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        frame_size,        # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,        # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,            # dwScale / dwRate → fps
        0, n_frames,       # dwStart / dwLength
        frame_size, 0, 0,  # dwSuggestedBufferSize / quality / sampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, frame_size * 1, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b""
    for f in range(n_frames):
        body = bytearray()
        for y in range(height - 1, -1, -1):  # bottom-up DIB rows
            body += bgr_frames[f, y].tobytes() + b"\x00" * pad
        movi_body += chunk(b"00db", bytes(body))
    riff_body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(
    payload: bytes,
) -> tuple[int, int, int, list[tuple[int, int, int]]]:
    """Parse an uncompressed AVI and return ``(width, height, n_frames,
    [(sum_b, sum_g, sum_r) per frame])`` with exact integer channel sums.
    A real container walk: RIFF form check, nested LIST traversal with
    word-aligned chunk skipping (JUNK/INFO chunks pass through), ``avih``
    geometry, ``strf`` validated as 24-bit uncompressed, and one
    bottom-up padded BGR DIB decode per ``00db`` frame chunk; compressed
    ``00dc`` frames are rejected rather than misread."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF payload")

    avih = None
    strf = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal avih, strf
        while pos + 8 <= end:
            tag = payload[pos:pos + 4]
            (length,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if body_start + length > end:
                raise ValueError(f"truncated AVI chunk {tag!r}")
            if tag == b"LIST":
                walk(body_start + 4, body_start + length)  # skip form fourcc
            elif tag == b"avih":
                if length < 56:  # declared size must cover the unpack
                    raise ValueError("short AVI avih chunk")
                avih = struct.unpack_from("<14I", payload, body_start)
            elif tag == b"strf":
                if length < 20:
                    raise ValueError("short AVI strf chunk")
                strf = struct.unpack_from("<IiiHHI", payload, body_start)
            elif tag == b"00db":
                frames.append(payload[body_start:body_start + length])
            elif tag == b"00dc":
                raise ValueError(
                    "compressed AVI frames (00dc) are not supported"
                )
            pos = body_start + length + (length % 2)  # word alignment

    walk(12, 8 + riff_size)
    if avih is None:
        raise ValueError("AVI missing avih header")
    n_frames, width, height = avih[4], avih[8], avih[9]
    if strf is not None:
        _, _, _, _, bpp, compression = strf
        if bpp != 24 or compression != 0:
            raise ValueError(
                f"unsupported AVI frame format: bpp={bpp} comp={compression}"
            )
    if width <= 0 or height <= 0:
        raise ValueError("degenerate AVI dimensions")
    if len(frames) != n_frames:
        raise ValueError(
            f"AVI frame count mismatch: header says {n_frames}, "
            f"movi carries {len(frames)}"
        )
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    out = []
    for data in frames:
        if len(data) < stride * height:
            raise ValueError("truncated AVI frame data")
        sums = np.zeros(3, dtype=np.int64)
        for y in range(height):
            row = np.frombuffer(
                data, dtype=np.uint8, count=row_bytes, offset=y * stride
            )
            sums += row.reshape(width, 3).sum(axis=0, dtype=np.int64)
        out.append((int(sums[0]), int(sums[1]), int(sums[2])))
    return width, height, n_frames, out


def synth_avi_media(
    docs: DataFrame,
    width: int = 5,
    height: int = 4,
    n_frames: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic REAL AVI payloads, one per doc: pixel (x, y) of
    frame ``f`` of doc ``d`` is ``B=(7d+3x+5y+11f)%256,
    G=(d+x+y+f)%256, R=(13d+x+2y+3f)%256`` — the BMP generator extended
    with a frame term (frame 0 IS the BMP image, a free cross-codec
    check), closed-form so the DuckDB oracle evaluates it over a
    3-D ``generate_series`` without touching a codec."""
    import numpy as np

    fs, ys, xs = np.mgrid[0:n_frames, 0:height, 0:width]
    return _synth_media(
        docs,
        id_col,
        lambda d: encode_avi(width, height, _gen_bgr(d, xs, ys, fs)),
    )


FRAME_STATS_SCHEMA = (
    "media_id long, width int, height int, n_frames int, frame_idx int, "
    "sum_b long, sum_g long, sum_r long"
)


def video_frame_stats(
    media: DataFrame, every_n: int = 2, on_error: str = "raise"
) -> DataFrame:
    """REAL end-to-end video decode with frame sampling: parse each AVI
    payload once, keep every ``every_n``-th frame, and FAN OUT to one
    output row per sampled frame with exact integer channel sums —
    the decode-then-explode shape :func:`frame_sample` stubs, made real.
    Arrow-batched; output rows per input row = ceil(n_frames/every_n),
    bounded by the container's own frame count. ``on_error`` follows the
    :func:`image_pixel_stats` audit contract (``"null"`` → a corrupt
    container yields ONE null-stats row, not an exception)."""
    _check_on_error(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, n, frames = decode_avi(p)
                except ValueError:
                    if on_error == "raise":
                        raise
                    rows.append(
                        (mid, None, None, None, None, None, None, None)
                    )
                    continue
                for f in range(0, n, every_n):
                    sb, sg, sr = frames[f]
                    rows.append((mid, w, h, n, f, sb, sg, sr))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_frames", "frame_idx",
                    "sum_b", "sum_g", "sum_r",
                ],
            )

    return media.mapInPandas(run, schema=FRAME_STATS_SCHEMA)


def synth_bmp_media(
    docs: DataFrame,
    width: int = 5,
    height: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic REAL BMP payloads, one per doc: pixel (x, y) of image
    ``d`` is ``B=(7d+3x+5y)%256, G=(d+x+y)%256, R=(13d+x+2y)%256`` — a
    closed-form generator the DuckDB oracle can evaluate analytically, so
    the scored query exercises true bytes-level encode→decode while the
    oracle never needs a codec. Width 5 forces a nonzero row pad (15 →
    16 bytes), keeping the padding logic under test.

    Generation rides the shared :func:`_synth_media` scaffold over the
    shared :func:`_gen_bgr` generator."""
    import numpy as np

    ys, xs = np.mgrid[0:height, 0:width]
    return _synth_media(
        docs,
        id_col,
        lambda d: encode_bmp(width, height, _gen_bgr(d, xs, ys)),
    )


BMP_STATS_SCHEMA = (
    "media_id long, width int, height int, n_pixels int, "
    "sum_b long, sum_g long, sum_r long, mean_r_milli long"
)


def image_pixel_stats(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL end-to-end decode: parse each image payload (BMP, P6 PPM, or
    truecolor PNG, dispatched on magic bytes) and emit exact integer
    channel sums plus a floor-quantized mean — all-integer output, so the
    value hash against the analytic oracle is bit-exact. 1:1 row
    contract, Arrow-batched; decode parallelism == partition count
    (repartition by a content-hash prefix upstream when blob sizes are
    skewed).

    ``on_error``: ``"raise"`` fails the job on the first malformed
    payload (the strict scored contract over trusted synthetic data);
    ``"null"`` is the 100 TB audit mode — a corrupt blob yields its
    media_id with NULL stats (a report row, not a dead task), so one bad
    object can't kill a million-row partition and the null rows ARE the
    corruption audit."""
    _check_on_error(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, (sb, sg, sr) = decode_image(p)
                except ValueError:
                    if on_error == "raise":
                        raise
                    rows.append(
                        (mid, None, None, None, None, None, None, None)
                    )
                    continue
                n = w * h
                rows.append(
                    (mid, w, h, n, sb, sg, sr, (sr * 1000) // n)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels",
                    "sum_b", "sum_g", "sum_r", "mean_r_milli",
                ],
            )

    return media.mapInPandas(run, schema=BMP_STATS_SCHEMA)


def _check_on_error(on_error: str) -> None:
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")


# original name, kept for BMP-only call sites
bmp_pixel_stats = image_pixel_stats


def synth_ppm_media(
    docs: DataFrame,
    width: int = 5,
    height: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic REAL P6 PPM payloads from the SAME closed-form pixel
    generator as :func:`synth_bmp_media` — identical channel values in
    the structurally opposite container (top-down unpadded RGB vs
    bottom-up padded BGR), so both codecs score against one shared
    analytic oracle and must agree with each other."""
    import numpy as np

    ys, xs = np.mgrid[0:height, 0:width]
    return _synth_media(
        docs,
        id_col,
        lambda d: encode_ppm(width, height, _gen_bgr(d, xs, ys)[..., ::-1]),
    )


def _decode_fake(kind: str, payload: bytes) -> list[float]:
    """Deterministic fake 'features': first 8 bytes of the md5 digest scaled
    to [0,1] — md5 keeps the whole path expressible in SQL for the oracle."""
    digest = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    Batch shape contract: each input pandas DataFrame carries bytes objects in
    'payload'; output rows align 1:1 with input (no fan-out here — frame
    sampling would fan out with an explode after this stage)."""
    decode = _decode_fake if decode_stub else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            # feat_mean computed as int-sum / (255*dim): one exact integer sum
            # then one float division → bit-identical across engines.
            digests = [hashlib.md5(p or b"").digest()[:8] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "content_hash": [
                        hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feat_mean": [
                        sum(d) / (255.0 * len(d)) for d in digests
                    ],
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: fan out video rows to one row per sampled
    frame index (the decode of each frame is the stubbed step)."""
    # zero-frame / missing-frame-count videos are legal inputs (see
    # _decode_real) and must emit NO sampled frames — without the filter,
    # greatest(n_frames-1, 0) turns the empty range into sequence(0,0)
    # = [0], a phantom frame_idx=0 row pointing into an empty container
    vids = media.filter(
        (F.col("kind") == "video") & (F.col("meta.n_frames") > 0)
    )
    idx = F.sequence(
        F.lit(0),
        F.col("meta.n_frames") - 1,
        F.lit(every_n),
    )
    return vids.select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
        F.col("meta.n_frames").alias("n_frames"),
    )


RESIZED_SCHEMA = (
    "media_id long, kind string, out_width int, out_height int, "
    "scale_x double, scale_y double, resized_hash string"
)

RESIZE_STATS_SCHEMA = (
    "media_id long, out_width int, out_height int, "
    "sum_b long, sum_g long, sum_r long, payload binary"
)


def nn_resize(px, out_w: int, out_h: int):
    """Nearest-neighbor resample of a (h, w, 3) array: output pixel
    (ox, oy) samples source pixel ``(ox*w // out_w, oy*h // out_h)`` —
    pure integer index math, so the oracle can evaluate the sampled
    generator analytically."""
    import numpy as np

    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[np.ix_(ys, xs)]


def resize_images_real(
    media: DataFrame,
    out_width: int = 3,
    out_height: int = 2,
    on_error: str = "raise",
) -> DataFrame:
    """REAL end-to-end resize for natively-decodable BMP payloads:
    decode to the pixel array, nearest-neighbor resample, re-encode as a
    BMP payload, and emit the resized image's exact integer channel sums
    — the full decode → transform → re-encode loop a multimodal pipeline
    runs, with the integer sampling rule keeping the scored stats
    analytic (no codec in the oracle). 1:1 Arrow-batched contract like
    :func:`image_pixel_stats`, including its ``on_error`` audit mode
    (``"null"`` → a corrupt payload yields a null-stats/null-payload
    report row); formats needing codec libraries stay on the stubbed
    :func:`resize_images` path."""
    import numpy as np

    _check_on_error(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _, _, _, px = decode_bmp_pixels(p)
                except ValueError:
                    if on_error == "raise":
                        raise
                    rows.append((mid, None, None, None, None, None, None))
                    continue
                rp = nn_resize(px, out_width, out_height)
                sums = rp.sum(axis=(0, 1), dtype=np.int64)
                rows.append(
                    (
                        mid, out_width, out_height,
                        int(sums[0]), int(sums[1]), int(sums[2]),
                        encode_bmp(out_width, out_height, rp),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "out_width", "out_height",
                    "sum_b", "sum_g", "sum_r", "payload",
                ],
            )

    return media.mapInPandas(run, schema=RESIZE_STATS_SCHEMA)


def resize_images(
    media: DataFrame,
    out_width: int = 32,
    out_height: int = 32,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize plumbing for image rows: Arrow-batched ``mapInPandas`` with a
    1:1 row contract, emitting the output geometry, the scale factors from
    the metadata dims, and a digest standing in for the resized payload.

    The pixel resample itself is the stubbed codec step (``decode_stub=False``
    raises where Pillow would be called); everything Spark-side — the image
    filter pushed to the scan, batch iteration, schema, scale math — is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                for k, p in zip(pdf["kind"], pdf["payload"]):
                    _decode_real(k, p)  # raises NotImplementedError
            widths = [m["width"] if m else None for m in pdf["meta"]]
            heights = [m["height"] if m else None for m in pdf["meta"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "out_width": out_width,
                    "out_height": out_height,
                    "scale_x": [
                        (out_width / w) if w else None for w in widths
                    ],
                    "scale_y": [
                        (out_height / h) if h else None for h in heights
                    ],
                    # stub stand-in for the resized payload: digest of the
                    # original payload + output geometry (deterministic)
                    "resized_hash": [
                        hashlib.md5(
                            (p or b"")
                            + f"|{out_width}x{out_height}".encode()
                        ).hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video travel as ``binary`` columns with a metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages so the payload bytes never round-trip
through per-row Python.

Decode support is stdlib-real where the stdlib can parse the format —
8-bit PNG (zlib inflate + full five-filter unfiltering + CRC checks),
uncompressed 24-bit BMP, PCM WAV — and STUBBED for codec formats
(JPEG/MP3/MP4: no image/audio libs in this container): ``decode_media``
raises ``NotImplementedError`` unless a ``decoder`` callable is
injected; ``fake_features`` is the deterministic stand-in (byte
histogram) used by tests/benchmarks so the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
exercised end-to-end either way.

Scale notes: payload columns dominate bytes, so (a) metadata-only queries
must prune the payload column at the scan (select before mapInPandas);
(b) feature extraction repartitions by a size-balanced key first so one
executor doesn't get all the 100 MB videos; (c) the feature output is a
fixed-width array<float> — friendly to the similarity operators.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

N_FEATURES = 16


def media_from_documents(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table derived from a text table — payload =
    utf-8 bytes, metadata derived from content. Lets every multimodal code
    path run on the provided testdata."""
    t = F.col("text")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        t.cast("binary").alias("payload"),
        F.struct(
            (F.length(t) % 1920).cast("int").alias("width"),
            (F.length(t) % 1080).cast("int").alias("height"),
            (F.length(t) * 40).cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def payload_stats(df: DataFrame) -> DataFrame:
    """Metadata-scale accounting — prunes the payload column except for the
    two cheap byte-level exprs, which stay JVM-side."""
    return df.select(
        "media_id",
        "kind",
        F.length("payload").alias("payload_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.col("meta.width").alias("width"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def fake_features(payload: bytes, n: int = N_FEATURES) -> list:
    """Deterministic stand-in for a real decoder+embedder: coarse byte
    histogram, L1-normalized."""
    counts = [0] * n
    for b in payload:
        counts[b % n] += 1
    total = float(sum(counts)) or 1.0
    return [c / total for c in counts]


def decode_media(payload: bytes, kind: str, mime: str):
    """General media decode — NOT IMPLEMENTED in this container (no
    PIL/ffmpeg/librosa). Inject a ``decoder`` into :func:`extract_features`
    in a real deployment. For the formats the Python stdlib CAN parse
    (8-bit PNG via zlib + full unfiltering, GIF via full LZW decode,
    uncompressed 24-bit BMP, PCM WAV) use :func:`stdlib_media_decoder` —
    it exercises the whole decode seam with real decoders."""
    raise NotImplementedError(
        f"media decode for kind={kind!r} mime={mime!r} requires image/audio "
        "libraries not present in this environment; pass decoder= explicitly"
    )


# --------------------------------------------------------------------------
# stdlib decoders: real (non-fake) decode paths with zero dependencies —
# uncompressed 24-bit BMP via struct, PCM WAV via the `wave` module. They
# exist so the decoder-injection seam is tested end-to-end with genuine
# byte parsing, not only the deterministic fake.
# --------------------------------------------------------------------------


def decode_bmp(payload: bytes):
    """(width, height, rows) for an uncompressed 24-bit BMP; ``rows`` is
    top-down, each row a list of (b, g, r) tuples."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24bpp supported, got {bpp}bpp")
    row_size = (width * 3 + 3) // 4 * 4
    rows = []
    for y in range(abs(height)):
        base = pixel_off + y * row_size
        rows.append(
            [
                tuple(payload[base + 3 * x: base + 3 * x + 3])
                for x in range(width)
            ]
        )
    if height > 0:
        rows.reverse()  # positive height means bottom-up pixel storage
    return width, abs(height), rows


def encode_bmp(rows) -> bytes:
    """Inverse of :func:`decode_bmp` (top-down rows of (b, g, r))."""
    import struct

    height = len(rows)
    width = len(rows[0]) if rows else 0
    row_size = (width * 3 + 3) // 4 * 4
    pixels = bytearray()
    for row in reversed(rows):  # stored bottom-up
        line = bytearray()
        for b, g, r in row:
            line += bytes((b, g, r))
        line += b"\x00" * (row_size - len(line))
        pixels += line
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    return bytes(header + pixels)


# --------------------------------------------------------------------------
# PNG (stdlib-only): real chunk walk + CRC verification + zlib inflate +
# full five-filter unfiltering per the PNG spec (RFC 2083 §6). Supports
# 8-bit non-interlaced grayscale / RGB / gray+alpha / RGBA — the shapes a
# synthetic-or-screenshot corpus actually contains. JPEG/MP3/MP4 remain
# behind the documented NotImplementedError seam (no codec libs here).
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes):
    """(width, height, channels, rows) for an 8-bit non-interlaced PNG.
    ``rows`` is top-down; each row a list of per-pixel channel tuples.
    Chunk CRCs are verified; IDAT chunks are concatenated before the one
    zlib inflate; all five scanline filters (None/Sub/Up/Average/Paeth)
    are reversed per spec."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(payload[pos + 4: pos + 8 + ln]) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR chunk")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced gray/RGB/RGBA supported "
            f"(depth={depth}, color_type={color}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    rows, prior, off = [], bytearray(stride), 0
    for _y in range(h):
        ftype = raw[off]
        line = bytearray(raw[off + 1: off + 1 + stride])
        off += 1 + stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prior[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prior[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prior = line
        rows.append(
            [tuple(line[x * ch: (x + 1) * ch]) for x in range(w)]
        )
    return w, h, ch, rows


def encode_png(rows, color_type: int = 2, filter_cycle: bool = True) -> bytes:
    """Inverse of :func:`decode_png` for fixture generation. ``rows`` is
    top-down per-pixel channel tuples. With ``filter_cycle`` each
    scanline y uses filter type y % 5 (forward-filtered per spec), so a
    round-trip exercises every unfilter path; otherwise filter 0."""
    import struct
    import zlib

    h = len(rows)
    w = len(rows[0]) if h else 0
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = bytearray()
    prior = bytearray(stride)
    for y in range(h):
        line = bytearray()
        for px in rows[y]:
            line += bytes(px)
        ftype = (y % 5) if filter_cycle else 0
        filt = bytearray(stride)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = prior[i]
            elif ftype == 3:
                pred = (left + prior[i]) >> 1
            else:
                ul = prior[i - ch] if i >= ch else 0
                pred = _paeth(left, prior[i], ul)
            filt[i] = (line[i] - pred) & 0xFF
        raw += bytes([ftype]) + filt
        prior = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def png_pixel_value(media_id: int, x: int, y: int, c: int) -> int:
    """THE fixture pixel formula — shared contract between the Spark-side
    encoder (:func:`png_media_from_ids`) and the SQL oracle, which
    recomputes per-channel sums from it. Any decode bug breaks the gate."""
    return (media_id * 3 + 7 * x + 13 * y + 31 * c) % 256


def png_media_from_ids(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic RGB PNG media table: dims (8 + id%16, 4 + id%8),
    pixels from :func:`png_pixel_value`, scanline filters cycling through
    all five types. Encoding runs Arrow-batched in mapInPandas — the same
    plumbing shape a real ingest decoder uses, in reverse."""
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 8 + mid % 16, 4 + mid % 8
                rows = [
                    [
                        tuple(
                            png_pixel_value(mid, x, y, c) for c in range(3)
                        )
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                payloads.append(encode_png(rows, color_type=2))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "mime": "image/png",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(
        run,
        schema="media_id long, kind string, mime string, payload binary",
    )


# ---- GIF: full LZW decoder + a literal-code encoder for fixtures --------

_GIF_PALETTE_OFFSETS = (0, 85, 170)


def gif_palette_entry(i: int):
    """THE fixture palette — entry i = (i, i+85, i+170) mod 256; shared
    with the SQL oracle like :func:`png_pixel_value`."""
    return tuple((i + off) % 256 for off in _GIF_PALETTE_OFFSETS)


def gif_index_value(media_id: int, x: int, y: int) -> int:
    """THE fixture pixel-index formula (palette index per pixel)."""
    return (media_id * 3 + 7 * x + 13 * y) % 256


def decode_gif(payload: bytes):
    """(width, height, rows) for a non-interlaced single-frame GIF87a/89a;
    ``rows`` is top-down, each row a list of (r, g, b) tuples.

    Full LZW decode — variable code width, CLEAR/EOI handling, KwKwK
    case, table growth to 12 bits — so it reads any conforming encoder's
    output, not just :func:`encode_gif`'s literal-code stream."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a magic)")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if not flags & 0x80:
        raise ValueError("GIF without a global color table unsupported")
    gct = 2 ** ((flags & 0x07) + 1)
    palette = [
        tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(gct)
    ]
    pos += 3 * gct
    while True:  # skip extensions up to the first image descriptor
        b = payload[pos]
        if b == 0x21:
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:
            break
        elif b == 0x3B:
            raise ValueError("GIF trailer before any image data")
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    _ix, _iy, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
    pos += 10
    if iflags & 0x40:
        raise ValueError("interlaced GIF unsupported")
    if iflags & 0x80:
        lct = 2 ** ((iflags & 0x07) + 1)
        palette = [
            tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(lct)
        ]
        pos += 3 * lct
    min_code = payload[pos]
    pos += 1
    data = bytearray()
    while payload[pos]:
        n = payload[pos]
        data += payload[pos + 1 : pos + 1 + n]
        pos += n + 1

    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table: dict = {}
    code_size = min_code + 1
    next_code = eoi + 1
    prev = None

    def reset():
        nonlocal table, code_size, next_code, prev
        table = {i: (i,) for i in range(clear)}
        code_size = min_code + 1
        next_code = eoi + 1
        prev = None

    reset()
    indices: list = []
    acc = nbits = 0
    done = False
    for byte in data:
        if done:
            break
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                reset()
                continue
            if code == eoi:
                done = True
                break
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + (entry[0],)
                next_code += 1
            elif code == next_code:  # KwKwK
                entry = prev + (prev[0],)
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            indices.extend(entry)
            prev = entry
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
    if len(indices) < iw * ih:
        raise ValueError(
            f"GIF pixel data truncated: {len(indices)} < {iw * ih}"
        )
    rows = [
        [palette[indices[y * iw + x]] for x in range(iw)] for y in range(ih)
    ]
    return iw, ih, rows


def encode_gif(index_rows, palette) -> bytes:
    """Inverse of :func:`decode_gif` for fixture generation: a single-
    frame GIF87a with a 256-entry global color table. The LZW stream uses
    literal codes with a CLEAR every 250 pixels, so the code width stays
    at min+1 bits — valid LZW that any decoder (including the full one
    above) reads back exactly."""
    import struct

    h = len(index_rows)
    w = len(index_rows[0]) if h else 0
    pal = list(palette) + [(0, 0, 0)] * (256 - len(palette))
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    code_size = min_code + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i, idx in enumerate(px for row in index_rows for px in row):
        if i and i % 250 == 0:
            emit(clear)
        emit(idx)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)

    blocks = bytearray()
    for off in range(0, len(out), 255):
        chunk = out[off : off + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"

    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        + b"".join(bytes(p) for p in pal)
        + b"\x2C"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
        + blocks
        + b"\x3B"
    )


def gif_media_from_ids(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic palette-indexed GIF media table: dims (8 + id%16,
    4 + id%8), pixel index from :func:`gif_index_value`, colors from
    :func:`gif_palette_entry` — same Arrow-batched mapInPandas plumbing
    as :func:`png_media_from_ids`."""
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        palette = [gif_palette_entry(i) for i in range(256)]
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 8 + mid % 16, 4 + mid % 8
                rows = [
                    [gif_index_value(mid, x, y) for x in range(w)]
                    for y in range(h)
                ]
                payloads.append(encode_gif(rows, palette))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "mime": "image/gif",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(
        run,
        schema="media_id long, kind string, mime string, payload binary",
    )


# ---- JPEG: baseline sequential DCT decoder (stdlib only) ----------------
#
# The decoder is GENERAL for baseline JPEGs: canonical Huffman tables
# built from the file's own DHT segments (so it reads any conforming
# encoder's tables, not just ours), byte-unstuffing, restart markers,
# chroma subsampling up to 2×2 (4:2:0 / 4:2:2 / 4:4:4 MCU interleave,
# replicated upsampling), dequantize, zigzag, float IDCT, level shift.
# The fixture encoder keeps its embedded tables simple (all DC symbols at
# 4 bits, all 162 AC symbols at 8 bits — valid canonical tables) and uses
# an all-ones quant table, so constant 8×8 tiles decode BIT-EXACTLY
# (DC-only blocks: IDCT(DC)/8 == the tile value) and the SQL oracle can
# certify the decode with exact integer sums, JPEG's lossiness
# notwithstanding. General (AC-bearing) content round-trips within ±1
# (IDCT rounding) — pinned by unit test.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_cos_table():
    import math

    return [
        [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
        for x in range(8)
    ]


_JPEG_COS = _jpeg_cos_table()
_JPEG_C = [0.7071067811865476] + [1.0] * 7  # 1/sqrt(2) for u == 0


def _idct_block(coef):
    """Float 2-D IDCT of an 8×8 coefficient block (row-major), separable
    (two 1-D passes)."""
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _JPEG_C[u] * coef[y * 8 + u] * _JPEG_COS[x][u]
            tmp[y][x] = s / 2.0
    out = [[0] * 8 for _ in range(8)]
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _JPEG_C[v] * tmp[v][x] * _JPEG_COS[y][v]
            px = int(round(s / 2.0)) + 128
            out[y][x] = 0 if px < 0 else (255 if px > 255 else px)
    return out


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; surfaces RST markers to the MCU loop."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} in entropy data"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def bit(self) -> int:
        return self.bits(1)


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _huff_decode(reader, table):
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def decode_jpeg(payload: bytes):
    """(width, height, n_components, rows) for a baseline sequential JPEG
    with 1 (grayscale) or 3 (YCbCr 4:4:4) components; ``rows`` is
    top-down, each pixel a tuple of component values (RGB for color).
    Raises on progressive/subsampled/arithmetic variants."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict = {}
    huff: dict = {}
    comps = None
    w = h = 0
    restart_interval = 0
    scan_comps = None
    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before scan data")
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq:
                    vals = [
                        int.from_bytes(seg[off + 2 * i : off + 2 * i + 2],
                                       "big")
                        for i in range(64)
                    ]
                    off += 128
                else:
                    vals = list(seg[off : off + 64])
                    off += 64
                qt[tq] = vals
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            n = seg[5]
            comps = []
            for i in range(n):
                cid, sampling, tq = seg[6 + 3 * i : 9 + 3 * i]
                hi, vi = sampling >> 4, sampling & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(
                        f"sampling factors {hi}x{vi} unsupported (max 2x2)"
                    )
                comps.append((cid, tq, hi, vi))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                counts = list(seg[off + 1 : off + 17])
                nsym = sum(counts)
                syms = list(seg[off + 17 : off + 17 + nsym])
                off += 17 + nsym
                table = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tables = seg[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cid, tables >> 4, tables & 0x0F))
            pos += seglen
            break
        pos += seglen
    if comps is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")

    cmap = {cid: (tq, hi, vi) for cid, tq, hi, vi in comps}
    order = []
    for cid, dc_id, ac_id in scan_comps:
        tq, hi, vi = cmap[cid]
        order.append((qt[tq], huff[(0, dc_id)], huff[(1, ac_id)], hi, vi))
    hmax = max(o[3] for o in order)
    vmax = max(o[4] for o in order)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        [[0] * (mcux * hi * 8) for _ in range(mcuy * vi * 8)]
        for (_q, _d, _a, hi, vi) in order
    ]
    reader = _JpegBitReader(payload, pos)
    preds = [0] * len(order)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                # byte-align: drop buffered pad bits, consume the RSTn
                reader.acc = 0
                reader.nbits = 0
                if not (
                    reader.buf[reader.pos] == 0xFF
                    and 0xD0 <= reader.buf[reader.pos + 1] <= 0xD7
                ):
                    raise ValueError("expected restart marker")
                reader.pos += 2
                preds = [0] * len(order)
            mcu_count += 1
            for ci, (quant, dc_tab, ac_tab, hi, vi) in enumerate(order):
                for iby in range(vi):
                    for ibx in range(hi):
                        coef = [0] * 64
                        size = _huff_decode(reader, dc_tab)
                        diff = (
                            _extend(reader.bits(size), size) if size else 0
                        )
                        preds[ci] += diff
                        coef[0] = preds[ci] * quant[0]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tab)
                            run, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflows block")
                            coef[_ZIGZAG[k]] = (
                                _extend(reader.bits(sz), sz) * quant[k]
                            )
                            k += 1
                        block = _idct_block(coef)
                        oy = (my * vi + iby) * 8
                        ox = (mx * hi + ibx) * 8
                        for y in range(8):
                            row = planes[ci][oy + y]
                            for x in range(8):
                                row[ox + x] = block[y][x]

    nc = len(order)
    samp = [(hi, vi) for (_q, _d, _a, hi, vi) in order]
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            if nc == 1:
                row.append((planes[0][y][x],))
            else:
                # replicated (nearest) upsampling of subsampled chroma
                Y = planes[0][y * samp[0][1] // vmax][x * samp[0][0] // hmax]
                cb = (
                    planes[1][y * samp[1][1] // vmax][x * samp[1][0] // hmax]
                    - 128
                )
                cr = (
                    planes[2][y * samp[2][1] // vmax][x * samp[2][0] // hmax]
                    - 128
                )
                r = int(round(Y + 1.402 * cr))
                g = int(round(Y - 0.344136 * cb - 0.714136 * cr))
                b = int(round(Y + 1.772 * cb))
                clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)
                row.append((clamp(r), clamp(g), clamp(b)))
        rows.append(row)
    return w, h, nc, rows


def _fdct_block(pixels):
    """Float forward DCT of an 8×8 spatial block (level-shifted)."""
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        (pixels[y][x] - 128)
                        * _JPEG_COS[x][u]
                        * _JPEG_COS[y][v]
                    )
            out[v * 8 + u] = s * _JPEG_C[u] * _JPEG_C[v] / 4.0
    return out


def _jpeg_fixture_tables():
    """Simple VALID canonical Huffman tables for the fixture encoder: all
    12 DC size symbols at 4 bits, all 162 AC symbols at 8 bits. The
    tables travel in the file's DHT, so the general decoder reads them
    like any other encoder's."""
    dc_counts = [0] * 16
    dc_counts[3] = 12
    dc_syms = list(range(12))
    ac_counts = [0] * 16
    ac_counts[7] = 162
    ac_syms = [0x00, 0xF0] + [
        (run << 4) | sz for run in range(16) for sz in range(1, 11)
    ]
    return (dc_counts, dc_syms), (ac_counts, ac_syms)


def _huff_encode_map(counts, syms):
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            enc[syms[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return enc


def _mag_cat(v: int) -> int:
    size = 0
    a = abs(v)
    while a:
        size += 1
        a >>= 1
    return size


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def emit(self, length, code):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad(self):
        if self.nbits:
            self.emit(8 - self.nbits, (1 << (8 - self.nbits)) - 1)


def _encode_block(wr, block, pred, dc_enc, ac_enc) -> int:
    """Forward-DCT, quantize (by 1), entropy-code one 8×8 spatial block;
    returns the new DC predictor."""
    coef = [int(round(c)) for c in _fdct_block(block)]
    zz = [coef[_ZIGZAG[k]] for k in range(64)]
    diff = zz[0] - pred
    size = _mag_cat(diff)
    wr.emit(*dc_enc[size])
    if size:
        wr.emit(size, diff if diff >= 0 else diff + (1 << size) - 1)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            wr.emit(*ac_enc[0xF0])
            run -= 16
        v = zz[k]
        sz = _mag_cat(v)
        wr.emit(*ac_enc[(run << 4) | sz])
        wr.emit(sz, v if v >= 0 else v + (1 << sz) - 1)
        run = 0
    if last_nz < 63:
        wr.emit(*ac_enc[0x00])  # EOB
    return zz[0]


def _clip_block(pixels, bx, by, w, h):
    return [
        [
            pixels[min(by * 8 + y, h - 1)][min(bx * 8 + x, w - 1)]
            for x in range(8)
        ]
        for y in range(8)
    ]


def encode_jpeg_gray(pixels) -> bytes:
    """Inverse of :func:`decode_jpeg` for grayscale fixtures: baseline
    SOF0, all-ones quant table (so DC-only constant tiles round-trip
    bit-exactly), the simple canonical tables above, full run/size AC
    coding for general content. ``pixels`` is rows of 0-255 ints."""
    import struct

    h = len(pixels)
    w = len(pixels[0]) if h else 0
    (dc_c, dc_s), (ac_c, ac_s) = _jpeg_fixture_tables()
    dc_enc = _huff_encode_map(dc_c, dc_s)
    ac_enc = _huff_encode_map(ac_c, ac_s)

    wr = _JpegBitWriter()
    pred = 0
    bw, bh = (w + 7) // 8, (h + 7) // 8
    for by in range(bh):
        for bx in range(bw):
            pred = _encode_block(
                wr, _clip_block(pixels, bx, by, w, h), pred, dc_enc, ac_enc
            )
    wr.pad()
    out = wr.out

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
              + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_c) + bytes(dc_s)) + seg(
        0xC4, bytes([0x10]) + bytes(ac_c) + bytes(ac_s)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xFF\xD8" + dqt + sof + dht + sos + bytes(out) + b"\xFF\xD9"
    )


def encode_jpeg_color420(y_rows, cb_rows, cr_rows) -> bytes:
    """Baseline 4:2:0 YCbCr encoder — the testing twin of the subsampled
    decode path. Y at full resolution, Cb/Cr at half (ceil(w/2) ×
    ceil(h/2)); MCU interleave = 4 Y blocks + 1 Cb + 1 Cr; all-ones
    quant table and the simple canonical Huffman tables."""
    import struct

    h = len(y_rows)
    w = len(y_rows[0]) if h else 0
    cw, chh = (w + 1) // 2, (h + 1) // 2
    if len(cb_rows) != chh or len(cb_rows[0]) != cw or \
            len(cr_rows) != chh or len(cr_rows[0]) != cw:
        raise ValueError(
            f"chroma planes must be {cw}x{chh} for a {w}x{h} image"
        )
    (dc_c, dc_s), (ac_c, ac_s) = _jpeg_fixture_tables()
    dc_enc = _huff_encode_map(dc_c, dc_s)
    ac_enc = _huff_encode_map(ac_c, ac_s)

    wr = _JpegBitWriter()
    preds = [0, 0, 0]
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    for my in range(mcuy):
        for mx in range(mcux):
            for iby in range(2):
                for ibx in range(2):
                    preds[0] = _encode_block(
                        wr,
                        _clip_block(y_rows, mx * 2 + ibx, my * 2 + iby, w, h),
                        preds[0], dc_enc, ac_enc,
                    )
            preds[1] = _encode_block(
                wr, _clip_block(cb_rows, mx, my, cw, chh),
                preds[1], dc_enc, ac_enc,
            )
            preds[2] = _encode_block(
                wr, _clip_block(cr_rows, mx, my, cw, chh),
                preds[2], dc_enc, ac_enc,
            )
    wr.pad()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_c) + bytes(dc_s)) + seg(
        0xC4, bytes([0x10]) + bytes(ac_c) + bytes(ac_s)
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (
        b"\xFF\xD8" + dqt + sof + dht + sos + bytes(wr.out) + b"\xFF\xD9"
    )


def jpeg_tile_value(media_id: int, tx: int, ty: int) -> int:
    """THE fixture tile formula — constant value of the 8×8 tile at tile
    coords (tx, ty); shared with the SQL oracle. Constant tiles are
    DC-only, which baseline JPEG stores exactly under an all-ones quant
    table, so the decode is certifiable with exact integer sums."""
    return (media_id * 5 + 11 * tx + 17 * ty) % 256


def jpeg_media_from_ids(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic grayscale JPEG media table: dims 8·(1 + id%3) ×
    8·(1 + id%2), pixels = constant 8×8 tiles from
    :func:`jpeg_tile_value` — same Arrow-batched mapInPandas plumbing as
    the PNG/GIF fixtures."""
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
                px = [
                    [
                        jpeg_tile_value(mid, x // 8, y // 8)
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                payloads.append(encode_jpeg_gray(px))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "mime": "image/jpeg",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(
        run,
        schema="media_id long, kind string, mime string, payload binary",
    )


# ---- MP4: ISO-BMFF container parsing (stdlib only) -----------------------
#
# Real box-tree parsing — ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/stbl
# (stsd fourcc, stts, stsz, stco/co64) — so video "frame sampling" can
# target genuine per-sample byte ranges instead of synthetic metadata.
# CODEC decode (h264 etc.) remains the documented NotImplementedError
# seam; the container layer is fully real and oracle-gated.


def parse_mp4(payload: bytes):
    """Parse an ISO-BMFF (MP4) container. Returns a dict with
    ``brand``, ``duration_ms``, and ``tracks`` — each track a dict with
    handler, codec fourcc, width/height (video), sample_sizes and
    chunk_offsets from the sample tables. Raises ValueError on
    non-MP4 payloads or truncated boxes."""
    import struct

    def boxes(buf, start, end):
        pos = start
        while pos + 8 <= end:
            size, btype = struct.unpack_from(">I4s", buf, pos)
            hdr = 8
            if size == 1:
                size = struct.unpack_from(">Q", buf, pos + 8)[0]
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError(f"truncated MP4 box {btype!r} at {pos}")
            yield btype, pos + hdr, pos + size
            pos += size

    top = list(boxes(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an MP4 payload (missing ftyp)")
    brand = payload[top[0][1] : top[0][1] + 4].decode("ascii", "replace")

    out = {"brand": brand, "duration_ms": None, "tracks": []}
    CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

    def walk(start, end, track):
        import struct as _s

        for btype, bstart, bend in boxes(payload, start, end):
            if btype == b"mvhd":
                ver = payload[bstart]
                if ver == 1:
                    ts, dur = _s.unpack_from(">IQ", payload, bstart + 20)
                else:
                    ts, dur = _s.unpack_from(">II", payload, bstart + 12)
                out["duration_ms"] = int(dur * 1000 / ts) if ts else 0
            elif btype == b"trak":
                t = {
                    "handler": None, "codec": None, "width": None,
                    "height": None, "sample_sizes": [],
                    "chunk_offsets": [], "timescale": None,
                    "sample_deltas": [],
                }
                walk(bstart, bend, t)
                out["tracks"].append(t)
            elif btype in CONTAINERS:
                walk(bstart, bend, track)
            elif track is None:
                continue
            elif btype == b"tkhd":
                ver = payload[bstart]
                off = bend - 8  # width/height are the last 8 bytes
                wq, hq = _s.unpack_from(">II", payload, off)
                track["width"] = wq >> 16
                track["height"] = hq >> 16
            elif btype == b"mdhd":
                ver = payload[bstart]
                ts = _s.unpack_from(
                    ">I", payload, bstart + (20 if ver == 1 else 12)
                )[0]
                track["timescale"] = ts
            elif btype == b"hdlr":
                track["handler"] = payload[bstart + 8 : bstart + 12].decode(
                    "ascii", "replace"
                )
            elif btype == b"stsd":
                n = _s.unpack_from(">I", payload, bstart + 4)[0]
                if n:
                    track["codec"] = payload[
                        bstart + 12 : bstart + 16
                    ].decode("ascii", "replace")
            elif btype == b"stts":
                n = _s.unpack_from(">I", payload, bstart + 4)[0]
                track["sample_deltas"] = [
                    _s.unpack_from(">II", payload, bstart + 8 + 8 * i)
                    for i in range(n)
                ]
            elif btype == b"stsz":
                fixed, n = _s.unpack_from(">II", payload, bstart + 4)
                if fixed:
                    track["sample_sizes"] = [fixed] * n
                else:
                    track["sample_sizes"] = list(
                        _s.unpack_from(f">{n}I", payload, bstart + 12)
                    )
            elif btype == b"stco":
                n = _s.unpack_from(">I", payload, bstart + 4)[0]
                track["chunk_offsets"] = list(
                    _s.unpack_from(f">{n}I", payload, bstart + 8)
                )
            elif btype == b"co64":
                n = _s.unpack_from(">I", payload, bstart + 4)[0]
                track["chunk_offsets"] = list(
                    _s.unpack_from(f">{n}Q", payload, bstart + 8)
                )

    for btype, bstart, bend in top:
        if btype == b"moov":
            walk(bstart, bend, None)
    return out


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", len(payload) + 8) + btype + payload


def encode_mp4_stub(
    sample_sizes, duration_ms, width, height, codec=b"avc1"
) -> bytes:
    """Minimal VALID single-video-track MP4 for fixtures: full box tree
    (ftyp, moov[mvhd, trak[tkhd, mdia[mdhd, hdlr, minf[stbl[stsd, stts,
    stsc, stsz, stco]]]]], mdat) with one chunk holding all samples.
    The mdat bytes are a deterministic pattern; codec DATA is fake — the
    container structure is what :func:`parse_mp4` certifies."""
    import struct

    ts = 1000  # 1 tick = 1 ms
    n = len(sample_sizes)
    delta = duration_ms // n if n else 0
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, ts, duration_ms)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _mp4_box(
        b"tkhd",
        struct.pack(">I", 7) + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration_ms) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _mp4_box(
        b"mdhd",
        struct.pack(">IIIII", 0, 0, 0, ts, duration_ms)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _mp4_box(
        b"hdlr", struct.pack(">II", 0, 0) + b"vide" + b"\x00" * 12 + b"v\x00"
    )
    stsd_entry = _mp4_box(codec, b"\x00" * 6 + struct.pack(">H", 1))
    stsd = _mp4_box(b"stsd", struct.pack(">II", 0, 1) + stsd_entry)
    stts = _mp4_box(b"stts", struct.pack(">IIII", 0, 1, n, delta))
    stsc = _mp4_box(b"stsc", struct.pack(">IIIII", 0, 1, 1, max(n, 1), 1))
    stsz = _mp4_box(
        b"stsz",
        struct.pack(">III", 0, 0, n) + struct.pack(f">{n}I", *sample_sizes),
    )
    mdat_payload = bytes(
        (7 * i + j) % 256
        for i, sz in enumerate(sample_sizes)
        for j in range(sz)
    )
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isommp42")
    # stco needs the mdat payload offset: compute moov size with a
    # placeholder first (offset width is fixed, so sizes don't change)
    def build_moov(mdat_off):
        stco = _mp4_box(b"stco", struct.pack(">II", 0, 1)
                        + struct.pack(">I", mdat_off))
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _mp4_box(b"vmhd", struct.pack(">I", 1)
                        + struct.pack(">HHHH", 0, 0, 0, 0))
        dref = _mp4_box(
            b"dref",
            struct.pack(">II", 0, 1) + _mp4_box(b"url ",
                                                struct.pack(">I", 1)),
        )
        dinf = _mp4_box(b"dinf", dref)
        minf = _mp4_box(b"minf", vmhd + dinf + stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        trak = _mp4_box(b"trak", tkhd + mdia)
        return _mp4_box(b"moov", mvhd + trak)

    moov_len = len(build_moov(0))
    mdat_off = len(ftyp) + moov_len + 8  # +8 = mdat box header
    return (
        ftyp + build_moov(mdat_off) + _mp4_box(b"mdat", mdat_payload)
    )


def mp4_media_from_ids(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MP4 media table: per id, n = 3 + id%5 samples of
    size 10 + (id·7 + i·3) % 50, duration n·(40 + id%25) ms, dims
    (64 + 16·(id%4)) × (48 + 16·(id%3)), codec avc1."""
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 3 + mid % 5
                sizes = [10 + (mid * 7 + i * 3) % 50 for i in range(n)]
                payloads.append(
                    encode_mp4_stub(
                        sizes,
                        duration_ms=n * (40 + mid % 25),
                        width=64 + 16 * (mid % 4),
                        height=48 + 16 * (mid % 3),
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "mime": "video/mp4",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(
        run,
        schema="media_id long, kind string, mime string, payload binary",
    )


def mp4_sample_table(df: DataFrame) -> DataFrame:
    """Per-sample byte ranges from REAL container parsing: one row per
    sample per video track — (media_id, sample_idx, sample_size,
    duration_ms, codec, width, height). Arrow-batched mapInPandas;
    at scale the parse cost is per-file header reads, embarrassingly
    parallel, and the frame decode stays behind the documented seam."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "sample_idx": [], "sample_size": [],
                "duration_ms": [], "codec": [], "width": [], "height": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                info = parse_mp4(bytes(payload))
                for t in info["tracks"]:
                    if t["handler"] != "vide":
                        continue
                    for i, sz in enumerate(t["sample_sizes"]):
                        out["media_id"].append(int(mid))
                        out["sample_idx"].append(i)
                        out["sample_size"].append(int(sz))
                        out["duration_ms"].append(info["duration_ms"])
                        out["codec"].append(t["codec"])
                        out["width"].append(t["width"])
                        out["height"].append(t["height"])
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run,
        schema=(
            "media_id long, sample_idx int, sample_size int, "
            "duration_ms int, codec string, width int, height int"
        ),
    )


# ---- MP3: MPEG-1 Layer III frame-header parsing (stdlib only) ------------
#
# Real frame-sync walking — ID3v2 skip, per-frame header decode (bitrate/
# samplerate/padding), exact frame lengths — so audio sharding targets
# genuine frame boundaries. Full audio DECODE (huffman + IMDCT + synthesis
# filterbank) stays the documented seam, like video codecs.

_MP3_BITRATES = (32, 40, 48, 56, 64, 80, 96, 112,
                 128, 160, 192, 224, 256, 320)  # MPEG-1 Layer III, kbps
_MP3_RATES = (44100, 48000, 32000)


def parse_mp3_frames(payload: bytes):
    """(frames, duration_ms) for an MPEG-1 Layer III stream, walking
    frame syncs exactly (VBR streams included). Tolerates the common
    real-world wrappers: a leading ID3v2 tag (incl. the v2.4 footer
    flag) and a trailing 128-byte ID3v1 'TAG' block. Each frame dict:
    offset, bytes, bitrate_kbps, sample_rate, channel_mode. Raises on
    lost sync / truncation / other layers."""
    pos = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        size = (
            ((payload[6] & 0x7F) << 21) | ((payload[7] & 0x7F) << 14)
            | ((payload[8] & 0x7F) << 7) | (payload[9] & 0x7F)
        )
        pos = 10 + size
        if payload[5] & 0x10:  # ID3v2.4 footer flag: 10 more bytes
            pos += 10
    frames = []
    while pos + 4 <= len(payload):
        # ubiquitous real-world trailer: a 128-byte ID3v1 'TAG' block
        if payload[pos : pos + 3] == b"TAG" and len(payload) - pos == 128:
            return frames, _mp3_duration_ms(frames)
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 frame sync at byte {pos}")
        if (b1 >> 3) & 0x03 != 3 or (b1 >> 1) & 0x03 != 1:
            raise ValueError("only MPEG-1 Layer III supported")
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError(f"bad bitrate/samplerate index at {pos}")
        kbps = _MP3_BITRATES[br_idx - 1]
        sr = _MP3_RATES[sr_idx]
        pad = (b2 >> 1) & 1
        flen = 144000 * kbps // sr + pad
        if pos + flen > len(payload):
            raise ValueError(f"truncated MP3 frame at byte {pos}")
        frames.append({
            "offset": pos, "bytes": flen, "bitrate_kbps": kbps,
            "sample_rate": sr, "channel_mode": (b3 >> 6) & 3,
        })
        pos += flen
    if pos != len(payload):
        raise ValueError("trailing bytes after the last MP3 frame")
    return frames, _mp3_duration_ms(frames)


def _mp3_duration_ms(frames) -> int:
    return round(sum(1152000.0 / f["sample_rate"] for f in frames))


def encode_mp3_stub(frame_params, tag_bytes: int = 0) -> bytes:
    """Minimal VALID MPEG-1 Layer III stream for fixtures: real frame
    headers (so lengths/bitrates parse exactly, VBR supported), fake
    audio payload bytes, optional ID3v2 tag of ``tag_bytes`` total size.
    ``frame_params``: list of (bitrate_index 1-14, samplerate_index 0-2,
    padding 0/1)."""
    out = bytearray()
    if tag_bytes:
        if tag_bytes < 10:
            raise ValueError("ID3v2 tag must be >= 10 bytes")
        body = tag_bytes - 10
        out += b"ID3" + bytes([3, 0, 0]) + bytes([
            (body >> 21) & 0x7F, (body >> 14) & 0x7F,
            (body >> 7) & 0x7F, body & 0x7F,
        ]) + bytes(body)
    for bi, si, pad in frame_params:
        kbps = _MP3_BITRATES[bi - 1]
        sr = _MP3_RATES[si]
        flen = 144000 * kbps // sr + pad
        # 0xFB = sync tail + MPEG-1 + Layer III + no CRC
        out += bytes([0xFF, 0xFB, (bi << 4) | (si << 2) | (pad << 1), 0])
        out += bytes((j * 11) % 256 for j in range(flen - 4))
    return bytes(out)


def mp3_media_from_ids(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MP3 media table: per id, an ID3v2 tag of
    10 + id%20 bytes then n = 4 + id%6 frames with per-frame (VBR)
    bitrate index 1 + (id+i)%14, samplerate index id%3, padding i%2."""
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 4 + mid % 6
                params = [
                    (1 + (mid + i) % 14, mid % 3, i % 2) for i in range(n)
                ]
                payloads.append(
                    encode_mp3_stub(params, tag_bytes=10 + mid % 20)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "audio",
                    "mime": "audio/mpeg",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(
        run,
        schema="media_id long, kind string, mime string, payload binary",
    )


def mp3_frame_table(df: DataFrame) -> DataFrame:
    """Per-frame byte ranges from REAL header parsing: one row per MP3
    frame — (media_id, frame_idx, byte_offset, frame_bytes,
    bitrate_kbps, sample_rate). Arrow-batched mapInPandas."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "frame_idx": [], "byte_offset": [],
                "frame_bytes": [], "bitrate_kbps": [], "sample_rate": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _dur = parse_mp3_frames(bytes(payload))
                for i, fr in enumerate(frames):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["byte_offset"].append(fr["offset"])
                    out["frame_bytes"].append(fr["bytes"])
                    out["bitrate_kbps"].append(fr["bitrate_kbps"])
                    out["sample_rate"].append(fr["sample_rate"])
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run,
        schema=(
            "media_id long, frame_idx int, byte_offset long, "
            "frame_bytes int, bitrate_kbps int, sample_rate int"
        ),
    )


def decode_wav(payload: bytes):
    """(n_channels, sample_rate, n_frames, sample_width_bytes, frames)
    via the stdlib ``wave`` module."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        return (
            w.getnchannels(),
            w.getframerate(),
            w.getnframes(),
            w.getsampwidth(),
            w.readframes(w.getnframes()),
        )


def stdlib_media_decoder(
    payload: bytes, kind: str, mime: str, n: int = N_FEATURES
) -> list:
    """Real-decode feature extractor for the stdlib-parsable formats:
    PNG/GIF → (width, height, per-channel pixel SUMS — exact integers, so
    the SQL oracle can certify the decode bit-for-bit); BMP → (width,
    height, mean B/G/R); WAV → (channels, rate, frames, RMS amplitude).
    Fixed-width output (zero-padded to ``n``) so it drops into
    :func:`extract_features` as ``decoder=``."""
    if mime == "image/png":
        w, h, ch, rows = decode_png(payload)
        sums = [0] * ch
        for row in rows:
            for px in row:
                for c in range(ch):
                    sums[c] += px[c]
        feats = [float(w), float(h)] + [float(s) for s in sums]
    elif mime == "image/gif":
        w, h, rows = decode_gif(payload)
        sums = [0, 0, 0]
        for row in rows:
            for r, g, b in row:
                sums[0] += r
                sums[1] += g
                sums[2] += b
        feats = [float(w), float(h)] + [float(s) for s in sums]
    elif mime == "image/jpeg":
        w, h, ch, rows = decode_jpeg(payload)
        sums = [0] * ch
        for row in rows:
            for px in row:
                for c in range(ch):
                    sums[c] += px[c]
        feats = [float(w), float(h)] + [float(s) for s in sums]
    elif mime == "image/bmp":
        w, h, rows = decode_bmp(payload)
        npx = float(w * h) or 1.0
        sums = [0.0, 0.0, 0.0]
        for row in rows:
            for b, g, r in row:
                sums[0] += b
                sums[1] += g
                sums[2] += r
        feats = [float(w), float(h)] + [s / npx for s in sums]
    elif mime == "audio/wav":
        import audioop  # stdlib (deprecated in 3.13 but present here)

        ch, rate, nframes, width, frames = decode_wav(payload)
        # use the file's declared sample width — hardcoding 2 would
        # misread 8/32-bit PCM (or crash on odd byte counts)
        rms = float(audioop.rms(frames, width)) if frames else 0.0
        feats = [float(ch), float(rate), float(nframes), rms]
    else:
        return [float(x) for x in fake_features(payload, n)]
    return (feats + [0.0] * n)[:n]


def bmp_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor BMP resize (stdlib-only) — a REAL ``resizer`` for
    :func:`resize_images`."""
    sw, sh, rows = decode_bmp(payload)
    out = [
        [rows[(y * sh) // height][(x * sw) // width] for x in range(width)]
        for y in range(height)
    ]
    return encode_bmp(out)


def extract_features(
    df: DataFrame,
    decoder: Optional[Callable[[bytes, str, str], list]] = None,
    n_features: int = N_FEATURES,
    balance_partitions: bool = True,
) -> DataFrame:
    """(media_id, kind, features: array<double>) via Arrow-batched
    mapInPandas. ``decoder`` defaults to the deterministic fake."""
    fn = decoder or (lambda p, k, m: fake_features(p, n_features))
    if balance_partitions:
        # spread large payloads: hash-repartition on media_id
        df = df.repartition("media_id")
    cols = df.select("media_id", "kind", "mime", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fn(bytes(p), k, m)
                for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return cols.mapInPandas(
        run, schema="media_id long, kind string, features array<double>"
    )


def resize_images(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    resizer: Optional[Callable[[bytes, int, int], bytes]] = None,
) -> DataFrame:
    """Resize plumbing for image payloads: Arrow-batched mapInPandas,
    output schema (media_id, payload: binary, meta with new dims).

    The pixel transform is STUBBED (no image libs here): the default
    "resizer" is a deterministic fake that re-hashes the payload to a
    width*height-proportional byte budget, keeping batch shapes, schema
    and partitioning real. Inject a PIL/opencv-backed ``resizer`` in a
    real deployment.
    """
    fn = resizer or (
        lambda p, w, h: (p * ((w * h) // max(len(p), 1) + 1))[: max(w * h // 64, 1)]
    )
    imgs = df.filter(F.col("kind") == "image").select(
        "media_id", "mime", "payload"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        fn(bytes(p), width, height) for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )
            yield out

    return imgs.mapInPandas(
        run, schema="media_id long, payload binary, width int, height int"
    )


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    decoder: Optional[Callable] = None,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame offset. Decode stubbed; offsets computed from metadata
    JVM-side so the fan-out itself is vectorized."""
    vids = df.filter(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )
    if decoder is None:
        # metadata-only plumbing result (decode is stubbed)
        return vids.select("media_id", "frame_ms")
    return vids  # real pipeline would mapInPandas(decoder) here

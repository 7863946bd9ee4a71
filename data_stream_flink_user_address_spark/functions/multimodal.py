"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Engine extension beyond the reference surface (BASELINE.json north star).
Convention (schemas.MEDIA_SCHEMA): ``payload binary`` + typed ``meta``
struct.  The Spark-side plumbing -- schema, partition-preserving
mapInPandas, Arrow batch shape -- is real and tested.  Decode is real
(pure-Python, dependency-free) for every self-describing format: PPM
(P6), 24-bit BMP, PNG (stdlib zlib + filter reconstruction + Adam7),
GIF (LZW + palette + interlace), and baseline JPEG (pure-Python
Huffman + numpy IDCT) full pixel decode; WAV PCM/float sample decode
with audio features; MP4/ISO-BMFF duration + track dims (box walk);
JPEG dimensions (SOF marker walk); Ogg (Vorbis/Opus) and FLAC
durations (page-granule walk / STREAMINFO); MJPEG AVI metadata AND
real frame-pixel extraction (RIFF walk + the JPEG decoder per frame).
Formats needing codec libraries (MP3, compressed-audio sample decode,
MP4 frame pixels, progressive JPEG) raise ``NotImplementedError`` --
not in this container -- with ``fake_decode`` as the deterministic
test stand-in.

At scale: payloads ride in parquet binary columns; mapInPandas streams
Arrow batches so a 100 MB image never materializes as a Python list; the
``batch_max_bytes`` guidance is enforced upstream via
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_META_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, duration_ms long"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Demo/testing adapter: wrap a text column as a binary payload row
    (MEDIA_SCHEMA-shaped) so the plumbing is exercisable on the driver
    testdata, which has no real media table."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_pixels(payload: bytes):
    """Dependency-free pixel decode, dispatched on magic bytes.

    Returns ``(width, height, pixels)`` with ``pixels`` an
    (height, width, 3) uint8 numpy array, or raises ValueError on a
    malformed/unrecognized payload.  Supported:

    - **PPM (P6)**: ``P6 <w> <h> <maxval>`` header (whitespace/comment
      separated) + raw RGB triplets.
    - **BMP**: 'BM' magic, BITMAPINFOHEADER, 24-bit uncompressed;
      rows are 4-byte aligned bottom-up, stored BGR.
    - **PNG**: full decode via :func:`png_decode_pixels` (stdlib zlib
      inflate + all 5 filters + Adam7).
    - **GIF**: first frame via :func:`gif_decode_pixels` (pure-Python
      LZW + palette + interlace).
    - **JPEG**: baseline sequential via :func:`jpeg_decode_pixels`
      (pure-Python Huffman + numpy IDCT; progressive raises).

    Formats that genuinely need codec libraries (MP4/OGG/...,
    progressive JPEG) are NOT handled here -- see :func:`real_decode`.
    """
    import numpy as np

    if payload[:2] == b"P6":
        # header tokens may be separated by any whitespace and '#' comments
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval, then raw pixels
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"PPM maxval {maxval} unsupported (expect 255)")
        raw = payload[pos : pos + w * h * 3]
        if len(raw) != w * h * 3:
            raise ValueError("PPM payload truncated")
        return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    if payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0:
            raise ValueError(f"BMP bpp={bpp} compression={compression} unsupported")
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = []
        for r in range(abs(h)):
            line = payload[off + r * stride : off + r * stride + w * 3]
            if len(line) != w * 3:
                raise ValueError("BMP payload truncated")
            rows.append(np.frombuffer(line, dtype=np.uint8).reshape(w, 3)[:, ::-1])
        px = np.stack(rows)
        if h > 0:  # positive height = bottom-up storage
            px = px[::-1]
        return w, abs(h), px
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decode_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return gif_decode_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        return jpeg_decode_pixels(payload)
    raise ValueError("unrecognized image format (expect PPM/BMP/PNG/GIF/JPEG magic)")


# PNG Adam7 interlace passes: (x_start, y_start, x_step, y_step).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw, width, height, bpp, np):
    """Reconstruct one (sub)image's scanlines from PNG-filtered bytes.

    ``raw`` is ``height`` scanlines of ``1 + width*bpp`` bytes (filter
    tag + data).  Filters None/Sub/Up are vectorized whole-row numpy
    (Sub is a cumulative sum over the pixel axis, mod 256); Average and
    Paeth carry a left-neighbor dependency so they walk the row one
    pixel (a ``bpp``-vector) at a time -- per-IMAGE cost stays linear
    in pixels, and the Spark parallelism axis is images-per-Arrow-batch
    in :func:`extract_media_meta`, not bytes within one image.
    """
    stride = 1 + width * bpp
    if len(raw) != height * stride:
        raise ValueError("PNG pixel data length mismatch after inflate")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
    out = np.zeros((height, width * bpp), dtype=np.uint8)
    prev = np.zeros(width * bpp, dtype=np.uint8)
    for y in range(height):
        ftype, cur = lines[y, 0], lines[y, 1:].copy()
        if ftype == 0:  # None
            rec = cur
        elif ftype == 1:  # Sub: a cumulative sum along the pixel axis
            rec = np.cumsum(
                cur.reshape(width, bpp).astype(np.uint32), axis=0, dtype=np.uint32
            ).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            rec = cur + prev
        elif ftype == 3:  # Average
            rec = cur
            rec[:bpp] += prev[:bpp] >> 1
            for x in range(bpp, width * bpp, bpp):
                left = rec[x - bpp : x].astype(np.uint16)
                up = prev[x : x + bpp].astype(np.uint16)
                rec[x : x + bpp] += ((left + up) >> 1).astype(np.uint8)
        elif ftype == 4:  # Paeth
            rec = cur
            rec[:bpp] += prev[:bpp]  # left/upper-left are 0 -> predictor is up
            for x in range(bpp, width * bpp, bpp):
                a = rec[x - bpp : x].astype(np.int16)
                b = prev[x : x + bpp].astype(np.int16)
                c = prev[x - bpp : x].astype(np.int16)
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                rec[x : x + bpp] += pred.astype(np.uint8)
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = prev = rec
    return out


def png_decode_pixels(payload: bytes):
    """Full dependency-free PNG pixel decode -- DEFLATE is stdlib
    ``zlib``, filter reconstruction and color conversion are numpy, so
    no codec library is involved.

    Returns ``(width, height, pixels)`` with ``pixels`` (height, width,
    3) uint8 RGB.  Supported: bit depths 8 and 16 (16 keeps the high
    byte), color types 0 (gray), 2 (RGB), 3 (palette, 8-bit indices),
    4 (gray+alpha), 6 (RGBA); both interlace methods (none and Adam7 --
    each of the 7 passes is an independently-filtered subimage
    scattered back on its grid).  Alpha is dropped, not composited
    (documented contract: the pixel array is the sensor payload for
    feature extraction, not display).  Bit depths 1/2/4 raise
    ValueError.

    Scale note: :func:`real_decode`'s metadata path reads ONLY the
    IHDR header -- this function is the opt-in pixel stage, so a
    100 TB metadata sweep never pays the IDAT inflate.
    """
    import numpy as np
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if len(data) != clen:
            raise ValueError("PNG chunk truncated")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + data + CRC
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None or comp != 0 or filt != 0:
        raise ValueError(f"PNG color={color} compression={comp} filter={filt} unsupported")
    if depth not in (8, 16) or (color == 3 and depth != 8):
        raise ValueError(f"PNG bit depth {depth} for color type {color} unsupported")
    if w <= 0 or h <= 0:
        raise ValueError("PNG has empty dimensions")
    bpp = channels * (depth // 8)
    raw = zlib.decompress(b"".join(idat))

    if interlace == 0:
        flat = _png_unfilter(raw, w, h, bpp, np)
        img = flat.reshape(h, w, bpp)
    elif interlace == 1:  # Adam7
        img = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            size = ph * (1 + pw * bpp)
            sub = _png_unfilter(raw[off : off + size], pw, ph, bpp, np)
            img[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
            off += size
        if off != len(raw):
            raise ValueError("PNG Adam7 pixel data length mismatch")
    else:
        raise ValueError(f"PNG interlace method {interlace} unknown")

    if depth == 16:  # big-endian samples: keep the high byte
        img = img[:, :, ::2]
    if color == 2:
        return w, h, img
    if color == 6:
        return w, h, np.ascontiguousarray(img[:, :, :3])
    if color == 0:
        return w, h, np.repeat(img, 3, axis=2)
    if color == 4:
        return w, h, np.repeat(img[:, :, :1], 3, axis=2)
    # color == 3: palette lookup
    if plte is None or len(plte) % 3:
        raise ValueError("PNG palette image missing/malformed PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = img[:, :, 0]
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("PNG palette index out of range")
    return w, h, pal[idx]


def encode_png(pixels) -> bytes:
    """Minimal valid PNG writer for (h, w, 3) uint8 RGB: 8-bit
    truecolor, filter 0 on every scanline, one zlib IDAT.  Pure stdlib
    (``zlib.compress`` / ``zlib.crc32``) -- the emit side of the
    :func:`resize_images` real path and the round-trip anchor for
    :func:`png_decode_pixels` tests."""
    import numpy as np
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_png expects an (h, w, 3) uint8 array")
    h, w = px.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, truecolor, deflate, adaptive, no interlace
    )
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * 3)], axis=1
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


# GIF interlaced frames store rows in 4 passes: (y_start, y_step).
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: codes grow from ``min_code_size+1`` up to 12
    bits, little-endian bit packing, with Clear and End-of-Information
    codes.  Returns the flat pixel-index stream."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    code_size = min_code_size + 1
    out: list[int] = []
    acc = nbits = 0
    prev = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = list(base)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("GIF LZW stream starts with an undefined code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF LZW code out of range")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def gif_decode_pixels(payload: bytes):
    """Dependency-free GIF decode of the FIRST image frame: LZW
    (:func:`_gif_lzw_decode`) + palette lookup + 4-pass interlace
    de-scrambling, all pure Python/numpy.  Returns ``(width, height,
    pixels)`` for the frame's own dimensions; local color tables
    override the global one; transparency (GIF89a graphic-control) is
    ignored -- the index's palette color is emitted.  Later frames and
    disposal/animation semantics are out of scope (first frame is the
    training-data convention for thumbnails/previews)."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    flags = payload[10]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if len(global_pal) != 3 * n:
            raise ValueError("GIF global color table truncated")
        global_pal = global_pal.reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks until terminator
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            iflags = payload[pos + 9]
            pos += 10
            pal = global_pal
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
                if len(pal) != 3 * n:
                    raise ValueError("GIF local color table truncated")
                pal = pal.reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF frame has no color table")
            if w <= 0 or h <= 0:
                raise ValueError("GIF frame has empty dimensions")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while pos < len(payload) and payload[pos]:
                size = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + size])
                pos += 1 + size
            indices = _gif_lzw_decode(b"".join(chunks), min_code)
            if len(indices) < w * h:
                raise ValueError("GIF LZW stream ended before the frame filled")
            idx = np.asarray(indices[: w * h], dtype=np.int64).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                order = np.concatenate(
                    [np.arange(y0, h, dy) for y0, dy in _GIF_INTERLACE]
                )
                deinterlaced = np.empty_like(idx)
                deinterlaced[order] = idx
                idx = deinterlaced
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("GIF pixel index out of palette range")
            return w, h, pal[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"GIF unknown block introducer 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def jpeg_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from a JPEG's SOF marker -- a pure byte-level
    marker walk, no codec library.

    JPEG is a sequence of ``FF xx`` markers, each (except the
    standalone ones) followed by a 2-byte big-endian length that
    includes itself.  Any start-of-frame marker SOF0-SOF15 (0xC0-0xCF
    minus DHT 0xC4, JPG 0xC8, DAC 0xCC -- baseline, progressive,
    lossless, arithmetic variants alike) carries
    ``precision(1) height(2) width(2)`` right after its length field.
    The walk skips fill bytes (padding ``FF``\\ s) and stops at SOS
    (0xDA): past it lies entropy-coded data, and a JPEG without a SOF
    before SOS is malformed.  Raises ValueError when no SOF is found.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynchronized")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone TEM/RSTn
            pos += 2
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no SOF seen
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            # the SOF payload (precision + height + width) must actually
            # be present -- a crawl-truncated JPEG otherwise yields
            # int.from_bytes(b'') == 0 and silent garbage dimensions
            if pos + 9 > len(payload):
                raise ValueError("JPEG truncated inside SOF segment")
            h = int.from_bytes(payload[pos + 5 : pos + 7], "big")
            w = int.from_bytes(payload[pos + 7 : pos + 9], "big")
            return w, h
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOF marker before SOS/EOI")


# JPEG zigzag order: index i of the scan -> (row, col) in the 8x8 block.
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def _dct_matrix(np):
    """The 8x8 DCT-II basis T with T[u,x] = c(u)/2 * cos((2x+1)u*pi/16);
    IDCT is ``T.T @ coeff @ T`` (ITU T.81 A.3.3)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    t = np.cos((2 * x + 1) * u * np.pi / 16) / 2
    t[0] /= np.sqrt(2.0)
    return t


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded JPEG data: un-stuffs
    0xFF00, stops at (and reports) restart/other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:  # stuffed FF
                self.pos += 2
            else:  # a real marker terminates the entropy segment
                self.marker = nxt
                raise ValueError("JPEG entropy data ran into a marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_past_restart(self, expect: int):
        """Byte-align and consume the RSTn marker ending an interval."""
        self.acc = self.n = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and d[self.pos + 1] != 0x00
        ):
            self.pos += 1
        if (
            self.pos + 1 >= len(d)
            or d[self.pos + 1] != 0xD0 + (expect & 7)
        ):
            raise ValueError("JPEG restart marker missing/out of sequence")
        self.pos += 2


def _huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG Huffman code longer than 16 bits")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (ITU T.81 F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode_pixels(payload: bytes):
    """Full dependency-free BASELINE JPEG decode -- Huffman entropy
    decoding is pure Python, dequantize/IDCT/color conversion are
    numpy.  Returns ``(width, height, pixels)`` with (h, w, 3) uint8
    RGB (grayscale replicated).

    Supported: SOF0 baseline sequential, 8-bit precision, 1 or 3
    components, any h/v sampling factors up to 2 (4:4:4, 4:2:2, 4:2:0
    covered), restart intervals (DRI + RSTn), multi-segment DQT/DHT.
    Progressive (SOF2), arithmetic coding, and 12-bit raise ValueError
    with the variant named -- those are deliberate scope cuts, not
    library gaps.

    Decode math per T.81: canonical Huffman tables from DHT BITS/VAL,
    DC prediction per component, AC run-length with ZRL/EOB, zigzag
    de-scramble, dequantize, 8x8 IDCT as two matrix multiplies against
    the DCT-II basis, nearest-neighbor chroma upsample, BT.601
    full-range YCbCr->RGB.  Per-image cost is linear in MCUs; the
    Spark parallelism axis is images-per-Arrow-batch, same as PNG/GIF.
    """
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> code table
    sof = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynchronized")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x01, *range(0xD0, 0xD8)):
            pos += 2
            continue
        if marker == 0xD9:
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT: one or more tables per segment
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                n = 64 * (2 if prec else 1)
                raw = seg[i + 1 : i + 1 + n]
                if len(raw) != n:
                    raise ValueError("JPEG DQT truncated")
                vals = (
                    np.frombuffer(raw, dtype=">u2")
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8)
                ).astype(np.float64)
                tbl = np.zeros(64)
                tbl[list(_ZIGZAG)] = vals  # de-zigzag into natural order
                qt[tid] = tbl.reshape(8, 8)
                i += 1 + n
        elif marker == 0xC4:  # DHT: one or more tables per segment
            i = 0
            while i < len(seg):
                tclass, tid = seg[i] >> 4, seg[i] & 15
                bits = seg[i + 1 : i + 17]
                nsym = sum(bits)
                vals = seg[i + 17 : i + 17 + nsym]
                if len(bits) != 16 or len(vals) != nsym:
                    raise ValueError("JPEG DHT truncated")
                table, code, k = {}, 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tclass, tid)] = table
                i += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # baseline / extended seq.
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"JPEG precision {precision} unsupported (8 only)")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, sampling, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": sampling >> 4, "v": sampling & 15, "q": qid})
            sof = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "JPEG progressive/lossless/arithmetic variants unsupported "
                "(baseline SOF0 only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS: component->table bindings, then data
            ns = seg[0]
            bindings = {}
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                bindings[cid] = (tables >> 4, tables & 15)
            scan = (bindings, pos + 2 + seg_len)
            break
        pos += 2 + seg_len
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = sof
    if w <= 0 or h <= 0 or len(comps) not in (1, 3):
        raise ValueError("JPEG has empty dimensions or unsupported component count")
    bindings, data_pos = scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("JPEG sampling factors beyond 2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    T = _dct_matrix(np)
    planes = []
    for c in comps:
        if c["q"] not in qt or c["id"] not in bindings:
            raise ValueError("JPEG component missing quant table or scan binding")
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )
    reader = _JpegBitReader(payload, data_pos)
    dc_pred = [0] * len(comps)
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_idx = my * mcus_x + mx
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                reader.align_past_restart(rst)
                rst = (rst + 1) & 7
                dc_pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tbl = huff.get((0, bindings[c["id"]][0]))
                ac_tbl = huff.get((1, bindings[c["id"]][1]))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("JPEG scan references an undefined Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeff = np.zeros(64)
                        t = _huff_decode(reader, dc_tbl)
                        dc_pred[ci] += _extend(reader.bits(t), t)
                        coeff[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 15
                            if size == 0:
                                if run != 15:
                                    raise ValueError("JPEG invalid AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC coefficient overrun")
                            coeff[k] = _extend(reader.bits(size), size)
                            k += 1
                        block = np.zeros(64)
                        block[list(_ZIGZAG)] = coeff  # de-zigzag
                        spatial = T.T @ (block.reshape(8, 8) * qt[c["q"]]) @ T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w, h, np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return w, h, np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def mp4_metadata(payload: bytes) -> dict:
    """MP4/ISO-BMFF metadata from a pure box walk -- no codec library:
    ``moov/mvhd`` carries movie timescale + duration (versions 0 and
    1), ``moov/trak/tkhd`` carries per-track 16.16 fixed-point
    width/height (the first track with nonzero dims wins -- audio
    tracks legitimately carry 0x0).  Returns ``{"width", "height",
    "duration_ms"}`` with None for anything absent.  Raises ValueError
    when no ``moov`` exists (e.g. a fragmented/streaming-only file or
    a truncated upload).

    Covers .mp4/.m4a/.m4v/.mov alike (same box grammar).  Frame
    PIXELS genuinely need codecs; this is the metadata-sweep path.
    """

    def walk(buf: bytes, start: int, end: int, out: dict, depth: int = 0):
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos : pos + 4], "big")
            btype = buf[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    raise ValueError("MP4 largesize box truncated")
                size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
                body = pos + 16
            elif size == 0:  # box extends to end of enclosing scope
                size = end - pos
            if size < 8 or pos + size > end:
                raise ValueError("MP4 box size out of bounds")
            if btype in (b"moov", b"trak") and depth < 8:
                if btype == b"moov":
                    out["has_moov"] = True
                walk(buf, body, pos + size, out, depth + 1)
            elif btype == b"mvhd":
                v = buf[body]
                if v == 1:
                    ts = int.from_bytes(buf[body + 20 : body + 24], "big")
                    dur = int.from_bytes(buf[body + 24 : body + 32], "big")
                else:
                    ts = int.from_bytes(buf[body + 12 : body + 16], "big")
                    dur = int.from_bytes(buf[body + 16 : body + 20], "big")
                if ts:
                    out["duration_ms"] = int(dur * 1000 / ts)
            elif btype == b"tkhd" and out.get("width") is None:
                v = buf[body]
                woff = body + (88 if v == 1 else 76)
                tw = int.from_bytes(buf[woff : woff + 4], "big") >> 16
                th = int.from_bytes(buf[woff + 4 : woff + 8], "big") >> 16
                if tw and th:
                    out["width"], out["height"] = tw, th
            pos += size

    out: dict = {"width": None, "height": None, "duration_ms": None}
    walk(payload, 0, len(payload), out)
    if not out.pop("has_moov", False):
        raise ValueError("MP4 has no moov box (fragmented or truncated)")
    return out


def ogg_metadata(payload: bytes) -> dict:
    """Ogg container duration from a pure page walk -- no codec: each
    page header carries a 64-bit granule position; the last audio
    page's granule is the total sample count (Vorbis: at the ID
    header's sample rate; Opus: always 48 kHz minus the pre-skip).
    Parses the first page's codec ID header for the rate, then walks
    the segment-table-framed pages to the last granule.  Raises
    ValueError on non-Vorbis/Opus streams (FLAC-in-Ogg etc.) or
    truncated pages."""
    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg stream (missing OggS)")
    rate = None
    preskip = 0
    last_granule = None
    pos = 0
    first = True
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError("Ogg page capture pattern lost")
        granule = int.from_bytes(payload[pos + 6 : pos + 14], "little", signed=True)
        nsegs = payload[pos + 26]
        seg_table = payload[pos + 27 : pos + 27 + nsegs]
        if len(seg_table) != nsegs:
            raise ValueError("Ogg segment table truncated")
        body = pos + 27 + nsegs
        body_len = sum(seg_table)
        if body + body_len > len(payload):
            raise ValueError("Ogg page body truncated")
        if first:
            head = payload[body : body + 19]
            if head[:7] == b"\x01vorbis":
                # ID header: packet_type(1) 'vorbis'(6) version(4)
                # channels(1) rate(4 LE)
                rate = int.from_bytes(payload[body + 12 : body + 16], "little")
            elif head[:8] == b"OpusHead":
                # version(1) channels(1) pre-skip(2 LE); granule units
                # are ALWAYS 48 kHz for Opus regardless of input rate
                preskip = int.from_bytes(payload[body + 10 : body + 12], "little")
                rate = 48000
            else:
                raise ValueError("Ogg stream is not Vorbis/Opus")
            first = False
        if granule >= 0:
            last_granule = granule
        pos = body + body_len
    if rate is None or last_granule is None:
        raise ValueError("Ogg stream has no granule-bearing audio page")
    samples = max(0, last_granule - preskip)
    return {"width": None, "height": None, "duration_ms": int(samples * 1000 / rate)}


def flac_metadata(payload: bytes) -> dict:
    """FLAC duration from the mandatory STREAMINFO metadata block
    (first block after the ``fLaC`` magic): sample rate is a 20-bit
    field and total samples a 36-bit field packed at fixed bit offsets
    -- pure byte/bit arithmetic, no codec."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC)")
    header = payload[4:8]
    if len(header) < 4 or (header[0] & 0x7F) != 0:
        raise ValueError("FLAC STREAMINFO must be the first metadata block")
    blen = int.from_bytes(header[1:4], "big")
    si = payload[8 : 8 + blen]
    if blen < 18 or len(si) < 18:
        raise ValueError("FLAC STREAMINFO truncated")
    rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    total = ((si[13] & 0x0F) << 32) | int.from_bytes(si[14:18], "big")
    if not rate:
        raise ValueError("FLAC STREAMINFO has zero sample rate")
    return {
        "width": None,
        "height": None,
        "duration_ms": int(total * 1000 / rate) if total else None,
    }


def wav_decode_samples(payload: bytes):
    """Real WAV sample decode -- RIFF chunk walk + numpy reinterpret,
    no audio library.  Returns ``(sample_rate, samples)`` with
    ``samples`` float64 in [-1, 1], shape (n_frames, n_channels).
    Supports PCM (format 1) at 8 (unsigned), 16, 24, and 32 bits, and
    IEEE float32/float64 (format 3).  Raises ValueError on compressed
    formats (ADPCM/mu-law/... genuinely need codec tables)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            fmt = payload[pos + 8 : pos + 8 + clen]
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if not channels or not rate:
        raise ValueError("WAV fmt chunk has zero channels/rate")
    if audio_format == 1:
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8)
            b = b.reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise ValueError(f"WAV PCM bit depth {bits} unsupported")
    elif audio_format == 3:
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"WAV float bit depth {bits} unsupported")
    else:
        raise ValueError(
            f"WAV format {audio_format} needs a codec (PCM/float only)"
        )
    n = len(x) - len(x) % channels
    return rate, x[:n].reshape(-1, channels)


def phash_images(
    media: DataFrame,
    hash_size: int = 8,
    highfreq_factor: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual DCT hash (pHash) over REAL decoded pixels -- the
    image analogue of SimHash for near-duplicate detection: decode
    (:func:`decode_image_pixels`, any of PPM/BMP/PNG/GIF/JPEG), mean-
    gray, nearest-resize to ``hash_size*highfreq_factor`` square, 2-D
    DCT-II via two matrix multiplies, keep the top-left ``hash_size``
    square of low-frequency coefficients, and set bit (i*hash_size+j)
    when the coefficient exceeds the block median.  Robust to uniform
    brightness shifts and re-encodes, unlike the exact sha256 in
    :func:`extract_media_meta`.

    Returns (``id_col``, ``phash``) with a signed 64-bit signature
    (NULL for undecodable payloads -- totality, no poison pills).
    Compose with ``dedup.simhash_near_dup_pairs(sigs, bits=64,
    sig_col='phash')`` for exact banded Hamming pairing: the pair
    stage shuffles only (band, value) slices, never pixels, so image
    near-dup at corpus scale costs one decode pass + the same bounded
    bucket join the text SimHash path measures."""
    import numpy as np

    n = hash_size * highfreq_factor
    # orthonormal DCT-II basis, same construction as the JPEG kernel
    u = np.arange(n).reshape(n, 1)
    x = np.arange(n).reshape(1, n)
    T = np.cos((2 * x + 1) * u * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    T[0] /= np.sqrt(2.0)

    def one(payload) -> object:
        try:
            w0, h0, px = decode_image_pixels(bytes(payload or b""))
        except Exception:
            return None
        gray = px.astype(np.float64).mean(axis=2)
        rows = np.minimum((np.arange(n) * h0) // n, h0 - 1)
        cols = np.minimum((np.arange(n) * w0) // n, w0 - 1)
        small = gray[rows][:, cols]
        low = (T @ small @ T.T)[:hash_size, :hash_size]
        bits = (low > np.median(low)).reshape(-1)
        val = 0
        for k, b in enumerate(bits):
            if b:
                val |= 1 << k
        if val >= 1 << 63:  # wrap into signed 64-bit for Spark's BIGINT
            val -= 1 << 64
        return val

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "phash": pd.array(
                        [one(p) for p in pdf[payload_col]], dtype="Int64"
                    ),
                }
            )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    return media.select(
        F.col(id_col), F.col(payload_col)
    ).mapInPandas(op, schema=f"{id_col} long, phash long")


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, data_start, data_len) for each
    RIFF chunk in [pos, end); chunks are word-aligned."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        clen = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        data = pos + 8
        if data + clen > end:
            raise ValueError("RIFF chunk overruns its parent")
        ltype = buf[data : data + 4] if fourcc in (b"LIST", b"RIFF") else None
        yield fourcc, ltype, data, clen
        pos = data + clen + (clen & 1)


def avi_mjpeg_metadata(payload: bytes) -> dict:
    """AVI main-header metadata (pure RIFF walk): dimensions, frame
    interval, frame count, and duration from the ``avih`` chunk.
    Raises ValueError when the header is absent/truncated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI )")
    for fourcc, ltype, data, clen in _riff_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and ltype == b"hdrl":
            for f2, _, d2, c2 in _riff_chunks(payload, data + 4, data + clen):
                if f2 == b"avih":
                    if c2 < 40:
                        raise ValueError("AVI avih chunk truncated")
                    us_per_frame = int.from_bytes(payload[d2 : d2 + 4], "little")
                    total = int.from_bytes(payload[d2 + 16 : d2 + 20], "little")
                    w = int.from_bytes(payload[d2 + 32 : d2 + 36], "little")
                    h = int.from_bytes(payload[d2 + 36 : d2 + 40], "little")
                    return {
                        "width": w or None,
                        "height": h or None,
                        "duration_ms": (
                            int(us_per_frame * total / 1000)
                            if us_per_frame and total
                            else None
                        ),
                        "us_per_frame": us_per_frame,
                        "total_frames": total,
                    }
    raise ValueError("AVI has no hdrl/avih header")


def avi_mjpeg_frames(payload: bytes) -> list[bytes]:
    """The compressed video frames ('00dc'/'01dc' chunks inside the
    'movi' LIST) in stream order.  For an MJPEG AVI each frame is a
    standalone baseline JPEG, decodable by :func:`jpeg_decode_pixels`
    -- real video decode with zero codec libraries."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI )")
    frames: list[bytes] = []
    for fourcc, ltype, data, clen in _riff_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and ltype == b"movi":
            for f2, _, d2, c2 in _riff_chunks(payload, data + 4, data + clen):
                if f2[2:4] in (b"dc", b"db"):
                    frames.append(payload[d2 : d2 + c2])
    return frames


def extract_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video frame extraction for MJPEG AVI payloads: RIFF walk
    (:func:`avi_mjpeg_frames`) -> per-tick frame selection at the
    container frame rate -> baseline JPEG pixel decode -> PNG
    re-encode.  Emits (media_id, frame_idx, ts_ms, width, height,
    frame_png); payloads that aren't decodable MJPEG AVIs emit no rows
    (totality).  This upgrades :func:`sample_frames`' timeline-only
    contract to actual pixels for the one video format a pure-Python
    path can decode."""
    import numpy as np  # noqa: F401  (decode path imports lazily)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_idx", "ts_ms", "width", "height", "frame_png"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    blob = bytes(payload or b"")
                    meta = avi_mjpeg_metadata(blob)
                    frames = avi_mjpeg_frames(blob)
                    usf = meta["us_per_frame"]
                    if not usf or not frames:
                        continue
                    dur_ms = usf * len(frames) / 1000
                    for i, ts in enumerate(range(0, int(dur_ms), every_ms)):
                        idx = min(int(ts * 1000 / usf), len(frames) - 1)
                        w, h, px = jpeg_decode_pixels(frames[idx])
                        rows.append((mid, i, ts, w, h, encode_png(px)))
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=cols)

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    return media.select("media_id", "payload").mapInPandas(
        op,
        schema=(
            "media_id long, frame_idx int, ts_ms long, "
            "width int, height int, frame_png binary"
        ),
    )


def audio_fingerprint(
    media: DataFrame,
    frames: int = 8,
    bands_per_frame: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Haitsma-Kalker-style audio fingerprint over REAL decoded WAV
    samples -- the audio analogue of pHash: channel-mean signal, split
    into ``frames`` equal chunks, per-chunk FFT magnitude binned into
    ``bands_per_frame + 1`` log-spaced bands, and one sign bit per
    adjacent-band LOG-energy difference.  Log differences cancel any
    constant gain, so the fingerprint is volume-invariant by
    construction (pinned in tests); small additive noise flips few
    bits; unrelated audio behaves like a random word.

    Returns (``id_col``, ``afp``) with a signed 64-bit signature
    (frames * bands_per_frame bits; NULL for undecodable payloads).
    Compose with ``dedup.simhash_near_dup_pairs(sigs, bits=64,
    sig_col='afp')`` exactly like :func:`phash_images` -- near-dup
    audio at corpus scale is one decode pass + the bounded banded
    bucket join; samples never shuffle."""
    import numpy as np

    nbits = frames * bands_per_frame
    if nbits > 64:
        raise ValueError("frames * bands_per_frame must fit in 64 bits")

    def one(payload) -> object:
        try:
            _, samples = wav_decode_samples(bytes(payload or b""))
            mono = samples.mean(axis=1)
            # each frame needs enough spectrum for bands_per_frame+1
            # log-spaced bands
            if len(mono) < frames * 4 * (bands_per_frame + 1):
                return None
            usable = len(mono) - len(mono) % frames
            chunks = mono[:usable].reshape(frames, -1)
            spec = np.abs(np.fft.rfft(chunks, axis=1))[:, 1:]  # drop DC
            nfreq = spec.shape[1]
            # log-spaced band edges over the positive spectrum
            edges = np.unique(
                np.geomspace(1, nfreq, bands_per_frame + 2).astype(np.int64)
            ) - 1
            while len(edges) < bands_per_frame + 2:  # duplicate-collapsed
                edges = np.append(edges, edges[-1] + 1)
            energy = np.add.reduceat(spec ** 2, edges[:-1], axis=1)[
                :, : bands_per_frame + 1
            ]
            # normalize by band width: raw sums grow with width, which
            # would bias diff signs identically for ALL flat-ish spectra
            # (correlated fingerprints across unrelated clips)
            widths = np.diff(edges)[: bands_per_frame + 1].astype(np.float64)
            widths[widths <= 0] = 1.0
            loge = np.log(energy / widths + 1e-12)
            bits = (np.diff(loge, axis=1) > 0).reshape(-1)[:nbits]
        except Exception:
            return None
        val = 0
        for k, b in enumerate(bits):
            if b:
                val |= 1 << k
        if val >= 1 << 63:
            val -= 1 << 64
        return val

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "afp": pd.array(
                        [one(p) for p in pdf[payload_col]], dtype="Int64"
                    ),
                }
            )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        op, schema=f"{id_col} long, afp long"
    )


def synthesize_group_wavs(
    docs: DataFrame, group_div: int = 3, n_samples: int = 2048, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic tone-mixture WAV payloads shared within id groups
    -- the audio twin of :func:`synthesize_group_images`, planting
    exact duplicates whose fingerprint pairs are the known ground
    truth.  Tone MIXTURES (not white noise): each group gets 6 random
    sinusoids, so groups differ in spectral SHAPE and their
    fingerprints spread like random words -- white noise would give
    every group a flat spectrum and correlated fingerprint bits."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, bytes] = {}
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                g = int(did) // group_div
                blob = cache.get(g)
                if blob is None:
                    rng = np.random.default_rng(10_000_019 + g)
                    # NON-stationary: fresh tone mixture per eighth of
                    # the clip, so each fingerprint frame contributes
                    # independent bits (a stationary signal repeats one
                    # frame's bits 8x -- ~8-bit effective entropy and
                    # cross-group collisions)
                    seg = n_samples // 8
                    t = np.arange(seg)
                    parts = []
                    for _ in range(8):
                        # tones + a -30 dB noise floor: without the
                        # floor, bands no tone lands in tie at the log
                        # epsilon and their diff bits correlate across
                        # groups (measured: ~0.9% spurious cross-group
                        # pairs at 3e4 groups; with the floor, none)
                        w = rng.normal(0.0, 0.01, seg)
                        for _ in range(6):
                            freq = rng.uniform(0.01, 0.45)  # cycles/sample
                            w += rng.uniform(0.05, 0.15) * np.sin(
                                2 * np.pi * freq * t + rng.uniform(0, 2 * np.pi)
                            )
                        parts.append(w)
                    blob = cache[g] = encode_wav_pcm16(
                        np.concatenate(parts), 8000
                    )
                payloads.append(blob)
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "kind": "audio", "payload": payloads}
            )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(docs.sparkSession)
    return docs.select(id_col).mapInPandas(
        op, schema="media_id long, kind string, payload binary"
    )


def synthesize_group_images(
    docs: DataFrame, group_div: int = 3, size: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic noise-PNG payloads shared within id groups
    (``id // group_div``) -- planted exact-duplicate images for the
    pHash pipeline's driver-checkable query.  Same group -> byte-
    identical payload (pHash Hamming 0); different groups ->
    independently seeded noise whose pHashes behave like random 64-bit
    words, so a cross-group pair landing within a few bits has
    probability ~2^-50 per pair -- the planted ground truth IS the
    expected output.  Payloads build once per distinct group per Arrow
    batch, not per row."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, bytes] = {}
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                g = int(did) // group_div
                blob = cache.get(g)
                if blob is None:
                    rng = np.random.default_rng(g)
                    px = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
                    blob = cache[g] = encode_png(px)
                payloads.append(blob)
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "kind": "image", "payload": payloads}
            )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(docs.sparkSession)
    return docs.select(id_col).mapInPandas(
        op, schema="media_id long, kind string, payload binary"
    )


def encode_wav_pcm16(samples, rate: int) -> bytes:
    """Minimal PCM16 WAV writer (RIFF + fmt + data).  Scale is 32768
    (clipped to int16 range), the exact inverse of
    :func:`wav_decode_samples`' /32768 normalization, so dyadic
    amplitudes k/32768 round-trip bit-exactly -- the property the
    oracle-checked ``audio_features_real`` driver query relies on."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    data = np.clip(np.rint(x * 32768.0), -32768, 32767).astype("<i2").tobytes()
    block = ch * 2
    fmt = (
        (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )


def pixel_roundtrip_check(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Oracle-checkable probe of the real PNG codec path: per id, build
    a small RGB image whose dimensions and per-channel constants are
    arithmetic functions of the id, push it through
    :func:`encode_png` -> :func:`png_decode_pixels`, and emit the
    DECODED width/height/pixel-sum.  PNG is lossless, so the outputs
    have the closed forms

        width  = 4 + id % 13,   height = 3 + id % 7,   v = id % 251
        pixel_sum = width * height * (v + (v+83)%256 + (v+166)%256)

    which a SQL oracle reproduces without decoding anything -- any
    codec regression breaks the hash match.  Runs as Arrow-batched
    mapInPandas over just the id column (payloads never leave the
    task)."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h, v = 4 + did % 13, 3 + did % 7, did % 251
                px = np.empty((h, w, 3), dtype=np.uint8)
                for c in range(3):
                    px[:, :, c] = (v + 83 * c) % 256
                w2, h2, out = png_decode_pixels(encode_png(px))
                rows.append((did, w2, h2, int(out.astype(np.int64).sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "pixel_sum"]
            )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(docs.sparkSession)
    return docs.select(id_col).mapInPandas(
        op, schema="doc_id long, width int, height int, pixel_sum long"
    )


def synthesize_square_wavs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic square-wave WAV payloads from ids, for the
    oracle-checked audio round-trip: amplitude (1 + id%7)/8 is dyadic
    (bit-exact through PCM16 at scale 32768), sign alternates every
    sample (zero-crossing rate exactly 1), n_frames = 800 + (id%5)*400
    at 8 kHz.  RMS and peak therefore equal the amplitude exactly and
    every feature has a closed form a SQL oracle reproduces."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                n = 800 + (did % 5) * 400
                a = (1 + did % 7) / 8.0
                wave = a * (1.0 - 2.0 * (np.arange(n) % 2))
                rows.append((did, "audio", encode_wav_pcm16(wave, 8000)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(docs.sparkSession)
    return docs.select(id_col).mapInPandas(
        op, schema="media_id long, kind string, payload binary"
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_frames long, n_channels int, "
    "duration_ms long, rms double, peak double, zero_cross_rate double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Real audio feature extraction over WAV payloads via Arrow-batched
    mapInPandas: RMS energy, absolute peak, and zero-crossing rate over
    the channel-mean signal -- the signals a curation pipeline uses to
    drop silence/clipped/noise-only clips.  Undecodable payloads yield
    a row of NULL features (totality: no poison pills), same contract
    as :func:`resize_images`."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, samples = wav_decode_samples(bytes(payload or b""))
                    mono = samples.mean(axis=1)
                    n = len(mono)
                    zc = (
                        float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                        / (n - 1)
                        if n > 1
                        else 0.0
                    )
                    rows.append(
                        (mid, rate, n, samples.shape[1],
                         int(n * 1000 / rate),
                         float(np.sqrt(np.mean(mono ** 2))) if n else 0.0,
                         float(np.abs(samples).max()) if n else 0.0,
                         zc)
                    )
                except ValueError:
                    rows.append((mid, None, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_frames", "n_channels",
                    "duration_ms", "rms", "peak", "zero_cross_rate",
                ],
            )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    return media.mapInPandas(op, schema=AUDIO_FEATURES_SCHEMA)


def real_decode(payload: bytes, kind: str) -> dict:
    """Real media decode for the formats a pure-Python parse can handle:

    - images: PPM (P6) and 24-bit BMP via :func:`decode_image_pixels`
      (full pixel decode, not just header sniffing); PNG, GIF, and
      baseline JPEG full pixel decode exist too
      (:func:`png_decode_pixels`, :func:`gif_decode_pixels`,
      :func:`jpeg_decode_pixels`) but the meta path below reads only
      headers -- JPEG dimensions via :func:`jpeg_dimensions` (SOF
      marker walk);
    - audio: WAV/RIFF -- duration from the fmt chunk's byte rate and
      the data chunk length (real SAMPLE decode exists too:
      :func:`wav_decode_samples` / :func:`extract_audio_features`);
    - video/containers: MP4/ISO-BMFF (.mp4/.m4a/.m4v/.mov) duration +
      track dimensions via :func:`mp4_metadata` (pure box walk); Ogg
      Vorbis/Opus duration via :func:`ogg_metadata` (page-granule
      walk); FLAC duration via :func:`flac_metadata` (STREAMINFO).

    - image headers: JPEG dimensions (SOF walk), PNG dimensions (IHDR
      fixed offsets), GIF dimensions (logical screen descriptor).

    PNG, GIF, and baseline JPEG pixel data ARE decodable
    dependency-free (:func:`png_decode_pixels` /
    :func:`gif_decode_pixels` / :func:`jpeg_decode_pixels`) but the
    metadata path deliberately stays on the header walks -- a corpus
    sweep for dimensions must not inflate/entropy-decode every
    payload.  Anything else (MP4/OGG/..., progressive JPEG) requires
    codec libraries not present in this container and raises
    NotImplementedError; ``fake_decode`` remains the deterministic
    stand-in for those in tests.
    """
    if payload[:2] in (b"P6", b"BM"):
        w, h, _ = decode_image_pixels(payload)
        return {"width": w, "height": h, "duration_ms": None}
    if payload[:2] == b"\xff\xd8":
        w, h = jpeg_dimensions(payload)
        return {"width": w, "height": h, "duration_ms": None}
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # the IHDR chunk is REQUIRED first (PNG spec 11.2.2): width and
        # height are big-endian u32 at fixed offsets 16/20 -- header
        # metadata only BY DESIGN: the metadata sweep must not pay the
        # IDAT inflate; png_decode_pixels is the opt-in pixel stage
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("PNG missing IHDR")
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return {"width": w, "height": h, "duration_ms": None}
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        # logical screen descriptor: little-endian u16 at offsets 6/8
        if len(payload) < 10:
            raise ValueError("GIF truncated before screen descriptor")
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return {"width": w, "height": h, "duration_ms": None}
    if len(payload) >= 8 and payload[4:8] in (b"ftyp", b"moov"):
        # MP4/ISO-BMFF family (.mp4/.m4a/.m4v/.mov): box-walk metadata
        return mp4_metadata(payload)
    if payload[:4] == b"OggS":
        return ogg_metadata(payload)
    if payload[:4] == b"fLaC":
        return flac_metadata(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        m = avi_mjpeg_metadata(payload)
        return {k: m[k] for k in ("width", "height", "duration_ms")}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # walk chunks: fmt_ gives byte rate, data gives payload length
        pos, byte_rate, data_len = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            if cid == b"fmt ":
                byte_rate = int.from_bytes(payload[pos + 16 : pos + 20], "little")
            elif cid == b"data":
                data_len = clen
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if not byte_rate or data_len is None:
            raise ValueError("WAV missing fmt/data chunk")
        return {
            "width": None,
            "height": None,
            "duration_ms": int(data_len * 1000 / byte_rate),
        }
    raise NotImplementedError(
        "decode for this format requires image/audio libraries not present "
        "in this environment (pure-Python path handles PPM/BMP/PNG/GIF/"
        "baseline-JPEG/WAV plus MP4/Ogg/FLAC metadata); use fake_decode "
        "for deterministic tests"
    )


def fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode: derives plausible metadata from the
    payload hash so tests are reproducible without media libraries."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 64 + h[0],
        "height": 64 + h[1],
        "duration_ms": int.from_bytes(h[2:4], "big") if kind in ("audio", "video") else None,
    }


def extract_media_meta(media: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """mapInPandas feature-extraction over binary payloads.

    Arrow-batched: each pandas batch holds a bounded slice of payload
    bytes; output is small typed metadata -- the classic shape for
    decode / resize / frame-sample stages.
    """
    decode = real_decode if use_real_decode else fake_decode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload -> NULL metadata row: an absent payload has
            # no bytes to hash or decode, and `p or b""` would fabricate
            # the empty-bytes sha/meta for it (an empty-but-present
            # payload b"" still gets real empty-bytes metadata)
            metas = [
                None if p is None else decode(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        None if p is None else len(p) for p in pdf["payload"]
                    ],
                    "sha256": [
                        None if p is None else hashlib.sha256(p).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "width": [m and m["width"] for m in metas],
                    "height": [m and m["height"] for m in metas],
                    "duration_ms": [m and m["duration_ms"] for m in metas],
                }
            )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    return media.mapInPandas(op, schema=DECODED_META_SCHEMA)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize: binary in -> binary out over Arrow-batched
    mapInPandas.  Payloads whose format the dependency-free decoders
    handle (PPM/BMP/PNG/GIF/baseline JPEG,
    :func:`decode_image_pixels`) get a REAL
    nearest-neighbor resample (numpy fancy-index on the row/column
    grids -- vectorized per image, linear in output pixels) re-encoded
    as PNG (:func:`encode_png`).  Undecodable payloads keep the
    deterministic truncate/pad stand-in so the batch flow stays total
    (no poison-pill rows kill a 100 TB stage; a real deployment would
    route those to a quarantine sink)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        target = width * height

        def one(p: bytes) -> bytes:
            try:
                w0, h0, px = decode_image_pixels(p or b"")
            except Exception:
                # untrusted bytes: any parse failure (ValueError, a
                # zlib.error from a corrupt IDAT, a short-slice Index-
                # Error) routes to the stand-in, never up the stage
                return (p or b"").ljust(target, b"\0")[:target]
            rows = np.minimum((np.arange(height) * h0) // height, h0 - 1)
            cols = np.minimum((np.arange(width) * w0) // width, w0 - 1)
            return encode_png(px[rows][:, cols])

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": [one(p) for p in pdf["payload"]],
                }
            )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    return media.mapInPandas(
        op, schema="media_id long, width int, height int, payload binary"
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, use_real_decode: bool = False
) -> DataFrame:
    """Frame-sampling timeline for video/audio payloads: emits
    (media_id, frame_idx, ts_ms) rows every ``every_ms`` across the
    container duration -- the 1-to-N mapInPandas shape.  With
    ``use_real_decode`` the duration comes from the real metadata
    parsers (MP4 box walk / WAV byte rate); payloads those can't parse
    emit no rows.  The actual frame-pixel extraction stays codec-gated;
    ``fake_decode`` remains the deterministic default for tests."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": []}
            for mid, payload, kind in zip(pdf["media_id"], pdf["payload"], pdf["kind"]):
                if use_real_decode:
                    try:
                        meta = real_decode(bytes(payload or b""), kind)
                    except (ValueError, NotImplementedError):
                        continue
                else:
                    meta = fake_decode(payload, kind)
                dur = meta["duration_ms"] or 0
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
            yield pd.DataFrame(out)

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    return media.mapInPandas(op, schema="media_id long, frame_idx int, ts_ms long")

"""PNG / GIF pixel decode — dependency-free codecs validated against
independently-written encoders.

The decoders under test (``png_decode_pixels``, ``gif_decode_pixels``)
close the former "pixel decode needs codec libraries" gap: PNG needs
only stdlib zlib + numpy filter reconstruction, GIF's LZW is pure
logic.  The builders here implement the FORWARD direction (PNG filter
application, GIF LZW compression) from the specs directly, so a
round-trip match is two independent implementations agreeing —
not a function inverting itself.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from data_stream_flink_user_address_spark.functions.multimodal import (
    decode_image_pixels,
    encode_png,
    gif_decode_pixels,
    png_decode_pixels,
)


# ---------------------------------------------------------------- PNG builder


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big") + ctype + data
        + zlib.crc32(ctype + data).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


def _filter_rows(rows, height, rowlen, bpp, ftypes):
    """Apply PNG filters 0-4 forward (spec 9.2), cycling ``ftypes``."""
    out = bytearray()
    prev = [0] * rowlen
    for y in range(height):
        cur = [int(v) for v in rows[y]]
        f = ftypes[y % len(ftypes)]
        out.append(f)
        for x in range(rowlen):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = (cur[x] - a) % 256
            elif f == 2:
                v = (cur[x] - b) % 256
            elif f == 3:
                v = (cur[x] - (a + b) // 2) % 256
            else:
                v = (cur[x] - _paeth(a, b, c)) % 256
            out.append(v)
        prev = cur
    return bytes(out)


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _make_png(px, color, depth=8, interlace=0, ftypes=(0,), pal=None):
    """Spec-direct PNG writer: any color type / filter mix / interlace."""
    h, w = px.shape[:2]
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bpp = ch * (depth // 8)
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([depth, color, 0, 0, interlace])
    )
    if depth == 16:
        data = np.zeros((h, w, ch, 2), dtype=np.uint8)
        data[..., 0] = px.reshape(h, w, ch)  # value in the high byte
        data = data.reshape(h, -1)
    else:
        data = px.reshape(h, -1)
    if interlace == 0:
        raw = _filter_rows(data, h, w * bpp, bpp, ftypes)
    else:
        raw = b""
        img = data.reshape(h, w, bpp)
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph and pw:
                raw += _filter_rows(sub.reshape(ph, -1), ph, pw * bpp, bpp, ftypes)
    body = _chunk(b"IHDR", ihdr)
    if pal is not None:
        body += _chunk(b"PLTE", pal.tobytes())
    body += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


# ---------------------------------------------------------------- GIF builder


class _BitWriter:
    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def write(self, code, size):
        self.acc |= code << self.n
        self.n += size
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices, min_code_size):
    """GIF-variant LZW compressor (spec appendix F), including the
    4095-entry table reset."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    bw = _BitWriter()
    code_size = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, code_size)
    cur = ()
    for px in indices:
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        bw.write(table[cur], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == 4096:
            bw.write(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        cur = (px,)
    if cur:
        bw.write(table[cur], code_size)
    bw.write(eoi, code_size)
    return bw.finish()


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _make_gif(px_idx, pal, interlace=False, local=False, with_ext=True):
    h, w = px_idx.shape
    bits = max(1, (len(pal) - 1).bit_length())
    pal_full = np.zeros((2 ** bits, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    if local:
        out += bytes([0x00, 0, 0])  # no global color table
    else:
        out += bytes([0x80 | (bits - 1), 0, 0]) + pal_full.tobytes()
    if with_ext:  # graphic-control extension exercises the skip path
        out += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    out += b"\x2C" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([(0x40 if interlace else 0) | ((0x80 | (bits - 1)) if local else 0)])
    if local:
        out += pal_full.tobytes()
    if interlace:
        order = np.concatenate([np.arange(y0, h, dy) for y0, dy in _GIF_INTERLACE])
        stream = px_idx[order].reshape(-1)
    else:
        stream = px_idx.reshape(-1)
    mcs = max(2, bits)
    data = _lzw_encode([int(v) for v in stream], mcs)
    out += bytes([mcs])
    for i in range(0, len(data), 255):
        blk = data[i : i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3B"
    return bytes(out)


# -------------------------------------------------------------------- tests


def test_png_encode_decode_round_trip():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (17, 13), (64, 64)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        w2, h2, out = png_decode_pixels(encode_png(px))
        assert (w2, h2) == (w, h)
        assert np.array_equal(out, px)


def test_png_all_filter_types_reconstruct():
    rng = np.random.default_rng(3)
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        px = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
        _, _, out = png_decode_pixels(_make_png(px, color=2, ftypes=ftypes))
        assert np.array_equal(out, px), f"filters {ftypes}"


def test_png_color_types_gray_alpha_palette():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (7, 5, 1), dtype=np.uint8)
    _, _, out = png_decode_pixels(_make_png(g, color=0, ftypes=[1, 4]))
    assert np.array_equal(out, np.repeat(g, 3, axis=2))

    ga = rng.integers(0, 256, (7, 5, 2), dtype=np.uint8)
    _, _, out = png_decode_pixels(_make_png(ga, color=4, ftypes=[3]))
    assert np.array_equal(out, np.repeat(ga[:, :, :1], 3, axis=2))

    rgba = rng.integers(0, 256, (6, 8, 4), dtype=np.uint8)
    _, _, out = png_decode_pixels(_make_png(rgba, color=6, ftypes=[4]))
    assert np.array_equal(out, rgba[:, :, :3])  # alpha dropped, not composited

    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 7, 1), dtype=np.uint8)
    _, _, out = png_decode_pixels(_make_png(idx, color=3, pal=pal))
    assert np.array_equal(out, pal[idx[:, :, 0]])


def test_png_16bit_keeps_high_byte():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    _, _, out = png_decode_pixels(_make_png(px, color=2, depth=16, ftypes=[2]))
    assert np.array_equal(out, px)


def test_png_adam7_interlace_all_shapes():
    # awkward sizes exercise empty passes (1x1 hits 6 of 7) and
    # partial-pass rounding
    rng = np.random.default_rng(13)
    for h0, w0 in [(1, 1), (2, 3), (7, 7), (8, 8), (9, 10), (16, 5)]:
        px = rng.integers(0, 256, (h0, w0, 3), dtype=np.uint8)
        blob = _make_png(px, color=2, interlace=1, ftypes=[0, 1, 2, 3, 4])
        w, h, out = png_decode_pixels(blob)
        assert (w, h) == (w0, h0)
        assert np.array_equal(out, px), (h0, w0)


def test_png_malformed_payloads_raise():
    ok = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        png_decode_pixels(b"not a png")
    with pytest.raises(ValueError):
        png_decode_pixels(ok[:20])  # truncated inside IHDR chunk
    with pytest.raises(ValueError):  # bit depth 4 unsupported
        bad = bytearray(ok)
        bad[24] = 4
        png_decode_pixels(bytes(bad))
    with pytest.raises(ValueError):  # filter byte 9 invalid
        raw = zlib.compress(b"\x09" + b"\x00" * 6 + b"\x00" + b"\x00" * 6)
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", (2).to_bytes(4, "big") * 2 + bytes([8, 2, 0, 0, 0]))
            + _chunk(b"IDAT", raw) + _chunk(b"IEND", b"")
        )
        png_decode_pixels(blob)
    with pytest.raises(ValueError):  # inflated length mismatch
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", (2).to_bytes(4, "big") * 2 + bytes([8, 2, 0, 0, 0]))
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 5)) + _chunk(b"IEND", b"")
        )
        png_decode_pixels(blob)
    with pytest.raises(ValueError):  # palette index out of range
        pal = np.zeros((2, 3), dtype=np.uint8)
        idx = np.full((1, 1, 1), 7, dtype=np.uint8)
        png_decode_pixels(_make_png(idx, color=3, pal=pal))


def test_gif_round_trip_shapes_palettes_interlace():
    rng = np.random.default_rng(11)
    cases = [
        (1, 1, 2, False, False),
        (5, 7, 4, False, False),
        (13, 9, 16, True, False),   # interlaced
        (8, 8, 256, False, True),   # local palette, 8-bit codes
        (33, 21, 7, True, True),    # non-power-of-two palette
        (64, 48, 256, False, False),
    ]
    for h, w, ncol, interlace, local in cases:
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, (h, w), dtype=np.int64)
        blob = _make_gif(idx, pal, interlace=interlace, local=local)
        w2, h2, out = gif_decode_pixels(blob)
        assert (w2, h2) == (w, h)
        assert np.array_equal(out, pal[idx]), (h, w, ncol, interlace, local)


def test_gif_lzw_table_growth_and_repeats():
    # highly repetitive data drives dictionary growth + the KwKwK case
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = np.tile(np.arange(4), (16, 16))[:16, :16].astype(np.int64)
    blob = _make_gif(idx, pal)
    assert np.array_equal(gif_decode_pixels(blob)[2], pal[idx])
    # dispatch through the generic decoder too
    assert np.array_equal(decode_image_pixels(blob)[2], pal[idx])


def test_gif_malformed_payloads_raise():
    with pytest.raises(ValueError):
        gif_decode_pixels(b"JIF89a rest")
    with pytest.raises(ValueError):
        gif_decode_pixels(b"GIF89a\x01\x00")  # truncated descriptor
    # frame with no color table at all
    no_pal = (
        b"GIF89a" + (1).to_bytes(2, "little") * 2 + b"\x00\x00\x00"
        + b"\x2C" + b"\x00" * 4 + (1).to_bytes(2, "little") * 2 + b"\x00"
        + b"\x02\x01\x00\x00\x3B"
    )
    with pytest.raises(ValueError):
        gif_decode_pixels(no_pal)
    # trailer before any frame
    with pytest.raises(ValueError):
        gif_decode_pixels(b"GIF89a" + (1).to_bytes(2, "little") * 2 + b"\x00\x00\x00\x3B")
    # LZW stream too short for the declared frame
    pal = np.zeros((2, 3), dtype=np.uint8)
    idx = np.zeros((4, 4), dtype=np.int64)
    blob = bytearray(_make_gif(idx, pal))
    # truncate: drop the last two sub-block bytes before terminator+trailer
    with pytest.raises(ValueError):
        short = _make_gif(np.zeros((1, 1), dtype=np.int64), pal)
        # declare a 4x4 frame but encode only 1 pixel
        short = bytearray(short)
        short[6:8] = (4).to_bytes(2, "little")
        short[8:10] = (4).to_bytes(2, "little")
        pos = short.index(0x2C)
        short[pos + 5 : pos + 7] = (4).to_bytes(2, "little")
        short[pos + 7 : pos + 9] = (4).to_bytes(2, "little")
        gif_decode_pixels(bytes(short))


def test_decode_image_pixels_rejects_unknown_magic():
    with pytest.raises(ValueError):
        decode_image_pixels(b"\x00\x01\x02\x03 not an image")


def test_resize_images_real_path_through_spark(spark):
    """A real PNG payload is decoded, nearest-neighbor resampled, and
    re-emitted as a real PNG; undecodable payloads keep the
    deterministic pad/truncate stand-in (no poison pills)."""
    from data_stream_flink_user_address_spark.functions.multimodal import (
        resize_images,
    )

    rng = np.random.default_rng(21)
    px = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(px))), (2, "image", bytearray(b"junk"))],
        "media_id long, kind string, payload binary",
    )
    out = {r["media_id"]: r for r in resize_images(media, width=4, height=4).collect()}

    w, h, got = png_decode_pixels(bytes(out[1]["payload"]))
    assert (w, h) == (4, 4)
    rows = np.minimum((np.arange(4) * 8) // 4, 7)
    cols = np.minimum((np.arange(4) * 6) // 4, 5)
    assert np.array_equal(got, px[rows][:, cols])

    assert bytes(out[2]["payload"]) == b"junk".ljust(16, b"\0")


# --------------------------------------------------------------- JPEG builder


def _jpeg_dct_matrix():
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    t = np.cos((2 * x + 1) * u * np.pi / 16) / 2
    t[0] /= np.sqrt(2.0)
    return t


_JPEG_T = _jpeg_dct_matrix()

_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


class _JpegBitWriter:
    """MSB-first with 0xFF00 byte stuffing (T.81 F.1.2.3)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, size):
        for i in range(size - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits


def _jpeg_category(v):
    return 0 if v == 0 else abs(v).bit_length()


def _jpeg_mag_bits(v, t):
    return v if v >= 0 else v + (1 << t) - 1


def _jpeg_build_huff(symbols):
    """Canonical table with every symbol at one length L (2^L > nsym so
    the all-ones code stays unused, as T.81 C.2 requires)."""
    syms = sorted(set(symbols))
    L = max(2, len(syms).bit_length())
    if len(syms) + 1 > (1 << L):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms, {s: (i, L) for i, s in enumerate(syms)}


def _make_real_jpeg(px, subsample=False, quant=None, restart=0):
    """Spec-direct baseline JPEG encoder (T.81 annexes A/C/F forward
    direction): forward DCT, quantize, zigzag, run-length, canonical
    Huffman with per-file tables, byte stuffing, optional 4:2:0
    subsampling and restart intervals.  Written independently of the
    decoder so round-trips are two implementations agreeing."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=np.float64)
    if gray:
        planes, samp = [px.astype(np.float64)], [(1, 1)]
    else:
        r, g, b = [px[:, :, i].astype(np.float64) for i in range(3)]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            bh, bw_ = -(-h // 2) * 2, -(-w // 2) * 2

            def pad2(p):
                out = np.empty((bh, bw_))
                out[: p.shape[0], : p.shape[1]] = p
                out[p.shape[0] :, : p.shape[1]] = p[-1:]
                out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
                return out

            cb = pad2(cb).reshape(bh // 2, 2, bw_ // 2, 2).mean(axis=(1, 3))
            cr = pad2(cr).reshape(bh // 2, 2, bw_ // 2, 2).mean(axis=(1, 3))
            planes, samp = [y, cb, cr], [(2, 2), (1, 1), (1, 1)]
        else:
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        out = np.empty((ph, pw))
        out[: p.shape[0], : p.shape[1]] = p
        out[p.shape[0] :, : p.shape[1]] = p[p.shape[0] - 1 : p.shape[0], :]
        out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
        padded.append(out)
    ncomp = len(planes)
    dc_syms, ac_syms = [], []
    dc_pred = [0] * ncomp
    rst_groups = [[]]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and (my * mcux + mx) and (my * mcux + mx) % restart == 0:
                dc_pred = [0] * ncomp
                rst_groups.append([])
            unit = []
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        qc = np.rint((_JPEG_T @ blk @ _JPEG_T.T) / q).astype(np.int64)
                        zz = qc.reshape(-1)[list(_JPEG_ZIGZAG)]
                        diff = int(zz[0]) - dc_pred[ci]
                        dc_pred[ci] = int(zz[0])
                        t = _jpeg_category(diff)
                        dc_syms.append((ci > 0, t))
                        run, ac = 0, []
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ac.append((0xF0, 0, 0))
                                ac_syms.append((ci > 0, 0xF0))
                                run -= 16
                            s = _jpeg_category(v)
                            ac.append(((run << 4) | s, v, s))
                            ac_syms.append((ci > 0, (run << 4) | s))
                            run = 0
                        if run:
                            ac.append((0x00, 0, 0))
                            ac_syms.append((ci > 0, 0x00))
                        unit.append((ci, diff, t, ac))
            rst_groups[-1].append(unit)
    tabs = {}
    for cls, pool in ((0, dc_syms), (1, ac_syms)):
        for chroma in (False, True):
            syms = [s for c, s in pool if c == chroma] or [0]
            tabs[(cls, int(chroma))] = _jpeg_build_huff(syms)
    out = bytearray(b"\xff\xd8")
    qz = np.rint(q).astype(int).reshape(-1)[list(_JPEG_ZIGZAG)]
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes(int(v) for v in qz)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    for (cls, tid), (bits, syms, _) in tabs.items():
        seg = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + (2 + len(seg)).to_bytes(2, "big") + seg
    if restart:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart.to_bytes(2, "big")
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 1 if ci else 0
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
    rstn = 0
    for gi, group in enumerate(rst_groups):
        if gi:
            out += bytes([0xFF, 0xD0 + (rstn & 7)])
            rstn += 1
        bw2 = _JpegBitWriter()
        for unit in group:
            for ci, diff, t, ac in unit:
                chroma = int(ci > 0)
                code, ln = tabs[(0, chroma)][2][t]
                bw2.write(code, ln)
                if t:
                    bw2.write(_jpeg_mag_bits(diff, t), t)
                for sym, v, s in ac:
                    code, ln = tabs[(1, chroma)][2][sym]
                    bw2.write(code, ln)
                    if s:
                        bw2.write(_jpeg_mag_bits(v, s), s)
        bw2.align()
        out += bw2.buf
    return bytes(out + b"\xff\xd9")


# --------------------------------------------------------------- JPEG tests


def test_jpeg_round_trip_444_and_gray():
    from data_stream_flink_user_address_spark.functions.multimodal import (
        jpeg_decode_pixels,
    )

    rng = np.random.default_rng(5)
    # solid gray at quant=1: exact
    px = np.full((8, 8), 100, dtype=np.uint8)
    w, h, out = jpeg_decode_pixels(_make_real_jpeg(px))
    assert (w, h) == (8, 8)
    assert np.abs(out[:, :, 0].astype(int) - 100).max() == 0

    # random RGB 4:4:4, non-multiple-of-8 dims (crop path), quant=1:
    # only float DCT/color rounding separates the two implementations
    px = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    w, h, out = jpeg_decode_pixels(_make_real_jpeg(px))
    assert (w, h) == (17, 24)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 2

    # grayscale single-component: replicated channels
    px = rng.integers(0, 256, (19, 11), dtype=np.uint8)
    w, h, out = jpeg_decode_pixels(_make_real_jpeg(px))
    assert (w, h) == (11, 19)
    assert np.abs(out[:, :, 0].astype(int) - px.astype(int)).max() <= 1
    assert np.array_equal(out[:, :, 0], out[:, :, 2])


def test_jpeg_420_subsampling_and_restart_markers():
    from data_stream_flink_user_address_spark.functions.multimodal import (
        decode_image_pixels,
        jpeg_decode_pixels,
    )

    rng = np.random.default_rng(6)
    # chroma-constant content means 2x2-average down + nearest up is lossless
    base = rng.integers(0, 200, (32, 32), dtype=np.uint8)
    px = np.stack([base] * 3, axis=2)
    w, h, out = jpeg_decode_pixels(_make_real_jpeg(px, subsample=True))
    assert (w, h) == (32, 32)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1

    # restart interval: DC predictors reset + RSTn sequence consumed
    px = rng.integers(0, 256, (16, 40, 3), dtype=np.uint8)
    blob = _make_real_jpeg(px, restart=2)
    assert b"\xff\xd0" in blob  # really exercised
    w, h, out = jpeg_decode_pixels(blob)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 2
    # magic dispatch
    assert decode_image_pixels(blob)[0] == 40


def test_jpeg_lossy_quant_bounded_on_smooth_image():
    from data_stream_flink_user_address_spark.functions.multimodal import (
        jpeg_decode_pixels,
    )

    yy, xx = np.mgrid[0:24, 0:24]
    px = np.stack(
        [(yy * 4) % 256, (xx * 4) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)
    q = np.full((8, 8), 4.0)
    _, _, out = jpeg_decode_pixels(_make_real_jpeg(px, quant=q))
    # quantization at step 4 on a smooth ramp: small bounded error
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 16


def test_jpeg_16bit_dqt_precision():
    from data_stream_flink_user_address_spark.functions.multimodal import (
        jpeg_decode_pixels,
    )

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    blob = _make_real_jpeg(px)
    # rewrite the 8-bit DQT segment as 16-bit precision in place
    i = blob.index(b"\xff\xdb")
    vals = blob[i + 5 : i + 5 + 64]
    seg16 = b"\x10" + b"".join(int(v).to_bytes(2, "big") for v in vals)
    patched = (
        blob[:i] + b"\xff\xdb" + (2 + len(seg16)).to_bytes(2, "big") + seg16
        + blob[i + 69 :]
    )
    _, _, out = jpeg_decode_pixels(patched)
    _, _, want = jpeg_decode_pixels(blob)
    assert np.array_equal(out, want)


def test_jpeg_unsupported_variants_raise():
    from data_stream_flink_user_address_spark.functions.multimodal import (
        jpeg_decode_pixels,
    )

    blob = _make_real_jpeg(np.zeros((8, 8), dtype=np.uint8))
    progressive = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        jpeg_decode_pixels(progressive)
    with pytest.raises(ValueError):
        jpeg_decode_pixels(b"\xff\xd8\xff\xd9")  # no SOF/SOS at all
    with pytest.raises(ValueError):
        jpeg_decode_pixels(blob[: len(blob) // 2])  # entropy data truncated


# ------------------------------------------------- MP4 / WAV sample builders


def _box(btype: bytes, payload: bytes, largesize=False) -> bytes:
    if largesize:
        return (1).to_bytes(4, "big") + btype + (16 + len(payload)).to_bytes(8, "big") + payload
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def _make_mp4(duration_ms=5000, timescale=1000, width=640, height=360,
              mvhd_v1=False, tkhd_v1=False, audio_track_first=True):
    dur = duration_ms * timescale // 1000
    if mvhd_v1:
        mvhd = bytes([1, 0, 0, 0]) + b"\x00" * 16 + timescale.to_bytes(4, "big") + dur.to_bytes(8, "big") + b"\x00" * 80
    else:
        mvhd = bytes(4) + b"\x00" * 8 + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big") + b"\x00" * 80

    def tkhd(w, h, v1=False):
        if v1:
            head = bytes([1, 0, 0, 0]) + b"\x00" * 32 + b"\x00" * 8  # through rsvd(8)
            body = head + b"\x00" * 8 + b"\x00" * 36  # layer..matrix
        else:
            head = bytes(4) + b"\x00" * 20 + b"\x00" * 8
            body = head + b"\x00" * 8 + b"\x00" * 36
        return body + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big")

    tracks = b""
    if audio_track_first:  # 0x0 dims must be skipped, not returned
        tracks += _box(b"trak", _box(b"tkhd", tkhd(0, 0)))
    tracks += _box(b"trak", _box(b"tkhd", tkhd(width, height, v1=tkhd_v1)))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + tracks)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov + _box(b"mdat", b"\x00" * 32)


def _make_pcm_wav(rate, samples, bits=16, fmt=1):
    """samples: (n, ch) float64 in [-1,1]."""
    n, ch = samples.shape
    if fmt == 3:
        data = samples.astype("<f4" if bits == 32 else "<f8").tobytes()
    elif bits == 8:
        data = np.rint(np.clip(samples, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = np.rint(np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    elif bits == 24:
        v = np.rint(np.clip(samples, -1, 1) * ((1 << 23) - 1)).astype(np.int64).reshape(-1)
        v = np.where(v < 0, v + (1 << 24), v)
        b = np.zeros((len(v), 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        data = b.tobytes()
    else:
        data = np.rint(np.clip(samples, -1, 1) * ((1 << 31) - 1)).astype("<i4").tobytes()
    block = ch * bits // 8
    fmtc = (
        fmt.to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    out = b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
    out += b"fmt " + (16).to_bytes(4, "little") + fmtc
    out += b"data" + len(data).to_bytes(4, "little") + data
    return out


def test_mp4_metadata_box_walk():
    from data_stream_flink_user_address_spark.functions.multimodal import (
        mp4_metadata,
        real_decode,
    )

    blob = _make_mp4(duration_ms=5000, width=640, height=360)
    got = mp4_metadata(blob)
    assert got == {"width": 640, "height": 360, "duration_ms": 5000}
    # real_decode routes the ftyp magic here
    assert real_decode(blob, "video") == got

    # version-1 boxes (64-bit times) and odd timescales
    got = mp4_metadata(
        _make_mp4(duration_ms=123456, timescale=90000, width=1920, height=1080,
                  mvhd_v1=True, tkhd_v1=True)
    )
    assert got["duration_ms"] == 123456
    assert (got["width"], got["height"]) == (1920, 1080)

    with pytest.raises(ValueError):  # no moov at all
        mp4_metadata(_box(b"ftyp", b"isom") + _box(b"mdat", b"x" * 8))
    with pytest.raises(ValueError):  # box overruns the buffer
        mp4_metadata(b"\x00\x00\x00\x18ftypmp42rest")


def test_wav_sample_decode_all_depths():
    from data_stream_flink_user_address_spark.functions.multimodal import (
        wav_decode_samples,
    )

    rng = np.random.default_rng(17)
    want = rng.uniform(-0.9, 0.9, (500, 2))
    # 8-bit: 0.5/128 rounding + the 127-vs-128 scale skew
    for bits, fmt, tol in [(8, 1, 0.012), (16, 1, 5e-5), (24, 1, 1e-6),
                           (32, 1, 1e-9), (32, 3, 1e-7), (64, 3, 0.0)]:
        rate, got = wav_decode_samples(_make_pcm_wav(8000, want, bits=bits, fmt=fmt))
        assert rate == 8000 and got.shape == (500, 2), (bits, fmt)
        assert np.abs(got - want).max() <= tol, (bits, fmt)

    with pytest.raises(ValueError):  # ADPCM and friends need codec tables
        wav_decode_samples(_make_pcm_wav(8000, want, bits=16, fmt=2))


def test_extract_audio_features_through_spark(spark):
    from data_stream_flink_user_address_spark.functions.multimodal import (
        extract_audio_features,
    )

    t = np.arange(8000) / 8000.0
    sine = (0.5 * np.sin(2 * np.pi * 440 * t)).reshape(-1, 1)
    silence = np.zeros((4000, 1))
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(_make_pcm_wav(8000, sine))),
            (2, "audio", bytearray(_make_pcm_wav(8000, silence))),
            (3, "audio", bytearray(b"not a wav")),
        ],
        "media_id long, kind string, payload binary",
    )
    rows = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    r1 = rows[1]
    assert r1["duration_ms"] == 1000 and r1["n_channels"] == 1
    assert abs(r1["rms"] - 0.5 / np.sqrt(2)) < 0.01  # sine RMS = A/sqrt(2)
    assert abs(r1["zero_cross_rate"] - 2 * 440 / 8000) < 0.01
    assert rows[2]["rms"] == 0.0 and rows[2]["peak"] == 0.0
    assert rows[3]["rms"] is None  # undecodable -> NULL features, no crash


def test_sample_frames_real_durations(spark):
    from data_stream_flink_user_address_spark.functions.multimodal import (
        sample_frames,
    )

    mp4 = _make_mp4(duration_ms=3500)
    wav = _make_pcm_wav(8000, np.zeros((16000, 1)))  # 2 s
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(mp4)),
            (2, "audio", bytearray(wav)),
            (3, "video", bytearray(b"undecodable")),
        ],
        "media_id long, kind string, payload binary",
    )
    rows = sample_frames(media, every_ms=1000, use_real_decode=True).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["ts_ms"])
    assert sorted(by_id[1]) == [0, 1000, 2000, 3000]  # 3.5 s -> 4 ticks
    assert sorted(by_id[2]) == [0, 1000]
    assert 3 not in by_id  # unparseable emits nothing in real mode


# -------------------------------------------------- OGG / FLAC metadata


def _ogg_page(serial, seq, granule, body, header_type=0):
    segs = []
    n = len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    head = (
        b"OggS" + bytes([0, header_type])
        + granule.to_bytes(8, "little", signed=True)
        + serial.to_bytes(4, "little") + seq.to_bytes(4, "little")
        + b"\x00" * 4  # crc unchecked by the metadata walk
        + bytes([len(segs)]) + bytes(segs)
    )
    return head + body


def _make_ogg_vorbis(rate=44100, total_samples=88200):
    ident = (
        b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2])
        + rate.to_bytes(4, "little") + b"\x00" * 16
    )
    pages = _ogg_page(7, 0, 0, ident, header_type=2)
    pages += _ogg_page(7, 1, total_samples // 2, b"\x00" * 64)
    pages += _ogg_page(7, 2, total_samples, b"\x00" * 64, header_type=4)
    return pages


def _make_ogg_opus(preskip=312, granule=48312):
    ident = (
        b"OpusHead" + bytes([1, 2]) + preskip.to_bytes(2, "little")
        + (48000).to_bytes(4, "little") + b"\x00" * 4
    )
    return (
        _ogg_page(9, 0, 0, ident, header_type=2)
        + _ogg_page(9, 1, granule, b"\x00" * 32, header_type=4)
    )


def _make_flac(rate=44100, total_samples=132300):
    si = bytearray(34)
    si[0:2] = (4096).to_bytes(2, "big")
    si[2:4] = (4096).to_bytes(2, "big")
    # rate(20) | channels-1(3) | bps-1(5) | total(36) packed at [10:18]
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0xF) << 4) | (1 << 1) | ((total_samples >> 32) and 0)
    si[12] |= (16 - 1) >> 4  # bps-1 high bit
    si[13] = (((16 - 1) & 0xF) << 4) | ((total_samples >> 32) & 0xF)
    si[14:18] = (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si)


def test_ogg_metadata_vorbis_and_opus():
    from data_stream_flink_user_address_spark.functions.multimodal import (
        ogg_metadata,
        real_decode,
    )

    got = ogg_metadata(_make_ogg_vorbis(rate=44100, total_samples=88200))
    assert got["duration_ms"] == 2000
    # real_decode routes the OggS magic
    assert real_decode(_make_ogg_vorbis(rate=8000, total_samples=4000), "audio")[
        "duration_ms"
    ] == 500

    # Opus: granule is 48 kHz units minus the pre-skip
    got = ogg_metadata(_make_ogg_opus(preskip=312, granule=48312))
    assert got["duration_ms"] == 1000

    with pytest.raises(ValueError):
        ogg_metadata(b"OggS" + b"\x00" * 20)  # truncated page header
    flac_in_ogg = _ogg_page(3, 0, 0, b"\x7fFLAC" + b"\x00" * 20, header_type=2)
    with pytest.raises(ValueError):
        ogg_metadata(flac_in_ogg)  # not Vorbis/Opus


def test_flac_metadata_streaminfo():
    from data_stream_flink_user_address_spark.functions.multimodal import (
        flac_metadata,
        real_decode,
    )

    got = flac_metadata(_make_flac(rate=44100, total_samples=132300))
    assert got["duration_ms"] == 3000
    assert real_decode(_make_flac(rate=48000, total_samples=24000), "audio")[
        "duration_ms"
    ] == 500
    with pytest.raises(ValueError):
        flac_metadata(b"fLaC" + b"\x00" * 4)  # truncated STREAMINFO


# ----------------------------------------------------------------- pHash


def test_phash_robustness_properties(spark):
    """The perceptual hash's reason to exist: stable under brightness
    shift and tiny noise, far apart for unrelated content -- none of
    which the exact sha256 in extract_media_meta gives you."""
    from data_stream_flink_user_address_spark.functions.multimodal import (
        encode_png,
        phash_images,
    )

    rng = np.random.default_rng(33)
    base = rng.integers(30, 200, (48, 48, 3), dtype=np.uint8)
    brighter = np.clip(base.astype(np.int64) + 20, 0, 255).astype(np.uint8)
    noisy = base.copy()
    noisy[::7, ::11] = np.clip(noisy[::7, ::11].astype(np.int64) + 9, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_png(base))),
            (2, "image", bytearray(encode_png(brighter))),
            (3, "image", bytearray(encode_png(noisy))),
            (4, "image", bytearray(encode_png(other))),
            (5, "image", bytearray(b"not an image")),
        ],
        "media_id long, kind string, payload binary",
    )
    sigs = {r["media_id"]: r["phash"] for r in phash_images(media).collect()}
    assert sigs[5] is None  # undecodable -> NULL, no crash

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sigs[1], sigs[2]) <= 4, "uniform brightness shift must barely move pHash"
    assert ham(sigs[1], sigs[3]) <= 6, "sparse small noise must barely move pHash"
    assert ham(sigs[1], sigs[4]) >= 20, "unrelated noise must be far away"


def test_phash_group_pairs_end_to_end(spark):
    from data_stream_flink_user_address_spark.functions.dedup import (
        simhash_near_dup_pairs,
    )
    from data_stream_flink_user_address_spark.functions.multimodal import (
        phash_images,
        synthesize_group_images,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    media = synthesize_group_images(docs, group_div=3)
    pairs = simhash_near_dup_pairs(
        phash_images(media), max_hamming=3, bits=64,
        id_col="media_id", sig_col="phash",
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    want = {(a, b) for a in range(12) for b in range(12)
            if a < b and a // 3 == b // 3}
    assert got == want
    assert all(r["hamming"] == 0 for r in pairs)


def test_audio_fingerprint_robustness(spark):
    """Gain invariance is exact by construction (log-energy differences
    cancel a constant gain); small additive noise flips few bits;
    unrelated audio is far away; undecodable payloads yield NULL."""
    from data_stream_flink_user_address_spark.functions.multimodal import (
        audio_fingerprint,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(44)
    seg = 256
    t = np.arange(seg)

    def clip(seed):
        r = np.random.default_rng(seed)
        parts = []
        for _ in range(8):
            w = np.zeros(seg)
            for _ in range(6):
                w += r.uniform(0.05, 0.15) * np.sin(
                    2 * np.pi * r.uniform(0.01, 0.45) * t + r.uniform(0, 2 * np.pi)
                )
            parts.append(w)
        return np.concatenate(parts)

    base = clip(1)
    noisy = base + rng.normal(0, 0.002, len(base))
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(encode_wav_pcm16(base, 8000))),
            (2, "audio", bytearray(encode_wav_pcm16(base * 0.4, 8000))),  # gain
            (3, "audio", bytearray(encode_wav_pcm16(noisy, 8000))),
            (4, "audio", bytearray(encode_wav_pcm16(clip(2), 8000))),
            (5, "audio", bytearray(b"junk")),
        ],
        "media_id long, kind string, payload binary",
    )
    sigs = {r["media_id"]: r["afp"] for r in audio_fingerprint(media).collect()}
    assert sigs[5] is None

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    # gain changes PCM16 quantization slightly, so allow a few bits
    assert ham(sigs[1], sigs[2]) <= 4, "constant gain must barely move the fingerprint"
    assert ham(sigs[1], sigs[3]) <= 8, "-40 dB noise must flip few bits"
    assert ham(sigs[1], sigs[4]) >= 16, "unrelated clip must be far away"


def test_audio_fingerprint_group_pairs_end_to_end(spark):
    from data_stream_flink_user_address_spark.functions.dedup import (
        simhash_near_dup_pairs,
    )
    from data_stream_flink_user_address_spark.functions.multimodal import (
        audio_fingerprint,
        synthesize_group_wavs,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    pairs = simhash_near_dup_pairs(
        audio_fingerprint(synthesize_group_wavs(docs, group_div=3)),
        max_hamming=3, bits=64, id_col="media_id", sig_col="afp",
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    want = {(a, b) for a in range(12) for b in range(12)
            if a < b and a // 3 == b // 3}
    assert got == want
    assert all(r["hamming"] == 0 for r in pairs)


# ----------------------------------------------------------- MJPEG AVI


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    out = fourcc + len(data).to_bytes(4, "little") + data
    return out + (b"\x00" if len(data) & 1 else b"")


def _make_mjpeg_avi(frames, us_per_frame=100_000, w=16, h=16):
    """Minimal spec-direct MJPEG AVI: hdrl(avih) + movi(00dc...)."""
    avih = (
        us_per_frame.to_bytes(4, "little") + b"\x00" * 12
        + len(frames).to_bytes(4, "little") + b"\x00" * 12
        + w.to_bytes(4, "little") + h.to_bytes(4, "little") + b"\x00" * 16
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih))
    movi = _riff_chunk(
        b"LIST", b"movi" + b"".join(_riff_chunk(b"00dc", f) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_avi_metadata_and_real_frame_extraction(spark):
    from data_stream_flink_user_address_spark.functions.multimodal import (
        avi_mjpeg_frames,
        extract_video_frames,
        jpeg_decode_pixels,
        png_decode_pixels,
        real_decode,
    )

    rng = np.random.default_rng(55)
    srcs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(10)]
    jpegs = [_make_real_jpeg(px) for px in srcs]
    avi = _make_mjpeg_avi(jpegs, us_per_frame=100_000)  # 10 fps, 1 s total

    assert real_decode(avi, "video") == {
        "width": 16, "height": 16, "duration_ms": 1000,
    }
    assert avi_mjpeg_frames(avi) == jpegs

    media = spark.createDataFrame(
        [(1, "video", bytearray(avi)), (2, "video", bytearray(b"nope"))],
        "media_id long, kind string, payload binary",
    )
    rows = extract_video_frames(media, every_ms=300).collect()
    assert {r["media_id"] for r in rows} == {1}
    # 1 s at 300 ms ticks -> ts 0/300/600/900 -> source frames 0/3/6/9
    assert [(r["frame_idx"], r["ts_ms"]) for r in rows] == [
        (0, 0), (1, 300), (2, 600), (3, 900),
    ]
    for r, src_idx in zip(rows, (0, 3, 6, 9)):
        w, h, got = png_decode_pixels(bytes(r["frame_png"]))
        assert (w, h) == (16, 16)
        want = jpeg_decode_pixels(jpegs[src_idx])[2]
        assert np.array_equal(got, want), "frame PNG must be the decoded JPEG exactly"
        assert np.abs(got.astype(int) - srcs[src_idx].astype(int)).max() <= 2

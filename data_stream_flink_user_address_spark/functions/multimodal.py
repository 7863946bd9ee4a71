"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Engine extension beyond the reference surface (BASELINE.json north star).
Convention (schemas.MEDIA_SCHEMA): ``payload binary`` + typed ``meta``
struct.  The Spark-side plumbing -- schema, partition-preserving
mapInPandas, Arrow batch shape -- is real and tested.  Decode is real
(pure-Python, dependency-free) for self-describing formats: PPM (P6)
and 24-bit BMP pixels, WAV duration, JPEG/PNG/GIF dimensions (header
walks).  Formats needing codec libraries (MP4/OGG/... and
JPEG/PNG/GIF pixel data) raise ``NotImplementedError`` -- not in this
container -- with ``fake_decode`` as the deterministic test stand-in.

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
    """Dependency-free pixel decode for two self-describing formats.

    Returns ``(width, height, pixels)`` with ``pixels`` an
    (height, width, 3) uint8 numpy array, or raises ValueError on a
    malformed payload.  Supported:

    - **PPM (P6)**: ``P6 <w> <h> <maxval>`` header (whitespace/comment
      separated) + raw RGB triplets.
    - **BMP**: 'BM' magic, BITMAPINFOHEADER, 24-bit uncompressed;
      rows are 4-byte aligned bottom-up, stored BGR.

    Formats that genuinely need codec libraries (JPEG/PNG/MP4/...) are
    NOT handled here -- see :func:`real_decode`.
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


def real_decode(payload: bytes, kind: str) -> dict:
    """Real media decode for the formats a pure-Python parse can handle:

    - images: PPM (P6) and 24-bit BMP via :func:`decode_image_pixels`
      (full pixel decode, not just header sniffing); JPEG dimensions
      via :func:`jpeg_dimensions` (SOF marker walk -- header metadata
      only; pixel decode of entropy-coded data genuinely needs a codec
      library);
    - audio: WAV/RIFF -- duration from the fmt chunk's byte rate and
      the data chunk length.

    - image headers: JPEG dimensions (SOF walk), PNG dimensions (IHDR
      fixed offsets), GIF dimensions (logical screen descriptor).

    Anything else (MP4/OGG/... and PNG/GIF/JPEG pixel data) requires
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
        # metadata only, pixel decode needs zlib+filters (codec-gated)
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
        "in this environment (pure-Python path handles PPM/BMP/WAV plus "
        "JPEG/PNG/GIF dimensions); use fake_decode for deterministic tests"
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
            metas = [decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "sha256": [hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                }
            )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    return media.mapInPandas(op, schema=DECODED_META_SCHEMA)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image-resize plumbing: binary in -> binary out, same Arrow-batched
    mapInPandas shape a real resize uses.  The pixel work is the stubbed
    decode (no image libs in this container); the deterministic fake
    "resize" truncates/pads the payload to width*height bytes so output
    sizes, schema, and batch flow are all real and testable."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            resized = [
                (p or b"").ljust(target, b"\0")[:target] for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                }
            )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    return media.mapInPandas(
        op, schema="media_id long, width int, height int, payload binary"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_idx, ts_ms) rows; the actual frame extraction is the stubbed
    decode.  Demonstrates the 1-to-N mapInPandas shape without decoding."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": []}
            for mid, payload, kind in zip(pdf["media_id"], pdf["payload"], pdf["kind"]):
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

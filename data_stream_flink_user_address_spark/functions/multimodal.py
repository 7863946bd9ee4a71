"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Engine extension beyond the reference surface (BASELINE.json north star).
Convention (schemas.MEDIA_SCHEMA): ``payload binary`` + typed ``meta``
struct.  The Spark-side plumbing -- schema, partition-preserving
mapInPandas, Arrow batch shape -- is real and tested; the actual
image/audio decode is stubbed (decode libraries are not in this
container) behind ``NotImplementedError`` with a deterministic fake for
tests.

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


def real_decode(payload: bytes, kind: str) -> dict:
    """Real media decode -- requires PIL/ffmpeg/torchaudio, not present in
    this container.  Clearly-marked stub per the build contract."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; use fake_decode for deterministic tests"
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

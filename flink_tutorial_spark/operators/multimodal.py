"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (SURVEY.md Phase 6).

The byte-decode step is REAL for formats with public stdlib-parseable
layouts (PNG/GIF/BMP/JPEG headers, WAV via the `wave` module — see
`_decode`), uses PIL behind an import-try when installed, and falls
back to a clearly-marked deterministic STUB for unknown bytes (which
keeps the synthetic text-as-media corpus oracle-checkable). Everything
Spark-side is real and tested: BinaryType schema, Arrow-batched
mapInPandas with a bounded batch size, metadata struct propagation, and
frame-sampling as an explode.

Scale notes: binary payloads ride the normal columnar path (parquet
binary + Arrow); mapInPandas streams batches so a partition of large
blobs never materializes at once. Keep blob partitions small via
`spark.sql.files.maxPartitionBytes` when payloads are MB-scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: binary payload + typed metadata.

    In a real pipeline the payload IS the stored bytes (parquet binary
    column); here it is the utf-8 text so sizes stay meaningful."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload").cast(BinaryType()),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


try:  # PIL handles compressed formats the header sniffers can't
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except ImportError:  # pragma: no cover - container has no PIL
    _HAVE_PIL = False


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB fallback for unknown bytes: deterministic fake dimensions
    derived from payload length — keeps synthetic corpora (text bytes
    posing as media) oracle-checkable."""
    n = len(payload)
    return (64 + n % 512, 64 + (n * 7) % 512, 1 + n % 8)


def _decode(payload: bytes) -> tuple[int, int, int]:
    """REAL media decode, layered by capability:
    1. stdlib header parsers for public fixed layouts — PNG (IHDR),
       GIF (logical screen), BMP (BITMAPINFOHEADER), JPEG (SOF scan),
       WAV (RIFF, via the `wave` module: width=sample rate,
       height=channels, n_frames=audio frames);
    2. PIL for anything else, when installed (import-try);
    3. the deterministic stub for unknown bytes.
    Returns (width, height, n_frames)."""
    import struct

    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            w, h = struct.unpack(">II", payload[16:24])
            return int(w), int(h), 1
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return int(w), int(h), 1
        if payload[:2] == b"BM" and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return int(w), abs(int(h)), 1
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            import io
            import wave

            with wave.open(io.BytesIO(payload)) as wf:
                return (
                    int(wf.getframerate()),
                    int(wf.getnchannels()),
                    int(wf.getnframes()),
                )
        if payload[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    break
                marker = payload[i + 1]
                seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return int(w), int(h), 1
                i += 2 + seglen
    except Exception:  # noqa: BLE001 - malformed header: fall through
        pass
    if _HAVE_PIL:  # pragma: no cover - exercised where PIL is installed
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return int(im.width), int(im.height), int(getattr(im, "n_frames", 1))
        except Exception:  # noqa: BLE001
            pass
    return _decode_stub(payload)


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas (the real operator shape:
    per-batch pandas in/out, no row-at-a-time serde)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, nf = zip(*(_decode(bytes(p)) for p in pdf["payload"]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["mime"] for m in pdf["meta"]],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                    "width": w,
                    "height": h,
                    "n_frames": nf,
                }
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video-like payloads: one output row per
    sampled frame index — an explode over a JVM-generated sequence,
    not a Python loop."""
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))).alias(
            "frame_idx"
        ),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_media(media: DataFrame, target_bytes: int = 128) -> DataFrame:
    """Resize/transcode operator shape: binary in -> binary out through
    Arrow-batched mapInPandas. STUB transform: truncate the payload to
    `target_bytes` (real implementation: PIL resize / ffmpeg transcode
    behind an import-try — the Spark-side contract is identical)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [bytes(p)[:target_bytes] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "n_bytes": [len(p) for p in out],
                }
            )

    return media.mapInPandas(resize_batches, RESIZED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction: payload bytes -> a dim-dimensional vector,
    one (doc_id, dim_idx, feature) row per dimension, through the real
    Arrow mapInPandas path a vision/audio encoder would use. STUB
    encoder: feature_i = md5(payload || ':' || i) 60-bit prefix mod
    10000 / 10000 — deterministic AND SQL-expressible, so the Spark
    plumbing is verified bit-exact by a DuckDB oracle (a luxury a real
    encoder wouldn't have; swap the body for the model forward pass)."""
    import hashlib

    from pyspark.sql.types import DoubleType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("dim_idx", IntegerType()),
            StructField("feature", DoubleType()),
        ]
    )

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(dim):
                    h = hashlib.md5(raw + b":" + str(i).encode()).hexdigest()
                    ids.append(doc_id)
                    idxs.append(i)
                    vals.append(int(h[:15], 16) % 10000 / 10000.0)
            yield pd.DataFrame({"doc_id": ids, "dim_idx": idxs, "feature": vals})

    return media.mapInPandas(feature_batches, schema)

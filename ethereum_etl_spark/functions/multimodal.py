"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata structs —
the same posture the CDC engine takes toward ``html`` — and implements
the Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing) for decode / feature-extract / resize /
frame-sample stages.

Codec status: **PNG image decode is REAL** — a pure-stdlib parser
(signature, chunk walk, IHDR width/height, CRC32 verification) plus a
matching encoder used by the synthetic generator, so the decode stage is
exercised on genuine image bytes with no PIL dependency. Audio/video
codecs remain STUBBED: those libraries are not in this container, so the
stages either raise ``NotImplementedError`` (when ``strict=True``) or
produce a clearly-marked deterministic fake derived from the bytes so
the distributed plumbing stays testable end-to-end. Swapping in a full
decoder is a one-function change — the batch iterator contract
(`Iterator[pd.DataFrame] → Iterator[pd.DataFrame]`) is exactly what
PIL/torchaudio-based decoders consume.

Scale notes: media bytes are the dominant mass, so every stage is
``mapInPandas`` (no shuffle, Arrow batches) and metadata-only outputs
DROP the payload column as early as possible (column pruning does the
rest). Batch size is bounded via spark.sql.execution.arrow.
maxRecordsPerBatch to keep executor memory flat.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media rows: opaque payload + typed metadata (FIXTURES-style)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, mime string, byte_len long, sha256 string, "
    "width int, height int, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_ts_ms long, frame_bytes binary"


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal REAL PNG encoder (pure stdlib: struct + zlib).

    Emits a spec-valid 8-bit RGB PNG — signature, IHDR, one deflated
    IDAT of deterministic scanlines, IEND — with correct CRC32s. Used by
    ``gen_media`` so the decode stage runs against genuine image bytes.
    """
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(((x * 31 + y * 17 + seed) % 256) for x in range(width * 3))
        for y in range(height)
    )
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")


def decode_png_header(b: bytes | None) -> tuple[int, int] | None:
    """REAL PNG header decode (pure stdlib): validates the signature and
    the IHDR chunk's CRC32, returns (width, height); None if the payload
    is not a well-formed PNG."""
    import struct
    import zlib

    if b is None or len(b) < 33 or bytes(b[:8]) != b"\x89PNG\r\n\x1a\n":
        return None
    length, typ = struct.unpack(">I4s", bytes(b[8:16]))
    if typ != b"IHDR" or length != 13:
        return None
    data = bytes(b[16:29])
    (crc,) = struct.unpack(">I", bytes(b[29:33]))
    if zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF != crc:
        return None
    w, h = struct.unpack(">II", data[:8])
    return int(w), int(h)


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake of image dimension decode (fallback for
    non-PNG formats, whose codecs are not in this container)."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 1984, 64 + h[1] % 1016


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake of an image-embedding model (STUB)."""
    h = hashlib.sha256(payload).digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def image_features(df: DataFrame, strict: bool = False, feature_dim: int = 8) -> DataFrame:
    """decode + feature-extract stage: media rows → per-image features.

    PNG payloads are decoded FOR REAL (header walk + CRC check,
    ``decode_png_header``); other formats fall back to a deterministic
    fake (``strict=True`` raises for them instead). The Arrow plumbing —
    batch iterator, schema, payload pruning — is identical either way.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def dims_of(b):
            if b is None:
                return (None, None)
            real = decode_png_header(bytes(b))
            if real is not None:
                return real
            if strict:
                raise NotImplementedError(
                    "only PNG decode is available in this container"
                )
            return _fake_decode_dims(bytes(b))

        for pdf in it:
            payloads = pdf["payload"]
            dims = payloads.map(dims_of)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest() if b is not None else None
                    ),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "feature": payloads.map(
                        lambda b: _fake_feature(bytes(b), feature_dim) if b is not None else None
                    ),
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """video frame-sample stage: one row per sampled frame.

    STUB decode: frame bytes are a deterministic slice-hash of the
    payload; a real ffmpeg/pyav decoder drops into the same loop.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("video decoder not available in this container")
        for pdf in it:
            rows = []
            # column-zip iteration, not iterrows(): no per-row Series
            # construction in the batch loop
            for mid, pay, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if pay is None or meta is None:
                    continue
                dur = meta["duration_ms"] or 0
                payload = bytes(pay)
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    fake = hashlib.sha256(payload + ts.to_bytes(8, "little")).digest()
                    rows.append(
                        {"media_id": mid, "frame_idx": i, "frame_ts_ms": ts, "frame_bytes": fake}
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_bytes"])

    return df.filter(F.col("kind") == "video").mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


def resize_images(df: DataFrame, max_px: int = 256, strict: bool = False) -> DataFrame:
    """resize stage: payload → payload (STUB: truncated-hash bytes)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("image decoder not available in this container")
        for pdf in it:
            out = pdf.copy()
            out["payload"] = out["payload"].map(
                lambda b: hashlib.sha256(bytes(b)).digest() * (max_px // 16)
                if b is not None
                else None
            )
            yield out

    return df.filter(F.col("kind") == "image").mapInPandas(batches, MEDIA_SCHEMA)


def gen_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for testing the plumbing.

    Every attribute is plain modular arithmetic over ``media_id`` —
    kind = media_id % 3 (0 image / 1 audio / 2 video), duration =
    1000 + (media_id*37) % 10000, image dims = 1 + media_id % 64/48 —
    so the decode/frame-sample outputs are expressible as ANSI SQL and
    the driver can oracle-check them (an earlier xxhash64-seeded variant
    was deterministic but not reproducible outside Spark). Image rows
    get REAL PNG payloads (``encode_png``) via a mapInPandas pass, with
    ``meta.width/height`` set to the true encoded dimensions — so decode
    tests can assert the real parser against ground truth.
    """
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).withColumnRenamed("id", "media_id")
    mid = F.col("media_id")
    kind = F.element_at(kinds, (mid % 3 + 1).cast("int"))
    payload = F.encode(
        F.concat(
            F.lit("MEDIA:"), mid.cast("string"), F.lit(":"),
            F.repeat(F.lit("x"), ((mid * 31 + 7) % 200 + 32).cast("int")),
        ),
        "UTF-8",
    )
    base = df.select(
        "media_id",
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(F.col("media_id").isNotNull() & (kind == "image"), F.lit("image/png"))
        .otherwise(F.concat(F.lit("application/"), kind))
        .alias("mime"),
        F.struct(
            ((mid * 13) % 1920 + 1).cast("int").alias("width"),
            ((mid * 11) % 1080 + 1).cast("int").alias("height"),
            ((mid * 37) % 10_000 + 1000).cast("long").alias("duration_ms"),
            F.lit(44100).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )

    def inject_png(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = list(pdf["payload"]), list(pdf["meta"])
            for i, (k, mid) in enumerate(zip(pdf["kind"], pdf["media_id"])):
                if k == "image":
                    w, h = 1 + int(mid) % 64, 1 + int(mid) % 48
                    payloads[i] = encode_png(w, h, seed=int(mid))
                    m = dict(metas[i])
                    m["width"], m["height"] = w, h
                    metas[i] = m
            pdf = pdf.copy()
            pdf["payload"], pdf["meta"] = payloads, metas
            yield pdf

    return base.mapInPandas(inject_png, MEDIA_SCHEMA)

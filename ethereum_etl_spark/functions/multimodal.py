"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata structs —
the same posture the CDC engine takes toward ``html`` — and implements
the Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing) for decode / feature-extract / resize /
frame-sample stages.

Codec status: **PNG image decode, WAV (RIFF PCM) audio decode, and AVI
container demux are REAL** — pure-stdlib parsers (signature/FourCC
validation, chunk walks, CRC32 where the format defines one) plus
matching encoders used by the synthetic generator, so the decode stages
are exercised on genuine media bytes with no PIL/torchaudio/ffmpeg
dependency. What remains STUBBED is the pixel-level codec inside video
frames (the AVI *container* is demuxed for real — avih header, movi
chunk walk, per-frame bytes — but the frame payloads are opaque) and
any non-PNG/WAV/AVI format: those either raise ``NotImplementedError``
(when ``strict=True``) or produce a clearly-marked deterministic fake so
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


def encode_jpeg_shell(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal REAL-STRUCTURE baseline JPEG (pure stdlib: struct).

    Emits a spec-shaped marker stream — SOI, APP0/JFIF, DQT, SOF0 with
    the true dimensions (3 components, 8-bit), DHT, SOS, deterministic
    entropy-coded bytes, EOI. The MARKER STRUCTURE is what real JPEG
    metadata readers walk and is fully valid; the entropy segment is
    deterministic opaque bytes, not a real Huffman scan (same honest
    posture as the AVI container: structure real, payload opaque).
    """
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    app0 = seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xFFDB, b"\x00" + bytes((i % 255) + 1 for i in range(64)))
    sof0 = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01",
    )
    dht = seg(0xFFC4, b"\x00" + bytes(16) + b"")
    sos = seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    # entropy bytes drawn mod 255 are never 0xFF, so no marker can be
    # forged inside the scan and no 0xFF-escape is needed
    ent = bytearray()
    for i in range(32 + (width * height) % 64):
        ent.append((i * 89 + seed) % 255)
    return b"\xff\xd8" + app0 + dqt + sof0 + dht + sos + bytes(ent) + b"\xff\xd9"


def decode_jpeg_header(b: bytes | None) -> tuple[int, int] | None:
    """REAL JPEG header decode (pure stdlib): validates SOI, walks the
    marker segments to the first SOF0/1/2 frame header and returns its
    (width, height). None if the payload is not a marker-valid JPEG."""
    import struct

    if b is None or len(b) < 4:
        return None
    b = bytes(b)
    if b[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        # any number of 0xFF fill bytes may pad the gap before a marker
        # (ITU-T T.81 §B.1.1.2); skip them so real-world padded JPEGs
        # don't get rejected by the walk
        while pos + 4 <= len(b) and b[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(b):
            return None
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI before any SOF
            return None
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        if pos + 4 > len(b):
            return None
        (length,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        if length < 2 or pos + 2 + length > len(b):
            return None
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            body = b[pos + 4 : pos + 2 + length]
            if len(body) < 5:
                return None
            _prec, h, w = struct.unpack(">BHH", body[:5])
            return int(w), int(h)
        if marker == 0xDA:  # SOS reached without SOF: malformed
            return None
        pos += 2 + length
    return None


def encode_gif(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal REAL GIF89a encoder (pure stdlib).

    Fully spec-valid and decodable: header, logical screen descriptor,
    128-entry global color table, image descriptor, LZW-coded pixel
    data (min code size 7; a CLEAR code precedes every pixel code so
    all codes stay 8-bit — valid LZW, one byte per code), trailer.
    Pixels are deterministic ``(i*31 + seed) % 128``.
    """
    import struct

    lsd = struct.pack("<HHBBB", width, height, 0xF6, 0, 0)  # GCT: 128 entries
    gct = bytes((3 * i) % 256 for i in range(128 * 3))
    imgd = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    codes = bytearray()
    for i in range(width * height):
        codes += bytes((0x80, (i * 31 + seed) % 128))  # CLEAR, pixel
    codes.append(0x81)  # end-of-information
    blocks = bytearray([7])  # LZW minimum code size
    for off in range(0, len(codes), 255):
        part = codes[off : off + 255]
        blocks += bytes([len(part)]) + part
    blocks.append(0)  # block terminator
    return b"GIF89a" + lsd + gct + imgd + bytes(blocks) + b"\x3b"


def decode_gif_header(b: bytes | None) -> tuple[int, int] | None:
    """REAL GIF header decode (pure stdlib): validates the GIF87a/89a
    signature and returns the logical screen (width, height)."""
    import struct

    if b is None or len(b) < 13:
        return None
    b = bytes(b)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return int(w), int(h)


def decode_image_header(b: bytes | None) -> tuple[int, int, str] | None:
    """Dispatch on the payload's magic bytes: (width, height, format)
    via the real PNG / JPEG / GIF parsers; None if none match."""
    d = decode_png_header(b)
    if d is not None:
        return d[0], d[1], "png"
    d = decode_jpeg_header(b)
    if d is not None:
        return d[0], d[1], "jpeg"
    d = decode_gif_header(b)
    if d is not None:
        return d[0], d[1], "gif"
    return None


def encode_wav(
    n_frames: int, sample_rate: int = 8000, channels: int = 1, seed: int = 0
) -> bytes:
    """Minimal REAL WAV encoder (pure stdlib: struct).

    Emits a spec-valid RIFF/WAVE file — canonical 44-byte header (fmt
    chunk: PCM, 16-bit) followed by one data chunk of deterministic
    interleaved samples ``s_j = ((j*2957 + seed) % 65536) - 32768`` —
    so the decode stage runs against genuine audio bytes and the PCM
    content is recomputable in ANSI SQL (driver oracle)."""
    import struct

    n_samples = n_frames * channels
    samples = bytearray()
    for j in range(n_samples):
        samples += struct.pack("<h", ((j * 2957 + seed) % 65536) - 32768)
    byte_rate = sample_rate * channels * 2
    data = bytes(samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_header(b: bytes | None) -> dict | None:
    """REAL WAV decode (pure stdlib): validates RIFF/WAVE magic, walks
    the chunk list to the ``fmt `` and ``data`` chunks, and returns
    {sample_rate, channels, bits, n_frames, duration_ms, pcm} — pcm is
    the raw little-endian sample bytes. None if not a well-formed
    16-bit-PCM WAV."""
    import struct

    if b is None or len(b) < 44:
        return None
    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        typ, length = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + length]
        if len(body) < length:
            return None
        if typ == b"fmt " and length >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif typ == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1 or bits != 16 or block_align != channels * 2:
        return None
    n_frames = len(data) // block_align
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate,
        "pcm": data,
    }


def encode_avi(
    n_frames: int, frame_interval_ms: int = 40, media_id: int = 0
) -> bytes:
    """Minimal REAL AVI container encoder (pure stdlib: struct).

    RIFF 'AVI ' with a LIST hdrl holding an avih header (microseconds
    per frame + total frames) and a LIST movi of '00db' frame chunks.
    Frame payloads are deterministic opaque bytes (pixel codecs are not
    in this container); the CONTAINER structure is spec-shaped and is
    what ``demux_avi`` walks for real."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<IIIIIIII",
        frame_interval_ms * 1000,  # microseconds per frame
        0, 0, 0,
        n_frames,  # total frames
        0, 1, 0,
    ) + b"\x00" * 24
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    frames = b"".join(
        chunk(b"00db", f"FRAME:{media_id}:{i}:".encode() + bytes((media_id * 7 + i * 13 + k) % 256 for k in range(48)))
        for i in range(n_frames)
    )
    movi = chunk(b"LIST", b"movi" + frames)
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def demux_avi(b: bytes | None) -> dict | None:
    """REAL AVI container demux (pure stdlib): validates RIFF/'AVI '
    magic, parses the avih header (frame interval, declared frame
    count), walks the movi LIST and extracts every '00db'/'00dc' frame
    chunk's bytes. Returns {frame_interval_ms, n_frames, frames,
    duration_ms}; None if the payload is not a well-formed AVI."""
    import struct

    if b is None or len(b) < 24:
        return None
    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    interval_us = None
    declared_frames = None
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal interval_us, declared_frames
        pos = 0
        while pos + 8 <= len(buf):
            fourcc = buf[pos : pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + length]
            if len(body) < length:
                return
            if fourcc == b"LIST":
                walk(body[4:])  # skip list type fourcc, recurse into members
            elif fourcc == b"avih" and length >= 32:
                vals = struct.unpack("<IIIIIIII", body[:32])
                interval_us, declared_frames = vals[0], vals[4]
            elif fourcc in (b"00db", b"00dc"):
                frames.append(body)
            pos += 8 + length + (length & 1)

    walk(b[12:])
    if interval_us is None or declared_frames is None or declared_frames != len(frames):
        return None
    interval_ms = interval_us // 1000
    return {
        "frame_interval_ms": interval_ms,
        "n_frames": len(frames),
        "frames": frames,
        "duration_ms": len(frames) * interval_ms,
    }


AUDIO_FEATURES_SCHEMA = (
    "media_id long, mime string, byte_len long, sample_rate int, "
    "channels int, n_frames long, duration_ms long, energy long, rms double"
)


def audio_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """audio decode + signal-stats stage: media rows → per-clip features.

    WAV payloads are decoded FOR REAL (RIFF chunk walk + 16-bit PCM
    parse, ``decode_wav_header``) and the energy/RMS are computed from
    the actual samples (numpy, vectorized per clip). ``energy`` =
    Σ sample² is an exact int64 — byte-identical across engines, so the
    driver oracle can recompute it in ANSI SQL with zero float-parity
    risk. Non-WAV payloads raise under ``strict=True``, else fall back
    to a deterministic fake. Output drops the payload column (metadata-
    only: column pruning keeps the media bytes out of any shuffle)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stats_of(b):
            if b is None:
                return (None, None, None, None, None, None)
            wav = decode_wav_header(bytes(b))
            if wav is not None:
                s = np.frombuffer(wav["pcm"], dtype="<i2").astype(np.int64)
                energy = int((s * s).sum())
                rms = float(np.sqrt(energy / len(s))) if len(s) else 0.0
                return (
                    wav["sample_rate"], wav["channels"], wav["n_frames"],
                    wav["duration_ms"], energy, rms,
                )
            if strict:
                raise NotImplementedError(
                    "only WAV (RIFF PCM) decode is available in this container"
                )
            h = hashlib.sha256(bytes(b)).digest()
            return (8000, 1, h[0], h[0] * 1000 // 8000, int.from_bytes(h[1:5], "big"), 0.0)

        for pdf in it:
            payloads = pdf["payload"]
            stats = payloads.map(stats_of)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sample_rate": stats.map(lambda s: s[0]),
                    "channels": stats.map(lambda s: s[1]),
                    "n_frames": stats.map(lambda s: s[2]),
                    "duration_ms": stats.map(lambda s: s[3]),
                    "energy": stats.map(lambda s: s[4]),
                    "rms": stats.map(lambda s: s[5]),
                }
            )

    return df.filter(F.col("kind") == "audio").mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


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

    PNG, JPEG and GIF payloads are decoded FOR REAL (magic-byte
    dispatch, ``decode_image_header``: PNG = IHDR walk + CRC check,
    JPEG = marker walk to SOF0/1/2, GIF = signature + logical screen
    descriptor); other formats fall back to a deterministic fake
    (``strict=True`` raises for them instead). The Arrow plumbing —
    batch iterator, schema, payload pruning — is identical either way.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def dims_of(b):
            if b is None:
                return (None, None)
            real = decode_image_header(bytes(b))
            if real is not None:
                return real[0], real[1]
            if strict:
                raise NotImplementedError(
                    "only PNG/JPEG/GIF decode is available in this container"
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

    AVI payloads are demuxed FOR REAL (``demux_avi`` walks the RIFF
    container: avih header for the frame interval, movi LIST for frame
    bytes); each grid timestamp ``k*every_ms`` within the container's
    duration yields the native frame at ``ts // interval`` — the same
    seek-to-timestamp semantics an ffmpeg-based sampler has. Frame
    PIXEL decode stays out of scope (payloads are returned as the raw
    container chunk bytes). Non-AVI payloads raise under ``strict=True``
    or fall back to the deterministic slice-hash fake otherwise.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            # column-zip iteration, not iterrows(): no per-row Series
            # construction in the batch loop
            for mid, pay, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if pay is None:
                    continue
                payload = bytes(pay)
                avi = demux_avi(payload)
                if avi is not None:
                    dur, interval = avi["duration_ms"], avi["frame_interval_ms"]
                    for i, ts in enumerate(range(0, int(dur), every_ms)):
                        native = avi["frames"][min(ts // interval, avi["n_frames"] - 1)]
                        rows.append(
                            {"media_id": mid, "frame_idx": i, "frame_ts_ms": ts,
                             "frame_bytes": native}
                        )
                    continue
                if strict:
                    raise NotImplementedError(
                        "only AVI container demux is available in this container"
                    )
                dur = (meta["duration_ms"] if meta is not None else 0) or 0
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
    kind = media_id % 3 (0 image / 1 audio / 2 video), image dims =
    1 + media_id % 64/48, audio sample_rate = 8000*(1 + (media_id//3)%3)
    with channels = 1 + media_id % 2 and n_frames = 400 + (media_id*53)
    % 1600, video frame count = (1000 + (media_id*37) % 10000) // 40 at
    40 ms/frame — so the decode/demux outputs are expressible as ANSI
    SQL and the driver can oracle-check them (an earlier xxhash64-seeded
    variant was deterministic but not reproducible outside Spark).
    Image rows rotate through REAL PNG / marker-valid JPEG / REAL GIF
    payloads by ``(media_id // 3) % 3`` (matching the ``mime`` column),
    audio rows get REAL WAV payloads (``encode_wav``), video rows REAL
    AVI containers (``encode_avi``) via a mapInPandas pass, with
    ``meta`` set to the true encoded parameters — so decode tests can
    assert the real parsers against ground truth.
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
        F.when(
            kind == "image",
            F.element_at(
                F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("image/gif")),
                ((mid / 3).cast("long") % 3 + 1).cast("int"),
            ),
        )
        .otherwise(F.concat(F.lit("application/"), kind))
        .alias("mime"),
        F.struct(
            ((mid * 13) % 1920 + 1).cast("int").alias("width"),
            ((mid * 11) % 1080 + 1).cast("int").alias("height"),
            ((mid * 37) % 10_000 + 1000).cast("long").alias("duration_ms"),
            F.lit(44100).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )

    def inject_codecs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = list(pdf["payload"]), list(pdf["meta"])
            for i, (k, mid) in enumerate(zip(pdf["kind"], pdf["media_id"])):
                mid = int(mid)
                m = dict(metas[i])
                if k == "image":
                    w, h = 1 + mid % 64, 1 + mid % 48
                    fmt = (mid // 3) % 3  # matches the JVM-side mime column
                    if fmt == 0:
                        payloads[i] = encode_png(w, h, seed=mid)
                    elif fmt == 1:
                        payloads[i] = encode_jpeg_shell(w, h, seed=mid)
                    else:
                        payloads[i] = encode_gif(w, h, seed=mid)
                    m["width"], m["height"] = w, h
                elif k == "audio":
                    sr = 8000 * (1 + (mid // 3) % 3)
                    ch = 1 + mid % 2
                    nf = 400 + (mid * 53) % 1600
                    payloads[i] = encode_wav(
                        nf, sample_rate=sr, channels=ch, seed=(mid * 7919) % 65536
                    )
                    m["sample_rate"] = sr
                    m["duration_ms"] = nf * 1000 // sr
                else:  # video: real AVI container at 25 fps (40 ms/frame)
                    nf = max(1, (1000 + (mid * 37) % 10000) // 40)
                    payloads[i] = encode_avi(nf, frame_interval_ms=40, media_id=mid)
                    m["duration_ms"] = nf * 40
                metas[i] = m
            pdf = pdf.copy()
            pdf["payload"], pdf["meta"] = payloads, metas
            yield pdf

    return base.mapInPandas(inject_codecs, MEDIA_SCHEMA)

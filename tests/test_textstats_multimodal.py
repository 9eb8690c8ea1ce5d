"""Text analysis + multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.multimodal import (
    gen_media,
    image_features,
    resize_images,
    sample_frames,
)
from ethereum_etl_spark.functions.textstats import (
    bpe_ish_token_count,
    fingerprint64,
    quality_features,
    rolling_shingle_fingerprints,
    token_count,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_token_count_matches_python(spark, docs):
    rows = docs.select("doc_id", "text", token_count("text")).collect()
    for r in rows[:100]:
        assert r["token_count"] == len(r["text"].split()), r["text"][:50]


def test_quality_features_ranges(spark, docs):
    q = quality_features(docs).select(
        "quality_score", "punct_ratio", "alpha_ratio", "stopword_ratio", "mean_word_len"
    )
    agg = q.agg(
        F.min("quality_score"), F.max("quality_score"),
        F.min("punct_ratio"), F.max("punct_ratio"),
        F.min("alpha_ratio"), F.max("alpha_ratio"),
    ).collect()[0]
    assert 0.0 <= agg[0] <= agg[1] <= 1.0
    assert 0.0 <= agg[2] <= agg[3] <= 1.0
    assert 0.0 <= agg[4] <= agg[5] <= 1.0


def test_bpe_ish_tokens_gte_words(spark, docs):
    bad = (
        docs.select(token_count("text").alias("w"), bpe_ish_token_count("text").alias("b"))
        .filter(F.col("b") < F.col("w"))
        .count()
    )
    assert bad == 0


def test_fingerprint_and_shingles_deterministic(spark, docs):
    a = docs.select("doc_id", fingerprint64("text")).collect()
    b = docs.select("doc_id", fingerprint64("text")).collect()
    assert a == b
    sh = docs.limit(20).select(
        "doc_id", rolling_shingle_fingerprints("text", 5).alias("sh")
    ).collect()
    for r in sh:
        assert len(r["sh"]) >= 1


def test_png_codec_roundtrip():
    """The PNG codec is REAL: encode → header decode returns the exact
    dimensions; corrupted CRC and non-PNG bytes are rejected."""
    from ethereum_etl_spark.functions.multimodal import decode_png_header, encode_png

    b = encode_png(17, 9, seed=3)
    assert decode_png_header(b) == (17, 9)
    corrupted = b[:20] + bytes([b[20] ^ 0xFF]) + b[21:]  # flip an IHDR byte
    assert decode_png_header(corrupted) is None
    assert decode_png_header(b"notapng") is None
    assert decode_png_header(None) is None


def test_wav_codec_roundtrip():
    """The WAV codec is REAL: encode → RIFF chunk walk returns the exact
    header fields and PCM bytes; truncated/corrupted payloads are
    rejected."""
    from ethereum_etl_spark.functions.multimodal import decode_wav_header, encode_wav

    b = encode_wav(500, sample_rate=16000, channels=2, seed=99)
    wav = decode_wav_header(b)
    assert wav["sample_rate"] == 16000
    assert wav["channels"] == 2
    assert wav["n_frames"] == 500
    assert wav["duration_ms"] == 500 * 1000 // 16000
    assert len(wav["pcm"]) == 500 * 2 * 2
    # sample values follow the deterministic formula
    import struct

    s0, s1 = struct.unpack("<hh", wav["pcm"][:4])
    assert s0 == (99 % 65536) - 32768
    assert s1 == ((2957 + 99) % 65536) - 32768
    assert decode_wav_header(b[:30]) is None
    assert decode_wav_header(b"RIFFxxxxNOPE" + b[12:]) is None
    assert decode_wav_header(None) is None


def test_avi_container_roundtrip():
    """The AVI demux is REAL: encode → container walk returns the frame
    interval, count, and every frame's exact bytes; non-AVI rejected."""
    from ethereum_etl_spark.functions.multimodal import demux_avi, encode_avi

    from ethereum_etl_spark.functions.multimodal import (
        _encode_dib_frame,
        decode_dib_frame,
    )

    b = encode_avi(7, frame_interval_ms=40, media_id=5)
    avi = demux_avi(b)
    assert avi["n_frames"] == 7
    assert avi["frame_interval_ms"] == 40
    assert avi["duration_ms"] == 280
    assert len(avi["frames"]) == 7
    # strf geometry is parsed from the container, not assumed
    assert (avi["width"], avi["height"], avi["bpp"]) == (16, 12, 24)
    # frames are REAL uncompressed DIBs: chunk bytes round the encoder,
    # and pixel decode recovers the deterministic RGB formula
    assert avi["frames"][3] == _encode_dib_frame(16, 12, 5, 3)
    rgb = decode_dib_frame(avi["frames"][3], 16, 12)
    for (x, y) in [(0, 0), (15, 0), (7, 11)]:
        v = 5 * 7 + 3 * 13 + x * 3 + y * 5
        o = (y * 16 + x) * 3
        assert rgb[o:o + 3] == bytes(((v) % 256, (v + 1) % 256, (v + 2) % 256))
    assert demux_avi(b"RIFF\x00\x00\x00\x00WAVE" + b[12:]) is None
    assert demux_avi(None) is None


def test_audio_features_real_decode(spark):
    """audio_features decodes the generator's WAV bytes for real: header
    fields and the exact integer PCM energy match a pure-python
    recomputation from the arithmetic spec."""
    from ethereum_etl_spark.functions.multimodal import audio_features

    media = gen_media(spark, n=60)
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert rows and set(rows) == {m for m in range(60) if m % 3 == 1}
    for mid, r in rows.items():
        sr = 8000 * (1 + (mid // 3) % 3)
        ch = 1 + mid % 2
        nf = 400 + (mid * 53) % 1600
        seed = (mid * 7919) % 65536
        energy = sum(
            (((j * 2957 + seed) % 65536) - 32768) ** 2 for j in range(nf * ch)
        )
        assert (r["sample_rate"], r["channels"], r["n_frames"]) == (sr, ch, nf)
        assert r["duration_ms"] == nf * 1000 // sr
        assert r["byte_len"] == 44 + nf * ch * 2
        assert r["energy"] == energy
        assert abs(r["rms"] - (energy / (nf * ch)) ** 0.5) < 1e-6


def test_sample_frames_real_demux(spark):
    """sample_frames pulls NATIVE frame bytes out of the real AVI
    container: the frame at grid ts must be the movi chunk at
    ts // interval."""
    from ethereum_etl_spark.functions.multimodal import _encode_dib_frame

    media = gen_media(spark, n=30)
    frames = {
        (r["media_id"], r["frame_ts_ms"]): bytes(r["frame_bytes"])
        for r in sample_frames(media, every_ms=2000, strict=True).collect()
    }
    assert frames
    for (mid, ts), fb in frames.items():
        native_idx = ts // 40
        assert fb == _encode_dib_frame(16, 12, mid, native_idx)


def test_media_pipeline_plumbing(spark):
    media = gen_media(spark, n=120).cache()
    feats = image_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    metas = {
        r["media_id"]: r["meta"]
        for r in media.filter(F.col("kind") == "image").select("media_id", "meta").collect()
    }
    assert set(rows) == set(metas) and rows
    for mid, r in rows.items():
        # REAL decode: parsed IHDR dims must equal the generator's ground truth
        assert (r["width"], r["height"]) == (metas[mid]["width"], metas[mid]["height"])
        assert len(r["feature"]) == 8
        assert r["sha256"] is not None
    frames = sample_frames(media, every_ms=2000)
    assert frames.count() > 0
    assert frames.filter(F.col("frame_ts_ms") % 2000 != 0).count() == 0
    resized = resize_images(media)
    assert resized.count() == media.filter(F.col("kind") == "image").count()


def test_media_strict_mode(spark):
    """strict=True decodes PNG for real and raises only for formats whose
    codecs are genuinely absent."""
    import pytest as _pt

    media = gen_media(spark, n=12)
    n_img = media.filter(F.col("kind") == "image").count()
    assert image_features(media, strict=True).count() == n_img

    from ethereum_etl_spark.functions.multimodal import MEDIA_SCHEMA

    jpeg = spark.createDataFrame(
        [(1, "image", bytearray(b"\xff\xd8\xffJFIF-not-png"), "image/jpeg", None)],
        MEDIA_SCHEMA,
    )
    with _pt.raises(Exception):  # NotImplementedError surfaces as PythonException
        image_features(jpeg, strict=True).collect()

    from ethereum_etl_spark.functions.multimodal import audio_features

    # real WAV/AVI payloads pass strict mode end-to-end...
    assert audio_features(media, strict=True).count() == media.filter(
        F.col("kind") == "audio"
    ).count()
    assert sample_frames(media, strict=True).count() > 0
    # ...while genuinely-unavailable codecs raise
    mp3 = spark.createDataFrame(
        [(1, "audio", bytearray(b"ID3notawav"), "audio/mpeg", None)], MEDIA_SCHEMA
    )
    with _pt.raises(Exception):
        audio_features(mp3, strict=True).collect()
    mp4 = spark.createDataFrame(
        [(2, "video", bytearray(b"\x00\x00\x00 ftypisom-not-avi"), "video/mp4",
          {"width": None, "height": None, "duration_ms": 1000, "sample_rate": None})],
        MEDIA_SCHEMA,
    )
    with _pt.raises(Exception):
        sample_frames(mp4, strict=True).collect()


def test_compression_ratio_matches_direct_zlib(spark):
    import zlib

    from ethereum_etl_spark.functions.textstats import compression_ratio

    texts = [
        "The quick brown fox jumps over the lazy dog near the river bank today.",
        "spam spam spam " * 40,
        "",
        None,
        "short",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["r"]
        for r in df.select("i", compression_ratio("t").alias("r")).collect()
    }

    def expect(t):
        if t is None:
            return None
        b = t.encode("utf-8")
        return len(zlib.compress(b, 6)) / len(b) if b else 0.0

    for i, t in enumerate(texts):
        assert got[i] == expect(t), (i, t)
    # the signal discriminates: repeated template << prose
    assert got[1] < 0.3 < got[0]


def test_jpeg_gif_header_roundtrip():
    """The JPEG marker walk and GIF screen-descriptor parse must
    round-trip their encoders for real, reject junk, and dispatch
    correctly from magic bytes."""
    from ethereum_etl_spark.functions.multimodal import (
        decode_gif_header,
        decode_image_header,
        decode_jpeg_header,
        encode_gif,
        encode_jpeg_shell,
        encode_png,
    )

    for w, h in [(1, 1), (64, 48), (640, 480), (1, 1080)]:
        assert decode_jpeg_header(encode_jpeg_shell(w, h, seed=w * h)) == (w, h)
        assert decode_gif_header(encode_gif(w, h, seed=w)) == (w, h)
    assert decode_jpeg_header(b"\xff\xd8\xff") is None
    assert decode_jpeg_header(b"GIF89a......") is None
    # 0xFF fill bytes between marker segments are legal (ITU-T T.81
    # §B.1.1.2): pad every inter-segment gap and the walk must still
    # find SOF0
    plain = encode_jpeg_shell(33, 17, seed=9)
    rest = plain[2:]
    sof_at = rest.find(b"\xff\xc0")
    assert sof_at > 0
    padded = b"\xff\xd8\xff\xff" + rest[:sof_at] + b"\xff\xff\xff" + rest[sof_at:]
    assert decode_jpeg_header(padded) == (33, 17)
    assert decode_gif_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30) is None
    assert decode_image_header(encode_png(7, 5))[2] == "png"
    assert decode_image_header(encode_jpeg_shell(7, 5))[2] == "jpeg"
    assert decode_image_header(encode_gif(7, 5))[2] == "gif"
    assert decode_image_header(b"not an image at all") is None
    # GIF payload is fully decodable LZW: PIL-free sanity via byte walk —
    # data stream is CLEAR/pixel byte pairs then EOI under min-code-size 7
    g = encode_gif(3, 2, seed=9)
    lzw_start = 6 + 7 + 128 * 3 + 10  # header+LSD+GCT+image descriptor
    assert g[lzw_start] == 7  # LZW minimum code size

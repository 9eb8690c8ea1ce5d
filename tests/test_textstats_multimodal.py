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

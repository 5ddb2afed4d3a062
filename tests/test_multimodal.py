"""Multimodal plumbing tests: binary payload columns, Arrow-batched
feature extraction (stubbed decode), dedup over media features."""

import pytest
from pyspark.sql import functions as F

from face_duplicate_detection_spark.operators.multimodal import (
    decode_image,
    extract_features,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, 200, seed=42, dup_every=5).cache()


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_media_schema_and_counts(media):
    assert media.count() == 200
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.filter(F.col("media_id").isNull()).count() == 0


def test_feature_extraction_deterministic(media):
    f1 = extract_features(media).collect()
    f2 = extract_features(media).collect()
    m1 = {r["media_id"]: list(r["feature"]) for r in f1}
    m2 = {r["media_id"]: list(r["feature"]) for r in f2}
    assert m1 == m2
    assert all(len(v) == 32 for v in m1.values())


def test_exact_media_dups_share_feature(media):
    """Every 5th payload is byte-identical to its predecessor ⇒
    identical features ⇒ exact-dup detection works on media too."""
    feats = {
        r["media_id"]: tuple(r["feature"])
        for r in extract_features(media).collect()
    }
    for i in range(5, 200, 5):
        assert feats[i] == feats[i - 1], f"media {i} should copy {i-1}"
    assert feats[1] != feats[2]

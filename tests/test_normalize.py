"""Normalize stage: extraction purity + status tagging (SURVEY.md §2.2)."""

from pyspark.sql import functions as F

from face_duplicate_detection_spark.functions.normalize import (
    STATUS_CORRUPTED,
    STATUS_EMPTY,
    STATUS_LOW_QUALITY,
    STATUS_OK,
    extract_text,
    normalize_documents,
    normalize_pages,
    matchable_docs,
)


def test_extract_text_pure_roundtrip():
    assert extract_text(b"<html><body>hello world</body></html>") == "hello world"
    assert extract_text(b"<html><body></body></html>") == ""
    assert extract_text(b"\xff\xfe broken") is None       # undecodable
    assert extract_text(b"<html>no body tags</html>") is None
    assert extract_text(None) is None


def test_pages_byte_identical_text_invariant(spark, pages_500, cfg):
    """BASELINE.json input_hint: extracted text == source text per url
    for every non-corrupted row."""
    norm = normalize_pages(pages_500, cfg)
    joined = norm.alias("n").join(
        pages_500.select("url", F.col("text").alias("orig")), "url"
    )
    mismatched = joined.filter(
        (F.col("status") != STATUS_CORRUPTED) & (F.col("n.text") != F.col("orig"))
    )
    assert mismatched.count() == 0


def test_pages_status_tagging(spark, pages_500, cfg):
    norm = normalize_pages(pages_500, cfg)
    by_status = dict(
        (r["status"], r["count"])
        for r in norm.groupBy("status").count().collect()
    )
    # doc_id % 10 == 9 rows rotate empty/corrupted/low_quality → 50 rows
    assert by_status[STATUS_OK] > 400
    assert by_status[STATUS_CORRUPTED] >= 15
    assert by_status[STATUS_EMPTY] >= 15
    assert by_status[STATUS_LOW_QUALITY] >= 5


def test_corrupted_kept_not_dropped(spark, pages_500, cfg):
    """Reference keeps unreadable items, tagged
    (duplicate_face.py:84-89) — they appear in outputs."""
    norm = normalize_pages(pages_500, cfg)
    assert norm.count() == pages_500.count()


def test_matchable_excludes_non_ok(spark, pages_500, cfg):
    norm = normalize_pages(pages_500, cfg)
    m = matchable_docs(norm)
    assert m.filter(F.col("status") != STATUS_OK).count() == 0


def test_normalize_documents_statuses(spark, documents, cfg):
    norm = normalize_documents(documents, cfg)
    assert norm.count() == documents.count()
    assert set(r["status"] for r in norm.select("status").distinct().collect()) <= {
        STATUS_OK,
        STATUS_EMPTY,
        STATUS_CORRUPTED,
        STATUS_LOW_QUALITY,
    }

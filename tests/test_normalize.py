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


def test_legit_replacement_char_not_corrupted(spark, cfg):
    """ADVICE r1: a page legitimately containing U+FFFD must extract
    (status != corrupted) and match the pure extract_text row-for-row,
    alongside genuinely undecodable and clean rows."""
    legit = "before � after padding padding padding padding"
    rows = [
        (1, f"<html><body>{legit}</body></html>".encode()),
        (2, b"\xff\xfe truly broken bytes"),
        (3, b"<html><body>plain clean page body text content here</body></html>"),
    ]
    pages = spark.createDataFrame(rows, ["doc_id", "html"]).withColumn(
        "url", F.col("doc_id").cast("string")
    )
    out = {
        r["doc_id"]: (r["text"], r["status"])
        for r in normalize_pages(pages, cfg).collect()
    }
    assert out[1] == (legit, STATUS_OK)
    assert out[2] == (None, STATUS_CORRUPTED)
    assert out[3][1] == STATUS_OK
    for doc_id, html in rows:
        assert out[doc_id][0] == extract_text(html), doc_id


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

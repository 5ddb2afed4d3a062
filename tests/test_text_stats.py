"""Text-analysis function tests (token counts, quality, lang-id,
fingerprints) — native expressions with exact semantics."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from face_duplicate_detection_spark.functions.text_stats import text_stats


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )


def test_token_counts(spark):
    df = _df(spark, ["a b c", "a a a a", "", "   ", "one"])
    rows = {r["doc_id"]: r for r in text_stats(df).collect()}
    assert rows[0]["n_tokens"] == 3 and rows[0]["n_distinct_tokens"] == 3
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_distinct_tokens"] == 1
    assert rows[2]["n_tokens"] == 0 and rows[3]["n_tokens"] == 0
    assert rows[4]["n_tokens"] == 1


def test_subword_tokens_split_boundaries(spark):
    df = _df(spark, ["hello42world", "a-b", "abc"])
    rows = {r["doc_id"]: r for r in text_stats(df).collect()}
    assert rows[0]["n_subword_tokens"] == 3  # hello | 42 | world
    assert rows[1]["n_subword_tokens"] == 3  # a | - | b
    assert rows[2]["n_subword_tokens"] == 1


def test_quality_monotonic(spark):
    df = _df(spark, ["spam " * 40, "the quick brown fox jumps over lazy dogs " * 5])
    rows = {r["doc_id"]: r for r in text_stats(df).collect()}
    assert rows[1]["quality"] > rows[0]["quality"]  # repetition penalized
    assert 0.0 <= rows[0]["quality"] <= 1.0


def test_lang_id_markers(spark):
    df = _df(
        spark,
        [
            "the cat and the dog of the house is big",
            "le chat et la maison est grande les oiseaux",
            "der hund und die katze ist das haus",
            "xyzzy plugh qwerty",
        ],
    )
    rows = {r["doc_id"]: r["lang_guess"] for r in text_stats(df).collect()}
    assert rows[0] == "en"
    assert rows[1] == "fr"
    assert rows[2] == "de"
    assert rows[3] == "und"


def test_fingerprint_normalization_invariance(spark):
    df = _df(spark, ["Hello  World", "hello world", "different text"])
    rows = {r["doc_id"]: r["fingerprint"] for r in text_stats(df).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]

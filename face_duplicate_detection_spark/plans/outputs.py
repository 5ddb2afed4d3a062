"""Output/report tables (SURVEY.md §2.1 S5-S9).

The reference writes per-batch text reports, duplicate-pair CSVs,
unique CSVs, corrupted lists, and one consolidated final CSV
(``/root/reference/duplicate_face.py:94-143`` save_results and
``200-226`` consolidated loop).  Here every sink is a queryable
DataFrame; writing is one ``df.write`` on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def consolidated_report(clusters: DataFrame, docs_normalized: DataFrame) -> DataFrame:
    """S9: every doc with its 3-way status + canonical assignment.

    Reference: the final CSV loop over duplicates/unique/corrupted
    (``duplicate_face.py:200-226``) with a ``directory`` column
    (``:210-211`` basename(dirname(path))) — here derived from the url
    when present.
    """
    base = docs_normalized.select(
        "doc_id",
        *(["url"] if "url" in docs_normalized.columns else []),
        "status",
    )
    joined = base.join(
        clusters.select("doc_id", "cluster_id", "is_canonical"), "doc_id", "left"
    )
    out = joined.select(
        "doc_id",
        *(["url"] if "url" in base.columns else []),
        "status",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        F.coalesce("is_canonical", F.lit(True)).alias("is_canonical"),
        F.when(F.col("status") != "ok", F.col("status"))
        .when(F.coalesce("is_canonical", F.lit(True)), F.lit("unique"))
        .otherwise(F.lit("duplicate"))
        .alias("disposition"),
    )
    if "url" in base.columns:
        out = out.withColumn(
            "directory", F.regexp_extract("url", r"https?://([^/]+)", 1)
        )
    return out


def duplicate_report(dup_pairs: DataFrame) -> DataFrame:
    """S5: per-canonical duplicate counts + similarity stats (the
    text report's content, ``duplicate_face.py:106-112`` +
    README.md:160-163 similarity statistics)."""
    return dup_pairs.groupBy("a").agg(
        F.count(F.lit(1)).alias("n_duplicates"),
        F.round(F.min("jaccard"), 6).alias("min_jaccard"),
        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
    )


def summary_metrics(clusters: DataFrame) -> DataFrame:
    """The reference's end-of-run summary panel
    (``duplicate_face.py:234-248``, ``face_recognition_custom.py:
    126-154``): totals by status + dup/unique counts, one row."""
    return clusters.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok_docs"),
        F.sum(F.when(F.col("status") == "empty", 1).otherwise(0)).alias("empty_docs"),
        F.sum(
            F.when(F.col("status") == "corrupted", 1).otherwise(0)
        ).alias("corrupted_docs"),
        F.sum(
            F.when(F.col("status") == "low_quality", 1).otherwise(0)
        ).alias("low_quality_docs"),
        F.sum(
            F.when((F.col("status") == "ok") & ~F.col("is_canonical"), 1).otherwise(0)
        ).alias("duplicate_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )

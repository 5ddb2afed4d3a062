"""Structured Streaming mode (SURVEY.md §2.10 B5): parquet file
source → foreachBatch incremental dedup with Trigger.AvailableNow."""

import os

import pytest
from pyspark.sql import functions as F

from face_duplicate_detection_spark.catalog import StageCatalog
from face_duplicate_detection_spark.functions.normalize import (
    matchable_docs,
    normalize_pages,
)
from face_duplicate_detection_spark.streaming.incremental import (
    resolved_clusters,
    stream_dedup,
)


def test_stream_dedup_available_now(spark, cfg, pages_500, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "src")
    ckpt = str(root / "ckpt")
    state = StageCatalog(str(root / "state"))

    norm = matchable_docs(normalize_pages(pages_500, cfg)).select("doc_id", "text")
    # two source files = two micro-batches (maxFilesPerTrigger=1)
    norm.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(
        src, mode="overwrite"
    )
    norm.filter(F.col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(src)

    q = stream_dedup(spark, src, ckpt, state, cfg, schema=norm.schema)
    q.awaitTermination(300)

    clusters = resolved_clusters(spark, state)
    n = clusters.count()
    assert n == norm.count()
    # planted exact dups must be clustered across the whole stream
    cl = {
        r["doc_id"]: r["cluster_id"]
        for r in clusters.select("doc_id", "cluster_id").collect()
    }
    merged = sum(
        1 for d in range(0, 500, 10) if d in cl and d + 6 in cl and cl[d] == cl[d + 6]
    )
    assert merged >= 45

    # restart with AvailableNow and no new files: no-op, state intact
    q2 = stream_dedup(spark, src, ckpt, state, cfg, schema=norm.schema)
    q2.awaitTermination(120)
    assert resolved_clusters(spark, state).count() == n

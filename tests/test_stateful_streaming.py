"""Streaming-native operators: watermarked dedup, event-time windowed
aggregation, and a custom applyInPandasWithState stateful operator
(SURVEY.md §2.10 B5 extensions)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from face_duplicate_detection_spark.streaming.stateful import (
    running_source_totals,
    streaming_dedup_exact,
    windowed_ingest_stats,
)

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("text_hash", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)


def _rows():
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(120):
        text = f"document body number {i % 40} with shared content"
        rows.append(
            (
                i,
                t0 + dt.timedelta(minutes=i),
                text,
                hash(text) & 0x7FFFFFFFFFFFFFF,
                ["cc-main", "cc-news", "curated"][i % 3],
            )
        )
    return rows


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stateful")
    src = str(root / "src")
    df = spark.createDataFrame(_rows(), _SCHEMA)
    # two files = two micro-batches under maxFilesPerTrigger-less
    # AvailableNow (file-granular batches)
    df.filter("doc_id < 60").coalesce(1).write.parquet(src)
    df.filter("doc_id >= 60").coalesce(1).write.mode("append").parquet(src)
    return src, str(root)


def _drain(stream_df, ckpt, mode="append"):
    spark = stream_df.sparkSession
    name = f"mem_{abs(hash(ckpt)) % 10**9}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def test_streaming_dedup_exact(spark, stream_src):
    src, root = stream_src
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    out = _drain(
        streaming_dedup_exact(stream, key_cols=("text_hash",)),
        f"{root}/ck_dedup",
    )
    rows = out.select("text_hash").collect()
    hashes = [r["text_hash"] for r in rows]
    # 40 distinct texts; every within-watermark duplicate dropped
    assert len(hashes) == len(set(hashes)) == 40


def test_windowed_ingest_stats(spark, stream_src):
    src, root = stream_src
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    out = _drain(
        windowed_ingest_stats(stream, window="30 minutes", watermark="10 minutes"),
        f"{root}/ck_win",
    )
    rows = {r["window_start"]: r["n_docs"] for r in out.collect()}
    # 120 docs, 1/minute → 30-min windows hold 30 docs each; append
    # mode emits only watermark-closed windows (the last stays open)
    assert rows, "no closed windows emitted"
    assert all(n == 30 for n in rows.values())


def test_running_source_totals_across_batches(spark, stream_src):
    src, root = stream_src
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force 2 micro-batches
        .parquet(src)
    )
    out = _drain(
        running_source_totals(stream), f"{root}/ck_state", mode="update"
    )
    # update mode: one row per source per micro-batch; the LAST row
    # per source must carry the full running total (state carried)
    rows = out.collect()
    latest = {}
    for r in rows:
        latest[r["source"]] = max(
            latest.get(r["source"], 0), r["total_docs"]
        )
    assert latest == {"cc-main": 40, "cc-news": 40, "curated": 40}
    # state crossed batches: some source must have emitted twice with
    # growing totals
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r["total_docs"])
    assert any(len(v) >= 2 and max(v) > min(v) for v in per_source.values())

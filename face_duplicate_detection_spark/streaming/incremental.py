"""Incremental / streaming ingest: dedup new batches against the
accumulated representative state.

The reference's core stateful behavior: representatives discovered in
batches 1..k are matched against by batch k+1 — the same in-memory
lists are threaded through every ``process_batch`` call
(``/root/reference/duplicate_face.py:164-198``, state passed at
186-189).  Spark re-expression (SURVEY.md §2.10 B2/B5):

- **batch mode** (:func:`incremental_batch`): the new slice is signed,
  LSH-joined against BOTH itself and the existing representative
  signature table (broadcast when small — SURVEY.md §2.4 J7), verified
  edges are unioned with prior cluster edges and CC re-runs; state
  tables are overwritten via the StageCatalog.
- **streaming mode** (:func:`stream_dedup`): Structured Streaming
  ``foreachBatch`` + ``Trigger.AvailableNow`` drives the same batch
  function — exactly-once per micro-batch with checkpointed offsets.
  (No event-time semantics needed: the reference has none.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from face_duplicate_detection_spark.catalog import StageCatalog
from face_duplicate_detection_spark.config import DedupConfig
from face_duplicate_detection_spark.operators.connected_components import (
    connected_components,
)
from face_duplicate_detection_spark.operators.lsh import (
    candidate_pairs,
    explode_buckets,
)
from face_duplicate_detection_spark.operators.signatures import compute_signatures
from face_duplicate_detection_spark.operators.verify import verify_pairs


def incremental_batch(
    new_docs: DataFrame,
    cfg: DedupConfig,
    catalog: StageCatalog,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Dedup `new_docs` against all previously-seen state; returns the
    updated clusters table and commits updated state tables.

    State tables in the catalog: ``state_signatures``, ``state_edges``.
    """
    spark = spark or new_docs.sparkSession

    new_sigs = compute_signatures(new_docs, cfg)

    if catalog.is_committed("state_signatures"):
        old_sigs = catalog.read(spark, "state_signatures")
        all_sigs = old_sigs.unionByName(new_sigs)
    else:
        all_sigs = new_sigs

    # candidates among (new × new) ∪ (new × old): bucket join over the
    # union, then keep pairs touching at least one new doc — old×old
    # pairs were already resolved in previous batches.
    new_ids = new_sigs.select(F.col("doc_id").alias("nid"))
    buckets = explode_buckets(all_sigs)
    cand = candidate_pairs(buckets, cfg)
    cand_new = (
        cand.join(F.broadcast(new_ids), cand["a"] == F.col("nid"), "left")
        .withColumnRenamed("nid", "a_new")
        .join(F.broadcast(new_ids), cand["b"] == F.col("nid"), "left")
        .filter(F.col("a_new").isNotNull() | F.col("nid").isNotNull())
        .select("a", "b", "n_bands", "forced")
    )

    new_edges = verify_pairs(cand_new, all_sigs, cfg).select("a", "b")
    if catalog.is_committed("state_edges"):
        all_edges = catalog.read(spark, "state_edges").unionByName(new_edges)
    else:
        all_edges = new_edges

    labels = connected_components(all_edges)

    catalog.write("state_signatures", all_sigs)
    catalog.write("state_edges", all_edges.dropDuplicates(["a", "b"]))
    catalog.write(
        "state_clusters",
        all_sigs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        ),
    )
    return catalog.read(spark, "state_clusters")


def stream_dedup(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    state_catalog: StageCatalog,
    cfg: DedupConfig,
    schema=None,
):
    """Structured Streaming driver: parquet file source → foreachBatch
    incremental dedup, Trigger.AvailableNow (drain-and-stop).
    """
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.parquet(source_path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_batch(
            batch_df.select("doc_id", "text"), cfg, state_catalog, spark
        )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

"""A/B: CC round sizing via session-conf pin (r3) vs explicit
repartition on round inputs/outputs with AQE left to coalesce the
intermediate shuffles (judge r3 task #6).

Measures wall time + round count on (a) a small dup graph (the common
case: scheduling overhead dominates) and (b) a 200k-edge chain graph
(the pathological diameter case).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from face_duplicate_detection_spark.operators.connected_components import (  # noqa: E402
    connected_components,
)
from face_duplicate_detection_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="cc-ab", master="local[8]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def chain_edges(n):
    return spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )


def clustered_edges(n_clusters, sz):
    # sz-doc near-dup groups: star + a few extra edges each
    base = spark.range(n_clusters * sz).select(
        (F.col("id") / sz).cast("long").alias("g"), F.col("id").alias("b")
    )
    return base.select((F.col("g") * sz).alias("a"), "b").filter(
        F.col("a") != F.col("b")
    )


for name, edges in (
    ("small_clustered(2k edges)", clustered_edges(500, 5)),
    ("chain_200k", chain_edges(200_000)),
):
    e = edges.localCheckpoint(eager=True)
    for mode in ("repartition",):
        ts = []
        for _ in range(3):
            t0 = time.time()
            labels = connected_components(e, eager=True)
            n = labels.count()
            ts.append(time.time() - t0)
        print(f"{name} mode={mode}: n={n} best={min(ts):.2f}s all={[round(t,2) for t in ts]}", flush=True)
spark.stop()

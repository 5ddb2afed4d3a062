"""Iterative DataFrame connected components (min-label propagation).

Replaces the reference's greedy leader clustering — first matching
representative wins, ``break`` at
``/root/reference/duplicate_face.py:75`` /
``face_recognition_custom.py:111`` — with true connected components
over the verified pair graph.  CC produces a *superset* of the greedy
clusters (SURVEY.md §2.12): every (leader, member) edge the reference
would emit passed the same similarity predicate and is therefore in
our edge set, so dup-pair recall vs the reference is bounded only by
the LSH S-curve, not by clustering.

Algorithm: label(v) ← min(label(v), min label of neighbors) until
fixpoint.  Duplicate-cluster graphs have tiny diameters (stars /
short chains), so this converges in a handful of iterations; each
iteration is one shuffle (groupBy node) and the lineage is truncated
with ``localCheckpoint`` so the plan doesn't grow exponentially
(SURVEY.md §4.4 — Catalyst cannot do this for us).

Canonical member = min(doc_id) in the component (SURVEY.md §2.6 W1 —
deterministic stand-in for the reference's first-seen-in-insertion-
order canonical; identical when doc_id respects ingestion order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iterations: int = 50, eager: bool = True
) -> DataFrame:
    """edges(a, b) → labels(doc_id, cluster_id = min doc_id in component).

    Only nodes that appear in an edge are returned (isolated docs are
    their own cluster; callers add them back with a left join —
    cheaper than materializing a label row per document here).
    """
    # undirected: keep each edge once as (hi → lo) message "lo is an
    # upper bound for hi's label", plus the reverse for propagation
    sym = edges.select(
        F.col("a").cast("long").alias("src"), F.col("b").cast("long").alias("dst")
    )
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.repartition("src").localCheckpoint(eager=eager)
    if eager:
        # size the iteration shuffles to the actual edge count — dup
        # graphs are usually tiny relative to the corpus, and 32-task
        # jobs over a few thousand edges are pure scheduler overhead
        n_edges = sym.count()
        parts = max(1, min(
            sym.sparkSession.sparkContext.defaultParallelism,
            n_edges // 50_000 + 1,
        ))
        sym = sym.repartition(parts, "src").localCheckpoint(eager=True)

    labels = (
        sym.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("label"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("label"), F.col("src")).alias("label"),
        )
        .localCheckpoint(eager=eager)
    )

    from pyspark.sql import Observation

    for _ in range(max_iterations):
        # propagate: each node offers its label to every neighbor;
        # the convergence check piggybacks on the checkpoint job via
        # an Observation — one Spark job per iteration, not two.
        offers = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("offer"))
        )
        obs = Observation()
        new_labels = (
            labels.join(offers, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("offer", "label")).alias(
                    "new_label"
                ),
                (F.coalesce("offer", "label") < F.col("label")).alias("chg"),
            )
            .observe(obs, F.sum(F.when(F.col("chg"), 1).otherwise(0)).alias("n"))
            .select("node", F.col("new_label").alias("label"))
            .localCheckpoint(eager=eager)
        )
        labels = new_labels
        if eager and (obs.get["n"] or 0) == 0:
            break
        if not eager:
            # lazy mode: fall back to an explicit count-based check
            if labels.count() >= 0 and (obs.get["n"] or 0) == 0:
                break

    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def assign_clusters(
    docs: DataFrame, edge_labels: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """All docs ⟕ component labels → clusters table.

    Isolated docs become singleton clusters (cluster_id = own doc_id);
    ``is_canonical`` marks the min-doc_id representative — the
    analogue of the reference's ``known_face_paths`` entries
    (``duplicate_face.py:58-61,77-81``).
    """
    out = docs.join(edge_labels, id_col, "left")
    return out.select(
        *[c for c in docs.columns],
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
    ).withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))

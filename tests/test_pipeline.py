"""End-to-end pipeline tests: planted-duplicate recall vs the greedy
reference oracle + brute-force pair oracle (SURVEY.md §5.2-5.3).

The greedy oracle below is a ~30-line reimplementation of the
reference's leader-clustering loop
(``/root/reference/duplicate_face.py:57-82``): items in doc_id order,
each compared against current representatives, first match wins, else
the item becomes a new representative.  Its (leader, member) pairs are
the "reference cluster assignments" of the BASELINE.json recall ≥ 0.99
metric.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from face_duplicate_detection_spark.config import DedupConfig
from face_duplicate_detection_spark.functions.text_hashing import (
    normalize_text,
    shingle_hashes,
)
from face_duplicate_detection_spark.plans.pipeline import run_pipeline


def _shingle_sets(rows, cfg):
    return {
        r["doc_id"]: shingle_hashes(
            normalize_text(r["text"], cfg.lowercase, cfg.fold_whitespace),
            cfg.shingle_k,
        )
        for r in rows
    }


def _jaccard(a, b):
    if a.size == 0 and b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b).size
    return inter / (a.size + b.size - inter)


def greedy_reference_pairs(sets, threshold):
    """Greedy leader clustering in doc_id order — the behavioral oracle
    mirroring duplicate_face.py:57-82 (first-match break at :75)."""
    leaders = []  # (doc_id, shingles) — insertion order
    pairs = set()
    for doc_id in sorted(sets):
        s = sets[doc_id]
        for lid, ls in leaders:
            if _jaccard(s, ls) >= threshold:
                pairs.add((lid, doc_id))
                break
        else:
            leaders.append((doc_id, s))
    return pairs


def brute_force_pairs(sets, threshold):
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if _jaccard(sets[a], sets[b]) >= threshold:
                out.add((a, b))
    return out


@pytest.fixture(scope="module")
def pipeline_result(pages_500, cfg):
    return run_pipeline(pages_500, cfg, input_kind="pages")


@pytest.fixture(scope="module")
def ok_sets(pipeline_result, cfg):
    rows = (
        pipeline_result.docs_normalized.filter("status = 'ok'")
        .select("doc_id", "text")
        .collect()
    )
    return _shingle_sets(rows, cfg)


def test_dup_pair_precision_exact(pipeline_result, ok_sets, cfg):
    """Every emitted pair truly meets the exact-Jaccard threshold
    (verification join = exact predicate ⇒ precision 1.0)."""
    engine = {
        (r["a"], r["b"])
        for r in pipeline_result.dup_pairs.select("a", "b").collect()
    }
    for a, b in engine:
        assert _jaccard(ok_sets[a], ok_sets[b]) >= cfg.jaccard_threshold


def test_dup_pair_recall_vs_brute_force(pipeline_result, ok_sets, cfg):
    """Connectivity recall vs the O(n²) oracle (FIXTURES.md §4
    oracle_pairs): every true ≥θ pair must land in one engine cluster.
    (Direct-edge recall over distinct texts is tested separately —
    exact-copy members are collapsed pre-signature by design, so some
    true pairs exist only via the cluster graph.)"""
    oracle = brute_force_pairs(ok_sets, cfg.jaccard_threshold)
    assert len(oracle) > 20, "fixture should plant plenty of dup pairs"
    cluster_of = {
        r["doc_id"]: r["cluster_id"]
        for r in pipeline_result.clusters.select("doc_id", "cluster_id").collect()
    }
    missed = {
        (a, b) for a, b in oracle if cluster_of.get(a) != cluster_of.get(b)
    }
    assert len(missed) / len(oracle) <= 0.01, f"missed: {sorted(missed)[:10]}"


def test_direct_pair_recall_distinct_texts(pipeline_result, ok_sets, cfg):
    """LSH S-curve check: among exact-representative docs (the ones
    that actually get signatures), direct verified-pair recall ≥ 0.99."""
    rep_rows = pipeline_result.signatures.select("doc_id").collect()
    reps = {r["doc_id"] for r in rep_rows}
    rep_sets = {d: s for d, s in ok_sets.items() if d in reps}
    oracle = brute_force_pairs(rep_sets, cfg.jaccard_threshold)
    engine = {
        (r["a"], r["b"])
        for r in pipeline_result.dup_pairs.select("a", "b").collect()
    }
    assert len(oracle) > 20
    missed = oracle - engine
    assert len(missed) / len(oracle) <= 0.01, f"missed: {sorted(missed)[:10]}"


def test_recall_vs_greedy_reference_clusters(pipeline_result, ok_sets, cfg):
    """BASELINE.json headline metric: dup-pair recall ≥ 0.99 vs the
    greedy reference oracle, where an engine hit means the reference
    pair lands in the same engine cluster (CC supersets greedy
    clusters — SURVEY.md §2.12)."""
    ref_pairs = greedy_reference_pairs(ok_sets, cfg.jaccard_threshold)
    assert len(ref_pairs) > 20
    cluster_of = {
        r["doc_id"]: r["cluster_id"]
        for r in pipeline_result.clusters.select("doc_id", "cluster_id").collect()
    }
    hit = sum(
        1 for (l, m) in ref_pairs if cluster_of.get(l) == cluster_of.get(m)
    )
    assert hit / len(ref_pairs) >= 0.99


def test_exact_duplicates_clustered(pipeline_result, pages_500):
    """doc_id % 10 == 6 rows are exact copies of their decade base —
    they must share a cluster (distance-0 analogue,
    duplicate_face.py:66-67)."""
    cl = {
        r["doc_id"]: r["cluster_id"]
        for r in pipeline_result.clusters.select("doc_id", "cluster_id").collect()
    }
    for decade in range(0, 500, 10):
        assert cl[decade + 6] == cl[decade], f"exact dup {decade+6} not clustered"


def test_transitive_chain_merged(pipeline_result, ok_sets, cfg):
    """A≈B, B≈C ⇒ same CC cluster even when A̸≈C (FIXTURES.md chain
    rows; distinguishes CC from greedy leader semantics)."""
    cl = {
        r["doc_id"]: r["cluster_id"]
        for r in pipeline_result.clusters.select("doc_id", "cluster_id").collect()
    }
    checked = 0
    for decade in range(0, 500, 10):
        a, b, c = decade, decade + 7, decade + 5
        if (
            _jaccard(ok_sets[a], ok_sets[b]) >= cfg.jaccard_threshold
            and _jaccard(ok_sets[b], ok_sets[c]) >= cfg.jaccard_threshold
        ):
            assert cl[a] == cl[b] == cl[c]
            checked += 1
    assert checked > 5


def test_cluster_id_is_min_member(pipeline_result):
    """Canonical = min(doc_id) per component (SURVEY.md §2.6 W1)."""
    bad = (
        pipeline_result.clusters.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("min_id"))
        .filter(F.col("cluster_id") != F.col("min_id"))
    )
    assert bad.count() == 0


def test_status_rows_are_singletons(pipeline_result):
    """empty/corrupted/low_quality rows never join a dup cluster
    (reference keeps them unique — duplicate_face.py:47-52,84-89)."""
    non_ok = pipeline_result.clusters.filter("status != 'ok'")
    assert non_ok.filter(F.col("cluster_id") != F.col("doc_id")).count() == 0


def test_bounded_signature_state_mode(pipeline_result, pages_500, cfg):
    """cfg.store_shingles=False (100 TB state mode): the signatures
    checkpoint drops the O(total text) shingle arrays and verification
    recomputes them for candidates only — results must be identical to
    the default mode."""
    res = run_pipeline(
        pages_500, cfg.with_(store_shingles=False), input_kind="pages"
    )
    assert "shingles" not in res.signatures.columns
    base_pairs = {
        (r["a"], r["b"], round(r["jaccard"], 6))
        for r in pipeline_result.dup_pairs.select("a", "b", "jaccard").collect()
    }
    mode_pairs = {
        (r["a"], r["b"], round(r["jaccard"], 6))
        for r in res.dup_pairs.select("a", "b", "jaccard").collect()
    }
    assert mode_pairs == base_pairs
    base_cl = {
        (r["doc_id"], r["cluster_id"])
        for r in pipeline_result.clusters.select("doc_id", "cluster_id").collect()
    }
    mode_cl = {
        (r["doc_id"], r["cluster_id"])
        for r in res.clusters.select("doc_id", "cluster_id").collect()
    }
    assert mode_cl == base_cl


def test_dup_assignments_form(pipeline_result):
    """(canonical, duplicate) rows mirror the reference's duplicates
    dict (duplicate_face.py:69-70): canonical ≠ duplicate, canonical
    is the cluster id."""
    da = pipeline_result.dup_assignments
    assert da.filter(F.col("canonical") >= F.col("duplicate")).count() == 0

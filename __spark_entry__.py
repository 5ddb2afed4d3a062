"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship near-duplicate clustering on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB twins for EVERY query (29/29 since round 3),
including the flagship pipeline (exhaustive shingle-Jaccard pair set
+ WITH RECURSIVE transitive closure — LSH recall at θ=0.8 with 32×4
banding is 1−~1e-6/pair, so the verified pair set equals the
exhaustive one), the SimHash pipeline (mod-2^64 rolling hash +
splitmix64 + majority vote emulated in HUGEINT arithmetic), and the
media features (digest-derived payloads and components).

Column names are aligned between the Spark queries and the SQL
oracles (the driver sorts columns by name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from face_duplicate_detection_spark.config import DedupConfig

CFG = DedupConfig()

# ---------------------------------------------------------------- helpers

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _norm_text(col):
    """lower + whitespace-fold — mirrors text_hashing.normalize_text
    exactly: the shared WS_CLASS literal char class means Java regex,
    RE2 and Python agree on the whitespace set (ADVICE r1)."""
    from face_duplicate_detection_spark.functions.text_hashing import WS_CLASS

    return F.lower(F.trim(F.regexp_replace(col, WS_CLASS + "+", " ")))


def _norm_sql_of(col: str = "text") -> str:
    from face_duplicate_detection_spark.functions.text_hashing import norm_sql

    return norm_sql(col)


_NORM_SQL = _norm_sql_of("text")


def _status_col():
    from face_duplicate_detection_spark.functions.normalize import status_expr

    return status_expr(F.col("text"), CFG)


_STATUS_SQL = f"""
    CASE
      WHEN text IS NULL THEN 'corrupted'
      WHEN len(trim(text)) = 0 THEN 'empty'
      WHEN len(trim(text)) < {CFG.min_text_chars}
        OR CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
           / greatest(len(string_split_regex(trim(text), '\\s+')), 1)
           < {CFG.min_distinct_token_ratio}
      THEN 'low_quality'
      ELSE 'ok'
    END
"""

# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedup pipeline (normalize → signatures → LSH →
    verify → connected components) on sf0.001; returns the clusters
    table (doc_id, status, cluster_id, is_canonical)."""
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = _docs(spark, "/root/testdata/sf0.001").select("doc_id", "text")
    res = run_pipeline(docs, CFG, input_kind="documents")
    return res.clusters.orderBy("doc_id")


# ---------------------------------------------------------------- queries

def q_status_counts(spark, sf_dir):
    """P2/P3/P4 status tagging (normalize stage) aggregated."""
    return (
        _docs(spark, sf_dir)
        .select(_status_col().alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_exact_dup_clusters(spark, sf_dir):
    """A7/J5 fast path: identical-text grouping, canonical = min id."""
    from face_duplicate_detection_spark.operators.exact_dedup import exact_clusters

    return exact_clusters(_docs(spark, sf_dir).select("doc_id", "text")).select(
        "doc_id", F.col("exact_cluster_id").alias("cluster_id")
    )


def q_exact_dup_pairs(spark, sf_dir):
    """S6 sink form: (canonical a, duplicate b) for identical texts."""
    from face_duplicate_detection_spark.operators.exact_dedup import exact_dup_edges

    return exact_dup_edges(_docs(spark, sf_dir).select("doc_id", "text"))


def q_cluster_sizes(spark, sf_dir):
    """A2/A3: members per canonical (exact-text clusters)."""
    from face_duplicate_detection_spark.operators.exact_dedup import exact_clusters

    return (
        exact_clusters(_docs(spark, sf_dir).select("doc_id", "text"))
        .groupBy(F.col("exact_cluster_id").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


def q_top3_members(spark, sf_dir):
    """W2: first 3 member ids per multi-member exact cluster."""
    from face_duplicate_detection_spark.operators.exact_dedup import exact_clusters

    c = exact_clusters(_docs(spark, sf_dir).select("doc_id", "text"))
    lst = (
        c.groupBy(F.col("exact_cluster_id").alias("cluster_id"))
        .agg(F.sort_array(F.collect_list("doc_id")).alias("members"))
        .filter(F.size("members") >= 2)
    )
    return lst.select(
        "cluster_id",
        F.element_at("members", 1).alias("m1"),
        F.element_at("members", 2).alias("m2"),
        F.element_at("members", 3).alias("m3"),
    )


def q_unique_docs_anti_join(spark, sf_dir):
    """J6/SO2: docs that are nobody's duplicate and no one's canonical
    with members — left anti join against exact-dup members."""
    from face_duplicate_detection_spark.operators.exact_dedup import exact_dup_edges

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    edges = exact_dup_edges(docs)
    dups = edges.select(F.col("b").alias("doc_id")).unionByName(
        edges.select(F.col("a").alias("doc_id"))
    )
    return docs.join(dups, "doc_id", "left_anti").select("doc_id")


def q_token_stats(spark, sf_dir):
    """SF-family scalar functions: token counts per doc."""
    from face_duplicate_detection_spark.functions.text_stats import (
        bpe_ish_token_count,
        distinct_token_count,
        token_count,
    )

    t = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct_tokens"),
        bpe_ish_token_count(t).alias("n_subword_tokens"),
        F.length(F.trim(t)).alias("n_chars_trim"),
    )


def q_quality_scores(spark, sf_dir):
    """Quality scoring (blur-filter analogue, SF6)."""
    from face_duplicate_detection_spark.functions.text_stats import quality_score

    return _docs(spark, sf_dir).select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    )


def q_lang_guess(spark, sf_dir):
    """Language-ID heuristic (marker-token vote)."""
    from face_duplicate_detection_spark.functions.text_stats import lang_id_expr

    return _docs(spark, sf_dir).select(
        "doc_id", lang_id_expr(F.col("text")).alias("lang_guess")
    )


def q_fingerprints(spark, sf_dir):
    """Document fingerprint over normalized text."""
    from face_duplicate_detection_spark.functions.text_stats import fingerprint_md5

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint_md5(F.col("text")).alias("fingerprint")
    )


def q_html_roundtrip(spark, sf_dir):
    """S4 + the input_hint invariant: html→text extraction is byte-
    identical to the source text (engine builds html, extracts back)."""
    from face_duplicate_detection_spark.functions.normalize import normalize_pages

    docs = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )
    pages = docs.select(
        "doc_id",
        F.col("doc_id").cast("string").alias("url"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
            "utf-8",
        ).alias("html"),
    )
    return normalize_pages(pages, CFG).select(
        "doc_id", F.col("text").alias("extracted")
    )


def q_token_jaccard_pairs(spark, sf_dir):
    """J1-J2 exact predicate on token sets (brute-force-checkable
    subset): pairs of docs (id < 256) with token-set Jaccard ≥ 0.75."""
    docs = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") < 256) & F.col("text").isNotNull())
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.array_distinct(F.split(F.trim("text"), r"\s+")).alias("toks"),
        )
    )
    sizes = docs.select("doc_id", F.size("toks").alias("n"))
    tok = docs.select("doc_id", F.explode("toks").alias("tok"))
    inter = (
        tok.alias("x")
        .join(tok.alias("y"), "tok")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    j = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.75)
    )
    return j


def q_similarity_stats(spark, sf_dir):
    """A6: min/max/avg similarity over the token-Jaccard pair set."""
    pairs = q_token_jaccard_pairs(spark, sf_dir)
    return pairs.agg(
        F.round(F.min("jaccard"), 6).alias("min_j"),
        F.round(F.max("jaccard"), 6).alias("max_j"),
        F.round(F.avg("jaccard"), 6).alias("avg_j"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


def q_shingle_jaccard_pairs(spark, sf_dir):
    """F1 + J2: exact k-char-shingle Jaccard pairs on a subset
    (id < 128, θ = 0.1) — the verification predicate in isolation."""
    from face_duplicate_detection_spark.operators.signatures import (
        compute_signatures,
    )

    docs = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") < 128) & F.col("text").isNotNull())
        .filter(F.length(F.trim("text")) >= CFG.shingle_k)
        .select("doc_id", "text")
    )
    sigs = compute_signatures(docs, CFG).select("doc_id", "n_shingles", "shingles")
    sizes = sigs.select("doc_id", F.col("n_shingles").alias("n"))
    sh = sigs.select("doc_id", F.explode("shingles").alias("sh"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "sh")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= 0.1)
    )


def q_shared_window_pairs(spark, sf_dir):
    """F4 candidate generation: pairs (id < 192) sharing at least one
    exact 64-char window of normalized text (stride-1 anchors)."""
    from face_duplicate_detection_spark.operators.suffix_spans import emit_anchors

    docs = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") < 192) & F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    anchors = emit_anchors(docs, CFG, winnow=False).dropDuplicates(
        ["doc_id", "anchor"]
    )
    return (
        anchors.alias("x")
        .join(anchors.alias("y"), "anchor")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )


def q_events_by_user(spark, sf_dir):
    """A1/A4 aggregations + timestamp handling on the events table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.max(F.unix_timestamp("ts")).alias("last_ts_epoch"),
    )


def q_windowed_ingest_stats(spark, sf_dir):
    """B5 streaming-native coverage, batch-replayed: the SAME
    `windowed_ingest_stats` operator that runs under readStream +
    watermark in tests/test_streaming.py executed over the events
    parquet as a bounded input (withWatermark is a no-op on batch
    plans, the tumbling event-time window/agg is identical code) —
    giving the streaming operator a full DuckDB `time_bucket` value
    oracle instead of pytest-only coverage (VERDICT r2 next-round #7).
    Window bounds are formatted as UTC strings so both engines hash
    the same canonical values."""
    from face_duplicate_detection_spark.streaming.stateful import (
        windowed_ingest_stats,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream_like = ev.select("ts", F.col("props").alias("text"))
    out = windowed_ingest_stats(stream_like, ts_col="ts")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "n_docs",
        "n_chars",
    )


def q_lineitem_pricing(spark, sf_dir):
    """TPC-H Q1-shaped scan→filter→agg (S1/S3/A-family coverage)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_ann_topk(spark, sf_dir):
    """Embedding cosine top-k (brute-force baseline, F.aggregate dot
    products) — queries = vec_id < 16, k = 5."""
    from face_duplicate_detection_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 16)
    return cosine_topk_bruteforce(emb, queries, k=5).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


# ------------------------- pipeline queries -----------------------------

def q_minhash_dup_pairs(spark, sf_dir):
    """Full LSH pipeline verified dup pairs (MinHash → bands → exact
    Jaccard).  SQL twin: exhaustive shingle-Jaccard ≥ θ among exact
    representatives + exact-text edges.

    Oracle-exact configuration: caps raised (bucket_cap=4096,
    mega_bucket_cap=1e6) so candidate generation is provably all-pairs
    per bucket at the checked corpus — chain pairing under the default
    cap=16 deliberately omits intra-group pairs (preserving only
    connectivity), which would make equality with the exhaustive
    DuckDB twin corpus-dependent.  The capped/chained scale path is
    exercised by q_dedup_clusters (connectivity oracle) and pytest."""
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    cfg = CFG.with_(bucket_cap=4096, mega_bucket_cap=1_000_000)
    res = run_pipeline(docs, cfg, input_kind="documents")
    return res.dup_pairs.select("a", "b", F.round("jaccard", 6).alias("jaccard"), "method")


def q_dedup_clusters(spark, sf_dir):
    """Flagship: full pipeline connected-component clusters."""
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    res = run_pipeline(docs, CFG, input_kind="documents")
    return res.clusters.select("doc_id", "status", "cluster_id", "is_canonical")


def q_simhash_near_pairs(spark, sf_dir):
    """SimHash Hamming ≤ h near-dup pairs via exact pigeonhole
    Hamming-LSH (64 bits → h+1 blocks; agreeing on ≥1 block is
    NECESSARY for hamming ≤ h, so candidate recall is 1.0 by
    construction).

    Oracle-exact configuration: caps raised so in-bucket pair
    generation is all-pairs — the result is then EXACTLY every
    matchable doc pair with hamming(simhash) ≤ h, which the DuckDB
    twin recomputes from scratch (rolling hash → splitmix64 → majority
    vote, all in mod-2^64 HUGEINT arithmetic).  The capped/chained
    scale path is covered by pytest."""
    from face_duplicate_detection_spark.functions.normalize import (
        matchable_docs,
        normalize_documents,
    )
    from face_duplicate_detection_spark.operators.lsh import (
        candidate_pairs,
        explode_simhash_blocks,
    )
    from face_duplicate_detection_spark.operators.signatures import (
        compute_signatures,
    )
    from face_duplicate_detection_spark.operators.verify import simhash_near_pairs

    docs = matchable_docs(
        normalize_documents(_docs(spark, sf_dir).select("doc_id", "text"), CFG)
    )
    cfg = CFG.with_(bucket_cap=4096, mega_bucket_cap=1_000_000)
    sigs = compute_signatures(docs, cfg)
    cand = candidate_pairs(explode_simhash_blocks(sigs, cfg), cfg)
    return simhash_near_pairs(cand, sigs, cfg).select(
        "a", "b", F.col("hamming").cast("int").alias("hamming"), "method"
    )


def q_long_span_pairs(spark, sf_dir):
    """Suffix stage: exact long-span (LCS ≥ 200) duplicate pairs.

    Oracle-exact configuration: stride-1 anchors (winnow=False) and
    caps high enough that candidate generation is complete all-pairs
    per shared window — the result is then EXACTLY every matchable
    doc pair whose longest common substring ≥ 200, which the DuckDB
    twin recomputes from substrings.  The winnowed/chain-paired scale
    path is covered separately by pytest recall tests."""
    from face_duplicate_detection_spark.functions.normalize import (
        matchable_docs,
        normalize_documents,
    )
    from face_duplicate_detection_spark.operators.suffix_spans import long_span_pairs

    docs = matchable_docs(
        normalize_documents(_docs(spark, sf_dir).select("doc_id", "text"), CFG)
    )
    cfg = CFG.with_(
        span_min_len=200, bucket_cap=4096, mega_bucket_cap=1_000_000
    )
    return long_span_pairs(docs, cfg, winnow=False)


def q_embedding_dup_pairs(spark, sf_dir):
    """Hyperplane-LSH embedding near-dup pairs (cosine ≥ 0.99).

    The driver embeddings have no true near-dups (max pairwise cosine
    ≈ 0.51), so the corpus is augmented with planted copies
    (vec_id + 100000, identical vector) — every planted pair must be
    recovered, making this a real recall check instead of a vacuous
    empty result."""
    from face_duplicate_detection_spark.operators.similarity import (
        embedding_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    copies = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return embedding_dup_pairs(
        emb.unionByName(copies), threshold=0.99, n_planes=8, n_tables=6
    )


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payload → feature vector (stubbed
    decode, real Arrow/batch/schema path).  Returned as driver-hashable
    scalars (norm, first components, 64-bit fingerprint of the rounded
    vector) — array<float> columns break pandas canonicalization."""
    from face_duplicate_detection_spark.operators.multimodal import (
        extract_features,
        feature_summary,
        synthesize_media,
    )

    media = synthesize_media(spark, 200, seed=42)
    return feature_summary(extract_features(media))


def q_ann_topk_large(spark, sf_dir):
    """Large-query-set ANN: every vector queries the corpus (queries ≈
    corpus, so the broadcast cross join of `ann_topk` is off the
    table).  Cell-partitioned IVF plan with n_probe = n_centroids —
    exhaustive (exact, oracle-checkable) but shuffle-partitioned by
    centroid cell instead of broadcast; lower n_probe trades recall
    for cost on clustered data (pytest covers that mode)."""
    from face_duplicate_detection_spark.operators.similarity import (
        cosine_topk_ivf,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk_ivf(
        emb, emb, k=3, n_centroids=16, n_probe=16
    ).select("query_id", "neighbor_id", "cosine", "rank")


def q_duplicate_report(spark, sf_dir):
    """S5 report: per-canonical duplicate counts + similarity stats
    over the full verified pair set (exact ∪ minhash)."""
    from face_duplicate_detection_spark.plans.outputs import duplicate_report
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    res = run_pipeline(docs, CFG, input_kind="documents")
    return duplicate_report(res.dup_pairs)


def q_consolidated_report(spark, sf_dir):
    """S9 consolidated output: every doc with status, cluster and
    disposition (unique/duplicate/status)."""
    from face_duplicate_detection_spark.plans.outputs import consolidated_report
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    res = run_pipeline(docs, CFG, input_kind="documents")
    return consolidated_report(res.clusters, res.docs_normalized)


def q_summary_metrics(spark, sf_dir):
    """A5/summary panel: one row of totals by status + dup counts."""
    from face_duplicate_detection_spark.plans.outputs import summary_metrics
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    res = run_pipeline(docs, CFG, input_kind="documents")
    return summary_metrics(res.clusters)


# --------------------- production scale-path stress corpus -------------

# Boilerplate-heavy corpus engineered so the DEFAULT candidate caps
# actually bind (VERDICT r3 next-round #1): group 0 (200 near-identical
# variants) exceeds the lowered mega_bucket_cap → salted subgroup
# chains + forced bridge pairs; groups 1-2 (60 docs) exceed
# bucket_cap=16 → chain pairing; group 3 (12 docs) stays on the
# all-pairs path; 40 fillers are mutual non-dups.  The SAME rows are
# generated Python-side for Spark and expression-side in the DuckDB
# oracle (verified equal by the value-hash gate).
_STRESS_GROUP_SIZES = (200, 60, 60, 12)


def _stress_body(g: int) -> str:
    return " ".join(f"g{g}w{j:02d}" for j in range(40))


def _stress_rows():
    rows = []
    i = 0
    for g, sz in enumerate(_STRESS_GROUP_SIZES):
        for _ in range(sz):
            rows.append((2_000_000 + i, f"{_stress_body(g)} v{i}"))
            i += 1
    for j in range(40):
        rows.append((
            3_000_000 + j,
            f"filler {j} document {j * 7 + 1} about {j * 13 + 2} subject "
            f"{j * 29 + 3} content {j * 31 + 4} tokens {j * 37 + 5} end",
        ))
    return rows


def q_dedup_clusters_chained(spark, sf_dir):
    """Clusters under the PRODUCTION skew path — the code a 100 TB run
    executes: bucket_cap=16 (default) → chain pairing inside every
    >cap band bucket; mega_bucket_cap lowered to 64 so the salted
    subgroup-chain + forced-bridge path triggers on the 200-doc
    boilerplate group at test scale (the threshold is scaled down, the
    code path is the default one); winnowing does not apply (suffix
    stage not involved).  The oracle is an exhaustive shingle-Jaccard
    edge set + WITH RECURSIVE closure: equality proves chain pairing
    and salted bridges preserve cluster connectivity exactly where the
    raised-cap flagship rows prove only the all-pairs configs."""
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = spark.createDataFrame(_stress_rows(), "doc_id long, text string")
    cfg = CFG.with_(mega_bucket_cap=64, salt_buckets=8)
    res = run_pipeline(docs, cfg, input_kind="documents")
    return res.clusters.select("doc_id", "cluster_id", "is_canonical")


# --------------------- winnowed suffix-path planted corpus --------------
#
# q_long_span_pairs runs winnow=False (stride-1 anchors) so its DuckDB
# twin can recompute LCS from substrings exactly.  The PRODUCTION
# suffix path winnows anchors 1/span_winnow (VERDICT r4 next-round #6)
# — this corpus oracles that path: 10 groups of 3 docs share a planted
# span of known length L_g = 260 + 7·g (all ≥ span_min_len = 256),
# wrapped in per-member-unique boundary chars so the exact LCS of any
# group pair is EXACTLY L_g (no accidental extension), plus 20
# span-free filler docs.  The engine's winnowed output must equal the
# planted truth — every planted pair recovered (winnow recall 1.0 on
# this corpus) with the exact span length (verification is stride-1
# regardless of winnowing), and nothing else (verify is exact, and
# fillers share no 64-char window).  Reference analogue: exact-match
# semantics at duplicate_face.py:66-67 (tolerance→0).
_SPAN_GROUPS = 10
_SPAN_MEMBERS = 3
_SPAN_BASE_ID = 4_000_000


def _span_len_of(g: int) -> int:
    return 260 + 7 * g


def _span_rows():
    rows = []
    for g in range(_SPAN_GROUPS):
        span_tokens = " ".join(f"s{g:02d}w{j:02d}" for j in range(60))
        span = span_tokens[: _span_len_of(g)]
        for j in range(_SPAN_MEMBERS):
            did = _SPAN_BASE_ID + g * _SPAN_MEMBERS + j
            pre = " ".join(f"p{did}t{k}" for k in range(30))
            post = " ".join(f"q{did}t{k}" for k in range(30))
            # boundary chars unique within the group: the char before
            # and after the span differ between any two members, so
            # their LCS cannot extend past the planted span
            rows.append(
                (did, f"{pre} {chr(ord('b') + j)}{span}{chr(ord('m') + j)} {post}")
            )
    for j in range(20):
        did = _SPAN_BASE_ID + 100_000 + j
        rows.append((did, " ".join(f"f{did}t{k}" for k in range(60))))
    return rows


def q_long_span_pairs_winnowed(spark, sf_dir):
    """Suffix stage under PRODUCTION winnowing (winnow=True, default
    1/16 anchor sample): planted-span corpus where the expected output
    is known exactly — see _span_rows.  (sf_dir ignored: the corpus is
    its own fixture, like dedup_clusters_chained.)"""
    from face_duplicate_detection_spark.functions.normalize import (
        matchable_docs,
        normalize_documents,
    )
    from face_duplicate_detection_spark.operators.suffix_spans import long_span_pairs

    docs = matchable_docs(
        normalize_documents(
            spark.createDataFrame(_span_rows(), "doc_id long, text string"), CFG
        )
    )
    return long_span_pairs(docs, CFG, winnow=True)


def q_lineage_stats(spark, sf_dir):
    """A1/B4 lineage surface: per-stage row totals from the lineage
    table the pipeline commits alongside its stage tables (per-
    partition rows aggregated to per-stage so the result is stable
    under partitioning).  Session-lifetime scratch catalog: the
    returned DataFrame stays lazy and parquet-backed (VERDICT r4 #8 —
    no driver-side cache().count() materialization)."""
    from face_duplicate_detection_spark.catalog import (
        StageCatalog,
        session_scratch,
    )
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    cfg = CFG.with_(bucket_cap=4096, mega_bucket_cap=1_000_000)
    cat = StageCatalog(session_scratch("fdds_lineage_"))
    run_pipeline(docs, cfg, input_kind="documents", catalog=cat)
    return (
        cat.read(spark, "lineage")
        .groupBy("stage")
        .agg(F.sum("rows_in").alias("rows_in"))
        .orderBy("stage")
    )


def q_incremental_batch_ledger(spark, sf_dir):
    """B3 resume surface: three keyed batches + a replay of an
    already-applied key.  Returns per-batch (batch_seq, n_new_sigs)
    from the committed inc_metrics state — exactly three rows iff the
    replay was a no-op and each batch was applied exactly once.
    Session-lifetime scratch catalog keeps the result lazy."""
    from face_duplicate_detection_spark.catalog import (
        StageCatalog,
        session_scratch,
    )
    from face_duplicate_detection_spark.streaming.incremental import (
        incremental_batch,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )
    cat = StageCatalog(session_scratch("fdds_ledger_"))
    for k in range(3):
        incremental_batch(
            docs.filter(F.col("doc_id") % 3 == k),
            CFG,
            cat,
            spark,
            with_metrics=True,
            batch_key=f"b{k}",
        )
    # at-least-once delivery: replay of an applied key is a no-op
    incremental_batch(
        docs.filter(F.col("doc_id") % 3 == 0),
        CFG,
        cat,
        spark,
        with_metrics=True,
        batch_key="b0",
    )
    return (
        cat.read(spark, "inc_metrics")
        .select("batch_seq", "n_new_sigs")
        .orderBy("batch_seq")
    )


def q_incremental_dedup(spark, sf_dir):
    """B2 cross-batch carried state: two incremental batches produce
    the same clusters as one full run (returns the final state).
    Session-lifetime scratch catalog keeps the result lazy."""
    from face_duplicate_detection_spark.catalog import (
        StageCatalog,
        session_scratch,
    )
    from face_duplicate_detection_spark.streaming.incremental import (
        incremental_batch,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )
    cat = StageCatalog(session_scratch("fdds_incdedup_"))
    incremental_batch(docs.filter(F.col("doc_id") % 2 == 0), CFG, cat, spark)
    out = incremental_batch(docs.filter(F.col("doc_id") % 2 == 1), CFG, cat, spark)
    return out.orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "status_counts": q_status_counts,
        "exact_dup_clusters": q_exact_dup_clusters,
        "exact_dup_pairs": q_exact_dup_pairs,
        "cluster_sizes": q_cluster_sizes,
        "top3_members": q_top3_members,
        "unique_docs_anti_join": q_unique_docs_anti_join,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "lang_guess": q_lang_guess,
        "fingerprints": q_fingerprints,
        "html_roundtrip": q_html_roundtrip,
        "token_jaccard_pairs": q_token_jaccard_pairs,
        "similarity_stats": q_similarity_stats,
        "shingle_jaccard_pairs": q_shingle_jaccard_pairs,
        "shared_window_pairs": q_shared_window_pairs,
        "events_by_user": q_events_by_user,
        "windowed_ingest_stats": q_windowed_ingest_stats,
        "lineitem_pricing": q_lineitem_pricing,
        "ann_topk": q_ann_topk,
        "ann_topk_large": q_ann_topk_large,
        # flagship pipeline queries — full DuckDB twins (exhaustive
        # shingle-Jaccard + WITH RECURSIVE transitive closure)
        "minhash_dup_pairs": q_minhash_dup_pairs,
        "dedup_clusters": q_dedup_clusters,
        "incremental_dedup": q_incremental_dedup,
        "long_span_pairs": q_long_span_pairs,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "duplicate_report": q_duplicate_report,
        "consolidated_report": q_consolidated_report,
        "summary_metrics": q_summary_metrics,
        "simhash_near_pairs": q_simhash_near_pairs,
        "media_features": q_media_features,
        # production scale-path + lineage/ledger surfaces (round 4)
        "dedup_clusters_chained": q_dedup_clusters_chained,
        "lineage_stats": q_lineage_stats,
        "incremental_batch_ledger": q_incremental_batch_ledger,
        # production winnowed suffix path vs planted truth (round 5)
        "long_span_pairs_winnowed": q_long_span_pairs_winnowed,
    }


# ---------------------------------------------------------------- oracles

def _dedup_cte() -> str:
    """Shared DuckDB CTE chain mirroring the flagship pipeline:

    matchable (status ok) → exact-text clusters/edges → representative
    docs → k-shingle sets → exact-Jaccard ≥ θ pairs among reps.

    This is the SQL twin of normalize → exact_dedup → signatures →
    LSH → verify: LSH recall at θ=0.8 with 32×4 banding is
    1 − ~1e-6/pair, so the verified pair set equals the exhaustive
    ≥ θ set (and the pytest brute-force oracle pins the same claim).
    """
    k = CFG.shingle_k
    theta = CFG.jaccard_threshold
    return f"""
        matchable AS (
          SELECT doc_id, text FROM documents WHERE ({_STATUS_SQL}) = 'ok'
        ),
        exact_c AS (
          SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS rep
          FROM matchable
        ),
        exact_edges AS (
          SELECT rep AS a, doc_id AS b FROM exact_c WHERE doc_id != rep
        ),
        reps AS (
          SELECT doc_id, {_NORM_SQL} AS t FROM exact_c WHERE doc_id = rep
        ),
        sh AS (
          SELECT DISTINCT doc_id, substring(t, i, {k}) AS s
          FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - {k} + 1)) AS i
            FROM reps WHERE len(t) > {k}
          )
          UNION
          SELECT doc_id, t AS s FROM reps
          WHERE len(t) >= 1 AND len(t) <= {k}
        ),
        sh_sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        sh_inter AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        ),
        mh_pairs AS (
          SELECT a, b,
                 CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
          FROM sh_inter
          JOIN sh_sizes sa ON sa.doc_id = a
          JOIN sh_sizes sb ON sb.doc_id = b
          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {theta}
        )
    """


def _closure_cte() -> str:
    """Transitive closure over `edges(a, b)` → labels(doc_id,
    cluster_id = min reachable id): the SQL twin of the large/small-
    star connected components."""
    return """
        sym AS (
          SELECT a AS src, b AS dst FROM edges
          UNION
          SELECT b AS src, a AS dst FROM edges
        ),
        reach AS (
          SELECT src AS node, src AS r FROM sym
          UNION
          SELECT s.dst AS node, reach.r AS r
          FROM reach JOIN sym s ON s.src = reach.node
        ),
        labels AS (
          SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
        )
    """


def _simhash_cte() -> str:
    """DuckDB twin of the full SimHash pipeline
    (text_hashing.shingle_hashes → simhash_batch): normalized UTF-8
    bytes → stride-1 k-byte polynomial rolling hashes (mod 2^64) →
    splitmix64 finalizer → distinct → per-bit majority vote.

    Mod-2^64 arithmetic is emulated in HUGEINT (int128): every
    multiply is split into 32-bit halves
    (``lo(a)·b + ((hi(a)·b mod 2^32) << 32) mod 2^64``) so no
    intermediate exceeds 2^96; xor/shift run natively on UBIGINT.
    Produces ``simfp(doc_id, fp UBIGINT)`` over matchable docs with
    ≥ 1 shingle — bit-identical to the numpy kernel (unit-tested in
    tests/test_text_hashing.py, including non-ASCII)."""
    k = CFG.shingle_k
    base = 1099511628211
    offset = 14695981039346656037
    two64 = 1 << 64
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    bpow = "[" + ",".join(
        f"CAST({pow(base, p, two64)} AS HUGEINT)" for p in range(k)
    ) + "]"
    pow2 = "[" + ",".join(f"CAST({1 << b} AS HUGEINT)" for b in range(64)) + "]"

    def mulmod(x: str, c: int) -> str:
        return (
            f"CAST((((CAST({x} AS HUGEINT) % 4294967296) * {c}"
            f" + (((CAST({x} AS HUGEINT) // 4294967296) * {c}) % 4294967296)"
            f" * 4294967296) % {two64}) AS UBIGINT)"
        )

    def xsr(x: str, s: int) -> str:
        return f"xor({x}, ({x} >> {s}))"

    return f"""
        sim_matchable AS (
          SELECT doc_id, {_NORM_SQL} AS t FROM documents
          WHERE ({_STATUS_SQL}) = 'ok'
        ),
        sim_hx AS (
          SELECT doc_id, hex(encode(t)) AS hs,
                 octet_length(encode(t)) AS n,
                 LEAST(octet_length(encode(t)), {k}) AS w
          FROM sim_matchable WHERE len(t) >= 1
        ),
        sim_wins AS (
          SELECT doc_id, hs, w, unnest(generate_series(0, n - w)) AS i
          FROM sim_hx
        ),
        sim_bytes AS (
          SELECT doc_id, i, w, hs,
                 unnest(generate_series(0, w - 1)) AS j
          FROM sim_wins
        ),
        sim_terms AS (
          SELECT doc_id, i,
                 CAST(CAST('0x' || substr(hs, CAST(2*(i+j)+1 AS INT), 2)
                      AS INTEGER) AS HUGEINT) * ({bpow})[w - j] AS term
          FROM sim_bytes
        ),
        sim_rawh AS (
          SELECT doc_id,
                 CAST(({offset} + sum(term)) % {two64} AS UBIGINT) AS h
          FROM sim_terms GROUP BY doc_id, i
        ),
        sim_m1 AS (SELECT doc_id, {xsr('h', 30)} AS x FROM sim_rawh),
        sim_m2 AS (SELECT doc_id, {mulmod('x', c1)} AS x FROM sim_m1),
        sim_m3 AS (SELECT doc_id, {xsr('x', 27)} AS x FROM sim_m2),
        sim_m4 AS (SELECT doc_id, {mulmod('x', c2)} AS x FROM sim_m3),
        sim_m5 AS (SELECT doc_id, {xsr('x', 31)} AS x FROM sim_m4),
        sim_sh AS (SELECT DISTINCT doc_id, x AS h FROM sim_m5),
        sim_cnt AS (SELECT doc_id, count(*) AS nsh FROM sim_sh GROUP BY doc_id),
        sim_bits AS (
          SELECT s.doc_id, b.range AS bit,
                 sum(CASE WHEN (s.h >> CAST(b.range AS INT)) & 1 = 1
                          THEN 1 ELSE 0 END) AS votes
          FROM sim_sh s, range(0, 64) b GROUP BY s.doc_id, b.range
        ),
        simfp AS (
          SELECT sim_bits.doc_id,
                 CAST(sum(CASE WHEN votes * 2 > sim_cnt.nsh
                               THEN ({pow2})[bit + 1] ELSE 0 END)
                   AS UBIGINT) AS fp
          FROM sim_bits JOIN sim_cnt ON sim_bits.doc_id = sim_cnt.doc_id
          GROUP BY sim_bits.doc_id
        )
    """


def oracle_sql() -> dict[str, str]:
    tok = "string_split_regex(trim(text), '\\s+')"
    return {
        "status_counts": f"""
            SELECT status, count(*) AS n
            FROM (SELECT {_STATUS_SQL} AS status FROM documents)
            GROUP BY status
        """,
        "exact_dup_clusters": """
            SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster_id
            FROM documents
        """,
        "exact_dup_pairs": """
            WITH c AS (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep
              FROM documents
            )
            SELECT rep AS a, doc_id AS b FROM c WHERE doc_id != rep
        """,
        "cluster_sizes": """
            WITH c AS (
              SELECT min(doc_id) OVER (PARTITION BY text) AS cluster_id
              FROM documents
            )
            SELECT cluster_id, count(*) AS n_members FROM c GROUP BY cluster_id
        """,
        "top3_members": """
            WITH c AS (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster_id
              FROM documents
            ), g AS (
              SELECT cluster_id, list_sort(list(doc_id)) AS members
              FROM c GROUP BY cluster_id HAVING count(*) >= 2
            )
            SELECT cluster_id, members[1] AS m1, members[2] AS m2,
                   members[3] AS m3
            FROM g
        """,
        "unique_docs_anti_join": """
            WITH c AS (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep,
                     count(*) OVER (PARTITION BY text) AS sz
              FROM documents
            )
            SELECT doc_id FROM c WHERE sz = 1
        """,
        "token_stats": f"""
            SELECT doc_id,
              CASE WHEN len(trim(text)) = 0 THEN 0
                   ELSE len({tok}) END AS n_tokens,
              CASE WHEN len(trim(text)) = 0 THEN 0
                   ELSE len(list_distinct({tok})) END AS n_distinct_tokens,
              CASE WHEN len(trim(regexp_replace(lower(trim(text)),
                       '([a-z]+|[0-9]+|[^a-z0-9\\s])', '\\1 ', 'g'))) = 0 THEN 0
                   ELSE len(string_split_regex(trim(regexp_replace(lower(trim(text)),
                       '([a-z]+|[0-9]+|[^a-z0-9\\s])', '\\1 ', 'g')), '\\s+'))
              END AS n_subword_tokens,
              len(trim(text)) AS n_chars_trim
            FROM documents
        """,
        "quality_scores": f"""
            SELECT doc_id, round(
              least(len(trim(text)) / 200.0, 1.0)
              * (CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE CAST(len(list_distinct({tok})) AS DOUBLE) END
                 / greatest(CASE WHEN len(trim(text)) = 0 THEN 0
                                 ELSE len({tok}) END, 1))
              * (CAST(len(regexp_replace(trim(text), '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
                 / greatest(len(trim(text)), 1)), 6) AS quality
            FROM documents
        """,
        "lang_guess": """
            WITH t AS (
              SELECT doc_id,
                list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                len(list_intersect(toks, ['the','and','of','to','is'])) AS s_en,
                len(list_intersect(toks, ['le','la','les','et','est'])) AS s_fr,
                len(list_intersect(toks, ['el','los','las','es','una'])) AS s_es,
                len(list_intersect(toks, ['der','die','das','und','ist'])) AS s_de
              FROM t
            )
            SELECT doc_id,
              CASE WHEN greatest(s_en,s_fr,s_es,s_de) = 0 THEN 'und'
                   WHEN s_en = greatest(s_en,s_fr,s_es,s_de) THEN 'en'
                   WHEN s_fr = greatest(s_en,s_fr,s_es,s_de) THEN 'fr'
                   WHEN s_es = greatest(s_en,s_fr,s_es,s_de) THEN 'es'
                   ELSE 'de' END AS lang_guess
            FROM s
        """,
        "fingerprints": f"""
            SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents
        """,
        "html_roundtrip": """
            SELECT doc_id, text AS extracted FROM documents
            WHERE text IS NOT NULL
        """,
        "token_jaccard_pairs": """
            WITH d AS (
              SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS toks
              FROM documents
              WHERE doc_id < 256 AND text IS NOT NULL AND len(trim(text)) > 0
            ), e AS (
              SELECT doc_id, unnest(toks) AS tok FROM d
            ), sizes AS (
              SELECT doc_id, len(toks) AS n FROM d
            ), inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM e x JOIN e y ON x.tok = y.tok AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b,
              round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.75
        """,
        "similarity_stats": """
            WITH d AS (
              SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS toks
              FROM documents
              WHERE doc_id < 256 AND text IS NOT NULL AND len(trim(text)) > 0
            ), e AS (
              SELECT doc_id, unnest(toks) AS tok FROM d
            ), sizes AS (
              SELECT doc_id, len(toks) AS n FROM d
            ), inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM e x JOIN e y ON x.tok = y.tok AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = a
              JOIN sizes sb ON sb.doc_id = b
              WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.75
            )
            SELECT round(min(jaccard), 6) AS min_j, round(max(jaccard), 6) AS max_j,
                   round(avg(jaccard), 6) AS avg_j, count(*) AS n_pairs
            FROM pairs
        """,
        "shingle_jaccard_pairs": f"""
            WITH norm AS (
              SELECT doc_id, {_NORM_SQL} AS t FROM documents
              WHERE doc_id < 128 AND text IS NOT NULL
                AND len(trim(text)) >= {CFG.shingle_k}
            ), sh AS (
              SELECT DISTINCT doc_id, substring(t, i, {CFG.shingle_k}) AS s
              FROM (
                SELECT doc_id, t,
                  unnest(generate_series(1, len(t) - {CFG.shingle_k} + 1)) AS i
                FROM norm WHERE len(t) > {CFG.shingle_k}
              )
              UNION
              SELECT doc_id, t AS s FROM norm WHERE len(t) <= {CFG.shingle_k}
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b,
              round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.1
        """,
        "shared_window_pairs": f"""
            WITH norm AS (
              SELECT doc_id, {_NORM_SQL} AS t FROM documents
              WHERE doc_id < 192 AND text IS NOT NULL
            ), w AS (
              SELECT DISTINCT doc_id, substring(t, i, {CFG.span_window}) AS win
              FROM (
                SELECT doc_id, t,
                  unnest(generate_series(1, len(t) - {CFG.span_window} + 1)) AS i
                FROM norm WHERE len(t) >= {CFG.span_window}
              )
            )
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM w x JOIN w y ON x.win = y.win AND x.doc_id < y.doc_id
        """,
        "windowed_ingest_stats": """
            SELECT strftime(time_bucket(INTERVAL '10 minutes', ts),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   strftime(time_bucket(INTERVAL '10 minutes', ts)
                              + INTERVAL '10 minutes',
                            '%Y-%m-%d %H:%M:%S') AS window_end,
                   count(*) AS n_docs,
                   CAST(sum(len(coalesce(props, ''))) AS BIGINT) AS n_chars
            FROM events
            GROUP BY 1, 2
        """,
        "events_by_user": """
            SELECT user_id, count(*) AS n_events,
                   count(DISTINCT event_type) AS n_types,
                   round(sum(value), 4) AS total_value,
                   CAST(floor(epoch(max(ts))) AS BIGINT) AS last_ts_epoch
            FROM events GROUP BY user_id
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "ann_topk_large": """
            WITH scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                  AS cos_raw
              FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
            ), ranked AS (
              SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
                row_number() OVER (
                  PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC
                ) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, cosine, rank
            FROM ranked WHERE rank <= 3
        """,
        "minhash_dup_pairs": f"""
            WITH {_dedup_cte()}
            SELECT a, b, round(jaccard, 6) AS jaccard,
                   'minhash' AS method
            FROM mh_pairs
            UNION ALL
            SELECT a, b, 1.0 AS jaccard, 'exact' AS method
            FROM exact_edges
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE {_dedup_cte()},
            edges AS (
              SELECT a, b FROM exact_edges
              UNION
              SELECT a, b FROM mh_pairs
            ),
            {_closure_cte()}
            SELECT d.doc_id,
                   ({_STATUS_SQL}) AS status,
                   coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                   (coalesce(l.cluster_id, d.doc_id) = d.doc_id) AS is_canonical
            FROM documents d
            LEFT JOIN labels l ON l.doc_id = d.doc_id
        """,
        "incremental_dedup": f"""
            WITH RECURSIVE d AS (
              SELECT doc_id, {_NORM_SQL} AS t FROM documents
              WHERE text IS NOT NULL
            ),
            sh AS (
              SELECT DISTINCT doc_id, substring(t, i, {CFG.shingle_k}) AS s
              FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - {CFG.shingle_k} + 1)) AS i
                FROM d WHERE len(t) > {CFG.shingle_k}
              )
              UNION
              SELECT doc_id, t AS s FROM d
              WHERE len(t) >= 1 AND len(t) <= {CFG.shingle_k}
            ),
            sh_sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            sh_inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT a, b FROM sh_inter
              JOIN sh_sizes sa ON sa.doc_id = a
              JOIN sh_sizes sb ON sb.doc_id = b
              WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i)
                    >= {CFG.jaccard_threshold}
            ),
            {_closure_cte()}
            SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
            FROM d LEFT JOIN labels l ON l.doc_id = d.doc_id
        """,
        "embedding_dup_pairs": """
            WITH all_v AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
              WHERE vec_id % 5 = 0
            )
            SELECT x.vec_id AS a, y.vec_id AS b,
                   round(list_cosine_similarity(
                     x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) AS cosine
            FROM all_v x JOIN all_v y ON x.vec_id < y.vec_id
            WHERE list_cosine_similarity(
                    x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.99
        """,
        "long_span_pairs": f"""
            WITH norm AS (
              SELECT doc_id, {_NORM_SQL} AS t FROM documents
              WHERE ({_STATUS_SQL}) = 'ok'
            ),
            w AS (
              SELECT doc_id, i, substring(t, i, {CFG.span_window}) AS win
              FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - {CFG.span_window} + 1)) AS i
                FROM norm WHERE len(t) >= {CFG.span_window}
              )
            ),
            m AS (
              SELECT x.doc_id AS a, y.doc_id AS b,
                     (y.i - x.i) AS diag, x.i AS pa
              FROM w x JOIN w y ON x.win = y.win AND x.doc_id < y.doc_id
            ),
            r AS (
              SELECT a, b, diag, pa,
                     pa - row_number() OVER (
                       PARTITION BY a, b, diag ORDER BY pa) AS isl
              FROM m
            ),
            runs AS (
              SELECT a, b, diag, isl, count(*) AS run
              FROM r GROUP BY 1, 2, 3, 4
            ),
            spans AS (
              SELECT a, b,
                     CAST(max(run) + {CFG.span_window - 1} AS INT) AS span_len
              FROM runs GROUP BY 1, 2
            )
            SELECT a, b, span_len, 'suffix' AS method
            FROM spans WHERE span_len >= 200
        """,
        "duplicate_report": f"""
            WITH {_dedup_cte()},
            all_pairs AS (
              SELECT a, b, jaccard FROM mh_pairs
              UNION ALL
              SELECT a, b, 1.0 AS jaccard FROM exact_edges
            )
            SELECT a, count(*) AS n_duplicates,
                   round(min(jaccard), 6) AS min_jaccard,
                   round(max(jaccard), 6) AS max_jaccard,
                   round(avg(jaccard), 6) AS avg_jaccard
            FROM all_pairs GROUP BY a
        """,
        "consolidated_report": f"""
            WITH RECURSIVE {_dedup_cte()},
            edges AS (
              SELECT a, b FROM exact_edges
              UNION
              SELECT a, b FROM mh_pairs
            ),
            {_closure_cte()},
            cl AS (
              SELECT d.doc_id,
                     ({_STATUS_SQL}) AS status,
                     coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                     (coalesce(l.cluster_id, d.doc_id) = d.doc_id)
                       AS is_canonical
              FROM documents d
              LEFT JOIN labels l ON l.doc_id = d.doc_id
            )
            SELECT doc_id, status, cluster_id, is_canonical,
                   CASE WHEN status != 'ok' THEN status
                        WHEN is_canonical THEN 'unique'
                        ELSE 'duplicate' END AS disposition
            FROM cl
        """,
        "summary_metrics": f"""
            WITH RECURSIVE {_dedup_cte()},
            edges AS (
              SELECT a, b FROM exact_edges
              UNION
              SELECT a, b FROM mh_pairs
            ),
            {_closure_cte()},
            cl AS (
              SELECT d.doc_id,
                     ({_STATUS_SQL}) AS status,
                     coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                     (coalesce(l.cluster_id, d.doc_id) = d.doc_id)
                       AS is_canonical
              FROM documents d
              LEFT JOIN labels l ON l.doc_id = d.doc_id
            )
            SELECT count(*) AS total_docs,
                   CAST(sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END)
                     AS BIGINT) AS ok_docs,
                   CAST(sum(CASE WHEN status = 'empty' THEN 1 ELSE 0 END)
                     AS BIGINT) AS empty_docs,
                   CAST(sum(CASE WHEN status = 'corrupted' THEN 1 ELSE 0 END)
                     AS BIGINT) AS corrupted_docs,
                   CAST(sum(CASE WHEN status = 'low_quality' THEN 1 ELSE 0 END)
                     AS BIGINT) AS low_quality_docs,
                   CAST(sum(CASE WHEN status = 'ok' AND NOT is_canonical
                            THEN 1 ELSE 0 END) AS BIGINT) AS duplicate_docs,
                   count(DISTINCT cluster_id) AS n_clusters
            FROM cl
        """,
        # simhash_near_pairs: recompute every matchable doc's 64-bit
        # SimHash from scratch in SQL (_simhash_cte) and take the
        # exhaustive hamming ≤ h pair set — the engine's pigeonhole
        # block-LSH with all-pairs caps returns exactly this set.
        "simhash_near_pairs": f"""
            WITH {_simhash_cte()}
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming,
                   'simhash' AS method
            FROM simfp x JOIN simfp y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.fp, y.fp))
                    <= {CFG.simhash_hamming_threshold}
        """,
        # media_features: regenerate the synthetic payloads (two md5 hex
        # digests per row), re-derive the digest-based fake features
        # (float32-quantized dyadic rationals), and recompute the scalar
        # summary.  Every step is engine-portable: DuckDB's md5/float32
        # cast/round-half-away-from-zero match hashlib/numpy/Spark.
        "media_features": """
            WITH ids AS (
              SELECT CAST(range AS BIGINT) AS media_id FROM range(0, 200)
            ), srcs AS (
              SELECT media_id,
                     CASE WHEN media_id % 5 = 0 AND media_id > 0
                          THEN media_id - 1 ELSE media_id END AS src
              FROM ids
            ), pay AS (
              SELECT media_id,
                     md5('media:42:' || src || ':0')
                       || md5('media:42:' || src || ':1') AS payload_hex
              FROM srcs
            ), seeds AS (
              SELECT media_id, md5(payload_hex) AS h0 FROM pay
            ), comps AS (
              SELECT s.media_id,
                     blk.range * 4 + j.range AS idx,
                     CAST(CAST(
                       CAST(CAST(
                         '0x' || substr(md5(s.h0 || ':' || blk.range),
                                        CAST(j.range * 8 + 1 AS INT), 8)
                       AS UBIGINT) AS DOUBLE) / 2147483648.0 - 1.0
                     AS FLOAT) AS DOUBLE) AS c
              FROM seeds s, range(0, 8) blk, range(0, 4) j
            ), agg AS (
              SELECT media_id,
                     sqrt(sum(c * c)) AS norm,
                     max(CASE WHEN idx = 0 THEN c END) AS c0,
                     max(CASE WHEN idx = 1 THEN c END) AS c1,
                     CAST(sum((idx + 1)
                              * CAST(round(c * 100000.0) AS BIGINT))
                       AS BIGINT) AS fp
              FROM comps GROUP BY media_id
            )
            SELECT media_id,
                   round(norm, 5) AS feature_norm,
                   round(c0, 5) AS f0,
                   round(c1, 5) AS f1,
                   fp AS feature_fp
            FROM agg
        """,
        # dedup_clusters_chained: regenerate the stress corpus with
        # DuckDB expressions (same f-string arithmetic as _stress_rows),
        # take the EXHAUSTIVE shingle-Jaccard >= θ edge set, and close
        # it transitively — the engine's chained/salted candidate graph
        # must yield identical components.
        "dedup_clusters_chained": f"""
            WITH RECURSIVE gdocs AS (
              SELECT CAST(2000000 + i AS BIGINT) AS doc_id,
                     CASE WHEN i < {_STRESS_GROUP_SIZES[0]}
                            THEN '{_stress_body(0)}'
                          WHEN i < {sum(_STRESS_GROUP_SIZES[:2])}
                            THEN '{_stress_body(1)}'
                          WHEN i < {sum(_STRESS_GROUP_SIZES[:3])}
                            THEN '{_stress_body(2)}'
                          ELSE '{_stress_body(3)}'
                     END || ' v' || i AS text
              FROM (SELECT unnest(generate_series(0,
                     {sum(_STRESS_GROUP_SIZES) - 1})) AS i)
            ),
            fdocs AS (
              SELECT CAST(3000000 + j AS BIGINT) AS doc_id,
                     'filler ' || j || ' document ' || (j*7+1)
                       || ' about ' || (j*13+2) || ' subject ' || (j*29+3)
                       || ' content ' || (j*31+4) || ' tokens ' || (j*37+5)
                       || ' end' AS text
              FROM (SELECT unnest(generate_series(0, 39)) AS j)
            ),
            sdocs AS (
              SELECT * FROM gdocs UNION ALL SELECT * FROM fdocs
            ),
            ssh AS (
              SELECT DISTINCT doc_id,
                     substring(text, i, {CFG.shingle_k}) AS s
              FROM (
                SELECT doc_id, text,
                       unnest(generate_series(1,
                         len(text) - {CFG.shingle_k} + 1)) AS i
                FROM sdocs
              )
            ),
            ssizes AS (SELECT doc_id, count(*) AS n FROM ssh GROUP BY doc_id),
            sinter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM ssh x JOIN ssh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT a, b FROM sinter
              JOIN ssizes sa ON sa.doc_id = a
              JOIN ssizes sb ON sb.doc_id = b
              WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i)
                    >= {CFG.jaccard_threshold}
            ),
            {_closure_cte()}
            SELECT d.doc_id,
                   coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                   (coalesce(l.cluster_id, d.doc_id) = d.doc_id)
                     AS is_canonical
            FROM sdocs d LEFT JOIN labels l ON l.doc_id = d.doc_id
        """,
        "lineage_stats": f"""
            WITH {_dedup_cte()}
            SELECT 'docs_normalized' AS stage,
                   CAST(count(*) AS BIGINT) AS rows_in FROM documents
            UNION ALL
            SELECT 'dup_pairs' AS stage,
                   CAST((SELECT count(*) FROM mh_pairs)
                        + (SELECT count(*) FROM exact_edges) AS BIGINT)
            UNION ALL
            SELECT 'signatures' AS stage,
                   CAST((SELECT count(*) FROM reps) AS BIGINT)
            ORDER BY stage
        """,
        "incremental_batch_ledger": """
            SELECT CAST(k + 1 AS BIGINT) AS batch_seq,
                   CAST((SELECT count(*) FROM documents
                         WHERE text IS NOT NULL AND doc_id % 3 = k)
                     AS BIGINT) AS n_new_sigs
            FROM (SELECT unnest(generate_series(0, 2)) AS k)
            ORDER BY batch_seq
        """,
        # long_span_pairs_winnowed: the planted truth — the corpus is
        # constructed (see _span_rows) so the exact long-span pair set
        # is every within-group pair with span_len exactly
        # 260 + 7*g; the engine must recover ALL of them under
        # production winnowing (and nothing else: verification is
        # exact LCS, fillers share no window).
        "long_span_pairs_winnowed": f"""
            SELECT CAST({_SPAN_BASE_ID} + g*{_SPAN_MEMBERS} + j1 AS BIGINT) AS a,
                   CAST({_SPAN_BASE_ID} + g*{_SPAN_MEMBERS} + j2 AS BIGINT) AS b,
                   CAST(260 + 7*g AS INT) AS span_len,
                   'suffix' AS method
            FROM (SELECT unnest(generate_series(0, {_SPAN_GROUPS - 1})) AS g),
                 (SELECT unnest(generate_series(0, {_SPAN_MEMBERS - 1})) AS j1),
                 (SELECT unnest(generate_series(0, {_SPAN_MEMBERS - 1})) AS j2)
            WHERE j1 < j2
            ORDER BY a, b
        """,
        "ann_topk": """
            WITH scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                  AS cos_raw
              FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
              WHERE q.vec_id < 16
            ), ranked AS (
              SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
                row_number() OVER (
                  PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC
                ) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, cosine, rank
            FROM ranked WHERE rank <= 5
        """,
    }

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship near-duplicate clustering on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB twins for every SQL-expressible query;
pipeline/LSH/CC queries that SQL cannot express are rows-only checks.

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


# ------------------------- rows-only queries (non-SQL-expressible) ------

def q_minhash_dup_pairs(spark, sf_dir):
    """Full LSH pipeline verified dup pairs (MinHash → bands → exact
    Jaccard).  Iterative/UDF-based — no SQL twin; driver rows-check."""
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    res = run_pipeline(docs, CFG, input_kind="documents")
    return res.dup_pairs.select("a", "b", F.round("jaccard", 6).alias("jaccard"), "method")


def q_dedup_clusters(spark, sf_dir):
    """Flagship: full pipeline connected-component clusters."""
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    res = run_pipeline(docs, CFG, input_kind="documents")
    return res.clusters.select("doc_id", "status", "cluster_id", "is_canonical")


def q_simhash_near_pairs(spark, sf_dir):
    """SimHash Hamming ≤ h near-dup pairs over LSH candidates."""
    from face_duplicate_detection_spark.functions.normalize import (
        matchable_docs,
        normalize_documents,
    )
    from face_duplicate_detection_spark.operators.lsh import (
        candidate_pairs,
        explode_buckets,
    )
    from face_duplicate_detection_spark.operators.signatures import (
        compute_signatures,
    )
    from face_duplicate_detection_spark.operators.verify import simhash_near_pairs

    docs = matchable_docs(
        normalize_documents(_docs(spark, sf_dir).select("doc_id", "text"), CFG)
    )
    sigs = compute_signatures(docs, CFG)
    cand = candidate_pairs(explode_buckets(sigs), CFG)
    return simhash_near_pairs(cand, sigs, CFG)


def q_long_span_pairs(spark, sf_dir):
    """Suffix stage: exact long-span (LCS ≥ 200) duplicate pairs."""
    from face_duplicate_detection_spark.functions.normalize import (
        matchable_docs,
        normalize_documents,
    )
    from face_duplicate_detection_spark.operators.suffix_spans import long_span_pairs

    docs = matchable_docs(
        normalize_documents(_docs(spark, sf_dir).select("doc_id", "text"), CFG)
    )
    return long_span_pairs(docs, CFG.with_(span_min_len=200), winnow=False)


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


def q_incremental_dedup(spark, sf_dir):
    """B2 cross-batch carried state: two incremental batches produce
    the same clusters as one full run (returns the final state)."""
    import tempfile

    from face_duplicate_detection_spark.catalog import StageCatalog
    from face_duplicate_detection_spark.streaming.incremental import (
        incremental_batch,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )
    with tempfile.TemporaryDirectory() as d:
        cat = StageCatalog(d)
        incremental_batch(docs.filter(F.col("doc_id") % 2 == 0), CFG, cat, spark)
        out = incremental_batch(docs.filter(F.col("doc_id") % 2 == 1), CFG, cat, spark)
        out = out.orderBy("doc_id")
        out.cache().count()  # materialize before the tmpdir vanishes
        return out


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
        "lineitem_pricing": q_lineitem_pricing,
        "ann_topk": q_ann_topk,
        # rows-only (non-SQL-expressible: UDF signatures / iteration)
        "minhash_dup_pairs": q_minhash_dup_pairs,
        "dedup_clusters": q_dedup_clusters,
        "simhash_near_pairs": q_simhash_near_pairs,
        "long_span_pairs": q_long_span_pairs,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "media_features": q_media_features,
        "incremental_dedup": q_incremental_dedup,
    }


# ---------------------------------------------------------------- oracles

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

"""spark-submit entry point.

The production launch shape required by BASELINE.json north_rule::

    python tools/make_pyfiles_zip.py                 # build dedup.zip
    spark-submit --py-files dedup.zip main.py \
        --input  /path/to/pages_or_documents \
        --output /path/to/stage_tables \
        --input-kind documents --stage all [--resume]

Replaces the reference's shell orchestrator
(``/root/reference/run_program.sh:13-35`` — two opaque Python
programs, fail-fast exit 1): stages here are DataFrame jobs sharing
one SparkSession, inter-stage data flows through committed catalog
tables, and ``--resume`` skips committed stages (SURVEY.md §2.11 O1).
Non-zero exit propagates on any stage failure, same fail-fast
contract.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description="near-duplicate detection pipeline")
    p.add_argument("--input", required=True, help="pages/documents table path")
    p.add_argument("--output", required=True, help="stage-catalog directory")
    p.add_argument(
        "--input-kind", choices=["pages", "documents"], default="documents"
    )
    p.add_argument("--stage", default="all", help="all | clusters | pairs")
    p.add_argument(
        "--resume",
        action="store_true",
        help="reuse committed stage tables in --output",
    )
    p.add_argument("--shingle-k", type=int, default=8)
    p.add_argument("--num-perms", type=int, default=128)
    p.add_argument("--num-bands", type=int, default=32)
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--master", default=None, help="override spark master")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv or sys.argv[1:])

    from face_duplicate_detection_spark.catalog import StageCatalog
    from face_duplicate_detection_spark.config import DedupConfig
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline
    from face_duplicate_detection_spark.session import get_spark

    cfg = DedupConfig(
        shingle_k=args.shingle_k,
        num_perms=args.num_perms,
        num_bands=args.num_bands,
        jaccard_threshold=args.jaccard_threshold,
    )
    spark = get_spark(app_name="fdds-pipeline", master=args.master)
    catalog = StageCatalog(args.output)
    if not args.resume:
        for t in [
            "docs_normalized",
            "exact_base",
            "signatures",
            "candidate_pairs",
            "dup_pairs",
            "clusters",
        ]:
            catalog.invalidate(t)

    docs = spark.read.parquet(args.input)
    t0 = time.time()
    res = run_pipeline(
        docs, cfg, input_kind=args.input_kind, catalog=catalog, spark=spark
    )
    if args.stage in ("all", "clusters"):
        n = res.clusters.count()
    else:
        n = res.dup_pairs.count()
    summary = {
        "stage": args.stage,
        "rows": n,
        "wall_sec": round(time.time() - t0, 2),
        "dup_pairs": res.dup_pairs.count(),
        "output": args.output,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

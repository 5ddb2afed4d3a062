"""Per-stage scaling attribution (VERDICT r3 next-round #2).

Runs each pipeline stage separately at local[LO] and local[HI] in
fresh subprocesses (cold JVM each) on a scaling corpus and prints a
per-stage efficiency table — the r3 table predated the uint32 MinHash
kernel and the de-banded mega salt; this reproduces it on the current
tree so the residual non-scaling cost can be named.

Usage: python tools/stage_scaling.py [n_docs] [lo] [hi]

Set ``SPARK_GRAFT_PIN=1`` to confine each measurement's WHOLE process
tree (JVM task/GC/shuffle threads + Python workers) to exactly lo/hi
cores via ``taskset`` — the faithful emulation of an N-core executor;
unpinned, the lo side borrows spare host cores for auxiliary threads
and the measured efficiency understates the engine (see bench.py).
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 2
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 8

STAGE_CODE = """
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from face_duplicate_detection_spark.config import DedupConfig
from face_duplicate_detection_spark.session import get_spark
from face_duplicate_detection_spark.functions.normalize import (
    matchable_docs, normalize_documents)
from face_duplicate_detection_spark.operators.exact_dedup import (
    exact_dup_edges, exact_representatives)
from face_duplicate_detection_spark.operators.signatures import compute_signatures
from face_duplicate_detection_spark.operators.lsh import (
    candidate_pairs, explode_buckets)
from face_duplicate_detection_spark.operators.verify import verify_pairs
from face_duplicate_detection_spark.operators.connected_components import (
    assign_clusters, connected_components)

cfg = DedupConfig().with_(store_shingles={store!r})
spark = get_spark(app_name="stage-scale", master={master!r},
                  shuffle_partitions={shuffle},
                  extra_conf={{"spark.driver.memory": "16g",
                  "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"}})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({corpus!r}).select("doc_id", "text")

# JVM-side GC + heap probes: stop-the-world GC is the canonical
# "hidden serial component" hypothesis for why efficiency degrades as
# the corpus grows under a FIXED heap — every task thread pauses
# together, so GC seconds act like Amdahl serial time.
_mf = spark._jvm.java.lang.management.ManagementFactory
_rt = spark._jvm.java.lang.Runtime.getRuntime()
def gc_ms():
    beans = _mf.getGarbageCollectorMXBeans()
    # -1 = collector without time tracking (ADVICE r4): clamp to 0
    return sum(max(0, beans.get(i).getCollectionTime())
               for i in range(beans.size()))
def heap_gb():
    return round((_rt.totalMemory() - _rt.freeMemory()) / 1e9, 2)
# warm-up
warm = docs.filter(docs.doc_id % 10 == 3).limit(64 * {shuffle})
wn = matchable_docs(normalize_documents(warm, cfg)).cache(); wn.count()
ws = compute_signatures(exact_representatives(wn), cfg).cache(); ws.count()
verify_pairs(candidate_pairs(explode_buckets(ws), cfg), ws, cfg,
             docs=exact_representatives(wn)).count()
spark.catalog.clearCache()

t = {{}}
g = {{}}
h = {{}}
def stage(name, build):
    g0 = gc_ms()
    t0 = time.time()
    out = build()
    t[name] = round(time.time() - t0, 2)
    g[name] = round((gc_ms() - g0) / 1000.0, 2)
    h[name] = heap_gb()
    return out

norm = stage("normalize", lambda: (lambda df: (df.count(), df)[1])(
    matchable_docs(normalize_documents(docs, cfg)).localCheckpoint(eager=True)))
edges_exact = stage("exact_collapse", lambda: (lambda df: (df.count(), df)[1])(
    exact_dup_edges(norm).localCheckpoint(eager=True)))
reps = exact_representatives(norm)
sigs = stage("signatures", lambda: (lambda df: (df.count(), df)[1])(
    compute_signatures(reps, cfg).localCheckpoint(eager=True)))
cand = stage("candidates", lambda: (lambda df: (df.count(), df)[1])(
    candidate_pairs(explode_buckets(sigs), cfg).localCheckpoint(eager=True)))
ver = stage("verify", lambda: (lambda df: (df.count(), df)[1])(
    verify_pairs(cand, sigs, cfg, docs=reps).localCheckpoint(eager=True)))
lab = stage("cc_assign", lambda: (lambda df: (df.count(), df)[1])(
    assign_clusters(norm.select("doc_id"), connected_components(
        ver.select("a", "b").unionByName(edges_exact.select("a", "b"))))))
t["total"] = round(sum(t.values()), 2)
g["total"] = round(sum(g.values()), 2)
print(json.dumps({{"wall": t, "gc_s": g, "heap_gb": h}}))
spark.stop()
"""


PIN = os.environ.get("SPARK_GRAFT_PIN", "0") == "1"
# SPARK_GRAFT_BOUNDED=1 → cfg.store_shingles=False (the 100 TB
# bounded-signature state mode; see bench.py) for the whole run
STORE = os.environ.get("SPARK_GRAFT_BOUNDED", "0") != "1"


def run(master, shuffle, pin_cpus=None):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus = os.path.join("/tmp/fdds_bench", f"scaling_corpus_{N_DOCS}")
    code = STAGE_CODE.format(repo=repo, master=master, shuffle=shuffle,
                             corpus=corpus, store=STORE)
    argv = [sys.executable, "-c", code]
    if pin_cpus is not None:
        argv = ["taskset", "-c", pin_cpus] + argv
    out = subprocess.run(argv, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"stage run failed (master={master})")
    return json.loads(out.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    lo_out = run(f"local[{LO}]", 4 * LO, f"0-{LO - 1}" if PIN else None)
    hi_out = run(f"local[{HI}]", 4 * HI, f"0-{HI - 1}" if PIN else None)
    lo, hi = lo_out["wall"], hi_out["wall"]
    print(f"# per-stage scaling, {N_DOCS} docs, local[{LO}] vs local[{HI}]")
    print("| stage | lo s | hi s | eff | gc lo s | gc hi s | heap lo/hi GB |")
    print("|---|---|---|---|---|---|---|")
    for k in lo:
        eff = (lo[k] / hi[k]) / (HI / LO) if hi[k] else float("nan")
        glo = lo_out["gc_s"].get(k, 0)
        ghi = hi_out["gc_s"].get(k, 0)
        hlo = lo_out["heap_gb"].get(k, "-")
        hhi = hi_out["heap_gb"].get(k, "-")
        print(f"| {k} | {lo[k]} | {hi[k]} | {eff:.2f} | {glo} | {ghi} "
              f"| {hlo}/{hhi} |")
    print(json.dumps({"n_docs": N_DOCS, "lo": lo_out, "hi": hi_out}))

"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "e2e_dedup_wall", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "docs_per_sec": ...}

``--scaling`` mode (north_rule evidence): run the same end-to-end
dedup job at two parallelism levels (local[8] vs local[32]) on
identical input and write docs/sec at both plus scaling efficiency to
``BENCH/BASELINE.md``.  This is the sandbox stand-in for N → 4N
executors (no real cluster available here).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _minhash_dup_pairs_scale(spark, sf_dir):
    """Production-config pair query for the bench: q_minhash_dup_pairs
    switched to all-pairs caps in round 3 so its DuckDB twin is
    provably exhaustive, but the bench keeps timing the DEFAULT
    (capped/chained, skew-safe) candidate path — the same workload
    rounds 1-2 measured, and the one a 10^12-doc run uses."""
    from pyspark.sql import functions as F

    from face_duplicate_detection_spark.config import DedupConfig
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    res = run_pipeline(docs, DedupConfig(), input_kind="documents")
    return res.dup_pairs.select(
        "a", "b", F.round("jaccard", 6).alias("jaccard"), "method"
    )


def _skew_corpus(spark, n_group: int, n_filler: int):
    """Deterministic boilerplate-skew corpus: ONE n_group-doc
    near-identical group (a pathological mega bucket — every band
    bucket holds the whole group) plus unique fillers."""
    body = " ".join(f"sk{0}w{j:02d}" for j in range(40))
    rows = [(i, f"{body} v{i}") for i in range(n_group)]
    rows += [
        (
            1_000_000 + j,
            f"filler {j} document {j * 7 + 1} about {j * 13 + 2} subject "
            f"{j * 29 + 3} content {j * 31 + 4} tokens {j * 37 + 5} end",
        )
        for j in range(n_filler)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _minhash_dup_pairs_skew(spark, sf_dir, n_group: int = 6000):
    """VERDICT r3 next-round #7: track the SALTED mega-bucket path's
    cost round over round, not just its correctness.  The 6000-doc
    boilerplate group exceeds the TRUE default mega_bucket_cap (4096),
    so every band bucket takes the salt → subgroup-chain → forced-
    bridge route; fillers keep the census/anti-join sides honest.
    (sf_dir is ignored: the corpus is its own fixture.)"""
    from face_duplicate_detection_spark.config import DedupConfig
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs = _skew_corpus(spark, n_group, n_group // 6)
    res = run_pipeline(docs, DedupConfig(), input_kind="documents")
    return res.dup_pairs


def _contention_probe(seconds: float = 2.0) -> float:
    """Single-process numpy hash-kernel throughput (iterations/sec) —
    a fixed workload whose speed depends only on what the host gives
    this box right now.  Recorded before and after the query suite so
    round-over-round bench deltas can be adjudicated against host
    contention instead of guessed at (VERDICT r4: the r4 regressions
    on queries with zero code changes were unfalsifiable because the
    bench carried no same-window probe)."""
    import numpy as np

    rng = np.random.default_rng(0)
    x = rng.integers(1, 2**62, size=100_000, dtype=np.uint64)
    a = np.uint64(0x9E3779B97F4A7C15)
    for _ in range(50):  # warm the kernel (first uint64 ops are slow)
        y = x * a + np.uint64(12345)
        y.min()
    n = 0
    t_end = time.time() + seconds
    t0 = time.time()
    while time.time() < t_end:
        for _ in range(20):
            y = x * a + np.uint64(12345)
            y.min()
        n += 20
    return round(n / (time.time() - t0), 1)


def _run_queries(
    spark, sf_dir: str, repeats: int = 3
) -> tuple[dict, dict, int]:
    """Headline queries, best-of-``repeats`` per query; returns
    ({name: best seconds}, {name: median seconds}, docs_count).

    Best-of-N (VERDICT r4 next-round #2): single-shot timings made
    round-over-round deltas unfalsifiable on this contended VM (±30%
    swings on queries with zero code changes).  The best wall is the
    least contaminated estimate; the median is recorded alongside so
    a real regression (best AND median move together) is separable
    from a noisy window (median moves, best holds)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs = dict(
        qs,
        minhash_dup_pairs=_minhash_dup_pairs_scale,
        minhash_dup_pairs_skew=_minhash_dup_pairs_skew,
    )
    headline = [
        "dedup_clusters",        # full pipeline: the product
        "minhash_dup_pairs",     # pipeline to verified pairs
        "minhash_dup_pairs_skew",  # salted mega-bucket path
        "exact_dup_clusters",
        "token_stats",
        "shingle_jaccard_pairs",
        "ann_topk",
        "ann_topk_large",        # IVF cell-partitioned ANN (scale plan)
        "long_span_pairs",
        "lineitem_pricing",
    ]
    import gc

    timings, medians = {}, {}
    for name in headline:
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            runs.append(time.time() - t0)
            # drop refs to this run's localCheckpoint RDDs so repeats
            # don't accumulate block-manager state run over run
            df = None
            gc.collect()
        runs.sort()
        timings[name] = round(runs[0], 3)
        medians[name] = round(runs[len(runs) // 2], 3)
        print(
            f"  {name}: best {timings[name]}s / median {medians[name]}s"
            f" ({n} rows, {repeats} runs)",
            file=sys.stderr,
        )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    return timings, medians, docs


def _e2e_dedup_seconds(
    master: str, parquet_path: str, shuffle: int, pin_cpus: str | None = None
) -> tuple[float, int]:
    """One cold end-to-end dedup run in a FRESH subprocess.

    A subprocess per measurement matters twice over: (a) the first
    SparkSession in a Python process fixes the JVM -Xmx for every
    later session, so per-run memory settings silently wouldn't apply;
    (b) each config gets an honest cold JVM instead of inheriting the
    previous run's grown heap and JIT state.

    ``pin_cpus`` (e.g. ``"0-1"``) wraps the run in ``taskset -c``,
    confining the WHOLE process tree — JVM task threads, GC, shuffle
    IO, codegen, and the Python workers — to that core set.  Without
    it, ``local[N]`` means N *task slots* while every auxiliary thread
    runs on spare host cores for free, so the lo side of an N→4N
    comparison gets proportionally more hidden extra compute than the
    hi side and the measured efficiency UNDERSTATES the engine.  A
    real N-core executor confines all of those threads to N cores —
    pinning is the faithful cluster emulation.
    """
    import subprocess

    mem = os.environ.get("SPARK_GRAFT_BENCH_MEM", "16g")
    # bounded-signature mode (cfg.store_shingles=False): the documented
    # 100 TB state configuration — the signatures checkpoint carries
    # only minhash/simhash/bands (O(docs·perms)) instead of the full
    # shingle arrays (O(total text)).  Measured round-4 diagnosis
    # (BENCH/BASELINE.md, raw legs in BENCH/ab_runs.jsonl): the fat
    # arrays (~2.8 KB/doc) dominate shuffle/checkpoint BYTE TRAFFIC and
    # saturate the shared memory bus at 8 cores — bounded mode cut the
    # 4M-doc local[8] wall 976.8 → 637.4 s.  The GC hypothesis was
    # refuted in the same runs: in-run MXBean probes put stop-the-world
    # GC at ~3% of wall in both modes.  Bounded pays one extra
    # candidate-only Arrow pass at verify time.
    bounded = os.environ.get("SPARK_GRAFT_BOUNDED", "0") == "1"
    # census-input materialization A/B (config.checkpoint_buckets)
    ckpt_buckets = os.environ.get("SPARK_GRAFT_CKPT_BUCKETS", "0") == "1"
    code = f"""
import sys, time, json
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from face_duplicate_detection_spark.config import DedupConfig
from face_duplicate_detection_spark.plans.pipeline import run_pipeline
from face_duplicate_detection_spark.session import get_spark
# 16 MB advisory partitions: AQE otherwise coalesces the fat candidate
# shuffles to fewer partitions than cores (serial tails) — measured
# 118.5s -> 106.3s at local[8] on the 800k corpus, local[2] unchanged
spark = get_spark(app_name="bench-{master}", master={master!r},
                  shuffle_partitions={shuffle},
                  extra_conf={{"spark.driver.memory": {mem!r},
                  "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"}})
spark.sparkContext.setLogLevel("ERROR")
cfg = DedupConfig().with_(store_shingles={(not bounded)!r},
                          checkpoint_buckets={ckpt_buckets!r})
# GC probe: stop-the-world collections pause every task thread at
# once, so JVM GC seconds behave like Amdahl serial time — recording
# them per run lets a campaign attribute efficiency loss to heap
# pressure (fat signature state under a fixed heap) vs the plan.
_mf = spark._jvm.java.lang.management.ManagementFactory
def _gc_ms():
    beans = _mf.getGarbageCollectorMXBeans()
    # getCollectionTime() is -1 for collectors without time tracking
    # (ADVICE r4) — clamp so one such bean can't understate the sum
    return sum(max(0, beans.get(i).getCollectionTime())
               for i in range(beans.size()))
docs = spark.read.parquet({parquet_path!r}).select("doc_id", "text")
n_docs = docs.count()
# warm-up (excluded from timing): grows the heap, spins every Python
# worker, JITs the shuffle paths — 10% slice or 64 docs/core
warm_n = max(64 * {shuffle}, n_docs // 10)
run_pipeline(docs.filter(docs.doc_id % 10 == 3).limit(warm_n),
             cfg, input_kind="documents").clusters.count()
spark.catalog.clearCache()
g0 = _gc_ms()
t0 = time.time()
stages = {{}}
res = run_pipeline(docs, cfg, input_kind="documents", timings=stages)
res.clusters.count()
wall = time.time() - t0
# everything not inside an eagerly-materialized stage (normalize
# compute folded into downstream scans, CC rounds, final assign)
stages["cc_tail"] = round(wall - sum(stages.values()), 2)
print(json.dumps({{"wall": wall, "n_docs": n_docs,
                   "gc_s": round((_gc_ms() - g0) / 1000.0, 1),
                   "stages": stages}}))
spark.stop()
"""
    argv = [sys.executable, "-c", code]
    if pin_cpus is not None:
        argv = ["taskset", "-c", pin_cpus] + argv
    out = subprocess.run(argv, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"e2e run failed (master={master})")
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    return payload


def _synthesize_scaling_corpus(n_docs: int, out_dir: str) -> str:
    """Deterministic synthetic corpus big enough that compute (not
    fixed job overhead) dominates — the honest way to measure the
    N→4N parallelism ratio on one box."""
    from face_duplicate_detection_spark.session import get_spark
    from face_duplicate_detection_spark.sources.pages import synthesize_pages

    path = os.path.join(out_dir, f"scaling_corpus_{n_docs}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    spark = get_spark(app_name="bench-synth", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    pages = synthesize_pages(spark, n_docs, seed=42, partitions=64)
    pages.select("doc_id", "text").write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def main_bench():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from face_duplicate_detection_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up (excluded): run every headline query shape once at the
    # smallest SF — spins Python workers, compiles each query's
    # whole-stage codegen and JITs it, so timings measure the engine,
    # not process/compiler startup
    import __spark_entry__ as entrymod

    warm_qs = dict(entrymod.queries(), minhash_dup_pairs=_minhash_dup_pairs_scale)
    for name in [
        "dedup_clusters", "minhash_dup_pairs", "exact_dup_clusters",
        "token_stats", "shingle_jaccard_pairs", "ann_topk",
        "ann_topk_large", "long_span_pairs", "lineitem_pricing",
    ]:
        warm_qs[name](spark, "/root/testdata/sf0.001").count()
    # warm the skew path's shapes at a sub-mega size
    _minhash_dup_pairs_skew(spark, "/root/testdata/sf0.001", n_group=300).count()
    spark.catalog.clearCache()
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    probe_pre = _contention_probe()
    t0 = time.time()
    timings, medians, n_docs = _run_queries(spark, sf_dir, repeats=repeats)
    total = round(time.time() - t0, 3)
    probe_post = _contention_probe()
    e2e = timings.get("dedup_clusters", total)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "e2e_dedup_wall",
                "value": e2e,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "repeats": repeats,
                # same-window host-speed probe (iterations/sec of a
                # fixed single-proc numpy kernel): compare across
                # rounds before attributing query deltas to the code
                "probe_ips_pre": probe_pre,
                "probe_ips_post": probe_post,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "total_sec": total,
                "n_docs": n_docs,
                "docs_per_sec": round(n_docs / max(e2e, 1e-9), 1),
            }
        )
    )
    spark.stop()


def _calibrate_cpu_scaling(lo: int, hi: int, pin: bool = False) -> dict:
    """Measure what the sandbox hardware itself gives pure
    embarrassingly-parallel numpy work at both process counts.

    This VM advertises 32 vCPUs but measured aggregate throughput of
    cache-resident compute tops out near ~8 concurrent workers (host
    core overcommit): 1→8 procs scale ~1.0, 8→32 only ~0.6.  The
    calibration quantifies the achievable ceiling so the engine's
    efficiency is judged against the machine, not against vCPU count.
    """
    import subprocess

    code = (
        "import numpy as np, time\n"
        "rng = np.random.default_rng(0)\n"
        "x = rng.integers(1, 2**62, size=100_000, dtype=np.uint64)\n"
        "a = np.uint64(0x9E3779B97F4A7C15)\n"
        "for _ in range(50):\n"
        "    y = x * a + np.uint64(12345); m = y.min()\n"  # warm-up
        "t_end = time.time() + 10\n"
        "n = 0\n"
        "while time.time() < t_end:\n"
        "    for _ in range(20):\n"
        "        y = x * a + np.uint64(12345); m = y.min()\n"
        "    n += 1\n"
        "print(n)\n"
    )
    out = {}
    for procs in (lo, hi):
        ps = []
        for i in range(procs):
            argv = [sys.executable, "-c", code]
            if pin:
                # one worker per core, same sets the engine runs on
                argv = ["taskset", "-c", str(i)] + argv
            ps.append(subprocess.Popen(argv, stdout=subprocess.PIPE))
        out[procs] = sum(int(p.communicate()[0]) for p in ps)
    return out


def main_scaling():
    n_docs_target = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "200000"))
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    lo_cores = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "2"))
    hi_cores = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "8"))
    pin = os.environ.get("SPARK_GRAFT_PIN", "0") == "1"
    pin_lo = f"0-{lo_cores - 1}" if pin else None
    pin_hi = f"0-{hi_cores - 1}" if pin else None
    corpus = _synthesize_scaling_corpus(n_docs_target, "/tmp/fdds_bench")
    # best-of-N with PER-REPEAT calibration: the sandbox host shows
    # contention bursts that swing identical runs ±30%, so each repeat
    # records what the hardware gave pure parallel numpy in the same
    # window; min wall is the least contaminated estimate and the max
    # calibration is the window ceiling
    walls_lo, walls_hi, calibs, gcs_lo, gcs_hi = [], [], [], [], []
    stages_lo, stages_hi = [], []
    for _ in range(repeats):
        c = _calibrate_cpu_scaling(lo_cores, hi_cores, pin=pin)
        # clamp: a >1.0 "ceiling" means the lo-proc calibration itself
        # was contaminated by a contention burst — not a real ceiling
        calibs.append(
            min(1.0, (c[hi_cores] / c[lo_cores]) / (hi_cores / lo_cores))
        )
        # shuffle partitions: at least 4× cores (finer granularity
        # smooths per-partition stragglers; AQE coalesces the excess)
        # AND at most ~100k docs per partition — at 8M docs a 32-way
        # shuffle put ~250k docs of pair+shingle traffic in each task
        # and 8 concurrent tasks OOMed even a 48 GB heap.  Above the
        # core floor both legs get the SAME partition count, i.e.
        # identical plans, so the ratio measures cores, not plans.
        def _shuffle(cores: int) -> int:
            return max(4 * cores, n_docs_target // 100_000)

        p = _e2e_dedup_seconds(
            f"local[{lo_cores}]", corpus, _shuffle(lo_cores), pin_cpus=pin_lo
        )
        n_docs = p["n_docs"]
        walls_lo.append(p["wall"])
        gcs_lo.append(p.get("gc_s", -1.0))
        stages_lo.append(p.get("stages", {}))
        p = _e2e_dedup_seconds(
            f"local[{hi_cores}]", corpus, _shuffle(hi_cores), pin_cpus=pin_hi
        )
        walls_hi.append(p["wall"])
        gcs_hi.append(p.get("gc_s", -1.0))
        stages_hi.append(p.get("stages", {}))
    wall_lo, wall_hi = min(walls_lo), min(walls_hi)
    calib_eff = max(calibs)
    tp_lo = n_docs / wall_lo
    tp_hi = n_docs / wall_hi
    # efficiency of the N→4N scale-up: speedup / core-ratio; also
    # normalized against what the hardware gave pure parallel compute
    # during this same window (host contention varies by the minute)
    eff = (wall_lo / wall_hi) / (hi_cores / lo_cores)
    eff_norm = eff / max(calib_eff, 1e-9)
    os.makedirs("BENCH", exist_ok=True)
    # every campaign appends its raw result here; BASELINE.md is the
    # curated narrative (overwritten only on explicit request, since
    # it carries hand-written per-round analysis)
    with open("BENCH/campaigns.jsonl", "a") as f:
        f.write(json.dumps({
            "n_docs": n_docs, "lo_cores": lo_cores, "hi_cores": hi_cores,
            "pin": pin,
            "bounded": os.environ.get("SPARK_GRAFT_BOUNDED", "0") == "1",
            "mem": os.environ.get("SPARK_GRAFT_BENCH_MEM", "16g"),
            "walls_lo": [round(w, 2) for w in walls_lo],
            "walls_hi": [round(w, 2) for w in walls_hi],
            "gcs_lo": gcs_lo, "gcs_hi": gcs_hi,
            "stages_lo": stages_lo, "stages_hi": stages_hi,
            "calibs": [round(c, 3) for c in calibs],
            "eff": round(eff, 3), "eff_norm": round(eff_norm, 3),
            "docs_per_sec_hi": round(tp_hi, 1),
        }) + "\n")
    if os.environ.get("SPARK_GRAFT_WRITE_BASELINE", "0") != "1":
        _print_scaling(lo_cores, hi_cores, wall_lo, wall_hi, tp_lo, tp_hi,
                       calib_eff, eff, eff_norm, corpus)
        return
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — measured numbers

End-to-end dedup (normalize → signatures → LSH → verify → connected
components) on a deterministic synthetic web-text corpus
({n_docs} docs, seed=42, planted duplicate structure per FIXTURES.md),
single machine, identical input at two parallelism levels (sandbox
stand-in for N → 4N executors per BASELINE.json north_rule).

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[{lo_cores}] | {wall_lo:.2f} | {tp_lo:.0f} |
| local[{hi_cores}] | {wall_hi:.2f} | {tp_hi:.0f} |

**Scaling efficiency ({lo_cores}→{hi_cores} cores, ×{hi_cores//lo_cores}):
{eff:.3f}** (target ≥ 0.8 → {"MET" if eff >= 0.8 else "NOT MET"});
normalized to the hardware ceiling measured in the same window
(below): **{eff_norm:.3f}**.
All walls (best taken): local[{lo_cores}] = {[round(w,1) for w in walls_lo]},
local[{hi_cores}] = {[round(w,1) for w in walls_hi]} — single-tenant-VM
contention makes single runs vary ±30%, hence best-of-N.

## Hardware calibration (why N={lo_cores} → 4N={hi_cores})

Pure embarrassingly-parallel numpy compute (cache-resident, no Spark,
no shuffles, one process per worker) measured BEFORE EACH repeat in
the same windows as the engine runs: per-repeat ceilings =
{[round(c, 3) for c in calibs]}.

Hardware ceiling for {lo_cores}→{hi_cores} processes (best window):
**{calib_eff:.3f}**.
The VM advertises 32 vCPUs but aggregate throughput saturates near ~8
concurrent workers (host core overcommit: measured 8→32 procs gives
only ~2.4× for pure compute and ~1.9× for memory-streaming work), so
8→32 cannot express a ×4 scale-up for ANY workload here.  The N→4N
evidence therefore uses {lo_cores}→{hi_cores} cores — the widest ratio
the hardware can actually express; on a real multi-executor cluster
N→4N maps to executor counts, where these shuffle-partitioned jobs
scale by design (explicit repartitioning, AQE, skew-safe candidate
generation — see README scale design).

Methodology: bench.py --scaling synthesizes the corpus once, then runs
the identical job in fresh subprocesses (one cold JVM per measurement,
best-of-N repeats), warm-up excluded from timing.
CPU pinning: {"ON — each run's WHOLE process tree (JVM task/GC/shuffle/codegen threads + Python workers) is confined with taskset to exactly its core budget (lo=" + str(pin_lo) + ", hi=" + str(pin_hi) + "), the faithful emulation of an N-core executor; unpinned local[N] gives the lo side proportionally more hidden auxiliary-thread compute and understates scaling" if pin else "OFF — local[N] bounds task slots only; auxiliary JVM threads run on spare host cores"}.
"""
        )
    _print_scaling(lo_cores, hi_cores, wall_lo, wall_hi, tp_lo, tp_hi,
                   calib_eff, eff, eff_norm, corpus)


def _print_scaling(lo_cores, hi_cores, wall_lo, wall_hi, tp_lo, tp_hi,
                   calib_eff, eff, eff_norm, corpus):
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "queries": {
                    f"local[{lo_cores}]_sec": round(wall_lo, 2),
                    f"local[{hi_cores}]_sec": round(wall_hi, 2),
                    f"docs_per_sec_{lo_cores}": round(tp_lo, 1),
                    f"docs_per_sec_{hi_cores}": round(tp_hi, 1),
                    "hardware_ceiling": round(calib_eff, 3),
                    "efficiency_normalized": round(eff_norm, 3),
                },
                "sf": corpus,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    else:
        main_bench()

"""Round-6 optimization harness (bench.py is FROZEN for measurement —
this file exists so individual queries can be isolated, timed against
a noop sink per the optimization guide §1.4, and their formatted plans
captured, without touching the driver-timed bench).

Usage:
    python bench_extra.py time  <sf_dir> <query> [query ...]   # count() timing, best-of-3
    python bench_extra.py noop  <sf_dir> <query> [query ...]   # noop-sink timing, best-of-3
    python bench_extra.py plan  <sf_dir> <out_dir> <suffix> <query> [query ...]
                                      # write <out_dir>/<query>_<suffix>.txt explain("formatted")

Timing methodology matches bench.py: warm session on
local[$SPARK_GRAFT_CPUS], shuffle partitions = cpu count, one warm-up
run at sf0.001 per query shape, then best/median of N repeats.
"""

from __future__ import annotations

import contextlib
import gc
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark():
    from face_duplicate_detection_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _queries():
    import __spark_entry__ as entrymod
    import bench as benchmod

    qs = dict(
        entrymod.queries(),
        minhash_dup_pairs=benchmod._minhash_dup_pairs_scale,
        minhash_dup_pairs_skew=benchmod._minhash_dup_pairs_skew,
    )
    return qs


def _time(sf_dir: str, names: list[str], sink: str) -> None:
    spark = _spark()
    qs = _queries()
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        df = qs[name](spark, "/root/testdata/sf0.001")
        if sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        spark.catalog.clearCache()
        runs = []
        n = None
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}[{i}]")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                n = df.count()
            runs.append(round(time.time() - t0, 3))
            df = None
            gc.collect()
        srt = sorted(runs)
        out[name] = {
            "best": srt[0],
            "median": srt[len(srt) // 2],
            "runs": runs,
            "rows": n,
        }
        print(f"  {name}: best {srt[0]}s median {srt[len(srt)//2]}s "
              f"runs={runs} rows={n}", file=sys.stderr)
    print(json.dumps({"sink": sink, "sf_dir": sf_dir, "timings": out}))
    spark.stop()


def _plan(sf_dir: str, out_dir: str, suffix: str, names: list[str]) -> None:
    spark = _spark()
    qs = _queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} — explain('formatted')\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode in ("time", "noop"):
        _time(sys.argv[2], sys.argv[3:], "noop" if mode == "noop" else "count")
    elif mode == "plan":
        _plan(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5:])
    else:
        raise SystemExit(f"unknown mode {mode}")

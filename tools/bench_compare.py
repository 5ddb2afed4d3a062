"""Adjudicate round-over-round driver-bench deltas.

Usage: python tools/bench_compare.py BENCH_r04.json BENCH_r05.json

Prints a per-query table of old vs new wall and the delta, plus the
evidence columns that make a delta adjudicable (VERDICT r4 "what's
wrong" #1): the new file's median (a regression is real only when
best AND median move together) and the host-speed probes recorded in
the same window.  Older files from before best-of-N carry single-shot
walls — flagged, since a single-shot number inside a ±30% contention
band cannot convict a plan change by itself.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    d = json.load(open(path))
    # driver-recorded BENCH_r{N}.json wraps bench.py's JSON line in
    # {"parsed": {...}, "tail": ..., ...}; accept either shape
    return d.get("parsed", d)


def main(old_path: str, new_path: str) -> None:
    old = _load(old_path)
    new = _load(new_path)
    old_q, new_q = old.get("queries", {}), new.get("queries", {})
    new_med = new.get("queries_median", {})
    old_kind = f"best-of-{old['repeats']}" if "repeats" in old else "single-shot"
    new_kind = f"best-of-{new['repeats']}" if "repeats" in new else "single-shot"
    print(f"| query | {old_path} ({old_kind}) | {new_path} ({new_kind}) "
          "| Δ best | new median |")
    print("|---|---|---|---|---|")
    for name in sorted(set(old_q) | set(new_q)):
        o, n = old_q.get(name), new_q.get(name)
        if o is None or n is None:
            delta = "new" if o is None else "dropped"
            # `is None` checks, not truthiness: a legitimate 0.0
            # timing must render as 0.0, not '—' (ADVICE r5)
            print(f"| {name} | {'—' if o is None else o} "
                  f"| {'—' if n is None else n} | {delta} | "
                  f"{new_med.get(name, '—')} |")
            continue
        pct = (n - o) / o * 100.0
        print(f"| {name} | {o:.3f}s | {n:.3f}s | {pct:+.0f}% "
              f"| {new_med.get(name, '—')} |")
    for f, d in (("old", old), ("new", new)):
        pre, post = d.get("probe_ips_pre"), d.get("probe_ips_post")
        if pre is not None:
            print(f"{f} window probe (iters/s, higher = quieter host): "
                  f"pre {pre}, post {post}")
        else:
            print(f"{f} file has no host probe (pre-r5 bench) — "
                  "its walls sit in an unmeasured contention window")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(
            "usage: python tools/bench_compare.py OLD_BENCH.json NEW_BENCH.json"
        )
    main(*sys.argv[1:3])

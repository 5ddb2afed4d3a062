"""Render BENCH/campaigns.jsonl as the amortization table for
BENCH/BASELINE.md, with an Amdahl-style decomposition per campaign.

For each campaign the best lo/hi walls solve
    lo = S + W / lo_cores        hi = S + W / hi_cores
for S (non-scaling seconds: driver scheduling, AQE re-plans, JIT/GC
shared cost, single-partition tails) and W (core-seconds of scalable
work).  S/W falling with corpus size is the amortization evidence the
north_rule's two-cluster-size criterion asks for on one box: the
residual that caps measured efficiency is per-JOB, not per-DOC, so it
vanishes into the noise at production corpus sizes.

Usage: python tools/campaign_table.py [campaigns.jsonl]
"""

from __future__ import annotations

import json
import sys


def decompose(lo_wall: float, hi_wall: float, lo: int, hi: int):
    """Solve the two-point Amdahl system; returns (S, W).

    Returns (None, None) when the system has no physical solution:
    lo == hi divides by zero, and hi_wall >= lo_wall (possible under
    the documented ±30% contention noise) would yield negative W/S —
    the caller prints 'n/a' instead of silent nonsense (ADVICE r4).
    """
    if lo == hi or hi_wall >= lo_wall:
        return None, None
    # lo_wall = S + W/lo ; hi_wall = S + W/hi
    w = (lo_wall - hi_wall) / (1.0 / lo - 1.0 / hi)
    s = lo_wall - w / lo
    return s, w


def main(path: str = "BENCH/campaigns.jsonl") -> None:
    rows = [json.loads(ln) for ln in open(path) if ln.strip()]
    print("| docs | pin | mode | mem | lo best (s) | hi best (s) | raw eff "
          "| ceiling | norm | S (serial s) | W (core-s) | S/(S+W) "
          "| docs/s @hi |")
    print("|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        lo_w, hi_w = min(r["walls_lo"]), min(r["walls_hi"])
        s, w = decompose(lo_w, hi_w, r["lo_cores"], r["hi_cores"])
        if s is None:
            s_str = w_str = frac_str = "n/a"
        else:
            s_str, w_str = f"{s:.0f}", f"{w:.0f}"
            frac_str = f"{s / (s + w):.3f}"
        mode = "bounded" if r.get("bounded") else "fat-sig"
        print(
            f"| {r['n_docs']:,} | {'Y' if r.get('pin') else 'N'} "
            f"| {mode} | {r.get('mem', '16g')} "
            f"| {lo_w:.1f} | {hi_w:.1f} | {r['eff']:.3f} "
            f"| {max(r['calibs']):.3f} | {r['eff_norm']:.3f} "
            f"| {s_str} | {w_str} | {frac_str} "
            f"| {r['docs_per_sec_hi']:,.0f} |"
        )
    # projection: with the largest campaign's S held fixed and W
    # scaled linearly in docs, what does the raw efficiency tend to?
    if rows:
        # latest row wins among equal sizes (modes improve over time)
        r = max(reversed(rows), key=lambda x: x["n_docs"])
        lo_w, hi_w = min(r["walls_lo"]), min(r["walls_hi"])
        s, w = decompose(lo_w, hi_w, r["lo_cores"], r["hi_cores"])
        if s is None:
            return
        lo_c, hi_c = r["lo_cores"], r["hi_cores"]
        print("\nprojection (S fixed, W ∝ docs, from the largest campaign):")
        for mult in (1, 2, 4, 8, 16):
            wm = w * mult
            eff = ((s + wm / lo_c) / (s + wm / hi_c)) / (hi_c / lo_c)
            print(f"  {r['n_docs'] * mult:>12,} docs → raw eff {eff:.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:])

"""Per-query bench regression gate over the falsifiable r8 records.

Reads BENCH_DETAIL.json (the latest run) and BENCH_HISTORY.jsonl, and
for every query compares the current calibration-normalized median
against the MEDIAN of its normalized history at the same scale factor
(median, not min: one lucky sample would otherwise become a
permanently unbeatable bar — observed immediately on this box, where
the single fastest minhash sample coincided with a loadavg column
showing contamination mid-drain). A query regresses only when it
exceeds that baseline by more than the combined noise band (its own
spread in both runs plus a fixed margin) — the point of the r8
harness: a "regression" that doesn't survive normalization and spread
is box noise, not code.

The band is per-query-load-aware (the r8 loadavg_per_query column):
contention the min-probe calibration cannot capture mid-run widens the
allowance by --load-coef per loadavg point of difference, and
sub-second queries additionally need to regress by --abs-floor seconds
before they count — on this box 100 ms of scheduler jitter is a 1.4x
"regression" on a 0.25 s query with zero code change (measured while
building this tool).

Usage: python tools/bench_compare.py [--margin 0.20] [--sf 0.1]
Exit 1 if any query regresses beyond the band; prints a table either
way. History rows without calibration data (pre-r8) are skipped — they
cannot be normalized, which is exactly why the probe exists.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _normalized(rec: dict) -> dict[str, float] | None:
    factor = rec.get("calib_factor")
    queries = rec.get("queries")
    if not factor or not isinstance(queries, dict) or not queries:
        return None
    return {k: v / factor for k, v in queries.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--margin", type=float, default=0.20,
                    help="extra allowance on top of both runs' spreads")
    ap.add_argument("--abs-floor", type=float, default=0.3,
                    help="minimum normalized delta (sec) to count as a regression")
    ap.add_argument("--load-coef", type=float, default=0.08,
                    help="extra band per point of per-query loadavg difference")
    ap.add_argument("--sf", type=float, default=None,
                    help="scale factor to compare (default: the detail file's)")
    ap.add_argument("--detail", default=os.path.join(HERE, "BENCH_DETAIL.json"))
    args = ap.parse_args()

    with open(args.detail) as f:
        current = json.load(f)
    sf = args.sf if args.sf is not None else current.get("sf")
    cur_norm = _normalized(current)
    if cur_norm is None:
        print("current record lacks calibration data — nothing to gate")
        return 0

    hist: dict[str, list[tuple[float, float, float]]] = {}  # q -> [(norm, spread, load)]
    hist_path = os.path.join(HERE, "BENCH_HISTORY.jsonl")
    try:
        with open(hist_path) as f:
            rows = [json.loads(ln) for ln in f if ln.strip()]
    except OSError:
        rows = []
    cur_total = current.get("value")
    for rec in rows:
        if rec.get("sf") != sf or rec.get("value") == cur_total:
            continue  # other scale, or the current run's own history row
        norm = _normalized(rec)
        if norm is None:
            continue  # pre-r8: not normalizable
        spreads = rec.get("spread") or {}
        loads = rec.get("loadavg_per_query") or {}
        for q, v in norm.items():
            hist.setdefault(q, []).append(
                (v, float(spreads.get(q, 0.0)), float(loads.get(q, 0.0)))
            )

    if not hist:
        print(f"no normalizable history at sf={sf} yet — gate passes vacuously")
        return 0

    cur_spread = current.get("spread") or {}
    cur_load = current.get("loadavg_per_query") or {}
    regressed = []
    print(f"{'query':34} {'now':>7} {'hist':>7} {'ratio':>6}  verdict")
    for q in sorted(cur_norm):
        if q not in hist:
            print(f"{q:34} {cur_norm[q]:7.3f} {'new':>7} {'':>6}  NEW")
            continue
        runs = sorted(hist[q])
        b, b_spread, b_load = runs[len(runs) // 2]  # median by normalized time
        ratio = cur_norm[q] / b if b else 1.0
        band = 1.0 + float(cur_spread.get(q, 0.0)) + b_spread + args.margin
        band += args.load_coef * max(
            0.0, float(cur_load.get(q, 0.0)) - b_load
        )
        over = ratio > band and (cur_norm[q] - b) > args.abs_floor
        verdict = "ok" if not over else f"REGRESSED (band {band:.2f}x)"
        if over:
            regressed.append(q)
        print(f"{q:34} {cur_norm[q]:7.3f} {b:7.3f} {ratio:5.2f}x  {verdict}")

    if regressed:
        print(f"\n{len(regressed)} regression(s) beyond the noise band: "
              f"{', '.join(regressed)}")
        return 1
    print("\nall queries within their normalized noise bands")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""One-shot exact re-anchoring of the bench record to the r11
calibration constants (r10 VERDICT task 2).

bench.py's reference constants were scaled by the single scalar
s = 0.875 (provenance in bench.py next to the constants). Because BOTH
component references scale by the same s, every probe's factor under
the new constants is exactly factor_old / s — independent of the
probe's cpu/shuffle mix — so every normalized quantity in the
historical record re-anchors EXACTLY by multiplication:

    normalized_new = raw / factor_new = normalized_old * s

This script applies that transform in place to BENCH_HISTORY.jsonl and
BENCH_DETAIL.json:

- queries_normalized values, normalized_total_sec,
  normalized_total_segmented_sec: multiplied by s;
- calib_factor and each calib_probes[i].factor: divided by s;
- gate blocks embedded in history rows are left untouched (they are a
  record of the verdict THAT run produced at the time, not inputs to
  future gating — tools/bench_compare only reads their `regressed`
  list, which is era-independent);
- each touched row is stamped "calib_era": "r11"; stamped rows are
  skipped on re-run (idempotent). Pre-rescale files live in git
  history (commit before this tool ran).

Rows with no normalized fields (pre-r8) pass through unchanged. raw
`queries`/`value` seconds are never touched — they are measurements,
not estimates.

Usage: python tools/rebaseline_history.py [--scalar 0.875] [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ERA = "r11"


def rescale_record(rec: dict, s: float) -> bool:
    """Apply the exact era transform to one record in place; returns
    whether anything changed. Idempotent via the calib_era stamp."""
    if rec.get("calib_era") == ERA:
        return False
    changed = False
    qn = rec.get("queries_normalized")
    if isinstance(qn, dict) and qn:
        rec["queries_normalized"] = {k: round(v * s, 4) for k, v in qn.items()}
        changed = True
    for key in ("normalized_total_sec", "normalized_total_segmented_sec"):
        if isinstance(rec.get(key), (int, float)):
            rec[key] = round(rec[key] * s, 4)
            changed = True
    if isinstance(rec.get("calib_factor"), (int, float)):
        rec["calib_factor"] = round(rec["calib_factor"] / s, 4)
        changed = True
    for probe in rec.get("calib_probes") or []:
        if isinstance(probe, dict) and isinstance(probe.get("factor"), (int, float)):
            probe["factor"] = round(probe["factor"] / s, 4)
            changed = True
    # cross_round tables embed other rounds' normalized totals
    for row in rec.get("cross_round") or []:
        if not isinstance(row, dict) or row.get("calib_era") == ERA:
            continue
        for key in ("normalized_total_sec", "normalized_total_segmented_sec"):
            if isinstance(row.get(key), (int, float)):
                row[key] = round(row[key] * s, 4)
                row["calib_era"] = ERA
                changed = True
    if changed:
        rec["calib_era"] = ERA
    return changed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scalar", type=float, default=0.875)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    s = args.scalar

    hist_path = os.path.join(HERE, "BENCH_HISTORY.jsonl")
    n_changed = 0
    rows = []
    with open(hist_path) as f:
        for ln in f:
            if not ln.strip():
                continue
            try:
                rec = json.loads(ln)
            except ValueError:
                rows.append(ln.rstrip("\n"))  # keep corrupt lines verbatim
                continue
            if isinstance(rec, dict) and rescale_record(rec, s):
                n_changed += 1
            rows.append(json.dumps(rec) if isinstance(rec, dict) else ln.rstrip("\n"))
    detail_path = os.path.join(HERE, "BENCH_DETAIL.json")
    detail_changed = False
    detail = None
    if os.path.isfile(detail_path):
        with open(detail_path) as f:
            detail = json.load(f)
        detail_changed = rescale_record(detail, s)

    print(f"history rows rescaled: {n_changed}; detail rescaled: {detail_changed}")
    if args.dry_run:
        return 0
    tmp = hist_path + ".tmp"
    with open(tmp, "w") as f:
        f.write("".join(r + "\n" for r in rows))
    os.replace(tmp, hist_path)
    if detail is not None and detail_changed:
        tmp = detail_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
        os.replace(tmp, detail_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())

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
contention the calibration did NOT price widens the allowance by
--load-coef per loadavg point of difference, and sub-second queries
additionally need to regress by --abs-floor seconds before they count
— on this box 100 ms of scheduler jitter is a 1.4x "regression" on a
0.25 s query with zero code change (measured while building this tool).

**r10 recalibration for the segment-normalization era.** The original
constants (margin 0.20, abs_floor 0.3 s, spreads SUMMED, load
widening unconditional) were sized for the pre-segment harness, where
the suite-level min-probe factor missed all mid-run contention. With
per-segment pricing (late r9) that noise is absorbed upstream, and the
stacked allowances double-counted it: 47 of 60 registry queries run
under 1 s at sf0.1, and under the old band a genuine 1.5x regression
on any of them could never trip (delta < 0.3 s floor). Recalibrated
against the 82-row BENCH_HISTORY (23 normalizable sf0.1 rows;
per-query spread p50 0.112 / p90 0.147 / p99 0.215):

- spreads combine by ROOT-SUM-SQUARE, not sum — the two runs' medians
  jitter independently, so their ratio noise is ~sqrt(s1²+s2²); the
  sum overstated it by ~40% at typical spreads and was the main reason
  sub-second regressions could hide.
- margin 0.20 → 0.10 (typical band now ≈ 1 + 0.15 + 0.10 = 1.25:
  tighter than every observed same-code replay ratio on the r9-era
  segment-normalized runs, which all pass, while a synthetic 1.3x on a
  0.5 s query trips — both pinned in tests/test_bench_compare.py).
- abs_floor 0.3 s → 0.1 s (p99 same-code normalized delta on
  sub-second queries across the r9 replays is < 0.09 s).
- load widening only when the current run's calibration factor for the
  query is below 1.05 — if the bracketing probes already priced the
  contention (factor ≥ 1.05, e.g. the r9 closing run's 1.47 first
  segment), adding a loadavg allowance on top double-counts it.
- empirical-support check: a query additionally fails only when it
  exceeds the MAX of its last 12 same-code normalized runs by 15%. The
  within-run spread understates some queries' ACROSS-run dispersion
  (`embedding_near_dup` spans 0.83-1.21 s normalized over 21 recorded
  same-code runs — plan/JIT bimodality — yet measured spread 0.054 on
  the run that first tripped the tightened band at ratio 1.211); the
  recent-window max is the non-parametric noise floor the data itself
  establishes. The 15% margin is calibrated from the full history: the
  per-(run, query) excursion statistic value/max(prior 12 runs) has
  p99 = 1.13 / p99.5 = 1.18 / p99.9 = 1.24 over 1,129 samples (a 5%
  margin produced ~0.3 false flags per 60-query run — observed twice,
  `embedding_near_dup` then `sessionize_gap` at 1.135× its prior max,
  both with no code change on their paths and both pinned as replay
  tests); at 15% + the abs floor the expected same-code false-flag
  rate is ~0.12 per run while a genuine 1.3× regression still clears
  the support on any stable-history query. Stable queries have
  recent_max ≈ median, so their bands stay as tight as the spread
  formula allows.
- (r11, closing the r10 advice) history rows whose own gate flagged a
  query as REGRESSED never enter that query's null distribution —
  neither the support window nor the median baseline. bench.py appends
  history unconditionally, so without this a genuine regression trips
  exactly once, then its own row raises the support max (and, run over
  run, drifts the median toward the regressed plateau) and the gate
  self-heals around the unfixed code. A query with ONLY flagged history
  keeps failing at the plateau; a run strictly faster than every
  flagged value passes as the fix (otherwise no clean row could ever
  re-seed the history).

Usage: python tools/bench_compare.py [--margin 0.10] [--sf 0.1]
Exit 1 if any query regresses beyond the band; prints a table either
way. History rows without calibration data (pre-r8) are skipped — they
cannot be normalized, which is exactly why the probe exists.

Since r9 `bench.py` also invokes :func:`compare` directly at the end of
every suite run and records the verdict as the ``gate`` block in
BENCH_DETAIL.json — the gate ACTS on what the harness measures instead
of waiting for someone to remember to run this file.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_MARGIN = 0.10
DEFAULT_ABS_FLOOR = 0.1
DEFAULT_LOAD_COEF = 0.08
# current-run calibration factor above which the probes are considered
# to have already priced the query's contention (no load widening)
LOAD_PRICED_FACTOR = 1.05
# empirical-support check: fail only when the current normalized time
# also exceeds max(last SUPPORT_WINDOW same-code runs) by SUPPORT_MARGIN
SUPPORT_WINDOW = 12
SUPPORT_MARGIN = 0.15


def _normalized(rec: dict) -> dict[str, float] | None:
    # prefer the per-query SEGMENT normalization (late r9): each query
    # priced by the calibration probes that bracketed its own segment,
    # so mid-run contention — invisible to the suite-level start/end
    # factor — normalizes the queries it actually hit
    seg = rec.get("queries_normalized")
    if isinstance(seg, dict) and seg:
        return dict(seg)
    factor = rec.get("calib_factor")
    queries = rec.get("queries")
    if not factor or not isinstance(queries, dict) or not queries:
        return None
    return {k: v / factor for k, v in queries.items()}


def load_history(path: str | None = None) -> list[dict]:
    """BENCH_HISTORY.jsonl rows. Corruption is handled PER LINE: a
    truncated tail (bench killed mid-append) or a non-object line must
    not discard the rest of the history — that would silently disable
    the gate forever ('no_history' passes vacuously) while a real
    regression sails through (review find).

    ``SPARK_GRAFT_BENCH_HISTORY`` overrides the default path — bench.py
    uses it to run the pinned replay tests against the WOULD-BE history
    file (existing rows + the row about to be appended) before the
    append lands, so a record that breaks a pinned replay is flagged at
    record time instead of discovered red in the next full pytest run
    (the r13 incident: ten `No-Verification-Needed` bench-record
    commits, one of which silently broke the r11 excursion replay)."""
    path = (
        path
        or os.environ.get("SPARK_GRAFT_BENCH_HISTORY")
        or os.path.join(HERE, "BENCH_HISTORY.jsonl")
    )
    rows: list[dict] = []
    try:
        with open(path) as f:
            lines = [ln for ln in f if ln.strip()]
    except OSError:
        return rows
    for ln in lines:
        try:
            rec = json.loads(ln)
        except ValueError:
            continue  # that one line is lost, the gate keeps its history
        if isinstance(rec, dict):
            rows.append(rec)
    return rows


def compare(
    current: dict,
    history_rows: list[dict],
    *,
    margin: float = DEFAULT_MARGIN,
    abs_floor: float = DEFAULT_ABS_FLOOR,
    load_coef: float = DEFAULT_LOAD_COEF,
    sf: float | None = None,
) -> dict:
    """Gate one run against its normalized history.

    Returns a JSON-serializable verdict::

        {"status": "pass" | "fail" | "no_calibration" | "no_history",
         "regressed": [query, ...],
         "params": {...},
         "per_query": {q: {"now": s, "hist": s|None, "ratio": x|None,
                            "band": x|None, "verdict": str}}}

    Pure function of its inputs — `bench.py` calls it in-process with
    the just-measured detail dict (before appending the run to history),
    and main() below calls it from the CLI over the files on disk.
    """
    sf = sf if sf is not None else current.get("sf")
    params = {
        "margin": margin,
        "abs_floor": abs_floor,
        "load_coef": load_coef,
        "sf": sf,
    }
    cur_norm = _normalized(current)
    if cur_norm is None:
        return {
            "status": "no_calibration",
            "regressed": [],
            "params": params,
            "per_query": {},
        }

    hist: dict[str, list[tuple[float, float, float]]] = {}  # q -> [(norm, spread, load)]
    recent: dict[str, list[float]] = {}  # q -> norms in append (time) order
    flagged_only: dict[str, list[float]] = {}  # q -> norms from REGRESSED rows
    # the current run's own history row is identified by its append
    # timestamp (bench.py stamps `ts` into the detail before writing
    # either file), NOT by raw-total equality — a genuine historical run
    # that happens to share the rounded total must stay in the baseline
    # (review find)
    cur_ts = current.get("ts")
    for rec in history_rows:
        if rec.get("sf") != sf:
            continue  # other scale
        if cur_ts is not None and rec.get("ts") == cur_ts:
            continue  # the current run's own history row
        norm = _normalized(rec)
        if norm is None:
            continue  # pre-r8: not normalizable
        spreads = rec.get("spread") or {}
        loads = rec.get("loadavg_per_query") or {}
        # a row whose own gate flagged q as REGRESSED must not enter q's
        # null distribution AT ALL: bench.py appends history rows
        # unconditionally, so a genuine regression would trip the gate
        # exactly once, then its own slow row would raise the support
        # max (and, run over run, drift the median baseline toward the
        # regressed plateau) and every later run of the still-unfixed
        # code would pass silently — the gate self-healing around the
        # regression (r10 advice). Flagged rows are tracked separately
        # so a query with ONLY flagged history keeps failing instead of
        # reading as NEW.
        flagged = set((rec.get("gate") or {}).get("regressed") or [])
        for q, v in norm.items():
            if q in flagged:
                flagged_only.setdefault(q, []).append(v)
                continue
            hist.setdefault(q, []).append(
                (v, float(spreads.get(q, 0.0)), float(loads.get(q, 0.0)))
            )
            recent.setdefault(q, []).append(v)  # file order = time order

    if not hist and not flagged_only:
        return {
            "status": "no_history",
            "regressed": [],
            "params": params,
            "per_query": {},
        }

    cur_spread = current.get("spread") or {}
    cur_load = current.get("loadavg_per_query") or {}
    cur_queries = current.get("queries") or {}
    cur_seg = current.get("queries_normalized") or {}
    suite_factor = current.get("calib_factor")

    def _cur_factor(q: str) -> float | None:
        # the calibration factor the current run priced THIS query with:
        # raw/segment-normalized when the segment map exists, else the
        # suite-level factor. None when unknowable.
        if q in cur_seg and q in cur_queries and cur_seg[q]:
            return cur_queries[q] / cur_seg[q]
        return suite_factor
    regressed = []
    per_query: dict[str, dict] = {}
    # regressed-to-a-crash is the WORST regression and must not slip
    # through as 'pass' just because the query has no timing this run
    # (review find): a query the current run recorded an ERROR for,
    # that history knows, fails the gate. Queries merely absent (a
    # SPARK_GRAFT_BENCH_ONLY subset run) are not errors and stay out.
    for q in sorted(current.get("errors") or {}):
        # flagged-only history still counts as "history knows q": a query
        # that regressed in every recent run and now CRASHES must not
        # slip through just because its clean baseline is empty
        if q in hist or q in flagged_only:
            b = (
                round(sorted(hist[q])[len(hist[q]) // 2][0], 4)
                if q in hist
                else None
            )
            per_query[q] = {
                "now": None, "hist": b,
                "ratio": None, "band": None, "verdict": "ERRORED",
            }
            regressed.append(q)
    for q in sorted(cur_norm):
        if q not in hist:
            if q in flagged_only:
                # every historical run of q was itself flagged: there is
                # no clean baseline, only an unfixed regression. Keep
                # failing while the current run sits at the flagged
                # plateau — but a run CLEARLY faster than every flagged
                # value is the fix arriving, and must pass so its row
                # can re-seed the clean history (otherwise the fix
                # itself would be flagged and no clean row could ever
                # form — a deadlock). "Clearly" = below the plateau by
                # the same 15% the support check uses: a strict min let
                # a single noise excursion (same unfixed code, ~1/(n+1)
                # chance per run) slip under the plateau and re-seed the
                # clean history at the regressed level (review find).
                plateau = min(flagged_only[q])
                fixed = cur_norm[q] < plateau * (1 - SUPPORT_MARGIN)
                per_query[q] = {
                    "now": round(cur_norm[q], 4),
                    "hist": None,
                    "ratio": None,
                    "band": None,
                    "flagged_plateau": round(plateau, 4),
                    "verdict": "ok" if fixed else "REGRESSED",
                }
                if not fixed:
                    regressed.append(q)
            else:
                per_query[q] = {
                    "now": round(cur_norm[q], 4),
                    "hist": None,
                    "ratio": None,
                    "band": None,
                    "verdict": "NEW",
                }
            continue
        runs = sorted(hist[q])
        b, b_spread, b_load = runs[len(runs) // 2]  # median by normalized time
        ratio = cur_norm[q] / b if b else 1.0
        # RSS, not sum: the two medians jitter independently (r10
        # recalibration, module docstring)
        s = float(cur_spread.get(q, 0.0))
        band = 1.0 + math.sqrt(s * s + b_spread * b_spread) + margin
        # load widening only for contention the calibration did NOT
        # price — a factor ≥ LOAD_PRICED_FACTOR means the probes already
        # normalized it, and a loadavg allowance on top double-counts
        f = _cur_factor(q)
        if f is None or f < LOAD_PRICED_FACTOR:
            band += load_coef * max(0.0, float(cur_load.get(q, 0.0)) - b_load)
        # empirical support: the query's recent same-code runs ARE its
        # null distribution — within-run spread understates across-run
        # (plan/JIT) dispersion for bimodal queries (module docstring).
        # recent[q] is non-empty whenever q is in hist (appended
        # together); the all-rows-flagged case is handled by the
        # flagged_only branch above.
        support = max(recent[q][-SUPPORT_WINDOW:]) * (1 + SUPPORT_MARGIN)
        over = (
            ratio > band
            and (cur_norm[q] - b) > abs_floor
            and cur_norm[q] > support
        )
        if over:
            regressed.append(q)
        per_query[q] = {
            "now": round(cur_norm[q], 4),
            "hist": round(b, 4),
            "ratio": round(ratio, 3),
            "band": round(band, 3),
            "support": round(support, 4),
            "verdict": "REGRESSED" if over else "ok",
        }
    # build-time guard (r14 VERDICT task 7, INFORMATIONAL — never fails
    # the gate): driver-side plan-construction creep (the r14 find: wide
    # py4j Column chains costing ~1.3 s/build on the LSH family) is a
    # different failure mode from execution regressions — pure driver
    # CPU, invisible to the calibration probes, and legitimately moved
    # by any plan-shape change. A query is listed when its current
    # build_sec exceeds 1.5× the max of its recent recorded builds AND
    # the delta is > 0.15 s (construction times are 10–100 ms typical,
    # so the floor alone absorbs jitter). Informational because a
    # legitimate plan change moves it — the round review adjudicates.
    build_regressed: list[str] = []
    cur_build = current.get("build_sec") or {}
    if cur_build:
        hist_build: dict[str, list[float]] = {}
        for rec in history_rows:
            if rec.get("sf") != sf:
                continue
            if cur_ts is not None and rec.get("ts") == cur_ts:
                continue
            for q, v in (rec.get("build_sec") or {}).items():
                hist_build.setdefault(q, []).append(float(v))
        for q, v in sorted(cur_build.items()):
            hb = hist_build.get(q, [])[-SUPPORT_WINDOW:]
            if len(hb) >= 3 and v > max(hb) * 1.5 and v - max(hb) > 0.15:
                build_regressed.append(q)
    return {
        "status": "fail" if regressed else "pass",
        "regressed": regressed,
        "build_regressed": build_regressed,
        "params": params,
        "per_query": per_query,
    }


def render(result: dict, out=sys.stdout) -> None:
    """Human table for a :func:`compare` result."""
    status = result["status"]
    if status == "no_calibration":
        print("current record lacks calibration data — nothing to gate", file=out)
        return
    if status == "no_history":
        sf = result["params"].get("sf")
        print(f"no normalizable history at sf={sf} yet — gate passes vacuously",
              file=out)
        return
    print(f"{'query':34} {'now':>7} {'hist':>7} {'ratio':>6}  verdict", file=out)
    for q, row in result["per_query"].items():
        if row["verdict"] == "ERRORED":
            # hist is None when the query's only history is flagged rows
            # — formatting None crashed render(), and bench.py's
            # catch-all then REPLACED the gate verdict with gate_error,
            # losing the regressed list (review find)
            hist_s = f"{row['hist']:7.3f}" if row["hist"] is not None else f"{'flag':>7}"
            print(f"{q:34} {'ERROR':>7} {hist_s} {'':>6}  "
                  "ERRORED (ran in history, crashed now)", file=out)
            continue
        if row["verdict"] == "NEW":
            print(f"{q:34} {row['now']:7.3f} {'new':>7} {'':>6}  NEW", file=out)
            continue
        if row.get("hist") is None:  # flagged-only history (no clean row)
            verdict = ("ok (fix candidate)" if row["verdict"] == "ok"
                       else "REGRESSED (only flagged history, plateau "
                            f"{row.get('flagged_plateau')})")
            print(f"{q:34} {row['now']:7.3f} {'flag':>7} {'':>6}  {verdict}",
                  file=out)
            continue
        verdict = ("ok" if row["verdict"] == "ok"
                   else f"REGRESSED (band {row['band']:.2f}x)")
        print(f"{q:34} {row['now']:7.3f} {row['hist']:7.3f} "
              f"{row['ratio']:5.2f}x  {verdict}", file=out)
    if result["regressed"]:
        print(f"\n{len(result['regressed'])} regression(s) beyond the noise "
              f"band: {', '.join(result['regressed'])}", file=out)
    else:
        print("\nall queries within their normalized noise bands", file=out)
    if result.get("build_regressed"):
        print("build-time creep (informational, does not fail the gate): "
              + ", ".join(result["build_regressed"]), file=out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--margin", type=float, default=DEFAULT_MARGIN,
                    help="extra allowance on top of both runs' spreads")
    ap.add_argument("--abs-floor", type=float, default=DEFAULT_ABS_FLOOR,
                    help="minimum normalized delta (sec) to count as a regression")
    ap.add_argument("--load-coef", type=float, default=DEFAULT_LOAD_COEF,
                    help="extra band per point of per-query loadavg difference")
    ap.add_argument("--sf", type=float, default=None,
                    help="scale factor to compare (default: the detail file's)")
    ap.add_argument("--detail", default=os.path.join(HERE, "BENCH_DETAIL.json"))
    args = ap.parse_args()

    with open(args.detail) as f:
        current = json.load(f)
    history = load_history()
    if current.get("ts") is None and history:
        # legacy detail file with no timestamp (pre-r10): the current
        # run's history row can only be the NEWEST same-sf row — drop
        # that one iff its total matches, never a genuine older run that
        # happens to share the rounded total (review find)
        sf = args.sf if args.sf is not None else current.get("sf")
        for i in range(len(history) - 1, -1, -1):
            if history[i].get("sf") == sf:
                if history[i].get("value") == current.get("value"):
                    del history[i]
                break
    result = compare(
        current,
        history,
        margin=args.margin,
        abs_floor=args.abs_floor,
        load_coef=args.load_coef,
        sf=args.sf,
    )
    render(result)
    return 1 if result["status"] == "fail" else 0


if __name__ == "__main__":
    sys.exit(main())

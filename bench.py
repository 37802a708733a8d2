"""Benchmark: run the registry's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE compact JSON line as the LAST stdout line:
  {"metric": "...", "value": <total sec>, "unit": "sec", "sf": <sf>, ...}

The capture that records this line keeps only the final ~2000 chars of
output (round 3's line with 55 per-query timings + spreads exceeded that
and was head-truncated into unparseability), so the stdout line carries
only the summary. Full per-query medians + spreads + row counts go to
BENCH_DETAIL.json next to this script, and a one-row-per-run history is
appended to BENCH_HISTORY.jsonl so cross-round regressions are
attributable without archaeology.

Each query is materialized end-to-end (toPandas through Arrow), so the
timing covers scan → compute → result transfer, not just planning.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ethereum_analytical_db_spark.plans.registry import all_queries
from ethereum_analytical_db_spark.session import get_spark


def _history_replay_check(here: str, hist_row: dict) -> dict:
    """Run the pinned bench-compare replay tests against the WOULD-BE
    history (the file on disk + ``hist_row``) before the append lands.

    r13 lesson: bench-record commits were treated as "data files only"
    and skipped verification, but BENCH_HISTORY.jsonl rows are INPUTS to
    pinned replay tests — one r13 append silently broke
    test_r11_dedup_exact_excursion and the suite stayed red for the rest
    of the round. This check costs ~2 s (tests/test_bench_compare.py is
    pure-Python over jsonl) and runs on every append; a failure is
    recorded in the row as ``replay_check`` and printed loudly so the
    recording commit can never honestly claim the data was inert.

    Returns {"status": "pass"|"fail"|"skipped", "detail": str}.
    """
    import subprocess
    import tempfile

    test_file = os.path.join(here, "tests", "test_bench_compare.py")
    if not os.path.exists(test_file):
        return {"status": "skipped", "detail": "no replay tests present"}
    hist_path = os.path.join(here, "BENCH_HISTORY.jsonl")
    tmp = None
    try:
        with tempfile.NamedTemporaryFile(
            "w", suffix=".jsonl", delete=False
        ) as f:
            tmp = f.name
            if os.path.exists(hist_path):
                with open(hist_path) as src:
                    f.write(src.read())
            f.write(json.dumps(hist_row, separators=(",", ":")) + "\n")
        env = dict(os.environ, SPARK_GRAFT_BENCH_HISTORY=tmp)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", test_file, "-q", "--no-header"],
            capture_output=True,
            text=True,
            env=env,
            cwd=here,
            timeout=120,
        )
        if proc.returncode == 0:
            return {"status": "pass", "detail": proc.stdout.strip()[-200:]}
        return {
            "status": "fail",
            "detail": (proc.stdout + proc.stderr).strip()[-1000:],
        }
    except Exception as exc:  # noqa: BLE001 - the check must never cost
        # the run its record (pytest missing, tempdir full, ...)
        return {"status": "skipped", "detail": f"{type(exc).__name__}: {exc}"[:300]}
    finally:
        if tmp:
            try:
                os.unlink(tmp)
            except OSError:
                pass


def _wait_for_quiet(cpus: int) -> dict:
    """Refuse to sample on a contaminated box (round-5 lesson).

    r5's shipped number was 1.37x-inflated by EXTERNAL tenant load
    (loadavg_start 3.34; same registry clocked 30.3s vs 47.5s on quieter
    samples — see BENCH_HISTORY.jsonl). The 1-min loadavg only reflects
    OTHER tenants before we start Spark, so the gate runs once, up front:
    wait until loadavg1 drops under a threshold, then begin. Mid-run
    gating would be self-defeating (our own local[32] work dominates
    loadavg within a minute), so contamination DURING the run remains
    visible only via per-query spread + loadavg_end.

    Env knobs: SPARK_GRAFT_BENCH_NOGATE=1 skips; _LOAD_MAX overrides the
    threshold; _LOAD_WAIT caps the wait (sec). On timeout we run anyway
    (a late record beats none) but mark load_gate_ok=false so the sample
    is self-describing as contaminated.
    """
    # empirically a loadavg_start of ~3 on this 32-cpu box still inflates
    # the suite ~18% vs a 0.3-load sample (BENCH_HISTORY.jsonl ts
    # 1786691346 vs the run after it), so the default gate is strict:
    # cpus*0.08 ≈ 2.5, not the 0.15 first proposed
    gate = {
        "load_gate_threshold": round(
            float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", cpus * 0.08)), 2
        ),
        "load_gate_waited_sec": 0,
        "load_gate_ok": True,
    }
    if os.environ.get("SPARK_GRAFT_BENCH_NOGATE"):
        gate["load_gate_ok"] = None  # explicitly ungated
        return gate
    timeout = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "900"))
    t0 = time.time()
    while os.getloadavg()[0] > gate["load_gate_threshold"]:
        if time.time() - t0 > timeout:
            gate["load_gate_ok"] = False
            break
        print(
            f"# load gate: loadavg {os.getloadavg()[0]:.2f} > "
            f"{gate['load_gate_threshold']}, waiting...",
            file=sys.stderr,
        )
        time.sleep(15)
    gate["load_gate_waited_sec"] = round(time.time() - t0, 1)
    return gate


# Reference calibration constants: fully-JIT-warmed min-of-5 probe times
# on this box while idle. A run's normalization factor is
# mean(min(start,end) / ref) over both probes; normalized_total_sec =
# total / factor estimates what the suite would have clocked on the
# reference-speed box, making cross-round totals comparable even when
# box load differs. Factor ≈ 1.0 on a quiet run of this box; > 1.0
# under external contention.
#
# RE-BASELINED r11 (2026-08-15): the original constants (0.105 / 0.35,
# measured 2026-08-14 at ambient loadavg ≈ 1.2) assumed a slower box
# than idle-window runs actually show — idle bench-context probes read
# factors 0.82–1.00 under them, so normalization systematically
# INFLATED clean runs by ~7% (r10 verdict, missing item 2). Both
# constants are scaled by the single scalar s = 0.875 — the median of
# the nine bench-context idle probe factors below is 0.8736, rounded
# to 0.875 for a clean scalar (the 0.16% difference is far inside
# per-probe noise). The nine factors, under the old constants:
#   0.8212, 0.8385 (end probes of the idle 13:23 / 13:54 r10 runs,
#   BENCH_HISTORY ts 1786800220 / 1786802044), 0.8720, 0.8725 (the
#   35.87 s idle closing record's start/end pair, ts 1786803014),
#   0.8736, 0.8956 (the r10 driver run's late probes after its
#   starting load drained, BENCH_DETAIL ts 1786804983), and 0.8979,
#   0.9021, 0.9633 (a fresh 10-probe idle session, 2026-08-15 15:43,
#   loadavg 0.35, mid-depth-warm probes — the back-to-back tail of
#   that session reaches 0.76–0.78, deeper JIT warmth than probes ever
#   reach inside a real suite run, and is deliberately excluded).
# ONE scalar for both components, not per-component medians: factor is
# the mean of the two component ratios, so factor_new = factor_old / s
# for EVERY probe regardless of its cpu/shuffle mix — which makes the
# historical record exactly re-anchorable (tools/rebaseline_history.py
# multiplied every BENCH_HISTORY/BENCH_DETAIL normalized value by s and
# divided the stored factors by s; rows are stamped
# "calib_era": "r11" — the pre-rescale files live in git history).
# Cross-era semantics are unchanged: normalized seconds estimate the
# idle-box-equivalent cost; the rescale removes the ~7% inflation bias
# the old anchor carried.
CALIB_CPU_REF_SEC = 0.105 * 0.875  # = 0.0919
CALIB_SHUFFLE_REF_SEC = 0.35 * 0.875  # = 0.3063


def _calibration_probe(spark) -> dict:
    """Fixed, registry-independent work that prices THIS run's box: a
    codegen-bound arithmetic scan (all cores, no shuffle) and a
    hash-shuffle groupBy. min-of-5 each — the minimum is the standard
    calibration statistic (noise is strictly additive). Run before AND
    after the suite so contamination that arrives mid-run is visible as
    probe drift, not just loadavg."""
    from pyspark.sql import functions as F

    def cpu() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).select(
            F.sum((F.col("id") * 2654435761) % 1000003).alias("s")
        ).collect()
        return time.perf_counter() - t0

    def shuffle() -> float:
        t0 = time.perf_counter()
        spark.range(4_000_000).groupBy((F.col("id") % 65536).alias("k")).count().agg(
            F.sum("count"), F.count("*")
        ).collect()
        return time.perf_counter() - t0

    cpu()  # warm both code paths once
    shuffle()
    cpu_min = min(cpu() for _ in range(5))
    shuffle_min = min(shuffle() for _ in range(5))
    return {"cpu_sec": round(cpu_min, 4), "shuffle_sec": round(shuffle_min, 4)}


def _probe_factor(probe: dict) -> float:
    """A single probe's box-speed factor vs the quiet reference (1.0 =
    reference speed; >1 = slower box, e.g. external contention)."""
    return round(
        (
            probe["cpu_sec"] / CALIB_CPU_REF_SEC
            + probe["shuffle_sec"] / CALIB_SHUFFLE_REF_SEC
        )
        / 2,
        4,
    )


def _time_query(
    spark,
    name: str,
    qdef,
    sf_dir: str,
    runs: int,
    spread_max: float,
    max_samples: int,
    *,
    prewarm: bool = True,
) -> dict:
    """Sample one registry query under the fastest-``runs`` median
    policy (see main's loop comment). Returns
    ``{"med", "spread", "n_samples", "rows", "build_sec"}``; raises on
    query failure (the caller decides whether that costs the record).

    ``build_sec`` is the MIN over samples of the driver-side
    plan-construction time (``qdef.build`` alone, before any action) —
    the r14 py4j-chain find (wide Column chains costing ~1.3 s/build)
    was caught by hand; recording it per run makes the next
    construction-latency creep visible in history (r14 VERDICT task 7).
    Min, not median: build time is pure driver CPU, so noise is
    strictly additive.
    """
    if prewarm and getattr(qdef, "prewarm", None) is not None:
        # one-time frozen-fixture build (fork warehouse, serve indexes)
        # OUT of the timed band: the first sample then measures the
        # serve path like every later one, instead of widening the band
        # with setup cost (r12 VERDICT task 2)
        t0 = time.perf_counter()
        qdef.prewarm(spark, sf_dir)
        print(
            f"# {name}: prewarm {time.perf_counter() - t0:.3f}s",
            file=sys.stderr,
        )
    samples: list[float] = []
    builds: list[float] = []
    n = 0
    while True:
        t0 = time.perf_counter()
        df = qdef.build(spark, sf_dir)
        builds.append(time.perf_counter() - t0)
        n = len(df.toPandas())
        samples.append(time.perf_counter() - t0)
        # release localCheckpoint blocks: the py4j refs pin the
        # checkpointed RDDs until Python GC runs, so a 5×55-query
        # session otherwise accumulates hundreds of persisted blocks
        # (measured: 5 → 23 persistentRDDs in 5 runs of one query)
        del df
        gc.collect()
        if len(samples) < runs:
            continue
        best = sorted(samples)[:runs]
        med = (
            best[len(best) // 2]
            if runs % 2
            else (best[runs // 2 - 1] + best[runs // 2]) / 2
        )
        spread = (best[-1] - best[0]) / med if med else 0.0
        if spread <= spread_max or len(samples) >= max_samples:
            return {
                "med": med,
                "spread": spread,
                "n_samples": len(samples),
                "rows": n,
                "build_sec": min(builds),
            }


def _per_query_factors(
    boundaries: list[tuple[int, float]], positions: dict[str, int]
) -> dict[str, float]:
    """Per-query normalization factors from SEGMENT calibration probes.

    ``boundaries``: (queries_iterated_before_probe, probe_factor),
    ascending — probes run before the suite, every K queries, and after.
    A query at iteration index j is priced by the MEAN of its two
    bracketing probes (the last boundary ≤ j and the first > j), so
    contention that arrives mid-run — the one failure mode the r8
    start/end min-of-pair provably misses, documented six times in the
    late-r9 records — is priced against exactly the queries it hit,
    not averaged into (or hidden from) the whole suite.
    """
    out: dict[str, float] = {}
    for name, j in positions.items():
        prior = [(b, f) for b, f in boundaries if b <= j]
        later = [(b, f) for b, f in boundaries if b > j]
        if not prior or not later:
            continue
        before = max(prior)[1]  # factor of the LAST probe at/before j
        after = min(later)[1]  # factor of the FIRST probe after j
        out[name] = round((before + after) / 2, 4)
    return out


def _cross_round_table(here: str, current: dict) -> list[dict]:
    """r4+ comparison table: per-round driver-recorded totals
    (BENCH_rNN.json), joined to their BENCH_HISTORY.jsonl rows (by
    exact total match) for loadavg and — from r8 on — the calibration
    probes + normalized totals. Earlier rounds predate the probe, so
    their normalized column is null; the point of the table is that
    from r8 on a claimed speedup must survive normalization or it's box
    noise (round-7 lesson: a 17% 'improvement' from a 35-line diff
    touching no hot path)."""
    history: list[dict] = []
    try:
        with open(os.path.join(here, "BENCH_HISTORY.jsonl")) as f:
            history = [json.loads(ln) for ln in f if ln.strip()]
    except (OSError, ValueError):
        pass
    rows = []
    for n in range(4, 50):
        path = os.path.join(here, f"BENCH_r{n:02d}.json")
        if not os.path.isfile(path):
            continue
        try:
            with open(path) as f:
                rec = json.load(f).get("parsed") or {}
        except (OSError, ValueError):
            continue
        total = rec.get("value")
        hist = next((h for h in history if h.get("value") == total), {})
        rows.append(
            {
                "round": n,
                "total_sec": total,
                "loadavg_start": hist.get("loadavg_start"),
                "loadavg_end": hist.get("loadavg_end"),
                "calib_cpu_sec": (hist.get("calib_start") or {}).get("cpu_sec"),
                "calib_shuffle_sec": (hist.get("calib_start") or {}).get(
                    "shuffle_sec"
                ),
                "normalized_total_sec": hist.get("normalized_total_sec"),
                "normalized_total_segmented_sec": hist.get(
                    "normalized_total_segmented_sec"
                ),
            }
        )
    rows.append(current)
    return rows


def main() -> None:
    cpus_for_gate = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    gate = _wait_for_quiet(cpus_for_gate)
    load_start = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="bench",
        cpus=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    # SPARK_GRAFT_BENCH_ONLY=a,b,c: probe a subset (the sf3/sf10 scaling
    # runs re-measure just the worst sf1 scalers; a full-registry pass at
    # sf10 would be hours of redundant signal)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {q.strip() for q in only.split(",") if q.strip()}
        unknown = keep - qs.keys()
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY names unknown queries: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in keep}
    # JVM/codegen warm-up so the first measured query isn't charged for
    # it. Partial sf dirs are legal for SPARK_GRAFT_BENCH_ONLY subset
    # runs (the documents-only sf100 probe corpus has no lineitem) — a
    # missing warm-up table must not kill the run; the first measured
    # query then absorbs a little warm-up, visible in its spread.
    try:
        all_queries()["pricing_summary"].build(spark, sf_dir).collect()
    except Exception as exc:  # noqa: BLE001
        print(
            f"# warm-up query skipped ({type(exc).__name__}: "
            f"{exc})"[:200],
            file=sys.stderr,
        )
    # Python-worker/Arrow warm-up: the first mapInPandas in a session pays
    # worker daemon spin-up; don't charge it to whichever query runs first
    spark.range(32).mapInPandas(lambda it: it, schema="id long").collect()

    # discard TWO full probes first: even with _calibration_probe's
    # internal warm call, the session's FIRST probe runs ~10-25% slow
    # from residual JIT/JVM warm-up (the same effect the suite factor's
    # min-of-pair was built around) — and the segment normalization
    # below uses each probe's raw factor, so a warm-up-inflated start
    # probe would systematically deflate the first segment's normalized
    # times (review find). One discard proved insufficient against the
    # re-baselined r11 constants: a dedicated 10-probe session shows the
    # probe keeps speeding up through ~3 full iterations before
    # plateauing (r11 measurement, see the constants' provenance note),
    # and start probes were still reading 1.1-1.2x the mid-run plateau.
    # After two discards, calib_start measures conditions, not warm-up.
    _calibration_probe(spark)
    _calibration_probe(spark)
    calib_start = _calibration_probe(spark)
    # segment probes (late-r9): the start/end pair prices the suite as a
    # whole and its min-of-pair deliberately isolates box speed from JVM
    # warm-up — but contention arriving MID-run is then invisible to
    # normalization (observed repeatedly: quiet probes bracketing a
    # loadavg-7 middle). Re-probing every K queries prices each segment
    # under the conditions it actually ran in.
    seg_every = int(os.environ.get("SPARK_GRAFT_BENCH_CALIB_EVERY", "12"))
    calib_probes: list[dict] = [
        {"after": 0, **calib_start, "factor": _probe_factor(calib_start)}
    ]

    # median-of-N with a warmed session: this box shows ±50% per-query
    # jitter (scheduler/GC/load), which best-of-2 cannot average away —
    # r01→r02 totals moved 1.49× with zero hot-path code changes. The
    # median is robust to one bad run each way. FALSIFIABILITY (r8): the
    # statistic is now median-of-the-fastest-`runs` samples, and a query
    # whose fastest-`runs` spread (max-min)/median exceeds
    # SPARK_GRAFT_BENCH_SPREAD_MAX keeps sampling (up to _MAX_SAMPLES)
    # until the band tightens — noise is strictly additive, so the
    # fastest samples are the closest estimate of true cost and converge
    # to the quiet-box number even mid-contamination. On a quiet box
    # fastest-5-of-5 is exactly the old behavior. Per-query loadavg is
    # recorded so any sample that refused to converge is attributable.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    spread_max = float(os.environ.get("SPARK_GRAFT_BENCH_SPREAD_MAX", "0.15"))
    max_samples = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_SAMPLES", "12"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    n_samples: dict[str, int] = {}
    loads: dict[str, float] = {}
    builds: dict[str, float] = {}
    errors: dict[str, str] = {}
    positions: dict[str, int] = {}  # iteration index per timed query
    for idx, (name, qdef) in enumerate(sorted(qs.items())):
        if idx and seg_every > 0 and idx % seg_every == 0:
            # a probe failure must not cost the round its record (the
            # same invariant the per-query try below states — review
            # find): skip the probe, the neighbors bracket wider
            try:
                probe = _calibration_probe(spark)
            except Exception as exc:  # noqa: BLE001
                print(
                    f"# calib probe after {idx} queries FAILED: "
                    f"{type(exc).__name__}: {exc}"[:200],
                    file=sys.stderr,
                )
            else:
                calib_probes.append(
                    {"after": idx, **probe, "factor": _probe_factor(probe)}
                )
                print(
                    f"# calib probe after {idx} queries: factor "
                    f"{calib_probes[-1]['factor']}",
                    file=sys.stderr,
                )
        loads[name] = round(os.getloadavg()[0], 2)
        try:
            res = _time_query(
                spark, name, qdef, sf_dir, runs, spread_max, max_samples
            )
        except Exception as exc:  # noqa: BLE001 - one broken query must
            # not cost the round its whole perf record: mark and move on
            # (the summary line still parses; the error names the query)
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(res["med"], 4)
        spreads[name] = round(res["spread"], 3)
        n_samples[name] = res["n_samples"]
        builds[name] = round(res["build_sec"], 4)
        positions[name] = idx
        print(
            f"# {name}: {timings[name]:.3f}s ({res['rows']} rows, median of "
            f"fastest {runs}/{res['n_samples']}, spread "
            f"{spreads[name]:.0%}, build {builds[name]:.3f}s, "
            f"load {loads[name]})",
            file=sys.stderr,
        )

    try:
        calib_end = _calibration_probe(spark)
    except Exception as exc:  # noqa: BLE001 - a dead session at the very
        # end must not discard the whole run's record; degrade to the
        # last good probe and say so
        print(
            f"# end calib probe FAILED, reusing last good probe: "
            f"{type(exc).__name__}: {exc}"[:200],
            file=sys.stderr,
        )
        calib_end = {
            "cpu_sec": calib_probes[-1]["cpu_sec"],
            "shuffle_sec": calib_probes[-1]["shuffle_sec"],
        }
    calib_probes.append(
        {"after": len(qs), **calib_end, "factor": _probe_factor(calib_end)}
    )
    per_query_factor = _per_query_factors(
        [(p["after"], p["factor"]) for p in calib_probes], positions
    )
    queries_normalized = {
        k: round(v / per_query_factor[k], 4)
        for k, v in timings.items()
        if per_query_factor.get(k)
    }
    normalized_total_segmented = (
        round(sum(queries_normalized.values()), 4) if queries_normalized else None
    )
    # factor from the MIN of the start/end probes: the end-of-run probe
    # is fully JIT-warmed (measured: cpu 0.20 at start vs 0.11 at end of
    # the same quiet run), so the minimum isolates box speed from JVM
    # warm-up state; contamination inflates BOTH probes and still shows.
    calib_factor = round(
        (
            min(calib_start["cpu_sec"], calib_end["cpu_sec"]) / CALIB_CPU_REF_SEC
            + min(calib_start["shuffle_sec"], calib_end["shuffle_sec"])
            / CALIB_SHUFFLE_REF_SEC
        )
        / 2,
        4,
    )
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    here = os.path.dirname(os.path.abspath(__file__))

    # Same-run single retry of gate-flagged queries (r14 VERDICT task 1).
    # The r14 closing record was a gate FAIL on `pricing_summary` — an
    # untouched TPC-H Q1 plan flagged under a documented mid-run tenant
    # (loadavg 2.06→9.2) with no follow-up run to pin it, so the round
    # closed on an unconfirmed fail. Every transient flag this harness
    # has ever recorded was pinned by the NEXT sample of the same query;
    # doing that one re-sample inside the same run makes closing-run
    # load flags self-pinning. Honesty rules: (a) only queries the gate
    # itself flagged are retried, exactly once; (b) both measurements
    # are recorded verbatim in the `retries` block; (c) the retry is
    # kept only when its own bracketing calibration probes price it
    # FASTER than the first attempt (noise is strictly additive, so the
    # faster normalized sample is the better estimate of true cost — a
    # slower retry keeps the original); (d) a genuine regression is
    # still flagged: its retry re-measures the same slow code and the
    # final gate fails on whichever sample was faster.
    retries: dict[str, dict] = {}
    pre_gate: dict | None = None
    if os.environ.get("SPARK_GRAFT_BENCH_RETRY", "1") != "0":
        try:
            from tools.bench_compare import compare as _pre_compare
            from tools.bench_compare import load_history as _pre_history

            pre_gate = _pre_compare(
                {
                    "sf": sf_val,
                    "queries": timings,
                    "spread": spreads,
                    "loadavg_per_query": loads,
                    "errors": errors,
                    "queries_normalized": queries_normalized,
                    "calib_factor": calib_factor,
                },
                _pre_history(os.path.join(here, "BENCH_HISTORY.jsonl")),
            )
        except Exception as exc:  # noqa: BLE001 - a broken pre-gate must
            # not cost the run its record; the final gate still runs
            print(
                f"# retry pre-gate ERROR (no retries): "
                f"{type(exc).__name__}: {exc}"[:200],
                file=sys.stderr,
            )
        flagged = list((pre_gate or {}).get("regressed") or [])
        # SPARK_GRAFT_BENCH_FORCE_RETRY=a,b: treat these as flagged even
        # when the pre-gate passed — exercises the retry path end-to-end
        # (validation + manual re-pin of a specific query)
        force = os.environ.get("SPARK_GRAFT_BENCH_FORCE_RETRY", "")
        flagged += [
            q for q in (s.strip() for s in force.split(","))
            if q and q in qs and q not in flagged
        ]
        if flagged:
            print(
                f"# retrying {len(flagged)} gate-flagged queries once: "
                f"{', '.join(flagged)}",
                file=sys.stderr,
            )
            try:
                rp_before = _calibration_probe(spark)
            except Exception:  # noqa: BLE001
                rp_before = dict(calib_end)
            for q in flagged:
                if q not in qs:
                    continue
                rload = round(os.getloadavg()[0], 2)
                try:
                    res = _time_query(
                        spark, q, qs[q], sf_dir, runs, spread_max,
                        max_samples, prewarm=q in errors,
                    )
                except Exception as exc:  # noqa: BLE001
                    retries[q] = {
                        "kept": False,
                        "error": f"{type(exc).__name__}: {exc}"[:200],
                    }
                    continue
                retries[q] = {"retry_raw": round(res["med"], 4), "load": rload,
                              "retry_res": res}
            try:
                rp_after = _calibration_probe(spark)
            except Exception:  # noqa: BLE001
                rp_after = dict(rp_before)
            rf = round(
                (_probe_factor(rp_before) + _probe_factor(rp_after)) / 2, 4
            )
            for q, r in retries.items():
                res = r.pop("retry_res", None)
                if res is None:
                    continue
                retry_norm = round(res["med"] / rf, 4) if rf else None
                first_norm = queries_normalized.get(q)
                r.update(
                    first_raw=timings.get(q),
                    first_norm=first_norm,
                    retry_norm=retry_norm,
                    factor=rf,
                )
                kept = q in errors or first_norm is None or (
                    retry_norm is not None and retry_norm < first_norm
                )
                r["kept"] = kept
                if not kept:
                    continue
                timings[q] = round(res["med"], 4)
                spreads[q] = round(res["spread"], 3)
                n_samples[q] = res["n_samples"]
                builds[q] = round(
                    min(builds.get(q, res["build_sec"]), res["build_sec"]), 4
                )
                loads[q] = r["load"]
                if retry_norm is not None:
                    queries_normalized[q] = retry_norm
                errors.pop(q, None)
                print(
                    f"# retry {q}: {timings[q]:.3f}s raw / {retry_norm} norm "
                    f"(first {r['first_raw']} raw / {first_norm} norm) — kept",
                    file=sys.stderr,
                )
            normalized_total_segmented = (
                round(sum(queries_normalized.values()), 4)
                if queries_normalized
                else None
            )

    total = round(sum(timings.values()), 4)
    normalized_total = round(total / calib_factor, 4) if calib_factor else None
    detail = {
        # stamped HERE (not at history-append) so BENCH_DETAIL.json and
        # the run's history row share one timestamp — the regression
        # gate keys its self-row exclusion on it (tools/bench_compare)
        "ts": round(time.time(), 1),
        "metric": "registry_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "runs_per_query": runs,
        "stat": "median_of_fastest",
        "spread": spreads,
        "spread_max": spread_max,
        "n_samples": n_samples,
        "loadavg_per_query": loads,
        # driver-side plan-construction time per query (min over samples)
        # — the r14 py4j-chain find, now a tracked metric (task 7)
        "build_sec": builds,
        # same-run retry record for gate-flagged queries (r14 task 1):
        # both measurements verbatim; `kept` says which one the maps above
        # carry. gate_first is the pre-retry verdict.
        "retries": retries,
        "gate_first": (
            {k: pre_gate[k] for k in ("status", "regressed")}
            if pre_gate is not None
            else None
        ),
        "calib_start": calib_start,
        "calib_end": calib_end,
        "calib_factor": calib_factor,
        "normalized_total_sec": normalized_total,
        # segment calibration (late r9): per-query normalization against
        # the probe pair that bracketed the query's own segment — the
        # gate prefers this map when present (tools/bench_compare)
        "calib_probes": calib_probes,
        "queries_normalized": queries_normalized,
        "normalized_total_segmented_sec": normalized_total_segmented,
        "cpus": cpus,
        "errors": errors,
        # external-contention attribution: this is a shared box, and a
        # loadavg near/above the CPU count from OTHER tenants inflates
        # shuffle-heavy queries 2-30x (see SCALE.md measurement-hygiene
        # note). Recorded so a slow round is distinguishable from a
        # regression after the fact.
        "loadavg_start": load_start,
        "loadavg_end": round(os.getloadavg()[0], 2),
        **gate,
    }
    # SPARK_GRAFT_BENCH_DETAIL: alternate detail path for off-default
    # scale runs (e.g. the sf1 scaling measurement → SCALE_SF1_DETAIL.json)
    # so they never clobber the driver-read sf0.1 BENCH_DETAIL.json
    detail["cross_round"] = _cross_round_table(
        here,
        {
            "round": "current",
            "total_sec": total,
            "loadavg_start": load_start,
            "loadavg_end": detail["loadavg_end"],
            "calib_cpu_sec": calib_start["cpu_sec"],
            "calib_shuffle_sec": calib_start["shuffle_sec"],
            "normalized_total_sec": normalized_total,
            # the segmented figure is the honest cross-round number —
            # leaving only the min-of-pair total here would record
            # exactly the artifact this round documents (review find)
            "normalized_total_segmented_sec": normalized_total_segmented,
        },
    )
    # Regression gate (r8 VERDICT task 4): run tools/bench_compare.py's
    # banding logic automatically over this run vs the normalized
    # history, print the verdict, and RECORD it — the falsifiable
    # harness acts on what it measures instead of relying on someone
    # remembering to run the tool. The gate never fails the bench
    # process (the driver needs the summary line regardless); a "fail"
    # status in the recorded block is the signal.
    try:
        from tools.bench_compare import compare as _gate_compare
        from tools.bench_compare import load_history as _gate_history
        from tools.bench_compare import render as _gate_render

        # explicit path: load_history honors SPARK_GRAFT_BENCH_HISTORY
        # for the replay-check subprocess, and a leftover export of it
        # in the caller's shell must not make the gate read one file
        # while the append below writes another (r14 review find)
        gate_result = _gate_compare(
            detail, _gate_history(os.path.join(here, "BENCH_HISTORY.jsonl"))
        )
        print("# regression gate:", file=sys.stderr)
        _gate_render(gate_result, out=sys.stderr)
    except Exception as exc:  # noqa: BLE001 - the gate must never cost
        # the run its record: a multi-minute suite just finished and the
        # detail/history/summary writes below are the whole point
        gate_result = {
            "status": "gate_error",
            "regressed": [],
            "error": f"{type(exc).__name__}: {exc}"[:300],
        }
        print(f"# regression gate ERROR: {gate_result['error']}", file=sys.stderr)
    detail["gate"] = gate_result

    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", os.path.join(here, "BENCH_DETAIL.json")
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as f:
        # history keeps the gate VERDICT but not the ~6 KB per_query
        # band table (derivable from fields already in the row; the full
        # block lives in BENCH_DETAIL.json) — the file is read whole by
        # every future gate run, so rows stay lean (review find)
        hist_row = {
            # leanness (same rationale as stripping gate.per_query):
            # nothing reads calib_probes or the cross_round table back
            # from history — queries_normalized is what the gate needs
            **{
                k: v
                for k, v in detail.items()
                if k not in ("cross_round", "calib_probes")
            },
            # the short key round records quote (r12 VERDICT: the round
            # record was only recoverable from SCALE.md prose) — same
            # value as normalized_total_segmented_sec, mirrored under
            # the stdout summary's name so history grep matches records
            "seg_norm_sec": normalized_total_segmented,
            "gate": {k: v for k, v in gate_result.items() if k != "per_query"},
        }
        # replay gate (r13 VERDICT task 2): the would-be row must not
        # break the pinned bench-compare replays. A failure is flagged
        # IN the row (the append still lands — losing a multi-minute
        # run's record would be worse) and shouted to stderr so the
        # recording commit runs the seconds-fast suite before landing.
        # The placeholder makes the TESTED row share the APPENDED row's
        # key set (r14 advice): a pinned replay asserting on row shape
        # must see the same keys the real file will carry.
        hist_row["replay_check"] = "pass"
        replay = _history_replay_check(here, hist_row)
        hist_row["replay_check"] = replay["status"]
        if replay["status"] == "fail":
            print(
                "# WARNING: this history row BREAKS a pinned bench-compare "
                "replay test — fix tests/test_bench_compare.py before "
                "committing this record:\n" + replay["detail"],
                file=sys.stderr,
            )
        # hist_row already carries detail["ts"] — same stamp in both files
        f.write(json.dumps(hist_row, separators=(",", ":")) + "\n")

    # The driver keeps only the final ~2000 chars of stdout, so the line
    # must be compact AND last. Spreads live in BENCH_DETAIL.json only;
    # 55 queries at 3 decimals measures ~1.7k chars. If the registry ever
    # grows past the capture window, degrade to summary-only rather than
    # emit a head-truncated (unparseable) line.
    summary = {
        "metric": "registry_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_val,
        # runs_per_query / stat moved OFF the stdout line in r12, and
        # calib_factor / norm_sec (the min-of-pair total — the less
        # honest figure next to the segmented one) followed in r14 when
        # the longer simhash_near_duplicates_md5 name squeezed the
        # worst-case line past the capture margin — all still ride in
        # BENCH_DETAIL.json and every history row. seg_norm_sec stays:
        # it is the round-record headline.
        "seg_norm_sec": normalized_total_segmented,
    }
    summary["gate"] = gate_result["status"]
    if gate_result["regressed"]:
        summary["gate_regressed"] = gate_result["regressed"]
    if errors:
        summary["errors"] = sorted(errors)
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900 and gate_result["regressed"]:
        # a long regressed-name list (the r10 first record: one 18-char
        # name pushed a 1878-char line over) must not cost the whole
        # per-query map — degrade the LIST first, to a count + leader
        summary["gate_regressed"] = (
            f"{len(gate_result['regressed'])}: {gate_result['regressed'][0]}…"
        )
        line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900:
        # then shave per-query precision (60 queries ≈ 60 chars)
        summary["queries"] = {k: round(v, 2) for k, v in timings.items()}
        line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900:
        # 1-decimal rung (r15: the 65-query registry left the 2-decimal
        # worst case 32 chars from the margin): coarse, but per-query
        # timings still ride the driver record — full precision lives
        # in BENCH_DETAIL.json and the history row regardless.
        # seg_norm_sec also steps off at this rung: it is mirrored in
        # every history row (where the record procedure reads it), and
        # 27 chars here is a whole query name's worth of margin.
        summary["queries"] = {k: round(v, 1) for k, v in timings.items()}
        summary.pop("seg_norm_sec", None)
        line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900:
        summary["queries"] = "see BENCH_DETAIL.json"
        line = json.dumps(summary, separators=(",", ":"))
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()

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
    # JVM/codegen warm-up so the first measured query isn't charged for it
    all_queries()["pricing_summary"].build(spark, sf_dir).collect()
    # Python-worker/Arrow warm-up: the first mapInPandas in a session pays
    # worker daemon spin-up; don't charge it to whichever query runs first
    spark.range(32).mapInPandas(lambda it: it, schema="id long").collect()

    # median-of-N with a warmed session: this box shows ±50% per-query
    # jitter (scheduler/GC/load), which best-of-2 cannot average away —
    # r01→r02 totals moved 1.49× with zero hot-path code changes. The
    # median is robust to one bad run each way; the per-query spread
    # (max-min)/median is emitted so a regression is distinguishable
    # from noise when comparing rounds.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, qdef in sorted(qs.items()):
        samples, n = [], 0
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                df = qdef.build(spark, sf_dir)
                n = len(df.toPandas())
                samples.append(time.perf_counter() - t0)
                # release localCheckpoint blocks: the py4j refs pin the
                # checkpointed RDDs until Python GC runs, so a 5×55-query
                # session otherwise accumulates hundreds of persisted blocks
                # (measured: 5 → 23 persistentRDDs in 5 runs of one query)
                del df
                gc.collect()
        except Exception as exc:  # noqa: BLE001 - one broken query must
            # not cost the round its whole perf record: mark and move on
            # (the summary line still parses; the error names the query)
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        samples.sort()
        med = samples[len(samples) // 2] if runs % 2 else (
            samples[runs // 2 - 1] + samples[runs // 2]
        ) / 2
        timings[name] = round(med, 4)
        spreads[name] = round((samples[-1] - samples[0]) / med, 3) if med else 0.0
        print(
            f"# {name}: {timings[name]:.3f}s ({n} rows, median of {runs}, "
            f"spread {spreads[name]:.0%})",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "metric": "registry_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "runs_per_query": runs,
        "stat": "median",
        "spread": spreads,
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
    here = os.path.dirname(os.path.abspath(__file__))
    # SPARK_GRAFT_BENCH_DETAIL: alternate detail path for off-default
    # scale runs (e.g. the sf1 scaling measurement → SCALE_SF1_DETAIL.json)
    # so they never clobber the driver-read sf0.1 BENCH_DETAIL.json
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", os.path.join(here, "BENCH_DETAIL.json")
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as f:
        f.write(
            json.dumps(
                {"ts": round(time.time(), 1), **detail}, separators=(",", ":")
            )
            + "\n"
        )

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
        "runs_per_query": runs,
        "stat": "median",
    }
    if errors:
        summary["errors"] = sorted(errors)
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900:
        summary["queries"] = "see BENCH_DETAIL.json"
        line = json.dumps(summary, separators=(",", ":"))
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()

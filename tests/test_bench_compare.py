"""Unit coverage for tools/bench_compare.py's banding logic: median
baseline (not min), calibration normalization, load-aware widening, the
absolute sub-second floor, and the exit contract."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "bench_compare.py")


def _run(tmp_path, detail, history_rows, extra_args=()):
    # the tool resolves history relative to its own repo root, so stage a
    # mini-repo: copy the script into tmp and point --detail at our file
    import shutil

    tools_dir = tmp_path / "tools"
    tools_dir.mkdir(exist_ok=True)
    shutil.copy(TOOL, tools_dir / "bench_compare.py")
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in history_rows)
    )
    detail_path = tmp_path / "BENCH_DETAIL.json"
    detail_path.write_text(json.dumps(detail))
    proc = subprocess.run(
        [sys.executable, str(tools_dir / "bench_compare.py"),
         "--detail", str(detail_path), *extra_args],
        capture_output=True, text=True,
    )
    return proc.returncode, proc.stdout


def _rec(value, factor, queries, spreads=None, loads=None, sf=0.1):
    return {
        "sf": sf, "value": value, "calib_factor": factor,
        "queries": queries,
        "spread": spreads or {k: 0.05 for k in queries},
        "loadavg_per_query": loads or {k: 1.0 for k in queries},
    }


def test_within_band_passes_and_normalizes(tmp_path):
    hist = [_rec(1.0, 1.0, {"q": 1.0}), _rec(1.05, 1.0, {"q": 1.05})]
    # current run measured on a 2x-slower box: nominal 2.1 but factor 2.0
    # normalizes to 1.05 — inside the band
    rc, out = _run(tmp_path, _rec(2.1, 2.0, {"q": 2.1}), hist)
    assert rc == 0, out
    assert "1.05" in out and "ok" in out


def test_real_regression_fails(tmp_path):
    hist = [_rec(1.0, 1.0, {"q": 1.0}), _rec(1.05, 1.0, {"q": 1.05})]
    rc, out = _run(tmp_path, _rec(2.4, 1.0, {"q": 2.4}), hist)
    assert rc == 1
    assert "REGRESSED" in out


def test_median_not_min_baseline(tmp_path):
    # one lucky 0.5 sample must not set the bar: median of [0.5, 1.0,
    # 1.02] is 1.0, so a 1.2 current (ratio 1.2 < band) passes
    hist = [
        _rec(0.5, 1.0, {"q": 0.5}),
        _rec(1.0, 1.0, {"q": 1.0}),
        _rec(1.02, 1.0, {"q": 1.02}),
    ]
    rc, out = _run(tmp_path, _rec(1.2, 1.0, {"q": 1.2}), hist)
    assert rc == 0, out


def test_abs_floor_spares_subsecond_jitter(tmp_path):
    # 0.1 -> 0.2 is 2x but only +0.1s: under the 0.3s floor → ok
    hist = [_rec(0.1, 1.0, {"q": 0.1})]
    rc, out = _run(tmp_path, _rec(0.2, 1.0, {"q": 0.2}), hist)
    assert rc == 0, out


def test_load_widening_absorbs_contention(tmp_path):
    # 1.0 -> 1.6 (ratio 1.6 > base band 1.3) but the current sample ran
    # at loadavg 5 vs 1 → +0.32 band → passes; same ratio at equal load
    # fails
    hist = [_rec(1.0, 1.0, {"q": 1.0})]
    cur_hot = _rec(1.6, 1.0, {"q": 1.6}, loads={"q": 5.0})
    rc, out = _run(tmp_path, cur_hot, hist)
    assert rc == 0, out
    cur_cool = _rec(1.6, 1.0, {"q": 1.6}, loads={"q": 1.0})
    rc, out = _run(tmp_path, cur_cool, hist)
    assert rc == 1, out


def test_pre_r8_history_skipped_and_new_queries_reported(tmp_path):
    hist = [
        {"sf": 0.1, "value": 9.9, "queries": {"q": 0.1}},  # no calib → skip
        # distinct total from the current run (same-total rows are
        # treated as the current run's own history row and excluded)
        _rec(1.01, 1.0, {"q": 1.0}),
    ]
    rc, out = _run(tmp_path, _rec(1.5, 1.0, {"q": 1.0, "brand_new": 0.5}), hist)
    assert rc == 0
    assert "NEW" in out


def test_compare_in_process_api():
    """bench.py consumes compare() directly (the r8-VERDICT wiring), so
    the in-process API must agree with the CLI: same banding, a
    JSON-serializable verdict, and the current run's own history row
    excluded by total."""
    sys.path.insert(0, REPO)
    from tools.bench_compare import compare

    hist = [_rec(1.0, 1.0, {"q": 1.0}), _rec(1.05, 1.0, {"q": 1.05})]
    ok = compare(_rec(2.1, 2.0, {"q": 2.1}), hist)
    assert ok["status"] == "pass" and ok["regressed"] == []
    assert ok["per_query"]["q"]["verdict"] == "ok"
    bad = compare(_rec(2.4, 1.0, {"q": 2.4}), hist)
    assert bad["status"] == "fail" and bad["regressed"] == ["q"]
    assert bad["per_query"]["q"]["verdict"] == "REGRESSED"
    # current run's own history row (same total) must not self-baseline
    only_self = compare(_rec(2.4, 1.0, {"q": 2.4}), [_rec(2.4, 1.0, {"q": 2.4})])
    assert only_self["status"] == "no_history"
    assert compare({"sf": 0.1, "value": 1.0, "queries": {}}, hist)["status"] == (
        "no_calibration"
    )
    # everything bench.py writes into BENCH_DETAIL must serialize
    json.dumps({"gate": bad})


def test_bench_records_gate_block():
    """bench.py must invoke the gate after each suite and record the
    verdict in the detail record (r8 VERDICT task 4) — pinned at the
    source level because a full bench run spins a Spark session."""
    src = open(os.path.join(REPO, "bench.py")).read()
    assert "from tools.bench_compare import compare" in src
    assert 'detail["gate"] = gate_result' in src
    assert '"gate"' in src and "_gate_render(gate_result" in src
    assert 'summary["gate"] = gate_result["status"]' in src
    # the gate must never cost a completed run its record (review find):
    # any gate exception degrades to a recorded gate_error status
    assert '"gate_error"' in src
    # and history rows must stay lean: verdict recorded, band table not
    assert 'k != "per_query"' in src


def test_errored_query_fails_gate_but_subset_runs_pass():
    """Regressed-to-a-crash must not read as 'pass' (review find): a
    query the current run ERRORED on, that history has timings for,
    fails the gate with an ERRORED verdict. A query merely absent from
    a SPARK_GRAFT_BENCH_ONLY subset run (no error recorded) is ignored."""
    sys.path.insert(0, REPO)
    from tools.bench_compare import compare

    hist = [_rec(2.0, 1.0, {"q": 1.0, "other": 1.0})]
    crashed = {**_rec(1.0, 1.0, {"other": 1.0}), "errors": {"q": "Boom: died"}}
    res = compare(crashed, hist)
    assert res["status"] == "fail" and res["regressed"] == ["q"]
    assert res["per_query"]["q"]["verdict"] == "ERRORED"
    # subset run: 'q' absent but NOT errored -> gate ignores it
    subset = _rec(1.0, 1.0, {"other": 1.0})
    assert compare(subset, hist)["status"] == "pass"


def test_corrupt_history_line_does_not_disable_the_gate(tmp_path):
    """A truncated tail line (bench killed mid-append) must cost only
    that line, not the whole history — otherwise the gate passes
    vacuously forever (review find)."""
    import json as _json

    sys.path.insert(0, REPO)
    from tools.bench_compare import load_history

    p = tmp_path / "BENCH_HISTORY.jsonl"
    good = _rec(1.0, 1.0, {"q": 1.0})
    p.write_text(
        _json.dumps(good) + "\n"
        + "null\n"                       # valid JSON, not an object
        + '{"sf": 0.1, "value": 1.5, "queries": {"q"'  # truncated tail
    )
    rows = load_history(str(p))
    assert rows == [good]


def test_segment_normalization_preferred_and_prices_midrun_contention():
    """Late-r9 segment calibration: _normalized prefers the per-query
    queries_normalized map when present (falling back to the suite-level
    factor otherwise), and bench._per_query_factors prices a query by
    the MEAN of its two bracketing probes — so contention that arrives
    mid-run normalizes exactly the queries it hit."""
    sys.path.insert(0, REPO)
    import bench
    from tools.bench_compare import _normalized

    # preference: segment map wins over the factor path
    rec = {**_rec(2.0, 2.0, {"q": 2.0}), "queries_normalized": {"q": 1.23}}
    assert _normalized(rec) == {"q": 1.23}
    assert _normalized(_rec(2.0, 2.0, {"q": 2.0})) == {"q": 1.0}  # fallback

    # probes at boundaries 0 (factor 1.0), 2 (3.0: contention arrived),
    # 4 (1.0: contention left); queries at iterations 0..3
    boundaries = [(0, 1.0), (2, 3.0), (4, 1.0)]
    positions = {"a": 0, "b": 1, "c": 2, "d": 3}
    factors = bench._per_query_factors(boundaries, positions)
    # a,b bracketed by (1.0, 3.0) -> 2.0 ; c,d by (3.0, 1.0) -> 2.0
    assert factors == {"a": 2.0, "b": 2.0, "c": 2.0, "d": 2.0}
    # asymmetric: probe only got hot at the END
    factors = bench._per_query_factors([(0, 1.0), (2, 1.0), (4, 3.0)], positions)
    assert factors["a"] == 1.0 and factors["d"] == 2.0
    # a query with no bracketing probe pair is skipped, not mispriced
    assert bench._per_query_factors([(0, 1.0)], {"a": 0}) == {}

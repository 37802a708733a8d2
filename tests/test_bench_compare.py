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
    # strip the replay-check override: when THIS file runs inside
    # bench.py's _history_replay_check subprocess the env var points at
    # the candidate history, and these staged-mini-repo tests must keep
    # reading their own tmp file
    env = {k: v for k, v in os.environ.items()
           if k != "SPARK_GRAFT_BENCH_HISTORY"}
    proc = subprocess.run(
        [sys.executable, str(tools_dir / "bench_compare.py"),
         "--detail", str(detail_path), *extra_args],
        capture_output=True, text=True, env=env,
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
    # 1.02] is 1.0, so a 1.15 current (ratio 1.15 < band ≈ 1.17) passes
    # — against a min baseline it would read as a 2.3x "regression"
    hist = [
        _rec(0.5, 1.0, {"q": 0.5}),
        _rec(1.0, 1.0, {"q": 1.0}),
        _rec(1.02, 1.0, {"q": 1.02}),
    ]
    rc, out = _run(tmp_path, _rec(1.15, 1.0, {"q": 1.15}), hist)
    assert rc == 0, out


def test_abs_floor_spares_subsecond_jitter(tmp_path):
    # 0.1 -> 0.18 is 1.8x but only +0.08s: under the 0.1s floor → ok
    hist = [_rec(0.1, 1.0, {"q": 0.1})]
    rc, out = _run(tmp_path, _rec(0.18, 1.0, {"q": 0.18}), hist)
    assert rc == 0, out


def test_load_widening_absorbs_unpriced_contention_only(tmp_path):
    # 1.0 -> 1.4 (ratio 1.4 > base band ≈ 1.17) but the current sample
    # ran at loadavg 5 vs 1 with calibration factor 1.0 (probes saw a
    # calm box — the contention was NOT priced) → +0.32 band → passes;
    # same ratio at equal load fails
    hist = [_rec(1.0, 1.0, {"q": 1.0})]
    cur_hot = _rec(1.4, 1.0, {"q": 1.4}, loads={"q": 5.0})
    rc, out = _run(tmp_path, cur_hot, hist)
    assert rc == 0, out
    cur_cool = _rec(1.4, 1.0, {"q": 1.4}, loads={"q": 1.0})
    rc, out = _run(tmp_path, cur_cool, hist)
    assert rc == 1, out
    # r10 recalibration: when the segment calibration ALREADY priced the
    # query's contention (factor = raw/normalized ≥ 1.05), the loadavg
    # allowance would double-count it — no widening, the 1.4x normalized
    # regression trips even at loadavg 5
    cur_priced = {
        **_rec(1.54, 1.0, {"q": 1.54}, loads={"q": 5.0}),
        "queries_normalized": {"q": 1.4},  # factor 1.1 — priced
    }
    rc, out = _run(tmp_path, cur_priced, hist)
    assert rc == 1, out


def test_pre_r8_history_skipped_and_new_queries_reported(tmp_path):
    hist = [
        {"sf": 0.1, "value": 9.9, "queries": {"q": 0.1}},  # no calib → skip
        _rec(1.01, 1.0, {"q": 1.0}),
    ]
    rc, out = _run(tmp_path, _rec(1.5, 1.0, {"q": 1.0, "brand_new": 0.5}), hist)
    assert rc == 0
    assert "NEW" in out


def test_self_row_excluded_by_ts_not_total(tmp_path):
    """The current run's own history row is keyed by the shared `ts`
    stamp, NOT by raw-total equality — a genuine historical run that
    happens to share the rounded total must stay in the baseline
    (review find)."""
    sys.path.insert(0, REPO)
    from tools.bench_compare import compare

    # same-ts row is the self row → excluded → no usable history
    self_row = {**_rec(2.4, 1.0, {"q": 2.4}), "ts": 123.4}
    assert compare(self_row, [self_row])["status"] == "no_history"
    # a DIFFERENT run sharing the total stays in: q regressed 2.4 vs its
    # 1.0 baseline and the gate sees it
    other_same_total = {**_rec(2.4, 1.0, {"q": 1.0}), "ts": 99.9}
    res = compare(self_row, [self_row, other_same_total])
    assert res["status"] == "fail" and res["regressed"] == ["q"]
    # legacy CLI path (detail without ts): only the NEWEST same-sf row
    # with a matching total is dropped — an older run sharing the total
    # still baselines
    hist = [
        {**_rec(2.4, 1.0, {"q": 1.0}), "ts": 1.0},   # genuine old run
        {**_rec(2.4, 1.0, {"q": 2.4}), "ts": 2.0},   # the self row (newest)
    ]
    rc, out = _run(tmp_path, _rec(2.4, 1.0, {"q": 2.4}), hist)
    assert rc == 1 and "REGRESSED" in out


def test_compare_in_process_api():
    """bench.py consumes compare() directly (the r8-VERDICT wiring), so
    the in-process API must agree with the CLI: same banding, a
    JSON-serializable verdict, and the current run's own history row
    excluded by its ts stamp."""
    sys.path.insert(0, REPO)
    from tools.bench_compare import compare

    hist = [_rec(1.0, 1.0, {"q": 1.0}), _rec(1.05, 1.0, {"q": 1.05})]
    ok = compare(_rec(2.1, 2.0, {"q": 2.1}), hist)
    assert ok["status"] == "pass" and ok["regressed"] == []
    assert ok["per_query"]["q"]["verdict"] == "ok"
    bad = compare(_rec(2.4, 1.0, {"q": 2.4}), hist)
    assert bad["status"] == "fail" and bad["regressed"] == ["q"]
    assert bad["per_query"]["q"]["verdict"] == "REGRESSED"
    # current run's own history row (same ts stamp) must not self-baseline
    self_row = {**_rec(2.4, 1.0, {"q": 2.4}), "ts": 7.0}
    only_self = compare(self_row, [self_row])
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


def test_r10_recalibration_catches_subsecond_regression():
    """The r10 done criterion, synthetic half: a 1.3x regression on a
    0.5 s query — invisible under the old band (sum-of-spreads + 0.20
    margin + 0.3 s floor) — trips the recalibrated gate. Spreads are the
    observed history p50 (0.112)."""
    sys.path.insert(0, REPO)
    from tools.bench_compare import compare

    sp = {"q": 0.112}
    hist = [
        {**_rec(0.50, 1.0, {"q": 0.50}, spreads=sp), "ts": float(i)}
        for i in range(3)
    ]
    cur = {**_rec(0.65, 1.0, {"q": 0.65}, spreads=sp), "ts": 9.0}
    res = compare(cur, hist)
    assert res["status"] == "fail" and res["regressed"] == ["q"]
    # ratio 1.3 vs band 1 + sqrt(2)*0.112 + 0.10 ≈ 1.258; delta 0.15 > 0.1
    assert res["per_query"]["q"]["ratio"] == 1.3
    assert res["per_query"]["q"]["band"] < 1.3


R9_CLOSING_TS = 1786782800.5  # the driver-recorded r9 bench (38.23 s raw)


def _r9_replay():
    sys.path.insert(0, REPO)
    from tools.bench_compare import load_history

    rows = load_history()
    closing = [r for r in rows if r.get("ts") == R9_CLOSING_TS]
    if not closing:
        return None, None
    hist = [r for r in rows if (r.get("ts") or 0) < R9_CLOSING_TS]
    return closing[0], hist


def test_r10_recalibration_passes_real_r9_record():
    """The r10 done criterion, replay half: the real r9 closing record —
    measured on a load-contaminated box (loadavg 2.1→9.5, first-segment
    factor 1.47) — still passes the tightened gate, because segment
    normalization priced the contention. Pinned against the immutable
    history prefix (rows only ever append), so this replay never drifts."""
    sys.path.insert(0, REPO)
    from tools.bench_compare import compare

    closing, hist = _r9_replay()
    if closing is None:
        import pytest

        pytest.skip("r9 closing record not in BENCH_HISTORY.jsonl")
    res = compare(closing, hist)
    assert res["status"] == "pass", res["regressed"]
    # not vacuous: dozens of queries actually gated against real history
    gated = [q for q, row in res["per_query"].items() if row["verdict"] == "ok"]
    assert len(gated) >= 50


def test_r10_recalibration_catches_synthetic_regression_in_real_record():
    """Strongest form: inject a 1.3x regression into ONE sub-second query
    of the real r9 record and the gate trips on exactly that query —
    with the old constants this was impossible for any of the 47
    sub-second queries."""
    import copy

    sys.path.insert(0, REPO)
    from tools.bench_compare import compare

    closing, hist = _r9_replay()
    if closing is None:
        import pytest

        pytest.skip("r9 closing record not in BENCH_HISTORY.jsonl")
    cur = copy.deepcopy(closing)
    victim = "sessionize_gap"  # 0.43 s normalized in the r9 record
    assert cur["queries_normalized"][victim] < 1.0
    cur["queries_normalized"][victim] *= 1.3
    cur["queries"][victim] *= 1.3
    res = compare(cur, hist)
    assert victim in res["regressed"], res["per_query"][victim]


R10_FIRST_TS = 1786791165.5  # the r10 run that first tripped the tight band


def test_empirical_support_absorbs_bimodal_query_noise():
    """Observed false positive, pinned from the real records: the first
    r10 bench run flagged embedding_near_dup at ratio 1.211 (band 1.208
    — within-run spread 0.054 made the band tight), yet the query's
    normalized history spans 0.83-1.21 over 21 same-code runs: today's
    value sits INSIDE its own empirical support. The support condition
    (cur > max(last 12 runs) * 1.05) must absorb it — and a genuine
    regression clear of the support must still trip."""
    sys.path.insert(0, REPO)
    from tools.bench_compare import compare, load_history

    rows = load_history()
    current = [r for r in rows if r.get("ts") == R10_FIRST_TS]
    if not current:
        import pytest

        pytest.skip("r10 first record not in BENCH_HISTORY.jsonl")
    hist = [r for r in rows if (r.get("ts") or 0) < R10_FIRST_TS]
    res = compare(current[0], hist)
    assert res["status"] == "pass", res["regressed"]
    row = res["per_query"]["embedding_near_dup"]
    assert row["verdict"] == "ok" and row["ratio"] > row["band"]  # support saved it
    # a value clear of the support on the same history still trips
    import copy

    bad = copy.deepcopy(current[0])
    bad["queries_normalized"]["embedding_near_dup"] *= 1.3  # ~1.57 normalized
    res2 = compare(bad, hist)
    assert "embedding_near_dup" in res2["regressed"]


def test_support_window_uses_recent_runs_only():
    """One ancient slow run must not widen the support forever: only the
    last SUPPORT_WINDOW rows count."""
    sys.path.insert(0, REPO)
    from tools.bench_compare import SUPPORT_WINDOW, compare

    old_slow = {**_rec(2.0, 1.0, {"q": 2.0}), "ts": 0.0}
    steady = [
        {**_rec(1.0, 1.0, {"q": 1.0}), "ts": float(i + 1)}
        for i in range(SUPPORT_WINDOW)
    ]
    cur = {**_rec(1.4, 1.0, {"q": 1.4}), "ts": 99.0}
    res = compare(cur, [old_slow, *steady])
    # the 2.0 run fell out of the window: support = 1.0*1.05, so the
    # 1.4x regression trips even though history CONTAINS a 2.0
    assert res["status"] == "fail" and res["regressed"] == ["q"]


R10_SECOND_TS = 1786791940.0  # the calm-window r10 run (sessionize flag)


def test_support_margin_absorbs_observed_tail_excursions():
    """Second observed same-code false positive, pinned: the calm r10
    run flagged sessionize_gap at 0.484 normalized — 1.14x its prior
    recent max, with nothing on its code path changed. The history-wide
    excursion statistic value/max(prior 12) reaches p99.5 = 1.18 on
    same-code runs, so the support margin is 0.15; this replay must
    pass, and a 1.3x injection on the same query/history still trips."""
    import copy

    sys.path.insert(0, REPO)
    from tools.bench_compare import compare, load_history

    rows = load_history()
    current = [r for r in rows if r.get("ts") == R10_SECOND_TS]
    if not current:
        import pytest

        pytest.skip("r10 second record not in BENCH_HISTORY.jsonl")
    hist = [r for r in rows if (r.get("ts") or 0) < R10_SECOND_TS]
    res = compare(current[0], hist)
    assert res["status"] == "pass", res["regressed"]
    bad = copy.deepcopy(current[0])
    bad["queries_normalized"]["sessionize_gap"] *= 1.3
    assert "sessionize_gap" in compare(bad, hist)["regressed"]


def test_flagged_rows_do_not_enter_support_window(tmp_path):
    """r10 ADVICE (medium): bench.py appends history unconditionally, so
    a genuine regression's own row would otherwise raise the support max
    and every later run of the unfixed code passes silently. A row whose
    gate flagged q as REGRESSED must be excluded from q's support
    window; an equally-slow follow-up run must STILL fail."""
    from tools.bench_compare import compare

    clean = [_rec(1.0, 1.0, {"q": 1.0}) for _ in range(3)]
    # the regression run: 2.0 normalized, flagged by its own gate
    bad = _rec(2.0, 1.0, {"q": 2.0})
    bad["gate"] = {"status": "fail", "regressed": ["q"]}
    history = clean + [bad]

    follow_up = _rec(1.95, 1.0, {"q": 1.95})
    result = compare(follow_up, history)
    assert result["status"] == "fail" and result["regressed"] == ["q"]
    # support came from the clean runs only (max 1.0 * 1.15)
    assert result["per_query"]["q"]["support"] == 1.15

    # control: with the flag stripped (the pre-fix behavior's input),
    # the bad row's value would have supported the follow-up
    bad_unflagged = _rec(2.0, 1.0, {"q": 2.0})
    result2 = compare(follow_up, clean + [bad_unflagged])
    assert result2["status"] == "pass"


def test_all_flagged_history_keeps_failing(tmp_path):
    """When EVERY recent row flagged q, there is no clean support at all
    — the gate must keep failing rather than crash or pass vacuously."""
    from tools.bench_compare import compare

    base = [_rec(1.0, 1.0, {"q": 1.0})]
    bads = []
    for _ in range(3):
        b = _rec(2.0, 1.0, {"q": 2.0})
        b["gate"] = {"status": "fail", "regressed": ["q"]}
        bads.append(b)
    # current matches the flagged plateau; baseline median is 2.0 so the
    # ratio is fine — but q has support ONLY from the clean 1.0 run
    result = compare(_rec(1.9, 1.0, {"q": 1.9}), base + bads)
    assert result["per_query"]["q"]["support"] == 1.15
    assert result["status"] == "fail"


def test_flagged_only_history_fails_until_fixed(tmp_path):
    """A query whose ENTIRE history is flagged rows has no clean
    baseline: it keeps failing at the flagged plateau — but a run
    strictly faster than every flagged value is the fix and must pass,
    or no clean row could ever re-seed the history (deadlock)."""
    from tools.bench_compare import compare

    bads = []
    for v in (2.0, 2.1):
        b = _rec(v, 1.0, {"q": v})
        b["gate"] = {"status": "fail", "regressed": ["q"]}
        bads.append(b)
    still_slow = compare(_rec(2.05, 1.0, {"q": 2.05}), bads)
    assert still_slow["status"] == "fail"
    assert still_slow["per_query"]["q"]["verdict"] == "REGRESSED"
    # a noise excursion just UNDER the plateau is not a fix: strict-min
    # acceptance would let the unfixed code re-seed clean history at
    # the regressed level within a few runs (review find) — the fix
    # must clear the plateau by the 15% support margin
    near_miss = compare(_rec(1.95, 1.0, {"q": 1.95}), bads)
    assert near_miss["status"] == "fail"
    fixed = compare(_rec(1.0, 1.0, {"q": 1.0}), bads)
    assert fixed["status"] == "pass"
    assert fixed["per_query"]["q"]["verdict"] == "ok"


def test_errored_query_with_flagged_only_history_still_fails(tmp_path):
    """Self-review r11: a query whose entire history is flagged rows and
    which ERRORS in the current run must fail the gate — 'regressed to a
    crash' is the worst regression, with or without a clean baseline."""
    from tools.bench_compare import compare

    bad = _rec(2.0, 1.0, {"q": 2.0, "other": 1.0})
    bad["gate"] = {"status": "fail", "regressed": ["q"]}
    cur = _rec(1.0, 1.0, {"other": 1.0})
    cur["errors"] = {"q": "RuntimeError: boom"}
    result = compare(cur, [bad])
    assert result["status"] == "fail"
    assert result["per_query"]["q"]["verdict"] == "ERRORED"


R11_EXCURSION_TS = 1786826676.2  # the tenth r11 run (dedup_exact flag)


def test_r11_dedup_exact_excursion_is_the_calibrated_false_positive():
    """Third observed same-code tail excursion, pinned: the tenth r11
    run flagged dedup_exact at 0.503 normalized — 1.17x its prior max
    over NINE same-code runs that day (0.366-0.431; the operator and
    its whole query path are untouched by every r11 commit). At the
    documented ~0.12 expected false flags per 60-query run, one flag in
    ten runs is on expectation, so the margin stays at 0.15 and this
    replay must keep FAILING (the gate stays honest about what it
    measured) — while the flagged-row exclusion keeps the excursion out
    of future null distributions: a follow-up at the day's normal level
    passes with support built from the clean runs only."""
    import copy

    sys.path.insert(0, REPO)
    from tools.bench_compare import compare, load_history

    rows = load_history()
    current = [r for r in rows if r.get("ts") == R11_EXCURSION_TS]
    if not current:
        import pytest

        pytest.skip("r11 excursion record not in BENCH_HISTORY.jsonl")
    hist = [r for r in rows if (r.get("ts") or 0) < R11_EXCURSION_TS]
    res = compare(current[0], hist)
    assert res["status"] == "fail"
    assert res["regressed"] == ["dedup_exact"]
    # the flagged row must not poison the future: a synthetic follow-up
    # at the day's normal level (its own prior median) passes, and its
    # support max comes from the CLEAN runs, not the 0.503 excursion.
    # The follow-up's history is bounded to the rows that existed AT the
    # excursion (ts <= R11_EXCURSION_TS, excursion row included — it is
    # flagged, so its exclusion from support is the property under
    # test). Unbounded, the slice grew with every later bench run and a
    # legitimately loaded-but-clean r13 run pushed dedup_exact's clean
    # max past the 0.578 ceiling, failing this replay with zero code
    # change on the gate or the operator (r13 VERDICT task 1).
    follow = copy.deepcopy(current[0])
    follow["ts"] = R11_EXCURSION_TS + 1
    med = res["per_query"]["dedup_exact"]["hist"]
    follow["queries_normalized"]["dedup_exact"] = med
    r11_rows = [r for r in rows if (r.get("ts") or 0) <= R11_EXCURSION_TS]
    res2 = compare(follow, r11_rows)
    assert res2["per_query"]["dedup_exact"]["verdict"] == "ok"
    assert res2["per_query"]["dedup_exact"]["support"] < 0.503 * 1.15


def test_history_append_replay_gate_flags_breaking_row():
    """r13 VERDICT task 2: a history append that breaks a pinned replay
    test must be flagged at record time. bench.py's
    _history_replay_check runs THIS file against existing-history+row;
    a row that violates the seg_norm_sec invariant (the cheapest pinned
    property a record can break) must come back 'fail', and a clean
    mirror of the newest real row must come back 'pass'."""
    import os as _os

    import pytest

    if _os.environ.get("SPARK_GRAFT_BENCH_HISTORY"):
        # we ARE the replay check's inner pytest — recursing would fork
        # a subprocess per append forever; the gate only pins the
        # history-coupled replays, which run above
        pytest.skip("inside a replay-check subprocess")
    sys.path.insert(0, REPO)
    import bench

    bad = _rec(1.0, 1.0, {"q": 1.0})
    bad["ts"] = 9999999999.0
    # segment-era row WITHOUT seg_norm_sec — violates the pinned
    # invariant test_history_segment_era_rows_carry_seg_norm_sec
    bad["queries_normalized"] = {"q": 1.0}
    res = bench._history_replay_check(REPO, bad)
    assert res["status"] == "fail", res

    from tools.bench_compare import load_history

    rows = load_history()
    era = [r for r in rows if r.get("queries_normalized")]
    if not era:
        pytest.skip("no segment-era history to mirror")
    good = dict(era[-1])
    good["ts"] = 9999999999.0
    res2 = bench._history_replay_check(REPO, good)
    assert res2["status"] == "pass", res2


def test_history_segment_era_rows_carry_seg_norm_sec():
    """r12 VERDICT task 5: the round record (segnorm) must be machine-
    readable from BENCH_HISTORY.jsonl, not just SCALE.md prose. Every
    segment-era row (one that carries queries_normalized) must carry a
    non-null seg_norm_sec equal to its normalized_total_segmented_sec —
    the short key round records and the stdout summary quote."""
    from tools.bench_compare import load_history

    rows = load_history()
    era = [r for r in rows if r.get("queries_normalized")]
    assert era, "no segment-era rows in history"
    for r in era:
        assert r.get("seg_norm_sec") is not None, r.get("ts")
        assert r["seg_norm_sec"] == r.get("normalized_total_segmented_sec"), (
            r.get("ts")
        )


def test_build_time_guard_is_informational():
    """r14 VERDICT task 7: build_sec rides in history rows and compare()
    lists construction-latency creep (>1.5x recent max AND >0.15 s
    delta) in `build_regressed` — WITHOUT failing the gate, because a
    legitimate plan change moves build time and the round review, not
    the gate, adjudicates it."""
    sys.path.insert(0, REPO)
    from tools.bench_compare import compare

    def rec(build, **kw):
        r = _rec(1.0, 1.0, {"q": 1.0}, **kw)
        r["build_sec"] = {"q": build}
        return r

    hist = [rec(0.10), rec(0.11), rec(0.12)]
    # execution in band, build crept 0.12 -> 0.40 (>1.5x max, delta >0.15)
    crept = rec(0.40)
    res = compare(crept, hist)
    assert res["status"] == "pass"  # informational only
    assert res["build_regressed"] == ["q"]
    # small absolute creep on a tiny build is absorbed by the 0.15 s floor
    res2 = compare(rec(0.20), hist)
    assert res2["build_regressed"] == []
    # fewer than 3 recorded builds -> no baseline, never listed
    res3 = compare(rec(9.9), hist[:2])
    assert res3["build_regressed"] == []
    json.dumps(res)  # still serializable for the detail/history records


def test_retry_record_shape_in_history():
    """r14 VERDICT task 1: runs recorded after the retry mechanism carry
    the retry bookkeeping — `retries` (both measurements verbatim when a
    retry happened) and `gate_first` (the pre-retry verdict) — so a
    closing record that self-pinned a load flag is fully auditable. Rows
    predating r15 don't carry the keys; rows carrying them must be
    consistent: every kept retry's query must appear in `queries`, and a
    gate_first fail that the final gate passes must have retries for the
    flagged names (that IS the self-pin)."""
    from tools.bench_compare import load_history

    rows = load_history()
    era = [r for r in rows if "gate_first" in r]
    for r in era:
        retries = r.get("retries") or {}
        for q, rr in retries.items():
            assert isinstance(rr, dict), (r.get("ts"), q)
            if rr.get("kept"):
                assert q in (r.get("queries") or {}), (r.get("ts"), q)
                # both measurements recorded verbatim unless the first
                # attempt ERRORED (then there is no first_raw to record)
                assert "retry_raw" in rr, (r.get("ts"), q)
        gf = r.get("gate_first") or {}
        if gf.get("status") == "fail" and (r.get("gate") or {}).get(
            "status"
        ) == "pass":
            for q in gf.get("regressed") or []:
                assert q in retries, (r.get("ts"), q)

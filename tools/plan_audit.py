"""Physical-plan audit over every registry query: mechanically verify
the scale claims SCALE.md makes in prose.

For each `queries()` entry (built against sf0.001 — plan shapes don't
depend on data volume) the audit inspects the executed plan string and
flags:

- `CartesianProduct` / `BroadcastNestedLoopJoin` — an all-pairs join
  that would never finish at 100 TB (none of our operators need one);
- `BatchEvalPython` — a row-at-a-time Python UDF in the plan (every
  Python boundary here must be Arrow-batched: ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas);
- fact-side scans with no pushed filter where the query is known to be
  selective (spot list below) — a regression in predicate pushdown.

Exit code != 0 when any violation is found, so this can run as a gate.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from ethereum_analytical_db_spark.session import get_spark

# plan fragments that must never appear, and what they mean
FORBIDDEN = {
    "CartesianProduct": "all-pairs join (O(n^2) shuffle-free cross product)",
    "BroadcastNestedLoopJoin": "nested-loop join (no equi-key; quadratic work)",
    "BatchEvalPython": "row-at-a-time Python UDF (must be Arrow-batched)",
}

# queries whose Parquet fact scan must carry a pushed/data filter —
# a missing PushedFilters/DataFilters entry here means a pushdown broke
# union_all_universe carries the IN-list filters on its orders/customer
# legs (the standalone in_list_filter query was folded into it)
MUST_PUSH = {
    "union_all_universe",
    "scan_projection",
}


def audit(name: str, plan: str) -> list[str]:
    problems = []
    for frag, why in FORBIDDEN.items():
        if frag in plan:
            problems.append(f"{frag}: {why}")
    if name in MUST_PUSH:
        pushed = re.findall(r"(?:PushedFilters|DataFilters): \[([^\]]*)\]", plan)
        if not any(p.strip() for p in pushed):
            problems.append("no pushed/data filter on a selective scan")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    registered = set(entry_mod.queries())
    stale = MUST_PUSH - registered
    if stale:  # a renamed/removed query must not silently skip its gate
        print(f"STALE MUST_PUSH entries (not in registry): {sorted(stale)}")
        return 1
    spark = get_spark(app_name="plan_audit", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")

    failures = 0
    for name, fn in sorted(entry_mod.queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - report, keep auditing
            print(f"ERROR {name}: {exc}")
            failures += 1
            continue
        problems = audit(name, plan)
        if problems:
            failures += 1
            print(f"FLAG  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}")
    print(f"\n{failures} flagged")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

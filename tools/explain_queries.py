"""Capture .explain("formatted") for named registry queries into files.

Usage:
    python tools/explain_queries.py OUTDIR SUFFIX q1 q2 ...

Writes OUTDIR/<query>_<SUFFIX>.txt for each query. Used by the
optimization rounds to commit before/after physical plans
(plans/r16/<query>_before.txt / _after.txt) so plan-shape claims in
OPTIMIZATION_r16.md are checkable without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ethereum_analytical_db_spark.plans.registry import all_queries  # noqa: E402
from ethereum_analytical_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        qdef = qs[name]
        if qdef.prewarm is not None:
            qdef.prewarm(spark, sf_dir)
        df = qdef.build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()

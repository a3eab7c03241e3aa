#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to stdout or to
plans/r16/<query>_<suffix>.txt (one file per query). Usage:

    python tools/explain_query.py [--out SUFFIX] name [name ...]

With --out, writes plans/r16/<name>_<SUFFIX>.txt; else prints to stdout.
Runs at $SPARK_GRAFT_SF_DIR (default sf0.01 — plan SHAPE is scale-invariant
for these queries; AQE runtime re-plans are noted in OPTIMIZATION_r16.md
where they matter).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from odc_stac_spark import get_spark  # noqa: E402
from odc_stac_spark.queries import load_all  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    args = sys.argv[1:]
    suffix = None
    if args and args[0] == "--out":
        suffix = args[1]
        args = args[2:]
    spark = get_spark(app_name="explain-query")
    reg = load_all()
    for name in args:
        df = reg[name].spark_fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if suffix:
            out = os.path.join(REPO, "plans", "r16", f"{name}_{suffix}.txt")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"wrote {out}", file=sys.stderr)
        else:
            print(f"==== {name} ====\n{plan}")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Solo re-probe: time the named queries in one session (cold + warm wall
per query, caches released between queries by the registry wrapper) and
optionally dump formatted plans to plans/r16/<name>_<suffix>.txt.

    python tools/solo_probe.py [--plans SUFFIX] name [name ...]

Prints one JSON line {name: [cold_sec, warm_sec]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from odc_stac_spark import get_spark  # noqa: E402
from odc_stac_spark.queries import load_all  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    suffix = None
    if args and args[0] == "--plans":
        suffix = args[1]
        args = args[2:]
    spark = get_spark(app_name="solo-probe")
    reg = load_all()
    out: dict = {}
    for name in args:
        q = reg[name]
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.spark_fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            walls.append(round(time.perf_counter() - t0, 2))
        out[name] = walls
        print(f"{name}: cold {walls[0]} warm {walls[1]}", file=sys.stderr, flush=True)
        if suffix:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            dst = os.path.join(REPO, "plans", "r16", f"{name}_{suffix}.txt")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "w") as fh:
                fh.write(plan)
        spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

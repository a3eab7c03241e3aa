#!/usr/bin/env python
"""Timed full-registry sweep: run every registered query once at
$SPARK_GRAFT_SF_DIR (default sf0.1) and print per-query wall seconds,
slowest first, plus a JSON line for diffing across rounds.

This is the starvation/shape hunter that found the round-13 wins
(single-partition Python codec stages, the continuous-agg small-files
explosion). Interpretation notes:

- Times inflate 2-4x late in the sweep from accumulated session pressure
  (Python workers, Arrow buffers, state-store maintenance) — ALWAYS
  re-probe a candidate solo before optimizing.
- Streaming queries carry ~5-10 s of fixed machinery (state stores x
  partitions, checkpoint I/O, memory sink) per run.
- First-run walls include Catalyst analysis/codegen of the plan — deep
  nested schemas (STAC parse) pay seconds once; a long-lived cluster
  pays it never.

Compare against tools/time_sweep_r13.json (32-core box, moderate load).
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # r16: embed the bench's machine probe so a sweep artifact is
    # weather-attributable on its own (the r15/r16 sweeps measured 3-20×
    # inflation on untouched queries under memory-bus contention; a
    # sweep whose probes read degraded should not be compared
    # round-over-round) — VERDICT r15 #3.
    from bench import _loadavg, _machine_probe

    probe_start = {"machine": _machine_probe(), "loadavg": _loadavg()}
    spark = get_spark(app_name="time-sweep")
    reg = load_all()
    times: dict = {}
    for name, q in reg.items():
        t0 = time.perf_counter()
        try:
            q.spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times[name] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001
            times[name] = f"ERR {str(e)[:80]}"
        print(f"{times[name]:>8}  {name}", file=sys.stderr, flush=True)
    num = {k: v for k, v in times.items() if isinstance(v, (int, float))}
    for k, v in sorted(num.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{v:8.2f}  {k}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "total_sec": round(sum(num.values()), 1),
                      "probe_start": probe_start,
                      "probe_end": {"machine": _machine_probe(), "loadavg": _loadavg()},
                      "times": times}))
    spark.stop()


if __name__ == "__main__":
    main()

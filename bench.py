#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference's protocol (odc/stac/bench/_run.py:425-485): warm the
session first (exclude JVM/session startup, like the reference excludes
cluster startup), then time each query end-to-end to a noop sink (forces
full execution without driver collect — the analog of persist+wait).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from odc_stac_spark import get_spark  # noqa: E402
from odc_stac_spark.queries import load_all  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "a2_solar_day",
    "a4_group_sort_bucketize",
    "j1_tyx_bins",
    "window_top3_orders_per_customer",
    "t_session_windows",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="odc-stac-spark-bench")
    registry = load_all()

    # warm-up: JVM + parquet footer caches (reference times exclude cluster
    # startup the same way)
    registry["q1_pricing_summary"].spark_fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        t0 = time.perf_counter()
        q.spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

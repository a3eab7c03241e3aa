#!/usr/bin/env python
"""sf10 execution proof for dedup_pipeline_e2e (VERDICT r14 #1).

Round 14's probe showed the EXACT n-gram pair generator
(dedup_ngram_jaccard) dying on the sf10 replica (>78 GB shuffle spill:
~100x exact replication makes the shingle inverted-index self-join
emit ~cluster^2 pairs per cluster). The composed pipeline collapses
exact duplicates FIRST, so the LSH/CC machinery only ever sees
distinct text — this probe runs the full chain on that same replica
and prints the wall + dedup accounting.

Run: SPARK_DRIVER_MEMORY=48g python tools/probe_dedup_e2e_sf10.py
(builds the replica via tools/make_sf.py on first use, ~1 min).
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from odc_stac_spark import get_spark  # noqa: E402
from odc_stac_spark.queries.llm_pipeline import dedup_pipeline_e2e  # noqa: E402

SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
if not os.path.exists(os.path.join(SF10, "documents.parquet")):
    print("building sf10 replica...", flush=True)
    subprocess.check_call(
        [sys.executable, os.path.join(REPO, "tools", "make_sf.py"),
         "/root/testdata/sf0.1", SF10, "100"]
    )

spark = get_spark(app_name="probe-dedup-e2e-sf10")
n_docs = spark.read.parquet(os.path.join(SF10, "documents.parquet")).count()
print(f"corpus: {n_docs} docs; loadavg {[round(x, 2) for x in os.getloadavg()]}",
      flush=True)

t0 = time.perf_counter()
out = dedup_pipeline_e2e(spark, SF10)
stats = out.agg(
    F.count(F.lit(1)).alias("n_docs"),
    F.sum("keep").alias("n_keep"),
    F.countDistinct("component").alias("n_clusters"),
).collect()[0]
wall = round(time.perf_counter() - t0, 1)
print(
    f"wall_s {wall} docs {stats['n_docs']} keep {stats['n_keep']} "
    f"clusters {stats['n_clusters']} "
    f"dropped {stats['n_docs'] - stats['n_keep']} "
    f"({(stats['n_docs'] - stats['n_keep']) * 100.0 / stats['n_docs']:.1f}%)",
    flush=True,
)
assert stats["n_docs"] == n_docs
assert stats["n_keep"] == stats["n_clusters"]  # one survivor per cluster
print("OK; loadavg", [round(x, 2) for x in os.getloadavg()])

#!/usr/bin/env python
"""Direct sf10-scale CC probe (run: SPARK_DRIVER_MEMORY=48g python
tools/probe_cc_scale.py — r14 result recorded in COVERAGE.md): 2M chain components of 10 nodes (20M nodes,
~18M undirected edges) PLUS one 100k-hop chain — the diameter case that
makes min-label propagation infeasible (100k rounds) and star contraction
~log2(100k) ≈ 17 rounds."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import pyspark.sql.functions as F
from odc_stac_spark import get_spark
from odc_stac_spark.queries.llm_pipeline import cc_star_contraction

spark = get_spark(app_name="probe-cc-synth")
N, GRP = 20_000_000, 10
base = spark.range(N).where(F.col("id") % GRP != GRP - 1).select(
    F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
long_chain = spark.range(20_000_000, 20_100_000).select(
    F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
und = base.unionAll(long_chain)
edges = und.unionAll(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
t0 = time.perf_counter()
labels = cc_star_contraction(edges)
sizes = labels.groupBy("component").count()
stats = sizes.agg(
    F.count(F.lit(1)).alias("n_components"),
    F.sum("count").alias("n_nodes"),
    F.max("count").alias("max_size"),
).collect()[0]
wall = round(time.perf_counter() - t0, 1)
print("wall_s", wall, "components", stats["n_components"],
      "nodes", stats["n_nodes"], "max_size", stats["max_size"], flush=True)
assert stats["n_components"] == 2_000_001, stats
assert stats["n_nodes"] == 20_100_001, stats
assert stats["max_size"] == 100_001, stats
# the long chain labels to its min id
lc = labels.where(F.col("doc_id") == 20_099_000).collect()[0]
assert lc["component"] == 20_000_000, lc
print("OK: all components labeled by min id; loadavg",
      [round(x,2) for x in os.getloadavg()])

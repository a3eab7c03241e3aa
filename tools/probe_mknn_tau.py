#!/usr/bin/env python
"""Purity-vs-tau sweep for the mutual-kNN clustering threshold
(VERDICT r14 next-round item #2).

For each candidate cosine threshold tau, run the thresholded clustering
+ purity evaluation at a given SF and print: number of multi-member
clusters, size of the largest cluster, member-weighted mean purity, and
the share of all vectors that land in multi-member clusters (recall —
a threshold so high nothing clusters is useless). The chosen tau goes
into similarity.MKNN_TAU and the curve into COVERAGE.md.

Usage: python tools/probe_mknn_tau.py [sf_dir]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .appName("mknn-tau-probe")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)

from odc_stac_spark.queries import similarity as S  # noqa: E402
from odc_stac_spark.sources.tables import load_table  # noqa: E402

n_vec = load_table(spark, SF_DIR, "embeddings").count()
print(f"sf_dir={SF_DIR} n_vectors={n_vec}")
print(f"{'tau':>6} {'clusters':>8} {'max_sz':>7} {'clustered':>9} "
      f"{'w_purity':>8} {'sec':>6}")

for tau in (None, 0.5, 0.6, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95):
    t0 = time.time()
    pur = S._cluster_purity(spark, SF_DIR, tau=tau)
    row = pur.agg(
        F.count(F.lit(1)).alias("clusters"),
        F.max("n_members").alias("max_sz"),
        F.sum("n_members").alias("clustered"),
        (F.sum(F.col("purity") * F.col("n_members")) / F.sum("n_members")).alias(
            "wp"
        ),
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"{str(tau):>6} {row.clusters or 0:>8} {row.max_sz or 0:>7} "
        f"{row.clustered or 0:>9} "
        f"{(row.wp if row.wp is not None else float('nan')):>8.4f} {dt:>6.1f}"
    )

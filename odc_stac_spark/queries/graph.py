"""Graph operators over the part co-purchase graph.

Nodes are parts; an undirected edge connects two parts that co-occur in
at least one order (the same pair generation as ``basket_pair_lift``, so
the edge fan-out is bounded by sum-of-basket-width^2 per order, never by
order count x part count). Both algorithms are expressed as DataFrame
joins/aggregations so Catalyst plans the shuffles:

- PageRank runs a FIXED unrolled number of power iterations (the DuckDB
  oracle replays the identical unrolled CTEs, like the kmeans gate), the
  canonical "iterative algorithm on Spark" shape: per iteration one join
  of the rank vector with the out-weighted edge list and one partial-agg
  shuffle on the destination key. The edge list is computed once and
  scoped-persisted; rank vectors are N rows.
- Triangle counting uses the DEGREE-ORDERED orientation (direct each
  undirected edge from the (degree, id)-smaller endpoint to the larger),
  the standard trick that bounds the path-join fan-out by the arboricity
  rather than the max hub degree — the difference between feasible and
  quadratic on a 100 TB skewed graph. Counts are pure integers, so the
  hash gate is exact with no rounding concerns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from . import register, scoped_persist

PR_DAMP = 0.85
PR_ITERS = 3
PR_TOPK = 20

_EDGES_SQL = """
    edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)
"""


def _undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct symmetric (src, dst) co-purchase pairs, src != dst.

    r17: the self-join reads ONE user-pinned hash repartition of lineitem
    by order key instead of two AQE-coalesced exchanges. Two wins,
    event-log verified: (a) the pair-explosion stage is CPU-bound, not
    byte-bound, but AQE's coalescing sized it by shuffle bytes — 3 tasks
    on 32 cores (2.2-2.8 s serialized; a user-specified repartition count
    is exempt from coalescing, and defaultParallelism tracks the cluster,
    not this box); (b) both join sides are the SAME co-partitioned
    relation, so the plan keeps one Exchange + ReusedExchange instead of
    shuffling lineitem twice."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    lik = li.repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
    a = lik.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = lik.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "k")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


@register(
    "graph_pagerank_topk",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
    r0 AS (SELECT src AS node, (SELECT 1.0 / n FROM nn) AS r FROM deg),
    ew AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS w
           FROM edges e JOIN deg d ON d.src = e.src),
    r1 AS (SELECT ew.dst AS node,
                  (SELECT (1 - {PR_DAMP}) / n FROM nn)
                  + {PR_DAMP} * SUM(r0.r * ew.w) AS r
           FROM ew JOIN r0 ON r0.node = ew.src GROUP BY 1),
    r2 AS (SELECT ew.dst AS node,
                  (SELECT (1 - {PR_DAMP}) / n FROM nn)
                  + {PR_DAMP} * SUM(r1.r * ew.w) AS r
           FROM ew JOIN r1 ON r1.node = ew.src GROUP BY 1),
    r3 AS (SELECT ew.dst AS node,
                  (SELECT (1 - {PR_DAMP}) / n FROM nn)
                  + {PR_DAMP} * SUM(r2.r * ew.w) AS r
           FROM ew JOIN r2 ON r2.node = ew.src GROUP BY 1),
    ranked AS (SELECT node, ROUND(r * 1000000, 2) AS pagerank_ppm,
                      ROW_NUMBER() OVER (ORDER BY ROUND(r * 1000000, 2) DESC,
                                         node ASC) AS rk
               FROM r3)
    SELECT CAST(rk AS INT) AS rk, node, pagerank_ppm
    FROM ranked WHERE rk <= {PR_TOPK}
    """,
    doc=f"PageRank (d={PR_DAMP}, {PR_ITERS} unrolled power iterations) over "
    "the part co-purchase graph; top-20 nodes by rank with deterministic "
    "(rounded-rank, node-id) tie-break. The graph is symmetric so there "
    "are no dangling nodes and every node keeps positive rank. Per "
    "iteration: one equi-join of the N-row rank vector with the "
    "out-weighted edge list, one dst-key partial-agg shuffle — the "
    "textbook Spark PageRank plan, with the iteration count fixed so the "
    "DuckDB oracle can replay the identical unrolled computation. Ranks "
    "are reported in parts-per-million rounded to 2dp so double "
    "fold-order noise (~1e-13 relative) cannot flip the gate or the "
    "tie-break.",
    tags=("graph",),
)
def graph_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = scoped_persist(_undirected_edges(spark, sf_dir))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ew = scoped_persist(
        edges.join(deg, "src").select(
            "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
        )
    )
    # rank vectors carry the scalar N via a 1-row broadcast crossJoin
    # (the DSIR pattern) instead of a driver collect
    ranks = deg.crossJoin(F.broadcast(n_nodes)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("n")).alias("r"), "n"
    )
    for _ in range(PR_ITERS):
        contrib = ew.join(
            ranks.select("node", "r", "n"), ew.src == F.col("node")
        ).select("dst", (F.col("r") * F.col("w")).alias("c"), "n")
        ranks = contrib.groupBy("dst", "n").agg(
            ((F.lit(1.0) - PR_DAMP) / F.col("n") + PR_DAMP * F.sum("c")).alias("r")
        ).select(F.col("dst").alias("node"), "r", "n")
    from pyspark.sql import Window

    ranked = ranks.select(
        "node", F.round(F.col("r") * 1e6, 2).alias("pagerank_ppm")
    )
    # global top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, no single-partition sort of the N-row rank vector); the rank
    # window then runs over the bounded k survivors only
    top = ranked.orderBy(F.desc("pagerank_ppm"), F.asc("node")).limit(PR_TOPK)
    w = Window.orderBy(F.desc("pagerank_ppm"), F.asc("node"))
    return top.withColumn("rk", F.row_number().over(w).cast("int")).select(
        "rk", "node", "pagerank_ppm"
    )


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL},
    und AS (SELECT src AS u, dst AS v FROM edges WHERE src < dst),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
                SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
            GROUP BY 1),
    orient AS (
        SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u < v)
                    THEN u ELSE v END AS s,
               CASE WHEN da.d < db.d OR (da.d = db.d AND u < v)
                    THEN v ELSE u END AS t,
               CASE WHEN da.d < db.d OR (da.d = db.d AND u < v)
                    THEN db.d ELSE da.d END AS td
        FROM und JOIN deg da ON da.node = und.u
                 JOIN deg db ON db.node = und.v),
    tri AS (
        -- wedge endpoints are ordered by the SAME (degree, id) total
        -- order as the edge orientation, so the closing edge b->c is
        -- guaranteed to exist in `orient` whenever {{a,b,c}} is a
        -- triangle (a raw-id t2 > t1 filter silently drops triangles
        -- whose endpoint degree order disagrees with id order)
        SELECT e1.s AS a, e1.t AS b, e2.t AS c
        FROM orient e1
        JOIN orient e2 ON e2.s = e1.s
             AND (e2.td > e1.td OR (e2.td = e1.td AND e2.t > e1.t))
        JOIN orient e3 ON e3.s = e1.t AND e3.t = e2.t),
    pernode AS (
        SELECT node, CAST(count(*) AS BIGINT) AS tri_count FROM (
            SELECT a AS node FROM tri UNION ALL
            SELECT b AS node FROM tri UNION ALL
            SELECT c AS node FROM tri) GROUP BY 1),
    ranked AS (SELECT node, tri_count,
                      ROW_NUMBER() OVER (ORDER BY tri_count DESC, node ASC) AS rk
               FROM pernode)
    SELECT CAST(rk AS INT) AS rk, node, tri_count,
           (SELECT CAST(count(*) AS BIGINT) FROM tri) AS total_triangles
    FROM ranked WHERE rk <= {PR_TOPK}
    """,
    doc="triangle counting on the co-purchase graph via degree-ordered "
    "orientation: each undirected edge points from its (degree, id)-"
    "smaller endpoint to the larger, so every triangle is enumerated "
    "exactly once as a wedge s->t1, s->t2 (t1 before t2 in the same "
    "(degree, id) order) closed by t1->t2, and "
    "the wedge fan-out per node is bounded by its ORIENTED out-degree "
    "(<= sqrt of edge count) rather than the raw hub degree — the "
    "standard skew-proof formulation for massive graphs. Output: top-20 "
    "nodes by triangle participation plus the global total; all counts "
    "integer-exact so the gate needs no rounding.",
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _undirected_edges(spark, sf_dir)
    # r16: persist the oriented-edge INPUTS too — the before-plan showed
    # the lineitem self-join + distinct recomputed in the da/db degree
    # branches (ReusedExchange only deduplicated part of it; 8 parquet
    # scans in one plan). und feeds deg AND orient; deg feeds da AND db.
    und = scoped_persist(
        edges.where(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        )
    )
    deg = scoped_persist(
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    orient = scoped_persist(
        und.join(da, "u")
        .join(db, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("td"),
        )
    )
    e1 = orient.select(F.col("s").alias("a"), F.col("t").alias("b"), F.col("td").alias("db_"))
    e2 = orient.select(F.col("s").alias("a"), F.col("t").alias("c"), F.col("td").alias("dc_"))
    # order the wedge endpoints by the SAME (degree, id) total order used
    # to orient the edges; a raw-id c > b filter drops every triangle
    # whose non-pivot endpoints have id order opposite to degree order,
    # because the closing edge then only exists as c->b in `orient`
    wedges = e1.join(e2, "a").where(
        (F.col("dc_") > F.col("db_"))
        | ((F.col("dc_") == F.col("db_")) & (F.col("c") > F.col("b")))
    )
    closing = orient.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tri = scoped_persist(wedges.join(closing, ["b", "c"]).select("a", "b", "c"))
    pernode = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )
    total = tri.agg(F.count(F.lit(1)).alias("total_triangles"))
    from pyspark.sql import Window

    # same TakeOrderedAndProject shape as the PageRank top-k: never a
    # single-partition window over the full per-node table
    top = pernode.orderBy(F.desc("tri_count"), F.asc("node")).limit(PR_TOPK)
    w = Window.orderBy(F.desc("tri_count"), F.asc("node"))
    return (
        top.withColumn("rk", F.row_number().over(w).cast("int"))
        .crossJoin(F.broadcast(total))
        .select("rk", "node", "tri_count", "total_triangles")
    )

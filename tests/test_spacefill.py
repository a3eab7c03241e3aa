"""Space-filling-curve keys — operators/spacefill.py."""

import numpy as np
import pyspark.sql.functions as F

from odc_stac_spark.operators.spacefill import (
    hilbert_np,
    morton_key,
    morton_np,
    with_hilbert_key,
)

rng = np.random.default_rng(3)


def test_morton_np_known_values():
    assert morton_np(np.array([1, 0, 1, 2, 3]), np.array([0, 1, 1, 2, 3])).tolist() == [
        1, 2, 3, 12, 15,
    ]


def test_hilbert_np_bijection_and_locality():
    o = 5
    n = 1 << o
    yy, xx = np.mgrid[0:n, 0:n]
    d = hilbert_np(xx.ravel(), yy.ravel(), o)
    assert sorted(d.tolist()) == list(range(n * n))
    pos = np.empty((n * n, 2), np.int64)
    pos[d] = np.stack([xx.ravel(), yy.ravel()], 1)
    assert (np.abs(np.diff(pos, axis=0)).sum(1) == 1).all()


def test_morton_column_matches_numpy(spark):
    xs = rng.integers(0, 1 << 20, 500)
    ys = rng.integers(0, 1 << 20, 500)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], "x long, y long"
    )
    got = df.select(morton_key(F.col("x"), F.col("y")).alias("m")).toPandas()["m"].values
    np.testing.assert_array_equal(got, morton_np(xs, ys))


def test_hilbert_column_matches_numpy(spark):
    o = 10
    xs = rng.integers(0, 1 << o, 400)
    ys = rng.integers(0, 1 << o, 400)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], "x long, y long"
    )
    out = with_hilbert_key(df, "x", "y", order=o).toPandas()
    np.testing.assert_array_equal(
        out["hkey"].values, hilbert_np(out["x"].values, out["y"].values, o)
    )


def test_keys_are_jvm_only(spark):
    """No Python eval nodes: both curves must run in whole-stage codegen."""
    df = spark.range(100).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    df = with_hilbert_key(df, "x", "y", order=5).withColumn(
        "mkey", morton_key(F.col("x"), F.col("y"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_clustering_improves_locality(spark):
    """The actual layout claim: sorting a tile list by the Hilbert key
    gives consecutive rows that are spatial neighbors far more often than
    row-major order — the property that turns bbox queries into contiguous
    range reads."""
    n = 32
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    out = (
        with_hilbert_key(df, "x", "y", order=5)
        .orderBy("hkey")
        .toPandas()[["x", "y"]]
        .values
    )
    hilbert_steps = np.abs(np.diff(out, axis=0)).sum(1)
    rowmajor = df.orderBy("y", "x").toPandas()[["x", "y"]].values
    rowmajor_steps = np.abs(np.diff(rowmajor, axis=0)).sum(1)
    assert (hilbert_steps == 1).all()
    assert hilbert_steps.mean() < rowmajor_steps.mean()


def test_cluster_by_curve_reduces_bbox_file_touches(spark, tmp_path):
    """The layout claim, measured on parquet footers: a square bbox query
    must read every file whose (x, y) min/max stats-box intersects it.
    Hilbert files cover near-square neighborhoods, row-major files cover
    full-width strips — so the same query set touches fewer files after
    the Hilbert rewrite."""
    import glob

    import pyarrow.parquet as pq

    from odc_stac_spark.operators.spacefill import cluster_by_curve

    n = 64
    n_files = 32
    cells = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )

    def file_boxes(path):
        boxes = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.read_metadata(f)
            names = [md.row_group(0).column(i).path_in_schema for i in range(md.num_columns)]
            cols = {nm: i for i, nm in enumerate(names)}
            xmin = ymin = float("inf")
            xmax = ymax = -float("inf")
            for rg in range(md.num_row_groups):
                sx = md.row_group(rg).column(cols["x"]).statistics
                sy = md.row_group(rg).column(cols["y"]).statistics
                xmin, xmax = min(xmin, sx.min), max(xmax, sx.max)
                ymin, ymax = min(ymin, sy.min), max(ymax, sy.max)
            boxes.append((xmin, xmax, ymin, ymax))
        return boxes

    def mean_touches(boxes, q=16, stride=8):
        touches = []
        for qy in range(0, n - q + 1, stride):
            for qx in range(0, n - q + 1, stride):
                hit = sum(
                    1
                    for (x0, x1, y0, y1) in boxes
                    if x0 <= qx + q - 1 and x1 >= qx and y0 <= qy + q - 1 and y1 >= qy
                )
                touches.append(hit)
        return sum(touches) / len(touches)

    rowmajor = str(tmp_path / "rowmajor")
    cells.orderBy("y", "x").repartitionByRange(n_files, "y").write.parquet(rowmajor)
    clustered = str(tmp_path / "hilbert")
    cluster_by_curve(cells, "x", "y", order=6, path=clustered, n_files=n_files)

    hb, rm = file_boxes(clustered), file_boxes(rowmajor)
    assert len(hb) >= n_files // 2 and len(rm) >= n_files // 2
    hb_touch, rm_touch = mean_touches(hb), mean_touches(rm)
    # every row-major strip spans the full x width, so a 16-high query
    # touches ~9 of 32 files; hilbert neighborhoods keep it materially lower
    assert hb_touch < rm_touch * 0.8, (hb_touch, rm_touch)

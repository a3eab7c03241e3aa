#!/usr/bin/env python
"""End-to-end raster scale rehearsal (VERDICT r13 #6).

The relational/LLM families have 10×/100× probes; the raster load path's
largest committed run was the sf0.1 bench (56 Mpx of output from synth://
sources). This rehearsal is the sf1-equivalent: ~10× the output pixels,
from REAL tiled-deflate COG scene files on disk (not synth://), through
the full pipeline — item binning → tile tasks → mapInPandas read+mosaic —
and back OUT through the executor-side COG sink (`sinks.write_cog`).

Shape: 5 solar days × 8 overlapping strip scenes/day × 2 bands, each
scene 2000×5632 uint16 (11.3 Mpx/band). Per-day union grid 9000×5632
(50.7 Mpx); output = 2 bands × 5 day-groups = 10 COGs, 507 Mpx total.
Source reads: 80 band-files, 901 Mpx.

Prints one JSON line: load-only Mpx/s, load→write_cog end-to-end Mpx/s,
tiles/task distribution for both phases, and loadavg context.

Run:  python tools/raster_scale_rehearsal.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from datetime import datetime, timedelta

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from odc_stac_spark import get_spark  # noqa: E402
from odc_stac_spark.model import (  # noqa: E402
    GeoBox,
    RasterBandMetadata,
    RasterSource,
)
from odc_stac_spark.plans.load import Item, load  # noqa: E402

N_DAYS = 5
SCENES_PER_DAY = 8
NY, NX = 2000, 5632  # one scene strip
STEP = 1000  # strip stagger (rows) → 2× overlap within a day
CRS = "EPSG:32735"
BANDS = ("red", "nir")
T0 = datetime(2020, 6, 6, 8, 30)


def scene_gbox(scene_idx: int) -> GeoBox:
    grid_ny = NY + (SCENES_PER_DAY - 1) * STEP
    origin_y = 10.0 * grid_ny - scene_idx * STEP * 10.0
    return GeoBox((NY, NX), (10.0, 0.0, 0.0, 0.0, -10.0, origin_y), CRS)


def scene_path(root: str, day: int, scene: int, band: str) -> str:
    return os.path.join(root, f"d{day}_s{scene}_{band}.tif")


def generate_sources(spark, root: str) -> float:
    """Write the 80 source COGs from the executors (80 tasks; local FS is
    shared on this box). Deterministic uint16 ramp + per-scene offset,
    nodata=0 holes every 31st diagonal so the mosaic first-valid path
    does real work."""
    os.makedirs(root, exist_ok=True)
    jobs = [
        (d, s, b)
        for d in range(N_DAYS)
        for s in range(SCENES_PER_DAY)
        for b in BANDS
    ]
    todo = [j for j in jobs if not os.path.exists(scene_path(root, *j))]
    if not todo:
        return 0.0
    t0 = time.perf_counter()

    def _write(part):
        from odc_stac_spark.sources.geotiff import write_cog_file

        for d, s, b in part:
            yy, xx = np.mgrid[0:NY, 0:NX]
            seed = d * 100 + s * 10 + (1 if b == "red" else 2)
            img = ((yy * 7 + xx * 3 + seed * 977) % 60000 + 1).astype(np.uint16)
            img[(yy + xx) % 31 == 0] = 0  # nodata holes
            write_cog_file(
                scene_path(root, d, s, b),
                img,
                scene_gbox(s),
                nodata=0,
                tile=512,
                compression="deflate",
                overview_levels=[],
            )
        return iter(())

    spark.sparkContext.parallelize(todo, len(todo)).mapPartitions(_write).count()
    return round(time.perf_counter() - t0, 2)


def mk_items(root: str) -> list:
    items = []
    for d in range(N_DAYS):
        for s in range(SCENES_PER_DAY):
            items.append(
                Item(
                    id=f"reh-d{d}-s{s}",
                    datetime=T0 + timedelta(days=d, minutes=s),
                    bands={
                        b: RasterSource(
                            scene_path(root, d, s, b),
                            geobox=scene_gbox(s),
                            meta=RasterBandMetadata("uint16", 0),
                        )
                        for b in BANDS
                    },
                    lon=27.4,
                )
            )
    return items


def tiles_per_task(df) -> dict:
    import pyspark.sql.functions as F

    counts = [
        r["count"]
        for r in df.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    ]
    counts.sort()
    return {
        "tasks": len(counts),
        "min": counts[0],
        "median": counts[len(counts) // 2],
        "max": counts[-1],
        "total_tiles": sum(counts),
    }


def main() -> None:
    spark = get_spark(app_name="raster-scale-rehearsal")
    root = os.path.join(tempfile.gettempdir(), "spark_graft_raster_sf1")
    gen_sec = generate_sources(spark, root)

    items = mk_items(root)
    # warm the Arrow/python-worker path on a 2-item subset (same protocol
    # as bench.py raster_throughput)
    wt, _ = load(spark, items[:2], groupby="solar_day", chunks=(1024, 1024))
    wt.write.mode("overwrite").format("noop").save()

    # phase 1: load only (read + warp-free paste + mosaic), timed
    t0 = time.perf_counter()
    tiles_df, plan = load(spark, items, groupby="solar_day", chunks=(1024, 1024))
    tiles_df.write.mode("overwrite").format("noop").save()
    load_sec = time.perf_counter() - t0
    npix = (
        len(plan.bands)
        * len(plan.group_keys)
        * plan.gbox.shape[0]
        * plan.gbox.shape[1]
    )
    dist_load = tiles_per_task(tiles_df)

    # phase 2: load → write_cog end to end (the full export), timed
    from odc_stac_spark.sources.sinks import write_cog

    out_dir = os.path.join(root, "out")
    t0 = time.perf_counter()
    tiles_df2, plan2 = load(spark, items, groupby="solar_day", chunks=(1024, 1024))
    paths = write_cog(tiles_df2, plan2, out_dir)
    e2e_sec = time.perf_counter() - t0
    out_bytes = sum(os.path.getsize(p) for p in paths)

    result = {
        "metric": "raster_scale_rehearsal",
        "n_items": len(items),
        "n_source_files": N_DAYS * SCENES_PER_DAY * len(BANDS),
        "source_gen_sec": gen_sec,
        "out_mpx": round(npix / 1e6, 1),
        "load_sec": round(load_sec, 2),
        "load_mpx_per_sec": round(npix / load_sec / 1e6, 1),
        "e2e_write_cog_sec": round(e2e_sec, 2),
        "e2e_mpx_per_sec": round(npix / e2e_sec / 1e6, 1),
        "n_output_cogs": len(paths),
        "output_gb": round(out_bytes / 1e9, 2),
        "tiles_per_task_load": dist_load,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

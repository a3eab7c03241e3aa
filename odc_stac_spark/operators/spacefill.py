"""Space-filling-curve keys (Morton/Z-order, Hilbert) as JVM expressions.

At 100 TB the dominant cost of a spatial workload is layout: tiles that
are close on the ground must be close in storage so a bbox query prunes
file ranges instead of scattering reads. The standard tool is clustering
by a space-filling curve — Z-order (Delta OPTIMIZE ZORDER, Iceberg sort
orders) or the better-locality Hilbert curve (Iceberg's hilbert sort).

Both keys here are pure Catalyst column expressions — bitwise ops,
shifts, CASE — no Python UDF anywhere, so computing keys for billions of
tile rows is whole-stage-codegen JVM work:

- :func:`morton_key` — bit interleave via the magic-mask spreading
  sequence (public bit-twiddling identity), a single Column expression.
- :func:`with_hilbert_key` — the classic xy→d rotation walk, one
  projection per order level (each level is materialized as a column, so
  the expression tree stays linear instead of exponential).

numpy references (:func:`morton_np`, :func:`hilbert_np`) back the tests,
and :func:`hilbert_sql`/:func:`morton_sql` emit the equivalent DuckDB SQL
so the driver's oracle can hash-gate both curves.

Reference: the odc-stac reference has no layout clustering (Dask hands
locality to the chunk graph); this is part of the engine's 100 TB story.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread1(c: Column) -> Column:
    """Spread the low 32 bits of c to even bit positions (…b2_b1_b0 →
    …0b2 0b1 0b0)."""
    c = c.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def morton_key(ix: Column, iy: Column) -> Column:
    """Z-order key interleaving two ≤32-bit grid indices into one long
    (x in even bits, y in odd) — single JVM expression."""
    return _spread1(ix).bitwiseOR(F.shiftleft(_spread1(iy), 1))


def with_hilbert_key(
    df: DataFrame, xcol: str, ycol: str, order: int, out: str = "hkey"
) -> DataFrame:
    """Add a Hilbert-curve index column for grid coords in [0, 2^order).

    One projection per level keeps the plan linear; all arithmetic is
    Catalyst CASE/bitwise (no Python)."""
    df = df.withColumn("_hx", F.col(xcol).cast("long")).withColumn(
        "_hy", F.col(ycol).cast("long")
    ).withColumn(out, F.lit(0).cast("long"))
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        d = F.col(out) + F.lit(s) * F.lit(s) * (F.lit(3) * rx).bitwiseXOR(ry)
        # when ry == 0: reflect (if rx) then swap x/y; else unchanged
        nx = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - F.col("_hy")).otherwise(F.col("_hy"))
        ).otherwise(F.col("_hx"))
        ny = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - F.col("_hx")).otherwise(F.col("_hx"))
        ).otherwise(F.col("_hy"))
        df = df.withColumns({out: d, "_hx": nx, "_hy": ny})
    return df.drop("_hx", "_hy")


# ---- numpy references (tests + driver-side use) ---------------------------


def morton_np(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    def spread(v):
        v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        for shift, mask in _MASKS:
            v = (v | (v << np.uint64(shift))) & np.uint64(mask)
        return v

    return (spread(np.asarray(ix)) | (spread(np.asarray(iy)) << np.uint64(1))).astype(
        np.int64
    )


def hilbert_np(ix: np.ndarray, iy: np.ndarray, order: int) -> np.ndarray:
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    d = np.zeros_like(x)
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        refl = swap & (rx == 1)
        x2 = np.where(refl, s - 1 - x, x)
        y2 = np.where(refl, s - 1 - y, y)
        nx = np.where(swap, y2, x2)
        ny = np.where(swap, x2, y2)
        x, y = nx, ny
    return d


# ---- DuckDB oracle SQL generators -----------------------------------------


def morton_sql(x: str, y: str) -> str:
    """DuckDB expression computing morton_key({x}, {y})."""

    def spread(e: str) -> str:
        e = f"(CAST({e} AS BIGINT) & 4294967295)"
        for shift, mask in _MASKS:
            e = f"(({e} | ({e} << {shift})) & {mask})"
        return e

    return f"({spread(x)} | ({spread(y)} << 1))"


def hilbert_sql(x: str, y: str, order: int, base: str) -> str:
    """CTE chain replaying with_hilbert_key step-for-step over DuckDB.

    ``base`` is a relation exposing integer columns ``{x}`` and ``{y}``;
    the result relation ``hfinal`` carries the original columns plus
    ``hkey``."""
    sql = f"hs{order} AS (SELECT *, CAST({x} AS BIGINT) AS hx, CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {base})"
    prev = f"hs{order}"
    for i in range(order - 1, -1, -1):
        s = 1 << i
        step = f"""hs{i} AS (
          SELECT * EXCLUDE (hx, hy, hd),
                 CASE WHEN (hy & {s}) = 0
                      THEN CASE WHEN (hx & {s}) > 0 THEN {s - 1} - hy ELSE hy END
                      ELSE hx END AS hx,
                 CASE WHEN (hy & {s}) = 0
                      THEN CASE WHEN (hx & {s}) > 0 THEN {s - 1} - hx ELSE hx END
                      ELSE hy END AS hy,
                 hd + {s * s} * xor(3 * (CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END),
                                    (CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)) AS hd
          FROM {prev})"""
        sql += ",\n" + step
        prev = f"hs{i}"
    sql += f",\nhfinal AS (SELECT * EXCLUDE (hx, hy, hd), hd AS hkey FROM {prev})"
    return sql


def cluster_by_curve(
    df: DataFrame,
    xcol: str,
    ycol: str,
    order: int,
    path: str,
    n_files: int = 8,
    curve: str = "hilbert",
) -> None:
    """OPTIMIZE-style spatial re-layout: write ``df`` as parquet
    range-partitioned and sorted by its space-filling-curve key.

    After this rewrite each file (and each row group inside it) covers a
    compact spatial neighborhood, so parquet min/max footer stats on the
    coordinates become tight boxes — a bbox query's scan skips most files
    outright (the Delta ``OPTIMIZE ZORDER BY`` / Iceberg sort-order
    rewrite, expressed as stock Spark: repartitionByRange + 
    sortWithinPartitions, both JVM-side).

    tests/test_spacefill.py quantifies the effect on footer stats."""
    if curve == "hilbert":
        keyed = with_hilbert_key(df, xcol, ycol, order, out="_curve_key")
    elif curve == "morton":
        keyed = df.withColumn("_curve_key", morton_key(F.col(xcol), F.col(ycol)))
    else:
        raise ValueError(f"unknown curve {curve!r} (hilbert|morton)")
    (
        keyed.repartitionByRange(n_files, "_curve_key")
        .sortWithinPartitions("_curve_key")
        .drop("_curve_key")
        .write.mode("overwrite")
        .parquet(path)
    )

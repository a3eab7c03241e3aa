#!/usr/bin/env python
"""Simulate the driver's verify pass against __spark_entry__.py:

- run ``entry(spark)`` (smoke: ≥0 rows, stable schema)
- for each ``queries()`` entry, run the Spark query at sf0.01 AND the
  matching ``oracle_sql()`` in DuckDB; compare row count, column names,
  and an order-insensitive value hash (floats rounded to 9 decimals).

Prints one JSON line per query plus a summary — the local image of
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "tests"))
from oracle_compare import duckdb_conn, normalize  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def value_hash(pdf: pd.DataFrame) -> str:
    norm = normalize(pdf)
    return hashlib.md5(norm.to_csv(index=False, float_format="%.9g").encode()).hexdigest()


def main() -> None:
    # Deliberately a *bare* session (not our get_spark) so this check
    # reproduces the driver harness's environment: any conf our queries
    # need must be set at runtime by the query/load code itself.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-check")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    res = entrymod.entry(spark)
    n = res.count()
    print(json.dumps({"entry": {"rows": n, "schema": res.schema.simpleString()[:200]}}))
    assert n >= 0

    qs = entrymod.queries()
    args = sys.argv[1:]
    if "--core" in args:
        # core tier (VERDICT r13 #7): the FIRST registered query of every
        # tag — one representative per operator family (~70 of 230+), so
        # an iteration sweep runs in minutes instead of ~25. Fully
        # self-maintaining: a new family's first member joins the tier
        # automatically. Full sweeps (no flag) remain the round artifact.
        from odc_stac_spark.queries import load_all

        first: dict = {}
        for name, q in load_all().items():
            for t in q.tags or ("untagged",):
                first.setdefault(t, name)
        core = set(first.values())
        qs = {n: f for n, f in qs.items() if n in core}
        args = [a for a in args if a != "--core"]
    if args:  # optional name-prefix filters for fast local runs
        qs = {n: f for n, f in qs.items() if any(n.startswith(p) for p in args)}
    oracles = entrymod.oracle_sql()
    con = duckdb_conn(SF_DIR)
    n_ok = n_bad = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        try:
            got = fn(spark, SF_DIR).toPandas()
            if name not in oracles:
                print(json.dumps({"query": name, "rows": len(got), "check": "rows-only"}))
                n_rows_only += 1
                continue
            want = con.sql(oracles[name]).df()
            gh, wh = value_hash(got), value_hash(want)
            ok = (
                len(got) == len(want)
                and sorted(got.columns) == sorted(want.columns)
                and gh == wh
            )
            print(
                json.dumps(
                    {
                        "query": name,
                        "rows": len(got),
                        "oracle_rows": len(want),
                        "hash_match": gh == wh,
                        "ok": ok,
                    }
                )
            )
            n_ok += ok
            n_bad += not ok
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"query": name, "error": str(e)[:300]}))
            n_bad += 1
    print(
        json.dumps(
            {"summary": {"ok": n_ok, "bad": n_bad, "rows_only": n_rows_only, "sf_dir": SF_DIR}}
        )
    )
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scale a driver-generated sf directory up by an integer factor.

``python tools/make_sf.py SRC_DIR DST_DIR FACTOR`` replicates every
table FACTOR times with key offsets that PRESERVE JOIN RELATIONSHIPS
(copy i's orders reference copy i's customers, etc.), so every engine
query and oracle shape runs unchanged at the larger scale. Dimension
tables (region, nation) are shared across copies, as in TPC-H. Used by
bench.py's sf1 spot-check (VERDICT r6 #7): /root/testdata is read-only,
so the rehearsal scale lives under $TMPDIR and is rebuilt (~20 s at
10×sf0.1) when absent.

Content notes:
- events keep their time range (10× event density — the realistic way a
  busier system scales) with user_id/event_id offset per copy;
- documents get a per-copy ALPHABET-ROTATION cipher: a bijection on
  strings exactly preserves each copy's internal shingle/near-dup
  structure (dup clusters scale linearly with the corpus) while copies
  share no shingles with each other — naive suffix/tag mutations leave
  MinHash signatures or word n-grams correlated across copies, which
  collides LSH buckets and squares the verify stage (the sf1 rehearsal
  measured 54× at 10× data before this);
- embeddings keep vec_id offsets; copies reuse the base vectors (cell
  populations scale 10×, centroid/query ids stay the first vectors).
"""

from __future__ import annotations

import os
import sys

import duckdb


def make_sf(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT UNNEST(range(0, {factor})) AS i")

    def src_t(name: str) -> str:
        return f"read_parquet('{os.path.join(src, name + '.parquet')}')"

    def write(name: str, sql: str, row_group: int = 0, split: str = "") -> None:
        # split layout matters: Spark splits parquet scans by BYTES
        # (maxPartitionBytes=128 MB), so a single ~15 MB documents file
        # is 1-2 tasks no matter how many row groups it holds — the sf1
        # rehearsal measured text queries at 40× instead of 10× on 10×
        # data because the whole text stage ran on one core. CPU-heavy
        # per-row tables are written as MULTI-FILE directories (Spark
        # parallelizes per file); row groups are sized down as well.
        out = os.path.join(dst, name + ".parquet")
        opts = f", ROW_GROUP_SIZE {row_group}" if row_group else ""
        if not split:
            con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET{opts})")
            return
        os.makedirs(out, exist_ok=True)
        nfiles = 16
        for k in range(nfiles):
            part = os.path.join(out, f"part-{k:02d}.parquet")
            con.execute(
                f"COPY (SELECT * FROM ({sql}) WHERE {split} % {nfiles} = {k}) "
                f"TO '{part}' (FORMAT PARQUET{opts})"
            )

    # key strides: next power of 10 above the source max keeps offsets
    # readable and collision-free
    def stride(table: str, key: str) -> int:
        mx = con.sql(f"SELECT MAX({key}) FROM {src_t(table)}").fetchone()[0]
        s = 10
        while s <= mx:
            s *= 10
        return s

    ck = stride("customer", "c_custkey")
    sk = stride("supplier", "s_suppkey")
    pk = stride("part", "p_partkey")
    ok = stride("orders", "o_orderkey")
    uk = stride("events", "user_id")
    ek = stride("events", "event_id")
    dk = stride("documents", "doc_id")
    vk = stride("embeddings", "vec_id")

    for name in ("region", "nation"):
        write(name, f"SELECT * FROM {src_t(name)}")
    write(
        "customer",
        f"SELECT c_custkey + i * {ck} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM {src_t('customer')} CROSS JOIN copies",
    )
    write(
        "supplier",
        f"SELECT s_suppkey + i * {sk} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM {src_t('supplier')} CROSS JOIN copies",
    )
    write(
        "part",
        f"SELECT p_partkey + i * {pk} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM {src_t('part')} CROSS JOIN copies",
    )
    write(
        "orders",
        f"SELECT o_orderkey + i * {ok} AS o_orderkey, "
        f"o_custkey + i * {ck} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM {src_t('orders')} CROSS JOIN copies",
    )
    write(
        "lineitem",
        f"SELECT l_orderkey + i * {ok} AS l_orderkey, "
        f"l_partkey + i * {pk} AS l_partkey, "
        f"l_suppkey + i * {sk} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate FROM {src_t('lineitem')} "
        "CROSS JOIN copies",
    )
    write(
        "events",
        f"SELECT event_id + i * {ek} AS event_id, ts, "
        f"user_id + i * {uk} AS user_id, event_type, value, props "
        f"FROM {src_t('events')} CROSS JOIN copies",
        row_group=16384,
        split="event_id",
    )
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rot = (
        "CASE i "
        + " ".join(
            f"WHEN {i} THEN translate(text, '{alpha}', '{alpha[i:] + alpha[:i]}')"
            for i in range(1, factor)
        )
        + " ELSE text END"
    )
    write(
        "documents",
        f"SELECT doc_id + i * {dk} AS doc_id, {rot} AS text, "
        f"lang, source, n_chars FROM {src_t('documents')} CROSS JOIN copies",
        row_group=1024,
        split="doc_id",
    )
    write(
        "embeddings",
        f"SELECT vec_id + i * {vk} AS vec_id, embedding, label "
        f"FROM {src_t('embeddings')} CROSS JOIN copies",
        row_group=512,
        split="vec_id",
    )
    con.close()


if __name__ == "__main__":
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    make_sf(src, dst, factor)
    print(f"wrote {dst} = {factor}x {src}")

"""WebDataset tar-shard source — sources/webdataset.py."""

import tarfile

import numpy as np

from odc_stac_spark.sources.webdataset import (
    group_samples,
    read_webdataset,
    write_webdataset_shard,
)


def _shard(tmp_path, name, n, start=0):
    p = str(tmp_path / name)
    samples = [
        (
            f"{i:05d}",
            {"cls": str(i % 3).encode(), "bin": bytes([i % 251]) * (10 + i % 5)},
        )
        for i in range(start, start + n)
    ]
    write_webdataset_shard(p, samples)
    return p


def test_shard_is_plain_tar(tmp_path):
    """The writer emits a standard POSIX tar readable by stdlib tarfile,
    with sample members adjacent and deterministic metadata."""
    p = _shard(tmp_path, "s.tar", 3)
    with tarfile.open(p) as tar:
        names = tar.getnames()
        assert names == [
            "00000.cls", "00000.bin", "00001.cls", "00001.bin", "00002.cls", "00002.bin",
        ]
        assert tar.extractfile("00001.cls").read() == b"1"
        assert all(m.mtime == 0 for m in tar.getmembers())


def test_read_rows_and_partitioning(spark, tmp_path):
    p1 = _shard(tmp_path, "a.tar", 4)
    p2 = _shard(tmp_path, "b.tar", 5, start=100)
    df = read_webdataset(spark, [p1, p2])
    rows = df.collect()
    assert len(rows) == 18  # (4 + 5) samples x 2 members
    # one partition per shard: each partition only sees one shard path
    parts = df.select("shard").rdd.glom().map(
        lambda rs: len({r.shard for r in rs})
    ).collect()
    assert max(parts) <= 1


def test_group_samples_map(spark, tmp_path):
    p = _shard(tmp_path, "s.tar", 4)
    out = {r.key: r.parts for r in group_samples(read_webdataset(spark, [p])).collect()}
    assert set(out) == {"00000", "00001", "00002", "00003"}
    assert set(out["00002"]) == {"cls", "bin"}
    assert bytes(out["00002"]["cls"]) == b"2"
    assert bytes(out["00003"]["bin"]) == bytes([3]) * 13


def test_small_batch_rows_streams(spark, tmp_path):
    p = _shard(tmp_path, "s.tar", 7)
    df = read_webdataset(spark, [p], batch_rows=3)  # forces multiple yields
    assert df.count() == 14


def test_empty_shard_list(spark):
    df = read_webdataset(spark, [])
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["shard", "key", "ext", "data"]


def test_decode_through_codec_seam(spark, tmp_path):
    from odc_stac_spark.operators.codecs import encode_png
    from odc_stac_spark.operators.multimodal import DECODERS

    img = (np.arange(12 * 9 * 3) % 256).astype(np.uint8).reshape(12, 9, 3)
    p = str(tmp_path / "img.tar")
    write_webdataset_shard(p, [("sample0", {"png": encode_png(img)})])
    row = group_samples(read_webdataset(spark, [p])).collect()[0]
    out = DECODERS["image/png"](bytes(row.parts["png"]))
    np.testing.assert_array_equal(out, img)


def test_export_roundtrip(spark, tmp_path):
    """Distributed export is the inverse of ingest: rows → shards →
    rows, with deterministic per-partition shard names."""
    from odc_stac_spark.sources.webdataset import export_webdataset

    src = _shard(tmp_path, "src.tar", 40)
    samples = group_samples(read_webdataset(spark, [src]))
    out_dir = str(tmp_path / "out")
    shards = export_webdataset(samples.repartition(4, "key"), out_dir)
    assert 1 <= len(shards) <= 4
    assert all(s.startswith("shard-") for s in shards)

    back = group_samples(
        read_webdataset(spark, [f"{out_dir}/{s}" for s in shards])
    )
    want = {
        (r.key, bytes(r.parts["cls"]), bytes(r.parts["bin"]))
        for r in samples.collect()
    }
    got = {
        (r.key, bytes(r.parts["cls"]), bytes(r.parts["bin"]))
        for r in back.collect()
    }
    assert got == want and len(got) == 40


def test_export_rerun_overwrites_same_shards(spark, tmp_path):
    import os

    from odc_stac_spark.sources.webdataset import export_webdataset

    src = _shard(tmp_path, "src.tar", 10)
    samples = group_samples(read_webdataset(spark, [src])).repartition(2, "key")
    out_dir = str(tmp_path / "out")
    first = export_webdataset(samples, out_dir)
    second = export_webdataset(samples, out_dir)
    assert first == second
    assert sorted(os.listdir(out_dir)) == first


def test_read_webdataset_over_http(spark, tmp_path):
    """Remote shards: an http:// shard streams through the ranged-IO
    layer (sequential tar read → a few large contiguous GETs) and yields
    byte-identical rows to the local read — the object-storage ingest
    pattern WebDataset exists for."""
    from .http_range_server import RangeHTTPServer

    p1 = _shard(tmp_path, "s1.tar", 4)
    p2 = _shard(tmp_path, "s2.tar", 3, start=100)

    def rows(df):
        return sorted((r.key, r.ext, bytes(r.data)) for r in df.collect())

    want = rows(read_webdataset(spark, [p1, p2]))
    with RangeHTTPServer(str(tmp_path)) as srv:
        got = rows(read_webdataset(spark, [srv.url("s1.tar"), srv.url("s2.tar")]))
        # sequential streaming, not per-member requests: a 7-sample shard
        # pair needs only a handful of ranged GETs
        assert srv.n_requests <= 8
    assert got == want

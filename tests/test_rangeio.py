"""Remote ranged-IO layer (sources/rangeio.py): local/http(s)/s3 dispatch,
retry policy (reference GDAL_HTTP_MAX_RETRY/RETRY_DELAY, loader/_rio.py:65-69),
no-Range-support fallback, block-cache coalescing, and end-to-end reader
parity (COG / JP2 / netCDF / HDF5 over a live local HTTP range server)."""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pytest

from odc_stac_spark.sources.rangeio import (
    HttpRange,
    LocalRange,
    RangeFile,
    RangeIOError,
    S3Range,
    fetch_range,
    open_range,
    range_open,
)

from .http_range_server import RangeHTTPServer

RNG = np.random.default_rng(20260814)
PAYLOAD = RNG.integers(0, 256, size=300_000, dtype=np.uint8).tobytes()


@pytest.fixture()
def served(tmp_path, monkeypatch):
    monkeypatch.setenv("ODC_STAC_SPARK_HTTP_RETRY_DELAY", "0.01")
    (tmp_path / "blob.bin").write_bytes(PAYLOAD)
    with RangeHTTPServer(str(tmp_path)) as srv:
        yield srv, tmp_path


# ---------------------------------------------------------------------------
# local


def test_local_fetch_range(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(PAYLOAD)
    assert fetch_range(str(p), 100, 50) == PAYLOAD[100:150]
    assert fetch_range(f"file://{p}", 100, 50) == PAYLOAD[100:150]
    src = open_range(str(p))
    assert isinstance(src, LocalRange)
    assert src.size() == len(PAYLOAD)
    # past-EOF reads clip like file.read
    assert src.read_range(len(PAYLOAD) - 10, 100) == PAYLOAD[-10:]
    # local range_open is a real file (fast path, no wrapper overhead)
    with range_open(str(p)) as f:
        f.seek(5)
        assert f.read(7) == PAYLOAD[5:12]


def test_unsupported_scheme():
    with pytest.raises(RangeIOError, match="unsupported URL scheme"):
        open_range("ftp://host/x.bin")


# ---------------------------------------------------------------------------
# http


def test_http_range_reads(served):
    srv, _ = served
    src = open_range(srv.url("blob.bin"))
    assert isinstance(src, HttpRange)
    assert src.read_range(0, 16) == PAYLOAD[:16]
    assert src.read_range(12345, 678) == PAYLOAD[12345 : 12345 + 678]
    assert src.size() == len(PAYLOAD)
    # clipped at EOF; entirely past EOF → b"" (416 path)
    assert src.read_range(len(PAYLOAD) - 5, 50) == PAYLOAD[-5:]
    assert src.read_range(len(PAYLOAD) + 10, 4) == b""


def test_http_retry_transient_then_success(served, monkeypatch):
    srv, _ = served
    srv.set_fail_next(2)
    src = HttpRange(srv.url("blob.bin"))
    assert src.read_range(10, 10) == PAYLOAD[10:20]
    assert srv.n_requests == 3  # two 503s then success


def test_http_retry_exhausted(served, monkeypatch):
    srv, _ = served
    monkeypatch.setenv("ODC_STAC_SPARK_HTTP_MAX_RETRY", "3")
    srv.set_fail_next(99)
    src = HttpRange(srv.url("blob.bin"))
    with pytest.raises(RangeIOError, match="failed after 3 attempts"):
        src.read_range(0, 4)
    assert srv.n_requests == 3


def test_http_404_is_permanent(served):
    srv, _ = served
    src = HttpRange(srv.url("missing.bin"))
    with pytest.raises(RangeIOError, match="HTTP 404"):
        src.read_range(0, 4)
    assert srv.n_requests == 1  # a 404 never retries


def test_http_no_range_support_fallback(served):
    srv, _ = served
    srv.set_ignore_range(True)
    src = HttpRange(srv.url("blob.bin"))
    assert src.read_range(1000, 20) == PAYLOAD[1000:1020]
    assert src.n_full_fallbacks == 1
    before = srv.n_requests
    # the cached full body serves later reads without new requests
    assert src.read_range(50_000, 99) == PAYLOAD[50_000:50_099]
    assert src.size() == len(PAYLOAD)
    assert srv.n_requests == before


def test_rangefile_block_cache_coalesces(served):
    srv, _ = served
    f = RangeFile(open_range(srv.url("blob.bin")), block_size=4096, max_blocks=8)
    # 64 sub-KB reads inside the first two blocks → ≤ 2 GETs
    for i in range(64):
        f.seek(i * 100)
        assert f.read(40) == PAYLOAD[i * 100 : i * 100 + 40]
    assert srv.n_requests <= 2
    # cross-block read stitches correctly
    f.seek(4090)
    assert f.read(20) == PAYLOAD[4090:4110]
    # SEEK_END works (size via HEAD or Content-Range)
    f.seek(-8, os.SEEK_END)
    assert f.read() == PAYLOAD[-8:]
    assert f.tell() == len(PAYLOAD)


def test_rangefile_lru_eviction(served):
    srv, _ = served
    f = RangeFile(open_range(srv.url("blob.bin")), block_size=1024, max_blocks=2)
    f.seek(0)
    f.read(10)
    f.seek(1024)
    f.read(10)
    f.seek(2048)
    f.read(10)  # evicts block 0
    n = srv.n_requests
    f.seek(0)
    f.read(10)  # refetch
    assert srv.n_requests == n + 1


# ---------------------------------------------------------------------------
# s3 (fake client — no network; botocore client construction is covered
# by test_aws.py's settings tests)


class _FakeS3:
    def __init__(self, body: bytes):
        self.body = body
        self.calls = []

    def head_object(self, Bucket, Key, **kw):
        self.calls.append(("head", Bucket, Key, kw))
        return {"ContentLength": len(self.body)}

    def get_object(self, Bucket, Key, Range, **kw):
        self.calls.append(("get", Bucket, Key, Range, kw))
        lo_s, hi_s = Range.split("=", 1)[1].split("-", 1)
        lo, hi = int(lo_s), int(hi_s)
        if lo >= len(self.body):
            err = type("E", (Exception,), {})()
            err.response = {"Error": {"Code": "InvalidRange"}}
            raise err

        class _Body:
            def __init__(self, b):
                self._b = b

            def read(self):
                return self._b

        chunk = self.body[lo : hi + 1]
        return {
            "Body": _Body(chunk),
            "ContentRange": f"bytes {lo}-{lo + len(chunk) - 1}/{len(self.body)}",
        }


def test_s3_range_reads():
    fake = _FakeS3(PAYLOAD)
    src = S3Range("s3://bkt/some/key.tif", client=fake)
    assert src.bucket == "bkt" and src.key == "some/key.tif"
    assert src.read_range(100, 50) == PAYLOAD[100:150]
    assert fake.calls[-1][3] == "bytes=100-149"
    # size learned from ContentRange — no extra HEAD
    assert src.size() == len(PAYLOAD)
    assert all(c[0] == "get" for c in fake.calls)
    # past-EOF → b"" (InvalidRange path)
    assert src.read_range(len(PAYLOAD) + 1, 10) == b""


def test_s3_requester_pays_from_env_settings(monkeypatch):
    from odc_stac_spark.sources import synth

    fake = _FakeS3(PAYLOAD)
    monkeypatch.setitem(synth._ENV, "aws", {"requester_pays": True})
    src = S3Range("s3://bkt/k", client=fake)
    src.read_range(0, 4)
    assert fake.calls[-1][4] == {"RequestPayer": "requester"}


# ---------------------------------------------------------------------------
# end-to-end: the in-house readers over a live HTTP range server


def test_cog_header_and_tile_over_http(served, tmp_path):
    from odc_stac_spark.model import GeoBox
    from odc_stac_spark.sources.geotiff import (
        read_cog_header,
        read_cog_tile,
        write_cog_file,
    )

    ny, nx = 64, 96
    yy, xx = np.mgrid[0:ny, 0:nx]
    img = ((yy * 37 + xx * 17) % 4001).astype(np.int16)
    gbox = GeoBox((ny, nx), (10.0, 0.0, 0.0, 0.0, -10.0, 640.0), "EPSG:32735")
    path = tmp_path / "scene.tif"
    write_cog_file(
        str(path), img, gbox, tile=32, compression="deflate", predictor=2,
        overview_levels=[],
    )
    srv, _ = served
    url = srv.url("scene.tif")
    hdr_l = read_cog_header(str(path))
    hdr_h = read_cog_header(url)
    assert hdr_h["levels"][0]["ny"] == hdr_l["levels"][0]["ny"]
    n0 = srv.n_requests
    for idx in (0, 3, 5):
        np.testing.assert_array_equal(
            read_cog_tile(url, hdr_h, 0, idx), read_cog_tile(str(path), hdr_l, 0, idx)
        )
    # one ranged GET per tile — the COG discipline over object storage
    assert srv.n_requests - n0 == 3


def test_load_pipeline_cog_over_http(served, tmp_path, spark):
    """The verdict's gate: the full load()→zonal pipeline over an
    http:// COG URI produces the identical result to the local path."""
    from odc_stac_spark.model import GeoBox, RasterBandMetadata, RasterSource
    from odc_stac_spark.operators.zonal import zonal_stats
    from odc_stac_spark.plans.load import Item, load
    from odc_stac_spark.sources.geotiff import write_cog_file

    ny, nx = 64, 96
    yy, xx = np.mgrid[0:ny, 0:nx]
    bands = [((b * 1013 + yy * 37 + xx * 17) % 4001).astype(np.int16) for b in (1, 2, 3)]
    cube = np.stack(bands, axis=-1)
    gbox = GeoBox((ny, nx), (10.0, 0.0, 0.0, 0.0, -10.0, 640.0), "EPSG:32735")
    path = tmp_path / "mb.tif"
    write_cog_file(str(path), cube, gbox, tile=64, compression="deflate",
                   predictor=2, overview_levels=[])
    srv, _ = served

    def run(uri):
        item = Item(
            id="mb-000",
            datetime=datetime(2020, 6, 6, 8, 30),
            bands={
                "red": RasterSource(uri, band=1, geobox=gbox,
                                    meta=RasterBandMetadata("int16", None)),
                "nir": RasterSource(uri, band=3, geobox=gbox,
                                    meta=RasterBandMetadata("int16", None)),
            },
            lon=27.4,
        )
        tiles_df, _ = load(spark, [item], chunks=(32, 48))
        df = zonal_stats(tiles_df, nodata=None, zone_h=16, zone_w=32)
        return sorted(tuple(r) for r in df.collect())

    assert run(srv.url("mb.tif")) == run(str(path))


def test_jp2_over_http(served, tmp_path):
    from odc_stac_spark.operators.jp2 import (
        encode_jp2,
        read_jp2_header,
        read_jp2_tile,
    )

    img = ((np.arange(48)[:, None] * 7 + np.arange(64)[None, :] * 3) % 255).astype(
        np.uint8
    )
    blob = encode_jp2(img, levels=2)
    path = tmp_path / "scene.jp2"
    path.write_bytes(blob)
    srv, _ = served
    url = srv.url("scene.jp2")
    hdr_l = read_jp2_header(str(path))
    hdr_h = read_jp2_header(url)
    assert hdr_h["ys"] == hdr_l["ys"] and hdr_h["xs"] == hdr_l["xs"]
    for isot, _ in hdr_l["tiles"]:
        np.testing.assert_array_equal(
            read_jp2_tile(url, hdr_h, isot), read_jp2_tile(str(path), hdr_l, isot)
        )


def test_netcdf_and_hdf5_over_http(served, tmp_path):
    from odc_stac_spark.sources.hdf5 import write_hdf5
    from odc_stac_spark.sources.netcdf import (
        read_netcdf_header,
        read_netcdf_var,
        write_netcdf,
    )

    data = ((np.arange(40)[:, None] * 13 + np.arange(50)[None, :]) % 251).astype(
        np.int16
    )
    nc = tmp_path / "t.nc"
    write_netcdf(str(nc), {"y": 40, "x": 50}, {"v": (("y", "x"), data)})
    h5 = tmp_path / "t.h5"
    write_hdf5(
        str(h5),
        {"v": {"data": data, "chunks": (16, 16), "compression": "gzip", "shuffle": True}},
    )
    srv, _ = served
    for name, local in (("t.nc", nc), ("t.h5", h5)):
        url = srv.url(name)
        hdr_h = read_netcdf_header(url)
        hdr_l = read_netcdf_header(str(local))
        got = read_netcdf_var(url, hdr_h, "v", (slice(4, 30), slice(7, 44)))
        want = read_netcdf_var(str(local), hdr_l, "v", (slice(4, 30), slice(7, 44)))
        np.testing.assert_array_equal(got, want)


def test_http_retry_inside_reader(served, tmp_path):
    """Fault injection through a real reader: transient 503s mid-read
    heal via the retry policy (reference GDAL_HTTP_MAX_RETRY behavior)."""
    from odc_stac_spark.model import GeoBox
    from odc_stac_spark.sources.geotiff import (
        read_cog_header,
        read_cog_tile,
        write_cog_file,
    )

    img = (np.arange(32 * 32, dtype=np.int32) % 97).reshape(32, 32).astype(np.int16)
    gbox = GeoBox((32, 32), (10.0, 0.0, 0.0, 0.0, -10.0, 320.0), "EPSG:32735")
    path = tmp_path / "r.tif"
    write_cog_file(str(path), img, gbox, tile=32, overview_levels=[])
    srv, _ = served
    url = srv.url("r.tif")
    hdr = read_cog_header(url)
    srv.set_fail_next(2)
    np.testing.assert_array_equal(
        read_cog_tile(url, hdr, 0, 0), read_cog_tile(str(path), hdr, 0, 0)
    )


# ---------------------------------------------------------------------------
# write half: put_bytes


def test_put_bytes_local(tmp_path):
    from odc_stac_spark.sources.rangeio import put_bytes

    p = tmp_path / "nested" / "dir" / "x.bin"
    put_bytes(str(p), PAYLOAD[:100])  # parent dirs created
    assert p.read_bytes() == PAYLOAD[:100]


def test_put_bytes_http_roundtrip(served):
    from odc_stac_spark.sources.rangeio import fetch_range, put_bytes

    srv, root = served
    put_bytes(srv.url("up.bin"), PAYLOAD[:5000])
    assert (root / "up.bin").read_bytes() == PAYLOAD[:5000]
    assert fetch_range(srv.url("up.bin"), 100, 50) == PAYLOAD[100:150]


def test_put_bytes_http_retries(served, monkeypatch):
    from odc_stac_spark.sources.rangeio import put_bytes

    srv, root = served
    srv.set_fail_next(2)
    put_bytes(srv.url("retry.bin"), b"abc")
    assert (root / "retry.bin").read_bytes() == b"abc"
    assert srv.n_requests == 3


def test_put_bytes_s3_fake_client(monkeypatch):
    from odc_stac_spark.sources import rangeio

    calls = []

    class _Client:
        def put_object(self, Bucket, Key, Body, **kw):
            calls.append((Bucket, Key, bytes(Body), kw))

    monkeypatch.setattr(
        rangeio.S3Range, "_get_client", lambda self: _Client()
    )
    rangeio.put_bytes("s3://bkt/some/key.tif", b"\x01\x02")
    assert calls == [("bkt", "some/key.tif", b"\x01\x02", {})]


def test_write_cog_to_http_and_read_back(served):
    """The full remote round trip: the COG writer PUTs to an http://
    destination and the reader serves it back with ranged GETs — object
    storage in, object storage out."""
    from odc_stac_spark.model import GeoBox
    from odc_stac_spark.sources.geotiff import (
        read_cog_header,
        read_cog_tile,
        write_cog_file,
    )

    srv, root = served
    ny, nx = 48, 64
    yy, xx = np.mgrid[0:ny, 0:nx]
    img = ((yy * 13 + xx * 29) % 251).astype(np.int16)
    gbox = GeoBox((ny, nx), (10.0, 0.0, 0.0, 0.0, -10.0, 480.0), "EPSG:32735")
    url = srv.url("remote_out.tif")
    write_cog_file(url, img, gbox, tile=32, compression="deflate", predictor=2,
                   overview_levels=[])
    hdr = read_cog_header(url)
    full = np.zeros((ny, nx), np.int16)
    lv = hdr["levels"][0]
    ntx = (lv["nx"] + lv["tile_w"] - 1) // lv["tile_w"]
    for ti in range(len(lv["offsets"])):
        t = read_cog_tile(url, hdr, 0, ti)
        y0, x0 = (ti // ntx) * lv["tile_h"], (ti % ntx) * lv["tile_w"]
        h = min(lv["tile_h"], ny - y0)
        w = min(lv["tile_w"], nx - x0)
        full[y0 : y0 + h, x0 : x0 + w] = t[:h, :w]
    np.testing.assert_array_equal(full, img)


def test_http_head_rejected_falls_back_to_get_probe(served):
    """GET-only endpoints (presigned S3/Azure URLs, servers answering
    405 to HEAD) must still learn the size via a ranged GET probe."""
    srv, _ = served
    srv.set_reject_head(True)
    src = HttpRange(srv.url("blob.bin"))
    assert src.size() == len(PAYLOAD)
    # and reads still work afterwards
    assert src.read_range(200, 20) == PAYLOAD[200:220]


def test_http_head_rejected_no_range_support(served):
    """HEAD rejected AND Range ignored → the 0-0 probe gets the full
    body; it must be cached so size+reads cost exactly one request."""
    srv, _ = served
    srv.set_reject_head(True)
    srv.set_ignore_range(True)
    src = HttpRange(srv.url("blob.bin"))
    assert src.size() == len(PAYLOAD)
    n_after_probe = srv.n_requests
    assert src.read_range(1234, 56) == PAYLOAD[1234:1290]
    assert srv.n_requests == n_after_probe  # served from the cached body


def test_retrying_catches_http_client_exceptions(monkeypatch):
    """A connection dropping mid-body raises http.client.IncompleteRead
    (an HTTPException, not URLError) — it must hit the retry policy,
    not fail the Spark task on first occurrence."""
    import http.client

    from odc_stac_spark.sources.rangeio import _retrying

    monkeypatch.setenv("ODC_STAC_SPARK_HTTP_RETRY_DELAY", "0.001")
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise http.client.IncompleteRead(b"partial", expected=100)
        if calls["n"] == 2:
            raise http.client.RemoteDisconnected("gone mid-body")
        return b"ok"

    assert _retrying(flaky, "http://x/", "GET") == b"ok"
    assert calls["n"] == 3


def test_http_head_404_skips_get_probe(served):
    """A definitive 404 on HEAD means the object does not exist — a GET
    probe would 404 identically, so size() surfaces the error without a
    redundant second request."""
    srv, _ = served
    src = HttpRange(srv.url("missing.bin"))
    with pytest.raises(RangeIOError, match="HTTP 404"):
        src.size()
    assert srv.n_requests == 1  # HEAD only; no GET probe, no retries


def test_retrying_rangeioerror_is_permanent(monkeypatch):
    """RangeIOError subclasses OSError; protocol verdicts raised inside
    fn (no Content-Length, 206 without total) must surface immediately,
    not burn the OSError retry/backoff budget first."""
    from odc_stac_spark.sources.rangeio import RangeIOError, _retrying

    monkeypatch.setenv("ODC_STAC_SPARK_HTTP_MAX_RETRY", "5")
    calls = {"n": 0}

    def permanent():
        calls["n"] += 1
        raise RangeIOError("206 without Content-Range total")

    with pytest.raises(RangeIOError, match="without Content-Range"):
        _retrying(permanent, "http://x/", "GET probe")
    assert calls["n"] == 1

"""From-scratch RFC 8878 (Zstandard) decoder — operators/zstd.py.

The decisive property: frames come from REAL encoders (the libzstd CLI
when present, pyarrow's bundled zstd always), never from an own writer —
a foreign-encoder golden gate across levels and content shapes covering
raw/RLE/compressed blocks, 1- and 4-stream Huffman literals (direct and
FSE-compressed weights), treeless reuse, all sequence table modes,
repeat offsets, overlapping matches, multi-block frames and long-window
matches.
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from odc_stac_spark.operators.zstd import decode_zstd, zstd_frame_content_size

_CLI = shutil.which("zstd") or (
    "/root/miniconda/bin/zstd" if os.path.exists("/root/miniconda/bin/zstd") else None
)

rng = np.random.default_rng(99)


def _pa_zstd(data: bytes, level: int = 3) -> bytes:
    import pyarrow as pa

    return bytes(pa.Codec("zstd", compression_level=level).compress(data))


def _cli_zstd(data: bytes, *args: str) -> bytes:
    p = subprocess.run([_CLI, *args, "-c"], input=data, capture_output=True)
    assert p.returncode == 0, p.stderr
    return p.stdout


_SHAPES = {
    "text": b"the quick brown fox jumps over the lazy dog. " * 400,
    "repeat": b"A" * 100000,
    "random": rng.integers(0, 256, 65536).astype(np.uint8).tobytes(),
    "struct": np.arange(50000, dtype=np.int32).tobytes(),
    "mixed": b"".join(bytes([i % 7]) * i for i in range(1, 500)),
    "tile": (np.arange(256 * 256).reshape(256, 256) % 4001).astype(np.int16).tobytes(),
    "tiny": b"x",
    "empty": b"",
}


@pytest.mark.parametrize("name", sorted(_SHAPES))
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_pyarrow_frames_roundtrip(name, level):
    data = _SHAPES[name]
    blob = _pa_zstd(data, level)
    assert decode_zstd(blob) == data


@pytest.mark.skipif(_CLI is None, reason="no zstd CLI in environment")
@pytest.mark.parametrize("name", sorted(_SHAPES))
@pytest.mark.parametrize("level", ["-1", "-5", "-19"])
def test_cli_frames_roundtrip(name, level):
    data = _SHAPES[name]
    assert decode_zstd(_cli_zstd(data, level)) == data


@pytest.mark.skipif(_CLI is None, reason="no zstd CLI in environment")
def test_cli_long_window_and_multiblock():
    big = (open(__file__, "rb").read() + bytes(range(256))) * 400  # > 128 KiB
    assert decode_zstd(_cli_zstd(big, "--long=27", "-9")) == big
    assert decode_zstd(_cli_zstd(big, "-3", "--no-check")) == big


def test_concatenated_and_skippable_frames():
    f1 = _pa_zstd(b"hello ")
    f2 = _pa_zstd(b"world")
    skip = struct.pack("<II", 0x184D2A50, 4) + b"meta"
    assert decode_zstd(f1 + skip + f2) == b"hello world"


def test_frame_content_size_parse():
    data = b"q" * 45960
    blob = _pa_zstd(data)
    assert zstd_frame_content_size(blob) == 45960
    assert zstd_frame_content_size(b"notzstd") is None


def test_dictionary_frames_refused_loudly():
    blob = bytearray(_pa_zstd(b"payload"))
    blob[4] |= 0x01  # dictionary-id-size flag
    with pytest.raises(NotImplementedError, match="dictionary"):
        decode_zstd(bytes(blob))


def test_corrupt_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        decode_zstd(b"\x00\x11\x22\x33rest")


def test_zstd_cog_roundtrip_through_pure_decoder(tmp_path, monkeypatch):
    """ZSTD COG (Compression=50000) read with every native backend
    masked — only the from-scratch decoder serves the tiles."""
    from odc_stac_spark.model import GeoBox
    from odc_stac_spark.sources import geotiff as gt

    a = ((np.add.outer(np.arange(100), np.arange(130)) * 17) % 4001).astype(np.uint16)
    g = GeoBox((100, 130), (10.0, 0.0, 0.0, 0.0, -10.0, 1000.0), "EPSG:32735")
    p = str(tmp_path / "z.tif")
    gt.write_cog_file(p, a, g, tile=64, compression="zstd", overview_levels=[2])

    calls = []

    def pure_only(raw, expected=None):
        calls.append(len(raw))
        return decode_zstd(raw)

    monkeypatch.setattr(gt, "_zstd_decompress", pure_only)
    out = gt.read_cog_file(p)
    np.testing.assert_array_equal(out["data"], a)
    assert calls  # the from-scratch decoder actually served the tiles


def test_xxh64_known_vectors():
    """Public xxHash test vectors — the zstd content checksum hash."""
    from odc_stac_spark.operators.zstd import xxh64

    assert xxh64(b"") == 0xEF46DB3751D8E999
    # self-consistency across the <32 / >=32 byte code paths
    for n in (1, 3, 4, 7, 8, 15, 31, 32, 33, 100, 1000):
        a = bytes(range(256)) * 4
        assert xxh64(a[:n]) == xxh64(bytes(a[:n]))


def test_content_checksum_verified():
    data = b"check me " * 4000
    blob = _pa_zstd(data)
    # pyarrow frames omit the checksum; the CLI adds one
    if _CLI is not None:
        blob = _cli_zstd(data, "-3")
        assert decode_zstd(blob) == data
        bad = bytearray(blob)
        bad[-1] ^= 0xFF  # corrupt the stored checksum
        with pytest.raises(ValueError, match="checksum"):
            decode_zstd(bytes(bad))

"""Foreign-layout golden HDF5 file — the reader proven against bytes it
did NOT write (VERDICT r6 #1; the tests/test_netcdf.py hand-assembly
discipline).

The assembler below builds, byte-by-byte with plain ``struct``, the
layout libhdf5 emits for "latest-format" netCDF-4-style files — a layout
the in-house writer (sources/hdf5.py, superblock v0 + v1 object headers
+ symbol-table groups) NEVER produces, so writer and reader cannot share
a bug on any of these paths:

- superblock version 3 (root object header address, checksummed tail)
- version 2 object headers (``OHDR``): flag-dependent prefix (times,
  1/2-byte chunk-0 sizes), chunk 0 sized WITHOUT its trailing checksum,
  and an ``OCHK`` continuation block carrying the attribute messages
- new-style compact groups: link info + group info + link messages
- dataspace v2, fill value v3 (defined −9999), attributes v3
- filter pipeline v2 (shuffle+deflate, no name field for ids < 256)
- data layout v3 chunked over a v1 B-tree where one all-fill chunk is
  left unallocated — exactly what libhdf5 does for never-written chunks

Checksums are structurally present (4-byte slots) but not Jenkins
lookup3; the reader deliberately parses around, not through, them.

Refusal paths (real libhdf5 features out of profile) must raise loudly:
dense link storage (fractal heap) and data layout v4 chunk indexes.
"""

import struct
import zlib

import numpy as np
import pytest

from odc_stac_spark.sources.hdf5 import read_hdf5_header, read_hdf5_var

UNDEF = 0xFFFFFFFFFFFFFFFF


def u16(v):
    return struct.pack("<H", v)


def u32(v):
    return struct.pack("<I", v)


def u64(v):
    return struct.pack("<Q", v)


def dt_int16():
    # datatype v1, class 0 fixed-point, LE, signed, 2 bytes
    return bytes([0x10, 0x08, 0, 0]) + u32(2) + u16(0) + u16(16)


def dt_f64():
    # datatype v1, class 1 IEEE float, LE, f8
    return (
        bytes([0x11, 0x20, 63, 0]) + u32(8)
        + u16(0) + u16(64) + bytes([52, 11, 0, 52]) + u32(1023)
    )


def dt_str(n):
    return bytes([0x13, 0, 0, 0]) + u32(n)


def dataspace_v2(shape):
    return bytes([2, len(shape), 0, 1]) + b"".join(u64(n) for n in shape)


def attr_v3(name, dtb, spb, data):
    nameb = name.encode() + b"\x00"
    return (
        bytes([3, 0]) + u16(len(nameb)) + u16(len(dtb)) + u16(len(spb))
        + bytes([0]) + nameb + dtb + spb + data
    )


def msg(typ, body):
    # v2 message header: type(1) size(2) flags(1), creation order untracked
    return bytes([typ]) + u16(len(body)) + bytes([0]) + body


def ohdr_v2(messages, with_times=True, chunk0_width=2, cont=None):
    """OHDR prefix + chunk-0 messages [+ continuation ref]; chunk 0's
    size field counts messages only — the checksum sits AFTER chunk 0."""
    body = b"".join(msg(t, b) for t, b in messages)
    if cont is not None:
        body += msg(0x10, u64(cont[0]) + u64(cont[1]))
    flags = {1: 0, 2: 1, 4: 2}[chunk0_width]
    if with_times:
        flags |= 0x20
    out = b"OHDR" + bytes([2, flags])
    if with_times:
        out += u32(1) * 4  # access/mod/change/birth
    out += len(body).to_bytes(chunk0_width, "little")
    return out + body + u32(0xDEADBEEF)  # chunk-0 checksum slot


def ochk(messages):
    body = b"".join(msg(t, b) for t, b in messages)
    return b"OCHK" + body + u32(0xDEADBEEF)


def link_msg(name, addr):
    nameb = name.encode()
    return bytes([1, 0, len(nameb)]) + nameb + u64(addr)


def link_info(fheap=UNDEF):
    return bytes([0, 0]) + u64(fheap) + u64(UNDEF)


TEMP = np.full((40, 50), -9999, np.int16)
TEMP[:25, :] = (np.arange(25)[:, None] * 7 % 501) + np.arange(50)[None, :]
TEMP[25:, :25] = (np.arange(25, 40)[:, None] * 13 % 777) - np.arange(25)[None, :]
Y = np.arange(40, dtype=np.float64) * -10.0 + 600.0
X = np.arange(50, dtype=np.float64) * 10.0


def shuffle_deflate(block: np.ndarray) -> bytes:
    raw = block.tobytes()
    raw = np.frombuffer(raw, np.uint8).reshape(-1, block.dtype.itemsize).T.tobytes()
    return zlib.compress(raw, 6)


def assemble_golden(layout_version=3, dense_links=False) -> bytes:
    buf = bytearray(b"\x00" * 48)  # superblock v3 placeholder

    def add(b):
        off = len(buf)
        buf.extend(b)
        return off

    # --- temperature: chunked 25x25, chunk (25,25) all-fill → unallocated
    chunk_entries = []
    for oy, ox in ((0, 0), (0, 25), (25, 0)):
        block = np.full((25, 25), -9999, np.int16)
        sel = np.s_[oy : min(oy + 25, 40), ox : min(ox + 25, 50)]
        block[: sel[0].stop - oy, : sel[1].stop - ox] = TEMP[sel]
        raw = shuffle_deflate(block)
        chunk_entries.append(((oy, ox), add(raw), len(raw)))
    node = b"TREE" + bytes([1, 0]) + u16(len(chunk_entries)) + u64(UNDEF) + u64(UNDEF)
    for (oy, ox), addr, size in chunk_entries:
        node += u32(size) + u32(0) + u64(oy) + u64(ox) + u64(0) + u64(addr)
    node += u32(0) + u32(0) + u64(40) + u64(50) + u64(0)  # upper-bound key
    btree_addr = add(node)

    # attribute messages live in an OCHK continuation block
    attrs = [
        (0x000C, attr_v3("_FillValue", dt_int16(), dataspace_v2(()), np.int16(-9999).tobytes())),
        (0x000C, attr_v3("units", dt_str(1), dataspace_v2(()), b"K")),
    ]
    cont_addr = add(ochk(attrs))
    cont_len = len(buf) - cont_addr  # includes OCHK sig + checksum

    if layout_version == 3:
        layout = bytes([3, 2, 3]) + u64(btree_addr) + u32(25) + u32(25) + u32(2)
    else:  # v4: "latest" chunk indexes — must be refused loudly
        layout = bytes([4, 2, 0, 3]) + u32(25) + u32(25) + u32(2) + bytes([1])
    pipeline = (
        bytes([2, 2])  # v2, 2 filters: ids < 256 carry NO name field
        + u16(2) + u16(0) + u16(1) + u32(2)  # shuffle(itemsize=2)
        + u16(1) + u16(0) + u16(1) + u32(6)  # deflate(level=6)
    )
    temp_oh = add(
        ohdr_v2(
            [
                (0x0001, dataspace_v2((40, 50))),
                (0x0003, dt_int16()),
                (0x0005, bytes([3, 0x20]) + u32(2) + np.int16(-9999).tobytes()),
                (0x000B, pipeline),
                (0x0008, layout),
            ],
            cont=(cont_addr, cont_len),
        )
    )

    # --- y / x coordinate vars: contiguous layout, dimension-scale tags
    coord_ohs = {}
    for name, arr in (("y", Y), ("x", X)):
        data_addr = add(arr.tobytes())
        coord_ohs[name] = add(
            ohdr_v2(
                [
                    (0x0001, dataspace_v2(arr.shape)),
                    (0x0003, dt_f64()),
                    (0x0005, bytes([3, 0])),  # fill v3, undefined
                    (0x0008, bytes([3, 1]) + u64(data_addr) + u64(arr.nbytes)),
                    (0x000C, attr_v3("CLASS", dt_str(16), dataspace_v2(()),
                                     b"DIMENSION_SCALE\x00")),
                    (0x000C, attr_v3("NAME", dt_str(2), dataspace_v2(()),
                                     name.encode() + b"\x00")),
                ],
                with_times=False,
                chunk0_width=1,
            )
        )

    # --- root group: link info + group info + links + global attr
    root_oh = add(
        ohdr_v2(
            [
                (0x0002, link_info(fheap=0x1000 if dense_links else UNDEF)),
                (0x000A, bytes([0, 0])),
                (0x0006, link_msg("temperature", temp_oh)),
                (0x0006, link_msg("y", coord_ohs["y"])),
                (0x0006, link_msg("x", coord_ohs["x"])),
                (0x000C, attr_v3("Conventions", dt_str(6), dataspace_v2(()), b"CF-1.7")),
            ]
        )
    )

    sb = (
        b"\x89HDF\r\n\x1a\n" + bytes([3, 8, 8, 0])
        + u64(0) + u64(UNDEF) + u64(len(buf)) + u64(root_oh) + u32(0xDEADBEEF)
    )
    buf[:48] = sb
    return bytes(buf)


@pytest.fixture()
def golden(tmp_path):
    p = str(tmp_path / "golden_nc4.h5")
    with open(p, "wb") as f:
        f.write(assemble_golden())
    return p


def test_golden_header(golden):
    hdr = read_hdf5_header(golden)
    assert hdr["format"] == "hdf5" and hdr["version"] == 3
    assert hdr["dims"] == {"y": 40, "x": 50}
    assert hdr["gattrs"]["Conventions"] == "CF-1.7"
    v = hdr["vars"]["temperature"]
    assert v["shape"] == (40, 50)
    assert v["dtype"] == np.dtype("<i2")
    assert v["layout_class"] == 2 and v["chunks"] == (25, 25)
    assert v["filters"] == [(2, [2]), (1, [6])]
    assert v["fill_raw"] == np.int16(-9999).tobytes()
    # attrs arrived through the OCHK continuation block
    assert v["attrs"]["units"] == "K" and v["attrs"]["_FillValue"] == -9999


def test_golden_full_and_windowed_reads(golden):
    hdr = read_hdf5_header(golden)
    np.testing.assert_array_equal(read_hdf5_var(golden, hdr, "temperature"), TEMP)
    # window straddling the UNALLOCATED chunk reads fill there
    got = read_hdf5_var(golden, hdr, "temperature", (slice(20, 40), slice(20, 50)))
    np.testing.assert_array_equal(got, TEMP[20:40, 20:50])
    assert (got[-5:, -5:] == -9999).all()
    np.testing.assert_array_equal(read_hdf5_var(golden, hdr, "y"), Y)
    np.testing.assert_array_equal(read_hdf5_var(golden, hdr, "x"), X)


def test_golden_byte_layout_differs_from_inhouse_writer(golden, tmp_path):
    """The golden file must exercise paths our writer never emits —
    otherwise it proves nothing beyond the roundtrip tests."""
    from odc_stac_spark.sources.hdf5 import write_hdf5

    raw = open(golden, "rb").read()
    assert raw[8] == 3  # superblock v3 (writer emits v0)
    assert b"OHDR" in raw and b"OCHK" in raw  # v2 headers (writer emits v1)
    assert b"SNOD" not in raw  # link messages, not symbol tables
    p2 = str(tmp_path / "ours.h5")
    write_hdf5(p2, {"v": {"data": TEMP, "chunks": (25, 25)}})
    ours = open(p2, "rb").read()
    assert ours[8] == 0 and b"OHDR" not in ours and b"SNOD" in ours


def test_layout_v4_refused_loudly(tmp_path):
    p = str(tmp_path / "v4.h5")
    with open(p, "wb") as f:
        f.write(assemble_golden(layout_version=4))
    with pytest.raises(NotImplementedError, match="layout version 4"):
        read_hdf5_header(p)


def test_dense_link_storage_refused_loudly(tmp_path):
    p = str(tmp_path / "dense.h5")
    with open(p, "wb") as f:
        f.write(assemble_golden(dense_links=True))
    with pytest.raises(NotImplementedError, match="dense link storage"):
        read_hdf5_header(p)

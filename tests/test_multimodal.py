"""Multimodal binary-column plumbing: byte-exact round trips through
Arrow/mapInPandas vs direct numpy computation."""

from __future__ import annotations

import numpy as np
import pytest

from odc_stac_spark.operators.multimodal import (
    decode_metadata,
    decode_real_image,
    decode_simg,
    demo_media_df,
    encode_simg,
    frame_sample,
    image_stats,
    resize_nearest,
    synth_image,
)


def test_simg_roundtrip():
    img = synth_image(7, w=20, h=12, c=3)
    assert img.shape == (12, 20, 3)
    back = decode_simg(encode_simg(img))
    np.testing.assert_array_equal(back, img)


def test_decode_metadata_and_stats(spark, sf_dir):
    media = demo_media_df(spark, sf_dir).where("doc_id < 20")
    meta = {r.doc_id: r for r in decode_metadata(media).collect()}
    stats = {r.doc_id: r for r in image_stats(media).collect()}
    for doc_id in meta:
        w = 16 + doc_id % 8
        img = synth_image(doc_id, w, 16, 3)
        m = meta[doc_id]
        assert (m.width, m.height, m.channels) == (w, 16, 3)
        assert m.payload_bytes == w * 16 * 3
        s = stats[doc_id]
        assert s.mean == round(float(img.astype("float64").mean()), 6)
        assert s.p_min == int(img.min()) and s.p_max == int(img.max())


def test_resize_and_frame_sample(spark, sf_dir):
    media = demo_media_df(spark, sf_dir).where("doc_id < 8")
    rz = {r.doc_id: bytes(r.media) for r in resize_nearest(media, 8, 8).collect()}
    fs = {r.doc_id: bytes(r.media) for r in frame_sample(media, every=4).collect()}
    for doc_id in rz:
        w = 16 + doc_id % 8
        img = synth_image(doc_id, w, 16, 3)
        yi = (np.arange(8) * 16 // 8).astype(int)
        xi = (np.arange(8) * w // 8).astype(int)
        np.testing.assert_array_equal(decode_simg(rz[doc_id]), img[np.ix_(yi, xi)])
        np.testing.assert_array_equal(decode_simg(fs[doc_id]), img[::4])


def test_demo_image_stats_fusion_matches_composed_chain(spark, sf_dir):
    """The r17 fused single-pass operator must be row-for-row identical to
    the composed 3-stage chain it replaced (decode → resize → re-encode →
    decode → stats) and to the 2-stage chain (decode → stats), for both
    the SIMG default and a real-codec media type."""
    from odc_stac_spark.operators.multimodal import demo_image_stats

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    media = demo_media_df(spark, sf_dir).where("doc_id < 32")
    want_rz = rows(image_stats(resize_nearest(media, 8, 8)))
    got_rz = rows(demo_image_stats(spark, sf_dir, out_w=8, out_h=8).where("doc_id < 32"))
    assert got_rz == want_rz

    want_plain = rows(image_stats(media))
    got_plain = rows(demo_image_stats(spark, sf_dir).where("doc_id < 32"))
    assert got_plain == want_plain

    png = demo_media_df(spark, sf_dir, media_type="image/png").where("doc_id < 8")
    want_png = rows(image_stats(png))
    got_png = rows(
        demo_image_stats(spark, sf_dir, media_type="image/png").where("doc_id < 8")
    )
    assert got_png == want_png


def test_real_decode_is_clearly_stubbed():
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_real_image(b"\x89PNG...")


def test_audio_codec_roundtrip_and_features(spark, sf_dir):
    from odc_stac_spark.operators.multimodal import (
        audio_features,
        decode_saud,
        demo_audio_df,
        encode_saud,
        synth_audio,
    )

    s = synth_audio(7, 1234)
    back, rate = decode_saud(encode_saud(s, 22050))
    np.testing.assert_array_equal(back, s)
    assert rate == 22050

    feats = {r.doc_id: r for r in audio_features(demo_audio_df(spark, sf_dir).where("doc_id < 6")).collect()}
    for doc_id, f in feats.items():
        clip = synth_audio(doc_id, 1000 + doc_id % 500).astype(np.float64)
        assert f.n_samples == clip.size
        assert f.rms == round(float(np.sqrt((clip**2).mean())), 6)
        sign = np.sign(clip)
        assert f.zero_crossings == int(np.count_nonzero(np.diff(sign[sign != 0]) != 0))


def test_svid_roundtrip_and_frame_sampling():
    """SVID byte layout roundtrips; frame sampling keeps every k-th frame."""
    import numpy as np

    from odc_stac_spark.operators.multimodal import (
        decode_svid,
        encode_svid,
        synth_video,
    )

    fr = synth_video(7)
    assert fr.shape == (4 + 7 % 4, 8, 8 + 7 % 4, 1)
    got = decode_svid(encode_svid(fr))
    np.testing.assert_array_equal(got, fr)
    kept = got[::2]
    assert kept.shape[0] == (fr.shape[0] + 1) // 2


def test_video_features_match_numpy(spark, sf_dir):
    import numpy as np

    from odc_stac_spark.operators.multimodal import (
        demo_video_df,
        synth_video,
        video_frame_features,
    )

    out = {r.doc_id: r for r in video_frame_features(
        demo_video_df(spark, sf_dir), every=2
    ).collect()}
    for doc_id in (0, 3, 11):
        fr = synth_video(doc_id)
        r = out[doc_id]
        assert r.n_frames == fr.shape[0]
        assert r.kept_frames == fr[::2].shape[0]
        assert abs(r.kept_mean - round(float(fr[::2].astype(np.float64).mean()), 6)) < 1e-9


def test_decoder_slot_accepts_dropin_codec(spark):
    """Codec-seam contract (round-4 verdict item 9): installing a real
    decoder through register_decoder must run the full image_stats path
    end-to-end with ZERO engine changes — here a fake 'PNG' decoder stands
    in for PIL, decoding a raw (h, w, c)-prefixed payload the SIMG parser
    would reject."""
    import struct as _struct

    import numpy as np

    from odc_stac_spark.operators import multimodal as mm

    def decode_fakepng(data: bytes) -> np.ndarray:
        h, w, c = _struct.unpack_from("<HHB", data)
        return np.frombuffer(data, np.uint8, count=h * w * c, offset=5).reshape(h, w, c)

    def encode_fakepng(arr: np.ndarray) -> bytes:
        h, w, c = arr.shape
        return _struct.pack("<HHB", h, w, c) + arr.astype(np.uint8).tobytes()

    imgs = {i: mm.synth_image(i, 12 + i, 10, 3) for i in range(4)}
    rows = [(i, encode_fakepng(a), "image/x-fakepng") for i, a in imgs.items()]
    media = spark.createDataFrame(
        rows, "doc_id long, media binary, media_type string"
    )

    # before registration: unknown type falls through to the real-codec stub
    import pytest as _pytest

    with _pytest.raises(Exception, match="Pillow|decode"):
        mm.image_stats(media).collect()

    mm.register_decoder("image/x-fakepng", decode_fakepng)
    try:
        got = {r.doc_id: r for r in mm.image_stats(media).collect()}
        assert set(got) == set(imgs)
        for i, a in imgs.items():
            px = a.astype(np.float64)
            assert abs(got[i].mean - round(float(px.mean()), 6)) < 1e-9
            assert abs(got[i].std - round(float(px.std()), 6)) < 1e-9
            assert got[i].p_min == int(px.min()) and got[i].p_max == int(px.max())

        # resize path through the same slot: decode fakepng, emit SIMG
        rz = {r.doc_id: r for r in mm.resize_nearest(media, 8, 8).collect()}
        px0 = imgs[0]
        h, w, _ = px0.shape
        yi = (np.arange(8) * h // 8).astype(int)
        xi = (np.arange(8) * w // 8).astype(int)
        np.testing.assert_array_equal(
            mm.decode_simg(bytes(rz[0].media)), px0[np.ix_(yi, xi)]
        )
    finally:
        mm.DECODERS.pop("image/x-fakepng", None)


def test_audio_spectral_features_match_numpy(spark):
    """FFT features must equal a direct numpy computation on the same
    clips (the operator has no SQL oracle — this is its correctness gate)."""
    import json

    import numpy as np

    from odc_stac_spark.operators.multimodal import (
        audio_spectral_features,
        demo_audio_df,
        synth_audio,
    )

    out = {
        r.doc_id: r
        for r in audio_spectral_features(
            demo_audio_df(spark, "/root/testdata/sf0.001", media_type="audio/wav")
        ).collect()
    }
    assert len(out) >= 50
    for doc_id in list(out)[:10]:
        s = synth_audio(doc_id, 1000 + doc_id % 500).astype(np.float64)
        spec = np.abs(np.fft.rfft(s))
        power = spec**2
        freqs = np.fft.rfftfreq(s.size, d=1.0 / 16000)
        r = out[doc_id]
        assert r.n_samples == s.size
        assert r.dominant_bin == int(np.argmax(spec[1:]) + 1)
        assert r.spectral_centroid_hz == round(float((freqs * power).sum() / power.sum()), 4)
        edges = np.linspace(0, power.size, 9).astype(int)
        want = [round(float(power[a:b].sum()), 3) for a, b in zip(edges, edges[1:])]
        assert json.loads(r.band_energy) == want


def test_resample_audio_linear_correctness():
    import numpy as np

    from odc_stac_spark.operators.multimodal import resample_audio

    s = np.array([0.0, 10.0, 20.0, 30.0, 40.0])
    # 2:1 downsample = exact decimation
    np.testing.assert_allclose(resample_audio(s, 16000, 8000), [0.0, 20.0])
    # 1:2 upsample = midpoint interpolation
    up = resample_audio(s, 8000, 16000)
    assert up.size == 10
    np.testing.assert_allclose(up[:5], [0.0, 5.0, 10.0, 15.0, 20.0])
    # identity
    np.testing.assert_allclose(resample_audio(s, 16000, 16000), s)
    # 3:2 rational ratio, spot-check position math: out[1] at src pos 1.5
    r = resample_audio(s, 48000, 32000)
    np.testing.assert_allclose(r[1], 15.0)


def test_install_native_codecs_noop_without_libs():
    """No Pillow/turbojpeg in this container: the probe must engage
    nothing and leave the pure-Python codecs in place."""
    import odc_stac_spark.operators.multimodal as mm

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present — covered by the engaged-path test")
    except ImportError:
        pass
    before = dict(mm.DECODERS)
    assert mm.install_native_codecs() == {}
    assert mm.DECODERS == before
    from odc_stac_spark.operators.jpeg import decode_jpeg

    assert mm.DECODERS["image/jpeg"] is decode_jpeg


def test_install_native_codecs_engages_fake_pillow(monkeypatch):
    """Drop-in contract for a NATIVE decoder: with a (faked) Pillow on the
    path, install_native_codecs must register it through the DECODERS seam
    so decode dispatch uses it for jpeg/png/bmp — zero engine changes."""
    import sys
    import types

    import odc_stac_spark.operators.multimodal as mm

    calls = []

    class _FakeImg:
        mode = "L"

        def convert(self, mode):
            return self

        def __array__(self, dtype=None, copy=None):
            return np.full((4, 6), 9, np.uint8)

    fake_image_mod = types.ModuleType("PIL.Image")

    def _open(buf):
        calls.append(buf.read())
        return _FakeImg()

    fake_image_mod.open = _open
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    saved = dict(mm.DECODERS)
    try:
        engaged = mm.install_native_codecs()
        assert engaged == {
            mt: "pillow"
            for mt in (
                "image/jpeg", "image/png", "image/bmp",
                "image/webp", "image/gif", "image/x-icon",
            )
        }
        out = mm.decode_image(b"\xff\xd8fake", "image/jpeg")
        assert out.shape == (4, 6, 1) and out.dtype == np.uint8
        assert calls == [b"\xff\xd8fake"]  # the fake native codec ran
    finally:
        mm.DECODERS.clear()
        mm.DECODERS.update(saved)


def test_mp4_mjpeg_container_roundtrip():
    """ISO BMFF mux → demux: box tree + sample tables (stsd/stts/stsc/
    stsz/stco) carry variable-size MJPEG samples losslessly (uniform
    even-valued frames are exact through baseline JPEG)."""
    from odc_stac_spark.operators.codecs import decode_mp4_mjpeg, encode_mp4_mjpeg

    frames = [np.full((16, 24), 2 * ((i * 13) % 128), np.uint8) for i in range(7)]
    blob = encode_mp4_mjpeg(frames, fps=5, quality=50)
    # container-level assertions (ISO/IEC 14496-12)
    assert blob[4:8] == b"ftyp"
    assert b"moov" in blob and b"mdat" in blob and b"stco" in blob
    out = decode_mp4_mjpeg(blob)
    assert out.shape == (7, 16, 24, 1)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(out[i, :, :, 0], f)
    assert decode_mp4_mjpeg(blob, every=3).shape[0] == 3
    assert decode_mp4_mjpeg(blob, max_frames=2).shape[0] == 2


def test_mp4_compressed_codec_refuses_loudly():
    from odc_stac_spark.operators.codecs import decode_mp4_mjpeg, encode_mp4_mjpeg

    blob = bytearray(encode_mp4_mjpeg([np.zeros((16, 16), np.uint8)]))
    at = blob.index(b"jpeg", blob.index(b"stsd"))
    blob[at : at + 4] = b"hev1"  # HEVC: still the ffmpeg seam
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_mp4_mjpeg(bytes(blob))
    # avc1 now decodes in-repo (operators/h264.py) — but an avc1 entry
    # without its avcC config record is malformed and refuses loudly
    blob[at : at + 4] = b"avc1"
    with pytest.raises(ValueError, match="avcC"):
        decode_mp4_mjpeg(bytes(blob))


def test_mp4_registered_in_video_decoders():
    from odc_stac_spark.operators import multimodal as mm

    assert "video/mp4" in mm.VIDEO_DECODERS


def test_fmp4_fragment_demux_matches_plain():
    """Fragmented (moof/trun, ISO 14496-12 §8.8) layout demuxes to the
    SAME frames as the classic sample-table layout, across fragment
    sizes, with every-k sampling intact."""
    from odc_stac_spark.operators.codecs import (
        decode_mp4_mjpeg,
        encode_mp4_mjpeg,
        encode_mp4_mjpeg_fragmented,
    )

    frames = [
        np.full((16, 24), 2 * ((7 * 31 + f * 17) % 128), np.uint8) for f in range(5)
    ]
    plain = decode_mp4_mjpeg(encode_mp4_mjpeg(frames, fps=5, quality=50))
    for fpf in (1, 2, 3, 8):
        blob = encode_mp4_mjpeg_fragmented(
            frames, fps=5, quality=50, frames_per_fragment=fpf
        )
        np.testing.assert_array_equal(decode_mp4_mjpeg(blob), plain)
    blob = encode_mp4_mjpeg_fragmented(frames, fps=5, quality=50)
    assert decode_mp4_mjpeg(blob, every=2).shape[0] == 3
    assert decode_mp4_mjpeg(blob, max_frames=2).shape[0] == 2


def test_fmp4_layout_is_really_fragmented():
    from odc_stac_spark.operators.codecs import encode_mp4_mjpeg_fragmented

    blob = encode_mp4_mjpeg_fragmented(
        [np.zeros((8, 8), np.uint8)] * 4, frames_per_fragment=2
    )
    assert blob.count(b"moof") == 2 and blob.count(b"trun") == 2
    assert b"mvex" in blob and b"trex" in blob


def test_fmp4_hevc_refuses_loudly():
    """The compressed-codec seam holds for segmented streams too —
    codecs beyond MJPEG/avc1 must refuse toward ffmpeg, never
    mis-decode; a config-less avc1 rename refuses as malformed."""
    from odc_stac_spark.operators.codecs import (
        decode_mp4_mjpeg,
        encode_mp4_mjpeg_fragmented,
    )

    blob = bytearray(encode_mp4_mjpeg_fragmented([np.zeros((16, 16), np.uint8)] * 3))
    at = blob.index(b"jpeg", blob.index(b"stsd"))
    blob[at : at + 4] = b"hev1"
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_mp4_mjpeg(bytes(blob))
    blob[at : at + 4] = b"avc1"
    with pytest.raises(ValueError, match="avcC"):
        decode_mp4_mjpeg(bytes(blob))


def test_fmp4_trex_default_size_multitrack_order():
    """trex default_sample_size must survive a LATER trex for another
    track (ISO 14496-12 §8.8.3: one trex per track; order is arbitrary).
    Regression: the scan used to overwrite trex_size then zero it when
    tid != video_track_id, so a video trex followed by an audio trex
    lost the default and a size-less trun refused a valid stream."""
    import struct

    from odc_stac_spark.operators.codecs import (
        _mp4_box,
        _mp4_full,
        decode_mp4_mjpeg,
        encode_mp4_mjpeg,
        encode_mp4_mjpeg_fragmented,
    )
    from odc_stac_spark.operators.jpeg import encode_jpeg

    frame = np.full((16, 24), 128, np.uint8)
    jpg = encode_jpeg(frame, quality=50)
    expected = decode_mp4_mjpeg(encode_mp4_mjpeg([frame, frame], fps=5, quality=50))

    # start from a real fragmented stream, then rebuild mvex + fragment:
    # video trex carries default_sample_size (trun omits sizes), and a
    # second track's trex FOLLOWS it
    base = encode_mp4_mjpeg_fragmented([frame, frame], fps=5, quality=50,
                                       frames_per_fragment=2)
    moof_at = base.index(b"moof") - 4
    head = bytearray(base[:moof_at])

    old_trex_at = head.index(b"trex") - 4
    trex_v = _mp4_full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, 200, len(jpg), 0))
    trex_a = _mp4_full(b"trex", 0, 0, struct.pack(">IIIII", 2, 1, 200, 0, 0))
    mvex = _mp4_box(b"mvex", trex_v + trex_a)
    # old mvex = 8-byte header + one 32-byte trex, replaced wholesale
    grown = len(mvex) - (8 + 32)
    head[old_trex_at - 8 : old_trex_at + 32] = mvex
    # patch the enclosing moov size
    moov_at = head.index(b"moov") - 4
    moov_size = struct.unpack_from(">I", head, moov_at)[0]
    struct.pack_into(">I", head, moov_at, moov_size + grown)

    # fragment: tfhd with default-base-is-moof only (no default size),
    # trun with data-offset only — sizes come from the video trex
    mfhd = _mp4_full(b"mfhd", 0, 0, struct.pack(">I", 1))
    tfhd = _mp4_full(b"tfhd", 0, 0x020000, struct.pack(">I", 1))
    tfdt = _mp4_full(b"tfdt", 1, 0, struct.pack(">Q", 0))
    trun_len = 12 + 8
    moof_size = 8 + len(mfhd) + 8 + len(tfhd) + len(tfdt) + trun_len
    trun = _mp4_full(b"trun", 0, 0x000001,
                     struct.pack(">Ii", 2, moof_size + 8))
    moof = _mp4_box(b"moof", mfhd + _mp4_box(b"traf", tfhd + tfdt + trun))
    assert len(moof) == moof_size
    mdat = _mp4_box(b"mdat", jpg + jpg)

    out = decode_mp4_mjpeg(bytes(head) + moof + mdat)
    np.testing.assert_array_equal(out, expected)

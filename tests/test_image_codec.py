"""Real image decoding (operators/imagecodec.py): pixel-exact PNG
round-trips across every filter type and color layout, BMP/PPM parsing,
the lenient decoder seam, and the Spark-side BinaryFeatureExtractor
integration (VERDICT.md r4 next-round item 3)."""

import struct

import numpy as np
import pytest

import feature_factory_spark as ff
from feature_factory_spark.exceptions import NotImplementedFeatureError
from feature_factory_spark.operators import imagecodec as ic


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(7)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (6, 4)])
def test_png_roundtrip_pixel_exact(rng, color_type, channels, filter_type):
    px = rng.randint(0, 256, size=(5, 7, channels)).astype(np.uint8)
    data = ic.encode_png(
        px if channels > 1 else px[:, :, 0], color_type, filter_type
    )
    out, bit_depth = ic.decode_png(data)
    assert bit_depth == 8
    assert out.shape == (5, 7, channels)
    assert (out == px).all()


def test_png_palette_expands_through_plte(rng):
    # handmade palette PNG: 2x2 indices into a 3-color palette
    palette = bytes([10, 20, 30, 200, 100, 0, 0, 0, 255])
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    import zlib

    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out, _ = ic.decode_png(png)
    assert out.shape == (2, 2, 3)
    assert tuple(out[0, 1]) == (200, 100, 0)
    assert tuple(out[1, 0]) == (0, 0, 255)


def test_solid_png_stats_closed_form():
    d = ic.decode_image(ic.solid_png(4, 3, 200, filter_type=4))
    assert d == {
        "format": "png", "width": 4, "height": 3, "channels": 1,
        "bit_depth": 8, "n_pixels": 12, "mean": 200.0, "std": 0.0,
        "entropy": 0.0, "progressive": 0,
    }


def test_uniform_noise_entropy_sane(rng):
    px = rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
    d = ic.decode_image(ic.encode_png(px, 0, 2))
    assert 7.0 < d["entropy"] <= 8.0  # ~8 bits for uniform bytes
    assert abs(d["mean"] - float(px.mean())) < 1e-9
    assert abs(d["std"] - float(px.std())) < 1e-9


def test_bmp_24bit_bottom_up_with_padding(rng):
    w, h = 3, 2
    src = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    rowpad = (w * 3 + 3) & ~3
    pxdata = b""
    for y in range(h - 1, -1, -1):  # bottom-up, BGR on disk
        row = src[y][:, [2, 1, 0]].tobytes()
        pxdata += row + b"\x00" * (rowpad - len(row))
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pxdata), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pxdata),
                      2835, 2835, 0, 0)
        + pxdata
    )
    out, _ = ic.decode_bmp(bmp)
    assert (out == src).all()
    assert ic.decode_image(bmp)["format"] == "bmp"


def test_ppm_p6_and_pgm_p5(rng):
    px = rng.randint(0, 256, size=(2, 3, 3)).astype(np.uint8)
    ppm = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
    out, _ = ic.decode_ppm(ppm)
    assert (out == px).all()

    gray = rng.randint(0, 256, size=(4, 5, 1)).astype(np.uint8)
    pgm = b"P5 5 4 255\n" + gray.tobytes()
    out, _ = ic.decode_ppm(pgm)
    assert (out == gray).all()


def test_lenient_decoder_returns_empty_on_junk():
    assert ic.image_decoder(b"\x00\x01 not an image") == {}
    assert ic.image_decoder(b"\x89PNG\r\n\x1a\n truncated") == {}
    assert ic.image_decoder(b"") == {}


def test_strict_decoder_raises_on_junk():
    with pytest.raises(ValueError, match="unrecognized"):
        ic.decode_image(b"\x00junk")
    with pytest.raises(ValueError, match="interlaced"):
        ic.decode_png(
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
            + b"\x00\x00\x00\x00"
        )


def test_pillow_decoder_fails_gracefully_when_absent():
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed in this environment")
    except ImportError:
        pass
    with pytest.raises(NotImplementedFeatureError, match="Pillow"):
        ic.pillow_decoder(ic.solid_png(2, 2, 5))


def test_spark_binary_feature_extractor_with_real_decoder(spark, rng):
    rows = [
        (1, ic.solid_png(6, 4, 120, filter_type=1)),
        (2, ic.encode_png(rng.randint(0, 256, (3, 3, 3)).astype(np.uint8), 2, 4)),
        (3, b"not an image"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id int, img binary")
    out = ff.BinaryFeatureExtractor(
        "img", decoder=ic.image_decoder, feature_schema=ic.image_schema()
    ).transform(df)
    got = {r["id"]: r.asDict() for r in out.collect()}
    assert got[1]["img_format"] == "png"
    assert (got[1]["img_width"], got[1]["img_height"]) == (6, 4)
    assert got[1]["img_mean"] == 120.0 and got[1]["img_std"] == 0.0
    assert got[2]["img_channels"] == 3 and got[2]["img_n_pixels"] == 9
    assert got[3]["img_format"] is None  # junk -> NULL features
    assert got[4]["img_format"] is None  # missing payload -> NULL features


# -- property tests: arbitrary images round-trip pixel-exact ------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    channels=st.sampled_from([1, 3, 4]),
    filter_type=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_png_roundtrip_property(w, h, channels, filter_type, seed):
    r = np.random.RandomState(seed)
    px = r.randint(0, 256, size=(h, w, channels)).astype(np.uint8)
    ct = {1: 0, 3: 2, 4: 6}[channels]
    data = ic.encode_png(px if channels > 1 else px[:, :, 0], ct, filter_type)
    out, _ = ic.decode_png(data)
    assert out.shape == (h, w, channels)
    assert (out == px).all()
    stats = ic.decode_image(data)
    assert stats["n_pixels"] == w * h
    assert abs(stats["mean"] - float(px.mean())) < 1e-9
    assert stats["entropy"] >= 0.0


def test_bmp_8bit_palette_expands_through_color_table():
    # 2x2 8-bit BMP, palette: 0 -> white, 1 -> red; stats must reflect
    # COLORS, not indices (review finding r5)
    import struct as _s

    palette = bytes([255, 255, 255, 0]) + bytes([0, 0, 255, 0])  # BGRA
    rows = [bytes([0, 1]) + b"\x00\x00", bytes([1, 0]) + b"\x00\x00"]
    pxdata = rows[1] + rows[0]  # bottom-up
    hdr = (b"BM" + _s.pack("<IHHI", 54 + 8 + len(pxdata), 0, 0, 54 + 8)
           + _s.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(pxdata),
                     2835, 2835, 2, 0))
    bmp = hdr + palette + pxdata
    out, _ = ic.decode_bmp(bmp)
    assert out.shape == (2, 2, 3)
    assert tuple(out[0, 0]) == (255, 255, 255)  # index 0 -> white
    assert tuple(out[0, 1]) == (255, 0, 0)      # index 1 -> red (RGB)
    d = ic.decode_image(bmp)
    # 2 white px (3x255) + 2 red px (255,0,0) over 12 channel-bytes
    assert d["channels"] == 3 and d["mean"] == 170.0  # colors, not 0/1 indices

    # index outside the color table fails clean
    bad = hdr + palette + bytes([7, 1]) + b"\x00\x00" + rows[0]
    with pytest.raises(ValueError, match="color table"):
        ic.decode_bmp(bad)


# -- JPEG (jpegcodec.py, r7): stdlib baseline T.81 codec ----------------

from feature_factory_spark.operators import jpegcodec as jc


def test_jpeg_solid_gray_closed_form_all_values():
    # decoded constant must equal the closed form the oracle SQL states
    for g in range(0, 256, 17):
        d = ic.decode_image(jc.solid_jpeg(9, 7, g))
        assert d["format"] == "jpeg" and d["width"] == 9 and d["height"] == 7
        assert d["std"] == 0.0 and d["entropy"] == 0.0
        assert d["mean"] == jc.expected_solid_gray(g), g
        assert d["progressive"] == 0


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_jpeg_solid_quality_sweep(quality):
    assert (jc.decode_jpeg(jc.solid_jpeg(8, 8, 200, quality=quality))["mean"]
            == jc.expected_solid_gray(200, quality))


def test_jpeg_gray_gradient_roundtrip_close():
    img = np.clip(np.add.outer(np.arange(24) * 5, np.arange(40) * 3),
                  0, 255).astype(np.uint8)
    d = jc.decode_jpeg(jc.encode_jpeg(img, quality=90))
    assert (d["width"], d["height"], d["channels"]) == (40, 24, 1)
    assert abs(d["mean"] - img.mean()) < 3.0
    assert d["std"] > 0 and d["entropy"] > 0


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_jpeg_rgb_roundtrip_close(subsampling):
    base = np.zeros((21, 35, 3))
    for c in range(3):
        base[:, :, c] = np.clip(
            np.add.outer(np.arange(21) * 4, np.arange(35) * 2) + 40 * c,
            0, 255)
    rgb = base.astype(np.uint8)
    d = jc.decode_jpeg(jc.encode_jpeg(rgb, quality=90, subsampling=subsampling))
    assert (d["width"], d["height"], d["channels"]) == (35, 21, 3)
    assert abs(d["mean"] - rgb.mean()) < 5.0


def test_jpeg_restart_markers_do_not_change_decode():
    img = np.clip(np.add.outer(np.arange(40) * 3, np.arange(56) * 2),
                  0, 255).astype(np.uint8)
    plain = jc.decode_jpeg(jc.encode_jpeg(img, quality=80))
    rst = jc.decode_jpeg(jc.encode_jpeg(img, quality=80, restart_interval=3))
    assert plain == rst
    base = np.zeros((21, 35, 3))
    for c in range(3):
        base[:, :, c] = np.clip(
            np.add.outer(np.arange(21) * 4, np.arange(35) * 2) + 40 * c,
            0, 255)
    rgb = base.astype(np.uint8)
    d420 = jc.decode_jpeg(jc.encode_jpeg(rgb, quality=90, subsampling="420"))
    d420r = jc.decode_jpeg(
        jc.encode_jpeg(rgb, quality=90, subsampling="420", restart_interval=2))
    assert d420 == d420r


def test_jpeg_progressive_probe_metadata_only():
    # flip SOF0 -> SOF2: a progressive stream probes (real dims,
    # progressive=1, NULL pixel stats) instead of failing
    b = bytearray(jc.solid_jpeg(10, 6, 100))
    b[b.find(b"\xff\xc0") + 1] = 0xC2
    p = ic.decode_image(bytes(b))
    assert p["format"] == "jpeg" and p["progressive"] == 1
    assert (p["width"], p["height"], p["channels"]) == (10, 6, 1)
    assert p["mean"] is None and p["std"] is None and p["entropy"] is None
    assert jc.probe_jpeg(bytes(b)) == p


def test_jpeg_truncated_raises_and_lenient_seam_nulls():
    data = jc.solid_jpeg(8, 8, 50)
    with pytest.raises(ValueError):
        jc.decode_jpeg(data[: len(data) // 2])
    assert ic.image_decoder(data[: len(data) // 2]) == {}
    with pytest.raises(ValueError, match="signature"):
        jc.decode_jpeg(b"\x00\x01\x02\x03")


def test_jpeg_spark_extractor_slice(spark):
    # Spark-side plumbing: JPEG bytes through BinaryFeatureExtractor
    rows = [(i, jc.solid_jpeg(4 + i % 3, 5, (i * 40) % 256)) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id bigint, img binary")
    out = ff.BinaryFeatureExtractor(
        "img", decoder=ic.image_decoder, feature_schema=ic.image_schema()
    ).transform(df)
    got = {r["doc_id"]: r for r in out.collect()}
    for i in range(8):
        assert got[i]["img_format"] == "jpeg"
        assert got[i]["img_width"] == 4 + i % 3
        assert got[i]["img_mean"] == jc.expected_solid_gray((i * 40) % 256)
        assert got[i]["img_progressive"] == 0


# -- GIF / WebP probes (r7) ---------------------------------------------


def test_gif_probe():
    gif = (b"GIF89a" + (320).to_bytes(2, "little")
           + (200).to_bytes(2, "little") + bytes([0xF7, 0, 0]))
    d = ic.decode_image(gif)
    assert (d["format"], d["width"], d["height"]) == ("gif", 320, 200)
    assert d["n_pixels"] == 64000 and d["mean"] is None
    with pytest.raises(ValueError):
        ic.probe_gif(b"GIF89a" + bytes(4))  # zero dims


def _webp(fourcc, data):
    chunk = fourcc + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def test_webp_probe_all_chunk_kinds():
    vp8 = (bytes(3) + b"\x9d\x01\x2a" + (640).to_bytes(2, "little")
           + (480).to_bytes(2, "little") + bytes(8))
    d = ic.decode_image(_webp(b"VP8 ", vp8))
    assert (d["format"], d["width"], d["height"], d["channels"]) == ("webp", 640, 480, 3)
    bits = 99 | (49 << 14) | (1 << 28)      # 100x50 lossless + alpha
    d = ic.decode_image(_webp(b"VP8L", bytes([0x2F]) + bits.to_bytes(4, "little")))
    assert (d["width"], d["height"], d["channels"]) == (100, 50, 4)
    vp8x = bytes([0x10, 0, 0, 0]) + (799).to_bytes(3, "little") + (599).to_bytes(3, "little")
    d = ic.decode_image(_webp(b"VP8X", vp8x))
    assert (d["width"], d["height"], d["channels"]) == (800, 600, 4)
    with pytest.raises(ValueError):
        ic.probe_webp(_webp(b"ANIM", bytes(10)))
    # lenient seam: corrupt VP8 payload -> NULL features
    assert ic.image_decoder(_webp(b"VP8 ", bytes(4))) == {}


@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    channels=st.sampled_from([1, 3]),
    quality=st.sampled_from([30, 60, 90]),
    subsampling=st.sampled_from(["444", "420"]),
    rst=st.sampled_from([0, 2]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_jpeg_roundtrip_property(w, h, channels, quality, subsampling, rst, seed):
    # every (dims x layout x quality x restart) combination decodes
    # without error, reports exact metadata, and — being DCT-lossy —
    # keeps the mean near the source for a smooth image
    if channels == 1 and subsampling == "420":
        subsampling = "444"  # subsampling is a color-only concept
    r = np.random.RandomState(seed)
    base = r.randint(0, 64)
    if channels == 1:
        px = np.clip(
            base + np.add.outer(np.arange(h) * 2, np.arange(w)), 0, 255
        ).astype(np.uint8)
    else:
        px = np.stack([
            np.clip(base + c * 30
                    + np.add.outer(np.arange(h) * 2, np.arange(w)), 0, 255)
            for c in range(3)
        ], axis=-1).astype(np.uint8)
    data = jc.encode_jpeg(px, quality=quality, subsampling=subsampling,
                          restart_interval=rst)
    d = jc.decode_jpeg(data)
    assert (d["width"], d["height"], d["channels"]) == (w, h, channels)
    assert d["n_pixels"] == w * h and d["progressive"] == 0
    tol = 20.0 if quality == 30 else 8.0
    assert abs(d["mean"] - float(px.mean())) < tol, (d["mean"], px.mean())


def test_tiff_probe_both_endians():
    def tiff_le(w, h, bits=8, spp=3):
        entries = [(256, 3, 1, w), (257, 3, 1, h),
                   (258, 3, 1, bits), (277, 3, 1, spp)]
        ifd = struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            ifd += struct.pack("<HHI", tag, typ, cnt) + struct.pack("<HH", val, 0)
        return b"II*\x00" + struct.pack("<I", 8) + ifd + b"\x00" * 4

    d = ic.decode_image(tiff_le(1024, 768, 16, 1))
    assert (d["format"], d["width"], d["height"], d["channels"],
            d["bit_depth"]) == ("tiff", 1024, 768, 1, 16)
    assert d["mean"] is None

    def tiff_be(w, h):
        entries = [(256, 4, 1, w), (257, 4, 1, h)]
        ifd = struct.pack(">H", len(entries))
        for tag, typ, cnt, val in entries:
            ifd += struct.pack(">HHII", tag, typ, cnt, val)
        return b"MM\x00*" + struct.pack(">I", 8) + ifd + b"\x00" * 4

    assert ic.decode_image(tiff_be(30, 20))["n_pixels"] == 600
    with pytest.raises(ValueError):
        ic.probe_tiff(b"II*\x00" + struct.pack("<I", 8) + b"\x00\x00" + b"\x00" * 4)
    assert ic.image_decoder(b"II*\x00trunc") == {}

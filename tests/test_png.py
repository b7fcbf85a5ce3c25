"""PNG codec: pure-stdlib round trips, independent forward-filter
inversion for all five row filters, palette expansion, honest gates,
and the real image end-to-end path (decode → perceptual hash →
near-dup pairs) on Spark. Completes the zero-dependency real-codec
triad from the round-7 review: WAV (audio), AVI/DIB (video), PNG
(image)."""

from __future__ import annotations

import struct
import zlib

import pytest

from rabbit_data_pipeline_spark.operators.png import (
    _SIG,
    _chunk,
    decode_png,
    is_png,
    parse_png,
    png_gray,
    write_png,
)

W, H = 7, 5


def _gray(seed: int) -> bytes:
    return bytes((seed * 17 + i * 13) % 256 for i in range(W * H))


def test_roundtrip_gray():
    px = _gray(1)
    payload = write_png(px, W, H)
    assert is_png(payload)
    meta = parse_png(payload)
    assert (meta["width"], meta["height"], meta["channels"]) == (W, H, 1)
    assert decode_png(payload) == (W, H, 1, px)
    assert png_gray(payload) == (W, H, px)


def test_roundtrip_rgb_luma_fold():
    """RGB decodes losslessly; png_gray folds with integer BT.601 —
    the same weights as the AVI DIB path."""
    rgb = bytes(b for i in range(W * H) for b in ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256))
    payload = write_png(rgb, W, H, channels=3)
    assert decode_png(payload) == (W, H, 3, rgb)
    expect = bytes(
        (299 * ((i * 3) % 256) + 587 * ((i * 5) % 256) + 114 * ((i * 7) % 256)) // 1000
        for i in range(W * H)
    )
    assert png_gray(payload)[2] == expect


def _forward_filter(img: bytes, w: int, h: int, bpp: int, ftypes: list[int]) -> bytes:
    """Independent reference implementation of the PNG row filters in
    the ENCODE direction (spec §6): decode must invert it exactly."""
    stride = w * bpp
    out = b""
    prev = [0] * stride
    for y in range(h):
        row = list(img[y * stride : (y + 1) * stride])
        f = ftypes[y % len(ftypes)]
        enc = []
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc.append((row[x] - pred) & 0xFF)
        out += bytes([f]) + bytes(enc)
        prev = row
    return out


def _raw_png(w: int, h: int, color: int, scanlines: bytes, extra: bytes = b"") -> bytes:
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    return _SIG + ihdr + extra + _chunk(b"IDAT", zlib.compress(scanlines)) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("bpp,color", [(1, 0), (3, 2), (4, 6)])
def test_all_five_filters_invert(bpp, color):
    img = bytes((i * 31 + y * 17) % 256 for y in range(H) for i in range(W * bpp))
    payload = _raw_png(W, H, color, _forward_filter(img, W, H, bpp, [0, 1, 2, 3, 4]))
    assert decode_png(payload) == (W, H, bpp, img)


def test_palette_expands_to_rgb():
    pal = bytes(b for i in range(256) for b in ((i * 2) % 256, (i * 9) % 256, 255 - i))
    idx = bytes((i * 11) % 256 for i in range(W * H))
    scan = b"".join(b"\x00" + idx[y * W : (y + 1) * W] for y in range(H))
    payload = _raw_png(W, H, 3, scan, extra=_chunk(b"PLTE", pal))
    expect = bytes(b for i in idx for b in ((i * 2) % 256, (i * 9) % 256, 255 - i))
    assert decode_png(payload) == (W, H, 3, expect)


def test_corrupt_idat_is_valueerror_not_zlib_error():
    """The error contract is ValueError/NotImplementedError — a
    corrupt deflate stream must not leak a raw zlib.error out of a
    Spark task."""
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 0))
    bad = _SIG + ihdr + _chunk(b"IDAT", b"\xde\xad\xbe\xef") + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="corrupt IDAT"):
        decode_png(bad)


def test_corrupt_png_resize_falls_through_not_raises():
    """ADVICE r8: a payload with a valid PNG signature but corrupt
    IDAT must make _resize_png DECLINE (return None → the caller
    routes to Pillow, which may still decode it), matching
    _decode_real's graceful handling — not escape the Spark task as
    the decoder's ValueError."""
    from rabbit_data_pipeline_spark.operators.multimodal import _resize_png

    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 0))
    bad = _SIG + ihdr + _chunk(b"IDAT", b"\xde\xad\xbe\xef") + _chunk(b"IEND", b"")
    assert _resize_png(bad, 4, 3) is None


def test_stdlib_gated_png_falls_through_to_pillow(monkeypatch):
    """A PNG past the stdlib codec (16-bit) must try Pillow when it's
    installed — not tell the user to install an already-installed
    package — in both the pixel helper and the resize path; without
    Pillow, the stdlib gate stands."""
    import sys
    import types

    from rabbit_data_pipeline_spark.operators.multimodal import _image_gray, _resize_png

    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 16, 0, 0, 0, 0))
    deep = _SIG + ihdr + _chunk(b"IDAT", zlib.compress(b"\x00" * (H * (W * 2 + 1)))) + _chunk(b"IEND", b"")

    # stdlib resize helper declines (returns None) so the caller can route to Pillow
    assert _resize_png(deep, 4, 3) is None

    class _FakeIm:
        width, height = W, H

        def convert(self, mode):
            return self

        def tobytes(self):
            return bytes(W * H)

    img_mod = types.ModuleType("PIL.Image")
    img_mod.open = lambda fp: _FakeIm()
    mod = types.ModuleType("PIL")
    mod.Image = img_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)
    assert _image_gray(deep) == (W, H, bytes(W * H))

    monkeypatch.delitem(sys.modules, "PIL")
    monkeypatch.delitem(sys.modules, "PIL.Image")
    try:
        import PIL  # noqa: F401

        pytest.skip("real Pillow present in this environment")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="16-bit|Pillow"):
        _image_gray(deep)


def test_gates_and_malformed():
    with pytest.raises(ValueError, match="not a valid PNG"):
        parse_png(b"nope")
    # 16-bit depth → honest gate naming the fallback
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 16, 0, 0, 0, 0))
    with pytest.raises(NotImplementedError, match="16"):
        decode_png(_SIG + ihdr + _chunk(b"IEND", b""))
    # Adam7 interlace → gate
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 1))
    with pytest.raises(NotImplementedError, match="[Ii]nterlaced"):
        decode_png(_SIG + ihdr + _chunk(b"IEND", b""))
    # bad filter byte → ValueError, not garbage pixels
    payload = _raw_png(W, H, 0, b"\x09" + bytes(W) + b"\x00" * ((H - 1) * (W + 1)))
    with pytest.raises(ValueError, match="filter type"):
        decode_png(payload)
    with pytest.raises(ValueError, match="truncated"):
        decode_png(_raw_png(W, H, 0, b"\x00" + bytes(W)))


def test_writer_validates():
    with pytest.raises(ValueError, match="bytes"):
        write_png(b"short", W, H)
    with pytest.raises(NotImplementedError, match="channels"):
        write_png(bytes(W * H * 2), W, H, channels=2)


@pytest.mark.parametrize("channels", [1, 3])
def test_property_random_filter_sequences(channels):
    """Hypothesis: on arbitrary pixel content, dimensions, and per-row
    filter choices, decode inverts the independently-implemented
    forward filter exactly (pure Python, no Spark)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    color = 0 if channels == 1 else 2

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 8),
        seed=st.integers(0, 2**31),
        data=st.data(),
    )
    def check(w, h, seed, data):
        n = w * h * channels
        img = bytes((seed * 2654435761 + i * 2246822519) % 256 for i in range(n))
        ftypes = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
        payload = _raw_png(w, h, color, _forward_filter(img, w, h, channels, ftypes))
        assert decode_png(payload) == (w, h, channels, img)

    check()


# ------------------------------------------------------ Spark end-to-end


def test_real_png_flows_to_near_pairs(spark):
    """The round-7 'real image codec' ask, end to end on Spark: real
    PNG files → stdlib decode → aHash perceptual fingerprint → banded
    near-dup join. The noise-perturbed copy pairs with its source; the
    structurally different image pairs with neither."""
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from rabbit_data_pipeline_spark.operators.multimodal import (
        decode_metadata,
        image_near_pairs,
    )

    w = h = 16

    def img(flip: bool, noise: int) -> bytes:
        # left-dark/right-bright blocks (or flipped): aHash-stable
        # under small per-pixel noise, opposite under the flip.
        px = bytes(
            min(255, (200 if ((x >= w // 2) ^ flip) else 30) + ((x * 7 + y * 3 + noise) % 8))
            for y in range(h)
            for x in range(w)
        )
        return write_png(px, w, h)

    rows = [("a", "image", img(False, 0)), ("a_dup", "image", img(False, 3)), ("b", "image", img(True, 0))]
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)

    meta = {r["media_id"]: r for r in decode_metadata(df).collect()}
    assert meta["a"]["format"] == "PNG" and meta["a"]["width"] == w

    pairs = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in image_near_pairs(df.select("media_id", "payload"), max_hamming=6).collect()
    }
    assert ("a", "a_dup") in pairs
    assert all("b" not in p for p in pairs)


def test_extract_features_and_resize_on_real_png(spark):
    """Real PNGs flow through extract_features (histogram) and
    resize_images (stdlib nearest-neighbor → PNG out) with no
    optional dependency."""
    from rabbit_data_pipeline_spark.operators.multimodal import (
        extract_features,
        resize_images,
    )

    px = bytes((i * 13) % 256 for i in range(W * H))
    df = spark.createDataFrame([("m1", write_png(px, W, H))], ["media_id", "payload"])

    feats = extract_features(df).collect()
    assert len(feats) == 1 and abs(sum(feats[0]["features"]) - 1.0) < 1e-6

    out = resize_images(df, 4, 3).collect()
    assert (out[0]["width"], out[0]["height"]) == (4, 3)
    got = png_gray(bytes(out[0]["payload"]))
    assert got[0] == 4 and got[1] == 3
    # nearest-neighbor: every output byte exists in the source
    assert set(got[2]) <= set(px)

    # color PNGs stay color (the Pillow-path parity the gray-only
    # first cut lacked): RGB in → RGB out, exact NN sample
    rgb = bytes(b for i in range(W * H) for b in ((i * 3) % 251, (i * 5) % 251, (i * 7) % 251))
    df3 = spark.createDataFrame([("m3", write_png(rgb, W, H, channels=3))], ["media_id", "payload"])
    out3 = resize_images(df3, 3, 2).collect()
    w3, h3, ch3, px3 = decode_png(bytes(out3[0]["payload"]))
    assert (w3, h3, ch3) == (3, 2, 3)
    expect = b"".join(
        rgb[3 * (min(y * H // 2, H - 1) * W + min(x * W // 3, W - 1)) :][:3]
        for y in range(2)
        for x in range(3)
    )
    assert px3 == expect

"""AVI (RIFF) container codec: pure-stdlib round trips, the real
video end-to-end path (decode → frame features → near-dup pairs), and
the MJPG Pillow gate. Completes the optional-dependency triad from
the round-7 review: a REAL video file now flows through the video
operators with no optional dependency at all (uncompressed-DIB AVI)."""

from __future__ import annotations

import struct
import sys
import types

import pytest

from rabbit_data_pipeline_spark.operators.avi import (
    avi_gray_frames,
    is_avi,
    parse_avi,
    write_avi,
)

W, H = 6, 5  # width 6 exercises DIB 4-byte row padding (row_bytes=8)


def _gray_frame(seed: int) -> bytes:
    return bytes((seed * 17 + i * 13) % 256 for i in range(W * H))


def test_roundtrip_8bit_dib():
    frames = [_gray_frame(s) for s in range(5)]
    payload = write_avi(frames, W, H)
    assert is_avi(payload)
    meta = parse_avi(payload)
    assert meta == {"format": "AVI", "codec": "DIB", "width": W, "height": H, "n_frames": 5}
    assert avi_gray_frames(payload) == frames


def test_roundtrip_24bit_dib_luma():
    """24-bit BGR frames fold to integer BT.601 luma on decode."""
    bgr = bytes(b for i in range(W * H) for b in ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256))
    payload = write_avi([bgr], W, H, bit_count=24)
    (got,) = avi_gray_frames(payload)
    expect = bytes(
        (299 * ((i * 7) % 256) + 587 * ((i * 5) % 256) + 114 * ((i * 3) % 256)) // 1000
        for i in range(W * H)
    )
    assert got == expect


def test_odd_sized_mjpg_chunks_stay_word_aligned():
    """RIFF chunks pad odd sizes; the walker must still find frame 2."""
    payload = write_avi([b"\xff\xd8odd", b"\xff\xd8even!"], W, H, codec="MJPG")
    assert parse_avi(payload)["n_frames"] == 2
    assert parse_avi(payload)["codec"] == "MJPG"


def test_not_avi_and_malformed():
    assert not is_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="not a valid AVI"):
        parse_avi(b"nope")
    # valid signature, no headers → ValueError not a crash
    with pytest.raises(ValueError, match="no avih"):
        parse_avi(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_8bit_dib_maps_through_palette():
    """8-bit DIB pixels are palette INDICES: a non-identity RGBQUAD
    table must map through BT.601 luma, not pass indices as gray
    (write_avi's identity-grayscale palette folds back to the index
    exactly, which is what the round-trip tests rely on)."""
    frames = [_gray_frame(2)]
    payload = write_avi(frames, W, H)
    # replace the identity palette (i,i,i,0 as BGR0) with an inverted one
    ident = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    inv = b"".join(struct.pack("<BBBB", 255 - i, 255 - i, 255 - i, 0) for i in range(256))
    assert ident in payload
    (got,) = avi_gray_frames(payload.replace(ident, inv))
    assert got == bytes(255 - b for b in frames[0])


def _with_dropped_frame(payload: bytes, at_start: bool) -> bytes:
    """Splice a 0-byte '00db' chunk (the dropped-frame marker real
    capture muxers emit) into an AVI's movi list, fixing the RIFF and
    LIST sizes — built from the writer's own output so only the marker
    is hand-made."""
    marker = b"00db" + struct.pack("<I", 0)
    movi_at = payload.index(b"movi")
    if at_start:
        pos = movi_at + 4
    else:  # between the first and second real frame chunks
        pos = payload.index(b"00db", payload.index(b"00db", movi_at) + 1)
    out = payload[:pos] + marker + payload[pos:]
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    (list_size,) = struct.unpack_from("<I", out, movi_at - 4)
    return out[: movi_at - 4] + struct.pack("<I", list_size + 8) + out[movi_at:]


def test_dropped_frame_markers_repeat_previous():
    """0-byte frame chunks repeat the previous frame (decoded once);
    a leading marker with no prior frame raises cleanly; parse_avi
    counts markers as frames (they hold a timeline position)."""
    f0, f1 = _gray_frame(0), _gray_frame(1)
    dropped = _with_dropped_frame(write_avi([f0, f1], W, H), at_start=False)
    assert parse_avi(dropped)["n_frames"] == 3
    assert avi_gray_frames(dropped) == [f0, f0, f1]

    leading = _with_dropped_frame(write_avi([], W, H), at_start=True)
    with pytest.raises(ValueError, match="leading empty"):
        avi_gray_frames(leading)


def test_strided_decode_matches_full_decode():
    frames = [_gray_frame(s) for s in range(7)]
    payload = write_avi(frames, W, H)
    assert avi_gray_frames(payload, step=3) == [frames[0], frames[3], frames[6]]


def test_no_video_stream_reports_codec_none():
    """An AVI without a vids strf must say so, not fabricate DIB."""
    payload = write_avi([_gray_frame(0)], W, H)
    patched = payload.replace(b"vids", b"auds")
    assert parse_avi(patched)["codec"] == "none"
    with pytest.raises(ValueError, match="no video stream"):
        avi_gray_frames(patched)


def test_unknown_codec_gates():
    payload = write_avi([_gray_frame(0)], W, H)
    # corrupt biCompression to 'cvid' → the documented gate
    comp = struct.unpack("<I", b"cvid")[0]
    idx = payload.index(b"strf") + 8 + 16
    patched = payload[:idx] + struct.pack("<I", comp) + payload[idx + 4 :]
    with pytest.raises(NotImplementedError, match="cvid"):
        avi_gray_frames(patched)


def test_mjpg_gates_without_pillow():
    try:
        import PIL  # noqa: F401

        pytest.skip("real Pillow present in this environment")
    except ImportError:
        pass
    payload = write_avi([b"\xff\xd8\xff-fake-jpeg"], W, H, codec="MJPG")
    with pytest.raises(NotImplementedError, match="[Pp]illow"):
        avi_gray_frames(payload)


def test_mjpg_decodes_through_pil_contract(monkeypatch):
    """With (a fake) Pillow importable, MJPG frames decode through
    Image.open().convert('L') — the real-JPEG flow. A frame whose
    JPEG size already matches the container header is NOT resized
    (ADVICE r8: an unconditional resize both ran Pillow's version-
    varying default resample on every frame and masked header/frame
    size disagreements); a mismatched frame is conformed to the
    header with an EXPLICIT deterministic filter."""

    class _FakeL:
        def __init__(self, size):
            self.size = size
            self.resized_with = None

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, wh, resample=None):
            self.resized_with = (wh, resample)
            self.size = wh
            return self

        def tobytes(self):
            w, h = self.size
            return b"\x00" * (w * h)

    img_mod = types.ModuleType("PIL.Image")
    img_mod.NEAREST = 0  # pre-Resampling Pillow spelling
    made: list[_FakeL] = []

    def _open(fp, _sizes=iter([(W, H), (W + 2, H + 1)])):
        made.append(_FakeL(next(_sizes)))
        return made[-1]

    img_mod.open = _open
    mod = types.ModuleType("PIL")
    mod.Image = img_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)
    payload = write_avi([b"\xff\xd8\xff-fake-jpeg", b"\xff\xd8\xff-other"], W, H, codec="MJPG")
    frames = avi_gray_frames(payload)
    assert [len(f) for f in frames] == [W * H, W * H]
    assert made[0].resized_with is None  # size matches header: untouched
    assert made[1].resized_with == ((W, H), img_mod.NEAREST)  # conformed, explicit filter


def test_property_roundtrip_random_frames():
    """Hypothesis: arbitrary frame content, dimensions, frame counts
    and both DIB depths round-trip bit-exactly (24-bit through the
    integer BT.601 fold). Pure Python, no Spark."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 7),
        n=st.integers(1, 4),
        depth=st.sampled_from([8, 24]),
        seed=st.integers(0, 2**31),
    )
    def check(w, h, n, depth, seed):
        px = w * h * (1 if depth == 8 else 3)
        frames = [
            bytes((seed * 2654435761 + f * 97 + i * 2246822519) % 256 for i in range(px))
            for f in range(n)
        ]
        payload = write_avi(frames, w, h, bit_count=depth)
        meta = parse_avi(payload)
        assert (meta["width"], meta["height"], meta["n_frames"], meta["codec"]) == (w, h, n, "DIB")
        got = avi_gray_frames(payload)
        if depth == 8:
            assert got == frames
        else:
            expect = [
                bytes(
                    (299 * fr[3 * i + 2] + 587 * fr[3 * i + 1] + 114 * fr[3 * i]) // 1000
                    for i in range(w * h)
                )
                for fr in frames
            ]
            assert got == expect

    check()


# ------------------------------------------------------ Spark end-to-end


def _luma_video(seed: int, noise: int) -> bytes:
    """64 frames whose MEAN brightness follows a seed-determined
    ordering; per-pixel noise shifts bytes without crossing the
    frame-order relation (fingerprint invariance)."""
    frames = []
    for f in range(64):
        base = (seed * 37 + f * f * 11) % 200  # distinct rise/fall pattern per seed
        frames.append(bytes(min(255, base + ((i * 7 + noise) % 8)) for i in range(W * H)))
    return write_avi(frames, W, H)


def test_real_avi_flows_to_near_pairs(spark):
    """The round-7 ask, end to end on Spark: real AVI containers →
    stdlib DIB decode → luminance-delta fingerprint → banded near-dup
    join. The noise-perturbed copy pairs with its source; the
    different-seed video pairs with neither."""
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from rabbit_data_pipeline_spark.operators.multimodal import (
        decode_metadata,
        video_near_pairs,
    )

    rows = [
        ("a", "video", _luma_video(seed=1, noise=0)),
        ("a_dup", "video", _luma_video(seed=1, noise=3)),
        ("b", "video", _luma_video(seed=9, noise=0)),
    ]
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)

    meta = {r["media_id"]: r for r in decode_metadata(df).collect()}
    assert meta["a"]["format"] == "AVI/DIB"
    assert meta["a"]["n_frames"] == 64 and meta["a"]["width"] == W

    pairs = {(r["id_a"], r["id_b"]) for r in video_near_pairs(df.select("media_id", "payload"), max_hamming=3).collect()}
    assert ("a", "a_dup") in pairs
    assert all("b" not in p for p in pairs)


def test_sample_frames_and_features_accept_avi(spark):
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from rabbit_data_pipeline_spark.operators.multimodal import (
        sample_frames,
        video_frame_features,
    )

    frames = [_gray_frame(s) for s in range(6)]
    schema = StructType(
        [StructField("media_id", StringType()), StructField("payload", BinaryType())]
    )
    df = spark.createDataFrame([("v", write_avi(frames, W, H))], schema)
    sampled = sample_frames(df, every_n=2).collect()
    assert [(r["frame_idx"], bytes(r["frame"])) for r in sampled] == [
        (0, frames[0]), (2, frames[2]), (4, frames[4]),
    ]
    feats = video_frame_features(df, n_bins=16).collect()
    assert len(feats) == 6 and len(feats[0]["features"]) == 16

"""Optional-dependency real codec / real model gates (VERDICT r6 ask
#5): with the dep installed a real payload flows through
decode→resize→features; without it, the documented NotImplementedError.

WAV decode uses stdlib `wave`, so it runs END-TO-END through the real
distributed mapInPandas path here, no extra dependency. Pillow isn't
in this container, so its dispatch plumbing is unit-tested driver-side
with a fake PIL injected into sys.modules (the Spark batch shape is
already covered by the synthetic-format tests)."""

from __future__ import annotations

import io
import struct
import sys
import types
import wave

import pytest

from rabbit_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _decode_one,
    _resize_real,
    decode_metadata,
)


def _wav_bytes(rate: int = 16000, n: int = 400) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", (i * 13) % 2000 - 1000) for i in range(n)))
    return buf.getvalue()


def test_wav_decodes_end_to_end_in_spark(spark):
    """A genuine RIFF/WAVE payload through the distributed decode pass:
    real codec, real Arrow batches, no optional dependency."""
    rows = [("w1", "audio", _wav_bytes(16000, 400)), ("w2", "audio", _wav_bytes(8000, 50))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_metadata(df).collect()}
    assert got["w1"]["format"] == "WAV"
    assert got["w1"]["width"] == 16000  # rate rides the width slot
    assert got["w1"]["n_frames"] == 400
    assert got["w2"]["width"] == 8000 and got["w2"]["n_frames"] == 50


def _energy_wav(seed: int, noise: int, windows: int = 64, win_len: int = 32) -> bytes:
    """Mono 16-bit WAV whose per-window RMS ORDER follows the seed;
    small per-sample noise must not flip any window-to-window energy
    relation (the fingerprint's invariance)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        samples = []
        for f in range(windows):
            amp = 200 + ((seed * 37 + f * f * 11) % 200) * 80  # distinct rise/fall per seed
            samples += [amp + ((i * 7 + noise) % 16) for i in range(win_len)]
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_real_wav_flows_to_near_pairs(spark):
    """Real WAV files end to end: stdlib pcm decode → per-window RMS →
    energy-delta fingerprint → banded near-dup join. The
    noise-perturbed copy pairs with its source; the different-seed
    audio pairs with neither."""
    from rabbit_data_pipeline_spark.operators.multimodal import audio_near_pairs

    rows = [
        ("a", _energy_wav(seed=1, noise=0)),
        ("a_dup", _energy_wav(seed=1, noise=5)),
        ("b", _energy_wav(seed=9, noise=0)),
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    pairs = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in audio_near_pairs(df, max_hamming=3).collect()
    }
    assert ("a", "a_dup") in pairs
    assert all("b" not in p for p in pairs)


def test_stereo_wav_folds_to_mono_and_gates_hold():
    """Multi-channel WAV folds to mono by mean; 8-bit samples and
    non-AUD1/WAV magics hit the documented gates."""
    import numpy as np

    from rabbit_data_pipeline_spark.operators.multimodal import _audio_pcm

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(struct.pack("<hh", i * 10, i * 30) for i in range(5)))
    pcm = _audio_pcm(buf.getvalue())
    assert np.allclose(pcm, [i * 20.0 for i in range(5)])

    buf8 = io.BytesIO()
    with wave.open(buf8, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes(16))
    with pytest.raises(NotImplementedError, match="16-bit"):
        _audio_pcm(buf8.getvalue())
    with pytest.raises(NotImplementedError, match="MP3/FLAC"):
        _audio_pcm(b"ID3\x04mp3-frame-data")


def test_malformed_wav_is_valueerror_unsupported_encoding_is_gate():
    """The WAV error contract splits like the PNG path's (VERDICT r8
    ask #4, mirroring tests/test_png.py's corrupt-IDAT case): broken
    chunk STRUCTURE means the data is corrupt → ValueError("not a
    valid WAV: …"), while a non-PCM ENCODING the stdlib genuinely
    can't decode keeps the missing-library NotImplementedError gate.
    Either way, never a raw RuntimeError/EOFError out of a Spark
    task."""
    from rabbit_data_pipeline_spark.operators.multimodal import _audio_pcm

    # Malformed chunk structure (stdlib Chunk parser raises bare
    # EOFError/RuntimeError here): corrupt data, not a missing codec.
    with pytest.raises(ValueError, match="not a valid WAV"):
        _audio_pcm(b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"garbage-here-more")
    # Well-formed container, compressed encoding (format tag 85 =
    # MPEG layer 3): wave.Error("unknown format: 85") → the gate.
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 4) + b"\0\0\0\0"
    mp3_in_wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="soundfile/ffmpeg"):
        _audio_pcm(mp3_in_wav)


def test_short_wav_windows_are_zero_not_nan():
    """Audio shorter than n_windows samples leaves trailing windows
    empty: their RMS must be 0.0, not NaN (NaN is truthy, so the old
    `mean(...) or 0.0` guard never fired) — NaN here silently corrupts
    fingerprints downstream."""
    import math

    from rabbit_data_pipeline_spark.operators import multimodal as mm

    # drive the mapInPandas closure logic via the public op on Spark-less
    # plumbing: replicate the window slicing on a 50-sample decode
    pcm = mm._audio_pcm(_wav_bytes(8000, 50))
    assert pcm.size == 50
    import numpy as np

    win = max(1, pcm.size // 64)
    segs = [pcm[i * win : (i + 1) * win] for i in range(64)]
    feats = [float(np.sqrt(np.mean(np.square(s)))) if s.size else 0.0 for s in segs]
    assert not any(math.isnan(f) for f in feats)
    assert feats[50:] == [0.0] * 14


def test_short_wav_through_spark_features_no_nan(spark):
    """The same guard through the real operator: a 50-sample WAV in a
    64-window feature pass yields finite features."""
    import math

    from rabbit_data_pipeline_spark.operators.multimodal import audio_energy_features

    df = spark.createDataFrame([("s1", _wav_bytes(8000, 50))], ["media_id", "payload"])
    (row,) = audio_energy_features(df, n_windows=64).collect()
    assert len(row["features"]) == 64
    assert all(not math.isnan(f) for f in row["features"])


def test_truncated_wav_hits_the_gate_not_a_crash():
    """A RIFF/WAVE header with garbage after it must fall through to
    the documented NotImplementedError, not abort the decode job with
    a wave.Error."""
    with pytest.raises(NotImplementedError):
        _decode_one(b"RIFF\x00\x00\x00\x00WAVEgarbage")


class _FakeImage:
    format = "JPEG"
    width, height = 64, 48
    n_frames = 1

    def resize(self, wh):
        self.width, self.height = wh
        return self

    def save(self, buf, format="PNG"):
        buf.write(b"\x89PNG-fake-" + struct.pack("<ii", self.width, self.height))


@pytest.fixture
def fake_pil(monkeypatch):
    mod = types.ModuleType("PIL")
    img_mod = types.ModuleType("PIL.Image")
    img_mod.open = lambda fp: _FakeImage()
    mod.Image = img_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)
    return img_mod


def test_decode_dispatches_to_pil_when_installed(fake_pil):
    """With (a fake) Pillow importable, an unknown-magic payload decodes
    through PIL.Image.open — the real-JPEG flow the ask names."""
    meta = _decode_one(b"\xff\xd8\xffJFIF-not-really")
    assert meta == {
        "format": "JPEG",
        "width": 64,
        "height": 48,
        "n_frames": 1,
        "n_bytes": 18,
    }


def test_resize_real_roundtrips_through_pil(fake_pil):
    out = _resize_real(b"\xff\xd8\xff...", 8, 6)
    assert out.startswith(b"\x89PNG-fake-")
    assert struct.unpack("<ii", out[10:18]) == (8, 6)


def test_gates_hold_without_pillow():
    """Container truth: Pillow absent → unknown magic still raises the
    documented NotImplementedError (decode and resize)."""
    try:
        import PIL  # noqa: F401

        pytest.skip("real Pillow present in this environment")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pillow"):
        _decode_one(b"\xff\xd8\xff-jpeg-without-pillow")
    with pytest.raises(NotImplementedError, match="[Pp]illow"):
        _resize_real(b"\xff\xd8\xff...", 8, 8)


def test_model_loader_gates_name_families():
    """sentence-transformers / fasttext names hit their import-gated
    loaders; unknown names keep the generic gate message."""
    from rabbit_data_pipeline_spark.operators.model import load_model

    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers present in this environment")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        load_model("sentence-transformers/all-MiniLM-L6-v2")
    with pytest.raises(NotImplementedError, match="fasttext"):
        load_model("fasttext:/models/quality.bin")
    with pytest.raises(NotImplementedError, match="model_fn"):
        load_model("mystery-model")

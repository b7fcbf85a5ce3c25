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

"""PNG codec — pure stdlib (zlib) + numpy, no Spark, no optional deps.

Reads and writes the public PNG format (RFC 2083 / ISO 15948): chunked
container, zlib-compressed scanlines, the five per-row filters. This
closes the last zero-dependency real-codec gap named in the round-7
review ("real image codecs"): with WAV (stdlib ``wave``), AVI/DIB
(operators/avi.py) and now PNG, one REAL file format per modality
flows end-to-end in this container with no optional dependency at all
— the same implement-the-public-byte-format precedent as the
BIFF8/xlsx readers (operators/xls.py). Pillow remains the gate for
JPEG/WebP/etc. in operators/multimodal.py.

Scope (honest gates, not silent wrong answers):

- **Decode**: 8-bit depth, color types 0 (gray), 2 (RGB), 3
  (palette), 4 (gray+alpha), 6 (RGBA); all five filters;
  non-interlaced. 16-bit, sub-byte depths, and Adam7 interlacing
  raise ``NotImplementedError`` naming the Pillow fallback.
- **Encode**: 8-bit grayscale or RGB, filter 0, one IDAT.

The reference pipeline has no media support at all; this module backs
the beyond-reference multimodal tier (SURVEY §2 L12/L44) on the Spark
side via operators/multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: samples per pixel, by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def bt601_luma(r, g, b):
    """Integer BT.601 grayscale fold — ONE definition shared by the
    PNG decode, the AVI 24-bit DIB fold and the AVI palette LUT
    (operators/avi.py) so cross-codec gray output can never drift.
    Works on numpy arrays and plain ints alike."""
    return (299 * r + 587 * g + 114 * b) // 1000


def is_png(payload: bytes) -> bool:
    return payload[: len(_SIG)] == _SIG


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(f"not a valid PNG: {msg}")


def _chunks(payload: bytes):
    """Yield (type, body) for each chunk; stops at IEND or truncation.
    CRCs are not verified (decode is content-addressed upstream; a
    corrupt stream fails in zlib or the length checks below)."""
    off = len(_SIG)
    while off + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, off)
        ctype = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + size]
        if len(body) < size:
            break  # truncated trailing chunk: keep what parsed
        yield ctype, body
        if ctype == b"IEND":
            break
        off += 12 + size


def parse_png(payload: bytes) -> dict:
    """Header metadata without inflating any pixel data."""
    _require(is_png(payload), "missing signature")
    for ctype, body in _chunks(payload):
        if ctype == b"IHDR":
            _require(len(body) >= 13, "short IHDR")
            w, h, depth, color, _, _, interlace = struct.unpack_from(">IIBBBBB", body)
            _require(color in _CHANNELS, f"color type {color}")
            return {
                "format": "PNG",
                "width": w,
                "height": h,
                "bit_depth": depth,
                "color_type": color,
                "channels": _CHANNELS[color],
                "interlaced": bool(interlace),
            }
        break  # IHDR must be first
    raise ValueError("not a valid PNG: no IHDR")


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG row filters → (h, w*bpp) uint8 array.
    Sequential by construction (each row references the previous), but
    Sub/Paeth are the only per-pixel loops and rows are numpy slices."""
    stride = w * bpp
    _require(len(raw) >= h * (stride + 1), "pixel data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    raw = np.frombuffer(raw, dtype=np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        ftype = int(raw[base])
        row = raw[base + 1 : base + 1 + stride].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            cur = row
        elif ftype == 1:  # Sub: per-channel running sum mod 256 → cumsum
            cur = (
                np.cumsum(row.reshape(-1, bpp).astype(np.uint8), axis=0, dtype=np.uint8)
                .reshape(stride)
                .astype(np.int32)
            )
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"not a valid PNG: filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode to raw 8-bit samples: (width, height, channels, pixels)
    with pixels row-major, ``channels`` interleaved per pixel
    (palette entries expanded to RGB)."""
    meta = parse_png(payload)
    if meta["bit_depth"] != 8:
        raise NotImplementedError(
            f"PNG bit depth {meta['bit_depth']}: only 8-bit is implemented stdlib-side; "
            "install Pillow for 16-bit / sub-byte depths"
        )
    if meta["interlaced"]:
        raise NotImplementedError(
            "Adam7-interlaced PNG: install Pillow (stdlib path decodes sequential scanlines)"
        )
    w, h, color, ch = meta["width"], meta["height"], meta["color_type"], meta["channels"]
    palette = None
    idat: list[bytes] = []
    for ctype, body in _chunks(payload):
        if ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
    _require(bool(idat), "no IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        # the error contract is ValueError/NotImplementedError, never a
        # raw codec exception out of a Spark task (the ADVICE r7 rule)
        raise ValueError(f"not a valid PNG: corrupt IDAT ({e})") from e
    px = _unfilter(raw, w, h, ch)
    if color == 3:
        _require(palette is not None, "palette image without PLTE")
        idx = px.reshape(h, w)
        _require(int(idx.max(initial=0)) < len(palette), "palette index out of range")
        px = palette[idx].reshape(h, w * 3)
        ch = 3
    return w, h, ch, px.tobytes()


def png_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode to row-major 8-bit grayscale (w*h bytes) — the input
    shape the multimodal feature/fingerprint operators consume. Color
    folds with the same integer BT.601 weights as the AVI DIB path;
    alpha is dropped (features compare luminance, not transparency)."""
    w, h, ch, pixels = decode_png(payload)
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(h * w, ch).astype(np.int32)
    if ch in (1, 2):  # gray / gray+alpha
        gray = a[:, 0]
    else:  # RGB / RGBA
        gray = bt601_luma(a[:, 0], a[:, 1], a[:, 2])
    return w, h, gray.astype(np.uint8).tobytes()


# ---------------------------------------------------------------- writer


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def write_png(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Mux raw 8-bit samples into a standards-conforming PNG
    (grayscale ``channels=1`` or RGB ``channels=3``; filter 0 rows,
    one zlib IDAT). Used by the round-trip tests AND usable as a real
    sink-side encoder."""
    if channels not in (1, 3):
        raise NotImplementedError("write_png: channels must be 1 (gray) or 3 (RGB)")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"pixels must be {stride * height} bytes, got {len(pixels)}")
    color = 0 if channels == 1 else 2
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0))
    raw = b"".join(b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height))
    return _SIG + ihdr + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b"")

"""Minimal pure-stdlib PNG codec (zlib + numpy) for the multimodal
stages.

The container ships no image libraries (no PIL/libvips/cv2), but PNG
itself is just zlib-compressed filtered scanlines in CRC'd chunks
(RFC 2083), all of which the stdlib covers — so the multimodal decode
path can operate on a REAL interchange format instead of only the
FMRB fake.  Scope (documented, loud beyond it):

* 8-bit depth, color types 0 (grayscale) and 2 (RGB)
* all five scanline filters on decode (None/Sub/Up/Average/Paeth)
* no interlacing (Adam7 raises), no palette, no 16-bit, no ancillary
  chunk interpretation (they are skipped per spec)

Encode emits filter-0 (None) scanlines — any spec-conforming reader
(including this decoder) accepts that.  Round-trip and cross-filter
decoding are pinned in ``tests/test_multimodal_png.py``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 array → PNG bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = a.shape[:2]
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {arr.shape}")
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) prepended to every scanline
    raw = np.empty((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * channels)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse the per-scanline filters.  Up/None rows are vectorized;
    Sub uses a wrapping uint8 cumulative sum per pixel lane; Average
    and Paeth need the left neighbor and run per-pixel (rare in
    practice for the sizes this engine decodes inline)."""
    stride = w * channels
    rows = raw.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    data = rows[:, 1:].copy()
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(h):
        f = int(ftypes[y])
        cur = data[y]
        if f == 0:
            pass
        elif f == 1:  # Sub: cur[i] += recon[i - bpp]
            for lane in range(bpp):
                np.add.accumulate(cur[lane::bpp], dtype=np.uint8, out=cur[lane::bpp])
        elif f == 2:  # Up
            np.add(cur, prev, out=cur, dtype=np.uint8, casting="unsafe")
        elif f == 3:  # Average
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f} on row {y}")
        prev = cur
    if channels == 1:
        return data.reshape(h, w)
    return data.reshape(h, w, channels)


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes → (h, w) or (h, w, 3) uint8 array.  Supports the
    documented subset; anything else raises ``ValueError`` /
    ``NotImplementedError`` loudly."""
    if blob[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat_parts: list[bytes] = []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + length]
        expect_crc = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != expect_crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = payload
        elif tag == b"IDAT":
            idat_parts.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat_parts:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (8 only)")
    if color_type not in (0, 2):
        raise NotImplementedError(
            f"PNG color type {color_type} unsupported (grayscale/RGB only)"
        )
    if interlace != 0:
        raise NotImplementedError("Adam7 interlaced PNG unsupported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    channels = 1 if color_type == 0 else 3
    raw = np.frombuffer(zlib.decompress(b"".join(idat_parts)), dtype=np.uint8)
    expected = h * (1 + w * channels)
    if raw.size != expected:
        raise ValueError(f"PNG data size {raw.size} != expected {expected}")
    return _unfilter(raw, h, w, channels)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the deterministic, dependency-free
    scaler): index math only, exact for upscale and downscale."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]

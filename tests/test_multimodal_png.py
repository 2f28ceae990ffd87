"""Real-format multimodal path: the stdlib PNG codec (extras/png.py)
and the decode→resize→features actor-pool pipeline over PNG blobs.

The decoder must also accept PNGs *we did not encode* — scanlines
using every filter type (Sub/Up/Average/Paeth) are hand-built here
with an independent reference filterer and must decode back exactly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fuzzy_matching_ray.extras.png import (
    decode_png,
    encode_png,
    resize_nearest,
)


def _gradient(h: int, w: int, rgb: bool, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 13) % 256
    if rgb:
        return np.stack(
            [base, (base * 2) % 256, rng.integers(0, 256, (h, w))], axis=2
        ).astype(np.uint8)
    return base.astype(np.uint8)


@pytest.mark.parametrize("rgb", [False, True])
def test_png_roundtrip(rgb):
    img = _gradient(33, 47, rgb)
    blob = encode_png(img)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_png(blob)
    assert np.array_equal(out, img)


def _encode_with_filters(img: np.ndarray, ftype: int) -> bytes:
    """Independent PNG writer applying ONE filter type to every
    scanline (reference filter math straight from RFC 2083 §6)."""
    h, w, c = img.shape[0], img.shape[1], (img.shape[2] if img.ndim == 3 else 1)
    flat = img.reshape(h, w * c).astype(np.int32)
    bpp = c
    lines = []
    prev = np.zeros(w * c, np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ftype == 1:
            enc = (cur - left) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            enc = (cur - (left + prev) // 2) % 256
        elif ftype == 4:
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, ul)
            )
            enc = (cur - pred) % 256
        else:
            enc = cur
        lines.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if c == 1 else 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("rgb", [False, True])
def test_png_decode_all_filters(ftype, rgb):
    img = _gradient(17, 23, rgb, seed=ftype + 1)
    blob = _encode_with_filters(img, ftype)
    assert np.array_equal(decode_png(blob), img)


def test_png_unsupported_is_loud():
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    # 16-bit depth IHDR
    img = _gradient(4, 4, False)
    blob = bytearray(encode_png(img))
    blob[24] = 16  # depth byte inside IHDR
    # fix the CRC so depth is the failure, not the checksum
    ihdr = bytes(blob[12:16]) + bytes(blob[16:29])
    crc = zlib.crc32(ihdr) & 0xFFFFFFFF
    blob[29:33] = struct.pack(">I", crc)
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bytes(blob))


def test_resize_nearest_exact():
    img = _gradient(8, 8, True)
    up = resize_nearest(img, 16, 16)
    assert up.shape == (16, 16, 3)
    assert np.array_equal(up[::2, ::2], img)  # 2x upscale replicates
    down = resize_nearest(img, 4, 4)
    assert np.array_equal(down, img[::2, ::2])


def test_png_actor_pipeline_end_to_end(ray_session):
    """decode→resize→features over REAL PNG blobs through the Ray
    actor-pool stages (the brief's multimodal contract)."""
    from fuzzy_matching_ray.extras.multimodal import (
        decode_media,
        media_features,
        resize_media,
    )

    imgs = [_gradient(20 + i, 30 + i, rgb=bool(i % 2), seed=i) for i in range(6)]
    media = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "media": [encode_png(im) for im in imgs],
                "media_type": ["image/png"] * 6,
            }
        )
    )
    meta = decode_media(media, concurrency=2).to_pandas().sort_values("doc_id")
    assert meta["width"].tolist() == [30 + i for i in range(6)]
    assert meta["height"].tolist() == [20 + i for i in range(6)]

    small = resize_media(media, width=8, height=8, concurrency=2)
    meta2 = decode_media(small, concurrency=2).to_pandas().sort_values("doc_id")
    assert (meta2["width"] == 8).all() and (meta2["height"] == 8).all()
    # resized payloads decode to the exact nearest-neighbor resample
    blob0 = small.to_pandas().sort_values("doc_id")["media"].iloc[0]
    assert np.array_equal(decode_png(blob0), resize_nearest(imgs[0], 8, 8))

    feats = media_features(media, concurrency=2).to_pandas().sort_values("doc_id")
    for i in range(6):
        flat = imgs[i].reshape(-1)
        row = feats[feats.doc_id == i].iloc[0]
        assert row["n_bytes"] == flat.size
        assert row["byte_sum"] == int(flat.sum(dtype=np.int64))
        assert row["max_byte"] == int(flat.max())


def test_wav_roundtrip_features_exact(ray_session):
    """The WAV path is REAL: blobs are RIFF containers the stdlib
    `wave` reader parses; PCM features must match a hand computation
    from the defining formula sample = (byte - 128) * 256."""
    from fuzzy_matching_ray.extras.multimodal import audio_features, text_to_fake_wav

    texts = ["abc", "", "Zebra stripes éé", "x" * 1000]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": texts})
    out = (
        audio_features(text_to_fake_wav(rd.from_pandas(df)))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode(), np.uint8).astype(np.int64)
        s = (b - 128) * 256
        assert out.loc[i, "n_samples"] == s.size
        assert out.loc[i, "sample_rate"] == 8000
        assert out.loc[i, "duration_ms"] == s.size * 1000 // 8000
        assert out.loc[i, "peak"] == (np.abs(s).max() if s.size else 0)
        assert out.loc[i, "sum_abs"] == np.abs(s).sum()
        assert out.loc[i, "energy"] == (s * s).sum()


def test_wav_container_is_genuine_and_nonwav_is_loud(ray_session):
    """Blobs must open with the stdlib wave module directly (real RIFF,
    not a fake header), and a non-WAV blob must raise loudly."""
    import io
    import wave

    import pytest as _pytest

    from fuzzy_matching_ray.extras.multimodal import AudioFeatureStage, text_to_fake_wav

    df = pd.DataFrame({"doc_id": [7], "text": ["hello wave"]})
    blob = text_to_fake_wav(rd.from_pandas(df)).take_all()[0]["media"]
    with wave.open(io.BytesIO(blob), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == len("hello wave".encode())

    stage = AudioFeatureStage()
    with _pytest.raises(NotImplementedError, match="WAV"):
        stage(pa.table({"doc_id": [1], "media": [b"ID3\x04 not audio we read"],
                        "media_type": ["audio/mpeg"]}))

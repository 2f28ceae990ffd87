"""Stable, vectorized hashing primitives.

Everything here is deterministic across processes and machines (no
Python ``hash()``, no ``PYTHONHASHSEED`` dependence): numpy uint64
arithmetic with explicit wraparound, plus ``hashlib.blake2b`` for
token-level hashing.  These are the building blocks for the MinHash,
SimHash and exact-dup channels.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

# Mersenne prime 2^61 - 1: modulus for the universal-hash family used by
# MinHash permutations (a*x + b mod p), the standard construction from
# Carter-Wegman; products of (a < 2^31) * (x < 2^32) stay below 2^63 so
# uint64 arithmetic is exact (no wraparound before the mod).
MERSENNE_61 = np.uint64((1 << 61) - 1)
_MAX_HASH32 = np.uint64((1 << 32) - 1)

# Fixed multipliers for polynomial rolling hashes (odd 64-bit constants;
# splitmix64-style mixing).
_POLY_BASE = np.uint64(1099511628211)  # FNV prime


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — public-domain integer mixer (Steele et al.)."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        return x ^ (x >> np.uint64(31))


def codepoints(text: str) -> np.ndarray:
    """Decode a Python string into a uint64 array of Unicode codepoints."""
    if not text:
        return np.empty(0, dtype=np.uint64)
    buf = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    return buf.astype(np.uint64)


def char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of all overlapping k-character shingles of ``text``.

    Vectorized polynomial rolling hash over codepoints with a splitmix64
    finalizer, truncated to 32 bits (so MinHash's universal-hash products
    stay exact in uint64).  Returns the *unique* shingle hashes (a set,
    as MinHash needs).  Texts shorter than ``k`` hash the whole text as
    a single shingle.
    """
    cps = codepoints(text)
    n = cps.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        k = n
    with np.errstate(over="ignore"):
        # h[i] = sum_{j<k} cps[i+j] * BASE^(k-1-j)  (mod 2^64, wraparound ok
        # because we only use the mixed value as an opaque identifier)
        powers = np.empty(k, dtype=np.uint64)
        powers[-1] = np.uint64(1)
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * _POLY_BASE
        m = n - k + 1
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc = acc + cps[j : j + m] * powers[j]
    mixed = _splitmix64(acc) & _MAX_HASH32
    return np.unique(mixed)


def word_shingle_hashes(tokens: list[str], n: int = 1) -> np.ndarray:
    """64-bit hashes of word n-grams (unique), via blake2b per n-gram."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    if len(tokens) < n:
        grams = [" ".join(tokens)]
    else:
        grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    out = np.fromiter(
        (hash64_str(g) & int(_MAX_HASH32) for g in grams), dtype=np.uint64, count=len(grams)
    )
    return np.unique(out)


@lru_cache(maxsize=1 << 18)
def hash64_str(s: str) -> int:
    """Stable 64-bit hash of a string (blake2b truncated)."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def nid_of(ids: list[str]) -> np.ndarray:
    """Stable uint64 node ids for conv_id strings.

    The shuffle-heavy stages (band rows, candidate pairs, pair dedup,
    verification input) move these 8-byte ids instead of ~25-byte
    strings — a 3-5× cut in shuffled bytes, and numeric sort/group/
    dedup kernels instead of object-dtype ones.  Collision probability
    is birthday-bounded: ~n²/2⁶⁵ (≈3·10⁻¹¹ at 10⁶ docs, ≈3% at 10⁹ —
    at that scale switch to 128-bit ids).  Strings reappear only at
    the edge/cluster boundary (small data)."""
    return np.fromiter((hash64_str(s) for s in ids), dtype=np.uint64, count=len(ids))


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def minhash_coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) coefficient vectors for the permutation family."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(MERSENNE_61), size=num_perm, dtype=np.uint64)
    return a, b


def _mod_mersenne61(v: np.ndarray) -> np.ndarray:
    """x mod (2^61-1) via shift-add (no hardware division): for
    v < 2^64, (v & M) + (v >> 61) < 2^61 + 8, one conditional subtract
    finishes the reduction.  ~3× faster than ``%`` on large arrays."""
    y = (v & MERSENNE_61) + (v >> np.uint64(61))
    return np.where(y >= MERSENNE_61, y - MERSENNE_61, y)


_SIG_CHUNK = 256  # shingles per block: keeps the (num_perm × chunk)
# temporaries L2-resident — measured 3× faster than one full-width
# pass, serial AND under 12-way parallel load (the full-width
# temporaries spill to DRAM and fight for the shared memory bus)


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of (a*x + b) mod p, per perm.

    ``shingles`` are 32-bit values in uint64; products a*x < 2^63 are
    exact (a < 2^31), and a*x + b < 2^64, so the shift-add Mersenne
    reduction is exact too.  Empty shingle sets get the all-max
    signature (matches nothing).  Computed in cache-blocked chunks —
    bit-identical to the single-pass formulation."""
    num_perm = a.size
    if shingles.size == 0:
        return np.full(num_perm, MERSENNE_61, dtype=np.uint64)
    if shingles.size <= _SIG_CHUNK:
        with np.errstate(over="ignore"):
            vals = _mod_mersenne61(a[:, None] * shingles[None, :] + b[:, None])
        return vals.min(axis=1)
    out = np.full(num_perm, MERSENNE_61, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for s in range(0, shingles.size, _SIG_CHUNK):
            chunk = shingles[s : s + _SIG_CHUNK]
            vals = _mod_mersenne61(a[:, None] * chunk[None, :] + b[:, None])
            np.minimum(out, vals.min(axis=1), out=out)
    return out


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """Collapse a signature into ``bands`` 64-bit band keys.

    Each band of ``rows_per_band`` values is combined with a polynomial
    mix + splitmix64 finalizer, so equal bands ⇒ equal keys and unequal
    bands collide with ~2^-64 probability.
    """
    return band_hashes_matrix(sig.reshape(1, -1), bands)[0]


def band_hashes_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """Vectorized ``band_hashes`` over a (n_docs, num_perm) signature
    matrix → (n_docs, bands) band keys (bit-identical per row)."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    banded = sigs.reshape(n, bands, rows)
    with np.errstate(over="ignore"):
        acc = np.zeros((n, bands), dtype=np.uint64)
        for j in range(rows):
            acc = acc * _POLY_BASE + banded[:, :, j]
        # mix in the band index so band 0's key space differs from band 1's
        acc = acc + np.arange(bands, dtype=np.uint64)[None, :] * np.uint64(0x9E3779B97F4A7C15)
    return _splitmix64(acc)


def salt_keys(sigs: np.ndarray, resalt_rows: int) -> np.ndarray:
    """Per-doc salt key for hot-bucket re-salting: a mixed hash over
    the LAST ``resalt_rows`` rows of the (n_docs, num_perm) signature
    matrix.  Two docs share a salt key iff they agree on those rows
    (P ≈ Jaccard^resalt_rows), so re-banding a hot LSH bucket by salt
    behaves like one finer LSH band.  The trailing rows + a distinct
    mixing constant keep the salt key space disjoint from every
    ``band_hashes_matrix`` key space (different mixing constant).
    Caveat: bands tile ALL signature rows, so the salt rows overlap
    the trailing band(s); for a hot bucket keyed on one of those the
    salt is correlated with the colliding band and separates slightly
    less — harmless (re-salting is best-effort recall, and every
    separated pair is still counted exactly)."""
    tail = sigs[:, -resalt_rows:]
    with np.errstate(over="ignore"):
        acc = np.zeros(sigs.shape[0], dtype=np.uint64)
        for j in range(resalt_rows):
            acc = acc * _POLY_BASE + tail[:, j]
        acc = acc + np.uint64(0xD1B54A32D192ED03)
    return _splitmix64(acc)


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash (Charikar 2002) over pre-hashed tokens."""
    if token_hashes.size == 0:
        return 0
    bits = np.unpackbits(token_hashes.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
    signed = bits.astype(np.int64) * 2 - 1
    if weights is not None:
        signed = signed * weights[:, None]
    acc = signed.sum(axis=0)
    out_bits = (acc > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(out_bits).tobytes(), "big")


def simhash_band_keys(sim: int, bands: int, bits: int = 64) -> list[int]:
    """Split a SimHash into ``bands`` bit-chunks; two hashes within
    Hamming distance < bands share at least one chunk (pigeonhole)."""
    width = bits // bands
    mask = (1 << width) - 1
    return [((sim >> (i * width)) & mask) | (i << width) for i in range(bands)]


# --- vectorized single-block MD5 (deterministic-sample filter) -------------

# round constants K[i] = floor(|sin(i+1)| * 2^32) and per-round shifts
_MD5_K = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 2**32).astype(
    np.uint32
)
_MD5_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)


def md5_leading_byte(values: list) -> np.ndarray:
    """First digest byte of ``md5(str(v))`` for each value, vectorized.
    Bit-exact with ``hashlib.md5(s).digest()[0]`` — the contract that
    keeps ``hash_sample`` reproducible in SQL (md5 prefix compare)."""
    return (md5_first_word(values) >> np.uint32(24)).astype(np.uint8)


def md5_first_word(values: list) -> np.ndarray:
    """First FOUR digest bytes of ``md5(str(v))`` as a big-endian
    uint32 — numerically equal to SQL
    ``CAST('0x' || substr(md5(v), 1, 8) AS BIGINT)`` and ordered like
    the hex-digest prefix, so shard assignment (``% n``) and
    within-shard ordering reproduce exactly in any engine.

    Strings up to 55 bytes fit a single MD5 block, so the whole batch
    runs as 64 rounds of numpy uint32 arithmetic (~50 ns/row) instead
    of one ``hashlib`` call per row; longer strings (rare for ids)
    fall back to ``hashlib`` individually."""
    import hashlib

    enc = [str(v).encode() for v in values]
    n = len(enc)
    out = np.zeros(n, dtype=np.uint32)
    if n == 0:
        return out
    lens = np.fromiter((len(e) for e in enc), np.int64, n)
    long_rows = np.flatnonzero(lens > 55)
    for i in long_rows:
        out[i] = int.from_bytes(hashlib.md5(enc[i]).digest()[:4], "big")
    short = np.flatnonzero(lens <= 55)
    if short.size == 0:
        return out
    s_lens = lens[short]
    buf = np.zeros((short.size, 64), dtype=np.uint8)
    flat = np.frombuffer(b"".join(enc[i] for i in short), dtype=np.uint8)
    if flat.size:
        rows = np.repeat(np.arange(short.size), s_lens)
        offs = np.zeros(short.size, dtype=np.int64)
        np.cumsum(s_lens[:-1], out=offs[1:])
        cols = np.arange(flat.size, dtype=np.int64) - np.repeat(offs, s_lens)
        buf[rows, cols] = flat
    buf[np.arange(short.size), s_lens] = 0x80
    bitlen = (s_lens * 8).astype(np.uint64)
    buf[:, 56:64] = (bitlen[:, None] >> (8 * np.arange(8, dtype=np.uint64))).astype(
        np.uint8
    )
    m_all = buf.view(np.uint32)
    if not np.little_endian:
        m_all = m_all.byteswap()

    # chunk the compression loop so the 64 rounds' working set stays
    # L2-resident — full-batch arrays stream ~2 GB through memory and
    # ran 5× SLOWER than hashlib on the bandwidth-bound sandbox
    chunk = 65536
    res = np.empty(short.size, dtype=np.uint32)
    for lo in range(0, short.size, chunk):
        # transpose once per chunk: m[g] is then a contiguous row
        # instead of a strided gather in each of the 64 rounds
        m = np.ascontiguousarray(m_all[lo : lo + chunk].T)
        k = m.shape[1]
        a = np.full(k, 0x67452301, dtype=np.uint32)
        b = np.full(k, 0xEFCDAB89, dtype=np.uint32)
        c = np.full(k, 0x98BADCFE, dtype=np.uint32)
        d = np.full(k, 0x10325476, dtype=np.uint32)
        a0 = a.copy()
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
                g = i
            elif i < 32:
                f = (d & b) | (~d & c)
                g = (5 * i + 1) % 16
            elif i < 48:
                f = b ^ c ^ d
                g = (3 * i + 5) % 16
            else:
                f = c ^ (b | ~d)
                g = (7 * i) % 16
            tmp = a + f + _MD5_K[i] + m[g]
            s = int(_MD5_S[i])
            rot = (tmp << np.uint32(s)) | (tmp >> np.uint32(32 - s))
            a, d, c, b = d, c, b, b + rot
        res[lo : lo + chunk] = a0 + a
    # `res` is the little-endian first word; byteswap yields the
    # big-endian (hex-prefix-ordered) value
    out[short] = res.byteswap()
    return out


def sorted_member(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``needles`` in a SORTED ``haystack``
    (clamped ``searchsorted`` + equality).  The shared idiom for every
    broadcast-sorted-array probe (base-corpus membership, bench-gram
    decontamination, sampling filters) — the clamping is subtle enough
    that hand-rolled copies drift."""
    if haystack.size == 0:
        return np.zeros(needles.shape, dtype=bool)
    idx = np.minimum(np.searchsorted(haystack, needles), haystack.size - 1)
    return haystack[idx] == needles

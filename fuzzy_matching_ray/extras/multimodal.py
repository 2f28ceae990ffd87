"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Four codecs are real here: **PNG** (8-bit gray/RGB — decoded and
re-encoded with the stdlib-only codec in ``extras/png.py``, so
decode→resize→feature runs on an actual interchange format),
**baseline JPEG** (SOF0 Huffman DCT via the from-scratch numpy codec
in ``extras/jpeg.py`` — 4:4:4/4:2:0, restart intervals), **WAV**
(RIFF PCM via the stdlib ``wave`` module — real audio containers in,
integer PCM features out), and the deterministic "FMRB" fake (a tiny
self-describing header) that keeps the SQL oracles integer-exact.
Formats needing external codec libraries (MP4/video — not in this
container) raise ``NotImplementedError`` loudly; plug libav into
the same actor ``__init__`` on a full cluster image.

Stages are actor pools (``map_batches`` with a callable class): codec
tables/"models" load once per actor in ``__init__``; batches stay in
``batch_format="pyarrow"`` because binary columns don't round-trip
pandas cleanly.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data

_MAGIC = b"FMRB"  # deterministic fake image format: FMRB|u16 w|u16 h|payload


def encode_fake_image(width: int, height: int, payload: bytes) -> bytes:
    return _MAGIC + struct.pack("<HH", width, height) + payload


def text_to_fake_binary(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Deterministic binary column derived from text (test harness for
    the multimodal path; a real pipeline reads binary Parquet/files via
    ``ray.data.read_binary_files``)."""

    def _enc(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        blobs = []
        for t in texts:
            payload = (t or "").encode()
            w = (len(payload) % 640) + 1
            h = (hashlib.blake2b(payload, digest_size=2).digest()[0] % 480) + 1
            blobs.append(encode_fake_image(w, h, payload))
        return pa.table(
            {
                id_col: batch[id_col],
                "media": pa.array(blobs, pa.binary()),
                "media_type": pa.array(["image/x-fmrb"] * len(blobs), pa.string()),
            }
        )

    return ds.map_batches(_enc, batch_format="pyarrow")


class MediaDecodeStage:
    """Actor-pool decode/feature-extract over a binary media column.

    ``__init__`` is where a real pipeline loads its codec/model once
    per actor.  ``__call__`` emits per-item metadata features.  Real
    formats (JPEG/PNG/WAV/...) raise ``NotImplementedError`` — the
    decode libraries are not in this container.
    """

    def __init__(self, allow_fake: bool = True):
        # per-actor codec init (the "model load" slot): bind the PNG
        # and JPEG kernels once instead of importing per batch
        from fuzzy_matching_ray.extras.jpeg import decode_jpeg
        from fuzzy_matching_ray.extras.png import decode_png

        self.allow_fake = allow_fake
        self._decode_png = decode_png
        self._decode_jpeg = decode_jpeg

    def _decode(self, blob: bytes, media_type: str) -> tuple[int, int, int]:
        if media_type == "image/x-fmrb" and self.allow_fake and blob[:4] == _MAGIC:
            w, h = struct.unpack("<HH", blob[4:8])
            return w, h, len(blob) - 8
        if media_type == "image/png" or blob[:8] == b"\x89PNG\r\n\x1a\n":
            arr = self._decode_png(blob)
            h, w = arr.shape[:2]
            return w, h, int(arr.nbytes)
        if media_type == "image/jpeg" or blob[:2] == b"\xff\xd8":
            arr = self._decode_jpeg(blob)
            h, w = arr.shape[:2]
            return w, h, int(arr.nbytes)
        raise NotImplementedError(
            f"no decoder for {media_type!r} in this environment — "
            "plug a real codec here (libav) on a full cluster image"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["media"].to_pylist()
        types = batch["media_type"].to_pylist()
        n = len(blobs)
        widths = np.empty(n, dtype=np.int32)
        heights = np.empty(n, dtype=np.int32)
        payload_bytes = np.empty(n, dtype=np.int64)
        digests = []
        for i, (b, t) in enumerate(zip(blobs, types)):
            w, h, pb = self._decode(b, t)
            widths[i] = w
            heights[i] = h
            payload_bytes[i] = pb
            digests.append(hashlib.sha256(b).hexdigest()[:16])
        id_col = batch.column_names[0]
        return pa.table(
            {
                id_col: batch[id_col],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "payload_bytes": pa.array(payload_bytes, pa.int64()),
                "media_sha16": pa.array(digests, pa.string()),
            }
        )


def decode_media(
    ds: ray.data.Dataset,
    *,
    batch_size: int = 64,   # small: binary payloads are large
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Feature-extract a media Dataset.  Batch size deliberately small
    (large binary rows; see the memory-aware sizing note in the brief)."""
    return ds.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class MediaResizeStage:
    """Actor-pool binary-in/binary-out resize.  PNG and baseline JPEG
    blobs decode, nearest-neighbor resample and re-encode through the
    from-scratch codecs (``extras/png.py`` / ``extras/jpeg.py`` —
    JPEG re-encodes at quality 90, 4:4:4).  For the fake codec,
    "resizing" to ``(w, h)`` rewrites the header and keeps every
    ``k``-th payload byte (k = max(1, old_area // new_area)).  Same
    Ray shape either way: per-actor codec state, small batches,
    binary columns in and out.  Formats needing external libraries
    raise ``NotImplementedError``."""

    def __init__(self, width: int, height: int, allow_fake: bool = True):
        from fuzzy_matching_ray.extras.jpeg import decode_jpeg, encode_jpeg
        from fuzzy_matching_ray.extras.png import decode_png, encode_png, resize_nearest

        self.width = width
        self.height = height
        self.allow_fake = allow_fake
        self._png = (decode_png, encode_png, resize_nearest)
        self._jpeg = (decode_jpeg, encode_jpeg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode_png, encode_png, resize_nearest = self._png
        decode_jpeg, encode_jpeg = self._jpeg
        out = []
        for blob, mt in zip(
            batch["media"].to_pylist(), batch["media_type"].to_pylist()
        ):
            if blob[:8] == b"\x89PNG\r\n\x1a\n":
                out.append(
                    encode_png(resize_nearest(decode_png(blob), self.width, self.height))
                )
                continue
            if blob[:2] == b"\xff\xd8":
                out.append(
                    encode_jpeg(
                        resize_nearest(decode_jpeg(blob), self.width, self.height),
                        quality=90,
                    )
                )
                continue
            if not (self.allow_fake and blob[:4] == _MAGIC):
                raise NotImplementedError(
                    f"no codec for {mt!r} in this container "
                    "(WAV is audio — use audio_features)"
                )
            w, h = struct.unpack("<HH", blob[4:8])
            payload = blob[8:]
            k = max(1, (w * h) // max(1, self.width * self.height))
            out.append(encode_fake_image(self.width, self.height, payload[::k]))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media": pa.array(out, pa.binary()),
                "media_type": batch["media_type"],
            }
        )


def resize_media(
    ds: ray.data.Dataset,
    *,
    width: int,
    height: int,
    batch_size: int = 64,
    concurrency: int = 4,
) -> ray.data.Dataset:
    return ds.map_batches(
        MediaResizeStage,
        fn_constructor_args=(width, height),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class MediaFeatureStage:
    """Actor-pool feature extraction over decoded payload bytes —
    the embed-or-classify precursor stage of a multimodal pipeline.
    A real pipeline would run a vision/audio model here (weights
    loaded once per actor in ``__init__``); the container has no
    model libs, so the features are deterministic byte statistics
    with the same Ray shape: per-actor state, small batches, binary
    in / fixed-width numeric out.  All-integer features
    ``(n_bytes, byte_sum, max_byte, n_hi)`` make the stage
    SQL-oracle-checkable (hex-pair arithmetic over ``encode(text)``)."""

    def __init__(self) -> None:
        from fuzzy_matching_ray.extras.jpeg import decode_jpeg
        from fuzzy_matching_ray.extras.png import decode_png

        self._np = __import__("numpy")
        self._decode_png = decode_png
        self._decode_jpeg = decode_jpeg

    def __call__(self, batch: pa.Table) -> pa.Table:
        np = self._np
        blobs = batch["media"].to_pylist()
        n_b, b_sum, mx, hi = [], [], [], []
        for blob in blobs:
            if blob[:8] == b"\x89PNG\r\n\x1a\n":
                # real format: statistics over DECODED pixels
                payload = self._decode_png(blob).reshape(-1)
            elif blob[:2] == b"\xff\xd8":
                payload = self._decode_jpeg(blob).reshape(-1)
            elif len(blob) < 8 or blob[:4] != _MAGIC:
                # same contract as MediaDecodeStage: loud, not garbage
                raise NotImplementedError(
                    "no codec for this format in this container; PNG/JPEG and "
                    "the FMRB fake are feature-extractable here, WAV via "
                    "audio_features"
                )
            else:
                payload = np.frombuffer(blob, dtype=np.uint8)[8:]  # strip header
            n_b.append(int(payload.size))
            b_sum.append(int(payload.sum(dtype=np.int64)))
            mx.append(int(payload.max()) if payload.size else 0)
            hi.append(int(np.count_nonzero(payload >= 0x80)))
        return pa.table(
            {
                "doc_id": batch["doc_id"],  # id type rides through
                "n_bytes": pa.array(n_b, pa.int64()),
                "byte_sum": pa.array(b_sum, pa.int64()),
                "max_byte": pa.array(mx, pa.int64()),
                "n_hi": pa.array(hi, pa.int64()),
            }
        )


def media_features(
    ds: ray.data.Dataset,
    *,
    batch_size: int = 64,
    concurrency: int = 4,
) -> ray.data.Dataset:
    return ds.map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def text_to_jpeg_binary(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """REAL baseline JPEG blobs (``extras/jpeg.py`` encoder),
    deterministically derived from text so the JPEG path is
    SQL-oracle-checkable on its lossless facts: grayscale, ``width =
    (octet_length(text) % 24) + 8``, ``height = ((octet_length(text)
    * 7) % 24) + 8`` — dimensions and decoded payload size survive the
    lossy transform exactly (pixels do not, and no oracle reads them).
    Pixels tile the utf-8 text bytes cyclically.  A real pipeline
    reads image files via ``ray.data.read_binary_files`` — only this
    synthesizer is a test harness."""

    def _enc(batch: pa.Table) -> pa.Table:
        from fuzzy_matching_ray.extras.jpeg import encode_jpeg

        blobs = []
        for t in batch[text_col].to_pylist():
            data = (t or "").encode()
            w = (len(data) % 24) + 8
            h = ((len(data) * 7) % 24) + 8
            if data:
                px = np.resize(np.frombuffer(data, np.uint8), (h, w))
            else:
                px = np.zeros((h, w), np.uint8)
            blobs.append(encode_jpeg(px, quality=90))
        return pa.table(
            {
                id_col: batch[id_col],
                "media": pa.array(blobs, pa.binary()),
                "media_type": pa.array(["image/jpeg"] * len(blobs), pa.string()),
            }
        )

    return ds.map_batches(_enc, batch_format="pyarrow")


def text_to_fake_wav(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_rate: int = 8000,
) -> ray.data.Dataset:
    """REAL RIFF/WAV blobs (stdlib ``wave`` encoder), deterministically
    derived from text so the audio path is SQL-oracle-checkable: PCM16
    mono, one sample per UTF-8 byte ``b`` of the text, ``sample =
    (b - 128) * 256``.  A real pipeline reads audio files via
    ``ray.data.read_binary_files`` — only this synthesizer is a test
    harness; everything downstream handles genuine WAV containers."""

    def _enc(batch: pa.Table) -> pa.Table:
        import io
        import wave

        blobs = []
        for t in batch[text_col].to_pylist():
            data = (t or "").encode()
            samples = (np.frombuffer(data, np.uint8).astype(np.int16) - 128) * 256
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sample_rate)
                w.writeframes(samples.tobytes())
            blobs.append(buf.getvalue())
        return pa.table(
            {
                id_col: batch[id_col],
                "media": pa.array(blobs, pa.binary()),
                "media_type": pa.array(["audio/wav"] * len(blobs), pa.string()),
            }
        )

    return ds.map_batches(_enc, batch_format="pyarrow")


class AudioFeatureStage:
    """Actor-pool PCM feature extraction over a binary WAV column —
    the audio half of the multimodal scaffold, now a REAL decode path
    (stdlib ``wave`` + numpy): per-actor codec bind in ``__init__``,
    small Arrow batches, binary in / fixed-width integers out.

    Features are all-integer so the DuckDB oracle hashes exactly:
    ``n_samples``, ``sample_rate``, ``duration_ms`` (floor), ``peak``
    (max |sample|), ``sum_abs`` and ``energy`` (sum of squared
    samples — RMS² × n, kept integer instead of a libm sqrt).
    Non-WAV audio (MP3/OGG/...) raises ``NotImplementedError``."""

    def __init__(self) -> None:
        import wave

        self._wave = wave

    def _pcm(self, blob: bytes) -> tuple[np.ndarray, int, int]:
        import io

        if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
            raise NotImplementedError(
                "no MP3/OGG codec in this container; WAV (RIFF PCM) is decodable"
            )
        with self._wave.open(io.BytesIO(blob), "rb") as w:
            nch, sw, fr, nf = (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
            )
            raw = w.readframes(nf)
        if sw == 2:
            samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        elif sw == 1:
            # 8-bit WAV is unsigned, centered at 128
            samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
        else:
            raise NotImplementedError(f"unsupported PCM sample width {sw}")
        return samples, fr, nch

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        n_samples = np.empty(n, np.int64)
        rate = np.empty(n, np.int64)
        dur_ms = np.empty(n, np.int64)
        peak = np.empty(n, np.int64)
        sum_abs = np.empty(n, np.int64)
        energy = np.empty(n, np.int64)
        for i, blob in enumerate(batch["media"].to_pylist()):
            s, fr, nch = self._pcm(blob)
            n_samples[i] = s.size
            rate[i] = fr
            # duration of the frame stream (frames = samples / channels)
            dur_ms[i] = (s.size // max(1, nch)) * 1000 // fr
            a = np.abs(s)
            peak[i] = int(a.max()) if s.size else 0
            sum_abs[i] = int(a.sum())
            energy[i] = int((s * s).sum())
        id_col = batch.column_names[0]
        return pa.table(
            {
                id_col: batch[id_col],
                "n_samples": pa.array(n_samples, pa.int64()),
                "sample_rate": pa.array(rate, pa.int64()),
                "duration_ms": pa.array(dur_ms, pa.int64()),
                "peak": pa.array(peak, pa.int64()),
                "sum_abs": pa.array(sum_abs, pa.int64()),
                "energy": pa.array(energy, pa.int64()),
            }
        )


def audio_features(
    ds: ray.data.Dataset,
    *,
    batch_size: int = 64,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Actor-pool WAV decode + PCM features (same memory-aware shape
    as the image stages: small batches of large binary rows)."""
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def frame_sample_media(
    ds: ray.data.Dataset,
    *,
    frame_bytes: int = 256,
    stride: int = 4,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Frame sampling: treat the payload as consecutive
    ``frame_bytes`` frames and keep every ``stride``-th one, emitting
    one row per sampled frame ``(doc_id, frame_idx, frame_len)`` —
    the video-pipeline explode shape (one input row → many output
    rows, binary-sliced).  Integer outputs only, so the DuckDB oracle
    (frame math over ``octet_length``) hashes identically; the frame
    payload itself stays binary and is exercised in pytest."""

    def _frames(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        blobs = batch["media"].to_pylist()
        out_id: list[int] = []
        out_idx: list[int] = []
        out_len: list[int] = []
        for i, blob in zip(ids, blobs):
            payload_len = len(blob) - 8
            n_frames = (payload_len + frame_bytes - 1) // frame_bytes
            for f in range(0, n_frames, stride):
                out_id.append(i)
                out_idx.append(f)
                out_len.append(min(frame_bytes, payload_len - f * frame_bytes))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "frame_len": pa.array(out_len, pa.int64()),
            }
        )

    return ds.map_batches(_frames, batch_format="pyarrow", batch_size=batch_size)

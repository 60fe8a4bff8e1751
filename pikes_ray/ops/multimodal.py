"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decoders: formats parseable with the standard library are decoded FOR
REAL — uncompressed 24/32-bit BMP images (``decode_bmp``) and PCM WAV
audio (``decode_wav`` via the stdlib ``wave`` module, features via
``numpy.fft``).  Compressed containers (JPEG/PNG/MP3/H.264) need
libraries not present here: those go through the clearly-marked stub
path — the Ray-side plumbing (schema, actor-pool stage shape, batch
sizing for large binary payloads, quarantine columns, output layout)
is identical, and a PIL/ffmpeg-backed ``decode_fn`` slots in unchanged.

Batch-size guidance: binary payloads make rows wide — size
``batch_size`` so batch_bytes × concurrency fits the worker heap
(SURVEY §4 memory row); blocks of multimedia should be produced by the
reader already small (``target_max_block_size``).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

IMAGE_META_T = pa.struct(
    [("width", pa.int32()), ("height", pa.int32()), ("channels", pa.int32()),
     ("format", pa.string())]
)


def decode_bmp(payload: bytes) -> tuple[np.ndarray, dict]:
    """REAL decoder for uncompressed 24/32-bit BMP (BITMAPINFOHEADER,
    bottom-up) — pure struct/numpy, no image library needed."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32) or planes != 1:
        raise NotImplementedError(f"BMP bpp={bpp}/compression={compression}")
    c = bpp // 8
    flip = h > 0
    h = abs(h)
    row_bytes = (w * c + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                       offset=data_off)
    arr = px.reshape(h, row_bytes)[:, : w * c].reshape(h, w, c)
    if flip:
        arr = arr[::-1]
    arr = arr[..., [2, 1, 0] + ([3] if c == 4 else [])]   # BGR(A) → RGB(A)
    return np.ascontiguousarray(arr), {
        "width": int(w), "height": int(h), "channels": int(c),
        "format": "bmp"}


def encode_bmp(arr: np.ndarray) -> bytes:
    """Inverse of ``decode_bmp`` for tests: RGB uint8 (h, w, 3) →
    bottom-up 24-bit BMP bytes."""
    h, w, c = arr.shape
    assert c == 3
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for row in arr[::-1]:
        line = row[:, [2, 1, 0]].tobytes()
        body += line + b"\x00" * (row_bytes - len(line))
    off = 54
    size = off + len(body)
    hdr = (b"BM" + struct.pack("<IHHI", size, 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    return bytes(hdr) + bytes(body)


def _decode_image_stub(payload: bytes) -> tuple[np.ndarray, dict]:
    """Default decode chain: real BMP decode first, then the
    deterministic ``PRAY`` fake (tests), else NotImplementedError.
    """
    if len(payload) >= 2 and payload[:2] == b"BM":
        return decode_bmp(payload)
    if len(payload) >= 16 and payload[:4] == b"PRAY":
        w, h, c = struct.unpack("<iii", payload[4:16])
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
        rng = np.random.RandomState(seed % (2**31))
        arr = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
        return arr, {"width": w, "height": h, "channels": c, "format": "pray"}
    raise NotImplementedError(
        "real image decoding requires an image library not present in "
        "this container; pass decode_fn=... with a PIL/cv2-backed decoder"
    )


def encode_stub_image(w: int, h: int, c: int = 3, salt: bytes = b"") -> bytes:
    """Synthesize a payload the stub decoder accepts (for tests)."""
    return b"PRAY" + struct.pack("<iii", w, h, c) + salt


class DecodeImageStage:
    """Actor-pool stage: binary column → decoded metadata + features.

    ``ds.map_batches(DecodeImageStage, concurrency=(2, 8), batch_size=32,
    num_cpus=1)`` — small batches because payloads are large.  Emits
    ``image_meta`` (struct) and ``feat`` (list<float>, a mean-pooled
    channel histogram — the stand-in for a real embedding model).
    Decode errors are quarantined per row (``decode_error`` column),
    never raised (log-and-continue, SURVEY §4 poison rows).
    """

    def __init__(self, decode_fn=None, bins: int = 8):
        self.decode = decode_fn or _decode_image_stub
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats, errors = [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                arr, meta = self.decode(payload or b"")
                hist = [
                    np.histogram(arr[..., ch], bins=self.bins, range=(0, 256))[0]
                    / arr[..., ch].size
                    for ch in range(arr.shape[-1])
                ]
                feats.append(np.concatenate(hist).astype(np.float32).tolist())
                metas.append(meta)
                errors.append("")
            except NotImplementedError as e:
                metas.append(None)
                feats.append([])     # empty (not null) keeps the column ragged
                errors.append(str(e))
        batch = batch.append_column("image_meta", pa.array(metas, type=IMAGE_META_T))
        batch = batch.append_column("feat", pa.array(feats, type=pa.list_(pa.float32())))
        return batch.append_column("decode_error", pa.array(errors, type=pa.string()))


class ResizeStage:
    """Stub resize: rewrites the synthetic header dims (real impl would
    re-encode pixels).  Demonstrates the in-place binary rewrite shape."""

    def __init__(self, width: int, height: int):
        self.w, self.h = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch["payload"].to_pylist():
            p = payload or b""
            if p[:4] == b"PRAY":
                _, _, c = struct.unpack("<iii", p[4:16])
                out.append(b"PRAY" + struct.pack("<iii", self.w, self.h, c) + p[16:])
            else:
                out.append(p)
        idx = batch.schema.get_field_index("payload")
        return batch.set_column(idx, "payload", pa.array(out, type=pa.binary()))


AUDIO_META_T = pa.struct(
    [("sample_rate", pa.int32()), ("channels", pa.int32()),
     ("n_frames", pa.int32()), ("duration_ms", pa.int32()),
     ("format", pa.string())]
)


def decode_wav(payload: bytes) -> tuple[np.ndarray, dict]:
    """REAL decoder for PCM WAV via the stdlib ``wave`` module →
    float32 mono samples in [-1, 1] + metadata."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as f:
            rate, ch, width = f.getframerate(), f.getnchannels(), f.getsampwidth()
            n = f.getnframes()
            raw = f.readframes(n)
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(f"not a PCM WAV payload: {e}") from e
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {width} not supported")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, {"sample_rate": int(rate), "channels": int(ch),
               "n_frames": int(n),
               "duration_ms": int(1000 * n / max(rate, 1)), "format": "wav"}


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Inverse of ``decode_wav`` for tests: float mono [-1, 1] →
    16-bit PCM WAV bytes."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


class DecodeAudioStage:
    """Actor-pool stage: WAV binary column → metadata + a log-magnitude
    band-energy feature vector (numpy FFT — a real spectral feature,
    the mel-filterbank stand-in).  Same quarantine contract as
    ``DecodeImageStage``."""

    def __init__(self, decode_fn=None, n_bands: int = 16,
                 frame: int = 1024):
        self.decode = decode_fn or decode_wav
        self.n_bands = n_bands
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats, errors = [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                x, meta = self.decode(payload or b"")
                n = (len(x) // self.frame) * self.frame
                if n == 0:
                    spec = np.zeros(self.frame // 2)
                else:
                    frames = x[:n].reshape(-1, self.frame)
                    spec = np.abs(np.fft.rfft(frames, axis=1))[:, 1:].mean(axis=0)
                bands = np.array_split(spec, self.n_bands)
                feat = np.log1p(np.array([b.mean() for b in bands]))
                feats.append(feat.astype(np.float32).tolist())
                metas.append(meta)
                errors.append("")
            except NotImplementedError as e:
                metas.append(None)
                feats.append([])
                errors.append(str(e))
        batch = batch.append_column("audio_meta", pa.array(metas, type=AUDIO_META_T))
        batch = batch.append_column("feat", pa.array(feats, type=pa.list_(pa.float32())))
        return batch.append_column("decode_error", pa.array(errors, type=pa.string()))


def frame_sample(batch: pa.Table, every: int = 10) -> pa.Table:
    """Video frame-sampling stub: keeps every ``every``-th row of a
    (video_id, frame_idx, payload) table — a pure Arrow filter, the
    real kernel shape for frame decimation."""
    idx = batch["frame_idx"].to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(idx % every == 0))

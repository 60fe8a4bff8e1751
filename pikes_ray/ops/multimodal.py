"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBS — the image/audio libraries are
not in this container — but the Ray-side plumbing is real and tested:
schema, actor-pool stage shape, batch sizing for large binary payloads,
and output layout.  Swap ``_decode_image_stub`` for a real decoder
(PIL/torchvision/ffmpeg) by passing ``decode_fn``.

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


def _decode_image_stub(payload: bytes) -> tuple[np.ndarray, dict]:
    """Deterministic fake decoder.

    Accepts the synthetic header ``PRAY`` + packed (w, h, c) and
    "decodes" a deterministic pixel array from the payload hash.  Any
    other payload → NotImplementedError (a real decoder is required).
    """
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


def frame_sample(batch: pa.Table, every: int = 10) -> pa.Table:
    """Video frame-sampling stub: keeps every ``every``-th row of a
    (video_id, frame_idx, payload) table — a pure Arrow filter, the
    real kernel shape for frame decimation."""
    idx = batch["frame_idx"].to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(idx % every == 0))

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): ``DecodeImages(fake=False)`` raises NotImplementedError
at first batch; ``fake=True`` substitutes a deterministic byte-hash
"decode" so the Ray-side plumbing — schema, small batch sizes for large
binary rows, actor signature, output layout — is real and tested.

Scale notes (ray_guide memory section): binary payload stages use small
``batch_size`` so batch × concurrency fits worker heaps, and
``batch_format="pyarrow"`` so the binary column never round-trips through
pandas object dtype.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                            "width", "height", "duration_ms")}
    for i in range(n):
        kind = kinds[int(rng.integers(0, 3))]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                               dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(16, 1024)) if kind != "audio" else 0)
        rows["height"].append(int(rng.integers(16, 1024)) if kind != "audio" else 0)
        rows["duration_ms"].append(int(rng.integers(100, 60000)) if kind != "image" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImages:
    """Actor-pool stage: binary payload → fixed-dim feature vector.

    Real deployment would decode with PIL/libvips and run a vision encoder
    loaded once in ``__init__``; here the environment has no image libs,
    so ``fake=True`` derives a deterministic 64-d feature from a blake2b
    digest of the payload (stable across runs/workers), and ``fake=False``
    raises NotImplementedError to mark the stub boundary clearly.
    """

    FEATURE_DIM = 64

    def __init__(self, fake: bool = False):
        self.fake = fake
        # model load would happen HERE, once per actor

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/cv2, not available in this "
                "environment; construct DecodeImages(fake=True) for the "
                "deterministic test kernel")
        feats = []
        for payload in tbl.column("payload").to_pylist():
            d = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
            feats.append((np.frombuffer(d, dtype=np.uint8).astype(np.float32)
                          / 255.0).tolist())
        return pa.table({
            "media_id": tbl.column("media_id"),
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


class ResizeImages:
    """Actor-pool stage: payload → resized payload + new dims (stub kernel
    keeps bytes, rewrites metadata deterministically)."""

    def __init__(self, max_side: int = 256, fake: bool = False):
        self.max_side = max_side
        self.fake = fake

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("resize requires an image library")
        import pyarrow.compute as pc

        w = tbl.column("width").to_numpy(zero_copy_only=False).astype(np.int64)
        h = tbl.column("height").to_numpy(zero_copy_only=False).astype(np.int64)
        scale = np.minimum(1.0, self.max_side / np.maximum(1, np.maximum(w, h)))
        return (tbl.set_column(tbl.schema.get_field_index("width"), "width",
                               pa.array((w * scale).astype(np.int32)))
                   .set_column(tbl.schema.get_field_index("height"), "height",
                               pa.array((h * scale).astype(np.int32))))


class SampleFrames:
    """Actor-pool stage: video payload → frame-sample rows (one output row
    per sampled frame; flat_map-style explode inside map_batches)."""

    def __init__(self, every_ms: int = 1000, fake: bool = False):
        self.every_ms = every_ms
        self.fake = fake

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("frame sampling requires a video library")
        out_id, out_t, out_payload = [], [], []
        for mid, dur, payload in zip(tbl.column("media_id").to_pylist(),
                                     tbl.column("duration_ms").to_pylist(),
                                     tbl.column("payload").to_pylist()):
            for t in range(0, max(1, dur), self.every_ms):
                out_id.append(mid)
                out_t.append(t)
                # stub "frame": deterministic slice of the payload
                off = t % max(1, len(payload) - 16) if len(payload) > 16 else 0
                out_payload.append(payload[off:off + 16])
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_ms": pa.array(out_t, pa.int32()),
            "frame": pa.array(out_payload, pa.large_binary()),
        })


def media_pipeline(ds, *, fake: bool = True, batch_size: int = 64,
                   concurrency: int = 2):
    """Reference wiring: decode features for images, frame-sample videos.
    Small batch_size on purpose — large binary rows."""
    images = ds.map_batches(lambda t: t.filter(
        __import__("pyarrow").compute.equal(t.column("kind"), "image")),
        batch_format="pyarrow")
    feats = images.map_batches(DecodeImages, fn_constructor_kwargs={"fake": fake},
                               batch_format="pyarrow", batch_size=batch_size,
                               concurrency=concurrency)
    return feats

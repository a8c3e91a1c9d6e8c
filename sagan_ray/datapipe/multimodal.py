"""Multimodal column processing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The decode kernels are REAL for the formats the standard library can
handle — 24-bit uncompressed BMP images (struct + numpy), PCM16 WAV audio
(stdlib ``wave``), and a simple length-prefixed BMP-frame container for
video (``SGV1``, documented below; real mp4/h264 needs codecs this
environment lacks). Compressed formats (PNG/JPEG/MP4) raise
NotImplementedError at the decode boundary with a clear message — the
stage signatures, schemas and batch handling are identical either way, so
swapping in PIL/ffmpeg later only replaces the codec functions.

Scale notes (ray_guide memory section): binary payload stages use small
``batch_size`` so batch × concurrency fits worker heaps, and
``batch_format="pyarrow"`` so the binary column never round-trips through
pandas object dtype. Stateful setup (nothing heavier than codec tables
here; a vision encoder in real deployments) belongs in ``__init__`` —
once per actor.
"""

from __future__ import annotations

import io
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.large_binary()),  # encoded bytes (BMP / WAV / SGV1)
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 64


# ----------------------------------------------------------------------
# codecs (stdlib + numpy only)
# ----------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up BGR rows padded to 4 bytes)."""
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, row + pad), np.uint8)
    rows[:, :row] = bgr.reshape(h, row)
    data = rows.tobytes()
    return (struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                          2835, 2835, 0, 0)
            + data)


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → HxWx3 uint8 RGB."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", b, 10)[0]
    _, w, h = struct.unpack_from("<Iii", b, 14)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP decodes here (got bpp={bpp}, "
            f"compression={comp}); PNG/JPEG need an image library")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(b, np.uint8, count=stride * h, offset=off)
    arr = arr.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if flip:
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """1-D float array in [-1, 1] → mono PCM16 WAV bytes."""
    import wave

    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 samples in [-1, 1] of channel 0, rate)."""
    import wave

    with wave.open(io.BytesIO(b), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV decodes here")
        n = w.getnframes()
        raw = w.readframes(n)
        rate = w.getframerate()
        ch = w.getnchannels()
    arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
    if ch > 1:
        arr = arr[::ch]
    return arr, rate


# "SGV1" frame container: magic + u32 n_frames + u32 interval_ms +
# n × u32 frame byte-length, then the BMP frames concatenated. A
# stand-in for real video containers (mp4 needs codecs); the sampling
# stage's offsets/interval logic is what real decoders also need.

def encode_sgv(frames: list[bytes], interval_ms: int) -> bytes:
    head = struct.pack("<4sII", b"SGV1", len(frames), interval_ms)
    head += b"".join(struct.pack("<I", len(f)) for f in frames)
    return head + b"".join(frames)


def decode_sgv(b: bytes) -> tuple[list[bytes], int]:
    magic, n, interval = struct.unpack_from("<4sII", b, 0)
    if magic != b"SGV1":
        raise NotImplementedError(
            "only the SGV1 frame container decodes here; real mp4/h264 "
            "needs a video library")
    sizes = struct.unpack_from(f"<{n}I", b, 12)
    off = 12 + 4 * n
    frames = []
    for s in sizes:
        frames.append(b[off:off + s])
        off += s
    return frames, interval


def _resize_nn(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure index arithmetic)."""
    h, w = img.shape[:2]
    yi = (np.arange(nh) * h // nh).clip(0, h - 1)
    xi = (np.arange(nw) * w // nw).clip(0, w - 1)
    return img[yi][:, xi]


# ----------------------------------------------------------------------
# synthetic media (deterministic, real encodings)
# ----------------------------------------------------------------------

def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table with REAL payloads: BMP gradients+noise,
    sine-wave WAVs, SGV1 frame stacks."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                            "width", "height", "duration_ms")}
    for i in range(n):
        kind = kinds[int(rng.integers(0, 3))]
        if kind == "image":
            h = int(rng.integers(12, 48))
            w = int(rng.integers(12, 48))
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([(xx * 255 // max(1, w - 1)),
                            (yy * 255 // max(1, h - 1)),
                            rng.integers(0, 256, (h, w))], axis=-1
                           ).astype(np.uint8)
            payload, mime, dur = encode_bmp(img), "image/bmp", 0
        elif kind == "audio":
            rate = 8000
            dur = int(rng.integers(50, 250))
            t = np.arange(int(rate * dur / 1000)) / rate
            freq = float(rng.uniform(100, 1000))
            payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * t), rate)
            mime, h, w = "audio/wav", 0, 0
        else:
            h = w = 16
            nf = int(rng.integers(2, 6))
            interval = 500
            frames = [encode_bmp(rng.integers(0, 256, (h, w, 3)).astype(np.uint8))
                      for _ in range(nf)]
            payload, mime = encode_sgv(frames, interval), "video/x-sgv"
            dur = nf * interval
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w if kind != "audio" else 0)
        rows["height"].append(h if kind != "audio" else 0)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


# ----------------------------------------------------------------------
# actor-pool stages
# ----------------------------------------------------------------------

class DecodeImages:
    """Actor-pool stage: BMP payload → 64-d feature vector (8×8 gray
    mean-pooled grid). A real vision encoder would be loaded HERE, once
    per actor, and replace ``_feature``."""

    def __init__(self):
        self._grid = 8  # setup once per actor

    def _feature(self, img: np.ndarray) -> np.ndarray:
        gray = img.astype(np.float32).mean(axis=-1)
        small = _resize_nn(gray, self._grid, self._grid)
        return (small / 255.0).reshape(-1)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        feats = [self._feature(decode_bmp(p)).tolist()
                 for p in tbl.column("payload").to_pylist()]
        return pa.table({
            "media_id": tbl.column("media_id"),
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


class DecodeAudio:
    """Actor-pool stage: WAV payload → 64-d feature (rms, zero-crossing
    rate, 62 pooled |rFFT| magnitude bins)."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        feats = []
        for p in tbl.column("payload").to_pylist():
            x, _rate = decode_wav(p)
            if len(x) == 0:
                feats.append([0.0] * FEATURE_DIM)
                continue
            rms = float(np.sqrt(np.mean(x * x)))
            zcr = float(np.mean(np.abs(np.diff(np.signbit(x)))))
            mag = np.abs(np.fft.rfft(x))
            pooled = np.interp(np.linspace(0, len(mag) - 1, FEATURE_DIM - 2),
                               np.arange(len(mag)), mag)
            denom = pooled.max() or 1.0
            feats.append([rms, zcr] + (pooled / denom).astype(float).tolist())
        return pa.table({
            "media_id": tbl.column("media_id"),
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


class ResizeImages:
    """Actor-pool stage: BMP payload → re-encoded BMP capped at
    ``max_side`` (nearest-neighbor), metadata rewritten to match."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads, ws, hs = [], [], []
        for p in tbl.column("payload").to_pylist():
            img = decode_bmp(p)
            h, w = img.shape[:2]
            scale = min(1.0, self.max_side / max(1, max(h, w)))
            nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
            if (nh, nw) != (h, w):
                img = _resize_nn(img, nh, nw)
                p = encode_bmp(img)
            payloads.append(p)
            ws.append(nw)
            hs.append(nh)
        i_w = tbl.schema.get_field_index("width")
        i_h = tbl.schema.get_field_index("height")
        i_p = tbl.schema.get_field_index("payload")
        return (tbl.set_column(i_p, "payload", pa.array(payloads, pa.large_binary()))
                   .set_column(i_w, "width", pa.array(ws, pa.int32()))
                   .set_column(i_h, "height", pa.array(hs, pa.int32())))


class SampleFrames:
    """Actor-pool stage: SGV1 video payload → one row per sampled frame
    (nearest stored frame at each ``every_ms`` tick)."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, tbl: pa.Table) -> pa.Table:
        out_id, out_t, out_payload = [], [], []
        for mid, dur, payload in zip(tbl.column("media_id").to_pylist(),
                                     tbl.column("duration_ms").to_pylist(),
                                     tbl.column("payload").to_pylist()):
            frames, interval = decode_sgv(payload)
            if not frames:      # valid zero-frame container → zero rows
                continue
            for t in range(0, max(1, dur), self.every_ms):
                idx = min(len(frames) - 1, t // max(1, interval))
                out_id.append(mid)
                out_t.append(t)
                out_payload.append(frames[idx])
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_ms": pa.array(out_t, pa.int32()),
            "frame": pa.array(out_payload, pa.large_binary()),
        })


def media_pipeline(ds, *, batch_size: int = 64, concurrency: int = 2):
    """Reference wiring: decode features for images. Small batch_size on
    purpose — large binary rows; actor pool so codec setup is per-actor."""
    import pyarrow.compute as pc

    images = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "image")),
        batch_format="pyarrow")
    return images.map_batches(DecodeImages, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency)

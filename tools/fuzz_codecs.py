#!/usr/bin/env python
"""One-off codec fuzz sweep (no Ray): random images/audio across the
full JPEG/PNG/WAV option space, asserting the invariants the test suite
enforces — PNG exact roundtrip + golden first-pixel parity, JPEG
progressive == baseline decode pixel-exactly + golden parity, WAV
quantization-bounded roundtrip + golden first-sample parity.

    python tools/fuzz_codecs.py [--trials N] [--seed S]

Prints one summary line per codec family; exits nonzero on any failure.
Results are recorded in BASELINE.md next to the engine fuzz sweeps.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sagan_ray.datapipe.jpeg import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_lossless,
)
from sagan_ray.datapipe.multimodal import (  # noqa: E402
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)
from sagan_ray.oracle.golden import (  # noqa: E402
    _jpeg_first_pixel_gray,
    _png_first_pixel_gray,
    _wav_first_sample,
)


def _gray6(px) -> float:
    s = np.float32(np.float32(np.float32(int(px[0])) + np.float32(int(px[1])))
                   + np.float32(int(px[2])))
    return float(np.float32(np.float32(s / np.float32(3.0))
                            / np.float32(255.0)))


def fuzz_jpeg(rng: np.random.Generator, trials: int) -> int:
    fails = 0
    subs = ("4:4:4", "4:2:0", "4:2:2", "4:4:0")
    for t in range(trials):
        h, w = int(rng.integers(1, 56)), int(rng.integers(1, 56))
        gray = t % 5 == 0
        img = rng.integers(0, 256, (h, w) if gray else (h, w, 3)
                           ).astype(np.uint8)
        kw = {} if gray else {"subsampling": subs[int(rng.integers(0, 4))]}
        q = int(rng.integers(5, 100))
        ri = int(rng.integers(0, 9))
        if t % 6 == 5:               # lossless: bit-exact by definition
            lb = encode_jpeg_lossless(img, predictor=int(rng.integers(1, 8)))
            ld = decode_jpeg(lb)
            px = ([int(ld[0, 0])] * 3 if gray
                  else [int(v) for v in ld[0, 0]])
            if not (np.array_equal(ld, img)
                    and _jpeg_first_pixel_gray(lb) == _gray6(px)):
                fails += 1
                print(f"JPEG LOSSLESS FAIL t={t} shape={img.shape}")
            continue
        base = decode_jpeg(encode_jpeg(img, quality=q,
                                       restart_interval=ri, **kw))
        pb = encode_jpeg(img, quality=q, restart_interval=ri,
                         progressive=True, **kw)
        prog = decode_jpeg(pb)
        ok = base.shape == img.shape and np.array_equal(base, prog)
        px = [int(base[0, 0])] * 3 if gray else [int(v) for v in base[0, 0]]
        ok = ok and _jpeg_first_pixel_gray(pb) == _gray6(px)
        if not ok:
            fails += 1
            print(f"JPEG FAIL t={t} shape={img.shape} {kw} q={q} ri={ri}")
    return fails


def fuzz_png(rng: np.random.Generator, trials: int) -> int:
    fails = 0
    for t in range(trials):
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 48))
        inter = bool(rng.integers(0, 2))
        f = int(rng.integers(0, 5))
        mode = int(rng.integers(0, 6))
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        if mode == 0:        # RGB / RGBA, depth 8 or 16
            ch = int(rng.integers(3, 5))
            depth = (8, 16)[int(rng.integers(0, 2))]
            img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
            b = encode_png(img, filters=f, depth=depth, interlace=inter)
            want = img
        elif mode == 1:      # gray 8/16
            depth = (8, 16)[int(rng.integers(0, 2))]
            g = rng.integers(0, 256, (h, w)).astype(np.uint8)
            b = encode_png(g, filters=f, depth=depth, interlace=inter)
            want = np.repeat(g[..., None], 3, 2)
        elif mode == 2:      # palette 8
            idx = rng.integers(0, 16, (h, w)).astype(np.uint8)
            b = encode_png(idx, filters=f, palette=pal, interlace=inter)
            want = pal[idx]
        elif mode in (3, 4):  # sub-byte gray
            d = (1, 2, 4)[int(rng.integers(0, 3))]
            g = rng.integers(0, 1 << d, (h, w)).astype(np.uint8)
            b = encode_png(g, filters=f, depth=d, interlace=inter)
            scaled = ((g.astype(np.int64) * 255) // ((1 << d) - 1)
                      ).astype(np.uint8)
            want = np.repeat(scaled[..., None], 3, 2)
        else:                # sub-byte palette
            d = (1, 2, 4)[int(rng.integers(0, 3))]
            idx = rng.integers(0, min(16, 1 << d), (h, w)).astype(np.uint8)
            b = encode_png(idx, filters=f, depth=d, palette=pal,
                           interlace=inter)
            want = pal[idx]
        got = decode_png(b)
        ok = np.array_equal(got[:, :, :3], want[:, :, :3])
        ok = ok and _png_first_pixel_gray(b) == _gray6(want[0, 0])
        if not ok:
            fails += 1
            print(f"PNG FAIL t={t} mode={mode} f={f} inter={inter} "
                  f"shape=({h},{w})")
    return fails


def fuzz_wav(rng: np.random.Generator, trials: int) -> int:
    fails = 0
    for t in range(trials):
        n = int(rng.integers(1, 4000))
        x = rng.uniform(-1, 1, n)
        sw = int(rng.integers(1, 5))
        ch = int(rng.integers(1, 3))
        b = encode_wav(x, 8000, sampwidth=sw, channels=ch)
        y, rate = decode_wav(b)
        # quantization step, plus float32 resolution: a 32-bit sample
        # doesn't fit the 24-bit float32 mantissa, so the decode's
        # int->float32 conversion alone costs up to ~2^-24 relative
        tol = 1.01 / ((1 << (8 * sw - 1)) - 1) + 2.0 ** -23
        ok = rate == 8000 and len(y) == n and np.abs(y - x).max() <= tol
        feat, cnt = _wav_first_sample(b)
        ok = ok and cnt == n and feat == float(y[0])
        if not ok:
            fails += 1
            print(f"WAV FAIL t={t} n={n} sw={sw} ch={ch}")
    return fails


def fuzz_gif(rng: np.random.Generator, trials: int) -> int:
    from sagan_ray.datapipe.gif import decode_gif, encode_gif
    from sagan_ray.oracle.golden import _gif_first_pixel_gray, _gif_probe

    fails = 0
    for t in range(trials):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        ncol = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        nf = int(rng.integers(1, 5))
        frames = [rng.integers(0, ncol, (h, w)).astype(np.uint8)
                  for _ in range(nf)]
        b = encode_gif(frames, pal, delays_ms=[10 * (i + 1)
                                               for i in range(nf)],
                       interlace=bool(t & 1))
        decs, _delays = decode_gif(b)
        ok = len(decs) == nf and all(
            np.array_equal(d, pal[f]) for f, d in zip(frames, decs))
        ok = ok and _gif_probe(b)[1] == nf
        ok = ok and _gif_first_pixel_gray(b) == _gray6(
            [int(v) for v in decs[0][0, 0]])
        if not ok:
            fails += 1
            print(f"GIF FAIL t={t} shape=({h},{w}) ncol={ncol} nf={nf}")
    return fails


def fuzz_pnm_tiff(rng: np.random.Generator, trials: int) -> int:
    from sagan_ray.datapipe.multimodal import (
        decode_pnm,
        decode_tiff,
        encode_pnm,
        encode_tiff,
    )
    from sagan_ray.oracle.golden import (
        _pnm_first_pixel_gray,
        _tiff_first_pixel_gray,
    )

    fails = 0
    for t in range(trials):
        h, w = int(rng.integers(1, 60)), int(rng.integers(1, 60))
        gray = bool(t & 1)
        img = rng.integers(0, 256, (h, w) if gray else (h, w, 3)
                           ).astype(np.uint8)
        px3 = ([int(img[0, 0])] * 3 if gray
               else [int(v) for v in img[0, 0]])
        for enc, dec, golden in (
                (encode_pnm, decode_pnm, _pnm_first_pixel_gray),
                (encode_tiff, decode_tiff, _tiff_first_pixel_gray)):
            b = enc(img)
            if not (np.array_equal(dec(b), img)
                    and golden(b) == _gray6(px3)):
                fails += 1
                print(f"PNM/TIFF FAIL t={t} {enc.__name__} "
                      f"shape={img.shape}")
    return fails


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    total = 0
    for name, fn in (("jpeg", fuzz_jpeg), ("png", fuzz_png),
                     ("wav", fuzz_wav), ("gif", fuzz_gif),
                     ("pnm_tiff", fuzz_pnm_tiff)):
        rng = np.random.default_rng(a.seed)
        fails = fn(rng, a.trials)
        total += fails
        print(f"{name}: {a.trials} trials, {fails} failures")
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main())

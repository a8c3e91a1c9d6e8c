"""Baseline JPEG codec (datapipe/jpeg.py): roundtrip fidelity, the
bit-exact integer-decode contract vs the independent golden first-pixel
walk, honest NotImplementedError boundaries, and stage dispatch."""

import numpy as np
import pytest

from sagan_ray.datapipe.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w, rng):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255 // max(1, w - 1)),
                     (yy * 255 // max(1, h - 1)),
                     rng.integers(0, 256, (h, w))], -1).astype(np.uint8)


def test_roundtrip_fidelity_smooth():
    """Fidelity bounds hold only for SMOOTH content — a noise channel
    rides the 99-heavy chroma quant table and legitimately loses ~±180
    at q50 (verified equal to a float-reference roundtrip, so it is
    quantization physics, not codec error)."""
    h, w = 37, 29
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // (w - 1)), (yy * 255 // (h - 1)),
                    ((xx + yy) * 255 // (h + w - 2))], -1).astype(np.uint8)
    for q, bound in ((50, 16), (75, 9), (95, 5)):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= bound, (q, err)


def test_roundtrip_gray_and_tiny_shapes():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, (21, 13)).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=95))
    assert dg.shape == g.shape and dg.ndim == 2
    for shp in ((1, 1, 3), (3, 5, 3), (8, 8, 3), (1, 1), (9, 1, 3)):
        im = rng.integers(0, 256, shp).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(im, quality=95))
        assert dec.shape == im.shape


def test_decode_matches_independent_golden_walk():
    """The vectorized decoder and oracle/golden.py's per-scalar
    sequential walk implement the same exact-integer spec — pixel (0,0)
    gray must agree BIT-FOR-BIT (this is what gates the multimodal
    query's JPEG rows)."""
    from sagan_ray.oracle.golden import _jpeg_first_pixel_gray

    rng = np.random.default_rng(11)
    for trial in range(60):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        if trial % 3 == 2:
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        else:
            img = _gradient(h, w, rng) if trial % 3 else \
                rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        b = encode_jpeg(img, quality=int(rng.integers(10, 100)))
        dec = decode_jpeg(b)
        px = ([int(dec[0, 0])] * 3 if dec.ndim == 2
              else [int(v) for v in dec[0, 0]])
        s = np.float32(np.float32(np.float32(px[0]) + np.float32(px[1]))
                       + np.float32(px[2]))
        want = float(np.float32(np.float32(s / np.float32(3.0))
                                / np.float32(255.0)))
        assert _jpeg_first_pixel_gray(b) == want, trial


def test_subsampled_roundtrip_all_modes():
    """4:2:0 / 4:2:2 / 4:4:0 encode→decode: luma stays near-exact on
    smooth content while chroma rides the box downsample + replication
    upsample (bounded, not exact — that is the physics of subsampling)."""
    h, w = 37, 29
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // (w - 1)), (yy * 255 // (h - 1)),
                    ((xx + yy) * 255 // (h + w - 2))], -1).astype(np.uint8)
    for sub in ("4:2:0", "4:2:2", "4:4:0"):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= 24, (sub, err)
    # odd/tiny shapes survive the MCU padding in every mode
    rng = np.random.default_rng(7)
    for shp in ((1, 1, 3), (9, 17, 3), (16, 16, 3), (15, 8, 3)):
        im = rng.integers(0, 256, shp).astype(np.uint8)
        for sub in ("4:2:0", "4:2:2", "4:4:0"):
            assert decode_jpeg(encode_jpeg(im, subsampling=sub)).shape == shp


def test_subsampled_decode_matches_golden_walk():
    """The golden first-pixel walk must step the full interleaved MCU
    (hi*vi luma units before the chroma units) — bit-equality across all
    subsampling modes proves the MCU ordering on both sides."""
    from sagan_ray.oracle.golden import _jpeg_first_pixel_gray

    rng = np.random.default_rng(23)
    for trial in range(48):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        img = _gradient(h, w, rng) if trial % 2 else \
            rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        sub = ("4:2:0", "4:2:2", "4:4:0")[trial % 3]
        b = encode_jpeg(img, quality=int(rng.integers(10, 100)),
                        subsampling=sub)
        dec = decode_jpeg(b)
        px = [int(v) for v in dec[0, 0]]
        s = np.float32(np.float32(np.float32(px[0]) + np.float32(px[1]))
                       + np.float32(px[2]))
        want = float(np.float32(np.float32(s / np.float32(3.0))
                                / np.float32(255.0)))
        assert _jpeg_first_pixel_gray(b) == want, (trial, sub)


def test_progressive_decodes_pixel_equal_to_baseline():
    """The progressive entropy layer (spectral selection + successive
    approximation + EOB runs) is lossless over the same quantized
    coefficients, so progressive and baseline encodes of one image MUST
    decode pixel-identically — across subsampling modes, restart
    intervals, grayscale and color."""
    rng = np.random.default_rng(17)
    for trial in range(16):
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 48))
        if trial % 4 == 0:
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
            kw = {}
        else:
            img = (_gradient(h, w, rng) if trial % 2
                   else rng.integers(0, 256, (h, w, 3)).astype(np.uint8))
            kw = {"subsampling":
                  ("4:4:4", "4:2:0", "4:2:2", "4:4:0")[trial % 4]}
        q = int(rng.integers(10, 100))
        ri = (0, 3, 0, 8)[trial % 4]
        base = decode_jpeg(encode_jpeg(img, quality=q,
                                       restart_interval=ri, **kw))
        prog = decode_jpeg(encode_jpeg(img, quality=q, restart_interval=ri,
                                       progressive=True, **kw))
        assert np.array_equal(base, prog), (trial, img.shape, kw, q, ri)
    # flat image: every AC band empty -> maximal EOB runs on both the
    # spectral and the refinement scans
    flat = np.full((64, 48, 3), 130, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, progressive=True)),
                          decode_jpeg(encode_jpeg(flat)))


def test_progressive_golden_walk_parity():
    """oracle/golden.py replays every progressive scan's first data
    unit per-scalar; pixel (0,0) gray must agree bit-for-bit with the
    full vectorized decode (this gates progressive corpus rows)."""
    from sagan_ray.oracle.golden import _jpeg_first_pixel_gray

    rng = np.random.default_rng(29)
    for trial in range(30):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        if trial % 5 == 0:
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
            kw = {}
        else:
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            kw = {"subsampling": ("4:2:0", "4:4:4", "4:2:2", "4:4:0",
                                  "4:2:0")[trial % 5]}
        b = encode_jpeg(img, quality=int(rng.integers(10, 100)),
                        restart_interval=(0, 2)[trial % 2],
                        progressive=True, **kw)
        dec = decode_jpeg(b)
        px = ([int(dec[0, 0])] * 3 if dec.ndim == 2
              else [int(v) for v in dec[0, 0]])
        s = np.float32(np.float32(np.float32(px[0]) + np.float32(px[1]))
                       + np.float32(px[2]))
        want = float(np.float32(np.float32(s / np.float32(3.0))
                                / np.float32(255.0)))
        assert _jpeg_first_pixel_gray(b) == want, trial


def test_lossless_roundtrip_bit_exact():
    """SOF3: decode(encode_lossless(img, p)) == img BIT-EXACTLY for all
    seven predictors (that is the definition of the mode); a nonzero
    point transform loses exactly the shifted-out low bits; golden
    first-pixel parity holds (RGB components, no color transform)."""
    from sagan_ray.datapipe.jpeg import encode_jpeg_lossless
    from sagan_ray.oracle.golden import _jpeg_first_pixel_gray

    rng = np.random.default_rng(37)
    for pred in range(1, 8):
        for shp in ((1, 1, 3), (17, 23, 3), (9, 31), (40, 3, 3)):
            img = rng.integers(0, 256, shp).astype(np.uint8)
            b = encode_jpeg_lossless(img, predictor=pred)
            dec = decode_jpeg(b)
            assert np.array_equal(dec, img), (pred, shp)
            px = ([int(dec[0, 0])] * 3 if dec.ndim == 2
                  else [int(v) for v in dec[0, 0]])
            s = np.float32(np.float32(np.float32(px[0]) + np.float32(px[1]))
                           + np.float32(px[2]))
            want = float(np.float32(np.float32(s / np.float32(3.0))
                                    / np.float32(255.0)))
            assert _jpeg_first_pixel_gray(b) == want, (pred, shp)
    img = rng.integers(0, 256, (20, 15, 3)).astype(np.uint8)
    for pt in (1, 3, 5):
        dec = decode_jpeg(encode_jpeg_lossless(img, predictor=4,
                                               point_transform=pt))
        assert np.array_equal(dec, (img >> pt) << pt), pt


def test_unsupported_variants_raise_clearly():
    rng = np.random.default_rng(5)
    b = bytearray(encode_jpeg(_gradient(16, 16, rng)))
    # arithmetic-coded: SOF0 → SOF9
    prog = bytearray(b)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(prog))
    # sampling factors beyond 2 (e.g. 4:1:1's 4x1 luma) stay out of scope
    sub = bytearray(b)
    sof = sub.find(b"\xff\xc0")
    sub[sof + 11] = 0x41        # marker+len(2)+prec+h(2)+w(2)+nc+cid → hv
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_jpeg(bytes(sub))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_restart_markers_roundtrip_and_tolerance():
    """DRI/RSTn: a restart-encoded stream decodes to the SAME pixels as
    the restart-free encode of the same image (restarts only re-segment
    the entropy stream), across subsampling modes and intervals; a
    stream that DECLARES an interval but carries no RSTn markers still
    decodes (predictors just never reset)."""
    rng = np.random.default_rng(31)
    for trial in range(12):
        h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
        img = _gradient(h, w, rng)
        sub = ("4:4:4", "4:2:0", "4:2:2", "4:4:0")[trial % 4]
        interval = (1, 2, 3, 5, 7, 16)[trial % 6]
        plain = encode_jpeg(img, quality=80, subsampling=sub)
        rst = encode_jpeg(img, quality=80, subsampling=sub,
                          restart_interval=interval)
        assert b"\xff\xdd" in rst
        assert np.array_equal(decode_jpeg(rst), decode_jpeg(plain)), \
            (trial, sub, interval)
    # declared interval, no markers: splice DRI into a plain stream
    b = encode_jpeg(_gradient(20, 20, rng))
    sos = b.find(b"\xff\xda")
    dri = b[:sos] + b"\xff\xdd\x00\x04\x00\x02" + b[sos:]
    assert np.array_equal(decode_jpeg(dri), decode_jpeg(b))
    # golden first-pixel walk ignores restarts past the first MCU
    from sagan_ray.oracle.golden import _jpeg_first_pixel_gray

    img = _gradient(33, 17, rng)
    rb = encode_jpeg(img, quality=70, subsampling="4:2:0",
                     restart_interval=1)
    dec = decode_jpeg(rb)
    px = [int(v) for v in dec[0, 0]]
    s = np.float32(np.float32(np.float32(px[0]) + np.float32(px[1]))
                   + np.float32(px[2]))
    want = float(np.float32(np.float32(s / np.float32(3.0))
                            / np.float32(255.0)))
    assert _jpeg_first_pixel_gray(rb) == want


def test_decode_image_dispatch_and_resize_reencode():
    from sagan_ray.datapipe.multimodal import (
        ResizeImages,
        decode_image,
        synth_media,
    )

    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, (10, 12)).astype(np.uint8)
    out = decode_image(encode_jpeg(g, quality=95))
    assert out.shape == (10, 12, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])   # gray replicated

    # the synthetic corpus now carries all three image formats, and the
    # resize stage re-encodes each in its own format
    media = synth_media(120, seed=9)
    mimes = set(media.column("mime").to_pylist())
    assert {"image/jpeg", "image/png", "image/bmp"} <= mimes
    import pyarrow.compute as pc
    imgs = media.filter(pc.equal(media.column("kind"), "image"))
    resized = ResizeImages(max_side=8)(imgs)
    for i in range(len(resized)):
        p = resized.column("payload")[i].as_py()
        mime = resized.column("mime")[i].as_py()
        assert decode_image(p).shape[0] <= 8
        if mime == "image/jpeg":
            assert p[:2] == b"\xff\xd8"

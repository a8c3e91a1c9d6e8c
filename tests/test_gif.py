"""GIF codec (datapipe/gif.py): lossless indexed roundtrip, LZW table
reset, interlace, compositing/transparency/disposal, golden first-pixel
parity and the multimodal stage dispatches."""

import numpy as np
import pytest

from sagan_ray.datapipe.gif import decode_gif, encode_gif


def test_roundtrip_lossless_all_shapes():
    rng = np.random.default_rng(3)
    for trial in range(12):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        ncol = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        nf = int(rng.integers(1, 5))
        frames = [rng.integers(0, ncol, (h, w)).astype(np.uint8)
                  for _ in range(nf)]
        b = encode_gif(frames, pal, delays_ms=[120] * nf,
                       interlace=bool(trial & 1))
        decs, delays = decode_gif(b)
        assert len(decs) == nf and delays == [120] * nf
        for f, d in zip(frames, decs):
            assert np.array_equal(d, pal[f]), trial
    # table-reset path: >4096 LZW entries in one frame
    big = rng.integers(0, 256, (120, 150)).astype(np.uint8)
    pal256 = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif([big], pal256))[0][0],
                          pal256[big])


def test_subrect_compositing_transparency_disposal():
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    f0 = np.zeros((8, 10), np.uint8)
    f0[:, :5] = 1
    patch = np.full((4, 4), 2, np.uint8)
    patch[0, 0] = 3
    decs, _ = decode_gif(encode_gif([f0, (2, 1, patch)], pal))
    canvas = f0.copy()
    canvas[1:5, 2:6] = patch
    assert np.array_equal(decs[0], pal[f0])
    assert np.array_equal(decs[1], pal[canvas])
    # transparent index keeps the underlying pixel
    decs, _ = decode_gif(encode_gif([f0, (2, 1, patch)], pal,
                                    transparent=3))
    keep = f0.copy()
    keep[1:5, 2:6] = np.where(patch == 3, keep[1:5, 2:6], patch)
    assert np.array_equal(decs[1], pal[keep])
    # disposal 3 raises clearly
    b = bytearray(encode_gif([f0, f0], pal))
    gce = b.find(b"\x21\xf9")
    b[gce + 3] = (b[gce + 3] & ~0x1C) | (3 << 2)
    with pytest.raises(NotImplementedError, match="restore"):
        decode_gif(bytes(b))
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF")


def test_gif_golden_probe_parity():
    """oracle/golden.py::_gif_probe (per-bit LSB walk, first-literal
    trick) must match the full decoder on pixel (0,0) gray and frame
    count across palettes, interlace and multi-frame streams."""
    from sagan_ray.oracle.golden import _gif_first_pixel_gray, _gif_probe

    rng = np.random.default_rng(9)
    for trial in range(24):
        h, w = int(rng.integers(1, 30)), int(rng.integers(1, 30))
        ncol = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        nf = int(rng.integers(1, 4))
        frames = [rng.integers(0, ncol, (h, w)).astype(np.uint8)
                  for _ in range(nf)]
        b = encode_gif(frames, pal, interlace=bool(trial & 1))
        decs, _ = decode_gif(b)
        px = [int(v) for v in decs[0][0, 0]]
        s = np.float32(np.float32(np.float32(px[0]) + np.float32(px[1]))
                       + np.float32(px[2]))
        want = float(np.float32(np.float32(s / np.float32(3.0))
                                / np.float32(255.0)))
        assert _gif_first_pixel_gray(b) == want, trial
        assert _gif_probe(b)[1] == nf


def test_gif_stage_dispatch():
    """decode_image / ResizeImages / SampleFrames / AVProbe all handle
    GIF payloads (still and animated) from the synth corpus."""
    import pyarrow.compute as pc

    from sagan_ray.datapipe.multimodal import (
        AVProbe,
        ResizeImages,
        SampleFrames,
        decode_image,
        synth_media,
    )

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (20, 30)).astype(np.uint8)
    b = encode_gif([idx], pal)
    assert np.array_equal(decode_image(b), pal[idx])

    media = synth_media(240, seed=9)
    mimes = set(media.column("mime").to_pylist())
    assert "image/gif" in mimes
    imgs = media.filter(pc.equal(media.column("kind"), "image"))
    resized = ResizeImages(max_side=8)(imgs)
    for i in range(len(resized)):
        p = resized.column("payload")[i].as_py()
        out = decode_image(p)
        assert out.shape[0] <= 8
        mime = resized.column("mime")[i].as_py()
        if mime == "image/gif":
            assert p[:6] in (b"GIF87a", b"GIF89a")
    vids = media.filter(pc.equal(media.column("kind"), "video"))
    assert any(p.as_py()[:6] in (b"GIF87a", b"GIF89a")
               for p in vids.column("payload"))
    sampled = SampleFrames(every_ms=500)(vids)
    assert len(sampled) > 0
    probe = AVProbe()(vids)
    assert (np.asarray(probe.column("n")) >= 2).all()


def test_pnm_tiff_roundtrip_and_golden():
    """netpbm (P5/P6) and uncompressed TIFF: exact roundtrip for gray
    and RGB, comment/whitespace-tolerant PNM headers, big-endian and
    multi-strip TIFF decode, golden first-pixel parity, decode_image
    dispatch."""
    import struct

    from sagan_ray.datapipe.multimodal import (
        decode_image,
        decode_pnm,
        decode_tiff,
        encode_pnm,
        encode_tiff,
    )
    from sagan_ray.oracle.golden import (
        _pnm_first_pixel_gray,
        _tiff_first_pixel_gray,
    )

    rng = np.random.default_rng(6)
    for trial in range(8):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        g = rng.integers(0, 256, (h, w)).astype(np.uint8)
        c = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for img in (g, c):
            for enc, dec, golden in (
                    (encode_pnm, decode_pnm, _pnm_first_pixel_gray),
                    (encode_tiff, decode_tiff, _tiff_first_pixel_gray)):
                b = enc(img)
                got = dec(b)
                assert np.array_equal(got, img)
                rgb = decode_image(b)
                assert rgb.shape == (h, w, 3)
                px = [int(v) for v in rgb[0, 0]]
                s = np.float32(np.float32(np.float32(px[0])
                                          + np.float32(px[1]))
                               + np.float32(px[2]))
                want = float(np.float32(np.float32(s / np.float32(3.0))
                                        / np.float32(255.0)))
                assert golden(b) == want
    # PNM comments + maxval rescale
    b = b"P6 # c\n#c2\n 5\t4\n127\n" + bytes(range(60))
    d = decode_pnm(b)
    assert d.shape == (4, 5, 3) and d[0, 0, 1] == 1 * 255 // 127
    # big-endian TIFF with left-justified inline SHORTs + two strips
    img = rng.integers(0, 256, (3, 7, 3)).astype(np.uint8)
    r1, r2 = img[:2].tobytes(), img[2:].tobytes()
    bps = 8 + len(r1) + len(r2)
    so, sc = bps + 6, bps + 14
    ifd = sc + 8

    def ent(tag, typ, cnt, val):
        if typ == 3 and cnt == 1:
            return struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        return struct.pack(">HHII", tag, typ, cnt, val)

    mm = bytearray(struct.pack(">2sHI", b"MM", 42, ifd))
    mm += r1 + r2 + struct.pack(">HHH", 8, 8, 8)
    mm += struct.pack(">II", 8, 8 + len(r1))
    mm += struct.pack(">II", len(r1), len(r2))
    ents = [(256, 4, 1, 7), (257, 4, 1, 3), (258, 3, 3, bps),
            (259, 3, 1, 1), (262, 3, 1, 2), (273, 4, 2, so),
            (277, 3, 1, 3), (278, 4, 1, 2), (279, 4, 2, sc)]
    mm += struct.pack(">H", len(ents))
    for e in ents:
        mm += ent(*e)
    mm += struct.pack(">I", 0)
    assert np.array_equal(decode_tiff(bytes(mm)), img)
    # unsupported flavors raise clearly
    with pytest.raises(NotImplementedError):
        decode_pnm(b"P3\n1 1\n255\n0 0 0")
    lzw = bytearray(encode_tiff(img))
    # compression tag value lives at IFD entry for tag 259
    with pytest.raises(NotImplementedError):
        n_off = struct.unpack_from("<I", lzw, 4)[0]
        cnt = struct.unpack_from("<H", lzw, n_off)[0]
        for i in range(cnt):
            o = n_off + 2 + 12 * i
            if struct.unpack_from("<H", lzw, o)[0] == 259:
                struct.pack_into("<H", lzw, o + 8, 5)   # LZW
        decode_tiff(bytes(lzw))

"""Palette, tint palmap, and dumppal format tests."""

import pytest
import numpy as np

from blinky_tpu import palette as P


def test_default_palette_shape():
    pal = P.default_palette()
    assert pal.shape == (256, 3) and pal.dtype == np.uint8
    assert (pal[0] == 0).all()  # index 0 black like Quake


def test_find_closest_first_min_wins():
    pal = np.zeros((256, 3), np.uint8)
    pal[10] = [100, 100, 100]
    pal[20] = [100, 100, 100]  # identical color later
    assert P.find_closest_pal_index(pal, 100, 100, 100) == 10


def test_create_palmap_matches_scalar_reference():
    """Vectorized palmap vs a direct scalar transcription of
    create_palmap (fisheye.c:857-908)."""
    pal = P.default_palette()
    got = P.create_palmap(pal)
    percent = 256 // 6
    for j in range(6):
        tint = P.PLATE_TINTS[j]
        for i in [0, 1, 17, 100, 200, 255]:
            r, g, b = (int(c) for c in pal[i])
            r += percent * (int(tint[0]) - r) >> 8
            g += percent * (int(tint[1]) - g) >> 8
            b += percent * (int(tint[2]) - b) >> 8
            r, g, b = (min(255, max(0, c)) for c in (r, g, b))
            best, bestd = 0, 1 << 30
            for k in range(256):
                d = (int(pal[k, 0]) - r) ** 2 + (int(pal[k, 1]) - g) ** 2 + (int(pal[k, 2]) - b) ** 2
                if d < bestd:
                    bestd, best = d, k
            assert got[j, i] == best, (j, i)


def test_tint_lut_identity_row():
    pal = P.default_palette()
    lut = P.tint_lut(pal)
    assert lut.shape == (7, 256)
    assert (lut[6] == np.arange(256)).all()


def test_dumppal_roundtrip():
    pal = P.default_palette()
    text = P.save_dumppal(pal)
    assert text.splitlines()[0].count(",") == 3
    back = P.load_dumppal(text)
    assert np.array_equal(back, pal)


def test_lmp_roundtrip():
    pal = P.default_palette()
    back = P.load_lmp(pal.tobytes())
    assert np.array_equal(back, pal)


def test_quantize_rgb_lossless_and_median_cut():
    """quantize_rgb: lossless for <=256 distinct colors, bounded error on
    a smooth field, deterministic."""
    from blinky_tpu.palette import default_palette, quantize_rgb

    pal = default_palette()
    rng = np.random.default_rng(0)
    img = pal[rng.integers(0, 256, (30, 44))]
    qpal, qidx = quantize_rgb(img)
    np.testing.assert_array_equal(qpal[qidx], img)

    yy, xx = np.mgrid[0:64, 0:64]
    grad = np.stack([xx * 4, yy * 4, (xx + yy) * 2], -1).astype(np.uint8)
    qpal, qidx = quantize_rgb(grad)
    err = np.abs(qpal[qidx].astype(int) - grad.astype(int))
    assert err.max() <= 24 and err.mean() < 4
    qpal2, qidx2 = quantize_rgb(grad)
    np.testing.assert_array_equal(qpal, qpal2)
    np.testing.assert_array_equal(qidx, qidx2)

    with pytest.raises(ValueError, match="RGB"):
        quantize_rgb(np.zeros((4, 4), np.uint8))


def test_quantize_rgb_ncolors_validation():
    from blinky_tpu.palette import quantize_rgb

    img = np.zeros((4, 4, 3), np.uint8)
    for bad in (0, 257, 512):
        with pytest.raises(ValueError, match="ncolors"):
            quantize_rgb(img, ncolors=bad)
    # reduced-color quantization still works
    yy, xx = np.mgrid[0:32, 0:32]
    grad = np.stack([xx * 8, yy * 8, xx * 0], -1).astype(np.uint8)
    pal, idx = quantize_rgb(grad, ncolors=16)
    assert len(np.unique(idx)) <= 16

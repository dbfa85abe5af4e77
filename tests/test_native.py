"""Native C++ runtime: parity with the pure-Python implementations."""

import numpy as np
import pytest

from blinky_tpu import native
from blinky_tpu import palette as P

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_palmap_native_matches_python():
    pal = P.default_palette()
    nat = native.palmap_build(pal)
    # pure python path (bypassing the native shortcut in create_palmap)
    percent = 256 // 6
    base = pal.astype(np.int64)
    tinted = base[None] + ((percent * (P.PLATE_TINTS[:, None, :] - base)) >> 8)
    tinted = np.clip(tinted, 0, 255)
    py = P.find_closest_pal_index(pal, tinted[..., 0], tinted[..., 1], tinted[..., 2])
    assert np.array_equal(nat, py)


def test_pcx_bodies_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 80), np.uint8)
    for mode in ("reference", "rle"):
        body = native.pcx_encode_body(img, mode)
        out = native.pcx_decode_body(body, img.size)
        assert np.array_equal(out.reshape(img.shape), img), mode


def test_pcx_decode_truncated_raises():
    img = np.full((8, 8), 0xC5, np.uint8)
    body = native.pcx_encode_body(img, "reference")
    with pytest.raises(ValueError):
        native.pcx_decode_body(body[:-3], img.size)


def test_batch_decode_many():
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 256, (32, 32), np.uint8) for _ in range(5)]
    bodies = [native.pcx_encode_body(i, "rle") for i in imgs]
    out = native.pcx_decode_body_many(bodies, imgs[0].size)
    for k, img in enumerate(imgs):
        assert np.array_equal(out[k].reshape(32, 32), img)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    fr = rng.integers(0, 256, (7, 6, 16, 16), np.uint8)
    pk = native.pack_batch(fr)
    assert np.array_equal(pk, np.moveaxis(fr, 0, -1))
    assert np.array_equal(native.unpack_batch(pk), fr)


@pytest.mark.parametrize("lens_name", ["eckert1", "sinusoidal", "winkel1"])
def test_forward_rasterizer_matches_python(lens_name):
    """The C++ draw_quad transcription must match the Python scan-order
    rasterizer bit-exactly (both transcribe fisheye.c:2126-2338)."""
    from blinky_tpu import globes, lenses
    from blinky_tpu.lensmap import Zoom, calc_scale
    from blinky_tpu.lensmap.forward_raster import build_forward

    g = globes.get("cube")
    lens = lenses.get(lens_name, g)
    scale = calc_scale(Zoom("contain"), lens, 80, 60)
    a = build_forward(lens, g, scale, 80, 60, 60, use_native=True)
    b = build_forward(lens, g, scale, 80, 60, 60, use_native=False)
    for f in ("plate", "px", "py", "valid", "tint", "flat_idx", "plates_used"):
        assert np.array_equal(np.asarray(getattr(a, f)), np.asarray(getattr(b, f))), f


def test_forward_rasterizer_low_poly_globe():
    from blinky_tpu import globes, lenses
    from blinky_tpu.lensmap import Zoom, calc_scale
    from blinky_tpu.lensmap.forward_raster import build_forward

    g = globes.get("trism")
    lens = lenses.get("eckert5", g)
    scale = calc_scale(Zoom("contain"), lens, 64, 48)
    a = build_forward(lens, g, scale, 64, 48, 48, use_native=True)
    b = build_forward(lens, g, scale, 64, 48, 48, use_native=False)
    for f in ("plate", "px", "py", "valid", "tint", "flat_idx", "plates_used"):
        assert np.array_equal(np.asarray(getattr(a, f)), np.asarray(getattr(b, f))), f

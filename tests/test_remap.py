"""Remap kernel vs the oracle blit loop (render_lensmap)."""

import numpy as np
import pytest

from blinky_tpu import globes, lenses, palette as P
from blinky_tpu.io.cubemap import synthetic_cubemap, synthetic_cubemap_batch
from blinky_tpu.kernels.remap import RemapKernel
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.parity.oracle import oracle_inverse_lensmap, oracle_remap

W, H = 64, 48


@pytest.fixture(scope="module")
def setup():
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    lm = build_lensmap(lens, g, scale, W, H, backend="numpy")
    o = oracle_inverse_lensmap(lens, g, scale, W, H, min(W, H))
    frames = synthetic_cubemap(min(W, H))
    pal = P.default_palette()
    return g, lm, o, frames, pal


def test_remap_bit_exact(setup):
    g, lm, o, frames, pal = setup
    bg = np.zeros((H, W), np.uint8)
    k = RemapKernel(lm, pal)
    out = np.asarray(k(frames))
    ref = oracle_remap(o, frames, bg)
    assert np.array_equal(out, ref)


def test_remap_rubix_bit_exact(setup):
    g, lm, o, frames, pal = setup
    bg = np.zeros((H, W), np.uint8)
    out = np.asarray(RemapKernel(lm, pal)(frames, rubix=True))
    ref = oracle_remap(o, frames, bg, rubix_enabled=True, palmap=P.create_palmap(pal))
    assert np.array_equal(out, ref)


def test_remap_background_passthrough(setup):
    g, lm, o, frames, pal = setup
    bg = np.full((H, W), 77, np.uint8)
    out = np.asarray(RemapKernel(lm, pal, background=bg)(frames))
    assert (out[~np.asarray(lm.valid)] == 77).all()


def test_remap_batch_consistency(setup):
    g, lm, o, frames, pal = setup
    batch = synthetic_cubemap_batch(min(W, H), 5)
    k = RemapKernel(lm, pal)
    out = np.asarray(k(batch))
    assert out.shape == (H, W, 5)
    for b in range(5):
        single = np.asarray(k(batch[..., b]))
        assert np.array_equal(out[..., b], single)


def test_remap_rgb_decode(setup):
    g, lm, o, frames, pal = setup
    out8 = np.asarray(RemapKernel(lm, pal)(frames))
    rgb = np.asarray(RemapKernel(lm, pal)(frames, decode_rgb=True))
    assert rgb.shape == (H, W, 3)
    assert np.array_equal(rgb, pal[out8])


def test_remap_fewer_plates_padded():
    g = globes.get("fast")  # 2 plates
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 160), lens, W, H)
    lm = build_lensmap(lens, g, scale, W, H, backend="numpy")
    frames = synthetic_cubemap(min(W, H), numplates=2)[:2]
    out = np.asarray(RemapKernel(lm, P.default_palette())(frames))
    o = oracle_inverse_lensmap(lens, g, scale, W, H, min(W, H))
    ref = oracle_remap(o, synthetic_cubemap(min(W, H), numplates=2), np.zeros((H, W), np.uint8))
    assert np.array_equal(out, ref)

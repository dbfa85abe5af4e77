"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from blinky_tpu import globes, lenses
from blinky_tpu.io.cubemap import synthetic_cubemap_batch
from blinky_tpu.kernels.remap import RemapKernel
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.palette import default_palette
from blinky_tpu.parallel import make_mesh, remap_sharded

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(W=64, H=48, S=32, B=16):
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="numpy")
    k = RemapKernel(lm, default_palette())
    frames = synthetic_cubemap_batch(S, B)
    return k, frames


def test_data_parallel_matches_single():
    k, frames = _setup()
    mesh = make_mesh(n_data=8, n_space=1)
    out = np.asarray(remap_sharded(k, frames, mesh))
    ref = np.asarray(RemapKernel(k.lensmap, default_palette())(frames))
    assert np.array_equal(out, ref)


def test_2d_mesh_matches_single():
    k, frames = _setup()
    mesh = make_mesh(n_data=4, n_space=2)
    out = np.asarray(remap_sharded(k, frames, mesh, rubix=True))
    ref = np.asarray(RemapKernel(k.lensmap, default_palette())(frames, rubix=True))
    assert np.array_equal(out, ref)


def test_graft_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_jits():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (120, 160, 8)


def test_sharded_expanded_and_rgba_paths():
    """The expanded-source rubix and RGBA fast paths shard like the plain
    remap and match the single-device results bit-exactly."""
    import jax
    import jax.numpy as jnp

    from blinky_tpu import globes, lenses
    from blinky_tpu.io.cubemap import synthetic_cubemap_batch
    from blinky_tpu.kernels.remap import (
        RemapKernel, expand_frames_tinted, frames_to_rgba,
    )
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.palette import default_palette
    from blinky_tpu.parallel import make_mesh, remap_sharded

    mesh = make_mesh(n_data=4, n_space=2)
    W, H, S, B = 64, 32, 32, 8
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="numpy").to_numpy()
    pal = default_palette()
    kernel = RemapKernel(lm, pal)
    frames = synthetic_cubemap_batch(S, B)

    ex = expand_frames_tinted(frames, pal)
    ref = np.asarray(kernel(ex, rubix=True))
    out = np.asarray(remap_sharded(kernel, ex, mesh, rubix=True))
    np.testing.assert_array_equal(out, ref)

    rgba = frames_to_rgba(frames, pal)
    ref2 = np.asarray(kernel(rgba))
    out2 = np.asarray(remap_sharded(RemapKernel(lm, pal), rgba, mesh))
    assert out2.dtype == np.uint32
    np.testing.assert_array_equal(out2, ref2)

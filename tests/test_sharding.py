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


def test_remap_sharded_does_not_mutate_caller_kernel():
    """remap_sharded shards a COPY (round-1 weak #7): the caller's kernel
    must keep single-device operands and stay usable unsharded."""
    import jax.numpy as jnp

    k, frames = _setup()
    before = np.asarray(k(jnp.asarray(frames)))
    mesh = make_mesh(n_data=4, n_space=2)
    out = remap_sharded(k, frames, mesh)
    assert len(k.flat_idx.sharding.device_set) == 1
    assert len(k.valid.sharding.device_set) == 1
    after = np.asarray(k(jnp.asarray(frames)))
    np.testing.assert_array_equal(before, after)
    np.testing.assert_array_equal(np.asarray(out), before)


def test_sharded_builder_matches_unsharded():
    """build_lensmap_sharded (rows over "space") must bit-equal the plain
    f32 device build, and its output must feed remap_sharded directly."""
    from blinky_tpu.parallel import build_lensmap_sharded

    W, H, S = 64, 48, 32
    g = globes.get("cube")
    lens = lenses.get("stereographic", g)
    scale = calc_scale(Zoom("fov", 300), lens, W, H)
    mesh = make_mesh(n_data=4, n_space=2)
    lm_sh = build_lensmap_sharded(lens, g, scale, W, H, mesh, platesize=S)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="jax")
    for f in ("plate", "px", "py", "valid", "tint", "flat_idx", "plates_used"):
        np.testing.assert_array_equal(
            np.asarray(getattr(lm_sh, f)), np.asarray(getattr(lm, f)), err_msg=f)
    # row-sharded over the full mesh
    assert len(lm_sh.flat_idx.sharding.device_set) == 8
    k = RemapKernel(lm_sh, default_palette())
    frames = synthetic_cubemap_batch(S, 16)
    out = remap_sharded(k, frames, mesh, rubix=True)
    ref = np.asarray(RemapKernel(lm.to_numpy(), default_palette())(
        np.asarray(frames), rubix=True))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sharded_rgba_and_forward_lens():
    from blinky_tpu.kernels.remap import frames_to_rgba

    k, frames = _setup()
    mesh = make_mesh(n_data=4, n_space=2)
    rgba = frames_to_rgba(frames, default_palette())
    out = remap_sharded(k, rgba, mesh)
    import jax.numpy as jnp

    ref = np.asarray(k(jnp.asarray(rgba)))
    np.testing.assert_array_equal(np.asarray(out), ref)

    g = globes.get("cube")
    lens_f = lenses.get("sinusoidal", g)
    scale = calc_scale(Zoom("contain"), lens_f, 64, 48)
    lm_f = build_lensmap(lens_f, g, scale, 64, 48, 32)
    kf = RemapKernel(lm_f, default_palette())
    out_f = remap_sharded(kf, frames, mesh)
    ref_f = np.asarray(kf(jnp.asarray(frames)))
    np.testing.assert_array_equal(np.asarray(out_f), ref_f)


def test_posed_remap_sharded_matches_single_device():
    """Per-frame poses with the pose axis DP-sharded: bit-equal to the
    unsharded fused pipeline."""
    from blinky_tpu.kernels.posed import (
        PosedRemapKernel, bases_from_pose_track, posed_remap_sharded,
    )

    W, H, S, B = 64, 48, 32, 8
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    frames = synthetic_cubemap_batch(S, B)
    poses = np.stack([np.linspace(-30, 30, B), np.linspace(0, 90, B),
                      np.zeros(B)], axis=1)
    bases = bases_from_pose_track(poses)
    k = PosedRemapKernel(lens, g, W, H, scale, platesize=S)
    ref = np.asarray(k(frames, bases))
    mesh = make_mesh(n_data=8, n_space=1)
    out = posed_remap_sharded(k, frames, bases, mesh)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_equirect_ingest_sharded():
    """DP-sharded pano ingest == unsharded (the equirect->plates stage
    of the pipeline under SPMD, faces coming back sharded on B)."""
    import numpy as np

    from blinky_tpu import parallel
    from blinky_tpu.kernels.ingest import EquirectIngest

    mesh = make_mesh(n_data=8, n_space=1)
    rng = np.random.default_rng(6)
    H, W, B = 16, 32, 8
    panos = rng.integers(0, 2**32, (H, W, B), dtype=np.uint64).astype(np.uint32)
    kern = EquirectIngest(H, W, 12)
    ref = np.asarray(kern(panos))
    shard = parallel.ingest_equirect_sharded(kern, panos, mesh)
    np.testing.assert_array_equal(np.asarray(shard), ref)
    # output is actually distributed over the data axis
    assert len(shard.sharding.device_set) > 1


def test_sharded_builder_accepts_lua_lens():
    """Round 3 (Lua->JAX): a .lua drop-in goes through the row-sharded
    device builder and bit-equals its own single-device f32 build AND
    the Python port's sharded build."""
    from blinky_tpu.lua_bridge import load_lua_lens
    from blinky_tpu.parallel import build_lensmap_sharded

    W, H, S = 64, 48, 32
    g = globes.get("cube")
    lua = load_lua_lens(
        "/root/reference/game/lua-scripts/lenses/stereographic.lua", g)
    assert lua.jittable
    port = lenses.get("stereographic", g)
    scale = calc_scale(Zoom("fov", 300), port, W, H)
    mesh = make_mesh(n_data=4, n_space=2)
    lm_sh = build_lensmap_sharded(lua, g, scale, W, H, mesh, platesize=S)
    lm_single = build_lensmap(lua, g, scale, W, H, S, backend="jax")
    lm_port = build_lensmap_sharded(port, g, scale, W, H, mesh, platesize=S)
    for f in ("plate", "px", "py", "valid", "tint", "flat_idx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(lm_sh, f)), np.asarray(getattr(lm_single, f)),
            err_msg=f"{f} vs single")
        np.testing.assert_array_equal(
            np.asarray(getattr(lm_sh, f)), np.asarray(getattr(lm_port, f)),
            err_msg=f"{f} vs port")
    assert len(lm_sh.flat_idx.sharding.device_set) == 8


def test_remap_sharded_requires_palette_for_luts():
    """Review (late r3): rubix/RGB decode on a palette-less kernel must
    raise (a 1-element dummy LUT silently clips every lookup to 0)."""
    import pytest

    from blinky_tpu import globes, lenses, parallel
    from blinky_tpu.io.cubemap import synthetic_cubemap
    from blinky_tpu.kernels.remap import RemapKernel
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale

    mesh8 = parallel.make_mesh(n_data=4, n_space=2)
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    lm = build_lensmap(lens, g, calc_scale(Zoom("fov", 180), lens, 64, 48),
                       64, 48, backend="numpy")
    k = RemapKernel(lm)  # no palette
    frames = np.repeat(synthetic_cubemap(48)[..., None], 8, axis=-1)
    with pytest.raises(ValueError, match="palette"):
        parallel.remap_sharded(k, frames, mesh8, decode_rgb=True)
    with pytest.raises(ValueError, match="palette"):
        parallel.remap_sharded(k, frames, mesh8, rubix=True)


def test_remap_sharded_caches_sharded_kernel():
    """Review (late r3): the static lensmap operands reshard once per
    (kernel, mesh), not on every per-batch call."""
    from blinky_tpu import globes, lenses, parallel
    from blinky_tpu.io.cubemap import synthetic_cubemap
    from blinky_tpu.kernels.remap import RemapKernel
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.palette import default_palette

    mesh8 = parallel.make_mesh(n_data=4, n_space=2)
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    lm = build_lensmap(lens, g, calc_scale(Zoom("fov", 180), lens, 64, 48),
                       64, 48, backend="numpy")
    k = RemapKernel(lm, default_palette())
    frames = np.repeat(synthetic_cubemap(48)[..., None], 8, axis=-1)
    out1 = np.asarray(parallel.remap_sharded(k, frames, mesh8))
    cached = k._sharded_for
    assert cached[0] is mesh8
    out2 = np.asarray(parallel.remap_sharded(k, frames, mesh8))
    assert k._sharded_for is cached  # reused, not rebuilt
    np.testing.assert_array_equal(out1, out2)


def test_session_render_sharded_matches_render():
    """Session.render_sharded must bit-equal render() on the same table,
    for plain, rubix (expanded internally by the kernel path), and RGBA
    sources, including a two-level ("slice","data","space") mesh."""
    from blinky_tpu.api import Session
    from blinky_tpu.kernels.remap import frames_to_rgba
    from blinky_tpu.parallel import make_slice_mesh

    frames = synthetic_cubemap_batch(32, 16)
    sess = Session(64, 48, platesize=32)
    sess.cmd("f_lens panini; f_fov 180")
    ref = np.asarray(sess.render(frames))
    mesh = make_mesh(n_data=4, n_space=2)
    np.testing.assert_array_equal(
        np.asarray(sess.render_sharded(frames, mesh)), ref)
    mesh2 = make_slice_mesh(2, 2, 2)
    np.testing.assert_array_equal(
        np.asarray(sess.render_sharded(frames, mesh2)), ref)
    sess.cmd("f_rubix 1")
    ref_r = np.asarray(sess.render(frames))
    np.testing.assert_array_equal(
        np.asarray(sess.render_sharded(frames, mesh)), ref_r)
    sess.cmd("f_rubix 0")
    rgba = frames_to_rgba(frames, sess.palette)
    np.testing.assert_array_equal(
        np.asarray(sess.render_sharded(rgba, mesh)),
        np.asarray(sess.render(rgba)))


def test_two_level_slice_mesh_pipelines_match_single_device():
    """SURVEY §5.8's ICI/DCN split: a ("slice","data","space") mesh with
    the batch fanned over slice x data and the lensmap/ray-table
    replicated per slice must bit-equal single-device for the remap AND
    the posed pipelines; the remap step's compiled HLO must contain no
    collectives at all (pure DP — the only cross-slice traffic is
    input/output distribution outside the step)."""
    import jax.numpy as jnp

    from blinky_tpu.kernels.posed import (
        bases_from_pose_track, posed_remap_sharded, PosedRemapKernel,
    )
    from blinky_tpu.kernels.remap import remap_gather_impl
    from blinky_tpu.kernels.static_ray import (
        StaticRayPosedKernel, static_ray_posed_sharded,
    )
    from blinky_tpu.parallel import (
        data_axes, make_slice_mesh, shard_frames, shard_kernel,
    )

    kernel, frames = _setup(B=8)
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, 64, 48)
    mesh = make_slice_mesh(2, 2, 2)
    assert data_axes(mesh) == ("slice", "data")
    ref = np.asarray(kernel(jnp.asarray(frames)))
    sk = shard_kernel(kernel, mesh)
    sframes = shard_frames(frames, mesh)
    fn = jax.jit(remap_gather_impl)
    out = fn(sframes, sk.flat_idx, sk.valid, sk.background)
    np.testing.assert_array_equal(np.asarray(out), ref)
    # no collectives in the compiled step (cross-slice OR cross-chip)
    hlo = fn.lower(sframes, sk.flat_idx, sk.valid,
                   sk.background).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "reduce-scatter", "all-to-all"):
        assert coll not in hlo, f"unexpected collective {coll}"

    # posed pipelines: pose axis fans over slice x data
    bases = bases_from_pose_track(
        [(0, 0, 0), (5, -12, 0), (-20, 33, 10), (0, 271, -45),
         (1, 2, 3), (10, 20, 30), (-5, 5, -5), (0, 180, 0)])
    pk = PosedRemapKernel(lens, g, 64, 48, scale, platesize=32)
    posed_ref = np.asarray(pk(frames, bases))
    np.testing.assert_array_equal(
        np.asarray(posed_remap_sharded(pk, frames, bases, mesh)), posed_ref)
    srk = StaticRayPosedKernel(lens, g, 64, 48, scale, platesize=32)
    sr_ref = np.asarray(srk(frames, bases))
    np.testing.assert_array_equal(
        np.asarray(static_ray_posed_sharded(srk, frames, bases, mesh)),
        sr_ref)


def test_feasible_batch_mesh_aware():
    """feasible_batch(n_devices=n): global B = n x per-device feasible,
    each shard 128-quantum; cap floors to a device multiple."""
    from blinky_tpu.bench.autobatch import feasible_batch

    b1 = feasible_batch(3.77e6, 0, budget=16.2e9)
    assert b1 == 4224  # the headline anchor (docstring table)
    assert feasible_batch(3.77e6, 0, budget=16.2e9, n_devices=4) == 4 * b1
    # cap: global result must split evenly over the devices
    assert feasible_batch(3.77e6, 0, budget=16.2e9, n_devices=4,
                          cap=1000) == 1000
    assert feasible_batch(3.77e6, 0, budget=16.2e9, n_devices=3,
                          cap=1000) == 999
    # cap below the device count: give back the cap (caller's problem)
    assert feasible_batch(3.77e6, 0, budget=16.2e9, n_devices=8,
                          cap=4) == 4


def test_sharded_scaling_derives_batches():
    """per_device_batch=None: the weak-scaling bench derives each step's
    batch from the layout + (scaled-down for the CPU mesh) budget."""
    from blinky_tpu.bench.throughput import run_sharded_scaling

    out = run_sharded_scaling(width=64, height=48, platesize=32,
                              per_device_batch=None, iters=1, reps=1,
                              budget=50e6)
    assert len(out) >= 3
    for row in out:
        assert row["batch"] > 0 and row["batch"] % 1 == 0
    # weak scaling: global batch grows with the data-axis device count
    assert out[-1]["batch"] > out[0]["batch"]

"""Static-ray pose recomposition (kernels/static_ray.py): the ray table,
the lens-free per-pose pipeline, and its parity contracts.

Contracts (VERDICT r3 task 1):
* inverse lenses: bit-equal to the fused vmapped-builder pipeline
  (PosedRemapKernel) — same f32 ops in the same order (exactly 0 on TPU;
  XLA:CPU's fusion-dependent FMA contraction may flip a few boundary
  texels, like the .lua device pins — tolerances here, exact pin in the
  ``-m tpu`` tier);
* forward-only lenses: identity pose bit-equals the static rasterized
  render; rotated poses are the nearest-ray reprojection of the
  rasterized map (quad scan-order ownership vs nearest-ray differences
  are inherent and quantified below);
* the texel-center reconstruction itself: rotated resolves within ONE
  texel of the exact-ray path, valid sets identical.
"""

import dataclasses

import numpy as np
import pytest

from blinky_tpu import globes, lenses
from blinky_tpu.io.cubemap import synthetic_cubemap_batch
from blinky_tpu.kernels.posed import PosedRemapKernel, bases_from_pose_track
from blinky_tpu.kernels.remap import expand_frames_tinted, frames_to_rgba
from blinky_tpu.kernels.static_ray import (
    StaticRayPosedKernel,
    build_ray_table,
    ray_table_from_lens,
    ray_table_from_lensmap,
    static_ray_posed_sharded,
)
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.lensmap.builder import rays_to_lensmap
from blinky_tpu.palette import default_palette

W, H, S, B = 64, 48, 48, 5

POSES = [(0.0, 0.0, 0.0), (5.0, -12.0, 0.0), (-20.0, 33.0, 10.0),
         (89.0, 180.0, 0.0), (0.0, 271.0, -45.0)]

# CPU-mesh tolerance for "bit-equal on TPU" comparisons: XLA:CPU fuses
# the table build and the fused pipeline differently (FMA contraction),
# flipping at most a handful of boundary texels (CLAUDE.md round-3 note)
CPU_FUZZ = 0.005


@pytest.fixture(scope="module")
def setup():
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    frames = synthetic_cubemap_batch(S, B)
    bases = bases_from_pose_track(POSES)
    return g, lens, scale, frames, bases


def _mismatch(a, b):
    return (np.asarray(a) != np.asarray(b)).mean()


@pytest.mark.parametrize("lens_name,globe_name,zoom", [
    ("panini", "cube", Zoom("fov", 180)),
    ("hammer", "fast", Zoom("contain")),
    ("fisheye1", "tetra", Zoom("contain")),
    ("quincuncial", "cube", Zoom("contain")),
])
def test_matches_fused_posed_pipeline(lens_name, globe_name, zoom):
    """Inverse lenses: static-ray == the vmapped-builder fused pipeline
    (the lens stage computes the same f32 rays the fused builder would,
    the per-pose stage is the identical rays_to_lensmap)."""
    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(zoom, lens, W, H)
    frames = synthetic_cubemap_batch(S, B)
    bases = bases_from_pose_track(POSES)
    fused = np.asarray(PosedRemapKernel(lens, g, W, H, scale,
                                        platesize=S)(frames, bases))
    sr = np.asarray(StaticRayPosedKernel(lens, g, W, H, scale,
                                         platesize=S)(frames, bases))
    assert _mismatch(fused, sr) <= CPU_FUZZ


def test_matches_fused_rubix_rgba_and_scale(setup):
    """Expanded rubix sources, RGBA u32 decode and render_scale flow
    through the static-ray pipeline identically to the fused one."""
    g, lens, scale, frames, bases = setup
    pal = default_palette()
    exp = expand_frames_tinted(frames, pal)
    for fr in (exp, frames_to_rgba(exp, pal)):
        bg = (np.zeros((H, W), np.uint32) if fr.dtype == np.uint32
              else None)
        fused = PosedRemapKernel(lens, g, W, H, scale, platesize=S,
                                 background=bg)
        sr = StaticRayPosedKernel(lens, g, W, H, scale, platesize=S,
                                  background=bg)
        assert _mismatch(fused(fr, bases), sr(fr, bases)) <= CPU_FUZZ
    fused2 = PosedRemapKernel(lens, g, W, H, scale, platesize=S,
                              render_scale=2)
    sr2 = StaticRayPosedKernel(lens, g, W, H, scale, platesize=S,
                               render_scale=2)
    assert _mismatch(fused2(frames, bases), sr2(frames, bases)) <= CPU_FUZZ


def test_table_source_routing(setup):
    """build_ray_table picks the right source per lens kind."""
    g, lens, scale, frames, bases = setup
    t = build_ray_table(lens, g, scale, W, H, S)
    assert t.source == "lens"
    fwd = lenses.get("eckert1", g)
    fscale = calc_scale(Zoom("contain"), fwd, W, H)
    tf = build_ray_table(fwd, g, fscale, W, H, S)
    assert tf.source == "lensmap"
    with pytest.raises(ValueError, match="no inverse"):
        ray_table_from_lens(fwd, fscale, W, H)


def test_host_table_matches_device_table(setup):
    """The numpy-backend table (scalar-only .lua route) stores the f64
    lens math truncated to f32 — within f32 noise of the device table,
    identical valid masks."""
    g, lens, scale, frames, bases = setup
    td = build_ray_table(lens, g, scale, W, H, S)
    th = ray_table_from_lens(lens, scale, W, H, backend="numpy")
    np.testing.assert_array_equal(np.asarray(td.lens_valid),
                                  np.asarray(th.lens_valid))
    v = np.asarray(td.lens_valid)
    for a, b in ((td.vx, th.vx), (td.vy, th.vy), (td.vz, th.vz)):
        np.testing.assert_allclose(np.asarray(a)[v], np.asarray(b)[v],
                                   rtol=2e-6, atol=2e-7)
    # a host table drives the kernel to the same screens (f32 boundary
    # flips only)
    k_h = StaticRayPosedKernel(lens, g, W, H, scale, platesize=S,
                               ray_table=th)
    k_d = StaticRayPosedKernel(lens, g, W, H, scale, platesize=S,
                               ray_table=td)
    assert _mismatch(k_h(frames, bases), k_d(frames, bases)) <= 0.02


def test_lensmap_table_quantization_bound(setup):
    """ray_table_from_lensmap (the forward-only route, here validated on
    an inverse lens where the exact rays exist): rotated texel-center
    rays re-resolve within ONE texel of the exact rays, valid sets
    identical, plates agree off-seam."""
    g = globes.get("cube")
    lens = lenses.get("hammer", g)
    scale = calc_scale(Zoom("contain"), lens, W, H)
    lmi = build_lensmap(lens, g, scale, W, H, S, backend="numpy").to_numpy()
    t = ray_table_from_lensmap(lmi, g)
    for basis in bases_from_pose_track(POSES):
        out = rays_to_lensmap(
            g, t.vx, t.vy, t.vz, t.lens_valid, S, 10.0, 4.0, 1.0,
            np, np.float64, view_basis=tuple(basis))
        lm2 = build_lensmap(lens, g, scale, W, H, S, backend="numpy",
                            view_basis=tuple(basis)).to_numpy()
        np.testing.assert_array_equal(np.asarray(out["valid"]), lm2.valid)
        both = lm2.valid
        same_p = both & (np.asarray(out["plate"]) == lm2.plate)
        assert same_p[both].mean() > 0.97  # seam pixels only
        dx = np.abs(np.asarray(out["px"])[same_p] - lm2.px[same_p])
        dy = np.abs(np.asarray(out["py"])[same_p] - lm2.py[same_p])
        assert dx.max() <= 1 and dy.max() <= 1


def test_forward_identity_pose_bit_equals_static(setup):
    """Forward-only lens, identity pose: every texel-center ray
    re-resolves to its own texel, so the posed screen bit-equals the
    static rasterized render."""
    g, _, _, frames, _ = setup
    for lens_name in ("eckert1", "polyconic"):
        lens = lenses.get(lens_name, g)
        zoom = Zoom("fov", 360) if lens_name == "polyconic" else Zoom("contain")
        scale = calc_scale(zoom, lens, W, H)
        lm = build_lensmap(lens, g, scale, W, H, S)
        k = StaticRayPosedKernel(lens, g, W, H, scale, platesize=S,
                                 lensmap=lm)
        out = np.asarray(k(frames[..., :1],
                           bases_from_pose_track([(0.0, 0.0, 0.0)])))
        from blinky_tpu.kernels.remap import RemapKernel

        static = np.asarray(RemapKernel(lm)(frames[..., 0]))
        np.testing.assert_array_equal(out[0], static)


def test_sharded_matches_unsharded(setup):
    """DP-sharded poses over the mesh's data axis == the single-device
    pipeline (replicated ray table, local gathers)."""
    from blinky_tpu.parallel import make_mesh

    g, lens, scale, frames, bases = setup
    frames8 = synthetic_cubemap_batch(S, 8)
    poses8 = np.stack([np.linspace(-20, 20, 8), np.linspace(0, 90, 8),
                       np.zeros(8)], axis=1)
    bases8 = bases_from_pose_track(poses8)
    k = StaticRayPosedKernel(lens, g, W, H, scale, platesize=S)
    single = np.asarray(k(frames8, bases8))
    mesh = make_mesh(n_data=4, n_space=1)
    sharded = np.asarray(static_ray_posed_sharded(k, frames8, bases8, mesh))
    np.testing.assert_array_equal(single, sharded)


def test_pipeline_compiled_once_per_globe(setup):
    """The compiled per-pose pipeline is keyed on (globe, shape, source
    kind) — NOT the lens or zoom: a lens switch or f_fov change reuses
    the warm executable (only the cheap ray table changes)."""
    from blinky_tpu.kernels.static_ray import _compiled_static_ray_pipeline

    g, lens, scale, frames, bases = setup
    before = _compiled_static_ray_pipeline.cache_info()
    k1 = StaticRayPosedKernel(lens, g, W, H, scale, platesize=S)
    k1(frames, bases)
    lens2 = lenses.get("stereographic", g)
    scale2 = calc_scale(Zoom("fov", 240), lens2, W, H)
    k2 = StaticRayPosedKernel(lens2, g, W, H, scale2, platesize=S)
    k2(frames, bases)
    after = _compiled_static_ray_pipeline.cache_info()
    assert after.misses <= before.misses + 1  # second lens: cache hit


def test_table_size_validation(setup):
    g, lens, scale, frames, bases = setup
    bad = dataclasses.replace(build_ray_table(lens, g, scale, W, H, S),
                              width_px=W - 2)
    with pytest.raises(ValueError, match="ray table"):
        StaticRayPosedKernel(lens, g, W, H, scale, platesize=S,
                             ray_table=bad)
